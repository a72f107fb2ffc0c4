package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.roundFp

/** Event-time and analytic window operators over the `events` stream
  * table — the batch faces of the engine's streaming surface (the same
  * tumbling/session windows run under Structured Streaming in
  * `graft.streaming`; here they're expressed on the bounded table so
  * the oracle can check them).
  *
  * Scale notes: tumbling/session windows shuffle once on
  * (key, window); analytic windows shuffle once on the partition key.
  * Both are the minimal-exchange plans for their semantics.
  */
object WindowOps {

  /** w1 — tumbling event-time window: per (hour, event_type) count and
    * sum. Epoch-aligned 1-hour windows == date_trunc in the oracle. */
  private def w1(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** w2 — ranking window: top-3 orders per customer by price (dense
    * per-group top-k; shuffle on the partition key only). */
  private def w2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
      .filter(col("rank") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rank"))

  /** w3 — session window: per-user sessions with a 30-minute
    * inactivity gap. Spark's `session_window` semantics: a new session
    * starts when the gap is >= 30 min; session end = last event + gap.
    * The oracle replicates with lag + cumulative-sum
    * (gaps-and-islands). */
  private def w3(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** w4 — lag/delta analytic: microseconds since the user's previous
    * event (NULL for the first). One shuffle on user_id. */
  private def w4(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("delta_us"))
  }

  /** w5 — sliding event-time window: 10-minute windows every 5 minutes
    * (each event lands in exactly width/slide = 2 windows). Spark
    * expands the slide inline (no self-join); the shuffle key is
    * (window, event_type) — the same single-exchange shape as w1 with
    * a 2× row expansion, which is how sliding windows should scale. */
  private def w5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** w6 — running cumulative aggregate (rows unbounded preceding →
    * current row): the explicit frame-spec window the w-family lacked.
    * The accumulation ORDER is pinned by (ts, event_id), so the
    * left-to-right FP sum is reproducible run-to-run; one shuffle on
    * user_id and a per-partition sort, same exchange shape as w4. */
  private def w6(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        count(lit(1)).over(w).as("running_n"),
        roundFp(sum(col("value")).over(w), 2).as("running_value"))
  }

  /** w7 — quantile binning via ntile: each customer's orders split
    * into spend quartiles (per-key relative binning — "is this one of
    * the customer's top-quartile orders"). PARTITIONED ntile scales:
    * the shuffle key is o_custkey (high cardinality), each partition
    * sorts only its own rows. The GLOBAL form (ntile over an
    * unpartitioned window) would serialize 100 TB through one task —
    * global binning is instead the [[w8]] operator: quantile
    * cut-points joined back as a broadcast band dimension (r2's
    * shape). */
  private def w7(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        ntile(4).over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").asc, col("o_orderkey").asc))
          .as("spend_quartile"))

  /** w8 — GLOBAL quantile binning: every order labeled with its
    * global spend quartile. This is w7's documented scale path made a
    * first-class operator: a global ntile would serialize the whole
    * table through one task's sort, so instead
    *   (1) ONE aggregation computes the exact quartile cut-points
    *       (partial+final agg — rows never converge to one task, only
    *       per-partition agg states do; at extreme scale swap in
    *       approx_percentile, same plan shape);
    *   (2) the 3 cut-points become a 4-row [lo, hi) band dimension —
    *       broadcast, exactly r2's range-join shape;
    *   (3) the fact table equi-ish-joins the broadcast bands — a
    *       scan-speed map-side pass, NO global sort, NO extra
    *       shuffle of the facts (asserted in PlanShapeSpec).
    * Cut-points are rounded (portable floor form) before binning in
    * BOTH engines so a sub-ulp interpolation difference can't flip a
    * boundary row's bin. */
  private def w8(s: SparkSession, d: String): DataFrame = {
    val cuts = Tables.orders(s, d)
      .agg(expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").as("c"))
      .select(transform(col("c"), x => roundFp(x, 6)).as("c"))
      .select(
        concat(array(lit(Double.NegativeInfinity)), col("c")).as("los"),
        concat(col("c"), array(lit(Double.PositiveInfinity))).as("his"))
    val bands = cuts
      .select(col("his"), posexplode(col("los")).as(Seq("bin", "lo")))
      .select(col("bin"), col("lo"), element_at(col("his"), col("bin") + 1).as("hi"))
    Tables.orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select(col("o_orderkey"), col("bin").as("spend_quartile"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w8_global_bin" -> (w8 _),
    "w1_tumbling_window" -> (w1 _),
    "w2_rank_per_group" -> (w2 _),
    "w3_session_window" -> (w3 _),
    "w4_lag_delta" -> (w4 _),
    "w5_sliding_window" -> (w5 _),
    "w6_running_total" -> (w6 _),
    "w7_ntile" -> (w7 _)
  )

  val oracles: Map[String, String] = Map(
    // quantile_cont == Spark's exact `percentile` (same linear
    // interpolation: lower + (higher-lower)*frac, identical IEEE ops);
    // both engines round the cut-points with the portable floor form
    // before binning
    "w8_global_bin" -> """
      WITH c AS (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS c
                 FROM orders),
      cuts AS (SELECT list_transform(c, x -> floor(x*1000000 + 0.5)/1000000) AS c
               FROM c),
      bands AS (SELECT i AS bin,
          CASE WHEN i = 0 THEN '-infinity'::DOUBLE ELSE c[i] END AS lo,
          CASE WHEN i = 3 THEN 'infinity'::DOUBLE ELSE c[i+1] END AS hi
        FROM cuts, generate_series(0, 3) t(i))
      SELECT o_orderkey, bin AS spend_quartile
      FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi""",
    "w1_tumbling_window" -> """
      SELECT date_trunc('hour', ts) AS hour_start, event_type,
        count(*) AS cnt, floor(sum(value)*100 + 0.5)/100 AS sum_value
      FROM events GROUP BY 1, 2""",
    "w2_rank_per_group" -> """
      SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders) WHERE rank <= 3""",
    "w3_session_window" -> """
      WITH e AS (SELECT user_id, event_id, ts, value,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS brk
        FROM events),
      g AS (SELECT user_id, ts, value,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS sid
            FROM e)
      SELECT user_id, min(ts) AS session_start,
        max(ts) + INTERVAL 30 MINUTE AS session_end,
        count(*) AS n_events, floor(sum(value)*100 + 0.5)/100 AS sum_value
      FROM g GROUP BY user_id, sid""",
    "w4_lag_delta" -> """
      SELECT user_id, event_id,
        date_diff('microsecond',
          lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS delta_us
      FROM events""",
    "w6_running_total" -> """
      SELECT user_id, event_id,
        count(*) OVER w AS running_n,
        floor(sum(value) OVER w * 100 + 0.5)/100 AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",
    "w7_ntile" -> """
      SELECT o_orderkey, o_custkey,
        ntile(4) OVER (PARTITION BY o_custkey
          ORDER BY o_totalprice, o_orderkey) AS spend_quartile
      FROM orders""",
    // every event is in exactly two 10-min/5-min-slide windows: the
    // epoch-aligned floor window and the one 5 minutes earlier
    "w5_sliding_window" -> """
      WITH e AS (SELECT event_type, value, epoch_us(ts) AS eu FROM events),
      x AS (SELECT event_type, value,
              make_timestamp((eu // 300000000) * 300000000 - o.o) AS win_start
            FROM e, (VALUES (0::BIGINT), (300000000::BIGINT)) o(o))
      SELECT win_start, event_type, count(*) AS cnt,
        floor(sum(value)*100 + 0.5)/100 AS sum_value
      FROM x GROUP BY win_start, event_type"""
  )
}
