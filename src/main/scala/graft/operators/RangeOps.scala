package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.roundFp

/** Temporal/range join operators the reference lacks but a
  * training-data pipeline needs (SURVEY §2.3 notes their absence;
  * added as engine capability).
  *
  * r1 as-of join is implemented the scale-correct Spark way: instead
  * of a per-row lookup join (quadratic or index-dependent), union both
  * sides and take a running "last match" window — ONE shuffle on the
  * partition key, linear scan within partitions, no join at all.
  *
  * r2 range join broadcasts the (small) interval side; Catalyst plans
  * a broadcast nested-loop with the band predicate, which is the right
  * physical shape for a handful of bands (for large interval tables
  * the technique is interval bucketing back to an equi-join).
  */
object RangeOps {

  /** r1 — as-of join: each error event gets the most recent
    * click (same user, click.ts <= error.ts), with a deterministic
    * same-timestamp tiebreak (clicks sort before errors, then by id). */
  private def r1(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, (col("event_type") === "click").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isClick = col("event_type") === "click"
    Tables.events(s, d)
      .withColumn("prev_click_id",
        last(when(isClick, col("event_id")), ignoreNulls = true).over(w))
      .withColumn("prev_click_value",
        last(when(isClick, col("value")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("prev_click_id"), col("prev_click_value"))
  }

  /** r2 — range join: orders bucketed into price bands via an interval
    * predicate against a broadcast literal dimension. */
  private def r2(s: SparkSession, d: String): DataFrame = {
    val bands = (0 until 8).map(i => (i, i * 75000.0, (i + 1) * 75000.0))
    val bandDf = s.createDataFrame(bands).toDF("band", "lo", "hi")
    Tables.orders(s, d)
      .join(broadcast(bandDf),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"), roundFp(sum(col("o_totalprice")), 2).as("sum_price"))
  }

  /** r3 — interval-overlap self-join via GRID BINNING: every pair of
    * events (same user) whose 5-minute activity windows overlap. The
    * naive form is a per-user non-equi self-join (quadratic per user;
    * Catalyst would plan a nested loop). Instead each interval is
    * binned to the fixed-width grid cells it touches — generically
    * `sequence(st div C, en div C)`, so the decomposition stays exact
    * for ANY interval-length/cell-width ratio (with the current
    * 5-minute interval == cell width that is two consecutive cells) —
    * and the join becomes an EQUI-join on (user_id, cell): shuffle both sides on
    * that key, quadratic cost confined to one cell's density, AQE
    * splits hot cells. A pair overlapping across a cell boundary would
    * match twice, so each pair is claimed by exactly one cell — the one
    * containing max(a.start, b.start), which both intervals provably
    * cover — a filter, not a distinct (no second shuffle). This is the
    * standard spatial-join decomposition, 1-D. */
  private def r3(s: SparkSession, d: String): DataFrame = {
    val I = 300000000L // 5 min in µs: the activity-window length
    r3Binned(s, d, intervalUs = I, cellUs = r3AutoCell(s, d, I))
  }

  /** Density-derived grid cell width — the r9 autotune replacing the
    * fixed cell == interval constant.
    *
    * Cost model: with per-user interval density ρ (intervals per µs
    * per user), a width-C grid costs
    *   shuffle  ≈ 2·n·(1 + I/C)   bin rows (explode + both join sides)
    *   pairwork ≈ n·ρ·(C + I)     within-cell candidate comparisons
    * The product rule gives the balance point C* = sqrt(I/ρ): sparse
    * streams (the fixture: ~67 events/user/month → C* ≈ 11·I) get
    * COARSER cells — almost no double-binning, groups still ~1 — and
    * dense streams get finer cells bounding each group's quadratic,
    * clamped to [I/4, 4096·I] so degenerate stats can't produce a
    * pathological grid. The decomposition itself is exact for ANY
    * cell width (NewOpsSpec drives arbitrary ratios against the naive
    * join), so the knob trades only cost, never correctness — the
    * oracle stays the naive non-equi join.
    *
    * The stats pass is ONE eager 4-aggregate scan of the pruned
    * (ts, user_id) projection (count/min/max/HLL — deterministic, so
    * the chosen width and thus the plan are stable run to run). It
    * runs as its own tiny job before the main plan is built; at
    * 100 TB the same numbers come from table statistics instead. */
  private[graft] def r3AutoCell(s: SparkSession, d: String,
      intervalUs: Long): Long = {
    val r = Tables.events(s, d)
      .agg(count(lit(1)), min(unix_micros(col("ts"))),
        max(unix_micros(col("ts"))), approx_count_distinct(col("user_id")))
      .head()
    val n = r.getLong(0)
    if (n == 0L) return intervalUs
    val span = math.max(r.getLong(2) - r.getLong(1) + intervalUs, 1L)
    val users = math.max(r.getLong(3), 1L)
    val density = n.toDouble / (users.toDouble * span.toDouble)
    val cStar = math.sqrt(intervalUs.toDouble / density)
    math.max(intervalUs / 4, math.min(intervalUs * 4096L, cStar.toLong))
  }

  /** The generic decomposition behind r3: interval length and cell
    * width are independent — an interval covers `sequence(st div cell,
    * en div cell)` cells whatever the ratio (NewOpsSpec drives a
    * 4-cell span and a coarser-than-interval cell in lockstep with the
    * naive join), and the claim filter stays exact because both
    * intervals of an overlapping pair provably cover the cell of
    * max(a_st, b_st). Cell width is the skew dial at scale: smaller
    * cells bound each equi-join group's quadratic cost, at the price
    * of emitting interval/cell more bin rows per side. */
  private[graft] def r3Binned(s: SparkSession, d: String,
      intervalUs: Long, cellUs: Long): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + intervalUs)
    def binned(side: String) = e
      .withColumn("cell",
        explode(sequence(expr(s"st div $cellUs"), expr(s"en div $cellUs"))))
      .select(col("user_id"), col("cell"), col("event_id").as(s"${side}_id"),
        col("st").as(s"${side}_st"), col("en").as(s"${side}_en"))
    binned("a").join(binned("b"), Seq("user_id", "cell"))
      .filter(col("a_id") < col("b_id") &&
        col("a_st") <= col("b_en") && col("b_st") <= col("a_en") &&
        col("cell") === expr(s"greatest(a_st, b_st) div $cellUs"))
      .select(col("user_id"), col("a_id"), col("b_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r1_asof_join" -> (r1 _),
    "r2_range_join" -> (r2 _),
    "r3_interval_overlap" -> (r3 _)
  )

  val oracles: Map[String, String] = Map(
    "r1_asof_join" -> """
      SELECT user_id, event_id, ts, prev_click_id, prev_click_value FROM (
        SELECT user_id, event_id, ts, event_type,
          last_value(CASE WHEN event_type='click' THEN event_id END IGNORE NULLS)
            OVER w AS prev_click_id,
          last_value(CASE WHEN event_type='click' THEN value END IGNORE NULLS)
            OVER w AS prev_click_value
        FROM events
        WINDOW w AS (PARTITION BY user_id
          ORDER BY ts, (event_type='click') DESC, event_id
          ROWS UNBOUNDED PRECEDING)
      ) WHERE event_type = 'error'""",
    "r2_range_join" -> """
      WITH bands AS (
        SELECT i AS band, i * 75000.0 AS lo, (i+1) * 75000.0 AS hi
        FROM generate_series(0, 7) t(i))
      SELECT band, count(*) AS cnt, floor(sum(o_totalprice)*100 + 0.5)/100 AS sum_price
      FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band""",
    "r3_interval_overlap" -> """
      WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS st,
                   epoch_us(ts) + 300000000 AS en FROM events)
      SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id
      FROM e a JOIN e b ON a.user_id = b.user_id
        AND a.event_id < b.event_id
        AND a.st <= b.en AND b.st <= a.en"""
  )
}
