package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.{md5Long, roundFp}

/** Deterministic sampling / splitting for dataset curation — the
  * operators a training-data pipeline runs on every corpus refresh.
  *
  * All sampling here is HASH-based, not RNG-based, which is the only
  * form that behaves at 100 TB: the decision for a row is a pure
  * function of its key, so it is reproducible across runs, stable
  * under repartitioning/retries (an RNG sample changes when a task is
  * re-executed), consistent across tables (joining two tables sampled
  * on the same key keeps matching rows together), and exactly
  * replayable by the DuckDB oracle. `TABLESAMPLE`/`df.sample` trade
  * all of that for nothing at this scale.
  *
  * The hash is the engine's md5 family; `bucket(k, n)` = md5Long(key)
  * mod n is uniform over buckets for any key distribution.
  */
object SampleOps {

  private def bucket(key: Column, n: Int): Column = md5Long(key) % n

  /** sm1 — stratified sampling: per-stratum keep-rates (heavy
    * downsample of over-represented event types, light of rare ones).
    * One narrow filter — no shuffle at all; the sample rate per
    * stratum is exact in expectation and deterministic in fact. */
  private def sm1(s: SparkSession, d: String): DataFrame = {
    val rate = when(col("event_type") === "click", 50)   // 5%
      .when(col("event_type") === "view", 100)           // 10%
      .otherwise(500)                                    // 50%
    Tables.events(s, d)
      .filter(bucket(col("event_id"), 1000) < rate)
      .select(col("event_id"), col("event_type"), col("user_id"))
  }

  /** sm2 — train/val/test split assignment (80/10/10 by key hash) with
    * per-(source, split) counts: the split label is a pure function of
    * doc_id, so every run, every table joined on doc_id, and the
    * oracle all agree on membership. */
  private def sm2(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("split",
        when(bucket(col("doc_id"), 100) < 80, "train")
          .when(bucket(col("doc_id"), 100) < 90, "val")
          .otherwise("test"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("cnt"))

  /** sm3 — mixture weighting: per-source sampling rates implementing a
    * target corpus mixture (e.g. upweight rare high-quality sources by
    * keeping them whole, downsample bulk sources). Same hash filter,
    * rates driven by a small map — at scale the map is a broadcast
    * config, the pass stays narrow. */
  private def sm3(s: SparkSession, d: String): DataFrame = {
    val rate = when(col("source").isin("src0", "src1"), 1000) // keep all
      .when(col("source") === "src2", 250)                    // 25%
      .otherwise(100)                                         // 10%
    Tables.documents(s, d)
      .filter(bucket(col("doc_id"), 1000) < rate)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept"))
  }

  /** sm4 — per-group cap (balanced downsampling): keep at most K docs
    * per source, selected by HASH order — "no source dominates the
    * mixture" with a hard per-group budget, the companion to sm3's
    * rate-based weighting. Hash order makes the kept set a pure
    * function of the data (reproducible, retry-stable), not of
    * partition layout. One shuffle on source; the rank is a bounded
    * per-key top-k, and with a `filter(rn <= K)` directly over the
    * window Spark never materializes more than the group's rows. */
  private def sm4(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(md5Long(col("doc_id")).asc, col("doc_id").asc)))
      .filter(col("rn") <= 15)
      .select(col("source"), col("doc_id"), col("rn"))
  }

  /** sm5 — fixed-size global sample: exactly K rows, chosen by hash
    * order — the deterministic replacement for reservoir sampling.
    * orderBy+limit plans as TakeOrderedAndProject: each task keeps a
    * K-row heap, the driver merges P heaps — no global sort, no RNG
    * state, and the selected set is a pure function of the data
    * (identical across retries, partitionings, and engines — an actual
    * reservoir depends on arrival order, which a distributed retry
    * does not preserve). */
  private def sm5(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), md5Long(col("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(100)
      .select(col("doc_id"), col("source"))

  /** sm6 — temperature-mixture upsampling: the "epochs per source"
    * operator of a pretraining data recipe. Target mixture share of
    * source s is proportional to q_s * n_s^tau (a config quality
    * weight times the temperature-flattened size); its repeat factor
    * is rep_s = share_s * N / n_s — sources above their target are
    * kept fractionally (downsample), rare high-quality sources are
    * repeated for multiple epochs (upsample). Fractional parts are
    * realized by the usual hash gate: every doc emits floor(rep)
    * copies, plus one more iff md5(doc_id) mod 1e6 clears the
    * ppm-quantized fraction — so the mix is exact in expectation and
    * a pure function of the data (retry-stable, oracle-replayable).
    *
    * Shape at scale: the per-source count is a ~|sources|-row
    * aggregate; rep factors join back as a BROADCAST (a mixture
    * config is always tiny); the copy expansion happens inside the
    * partition via explode over a 1..copies sequence, so the only
    * wide exchanges are two skinny aggs. rep is quantized to 6
    * decimals with roundFp (floor(x*1e6+0.5)/1e6 — the repo-wide
    * portable rounding; bare round() is banker's/HALF_UP-divergent
    * between engines within an ulp of a .5 boundary) BEFORE the gate
    * derives from it, pinning the engine and the oracle to the same
    * ppm threshold regardless of float summation order. Output here
    * is the (source, epoch) census; the production
    * form writes the exploded corpus instead of aggregating it. */
  private def sm6(s: SparkSession, d: String): DataFrame = {
    val tau = 0.5
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val quality = when(col("source").isin("src0", "src1", "src2"), 6.0)
      .when(col("source").isin("src3", "src4", "src5", "src6", "src7",
        "src8", "src9"), 2.0)
      .otherwise(1.0)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
    val weighted = counts.withColumn("w", quality * pow(col("ns"), tau))
    // corpus totals as unpartitioned window sums over the
    // |sources|-row rate relation: one pass, one scan — a separate
    // agg+crossJoin would re-plan the counts subtree per consumer
    // (the ReuseExchange-defeat shape ScanCountSpec pins)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val reps = weighted
      .withColumn("rep",
        roundFp(col("w") / sum(col("w")).over(all) *
          sum(col("ns")).over(all) / col("ns"), 6))
      .withColumn("whole", floor(col("rep")).cast("long"))
      .withColumn("frac_ppm",
        floor((col("rep") - floor(col("rep"))) * 1000000 + 0.5)
          .cast("long"))
      .select(col("source"), col("whole"), col("frac_ppm"))
    docs.join(broadcast(reps), Seq("source"))
      .withColumn("copies", col("whole") +
        when(md5Long(col("doc_id")) % 1000000 < col("frac_ppm"), 1L)
          .otherwise(0L))
      .filter(col("copies") >= 1)
      .select(col("source"),
        explode(sequence(lit(1L), col("copies"))).as("epoch"))
      .groupBy(col("source"), col("epoch"))
      .agg(count(lit(1)).as("cnt"))
  }

  private val SM7_SAMPLES = 100L
  private val SM7_BUCKETS = 1024L

  /** sm7 — systematic LENGTH-WEIGHTED sampling: lay a grid of
    * SM7_SAMPLES equally-spaced points over the cumulative-character
    * axis and keep every document a grid point lands in. Selection
    * probability is proportional to length (the token-budget-correct
    * way to subsample a corpus for costing/eval), any document longer
    * than the step is ALWAYS kept, and the whole decision is integer
    * arithmetic on an exact prefix sum — reproducible, retry-stable,
    * and replayable by the oracle, the same reasons the rest of this
    * module refuses RNG.
    *
    * The interesting part at 100 TB is the GLOBAL prefix sum. A
    * window over a global ORDER BY collapses to one task, so this
    * runs the classic two-level scan instead:
    *   1. bucket docs by contiguous id range (width ≈ N/SM7_BUCKETS);
    *   2. per-bucket totals (one narrow partial-aggregated shuffle),
    *      then the EXCLUSIVE scan over the ≤SM7_BUCKETS bucket totals
    *      — a tiny single-partition window (same bounded-dimension
    *      pattern as w8's percentile row) broadcast back;
    *   3. within-bucket inclusive window + broadcast offset = exact
    *      global cumsum; rows shuffle once, keyed by bucket, and
    *      nothing wide ever crosses an exchange.
    * Deeper corpora recurse the same construction (scan of scans);
    * one level covers 10^9 docs per 10^6-wide bucket, and the fixture
    * widths degrade gracefully (width 1 at small N). */
  private def sm7(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars").as("w"))
    val width = math.max(1L, docs.count() / SM7_BUCKETS)
    val b = docs.withColumn("bucket", expr(s"doc_id div $width"))
    val totals = b.groupBy(col("bucket")).agg(sum(col("w")).as("bw"))
    // one pass over the tiny totals table yields BOTH broadcast
    // dimensions: the exclusive bucket offset and the grand total
    // (full-frame sum in the same single-partition window), so the
    // bucket-totals branch has exactly one consumer
    val offs = totals
      .withColumn("off",
        coalesce(sum(col("bw")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("tot", sum(col("bw")).over(Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("bucket"), col("off"),
        expr(s"tot div $SM7_SAMPLES").as("step"))
    b.join(broadcast(offs), Seq("bucket"))
      .withColumn("cum", col("off") +
        sum(col("w")).over(Window.partitionBy(col("bucket"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_hits",
        expr("(cum div step) - ((cum - w) div step)"))
      .filter(col("n_hits") >= 1)
      .select(col("doc_id"), col("w"), col("cum"), col("n_hits"))
  }

  /** dsir1's report size — the selected-set cut. */
  private val DSIR_TOP = 100

  /** dsir1 — importance-weighted domain selection (the DSIR recipe:
    * Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): score every document by how much more
    * likely its unigrams are under the TARGET domain (source `src0`)
    * than under the general corpus, and keep the top scorers — the
    * standard trick for tilting a web-scale corpus toward a
    * high-quality domain without training a classifier.
    *
    * score(doc) = Σ_term tf · (ilog2(ppm_target+1) − ilog2(ppm_all+1))
    *
    * with ppm the exact integer per-mille-of-a-million unigram rate
    * in each LM and ilog2 the integer log2 (`length(bin(x))-1`, the
    * cls2 trick) — all-integer arithmetic end to end, so scores are
    * bit-identical cross-engine with no libm log.
    *
    * Plan at 100 TB: the per-(doc, term) tf relation is built ONCE
    * and cached (the x10/x12 single-subtree invariant) for its two
    * consumers: the LM branch and the scoring join. BOTH unigram LMs
    * ride ONE vocabulary-keyed aggregation — the target count is a
    * conditional sum on the same (term) key, so there is no second
    * vocab agg and no second scoring join; a term absent from the
    * target domain gets ppm 0 ⇒ ilog2(0+1) = 0, exactly the
    * smoothing the two-table formulation would need a null-coalesce
    * for. The combined (term, llr) table joins back on the term key
    * with NO hint — AQE broadcasts it when it fits, degrades to a
    * term-keyed merge join when a web-scale vocabulary doesn't (the
    * x10 adjudication). The final cut is TakeOrderedAndProject.
    * Totals ride a 1-row broadcast cross join. */
  private def dsir1(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import graft.functions.Fns.md5LongLocal
    import s.implicits._
    // per-doc tf in the scan kernel (r16, the pipe5/x12/ppl1 hashmap
    // pattern): a doc is one row, so its counts complete in-task and
    // occurrence rows never exist; term identity is the 60-bit md5
    // (the x13 collision class — the oracle hashes the same prefix),
    // so every exchange and join key below is an 8-byte long.
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.flatMap { case (id, src, text) =>
        val t = text.split(" ", -1)
        val m = scala.collection.mutable.HashMap.empty[Long, Long]
        var i = 0
        while (i < t.length) {
          val h = md5LongLocal(t(i))
          m.update(h, m.getOrElse(h, 0L) + 1L)
          i += 1
        }
        m.iterator.map { case (h, n) => (id, src, h, n) }
      })
      .toDF("doc_id", "source", "hterm", "tf")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lms = tf.groupBy(col("hterm"))
      .agg(sum(col("tf")).as("c_all"),
        sum(when(col("source") === "src0", col("tf")).otherwise(0L))
          .as("c_t"))
    val tot = lms.agg(sum(col("c_all")).as("tot_all"),
      sum(col("c_t")).as("tot_t"))
    val llr = lms.crossJoin(broadcast(tot))
      .select(col("hterm"),
        ((length(bin(expr("(1000000 * c_t) div tot_t") + 1)) - 1) -
          (length(bin(expr("(1000000 * c_all) div tot_all") + 1)) - 1))
          .as("llr"))
    tf.join(llr, Seq("hterm"))
      .select(col("doc_id"), col("source"),
        (col("tf") * col("llr")).as("contrib"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("contrib")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(DSIR_TOP)
  }

  /** sm8 — class-balanced downsample: every lang keeps exactly
    * k = min-class-size docs, selected in md5-hash order (ties by
    * doc_id) — the classic rebalancing step before training a
    * classifier on skewed labels (cls1/cls5's lang classes run 42–63
    * per 500 at sf0.001; this equalizes them deterministically). The
    * hash-order selection is the sm4 cap rule applied with a
    * DATA-DERIVED k instead of a constant.
    *
    * Scale shape: one ≤|langs|-row count agg (broadcast back as a
    * 1-row min), one lang-keyed rank window over the 2-column pruned
    * projection, narrow filter — the sm4/sm6 shape. */
  private def sm8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val k = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("k"))
    docs
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang"))
          .orderBy(md5Long(col("doc_id")).asc, col("doc_id").asc)))
      .crossJoin(broadcast(k))
      .filter(col("rk") <= col("k"))
      .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
  }

  /** sm9's sample size. Fixed-size by construction (the s1/cls3
    * constant-k convention) — a percentage target wouldn't broadcast
    * at 100 TB and isn't what a budgeted curation pass asks for. */
  private[graft] val SM9_K = 25

  /** sm9 — weighted sampling without replacement, weight ∝ token
    * count, in the HASH form that scales (Efraimidis–Spirakis 2006
    * reduced to integer weights): give every TOKEN an independent
    * uniform key `md5(doc:pos:wts)` and keep each doc's MINIMUM; the
    * doc with the overall smallest key is a weight-proportional draw
    * (P = n_i/N — it's whoever owns the minimum of N uniform keys),
    * and the K smallest min-keys are the without-replacement sample.
    * No floats, no RNG, no `pow(u, 1/w)` — the float-free form is
    * what makes the draw reproducible across runs/retries AND exactly
    * replayable by the oracle (the SampleOps md5 discipline; an
    * A-Res implementation with real exponentials could never
    * hash-match another engine).
    *
    * This is the curation primitive behind "sample a 25-doc eval
    * slice weighted by length" / "pick quality-weighted seeds":
    * weight by any nonnegative integer by exploding that many keys.
    *
    * Scale shape: the token explode partial-aggregates min/count
    * per doc map-side (scan-speed, no shuffle growth beyond |docs|),
    * and the top-K is a TakeOrderedAndProject — never a global
    * sort. */
  private def sm9(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        md5Long(concat(col("doc_id").cast("string"), lit(":"),
          col("pos").cast("string"), lit(":wts"))).as("key"))
      .groupBy(col("doc_id"))
      .agg(min(col("key")).as("min_key"), count(lit(1)).as("n_tokens"))
      .orderBy(col("min_key").asc, col("doc_id").asc)
      .limit(SM9_K)
      .select(col("doc_id"), col("n_tokens"), col("min_key"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sm9_weighted_sample" -> (sm9 _),
    "sm8_class_balance" -> (sm8 _),
    "dsir1_importance" -> (dsir1 _),
    "sm7_systematic_sample" -> (sm7 _),
    "sm6_temperature_mix" -> (sm6 _),
    "sm1_stratified_sample" -> (sm1 _),
    "sm2_split_assign" -> (sm2 _),
    "sm3_mixture_weights" -> (sm3 _),
    "sm4_group_cap" -> (sm4 _),
    "sm5_global_sample" -> (sm5 _)
  )

  private val H =
    "('0x' || substr(md5(%s::VARCHAR),1,15))::BIGINT"

  val oracles: Map[String, String] = Map(
    // same per-token md5 keys (0-based positions), same min-per-doc,
    // same (min_key, doc_id) top-K order
    "sm9_weighted_sample" -> s"""
      WITH l AS (SELECT doc_id, len(string_split(text, ' ')) AS n
                 FROM documents),
      k AS (SELECT doc_id, n,
              list_min(list_transform(generate_series(0, n - 1), p ->
                ('0x' || substr(md5(doc_id::VARCHAR || ':' ||
                  p::VARCHAR || ':wts'), 1, 15))::BIGINT)) AS min_key
            FROM l)
      SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, min_key
      FROM k ORDER BY min_key ASC, doc_id ASC LIMIT $SM9_K""",
    // same md5-order rank, same data-derived min-class k
    "sm8_class_balance" -> """
      WITH d AS (SELECT doc_id, lang FROM documents),
      k AS (SELECT min(n) AS k FROM (
              SELECT lang, count(*) AS n FROM d GROUP BY 1)),
      r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
              ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                doc_id) AS rk
            FROM d)
      SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
      FROM r, k WHERE rk <= k.k""",
    // all-integer DSIR: ppm rates via floor division, integer log2
    // via bin() length (both engines print minimal-width binary)
    "dsir1_importance" -> s"""
      WITH tf AS (SELECT doc_id, source, hterm, count(*) AS tf FROM
              (SELECT doc_id, source,
                 ('0x' || substr(md5(unnest(string_split(text, ' '))),
                   1, 15))::BIGINT AS hterm
               FROM documents)
            GROUP BY 1, 2, 3),
      tt AS (SELECT CAST(sum(tf) AS BIGINT) AS tot FROM tf
             WHERE source = 'src0'),
      tc AS (SELECT hterm, CAST(sum(tf) AS BIGINT) AS c FROM tf
             WHERE source = 'src0' GROUP BY 1),
      tl AS (SELECT hterm, length(bin((1000000 * c) // tot + 1)) - 1 AS l2t
             FROM tc, tt),
      at2 AS (SELECT CAST(sum(tf) AS BIGINT) AS tot FROM tf),
      ac AS (SELECT hterm, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      al AS (SELECT hterm, length(bin((1000000 * c) // tot + 1)) - 1 AS l2c
             FROM ac, at2),
      sc AS (SELECT doc_id, source,
               tf * (coalesce(l2t, 0) - l2c) AS contrib
             FROM tf LEFT JOIN tl USING (hterm) JOIN al USING (hterm))
      SELECT doc_id, source, CAST(sum(contrib) AS BIGINT) AS score
      FROM sc GROUP BY 1, 2
      ORDER BY score DESC, doc_id LIMIT $DSIR_TOP""",
    // the oracle states the SEMANTICS (one flat window cumsum); the
    // engine's two-level scan must reproduce it exactly — integer
    // arithmetic end to end, HUGEINT window sums pinned to BIGINT
    "sm7_systematic_sample" -> """
      WITH d AS (SELECT doc_id, n_chars AS w FROM documents),
      p AS (SELECT doc_id, w,
              CAST(sum(w) OVER (ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM d),
      s AS (SELECT CAST(sum(w) AS BIGINT) // 100 AS step FROM d)
      SELECT doc_id, w, cum,
        (cum // s.step) - ((cum - w) // s.step) AS n_hits
      FROM p, s
      WHERE (cum // s.step) - ((cum - w) // s.step) >= 1""",
    "sm1_stratified_sample" -> s"""
      SELECT event_id, event_type, user_id FROM events
      WHERE ${H.format("event_id")} % 1000 <
        CASE WHEN event_type = 'click' THEN 50
             WHEN event_type = 'view' THEN 100 ELSE 500 END""",
    "sm2_split_assign" -> s"""
      WITH a AS (SELECT source,
        CASE WHEN ${H.format("doc_id")} % 100 < 80 THEN 'train'
             WHEN ${H.format("doc_id")} % 100 < 90 THEN 'val'
             ELSE 'test' END AS split
        FROM documents)
      SELECT source, split, count(*) AS cnt FROM a GROUP BY source, split""",
    "sm3_mixture_weights" -> s"""
      SELECT source, count(*) AS kept FROM documents
      WHERE ${H.format("doc_id")} % 1000 <
        CASE WHEN source IN ('src0', 'src1') THEN 1000
             WHEN source = 'src2' THEN 250 ELSE 100 END
      GROUP BY source""",
    "sm4_group_cap" -> s"""
      SELECT source, doc_id, rn FROM (
        SELECT source, doc_id, row_number() OVER (PARTITION BY source
          ORDER BY ${H.format("doc_id")}, doc_id) AS rn
        FROM documents)
      WHERE rn <= 15""",
    "sm5_global_sample" -> s"""
      SELECT doc_id, source FROM documents
      ORDER BY ${H.format("doc_id")}, doc_id LIMIT 100""",
    "sm6_temperature_mix" -> s"""
      WITH n AS (SELECT source, count(*) AS ns FROM documents
                 GROUP BY source),
      w AS (SELECT source, ns,
              CASE WHEN source IN ('src0','src1','src2') THEN 6.0
                   WHEN source IN ('src3','src4','src5','src6','src7',
                                   'src8','src9') THEN 2.0
                   ELSE 1.0 END * pow(ns, 0.5) AS w FROM n),
      tot AS (SELECT sum(ns) AS bign, sum(w) AS sumw FROM w),
      r AS (SELECT source, ns,
              floor(w / sumw * bign / ns * 1000000 + 0.5) / 1000000
                AS rep FROM w, tot),
      g AS (SELECT source, CAST(floor(rep) AS BIGINT) AS whole,
              CAST(floor((rep - floor(rep)) * 1000000 + 0.5) AS BIGINT)
                AS frac_ppm FROM r),
      c AS (SELECT d.source, g.whole +
              CASE WHEN ${H.format("d.doc_id")} % 1000000 < g.frac_ppm
                   THEN 1 ELSE 0 END AS copies
            FROM documents d JOIN g USING (source)),
      e AS (SELECT source, unnest(generate_series(1, copies)) AS epoch
            FROM c WHERE copies >= 1)
      SELECT source, epoch, count(*) AS cnt FROM e
      GROUP BY source, epoch"""
  )
}
