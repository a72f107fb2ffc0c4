package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.{md5Long, md5LongSeeded, roundFp}

/** Analytics-completeness operators beyond the reference surface —
  * grouping sets, pivot, quantiles, and the sketch-based distinct the
  * 100 TB path actually uses. All partial+final aggregations; rollup /
  * cube add grouping-set expansion before the same hash agg.
  */
object AnalyticsOps {

  /** g1 — rollup: per (flag, status) + per-flag + grand totals in one
    * pass. Quantities are integral-valued doubles, so sums are exact
    * across engines. */
  private def g1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))

  /** g2 — cube over two order dimensions. */
  private def g2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))

  /** g3 — pivot: line status columns per return flag (explicit pivot
    * values — at scale an implicit pivot would add a distinct pass). */
  private def g3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .count()

  /** g4 — exact interpolated quantiles of order price (both engines:
    * linear interpolation at (n-1)p over the sorted values). ONE
    * percentile agg computes all three; the final projection unwraps
    * them into scalar q25/q50/q75 columns — the harness contract
    * (OutputContractSpec): an array column only survived r9's gate by
    * the single-row accident, and double→string joins are formatting-
    * fragile across engines, so scalars beat strJoin here. */
  private def g4(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .agg(percentile(col("o_totalprice"),
        array(lit(0.25), lit(0.5), lit(0.75))).as("qs"))
      .select(roundFp(element_at(col("qs"), 1), 4).as("q25"),
        roundFp(element_at(col("qs"), 2), 4).as("q50"),
        roundFp(element_at(col("qs"), 3), 4).as("q75"))

  /** Accuracy gate for the sketch verdicts (g5/g7/g10): the estimate
    * must land within 50 000 ppm (5%) of the exact twin. For g5's
    * rsd = 0.02 HLL++ and g10's lgK = 12 HLL (RSE ≈ 1.6%) that is a
    * 2.5–3σ envelope — deterministic per dataset (the sketches are
    * seed-free), and generous enough to hold at every sf without ever
    * being vacuous. */
  private[graft] val SKETCH_BOUND_PPM = 50000L

  /** g5 — HyperLogLog distinct (the 100 TB form of a1), restructured
    * (VERDICT r10 #1) so the driver machine-checks it: the raw
    * estimate is engine-specific and can never hash-match another
    * engine, so the QUERY OUTPUT is the exact twin plus a
    * deterministic bound VERDICT (estimate within [[SKETCH_BOUND_PPM]]
    * of exact, 1/0 as BIGINT — the repo's numeric-verdict
    * convention). The oracle computes the exact side and the literal
    * verdict; a sketch drifting out of its declared envelope now
    * breaks the hash instead of hiding behind a rows-only check. The
    * tighter rsd law stays in the spec (DocumentSinksSpec).
    *
    * Scale shape: both aggregates ride ONE partial+final pass over a
    * single pruned column; at 100 TB a user drops the exact twin and
    * keeps the sketch — the verdict column is the validation harness,
    * not the serve path. */
  private def g5(s: SparkSession, d: String): DataFrame =
    // distinct FIRST, then both aggregates over the distinct keys: a
    // distinct agg NEXT TO a plain agg plans an Expand that doubles
    // the input rows before the exchange — measured 9.6× on the
    // second decade of the ×100 probe (60M rows → 120M expanded).
    // The HLL sketch of a set equals the sketch of the multiset
    // (duplicate insertions hit the same registers), so estimate and
    // exact twin are unchanged; the plan is now partial+final
    // distinct (map-side combine on the key) + a 1-row agg. The
    // isNotNull keeps the rewrite EXACTLY equivalent to the
    // aggregate-distinct form it replaced (ADVICE r14: countDistinct
    // ignores NULL, count(lit(1)) over distinct() would count a NULL
    // row — benign on this non-null FK, pinned anyway).
    Tables.lineitem(s, d)
      .select(col("l_partkey")).filter(col("l_partkey").isNotNull)
      .distinct()
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx"),
        count(lit(1)).as("exact_parts"))
      .select(col("exact_parts"),
        (expr("(1000000 * abs(approx - exact_parts)) div exact_parts")
          <= SKETCH_BOUND_PPM).cast("long").as("within_bound"))

  /** g10's HLL precision (Datasketches lgConfigK: 2^12 buckets,
    * ~1.6% RSE — the warehouse default trade of 4 KB per sketch for
    * percent-level distinct counts). */
  private[graft] val G10_LGK = 12

  /** g10 — distinct-count sketches as DATA (the capability g5 only
    * hints at): per-type HLL sketches of the user audience built with
    * `hll_sketch_agg`, re-aggregated WITHOUT returning to the raw
    * events via `hll_union_agg` — the mergeable-sketch contract that
    * makes 100 TB rollup cubes cheap (store one 4 KB sketch per cell;
    * any marginal is a union of sketches, never a re-scan). Output:
    * per-type exact twin plus a bound VERDICT on the estimate, with
    * the ALL row's estimate coming ONLY from merging the per-type
    * sketches; the spec pins the union-merge law (merged ≡ one sketch
    * built over everything) and the tighter error bound. Oracle
    * (VERDICT r10 #1): the raw estimate is engine-specific, so the
    * output carries `exact` + `within_bound` (estimate within
    * [[SKETCH_BOUND_PPM]] of exact, 1/0 BIGINT) and the oracle
    * computes the exact side with the literal verdict — the driver
    * now machine-checks the sketch's envelope every round.
    *
    * Scale shape: one partial-aggregated groupBy per type (sketches
    * merge map-side — that IS the point), a ≤|types|-row union agg,
    * and the exact twins for validation (countDistinct per type in
    * the same pass; one extra pruned scan for the global twin, the
    * dq2 two-table-audit adjudication). At 100 TB the twins are the
    * first thing a user drops; the sketch path never touches them. */
  private def g10(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"), col("user_id"))
    val perType = ev.groupBy(col("event_type"))
      .agg(expr(s"hll_sketch_agg(user_id, $G10_LGK)").as("sk"),
        countDistinct(col("user_id")).as("exact"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = perType
      .select(col("event_type"),
        expr("hll_sketch_estimate(sk)").as("est"), col("exact"))
    val all = perType
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .crossJoin(broadcast(
        ev.agg(countDistinct(col("user_id")).as("exact"))))
      .select(lit("ALL").as("event_type"), col("est"), col("exact"))
    rows.unionByName(all)
      .select(col("event_type"), col("exact"),
        (expr("(1000000 * abs(est - exact)) div exact")
          <= SKETCH_BOUND_PPM).cast("long").as("within_bound"))
  }

  /** g11's Count-Min geometry: [[CMS_D]] hash rows × [[CMS_W]]
    * buckets. Width 16 is DELIBERATELY under the corpus vocabulary
    * (31 terms) so collisions — the thing the sketch's min-over-rows
    * exists to survive — actually occur and the error column is a
    * real measurement, not a column of zeros; production widths are
    * ~e/ε buckets for an additive-εN guarantee. */
  private[graft] val CMS_D = 4
  private[graft] val CMS_W = 16

  /** g11 — Count-Min point-frequency sketch (Cormode & Muthukrishnan
    * 2005) with its error audited against exact counts: completes the
    * mergeable-sketch shelf — g5/g10 answer "how many DISTINCT", g9
    * answers "which keys are frequent", this answers "how frequent is
    * key k" from [[CMS_D]]·[[CMS_W]] counters regardless of corpus
    * size. Counters are plain SUMS, so sketches merge across
    * partitions, days, or streams by cell-wise addition (the g10
    * mergeability contract — a 100 TB deployment keeps one tiny
    * sketch per shard/day and unions them, never re-scans). The
    * estimate for a key is min over the [[CMS_D]] rows of its bucket
    * counter; over_cnt = est − exact ≥ 0 ALWAYS (one-sided error —
    * each bucket holds the true count plus colliding mass), which the
    * spec pins as a law and the report surfaces per key.
    *
    * Hash family: the engine's standard seeded md5 ("r:tok" —
    * the MinHash/LSH foundation, portable bit-for-bit to DuckDB), so
    * the sketch is deterministic and the oracle replays mechanism +
    * estimator end-to-end (the an4 derandomization discipline).
    *
    * Scale shape: the sketch pass explodes tokens ×[[CMS_D]] seeds
    * and partial-aggregates to ≤D·W cells map-side — the exchange
    * carries |tasks|·64 narrow rows at ANY corpus size. The exact
    * pass (top-10 by true count) is the x7 vocab-keyed agg with a
    * TakeOrderedAndProject head; at 100 TB a user swaps it for g9's
    * Misra-Gries candidates and keeps the sketch pass unchanged. The
    * probe join runs behind a broadcast of the 64-cell sketch. */
  private def g11(s: SparkSession, d: String): DataFrame = {
    def toksRel = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    val sketch = toksRel
      .select(col("tok"),
        explode(sequence(lit(0), lit(CMS_D - 1))).as("r"))
      .select(col("r"),
        (md5LongSeeded(col("r"), col("tok")) % CMS_W).as("b"))
      .groupBy(col("r"), col("b")).agg(count(lit(1)).as("c"))
    toksRel.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(10)
      .select(col("tok"), col("cnt"),
        explode(sequence(lit(0), lit(CMS_D - 1))).as("r"))
      .select(col("tok"), col("cnt"), col("r"),
        (md5LongSeeded(col("r"), col("tok")) % CMS_W).as("b"))
      .join(broadcast(sketch), Seq("r", "b"))
      .groupBy(col("tok"), col("cnt"))
      .agg(min(col("c")).as("est"))
      .select(col("tok"), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("over_cnt"))
  }

  /** g12's configuration sweep: the (depth, width) pairs the error
    * curve measures — one axis varying depth at g11's width, one
    * varying width at g11's depth. Widths divide [[G12_WMAX]] so the
    * whole sweep derives from ONE sketch pass (see [[g12]]). */
  private[graft] val G12_CFGS =
    Seq((1, 16), (2, 16), (4, 16), (4, 8), (4, 32), (4, 64))
  private[graft] val G12_WMAX = 64

  /** g12 — the Count-Min width/depth-vs-error curve (VERDICT r10 #5:
    * turn g11's geometry from a documented assumption into a measured
    * number, the an6/d14/er4 discipline): for every [[G12_CFGS]]
    * (d, w) pair, the total and max over-count on g11's probe set —
    * the curve a deployment reads to size its sketch (theory: E[over]
    * ≈ N/w per row, min over d rows tightens tails; the measured rows
    * show exactly that shape, and the spec pins the monotonicity laws
    * — over-count non-increasing in both d and w ON THE SAME
    * STREAM... w-monotonicity only in expectation, so the spec pins
    * the d-axis law which holds pointwise by min-over-more-rows).
    *
    * ONE sketch pass serves the whole sweep: every width in the sweep
    * divides [[G12_WMAX]], so a width-w cell is the SUM of the
    * width-64 cells with b64 ≡ b (mod w) — hash once at w = 64,
    * derive every coarser sketch by re-aggregation ((h mod 64) mod w
    * = h mod w when w | 64). That is the g10 mergeability contract
    * on the width axis.
    *
    * Scale shape: the token explode ×[[CMS_D]] partial-aggregates to
    * ≤ D·64 cells map-side (g11's exchange, one extra bucket byte);
    * everything downstream — config cross, probe coords, the curve
    * itself — is over ≤ |cells|·|cfgs| broadcast-sized relations.
    * The exact probe pass is g11's vocab-keyed top-10. */
  private def g12(s: SparkSession, d: String): DataFrame = {
    def toksRel = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
    val cells = toksRel
      .select(col("tok"),
        explode(sequence(lit(0L), lit(CMS_D - 1L))).as("r"))
      .select(col("r"),
        (md5LongSeeded(col("r"), col("tok")) % G12_WMAX).as("b64"))
      .groupBy(col("r"), col("b64")).agg(count(lit(1)).as("c"))
    val cfgs = {
      import s.implicits._
      G12_CFGS.toDF("cd", "cw")
        .select(col("cd").cast("long"), col("cw").cast("long"))
    }
    // derive each (d, w) sketch from the width-64 cells
    val cellsCfg = cells.join(broadcast(cfgs))
      .filter(col("r") < col("cd"))
      .groupBy(col("cd"), col("cw"), col("r"),
        (col("b64") % col("cw")).as("b"))
      .agg(sum(col("c")).as("c"))
    val coords = toksRel.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc).limit(10)
      .join(broadcast(cfgs))
      .select(col("cd"), col("cw"), col("tok"), col("cnt"),
        explode(sequence(lit(0L), col("cd") - 1)).as("r"))
      .select(col("cd"), col("cw"), col("tok"), col("cnt"), col("r"),
        (md5LongSeeded(col("r"), col("tok")) % G12_WMAX % col("cw"))
          .as("b"))
    coords.join(broadcast(cellsCfg), Seq("cd", "cw", "r", "b"))
      .groupBy(col("cd"), col("cw"), col("tok"), col("cnt"))
      .agg(min(col("c")).as("est"))
      .groupBy(col("cd").as("d"), col("cw").as("w"))
      .agg(count(lit(1)).as("n_probes"),
        sum(col("cnt")).as("sum_cnt"),
        sum(col("est") - col("cnt")).as("over_total"),
        max(col("est") - col("cnt")).as("max_over"))
      .select(col("d"), col("w"), col("n_probes"), col("sum_cnt"),
        col("over_total"), col("max_over"),
        expr("(1000000 * over_total) div sum_cnt").as("over_ppm"))
  }

  /** g7's rank envelope: the approx value must lie between the exact
    * interpolated quantiles at p ± [[G7_EPS]]. approx_percentile with
    * accuracy 10 000 guarantees rank error ≤ n/10 000 = 0.0001·n, so
    * a ±0.005 rank window is a 50× slack — deterministic (the sketch
    * is seed-free) and safe at every sf with n ≥ ~200 rows. */
  private[graft] val G7_EPS = 0.005

  /** g7 — approximate quantiles (the 100 TB form of g4): a fixed-size
    * quantile sketch with declared accuracy, mergeable across
    * partitions — exact percentile holds all values per group, the
    * sketch holds O(1/ε). Restructured for the oracle (VERDICT r10
    * #1, same policy as g5/g10): sketch values are engine-specific,
    * so the output is g4's exact quartiles plus ONE bound verdict —
    * every approx quartile inside its [[G7_EPS]] rank envelope
    * (exact quantile at p−ε ≤ approx ≤ exact quantile at p+ε, the
    * rank-not-value bound the spec has always pinned; a value bound
    * would be distribution-dependent). Both aggs ride one pass; the
    * nine probe percentiles are one `percentile` call. */
  private def g7(s: SparkSession, d: String): DataFrame = {
    val ps = Seq(0.25, 0.5, 0.75)
    val probes = ps.flatMap(p => Seq(p - G7_EPS, p, p + G7_EPS))
    Tables.orders(s, d)
      .agg(percentile(col("o_totalprice"),
        array(probes.map(lit): _*)).as("qs"),
        approx_percentile(col("o_totalprice"),
          array(ps.map(lit): _*), lit(10000)).as("aq"))
      .select(roundFp(element_at(col("qs"), 2), 4).as("q25"),
        roundFp(element_at(col("qs"), 5), 4).as("q50"),
        roundFp(element_at(col("qs"), 8), 4).as("q75"),
        (1 to 3).map(i => element_at(col("aq"), i)
          .between(element_at(col("qs"), 3 * i - 2),
            element_at(col("qs"), 3 * i)))
          .reduce(_ && _).cast("long").as("within_bound"))
  }

  /** g6 — salted two-stage aggregation: the skew pattern for
    * low-cardinality group keys (5 event types over 100 TB would put
    * each key's entire partial state on one reducer). Stage 1 groups on
    * (key, salt) — here a deterministic salt from the row id so the
    * oracle reproduces it; in production `pmod(hash(...), N)` or a
    * random salt, both fine because stage 2 re-merges exactly. Stage 2
    * merges the N partials per key. Same result as the direct groupBy,
    * shuffle fan-out N× wider. */
  private def g6(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("c"), sum(col("value")).as("v"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("cnt"), roundFp(sum(col("v")), 2).as("sum_value"))

  /** g8 — GROUPING SETS ((flag),(status)): the grouping-set shape
    * rollup/cube can't express (two independent one-column rollouts in
    * a single pass instead of two scans + union). `grouping_id`
    * disambiguates which set produced a row — and real NULL group
    * values from set-induced NULLs. Physically identical to g1/g2: one
    * Expand then one partial+final hash agg. */
  private def g8(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("cnt"),
        sum(col("l_quantity")).as("sum_qty"))

  /** Misra–Gries summary capacity. The MG bound (and it survives
    * summary union): any key with global frequency > N/(cap+1) is
    * retained by at least one partition-local summary, so candidate
    * recall of the true top-k is DETERMINISTIC — a property sketches
    * like count-min only give probabilistically. 256 is generous for
    * the test vocabulary (it exceeds it, so recall is trivially
    * total); a 100 TB zipfian key space sizes cap ≈ k / head-share,
    * still constant memory per task. */
  private[graft] val MG_CAP = 256

  /** Partition-local Misra–Gries over a key stream: bounded-memory
    * candidate generation, the imperative decrement-all state machine
    * SQL aggregation cannot express (the documented kernel
    * justification — everything downstream of it is declarative). */
  private[graft] def misraGries(it: Iterator[String],
      cap: Int = MG_CAP): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for (tok <- it) {
      counts.get(tok) match {
        case Some(v) => counts(tok) = v + 1
        case None if counts.size < cap => counts(tok) = 1L
        case None =>
          val dead = List.newBuilder[String]
          for ((k, v) <- counts)
            if (v == 1L) dead += k else counts(k) = v - 1
          dead.result().foreach(counts.remove)
      }
    }
    counts.keysIterator
  }

  /** g9 — heavy hitters at summary cost, exact result: pass 1 runs
    * [[misraGries]] per partition over the token stream and ships
    * ONLY each partition's ≤[[MG_CAP]] candidate keys; pass 2 counts
    * candidates exactly behind a broadcast semi-join and takes the
    * top-10 (TakeOrderedAndProject). The wide exchanges carry
    * |partitions|×cap candidate rows, then |candidates| agg keys —
    * never the full key space. That is the 100 TB difference from
    * x7's plain groupBy: over an unbounded vocabulary (URLs,
    * shingles, n-grams) the full-vocab shuffle dominates; here the
    * summary is constant-size per task and the exact pass aggregates
    * a bounded candidate set. Result is exact, not approximate: the
    * MG bound guarantees every sufficiently-frequent key is a
    * candidate, and the second pass replaces estimates with true
    * counts — so the DuckDB oracle hash-matches. */
  private def g9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val candidates = Tables.documents(s, d)
      .select(col("text")).as[String]
      // split with limit -1 keeps trailing empty tokens, matching the
      // exact pass's SQL split / the oracle's string_split exactly —
      // one tokenization rule for both passes, or a key reachable only
      // via trailing separators could be counted but never proposed
      .mapPartitions(it => misraGries(it.flatMap(_.split(" ", -1))))
      .toDF("tok").distinct()
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(candidates), Seq("tok"), "leftsemi")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(10)
  }

  /** od1's robust z-score threshold: 3·1.4826 (the MAD-to-σ
    * consistency constant for normal data) — one double literal both
    * engines parse to the same IEEE value. */
  private val OD1_CUT = 4.4478

  /** od1 — robust outlier detection per event type: median + MAD
    * (median absolute deviation), flag |v − med| > 3·1.4826·MAD — the
    * standard robust z-score that a mean/stddev rule can't do (one
    * outlier inflates σ and hides itself; the median/MAD breakdown
    * point is 50%). The anomaly gate every metrics pipeline runs
    * before alerting/training on telemetry.
    *
    * Exactness: exact-percentile interpolation is the proven
    * quantile_cont pairing (w8/ppl1/g4); med, dev and MAD are pinned
    * at 6 dp before any comparison so a sub-ulp interpolation
    * difference can never flip a flag.
    *
    * Scale shape: two percentile aggregates on the |event-types|-sized
    * key (exact percentile is the oracle-parity choice; at 100 TB the
    * same plan runs approx_percentile — g7's documented swap), each
    * collapsing to a type-sized dimension broadcast back; the scored
    * relation persists spillable for its two consumers (MAD agg +
    * final flagging) so events scans once. */
  private def od1(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(roundFp(percentile(col("value"), lit(0.5)), 6).as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", roundFp(abs(col("value") - col("med")), 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = dev.groupBy(col("event_type"))
      .agg(roundFp(percentile(col("dev"), lit(0.5)), 6).as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"),
        (col("dev") > roundFp(col("mad") * OD1_CUT, 6)).as("is_out"))
  }

  /** an1's anonymity threshold: an equivalence class under the
    * quasi-identifiers must hold ≥ K individuals to publish. */
  private val AN1_K = 5

  /** an1 — k-anonymity audit with one-step generalization: group the
    * customer table by its quasi-identifiers (nation, market
    * segment); classes of ≥ K publish at level 0, smaller classes
    * generalize (drop the segment) and publish at level 1 if the
    * merged class reaches K, and whatever still can't reach K is
    * suppressed into one census row (level 2) — the release-audit
    * every PII-bearing training corpus needs before sharing.
    *
    * Scale shape: level 0 is one partial+final agg on the QI key;
    * levels 1–2 regroup the LEVEL-0 AGGREGATES (a |QI-classes|-sized
    * relation, never the data again) — the er1
    * aggregate-before-the-expensive-step principle, so the audit
    * costs one corpus scan no matter how many generalization rungs
    * the lattice has. */
  private def an1(s: SparkSession, d: String): DataFrame = {
    val g0 = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("qi_nation"),
        col("c_mktsegment").as("qi_segment"))
      .agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pub0 = g0.filter(col("n") >= AN1_K)
      .select(col("qi_nation"), col("qi_segment"),
        lit(0).as("anon_level"), col("n"))
    val rem = g0.filter(col("n") < AN1_K)
      .groupBy(col("qi_nation")).agg(sum(col("n")).as("n"))
    val pub1 = rem.filter(col("n") >= AN1_K)
      .select(col("qi_nation"), lit(null).cast("string").as("qi_segment"),
        lit(1).as("anon_level"), col("n"))
    // global agg over a possibly-empty relation yields one NULL-sum
    // row in both engines; the isNotNull filter drops it identically
    val supp = rem.filter(col("n") < AN1_K)
      .agg(sum(col("n")).as("n")).filter(col("n").isNotNull)
      .select(lit(null).cast("long").as("qi_nation"),
        lit(null).cast("string").as("qi_segment"),
        lit(2).as("anon_level"), col("n"))
    pub0.union(pub1).union(supp)
  }

  /** an2's diversity floor: an equivalence class must hold ≥ L
    * DISTINCT sensitive values to publish. */
  private val AN2_L = 3

  /** an2 — l-diversity audit, k-anonymity's (an1) stronger sibling:
    * a class can be k-anonymous yet leak everything if all k members
    * share the sensitive value (the homogeneity attack), so each
    * quasi-identifier class additionally needs ≥ L distinct sensitive
    * values. Sensitive attribute here: the account-balance band
    * (floor(acctbal/1000) — banded exactly, integer floor in both
    * engines). Output per class: size n, diversity l, and the publish
    * flag n ≥ K AND l ≥ L.
    *
    * Scale shape: one partial+final count-distinct-style agg on the
    * QI key — expressed as the exact two-level form ((QI, band)
    * groups, then QI groups counting bands) so the distinct collapses
    * map-side before the second shuffle; both aggregates are
    * class-count-sized, the data is scanned once. */
  private def an2(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_nationkey").cast("long").as("qi_nation"),
        col("c_mktsegment").as("qi_segment"),
        expr("CAST(floor(c_acctbal / 1000) AS BIGINT)").as("bal_band"))
      .groupBy(col("qi_nation"), col("qi_segment"), col("bal_band"))
      .agg(count(lit(1)).as("nb"))
      .groupBy(col("qi_nation"), col("qi_segment"))
      .agg(sum(col("nb")).as("n"), count(lit(1)).as("l"))
      .select(col("qi_nation"), col("qi_segment"), col("n"), col("l"),
        (col("n") >= AN1_K && col("l") >= AN2_L).as("publishable"))

  /** an3 — t-closeness audit (Li et al. '07), the third rung of the
    * privacy ladder after an1 (k-anonymity) and an2 (l-diversity): a
    * class can be k-anonymous AND l-diverse yet still leak through a
    * SKEWED sensitive distribution, so each class's distance to the
    * global sensitive distribution is bounded by t. Sensitive
    * attribute: the order priority (ordinally coded by its leading
    * digit — '1-URGENT'..'5-LOW', so lexical order IS the ordinal
    * order); classes: the customer market segment reached through
    * the orders⋈customer join. Distance is the ordered-category EMD
    * — Σ |cum_class − cum_global| over the priority ladder — in
    * exact integer ppm (floor-divided cumulative shares), so both
    * engines agree bit-for-bit with no float anywhere.
    *
    * The (segment × priority) grid is DENSIFIED from the observed
    * domains before the cumsum: a class missing a category still
    * accumulates the right cumulative share (a sparse cumsum would
    * silently skip ladder steps, understating the distance).
    *
    * Scale shape: the only corpus-sized work is the orders⋈customer
    * equi-join and one (segment, priority) count agg; everything
    * after (densify, windows, EMD) runs on the ≤ |segments|·|pris|
    * grid. */
  private def an3(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.orders(s, d)
      .select(col("o_custkey").as("ck"), col("o_orderpriority").as("pri"))
      .join(Tables.customer(s, d)
        .select(col("c_custkey").as("ck"), col("c_mktsegment").as("segment")),
        Seq("ck"))
      .groupBy(col("segment"), col("pri")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dense = counts.select(col("segment")).distinct()
      .crossJoin(counts.select(col("pri")).distinct())
      .join(counts, Seq("segment", "pri"), "left")
      .na.fill(0L, Seq("n"))
    val ladder = Window.partitionBy(col("segment"))
      .orderBy(col("pri").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the global ladder windows over ≤|priorities| grid rows — the
    // bounded-by-construction census pattern (SampleOps w8 note)
    val gLadder = Window.partitionBy(col("pri"))
    val gAll = Window.partitionBy()
    dense
      .withColumn("cum", sum(col("n")).over(ladder))
      .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("segment"))))
      .withColumn("gcum", sum(col("cum")).over(gLadder))
      .withColumn("gtot", sum(col("n")).over(gAll))
      .select(col("segment"), col("tot").as("n_orders"),
        expr("""abs((1000000 * cum) div tot
                  - (1000000 * gcum) div gtot)""").as("step"))
      .groupBy(col("segment"), col("n_orders"))
      .agg(sum(col("step")).as("t_emd_ppm"))
  }

  /** dq1 — referential-integrity audit over the four core FK edges
    * (orders→customer, lineitem→orders, lineitem→part,
    * lineitem→supplier): child rows whose key has no parent, as a
    * count and ppm rate per edge. Every serious ingest pipeline runs
    * exactly this after a load — silently dangling FKs turn inner
    * joins into row loss downstream — and a clean corpus proves
    * itself with four zero rows rather than by assumption.
    *
    * Scale shape: each edge pre-aggregates the child to (key, row
    * count) — map-side combine collapses the exchange to DISTINCT
    * child keys — then left-joins the DISTINCT parent key and sums
    * cnt under a null-parent flag; n_rows is Σcnt off the SAME
    * relation, so no audit re-touches child rows after its one agg.
    * The four audits are independent branches unioned at 4 rows; at
    * extreme scale the parent side additionally downgrades to the j7
    * bloom-prefilter form with the same semantics. */
  private def dq1(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // The fact tables are read ONCE as pruned key projections and
    // persisted: the naive form paid 6 lineitem reads (3 audits ×
    // child + count) and 3 orders reads, which the standing ×10 gate
    // flagged at 3.05×/decade — sharing the projections makes the
    // audit pay each table's scan exactly once (the r10 probe fix).
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .persist(StorageLevel.MEMORY_AND_DISK) // 3 audits
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"))
      .persist(StorageLevel.MEMORY_AND_DISK) // child + parent + count
    // Each audit pre-aggregates the child to (key, row-count): the
    // partial agg combines map-side, so the probe exchange carries
    // DISTINCT child keys instead of every child row (the ×10 gate
    // measured the row-level anti-join at 3.1×/decade — this is the
    // dq1 shuffle-volume fix), and the same aggregated relation
    // yields n_rows as Σcnt — no separate count branch. The orphan
    // test becomes a left join + null flag over key-sized sides.
    def audit(edge: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame =
      child.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt"))
        .join(parent.select(col(pkey).as("k")).distinct()
          .withColumn("hit", lit(1L)), Seq("k"), "left")
        .agg(sum(col("cnt")).as("n_rows"),
          sum(when(col("hit").isNull, col("cnt")).otherwise(0L))
            .as("n_orphans"))
        .select(lit(edge).as("fk"), col("n_rows"), col("n_orphans"),
          expr("(1000000 * n_orphans) div n_rows").as("orphan_ppm"))
    audit("orders.custkey", ord, "o_custkey",
        Tables.customer(s, d), "c_custkey")
      .union(audit("lineitem.orderkey", li, "l_orderkey",
        ord, "o_orderkey"))
      .union(audit("lineitem.partkey", li, "l_partkey",
        Tables.part(s, d), "p_partkey"))
      .union(audit("lineitem.suppkey", li, "l_suppkey",
        Tables.supplier(s, d), "s_suppkey"))
  }

  /** The (table, column-set) entries dq5 profiles — ONE definition
    * shared by engine and oracle generator (the DQ2_COLS anti-drift
    * rule). Deliberately a MIX of true keys (uniqueness must hold:
    * the ingest contract) and dimension columns (duplication is the
    * point: these cardinalities are what a join planner's statistics
    * hold). */
  private[graft] val DQ5_KEYS: Seq[(String, Seq[String])] = Seq(
    ("customer", Seq("c_custkey")), ("customer", Seq("c_mktsegment")),
    ("orders", Seq("o_orderkey")), ("orders", Seq("o_custkey")),
    ("lineitem", Seq("l_orderkey", "l_linenumber")),
    ("events", Seq("event_id")), ("events", Seq("user_id")),
    ("documents", Seq("doc_id")), ("documents", Seq("lang")),
    ("documents", Seq("source")))

  /** dq5 — key-cardinality census: for every [[DQ5_KEYS]] column
    * set, row count, distinct count, duplicate rows, and uniqueness
    * ppm — ANALYZE-statistics as a first-class query. Read two ways:
    * the declared-key rows are the PK-uniqueness half of the
    * integrity audit (dq1 checks the FK half; a dup_rows > 0 on
    * c_custkey is an ingest bug), and the dimension rows are the
    * NDV statistics every join/broadcast/salting decision in this
    * repo is implicitly tuned by (g6's salt width, j8's skew keys,
    * sm8's class sizes).
    *
    * Scale shape: one pruned scan per audited table computes ALL of
    * that table's entries in a single aggregate (count + one
    * distinct-count per column set — Catalyst plans multi-distinct
    * via one Expand, still a partial+final agg), and a stack
    * generator unpivots the 1-row result (the dq2 shape). Cost =
    * |tables| scans, independent of entry count. */
  private def dq5(s: SparkSession, d: String): DataFrame = {
    def table(tbl: String): DataFrame = tbl match {
      case "customer" => Tables.customer(s, d)
      case "orders" => Tables.orders(s, d)
      case "lineitem" => Tables.lineitem(s, d)
      case "events" => Tables.events(s, d)
      case "documents" => Tables.documents(s, d)
    }
    DQ5_KEYS.map(_._1).distinct.map { tbl =>
      val entries = DQ5_KEYS.filter(_._1 == tbl)
      val aggs = count(lit(1)).as("n_rows") +:
        entries.map { case (_, cols) =>
          countDistinct(col(cols.head), cols.tail.map(col): _*)
            .as(s"nd_${cols.mkString("_")}")
        }
      val stackArgs = entries.map { case (_, cols) =>
        s"'${cols.mkString(",")}', nd_${cols.mkString("_")}"
      }.mkString(", ")
      table(tbl).agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows"),
          expr(s"stack(${entries.size}, $stackArgs) " +
            "AS (key_cols, n_distinct)"))
        .select(lit(tbl).as("tbl"), col("key_cols"), col("n_rows"),
          col("n_distinct"),
          (col("n_rows") - col("n_distinct")).as("dup_rows"),
          expr("(1000000 * n_distinct) div n_rows").as("uniq_ppm"))
    }.reduce(_ unionByName _)
  }

  /** The dq5 oracle generated from the SAME [[DQ5_KEYS]] list. */
  private def dq5OracleSql: String =
    DQ5_KEYS.map { case (tbl, cols) =>
      val tuple =
        if (cols.size == 1) cols.head else cols.mkString("(", ", ", ")")
      s"""SELECT '$tbl' AS tbl, '${cols.mkString(",")}' AS key_cols,
         count(*) AS n_rows,
         CAST(count(DISTINCT $tuple) AS BIGINT) AS n_distinct,
         count(*) - CAST(count(DISTINCT $tuple) AS BIGINT) AS dup_rows,
         (1000000 * CAST(count(DISTINCT $tuple) AS BIGINT)) // count(*)
           AS uniq_ppm
       FROM $tbl"""
    }.mkString("\nUNION ALL\n")

  /** Benford first-digit expectations in exact ppm — floor(log10(1 +
    * 1/d)·10⁶) adjusted so the nine constants sum to exactly 10⁶;
    * ONE list shared by the engine and the oracle generator (the
    * DQ2_COLS anti-drift rule). Constants are data, not libm calls —
    * the x19/dq3 log-free portability discipline. */
  private[graft] val DQ4_BENFORD_PPM: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** dq4 — Benford first-digit audit over order totals: observed
    * leading-digit shares vs the Benford expectation, per digit, with
    * the signed deviation — the classic fabricated-data / upstream-
    * generator screen (a synthetic price generator that draws
    * uniformly, as TPC-H's does, shows up IMMEDIATELY as a fat 1–9
    * plateau; an organic multiplicative process hugs the curve). The
    * deviation column is the finding either way — dq2 audits
    * completeness, dq3 drift, this audits the VALUES' digit process.
    *
    * Domain: first digit of the integer part, well-defined because
    * o_totalprice ≥ 1 (TestDataContractSpec pins the events/orders
    * value domains); digits absent from the data still report via
    * the literal digit dimension (n = 0), so the row count is always
    * 9.
    *
    * Scale shape: one pruned scan partial-aggregates to ≤9 digit
    * keys; the expectation is a 9-row literal relation joined after
    * the agg. Nothing after the first agg depends on volume. */
  private def dq4(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val obs = Tables.orders(s, d)
      // explicit floor: DuckDB ROUNDS double→BIGINT casts where the
      // JVM truncates — 999.5 would flip its leading digit 9 → 1
      .select(substring(floor(col("o_totalprice")).cast("bigint")
        .cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    DQ4_BENFORD_PPM.toDF("digit", "exp_ppm")
      .join(obs, Seq("digit"), "left")
      .na.fill(0L, Seq("n"))
      .withColumn("tot", sum(col("n")).over(all))
      .select(col("digit"), col("n"),
        expr("(1000000 * n) div tot").as("obs_ppm"), col("exp_ppm"),
        (expr("(1000000 * n) div tot") - col("exp_ppm")).as("dev_ppm"))
  }

  /** ab1 — two-proportion A/B conversion test: users split into two
    * arms by the engine's standard key hash (sm2's convention —
    * deterministic, join-stable, re-run-stable), conversion = "the
    * user purchased at least once", reported as per-arm user/
    * converter counts, the ppm lift, and the pooled two-proportion
    * z-score. The experiment-analysis primitive every event pipeline
    * ends at; the hash split also makes it the A/A harness (on
    * synthetic data the split IS an A/A test — lift ≈ 0 is the
    * correctness signal).
    *
    * Exactness: counts are exact integers off one per-user
    * aggregate; lift is floor-div ppm; the z-score is ONE pinned
    * float expression (divisions + an IEEE sqrt) over those longs,
    * 6-dp rounded — the ts2/gr4 convention. Degenerate pools (0% or
    * 100% conversion) yield NULL identically on both engines.
    *
    * Scale shape: one pruned scan → per-user partial+final agg
    * (user-keyed, the fn1 shape) → a 2-row arm aggregate → a 1-row
    * conditional pivot. Nothing after the user agg depends on data
    * volume. */
  private def ab1(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("user_id"),
        (col("event_type") === "purchase").cast("long").as("p"))
      .groupBy(col("user_id"))
      .agg(max(col("p")).as("conv"))
      .select((md5Long(col("user_id")) % 2).as("arm"), col("conv"))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .agg(
        sum(when(col("arm") === 0, col("n"))).as("n_a"),
        sum(when(col("arm") === 0, col("c"))).as("c_a"),
        sum(when(col("arm") === 1, col("n"))).as("n_b"),
        sum(when(col("arm") === 1, col("c"))).as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("""(1000000 * c_b) div n_b - (1000000 * c_a) div n_a""")
          .as("lift_ppm"),
        expr("""CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b
                     THEN NULL
                ELSE floor((CAST(c_b AS DOUBLE) / n_b
                             - CAST(c_a AS DOUBLE) / n_a)
                       / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                           * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                           * (1 / CAST(n_a AS DOUBLE)
                              + 1 / CAST(n_b AS DOUBLE)))
                       * 1000000 + 0.5) / 1000000 END""").as("z"))

  /** an4 — local-DP frequency estimation by generalized randomized
    * response (Warner '65 / the RAPPOR-class mechanism): each doc
    * "reports" its lang truthfully with p = 3/4, else one of the
    * OTHER langs uniformly; the noisy histogram is then debiased with
    * the standard unbiased estimator n̂_v = (obs_v − n·q)/(p − q),
    * q = (1−p)/(k−1). With k = 5 that's ε = ln(p(k−1)/(1−p)) =
    * ln 12 ≈ 2.48 — the local-DP ladder rung above an1–an3's
    * syntactic privacy audits: those certify the PUBLISHED table,
    * this is the collect-side mechanism for when the raw attribute
    * must never be seen at all.
    *
    * DERANDOMIZED COIN (documented, deliberate): the coin and the
    * replacement pick come from the engine's md5Long family keyed on
    * doc_id — a DP deployment uses a real RNG; the md5 coin makes the
    * mechanism + estimator pipeline exactly replayable (the sm2/ab1
    * hash-split discipline), which is what lets the oracle verify the
    * estimator algebra end-to-end.
    *
    * Exactness: counts are exact longs; the estimator is ONE pinned
    * float expression over them, 6-dp rounded. The value domain is
    * data-derived (sorted distinct langs) on both sides — no pinned
    * constant to drift.
    *
    * Scale shape: one pruned scan computes reports at scan speed
    * (the lang domain rides a 1-row broadcast); two ≤k-key aggs off
    * the persisted reports + a full-outer stitch. Nothing after the
    * aggs depends on volume. */
  private def an4(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
    val langsDf = docs.agg(sort_array(collect_set(col("lang"))).as("langs"))
    val rep = docs.crossJoin(broadcast(langsDf))
      .withColumn("others", expr("filter(langs, x -> x != lang)"))
      .withColumn("report",
        when(md5Long(concat(col("doc_id").cast("string"), lit(":rr")))
          % 1000 < 750, col("lang"))
          .otherwise(element_at(col("others"),
            (md5Long(concat(col("doc_id").cast("string"), lit(":pick")))
              % size(col("others"))).cast("int") + 1)))
      .select(col("lang"), col("report"))
      .persist(StorageLevel.MEMORY_AND_DISK) // true + observed aggs
    val tru = rep.groupBy(col("lang")).agg(count(lit(1)).as("n_true"))
    val obs = rep.groupBy(col("report").as("lang"))
      .agg(count(lit(1)).as("n_obs"))
    val meta = rep.agg(count(lit(1)).as("n"))
      .crossJoin(langsDf.select(size(col("langs")).cast("long").as("k")))
    tru.join(obs, Seq("lang"), "full_outer")
      .na.fill(0L, Seq("n_true", "n_obs"))
      .crossJoin(broadcast(meta))
      .select(col("lang"), col("n_true"), col("n_obs"),
        roundFp((lit(1000.0) * (col("k") - 1) * col("n_obs")
          - lit(250.0) * col("n"))
          / (lit(750.0) * (col("k") - 1) - lit(250.0)), 6).as("n_est"))
  }

  /** The (table, column, is-string) census dq2 profiles — ONE
    * definition shared by the engine and the oracle generator so the
    * two column lists cannot drift. */
  private val DQ2_COLS: Seq[(String, String, Boolean)] = Seq(
    ("documents", "doc_id", false), ("documents", "text", true),
    ("documents", "source", true), ("documents", "lang", true),
    ("events", "event_id", false), ("events", "ts", false),
    ("events", "user_id", false), ("events", "event_type", true),
    ("events", "value", false), ("events", "props", true))

  /** dq2 — per-column completeness census over the two ingest-facing
    * tables: NULL count, blank count (string columns: trims to
    * empty), and the combined incompleteness ppm — dq1 audits
    * referential integrity BETWEEN tables, this audits the columns
    * themselves (the first report any ingest pipeline prints, and
    * the one that catches a upstream writer silently nulling a
    * field). A clean corpus proves itself with zero rows of damage,
    * not by assumption.
    *
    * Scale shape: ONE aggregate pass per table computes every
    * column's counters simultaneously (2·|cols| conditional sums in
    * one partial+final agg — never a scan per column), then a stack
    * generator unpivots the 1-row result to the |cols|-row report.
    * Cost = two scans total, independent of column count. */
  private def dq2(s: SparkSession, d: String): DataFrame = {
    def profile(tbl: String, df: DataFrame): DataFrame = {
      val cols = DQ2_COLS.filter(_._1 == tbl)
      val aggs = cols.flatMap { case (_, c, isStr) =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__null"),
          (if (isStr)
            sum(when(col(c).isNotNull && length(trim(col(c))) === 0, 1L)
              .otherwise(0L))
          else sum(lit(0L))).as(s"${c}__blank"))
      }
      val stackArgs = cols
        .map { case (_, c, _) => s"'$c', ${c}__null, ${c}__blank" }
        .mkString(", ")
      df.agg(count(lit(1)).as("n_rows"), aggs: _*)
        .select(col("n_rows"), expr(s"stack(${cols.size}, $stackArgs) " +
          "AS (col_name, n_null, n_blank)"))
        .select(lit(tbl).as("tbl"), col("col_name"), col("n_rows"),
          col("n_null"), col("n_blank"),
          expr("(1000000 * (n_null + n_blank)) div n_rows")
            .as("incomplete_ppm"))
    }
    profile("documents", Tables.documents(s, d))
      .unionByName(profile("events", Tables.events(s, d)))
  }

  /** The dq2 oracle generated from the SAME [[DQ2_COLS]] census list
    * as the engine. */
  private def dq2OracleSql: String =
    DQ2_COLS.map { case (tbl, c, isStr) =>
      val blank =
        if (isStr)
          s"sum(CASE WHEN $c IS NOT NULL AND length(trim($c)) = 0 " +
            "THEN 1 ELSE 0 END)"
        else "0"
      s"""SELECT '$tbl' AS tbl, '$c' AS col_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST($blank AS BIGINT) AS n_blank,
         (1000000 * CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
            + $blank AS BIGINT)) // count(*) AS incomplete_ppm
       FROM $tbl"""
    }.mkString("\nUNION ALL\n")

  /** dq3 — temporal distribution drift: the event-type mix of the
    * FIRST calendar half vs the SECOND (pivot = calendar midpoint,
    * data-derived), reported per type with both shares in ppm, the
    * absolute share delta, and the type's chi-square contribution —
    * the drift monitor every continuously-ingesting pipeline runs
    * (Σ adiff_ppm div 2 is the total-variation distance in ppm;
    * Σ chi2_micro is the homogeneity statistic). Deliberately
    * log-free: TV and χ² are exact-rational/pinned-float where
    * PSI/KL would drag libm log in (the x19/ppl1 portability move).
    *
    * Exactness: counts and shares are exact integers; each χ²
    * contribution is ONE pinned float expression quantized to
    * integer MILLIONTHS before any cross-row use (the emb3/x20
    * order-independence move). A degenerate single-day calendar
    * leaves one half empty → NULL shares, identically on both sides.
    *
    * Scale shape: one pruned scan to (type, day) with the 1-row
    * pivot broadcast; everything after the |types|-key agg is
    * constant-size. */
  private def dq3(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val byDay = Tables.events(s, d)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .persist(StorageLevel.MEMORY_AND_DISK) // pivot + half counts
    val piv = byDay.agg(expr("(min(day) + max(day) + 1) div 2").as("piv"))
    val counts = byDay.crossJoin(broadcast(piv))
      .groupBy(col("event_type"))
      .agg(sum(when(col("day") < col("piv"), 1L).otherwise(0L)).as("na"),
        sum(when(col("day") >= col("piv"), 1L).otherwise(0L)).as("nb"))
    val tots = counts.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    counts.crossJoin(broadcast(tots))
      .select(col("event_type"), col("na"), col("nb"),
        expr("CASE WHEN ta = 0 THEN NULL " +
          "ELSE (1000000 * na) div ta END").as("p_ppm"),
        expr("CASE WHEN tb = 0 THEN NULL " +
          "ELSE (1000000 * nb) div tb END").as("q_ppm"),
        expr("""CASE WHEN ta = 0 OR tb = 0 THEN NULL
                ELSE abs((1000000 * na) div ta - (1000000 * nb) div tb)
                END""").as("adiff_ppm"),
        expr("""CASE WHEN ta = 0 OR tb = 0 THEN NULL
                ELSE CAST(floor(
                  (((CAST(na AS DOUBLE)
                     - CAST(ta AS DOUBLE) * (na + nb) / (ta + tb))
                   * (CAST(na AS DOUBLE)
                     - CAST(ta AS DOUBLE) * (na + nb) / (ta + tb))
                   / (CAST(ta AS DOUBLE) * (na + nb) / (ta + tb)))
                  + ((CAST(nb AS DOUBLE)
                     - CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))
                   * (CAST(nb AS DOUBLE)
                     - CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))
                   / (CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))))
                  * 1000000 + 0.5) AS BIGINT) END""").as("chi2_micro"))
  }

  /** an5 — re-identification uniqueness risk under an1's
    * (nation, segment) quasi-identifiers: class count, singleton
    * classes (size 1 — the "prosecutor risk" rows: anyone knowing a
    * target's QI pair re-identifies them outright), the smallest
    * class, and the fraction of the POPULATION sitting in singleton
    * classes in ppm. an1 DECIDES what to publish; this is the risk
    * number that motivates the decision (the standard uniqueness
    * statistic reported before any k-anonymity scheme is chosen).
    *
    * Scale shape: one QI-keyed partial+final agg (an1's g0 shape)
    * collapsing to |classes| rows, then one constant-size summary
    * agg. Nothing after the first agg depends on volume. */
  private def an5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("qi_nation"),
        col("c_mktsegment").as("qi_segment"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_singletons"),
        min(col("n")).as("min_class"))
      .select(col("n_rows"), col("n_classes"), col("n_singletons"),
        col("min_class"),
        expr("(1000000 * n_singletons) div n_rows").as("unique_ppm"))

  /** an6's k ladder — every anonymity threshold a release policy
    * might pick. */
  private[graft] val AN6_KS: Seq[Long] = (2L to 10L)

  /** an6 — the suppression-cost curve under an1's quasi-identifiers:
    * for every k in [[AN6_KS]], how many QI classes survive a direct
    * k-anonymity cut and how much of the population the sub-k
    * classes would suppress (no generalization — that's an1's
    * mechanism; this is the privacy-utility CURVE that justifies
    * an1's chosen K before any scheme is built, read next to an5's
    * point risk). Monotone by construction: raising k can only grow
    * the suppressed share — the spec pins it.
    *
    * Scale shape: ONE an1-shaped QI agg collapses the corpus to
    * |classes| rows; the ladder is a broadcast 9-row cross join and
    * a ≤9-key re-agg. Nothing after the first agg depends on
    * volume. */
  private def an6(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("qi_nation"),
        col("c_mktsegment").as("qi_segment"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(AN6_KS.toDF("k")))
      .groupBy(col("k"))
      .agg(sum(when(col("n") >= col("k"), 1L).otherwise(0L))
        .as("n_classes_ok"),
        sum(when(col("n") < col("k"), col("n")).otherwise(0L))
          .as("n_suppressed"),
        sum(col("n")).as("n_rows"))
      .select(col("k"), col("n_classes_ok"), col("n_suppressed"),
        expr("(1000000 * n_suppressed) div n_rows").as("suppressed_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "an6_kanon_curve" -> (an6 _),
    "an5_unique_risk" -> (an5 _),
    "dq3_drift" -> (dq3 _),
    "an4_ldp_freq" -> (an4 _),
    "dq2_null_profile" -> (dq2 _),
    "ab1_conversion_lift" -> (ab1 _),
    "dq1_fk_orphans" -> (dq1 _),
    "an3_tcloseness" -> (an3 _),
    "an2_ldiversity" -> (an2 _),
    "od1_outliers" -> (od1 _),
    "an1_kanon" -> (an1 _),
    "g9_heavy_hitters" -> (g9 _),
    "g6_salted_agg" -> (g6 _),
    "g8_grouping_sets" -> (g8 _),
    "g1_rollup" -> (g1 _),
    "g2_cube" -> (g2 _),
    "g3_pivot" -> (g3 _),
    "g4_quantiles" -> (g4 _),
    "g5_approx_distinct" -> (g5 _),
    "g7_approx_quantiles" -> (g7 _),
    "g10_hll_merge" -> (g10 _),
    "g11_cms_freq" -> (g11 _),
    "g12_cms_error_curve" -> (g12 _),
    "dq4_benford" -> (dq4 _),
    "dq5_cardinality" -> (dq5 _)
  )

  val oracles: Map[String, String] = Map(
    // generated from the SAME DQ5_KEYS census list as the engine
    "dq5_cardinality" -> dq5OracleSql,
    // an1's QI classes crossed with the same k ladder
    "an6_kanon_curve" -> s"""
      WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
                   c_mktsegment AS qi_segment, count(*) AS n
                 FROM customer GROUP BY 1, 2),
      ks AS (SELECT unnest(generate_series(${AN6_KS.head},
               ${AN6_KS.last})) AS k)
      SELECT k,
        CAST(sum(CASE WHEN n >= k THEN 1 ELSE 0 END) AS BIGINT)
          AS n_classes_ok,
        CAST(sum(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
          AS n_suppressed,
        (1000000 * CAST(sum(CASE WHEN n < k THEN n ELSE 0 END)
          AS BIGINT)) // CAST(sum(n) AS BIGINT) AS suppressed_ppm
      FROM g CROSS JOIN ks GROUP BY 1""",
    // generated from the SAME DQ4_BENFORD_PPM constants; digits with
    // no rows report through the literal dimension
    "dq4_benford" -> {
      val dim = DQ4_BENFORD_PPM.map { case (dg, p) =>
        s"SELECT $dg AS digit, CAST($p AS BIGINT) AS exp_ppm"
      }.mkString("\n        UNION ALL ")
      s"""
      WITH dim AS (
        $dim),
      obs AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice)
                AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
              count(*) AS n
              FROM orders GROUP BY 1),
      j AS (SELECT dim.digit, coalesce(obs.n, 0) AS n, dim.exp_ppm,
              CAST(sum(coalesce(obs.n, 0)) OVER () AS BIGINT) AS tot
            FROM dim LEFT JOIN obs ON dim.digit = obs.digit)
      SELECT digit, n, (1000000 * n) // tot AS obs_ppm, exp_ppm,
        (1000000 * n) // tot - exp_ppm AS dev_ppm
      FROM j"""
    },
    // full mechanism + estimator replay: same seeded-md5 bucket
    // hashes, same 4×16 cell sums, same min-over-rows estimate
    "g11_cms_freq" -> s"""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents),
      sk AS (SELECT g.r,
               ('0x' || substr(md5(g.r::VARCHAR || ':' || tok), 1, 15))
                 ::BIGINT % $CMS_W AS b,
               count(*) AS c
             FROM t CROSS JOIN generate_series(0, ${CMS_D - 1}) g(r)
             GROUP BY 1, 2),
      top AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1
              ORDER BY cnt DESC, tok LIMIT 10),
      coords AS (SELECT top.tok, top.cnt, g.r,
                   ('0x' || substr(md5(g.r::VARCHAR || ':' || top.tok),
                     1, 15))::BIGINT % $CMS_W AS b
                 FROM top CROSS JOIN generate_series(0, ${CMS_D - 1}) g(r))
      SELECT coords.tok, coords.cnt, min(sk.c) AS est,
        min(sk.c) - coords.cnt AS over_cnt
      FROM coords JOIN sk USING (r, b)
      GROUP BY 1, 2""",
    // same QI classes as an1's oracle, one summary row
    "an5_unique_risk" -> """
      WITH g AS (SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
               c_mktsegment AS qi_segment, count(*) AS n
             FROM customer GROUP BY 1, 2),
      s AS (SELECT count(*) AS n_classes,
              CAST(sum(n) AS BIGINT) AS n_rows,
              CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_singletons,
              CAST(min(n) AS BIGINT) AS min_class
            FROM g)
      SELECT n_rows, n_classes, n_singletons, min_class,
        (1000000 * n_singletons) // n_rows AS unique_ppm
      FROM s""",
    // same calendar-midpoint pivot, integer shares, and pinned chi2
    // expression (identical operation order, then millionths floor)
    "dq3_drift" -> """
      WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day
                 FROM events),
      piv AS (SELECT (min(day) + max(day) + 1) // 2 AS piv FROM e),
      c AS (SELECT event_type,
              CAST(sum(CASE WHEN day < piv THEN 1 ELSE 0 END) AS BIGINT)
                AS na,
              CAST(sum(CASE WHEN day >= piv THEN 1 ELSE 0 END) AS BIGINT)
                AS nb
            FROM e, piv GROUP BY 1),
      t AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
              CAST(sum(nb) AS BIGINT) AS tb FROM c)
      SELECT event_type, na, nb,
        CASE WHEN ta = 0 THEN NULL
             ELSE (1000000 * na) // ta END AS p_ppm,
        CASE WHEN tb = 0 THEN NULL
             ELSE (1000000 * nb) // tb END AS q_ppm,
        CASE WHEN ta = 0 OR tb = 0 THEN NULL
             ELSE abs((1000000 * na) // ta - (1000000 * nb) // tb)
             END AS adiff_ppm,
        CASE WHEN ta = 0 OR tb = 0 THEN NULL
             ELSE CAST(floor(
               (((CAST(na AS DOUBLE)
                  - CAST(ta AS DOUBLE) * (na + nb) / (ta + tb))
                * (CAST(na AS DOUBLE)
                  - CAST(ta AS DOUBLE) * (na + nb) / (ta + tb))
                / (CAST(ta AS DOUBLE) * (na + nb) / (ta + tb)))
               + ((CAST(nb AS DOUBLE)
                  - CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))
                * (CAST(nb AS DOUBLE)
                  - CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))
                / (CAST(tb AS DOUBLE) * (na + nb) / (ta + tb))))
               * 1000000 + 0.5) AS BIGINT) END AS chi2_micro
      FROM c, t""",
    // same md5 coin/pick, same data-derived sorted domain, same
    // pinned estimator expression
    "an4_ldp_freq" -> """
      WITH lg AS (SELECT list_sort(list(DISTINCT lang)) AS langs
                  FROM documents),
      r AS (SELECT d.lang,
              CASE WHEN ('0x' || substr(md5(d.doc_id::VARCHAR || ':rr'),
                  1, 15))::BIGINT % 1000 < 750
                THEN d.lang
                ELSE list_extract(list_filter(lg.langs, x -> x != d.lang),
                  CAST(('0x' || substr(md5(d.doc_id::VARCHAR || ':pick'),
                    1, 15))::BIGINT % (len(lg.langs) - 1) AS INT) + 1)
              END AS report
            FROM documents d CROSS JOIN lg),
      meta AS (SELECT count(*) AS n FROM r),
      kk AS (SELECT CAST(len(langs) AS BIGINT) AS k FROM lg),
      t AS (SELECT lang, count(*) AS n_true FROM r GROUP BY 1),
      o AS (SELECT report AS lang, count(*) AS n_obs FROM r GROUP BY 1)
      SELECT lang, coalesce(n_true, 0) AS n_true,
        coalesce(n_obs, 0) AS n_obs,
        floor((1000.0 * (k - 1) * coalesce(n_obs, 0) - 250.0 * n)
          / (750.0 * (k - 1) - 250.0) * 1000000 + 0.5) / 1000000 AS n_est
      FROM t FULL JOIN o USING (lang) CROSS JOIN meta CROSS JOIN kk""",
    // generated from the engine's own DQ2_COLS census list
    "dq2_null_profile" -> dq2OracleSql,
    // quantile_cont ≡ Spark's exact percentile interpolation (the
    // w8/ppl1/g4-proven pairing); med/dev/mad pinned at 6 dp before
    // any comparison on both sides
    "od1_outliers" -> """
      WITH ev AS (SELECT event_id, event_type, value FROM events),
      med AS (SELECT event_type,
                floor(quantile_cont(value, 0.5)*1000000 + 0.5)/1000000 AS med
              FROM ev GROUP BY 1),
      dev AS (SELECT ev.*, med.med,
                floor(abs(value - med)*1000000 + 0.5)/1000000 AS dev
              FROM ev JOIN med USING (event_type)),
      mad AS (SELECT event_type,
                floor(quantile_cont(dev, 0.5)*1000000 + 0.5)/1000000 AS mad
              FROM dev GROUP BY 1)
      SELECT event_id, dev.event_type, value, dev.med, mad.mad,
        dev.dev > floor(mad.mad * 4.4478 * 1000000 + 0.5)/1000000 AS is_out
      FROM dev JOIN mad USING (event_type)""",
    // same exact two-level distinct (bands then classes), same
    // integer floor banding and publish predicate
    // same hash split, same exact counts, same pinned z expression
    "ab1_conversion_lift" -> """
      WITH u AS (SELECT user_id,
                   max(CASE WHEN event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS conv
                 FROM events GROUP BY 1),
      a AS (SELECT ('0x' || substr(md5(user_id::VARCHAR),1,15))::BIGINT % 2
              AS arm, conv FROM u),
      g AS (SELECT arm, count(*) AS n, CAST(sum(conv) AS BIGINT) AS c
            FROM a GROUP BY 1),
      p AS (SELECT
              CAST(sum(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
              CAST(sum(CASE WHEN arm = 0 THEN c END) AS BIGINT) AS c_a,
              CAST(sum(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
              CAST(sum(CASE WHEN arm = 1 THEN c END) AS BIGINT) AS c_b
            FROM g)
      SELECT n_a, c_a, n_b, c_b,
        (1000000 * c_b) // n_b - (1000000 * c_a) // n_a AS lift_ppm,
        CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
        ELSE floor((CAST(c_b AS DOUBLE) / n_b
                     - CAST(c_a AS DOUBLE) / n_a)
               / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                   * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                   * (1 / CAST(n_a AS DOUBLE) + 1 / CAST(n_b AS DOUBLE)))
               * 1000000 + 0.5) / 1000000 END AS z
      FROM p""",
    // same four anti-join audits; each join/count runs ONCE in a CTE
    // (DuckDB does not reliably CSE scalar subqueries — the repo's
    // D10_SQL/QR1_SQL factoring convention applied inside an oracle)
    "dq1_fk_orphans" -> """
      WITH no AS (SELECT count(*) AS n FROM orders),
      nl AS (SELECT count(*) AS n FROM lineitem),
      o1 AS (SELECT count(*) AS o FROM orders LEFT JOIN customer
             ON o_custkey = c_custkey WHERE c_custkey IS NULL),
      o2 AS (SELECT count(*) AS o FROM lineitem LEFT JOIN orders
             ON l_orderkey = o_orderkey WHERE o_orderkey IS NULL),
      o3 AS (SELECT count(*) AS o FROM lineitem LEFT JOIN part
             ON l_partkey = p_partkey WHERE p_partkey IS NULL),
      o4 AS (SELECT count(*) AS o FROM lineitem LEFT JOIN supplier
             ON l_suppkey = s_suppkey WHERE s_suppkey IS NULL)
      SELECT 'orders.custkey' AS fk, n AS n_rows, o AS n_orphans,
        (1000000 * o) // n AS orphan_ppm FROM no, o1
      UNION ALL
      SELECT 'lineitem.orderkey', n, o, (1000000 * o) // n FROM nl, o2
      UNION ALL
      SELECT 'lineitem.partkey', n, o, (1000000 * o) // n FROM nl, o3
      UNION ALL
      SELECT 'lineitem.suppkey', n, o, (1000000 * o) // n FROM nl, o4""",
    // same densified grid, same ROWS-framed ladder cumsum, same
    // floor-div ppm shares; the global cum is the sum of per-segment
    // cums at each ladder step (an exact identity, both engines)
    "an3_tcloseness" -> """
      WITH j AS (SELECT c_mktsegment AS segment,
                   o_orderpriority AS pri
                 FROM orders JOIN customer ON o_custkey = c_custkey),
      c AS (SELECT segment, pri, count(*) AS n FROM j GROUP BY 1, 2),
      dense AS (SELECT s.segment, p.pri, coalesce(c.n, 0) AS n
                FROM (SELECT DISTINCT segment FROM c) s
                CROSS JOIN (SELECT DISTINCT pri FROM c) p
                LEFT JOIN c ON c.segment = s.segment AND c.pri = p.pri),
      w AS (SELECT segment, pri, n,
              CAST(sum(n) OVER (PARTITION BY segment ORDER BY pri
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum,
              CAST(sum(n) OVER (PARTITION BY segment) AS BIGINT) AS tot
            FROM dense),
      g AS (SELECT *, CAST(sum(cum) OVER (PARTITION BY pri) AS BIGINT)
              AS gcum,
              CAST(sum(n) OVER () AS BIGINT) AS gtot FROM w)
      SELECT segment, tot AS n_orders,
        CAST(sum(abs((1000000 * cum) // tot - (1000000 * gcum) // gtot))
          AS BIGINT) AS t_emd_ppm
      FROM g GROUP BY 1, 2""",
    "an2_ldiversity" -> """
      WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
                   c_mktsegment AS qi_segment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   count(*) AS nb
                 FROM customer GROUP BY 1, 2, 3)
      SELECT qi_nation, qi_segment, CAST(sum(nb) AS BIGINT) AS n,
        count(*) AS l,
        (CAST(sum(nb) AS BIGINT) >= 5 AND count(*) >= 3) AS publishable
      FROM b GROUP BY 1, 2""",
    "an1_kanon" -> """
      WITH g0 AS (SELECT CAST(c_nationkey AS BIGINT) AS qi_nation,
                    c_mktsegment AS qi_segment, count(*) AS n
                  FROM customer GROUP BY 1, 2),
      rem AS (SELECT qi_nation, CAST(sum(n) AS BIGINT) AS n FROM g0
              WHERE n < 5 GROUP BY 1)
      SELECT qi_nation, qi_segment, 0 AS anon_level, n FROM g0 WHERE n >= 5
      UNION ALL
      SELECT qi_nation, NULL, 1, n FROM rem WHERE n >= 5
      UNION ALL
      SELECT NULL, NULL, 2, n FROM
        (SELECT CAST(sum(n) AS BIGINT) AS n FROM rem WHERE n < 5)
      WHERE n IS NOT NULL""",
    "g6_salted_agg" -> """
      SELECT event_type, CAST(sum(c) AS BIGINT) AS cnt, floor(sum(v)*100 + 0.5)/100 AS sum_value FROM (
        SELECT event_type, event_id % 16 AS salt, count(*) AS c, sum(value) AS v
        FROM events GROUP BY 1, 2)
      GROUP BY event_type""",
    "g1_rollup" -> """
      SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "g2_cube" -> """
      SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
    "g3_pivot" -> """
      SELECT l_returnflag,
        count(*) FILTER (WHERE l_linestatus = 'F') AS "F",
        count(*) FILTER (WHERE l_linestatus = 'O') AS "O"
      FROM lineitem GROUP BY l_returnflag""",
    "g4_quantiles" -> """
      WITH qs AS (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS q
                  FROM orders)
      SELECT floor(q[1]*10000 + 0.5)/10000 AS q25,
             floor(q[2]*10000 + 0.5)/10000 AS q50,
             floor(q[3]*10000 + 0.5)/10000 AS q75
      FROM qs""",
    // GROUPING bitmask convention verified identical (leftmost arg =
    // MSB, 1 = aggregated away): (flag) set -> gid 1, (status) -> 2
    "g8_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
        CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        count(*) AS cnt, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""",
    "g9_heavy_hitters" -> """
      SELECT tok, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 10""",
    // g5/g7/g10 (the sketch shelf): raw estimates are per-engine and
    // can never hash-match, so each query outputs its EXACT twin plus
    // a deterministic bound verdict and the oracle computes the exact
    // side with the literal verdict — a sketch leaving its declared
    // envelope breaks the hash (VERDICT r10 #1). The tighter rsd/ε
    // laws stay in the specs. g9's oracle is exact outright:
    // Misra-Gries only generates candidates; the exact second pass
    // makes the result oracle-equal.
    "g5_approx_distinct" -> """
      SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        CAST(1 AS BIGINT) AS within_bound
      FROM lineitem""",
    "g7_approx_quantiles" -> """
      WITH qs AS (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75])
                    AS q FROM orders)
      SELECT floor(q[1]*10000 + 0.5)/10000 AS q25,
             floor(q[2]*10000 + 0.5)/10000 AS q50,
             floor(q[3]*10000 + 0.5)/10000 AS q75,
             CAST(1 AS BIGINT) AS within_bound
      FROM qs""",
    "g10_hll_merge" -> """
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact,
        CAST(1 AS BIGINT) AS within_bound
      FROM events GROUP BY event_type
      UNION ALL
      SELECT 'ALL' AS event_type,
        CAST(count(DISTINCT user_id) AS BIGINT) AS exact,
        CAST(1 AS BIGINT) AS within_bound
      FROM events""",
    // g12: full mechanism + estimator replay like g11's oracle, with
    // every coarser width derived from the width-64 cells exactly as
    // the engine does ((h % 64) % w = h % w when w divides 64)
    "g12_cms_error_curve" -> {
      val cfgRows = G12_CFGS
        .map { case (cd, cw) => s"($cd, $cw)" }.mkString(", ")
      s"""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok
                 FROM documents),
      cfg(d, w) AS (VALUES $cfgRows),
      cells AS (SELECT g.r,
                  ('0x' || substr(md5(g.r::VARCHAR || ':' || tok), 1, 15))
                    ::BIGINT % $G12_WMAX AS b64,
                  count(*) AS c
                FROM t CROSS JOIN generate_series(0, ${CMS_D - 1}) g(r)
                GROUP BY 1, 2),
      cc AS (SELECT cfg.d, cfg.w, cells.r, cells.b64 % cfg.w AS b,
               CAST(sum(c) AS BIGINT) AS c
             FROM cells CROSS JOIN cfg
             WHERE cells.r < cfg.d
             GROUP BY 1, 2, 3, 4),
      top AS (SELECT tok, count(*) AS cnt FROM t GROUP BY 1
              ORDER BY cnt DESC, tok LIMIT 10),
      coords AS (SELECT cfg.d, cfg.w, top.tok, top.cnt, g.r,
                   ('0x' || substr(md5(g.r::VARCHAR || ':' || top.tok),
                     1, 15))::BIGINT % $G12_WMAX % cfg.w AS b
                 FROM top CROSS JOIN cfg
                   CROSS JOIN generate_series(0, ${CMS_D - 1}) g(r)
                 WHERE g.r < cfg.d),
      est AS (SELECT d, w, coords.tok, coords.cnt, min(cc.c) AS est
              FROM coords JOIN cc USING (d, w, r, b)
              GROUP BY 1, 2, 3, 4)
      SELECT CAST(d AS BIGINT) AS d, CAST(w AS BIGINT) AS w,
        CAST(count(*) AS BIGINT) AS n_probes,
        CAST(sum(cnt) AS BIGINT) AS sum_cnt,
        CAST(sum(est - cnt) AS BIGINT) AS over_total,
        CAST(max(est - cnt) AS BIGINT) AS max_over,
        (1000000 * CAST(sum(est - cnt) AS BIGINT))
          // CAST(sum(cnt) AS BIGINT) AS over_ppm
      FROM est GROUP BY 1, 2"""
    }
  )
}
