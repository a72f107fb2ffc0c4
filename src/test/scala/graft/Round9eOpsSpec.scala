package graft

import org.apache.spark.sql.functions._

/** Semantic checks for the round-9 sixth wave (label-propagation
  * communities, day-of-week seasonality, pseudo-relevance-feedback
  * expansion) — plain-Scala replays plus the conservation laws the
  * DuckDB oracle can't state directly.
  */
class Round9eOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  // ---- gr5 --------------------------------------------------------

  test("gr5: both synchronous LPA rounds replay exactly (count-desc, " +
    "label-asc argmax), and community sizes conserve the node count") {
    val ip = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sym = ip.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for {
        i <- parts.indices; j <- parts.indices if i != j
      } yield (parts(i), parts(j))
    }.toSet // (v, n) both directions
    var labels = sym.map(_._1).map(v => v -> v).toMap
    for (_ <- 1 to operators.GraphOps.GR5_ROUNDS) {
      val next = sym.groupBy(_._1).map { case (v, es) =>
        val votes = es.toSeq.map(e => labels(e._2))
          .groupBy(identity).map { case (l, xs) => (l, xs.size) }
        v -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
      labels = next
    }
    val expected = labels.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }
    val got = q("gr5_communities").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.values.sum == labels.size.toLong)
    // LPA coarsens: communities cannot outnumber nodes, and round-2
    // voting must have merged at least some singleton seeds
    assert(got.size < labels.size)
  }

  // ---- w12 --------------------------------------------------------

  test("w12: the weekday profile replays from pure integer µs " +
    "arithmetic and shares sum to ~1e6 per event type") {
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts"))).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val dayUs = 86400000000L
    val counts = evs.groupBy { case (t, tu) => (t, ((tu / dayUs) + 4) % 7) }
      .map { case (k, xs) => k -> xs.length.toLong }
    val tot = counts.groupBy(_._1._1).map { case (t, xs) => t -> xs.values.sum }
    val expected = counts.map { case ((t, dow), n) =>
      (t, dow) -> ((n, 1000000L * n / tot(t)))
    }
    val got = q("w12_dow_profile").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    got.keys.map(_._1).toSet.foreach { (t: String) =>
      val s = got.collect { case ((`t`, _), (_, ppm)) => ppm }.sum
      // floor-division undershoot only: within 7 ulp-ppm of 1e6
      assert(s <= 1000000L && s > 1000000L - 7, s"type $t sums $s")
    }
  }

  // ---- qr2 --------------------------------------------------------

  test("qr2: expansion terms replay exactly from qr1's feedback set, " +
    "never include original query terms, and respect the top-5 cut") {
    val fb = q("qr1_batch_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docToks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    val qterms = operators.RetrievalOps.queryTermPairs.toSet
    val expected = fb.groupBy(_._1).flatMap { case (qid, ds) =>
      val cnt = ds.flatMap(d => docToks(d._2).toSeq.map(t => t))
        .groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
        .filterNot { case (t, _) => qterms((qid, t)) }
      cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).zipWithIndex
        .map { case ((t, c), i) => (qid, t) -> ((c, i + 1L)) }
    }
    val got = q("qr2_prf_expand").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getInt(3).toLong))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
    got.keys.foreach { case (qid, t) => assert(!qterms((qid, t))) }
  }
}
