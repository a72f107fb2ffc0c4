package graft

import graft.operators.GraphOps

/** Repo-wide scratch-cache ratchet (the VERDICT r15 #3/#4 protocol,
  * extended from the graph family to every registered query).
  *
  * Two invariants, checked by actually RUNNING all 227 queries
  * standalone at sf0.001 (this is the one suite that materializes the
  * whole surface, ~2-3 min — the price of a total ratchet):
  *
  *  1. **Every per-query scratch block is clearable catalog state.**
  *     After `releaseScratch()` + `catalog.clearCache()`, no
  *     non-checkpoint persisted RDD survives — i.e. no query persists
  *     through the raw RDD API where the SQL cache (and therefore
  *     Bench's per-query clear, and any caller's clearCache) cannot
  *     reach it. Checkpointed blocks are exempt: they are either
  *     corpus-version memo state with an owner ([[graft.Tables
  *     .memoGetOrBuild]]) or a query's own eagerly-materialized
  *     result, and lineage truncation makes unpersisting them unsafe
  *     by construction.
  *
  *  2. **The set of queries that leave lazy scratch persists is
  *     pinned EXACTLY, both directions.** These are the documented
  *     shared-subtree pattern (the x10/x12 invariant: a sub-corpus
  *     relation — histogram, postings list, segment table, score
  *     table — consumed more than once inside one materialization,
  *     persisted so the plan computes it once). Each is bounded
  *     well below corpus size by its query's own SCALE.md note. A
  *     NEW query that persists must either self-release (the
  *     gr5/gr7/gr8 eager posture), register in the graph scratch
  *     registry, or join this list consciously; a query that stops
  *     persisting must leave it, so the list can only shrink by
  *     being earned.
  */
class ScratchLeakSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose lazy plans leave (clearable, bounded) scratch
    * persists at the caller — discovered by exhaustive audit at r16
    * and pinned exactly. The graph family's INTERNAL scratch is
    * absent because it has a registered owner (released before this
    * spec counts); gr7/gr8/pipe6-class queries are absent because
    * they materialize eagerly and release in-query. gr5 is PRESENT
    * as of r17: its eagerly-materialized result rides a persist
    * (ADVICE r16 — a localCheckpoint here was invisible to
    * clearCache and leaked per bench pass), and unlike gr7/gr8's
    * constant-bounded outputs the community histogram is
    * |labels|-sized (node-bounded, too big to collect on principle),
    * so the block stays for the caller's clearCache — exactly what
    * this list exists to pin. */
  private val scratchQueries: Set[String] = Set(
    "an1_kanon", "an3_tcloseness", "an4_ldp_freq", "att2_linear_credit",
    "gr5_communities",
    "cls4_calibrated_filter", "cur1_curriculum", "d11_line_dedup",
    "dq1_fk_orphans", "dq3_drift", "dsir1_importance",
    "emb4_top_direction", "emb5_detop", "er1_fuzzy_block",
    "er2_jw_block", "er3_symspell", "fn1_funnel", "g10_hll_merge",
    "idx1_inverted", "idx2_postings_and", "idx3_phrase",
    "idx4_proximity", "idx5_champion_topk", "km1_kmeans", "lr1_logreg",
    "od1_outliers", "pipe4_domain_tilt", "pipe9_funnel",
    "ppl1_lm_bucket", "qr1_batch_bm25", "qr2_prf_expand", "qr3_mrr",
    "qr4_ndcg", "qr5_champion_recall", "rrf1_hybrid_fuse",
    "s6_ann_recall", "ts1_gapfill", "ts2_xcorr", "ts5_acf",
    "voc3_coverage_curve", "w10_retention", "w14_dow_anomaly",
    "w16_streaks", "x10_tfidf", "x11_bm25", "x12_bigram_lm",
    "x13_source_overlap", "x16_winnow", "x19_collocation_lift",
    "x20_burrows_delta", "x21_dup_ngrams")

  test("all 227 queries: scratch persists are clearable catalog " +
    "state (no raw-RDD persists survive clearCache), and the set of " +
    "scratch-leaving queries is pinned exactly in both directions") {
    val sc = spark.sparkContext
    // memo state up front so its checkpoint blocks join the baseline
    GraphOps.primeEdgeMemo(spark, sf)
    graft.operators.PipelineOps.primePipeMemos(spark, sf)
    graft.operators.DedupOps.primeDedupMemos(spark, sf)
    GraphOps.releaseScratch()
    spark.catalog.clearCache()
    var base = sc.getPersistentRDDs.keySet.toSet
    val leakers = scala.collection.mutable.SortedSet.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      fn(spark, sf).queryExecution.toRdd.count()
      GraphOps.releaseScratch() // the registry owner for graph scratch
      val leaked = sc.getPersistentRDDs.filter { case (id, r) =>
        !base(id) && !r.isCheckpointed }
      if (leaked.nonEmpty) leakers += name
      spark.catalog.clearCache()
      val orphaned = sc.getPersistentRDDs.filter { case (id, r) =>
        !base(id) && !r.isCheckpointed }
      assert(orphaned.isEmpty,
        s"$name left persisted RDDs that clearCache cannot reach " +
          s"(raw RDD persist outside the SQL cache): " +
          orphaned.values.map(_.name).mkString(" | "))
      // absorb this query's own checkpointed blocks (eager results,
      // lazily-built memo state) into the baseline for the next query
      base = sc.getPersistentRDDs.keySet.toSet
    }
    val unexpected = leakers.toSet -- scratchQueries
    val retired = scratchQueries -- leakers
    assert(unexpected.isEmpty,
      s"NEW scratch-leaving queries (self-release, register, or join " +
        s"the pinned list with a bound): ${unexpected.mkString(", ")}")
    assert(retired.isEmpty,
      s"queries no longer leave scratch — shrink the pinned list: " +
        retired.mkString(", "))
  }
}
