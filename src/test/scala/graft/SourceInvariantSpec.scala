package graft

import org.scalatest.funsuite.AnyFunSuite

/** Source-level invariants the plan-shape specs can't see.
  *
  * The one pinned here is the r6 storage rule: **checkpoint
  * signatures, never the corpus**. `localCheckpoint` truncates
  * lineage and stores the data in executor-local storage only — on a
  * real cluster a lost executor then makes the relation
  * unrecoverable, which is fine for a model-sized or signature-sized
  * intermediate (cheap to rebuild by rerunning the query) but fatal
  * for a corpus-scale relation at 100 TB. Corpus-scale projections
  * must use `persist(StorageLevel.MEMORY_AND_DISK)` so lineage
  * survives and a lost partition recomputes.
  *
  * DedupOps is the single allowlisted caller: its checkpoint sites
  * are the memoized MinHash SIGNATURE table and the d7/d9/d10
  * label/candidate sets — signature-scale by construction (the point
  * of the r9 hashed-shingle payload). Any new `localCheckpoint` in
  * another file fails here BY NAME so the next trainer can't
  * reintroduce the kmInit/lrCorpus regression this spec retired.
  */
class SourceInvariantSpec extends AnyFunSuite {

  private def scalaSources(dir: java.io.File): Seq[java.io.File] = {
    val kids = Option(dir.listFiles()).getOrElse(Array.empty)
    kids.filter(_.isFile).filter(_.getName.endsWith(".scala")).toSeq ++
      kids.filter(_.isDirectory).flatMap(scalaSources)
  }

  /** Files allowed to localCheckpoint: each stores SIGNATURE-CLASS
    * narrow relations only, never a corpus projection. DedupOps
    * checkpoints (doc_id, hashed-shingle, minhash) signatures;
    * GraphOps checkpoints the memoized (id, id) co-purchase edge
    * list (the r9 edge memo — same discipline, graph flavor);
    * PipelineOps checkpoints the memoized per-doc verdict relations
    * (doc_id + quality flags / contamination count — one narrow row
    * per doc, shared by pipe5/pipe6/pipe9, r11 verdict #6). */
  // RetrievalOps joined in r17: the memo_nb_scores checkpoint (the
  // same per-corpus-version memo class as the dedup signatures and
  // pipeline verdicts — docs-sized, never corpus-token-sized).
  // r18 (ADVICE r17 #1): the allowlist pins an EXACT occurrence
  // count per file, not mere membership — a second unaudited
  // checkpoint in an already-listed file goes red here by name.
  private val checkpointAllowlist: Map[String, Int] =
    Map("DedupOps.scala" -> 5, "GraphOps.scala" -> 2,
      "PipelineOps.scala" -> 3, "RetrievalOps.scala" -> 1)

  test("localCheckpoint call sites match the audited allowlist " +
    "EXACTLY (file and count) — corpus-scale projections must " +
    "persist(MEMORY_AND_DISK)") {
    val root = new java.io.File("src/main/scala/graft")
    assert(root.isDirectory, s"source root not found at ${root.getAbsolutePath}")
    val counts = scalaSources(root).flatMap { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      // strip line comments and scaladoc so prose mentions don't trip it
      val code = try src.getLines()
        .map(l => l.replaceAll("//.*$", ""))
        .filterNot(l => l.trim.startsWith("*") || l.trim.startsWith("/**"))
        .mkString("\n")
      finally src.close()
      val occ = code.sliding(".localCheckpoint(".length)
        .count(_ == ".localCheckpoint(")
      if (occ > 0) Some(f.getName -> occ) else None
    }.toMap
    assert(counts == checkpointAllowlist,
      s"localCheckpoint sites drifted from the audited allowlist: " +
        s"found $counts, expected $checkpointAllowlist — corpus-scale " +
        "relations must keep lineage; use " +
        "persist(StorageLevel.MEMORY_AND_DISK) instead, or re-audit " +
        "and re-pin")
  }

  test("Bench's short-key mapping stays bijective with " +
    "SparkEntry.queries — a rename that collides two prefixes would " +
    "mis-attribute a timing in BENCH_r*.json; fail here, not mid-bench") {
    val names = SparkEntry.queries.keys.toSeq
    val byShort = names.groupBy(Bench.shortKey)
    val collisions = byShort.collect { case (k, vs) if vs.size > 1 => k -> vs }
    assert(collisions.isEmpty,
      s"short-key collisions: ${collisions.mkString("; ")}")
    assert(byShort.size == names.size)
    // and every oracle key names a registered query (a typo'd oracle
    // entry would silently become a dangling record in the gate)
    val dangling = SparkEntry.oracleSql.keySet -- names.toSet
    assert(dangling.isEmpty, s"oracleSql keys without a query: $dangling")
    // the --quick tier must stay a subset of the registered surface —
    // a rename would otherwise silently shrink the tier to nothing
    val missing = Bench.quickTier -- names.toSet
    assert(missing.isEmpty, s"quickTier names without a query: $missing")
  }

  test("BENCH_X10.json covers the FULL registered surface — a query " +
    "added after the last gate run turns the suite red until " +
    "tools/scale_probe.py is re-run (r11: pipe9 landed after the " +
    "probe run and never entered the gate; nothing checked)") {
    val f = new java.io.File("BENCH_X10.json")
    assert(f.isFile, "BENCH_X10.json missing — run tools/scale_probe.py run")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    // the gate's ratio map drops a query when it's absent from either
    // bench record OR failed (-1) — all three cases are coverage holes
    val expected = SparkEntry.queries.keySet ++ Bench.memoBuilds.map(_._1)
    for (p <- Seq("x10rel", "x10doc")) {
      val node = root.path("probes").path(p).path("queries")
      assert(node.isObject, s"BENCH_X10.json has no probes.$p.queries map")
      val got = scala.jdk.CollectionConverters
        .IteratorHasAsScala(node.fieldNames()).asScala.toSet
      val absent = expected -- got
      val stale = got -- expected
      assert(absent.isEmpty && stale.isEmpty,
        s"$p gate coverage drift — absent from gate: ${absent.toSeq.sorted}" +
          s"; stale keys in gate: ${stale.toSeq.sorted}")
    }
  }

  test("BENCH_X10.json ships adjudicated: every probe watchlist is " +
    "empty (r11: the record shipped with a 3-entry unadjudicated " +
    "watchlist after the retrial parser no-op'd — the record of " +
    "record must never carry open flags)") {
    val f = new java.io.File("BENCH_X10.json")
    assert(f.isFile, "BENCH_X10.json missing — run tools/scale_probe.py run")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    for (p <- Seq("x10rel", "x10doc")) {
      val wl = root.path("probes").path(p).path("watchlist")
      assert(wl.isArray, s"BENCH_X10.json has no probes.$p.watchlist")
      assert(wl.size() == 0,
        s"$p watchlist non-empty: re-run the gate and adjudicate " +
          s"(isolated retrial) before shipping — ${wl.toString}")
    }
  }

  test("BENCH_X100.json ships adjudicated: the second-decade " +
    "watchlist is empty (VERDICT r14 #7: the r14 close committed a " +
    "non-empty x100 watchlist silently — run100's nonzero exit " +
    "existed but nothing in the close discipline consumed it; now " +
    "the suite goes red until tools/scale_probe.py run100 clears)") {
    val f = new java.io.File("BENCH_X100.json")
    assert(f.isFile, "BENCH_X100.json missing — run tools/scale_probe.py run100")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
    val wl = root.path("watchlist")
    assert(wl.isArray, "BENCH_X100.json has no watchlist")
    assert(wl.size() == 0,
      "x100 watchlist non-empty: name and cut the super-linear step " +
        s"(or adjudicate in SCALE.md), then re-run run100 — ${wl.toString}")
  }
}
