package graft

/** Dev tool: print a registered query's physical plan (and optionally
  * run it) without a bench run — `runMain graft.Explain <name...>`.
  * Uses the same [[GraftSession]] as Bench/Verify so extension
  * functions (`might_contain`, …), shuffle partitions and broadcast
  * thresholds match what the benchmarked plan actually sees
  * (spark-shell's default session resolves none of those, r15).
  *
  * Flags: `--run` times full materialization (toRdd.count, the Bench
  * clock) twice — cold then warm; `--dir <path>` overrides the
  * default sf0.1 data dir (SPARK_GRAFT_SF_DIR also works).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("-"))
    val dirIdx = args.indexOf("--dir")
    val dir =
      if (dirIdx >= 0 && dirIdx + 1 < args.length) args(dirIdx + 1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val run = flags.contains("--run")
    val spark = GraftSession.local("graft-explain")
    val qs = names.filterNot(n => dirIdx >= 0 && n == args(dirIdx + 1))
    require(qs.nonEmpty, "usage: Explain [--run] [--dir <path>] <query...>")
    for (n <- qs) {
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n' (${SparkEntry.queries.size} registered)"))
      val df = fn(spark, dir)
      println(s"=== $n ===")
      df.explain("formatted")
      if (run) {
        for (tag <- Seq("cold", "warm")) {
          val t0 = System.nanoTime()
          df.queryExecution.toRdd.count()
          println(f"[$n $tag] ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
    }
    spark.stop()
  }
}
