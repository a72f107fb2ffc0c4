package graft

import org.apache.spark.sql.SparkSession

/** Single place the engine's SparkSession is configured, so Bench,
  * Verify and tests all run the same way.
  *
  * Scale-relevant settings:
  *   - `spark.sql.shuffle.partitions` = cores in local mode (32 on the
  *     driver box); on a real cluster this is AQE-coalesced anyway.
  *   - AQE on (Spark 4 default) → runtime skew-join splitting and
  *     partition coalescing, the knobs that matter at 100 TB.
  *   - `parquet.nanosAsLong` + UTC session TZ: the driver's
  *     `events.parquet` layout has varied (TIMESTAMP(NANOS), then
  *     timestamp[us] without UTC adjustment); [[Tables.normalizeEventTs]]
  *     is schema-gated and canonicalizes any of them to a UTC TIMESTAMP
  *     that agrees with DuckDB's `epoch_us` semantics.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .withExtensions(new GraftSparkExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      // bloom_filter_agg (and stat.bloomFilter, which delegates to it
      // in Spark 4) silently CLAMPS its sketch at these caps — the
      // defaults (4M items / 64M bits = 8 MB) saturate a
      // 120M-edge filter to fpp ≈ 1, i.e. ZERO pruning, measured by
      // the r14 ×100 probe as gr2's closing join eating all 4.1B
      // wedges. 512 MB of filter per 100M+-key prune is the right
      // trade on any box this engine targets; past even THIS cap a
      // bloom degrades gracefully (less pruning, never wrong answers
      // — the exact join always decides), which is the documented
      // 10¹²-edge posture in SCALE.md.
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        (500L * 1000 * 1000).toString)
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        (4L * 1024 * 1024 * 1024).toString)
      // 64 MB broadcast threshold (default 10 MB): the r14 ×100 probe
      // measured the default's PLAN CLIFF — the co-purchase degree
      // and label tables are ~3 MB at ×10 (broadcast; edge rows never
      // shuffle for the attachment) but ~32 MB at ×100, where the
      // join fell off the threshold into a sort-merge that shuffled
      // the 120M-row edge relation twice (gr4 1.0 → 19.4 s, ~1.9×
      // super-linear). A node-sized dimension that fits executor
      // memory with room to spare should broadcast at any scale this
      // engine targets; genuinely corpus-scale build sides (x10/x12's
      // vocabularies) stay above even this threshold by orders of
      // magnitude, so their SMJ plans are unchanged.
      .config("spark.sql.autoBroadcastJoinThreshold",
        (64L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // WindowExec logs a "No Partition Defined ... may cause serious
    // performance degradation" WARN per unpartitioned window — every
    // such site in this engine runs over a relation bounded by
    // literals or aggregate grain, never corpus volume (documented
    // per site; VERDICT r15/r16 re-audited all nine), so the warning
    // is noise that buried the bench record's per-query tail under
    // hundreds of repeats (VERDICT r16 #5). Silence exactly this
    // logger; anything else at WARN still surfaces.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
