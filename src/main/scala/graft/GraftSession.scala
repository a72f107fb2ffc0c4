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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
