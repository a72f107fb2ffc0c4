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
  *   - `parquet.nanosAsLong`: the driver's `events.parquet` carries
  *     TIMESTAMP(NANOS), which vanilla Spark refuses; we read the
  *     physical int64 and convert to a proper timestamp in
  *     [[Tables.events]] (truncating ns → µs exactly like DuckDB does,
  *     so oracle comparisons agree).
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
