package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Every query in the engine takes `(SparkSession, sfDir)` and reads
  * its inputs through here, so the same code runs at any scale factor
  * (and, on a real cluster, against any parquet root). Reads are plain
  * `spark.read.parquet` relations: Catalyst handles column pruning and
  * filter pushdown into the scan, which is the scale-critical property
  * (at 100 TB the scan must only materialize referenced columns).
  */
object Tables {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types.{LongType, TimestampNTZType}

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Normalize the driver-generated `events.ts` column to a session-TZ
    * TIMESTAMP regardless of how the driver wrote it. Observed layouts:
    *   - TIMESTAMP(NANOS): with `spark.sql.legacy.parquet.nanosAsLong`
    *     Spark surfaces the physical int64 → truncate ns → µs (exactly
    *     DuckDB's conversion) so oracle hashes agree.
    *   - timestamp[us] without UTC adjustment: Spark reads
    *     TIMESTAMP_NTZ → cast to TIMESTAMP. The session time zone is
    *     pinned to UTC ([[GraftSession]]), so the cast is
    *     value-preserving and matches DuckDB's `epoch_us` semantics.
    *   - TIMESTAMP: already the canonical form, no-op.
    * Schema-gated, so the same helper serves the batch reader and the
    * streaming parity specs — the two paths cannot diverge.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame   = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame   = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame   = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame   = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Cheap dataset-version stamp for per-session memos (GraphOps
    * edgeMemo, DedupOps verdictMemo): a hash of the table's file set
    * (name, length, mtime). Keying a memo on it means a REWRITTEN
    * dataset at the same path gets a fresh build instead of a silently
    * stale checkpoint — the staleness hole a path-only key leaves
    * open. Driver-side listing of one directory (a few files locally,
    * one metadata round-trip on a real FS) — never data-sized. Falls
    * back to 0 for non-local paths Java's File can't list (an
    * hdfs:// deployment would swap in a FileSystem.listStatus here);
    * 0 keys still memoize per-path, the pre-stamp behavior. */
  def versionStamp(dir: String, table: String): Long = {
    val f = new java.io.File(s"$dir/$table.parquet")
    val files: Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.sortBy(_.getName)
      else if (f.isFile) Seq(f)
      else Seq.empty
    files.foldLeft(0L) { (h, x) =>
      31L * (31L * (31L * h + x.getName.hashCode.toLong)
        + x.length()) + x.lastModified()
    }
  }

  /** Register every table as a temp view so the whole surface is also
    * reachable SQL-first (`spark.sql("SELECT ... FROM lineitem ...")`),
    * with the engine's registered functions (`dot_product`,
    * `format_phone`) callable inline. Views go through [[apply]], so
    * the events ns→µs normalization applies identically. */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach(n => apply(s, d, n).createOrReplaceTempView(n))
}
