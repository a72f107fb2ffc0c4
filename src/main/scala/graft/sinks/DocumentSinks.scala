package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** The engine's sink surface (SURVEY.md §2.1 S2/S3/S5).
  *
  * One interface, three implementations:
  *   - [[JsonLinesSink]] — the reference's JSONL output
  *     (clean_and_write.py:413-420), minus its per-record file reopen
  *     anti-pattern (Spark writers keep one open file per task). JSON
  *     field order follows the DataFrame schema, which is stable —
  *     golden comparisons canonicalize keys anyway (SURVEY.md §7.4.4).
  *   - [[ParquetSink]] — the columnar table face used by the oracle
  *     harness and any downstream Spark consumer.
  *   - The MongoDB collection sink of the reference (`mongoimport`,
  *     main.ipynb cell 31) maps to the MongoDB Spark connector
  *     (`format("mongodb")`); that jar isn't shipped in this
  *     environment, so [[FormatSink]] carries the wiring and the
  *     connector name is a parameter — same write path, pluggable
  *     format.
  *
  * All sinks write partition-parallel (one file per task); `overwrite`
  * gives the reference's drop-and-recreate semantics (S5).
  */
trait DocumentSink {
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit

  protected def mode(overwrite: Boolean): SaveMode =
    if (overwrite) SaveMode.Overwrite else SaveMode.Append
}

object JsonLinesSink extends DocumentSink {
  override def write(df: DataFrame, path: String, overwrite: Boolean): Unit =
    df.write.mode(mode(overwrite)).json(path)
}

object ParquetSink extends DocumentSink {
  override def write(df: DataFrame, path: String, overwrite: Boolean): Unit =
    df.write.mode(mode(overwrite)).parquet(path)
}

/** Generic format-keyed sink — e.g. `FormatSink("mongodb")` with the
  * connector on the classpath, options `connection.uri`/`database`/
  * `collection`. */
case class FormatSink(format: String, options: Map[String, String] = Map.empty)
  extends DocumentSink {
  override def write(df: DataFrame, path: String, overwrite: Boolean): Unit = {
    val w = df.write.mode(mode(overwrite)).format(format).options(options)
    if (path.nonEmpty) w.save(path) else w.save()
  }
}

/** Hive-style partitioned parquet sink — the LAYOUT lever at 100 TB:
  * writing the corpus partitioned by a low-cardinality curation key
  * (source, language, train/val/test split) turns every downstream
  * filter on that key into directory pruning — zero I/O for the
  * excluded partitions, visible as `PartitionFilters` in the scan.
  * Keep partition keys low-cardinality (≤ thousands of directories);
  * high-cardinality layout belongs to bucketing (`BucketingSpec`). */
case class PartitionedParquetSink(partitionKeys: String*)
  extends DocumentSink {
  override def write(df: DataFrame, path: String, overwrite: Boolean): Unit =
    df.write.mode(mode(overwrite))
      .partitionBy(partitionKeys: _*)
      .parquet(path)
}
