package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module registries; every key has a
  * matching `oracleSql` entry unless the operator is not SQL-expressible
  * (driver then records a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * TPC-H Q3-shaped: filtered dimension broadcast-joined to facts,
    * partial-aggregated revenue, top-10 via TakeOrderedAndProject —
    * the plan shape that survives a 100× scale-up.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    Tables.lineitem(spark, d)
      .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(graft.functions.Fns.roundFp(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline surface (text / dedup / similarity /
    * windowed ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.RelationalOps.queries ++
      operators.TextOps.queries ++
      operators.DedupOps.queries ++
      operators.SimilarityOps.queries ++
      operators.WindowOps.queries ++
      operators.CleanOps.queries ++
      operators.AnalyticsOps.queries ++
      operators.RangeOps.queries ++
      operators.GeoOps.queries ++
      operators.GraphOps.queries ++
      operators.SampleOps.queries ++
      operators.PipelineOps.queries ++
      operators.RetrievalOps.queries ++
      Map(
        "mm1_media_features" ->
          ((s: SparkSession, d: String) => multimodal.MediaPipeline.features(s, d)),
        "mm2_frame_sample" ->
          ((s: SparkSession, d: String) => multimodal.MediaPipeline.frameFeatures(s, d)),
        "mm3_audio_chunk" ->
          ((s: SparkSession, d: String) => multimodal.MediaPipeline.audioChunks(s, d)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.RelationalOps.oracles ++
      operators.TextOps.oracles ++
      operators.DedupOps.oracles ++
      operators.SimilarityOps.oracles ++
      operators.WindowOps.oracles ++
      operators.CleanOps.oracles ++
      operators.AnalyticsOps.oracles ++
      operators.RangeOps.oracles ++
      operators.GeoOps.oracles ++
      operators.GraphOps.oracles ++
      operators.SampleOps.oracles ++
      operators.PipelineOps.oracles ++
      operators.RetrievalOps.oracles ++
      Map("mm1_media_features" -> """
        WITH b AS (SELECT doc_id, md5(text) AS h,
          CASE WHEN doc_id % 3 = 0 THEN 'png' WHEN doc_id % 3 = 1 THEN 'jpg'
               ELSE 'wav' END AS fmt
          FROM documents),
        e AS (SELECT doc_id, fmt, list_transform(generate_series(0,15),
                i -> ('0x' || substr(h, 2*i+1, 2))::INT) AS bytes FROM b)
        SELECT doc_id, fmt, 16 AS n_bytes,
          ((bytes[1]*256 + bytes[2]) % 1920) + 1 AS width,
          ((bytes[3]*256 + bytes[4]) % 1080) + 1 AS height,
          round(list_sum(bytes)/16.0, 4) AS mean_byte
        FROM e""",
      "mm2_frame_sample" -> """
        WITH f AS (SELECT doc_id, u.f AS frame_idx,
          md5(text || ':' || u.f::VARCHAR) AS h
          FROM documents, (VALUES (0), (2)) u(f)),
        b AS (SELECT doc_id, frame_idx, list_transform(generate_series(0,15),
                j -> ('0x' || substr(h, 2*j+1, 2))::INT) AS bytes FROM f)
        SELECT doc_id, frame_idx,
          round(list_sum(bytes)/16.0, 4) AS frame_mean,
          len(list_filter(bytes, x -> x >= 128)) AS n_high
        FROM b""",
      "mm3_audio_chunk" -> """
        WITH a AS (SELECT doc_id, text,
          CAST((doc_id % 2500) + 500 AS INT) AS dur FROM documents),
        c AS (SELECT doc_id, text, dur,
          unnest(generate_series(0, CAST(ceil(dur/1000.0) AS INT) - 1))
            AS chunk_idx FROM a),
        b AS (SELECT doc_id, chunk_idx, dur,
          md5(text || ':a' || (chunk_idx % 3)::VARCHAR) AS h FROM c),
        e AS (SELECT doc_id, chunk_idx, dur,
          list_transform(generate_series(0,15),
            i -> ('0x' || substr(h, 2*i+1, 2))::INT) AS bytes FROM b)
        SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
          CAST(chunk_idx*1000 AS INT) AS start_ms,
          CAST(least((chunk_idx+1)*1000, dur) AS INT) AS end_ms,
          round(list_sum(bytes)/16.0, 4) AS chunk_mean
        FROM e""")
}
