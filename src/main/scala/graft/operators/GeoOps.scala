package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Geospatial capability (SURVEY §2.1 S6): the reference creates a
  * MongoDB `2d` index on `pos`; Spark has no secondary indexes, so the
  * engine's equivalent capability is (a) range predicates on lat/lon —
  * which push into the parquet scan and prune row groups via min/max
  * stats — and (b) grid-cell binning, the analytic face of a spatial
  * index (each deci-degree cell is one group key).
  *
  * At 100 TB the real lever is layout: partition or z-order the table
  * by the cell key so the bbox predicate prunes whole files; the query
  * below is layout-agnostic on purpose (same plan either way, only the
  * scan's pruning changes).
  *
  * Coordinates are synthesized deterministically from the order key
  * (the driver tables carry no geo columns) so the DuckDB oracle sees
  * identical inputs: lat = (k mod 1700)/10 − 85 ∈ [−85, 85),
  * lon = (k mod 3600)/10 − 180 ∈ [−180, 180).
  */
object GeoOps {

  /** geo1 — bounding-box filter + deci-degree grid binning over a
    * Pacific-Northwest-to-Atlantic band (wide enough that every scale
    * factor yields populated cells): count and average order price per
    * cell. One pipelined scan + one partial/final hash agg on the
    * integer cell key. */
  private def geo1(s: SparkSession, d: String): DataFrame = {
    val k = col("o_orderkey")
    val lat = (k % 1700).cast("double") / 10.0 - 85.0
    val lon = (k % 3600).cast("double") / 10.0 - 180.0
    Tables.orders(s, d)
      .select(k.as("o_orderkey"), col("o_totalprice"),
        lat.as("lat"), lon.as("lon"))
      .filter(col("lat") >= 40.0 && col("lat") <= 60.0 &&
        col("lon") >= -123.0 && col("lon") <= -30.0)
      // integer cell ids derived from the key, not from the FP lat/lon
      // (floor-of-double is engine-identical here but integer DIV is
      // self-evidently so)
      .groupBy(expr("(o_orderkey % 1700) DIV 10").as("cell_lat"),
        expr("(o_orderkey % 3600) DIV 10").as("cell_lon"))
      .agg(count(lit(1)).as("cnt"),
        graft.functions.Fns.roundFp(avg(col("o_totalprice")), 2).as("avg_price"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo1_bbox_bin" -> (geo1 _)
  )

  val oracles: Map[String, String] = Map(
    "geo1_bbox_bin" -> """
      WITH g AS (SELECT o_orderkey, o_totalprice,
        (o_orderkey % 1700)/10.0 - 85.0 AS lat,
        (o_orderkey % 3600)/10.0 - 180.0 AS lon
        FROM orders)
      SELECT (o_orderkey % 1700)//10 AS cell_lat,
        (o_orderkey % 3600)//10 AS cell_lon,
        count(*) AS cnt, floor(avg(o_totalprice)*100 + 0.5)/100 AS avg_price
      FROM g
      WHERE lat >= 40.0 AND lat <= 60.0 AND lon >= -123.0 AND lon <= -30.0
      GROUP BY 1, 2"""
  )
}
