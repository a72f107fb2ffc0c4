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

  /** geo2 — Z-ORDER layout statistic: interleave the two 8-bit cell
    * coordinates into a 16-bit Morton code, group rows into z-buckets
    * (64 consecutive codes = one 8×8-cell block ≈ one file at scale),
    * and report per-bucket total vs bbox-member counts. This measures
    * the thing z-ordering exists for: a 2-D bbox maps to FEW contiguous
    * z-ranges, so bbox rows concentrate in a small minority of buckets
    * (`NewOpsSpec` pins the locality bound) — lay parquet files out in
    * z order and min/max file stats prune everything else. The
    * interleave itself is pure codegen'd integer bit math, zero
    * shuffle; the only exchange is the final per-bucket agg. */
  private def geo2(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      expr("(o_orderkey % 1700) DIV 10").as("clat"),
      expr("((o_orderkey % 3600) DIV 10) DIV 2").as("clon2"))
    val z = (0 until 8).map { b =>
      (shiftright(col("clat"), b) % 2) * lit(1L << (2 * b + 1)) +
        (shiftright(col("clon2"), b) % 2) * lit(1L << (2 * b))
    }.reduce(_ + _)
    base.withColumn("z", z)
      // the cell-granular COVER of geo1's bbox (lat 40..60, lon
      // -123..-30): boundary cells 145/28/75 extend slightly past the
      // row-level predicate on three unaligned edges — deliberately,
      // because file pruning operates at cell granularity and must be
      // conservative (a file is read iff any of its cells intersects)
      .withColumn("in_bbox", col("clat").between(125, 145) &&
        col("clon2").between(28, 75))
      .groupBy(expr("z DIV 64").as("zbucket"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("in_bbox"), 1L).otherwise(0L)).as("bbox_cnt"))
  }

  /** geo3's radius, in deci-degrees — pairs match when their squared
    * planar distance ≤ R². Integer metric on the synthesized integer
    * coordinates, so the join predicate and the histogram are exact
    * in any engine (no haversine trig — a libm sin/cos can differ in
    * the last ulp across engines, and for a city-extent radius the
    * planar approximation is the standard production shortcut). */
  private[graft] val GEO3_R = 2L

  /** geo3 — the NEAR query (the reference's 2d index exists for
    * exactly this MongoDB `$near`/`$geoWithin` shape; geo1/geo2 cover
    * its bbox and layout faces): all point PAIRS within radius
    * [[GEO3_R]], reported as the exact squared-distance histogram
    * (dist² → n_pairs) — the proximity-density profile a
    * clustering/conflation pass reads.
    *
    * Scale design — never all-pairs (the r3 grid discipline): points
    * land in R-sized grid cells; ONE side fans out to its 3×3
    * neighbor cells (9× on integer keys only) and equi-joins the
    * other side's single home cell, so every qualifying pair is
    * found EXACTLY ONCE (b's home cell is one of a's nine) — no
    * claim-cell dedup pass needed, unlike interval overlap. Each
    * task's pair space is bounded by cell population (at real scale:
    * AQE skew-split on hot cells); the oid < oid guard keeps pairs
    * canonical, and the output is the ≤(R²+1)-row histogram. */
  private def geo3(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.md5Long
    // hashed placement, NOT geo1's modulo lattice: k%1700 / k%3600
    // couple through the key (neighbors exist only at key-diffs ≡ ±1
    // mod lcm — a near-empty histogram); md5-scattering models
    // organically placed points, and the oracle hashes identically
    val pts = Tables.orders(s, d).select(
      col("o_orderkey").as("oid"),
      (md5Long(col("o_orderkey")) % 1700).as("u"),
      (md5Long(col("o_orderkey") + 7) % 3600).as("v"))
      .select(col("oid"), col("u"), col("v"),
        expr(s"u div $GEO3_R").as("cu"), expr(s"v div $GEO3_R").as("cv"))
    // HALF-NEIGHBORHOOD fan-out (r17, guide §2.3 — shuffle/broadcast
    // fewer bytes): the 3×3 fan-out emitted 9 probe rows per point
    // and found every CROSS-cell pair twice (a probing b's home cell
    // AND b probing a's), spending the oid guard on dedup. Probing
    // only the positive half — home, N, NE, E, SE, i.e. (du,dv) ∈
    // {(0,0),(0,1),(1,−1),(1,0),(1,1)} — finds each cross-cell pair
    // EXACTLY ONCE (the non-home offsets are an antisymmetric set:
    // cb−ca is in it iff ca−cb is not, so exactly one endpoint owns
    // the probe), while same-cell pairs meet via both home probes
    // and keep the oid guard. 5/9 of the probe rows and ~half the
    // raw join output reach the aggregation; dist² is symmetric, so
    // pair orientation never changes the histogram — row-identical
    // to the oracle's 3×3 form, which the sf-ladder verify replays.
    val probes = pts.select(col("oid").as("a_oid"), col("u").as("a_u"),
        col("v").as("a_v"), col("cu"), col("cv"),
        explode(expr("array(array(0L, 0L), array(0L, 1L), " +
          "array(1L, -1L), array(1L, 0L), array(1L, 1L))")).as("o"))
      .select(col("a_oid"), col("a_u"), col("a_v"),
        (col("cu") + col("o").getItem(0)).as("cu"),
        (col("cv") + col("o").getItem(1)).as("cv"),
        (col("o").getItem(0) === 0L && col("o").getItem(1) === 0L)
          .as("home"))
    probes.join(pts, Seq("cu", "cv"))
      .filter(!col("home") || col("a_oid") < col("oid"))
      .withColumn("dist2",
        (col("a_u") - col("u")) * (col("a_u") - col("u")) +
          (col("a_v") - col("v")) * (col("a_v") - col("v")))
      .filter(col("dist2") <= GEO3_R * GEO3_R)
      .groupBy(col("dist2")).agg(count(lit(1)).as("n_pairs"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo1_bbox_bin" -> (geo1 _),
    "geo2_zorder" -> (geo2 _),
    "geo3_radius_pairs" -> (geo3 _)
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
      GROUP BY 1, 2""",
    "geo2_zorder" -> """
      WITH g AS (SELECT (o_orderkey % 1700)//10 AS clat,
                   ((o_orderkey % 3600)//10)//2 AS clon2 FROM orders),
      z AS (SELECT clat, clon2,
              CAST(list_sum(list_transform(generate_series(0,7), b ->
                ((clat >> b) & 1) * (1 << (2*b+1)) +
                ((clon2 >> b) & 1) * (1 << (2*b)))) AS BIGINT) AS z
            FROM g)
      SELECT z//64 AS zbucket, count(*) AS cnt,
        CAST(sum(CASE WHEN clat BETWEEN 125 AND 145
                   AND clon2 BETWEEN 28 AND 75 THEN 1 ELSE 0 END) AS BIGINT)
          AS bbox_cnt
      FROM z GROUP BY 1""",
    // the same 3x3-neighbor-cell equi-join shape (each pair found
    // once via b's home cell), same all-integer squared metric
    "geo3_radius_pairs" -> s"""
      WITH p0 AS (SELECT o_orderkey AS oid,
               ('0x' || substr(md5(o_orderkey::VARCHAR),1,15))::BIGINT
                 % 1700 AS u,
               ('0x' || substr(md5((o_orderkey + 7)::VARCHAR),1,15))::BIGINT
                 % 3600 AS v
             FROM orders),
      pts AS (SELECT oid, u, v, u // $GEO3_R AS cu, v // $GEO3_R AS cv
              FROM p0),
      probes AS (SELECT oid AS a_oid, u AS a_u, v AS a_v,
                   cu + gu.du AS cu, cv + gv.dv AS cv
                 FROM pts,
                      generate_series(-1, 1) gu(du),
                      generate_series(-1, 1) gv(dv)),
      pairs AS (SELECT (p.a_u - b.u) * (p.a_u - b.u)
                  + (p.a_v - b.v) * (p.a_v - b.v) AS dist2
                FROM probes p JOIN pts b
                  ON p.cu = b.cu AND p.cv = b.cv AND p.a_oid < b.oid)
      SELECT CAST(dist2 AS BIGINT) AS dist2, count(*) AS n_pairs
      FROM pairs WHERE dist2 <= ${GEO3_R * GEO3_R} GROUP BY 1"""
  )
}
