package graft.osm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — the OSM XML source (SURVEY.md §2.1): the Spark-native
  * equivalent of the reference's streaming `ET.iterparse`
  * (clean_and_write.py:425). One `spark.read.format("xml")` per record
  * type — the `rowTag` selection is source-level pruning (non-target
  * elements never leave the scan) — then `unionByName` with a
  * `doc_type` discriminator, exactly the reference's three-shape
  * collection.
  *
  * Explicit schemas: ids/refs stay strings (the reference keeps OSM
  * ids as strings), lat/lon parse to double (F11), and schema
  * inference never runs (an inference pass would double-read 100 TB).
  */
object OsmXmlSource {

  private val tagArr = ArrayType(StructType(Seq(
    StructField("_k", StringType), StructField("_v", StringType))))

  private def attrs(extra: StructField*): StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("_version", StringType),
    StructField("_changeset", StringType),
    StructField("_timestamp", StringType),
    StructField("_user", StringType),
    StructField("_uid", StringType)) ++ extra)

  val nodeSchema: StructType = attrs(
    StructField("_lat", DoubleType),
    StructField("_lon", DoubleType),
    StructField("tag", tagArr))

  val waySchema: StructType = attrs(
    StructField("nd", ArrayType(StructType(Seq(StructField("_ref", StringType))))),
    StructField("tag", tagArr))

  val relationSchema: StructType = attrs(
    StructField("member", ArrayType(StructType(Seq(
      StructField("_type", StringType),
      StructField("_ref", StringType),
      StructField("_role", StringType))))),
    StructField("tag", tagArr))

  private def read(spark: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .schema(schema)
      .load(path)

  def nodes(spark: SparkSession, path: String): DataFrame =
    read(spark, path, "node", nodeSchema)

  def ways(spark: SparkSession, path: String): DataFrame =
    read(spark, path, "way", waySchema)

  def relations(spark: SparkSession, path: String): DataFrame =
    read(spark, path, "relation", relationSchema)

  /** All three record types shaped ([[OsmShape.shape]]) and unioned
    * into the single wide collection with `doc_type` discriminator. */
  def collection(spark: SparkSession, path: String): DataFrame = {
    val n = OsmShape.shape(nodes(spark, path), "node")
    val w = OsmShape.shape(ways(spark, path), "way")
    val r = OsmShape.shape(relations(spark, path), "relation")
    n.unionByName(w, allowMissingColumns = true)
      .unionByName(r, allowMissingColumns = true)
  }
}
