package graft.sinks

import graft.SparkSpec
import graft.osm.OsmXmlSource

/** OPT-IN live MongoDB integration (VERDICT r12 #6) — the one S3
  * behavior a sandbox cannot exercise: an actual connector insert.
  * Skips (cancels) unless BOTH prerequisites exist:
  *
  *   1. `SPARK_GRAFT_MONGO_URI` points at a reachable mongod, and
  *   2. the MongoDB Spark connector class is on the classpath
  *      (`mongo-spark-connector_2.13:10.x` — not shipped here).
  *
  * Runbook: README "Live MongoDB load". With both present this
  * round-trips the mini.osm fixture through the REAL
  * `format("mongodb")` write and reads it back; everything else
  * about S3 (canonical Extended-JSON, null policy, field-name
  * validation, mongoimport-format dump) is covered by the always-on
  * MongoSinkSpec against golden bytes.
  */
class MongoLiveSpec extends SparkSpec {

  private def connectorPresent: Boolean =
    try { Class.forName("com.mongodb.spark.sql.connector.MongoTableProvider"); true }
    catch { case _: Throwable => false }

  test("live connector round-trip: shaped mini.osm writes via " +
    "format(\"mongodb\") and reads back with the same counts " +
    "[skips without SPARK_GRAFT_MONGO_URI + connector jar]") {
    assume(sys.env.contains("SPARK_GRAFT_MONGO_URI"),
      "SPARK_GRAFT_MONGO_URI not set — live Mongo test skipped")
    assume(connectorPresent,
      "mongo-spark-connector not on classpath — live Mongo test skipped")
    val cfg = MongoSinkConfig(sys.env("SPARK_GRAFT_MONGO_URI"),
      sys.env.getOrElse("SPARK_GRAFT_MONGO_DB", "graft_it"),
      sys.env.getOrElse("SPARK_GRAFT_MONGO_COLLECTION", "mini_osm"))
    val xml = getClass.getResource("/mini.osm").getPath
    val docs = OsmXmlSource.collection(spark, xml)
    val n = docs.count()
    cfg.sink.write(docs, path = "", overwrite = true)
    val back = spark.read.format("mongodb").options(cfg.toOptions).load()
    assert(back.count() == n, "round-trip count drifted")
    assert(back.columns.contains("doc_type"))
  }
}
