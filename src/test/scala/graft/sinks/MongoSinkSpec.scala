package graft.sinks

import graft.SparkSpec
import graft.osm.OsmXmlSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** S3 — the MongoDB load path, tested to the edge of the sandbox: the
  * Extended-JSON dump is byte-checked against the canonical encoding
  * `mongoimport` consumes, and the connector config is validated with
  * the server's own naming rules. (A live insert needs a mongod this
  * environment doesn't have; everything up to the socket is covered.)
  */
class MongoSinkSpec extends SparkSpec {

  test("extended JSON encodes every BSON-relevant Catalyst type " +
    "canonically (exact line)") {
    import spark.implicits._
    val df = Seq(1).toDF("one").select(
      lit(5L).as("l"),
      lit(3).as("i"),
      lit("x").as("s"),
      lit(1.5).as("d"),
      lit(true).as("b"),
      lit(new java.sql.Timestamp(1000L)).as("ts"),
      array(lit(1L), lit(2L)).as("arr"),
      map(lit("k"), lit(7L)).as("m"),
      struct(lit(1L).as("a")).as("st"))
    val line = df.select(MongoExtendedJson.toExtendedJsonLine(df).as("v"))
      .collect().head.getString(0)
    assert(line ==
      """{"l":{"$numberLong":"5"},"i":{"$numberInt":"3"},"s":"x","d":1.5,""" +
      """"b":true,"ts":{"$date":{"$numberLong":"1000"}},""" +
      """"arr":[{"$numberLong":"1"},{"$numberLong":"2"}],""" +
      """"m":{"k":{"$numberLong":"7"}},"st":{"a":{"$numberLong":"1"}}}""", line)
  }

  test("nulls stay nulls — a null long/struct must not become " +
    "{\"$numberLong\": null}, which mongoimport rejects") {
    import spark.implicits._
    val df = Seq(1).toDF("one").select(
      lit(null).cast(LongType).as("l"),
      lit(null).cast(new StructType().add("a", LongType)).as("st"),
      lit("keep").as("s"))
    val line = df.select(MongoExtendedJson.toExtendedJsonLine(df).as("v"))
      .collect().head.getString(0)
    // to_json omits null fields — absent is what the reference's own
    // dump does for missing tags, and Mongo treats both as missing
    assert(line == """{"s":"keep"}""", line)
  }

  test("mongoimport dump of the shaped OSM collection round-trips " +
    "typed content partition-parallel") {
    val docs = OsmXmlSource.collection(spark,
      getClass.getResource("/mini.osm").getPath)
    val out = Files.createTempDirectory("graft-mongoimport").toString
    MongoImportSink.write(docs, out)
    val back = spark.read.json(out) // $-keyed wrappers become fields
    assert(back.count() == docs.count())
    val lanes = back.filter(col("_id") === "1003")
      .select(col("int_tags.lanes.$numberLong")).collect().head.getString(0)
    assert(lanes == "2")
    // int64 never travels as a bare JSON number anywhere in the dump
    val raw = spark.read.text(out)
    assert(raw.filter(col("value").contains(""""lanes":2""")).count() == 0)
  }

  test("field names Mongo rejects fail fast at the driver, naming " +
    "the offending path") {
    import spark.implicits._
    val df = Seq(1).toDF("one").select(
      lit(1L).as("$bad"),
      struct(lit(2L).as("a.b")).as("nested"),
      lit(3L).as("fine"))
    val bad = MongoExtendedJson.invalidFieldNames(df.schema)
    assert(bad == Seq("$bad", "nested.a.b"), bad)
    val e = intercept[IllegalArgumentException] {
      MongoImportSink.write(df, Files.createTempDirectory("x").toString)
    }
    assert(e.getMessage.contains("$bad"))
  }

  test("connector config emits exactly the v10 option keys and " +
    "enforces server naming rules") {
    val cfg = MongoSinkConfig("mongodb://localhost:27017", "osm", "elements")
    assert(cfg.toOptions == Map(
      "connection.uri" -> "mongodb://localhost:27017",
      "database" -> "osm",
      "collection" -> "elements"))
    assert(cfg.sink == FormatSink("mongodb", cfg.toOptions))
    intercept[IllegalArgumentException] {
      MongoSinkConfig("http://localhost", "osm", "elements")
    }
    intercept[IllegalArgumentException] {
      MongoSinkConfig("mongodb://h", "my.db", "elements")
    }
    intercept[IllegalArgumentException] {
      MongoSinkConfig("mongodb://h", "osm", "system.users")
    }
    intercept[IllegalArgumentException] {
      MongoSinkConfig("mongodb://h", "osm", "c" * 255)
    }
  }
}
