package graft.osm

import java.nio.file.Files

import graft.SparkSpec

/** The OSM ETL bench harness ([[OsmEtlBench]]) — the r11 verdict #4
  * gap: the engine's only never-benched baseline number was the
  * reference's mongoimport throughput. The full-size run is a bench
  * (OSM_BENCH.json); this spec pins the harness MECHANICS at
  * miniature scale so the bench can't silently measure the wrong
  * thing: generator determinism (same bytes twice), element-count
  * parity through the real source, and that every cleaning family
  * the generator plants actually survives into the shaped output.
  */
class OsmEtlBenchSpec extends SparkSpec {

  test("generator is deterministic (byte-identical on re-run) and " +
    "its element counts parse back exactly through OsmXmlSource — " +
    "the cell-36 parity check the bench relies on") {
    val dir = Files.createTempDirectory("osmgen").toString
    val (b1, nN, nW, nR) = OsmEtlBench.generate(s"$dir/a.osm", 0.002)
    val (b2, _, _, _) = OsmEtlBench.generate(s"$dir/b.osm", 0.002)
    assert(b1 == b2, "generated size differs between runs")
    val a = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/a.osm"))
    val b = Files.readAllBytes(java.nio.file.Paths.get(s"$dir/b.osm"))
    assert(java.util.Arrays.equals(a, b), "generator not deterministic")
    assert(OsmXmlSource.nodes(spark, s"$dir/a.osm").count() == nN)
    assert(OsmXmlSource.ways(spark, s"$dir/a.osm").count() == nW)
    assert(OsmXmlSource.relations(spark, s"$dir/a.osm").count() == nR)
    // the shaped union preserves the counts (no element lost in shape)
    val shaped = OsmXmlSource.collection(spark, s"$dir/a.osm")
      .groupBy("doc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shaped == Map("node" -> nN, "way" -> nW, "relation" -> nR))
    // the parts > 0 overload — the library's single-big-file path
    // (Spark's XML source can't split one file): identical output,
    // raw rows spread to `parts` partitions per record type BEFORE
    // the shape stage so encode/write parallelize
    val spread = OsmXmlSource.collection(spark, s"$dir/a.osm", 3)
    assert(spread.groupBy("doc_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == shaped)
    assert(spread.rdd.getNumPartitions == 9, // 3 types x 3 parts
      s"expected 3x3 partitions, got ${spread.rdd.getNumPartitions}")
  }

  test("the generated tag mix exercises the cleaning surface: shaped " +
    "output contains cleaned phones, canonical street types, fixed " +
    "states, bool tags, numeric promotions, and drops problemchars " +
    "keys — so the bench times the REAL shape work, not a strawman") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("osmgen2").toString
    OsmEtlBench.generate(s"$dir/c.osm", 0.01) // ~3.5k nodes
    val nodes = OsmShape.shape(OsmXmlSource.nodes(spark, s"$dir/c.osm"),
      "node").persist()
    // phone is a LIST key (OsmConstants.ListKeys): cleaned numbers
    // land in list_tags, each element through F1's +1-AAA-LLL-NNNN
    assert(nodes.filter(exists(col("list_tags").getItem("phone"),
      p => p.rlike("^\\+1-\\d{3}-\\d{3}-\\d{4}"))).count() > 0,
      "no cleaned phones (F1 emits +1-AAA-LLL-NNNN into list_tags)")
    assert(nodes.filter(col("addr").getItem("street")
      .endsWith("Street")).count() > 0, "no canonicalized street types")
    assert(nodes.filter(size(col("bool_tags")) > 0).count() > 0,
      "no bool promotions")
    assert(nodes.filter(size(col("int_tags")) > 0).count() > 0,
      "no int promotions")
    assert(nodes.filter(size(col("float_tags")) > 0).count() > 0,
      "no float promotions")
    assert(nodes.filter(size(col("list_tags")) > 0).count() > 0,
      "no list tags")
    // problemchars keys are dropped at the tag level, never shipped
    val badKey = nodes.filter(
      map_contains_key(col("tags"), "bad key")).count()
    assert(badKey == 0, "problemchars key survived the shape")
    nodes.unpersist()
  }
}
