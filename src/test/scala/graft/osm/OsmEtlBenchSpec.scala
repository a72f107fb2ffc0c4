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

  // ---- OsmChunk (r13: the parallel-parse ingest path) ---------------

  test("nextBoundary matches only real top-level element starts: " +
    "<node /<way /<relation with a legal follower — never <nd, never " +
    "a longer name, never inside plain text bytes") {
    def find(s: String): Int =
      OsmChunk.nextBoundary(s.getBytes("UTF-8"), 0, s.length)
    assert(find("""  <node id="1" lat="0"/>""") == 2)
    assert(find("  <way>") == 2)
    assert(find("""  <relation x="y">""") == 2)
    assert(find("""  <nd ref="5"/>  <tag k="a"/>""") == -1)
    assert(find("  <nodes>") == -1, "<nodes> matched as <node>")
    assert(find("  <wayside>") == -1)
    // attribute values cannot contain raw '<' in well-formed XML, so
    // no false-positive case exists there; escaped forms don't match
    assert(find("""  <tag k="x" v="&lt;node sneaky&gt;"/>""") == -1)
  }

  test("chunked reads are EXACTLY the unchunked reads — same shaped " +
    "rows per type — and the fragment directory parses as multiple " +
    "parallel partitions") {
    val dir = Files.createTempDirectory("osmchunk").toString
    val xml = s"$dir/d.osm"
    OsmEtlBench.generate(xml, 0.002) // ~710 nodes / 60 ways / 1 rel
    val nFrag = OsmChunk.chunk(xml, s"$dir/frags", 5)
    assert(nFrag >= 2 && nFrag <= 5, s"expected 2..5 fragments, got $nFrag")
    // fragments bin-pack by size (spark.sql.files.openCostInBytes),
    // so partitions ≤ fragments; >1 is the parallel-parse evidence a
    // single unsplittable file can never show
    val nPart = OsmXmlSource.nodes(spark, s"$dir/frags").rdd.getNumPartitions
    assert(nPart > 1 && nPart <= nFrag,
      s"expected 2..$nFrag parse partitions, got $nPart")
    for (t <- Seq("node", "way", "relation")) {
      val rd = (p: String) => t match {
        case "node" => OsmXmlSource.nodes(spark, p)
        case "way" => OsmXmlSource.ways(spark, p)
        case _ => OsmXmlSource.relations(spark, p)
      }
      val whole = OsmShape.shape(rd(xml), t)
        .collect().map(_.toString).sorted
      val parts = OsmShape.shape(rd(s"$dir/frags"), t)
        .collect().map(_.toString).sorted
      assert(whole.length == parts.length, s"$t count drifted")
      assert(whole.sameElements(parts), s"$t content drifted under chunking")
    }
  }

  test("the scanner never cuts inside a comment or CDATA section — " +
    "fake element markup embedded there (legal raw '<') cannot " +
    "become a fragment boundary, and chunked == unchunked holds") {
    val dir = Files.createTempDirectory("osmcmt").toString
    val xml = s"$dir/cmt.osm"
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
    for (i <- 0 until 40)
      sb ++= s"""  <node id="$i" lat="1.0" lon="2.0" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1"/>\n"""
    // a comment big enough that several evenly spaced targets land
    // INSIDE it, stuffed with decoy element starts
    sb ++= "  <!--\n"
    for (i <- 0 until 2000)
      sb ++= s"""    <node id="fake$i" lat="9" lon="9"/> <way> <relation>\n"""
    sb ++= "  -->\n"
    sb ++= "  <![CDATA[ <node id=\"alsofake\"/> <way ]]>\n"
    for (i <- 40 until 80)
      sb ++= s"""  <node id="$i" lat="1.0" lon="2.0" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1"/>\n"""
    sb ++= s"""  <way id="900" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1">\n    <nd ref="1"/>\n    <tag k="highway" v="x"/>\n  </way>\n"""
    sb ++= "</osm>\n"
    Files.write(java.nio.file.Paths.get(xml), sb.toString.getBytes("UTF-8"))
    val nFrag = OsmChunk.chunk(xml, s"$dir/frags", 16)
    assert(nFrag >= 2, s"expected multiple fragments, got $nFrag")
    // no fragment may contain an unbalanced comment/CDATA: every
    // fragment must itself parse — count equality proves it
    assert(OsmXmlSource.nodes(spark, s"$dir/frags").count() == 80,
      "node count drifted under comment/CDATA chunking")
    assert(OsmXmlSource.ways(spark, s"$dir/frags").count() == 1)
    val whole = OsmShape.shape(OsmXmlSource.nodes(spark, xml), "node")
      .collect().map(_.toString).sorted
    val parts = OsmShape.shape(OsmXmlSource.nodes(spark, s"$dir/frags"), "node")
      .collect().map(_.toString).sorted
    assert(whole.sameElements(parts), "content drifted")
    // and the cut offsets themselves avoid the comment span
    val bytes = sb.toString.getBytes("UTF-8")
    val cmtFrom = sb.indexOf("<!--"); val cmtTo = sb.indexOf("-->") + 3
    val cuts = OsmChunk.findCuts(xml, (1 until 16).map(k =>
      bytes.length.toLong * k / 16))
    assert(cuts.nonEmpty)
    cuts.foreach(c => assert(c < cmtFrom || c >= cmtTo,
      s"cut $c inside the comment span [$cmtFrom,$cmtTo)"))
  }

  test("the scanner never cuts inside a processing instruction — " +
    "decoy element markup in PI content (legal raw '<', ADVICE r13) " +
    "cannot become a fragment boundary, and chunked == unchunked " +
    "holds") {
    val dir = Files.createTempDirectory("osmpi").toString
    val xml = s"$dir/pi.osm"
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
    for (i <- 0 until 40)
      sb ++= s"""  <node id="$i" lat="1.0" lon="2.0" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1"/>\n"""
    // a PI big enough that several evenly spaced targets land INSIDE
    // it, stuffed with decoy element starts
    sb ++= "  <?render\n"
    for (i <- 0 until 2000)
      sb ++= s"""    <node id="fake$i" lat="9" lon="9"/> <way <relation\n"""
    sb ++= "  ?>\n"
    for (i <- 40 until 80)
      sb ++= s"""  <node id="$i" lat="1.0" lon="2.0" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1"/>\n"""
    sb ++= "</osm>\n"
    Files.write(java.nio.file.Paths.get(xml), sb.toString.getBytes("UTF-8"))
    val nFrag = OsmChunk.chunk(xml, s"$dir/frags", 16)
    assert(nFrag >= 2, s"expected multiple fragments, got $nFrag")
    assert(OsmXmlSource.nodes(spark, s"$dir/frags").count() == 80,
      "node count drifted under PI chunking")
    val whole = OsmShape.shape(OsmXmlSource.nodes(spark, xml), "node")
      .collect().map(_.toString).sorted
    val parts = OsmShape.shape(OsmXmlSource.nodes(spark, s"$dir/frags"), "node")
      .collect().map(_.toString).sorted
    assert(whole.sameElements(parts), "content drifted")
    // and the cut offsets themselves avoid the PI span
    val bytes = sb.toString.getBytes("UTF-8")
    val piFrom = sb.indexOf("<?render"); val piTo = sb.indexOf("?>", piFrom) + 2
    val cuts = OsmChunk.findCuts(xml, (1 until 16).map(k =>
      bytes.length.toLong * k / 16))
    assert(cuts.nonEmpty)
    cuts.foreach(c => assert(c < piFrom || c >= piTo,
      s"cut $c inside the PI span [$piFrom,$piTo)"))
  }

  test("property sweep: 20 seeded-random interleavings of elements, " +
    "decoy-stuffed comments, PIs and CDATA, chunked at n = 2/3/7/16 " +
    "— every (file, n) pair parses to the unchunked counts exactly") {
    val dir = Files.createTempDirectory("osmprop").toString
    // splitmix64 — deterministic, no java.util.Random state
    var z = 0x9e3779b97f4a7c15L
    def rnd(m: Int): Int = {
      z += 0x9e3779b97f4a7c15L
      var x = z
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      (((x ^ (x >>> 31)) >>> 8) % m).toInt
    }
    for (f <- 0 until 20) {
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\"?>\n<osm version=\"0.6\">\n"
      var (nN, nW, nR) = (0, 0, 0)
      for (_ <- 0 until (20 + rnd(60))) rnd(11) match {
        case 0 | 1 | 2 | 3 | 4 =>
          sb ++= s"""  <node id="${nN + 1000}" lat="1" lon="2"/>\n"""
          nN += 1
        case 5 | 6 =>
          sb ++= s"""  <way id="${nW + 5000}"><nd ref="1000"/><tag k="highway" v="x"/></way>\n"""
          nW += 1
        case 7 =>
          sb ++= s"""  <relation id="${nR + 9000}"><member type="node" ref="1000" role=""/></relation>\n"""
          nR += 1
        case 8 =>
          sb ++= "  <!-- decoy " +
            ("<node id=\"f\" lat=\"9\"/> <way> <relation> " * (1 + rnd(12))) +
            "-->\n"
        case 9 =>
          // processing instruction stuffed with decoys (ADVICE r13:
          // PI content may legally contain raw '<')
          sb ++= "  <?decoy " +
            ("<node id=\"f\" lat=\"9\"/> <way <relation " * (1 + rnd(8))) +
            "?>\n"
        case _ =>
          sb ++= "  <![CDATA[ decoy <node/> <way " +
            ("x" * rnd(64)) + " ]]>\n"
      }
      sb ++= "</osm>\n"
      val xml = s"$dir/p$f.osm"
      Files.write(java.nio.file.Paths.get(xml), sb.toString.getBytes("UTF-8"))
      for (n <- Seq(2, 3, 7, 16)) {
        OsmChunk.chunk(xml, s"$dir/f$f-$n", n)
        assert(OsmXmlSource.nodes(spark, s"$dir/f$f-$n").count() == nN,
          s"file $f n=$n: node count drifted")
        assert(OsmXmlSource.ways(spark, s"$dir/f$f-$n").count() == nW,
          s"file $f n=$n: way count drifted")
        assert(OsmXmlSource.relations(spark, s"$dir/f$f-$n").count() == nR,
          s"file $f n=$n: relation count drifted")
      }
    }
  }

  test("a DOCTYPE-carrying file (DTD internal subsets may embed " +
    "markup) is copied as ONE fragment rather than risked") {
    val dir = Files.createTempDirectory("osmdtd").toString
    val xml = s"$dir/dtd.osm"
    val content = "<?xml version=\"1.0\"?>\n<!DOCTYPE osm [ <!ENTITY e \"x\"> ]>\n" +
      "<osm version=\"0.6\">\n" +
      (0 until 50).map(i =>
        s"""  <node id="$i" lat="1" lon="2" version="1" changeset="1" timestamp="2015-01-01T00:00:00Z" user="u" uid="1"/>""").mkString("\n") +
      "\n</osm>\n"
    Files.write(java.nio.file.Paths.get(xml), content.getBytes("UTF-8"))
    assert(OsmChunk.chunk(xml, s"$dir/frags", 8) == 1)
    val orig = Files.readAllBytes(java.nio.file.Paths.get(xml))
    val copied = Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/frags/part-00000.osm"))
    assert(java.util.Arrays.equals(orig, copied))
  }

  test("chunk refuses a regular file at the output path and reports " +
    "stale-fragment deletion failures loudly") {
    val dir = Files.createTempDirectory("osmclr").toString
    val xml = s"$dir/g.osm"
    OsmEtlBench.generate(xml, 0.0)
    Files.write(java.nio.file.Paths.get(s"$dir/occupied"), "x".getBytes)
    val ex = intercept[RuntimeException](
      OsmChunk.chunk(xml, s"$dir/occupied", 2))
    assert(ex.getMessage.contains("regular file"))
  }

  test("chunk handles degenerate inputs: n=1 copies verbatim, n far " +
    "beyond the element count yields fewer fragments, content intact") {
    val dir = Files.createTempDirectory("osmchunk2").toString
    val xml = s"$dir/tiny.osm"
    OsmEtlBench.generate(xml, 0.0) // generator floors: 10 nodes/2 ways/1 rel
    assert(OsmChunk.chunk(xml, s"$dir/one", 1) == 1)
    val orig = Files.readAllBytes(java.nio.file.Paths.get(xml))
    val copied = Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/one/part-00000.osm"))
    assert(java.util.Arrays.equals(orig, copied), "n=1 is not a verbatim copy")
    val many = OsmChunk.chunk(xml, s"$dir/many", 64)
    assert(many <= 64)
    assert(OsmXmlSource.nodes(spark, s"$dir/many").count() ==
      OsmXmlSource.nodes(spark, xml).count())
    assert(OsmXmlSource.relations(spark, s"$dir/many").count() ==
      OsmXmlSource.relations(spark, xml).count())
  }

  test("chunked() memoizes per source version: same stamp reuses the " +
    "fragment dir; touching the source re-chunks") {
    val dir = Files.createTempDirectory("osmchunk3").toString
    val xml = s"$dir/e.osm"
    OsmEtlBench.generate(xml, 0.001)
    val out1 = OsmChunk.chunked(xml, 4)
    val frag = new java.io.File(out1).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val m1 = frag.lastModified()
    Thread.sleep(1100) // FS mtime resolution
    assert(OsmChunk.chunked(xml, 4) == out1)
    assert(frag.lastModified() == m1, "reused dir was rewritten")
    new java.io.File(xml).setLastModified(System.currentTimeMillis())
    OsmChunk.chunked(xml, 4)
    assert(frag.lastModified() != m1 || !frag.exists(),
      "source touch did not re-chunk")
  }

  test("chunked()'s reuse stamp carries the chunker format version — " +
    "a directory from an older splitting algorithm re-chunks instead " +
    "of being trusted forever (ADVICE r13)") {
    val dir = Files.createTempDirectory("osmver").toString
    val xml = s"$dir/v.osm"
    OsmEtlBench.generate(xml, 0.001)
    val out = OsmChunk.chunked(xml, 4)
    val stampPath = java.nio.file.Paths.get(out, "_SOURCE_STAMP")
    val stamp = new String(Files.readAllBytes(stampPath), "UTF-8")
    assert(stamp.startsWith(s"v${OsmChunk.FormatVersion}:"), stamp)
    // simulate a directory left by an older algorithm: same
    // length/mtime/n, older version prefix → must re-chunk
    Files.write(stampPath,
      stamp.replaceFirst("^v\\d+:", "v1:").getBytes("UTF-8"))
    val frag = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("part-")).head
    val m1 = frag.lastModified()
    Thread.sleep(1100) // FS mtime resolution
    assert(OsmChunk.chunked(xml, 4) == out)
    assert(frag.lastModified() != m1 || !frag.exists(),
      "old-format-version directory was trusted without re-chunking")
    assert(new String(Files.readAllBytes(stampPath), "UTF-8")
      .startsWith(s"v${OsmChunk.FormatVersion}:"))
  }

  test("OsmXmlSource.collection transparently chunks a single .osm " +
    "over the size threshold (VERDICT r13 #7): the resolved read is " +
    "the fragment directory with no post-scan exchange, rows are " +
    "EXACTLY the unchunked collection's, and an unchunkable file " +
    "falls back to post-scan redistribution") {
    val dir = Files.createTempDirectory("osmauto").toString
    val xml = s"$dir/auto.osm"
    OsmEtlBench.generate(xml, 0.002)
    // over-threshold relative to a 1 KiB test threshold — the
    // wrapper's decision logic, exercised without a 16 MiB fixture
    val (p, parts) = OsmXmlSource.resolveChunked(spark, xml, 1024)
    assert(p != xml && parts == 0, s"expected fragment dir, got ($p, $parts)")
    assert(new java.io.File(p).isDirectory)
    val auto = OsmXmlSource.collection(spark, p, parts)
      .collect().map(_.toString).sorted
    val whole = OsmXmlSource.collection(spark, xml, 0)
      .collect().map(_.toString).sorted
    assert(auto.sameElements(whole), "wrapper drifted from direct read")
    // under threshold: passthrough, no chunk dir materialized
    val (p2, parts2) =
      OsmXmlSource.resolveChunked(spark, xml, Long.MaxValue)
    assert(p2 == xml && parts2 == 0)
    // unchunkable (DOCTYPE → 1 fragment): single-file scan + fan-out
    val dtd = s"$dir/dtd.osm"
    Files.write(java.nio.file.Paths.get(dtd),
      ("<?xml version=\"1.0\"?>\n<!DOCTYPE osm [ <!ENTITY e \"x\"> ]>\n" +
        "<osm version=\"0.6\">\n  <node id=\"1\" lat=\"1\" lon=\"2\"/>\n" +
        "</osm>\n").getBytes("UTF-8"))
    val (p3, parts3) = OsmXmlSource.resolveChunked(spark, dtd, 16)
    assert(p3 == dtd && parts3 == spark.sparkContext.defaultParallelism,
      s"expected fallback redistribution, got ($p3, $parts3)")
    // and the PUBLIC two-arg collection on an under-threshold file is
    // the plain unchunked read
    assert(OsmXmlSource.collection(spark, xml)
      .collect().map(_.toString).sorted.sameElements(whole))
  }

  test("resolveChunked probes NON-local paths through Hadoop instead " +
    "of java.io.File (ADVICE r14): an over-threshold remote single " +
    "file keeps the post-scan fan-out, an under-threshold one and a " +
    "remote directory pass through, an unprobeable path keeps the " +
    "fan-out") {
    val par = spark.sparkContext.defaultParallelism
    val dir = Files.createTempDirectory("osmremote").toString
    val f = s"$dir/r.osm"
    Files.write(java.nio.file.Paths.get(f),
      ("<osm version=\"0.6\"><node id=\"1\" lat=\"1\" lon=\"2\"/>" +
        "</osm>").getBytes("UTF-8"))
    // file:// URIs are not java.io.File paths, so they exercise the
    // Hadoop-probe branch with deterministic local statuses
    val (po, po_n) = OsmXmlSource.resolveChunked(spark, s"file://$f", 16)
    assert(po == s"file://$f" && po_n == par,
      s"over-threshold remote file must fan out, got ($po, $po_n)")
    val (pu, pu_n) =
      OsmXmlSource.resolveChunked(spark, s"file://$f", Long.MaxValue)
    assert(pu == s"file://$f" && pu_n == 0)
    val (pd, pd_n) = OsmXmlSource.resolveChunked(spark, s"file://$dir", 16)
    assert(pd == s"file://$dir" && pd_n == 0,
      s"remote directory is already N parse tasks, got ($pd, $pd_n)")
    val ghost = s"file://$dir/nope.osm"
    val (pg, pg_n) = OsmXmlSource.resolveChunked(spark, ghost, 16)
    assert(pg == ghost && pg_n == par,
      s"unprobeable path must keep the fan-out, got ($pg, $pg_n)")
  }

  test("looksComplete requires the count-stamped generator header " +
    "AND the closing tag — a stale or truncated file regenerates") {
    val dir = Files.createTempDirectory("osmlc").toString
    val xml = s"$dir/f.osm"
    val (_, nN, nW, nR) = OsmEtlBench.generate(xml, 0.001)
    assert(OsmEtlBench.looksComplete(xml, nN, nW, nR))
    // wrong expected counts (old generator constants) → incomplete
    assert(!OsmEtlBench.looksComplete(xml, nN + 1, nW, nR))
    // truncation (lost </osm>) → incomplete even with a valid header
    val raf = new java.io.RandomAccessFile(xml, "rw")
    try raf.setLength(raf.length() - 8) finally raf.close()
    assert(!OsmEtlBench.looksComplete(xml, nN, nW, nR))
  }
  // ---- hasDoctype prologue scan (r13 review #4) ----------------------

  test("hasDoctype finds a DTD behind a prologue comment longer than " +
    "any fixed window, ignores a commented-out DOCTYPE, and stops at " +
    "the root") {
    val dir = java.nio.file.Files.createTempDirectory("osmdtd2").toString
    def write(name: String, content: String): String = {
      val p = s"$dir/$name"
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        content.getBytes("UTF-8"))
      p
    }
    val pad = "x" * 8192
    val longPrologueDtd = write("a.osm",
      s"<?xml version=\"1.0\"?>\n<!-- $pad -->\n" +
        "<!DOCTYPE osm [ <!ENTITY e \"<node sneaky/>\"> ]>\n" +
        "<osm version=\"0.6\">\n  <node id=\"1\" lat=\"1\" lon=\"2\"/>\n</osm>\n")
    assert(OsmChunk.hasDoctype(longPrologueDtd),
      "DTD behind an 8 KiB comment missed")
    val commentedDtd = write("b.osm",
      "<?xml version=\"1.0\"?>\n<!-- <!DOCTYPE osm [ ]> -->\n" +
        "<osm version=\"0.6\">\n  <node id=\"1\" lat=\"1\" lon=\"2\"/>\n</osm>\n")
    assert(!OsmChunk.hasDoctype(commentedDtd),
      "commented-out DOCTYPE treated as live")
    // and the chunker actually single-fragments the live-DTD file
    assert(OsmChunk.chunk(longPrologueDtd, s"$dir/frags", 8) == 1)
  }
}
