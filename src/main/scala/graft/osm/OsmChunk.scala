package graft.osm

import java.io.{File, RandomAccessFile}
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Element-boundary-aware pre-chunking of a single `.osm` extract
  * (VERDICT r12 #5). Spark's built-in XML source cannot split one
  * file — a rowTag record may span any byte boundary, so a
  * planet-scale `.osm` parses as ONE task no matter the cluster
  * (`OsmXmlSource.collection` note). This splitter turns that file
  * into N WELL-FORMED fragments, each a valid `<osm>` document, so
  * the existing per-rowTag reads see N files = N parallel parse
  * tasks. Chunking is a one-time ingest step (the same place a real
  * deployment would convert to parquet): one sequential streamed
  * pass, FileChannel-to-FileChannel, never data-in-heap.
  *
  * Why splitting at `<node ` / `<way ` / `<relation ` byte patterns
  * is SAFE in any well-formed OSM XML: (1) raw `<` is illegal inside
  * attribute values and text (must be `&lt;`), so those byte
  * sequences can only be element markup; (2) OSM's top-level element
  * types never nest inside each other (nodes/ways/relations contain
  * only `nd`/`tag`/`member`), so every such start tag is a top-level
  * boundary — everything before it is complete elements. The scan
  * requires a following space/tab/newline/`/`/`>` byte so `<node`
  * never matches a hypothetical longer name, and `<nd` cannot match
  * `<node ` at all.
  *
  * Multi-byte-safe: the patterns and the chars that may follow are
  * all ASCII, and UTF-8 continuation bytes never collide with ASCII,
  * so byte-level search is exact regardless of tag-value content. */
object OsmChunk {

  private val patterns: Seq[Array[Byte]] =
    Seq("<node", "<way", "<relation").map(_.getBytes("US-ASCII"))

  private def isBoundaryFollower(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '/' || b == '>'

  /** Earliest top-level element start at or after `from` in `buf`
    * (exclusive of the final pattern-length tail, so a match is
    * always fully verifiable), or -1. */
  private[osm] def nextBoundary(buf: Array[Byte], from: Int, len: Int): Int = {
    var i = math.max(from, 0)
    while (i < len) {
      if (buf(i) == '<') {
        var p = 0
        while (p < patterns.length) {
          val pat = patterns(p)
          if (i + pat.length < len) {
            var j = 1
            while (j < pat.length && buf(i + j) == pat(j)) j += 1
            if (j == pat.length && isBoundaryFollower(buf(i + pat.length)))
              return i
          }
          p += 1
        }
      }
      i += 1
    }
    -1
  }

  private val header =
    "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm version=\"0.6\">\n"
      .getBytes("UTF-8")
  private val footer = "</osm>\n".getBytes("UTF-8")

  /** Split `in` into ≤ `n` well-formed `.osm` fragment files under
    * `outDir` (created/cleared), returning the fragment count.
    * Fragment k>0 gets a synthetic header; fragment k<last gets the
    * closing tag appended; byte content is otherwise the original,
    * sliced at top-level element starts found near the n evenly
    * spaced probe offsets (duplicate probe resolutions collapse, so
    * a small file may yield fewer fragments than asked). */
  def chunk(in: String, outDir: String, n: Int): Int = {
    require(n >= 1, s"fragment count must be >= 1, got $n")
    val dir = new File(outDir)
    if (dir.exists()) dir.listFiles().foreach(_.delete()) else dir.mkdirs()
    val raf = new RandomAccessFile(in, "r")
    try {
      val len = raf.length()
      // probe window: a split point must appear within one window of
      // the probe offset or the probe is skipped (elements are tiny
      // next to this — a 4 MiB window holds thousands of them)
      val window = 4 << 20
      val buf = new Array[Byte](window)
      val cuts = scala.collection.mutable.ArrayBuffer[Long](0L)
      var k = 1
      while (k < n) {
        val probe = len * k / n
        if (probe > cuts.last) {
          raf.seek(probe)
          val got = raf.read(buf)
          if (got > 0) {
            val b = nextBoundary(buf, 0, got)
            if (b >= 0 && probe + b > cuts.last) cuts += (probe + b)
          }
        }
        k += 1
      }
      cuts += len
      val src = raf.getChannel
      var i = 0
      while (i < cuts.length - 1) {
        val (from, until) = (cuts(i), cuts(i + 1))
        val out = FileChannel.open(
          Paths.get(outDir, f"part-$i%05d.osm"),
          StandardOpenOption.CREATE, StandardOpenOption.WRITE,
          StandardOpenOption.TRUNCATE_EXISTING)
        try {
          if (i > 0) out.write(java.nio.ByteBuffer.wrap(header))
          var pos = from
          while (pos < until) pos += src.transferTo(pos, until - pos, out)
          if (i < cuts.length - 2) out.write(java.nio.ByteBuffer.wrap(footer))
        } finally out.close()
        i += 1
      }
      cuts.length - 1
    } finally raf.close()
  }

  /** [[chunk]] into a deterministic sibling directory (reused if the
    * source is unchanged — same (length, mtime) recorded in a stamp
    * file), returning the fragment directory path. The idempotence
    * mirrors the parquet-ingest pattern: chunk once per source
    * version, read many times. */
  def chunked(in: String, n: Int): String = {
    val src = new File(in)
    val outDir = in + s".chunks$n"
    val stampFile = Paths.get(outDir, "_SOURCE_STAMP")
    val stamp = s"${src.length()}:${src.lastModified()}:$n"
    val fresh = Files.exists(stampFile) &&
      new String(Files.readAllBytes(stampFile), "UTF-8") == stamp
    if (!fresh) {
      chunk(in, outDir, n)
      Files.write(stampFile, stamp.getBytes("UTF-8"))
    }
    outDir
  }
}
