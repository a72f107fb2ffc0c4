package graft

import graft.osm.{OsmAudit, OsmXmlSource}
import graft.sinks.{JsonLinesSink, ParquetSink}

/** CLI entry (SURVEY §7.1 item 7): the reference's whole flow —
  * ingest XML → shape → write JSONL + parquet → run the audit
  * queries — as one `spark-submit`-able main.
  *
  * Usage: graft.Main <osm-xml-path> <out-dir>
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: graft.Main <osm-xml-path> <out-dir>")
    val Array(xmlPath, outDir) = args
    val spark = GraftSession.local("graft-osm")

    val docs = OsmXmlSource.collection(spark, xmlPath).cache()

    JsonLinesSink.write(docs, s"$outDir/docs_jsonl")
    ParquetSink.write(docs, s"$outDir/docs_parquet")
    OsmAudit.refDocs(docs).write.mode("overwrite").parquet(s"$outDir/ref_docs")

    val counts = docs.groupBy("doc_type").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
    val users = OsmAudit.uniqueUsers(docs).collect().head.getLong(0)
    val violations = OsmAudit.violations(docs).count()
    val mismatches = OsmAudit.docTypeMismatches(docs).count()

    // the reference's cell-36/37 reconciliation, as the run summary
    println(s"[graft] docs: $counts")
    println(s"[graft] unique contributors: $users")
    println(s"[graft] shape violations: $violations")
    println(s"[graft] member-type mismatches: $mismatches")

    spark.stop()
  }
}
