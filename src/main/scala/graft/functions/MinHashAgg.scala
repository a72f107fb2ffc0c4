package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: k-seed MinHash sketch of a GROUP of shingle sets — the
  * group-level counterpart of the per-document signature (one sketch
  * per source/shard/partition, enabling group-vs-group Jaccard
  * estimation without touching row data again).
  *
  * This is the `Aggregator` tier of the engine's extension surface
  * (SURVEY §2.10: not needed for reference parity, required for the
  * sketch-based training-data path): the buffer is a fixed k-long
  * array, `merge` is an elementwise min — associative and commutative,
  * so Spark's partial aggregation (map-side combine) is exact and
  * deterministic regardless of partitioning. Hashes are the engine's
  * md5 family, so the DuckDB oracle recomputes the identical sketch.
  */
class MinHashAgg(k: Int)
  extends Aggregator[(String, Seq[String]), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(b: Array[Long], row: (String, Seq[String])): Array[Long] = {
    row._2.foreach { s =>
      var i = 0
      while (i < k) {
        val h = Fns.md5LongLocal(s"$i:$s")
        if (h < b(i)) b(i) = h
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
