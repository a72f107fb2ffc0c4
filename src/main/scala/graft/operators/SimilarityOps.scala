package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * s1 is the exact baseline: broadcast the (small) query set, one
  * pipelined pass over the corpus, per-query top-k via
  * row_number-over-window — at 100 TB this is "scan once, keep a heap
  * per query", the optimal exact shape.
  *
  * s2 is the scale path: random-hyperplane LSH. Every vector gets a
  * 6-bit bucket (sign pattern against 6 fixed pseudo-random
  * hyperplanes); the candidate join is an equi-join on the bucket, so
  * the quadratic pair space never materializes. Hyperplanes are
  * md5-derived constants — precomputed once on the driver
  * ([[graft.functions.Fns.md5LongLocal]]) and shipped as a literal, so
  * executors do zero hashing per row; the oracle recomputes the same
  * constants in SQL.
  */
object SimilarityOps {

  private val DIMS = 64
  private val PLANES = 6
  private val K = 5

  /** plane(p)(d) = ((md5Long("p:d") mod 2000) - 1000) / 1000.0 — fixed
    * pseudo-random coefficients in [-1, 1), identical in the oracle. */
  private def planeCoefs: Seq[Seq[Double]] =
    (0 until PLANES).map { p =>
      (0 until DIMS).map { d =>
        ((md5LongLocal(s"$p:$d") % 2000L) - 1000L) / 1000.0
      }
    }

  /** Sign-bit bucket of a double-array embedding against the planes —
    * statically unrolled per plane (literal coefficient arrays +
    * [[graft.functions.Fns.dotN]]) so the whole bucket computation is
    * one codegen'd expression. Dots are rounded to 9 places (portable
    * floor form) before the sign test so that sub-ulp accumulation
    * differences can't flip a bucket bit across engines.
    */
  private def bucketOf(emb: Column): Column =
    planeCoefs.zipWithIndex.map { case (coefs, pl) =>
      when(roundFp(dotNative(emb, typedlit(coefs)), 9) >= 0, lit(1L << pl))
        .otherwise(lit(0L))
    }.reduceLeft(_ + _)

  private def queriesAndCorpus(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("nrm", l2Native(col("emb")))
    (e.filter(col("vec_id") < 10), e)
  }

  /** Thresholded similarity edges (i < j, cos ≥ thresh) from the LSH
    * bucket self-join — s4's candidate generation re-used as the edge
    * producer for embedding-space dedup clustering
    * ([[DedupOps]] d8). Same scale shape as s4: both sides shuffle on
    * the bucket key, candidate space confined per bucket. NaN cosines
    * (zero-norm vectors) pass the threshold under SQL comparison
    * semantics (Spark and DuckDB both order NaN greatest). */
  private[graft] def bucketEdges(s: SparkSession, d: String,
      thresh: Double): DataFrame = {
    val (_, corpus) = queriesAndCorpus(s, d)
    val cb = corpus.withColumn("bucket", bucketOf(col("emb")))
    cb.select(col("bucket"), col("vec_id").as("qid"),
      col("emb").as("qemb"), col("nrm").as("qnrm"))
      .join(cb, Seq("bucket"))
      .filter(col("qid") < col("vec_id"))
      .select(col("qid").as("i"), col("vec_id").as("j"), cosPrecomp.as("cos"))
      .filter(col("cos") >= thresh)
  }

  /** SQL fragments for oracles that re-derive the bucket table
    * (shared with [[DedupOps]] d8). */
  private[operators] def bucketSqlCtes: String =
    s"pl AS ($PLANES_SQL),\n      e AS ($EMB_SQL),\n      b AS ($BUCKET_SQL)"

  /** ANSI division throws on a zero divisor — a zero-norm vector must
    * score NaN (matching the kernel variant and DuckDB's 0/0). */
  private def cosPrecomp: Column = {
    val prod = col("qnrm") * col("nrm")
    when(prod === 0.0, lit(Double.NaN))
      .otherwise(roundFp(dotNative(col("qemb"), col("emb")) / prod, 6))
  }

  /** Shared per-query top-k over scored (qid, nid, cos) candidates:
    * rank with the deterministic (cos desc, nid) tiebreak, keep k.
    * ONE definition on purpose — all four ANN variants and their
    * oracle SQL must tie-break identically, or a drifted copy would
    * silently hash-mismatch. */
  private def topNeighbors(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("nid").asc)))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank"))

  /** s1 — exact brute-force cosine top-k: broadcast 10 query vectors,
    * single corpus scan, rank with a deterministic tiebreak. */
  private def s1(s: SparkSession, d: String): DataFrame = {
    val (q, corpus) = queriesAndCorpus(s, d)
    val scored = corpus
      .join(broadcast(q.select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"))),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cosPrecomp.as("cos"))
    topNeighbors(scored, K)
  }

  /** s2 — LSH-bucketed ANN: equi-join query bucket to corpus bucket,
    * exact cosine re-rank inside the bucket only. Recall < 1 by design;
    * the bucket join is the 100 TB shape (shuffle on a 6-bit key with
    * AQE handling skew, no cross join anywhere). */
  private def s2(s: SparkSession, d: String): DataFrame = {
    val (q, corpus) = queriesAndCorpus(s, d)
    val cb = corpus.withColumn("bucket", bucketOf(col("emb")))
    val qb = q.select(col("vec_id").as("qid"), col("emb").as("qemb"),
      col("nrm").as("qnrm"))
      .withColumn("bucket", bucketOf(col("qemb")))
    topNeighbors(cb.join(broadcast(qb), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cosPrecomp.as("cos")), 3)
  }

  /** s3 — IVF-style ANN (the other scale path SURVEY names next to
    * LSH): a fixed coarse quantizer assigns every vector to its
    * nearest-centroid cell; queries probe only their own cell and
    * re-rank exactly inside it.
    *
    * Centroids here are the first 4 corpus vectors (deterministic so
    * the oracle replays them; in production they come from a driver-
    * side k-means sample — same plan shape). The assignment is one
    * broadcast-join pass (4 codegen'd dot products per row, no
    * shuffle); the probe is an equi-join on the int cell id. At 100 TB:
    * centroid table ≪ broadcast limit, assignment is scan-speed, and
    * the candidate space is |cell| instead of |corpus|.
    */
  private def s3(s: SparkSession, d: String): DataFrame = {
    val (_, corpus) = queriesAndCorpus(s, d)
    // centroid columns take the qemb/qnrm names so the shared cosine
    // contract (cosPrecomp: zero-norm→NaN, round 6) applies verbatim
    val cents = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("cid"), col("emb").as("qemb"), col("nrm").as("qnrm"))
    val assigned = corpus
      .join(broadcast(cents))
      .select(col("vec_id"), col("emb"), col("nrm"), col("cid"),
        cosPrecomp.as("ccos"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cid").asc)))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("cid").as("cell"))
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"),
        col("nrm").as("qnrm"), col("cell"))
    topNeighbors(assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cosPrecomp.as("cos")), 3)
  }

  /** s4 — k-NN self-join: EVERY corpus vector gets its top-3
    * neighbors from its own LSH bucket — the all-pairs companion to
    * s2 (s2 answers a small query set; s4 builds the neighbor graph
    * that clustering / semantic-dedup consumes). No broadcast: the
    * "query" side IS the corpus, so both sides shuffle on the bucket
    * key, the quadratic cost is confined per bucket, and AQE splits a
    * skewed bucket at runtime. At 100 TB this is the only viable
    * all-pairs shape — the exact variant is a cartesian join by
    * definition. */
  private def s4(s: SparkSession, d: String): DataFrame = {
    val (_, corpus) = queriesAndCorpus(s, d)
    val cb = corpus.withColumn("bucket", bucketOf(col("emb")))
    topNeighbors(cb.select(col("bucket"), col("vec_id").as("qid"),
      col("emb").as("qemb"), col("nrm").as("qnrm"))
      .join(cb, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"), cosPrecomp.as("cos")), 3)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_ann_brute" -> (s1 _),
    "s2_ann_lsh" -> (s2 _),
    "s3_ann_ivf" -> (s3 _),
    "s4_knn_join" -> (s4 _)
  )

  /** DuckDB mirror of the plane constants + dot/sign logic. */
  private val PLANES_SQL =
    """SELECT p.p AS p, list_transform(generate_series(0,63), d ->
      |  (((('0x' || substr(md5(p.p::VARCHAR || ':' || d::VARCHAR),1,15))::BIGINT % 2000) - 1000) / 1000.0)) AS coef
      |FROM generate_series(0,5) p(p)""".stripMargin

  private val EMB_SQL =
    """SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb,
      |  sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
      |FROM embeddings""".stripMargin

  private val BUCKET_SQL =
    """SELECT e.vec_id, e.emb, e.nrm,
      |  sum(CASE WHEN floor(list_sum(list_transform(generate_series(1,64),
      |        k -> e.emb[k] * pl.coef[k]))*1000000000 + 0.5)/1000000000 >= 0
      |      THEN CAST(pow(2, pl.p) AS BIGINT) ELSE 0 END)::BIGINT AS bucket
      |FROM e, pl GROUP BY e.vec_id, e.emb, e.nrm""".stripMargin

  val oracles: Map[String, String] = Map(
    "s1_ann_brute" -> s"""
      WITH e AS ($EMB_SQL),
      sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
               floor(list_sum(list_transform(generate_series(1,64),
                 k -> q.emb[k] * c.emb[k])) / (q.nrm * c.nrm)*1000000 + 0.5)/1000000 AS cos
             FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id),
      r AS (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
            FROM sc)
      SELECT qid, nid, cos, rank FROM r WHERE rank <= $K""",
    "s2_ann_lsh" -> s"""
      WITH pl AS ($PLANES_SQL),
      e AS ($EMB_SQL),
      b AS ($BUCKET_SQL),
      sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
               floor(list_sum(list_transform(generate_series(1,64),
                 k -> q.emb[k] * c.emb[k])) / (q.nrm * c.nrm)*1000000 + 0.5)/1000000 AS cos
             FROM b q JOIN b c ON q.vec_id < 10 AND q.bucket = c.bucket
               AND c.vec_id <> q.vec_id),
      r AS (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
            FROM sc)
      SELECT qid, nid, cos, rank FROM r WHERE rank <= 3""",
    "s4_knn_join" -> s"""
      WITH pl AS ($PLANES_SQL),
      e AS ($EMB_SQL),
      b AS ($BUCKET_SQL),
      sc AS (SELECT q.vec_id AS qid, c.vec_id AS nid,
               floor(list_sum(list_transform(generate_series(1,64),
                 k -> q.emb[k] * c.emb[k])) / (q.nrm * c.nrm)*1000000 + 0.5)/1000000 AS cos
             FROM b q JOIN b c ON q.bucket = c.bucket
               AND c.vec_id <> q.vec_id),
      r AS (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
            FROM sc)
      SELECT qid, nid, cos, rank FROM r WHERE rank <= 3""",
    "s3_ann_ivf" -> s"""
      WITH e AS ($EMB_SQL),
      c AS (SELECT vec_id AS cid, emb AS cemb, nrm AS cnrm FROM e WHERE vec_id < 4),
      a0 AS (SELECT e.vec_id, e.emb, e.nrm, c.cid,
               floor(list_sum(list_transform(generate_series(1,64),
                 k -> e.emb[k] * c.cemb[k])) / (e.nrm * c.cnrm)*1000000 + 0.5)/1000000 AS ccos
             FROM e, c),
      a AS (SELECT vec_id, emb, nrm, cid AS cell FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY ccos DESC, cid) AS rn FROM a0)
            WHERE rn = 1),
      sc AS (SELECT q.vec_id AS qid, x.vec_id AS nid,
               floor(list_sum(list_transform(generate_series(1,64),
                 k -> q.emb[k] * x.emb[k])) / (q.nrm * x.nrm)*1000000 + 0.5)/1000000 AS cos
             FROM a q JOIN a x ON q.vec_id < 10 AND q.cell = x.cell
               AND x.vec_id <> q.vec_id),
      r AS (SELECT qid, nid, cos,
              row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
            FROM sc)
      SELECT qid, nid, cos, rank FROM r WHERE rank <= 3"""
  )
}
