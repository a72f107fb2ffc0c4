package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Tables
import graft.functions.Fns._

/** Text-analysis operators for a large-scale training-data pipeline
  * (language ID, quality scoring, token counting, fingerprinting,
  * semi-structured extraction) over the `documents` / `events` tables.
  *
  * All are single-pass narrow transforms (no shuffle except the final
  * aggregations) built from codegen'd built-ins — the shape that scans
  * 100 TB at I/O speed: the parquet reader prunes to the referenced
  * columns and every row is scored in one pipelined stage.
  */
object TextOps {

  private[operators] val EN = Seq("the", "data", "table", "value", "row", "key")
  private val DE = Seq("der", "die", "das", "und", "nicht")
  private val FR = Seq("le", "la", "les", "et", "est")
  private val ES = Seq("el", "los", "las", "y", "es")

  private[operators] def countIn(tokens: org.apache.spark.sql.Column, ws: Seq[String]) =
    size(filter(tokens, t => t.isInCollection(ws)))

  /** x1 — language ID via stopword-hit scoring: count tokens in each
    * language's closed stopword set, argmax wins, all-zero → "und"
    * (undetermined). The classic cheap n-gram/stopword heuristic —
    * per-row arithmetic only, embarrassingly parallel.
    */
  private def x1(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        countIn(t, EN).as("sc_en"), countIn(t, DE).as("sc_de"),
        countIn(t, FR).as("sc_fr"), countIn(t, ES).as("sc_es"))
      .withColumn("pred_lang",
        when(greatest(col("sc_en"), col("sc_de"), col("sc_fr"), col("sc_es")) === 0, "und")
          .when(col("sc_en") >= greatest(col("sc_de"), col("sc_fr"), col("sc_es")), "en")
          .when(col("sc_de") >= greatest(col("sc_fr"), col("sc_es")), "de")
          .when(col("sc_fr") >= col("sc_es"), "fr")
          .otherwise("es"))
      .select(col("doc_id"), col("pred_lang"), col("sc_en"))
  }

  /** x2 — document quality score: length score + stopword ratio + mean
    * token length, the standard cheap pre-training quality gate.
    * Pure per-row double arithmetic, identical accumulation order in
    * the oracle.
    */
  private def x2(s: SparkSession, d: String): DataFrame =
    x2Scored(s, d).select(col("doc_id"), col("len_score"),
      col("stop_ratio"), col("mean_tok_len"), col("quality"))

  /** THE x2 scoring relation, widened with (source, nt) so pipe8's
    * budget fill orders by the SAME scores — one definition, two
    * consumers (the nbDocScores anti-drift rule); x2 projects the
    * extra columns away and Catalyst prunes their cost. */
  private[operators] def x2Scored(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    // roundFp, not round(): these are small-integer ratios whose exact
    // decimal expansions land on .5 boundaries (observed at sf0.1)
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"), t.as("t"))
      .select(col("doc_id"), col("source"),
        size(col("t")).cast("long").as("nt"),
        roundFp(least(col("n_chars") / 500.0, lit(1.0)), 6).as("len_score"),
        roundFp(countIn(col("t"), EN).cast("double") / size(col("t")), 6).as("stop_ratio"),
        roundFp(aggregate(col("t"), lit(0L), (acc, x) => acc + length(x))
          .cast("double") / size(col("t")), 6).as("mean_tok_len"))
      .withColumn("quality",
        roundFp(col("len_score") * 0.5 + col("stop_ratio") * 0.3
          + least(col("mean_tok_len") / 8.0, lit(1.0)) * 0.2, 6))
  }

  /** x3 — token counting: whitespace tokens and a BPE-ish regex
    * tokenizer (letter runs / digit runs / single other chars) — the
    * usual "how many tokens will this cost" estimator.
    */
  private def x3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(split(col("text"), " ")).as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("re_tokens"))

  /** x4 — document fingerprinting: a whole-text md5 fingerprint plus a
    * position-weighted polynomial rolling hash over tokens
    * (sum_i h(tok_i)·31^(i mod 8) mod p). Integer arithmetic mod p —
    * exact and order-independent to sum, so the groupBy is a plain
    * partial+final agg.
    */
  private def x4(s: SparkSession, d: String): DataFrame = {
    val M = 1000000007L
    Tables.documents(s, d)
      .select(col("doc_id"), md5Long(col("text")).as("md5_fp"),
        posexplode(toks(col("text"))).as(Seq("i", "tok")))
      .groupBy(col("doc_id"), col("md5_fp"))
      // each term is reduced mod p BEFORE the sum so the long
      // accumulator can't wrap even at billions of tokens (modular
      // identity keeps the result unchanged)
      .agg(((sum(((md5Long(col("tok")) % 100003L)
        * pow(lit(31.0), col("i") % 8).cast("long")) % M)) % M).as("roll_fp"))
  }

  /** x5 — semi-structured extraction: pull a typed value out of the
    * events' JSON `props` with a real JSON path op (codegen'd
    * `get_json_object`), then aggregate. At scale: scan + narrow
    * extract + one partial/final agg on `event_type`.
    */
  private def x5(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("k")).as("sum_k"),
        roundFp(avg(col("k")), 6).as("avg_k"))

  /** x6 — PII redaction: find-and-mask emails and phone numbers, with
    * per-document redaction counts — the standard pre-training privacy
    * scrub. Per-row regex only (codegen'd `regexp_replace` /
    * `regexp_extract_all`), so it runs at scan speed at any scale. PII
    * is planted deterministically from doc_id (the corpus itself is
    * synthetic tokens) so the oracle sees the same inputs.
    */
  private def x6(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[a-z0-9.]+@[a-z0-9.]+"
    val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
    val planted = when(col("doc_id") % 3 === 0,
      concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com")))
      .when(col("doc_id") % 3 === 1,
        concat(col("text"), lit(" call 360-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), planted.as("t"))
      .select(col("doc_id"),
        regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).as("n_phones"))
  }

  /** x7 — corpus-level n-gram frequency: top-20 bigrams with a total-
    * order tiebreak. Kernel shingling (non-distinct — corpus counting
    * wants every occurrence, unlike MinHash's set semantics) →
    * partial+final hash agg on the ngram → TakeOrderedAndProject; one
    * shuffle on the ngram key. The shingle loop is a typed kernel for
    * the same reason as d2/d6: the interpreted higher-order transform
    * measured ~7x slower on this dense inner loop (SCALE.md).
    */
  private def x7(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("text"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[String]
      .mapPartitions(_.flatMap(bigramsLocal))
      .toDF("ngram")
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram").asc)
      .limit(20)
  }

  /** x8 — train/test contamination check: for every doc in the held-out
    * split (the hash-split of SampleOps.sm2), count how many of its
    * distinct bigram shingles also occur anywhere in the train split —
    * the standard benchmark-leakage audit run before any evaluation.
    *
    * Plan shape at 100 TB: shingle both sides with the kernel
    * tokenizer (per-doc distinct completes in-task), distinct the
    * train side (shuffle on the 8-byte shingle hash), one SEMI join
    * hash-to-hash, plain count per test doc. The join key is the
    * 60-bit md5 of the shingle (r16 — the string form paid a wider
    * exchange AND a dropDuplicates shuffle the kernel set obsoletes).
    */
  private def x8(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // r16: shingle identity is the 60-bit md5 (the x13/x12 collision
    // class — the oracle hashes the same prefix INSIDE its per-doc
    // list_distinct, so a within-doc collision merges identically in
    // both engines), the per-doc distinct completes in the kernel
    // (a doc is one row — the emitted HashSet makes (doc_id, h) rows
    // distinct BY CONSTRUCTION, retiring the dropDuplicates exchange
    // the string form paid), and the ingest spread is conditional
    // (the pipe5 rule — never round-robin text at corpus scale).
    def shingleRows(lo: Int, hi: Int): DataFrame = {
      val base = Tables.documents(s, d)
        .filter(md5Long(col("doc_id")) % 100 >= lo &&
          md5Long(col("doc_id")) % 100 < hi)
        .select(col("doc_id"), col("text"))
      Tables.spreadIfNarrow(s, base)
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          wordShingleHashesLocal(text, 2).iterator.map(h => (id, h))
        })
        .toDF("doc_id", "h")
    }
    val train = shingleRows(0, 80).select(col("h")).distinct()
    // LeftSemi against train: the semi join carries no payload and
    // never multiplies rows (test rows are per-doc distinct from the
    // kernel), and the final count is a plain partial+final agg — vs
    // the naive join + countDistinct, which multiplies duplicate test
    // shingles through the join and then pays a two-phase distinct
    // aggregation to collapse them again
    val test = shingleRows(90, 100)
    test.join(train, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** x9 — repetition score: fraction of a document's bigrams that are
    * repeats (1 − distinct/total), the classic Gopher-style quality
    * rule for filtering loop-y machine-generated text. Pure per-row
    * arithmetic; null for docs too short to have a bigram.
    *
    * The bigram build + distinct count runs in a TYPED KERNEL (r13):
    * the declarative `bigramShingles` HOF constructs every window
    * string through interpreted higher-order evaluation — the
    * buildSignatures/pipe6 boundary, re-measured here at 1.9 s vs
    * ~0.5 s kernel at sf0.1. `bigramShinglesLocal` is the same
    * lockstep mirror the dedup signatures build on, so the distinct
    * count (and the oracle hash) is bit-identical. */
  private def x9(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        // n_bigrams = size(split(text," ")) - 1, INCLUDING empty
        // tokens (split keeps them) — the declarative form's exact
        // arithmetic
        val nBigrams = text.split(" ", -1).length - 1
        (id, nBigrams.toLong,
          graft.functions.Fns.bigramShinglesLocal(text).size.toLong)
      })
      .toDF("doc_id", "n_bigrams", "n_distinct")
      .select(col("doc_id"), col("n_bigrams"),
        when(col("n_bigrams") > 0,
          roundFp(lit(1.0) - col("n_distinct").cast("double") / col("n_bigrams"), 6))
          .as("rep_ratio"))
  }

  /** x10 — TF-IDF term weighting: top-3 characteristic terms per
    * document by tf × (N/df). The idf factor is the RAW rarity ratio
    * N/df, not log(N/df): a single IEEE division is bit-identical
    * across engines, while libm log is not correctly-rounded and can't
    * be oracle-hashed (swapping in log-idf is a one-line change and
    * does not alter the plan). Plan shape at 100 TB: tf is one
    * partial+final agg on (doc, term); df is an agg over tf whose
    * result is VOCABULARY-sized — at web-corpus scale that is
    * hundreds of millions of terms, far past any broadcast ceiling,
    * so the tf⋈df join carries NO hint: AQE elects broadcast when
    * the measured vocabulary actually fits and otherwise plans a
    * sort-merge join on the term key (tf re-shuffles on term — it
    * was partitioned on (doc_id, term) by its agg — but tf rows are
    * three narrow columns, never the document text). N
    * rides along as a 1-row broadcast cross join; the final per-doc
    * top-k is one window on doc_id. Three aggs, no corpus-sized
    * join ever shuffles twice — and tf is CACHED
    * (`persist(MEMORY_AND_DISK)`): its two consumers (the df branch
    * and the scoring join) defeat ReuseExchange in practice, which a
    * plan audit caught as the corpus explode+agg executing TWICE
    * (the x12 lesson; ScanCountSpec pins the plan to one scan).
    * persist, NOT localCheckpoint: tf is a CORPUS-scale relation, and
    * the repo invariant is to checkpoint signatures, never the corpus
    * (DedupOps) — the cache spills to executor disk, keeps lineage so
    * a lost executor recomputes instead of failing the job, and is
    * lazy, so building the query plans without running it.
    * PlanShapeSpec asserts the no-hint
    * property by disabling auto-broadcast and requiring the term
    * join to degrade to a merge join (a forced hint would survive). */
  private def x10(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val docs = Tables.documents(s, d)
    // per-doc tf in the scan kernel (r16, the pipe5/x12/ppl1 hashmap
    // pattern): occurrence rows never exist. Term identity stays the
    // STRING here — unlike x12/ppl1/dsir1 the term is in the OUTPUT
    // (top-3 terms per doc, tie-broken BY term), so hashing it would
    // change the result, not just the plan.
    val tf = docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        var i = 0
        while (i < t.length) {
          m.update(t(i), m.getOrElse(t(i), 0L) + 1L)
          i += 1
        }
        m.iterator.map { case (w, n) => (id, w, n) }
      })
      .toDF("doc_id", "term", "tf")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        ((col("tf") * col("n")).cast("double") / col("df")).as("weight"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("weight").desc, col("term").asc)))
      .filter(col("rank") <= 3)
  }

  /** x11 — BM25 ranked retrieval: top-10 documents for a literal
    * keyword query, the lexical scorer every retrieval/eval pipeline
    * runs next to its embedding ANN (s1-s3). k1 = 1.2, b = 0.75. The
    * idf factor is the RAW rarity ratio (N − df + ½)/(df + ½), not its
    * log, for the same reason as x10: pure IEEE arithmetic is
    * bit-identical across engines while libm log is not. Log is
    * monotone per term; for multi-term queries the SUM of rescaled
    * term scores can reorder in principle, so NewOpsSpec verifies
    * top-k parity against true log-idf BM25 on the test corpus
    * rather than asserting it axiomatically.
    *
    * Plan shape at 100 TB: the `term isin query` filter lands BELOW
    * the (doc, term) aggregation, so the corpus-sized term space never
    * materializes for non-query terms — tf is a partial+final agg over
    * query-term hits only, CACHED once (`persist(MEMORY_AND_DISK)`;
    * bounded by ≤|q| rows per MATCHING doc, so corpus-order in the
    * worst case of ubiquitous query terms — which is exactly why this
    * is a spillable, lineage-backed cache and not an unrecoverable
    * checkpoint) so its two consumers (the df agg and the scoring
    * join) cannot re-run the corpus tokenize+explode — a plan audit
    * caught that subtree executing twice (the x12 lesson). The
    * corpus-stats agg is the one remaining second scan, inherent to
    * needing avgdl over ALL docs, hits or not. Per-doc length rides
    * the scan as a narrow projection (no self-join back to the
    * corpus). df (≤|q| rows) and avgdl/N (1 row) broadcast. The final
    * top-10 is TakeOrderedAndProject — per-task heaps, no global
    * sort. */
  private def x11(s: SparkSession, d: String): DataFrame = {
    val qTerms = Seq("hash", "join", "merge")
    // every constant is the SAME decimal literal the oracle SQL parses
    // (k1 = 1.2, b = 0.75): k1+1 computed at runtime could round to a
    // different double than parsing "2.2", and the gate hashes bits
    val (k1, k1p1, oneMinusB, b) = (1.2, 2.2, 0.25, 0.75)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .select(col("doc_id"), col("t"), size(col("t")).as("dl"))
    val hits = docs
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val df = hits.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n"),
      (sum(col("dl")) / count(lit(1))).as("avgdl"))
    hits.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (((col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * k1p1) /
          (col("tf") + lit(k1) * (lit(oneMinusB) +
            lit(b) * col("dl") / col("avgdl"))))
          .as("term_score"))
      .groupBy(col("doc_id"))
      .agg(roundFp(sum(col("term_score")), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(10)
  }

  /** x12's rarity threshold: a bigram occurrence is "rare" when its
    * corpus conditional probability p(w2|w1) = B(w1,w2)/U(w1) is below
    * 1/RARE_K. The test is the INTEGER comparison B·K < U — exact and
    * bit-identical in any engine, unlike a float log-prob whose
    * accumulation order differs across engines. */
  private val RARE_K = 50L

  /** x12 — corpus-trained bigram-LM rarity score: train a bigram model
    * ON the corpus itself (count every bigram and its prefix marginal),
    * then score each document by the fraction of its bigram occurrences
    * whose conditional probability p(w2|w1) < 1/[[RARE_K]]. This is the
    * KenLM-style perplexity quality gate every pretraining pipeline
    * runs (CCNet's "filter by LM score" step) re-expressed so the gate
    * can hash it: a rare-occurrence RATIO (one exact integer comparison
    * per bigram type + one division per doc) instead of a summed float
    * log-prob, which is not engine-portable (libm log + order-dependent
    * accumulation; same reasoning as x10/x11's raw-ratio idf).
    *
    * Plan shape at 100 TB: the kernel tokenizes directly on the scan
    * splits — deliberately NO kernel-parallelism repartition here
    * (unlike x7/x8, whose claims don't forbid it): a repartition of
    * (doc_id, text) would be a full-corpus text exchange, the single
    * most expensive operation in the job at 100 TB, and the map-side
    * partial aggregation right after the kernel already parallelizes
    * on whatever splits the scan provides (measured bench-neutral at
    * sf0.1 even though the test file is ONE split). ONE shuffle
    * collapses occurrences to per-doc tf on (doc_id, bg), and tf is
    * CACHED once (`persist(MEMORY_AND_DISK)`) because it has two
    * consumers, the model branch and the scoring join, and Spark's
    * exchange reuse cannot unify them: each join key infers a
    * different `isnotnull` pushdown (bg vs its substring_index
    * prefix), making the subtrees non-canonical — observed as THREE
    * full scan+tokenize+agg executions before the fix (ScanCountSpec
    * pins the plan to zero extra scans now). persist, NOT
    * localCheckpoint: tf is CORPUS-scale, and the repo invariant is
    * to checkpoint signatures, never the corpus (DedupOps) — the
    * cache spills to executor disk and keeps lineage, so a lost
    * executor recomputes its blocks instead of failing the job.
    * The conditioning prefix w1 is NOT carried through the
    * corpus-scale exchange as TEXT (r16): bigram identity is the
    * 60-bit md5 hash, the x13/d2/x21 discipline — the kernel emits
    * (doc_id, h(bigram), h(w1)) and every exchange, group key, window
    * partition and join key from there on is an 8-byte long, never a
    * string (a string bigram key ~doubles exchange bytes and makes
    * every hash-table probe and sort comparison a byte-wise string
    * compare). The conditioning prefix CANNOT be re-derived from a
    * hash the way substring_index re-derived it from the string, so
    * h(w1) rides the exchange as a second long — 8 bytes against the
    * string's variable width, still strictly narrower. Hash-identity
    * semantics are the documented x13 class: a 2⁻⁶¹-probability
    * collision merges two bigrams identically in BOTH engines (the
    * oracle hashes the same md5 prefix), so the compare stays exact.
    * Model counts B are one agg over the materialized tf
    * (vocabulary-bounded, not corpus-bounded); the prefix marginal U
    * rides a window over B on h(w1) — no self-join of the model. The
    * tf⋈model scoring join carries NO broadcast hint — at web scale
    * the bigram vocabulary is billions of rows, far past any
    * broadcast ceiling, so AQE must be free to elect sort-merge (the
    * x10 lesson). Document text never shuffles: every exchanged row
    * is (ids, two 8-byte hashes, a count). */
  private def x12(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        // per-doc tf in the kernel (the pipe5 hashmap pattern): a doc
        // is one input row, so its counts complete in-task and the
        // occurrence-level rows never exist — what leaves the scan is
        // the already-aggregated (doc, hbg, hw1, tf), exactly the
        // groupBy(doc_id, hbg, hw1).count() relation. The map key is
        // the (hbg, hw1) PAIR so an hbg collision across two prefixes
        // keeps two rows, byte-matching the oracle's GROUP BY 1, 2.
        val t = text.split(" ", -1)
        val m = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        var i = 0
        while (i < t.length - 1) {
          val k = (md5LongLocal(t(i) + " " + t(i + 1)), md5LongLocal(t(i)))
          m.update(k, m.getOrElse(k, 0L) + 1L)
          i += 1
        }
        m.iterator.map { case ((hbg, hw1), n) => (id, hbg, hw1, n) }
      })
      .toDF("doc_id", "hbg", "hw1", "tf")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val model = tf.groupBy(col("hbg"), col("hw1"))
      .agg(sum(col("tf")).as("b"))
      .withColumn("u", sum(col("b")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("hw1"))))
      .select(col("hbg"), (col("b") * RARE_K < col("u")).as("rare"))
    tf.join(model, Seq("hbg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(when(col("rare"), col("tf")).otherwise(0L)).as("n_rare"))
      .withColumn("rare_ratio",
        roundFp(col("n_rare").cast("double") / col("n_bigrams"), 6))
  }

  /** x13 — cross-source shingle-overlap matrix: for every pair of
    * sources, the sizes of their distinct-bigram-shingle sets, the
    * intersection, and the Jaccard similarity — the corpus-level
    * decontamination/provenance report (x8 answers "is THIS doc
    * leaked"; x13 answers "how much do these corpora share"), the
    * first thing a mixture designer reads before weighting sources.
    *
    * The set element is the 60-bit md5 of the shingle, not the
    * shingle text: every exchange then carries (source, 8-byte hash)
    * — at 100 TB the shingle-set relation is the corpus-volume
    * object, and text-keyed shuffles would dwarf the data read (the
    * d9 lesson). A collision merges two shingles identically on both
    * sides of the comparison, so the report's semantics are hash-set
    * overlap with error ~n²/2⁶¹ — negligible, and the SAME design
    * runs the gate and the cluster. Plan: one corpus scan →
    * per-source distinct (shuffle on (source, h)) cached once
    * (persist, the x10/x12 invariant — three consumers would
    * otherwise re-plan the scan); the intersection is a
    * self-equi-join on h (per-hash fanout bounded by |sources|, the
    * bounded catalog dimension pipe3 also relies on); set sizes come
    * back as a broadcast of |sources| rows. The matrix is
    * |sources|²/2 rows — driver-readable by construction. */
  private def x13(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // shingle + hash in the TYPED KERNEL tier (r16): the declarative
    // explode(bigramShingles)+md5Long chain is interpreted HOF + per-
    // shingle string md5 — the same dense inner loop the pipe6/d2
    // kernels already crossed the boundary for, via the SAME Local
    // mirrors so the oracle SQL stays byte-locked. Honest-cold
    // bench: 3.99 → the shingling was most of it. Conditional spread
    // only (the pipe5 rule) — never round-robin text at corpus scale.
    val base = Tables.documents(s, d).select(col("source"), col("text"))
    val sets = Tables.spreadIfNarrow(s, base).as[(String, String)]
      .mapPartitions(_.flatMap { case (src, text) =>
        // fused shingle+hash (r16): set-identical to
        // bigramShinglesLocal(_).map(md5LongLocal) (FnsSpec)
        wordShingleHashesLocal(text, 2).iterator.map(h => (src, h))
      })
      .toDF("source", "h")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sets.groupBy(col("source")).agg(count(lit(1)).as("n"))
    // returned LAZY (not the gr5 eager posture): PlanShapeSpec pins
    // this query's exchanges-carry-only-(source, 8-byte-hash)
    // invariant by walking the RETURNED plan, and an eager
    // localCheckpoint would hide it behind a Scan ExistingRDD. The
    // sets persist therefore lives until the caller's clearCache —
    // shingle-set-sized, the documented r15 posture.
    sets.select(col("source").as("src_a"), col("h"))
      .join(sets.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("n").as("n_a"))), Seq("src_a"))
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("n").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("inter"),
        roundFp(col("inter") / (col("n_a") + col("n_b") - col("inter")), 6)
          .as("jaccard"))
  }

  /** x14 — per-document character-distribution statistics: distinct
    * character count, Simpson concentration Σp², and the modal-char
    * share. Boilerplate, padding, and generated gibberish concentrate
    * probability mass on few characters, so Simpson (with top_ratio
    * as the blunt form) is the standard cheap filter signal where
    * character ENTROPY −Σp·log p would be used if libm log were
    * engine-portable — Simpson is the same concentration ordering
    * computed with pure integer sums and ONE division (Σc², max c,
    * and len are exact longs; p² = c²/len² defers the division to a
    * single exact step, so the result is bit-identical anywhere).
    *
    * Shape at scale: the char explode multiplies row count by doc
    * length, but the (doc_id, ch) pre-aggregation partial-aggregates
    * map-side to ≤|alphabet| rows per doc per partition BEFORE the
    * exchange, so both shuffles carry narrow (doc_id, ch, cnt) /
    * (doc_id, partials) rows, never text. The extreme-scale variant —
    * a typed kernel building the per-doc histogram in one pass, no
    * explode — buys a constant factor; the declarative form keeps
    * whole-stage codegen and the oracle. */
  private def x14(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // per-doc char histogram in a TYPED KERNEL (r13): the previous
    // form exploded every character into (doc, ch) rows and paid a
    // corpus-chars-keyed agg — but every statistic is a function of
    // ONE document's own histogram, so it computes in-task with ZERO
    // exchanges (the pipe5PerDoc in-row discipline). Char identity =
    // substring(text, i, 1) = one CODE POINT (UTF8String convention),
    // matched here by iterating code points. An EMPTY text emits no
    // row — exactly the oracle's generate_series(1, 0) = ∅ semantics
    // (the old declarative form actually diverged there: Spark's
    // sequence(1, 0) DESCENDS, fabricating two ''-char rows; no green
    // corpus contains an empty doc, but the kernel closes the latent
    // cross-engine drift rather than reproducing it — and dividing
    // 0/0 through roundFp would floor a NaN to 0, the guard class
    // roundFp's doc forbids).
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val h = new java.util.HashMap[Integer, Long]()
        val it = text.codePoints().iterator()
        var len = 0L
        while (it.hasNext) {
          val cp = it.next()
          h.merge(cp, 1L, (a, b) => a + b)
          len += 1
        }
        var sq = 0L; var mx = 0L
        val vs = h.values().iterator()
        while (vs.hasNext) {
          val c = vs.next()
          sq += c * c
          if (c > mx) mx = c
        }
        if (len == 0) None else Some((id, h.size.toLong, sq, mx, len))
      })
      .toDF("doc_id", "n_uniq", "sq", "mx", "len")
      .select(col("doc_id"), col("n_uniq"),
        roundFp(col("sq").cast("double") /
          (col("len").cast("double") * col("len").cast("double")), 6)
          .as("simpson"),
        roundFp(col("mx").cast("double") / col("len").cast("double"), 6)
          .as("top_ratio"))
  }

  /** x15's ranked-vocabulary cut. A web-scale vocabulary is hundreds
    * of millions of terms; the decay statistic only needs the head. */
  private val X15_TOP = 1024

  /** x15 — Zipf decay profile of the corpus vocabulary: bucket the
    * top-[[X15_TOP]] terms by the INTEGER log2 of their frequency
    * rank (bucket k holds ranks 2^k .. 2^(k+1)-1) and report each
    * bucket's term count and exact frequency mass. Under Zipf's law
    * every bucket carries roughly constant mass, so the per-bucket
    * freq_sum trajectory IS the decay diagnostic a tokenizer/
    * curation pass reads (flat ≈ Zipfian; front-loaded ≈ boilerplate
    * domination; flat-then-cliff ≈ truncated vocabulary).
    *
    * Everything is exact integer arithmetic: floor(log2 rank) is
    * `length(bin(rank)) - 1` (the cls2 trick — both engines print
    * minimal-width binary), so the oracle matches bit-for-bit with no
    * libm log anywhere.
    *
    * Plan at 100 TB: term frequencies are one partial+final agg on
    * the term key; the head cut is orderBy+limit = TakeOrderedAndProject
    * (per-task heaps, driver merges [[X15_TOP]] rows — never a global
    * sort of the vocabulary); the rank window then runs on a
    * [[X15_TOP]]-row relation, single-partition BY CONSTRUCTION
    * (bounded by the literal K, not by the data — the cls2 broadcast
    * argument), and the final bucket agg is ~log2(K) rows. */
  private def x15(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc).limit(X15_TOP)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("c").desc, col("term").asc)))
      .select((length(bin(col("rnk"))) - 1).cast("long").as("k"), col("c"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("freq_sum"),
        max(col("c")).as("max_f"), min(col("c")).as("min_f"))
  }

  /** ppl1 — corpus-LM familiarity bucketing, the CCNet shape (Wenzek
    * 2020: score every document under a corpus-level LM, then split
    * the corpus into quality buckets at score quantiles). The LM
    * score here is exact-arithmetic "familiarity" — the mean corpus
    * frequency of the document's tokens — NOT log-perplexity: libm
    * log is not correctly-rounded, the same engine-portability wall
    * x10/x12/lr1 document for log/exp, and familiarity is a monotone
    * (reversed) proxy for unigram perplexity that needs only long
    * sums and ONE final division. Buckets are exact fam-quartiles
    * (3 = most familiar head, 0 = least familiar tail).
    *
    * Scale shape: per-doc tf completes IN the scan kernel (r16, the
    * pipe5/x12 hashmap pattern — a doc is one row, so its counts
    * finish in-task and occurrence rows never exist; token identity
    * is the 60-bit md5, so every downstream exchange/join key is an
    * 8-byte long and the oracle hashes the same prefix — the x13
    * collision class), vocab counts from tf (vocab-sized agg on the
    * hash key), tf⋈vocab equi-join (AQE degrades to shuffle when the
    * vocab outgrows broadcast — the dsir1-pinned plan), per-doc long
    * sums (partial agg). The
    * quartile cut never sorts the corpus: ONE percentile aggregation
    * produces 3 cut-points that join back as a broadcast band
    * dimension — w8's documented global-binning scale path. Long
    * bound: tf·c ≤ doc_len · max corpus count, summed per doc —
    * ~1e17 at a 10^12-token corpus, inside int64. */
  private def ppl1(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val t = text.split(" ", -1)
        val m = scala.collection.mutable.HashMap.empty[Long, Long]
        var i = 0
        while (i < t.length) {
          val h = md5LongLocal(t(i))
          m.update(h, m.getOrElse(h, 0L) + 1L)
          i += 1
        }
        m.iterator.map { case (h, n) => (id, h, n) }
      })
      .toDF("doc_id", "hw", "tf")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vocab = tf.groupBy(col("hw")).agg(sum(col("tf")).as("c"))
    val fam = tf.join(vocab, Seq("hw"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("c")).as("score"))
      .select(col("doc_id"), col("n_tokens"),
        roundFp(col("score").cast("double") / col("n_tokens"), 6).as("fam"))
      .persist(StorageLevel.MEMORY_AND_DISK) // 2 consumers: cuts + band join
    val cuts = fam
      .agg(expr("percentile(fam, array(0.25, 0.5, 0.75))").as("c"))
      .select(transform(col("c"), x => roundFp(x, 6)).as("c"))
      .select(
        concat(array(lit(Double.NegativeInfinity)), col("c")).as("los"),
        concat(col("c"), array(lit(Double.PositiveInfinity))).as("his"))
    val bands = cuts
      .select(col("his"), posexplode(col("los")).as(Seq("bin", "lo")))
      .select(col("bin"), col("lo"), element_at(col("his"), col("bin") + 1).as("hi"))
    fam.join(broadcast(bands),
        col("fam") >= col("lo") && col("fam") < col("hi"))
      .select(col("doc_id"), col("n_tokens"), col("fam"),
        col("bin").as("fam_quartile"))
  }

  /** x16's winnowing parameters: k-gram width and window size.
    * Guarantee (Schleimer et al., SIGMOD 2003 §3): any shared run of
    * ≥ K+W-1 = 6 tokens yields at least one shared fingerprint. */
  private[operators] val X16_K = 3
  private[operators] val X16_W = 4

  /** x16 — winnowing fingerprints (the MOSS local-fingerprinting
    * scheme, Schleimer et al. 2003): hash every K-word gram, keep the
    * MINIMUM hash in each sliding window of W gram-hashes, and the
    * distinct kept mins are the doc's fingerprint set — a guaranteed-
    * coverage, position-robust sample that x4's single rolling hash
    * and d2's global MinHash both lack (winnowing detects PARTIAL
    * overlap: any shared 6-token run fingerprints identically).
    * Reports per doc: gram count, fingerprint count, and how many
    * docs share its most-shared fingerprint (the plagiarism signal).
    *
    * Plan at 100 TB: gram hashing and window-mins are per-row array
    * expressions inside one codegen stage (text never leaves its
    * row); only 8-byte fingerprints ever reach an exchange (the d11
    * principle). The fingerprint relation has three consumers
    * (per-doc stats, the fp census, the share join-back), so it
    * persists spillable for the query — MEMORY_AND_DISK with lineage,
    * never a corpus checkpoint (the r6 invariant). The share count is
    * fp-keyed (bounded by the fingerprint space), and the join back
    * is fp-keyed then doc-keyed — all linear shuffles of narrow
    * (long, long) rows. */
  private def x16(s: SparkSession, d: String): DataFrame = {
    val l = col("l")
    // 1-based gram index i covers tokens i..i+K-1
    val hashes = when(size(l) >= X16_K,
      transform(sequence(lit(1), size(l) - (X16_K - 1)),
        i => md5Long(concat_ws(" ",
          element_at(l, i), element_at(l, i + 1), element_at(l, i + 2)))))
      .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
    // short docs (0 < n_grams < W) take one window over all grams —
    // the paper's convention, so no non-empty doc fingerprints empty
    val fps = when(size(col("h")) === 0,
      expr("CAST(array() AS ARRAY<BIGINT>)"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(col("h")) - (X16_W - 1), lit(1))),
        i => array_min(slice(col("h"), i, lit(X16_W))))))
    val perDoc = Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("l"))
      .select(col("doc_id"), hashes.as("h"))
      .select(col("doc_id"), size(col("h")).cast("long").as("n_grams"),
        fps.as("fps"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e = perDoc.select(col("doc_id"), explode(col("fps")).as("fp"))
    // fps are distinct WITHIN a doc, so count(*) = distinct docs
    val census = e.groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
    val share = e.join(census, Seq("fp"))
      .groupBy(col("doc_id")).agg(max(col("n_docs")).as("max_share"))
    perDoc
      .select(col("doc_id"), col("n_grams"),
        size(col("fps")).cast("long").as("n_fp"))
      .join(share, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"), col("n_fp"),
        coalesce(col("max_share"), lit(0L)).as("max_share"))
  }

  /** x17 — per-source vocabulary concentration: token count, type
    * count (distinct terms), hapax-legomenon count (terms occurring
    * exactly once in the source) and the hapax rate in ppm. The
    * hapax fraction is the standard OCR-noise / boilerplate detector
    * a curation pass reads per source: clean natural-language crawls
    * sit near the Zipfian ~40-60% type-hapax band, OCR garbage
    * pushes it up (every error is a new singleton type), template
    * spam pushes it down (tiny recycled vocabulary). x15 profiles
    * the global head of the distribution; this is the per-source
    * TAIL diagnostic.
    *
    * Plan at 100 TB: one corpus scan; (source, term) counts are one
    * partial+final agg whose state is vocabulary-sized per source
    * (not corpus-sized); the per-source rollup then aggregates a
    * vocabulary-sized relation down to |sources| rows. The hapax
    * test rides the count rows — no second scan, no distinct, no
    * window. Rates are integer ppm (floor division, both engines). */
  private def x17(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), explode(toks(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("hapax_ppm", expr("(1000000 * n_hapax) div n_types"))

  /** x18's report size — the top terms by corpus frequency. */
  private val X18_TOP = 20

  /** x18 — term burstiness (Church & Gale): the variance-to-mean
    * ratio of each top-[[X18_TOP]] term's per-document frequency,
    * zeros included. Under a Poisson null a term's VMR is ~1;
    * content words are BURSTY (VMR >> 1 — absent from most docs,
    * clumped where they appear) while function words sit near 1.
    * The table separates topical vocabulary from glue — the signal
    * behind stop-word lists, keyword extraction, and x10's df-based
    * idf, measured directly.
    *
    * Exactness: with N docs and per-doc counts tf, VMR =
    * (N·Σtf² − (Σtf)²) / (N·Σtf) — all three moments are exact
    * integer sums (zero-tf docs contribute zero to each, so the
    * sparse (doc, term, tf) relation IS the dense computation), and
    * the single division is pinned to 6 dp.
    *
    * Plan at 100 TB: one corpus scan aggregates to (term, tf)
    * moments — vocabulary-sized state; the top-K cut is
    * TakeOrderedAndProject; N rides a 1-row broadcast. */
  private def x18(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(sum(col("tf")).as("s1"), sum(col("tf") * col("tf")).as("s2"))
      .orderBy(col("s1").desc, col("term").asc)
      .limit(X18_TOP)
    val n = Tables.documents(s, d).agg(count(lit(1)).as("n"))
    // moments convert to DOUBLE BEFORE multiplying: n·s2 and s1²
    // overflow a long at web-corpus scale (s1 ~ 1e12 for a top term
    // ⇒ s1² ~ 1e24), and Spark would wrap silently where DuckDB
    // errors; in double space both engines run the identical IEEE
    // ops (exact whenever the products fit 2^53 — every tested sf)
    tf.crossJoin(broadcast(n))
      .select(col("term"), col("s1").as("tf_total"),
        expr("""floor((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
                  / (CAST(n AS DOUBLE) * s1)
                  * 1000000 + 0.5) / 1000000""").as("vmr"))
  }

  /** x19's report size. */
  private val X19_TOP = 20

  /** x19 — collocation mining by independence-normalized LIFT: for
    * the top-[[X19_TOP]] adjacent word pairs by count, report
    * lift = N·c(a,b) / (c(a)·c(b)) — the PMI-class association
    * measure without PMI's libm log (lift is PMI's argument; the
    * monotone-equivalent exact form, the ppl1/x12 portability move).
    * x7 ranks n-grams by raw count (frequency ≠ association — "the
    * fast" is frequent because both words are); lift is what
    * separates true collocations from products of popularity, the
    * phrase-vocabulary signal a tokenizer or index build reads.
    *
    * Exactness: all four counts are exact longs; the single lift
    * expression converts to DOUBLE BEFORE multiplying (the x18
    * overflow lesson applied pre-emptively: N·c_ab ~ 10²⁴ at web
    * scale) and both engines run identical IEEE ops, 6-dp rounded.
    *
    * Plan at 100 TB: two pruned scans (unigram counts and bigram
    * counts, each partial+final agg on vocabulary-sized keys — the
    * cls1 two-pass adjudication); the top-K cut is
    * TakeOrderedAndProject, and the two unigram attachments join the
    * 20-row head against the vocab table — AQE broadcasts the head,
    * so the vocab never shuffles for it. */
  private def x19(s: SparkSession, d: String): DataFrame = {
    val toksArr = Tables.documents(s, d)
      .select(toks(col("text")).as("l"))
    val ca = toksArr.select(explode(col("l")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val cb = toksArr
      .filter(size(col("l")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(l) - 1),
             i -> struct(element_at(l, i) AS w1,
                         element_at(l, i + 1) AS w2))""")).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nb = cb.agg(sum(col("c_ab")).as("n"))
    cb.orderBy(col("c_ab").desc, col("w1").asc, col("w2").asc)
      .limit(X19_TOP)
      .join(ca.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(ca.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("""floor((CAST(n AS DOUBLE) * c_ab)
                  / (CAST(c1 AS DOUBLE) * c2)
                  * 1000000 + 0.5) / 1000000""").as("lift"))
  }

  /** x20's function-word vocabulary size. */
  private val X20_TOP = 20

  /** x20 — Burrows' Delta stylometry (Burrows 2002): each source's
    * mean absolute z-score of its top-[[X20_TOP]] function-word rates
    * against the across-source norm — the authorship/register
    * fingerprint. A source whose glue-word profile sits far from the
    * corpus norm is a different REGISTER (machine-generated, template,
    * scraped UI chrome) even when its topical vocabulary looks normal
    * — the stylistic outlier signal x2's surface quality score and
    * x13's content overlap both miss.
    *
    * Exactness: rates are integer ppm (floor-div), the per-term
    * across-source moments are exact longs converted to DOUBLE before
    * any product (the x18/ts2 discipline), each |z| quantizes to
    * integer millionths BEFORE the per-source sum (the emb3 move —
    * a double sum over terms would be order-dependent), and Delta is
    * one exact integer floor-division.
    *
    * Plan at 100 TB: ONE corpus scan aggregates to (source, term) —
    * vocabulary-class state, persisted for its two consumers; the
    * function-word head is TakeOrderedAndProject; everything after
    * runs on |sources|×[[X20_TOP]] rows with the head and the ≤T-row
    * moment table broadcast. Absent (source, top-term) pairs are real
    * 0-rates via the cross join, not dropped rows. */
  private def x20(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // NOT the x12/ppl1 kernel-hashmap form, by measurement (r16): the
    // agg key here is (source, term) — COARSER than per-doc — so the
    // codegen'd explode feeding partial agg already collapses far
    // below doc granularity inside each partition, and a per-doc
    // kernel pre-agg EXPANDS the rows the final agg consumes
    // (measured 1.14 → 1.99 s at sf0.1, reverted). The kernel tier
    // pays exactly when the agg key is (doc, term)-grained.
    val st = Tables.documents(s, d)
      .select(col("source"), explode(toks(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK) // totals + head + rates
    val totals = st.groupBy(col("source")).agg(sum(col("c")).as("n_tok"))
    val top = st.groupBy(col("term")).agg(sum(col("c")).as("ct"))
      .orderBy(col("ct").desc, col("term").asc)
      .limit(X20_TOP)
      .select(col("term"))
    val rates = totals.crossJoin(broadcast(top))
      .join(st, Seq("source", "term"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("source"), col("term"), col("n_tok"),
        expr("(1000000 * c) div n_tok").as("rp"))
      .persist(StorageLevel.MEMORY_AND_DISK) // moments + z
    val mom = rates.groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"), sum(col("rp")).as("sr"),
        sum(col("rp") * col("rp")).as("srr"))
    rates.join(broadcast(mom), Seq("term"))
      .select(col("source"), col("n_tok"),
        expr("""CASE WHEN CAST(cnt AS DOUBLE) * srr
                       - CAST(sr AS DOUBLE) * sr <= 0 THEN 0L
                ELSE CAST(floor(abs(
                       (CAST(rp AS DOUBLE) * cnt - CAST(sr AS DOUBLE))
                       / sqrt(CAST(cnt AS DOUBLE) * srr
                              - CAST(sr AS DOUBLE) * sr))
                       * 1000000 + 0.5) AS BIGINT) END""").as("azq"))
      .groupBy(col("source"), col("n_tok"))
      .agg(sum(col("azq")).as("s_az"))
      .select(col("source"), col("n_tok"),
        expr(s"s_az div $X20_TOP").as("delta_ppm"))
  }

  /** x21 — duplicated-n-gram coverage (the RefinedWeb/Gopher
    * repetition signal, Penedo 2023 §"repetition removal"): per doc,
    * the fraction of its DISTINCT 3-grams that also occur in at least
    * one other document — x9 measures repetition INSIDE a doc, x8/x13
    * measure pairwise overlap; this is the corpus-wide boilerplate
    * exposure of each doc (navigation chrome, license blocks,
    * templated spans score high and get dropped or down-weighted in
    * every production curation pipeline).
    *
    * Exactness: grams are 8-byte md5Long keys (the x13/x16 hash
    * family, identical in SQL md5), coverage is an exact integer
    * floor-div ppm; sub-3-token docs report 0/0 grams via the left
    * join, never a dropped row.
    *
    * Plan at 100 TB: text never leaves its row (the d11 principle) —
    * trigram shingling + hashing runs in the TYPED KERNEL tier (r16,
    * the x13/pipe6/d2 boundary: the declarative transform(sequence)+
    * concat_ws+md5Long chain was interpreted HOF + per-gram string
    * md5), and the per-doc DISTINCT dedups in-kernel
    * ([[wordShinglesLocal]]'s first-occurrence set), so the exchange
    * that used to carry every trigram OCCURRENCE into a distinct no
    * longer exists — rows leave the scan already (doc_id, distinct
    * 8-byte hash). The SAME Local mirrors the oracle SQL is written
    * against (md5LongLocal ≡ md5Long, wordShinglesLocal ≡ the
    * transform — both parity-pinned elsewhere) keep the hashes
    * byte-locked. The df agg and per-doc roll-up shuffle hash-keyed
    * longs only; the doc-list left join re-reads the 1-column pruned
    * projection (the voc1 adjudication). Conditional ingest spread
    * only (the pipe5 rule): round-robin the text ONLY when the scan
    * carries fewer splits than the executor count — never at corpus
    * scale. Honest-cold sf0.1: 2.02 s (HOF+distinct) → kernel. */
  private def x21(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.storage.StorageLevel
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val grams = Tables.spreadIfNarrow(s, base).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        // fused shingle+hash (r16): digests token bytes directly —
        // set-identical to wordShinglesLocal(_, 3).map(md5LongLocal)
        wordShingleHashesLocal(text, 3).iterator.map(h => (id, h))
      })
      .toDF("doc_id", "h")
      .persist(StorageLevel.MEMORY_AND_DISK) // df + per-doc roll-up
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val per = grams.join(df, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_dup"))
      .select(col("doc_id"), col("n_grams"), col("n_dup"),
        expr("""CAST(CASE WHEN n_grams = 0 THEN 0
                ELSE (1000000 * n_dup) div n_grams END AS BIGINT)""")
          .as("dup_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x21_dup_ngrams" -> (x21 _),
    "x20_burrows_delta" -> (x20 _),
    "x19_collocation_lift" -> (x19 _),
    "x18_burstiness" -> (x18 _),
    "x17_hapax" -> (x17 _),
    "x16_winnow" -> (x16 _),
    "ppl1_lm_bucket" -> (ppl1 _),
    "x15_zipf" -> (x15 _),
    "x14_char_stats" -> (x14 _),
    "x13_source_overlap" -> (x13 _),
    "x12_bigram_lm" -> (x12 _),
    "x11_bm25" -> (x11 _),
    "x10_tfidf" -> (x10 _),
    "x8_contamination" -> (x8 _),
    "x9_repetition" -> (x9 _),
    "x1_lang_id" -> (x1 _),
    "x2_quality_score" -> (x2 _),
    "x3_token_count" -> (x3 _),
    "x4_fingerprint" -> (x4 _),
    "x5_json_extract" -> (x5 _),
    "x6_pii_redact" -> (x6 _),
    "x7_top_ngrams" -> (x7 _)
  )

  private[operators] def inList(xs: Seq[String]) = xs.map("'" + _ + "'").mkString("[", ",", "]")

  val oracles: Map[String, String] = Map(
    // same md5-prefix trigram hashes, distinct-per-doc coverage, and
    // floor-div ppm; sub-3-token docs survive via the left join
    "x21_dup_ngrams" -> """
      WITH l AS (SELECT doc_id, string_split(text, ' ') AS l
                 FROM documents),
      g AS (SELECT DISTINCT doc_id,
              ('0x' || substr(md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]),
                1, 15))::BIGINT AS h
            FROM l, unnest(generate_series(1, len(l) - 2)) AS u(i)
            WHERE len(l) >= 3),
      df AS (SELECT h, count(*) AS df FROM g GROUP BY 1),
      per AS (SELECT doc_id, count(*) AS n_grams,
                CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_dup
              FROM g JOIN df USING (h) GROUP BY 1)
      SELECT d.doc_id, coalesce(n_grams, 0) AS n_grams,
        coalesce(n_dup, 0) AS n_dup,
        CAST(CASE WHEN coalesce(n_grams, 0) = 0 THEN 0
             ELSE (1000000 * n_dup) // n_grams END AS BIGINT) AS dup_ppm
      FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""",
    // same ppm rates, DOUBLE-before-product moments, millionths-
    // quantized |z|, and integer floor-div Delta
    "x20_burrows_delta" -> s"""
      WITH st AS (SELECT source, unnest(string_split(text, ' ')) AS term
                  FROM documents),
      c AS (SELECT source, term, count(*) AS c FROM st GROUP BY 1, 2),
      tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tok
              FROM c GROUP BY 1),
      top AS (SELECT term FROM (
                SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY 1)
              ORDER BY ct DESC, term LIMIT $X20_TOP),
      r AS (SELECT tot.source, top.term, tot.n_tok,
              (1000000 * coalesce(c.c, 0)) // tot.n_tok AS rp
            FROM tot CROSS JOIN top
            LEFT JOIN c ON c.source = tot.source AND c.term = top.term),
      m AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt,
              CAST(sum(rp) AS BIGINT) AS sr,
              CAST(sum(rp * rp) AS BIGINT) AS srr
            FROM r GROUP BY 1),
      z AS (SELECT r.source, r.n_tok,
              CASE WHEN CAST(cnt AS DOUBLE) * srr
                     - CAST(sr AS DOUBLE) * sr <= 0 THEN 0
              ELSE CAST(floor(abs(
                     (CAST(rp AS DOUBLE) * cnt - CAST(sr AS DOUBLE))
                     / sqrt(CAST(cnt AS DOUBLE) * srr
                            - CAST(sr AS DOUBLE) * sr))
                     * 1000000 + 0.5) AS BIGINT) END AS azq
            FROM r JOIN m USING (term))
      SELECT source, n_tok,
        CAST(sum(azq) AS BIGINT) // $X20_TOP AS delta_ppm
      FROM z GROUP BY 1, 2""",
    // same exact counts, same (c_ab desc, w1, w2) head, same
    // double-space lift expression
    "x19_collocation_lift" -> s"""
      WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
      u AS (SELECT unnest(l) AS w FROM t),
      ca AS (SELECT w, count(*) AS c FROM u GROUP BY 1),
      b AS (SELECT l[i] AS w1, l[i+1] AS w2
            FROM t, unnest(generate_series(1, len(l) - 1)) AS g(i)
            WHERE len(l) >= 2),
      cb AS (SELECT w1, w2, count(*) AS c_ab FROM b GROUP BY 1, 2),
      nb AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n FROM cb),
      top AS (SELECT * FROM cb
              ORDER BY c_ab DESC, w1, w2 LIMIT $X19_TOP)
      SELECT top.w1, top.w2, c_ab,
        floor((CAST(n AS DOUBLE) * c_ab)
          / (CAST(a1.c AS DOUBLE) * a2.c)
          * 1000000 + 0.5) / 1000000 AS lift
      FROM top JOIN ca a1 ON top.w1 = a1.w
               JOIN ca a2 ON top.w2 = a2.w, nb""",
    // same exact integer moments and the same pinned division; the
    // top-K cut is (s1 desc, term) on both sides
    "x18_burstiness" -> s"""
      WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                 FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      m AS (SELECT term, CAST(sum(tf) AS BIGINT) AS s1,
              CAST(sum(tf * tf) AS BIGINT) AS s2
            FROM tf GROUP BY 1
            ORDER BY s1 DESC, term LIMIT $X18_TOP),
      n AS (SELECT count(*) AS n FROM documents)
      SELECT term, s1 AS tf_total,
        floor((CAST(n AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
          / (CAST(n AS DOUBLE) * s1)
          * 1000000 + 0.5) / 1000000 AS vmr
      FROM m, n""",
    // same (source, term) count relation, same floor-division ppm
    "x17_hapax" -> """
      WITH tc AS (SELECT source, unnest(string_split(text, ' ')) AS term
                  FROM documents),
      c AS (SELECT source, term, count(*) AS c FROM tc GROUP BY 1, 2)
      SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        count(*)::BIGINT AS n_types,
        CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        (1000000 * CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT))
          // count(*) AS hapax_ppm
      FROM c GROUP BY source""",
    // same md5-long gram hashes as the engine; DuckDB's 1-based
    // inclusive list slice h[i:i+3] is exactly slice(h, i, 4), and
    // both clamp at the list end, so the window mins agree
    "x16_winnow" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      g AS (SELECT doc_id, CASE WHEN len(l) >= 3 THEN
              list_transform(generate_series(1, len(l) - 2), i ->
                ('0x' || substr(md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]),
                   1, 15))::BIGINT)
            ELSE []::BIGINT[] END AS h FROM t),
      w AS (SELECT doc_id, h, CASE WHEN len(h) = 0 THEN []::BIGINT[] ELSE
              list_distinct(list_transform(
                generate_series(1, greatest(len(h) - 3, 1)),
                i -> list_min(h[i:i+3]))) END AS fps FROM g),
      e AS (SELECT doc_id, unnest(fps) AS fp FROM w),
      c AS (SELECT fp, count(*) AS n_docs FROM e GROUP BY fp),
      m AS (SELECT e.doc_id, max(c.n_docs) AS max_share
            FROM e JOIN c USING (fp) GROUP BY e.doc_id)
      SELECT w.doc_id, CAST(len(w.h) AS BIGINT) AS n_grams,
        CAST(len(w.fps) AS BIGINT) AS n_fp,
        CAST(coalesce(m.max_share, 0) AS BIGINT) AS max_share
      FROM w LEFT JOIN m USING (doc_id)""",
    // familiarity = one double division of exact long sums (the x12
    // convention); quantile_cont matches Spark's exact percentile
    // interpolation (the w8-proven pairing), cut-points rounded
    // before binning on both sides so a sub-ulp interpolation
    // difference can't flip a boundary doc's bucket
    "ppl1_lm_bucket" -> """
      WITH t AS (SELECT doc_id,
                   ('0x' || substr(md5(unnest(string_split(text, ' '))),
                     1, 15))::BIGINT AS hw
                 FROM documents),
      tf AS (SELECT doc_id, hw, count(*) AS tf FROM t GROUP BY 1, 2),
      v AS (SELECT hw, CAST(sum(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
      sc AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
               CAST(sum(tf * c) AS BIGINT) AS score
             FROM tf JOIN v USING (hw) GROUP BY 1),
      f AS (SELECT doc_id, n_tokens,
              floor(CAST(score AS DOUBLE)/n_tokens*1000000 + 0.5)/1000000
                AS fam FROM sc),
      q AS (SELECT quantile_cont(fam, [0.25, 0.5, 0.75]) AS c FROM f),
      cuts AS (SELECT list_transform(c,
                 x -> floor(x*1000000 + 0.5)/1000000) AS c FROM q)
      SELECT doc_id, n_tokens, fam,
        CASE WHEN fam < c[1] THEN 0 WHEN fam < c[2] THEN 1
             WHEN fam < c[3] THEN 2 ELSE 3 END AS fam_quartile
      FROM f, cuts""",
    // integer log2 via bin() string length — both engines print
    // minimal-width binary, so the bucketing is exact on both sides
    "x15_zipf" -> s"""
      WITH t AS (SELECT unnest(string_split(text, ' ')) AS term
                 FROM documents),
      f AS (SELECT term, count(*) AS c FROM t GROUP BY 1
            ORDER BY c DESC, term LIMIT $X15_TOP),
      r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS rnk
            FROM f)
      SELECT CAST(length(bin(rnk)) - 1 AS BIGINT) AS k,
        count(*) AS n_terms,
        CAST(sum(c) AS BIGINT) AS freq_sum,
        CAST(max(c) AS BIGINT) AS max_f, CAST(min(c) AS BIGINT) AS min_f
      FROM r GROUP BY 1""",
    // char explode via string_split(text,'') ≡ the engine's
    // sequence+substring; Σc² rides DuckDB's HUGEINT but is cast to
    // DOUBLE before the single division, mirroring the engine
    "x14_char_stats" -> """
      WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
             FROM documents),
      h AS (SELECT doc_id, ch, count(*) AS cnt FROM c GROUP BY doc_id, ch),
      a AS (SELECT doc_id, count(*) AS n_uniq, sum(cnt*cnt) AS sq,
              max(cnt) AS mx, sum(cnt) AS len FROM h GROUP BY doc_id)
      SELECT doc_id, n_uniq,
        floor((CAST(sq AS DOUBLE)/(CAST(len AS DOUBLE)*CAST(len AS DOUBLE)))
          *1000000 + 0.5)/1000000 AS simpson,
        floor((CAST(mx AS DOUBLE)/CAST(len AS DOUBLE))*1000000 + 0.5)/1000000
          AS top_ratio
      FROM a""",
    // same md5-prefix hash as the engine's md5Long; jaccard division
    // parenthesized identically (inter / (n_a + n_b - inter))
    "x13_source_overlap" -> """
      WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
      u AS (SELECT source, unnest(list_transform(generate_series(1, len(l)-1),
               i -> l[i] || ' ' || l[i+1])) AS sh FROM t),
      sh AS (SELECT DISTINCT source,
               ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h FROM u),
      n AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      x AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
            FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
            GROUP BY a.source, b.source)
      SELECT x.src_a, x.src_b, na.n AS n_a, nb.n AS n_b, x.inter,
        floor(x.inter / (na.n + nb.n - x.inter) * 1000000 + 0.5)/1000000
          AS jaccard
      FROM x JOIN n na ON na.source = x.src_a
             JOIN n nb ON nb.source = x.src_b""",
    // identical parenthesization + decimal literals as the Spark
    // expression — the gate hashes double BITS, so association order
    // and constant parsing must agree, not just the math
    "x12_bigram_lm" -> """
      WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
      ix AS (SELECT doc_id, l, unnest(generate_series(1, len(l)-1)) AS i FROM t),
      bg AS (SELECT doc_id,
               ('0x' || substr(md5(l[i] || ' ' || l[i+1]), 1, 15))::BIGINT
                 AS hbg,
               ('0x' || substr(md5(l[i]), 1, 15))::BIGINT AS hw1
             FROM ix),
      b AS (SELECT hbg, hw1, count(*) AS b FROM bg GROUP BY 1, 2),
      u AS (SELECT hw1, sum(b) AS u FROM b GROUP BY 1),
      st AS (SELECT b.hbg, (b.b * 50 < u.u) AS rare FROM b JOIN u USING (hw1))
      SELECT bg.doc_id, count(*) AS n_bigrams,
        count(*) FILTER (WHERE st.rare) AS n_rare,
        floor((count(*) FILTER (WHERE st.rare))::DOUBLE / count(*)
          * 1000000 + 0.5)/1000000 AS rare_ratio
      FROM bg JOIN st USING (hbg)
      GROUP BY bg.doc_id""",
    "x11_bm25" -> """
      WITH t AS (SELECT doc_id, len(string_split(text,' ')) AS dl,
                        unnest(string_split(text,' ')) AS term
                 FROM documents),
      hits AS (SELECT doc_id, dl, term, count(*) AS tf FROM t
               WHERE term IN ('hash','join','merge') GROUP BY 1, 2, 3),
      df AS (SELECT term, count(*) AS df FROM hits GROUP BY 1),
      stats AS (SELECT count(*) AS n,
                  sum(len(string_split(text,' '))) / count(*) AS avgdl
                FROM documents),
      sc AS (SELECT doc_id,
               ((n - df + 0.5) / (df + 0.5)) * (tf * 2.2) /
                 (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS term_score
             FROM hits JOIN df USING (term), stats)
      SELECT doc_id, floor(sum(term_score)*1000000 + 0.5)/1000000 AS score
      FROM sc GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10""",
    "x10_tfidf" -> """
      WITH t AS (SELECT doc_id, unnest(string_split(text,' ')) AS term
                 FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n FROM documents),
      w AS (SELECT tf.doc_id, tf.term,
              CAST(tf.tf * n.n AS DOUBLE) / df.df AS weight
            FROM tf JOIN df ON tf.term = df.term, n),
      r AS (SELECT doc_id, term, weight, row_number() OVER (
              PARTITION BY doc_id ORDER BY weight DESC, term) AS rank
            FROM w)
      SELECT doc_id, term, weight, rank FROM r WHERE rank <= 3""",
    "x1_lang_id" -> s"""
      WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
      sc AS (SELECT doc_id,
        len(list_filter(l, x -> list_contains(${inList(EN)}, x))) AS sc_en,
        len(list_filter(l, x -> list_contains(${inList(DE)}, x))) AS sc_de,
        len(list_filter(l, x -> list_contains(${inList(FR)}, x))) AS sc_fr,
        len(list_filter(l, x -> list_contains(${inList(ES)}, x))) AS sc_es FROM t)
      SELECT doc_id,
        CASE WHEN greatest(sc_en, sc_de, sc_fr, sc_es) = 0 THEN 'und'
             WHEN sc_en >= greatest(sc_de, sc_fr, sc_es) THEN 'en'
             WHEN sc_de >= greatest(sc_fr, sc_es) THEN 'de'
             WHEN sc_fr >= sc_es THEN 'fr' ELSE 'es' END AS pred_lang,
        sc_en FROM sc""",
    "x2_quality_score" -> s"""
      WITH t AS (SELECT doc_id, n_chars, string_split(text,' ') AS l FROM documents),
      b AS (SELECT doc_id,
        floor(least(n_chars / 500.0, 1.0)*1000000 + 0.5)/1000000 AS len_score,
        floor(len(list_filter(l, x -> list_contains(${inList(EN)}, x)))::DOUBLE / len(l)*1000000 + 0.5)/1000000 AS stop_ratio,
        floor(list_aggregate(list_transform(l, x -> length(x)), 'sum')::DOUBLE / len(l)*1000000 + 0.5)/1000000 AS mean_tok_len
        FROM t)
      SELECT doc_id, len_score, stop_ratio, mean_tok_len,
        floor((len_score*0.5 + stop_ratio*0.3 + least(mean_tok_len/8.0, 1.0)*0.2)*1000000 + 0.5)/1000000 AS quality
      FROM b""",
    "x3_token_count" -> """
      SELECT doc_id, len(string_split(text,' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
      FROM documents""",
    "x4_fingerprint" -> """
      WITH t AS (SELECT doc_id,
        ('0x' || substr(md5(text),1,15))::BIGINT AS md5_fp,
        string_split(text,' ') AS l FROM documents)
      SELECT doc_id, md5_fp,
        list_sum(list_transform(generate_series(1, len(l)), i ->
          ((('0x' || substr(md5(l[i]),1,15))::BIGINT % 100003)
            * CAST(pow(31, (i-1) % 8) AS BIGINT)) % 1000000007))::BIGINT
          % 1000000007 AS roll_fp
      FROM t""",
    "x5_json_extract" -> """
      SELECT event_type, count(*) AS cnt,
        CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
        floor(avg(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT))*1000000 + 0.5)/1000000 AS avg_k
      FROM events GROUP BY event_type""",
    "x6_pii_redact" -> """
      WITH p AS (SELECT doc_id,
        CASE WHEN doc_id % 3 = 0
               THEN text || ' contact user' || doc_id::VARCHAR || '@example.com'
             WHEN doc_id % 3 = 1
               THEN text || ' call 360-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
             ELSE text END AS t
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(t, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
          '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g') AS redacted,
        len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
        len(regexp_extract_all(t, '\d{3}-\d{3}-\d{4}')) AS n_phones
      FROM p""",
    "x7_top_ngrams" -> """
      WITH l AS (SELECT string_split(text, ' ') AS l FROM documents),
      n AS (SELECT unnest(list_transform(generate_series(1, len(l)-1),
              i -> l[i] || ' ' || l[i+1])) AS ngram FROM l)
      SELECT ngram, count(*) AS cnt FROM n
      GROUP BY ngram ORDER BY cnt DESC, ngram LIMIT 20""",
    "x8_contamination" -> """
      WITH s AS (SELECT doc_id,
        ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100 AS bkt,
        list_distinct(list_transform(generate_series(1, len(l)-1),
          i -> ('0x' || substr(md5(l[i] || ' ' || l[i+1]), 1, 15))::BIGINT))
          AS sh
        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents)),
      train AS (SELECT DISTINCT unnest(sh) AS sh FROM s WHERE bkt < 80),
      test AS (SELECT doc_id, unnest(sh) AS sh FROM s WHERE bkt >= 90)
      SELECT test.doc_id, count(DISTINCT test.sh) AS n_contaminated
      FROM test JOIN train ON test.sh = train.sh
      GROUP BY test.doc_id""",
    "x9_repetition" -> """
      WITH b AS (SELECT doc_id, len(l)-1 AS n_bigrams,
        len(list_distinct(list_transform(generate_series(1, len(l)-1),
          i -> l[i] || ' ' || l[i+1]))) AS n_distinct
        FROM (SELECT doc_id, string_split(text,' ') AS l FROM documents))
      SELECT doc_id, n_bigrams,
        CASE WHEN n_bigrams > 0
             THEN floor((1.0 - n_distinct::DOUBLE / n_bigrams)*1000000 + 0.5)/1000000 END AS rep_ratio
      FROM b"""
  )
}
