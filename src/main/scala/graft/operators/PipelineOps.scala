package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns.{md5Long, roundFp, toks}

/** Composed end-to-end curation pipeline — the proof that the
  * operator families are COMPOSABLE, not just individually correct.
  * A corpus refresh in a training-data pipeline is exactly this chain,
  * and the whole thing is one declarative plan: Catalyst fuses the
  * quality gate into the scan, and the three keyed stages cost three
  * shuffles total (content_fp, doc_id is shuffle-free after dedup's
  * window — see below — and (source, split)).
  *
  * Stage semantics deliberately reuse the standalone operators' rules
  * (d1's fingerprint, sm2's split hash, sm4's hash-order cap) so the
  * pipeline's behavior is the composition of already-verified parts —
  * and the oracle replays the identical chain in SQL.
  */
object PipelineOps {

  /** pipe1 — quality gate → exact dedup → split assign → per-(source,
    * split) cap:
    *   1. keep docs with 5..1000 whitespace tokens (narrow, fused into
    *      the scan);
    *   2. exact-dedup on the d1 content fingerprint, keeping the
    *      minimum doc_id (one shuffle on the 8-byte hash — text never
    *      shuffles);
    *   3. assign train/val/test by the sm2 hash rule (narrow — a pure
    *      function of doc_id);
    *   4. cap each (source, split) cell at 40 docs in hash order (one
    *      shuffle on the small composite key; bounded per-key top-k).
    * At 100 TB: two real shuffles of skinny rows, everything else
    * pipelined — the plan a hand-built ingest DAG converges to anyway,
    * except here AQE still re-plans each exchange at runtime. */
  /** The shared front of both composed pipelines: keep docs with
    * 5..1000 whitespace tokens (narrow, fused into the scan), then
    * exact-dedup on d1's content fingerprint keeping the minimum
    * doc_id (the one shuffle on the 8-byte hash). `cols` is what
    * survives past the gate — the dedup window only adds/removes its
    * own bookkeeping columns. */
  private def gatedDeduped(s: SparkSession, d: String,
      cols: String*): DataFrame =
    Tables.documents(s, d)
      .select(cols.map(col): _*)
      .filter(size(split(col("text"), " ")).between(5, 1000))
      .withColumn("content_fp", md5Long(lower(trim(col("text")))))
      .withColumn("krn", row_number().over(
        Window.partitionBy(col("content_fp")).orderBy(col("doc_id").asc)))
      .filter(col("krn") === 1)
      .select(cols.map(col): _*)

  private def pipe1(s: SparkSession, d: String): DataFrame = {
    val deduped = gatedDeduped(s, d, "doc_id", "source", "text")
    val h = md5Long(col("doc_id"))
    deduped
      .withColumn("split",
        when(h % 100 < 80, "train").when(h % 100 < 90, "val")
          .otherwise("test"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source"), col("split"))
          .orderBy(h.asc, col("doc_id").asc)))
      .filter(col("rn") <= 40)
      .select(col("source"), col("split"), col("doc_id"), col("rn"))
  }

  /** pk1's fixed context budget (tokens per training sequence) and
    * shard count. Shards are the parallelism dial: each window
    * partition sorts one shard, so a 100 TB run raises PACK_SHARDS to
    * O(corpus/executor-memory) and every partition stays
    * executor-sized; the assignment hash is deterministic, so packing
    * is retry-stable and reproducible across runs. */
  private val PACK_BUDGET = 2048L
  private val PACK_SHARDS = 8L

  /** pk1 — sequence packing: place every document into fixed
    * [[PACK_BUDGET]]-token training sequences, the step between
    * curation and tokenization in an LLM pretraining pipeline. This is
    * concat-and-chunk packing (the GPT-pretraining form): documents
    * are concatenated in deterministic shuffled order (md5 of doc_id —
    * the corpus shuffle every run needs anyway) within a shard and the
    * stream is cut every PACK_BUDGET tokens, so a document may
    * straddle a boundary (flagged). The whole-doc greedy variant
    * (next-fit: open a new pack rather than split) is inherently
    * sequential state — it can't be a window function — and
    * concat-and-chunk is both the more common production choice and
    * the declarative one.
    *
    * Plan: token counts are narrow per-row arithmetic fused into the
    * scan; ONE shuffle on shard; the per-shard window computes the
    * exclusive running token sum; pack id/offset are integer division
    * on that sum. Output carries only (shard, doc_id, n_tok, pack_id,
    * pack_off, crosses_pack) — text never shuffles. */
  private def pk1(s: SparkSession, d: String): DataFrame = {
    val h = md5Long(col("doc_id"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5Long(col("doc_id")).asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("shard", (h % PACK_SHARDS).cast("long"))
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("n_tok"),
        expr(s"off div $PACK_BUDGET").as("pack_id"),
        (col("off") % PACK_BUDGET).as("pack_off"),
        (expr(s"(off + n_tok - 1) div $PACK_BUDGET") =!=
          expr(s"off div $PACK_BUDGET")).as("crosses_pack"))
  }

  /** ck1's window geometry: 64-token chunks every 48 tokens, i.e. a
    * 16-token overlap so no sentence straddling a cut is lost to both
    * chunks — the standard RAG-indexing / fixed-context pretraining
    * chunker shape. */
  private val CHUNK_TOKENS = 64
  private val CHUNK_STRIDE = 48

  /** ck1's transform — sliding-window document chunking: cut every
    * document into [[CHUNK_TOKENS]]-token windows advancing by
    * [[CHUNK_STRIDE]] (chunks at token offsets 0, 48, 96, … while the
    * offset is inside the document; the final chunk is short, never
    * empty). The embedding/RAG-side complement of pk1's packing: pk1
    * concatenates documents UP to a budget, ck1 splits documents DOWN
    * to one.
    *
    * Output is the chunk manifest — (doc_id, chunk_idx, start_tok,
    * n_tok) plus the chunk-content fingerprint (md5Long of the
    * re-joined token slice), which pins the slice semantics cross-
    * engine without shipping a single chunk body. Plan shape at
    * 100 TB: scan → per-row sequence/explode/slice → project; ZERO
    * exchanges (plan-asserted), so it runs at parquet-scan speed and
    * the only scale knob is input split size. The fingerprint is
    * computed BEFORE any downstream shuffle would see the row, so a
    * consumer deduping or joining chunks keys on 8 bytes, never text.
    *
    * Input-agnostic by design: stateless narrow expressions over a
    * `(doc_id, text)` relation, so the SAME function runs on a batch
    * table or a readStream micro-batch unchanged (no state, no
    * watermark needed — parity spec'd in `EventStreamsSpec`). */
  def chunkManifest(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    docs
      .select(col("doc_id"), t.as("t"))
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), greatest(size(col("t")) - 1, lit(0)),
          lit(CHUNK_STRIDE))).as("start_tok"))
      .select(col("doc_id"),
        expr(s"start_tok div $CHUNK_STRIDE").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        slice(col("t"), col("start_tok") + 1, lit(CHUNK_TOKENS)).as("ch"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ch")).cast("long").as("n_tok"),
        md5Long(array_join(col("ch"), " ")).as("chunk_fp"))
  }

  private def ck1(s: SparkSession, d: String): DataFrame =
    chunkManifest(Tables.documents(s, d).select(col("doc_id"), col("text")))

  /** pipe2 — the full pretraining data path, composed end-to-end:
    * quality gate (pipe1's token-count rule) → exact dedup (d1's
    * fingerprint rule) → sliding-window chunking (ck1's 64/48 rule)
    * → pack CHUNKS into [[PACK_BUDGET]]-token sequences (pk1's
    * concat-and-chunk rule, keyed on (doc_id, chunk_idx)). Every stage
    * reuses a standalone operator's already-verified semantics; the
    * whole path is ONE declarative plan and the oracle replays the
    * identical chain in SQL.
    *
    * Shuffle audit at 100 TB — exactly two exchanges: (1) the dedup
    * window on the 8-byte content fingerprint. This one necessarily
    * carries text — unlike pipe1, the text is still NEEDED downstream
    * (chunking), so column pruning cannot drop it before the exchange;
    * any one-pass dedup-then-process pipeline pays exactly this
    * exchange, and it is the LAST time text moves. (2) the pack window
    * on the shard key, by which point rows are the narrow chunk
    * manifest (ids + token count) — plan-asserted string-free.
    * Chunking itself adds no exchange (ck1's zero-shuffle property).
    *
    * Stage reuse is LITERAL, not copy-paste: the gate+dedup front is
    * [[gatedDeduped]] (shared with pipe1) and the chunker is
    * [[chunkManifest]] (ck1 itself) — Catalyst prunes the manifest
    * columns pipe2 doesn't carry (start_tok, chunk_fp), so the
    * composition law "pipe2's chunks ≡ ck1's manifest" holds by
    * construction, and a future change to either rule cannot desync
    * the composed path from the standalone operator. */
  private def pipe2(s: SparkSession, d: String): DataFrame = {
    val chunks = chunkManifest(gatedDeduped(s, d, "doc_id", "text"))
      .select(col("doc_id"), col("chunk_idx"), col("n_tok"))
    val h = md5Long(concat(col("doc_id").cast("string"), lit(":"),
      col("chunk_idx").cast("string")))
    val w = Window.partitionBy(col("shard"))
      .orderBy(h.asc, col("doc_id").asc, col("chunk_idx").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    chunks
      .withColumn("shard", (h % PACK_SHARDS).cast("long"))
      .withColumn("off", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .select(col("shard"), col("doc_id"), col("chunk_idx"), col("n_tok"),
        expr(s"off div $PACK_BUDGET").as("pack_id"),
        (col("off") % PACK_BUDGET).as("pack_off"))
  }

  /** pipe3 — the corpus data card: the per-source report a mixture
    * design (sm3/sm6) reads before choosing weights — doc/token/char
    * volume, language spread and dominant-language share,
    * x2-consistent mean quality, and the corpus-wide exact-duplicate
    * rate (d1's fingerprint).
    *
    * One scan end-to-end: per-doc signals are scored inside the scan
    * stage, the duplicate flag rides a window over the text
    * fingerprint (the only corpus-wide exchange, and it carries only
    * the fingerprint plus a handful of numeric columns — never the
    * text), and the card cascades partial (source, lang) → final
    * (source) aggregation, collapsing the corpus to |sources|×|langs|
    * rows at the first exchange — the two-level shape a
    * 1000-executor run wants. Per-doc quality is quantized to exact
    * ppm LONGS before summing, so every mean in the card is integer
    * sums divided once — no float-summation-order dependence, which
    * is what lets the DuckDB oracle match bit-for-bit. */
  private def pipe3(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    val perDoc = Tables.documents(s, d).select(
      col("source"), col("lang"), col("n_chars"),
      size(t).as("ws_tokens"),
      md5(col("text")).as("fp"),
      roundFp(least(col("n_chars") / 500.0, lit(1.0)), 6).as("len_score"),
      roundFp(TextOps.countIn(t, TextOps.EN).cast("double") / size(t), 6)
        .as("stop_ratio"),
      roundFp(aggregate(t, lit(0L), (acc, x) => acc + length(x))
        .cast("double") / size(t), 6).as("mean_tok_len"))
      .withColumn("quality_ppm",
        floor((col("len_score") * 0.5 + col("stop_ratio") * 0.3
          + least(col("mean_tok_len") / 8.0, lit(1.0)) * 0.2) * 1000000
          + 0.5).cast("long"))
    val flagged = perDoc.withColumn("is_dup",
      when(count(lit(1)).over(Window.partitionBy(col("fp"))) > 1, 1L)
        .otherwise(0L))
    val partial = flagged.groupBy(col("source"), col("lang")).agg(
      count(lit(1)).as("n"),
      sum(col("ws_tokens")).as("tok"),
      sum(col("n_chars")).as("chars"),
      sum(col("quality_ppm")).as("q_ppm"),
      sum(col("is_dup")).as("dups"))
    partial.groupBy(col("source")).agg(
      sum(col("n")).as("n_docs"),
      count(lit(1)).as("n_langs"),
      roundFp(max(col("n")).cast("double") / sum(col("n")), 6)
        .as("top_lang_share"),
      sum(col("tok")).as("total_tokens"),
      roundFp(sum(col("tok")).cast("double") / sum(col("n")), 4)
        .as("mean_tokens"),
      roundFp(sum(col("chars")).cast("double") / sum(col("n")), 4)
        .as("mean_chars"),
      roundFp(sum(col("q_ppm")).cast("double") / sum(col("n")) / 1000000.0, 4)
        .as("mean_quality"),
      roundFp(sum(col("dups")).cast("double") / sum(col("n")), 6)
        .as("dup_rate"))
  }

  /** pipe4 — the domain-tilt curation path, composing this round's
    * operators end to end from their REGISTERED forms (the rrf1/s6
    * composition rule — the pipeline runs exactly what each operator
    * serves, and the oracle embeds each constituent's oracle SQL):
    * DSIR importance selection picks the target-tilted top docs
    * (dsir1) → the line-dedup rewrite reports their deboilerplated
    * state (d11) → the BPE tokenizer prices them (tok1) → one
    * per-source report of the tilted, cleaned, tokenized selection:
    * docs kept, boilerplate lines dropped, clean chars, BPE tokens.
    *
    * Scale shape: the selection is TakeOrderedAndProject-bounded
    * (100 rows) and BROADCASTS into the per-doc d11/tok1 relations —
    * the join cost is selection-sized; the constituents keep their
    * own plans; the report agg is |sources| rows. All integers. */
  private def pipe4(s: SparkSession, d: String): DataFrame = {
    val sel = SampleOps.queries("dsir1_importance")(s, d)
      .select(col("doc_id"), col("source"))
    val cln = DedupOps.queries("d11_line_dedup")(s, d)
      .select(col("doc_id"), col("n_dropped"), col("clean_len"))
    val tok = RetrievalOps.queries("tok1_bpe_apply")(s, d)
      .select(col("doc_id"), col("bpe_tokens"))
    cln.join(broadcast(sel), Seq("doc_id"))
      .join(tok, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_dropped")).as("lines_dropped"),
        sum(col("clean_len")).as("clean_chars"),
        sum(col("bpe_tokens")).as("bpe_tokens"))
  }

  /** cur1 — curriculum phase assignment, the data-ORDERING stage of a
    * training recipe (easy→hard pacing): every document is placed in
    * a global quality quartile computed from the REGISTERED x2 score
    * (composition rule again), and the report is the per-phase census
    * a curriculum schedule reads. The binning is w8's scale-correct
    * GLOBAL-quantile shape verbatim: one exact-percentile aggregate →
    * 4-row broadcast band dimension → scan-speed band join — no
    * global sort, no window over the corpus; cut-points are rounded
    * (portable floor form) on both engines before binning so a
    * sub-ulp interpolation difference can't flip a boundary doc.
    * The scored relation is persisted (doc-count × 2 narrow columns)
    * for its two consumers (the percentile agg and the band join). */
  private def cur1(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val scored = TextOps.queries("x2_quality_score")(s, d)
      .select(col("doc_id"), col("quality"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cuts = scored
      .agg(expr("percentile(quality, array(0.25, 0.5, 0.75))").as("c"))
      .select(transform(col("c"), x => roundFp(x, 6)).as("c"))
      .select(
        concat(array(lit(Double.NegativeInfinity)), col("c")).as("los"),
        concat(col("c"), array(lit(Double.PositiveInfinity))).as("his"))
    val bands = cuts
      .select(col("his"), posexplode(col("los")).as(Seq("phase", "lo")))
      .select(col("phase"), col("lo"),
        element_at(col("his"), col("phase") + 1).as("hi"))
    scored.join(broadcast(bands),
        col("quality") >= col("lo") && col("quality") < col("hi"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("quality")).as("q_lo"), max(col("quality")).as("q_hi"))
  }

  /** imp1 — leave-one-out source impact: for every source, what the
    * corpus mean document length would become WITHOUT that source,
    * stated as the delta against the current mean (6-dp, the exact
    * cast-pinned float convention). A positive delta says "removing
    * this source raises the corpus average" — the one-table answer
    * to "which source drags the metric", read before any sm3-style
    * mixture reweighting. LOO over an additive metric needs no
    * second pass: every leave-one-out mean is arithmetic on the
    * per-source (count, sum) pairs and the grand totals.
    *
    * Scale shape: one pruned scan, one |sources|-sized partial+final
    * agg; the grand totals are unpartitioned windows over the
    * |sources|-row AGGREGATED relation (bounded by construction —
    * the census pattern), and the delta is two divisions over exact
    * longs, parenthesization pinned on both engines. */
  private def imp1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("tn", sum(col("n_docs")).over(Window.partitionBy()))
      .withColumn("ts", sum(col("sum_chars")).over(Window.partitionBy()))
      .select(col("source"), col("n_docs"),
        when(col("tn") === col("n_docs"), lit(null))
          .otherwise(roundFp(
            (col("ts") - col("sum_chars")) / (col("tn") - col("n_docs"))
              - col("ts") / col("tn"), 6))
          .as("loo_delta"))

  /** pipe5's stopword probe set — the two function words the synthetic
    * corpus actually contains; ONE definition shared with the oracle
    * generator so the lists cannot drift. */
  private val PIPE5_STOPS = Seq("the", "a")

  /** pipe5 — Gopher-style rule-based quality filtering WITH PER-RULE
    * ATTRIBUTION (Rae et al. 2021 §A.1.1, thresholds adapted to the
    * synthetic corpus): five document rules —
    *   r1_word_count: 50 ≤ words ≤ 500
    *   r2_mean_word_len: mean word length in [3, 8) chars (integer
    *     thousandths: 3000 ≤ 1000·chars div words < 8000)
    *   r3_stopwords: ≥ 2 occurrences of the [[PIPE5_STOPS]] probe set
    *   r4_top_token: most frequent token ≤ 12% of tokens (dominance —
    *     the repetition gate)
    *   r5_ttr: distinct tokens ≥ 30% of tokens (type-token ratio)
    * — reported as (rule, n_fail, fail_ppm) plus the `any_rule` roll-
    * up. pipe1 APPLIES a quality gate; this is the report that says
    * WHICH rule is doing the filtering, the first thing anyone tunes
    * when a corpus refresh suddenly drops 30% of a source.
    *
    * Scale shape: ONE exploded (doc, token) tf agg (map-side combine)
    * rolls up to one row per doc, joined back to the 2-column pruned
    * doc projection for the char count; the rule verdicts reduce to a
    * SINGLE row of conditional sums which a stack generator unpivots
    * — nothing after the per-doc agg depends on volume. */
  /** pipe5's per-doc rule verdicts (doc_id, words, f1..f5) — ONE
    * definition consumed by the pipe5 census and pipe9's funnel (the
    * pipe8 anti-drift rule: the funnel's quality stage IS the
    * registered gate, not a re-typed copy of its thresholds). */
  private def pipe5PerDoc(s: SparkSession, d: String): DataFrame =
    Tables.memoGetOrBuild(perDocMemo, s, d,
      Tables.versionStamp(d, "documents"))(
      computePipe5PerDoc(s, d).localCheckpoint(true))

  /** Per-session memos of the two per-train-doc verdict relations the
    * composed pipelines share: [[pipe5PerDoc]] (quality flags) feeds
    * pipe5 AND pipe9; [[pipe6Hits]] (contamination counts) feeds pipe6
    * AND pipe9 — without the memos pipe9 re-runs the full tokenize+agg
    * and shingle-probe pipelines just to read verdicts already
    * computed (VERDICT r11 #6; the gr2–gr8 coEdges discipline). Both
    * values are eagerly localCheckpoint'ed SIGNATURE-CLASS relations —
    * one narrow row per doc (id + flags / id + count), never corpus
    * text — so the blocks are doc-count-sized, survive
    * `catalog.clearCache()` between bench queries, and free when the
    * entry drops or the session ends. Version-stamp keyed like
    * DedupOps.pairMemo: an in-session dataset rewrite invalidates. */
  private val perDocMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Long), DataFrame]
  private val hitsMemo =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, Long), DataFrame]

  /** Test/bench hook: drop the shared pipeline memos (cold runs). */
  private[graft] def clearPipeMemos(): Unit = {
    perDocMemo.clear(); hitsMemo.clear()
  }

  /** Bench hook: build the shared per-doc relations up front so the
    * one-time cost is its own attributed line instead of landing on
    * whichever of pipe5/pipe6/pipe9 runs first (the
    * memo_copurchase_edges convention in [[graft.Bench]]). */
  private[graft] def primePipeMemos(s: SparkSession, d: String): Unit = {
    // per-step stderr timings — the memo_copurchase/memo_dedup_sigs
    // discipline: a memo line's internal split must stay measurable
    def step(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      System.err.println(
        f"[graft]   memo_pipeline/$name%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // the two verdict relations are independent (different source
    // tables, no shared subtree), so they build as two concurrent
    // jobs (guide §2.6 — overlap independent jobs; the r18
    // copurchase degrees∥bloom discipline): pipe5's per-doc stats
    // pass back-fills the cores pipe6's decontam join leaves idle
    // between its stages. Await rethrows a scratch-thread failure.
    val p5 = scala.concurrent.Future(
      step("pipe5_perdoc") { pipe5PerDoc(s, d); () })(
      scala.concurrent.ExecutionContext.global)
    step("pipe6_hits") { pipe6Hits(s, d); () }
    scala.concurrent.Await.result(
      p5, scala.concurrent.duration.Duration.Inf)
  }

  /** The per-doc Gopher statistics IN the scan kernel (r15; the r12
    * in-row HOF form before it, the exploded (doc_id, tok) exchange
    * before that): every statistic the rules read (words, max tf,
    * type count, stopword count) is a function of ONE document's
    * token list, so it computes inside the scan task — no join
    * (n_chars rides the same row) and no exchange EXCEPT one
    * conditional round-robin spread when the parquet scan itself
    * carries fewer splits than the executor count (the sf-ladder
    * files are a single split; hashing would serialize on one task).
    * At corpus scale the scan has thousands of splits, the condition
    * never fires, and the kernel tokenizes shuffle-free — the
    * d11/tok1 "never shuffle to tokenize" discipline (ADVICE r15:
    * the unconditional repartition contradicted it). The r12 form
    * already had that plan shape but spelled the token-run census in
    * higher-order expressions (array_sort + filter + zip_with), and
    * HOFs are CodegenFallback — interpreted per row, measured 1.9 s
    * of the memo line at sf0.1; one hash-count pass per doc in a
    * typed kernel is the x9/x14/tok2 boundary applied here (→
    * ~0.3 s). Arithmetic mirrors the oracle exactly: token = split
    * on single space KEEPING empties (both engines), flags via Long
    * `div` — words ≥ 1 always (split never returns an empty list),
    * so the divisions cannot throw. The declarative twin is pinned
    * row-identical in PipeKernelLawSpec. */
  private[graft] def computePipe5PerDoc(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val stops = PIPE5_STOPS.toArray
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"), col("text"))
    // kernel stages declare their parallelism (the buildSignatures
    // rule: a narrow parquet scan would serialize the hashing) — but
    // ONLY when the scan can't already feed it: a corpus-scale scan
    // carries ≥ defaultParallelism splits and must not pay a
    // corpus-sized round-robin exchange of full document text
    Tables.spreadIfNarrow(s, base)
      .as[(Long, Long, String)]
      .mapPartitions(_.map { case (id, nChars, text) =>
        val t = text.split(" ", -1)
        val tf = new java.util.HashMap[String, Long](t.length * 2)
        var i = 0
        while (i < t.length) {
          tf.merge(t(i), 1L, (a, b) => a + b); i += 1
        }
        val words = t.length.toLong
        var maxTf = 0L
        val it = tf.values().iterator()
        while (it.hasNext) {
          val c = it.next(); if (c > maxTf) maxTf = c
        }
        var nStop = 0L
        var sIdx = 0
        while (sIdx < stops.length) {
          nStop += tf.getOrDefault(stops(sIdx), 0L); sIdx += 1
        }
        val nTypes = tf.size.toLong
        val mwl = 1000L * nChars / words
        (id, words,
          words < 50 || words > 500,
          mwl < 3000 || mwl >= 8000,
          nStop < 2,
          1000L * maxTf / words > 120,
          1000L * nTypes / words < 300)
      })
      .toDF("doc_id", "words", "f1", "f2", "f3", "f4", "f5")
  }

  private def pipe5(s: SparkSession, d: String): DataFrame = {
    val per = pipe5PerDoc(s, d)
    per.agg(count(lit(1)).as("n_docs"),
        sum(when(col("f1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("f4"), 1L).otherwise(0L)).as("n4"),
        sum(when(col("f5"), 1L).otherwise(0L)).as("n5"),
        sum(when(col("f1") || col("f2") || col("f3") || col("f4")
          || col("f5"), 1L).otherwise(0L)).as("n_any"))
      .select(col("n_docs"), expr(
        """stack(6,
             'r1_word_count', n1, 'r2_mean_word_len', n2,
             'r3_stopwords', n3, 'r4_top_token', n4,
             'r5_ttr', n5, 'any_rule', n_any)
           AS (rule, n_fail)"""))
      .select(col("rule"), col("n_fail"),
        expr("(1000000 * n_fail) div n_docs").as("fail_ppm"))
  }

  /** pipe6's shingle width and quarantine threshold: a train doc
    * sharing ≥ [[PIPE6_MIN_SHARED]] distinct [[PIPE6_NGRAM]]-gram
    * shingles with ANY test-split content is held out of training.
    * Width is the discriminating knob, MEASURED on the gate corpus:
    * its 31-word vocabulary makes bigrams useless (every train doc
    * shares ≥7 — 100% quarantine) and 4-grams surgical (4 of 408
    * docs, the planted cross-split near-dups, one at 91 shared
    * shingles); production picks 8–13-gram windows by the same
    * measurement (the GPT-3/PaLM decontamination convention). */
  private[graft] val PIPE6_NGRAM = 4
  private[graft] val PIPE6_MIN_SHARED = 3

  /** Broadcast gate for pipe6's kernel contamination probe: the test
    * split's distinct shingle keys collect + broadcast only under
    * this many longs (8M × 8 B = 64 MB — the GraftSession broadcast
    * posture). Int because it bounds a limit(): the probe collects at
    * most max+1 keys, so the driver never holds an ungated set. */
  private[graft] val PIPE6_BROADCAST_MAX_KEYS: Int = 8 << 20

  /** pipe6 — decontaminated split: x8 ANSWERS "which eval docs leak
    * into train"; this op ACTS on the reverse direction — quarantine
    * the TRAIN docs (sm2's 0–79 hash buckets) that share ≥
    * [[PIPE6_MIN_SHARED]] distinct [[PIPE6_NGRAM]]-gram shingles
    * with the test split (sm2's 90–99), because the fix a pipeline
    * ships is "remove them from training", never "edit the
    * benchmark". Output is the per-source quarantine census
    * (n_train, n_quarantined, kept_ppm) — the decontamination report
    * attached to a data card. Same buckets as sm2/x8, so the
    * operators agree by construction.
    *
    * Plan at 100 TB: two pruned hash-filtered scans (the x8
    * adjudication — train and test splits are disjoint row subsets);
    * the test side reduces to DISTINCT shingles (vocabulary-sized);
    * the train side explodes once, left-probes the test shingles, and
    * partial-aggregates to (doc, hits) then (source, census) —
    * explode_outer keeps shingle-less docs in the census. The join
    * key is the 8-byte md5-long of the shingle, NOT the multi-word
    * string (the d2/x13 shingle-key convention, VERDICT r10 #2): at
    * sf0.1 AQE broadcasts the test side either way, but past
    * broadcast size the fallback SMJ exchanges Θ(train tokens) rows —
    * narrow keys cut that exchange ~5–10×. Census semantics are
    * unchanged (64-bit collisions are the accepted convention-wide
    * risk), so the string-keyed oracle still hash-matches. */
  /** pipe6's per-train-doc contamination counts (doc_id, source,
    * n_shared distinct test shingles) — ONE definition consumed by
    * the pipe6 census and pipe9's funnel (the anti-drift rule).
    * Memoized + checkpointed — see [[perDocMemo]]. */
  private def pipe6Hits(s: SparkSession, d: String): DataFrame =
    Tables.memoGetOrBuild(hitsMemo, s, d,
      Tables.versionStamp(d, "documents"))(
      computePipe6Hits(s, d))

  /** Returns the per-doc hit relation ALREADY eagerly checkpointed:
    * the gate scratch (the persisted test-shingle set, the broadcast
    * key array) releases in here, right after the checkpoint
    * materializes — releasing in the memo wrapper would leak it when
    * a caller reaches this directly (ADVICE r15: the broadcast was
    * never destroyed — up to 64 MB per executor for the session —
    * and the fallback path recomputed the test distinct twice). */
  private def computePipe6Hits(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    import s.implicits._
    import graft.functions.Fns.wordShingleHashesLocal
    // shingle + hash in a TYPED KERNEL, not the declarative
    // wordShingles HOF: n-gram construction and md5 over every train
    // token window is pure dense hashing, which interpreted
    // higher-order expressions evaluate ~10× slower (the
    // buildSignatures boundary, measured again here r13: the HOF form
    // was 5.2 s of the 6.7 s memo line at sf0.1). Local mirrors keep
    // byte-lockstep with the oracle SQL's string md5.
    def side(lo: Int, hi: Int) = {
      val base = Tables.documents(s, d)
        .filter(md5Long(col("doc_id")) % 100 >= lo &&
          md5Long(col("doc_id")) % 100 < hi)
        .select(col("doc_id"), col("source"), col("text"))
      // kernel stages declare their parallelism (the buildSignatures
      // rule: a narrow parquet scan would serialize the hashing) —
      // but only when the scan can't already feed it (the pipe5
      // conditional-spread rule: a corpus-scale scan carries enough
      // splits and must not round-robin full document text)
      Tables.spreadIfNarrow(s, base)
        .as[(Long, String, String)]
        .mapPartitions(_.map { case (id, src, text) =>
          // fused shingle+hash (r16): digests token bytes directly —
          // no intermediate shingle String; set-identical to
          // wordShinglesLocal(text, n).map(md5LongLocal) (FnsSpec)
          (id, src, wordShingleHashesLocal(text, PIPE6_NGRAM))
        })
        .toDF("doc_id", "source", "shk")
    }
    // the test split's distinct shingle keys, persisted across gate
    // probe + whichever branch runs (ADVICE r15: the limit-probe
    // path materialized this distinct once for the collect and the
    // past-the-gate path recomputed it for the join)
    val testSh = side(90, 100)
      .select(explode(col("shk")).as("shk")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Two physical shapes of one algorithm, size-gated (the d2/d5
    // enforced-gate discipline). The per-doc contamination count is a
    // function of ONE doc's (distinct — wordShinglesLocal dedups,
    // matching the oracle's list_distinct) shingle set and the test
    // split's distinct key SET, so when that set fits an executor it
    // broadcasts as a sorted long array and every train doc scores
    // IN the scan kernel — zero exchanges, no explode, no re-group
    // (r15: the explode/join/groupBy form shuffled ~|train shingles|
    // rows to recompute a per-doc scalar). The count gate bounds
    // driver memory BEFORE any collect: past the gate — a 100 TB
    // corpus's test split — the explode/join/groupBy form runs
    // unchanged and nothing key-sized ever reaches the driver.
    val nKeys = testSh.count() // also materializes the persist
    val hits =
      if (nKeys <= PIPE6_BROADCAST_MAX_KEYS) {
        val probe = testSh.as[Long].collect() // cache read, gated size
        java.util.Arrays.sort(probe)
        val bc = s.sparkContext.broadcast(probe)
        val out = side(0, 80).as[(Long, String, Seq[Long])]
          .mapPartitions { it =>
            val ks = bc.value
            it.map { case (id, src, shk) =>
              var n = 0L
              shk.foreach { k =>
                if (java.util.Arrays.binarySearch(ks, k) >= 0) n += 1
              }
              (id, src, n)
            }
          }
          .toDF("doc_id", "source", "n_shared")
          .localCheckpoint(true)
        // the checkpoint owns the blocks now; the 64 MB key array
        // must not outlive the build on every executor
        bc.destroy()
        out
      } else {
        side(0, 80)
          .select(col("doc_id"), col("source"),
            explode_outer(col("shk")).as("shk"))
          .join(testSh.withColumn("hit", lit(1L)), Seq("shk"), "left")
          .groupBy(col("doc_id"), col("source"))
          .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L))
            .as("n_shared"))
          .localCheckpoint(true)
      }
    testSh.unpersist(false)
    hits
  }

  private def pipe6(s: SparkSession, d: String): DataFrame =
    pipe6Hits(s, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_train"),
        sum(when(col("n_shared") >= PIPE6_MIN_SHARED, 1L).otherwise(0L))
          .as("n_quarantined"))
      .select(col("source"), col("n_train"), col("n_quarantined"),
        expr("(1000000 * (n_train - n_quarantined)) div n_train")
          .as("kept_ppm"))

  /** pipe7's token budget: the target training-mix size the per-source
    * quotas must sum to EXACTLY. Deliberately well under the corpus
    * token mass at every sf (≈28k/271k tokens) so pipe8's greedy
    * cutoff is EXERCISED — a budget the corpus can't fill would make
    * the fill op select everything and measure nothing. */
  private[graft] val PIPE7_BUDGET = 10000L

  /** pipe7 — token-budget apportionment (Hamilton / largest-remainder):
    * split a fixed [[PIPE7_BUDGET]]-token training budget across
    * sources proportionally to their measured token mass, exactly —
    * floor quotas first, then the leftover tokens go one each to the
    * largest remainders (ties broken by source name). This is the
    * final assembly step of a training-mix pipeline (sm3/sm6 decide
    * the WEIGHTS; this turns weights into integer token quotas a
    * sampler can execute), and the largest-remainder rule is why
    * Σ alloc = budget holds as an identity rather than drifting by
    * |sources| rounding errors.
    *
    * Exactness/domains: all integer. budget·n_tokens stays inside
    * BIGINT while the corpus holds < 9.2·10¹⁴ tokens (budget = 10⁴);
    * past that, pre-scale n_tokens by a power of two before the
    * products — remainder ORDER is preserved, which is all the rule
    * consumes (the att2/emb5 domain-pinning convention).
    *
    * Scale shape: one pruned scan partial-aggregates to the
    * |sources|-row mass relation; the quota arithmetic is two window
    * passes over those ≤20 rows (sm6's one-relation window discipline
    * — a separate agg+crossJoin would re-plan the counts subtree per
    * consumer). Nothing after the first agg depends on volume. */
  private def pipe7(s: SparkSession, d: String): DataFrame =
    pipe7Quotas(s, d)

  /** THE pipe7 quota relation (source, n_tokens, alloc_tokens) —
    * pipe8 fills exactly these quotas (one definition, two
    * consumers; the x2Scored anti-drift rule). */
  private[operators] def pipe7Quotas(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    val byRem = Window.orderBy(col("rem").desc, col("source").asc)
    Tables.documents(s, d)
      .select(col("source"), size(toks(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
      .withColumn("tot", sum(col("n_tokens")).over(all))
      .withColumn("fl", expr(s"($PIPE7_BUDGET * n_tokens) div tot"))
      .withColumn("rem", expr(s"($PIPE7_BUDGET * n_tokens) % tot"))
      .withColumn("short", lit(PIPE7_BUDGET) - sum(col("fl")).over(all))
      .withColumn("rnk", row_number().over(byRem))
      .select(col("source"), col("n_tokens"),
        (col("fl") + when(col("rnk") <= col("short"), 1L).otherwise(0L))
          .as("alloc_tokens"))
  }

  /** pipe8 — budget fill: pipe7 decides HOW MANY tokens each source
    * contributes; this decides WHICH documents — within each source,
    * docs are taken in (x2 quality DESC, doc_id) order while the
    * running token sum stays inside the source's quota (greedy
    * prefix, whole docs only — the knapsack-greedy every mix
    * assembler ships). Both inputs are the REGISTERED definitions
    * ([[graft.operators.TextOps.x2Scored]], [[pipe7Quotas]]), so the
    * fill can never drift from the scores or quotas it claims to
    * apply. Census per source: docs considered/selected, tokens
    * used, the quota, and the fill ratio (under-fill is structural —
    * the greedy stops at the last whole doc that fits).
    *
    * Scale shape: one scored scan + the |sources|-row quota
    * broadcast; the running sum is ONE source-partitioned window
    * (explicit ROWS frame — no cross-partition state), and the
    * census partial-aggregates to |sources| rows. The quota pass
    * adds pipe7's one token-mass scan. */
  private def pipe8(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextOps.x2Scored(s, d)
      .select(col("doc_id"), col("source"), col("nt"), col("quality"))
      .withColumn("cum", sum(col("nt")).over(w))
      .join(broadcast(pipe7Quotas(s, d)
        .select(col("source"), col("alloc_tokens"))), Seq("source"))
      .withColumn("keep", col("cum") <= col("alloc_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("keep"), col("nt")).otherwise(0L)).as("tokens_used"),
        max(col("alloc_tokens")).as("alloc_tokens"))
      .select(col("source"), col("n_docs"), col("n_selected"),
        col("tokens_used"), col("alloc_tokens"),
        expr("CASE WHEN alloc_tokens = 0 THEN NULL " +
          "ELSE (1000000 * tokens_used) div alloc_tokens END")
          .as("fill_ppm"))
  }

  /** pipe9 — the train-assembly funnel census: the one table every
    * pretraining data card leads with — how many documents (and how
    * much token mass) survive each curation stage, cumulatively:
    * s0_raw (sm2's train buckets) → s1_quality (pipe5's five Gopher
    * rules) → s2_exact_dedup (d1's content fingerprint, min doc_id
    * kept, ranked AMONG quality survivors — funnel order is the
    * semantics) → s3_decontam (pipe6's test-split quarantine rule).
    * Every stage verdict comes from the REGISTERED relation
    * ([[pipe5PerDoc]], [[pipe6Hits]], pipe1's fingerprint rule) — the
    * pipe8 anti-drift rule: this report cannot disagree with what the
    * gates actually do, because it IS them.
    *
    * Scale shape: the quality and contamination verdicts come from
    * the MEMOIZED checkpoints ([[perDocMemo]]) shared with
    * pipe5/pipe6 — pipe9's own work is one fingerprint projection
    * scan, the fp-keyed dedup-rank exchange, two narrow verdict
    * joins, and ONE aggregate to a single row stack-unpivoted to 4
    * stage rows. Nothing after the per-doc verdicts depends on
    * volume, and the upstream passes are paid once per corpus
    * version, not once per report. */
  private def pipe9(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val per = Tables.documents(s, d)
      .filter(md5Long(col("doc_id")) % 100 < 80)
      .select(col("doc_id"), md5Long(lower(trim(col("text")))).as("fp"))
      .join(pipe5PerDoc(s, d), Seq("doc_id"))
      .select(col("doc_id"), col("fp"), col("words"),
        (col("f1") || col("f2") || col("f3") || col("f4") || col("f5"))
          .as("qfail"))
      .persist(StorageLevel.MEMORY_AND_DISK) // 2 consumers: rank + census
    val ranked = per.filter(!col("qfail"))
      .withColumn("krn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)))
      .select(col("doc_id"), col("krn"))
    val verdicts = per
      .join(ranked, Seq("doc_id"), "left")
      .join(pipe6Hits(s, d).select(col("doc_id"),
        (col("n_shared") >= PIPE6_MIN_SHARED).as("dirty")),
        Seq("doc_id"), "left")
      .select(col("words"), (!col("qfail")).as("s1"),
        coalesce(col("krn") === 1, lit(false)).as("s2"),
        (coalesce(col("krn") === 1, lit(false))
          && !coalesce(col("dirty"), lit(false))).as("s3"))
    verdicts
      .agg(count(lit(1)).as("n0"), sum(col("words")).as("t0"),
        sum(when(col("s1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("s1"), col("words")).otherwise(0L)).as("t1"),
        sum(when(col("s2"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("s2"), col("words")).otherwise(0L)).as("t2"),
        sum(when(col("s3"), 1L).otherwise(0L)).as("n3"),
        sum(when(col("s3"), col("words")).otherwise(0L)).as("t3"))
      .select(col("n0"),
        expr("""stack(4, 's0_raw', n0, t0, 's1_quality', n1, t1,
          's2_exact_dedup', n2, t2, 's3_decontam', n3, t3)
          AS (stage, n_docs, n_tokens)"""))
      .select(col("stage"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_docs) div n0").as("kept_ppm"))
  }

  /** pipe10's threshold sweep upper bound — brackets the served
    * [[PIPE6_MIN_SHARED]] (=3) from both sides. */
  private[graft] val PIPE10_MAX_T = 8

  /** pipe10 — the [[PIPE6_MIN_SHARED]] quarantine-threshold knob
    * MEASURED (VERDICT r11 #7, the g12/d16 measured-assumption
    * pattern): for every candidate threshold 1..[[PIPE10_MAX_T]], how
    * many train docs would decontamination quarantine? The curve's
    * shape is the decision evidence — a cliff below the served value
    * means the threshold is doing real discrimination (1 shared
    * shingle is chance, ≥3 is contamination); a flat curve would mean
    * the knob is dead weight. The served threshold appears as its own
    * row, so the data card shows WHERE on the curve the pipeline
    * sits (and the replay spec asserts that row equals pipe6's
    * census totals — the anti-drift rule, measured edition).
    *
    * Scale shape: consumes the MEMOIZED [[pipe6Hits]] checkpoint
    * (zero corpus scans — the build is paid once, shared with
    * pipe6/pipe9), folds it to the ≤|distinct n_shared|-row
    * histogram, and sweeps thresholds over that histogram crossed
    * with an 8-row literal relation — the whole sweep is
    * corpus-size-free past the one shared build, the g12 "derive the
    * sweep from one pass" rule. */
  private def pipe10(s: SparkSession, d: String): DataFrame = {
    val hist = pipe6Hits(s, d)
      .groupBy(col("n_shared")).agg(count(lit(1)).as("nd"))
    val thr = s.range(1, PIPE10_MAX_T + 1).toDF("min_shared")
    hist.crossJoin(broadcast(thr))
      .groupBy(col("min_shared"))
      .agg(sum(col("nd")).as("n_train"),
        sum(when(col("n_shared") >= col("min_shared"), col("nd"))
          .otherwise(0L)).as("n_quarantined"))
      .select(col("min_shared"), col("n_train"), col("n_quarantined"),
        expr("(1000000 * n_quarantined) div n_train")
          .as("quarantined_ppm"))
  }

  /** pk2's sequence-length sweep — brackets pk1's served
    * [[PACK_BUDGET]] (=2048) from both sides. */
  private[graft] val PK2_LENS = Seq(256, 1024, 2048, 4096)

  /** pk2 — the context-length planning table (the knob-curve pattern
    * on pk1's axis): for each candidate sequence length, what does
    * the corpus cost under the two assembly strategies every trainer
    * chooses between — PAD (one doc per sequence, split oversized
    * docs: chunks = Σ ceil(nt/L), waste = unused capacity) vs PACK
    * (pk1's concat-and-chunk: sequences = ceil(Σnt/L), waste only in
    * the final sequence)? The pad-waste column is the argument for
    * packing, quantified per L on THIS corpus — at L=4096 with
    * ~50-500-token docs, padding burns >80% of capacity while
    * packing burns ~0 — and the served 2048 appears as its own row
    * (the d16/pipe10 discipline).
    *
    * Scale shape: ONE corpus scan reduces to a single row (count,
    * Σnt, one conditional ceil-sum per L — all partial-aggregated
    * map-side), then the |lens|-row stack and the waste arithmetic
    * are corpus-size-free. All integer (ceil via (n+L-1) div L);
    * 10⁶·capacity stays inside BIGINT while the corpus holds
    * < 9.2·10¹² tokens — past that, compute waste in per-mille (the
    * pipe7 domain-pinning convention). */
  private def pk2(s: SparkSession, d: String): DataFrame = {
    val chunkSums = PK2_LENS.map { l =>
      sum(expr(s"(nt + ${l - 1}) div $l")).as(s"ch$l")
    }
    Tables.documents(s, d)
      .select(size(toks(col("text"))).cast("long").as("nt"))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("nt")).as("n_tokens") +: chunkSums): _*)
      .select(col("n_docs"), col("n_tokens"), expr(
        s"""stack(${PK2_LENS.size}, ${PK2_LENS.map(l =>
          s"CAST($l AS BIGINT), ch$l").mkString(", ")})
           |AS (seq_len, n_chunks)""".stripMargin))
      .select(col("seq_len"), col("n_docs"), col("n_tokens"),
        col("n_chunks"),
        expr("""(1000000 * (n_chunks * seq_len - n_tokens))
          | div (n_chunks * seq_len)""".stripMargin).as("pad_waste_ppm"),
        expr("(n_tokens + seq_len - 1) div seq_len").as("packed_seqs"),
        expr("""(1000000 * (((n_tokens + seq_len - 1) div seq_len)
          |  * seq_len - n_tokens))
          | div (((n_tokens + seq_len - 1) div seq_len) * seq_len)"""
          .stripMargin).as("packed_waste_ppm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pk2_pad_curve" -> (pk2 _),
    "pipe10_decontam_curve" -> (pipe10 _),
    "pipe9_funnel" -> (pipe9 _),
    "pipe8_budget_fill" -> (pipe8 _),
    "pipe7_token_budget" -> (pipe7 _),
    "pipe6_decontam_split" -> (pipe6 _),
    "pipe5_gopher_rules" -> (pipe5 _),
    "imp1_loo_impact" -> (imp1 _),
    "cur1_curriculum" -> (cur1 _),
    "pipe4_domain_tilt" -> (pipe4 _),
    "pipe3_data_card" -> (pipe3 _),
    "pipe1_curation" -> (pipe1 _),
    "pipe2_chunk_pack" -> (pipe2 _),
    "pk1_sequence_pack" -> (pk1 _),
    "ck1_chunk_overlap" -> (ck1 _)
  )

  private val H = "('0x' || substr(md5(%s::VARCHAR),1,15))::BIGINT"

  /** The pipe5 oracle, generated from the same [[PIPE5_STOPS]] set
    * and rule thresholds as the engine. */
  private def pipe5OracleSql: String = {
    val stops = PIPE5_STOPS.map("'" + _ + "'").mkString(", ")
    s"""
      WITH tf AS (SELECT doc_id, tok, count(*) AS c FROM (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok
              FROM documents) GROUP BY 1, 2),
      per0 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS words,
                 CAST(max(c) AS BIGINT) AS max_tf,
                 count(*) AS n_types,
                 CAST(sum(CASE WHEN tok IN ($stops) THEN c ELSE 0 END)
                   AS BIGINT) AS n_stop
               FROM tf GROUP BY 1),
      per AS (SELECT p.doc_id,
                (words < 50 OR words > 500) AS f1,
                ((1000 * d.n_chars) // words < 3000
                  OR (1000 * d.n_chars) // words >= 8000) AS f2,
                (n_stop < 2) AS f3,
                ((1000 * max_tf) // words > 120) AS f4,
                ((1000 * n_types) // words < 300) AS f5
              FROM per0 p JOIN documents d ON p.doc_id = d.doc_id),
      agg AS (SELECT count(*) AS n_docs,
        CAST(sum(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
        CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS n4,
        CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS n5,
        CAST(sum(CASE WHEN f1 OR f2 OR f3 OR f4 OR f5 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_any
        FROM per),
      u AS (
        SELECT 'r1_word_count' AS rule, n1 AS n_fail, n_docs FROM agg
        UNION ALL SELECT 'r2_mean_word_len', n2, n_docs FROM agg
        UNION ALL SELECT 'r3_stopwords', n3, n_docs FROM agg
        UNION ALL SELECT 'r4_top_token', n4, n_docs FROM agg
        UNION ALL SELECT 'r5_ttr', n5, n_docs FROM agg
        UNION ALL SELECT 'any_rule', n_any, n_docs FROM agg)
      SELECT rule, n_fail, (1000000 * n_fail) // n_docs AS fail_ppm
      FROM u"""
  }

  val oracles: Map[String, String] = Map(
    // the funnel replayed stage by stage from the SAME rule SQL the
    // pipe5/pipe6/pipe1 oracles run: train buckets -> gopher rules ->
    // fingerprint dedup among quality survivors -> test-shingle
    // quarantine; census is cumulative with a shared raw denominator
    "pipe9_funnel" -> {
      val stops = PIPE5_STOPS.map("'" + _ + "'").mkString(", ")
      s"""
      WITH tr AS (SELECT doc_id, text, n_chars,
                    string_split(text, ' ') AS l
                  FROM documents
                  WHERE ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT
                    % 100 < 80),
      tf AS (SELECT doc_id, tok, count(*) AS c FROM (
               SELECT doc_id, unnest(l) AS tok FROM tr) GROUP BY 1, 2),
      per0 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS words,
                 CAST(max(c) AS BIGINT) AS max_tf, count(*) AS n_types,
                 CAST(sum(CASE WHEN tok IN ($stops) THEN c ELSE 0 END)
                   AS BIGINT) AS n_stop
               FROM tf GROUP BY 1),
      per AS (SELECT p.doc_id, words,
                (words < 50 OR words > 500
                 OR (1000 * t.n_chars) // words < 3000
                 OR (1000 * t.n_chars) // words >= 8000
                 OR n_stop < 2
                 OR (1000 * max_tf) // words > 120
                 OR (1000 * n_types) // words < 300) AS qfail
              FROM per0 p JOIN tr t ON p.doc_id = t.doc_id),
      dd AS (SELECT per.doc_id, row_number() OVER (
               PARTITION BY ('0x' || substr(md5(lower(trim(t.text))),1,15))::BIGINT
               ORDER BY per.doc_id) AS krn
             FROM per JOIN tr t ON per.doc_id = t.doc_id
             WHERE NOT qfail),
      sh AS (SELECT doc_id, list_distinct(list_transform(
               generate_series(1, len(l) - ${PIPE6_NGRAM - 1}),
               i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))
               AS sh FROM tr),
      test AS (SELECT DISTINCT unnest(sh) AS sh
               FROM (SELECT list_distinct(list_transform(
                       generate_series(1, len(l) - ${PIPE6_NGRAM - 1}),
                       i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2]
                         || ' ' || l[i+3])) AS sh
                     FROM (SELECT string_split(text, ' ') AS l
                           FROM documents
                           WHERE ('0x' || substr(md5(doc_id::VARCHAR),1,15))
                             ::BIGINT % 100 >= 90))),
      hits AS (SELECT x.doc_id, count(*) AS n_shared
               FROM (SELECT doc_id, unnest(sh) AS sh FROM sh) x
               JOIN test USING (sh) GROUP BY 1),
      v AS (SELECT per.words, NOT per.qfail AS s1,
              coalesce(dd.krn = 1, FALSE) AS s2,
              coalesce(dd.krn = 1, FALSE)
                AND NOT coalesce(hits.n_shared >= $PIPE6_MIN_SHARED,
                  FALSE) AS s3
            FROM per LEFT JOIN dd ON per.doc_id = dd.doc_id
              LEFT JOIN hits ON per.doc_id = hits.doc_id),
      agg AS (SELECT count(*) AS n0, CAST(sum(words) AS BIGINT) AS t0,
                CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                CAST(sum(CASE WHEN s1 THEN words ELSE 0 END) AS BIGINT) AS t1,
                CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                CAST(sum(CASE WHEN s2 THEN words ELSE 0 END) AS BIGINT) AS t2,
                CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
                CAST(sum(CASE WHEN s3 THEN words ELSE 0 END) AS BIGINT) AS t3
              FROM v),
      u AS (
        SELECT 's0_raw' AS stage, n0 AS n_docs, t0 AS n_tokens, n0 FROM agg
        UNION ALL SELECT 's1_quality', n1, t1, n0 FROM agg
        UNION ALL SELECT 's2_exact_dedup', n2, t2, n0 FROM agg
        UNION ALL SELECT 's3_decontam', n3, t3, n0 FROM agg)
      SELECT stage, n_docs, n_tokens,
        (1000000 * n_docs) // n0 AS kept_ppm
      FROM u"""
    },
    // x2's quality expression and pipe7's quota CTEs verbatim, the
    // same (quality DESC, doc_id) greedy order with an explicit ROWS
    // frame, whole-doc prefix fill
    "pipe8_budget_fill" -> s"""
      WITH t AS (SELECT doc_id, source, n_chars,
                   string_split(text, ' ') AS l
                 FROM documents),
      b AS (SELECT doc_id, source, len(l)::BIGINT AS nt,
        floor((floor(least(n_chars / 500.0, 1.0)*1000000 + 0.5)/1000000*0.5
          + floor(len(list_filter(l, x ->
              list_contains(${graft.operators.TextOps.inList(graft.operators.TextOps.EN)}, x)))::DOUBLE
              / len(l)*1000000 + 0.5)/1000000*0.3
          + least(floor(list_aggregate(list_transform(l, x -> length(x)),
              'sum')::DOUBLE / len(l)*1000000 + 0.5)/1000000/8.0, 1.0)*0.2)
          *1000000 + 0.5)/1000000 AS quality
        FROM t),
      c AS (SELECT source, CAST(sum(nt) AS BIGINT) AS n_tokens
            FROM b GROUP BY 1),
      w AS (SELECT source, n_tokens,
              CAST(sum(n_tokens) OVER () AS BIGINT) AS tot FROM c),
      f AS (SELECT source, n_tokens,
              ($PIPE7_BUDGET * n_tokens) // tot AS fl,
              ($PIPE7_BUDGET * n_tokens) % tot AS rem FROM w),
      r AS (SELECT f.*,
              $PIPE7_BUDGET - CAST(sum(fl) OVER () AS BIGINT) AS short,
              row_number() OVER (ORDER BY rem DESC, source) AS rnk
            FROM f),
      qa AS (SELECT source,
               CAST(fl + CASE WHEN rnk <= short THEN 1 ELSE 0 END
                 AS BIGINT) AS alloc_tokens
             FROM r),
      s AS (SELECT b.source, b.nt, qa.alloc_tokens,
              sum(b.nt) OVER (PARTITION BY b.source
                ORDER BY b.quality DESC, b.doc_id
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM b JOIN qa USING (source))
      SELECT source, count(*) AS n_docs,
        CAST(sum(CASE WHEN cum <= alloc_tokens THEN 1 ELSE 0 END)
          AS BIGINT) AS n_selected,
        CAST(sum(CASE WHEN cum <= alloc_tokens THEN nt ELSE 0 END)
          AS BIGINT) AS tokens_used,
        max(alloc_tokens) AS alloc_tokens,
        CASE WHEN max(alloc_tokens) = 0 THEN NULL
          ELSE (1000000 * CAST(sum(CASE WHEN cum <= alloc_tokens
            THEN nt ELSE 0 END) AS BIGINT)) // max(alloc_tokens) END
          AS fill_ppm
      FROM s GROUP BY 1""",
    // same floor quotas, same largest-remainder top-up with the
    // (rem DESC, source) tie order
    "pipe7_token_budget" -> s"""
      WITH c AS (SELECT source,
          CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1),
      w AS (SELECT source, n_tokens,
              CAST(sum(n_tokens) OVER () AS BIGINT) AS tot FROM c),
      f AS (SELECT source, n_tokens,
              ($PIPE7_BUDGET * n_tokens) // tot AS fl,
              ($PIPE7_BUDGET * n_tokens) % tot AS rem FROM w),
      r AS (SELECT f.*,
              $PIPE7_BUDGET - CAST(sum(fl) OVER () AS BIGINT) AS short,
              row_number() OVER (ORDER BY rem DESC, source) AS rnk
            FROM f)
      SELECT source, n_tokens,
        CAST(fl + CASE WHEN rnk <= short THEN 1 ELSE 0 END AS BIGINT)
          AS alloc_tokens
      FROM r""",
    // x8's bucket CTEs with the direction reversed and the measured
    // 4-gram shingle width; the LEFT-join census keeps shingle-less
    // docs, same ≥3 quarantine rule and ppm floor-division
    // one token-count CTE, per-L ceil-sums, UNION-ALL unpivot — the
    // same integer ceil form ((n + L - 1) // L) as the engine
    "pk2_pad_curve" -> s"""
      WITH t AS (SELECT len(string_split(text, ' ')) AS nt FROM documents),
      c AS (SELECT count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS n_tokens,
        ${PK2_LENS.map(l =>
          s"CAST(sum((nt + ${l - 1}) // $l) AS BIGINT) AS ch$l")
          .mkString(", ")}
        FROM t),
      u AS (${PK2_LENS.map(l =>
        s"SELECT n_docs, n_tokens, CAST($l AS BIGINT) AS seq_len, ch$l AS n_chunks FROM c")
        .mkString(" UNION ALL ")})
      SELECT seq_len, n_docs, n_tokens, n_chunks,
        (1000000 * (n_chunks * seq_len - n_tokens))
          // (n_chunks * seq_len) AS pad_waste_ppm,
        (n_tokens + seq_len - 1) // seq_len AS packed_seqs,
        (1000000 * (((n_tokens + seq_len - 1) // seq_len) * seq_len
          - n_tokens))
          // (((n_tokens + seq_len - 1) // seq_len) * seq_len)
          AS packed_waste_ppm
      FROM u""",
    // pipe6's hits CTE swept over thresholds 1..PIPE10_MAX_T — the
    // engine derives the same sweep from the memoized hits relation
    "pipe10_decontam_curve" -> s"""
      WITH s AS (SELECT doc_id, source,
        ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100 AS bkt,
        list_distinct(list_transform(
          generate_series(1, len(l) - ${PIPE6_NGRAM - 1}),
          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))
          AS sh
        FROM (SELECT doc_id, source, string_split(text,' ') AS l
              FROM documents)),
      test AS (SELECT DISTINCT unnest(sh) AS sh FROM s WHERE bkt >= 90),
      tr AS (SELECT doc_id, unnest(sh) AS sh FROM s WHERE bkt < 80),
      hits AS (SELECT tr.doc_id, count(*) AS n_shared
               FROM tr JOIN test USING (sh) GROUP BY 1),
      perdoc AS (SELECT coalesce(hits.n_shared, 0) AS n_shared
                 FROM s LEFT JOIN hits USING (doc_id) WHERE s.bkt < 80),
      thr AS (SELECT unnest(generate_series(1, $PIPE10_MAX_T))
                AS min_shared)
      SELECT CAST(min_shared AS BIGINT) AS min_shared,
        count(*) AS n_train,
        CAST(sum(CASE WHEN n_shared >= min_shared THEN 1 ELSE 0 END)
          AS BIGINT) AS n_quarantined,
        CAST((1000000 * sum(CASE WHEN n_shared >= min_shared
          THEN 1 ELSE 0 END)) // count(*) AS BIGINT) AS quarantined_ppm
      FROM perdoc CROSS JOIN thr GROUP BY 1""",
    "pipe6_decontam_split" -> s"""
      WITH s AS (SELECT doc_id, source,
        ('0x' || substr(md5(doc_id::VARCHAR),1,15))::BIGINT % 100 AS bkt,
        list_distinct(list_transform(
          generate_series(1, len(l) - ${PIPE6_NGRAM - 1}),
          i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]))
          AS sh
        FROM (SELECT doc_id, source, string_split(text,' ') AS l
              FROM documents)),
      test AS (SELECT DISTINCT unnest(sh) AS sh FROM s WHERE bkt >= 90),
      tr AS (SELECT doc_id, unnest(sh) AS sh FROM s WHERE bkt < 80),
      hits AS (SELECT tr.doc_id, count(*) AS n_shared
               FROM tr JOIN test USING (sh) GROUP BY 1),
      census AS (SELECT s.source,
                   coalesce(hits.n_shared, 0) AS n_shared
                 FROM s LEFT JOIN hits USING (doc_id) WHERE s.bkt < 80)
      SELECT source, count(*) AS n_train,
        CAST(sum(CASE WHEN n_shared >= $PIPE6_MIN_SHARED THEN 1 ELSE 0
          END) AS BIGINT) AS n_quarantined,
        CAST((1000000 * (count(*) - sum(CASE WHEN n_shared >=
          $PIPE6_MIN_SHARED THEN 1 ELSE 0 END))) // count(*)
          AS BIGINT) AS kept_ppm
      FROM census GROUP BY source""",
    // generated from the engine's own stopword set + thresholds
    "pipe5_gopher_rules" -> pipe5OracleSql,
    // the same (count, sum) pairs and grand totals; BIGINT / BIGINT
    // is DOUBLE division in both engines, parenthesization identical
    "imp1_loo_impact" -> """
      WITH c AS (SELECT source, count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
                 FROM documents GROUP BY 1),
      t AS (SELECT *, CAST(sum(n_docs) OVER () AS BIGINT) AS tn,
              CAST(sum(sum_chars) OVER () AS BIGINT) AS ts FROM c)
      SELECT source, n_docs,
        CASE WHEN tn = n_docs THEN NULL
        ELSE floor(((ts - sum_chars) / (tn - n_docs) - ts / tn)
               * 1000000 + 0.5) / 1000000 END AS loo_delta
      FROM t""",
    // x2's oracle embedded verbatim; quantile_cont == Spark's exact
    // percentile (the w8 precedent), cut-points floor-rounded on both
    // sides before binning
    "cur1_curriculum" -> s"""
      WITH xq AS (${TextOps.oracles("x2_quality_score")}),
      c AS (SELECT quantile_cont(quality, [0.25, 0.5, 0.75]) AS c FROM xq),
      cuts AS (SELECT list_transform(c, x ->
                 floor(x*1000000 + 0.5)/1000000) AS c FROM c),
      bands AS (SELECT i AS phase,
          CASE WHEN i = 0 THEN '-infinity'::DOUBLE ELSE c[i] END AS lo,
          CASE WHEN i = 3 THEN 'infinity'::DOUBLE ELSE c[i+1] END AS hi
        FROM cuts, generate_series(0, 3) t(i))
      SELECT CAST(phase AS INT) AS phase, count(*) AS n_docs,
        min(quality) AS q_lo, max(quality) AS q_hi
      FROM xq JOIN bands ON quality >= lo AND quality < hi
      GROUP BY 1""",
    // each constituent's oracle SQL embedded verbatim — the composed
    // report cannot drift from what dsir1/d11/tok1 individually serve
    "pipe4_domain_tilt" -> s"""
      WITH sel0 AS (${SampleOps.oracles("dsir1_importance")}),
      cln AS (${DedupOps.oracles("d11_line_dedup")}),
      tok AS (${RetrievalOps.oracles("tok1_bpe_apply")})
      SELECT sel0.source, count(*) AS n_docs,
        CAST(sum(cln.n_dropped) AS BIGINT) AS lines_dropped,
        CAST(sum(cln.clean_len) AS BIGINT) AS clean_chars,
        CAST(sum(tok.bpe_tokens) AS BIGINT) AS bpe_tokens
      FROM cln JOIN sel0 USING (doc_id) JOIN tok USING (doc_id)
      GROUP BY 1""",
    "pipe1_curation" -> s"""
      WITH g AS (SELECT doc_id, source, text FROM documents
                 WHERE len(string_split(text, ' ')) BETWEEN 5 AND 1000),
      dd AS (SELECT doc_id, source, row_number() OVER (
               PARTITION BY ('0x' || substr(md5(lower(trim(text))),1,15))::BIGINT
               ORDER BY doc_id) AS krn FROM g),
      sp AS (SELECT doc_id, source,
               CASE WHEN ${H.format("doc_id")} % 100 < 80 THEN 'train'
                    WHEN ${H.format("doc_id")} % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
             FROM dd WHERE krn = 1),
      r AS (SELECT source, split, doc_id, row_number() OVER (
              PARTITION BY source, split
              ORDER BY ${H.format("doc_id")}, doc_id) AS rn FROM sp)
      SELECT source, split, doc_id, rn FROM r WHERE rn <= 40""",
    "pk1_sequence_pack" -> s"""
      WITH t AS (SELECT doc_id,
               len(string_split(text, ' '))::BIGINT AS n_tok,
               ${H.format("doc_id")} AS h FROM documents),
      s AS (SELECT doc_id, n_tok, h, h % 8 AS shard FROM t),
      c AS (SELECT shard, doc_id, n_tok,
              CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM s)
      SELECT shard, doc_id, n_tok,
        off // 2048 AS pack_id, off % 2048 AS pack_off,
        ((off + n_tok - 1) // 2048) <> (off // 2048) AS crosses_pack
      FROM c""",
    "pipe2_chunk_pack" -> s"""
      WITH g AS (SELECT doc_id, text FROM documents
                 WHERE len(string_split(text,' ')) BETWEEN 5 AND 1000),
      dd AS (SELECT doc_id, text, row_number() OVER (
               PARTITION BY ('0x' || substr(md5(lower(trim(text))),1,15))::BIGINT
               ORDER BY doc_id) AS krn FROM g),
      t AS (SELECT doc_id, string_split(text,' ') AS l FROM dd WHERE krn = 1),
      sx AS (SELECT doc_id, l,
               unnest(generate_series(0, greatest(len(l)-1, 0), 48))
                 AS start_tok FROM t),
      c AS (SELECT doc_id, start_tok // 48 AS chunk_idx,
              len(l[start_tok+1 : start_tok+64])::BIGINT AS n_tok FROM sx),
      k AS (SELECT doc_id, chunk_idx, n_tok,
              ${H.format("doc_id::VARCHAR || ':' || chunk_idx::VARCHAR")} AS h FROM c),
      o AS (SELECT doc_id, chunk_idx, n_tok, h % 8 AS shard,
              CAST(coalesce(sum(n_tok) OVER (PARTITION BY h % 8
                ORDER BY h, doc_id, chunk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM k)
      SELECT shard, doc_id, chunk_idx, n_tok,
        off // 2048 AS pack_id, off % 2048 AS pack_off
      FROM o""",
    "ck1_chunk_overlap" -> """
      WITH t AS (SELECT doc_id, string_split(text,' ') AS l FROM documents),
      s AS (SELECT doc_id, l,
              unnest(generate_series(0, greatest(len(l)-1, 0), 48))
                AS start_tok FROM t),
      c AS (SELECT doc_id, start_tok // 48 AS chunk_idx, start_tok,
              l[start_tok+1 : start_tok+64] AS ch FROM s)
      SELECT doc_id, chunk_idx, start_tok, len(ch)::BIGINT AS n_tok,
        ('0x' || substr(md5(array_to_string(ch, ' ')),1,15))::BIGINT AS chunk_fp
      FROM c""",
    "pipe3_data_card" -> s"""
      WITH t AS (SELECT source, lang, n_chars, string_split(text,' ') AS l,
                   md5(text) AS fp FROM documents),
      b AS (SELECT source, lang, n_chars, len(l) AS ws_tokens, fp,
              floor(least(n_chars/500.0, 1.0)*1000000 + 0.5)/1000000
                AS len_score,
              floor(len(list_filter(l, x ->
                  list_contains(${TextOps.inList(TextOps.EN)}, x)))::DOUBLE
                / len(l)*1000000 + 0.5)/1000000 AS stop_ratio,
              floor(list_aggregate(list_transform(l, x -> length(x)),
                  'sum')::DOUBLE / len(l)*1000000 + 0.5)/1000000
                AS mean_tok_len
            FROM t),
      q AS (SELECT source, lang, n_chars, ws_tokens, fp,
              CAST(floor((len_score*0.5 + stop_ratio*0.3
                + least(mean_tok_len/8.0, 1.0)*0.2)*1000000 + 0.5)
                AS BIGINT) AS quality_ppm
            FROM b),
      f AS (SELECT *, CASE WHEN count(*) OVER (PARTITION BY fp) > 1
                           THEN 1 ELSE 0 END AS is_dup FROM q),
      p AS (SELECT source, lang, count(*) AS n,
              CAST(sum(ws_tokens) AS BIGINT) AS tok,
              CAST(sum(n_chars) AS BIGINT) AS chars,
              CAST(sum(quality_ppm) AS BIGINT) AS q_ppm,
              CAST(sum(is_dup) AS BIGINT) AS dups
            FROM f GROUP BY source, lang)
      SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
        count(*) AS n_langs,
        floor(max(n)::DOUBLE/sum(n)*1000000 + 0.5)/1000000
          AS top_lang_share,
        CAST(sum(tok) AS BIGINT) AS total_tokens,
        floor(sum(tok)::DOUBLE/sum(n)*10000 + 0.5)/10000 AS mean_tokens,
        floor(sum(chars)::DOUBLE/sum(n)*10000 + 0.5)/10000 AS mean_chars,
        floor(sum(q_ppm)::DOUBLE/sum(n)/1000000.0*10000 + 0.5)/10000
          AS mean_quality,
        floor(sum(dups)::DOUBLE/sum(n)*1000000 + 0.5)/1000000 AS dup_rate
      FROM p GROUP BY source"""
  )
}
