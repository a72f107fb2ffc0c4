package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.functions.Fns.roundFp
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming faces of the engine's event-time operators
  * (the batch equivalents are oracle-checked in
  * graft.operators.WindowOps — same expressions, bounded input).
  *
  * All transforms are source-agnostic `DataFrame => DataFrame`, so the
  * same code runs over `readStream` (kafka/files at scale) and over a
  * MemoryStream in tests. Watermarks bound state: 2 hours of event
  * lateness, after which window state is evicted — the property that
  * keeps a 100 TB/day stream's state finite.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  case class UserRunning(user_id: Long, n_events: Long, sum_value: Double)

  /** Tumbling 1-hour counts per event type (streaming w1). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes per event type
    * (streaming w5). Each event lands in width/slide = 2 windows —
    * Spark expands the multiplicity BEFORE the shuffle, so state per
    * key stays one aggregate row per open (window, type) pair and the
    * watermark evicts both copies together. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Per-user session windows, 30-minute gap (streaming w3). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), roundFp(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Custom keyed state: running per-user totals via
    * `mapGroupsWithState` — the KeyValueGroupedDataset state API the
    * reference-parity surface doesn't need but a streaming pipeline
    * does (counters, rate limits, dedup state live here). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          val (n, s) = batch.foldLeft((prev.n_events, prev.sum_value)) {
            case ((cn, cs), e) => (cn + 1, cs + e.value)
          }
          // state keeps the EXACT accumulator — rounding state each
          // micro-batch would compound error across batches; round only
          // on emit
          state.update(UserRunning(user, n, s))
          UserRunning(user, n, math.floor(s * 100 + 0.5) / 100)
      }
  }

  case class SessionAgg(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Buffered per-user events awaiting sessionization: (ts-micros,
    * value) pairs. Exact accumulators happen at emit time from the
    * buffer; nothing is rounded or aggregated in state. */
  case class EventBuffer(events: Seq[(Long, Double)])

  /** Custom sessionization via `flatMapGroupsWithState` +
    * EventTimeTimeout — the full-control state API (`session_window`
    * covers the fixed-gap case declaratively; this is where custom
    * session logic lives: dynamic gaps, session caps, enrichment at
    * emit). Semantics match w3: gap ≥ 30 min starts a new session,
    * session end = last event + gap.
    *
    * Correctness under disorder: allowed-lateness events can arrive in
    * LATER micro-batches with EARLIER timestamps — they can extend a
    * session backwards, merge two buffered sessions, or split an
    * eager-emitted one. So nothing is emitted until the event-time
    * watermark passes `max(buffered ts) + gap`: past that point any
    * future event is ≥ watermark > every buffered session's reach and
    * cannot alter the buffer's sessionization. State holds at most one
    * watermark-horizon (2 h) of a user's events; emission is
    * append-mode, each session exactly once — the same late-data
    * contract `session_window` itself provides.
    */
  def sessionizeCustom(events: Dataset[Event]): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapUs = 30L * 60 * 1000000
    // full-microsecond conversion: getTime carries only millis — the
    // sub-millisecond part lives in getNanos. Dropping it would shift
    // the gap comparison (and the emitted bounds) by up to 999 µs vs
    // the batch session_window (w3), which compares at full µs.
    def toUs(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos % 1000000) / 1000
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp((us / 1000000) * 1000)
      t.setNanos(((us % 1000000) * 1000).toInt)
      t
    }
    def sessions(user: Long, buf: Seq[(Long, Double)]): Iterator[SessionAgg] = {
      val sorted = buf.sorted
      val out = Seq.newBuilder[SessionAgg]
      var i = 0
      while (i < sorted.length) {
        var j = i
        var sum = sorted(i)._2
        while (j + 1 < sorted.length && sorted(j + 1)._1 - sorted(j)._1 < gapUs) {
          j += 1; sum += sorted(j)._2
        }
        out += SessionAgg(user,
          toTs(sorted(i)._1),
          toTs(sorted(j)._1 + gapUs),
          j - i + 1,
          // portable floor rounding, same as the batch w3 surface
          math.floor(sum * 100 + 0.5) / 100)
        i = j + 1
      }
      out.result().iterator
    }
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[EventBuffer]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark > max(ts) + gap: the buffer's sessionization is
            // final — emit everything, clear state
            val out = state.getOption.iterator.flatMap(b => sessions(user, b.events))
            state.remove()
            out
          } else {
            val buf = state.getOption.map(_.events).getOrElse(Seq.empty) ++
              batch.map(e => (toUs(e.ts), e.value))
            state.update(EventBuffer(buf))
            // round UP to whole millis so the timeout never fires before
            // watermark > max(ts) + gap at full µs resolution
            state.setTimeoutTimestamp((buf.map(_._1).max + gapUs + 999) / 1000)
            Iterator.empty
          }
      }
  }

  /** Streaming exact dedup — the streaming face of the batch d1
    * operator (content-hash dedup): fingerprint the payload, keep the
    * first arrival, drop re-deliveries. `dropDuplicatesWithinWatermark`
    * is the state-BOUNDED variant: fingerprint state is evicted once
    * the watermark passes, so a 100 TB/day stream holds only one
    * watermark-window of hashes, not the stream's history. Dedup key is
    * the 60-bit md5 fingerprint, never the payload itself — state size
    * is 8 bytes + key overhead per distinct document.
    */
  def dedupStream(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_fp",
        graft.functions.Fns.md5Long(lower(trim(col("text")))))
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("content_fp")

  /** Stream face of the sink surface (S2/S3 under a stream): every
    * micro-batch appends through the given [[graft.sinks.DocumentSink]]
    * — `MongoImportSink` makes this the streaming version of the
    * reference's load step, dumping mongoimport-ready Extended JSON
    * per batch. foreachBatch reuses the BATCH writer verbatim, so sink
    * semantics (field-name validation, canonical encoding, partition-
    * parallel files) are identical on both faces. The checkpoint gives
    * at-least-once per batch, so a failed/restarted micro-batch CAN
    * replay — each batch therefore lands on its own batch-id-scoped
    * subpath with overwrite, making the replay rewrite the same files
    * instead of appending duplicates (a plain append of UUID-named
    * part files would silently double the replayed batch's rows).
    * Downstream mongoimport globs the part files across the batch
    * dirs. */
  def sinkTo(df: DataFrame, sink: graft.sinks.DocumentSink, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(sink, batch, path, batchId)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** One micro-batch's write: batch-scoped subpath + overwrite = a
    * replayed batch id is idempotent (exposed for the spec to replay
    * a batch directly). */
  private[streaming] def writeBatch(sink: graft.sinks.DocumentSink,
      batch: DataFrame, path: String, batchId: Long): Unit =
    sink.write(batch, s"$path/batch=$batchId", overwrite = true)

  /** Watermarked stream-stream inner join: each left event pairs with
    * right events of the same user within the following hour. Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark can size and EVICT the join state — the only
    * stream-stream join shape that runs unbounded. */
  def joinWithinHour(left: DataFrame, right: DataFrame): DataFrame =
    left.withWatermark("ts", "1 hour").alias("l")
      .join(
        right.withWatermark("ts", "1 hour").alias("r"),
        expr("""l.user_id = r.user_id AND
                r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR"""))
      .select(col("l.user_id").as("user_id"),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col("l.ts").as("left_ts"), col("r.ts").as("right_ts"))

  /** Stream-static enrichment — the dimension-join face every event
    * pipeline ships first: a streaming fact joined to a bounded
    * dimension table. Stateless per micro-batch (no watermark, no
    * join state — the static side broadcasts into each batch), so
    * append mode and batch parity are trivial BY CONSTRUCTION; at
    * cluster scale the dimension is a broadcast (or a re-read
    * Delta-style snapshot) and the stream side never shuffles.
    * Inner join: facts without a dimension row are dropped — the
    * dq1-audited FK contract, applied streaming-side. */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("segment"), col("value"))

  /** The streaming output mode each query needs (state eviction
    * semantics): append for watermarked windows and joins, update for
    * custom state. */
  val outputModes: Map[String, OutputMode] = Map(
    "tumbling" -> OutputMode.Append(),
    "sliding" -> OutputMode.Append(),
    "session" -> OutputMode.Append(),
    "running" -> OutputMode.Update(),
    "dedup" -> OutputMode.Append(),
    "join" -> OutputMode.Append(),
    "enrich" -> OutputMode.Append())
}
