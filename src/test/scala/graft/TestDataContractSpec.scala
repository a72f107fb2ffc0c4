package graft

import org.apache.spark.sql.types.{TimestampType, BinaryType, ArrayType, FloatType}

/** Loud contract on the driver-generated testdata the engine assumes.
  *
  * The driver regenerates `/root/testdata` between rounds and has
  * already changed `events.ts` physical layout twice (TIMESTAMP(NANOS)
  * as int64, then timestamp[us] NTZ). [[Tables.normalizeEventTs]] is
  * schema-gated over the known layouts; if a future regeneration
  * introduces a layout it doesn't recognize, this spec fails BY NAME in
  * seconds instead of silently dropping the temporal queries (r3, w4,
  * w1–w8) from the correctness gate.
  */
class TestDataContractSpec extends SparkSpec {

  private val sfs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(s => s"/root/testdata/$s")
    .filter(d => new java.io.File(d).exists())

  test("events.ts normalizes to TIMESTAMP at every scale factor " +
    "(unrecognized driver layout would break r3/w4/w* — fix " +
    "Tables.normalizeEventTs)") {
    assert(sfs.nonEmpty, "no testdata directories found")
    sfs.foreach { dir =>
      val dt = Tables.events(spark, dir).schema("ts").dataType
      assert(dt == TimestampType,
        s"$dir/events.parquet: ts normalized to $dt, expected " +
          "TimestampType — extend Tables.normalizeEventTs for the new layout")
      // the POST-EPOCH domain every µs-day operator (w10/w12/w13/
      // ts1/ts2/fn1/fn2) silently assumes: for negative micros,
      // Spark's `div` (truncate) and DuckDB's `//` (floor) bucket
      // the SAME instant on different days, and (day+4)%7 leaves
      // the 0..6 weekday domain — pin the assumption here by name
      val minUs = Tables.events(spark, dir)
        .select(org.apache.spark.sql.functions.expr("min(unix_micros(ts))"))
        .collect()(0).getLong(0)
      assert(minUs >= 0L,
        s"$dir events reach pre-epoch time ($minUs µs) — the integer " +
          "day/weekday arithmetic contracts post-1970 event time")
    }
  }

  test("documents/embeddings carry the columns the LLM-pipeline " +
    "operators key on") {
    sfs.foreach { dir =>
      val docs = Tables.documents(spark, dir).schema
      Seq("doc_id", "text", "source", "lang").foreach(c =>
        assert(docs.fieldNames.contains(c), s"$dir documents missing $c"))
      val emb = Tables.embeddings(spark, dir).schema
      assert(emb.fieldNames.contains("embedding"), s"$dir embeddings col")
      assert(emb("embedding").dataType == ArrayType(FloatType, containsNull = true)
        || emb("embedding").dataType == ArrayType(FloatType, containsNull = false),
        s"$dir embeddings.embedding is ${emb("embedding").dataType}")
      // lr1's labels and the ANN family's ids (a regenerated
      // embeddings table without them would fail analysis deep
      // inside s*/km1/lr1 instead of here by name)
      Seq("vec_id", "label").foreach(c =>
        assert(emb.fieldNames.contains(c), s"$dir embeddings missing $c"))
      // the 64-dimension contract that SimilarityOps.DIMS and the
      // emb1/s*/km1 oracles (generate_series(1,64)) hard-code — a
      // regenerated dimension would otherwise surface as an opaque
      // hash mismatch instead of failing here by name
      val dims = Tables.embeddings(spark, dir)
        .select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding")).as("n"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(dims == Set(64),
        s"$dir embeddings dims $dims, engine+oracles assume exactly 64")
      // the coordinate-range contract emb5's integer headroom
      // depends on (|x| <~ 140 keeps 1e6·proj inside a long; see
      // SimilarityOps.emb5): pin the much tighter unit-range bound
      // the generator actually produces
      val maxAbs = Tables.embeddings(spark, dir)
        .select(org.apache.spark.sql.functions.expr(
          "max(aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(m, x) -> greatest(m, abs(CAST(x AS DOUBLE)))))").as("m"))
        .collect()(0).getDouble(0)
      assert(maxAbs < 8.0,
        s"$dir embeddings |x| up to $maxAbs — emb5's long headroom " +
          "assumes unit-range coordinates (bound 140; contract 8)")
    }
  }

  test("part.p_name always carries the 2nd word er1 blocks on " +
    "(a 1-word p_name would give a NULL noun: the engine's sameName " +
    "branch would emit a dist-0 group the null-rejecting oracle " +
    "equi-join drops — fail here by name instead)") {
    import org.apache.spark.sql.functions.{col, split, element_at, length}
    sfs.foreach { dir =>
      val short = Tables.part(spark, dir)
        .filter(element_at(split(col("p_name"), " "), 2).isNull
          || length(element_at(split(col("p_name"), " "), 2)) === 0)
        .count()
      assert(short == 0L,
        s"$dir: $short part rows lack a 2nd p_name word — er1's " +
          "blocking noun is NULL there; revisit er1's sameName branch")
    }
  }

  test("events carries the full column set the temporal/streaming " +
    "surface keys on (w*, r3, x5, sm1, EventStreams)") {
    sfs.foreach { dir =>
      val ev = Tables.events(spark, dir).schema
      Seq("event_id", "ts", "user_id", "event_type", "value", "props")
        .foreach(c => assert(ev.fieldNames.contains(c),
          s"$dir events missing $c"))
    }
  }

  test("events.value is non-negative at every scale factor — att2's " +
    "integer credit split floor-divides cents, and the non-negative " +
    "domain is what makes every div convention (Spark `div`, DuckDB " +
    "`//` — both measured truncate-toward-zero — and any floor-" +
    "division reading) agree exactly; a refund-style negative value " +
    "would make the convention question live — fail here by name") {
    sfs.foreach { dir =>
      val minV = Tables.events(spark, dir)
        .select(org.apache.spark.sql.functions.expr("min(value)"))
        .collect()(0).getDouble(0)
      assert(minV >= 0.0,
        s"$dir events reach negative value ($minV) — att2's div/floor " +
          "equivalence breaks; switch att2 to the emb4/emb5 sign-split " +
          "division convention")
    }
  }

  test("orders.o_totalprice >= 1 at every scale factor — dq4's " +
    "leading digit is the first char of the floored integer part, " +
    "which only names the Benford significand while values stay " +
    "above 1; a sub-1 price would need the decimal-scan form") {
    sfs.foreach { dir =>
      val minP = Tables.orders(spark, dir)
        .select(org.apache.spark.sql.functions.expr("min(o_totalprice)"))
        .collect()(0).getDouble(0)
      assert(minP >= 1.0,
        s"$dir orders reach o_totalprice $minP < 1 — dq4's integer-part " +
          "first digit stops being the Benford significand digit")
    }
  }

  test("every dq5-audited key column is non-null at every scale " +
    "factor — Spark's multi-column countDistinct SKIPS a row if ANY " +
    "key column is null while DuckDB's count(DISTINCT (a, b)) counts " +
    "null-bearing tuples; a null key would make engine and oracle " +
    "diverge silently (ADVICE r10)") {
    sfs.foreach { dir =>
      operators.AnalyticsOps.DQ5_KEYS.foreach { case (tbl, cols) =>
        val nulls = Tables(spark, dir, tbl)
          .filter(cols.map(org.apache.spark.sql.functions.col(_).isNull)
            .reduce(_ || _))
          .count()
        assert(nulls == 0L,
          s"$dir $tbl(${cols.mkString(",")}) holds $nulls null-key " +
            "rows — dq5's countDistinct and the oracle's tuple " +
            "count(DISTINCT) stop agreeing; null-guard both sides")
      }
    }
  }

  test("documents carries >= 2 distinct langs at every scale factor " +
    "— an4's randomized-response pick is element_at(others, h % " +
    "size(others)) and its estimator denominator is 750*(k-1)-250: " +
    "at k = 1 Spark yields NULL (% 0) where DuckDB hard-errors, and " +
    "the denominator goes negative — engine and oracle would diverge " +
    "instead of failing identically (ADVICE r10)") {
    sfs.foreach { dir =>
      val k = Tables.documents(spark, dir)
        .select(org.apache.spark.sql.functions
          .countDistinct(org.apache.spark.sql.functions.col("lang")))
        .collect()(0).getLong(0)
      assert(k >= 2L,
        s"$dir documents has k=$k langs — an4's randomized-response " +
          "mechanism degenerates at k=1; add an explicit guard on " +
          "both engine and oracle before relying on this data")
    }
  }

  test("events span >= TS4_HOLDOUT + TS4_SEASON + 1 calendar days at " +
    "every scale factor — ts4's engine treats out-of-calendar " +
    "seasonal-naive lags as zero observations while the oracle's " +
    "grid joins drop those days; a short calendar would make the " +
    "two diverge (ADVICE r10)") {
    val need = operators.WindowOps.TS4_HOLDOUT +
      operators.WindowOps.TS4_SEASON + 1
    sfs.foreach { dir =>
      val span = Tables.events(spark, dir)
        .select(org.apache.spark.sql.functions.expr(
          "max(unix_micros(ts)) div 86400000000 - " +
            "min(unix_micros(ts)) div 86400000000 + 1"))
        .collect()(0).getLong(0)
      assert(span >= need,
        s"$dir events span $span days < $need — ts4's train window " +
          "reaches before the calendar start; restrict both sides " +
          "to lag-in-calendar days before relying on this data")
    }
  }
}
