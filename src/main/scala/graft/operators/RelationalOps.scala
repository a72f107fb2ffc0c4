package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The reference's relational operator surface (SURVEY.md §2.2–§2.6,
  * §2.8), re-expressed Spark-first over the driver's TPC-H-ish tables
  * so DuckDB can oracle every one of them.
  *
  * Each entry is a declarative DataFrame plan — no RDDs, no collect —
  * so Catalyst supplies predicate pushdown, column pruning, partial
  * aggregation and join-strategy selection. Determinism rules for the
  * oracle hash-compare:
  *   - every collected array is sorted (`sort_array`) on both sides;
  *   - every FP accumulation is `round(_, 2)` on both sides;
  *   - every top-k has a total-order tiebreak;
  *   - array-valued RESULT columns are serialized `'|'`-joined
  *     ([[strJoin]]) on both sides: the driver's compare sorts rows in
  *     pandas, which cannot order/hash ndarray cells — the operator
  *     still computes the real array (collect/sort/distinct semantics
  *     are exercised); only the final projection flattens it.
  *
  * Scale notes are per-query in the Scaladoc: the driver tests at
  * sf0.01/sf0.1 but the plans are written for a 1000-executor cluster
  * (broadcast the dimension side, shuffle only on declared keys).
  */
object RelationalOps {

  import graft.functions.Fns.strJoin

  // ---------------------------------------------------------------------
  // §2.2 Projections / filters / predicates
  // ---------------------------------------------------------------------

  /** P1 — projection with rename + computed field
    * (mongo_audit.py:90-92 `$project` with 1-flags/renames). */
  private def p1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_totalprice").as("price"),
      upper(col("o_orderpriority")).as("prio"))

  /** P2 — equality match (mongo_audit.py:59 `$match {doc_type: …}`).
    * The filter reaches the parquet scan as a pushed predicate. */
  private def p2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))

  /** P3 — existence predicate (mongo_audit.py:16-18 `$exists`):
    * a derived nullable field, then IS NOT NULL. */
  private def p3(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("big_prio",
        when(col("o_totalprice") > 200000, col("o_orderpriority")))
      .filter(col("big_prio").isNotNull)
      .select(col("o_orderkey"), col("big_prio"))

  /** P4 — disjunction (mongo_audit.py:87-89 `$or` bike-services). */
  private def p4(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_brand") === "Brand#1" || col("p_type") === "PROMO" ||
        col("p_size") > 40)
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))

  /** P5 — inequality on a computed three-way compare
    * (mongo_audit.py:180,184 `$cmp` + `$ne: 0`). */
  private def p5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        when(col("l_discount") > col("l_tax"), 1)
          .when(col("l_discount") < col("l_tax"), -1)
          .otherwise(0).as("comp"))
      .filter(col("comp") =!= 0)

  /** P6 — regex key-blacklist filter on exploded tokens
    * (clean_and_write.py:14,283 PROBLEMCHARS drop). */
  private def p6(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("tok"))
      .filter(!col("tok").rlike("[sz]"))

  /** P7 — namespace passthrough: prefix-dispatched clean-or-keep
    * (clean_and_write.py:285-290 tiger/gnis/nist bypass). */
  private def p7(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      when(split(col("p_name"), " ").getItem(0).isin("small", "red"),
        col("p_name")).otherwise(upper(col("p_name"))).as("vname"))

  // ---------------------------------------------------------------------
  // §2.3 Joins
  // ---------------------------------------------------------------------

  /** J1 — left equi-join with grouped-array result (`$lookup`,
    * mongo_audit.py:112-119): matches land in a sorted array. Equi-join
    * on the shuffle key; at scale the grouped side aggregates partially
    * map-side after the join exchange. */
  private def j1(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(strJoin(sort_array(collect_list(col("o_orderkey")))).as("order_keys"))

  /** J2 — inner join via unwind-of-lookup (mongo_audit.py:174-175). */
  private def j2(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"), "inner")
      .select(col("o_orderkey"), col("c_name"))

  /** J3 — semi-join (`$match {refs: {$ne: []}}`, mongo_audit.py:120):
    * keep left rows with ≥1 match, never multiplying rows. Planned as
    * LeftSemi — no payload columns cross the shuffle. */
  private def j3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))

  /** J4 — equi-join + mismatch post-filter (mongo_audit.py:204-224
    * `$cmp` on joined fields, keep ≠). */
  private def j4(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("l_extendedprice") > col("p_retailprice") * 30)
      .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))

  /** J5 — self-join (mongo_audit.py:109-124 bham⋈bham): line pairs
    * within an order. Self-joins reuse the same scan; the shuffle is on
    * the join key only. */
  private def j5(s: SparkSession, d: String): DataFrame = {
    // both sides are the IDENTICAL child plan (same projection, names
    // disambiguated by alias only), so Spark shuffles once and feeds
    // the second side from a ReusedExchange — half the exchange I/O of
    // the naive rename-one-side form (asserted in PlanShapeSpec)
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_linenumber"))
    l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_linenumber") < col("b.l_linenumber"))
      .groupBy(col("a.l_orderkey").as("l_orderkey"))
      .agg(count(lit(1)).as("pair_cnt"))
  }

  /** J6 — anti-join (beyond the reference, which has no anti join —
    * engine completeness per §2.3's "no ... anti joins" note):
    * customers with NO big-ticket (>300k) order. Planned LeftAnti:
    * like the semi-join, no payload crosses the exchange and rows
    * never multiply; the right-side filter pushes to its scan. The
    * filtered form (vs "no orders at all") keeps the result non-empty
    * at every sf, so the oracle hash actually exercises anti
    * semantics instead of matching on the empty set. */
  private def j6(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  // ---------------------------------------------------------------------
  // §2.4 Aggregations
  // ---------------------------------------------------------------------

  /** A1 — exact distinct count (mongo_audit.py:7-12 unique users). */
  private def a1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).agg(countDistinct(col("o_custkey")).as("n_custs"))

  /** A2 — group-by + count (+ exact integral sum)
    * (mongo_audit.py:46-62). Partial+final hash aggregation. */
  private def a2(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))

  /** A3 — group-by + collect-set (mongo_audit.py:139-140 `$addToSet`). */
  private def a3(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(strJoin(sort_array(collect_set(col("c_mktsegment")))).as("segments"))

  /** A4 — group-by + collect-list / `$push` inverted index
    * (mongo_audit.py:314-322 ref_docs build). */
  private def a4(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(strJoin(sort_array(collect_list(col("l_orderkey")))).as("refers"))

  /** A5 — group-by as distinct (mongo_audit.py:121). */
  private def a5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()

  /** A6 — count of filtered set, server-side (mongo_audit.py:15-19 —
    * the reference materializes client-side; we never collect). */
  private def a6(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 100000)
      .agg(count(lit(1)).as("cnt"))

  /** A7 — profiling aggregation (osm_structure_audit.py:31-83):
    * per-key use count, distinct count, use/distinct ratio. */
  private def a7(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("use_cnt"),
        countDistinct(col("user_id")).as("uniq_users"),
        graft.functions.Fns.roundFp(sum(col("value")), 2).as("sum_value"),
        graft.functions.Fns.roundFp(when(countDistinct(col("user_id")) > 0,
          count(lit(1)).cast("double") / countDistinct(col("user_id"))), 4)
          .as("use_per_uniq"))

  /** A8 — array length (`$size`, mongo_audit.py:355-359). */
  private def a8(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))

  // ---------------------------------------------------------------------
  // §2.5 Sorts / limits / top-k
  // ---------------------------------------------------------------------

  /** T1 — top-k by value (mongo_audit.py:361-362 `$sort`+`$limit`).
    * Spark plans TakeOrderedAndProject: per-partition heaps, no global
    * sort — the scale-correct physical shape. */
  private def t1(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(5)

  /** T2 — limit-1 sample (main.ipynb cell 49), made deterministic. */
  private def t2(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")).limit(1)

  /** T3 — array sort (clean_and_write.py:347 sorted node_refs). */
  private def t3(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        strJoin(array_sort(split(col("text"), " "))).as("toks_sorted"))

  // ---------------------------------------------------------------------
  // §2.6 Set ops / array-table conversion
  // ---------------------------------------------------------------------

  /** U1 — unwind (`$unwind`, mongo_audit.py:111): explode to rows. */
  private def u1(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))

  /** U2 — unwind preserving empties (mongo_audit.py:283-295
    * preserveNullAndEmptyArrays) → explode_outer. */
  private def u2(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode_outer(
        when(col("n_chars") >= 300, slice(split(col("text"), " "), 1, 3))
          .otherwise(array().cast("array<string>"))).as("tok"))

  /** U3 — union of two ref columns then null-strip
    * (mongo_audit.py:305-312). */
  private def u3(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("key"))
      .unionAll(Tables.customer(s, d).select(col("c_custkey").cast("long").as("key")))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))

  /** U4 — result-list concatenation (mongo_audit.py:76-79) as UNION ALL
    * of per-type subresults. */
  private def u4(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_returnflag") === "A").select(col("l_returnflag"))
      .unionByName(l.filter(col("l_returnflag") === "R").select(col("l_returnflag")))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("cnt"))
  }

  /** U5 — dedup via set (clean_and_write.py:258,272) → array_distinct. */
  private def u5(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        strJoin(array_sort(array_distinct(split(col("text"), " ")))).as("vocab"))

  /** U6 — intersect (beyond the reference, which has no
    * intersect/except — §2.6's completeness note): customers that both
    * placed an order and hold a positive balance. Spark plans
    * INTERSECT as a distinct + LeftSemi — same no-payload exchange
    * as J3. */
  private def u6(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(col("o_custkey").as("key"))
      .intersect(Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .select(col("c_custkey").cast("long").as("key")))

  /** U7 — except: positive-balance customers minus those with a
    * big-ticket (>300k) order (distinct + LeftAnti). Filtered right
    * side for the same reason as J6: a non-empty difference at every
    * sf, so the gate checks EXCEPT semantics, not the empty set. */
  private def u7(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .select(col("c_custkey").cast("long").as("key"))
      .except(Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("key")))

  /** U9 — EXCEPT ALL, the multiset complement of U7: each customer's
    * order rows minus one occurrence per big-ticket order — bag
    * semantics preserve multiplicity (a customer with 5 orders, 2 of
    * them big-ticket, keeps 3 rows). Spark plans this as an aggregate
    * on (value, count-difference) + generate — one shuffle on the
    * value, never a join; counts, not rows, cross the exchange. */
  private def u9(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_custkey").as("key"))
      .exceptAll(Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("key")))

  // ---------------------------------------------------------------------
  // §2.8 Mutations as recompute (immutable tables)
  // ---------------------------------------------------------------------

  /** M1 — conditional bulk update (mongo_audit.py:22-43 update_states):
    * nested-struct `withField` rewrite guarded by a predicate. */
  private def m1(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        struct(col("c_mktsegment").as("segment"), col("c_acctbal").as("bal")).as("acct"))
      .withColumn("acct",
        when(col("acct.bal") < 0,
          col("acct").withField("segment", lit("DELINQUENT")))
          .otherwise(col("acct")))
      .select(col("c_custkey"), col("acct.segment").as("segment"),
        col("acct.bal").as("bal"))

  /** M2 — positional array-element update (mongo_audit.py:235-268
    * `members.$` fix): rewrite only the FIRST matching element, via
    * `transform` with an index guard. */
  private def m2(s: SparkSession, d: String): DataFrame =
    // the match position is hoisted into its own projection: evaluated
    // once per ROW, not once per array element (the inlined form
    // re-scans the array inside the lambda — O(n²) per row)
    Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("pos", array_position(col("toks"), lit("data")))
      .select(col("doc_id"),
        strJoin(transform(col("toks"), (x, i) =>
          when(i === col("pos") - 1, upper(x)).otherwise(x))).as("toks2"))

  /** M3 — materialized derived collection (mongo_audit.py:271-329
    * write_ref_docs): the inverted reference index as a DataFrame.
    *
    * Cost bound at scale: the ANSWER is |distinct part keys| rows
    * (x100 probe: 20M rows from 60M lineitems, 8.9 s — the round's
    * honest tail). The plan is one narrow (key, ref) shuffle with
    * map-side partial collect_set, then per-group sort+join — there is
    * no smaller shape for an output this size; the remaining lever is
    * LAYOUT, which [[m3Materialize]] provides. */
  private def m3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sort_array(collect_set(col("l_suppkey"))).as("refers_arr"))
      .select(col("l_partkey"), strJoin(col("refers_arr")).as("refers"),
        size(col("refers_arr")).as("refer_count"))

  /** The SINK face of M3 — the write_ref_docs materialization done the
    * way a 100 TB consumer wants it on disk: bucketed (and
    * bucket-sorted) by the part key, written partition-parallel (one
    * file per task, never a coalesce). Every downstream part-keyed
    * join then reads bucket-aligned files with NO exchange on the
    * materialized side (BucketingSpec proves the property on this very
    * table), which is where the derived collection's real cost lives —
    * it is re-read far more often than it is rebuilt. */
  def m3Materialize(s: SparkSession, d: String, table: String,
      buckets: Int = 32): Unit =
    m3(s, d).write
      .bucketBy(buckets, "l_partkey").sortBy("l_partkey")
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(table)

  /** M4 — upsert / keep-latest merge (beyond the reference's in-place
    * updates: the recompute form every lakehouse ingest uses). A delta
    * batch (here: re-ingested docs with a bumped version, synthesized
    * deterministically) merges into the base corpus; the winner per key
    * is the highest (version, then text for a total order) via one
    * window rank. At scale: union is free, the only shuffle is the
    * per-key window — i.e. MERGE INTO without a table format, and the
    * same plan a Delta/Iceberg MERGE compiles to for
    * latest-wins semantics. */
  private def m4(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), lit(1).as("version"))
    val delta = Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
        lit(2).as("version"))
    base.unionByName(delta)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("version").desc, col("text").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("text"), col("version"))
  }

  /** M5 — SCD2 history build (beyond the reference: the temporal-table
    * form of its update operators): each user's event stream becomes
    * validity intervals [valid_from, valid_to) per observed state, the
    * open current row flagged — how a lakehouse materializes "what was
    * true when" from a change log. lead() over the key is the whole
    * computation: one shuffle on user_id, no join, no self-merge. */
  private def m5(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("valid_from").asc, col("event_id").asc)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        col("event_type").as("state"), col("ts").as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** M8 — point-in-time (AS OF) read over m5's SCD2 intervals: each
    * user's state at the calendar-midpoint instant t (data-derived,
    * integer µs), i.e. the interval with valid_from ≤ t < valid_to
    * (current interval when open-ended) — the time-travel query every
    * versioned store serves, expressed on the engine's OWN interval
    * table (the m5 builder reused verbatim, the s6 composition rule).
    * Exactly ≤1 row per user by interval construction; a user whose
    * history starts after t has none.
    *
    * Scale shape: m5's one scan + user-keyed window, a 1-row pivot
    * broadcast, and a narrow filter — nothing else. */
  private def m8(s: SparkSession, d: String): DataFrame = {
    val piv = Tables.events(s, d)
      .agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts)) + 1) div 2")
        .as("t_us"))
    m5(s, d).crossJoin(broadcast(piv))
      .filter(expr("unix_micros(valid_from) <= t_us AND " +
        "(valid_to IS NULL OR unix_micros(valid_to) > t_us)"))
      .select(col("user_id"), col("state"),
        expr("unix_micros(valid_from)").as("since_us"), col("t_us"))
  }

  /** U8 — positional unwind (the `$unwind includeArrayIndex` variant
    * of U1): explode with the element's 0-based index — Generate with
    * position, same narrow no-shuffle shape as U1. */
  private def u8(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("idx", "tok")))

  /** M6 — CDC apply: fold an insert/update/delete change log into a
    * base snapshot (m4 is latest-wins upsert; m6 adds the DELETE
    * semantic and out-of-band inserts — the full MERGE triad a CDC
    * ingest needs). Log batches are synthesized deterministically so
    * the oracle can replay them: v2 uppercases every doc_id%3==0, v3
    * deletes doc_id%10==0, v2 also inserts fresh keys (-id-1 for
    * doc_id%50==0). Winner per key = max version via one window rank;
    * a winning 'D' row erases the key. At scale this is the identical
    * plan to m4 — union is free, ONE shuffle on the merge key — and
    * deletes cost nothing extra: they ride the same rank and vanish in
    * the final filter instead of requiring a second anti-join pass. */
  private def m6(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val base = docs.select(col("doc_id"), col("text"),
      lit(1).as("version"), lit("U").as("op"))
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), upper(col("text")).as("text"),
        lit(2).as("version"), lit("U").as("op"))
    // insert keys are provably OUTSIDE the base key space: doc_id ≥ 0
    // always, so -(doc_id)-1 < 0 can never collide with a real key at
    // any corpus size (an additive offset like id+100000 silently
    // collides once ids reach the offset, leaving two version-2 rows
    // whose winner the version-only ordering picks nondeterministically)
    val inserts = docs.filter(col("doc_id") % 50 === 0)
      .select((-col("doc_id") - 1).as("doc_id"),
        concat(lit("new:"), col("doc_id")).as("text"),
        lit(2).as("version"), lit("U").as("op"))
    val deletes = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"),
        lit(3).as("version"), lit("D").as("op"))
    base.unionByName(updates).unionByName(inserts).unionByName(deletes)
      .withColumn("rn", row_number().over(
        // (version desc, op, text) is a TOTAL order over any one key's
        // log rows even under key collisions — determinism by
        // construction, not by the keyspace assumption above
        Window.partitionBy(col("doc_id"))
          .orderBy(col("version").desc, col("op").asc, col("text").asc)))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("doc_id"), col("text"), col("version"))
  }

  /** M7 — snapshot diff: added / removed / changed between two corpus
    * versions, the audit every dataset release runs ("what changed
    * since v1?"). Versions are synthesized deterministically from the
    * documents table so the oracle can replay them (v1 drops
    * doc_id%10==0, v2 drops doc_id%7==0 and uppercases doc_id%3==0).
    * Plan: project each version to (key, 60-bit content fingerprint) —
    * the comparison NEVER ships text — then one full-outer join on the
    * key: one shuffle per side, 16 bytes per row. Unchanged rows are
    * dropped post-join; at scale that predicate eliminates ~all rows
    * right after the join, so the output stays tiny no matter the
    * corpus size. */
  private def m7(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Fns.md5Long
    val docs = Tables.documents(s, d)
    val v1 = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5Long(col("text")).as("fp1"))
    val v2 = docs.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), md5Long(
        when(col("doc_id") % 3 === 0, upper(col("text")))
          .otherwise(col("text"))).as("fp2"))
    v1.join(v2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") =!= col("fp2"), "changed").as("change"))
      .filter(col("change").isNotNull)
  }

  /** J7 — bloom-filter pre-join pruning: the 100 TB semi-join
    * technique for when the key set is too large to broadcast as an
    * exact hash relation but its BLOOM fits in a few MB. The sketch is
    * built with one distributed aggregation over the dimension side
    * (`stat.bloomFilter` — no collect of keys), shipped to every task,
    * and applied as a scan-side pre-filter so only candidate rows ever
    * reach the shuffle; the exact LeftSemi afterwards removes the ~fpp
    * false positives, so the RESULT is exactly the semi-join (which is
    * what the oracle checks). Spark's AQE runtime row-level filtering
    * (`spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`) injects
    * this same shape automatically; this operator makes it explicit
    * and unit-testable. */
  private def j7(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"))
    // size the sketch from the real key count — a fixed capacity would
    // silently saturate (fpp -> 1, zero pruning) once the dimension
    // outgrows it; the count is a cheap scan of one pruned column
    val nKeys = math.max(bigOrders.count(), 1L)
    // native bloom: `bloom_filter_agg` builds the sketch distributed
    // (one agg over the pruned key column, no key collect) and
    // `might_contain` probes it as a codegen'd Catalyst expression —
    // the probe stays inside WholeStageCodegen (asserted in
    // PlanShapeSpec) instead of breaking the span the way a Scala UDF
    // does. The few-MB sketch itself is the only driver round-trip,
    // shipped back as a binary literal (= a task broadcast).
    val bf = bigOrders
      .agg(expr(s"bloom_filter_agg(o_orderkey, ${nKeys}L)").as("bf"))
      .head().getAs[Array[Byte]](0)
    Tables.lineitem(s, d)
      .filter(call_function("might_contain", lit(bf), col("l_orderkey")))
      .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  /** Salt fan-out for j8 — small and fixed: the dim side replicates
    * R×, so R trades skew-spread against dim-shuffle volume. 8 splits
    * a hot key across 8 tasks while keeping the replicated dim tiny
    * relative to any fact partition. */
  private val J8_SALTS = 8

  /** j8 — skew-resilient SALTED equi-join (the join-side twin of g6's
    * salted aggregation). A plain hash join sends every row of a hot
    * key to ONE task — one supplier holding 30% of a 100 TB lineitem
    * is a straggler (or an OOM) no amount of extra executors fixes,
    * because the parallelism limit is the key cardinality, not the
    * cluster. Salting restores parallelism deterministically: the fact
    * side gets `salt = hash(rowid) % R` so each join key spreads over
    * R shuffle partitions, and the dim side replicates each row R
    * times (explode over 0..R-1) so every (key, salt) cell still finds
    * its match. The join result is EXACTLY the unsalted join (law in
    * NewOpsSpec; the oracle is the plain join), and the post-join
    * per-nation rollup partial-aggregates map-side as usual.
    *
    * vs AQE skew-join: AQE splits an oversized partition at runtime,
    * but only for sort-merge joins it can re-plan, and only splitting
    * the skewed SIDE's partitions — salting is the static form that
    * also survives a single key too large for one task's sort spill,
    * works under shuffled-hash joins, and pre-spreads the MAP-side
    * write (no 30%-of-the-corpus shuffle file on one mapper). At local
    * fixture scale AQE elects broadcast for the tiny replicated dim —
    * correct and harmless; the salted shape it falls back to under a
    * non-broadcastable dim is plan-asserted in PlanShapeSpec with
    * broadcast disabled. Quantities are integral-valued doubles, so
    * the rollup sum is order-exact with no rounding step. */
  private def j8(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_quantity"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(J8_SALTS.toLong)).as("fsalt"))
    val dim = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"),
        explode(sequence(lit(0L), lit(J8_SALTS - 1L))).as("dsalt"))
    fact.join(dim,
        col("l_suppkey") === col("s_suppkey") && col("fsalt") === col("dsalt"))
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
  }

  // ---------------------------------------------------------------------

  /** u10 — unpivot/melt, the inverse of g3's pivot and the missing
    * half of the reshape pair: lineitem's four numeric measures fold
    * into (measure, value) rows via `stack`, then aggregate per
    * measure. Values quantize to integer cents BEFORE the sum (the
    * emb1/pipe3 rule: never order-dependent float accumulation), so
    * the per-measure totals are exact longs.
    *
    * Scale shape: `stack` is an in-row expansion at scan speed (a
    * Generate, not a join and not a kernel) — the melt of a 100 TB
    * fact table is the same single scan with 4× row fan-out feeding
    * one partial+final agg on a 4-value key. */
  /** u10's stateless half — the melt itself (stack + cent
    * quantization), exposed so the streaming parity spec can prove it
    * runs UNCHANGED over micro-batches (the ck1/tok1 pattern); the
    * final per-measure agg is the only stateful piece. */
  private[graft] def meltCents(lineitem: DataFrame): DataFrame =
    lineitem
      .select(expr(
        """stack(4,
          |  'l_quantity', l_quantity,
          |  'l_extendedprice', l_extendedprice,
          |  'l_discount', l_discount,
          |  'l_tax', l_tax) AS (measure, v)""".stripMargin))
      .select(col("measure"),
        expr("CAST(floor(v * 100 + 0.5) AS BIGINT)").as("cents"))

  private def u10(s: SparkSession, d: String): DataFrame =
    meltCents(Tables.lineitem(s, d))
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u10_unpivot" -> (u10 _),
    "p1_project" -> (p1 _),
    "p2_eq_match" -> (p2 _),
    "p3_exists" -> (p3 _),
    "p4_or" -> (p4 _),
    "p5_ne_computed" -> (p5 _),
    "p6_key_blacklist" -> (p6 _),
    "p7_namespace_passthrough" -> (p7 _),
    "j1_lookup_group_array" -> (j1 _),
    "j2_inner_join" -> (j2 _),
    "j3_semi_join" -> (j3 _),
    "j4_join_mismatch_filter" -> (j4 _),
    "j5_self_join" -> (j5 _),
    "j6_anti_join" -> (j6 _),
    "a1_distinct_count" -> (a1 _),
    "a2_group_count" -> (a2 _),
    "a3_collect_set" -> (a3 _),
    "a4_collect_list_push" -> (a4 _),
    "a5_distinct" -> (a5 _),
    "a6_filter_count" -> (a6 _),
    "a7_profile_agg" -> (a7 _),
    "a8_array_len" -> (a8 _),
    "t1_topk" -> (t1 _),
    "t2_limit" -> (t2 _),
    "t3_array_sort" -> (t3 _),
    "u1_explode" -> (u1 _),
    "u2_explode_outer" -> (u2 _),
    "u3_union_columns" -> (u3 _),
    "u4_union_concat" -> (u4 _),
    "u5_dedup_set" -> (u5 _),
    "u9_except_all" -> (u9 _),
    "u6_intersect" -> (u6 _),
    "u7_except" -> (u7 _),
    "m1_conditional_update" -> (m1 _),
    "m2_positional_array_update" -> (m2 _),
    "m3_materialize_ref_docs" -> (m3 _),
    "m4_upsert_latest" -> (m4 _),
    "m5_scd2_intervals" -> (m5 _),
    "m8_asof_state" -> (m8 _),
    "m6_cdc_apply" -> (m6 _),
    "m7_snapshot_diff" -> (m7 _),
    "u8_posexplode" -> (u8 _),
    "j7_bloom_prejoin" -> (j7 _),
    "j8_salted_join" -> (j8 _)
  )

  val oracles: Map[String, String] = Map(
    // melt via UNION ALL ≡ the engine's stack(); cent-quantized longs
    // make the per-measure totals order-independent and exact
    "u10_unpivot" -> """
      WITH m AS (
        SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT 'l_tax', l_tax FROM lineitem),
      c AS (SELECT measure,
              CAST(floor(v * 100 + 0.5) AS BIGINT) AS cents FROM m)
      SELECT measure, count(*) AS n,
        CAST(sum(cents) AS BIGINT) AS sum_cents,
        min(cents) AS min_cents, max(cents) AS max_cents
      FROM c GROUP BY 1""",
    "p1_project" ->
      "SELECT o_orderkey, o_totalprice AS price, upper(o_orderpriority) AS prio FROM orders",
    "p2_eq_match" ->
      "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem WHERE l_returnflag = 'R'",
    "p3_exists" ->
      "SELECT o_orderkey, big_prio FROM (SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN o_orderpriority END AS big_prio FROM orders) WHERE big_prio IS NOT NULL",
    "p4_or" ->
      "SELECT p_partkey, p_brand, p_type, p_size FROM part WHERE p_brand = 'Brand#1' OR p_type = 'PROMO' OR p_size > 40",
    "p5_ne_computed" ->
      "SELECT l_orderkey, l_linenumber, comp FROM (SELECT l_orderkey, l_linenumber, CASE WHEN l_discount > l_tax THEN 1 WHEN l_discount < l_tax THEN -1 ELSE 0 END AS comp FROM lineitem) WHERE comp <> 0",
    "p6_key_blacklist" ->
      "SELECT p_partkey, tok FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok FROM part) WHERE NOT regexp_matches(tok, '[sz]')",
    "p7_namespace_passthrough" ->
      "SELECT p_partkey, CASE WHEN split_part(p_name, ' ', 1) IN ('small', 'red') THEN p_name ELSE upper(p_name) END AS vname FROM part",
    "j1_lookup_group_array" ->
      // outer coalesce: DuckDB's array_to_string([]) is NULL while
      // Spark's array_join of an empty array is '' (hit at sf0.1 by a
      // customer with zero orders)
      "SELECT c_custkey, coalesce(array_to_string(list_sort(list(o_orderkey) FILTER (WHERE o_orderkey IS NOT NULL)), '|'), '') AS order_keys FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey",
    "j2_inner_join" ->
      "SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey",
    "j3_semi_join" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
    "j4_join_mismatch_filter" ->
      "SELECT l_orderkey, l_linenumber, p_partkey FROM lineitem JOIN part ON l_partkey = p_partkey WHERE l_extendedprice > p_retailprice * 30",
    "j5_self_join" ->
      "SELECT a.l_orderkey, count(*) AS pair_cnt FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber GROUP BY a.l_orderkey",
    "j6_anti_join" ->
      // NOT EXISTS, not NOT IN: a NULL o_custkey would make NOT IN return
      // zero rows (three-valued logic) while LeftAnti still anti-matches
      "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)",
    "a1_distinct_count" ->
      "SELECT count(DISTINCT o_custkey) AS n_custs FROM orders",
    "a2_group_count" ->
      "SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY l_returnflag, l_linestatus",
    "a3_collect_set" ->
      "SELECT c_nationkey, array_to_string(list_sort(list_distinct(list(c_mktsegment))), '|') AS segments FROM customer GROUP BY c_nationkey",
    "a4_collect_list_push" ->
      "SELECT l_partkey, array_to_string(list_sort(list(l_orderkey)), '|') AS refers FROM lineitem GROUP BY l_partkey",
    "a5_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "a6_filter_count" ->
      "SELECT count(*) AS cnt FROM orders WHERE o_totalprice > 100000",
    "a7_profile_agg" ->
      "SELECT event_type, count(*) AS use_cnt, count(DISTINCT user_id) AS uniq_users, floor(sum(value)*100 + 0.5)/100 AS sum_value, floor(CASE WHEN count(DISTINCT user_id) > 0 THEN count(*)::DOUBLE / count(DISTINCT user_id) END*10000 + 0.5)/10000 AS use_per_uniq FROM events GROUP BY event_type",
    "a8_array_len" ->
      "SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM documents",
    "t1_topk" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 5",
    "t2_limit" ->
      "SELECT doc_id, lang FROM documents ORDER BY doc_id LIMIT 1",
    "t3_array_sort" ->
      "SELECT doc_id, array_to_string(list_sort(string_split(text, ' ')), '|') AS toks_sorted FROM documents",
    "u1_explode" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents",
    "u2_explode_outer" ->
      "SELECT doc_id, unnest(CASE WHEN n_chars >= 300 THEN string_split(text, ' ')[1:3] ELSE [NULL] END) AS tok FROM documents",
    "u3_union_columns" ->
      "SELECT key, count(*) AS cnt FROM (SELECT o_custkey AS key FROM orders UNION ALL SELECT CAST(c_custkey AS BIGINT) FROM customer) WHERE key IS NOT NULL GROUP BY key",
    "u4_union_concat" ->
      "SELECT l_returnflag, count(*) AS cnt FROM (SELECT l_returnflag FROM lineitem WHERE l_returnflag = 'A' UNION ALL SELECT l_returnflag FROM lineitem WHERE l_returnflag = 'R') GROUP BY l_returnflag",
    "u5_dedup_set" ->
      "SELECT doc_id, array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS vocab FROM documents",
    "u6_intersect" ->
      "SELECT o_custkey AS key FROM orders INTERSECT SELECT CAST(c_custkey AS BIGINT) FROM customer WHERE c_acctbal > 0",
    "u7_except" ->
      "SELECT CAST(c_custkey AS BIGINT) AS key FROM customer WHERE c_acctbal > 0 EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 300000",
    "u9_except_all" ->
      "SELECT o_custkey AS key FROM orders EXCEPT ALL SELECT o_custkey FROM orders WHERE o_totalprice > 300000",
    "m1_conditional_update" ->
      "SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN 'DELINQUENT' ELSE c_mktsegment END AS segment, c_acctbal AS bal FROM customer",
    "m2_positional_array_update" ->
      "SELECT doc_id, array_to_string(CASE WHEN pos IS NULL OR pos = 0 THEN l ELSE l[1:pos-1] || [upper(l[pos])] || l[pos+1:] END, '|') AS toks2 FROM (SELECT doc_id, string_split(text, ' ') AS l, list_position(string_split(text, ' '), 'data') AS pos FROM documents)",
    "m3_materialize_ref_docs" ->
      "SELECT l_partkey, array_to_string(refers, '|') AS refers, len(refers) AS refer_count FROM (SELECT l_partkey, list_sort(list_distinct(list(l_suppkey))) AS refers FROM lineitem GROUP BY l_partkey)",
    "m4_upsert_latest" -> """
      WITH u AS (
        SELECT doc_id, text, 1 AS version FROM documents
        UNION ALL
        SELECT doc_id, text || ' v2', 2 FROM documents WHERE doc_id % 10 = 0),
      r AS (SELECT doc_id, text, version,
              row_number() OVER (PARTITION BY doc_id
                ORDER BY version DESC, text) AS rn FROM u)
      SELECT doc_id, text, version FROM r WHERE rn = 1""",
    "m5_scd2_intervals" -> """
      SELECT user_id, event_id, event_type AS state, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          AS is_current
      FROM events""",
    // same intervals in integer µs, same calendar-midpoint instant
    "m8_asof_state" -> """
      WITH iv AS (SELECT user_id, event_type AS state,
               epoch_us(ts) AS vf,
               lead(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS vt
             FROM events),
      p AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts)) + 1) // 2
              AS t_us FROM events)
      SELECT user_id, state, vf AS since_us, t_us
      FROM iv, p WHERE vf <= t_us AND (vt IS NULL OR vt > t_us)""",
    "u8_posexplode" -> """
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
      SELECT doc_id, unnest(generate_series(1, len(l))) - 1 AS idx,
        unnest(l) AS tok
      FROM t""",
    "m7_snapshot_diff" -> """
      WITH v1 AS (SELECT doc_id,
          ('0x' || substr(md5(text),1,15))::BIGINT AS fp1
        FROM documents WHERE doc_id % 10 <> 0),
      v2 AS (SELECT doc_id,
          ('0x' || substr(md5(CASE WHEN doc_id % 3 = 0 THEN upper(text)
                                   ELSE text END),1,15))::BIGINT AS fp2
        FROM documents WHERE doc_id % 7 <> 0)
      SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
        CASE WHEN v1.doc_id IS NULL THEN 'added'
             WHEN v2.doc_id IS NULL THEN 'removed'
             WHEN fp1 <> fp2 THEN 'changed' END AS change
      FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
      WHERE CASE WHEN v1.doc_id IS NULL THEN 'added'
                 WHEN v2.doc_id IS NULL THEN 'removed'
                 WHEN fp1 <> fp2 THEN 'changed' END IS NOT NULL""",
    "m6_cdc_apply" -> """
      WITH log AS (
        SELECT doc_id, text, 1 AS version, 'U' AS op FROM documents
        UNION ALL
        SELECT doc_id, upper(text), 2, 'U' FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT -doc_id - 1, 'new:' || doc_id::VARCHAR, 2, 'U'
        FROM documents WHERE doc_id % 50 = 0
        UNION ALL
        SELECT doc_id, NULL, 3, 'D' FROM documents WHERE doc_id % 10 = 0),
      r AS (SELECT doc_id, text, version, op, row_number() OVER (
              PARTITION BY doc_id ORDER BY version DESC, op, text) AS rn FROM log)
      SELECT doc_id, text, version FROM r WHERE rn = 1 AND op <> 'D'""",
    "j7_bloom_prejoin" -> """
      SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)""",
    // the salt is an engine-internal spreading device; the observable
    // result is the plain join + rollup
    "j8_salted_join" -> """
      SELECT s_nationkey AS nationkey, count(*) AS cnt,
        sum(l_quantity) AS sum_qty
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY s_nationkey"""
  )
}
