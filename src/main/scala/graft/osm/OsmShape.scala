package graft.osm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import OsmConstants._
import CleanFns._

/** The shaping stage (SURVEY.md §2, `shape_element`
  * clean_and_write.py:230-381): raw XML rows → the wide document
  * schema, entirely with per-row array/map expressions — no explode, no
  * shuffle, one WholeStageCodegen pass over the scan at any scale.
  *
  * Spark mapping of the reference's dynamic document (SURVEY.md §1.5):
  * fixed fields are real columns (`created` struct, `pos`
  * array<double>, `node_refs` sorted-unique array, `members` struct
  * array); the open 1,032-key tag space lands in typed maps —
  * `tags: map<string,string>` (scalars, cleaned), `list_tags`
  * (the 41 `;`-list keys + canonical `is_in`), `int_tags`/`float_tags`
  * (rule-promoted numerics), `bool_tags` (fuel/payment booleans), and
  * the recursive subdocuments as path-keyed maps (`addr` by subkey,
  * `subdocs` by full colon path, depth preserved in the key). Nested
  * JSON can be reconstructed from the path keys; Catalyst prunes and
  * pushes map lookups either way.
  *
  * Faithful reference quirks kept: addr keys with >1 subkey are dropped
  * (clean_and_write.py:322-327 has no else), subdivide/bool dispatch
  * inspects the ORIGINAL key prefix while the stored key is the FIXED
  * one, and list keys renamed by F9 (`name_1`→`name`,
  * `contact:phone`→`phone`) concatenate into the same list.
  */
object OsmShape {

  private val emptyTags = array().cast("array<struct<_k:string,_v:string>>")

  private def p(c: Column, f: String): Column = c.getField(f)

  /** Last-wins dedup of an entries array (struct<k,v>) into a map —
    * python-dict update semantics. */
  private def lastWinsMap(entries: Column): Column = {
    val keys = array_distinct(transform(entries, e => p(e, "k")))
    val m = map_from_entries(transform(keys, k =>
      struct(k.as("k"),
        p(element_at(filter(entries, e => p(e, "k") === k), -1), "v").as("v"))))
    when(size(keys) > 0, m)
  }

  /** Concatenating (extend) merge of list-valued entries into a map. */
  private def extendMap(pairs: Column, valueOf: Column => Column): Column = {
    val keys = array_distinct(transform(pairs, e => p(e, "k")))
    val m = map_from_entries(transform(keys, k =>
      struct(k.as("k"),
        flatten(transform(filter(pairs, e => p(e, "k") === k), valueOf)).as("v"))))
    when(size(keys) > 0, m)
  }

  private val isInLit: Column = {
    val entries = IsInMap.toSeq.map { case (k, vs) =>
      struct(lit(k).as("k"), typedlit(vs).as("v"))
    }
    map_from_entries(array(entries: _*))
  }

  def shape(df: DataFrame, docType: String): DataFrame = {
    val raw = coalesce(col("tag"), emptyTags)
    val kept = filter(raw, t => !hasProblemChars(p(t, "_k")))

    // F9 key-fix pipeline + the two gnis in-namespace fixes, with the
    // original prefix/depth retained for the dispatch decisions.
    val fixedExpr = transform(kept, t => {
      val k = p(t, "_k"); val v = p(t, "_v")
      val opfx = split(k, ":").getItem(0)
      val isPass = opfx.isin(PassthroughNamespaces: _*)
      val k1 = when(k === "gnis:ST_alph", lit("gnis:ST_alpha"))
        .when(isPass, k)
        .otherwise(fixKey(k))
      val v1 = when(k === "gnis:County_num" && v === "73", lit("073")).otherwise(v)
      struct(k1.as("k"), v1.as("v"), isPass.as("pass"), opfx.as("opfx"),
        size(split(k, ":")).as("odepth"))
    })
    // Materialize the key-fix pipeline ONCE per row: every tag family
    // below references `fixed`, and higher-order functions are
    // CodegenFallback — with the expression inlined, the whole
    // regex/split forest re-evaluated once PER FAMILY (~8x per row,
    // measured ~2x the shape stage's cost at reference scale).
    // CollapseProject keeps the two Projects separate because the
    // alias is non-cheap and multiply referenced.
    val fixed = col("__fixed")

    def isSubdiv(t: Column): Column =
      !p(t, "pass") && p(t, "odepth") > 1 && p(t, "opfx").isin(SubdivideKeys: _*)
    def elseBranch(t: Column): Column = !p(t, "pass") && !isSubdiv(t)

    // ---- list keys (F6) + canonical is_in, concatenating on repeats
    val listPairs = filter(fixed, t =>
      elseBranch(t) && p(t, "k").isin(ListKeys: _*))
    val listTags = extendMap(listPairs, t => {
      val split = handleListKeys(p(t, "v"))
      when(p(t, "k").isin("phone", "fax"), transform(split, formatPhone(_)))
        .otherwise(split)
    })
    val isInPairs = filter(fixed, t =>
      elseBranch(t) && element_at(isInLit, p(t, "k")).isNotNull)
    val isInTags = extendMap(isInPairs, t => element_at(isInLit, p(t, "k")))
    val allListTags = when(listTags.isNotNull || isInTags.isNotNull,
      map_concat(coalesce(listTags, map().cast("map<string,array<string>>")),
        coalesce(isInTags, map().cast("map<string,array<string>>"))))

    // ---- promoted numerics (F8 casts)
    val intPairs = filter(fixed, t => elseBranch(t) && p(t, "k").isin(ToIntKeys: _*))
    val intTags = lastWinsMap(transform(intPairs, t =>
      struct(p(t, "k").as("k"), intValue(p(t, "v")).as("v"))))
    val floatPairs = filter(fixed, t => elseBranch(t) &&
      p(t, "k").isin(ToFloatKeys: _*) && floatValue(p(t, "k"), p(t, "v")).isNotNull)
    val floatTags = lastWinsMap(transform(floatPairs, t =>
      struct(p(t, "k").as("k"), floatValue(p(t, "k"), p(t, "v")).as("v"))))

    // ---- booleans (F7): any fuel*/payment* key, typed view
    val boolPairs = filter(fixed, t =>
      p(t, "opfx").isin(BoolTags: _*) && boolValue(p(t, "v")).isNotNull)
    val boolTags = lastWinsMap(transform(boolPairs, t =>
      struct(p(t, "k").as("k"), boolValue(p(t, "v")).as("v"))))

    // ---- addr subdocument (F3): 2-part keys only, unit promotion
    val addrPairs = filter(fixed, t =>
      isSubdiv(t) && p(t, "opfx") === "addr" && p(t, "odepth") === 2)
    val addrEntries = flatten(transform(addrPairs, t => {
      val sub = split(p(t, "k"), ":").getItem(1)
      val cleaned = auditAddr(sub, p(t, "v"))
      val main = struct(sub.as("k"), p(cleaned, "value").as("v"))
      val unit = struct(lit("unit").as("k"), p(cleaned, "unit").as("v"))
      when(p(cleaned, "unit").isNotNull, array(unit, main)).otherwise(array(main))
    }))
    val addrMap = lastWinsMap(addrEntries)

    // ---- other subdocuments (F5): full colon path as the map key
    val subPairs = filter(fixed, t => isSubdiv(t) && p(t, "opfx") =!= "addr")
    val subdocs = lastWinsMap(transform(subPairs, t => {
      val v = p(t, "v")
      val stored = when(p(t, "opfx").isin(BoolTags: _*),
        when(boolValue(v).isNotNull, boolValue(v).cast("string"))
          .otherwise(boolResidual(v)))
        .otherwise(v)
      struct(p(t, "k").as("k"), stored.as("v"))
    }))

    // ---- residual scalars (F8 string edits; passthrough kept raw).
    // Depth-1 fuel/payment values that aren't yes/no keep their
    // lowercased residual here (the reference's handle_bools
    // passthrough); yes/no values live in bool_tags only.
    val boolResidualScalar = (t: Column) =>
      p(t, "opfx").isin(BoolTags: _*) && p(t, "odepth") === 1 &&
        boolValue(p(t, "v")).isNull
    val scalarPairs = filter(fixed, t =>
      p(t, "pass") ||
        (elseBranch(t) &&
          !p(t, "k").isin(ListKeys: _*) &&
          element_at(isInLit, p(t, "k")).isNull &&
          !p(t, "k").isin(ToIntKeys: _*) &&
          !(p(t, "k").isin(ToFloatKeys: _*) &&
            floatValue(p(t, "k"), p(t, "v")).isNotNull) &&
          (!p(t, "opfx").isin(BoolTags: _*) || boolResidualScalar(t))))
    val tagsMap = lastWinsMap(transform(scalarPairs, t =>
      struct(p(t, "k").as("k"),
        when(p(t, "pass"), p(t, "v"))
          .when(boolResidualScalar(t), boolResidual(p(t, "v")))
          .otherwise(miscValEditsStr(p(t, "k"), p(t, "v"))).as("v"))))

    val created = struct(
      col("_version").as("version"), col("_changeset").as("changeset"),
      col("_timestamp").as("timestamp"), col("_user").as("user"),
      col("_uid").as("uid"))

    val common = Seq(
      col("_id").as("_id"),
      lit(docType).as("doc_type"),
      created.as("created"),
      tagsMap.as("tags"),
      allListTags.as("list_tags"),
      intTags.as("int_tags"),
      floatTags.as("float_tags"),
      boolTags.as("bool_tags"),
      addrMap.as("addr"),
      subdocs.as("subdocs"))

    val extra = docType match {
      case "node" =>
        Seq(when(col("_lat").isNotNull && col("_lon").isNotNull,
          array(col("_lat"), col("_lon"))).as("pos"))
      case "way" =>
        val refs = array_sort(array_distinct(
          transform(coalesce(col("nd"), array().cast("array<struct<_ref:string>>")),
            n => n.getField("_ref"))))
        Seq(when(size(refs) > 0, refs).as("node_refs"))
      case "relation" =>
        val ms = transform(
          coalesce(col("member"),
            array().cast("array<struct<_type:string,_ref:string,_role:string>>")),
          m => struct(m.getField("_type").as("type"),
            m.getField("_ref").as("ref"), m.getField("_role").as("role")))
        Seq(when(size(ms) > 0, ms).as("members"))
      case other => sys.error(s"unknown doc_type $other")
    }
    df.withColumn("__fixed", fixedExpr).select(common ++ extra: _*)
  }
}
