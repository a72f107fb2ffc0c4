package graft.osm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import OsmConstants._

/** The reference's row-scalar cleaning library (SURVEY.md §2.7
  * F1-F9) as pure `Column` combinators — codegen'd built-in expression
  * chains, no UDFs, so the whole cleaning pipeline stays inside one
  * WholeStageCodegen span per scan at any scale.
  *
  * Faithfulness notes (SURVEY.md §7.4.5): the reference's deliberate
  * quirks are preserved where they're deterministic data behavior
  * (`kerb: rised→rasied`, single-token street leading space, postcode
  * typo map), and fixed where they're outright bugs in the *function
  * contract* — `format_phone` returns "" for an already-well-formatted
  * number in the reference (clean_and_write.py:97-111 falls through
  * with the empty accumulator); we return the input unchanged, which is
  * what every call site expects.
  */
object CleanFns {

  private def mapLookup(m: Map[String, String], key: Column): Column = {
    val pairs = m.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    element_at(map(pairs: _*), key)
  }

  /** F1 — `format_phone` (clean_and_write.py:97-111; fixtures
    * main.ipynb cell 17: "(360) 555-9999 ext. 1234" →
    * "+1-360-555-9999 x1234", "+1 306-398-8300" → "+1-360-398-8300").
    *
    * Already-formatted numbers pass through (see note above); others:
    * strip non-digits, fix the `306` area-code typo when the digits
    * start `1*306`, ensure leading country code `1`, digits beyond 11
    * become a ` x<ext>` suffix, then hyphenate `+C-AAA-LLL-NNNN`.
    */
  def formatPhone(num: Column): Column = {
    // native expression ([[graft.functions.FormatPhone]]): the built-in
    // chain needs each intermediate (digits → typo-fixed → country-coded
    // → extension-split) in several downstream positions, and Column ops
    // build trees, not DAGs — the re-inlined subtrees exceeded Janino's
    // 64KB method limit and dropped f1 out of codegen (ADVICE r1)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.functions.FormatPhone(ColumnBridge.expression(num)))
  }

  /** F2 — `clean_street_type` (clean_and_write.py:66-77): returns
    * `struct(street, unit)`. If the last token contains `#` it's a
    * unit — pop it; map the (new) last token through StreetTypeMap.
    * The reference's single-token leading-space artifact is preserved
    * (the join of an empty prefix with the mapped type).
    */
  def cleanStreet(street: Column): Column = {
    val toks0 = split(street, " ")
    val last0 = element_at(toks0, -1)
    val hasUnit = last0.contains("#")
    val unit = when(hasUnit, last0)
    val toks = when(hasUnit, slice(toks0, lit(1), size(toks0) - 1)).otherwise(toks0)
    // a unit-only value ("#215") leaves zero tokens; ANSI element_at on
    // an empty array throws (the reference's python IndexErrors here —
    // intended semantics: empty street, unit kept)
    val last = when(size(toks) > 0, element_at(toks, -1))
    val mapped = mapLookup(StreetTypeMap, last)
    val cleaned = when(mapped.isNotNull,
      concat(array_join(slice(toks, lit(1), size(toks) - 1), " "), lit(" "), mapped))
      .otherwise(array_join(toks, " "))
    struct(cleaned.as("street"), unit.as("unit"))
  }

  /** F3 — `audit_addr` (clean_and_write.py:80-94): per-subkey addr
    * cleaning. Returns `struct(value, unit)` (unit non-null only for
    * street values that carried one).
    */
  def auditAddr(subKey: Column, v: Column): Column = {
    val streetRes = cleanStreet(v)
    val prefix3 = substring(v, 1, 3)
    val unitMapped = mapLookup(StreetTypeMap, prefix3)
    val housename = array_join(
      transform(
        filter(split(v, " "), w => w =!= "LLC"),
        w => initcap(lower(w))), " ")
    val postcode = when(substring(v, 1, 5) === "99248", "98248")
      .otherwise(substring(v, 1, 5))
    when(subKey === "street",
      struct(streetRes.getField("street").as("value"),
        streetRes.getField("unit").as("unit")))
      .when(subKey === "unit" && unitMapped.isNotNull,
        struct(concat(unitMapped, v.substr(lit(4), length(v) - 3)).as("value"),
          lit(null.asInstanceOf[String]).as("unit")))
      .when(subKey === "housename",
        struct(housename.as("value"), lit(null.asInstanceOf[String]).as("unit")))
      .when(subKey === "postcode",
        struct(postcode.as("value"), lit(null.asInstanceOf[String]).as("unit")))
      .otherwise(struct(v.as("value"), lit(null.asInstanceOf[String]).as("unit")))
  }

  /** F6 — `handle_list_keys` (clean_and_write.py:168-179):
    * `;`-separated values split + trimmed; values without `;` become a
    * singleton (untrimmed, faithfully). */
  def handleListKeys(v: Column): Column =
    when(v.contains(";"), transform(split(v, ";"), trim(_)))
      .otherwise(array(v))

  /** F7 — `handle_bools` (clean_and_write.py:182-192): lowercase;
    * yes→true, no→false. Returns a boolean column (null when not a
    * bool — callers keep the lowercased string alongside, mirroring
    * the reference's union(string|bool) fields). */
  def boolValue(v: Column): Column =
    when(lower(v) === "yes", lit(true))
      .when(lower(v) === "no", lit(false))

  /** The string face of F7: what the reference stores when the value
    * isn't yes/no — the lowercased original. */
  def boolResidual(v: Column): Column =
    when(boolValue(v).isNull, lower(v))

  /** F8 — `misc_val_edits` (clean_and_write.py:195-227), string rules
    * only (int/float promotion is [[intValue]]/[[floatValue]]).
    * Includes the reference's deliberate `kerb: rised→rasied` typo and
    * the `type` no-op (a `==` that was meant to be `=`; preserved as a
    * no-op). `is_in*` canonical lists are handled in the shaper (array
    * output).
    */
  def miscValEditsStr(k: Column, v: Column): Column =
    when(k === "shop" && v.isin("Cannabis", "Parcel_Shipping"), lower(v))
      .when(k === "inscription" &&
        v === "Inscriptions too long to input, see Description.",
        lit("Inscription's too long to input; see description."))
      .when(k === "designation", array_join(split(lower(v), "\\s+"), "_"))
      .when(k === "denomination" && v === "Non-denominational", lit("nondenominational"))
      .when(k === "access" && v === "privatem", lit("private"))
      .when(k === "kerb" && v === "rised", lit("rasied"))
      .when(k === "width" && v === "10'", lit("10 feet"))
      .when(k === "office" && v === "Whatcom_Educational_Credit_Union", lit("credit_union"))
      .otherwise(v)

  /** F8 int promotion — `int(float(v))`, truncating (clean_and_write
    * .py:218-219). try_cast: ANSI mode is on in Spark 4, so a plain
    * cast would abort the whole ingest on one unparseable value — the
    * null-on-bad-input contract documented on [[floatValue]]. */
  def intValue(v: Column): Column = v.try_cast("double").try_cast("long")

  /** F8 float promotion — with the `building:levels "3s"→3` special
    * case and the quote-char guard on `maxheight` (clean_and_write
    * .py:220-226: values containing a quote char stay strings).
    *
    * Documented deviation: the reference's TO_FLOAT branch only ever
    * calls `float()` for `maxheight` — the other listed keys fall
    * through unconverted (the list's stated intent, "keys to store as
    * floats", is implemented for one key). We promote the whole list,
    * which is the intended semantics per SURVEY §7.4.5's policy.
    * Likewise unparseable numerics yield null here where the
    * reference's bare `int(float(v))` would raise. */
  def floatValue(k: Column, v: Column): Column =
    when(k === "building:levels" && v === "3s", lit(3.0))
      .when(k === "maxheight" && (v.contains("\"") || v.contains("'")),
        lit(null).cast("double"))
      .otherwise(v.try_cast("double"))

  /** F9 — the key-fix pipeline (clean_and_write.py:283-299), applied
    * to keys that are not in the tiger/gnis/nist passthrough
    * namespaces: strip `contact:` prefix, strip a trailing `_<digit>`,
    * rename via WrongKeyMap. (The `gnis:ST_alph` rename and
    * `gnis:County_num` zero-pad are namespace-internal fixes applied
    * in the shaper before the passthrough check, as in the reference.)
    */
  def fixKey(k: Column): Column = {
    val noContact = when(split(k, ":").getItem(0) === "contact",
      array_join(slice(split(k, ":"), 2, 100), ":")).otherwise(k)
    val noSubnum = when(noContact.rlike("_\\d$"),
      noContact.substr(lit(1), length(noContact) - 2)).otherwise(noContact)
    coalesce(mapLookup(WrongKeyMap, noSubnum), noSubnum)
  }

  /** P6 — problem-character key filter (clean_and_write.py:14,283). */
  def hasProblemChars(k: Column): Column = k.rlike(ProblemChars)
}
