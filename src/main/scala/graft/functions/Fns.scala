package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-internal column combinators shared by the operator modules.
  *
  * Everything here is deterministic and engine-portable: the same value
  * is computable in ANSI-ish SQL (DuckDB oracle) from the same inputs,
  * which is what makes MinHash/LSH/fingerprint operators hash-checkable
  * across engines. All combinators are Catalyst expressions (no UDFs),
  * so they stay inside whole-stage codegen where Spark supports it.
  */
object Fns {

  /** Deterministic 60-bit non-negative hash of a string, as a long:
    * first 15 hex digits of md5. Portable: DuckDB computes the identical
    * value as `('0x' || substr(md5(x),1,15))::BIGINT`. Used as the hash
    * family foundation for MinHash ("seed:value"), SimHash, LSH planes
    * and fingerprints.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Same, seeded: h_seed(x) = md5Long(seed || ':' || x). */
  def md5LongSeeded(seed: Column, c: Column): Column =
    md5Long(concat(seed.cast("string"), lit(":"), c.cast("string")))

  /** Driver-side md5Long — bit-identical to [[md5Long]]; used to
    * precompute literal constants (e.g. LSH hyperplanes) once instead of
    * re-hashing per row on the executors.
    */
  def md5LongLocal(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Sequential left-to-right dot product of two double arrays.
    * Accumulation order is pinned (foldLeft semantics of `aggregate`),
    * so the result is bit-identical to DuckDB's sequential
    * `list_sum(list_transform(...))` over the same doubles.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm of a double array (sequential accumulation). */
  def l2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double arrays, rounded to 6 places so the
    * cross-engine compare is insensitive to sub-ulp accumulation noise.
    */
  def cosine6(a: Column, b: Column): Column =
    round(dot(a, b) / (l2(a) * l2(b)), 6)

  /** Whitespace tokens of a text column. */
  def toks(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles (n=2) of a token array, as strings.
    * The standard MinHash input unit: local-word-order-sensitive but
    * robust to global reordering.
    */
  def bigramShingles(tokens: Column): Column =
    array_distinct(
      transform(
        sequence(lit(1), size(tokens) - 1),
        i => concat(element_at(tokens, i), lit(" "), element_at(tokens, i + 1))))

  /** k MinHash values of a shingle array: for each seed 0..k-1 the
    * minimum of the seeded hash over the shingles. One pass per seed —
    * at scale this is a narrow map, no shuffle.
    */
  def minhashes(shingles: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      s => array_min(transform(shingles, x => md5LongSeeded(s, x))))

  /** Jaccard similarity of two pre-deduplicated string arrays. Exact
    * integer ratio — identical across engines.
    */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
