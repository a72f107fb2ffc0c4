package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel for Jaro-Winkler similarity, shared by the interpreted
  * and generated paths of [[JaroWinklerSim]].
  *
  * The exact variant is pinned to DuckDB's `jaro_winkler_similarity`
  * (the oracle engine), bit-for-bit — verified on a probe set spanning
  * the classic fixtures (MARTHA/MARHTA, DIXON/DICKSONX), transposition
  * cases, and the boost-threshold boundary:
  *   - either side empty → 0.0 (including both empty — NOT 1.0);
  *   - match window = max(|a|,|b|)/2 - 1, floored at 0;
  *   - transpositions t = (half-transposition count)/2, integer;
  *   - jaro = (m/|a| + m/|b| + (m-t)/m) / 3, evaluated left-to-right
  *     in IEEE doubles (this exact association order is part of the
  *     cross-engine contract, like [[DotProduct]]'s accumulator);
  *   - the Winkler prefix boost applies ONLY when jaro > 0.7:
  *     jw = jaro + p*0.1*(1 - jaro), p = common prefix capped at 4.
  *
  * Operates on UTF-16 code units of the decoded string; the engine's
  * inputs (entity names) are ASCII, where code unit = code point =
  * DuckDB's byte, so the two engines compare identical sequences.
  */
object JaroWinklerKernel {

  def similarity(a: String, b: String): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var j = lo
      var matched = false
      while (j < hi && !matched) {
        if (!m2(j) && a.charAt(i) == b.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var p = 0
      val pmax = math.min(math.min(l1, l2), 4)
      while (p < pmax && a.charAt(p) == b.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    } else j
  }

  /** Entry point for codegen (UTF8String in; null-safe at the
    * expression layer, never called with null). */
  def sim(a: UTF8String, b: UTF8String): Double =
    similarity(a.toString, b.toString)
}

/** Native Catalyst expression for Jaro-Winkler string similarity.
  *
  * Why a custom expression: Spark ships `levenshtein` but no
  * Jaro-Winkler, and the entity-resolution scoring path (er2) runs it
  * over every blocked name pair — a hot inner loop that must stay
  * inside whole-stage codegen. `doGenCode` emits one static call, so
  * the blocked self-join's scoring projection compiles into the same
  * generated stage as the join, exactly like [[DotProduct]] in the
  * similarity family.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerKernel.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.JaroWinklerKernel.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
