package graft.osm

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the cleaning library (SURVEY.md §5's test plan):
  * idempotence and format invariants of phone cleaning, list-split
  * count law, hash non-negativity. ScalaCheck drives generation; the
  * properties evaluate through the real Column expressions in batched
  * DataFrames (one Spark job per property, not per case).
  */
class CleanPropsSpec extends SparkSpec {
  import spark.implicits._

  private def phoneBatch(ins: Seq[String]): Seq[String] =
    ins.toDF("v").select(CleanFns.formatPhone(col("v"))).as[String].collect().toSeq

  private val digitChunk = Gen.chooseNum(0, 9999).map(_.toString)
  private val sep = Gen.oneOf(" ", "-", ".", ") ", " (", "")
  private val rawPhone: Gen[String] = for {
    cc <- Gen.oneOf("", "+1 ", "1-")
    a <- Gen.chooseNum(200, 999)
    b <- Gen.chooseNum(200, 999)
    c <- Gen.chooseNum(0, 9999)
    s1 <- sep; s2 <- sep
    ext <- Gen.oneOf("", " ext. 12", " x9")
  } yield s"$cc$a$s1$b$s2${"%04d".format(c)}$ext"

  private def check(name: String, prop: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, s"$name: $r")
  }

  /** sample() can return None under suchThat retries — draw until it
    * doesn't (bounded; these generators are not sparse). */
  private def draw[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  test("formatPhone is idempotent on generated dirty phones") {
    val inputs = draw(Gen.listOfN(200, rawPhone))
    val once = phoneBatch(inputs)
    val twice = phoneBatch(once)
    assert(once == twice)
  }

  test("formatPhone output always matches the target format (+ optional ext)") {
    val inputs = draw(Gen.listOfN(200, rawPhone))
    val re = "^\\+1-\\d{3}-\\d{3}-\\d{4,}( x\\d+)?$".r
    val out = phoneBatch(inputs)
    val bad = inputs.zip(out).filterNot { case (_, o) => re.findFirstIn(o).isDefined }
    assert(bad.isEmpty, s"non-conforming: ${bad.take(3)}")
  }

  test("handleListKeys: element count equals separator count + 1; " +
    "singleton law for ;-free values") {
    val token = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(8))
    val listVal = for {
      n <- Gen.chooseNum(1, 6)
      ts <- Gen.listOfN(n, token)
    } yield ts.mkString("; ")
    val inputs = draw(Gen.listOfN(150, listVal))
    val out = inputs.toDF("v").select(CleanFns.handleListKeys(col("v")))
      .as[Seq[String]].collect().toSeq
    inputs.zip(out).foreach { case (in, o) =>
      assert(o.length == in.count(_ == ';') + 1, s"$in -> $o")
      if (!in.contains(";")) assert(o == Seq(in))
    }
  }

  test("md5Long is always in [0, 2^60)") {
    check("md5Long range", Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = graft.functions.Fns.md5LongLocal(s)
      h >= 0L && h < (1L << 60)
    })
  }
}
