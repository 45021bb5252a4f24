package graft.util

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Json._

/** Property tests for the JSON kernel behind the CDC decodes: for any
  * AST, `parse(write(v)) == v` (field order and raw numeric literals are
  * part of equality), and `write` is injective enough to round-trip
  * twice (`write ∘ parse ∘ write = write`). */
class JsonPropSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // strings across the escape-relevant space: controls, quotes,
  // backslashes, non-ASCII BMP chars
  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('"', '\\', '/', '\b', '\f', '\n', '\r', '\t', ' '),
    1 -> Gen.choose(0x00.toChar, 0x1f.toChar),
    1 -> Gen.oneOf('é', 'ß', 'あ', '∀', ' '))).map(_.mkString)

  // raw numeric literals in canonical JSON grammar (what a writer that
  // preserves wire literals must round-trip verbatim)
  private val genNum: Gen[String] = for {
    neg <- Gen.oneOf("", "-")
    int <- Gen.oneOf(Gen.const("0"),
      Gen.chooseNum(1L, Long.MaxValue).map(_.toString))
    frac <- Gen.oneOf(Gen.const(""),
      Gen.nonEmptyListOf(Gen.numChar).map("." + _.mkString))
    exp <- Gen.oneOf(Gen.const(""), for {
      e <- Gen.oneOf("e", "E")
      s <- Gen.oneOf("", "+", "-")
      d <- Gen.nonEmptyListOf(Gen.numChar).map(_.mkString)
    } yield e + s + d)
  } yield neg + int + frac + exp

  private def genVal(depth: Int): Gen[JVal] =
    if (depth <= 0)
      Gen.oneOf(
        genStr.map(JStr), genNum.map(JNum),
        Gen.oneOf(JBool(true), JBool(false), JNull))
    else Gen.frequency(
      3 -> genStr.map(JStr),
      2 -> genNum.map(JNum),
      1 -> Gen.oneOf(JBool(true), JBool(false), JNull),
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, genVal(depth - 1)).map(xs => JArr(xs.toVector))),
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.zip(genStr, genVal(depth - 1)))
          .map(fs => JObj(fs.toVector))))

  test("parse ∘ write = identity for arbitrary ASTs (order + literals preserved)") {
    check(Prop.forAll(genVal(4)) { v =>
      Json.parse(Json.write(v)) == v
    })
  }

  test("write ∘ parse is idempotent on writer output") {
    check(Prop.forAll(genVal(4)) { v =>
      val s = Json.write(v)
      Json.write(Json.parse(s)) == s
    })
  }

  test("parse accepts arbitrary inter-token whitespace") {
    check(Prop.forAll(genVal(3)) { v =>
      val s = Json.write(v)
      // inject whitespace after every structural comma/colon/bracket —
      // safe because writer output has no whitespace of its own outside
      // string literals, which we skip by tracking quote state
      val b = new StringBuilder
      var inStr = false
      var esc = false
      s.foreach { c =>
        b.append(c)
        if (inStr) {
          if (esc) esc = false
          else if (c == '\\') esc = true
          else if (c == '"') inStr = false
        } else if (c == '"') inStr = true
        else if (c == ',' || c == ':' || c == '{' || c == '[') b.append(" \t\n\r")
      }
      Json.parse(b.toString) == v
    })
  }
}
