package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExprCompilerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 10.0, "10.0.0.5", "en"),
    (2L, "beta", 25.0, "192.168.1.9", "de"),
    (3L, "alphabet", 7.5, "10.200.0.1", "en")).toDF("id", "name", "value", "ip", "lang")

  private def ids(expr: String): Seq[Long] =
    df.filter(ExprCompiler.compile(expr)).select("id").as[Long].collect().toSeq.sorted

  test("comparisons and boolean combinators") {
    assert(ids("/value > 9") == Seq(1L, 2L))
    assert(ids("/value <= 10 and /lang == 'en'") == Seq(1L, 3L))
    assert(ids("/lang == 'de' or /value < 8") == Seq(2L, 3L))
    assert(ids("not (/lang == 'en')") == Seq(2L))
  }

  test("null-safe equality (reference GenericEqualOperator)") {
    val d = Seq((1L, Option("x")), (2L, None)).toDF("id", "v")
    val hit = d.filter(ExprCompiler.compile("/v == null")).select("id").as[Long].collect()
    assert(hit.toSeq == Seq(2L))
  }

  test("regex full-match semantics (=~ anchors like matcher.matches())") {
    assert(ids("/name =~ 'alpha'") == Seq(1L)) // NOT alphabet — full match
    assert(ids("/name =~ 'alpha.*'") == Seq(1L, 3L))
    assert(ids("/name !~ 'alpha.*'") == Seq(2L))
  }

  test("in / not in set literals") {
    assert(ids("/lang in {'en', 'fr'}") == Seq(1L, 3L))
    assert(ids("/id not in {1, 3}") == Seq(2L))
  }

  test("arithmetic with precedence") {
    assert(ids("/value * 2 + 5 > 50") == Seq(2L))
    assert(ids("/value % 5 == 0") == Seq(1L, 2L))
  }

  test("functions: length, contains, startsWith") {
    assert(ids("length(/name) == 4") == Seq(2L))
    assert(ids("contains(/name, 'bet')") == Seq(2L, 3L))
    assert(ids("startsWith(/name, 'alpha')") == Seq(1L, 3L))
  }

  test("cidrContains on IPv4") {
    assert(ids("cidrContains('10.0.0.0/8', /ip)") == Seq(1L, 3L))
    assert(ids("cidrContains('192.168.0.0/16', /ip)") == Seq(2L))
  }
}
