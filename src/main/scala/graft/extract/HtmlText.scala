package graft.extract

import java.nio.charset.StandardCharsets

/** Pure-Scala deterministic HTML→text extraction.
  *
  * This is the engine's re-expression of the reference extractor
  * (/root/reference/data-prepper-plugins/saas-source-plugins/confluence-source/
  * src/main/java/org/opensearch/dataprepper/plugins/source/confluence/utils/
  * HtmlToTextConversionUtil.java:44-52):
  *
  * {{{
  *   Document document = Jsoup.parse(html);
  *   document.select("script, style").remove();
  *   return document.text();
  * }}}
  *
  * jsoup is not available offline, so this object IS the normative spec for
  * both sides of the byte-identity contract (SURVEY.md §1.4): the synthetic
  * corpus generator stores `text = HtmlText.extract(html)` at synthesis
  * time, and the distributed extraction stage re-runs the same function and
  * verifies equality per url. Semantics (jsoup `Document.text()` over the
  * constrained grammar of FIXTURES.md §1):
  *
  *  1. bytes decoded as UTF-8; null/empty → "".
  *  2. `<script>`/`<style>` elements removed with their entire content
  *     (case-insensitive tag names; attributes allowed on the open tag).
  *  3. HTML comments `<!-- … -->` removed.
  *  4. every other tag is a separator: replaced by a single space (the
  *     generator emits only block-level structure, where jsoup also
  *     separates adjacent elements with one space).
  *  5. character entities in text decoded once (no double-decode):
  *     `&amp; &lt; &gt; &quot; &apos; &nbsp;` plus numeric `&#NN;`/`&#xHH;`.
  *     `&nbsp;` → U+00A0, which is NOT whitespace for step 6.
  *  6. runs of ASCII whitespace (space, \t, \n, \f, \r) collapse to a
  *     single space; leading/trailing ASCII whitespace trimmed.
  *
  * Determinism: no locale, no charset default, no regex backtracking —
  * a single forward scan. Total: every byte sequence yields a result.
  */
object HtmlText {

  def extract(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    extract(new String(html, StandardCharsets.UTF_8))
  }

  def extract(html: String): String = {
    if (html == null || html.isEmpty) return ""
    val raw = stripTagsAndDecode(html)
    normalizeWhitespace(raw)
  }

  /** Phase 1+2: drop script/style subtrees and comments, turn every other
    * tag into a single space, decode entities in text content. */
  private def stripTagsAndDecode(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n && isTagStart(s.charAt(i + 1))) {
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          out.append(' ')
        } else {
          val nameEnd = tagNameEnd(s, i + 1)
          val name = lowerAscii(s, i + 1, nameEnd)
          if (name == "script" || name == "style") {
            // skip to matching close tag </script> / </style>
            val close = indexOfCloseTag(s, nameEnd, name)
            i = close
            out.append(' ')
          } else {
            val gt = s.indexOf('>', i + 1)
            i = if (gt < 0) n else gt + 1
            out.append(' ')
          }
        }
      } else if (c == '&') {
        i = decodeEntity(s, i, out)
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  private def isTagStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '/' || c == '!' || c == '?'

  private def tagNameEnd(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && isNameChar(s.charAt(i))) i += 1
    i
  }

  private def isNameChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  private def lowerAscii(s: String, from: Int, to: Int): String = {
    val sb = new java.lang.StringBuilder(to - from)
    var i = from
    while (i < to) {
      val c = s.charAt(i)
      sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
      i += 1
    }
    sb.toString
  }

  /** Position just past the `>` of `</name ...>`, or end of string. */
  private def indexOfCloseTag(s: String, from: Int, name: String): Int = {
    val needle = "</" + name
    var i = from
    val n = s.length
    while (i < n) {
      val at = indexOfIgnoreCase(s, needle, i)
      if (at < 0) return n
      val after = at + needle.length
      // must be followed by '>' or whitespace-then-'>' to count as a close tag
      if (after < n && (s.charAt(after) == '>' || isAsciiSpace(s.charAt(after)))) {
        val gt = s.indexOf('>', after)
        return if (gt < 0) n else gt + 1
      }
      i = at + 1
    }
    n
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = from
    while (i + m <= n) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val a = s.charAt(i + j); val b = needle.charAt(j)
        val al = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        val bl = if (b >= 'A' && b <= 'Z') (b + 32).toChar else b
        if (al != bl) ok = false
        j += 1
      }
      if (ok) return i
      i += 1
    }
    -1
  }

  /** Decode one entity starting at s(i)=='&'; append result, return next i.
    * Unknown/malformed entities are emitted literally (jsoup behavior for
    * unrecognized sequences in text). */
  private def decodeEntity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    val semi = {
      var j = i + 1
      val cap = math.min(n, i + 12) // entities we accept are short
      while (j < cap && s.charAt(j) != ';') j += 1
      if (j < cap && j < n && s.charAt(j) == ';') j else -1
    }
    if (semi < 0) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    val decoded: Int = body match {
      case "amp"  => '&'
      case "lt"   => '<'
      case "gt"   => '>'
      case "quot" => '"'
      case "apos" => '\''
      case "nbsp" => 0xa0
      case _ =>
        if (body.length > 1 && body.charAt(0) == '#') {
          val num = body.substring(1)
          try {
            val cp =
              if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                Integer.parseInt(num.substring(1), 16)
              else Integer.parseInt(num, 10)
            if (cp >= 0 && cp <= 0x10ffff && !(cp >= 0xd800 && cp <= 0xdfff)) cp else -1
          } catch { case _: NumberFormatException => -1 }
        } else -1
    }
    if (decoded < 0) { out.append('&'); i + 1 }
    else { out.appendCodePoint(decoded); semi + 1 }
  }

  private def isAsciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Phase 3: collapse ASCII whitespace runs, trim ends. U+00A0 preserved. */
  private def normalizeWhitespace(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (isAsciiSpace(c)) pendingSpace = true
      else {
        if (pendingSpace && started) out.append(' ')
        out.append(c)
        pendingSpace = false
        started = true
      }
      i += 1
    }
    out.toString
  }
}
