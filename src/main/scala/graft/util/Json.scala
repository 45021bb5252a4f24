package graft.util

/** Minimal JSON kernel: a recursive-descent parser producing an ordered
  * AST plus a compact writer. Built for the CDC decoders
  * ([[graft.sources.Cdc]]), whose wire formats (DynamoDB AttributeValue
  * maps, MongoDB canonical Extended JSON) are *recursively* typed — a
  * fixed Spark `from_json` schema can't express them, so the transform
  * runs over this AST inside one codegen-friendly projection.
  *
  * Two deliberate properties the decoders depend on:
  *  - object field order is preserved (wire order in, wire order out),
  *    so decode output is deterministic given the input bytes;
  *  - numbers are kept as their raw literal text ([[Json.JNum]]), so
  *    DynamoDB `N` values (arbitrary-precision decimal strings) survive
  *    round trips without float drift.
  */
object Json {

  sealed trait JVal
  final case class JStr(s: String) extends JVal
  /** Raw numeric literal exactly as written on the wire. */
  final case class JNum(raw: String) extends JVal
  final case class JBool(b: Boolean) extends JVal
  case object JNull extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def get(k: String): Option[JVal] = fields.collectFirst { case (`k`, v) => v }
  }

  final class JsonError(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------- parser

  def parse(s: String): JVal = {
    val p = new P(s)
    p.ws()
    val v = p.value()
    p.ws()
    if (p.i < s.length) throw new JsonError(s"trailing input at ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    private def fail(m: String) = throw new JsonError(s"$m at $i")
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def ch: Char = if (i < s.length) s.charAt(i) else fail("unexpected end")
    private def expect(c: Char): Unit =
      if (ch == c) i += 1 else fail(s"expected '$c', got '$ch'")

    def value(): JVal = ch match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => lit("true"); JBool(true)
      case 'f' => lit("false"); JBool(false)
      case 'n' => lit("null"); JNull
      case c if c == '-' || (c >= '0' && c <= '9') => num()
      case c => fail(s"unexpected '$c'")
    }

    private def lit(w: String): Unit =
      if (s.regionMatches(i, w, 0, w.length)) i += w.length
      else fail(s"expected $w")

    private def num(): JNum = {
      val start = i
      if (ch == '-') i += 1
      if (ch == '0') i += 1
      else { if (!ch.isDigit) fail("digit expected"); while (i < s.length && s.charAt(i).isDigit) i += 1 }
      if (i < s.length && s.charAt(i) == '.') {
        i += 1
        if (!ch.isDigit) fail("digit expected after '.'")
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        i += 1
        if (ch == '+' || ch == '-') i += 1
        if (!ch.isDigit) fail("digit expected in exponent")
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      JNum(s.substring(start, i))
    }

    private def str(): String = {
      expect('"')
      val b = new java.lang.StringBuilder
      while (ch != '"') {
        val c = ch
        if (c == '\\') {
          i += 1
          ch match {
            case '"' => b.append('"'); i += 1
            case '\\' => b.append('\\'); i += 1
            case '/' => b.append('/'); i += 1
            case 'b' => b.append('\b'); i += 1
            case 'f' => b.append('\f'); i += 1
            case 'n' => b.append('\n'); i += 1
            case 'r' => b.append('\r'); i += 1
            case 't' => b.append('\t'); i += 1
            case 'u' =>
              i += 1
              if (i + 4 > s.length) fail("bad \\u escape")
              b.append(Integer.parseInt(s.substring(i, i + 4), 16).toChar)
              i += 4
            case e => fail(s"bad escape '\\$e'")
          }
        } else {
          if (c < ' ') fail("unescaped control char")
          b.append(c); i += 1
        }
      }
      i += 1
      b.toString
    }

    private def arr(): JArr = {
      expect('[')
      ws()
      val items = Vector.newBuilder[JVal]
      if (ch == ']') { i += 1; return JArr(items.result()) }
      var more = true
      while (more) {
        items += value()
        ws()
        if (ch == ',') { i += 1; ws() } else more = false
      }
      expect(']')
      JArr(items.result())
    }

    private def obj(): JObj = {
      expect('{')
      ws()
      val fields = Vector.newBuilder[(String, JVal)]
      if (ch == '}') { i += 1; return JObj(fields.result()) }
      var more = true
      while (more) {
        val k = str()
        ws(); expect(':'); ws()
        fields += (k -> value())
        ws()
        if (ch == ',') { i += 1; ws() } else more = false
      }
      expect('}')
      JObj(fields.result())
    }
  }

  // ------------------------------------------------------------- writer

  /** Compact serialization; field order preserved; numbers verbatim. */
  def write(v: JVal): String = {
    val b = new java.lang.StringBuilder
    w(v, b)
    b.toString
  }

  private def w(v: JVal, b: java.lang.StringBuilder): Unit = v match {
    case JStr(s) => wStr(s, b)
    case JNum(raw) => b.append(raw)
    case JBool(x) => b.append(if (x) "true" else "false")
    case JNull => b.append("null")
    case JArr(items) =>
      b.append('[')
      var first = true
      items.foreach { it =>
        if (!first) b.append(','); first = false
        w(it, b)
      }
      b.append(']')
    case JObj(fields) =>
      b.append('{')
      var first = true
      fields.foreach { case (k, fv) =>
        if (!first) b.append(','); first = false
        wStr(k, b); b.append(':'); w(fv, b)
      }
      b.append('}')
  }

  private def wStr(s: String, b: java.lang.StringBuilder): Unit = {
    b.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\b' => b.append("\\b")
        case '\f' => b.append("\\f")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      i += 1
    }
    b.append('"')
  }
}
