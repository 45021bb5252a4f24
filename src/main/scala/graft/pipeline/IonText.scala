package graft.pipeline

/** Amazon Ion TEXT → JSON converter (kernel behind `parse_ion`
  * parity — reference parse-json-processor/.../ParseIonProcessor, which
  * delegates to ion-java; that jar is absent offline, so this implements
  * the DOCUMENTED subset covering Ion-encoded log events:
  *
  *  - annotations `foo::value` stripped (like IonJsonConverter);
  *  - unquoted symbols (values and field names) → JSON strings;
  *  - 'single-quoted symbols' → JSON strings (with re-escaping);
  *  - timestamps `2026-01-01T00:00:00Z` → JSON strings;
  *  - typed nulls `null.int` → null; `nan`/`+inf`/`-inf` → null
  *    (JSON has no representation — same choice Jackson's Ion mapper
  *    makes in lossy-JSON mode);
  *  - hex ints `0x1F` → decimal; decimal exponent `d` → `e`;
  *  - s-expressions `(a + b)` → JSON arrays of symbols;
  *  - blobs/clobs `{{ ... }}` → the payload as a JSON string;
  *  - line and block comments stripped.
  *
  * NOT covered (documented): long strings `'''…'''`, shared symbol
  * tables, binary Ion (the codec layer's job).
  */
object IonText {

  def toJson(ion: String): String = {
    if (ion == null) return null
    val s = ion
    val out = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    val n = s.length

    def isIdentStart(c: Char) = c.isLetter || c == '_' || c == '$'
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'

    // strips whitespace AND comments; output is canonical compact JSON
    def skipWs(): Unit = {
      var more = true
      while (more) {
        more = false
        while (i < n && s.charAt(i).isWhitespace) i += 1
        if (i + 1 < n && s.charAt(i) == '/' && s.charAt(i + 1) == '/') {
          while (i < n && s.charAt(i) != '\n') i += 1
          more = true
        } else if (i + 1 < n && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
          i += 2
          while (i + 1 < n && !(s.charAt(i) == '*' && s.charAt(i + 1) == '/')) i += 1
          i = math.min(i + 2, n)
          more = true
        }
      }
    }

    def esc(raw: String): String = raw.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    // emits one value (recursively for containers); inSexp converts
    // operator runs to quoted strings
    def value(inSexp: Boolean): Unit = {
      skipWs()
      if (i >= n) return
      val c = s.charAt(i)
      c match {
        case '{' if i + 1 < n && s.charAt(i + 1) == '{' => // blob/clob
          val close = s.indexOf("}}", i + 2)
          val body0 = s.substring(i + 2, if (close < 0) n else close).trim
          val body = if (body0.startsWith("\"") && body0.endsWith("\"") && body0.length >= 2)
            body0.substring(1, body0.length - 1) else body0
          out.append('"').append(esc(body)).append('"')
          i = if (close < 0) n else close + 2
        case '{' => container('{', '}', inSexp = false)
        case '[' => container('[', ']', inSexp = false)
        case '(' => // sexp → array
          i += 1
          out.append('[')
          var first = true
          skipWsNoEmit()
          while (i < n && s.charAt(i) != ')') {
            if (!first) out.append(',')
            first = false
            value(inSexp = true)
            skipWsNoEmit()
          }
          if (i < n) i += 1
          out.append(']')
        case '"' => quoted('"')
        case '\'' => // quoted symbol → string
          val sb = new java.lang.StringBuilder
          i += 1
          while (i < n && s.charAt(i) != '\'') {
            if (s.charAt(i) == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
            else { sb.append(s.charAt(i)); i += 1 }
          }
          i += 1
          maybeAnnotationOrEmit(sb.toString)
        case '+' | '-' if s.startsWith("+inf", i) || s.startsWith("-inf", i) =>
          out.append("null"); i += 4
        case d if d.isDigit ||
            ((d == '-' || d == '+') && i + 1 < n && s.charAt(i + 1).isDigit) =>
          number()
        case x if isIdentStart(x) =>
          val start = i
          while (i < n && isIdentChar(s.charAt(i))) i += 1
          maybeAnnotationOrEmit(s.substring(start, i))
        case op if inSexp => // operator symbol inside a sexp
          val start = i
          while (i < n && !s.charAt(i).isWhitespace && !"()[]{},".contains(s.charAt(i))) i += 1
          out.append('"').append(esc(s.substring(start, i))).append('"')
        case other => // pass through (tolerant)
          out.append(other); i += 1
      }
    }

    def skipWsNoEmit(): Unit = skipWs()

    // after reading a bare/quoted symbol: annotation? field name? value?
    def maybeAnnotationOrEmit(word: String): Unit = {
      val save = i
      skipWsNoEmit()
      if (i + 1 < n && s.charAt(i) == ':' && s.charAt(i + 1) == ':') {
        i += 2 // annotation — drop it, emit the annotated value instead
        value(inSexp = false)
      } else if (i < n && s.charAt(i) == ':') {
        i += 1 // field name
        out.append('"').append(esc(word)).append("\":")
        value(inSexp = false)
      } else {
        i = save
        word match {
          case "true" | "false" | "null" => out.append(word)
          case "nan" | "inf" => out.append("null")
          case w => out.append('"').append(esc(w)).append('"')
        }
        // typed null: null.int — consume the .type suffix
        if (word == "null" && i < n && s.charAt(i) == '.') {
          i += 1
          while (i < n && isIdentChar(s.charAt(i))) i += 1
        }
      }
    }

    def quoted(q: Char): Unit = {
      out.append('"'); i += 1
      while (i < n && s.charAt(i) != q) {
        if (s.charAt(i) == '\\' && i + 1 < n) { out.append(s.charAt(i)).append(s.charAt(i + 1)); i += 2 }
        else { out.append(s.charAt(i)); i += 1 }
      }
      out.append('"'); i += 1
    }

    def number(): Unit = {
      val start = i
      if (s.charAt(i) == '-' || s.charAt(i) == '+') i += 1
      if (i + 1 < n && s.charAt(i) == '0' && (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X')) {
        i += 2
        val h0 = i
        while (i < n && (s.charAt(i).isDigit || "abcdefABCDEF".contains(s.charAt(i)))) i += 1
        val v = java.lang.Long.parseLong(s.substring(h0, i), 16)
        out.append(if (s.charAt(start) == '-') -v else v)
        return
      }
      val digs0 = i
      while (i < n && s.charAt(i).isDigit) i += 1
      if (i - digs0 == 4 && i < n && (s.charAt(i) == '-' || s.charAt(i) == 'T')) {
        // Ion timestamp: 2026-…, 2026T — consume the timestamp charset
        while (i < n && (s.charAt(i).isDigit || ":TZ+-.".contains(s.charAt(i)))) i += 1
        out.append('"').append(esc(s.substring(start, i))).append('"')
      } else {
        if (i < n && s.charAt(i) == '.') {
          i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        if (i < n && "eEdD".contains(s.charAt(i))) {
          i += 1
          if (i < n && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
          while (i < n && s.charAt(i).isDigit) i += 1
        }
        out.append(s.substring(start, i).stripSuffix(".")
          .replace('d', 'e').replace('D', 'E').stripPrefix("+"))
      }
    }

    def container(open: Char, close: Char, inSexp: Boolean): Unit = {
      out.append(open); i += 1
      var first = true
      skipWsNoEmit()
      while (i < n && s.charAt(i) != close) {
        if (s.charAt(i) == ',') { i += 1; skipWsNoEmit() }
        else {
          if (!first) out.append(',')
          first = false
          value(inSexp)
          skipWsNoEmit()
        }
      }
      if (i < n) i += 1
      out.append(close)
    }

    skipWs()
    value(inSexp = false)
    out.toString.trim
  }
}
