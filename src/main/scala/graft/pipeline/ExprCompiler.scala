package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiler for the Data-Prepper expression language → Catalyst `Column`.
  *
  * Grammar parity: /root/reference/data-prepper-expression/src/main/antlr/
  * DataPrepperExpression.g4 (precedence climb at :16-143) and docs/
  * expression_syntax.md. The reference parses per event batch with
  * thread-local ANTLR parsers and walks an operand stack
  * (ParseTreeEvaluatorListener.java:39); here an expression is parsed ONCE
  * on the driver into a Column tree, and Catalyst then constant-folds,
  * pushes it down, and codegens it — per-row cost is compiled code, not an
  * interpreter (SURVEY.md §3.2).
  *
  * Supported surface (lowest → highest precedence, .g4:53-143):
  *   or | and | not | ==, != | =~, !~ | <, <=, >, >= | in, not in |
  *   typeof | + - | * / % | unary - | literals (int, float, string,
  *   true/false, null, {set, literals}) | /json/pointer or "/quoted key"
  *   field refs | functions: length(x), contains(a,b), startsWith(a,b),
  *   endsWith(a,b), join([sep,]x), substringBefore/After(x,sep),
  *   substringBeforeLast/AfterLast(x,sep), toJsonString(x),
  *   formatDateTime(x,p[,tz]), now(), generateUuid(), cidrContains(c,ip),
  *   getMetadata('/k'), hasTags('t',…), getEventType().
  *
  * Semantics notes: `==`/`!=` are null-safe like GenericEqualOperator
  * (null == null → true) → `<=>`; `=~` uses full-match like
  * java.util.regex.Matcher.matches() → pattern anchored with \A…\z.
  * The substring family follows AbstractSubstringExpressionFunction.java:
  * delimiter absent → the whole source; delimiter empty → the source.
  * Event metadata (getMetadata/hasTags/getEventType, reference
  * GetMetadataExpressionFunction.java etc.) reads the engine's `_meta`
  * struct column convention:
  * `_meta: struct<event_type: string, tags: array<string>,
  *  attributes: map<string,string>>`.
  */
object ExprCompiler {

  def compile(expr: String): Column = new Parser(expr).parseExpression()

  private final class Parser(src: String) {
    private var pos = 0

    def parseExpression(): Column = {
      val c = parseOr()
      skipWs()
      require(pos >= src.length, s"trailing input at $pos in: $src")
      c
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (eatKeyword("or")) left = left || parseAnd()
      left
    }

    private def parseAnd(): Column = {
      var left = parseNot()
      while (eatKeyword("and")) left = left && parseNot()
      left
    }

    private def parseNot(): Column =
      if (eatKeyword("not")) !parseNot() else parseEquality()

    private def parseEquality(): Column = {
      var left = parseRelational()
      var done = false
      while (!done) {
        skipWs()
        if (eat("==")) left = left <=> parseRelational()
        else if (eat("!=")) left = !(left <=> parseRelational())
        else if (eat("=~")) left = left.rlike(anchor(parseStringLiteralText()))
        else if (eat("!~")) left = !left.rlike(anchor(parseStringLiteralText()))
        else if (eatKeyword("in")) left = parseSetMembership(left, negate = false)
        else if (eatKeyword("typeof")) left = parseTypeOf(left)
        else {
          // `not in` must be eaten as one unit: a bare `not` here belongs
          // to an enclosing `not <expr>`, so rewind if `in` doesn't follow.
          val save = pos
          if (eatKeyword("not") && eatKeyword("in"))
            left = parseSetMembership(left, negate = true)
          else { pos = save; done = true }
        }
      }
      left
    }

    /** `x typeof integer` (DataPrepperExpression.g4 typeOfOperator): maps
      * the reference's event-value type names onto the static schema via
      * the foldable [[graft.functions.TypeNameOf]] — with fixed schemas
      * the whole comparison constant-folds to true/false. */
    private def parseTypeOf(left: Column): Column = {
      skipWs()
      val start = pos
      while (pos < src.length && src.charAt(pos).isLetter) pos += 1
      val tn = src.substring(start, pos)
      val actual = graft.functions.TypeNameOf(left)
      tn match {
        case "integer" => actual.isin("int", "bigint")
        case "long" => actual === "bigint"
        case "double" => actual.isin("double", "float")
        case "boolean" => actual === "boolean"
        case "string" => actual === "string"
        case "map" => actual.startsWith("map") || actual.startsWith("struct")
        case "array" => actual.startsWith("array")
        case other => throw new IllegalArgumentException(s"typeof: unknown type $other")
      }
    }

    private def anchor(re: String): String = "\\A(?:" + re + ")\\z"

    private def parseSetMembership(left: Column, negate: Boolean): Column = {
      skipWs()
      require(eat("{"), s"expected set literal at $pos in: $src")
      val items = scala.collection.mutable.ArrayBuffer.empty[Any]
      var first = true
      while ({ skipWs(); !eat("}") }) {
        if (!first) { require(eat(","), s"expected , at $pos"); skipWs() }
        items += parseLiteralValue()
        first = false
      }
      val in = left.isin(items.toSeq: _*)
      if (negate) !in else in
    }

    private def parseRelational(): Column = {
      var left = parseAdditive()
      skipWs()
      if (eat("<=")) left = left <= parseAdditive()
      else if (eat(">=")) left = left >= parseAdditive()
      else if (!lookahead("<=") && eatNotFollowedBy('<', '=')) left = left < parseAdditive()
      else if (!lookahead(">=") && eatNotFollowedBy('>', '=')) left = left > parseAdditive()
      left
    }

    private def parseAdditive(): Column = {
      var left = parseMultiplicative()
      var done = false
      while (!done) {
        skipWs()
        if (eat("+")) left = left + parseMultiplicative()
        else if (eatNotFollowedBy('-', '-')) left = left - parseMultiplicative()
        else done = true
      }
      left
    }

    private def parseMultiplicative(): Column = {
      var left = parseUnary()
      var done = false
      while (!done) {
        skipWs()
        if (eat("*")) left = left * parseUnary()
        else if (eat("/") && !atFieldRef()) left = left / parseUnary()
        else if (lastEatWasRewound) { done = true }
        else if (eat("%")) left = left % parseUnary()
        else done = true
      }
      left
    }

    // '/' is ambiguous: division vs json-pointer. After `eat("/")`, if what
    // follows looks like a field path char we rewind and stop.
    private var lastEatWasRewound = false
    private def atFieldRef(): Boolean = {
      lastEatWasRewound = false
      if (pos < src.length && (src.charAt(pos).isLetter || src.charAt(pos) == '_')) {
        pos -= 1 // un-eat the '/'
        lastEatWasRewound = true
        true
      } else false
    }

    private def parseUnary(): Column = {
      skipWs()
      if (eat("-")) negate(parsePrimary()) else parsePrimary()
    }

    private def parsePrimary(): Column = {
      skipWs()
      if (eat("(")) {
        val c = parseOr()
        skipWs(); require(eat(")"), s"expected ) at $pos in: $src")
        c
      } else if (peek == '/' || (peek == '"' && pos + 1 < src.length && src.charAt(pos + 1) == '/')) {
        // grammar disambiguation (.g4:234,274 — token order wins): a
        // double-quoted token starting with '/' is an EscapedJsonPointer;
        // any other double-quoted token is a String literal
        fieldRef()
      } else if (peek.isDigit) {
        numberLiteral()
      } else if (peek == '\'' || peek == '"') {
        lit(parseStringLiteralText())
      } else if (eatKeyword("true")) lit(true)
      else if (eatKeyword("false")) lit(false)
      else if (eatKeyword("null")) lit(null)
      else functionCall()
    }

    private def fieldRef(): Column = {
      if (eat("\"")) {
        val sb = new StringBuilder
        while (peek != '"') { sb += src.charAt(pos); pos += 1 }
        pos += 1
        pointerToCol(sb.toString)
      } else {
        require(eat("/"), s"expected field ref at $pos in: $src")
        val sb = new StringBuilder("/")
        while (pos < src.length && (src.charAt(pos).isLetterOrDigit ||
            "_-/".contains(src.charAt(pos)))) { sb += src.charAt(pos); pos += 1 }
        pointerToCol(sb.toString)
      }
    }

    /** JSON pointer `/a/b` → nested col("a.b"); leading '/' optional. */
    private def pointerToCol(p: String): Column = {
      val parts = p.split('/').filter(_.nonEmpty)
      parts.tail.foldLeft(col(parts.head))((c, f) => c.getField(f))
    }

    private def numberLiteral(): Column = {
      val start = pos
      while (pos < src.length && (src.charAt(pos).isDigit || src.charAt(pos) == '.')) pos += 1
      val s = src.substring(start, pos)
      if (s.contains('.')) lit(s.toDouble) else lit(s.toLong)
    }

    private def parseLiteralValue(): Any = {
      skipWs()
      if (peek == '\'' || peek == '"') parseStringLiteralText()
      else if (peek.isDigit || peek == '-') {
        val start = pos
        if (peek == '-') pos += 1
        while (pos < src.length && (src.charAt(pos).isDigit || src.charAt(pos) == '.')) pos += 1
        val s = src.substring(start, pos)
        if (s.contains('.')) s.toDouble else s.toLong
      } else if (eatKeyword("true")) true
      else if (eatKeyword("false")) false
      else throw new IllegalArgumentException(s"bad literal at $pos in: $src")
    }

    /** String literal — the reference grammar's DOUBLEQUOTE form
      * (.g4:274); single quotes also accepted as a convenience. */
    private def parseStringLiteralText(): String = {
      skipWs()
      val q = if (eat("'")) '\'' else { require(eat("\""), s"expected string at $pos in: $src"); '"' }
      val sb = new StringBuilder
      while (peek != q) {
        if (peek == '\\' && pos + 1 < src.length) { pos += 1; sb += src.charAt(pos) }
        else sb += src.charAt(pos)
        pos += 1
      }
      pos += 1
      sb.toString
    }

    /** A parsed function argument: the Column, plus the raw text when the
      * argument was a plain string literal (separators/patterns/tags must
      * reach Spark builtins as Scala strings, not Columns). */
    private final case class Arg(col: Column, raw: Option[String])

    private def parseArg(): Arg = {
      skipWs()
      // a double quote opens a raw string arg unless it quotes a pointer
      if (peek == '\'' ||
          (peek == '"' && !(pos + 1 < src.length && src.charAt(pos + 1) == '/'))) {
        val save = pos
        val text = parseStringLiteralText()
        skipWs()
        if (peek == ',' || peek == ')') Arg(lit(text), Some(text))
        else { pos = save; Arg(parseOr(), None) } // literal-headed expression
      } else Arg(parseOr(), None)
    }

    /** ExpressionFunction parity (SURVEY.md §2.7 function list; reference
      * impls under data-prepper-expression/.../[*]ExpressionFunction.java). */
    private def functionCall(): Column = {
      val start = pos
      while (pos < src.length && (src.charAt(pos).isLetterOrDigit || src.charAt(pos) == '_')) pos += 1
      val name = src.substring(start, pos)
      require(name.nonEmpty, s"unexpected char '${peek}' at $pos in: $src")
      skipWs(); require(eat("("), s"expected ( after $name at $pos")
      val args = scala.collection.mutable.ArrayBuffer.empty[Arg]
      while ({ skipWs(); !eat(")") }) {
        if (args.nonEmpty) { require(eat(","), s"expected , at $pos"); skipWs() }
        args += parseArg()
      }
      def rawStr(i: Int): String = args(i).raw.getOrElse(
        throw new IllegalArgumentException(
          s"$name: argument ${i + 1} must be a string literal in: $src"))
      name match {
        case "length" => length(args(0).col)
        case "contains" => args(0).col.contains(args(1).col)
        case "startsWith" => args(0).col.startsWith(args(1).col)
        case "endsWith" => args(0).col.endsWith(args(1).col)
        // join(source) | join(delimiter, source) — JoinExpressionFunction.java:29
        // (after string-literal unescaping, a remaining `\,` means a
        // literal comma in the delimiter)
        case "join" =>
          if (args.size == 1) concat_ws(",", args(0).col)
          else concat_ws(rawStr(0).replace("\\,", ","), args(1).col)
        case "substringBefore" => substringFn(args(0).col, rawStr(1), SubBefore)
        case "substringAfter" => substringFn(args(0).col, rawStr(1), SubAfter)
        case "substringBeforeLast" => substringFn(args(0).col, rawStr(1), SubBeforeLast)
        case "substringAfterLast" => substringFn(args(0).col, rawStr(1), SubAfterLast)
        case "toJsonString" => to_json(args(0).col)
        // formatDateTime(time, pattern[, destTz]) —
        // FormatDateTimeExpressionFunction.java:28 (default zone UTC; the
        // session zone is pinned UTC, so only an explicit tz shifts)
        case "formatDateTime" =>
          val ts = args(0).col.cast("timestamp")
          val shifted = if (args.size > 2) from_utc_timestamp(ts, rawStr(2)) else ts
          date_format(shifted, rawStr(1))
        case "now" => current_timestamp()
        case "generateUuid" => expr("uuid()")
        case "cidrContains" => cidrContains(args.map(_.col).toSeq)
        // event-metadata functions over the `_meta` struct convention
        case "getMetadata" =>
          val key = rawStr(0).trim.stripPrefix("/")
          col("_meta").getField("attributes").getItem(key)
        case "hasTags" =>
          args.indices.map(i => array_contains(col("_meta").getField("tags"), rawStr(i)))
            .reduce(_ && _)
        case "getEventType" => col("_meta").getField("event_type")
        case other => throw new IllegalArgumentException(s"unknown function $other")
      }
    }

    /** AbstractSubstringExpressionFunction.java semantics: delimiter empty
      * → source unchanged; delimiter absent from source → source unchanged;
      * null source → null (Column null propagation). */
    private def substringFn(s: Column, delim: String, mode: SubMode): Column = {
      if (delim.isEmpty) return s
      val d = lit(delim)
      mode match {
        // substring_index returns the whole string when sep is absent —
        // exactly the reference's indexOf == -1 branch
        case SubBefore => substring_index(s, delim, 1)
        case SubAfterLast => substring_index(s, delim, -1)
        case SubAfter =>
          when(instr(s, delim) > 0,
            s.substr(instr(s, delim) + lit(delim.length), length(s)))
            .otherwise(s)
        case SubBeforeLast =>
          when(s.contains(d),
            s.substr(lit(1),
              length(s) - length(substring_index(s, delim, -1)) - lit(delim.length)))
            .otherwise(s)
      }
    }

    /** cidrContains('10.0.0.0/8', ip): bit-twiddled on parsed IPv4 longs —
      * pure Column math, codegen'd (no UDF). */
    private def cidrContains(args: Seq[Column]): Column = {
      def ipToLong(ip: Column): Column =
        split(ip, "\\.").getItem(0).cast("long") * 16777216L +
          split(ip, "\\.").getItem(1).cast("long") * 65536L +
          split(ip, "\\.").getItem(2).cast("long") * 256L +
          split(ip, "\\.").getItem(3).cast("long")
      val cidr = args(0)
      val base = ipToLong(split(cidr, "/").getItem(0))
      val bits = split(cidr, "/").getItem(1).cast("int")
      // 2^32 − 2^(32−bits): dynamic-width prefix mask (exact in double)
      val mask = (lit(4294967296.0) -
        pow(lit(2.0), lit(32.0) - bits.cast("double"))).cast("long")
      (ipToLong(args(1)).bitwiseAND(mask)) <=> (base.bitwiseAND(mask))
    }

    // --- lexer helpers ---
    private def peek: Char = if (pos < src.length) src.charAt(pos) else ' '
    private def skipWs(): Unit = while (pos < src.length && src.charAt(pos).isWhitespace) pos += 1
    private def lookahead(s: String): Boolean = src.startsWith(s, pos)
    private def eat(s: String): Boolean = {
      skipWs()
      if (src.startsWith(s, pos)) { pos += s.length; true } else false
    }
    private def eatNotFollowedBy(c: Char, notNext: Char): Boolean = {
      skipWs()
      if (pos < src.length && src.charAt(pos) == c &&
        (pos + 1 >= src.length || src.charAt(pos + 1) != notNext)) { pos += 1; true }
      else false
    }
    private def eatKeyword(k: String): Boolean = {
      skipWs()
      if (src.startsWith(k, pos) &&
        (pos + k.length >= src.length || !src.charAt(pos + k.length).isLetterOrDigit)) {
        pos += k.length; true
      } else false
    }
  }

  private def negate(c: Column): Column = c * lit(-1)

  private sealed trait SubMode
  private case object SubBefore extends SubMode
  private case object SubAfter extends SubMode
  private case object SubBeforeLast extends SubMode
  private case object SubAfterLast extends SubMode
}
