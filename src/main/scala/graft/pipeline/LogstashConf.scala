package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.pipeline.PipelineYaml.{PipelineDef, PluginDef, SinkDef}

/** Logstash `.conf` → pipeline-model converter — the front-end the
  * reference ships as its `data-prepper-logstash-configuration` module
  * (`LogstashConfigConverter.java:34`): parse the Logstash config grammar,
  * map each Logstash plugin to its engine equivalent through the module's
  * published attribute mappings (`*.mapping.yaml` resources +
  * `mapping/mutate/MutateMapper.java:34`), and hand the result to the SAME
  * [[PipelineYaml]] compiler the YAML front-end uses.
  *
  * Supported subset (the same plugins the reference maps): inputs pass
  * through to the compiler's source resolution (`file` natively; `stdin`/
  * `http` via the registered-DataFrame fallback); filters `grok`, `date`,
  * `kv`, `csv`, `drop`, `mutate` (rename/copy/add_field/remove_field/gsub/
  * lowercase/uppercase/strip/split); outputs `stdout`, `file`,
  * `opensearch`/`elasticsearch`/`amazon_es`. Logstash `[a][b]` field
  * references become `/a/b` pointers (`NestedSyntaxConverter.java:14`).
  * Filter-section conditionals (`if` / `else if` / `else`, nesting
  * included) compile to per-processor gates: the condition converts to
  * the engine expression language ([[convertCondition]]) and lands on the
  * plugin's native `*_when` option where one exists (`add_when`,
  * `copy_when`, `date_when`, `drop_when`) or on the generic row-local
  * [[Processors.GateWhen]] wrapper otherwise — the reference's converter
  * rejects conditionals outright, and real migrating configs hit them
  * first. Output-section conditionals map onto the engine's ROUTE system
  * (one synthesized route per conditional sink, guard = the branch's full
  * condition chain). Conditionals in the input section stay out of
  * subset.
  *
  * Deviation from the reference, documented: the reference's
  * `GrokMatchUtil.convertGrokMatchPattern` (`GrokMatchUtil.java:20`)
  * rebuilds a match pattern from ONLY its `%{...}` groups, silently
  * dropping literal text between captures (`"%{IP:a} - %{USER:b}"` loses
  * `" - "`). This converter preserves literals and converts just the
  * nested-syntax semantic inside each `%{...}` group — the converted
  * pipeline then matches the same lines the Logstash one did.
  */
object LogstashConf {

  /** A section item: a plugin block or a conditional. */
  sealed trait LsItem

  /** Attributes keep ORDER and DUPLICATES — Logstash allows repeated
    * attributes (`match => ...` twice in one grok, repeated
    * `remove_field`) and the reference merges them per-plugin
    * (GrokMatchAttributeHelper.mergeMatchAttributes, MutateMapper). */
  final case class LsPlugin(name: String, attrs: Seq[(String, Any)]) extends LsItem {
    def first(k: String): Option[Any] = attrs.collectFirst { case (`k`, v) => v }
    def all(k: String): Seq[Any] = attrs.collect { case (`k`, v) => v }
    def lastWins: Map[String, Any] = attrs.toMap
  }

  /** `if cond { … } else if cond { … } else { … }`. Conditions are kept as
    * raw Logstash text here; [[convertCondition]] turns each into engine
    * expression-language text at mapping time. */
  final case class LsIf(branches: Seq[(String, Seq[LsItem])],
      elseItems: Seq[LsItem]) extends LsItem

  final case class LsConfig(input: Seq[LsPlugin], filter: Seq[LsItem],
      output: Seq[LsItem])

  // --------------------------------------------------------------- parser

  /** Recursive-descent parser for the Logstash config subset: sections of
    * plugin blocks with `name => value` attributes; values are strings,
    * numbers, booleans, barewords, arrays and hashes. Comments run from
    * `#` to end of line. */
  def parse(text: String): LsConfig = {
    val p = new Parser(text)
    val sections = scala.collection.mutable.Map.empty[String, Seq[LsItem]]
    p.ws()
    while (!p.eof) {
      val section = p.ident()
      require(Set("input", "filter", "output").contains(section),
        s"unknown section '$section'")
      p.expect('{')
      val items = p.items()
      p.expect('}')
      sections(section) = sections.getOrElse(section, Seq.empty) ++ items
      p.ws()
    }
    val input = sections.getOrElse("input", Seq.empty).map {
      case pl: LsPlugin => pl
      case _: LsIf => throw new IllegalArgumentException(
        "conditionals in the input section are out of subset " +
          "(filter and output conditionals are supported)")
    }
    LsConfig(input,
      sections.getOrElse("filter", Seq.empty),
      sections.getOrElse("output", Seq.empty))
  }

  private final class Parser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = if (eof) '\u0000' else s.charAt(i)
    /** Items of one `{ … }` block: plugin blocks and conditionals. */
    def items(): Seq[LsItem] = {
      val out = Seq.newBuilder[LsItem]
      ws()
      while (peek != '}' && !eof) {
        val name = ident()
        if (name == "if") out += conditional()
        else {
          require(name != "else", "dangling 'else' without an 'if'")
          expect('{')
          val attrs = Seq.newBuilder[(String, Any)]
          ws()
          while (peek != '}') {
            val k = attrName()
            arrow()
            attrs += (k -> value())
            ws()
          }
          expect('}')
          out += LsPlugin(name, attrs.result())
        }
        ws()
      }
      out.result()
    }

    private def conditional(): LsIf = {
      val branches = Seq.newBuilder[(String, Seq[LsItem])]
      var elseItems: Seq[LsItem] = Seq.empty
      var more = true
      var first = true
      while (more) {
        if (first || tryIdent("if")) {
          val cond = conditionText()
          expect('{')
          branches += cond -> items()
          expect('}')
          more = tryIdent("else")
        } else { // bare else { … }
          expect('{')
          elseItems = items()
          expect('}')
          more = false
        }
        first = false
      }
      LsIf(branches.result(), elseItems)
    }

    /** Consume `kw` if the next identifier is exactly it; rewind otherwise. */
    private def tryIdent(kw: String): Boolean = {
      ws()
      val save = i
      if (eof || !s.charAt(i).isLetter) return false
      val id = ident()
      if (id == kw) true else { i = save; false }
    }

    /** Raw condition text up to the block-opening '{', honoring quoted
      * strings and /regex/ literals (whose bodies may contain braces). */
    private def conditionText(): String = {
      ws()
      val start = i
      var inStr: Char = ' '
      var inRegex = false
      while (!eof && !(s.charAt(i) == '{' && inStr == ' ' && !inRegex)) {
        val c = s.charAt(i)
        if (inStr != ' ') {
          if (c == '\\') i += 1 else if (c == inStr) inStr = ' '
        } else if (inRegex) {
          if (c == '\\') i += 1 else if (c == '/') inRegex = false
        } else c match {
          case '"' | '\'' => inStr = c
          case '/' => inRegex = true
          case _ =>
        }
        i += 1
      }
      require(!eof, "unterminated condition (no '{')")
      val t = s.substring(start, i).trim
      require(t.nonEmpty, "empty condition")
      t
    }

    def ws(): Unit = {
      var go = true
      while (go && !eof) {
        val c = s.charAt(i)
        if (c == '#') { while (!eof && s.charAt(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def ident(): String = {
      ws()
      val start = i
      while (!eof && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
      require(i > start, s"expected identifier at offset $start")
      s.substring(start, i)
    }
    /** Attribute names may be barewords or quoted strings. */
    def attrName(): String = {
      ws()
      if (peek == '"' || peek == '\'') string() else ident()
    }
    def expect(c: Char): Unit = {
      ws()
      require(!eof && s.charAt(i) == c, s"expected '$c' at offset $i")
      i += 1
    }
    def arrow(): Unit = {
      ws()
      require(i + 1 < s.length && s.charAt(i) == '=' && s.charAt(i + 1) == '>',
        s"expected '=>' at offset $i")
      i += 2
    }
    /** Logstash strings carry regexes (grok match, gsub patterns) whose
      * backslashes must survive conversion — the reference visitor
      * (ModelConvertingLogstashVisitor.java:145) strips only the
      * surrounding quotes. Unescape ONLY the enclosing quote char and
      * `\\`; every other `\X` pair is kept verbatim so `"\d+"` stays
      * `\d+`. */
    def string(): String = {
      val quote = s.charAt(i); i += 1
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != quote) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val n = s.charAt(i + 1)
          if (n == quote || n == '\\') sb.append(n) else { sb.append(c); sb.append(n) }
          i += 2
        }
        else { sb.append(c); i += 1 }
      }
      require(!eof, "unterminated string")
      i += 1
      sb.toString
    }
    def value(): Any = {
      ws()
      peek match {
        case '"' | '\'' => string()
        case '[' =>
          i += 1; ws()
          val items = Seq.newBuilder[Any]
          while (peek != ']') {
            items += value()
            ws()
            if (peek == ',') { i += 1; ws() }
          }
          i += 1
          items.result()
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, Any]
          while (peek != '}') {
            val k = attrName()
            arrow()
            m += (k -> value())
            ws()
            if (peek == ',') { i += 1; ws() }
          }
          i += 1
          m.result()
        case c if c.isDigit || c == '-' =>
          val start = i
          if (peek == '-') i += 1
          while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
          val t = s.substring(start, i)
          if (t.contains('.')) t.toDouble else t.toLong
        case _ =>
          ident() match {
            case "true" => true
            case "false" => false
            case other => other // bareword → string
          }
      }
    }
  }

  // ------------------------------------------------------- nested syntax

  private val NestedRef = "(\\[([^\\]\\[]+)\\])+".r

  /** Logstash `[a][b]` field reference → `/a/b` pointer; plain names pass
    * through (NestedSyntaxConverter.java:14 semantics). */
  def nestedToPointer(v: String): String =
    if (NestedRef.matches(v)) v.replace("[", "/").replace("]", "") else v

  private val GrokCapture =
    "%\\{([^{}:]+)(?::([^{}:]+))?(?::([a-zA-Z]+))?\\}".r

  /** Convert nested-syntax semantics INSIDE `%{SYNTAX:semantic[:type]}`
    * captures, preserving all literal text around them (see class doc for
    * the deliberate deviation from GrokMatchUtil's group-only rebuild). */
  def convertGrokPattern(p: String): String =
    GrokCapture.replaceAllIn(p, m => {
      val syntax = m.group(1)
      val semantic = Option(m.group(2)).map(nestedToPointer)
      val typ = Option(m.group(3))
      val body = (Seq(syntax) ++ semantic ++ typ).mkString(":")
      java.util.regex.Matcher.quoteReplacement(s"%{$body}")
    })

  // -------------------------------------------------------- conditionals

  /** Logstash condition → engine expression-language text (ExprCompiler
    * grammar). Supported: `[a][b]` field refs (→ pointers), string/number/
    * boolean literals, `== != < <= > >=`, `=~ !~` with /regex/ or string
    * (Logstash matches unanchored, the engine anchors — the pattern is
    * embedded in `.*(?:…).*`), `in` / `not in` over array literals (→ set
    * literals), `and` / `or` / `not` / `!`, parens, and bare-field
    * truthiness (converted to an existence check, `not (/f == null)`).
    * `nand`/`xor` are rejected. */
  def convertCondition(raw: String): String = new CondParser(raw).parse()

  private final class CondParser(s: String) {
    private var i = 0
    private def eof = i >= s.length
    private def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
    private def peek: Char = if (eof) ' ' else s.charAt(i)
    private def eat(tok: String): Boolean = {
      ws()
      if (s.startsWith(tok, i)) { i += tok.length; true } else false
    }
    private def eatKw(kw: String): Boolean = {
      ws()
      val save = i
      if (!eof && s.charAt(i).isLetter) {
        val st = i
        while (!eof && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        if (s.substring(st, i) == kw) return true
      }
      i = save
      false
    }

    def parse(): String = {
      val r = or()
      ws()
      require(eof, s"trailing text in condition at offset $i: $s")
      r
    }
    private def or(): String = {
      var l = and()
      var go = true
      while (go) {
        if (eatKw("or")) l = s"$l or ${and()}"
        else if (eatKw("nand") || eatKw("xor")) throw new IllegalArgumentException(
          "nand/xor conditionals are out of subset")
        else go = false
      }
      l
    }
    private def and(): String = {
      var l = unary()
      while (eatKw("and")) l = s"$l and ${unary()}"
      l
    }
    private def unary(): String = {
      ws()
      if (peek == '!' && i + 1 < s.length &&
          s.charAt(i + 1) != '=' && s.charAt(i + 1) != '~') {
        i += 1; s"not ${unary()}"
      }
      else if (eatKw("not")) s"not ${unary()}"
      else if (peek == '(') {
        i += 1
        val r = or()
        ws()
        require(peek == ')', s"expected ) at offset $i"); i += 1
        s"($r)"
      }
      else comparison()
    }
    private def comparison(): String = {
      val l = operand()
      ws()
      if (eat("==")) s"$l == ${operand()}"
      else if (eat("!=")) s"$l != ${operand()}"
      else if (eat("=~")) s"$l =~ ${regexStr()}"
      else if (eat("!~")) s"not ($l =~ ${regexStr()})"
      else if (eat("<=")) s"$l <= ${operand()}"
      else if (eat(">=")) s"$l >= ${operand()}"
      else if (eat("<")) s"$l < ${operand()}"
      else if (eat(">")) s"$l > ${operand()}"
      else if (eatKw("in")) s"$l in ${setLit()}"
      else if (eatKw("not")) {
        require(eatKw("in"), s"expected 'in' after 'not' at offset $i")
        s"$l not in ${setLit()}"
      } else {
        // bare field → existence (Logstash truthiness subset)
        require(l.startsWith("/"),
          s"bare operand '$l' is not a field reference")
        s"not ($l == null)"
      }
    }
    private def operand(): String = {
      ws()
      peek match {
        case '[' => fieldRef()
        case '"' | '\'' => quote(stringLit())
        case c if c.isDigit || c == '-' => number()
        case _ =>
          if (eatKw("true")) "true"
          else if (eatKw("false")) "false"
          else if (eatKw("null")) "null"
          else throw new IllegalArgumentException(
            s"unsupported operand at offset $i in condition: $s")
      }
    }
    private def fieldRef(): String = {
      val parts = Seq.newBuilder[String]
      while (peek == '[') {
        i += 1
        val st = i
        while (!eof && s.charAt(i) != ']') i += 1
        require(!eof, "unterminated field reference")
        parts += s.substring(st, i)
        i += 1
      }
      "/" + parts.result().mkString("/")
    }
    private def stringLit(): String = {
      val q = s.charAt(i); i += 1
      val sb = new StringBuilder
      while (!eof && s.charAt(i) != q) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          val n = s.charAt(i + 1)
          if (n == q || n == '\\') sb.append(n) else { sb.append(c); sb.append(n) }
          i += 2
        } else { sb.append(c); i += 1 }
      }
      require(!eof, "unterminated string in condition")
      i += 1
      sb.toString
    }
    /** Engine string literals unescape every `\X` pair, so round-tripping
      * arbitrary text (regex bodies included) requires escaping `\` and
      * `"`. */
    private def quote(v: String): String =
      "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    private def number(): String = {
      val st = i
      if (peek == '-') i += 1
      while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
      s.substring(st, i)
    }
    private def regexStr(): String = {
      ws()
      val body = peek match {
        case '/' =>
          i += 1
          val sb = new StringBuilder
          while (!eof && s.charAt(i) != '/') {
            if (s.charAt(i) == '\\' && i + 1 < s.length && s.charAt(i + 1) == '/') {
              sb.append('/'); i += 2
            } else { sb.append(s.charAt(i)); i += 1 }
          }
          require(!eof, "unterminated regex literal")
          i += 1
          sb.toString
        case '"' | '\'' => stringLit()
        case _ => throw new IllegalArgumentException(
          s"expected regex after =~/!~ at offset $i")
      }
      quote(s".*(?:$body).*")
    }
    private def setLit(): String = {
      ws()
      require(peek == '[', s"expected list after in at offset $i"); i += 1
      val items = Seq.newBuilder[String]
      ws()
      while (peek != ']') {
        items += operand()
        ws()
        if (peek == ',') { i += 1; ws() }
      }
      i += 1
      items.result().mkString("{", ", ", "}")
    }
  }

  /** Gate one mapped processor on an (engine-syntax) condition: plugins
    * with a native `*_when` option use it; everything else gets the
    * converter-reserved `__gate_when`, which the pipeline compiler wraps
    * in the generic row-local [[Processors.GateWhen]]. */
  private def gatePlugin(d: PluginDef, cond: String): PluginDef = {
    def gateEntries(whenKey: String): PluginDef = {
      val entries = d.options("entries").asInstanceOf[Seq[Map[String, Any]]]
      PluginDef(d.name, d.options +
        ("entries" -> entries.map(_ + (whenKey -> cond))))
    }
    d.name match {
      case "add_entries" => gateEntries("add_when")
      case "copy_values" => gateEntries("copy_when")
      case "date" => PluginDef(d.name, d.options + ("date_when" -> cond))
      case "drop_events" =>
        val orig = d.options.get("drop_when").map(String.valueOf)
        val combined = orig match {
          case Some(o) if o != "1 == 1" => s"($cond) and ($o)"
          case _ => cond
        }
        PluginDef(d.name, d.options + ("drop_when" -> combined))
      case _ => PluginDef(d.name, d.options + ("__gate_when" -> cond))
    }
  }

  /** Flatten filter items into a processor list. Each conditional first
    * MATERIALIZES its branch guards as hidden boolean columns (one
    * add_entries with value_expression per branch: `not(c0) … and (ck)`,
    * conjoined with the enclosing branch's column for nested ifs) — so
    * conditions are evaluated BEFORE any branch body runs, exactly like
    * Logstash, and a branch that mutates a field the condition reads
    * cannot flip a sibling's gate. Body plugins then gate on the guard
    * column pointer; the guards are deleted after the last body. */
  private def flattenFilters(items: Seq[LsItem], gate: Option[String],
      counter: java.util.concurrent.atomic.AtomicInteger): Seq[PluginDef] =
    items.flatMap {
      case p: LsPlugin =>
        val defs = mapFilter(p)
        gate match {
          case Some(g) => defs.map(gatePlugin(_, g))
          case None => defs
        }
      case LsIf(branches, els) =>
        val n = counter.getAndIncrement()
        val converted = branches.map { case (raw, its) =>
          (convertCondition(raw), its)
        }
        val negs = converted.map { case (c, _) => s"not ($c)" }
        def guardExpr(k: Int, own: Option[String]): String = {
          val g = own match {
            case Some(c) => (negs.take(k) :+ s"($c)").mkString(" and ")
            case None => negs.mkString(" and ") // else branch
          }
          gate.map(p => s"$p and ($g)").getOrElse(g)
        }
        val branchTmps = converted.indices.map(k => s"__lsif_${n}_$k")
        val elseTmp = if (els.nonEmpty) Seq(s"__lsif_${n}_else") else Nil
        val tmps = branchTmps ++ elseTmp
        val guards =
          converted.indices.map(k => guardExpr(k, Some(converted(k)._1))) ++
            (if (els.nonEmpty) Seq(guardExpr(converted.size, None)) else Nil)
        val pre = PluginDef("add_entries", Map("entries" ->
          tmps.zip(guards).map { case (t, v) =>
            Map("key" -> t, "value_expression" -> v,
              "overwrite_if_key_exists" -> true)
          }))
        val bodies = converted.zipWithIndex.flatMap { case ((_, its), k) =>
          flattenFilters(its, Some("/" + branchTmps(k)), counter)
        } ++ (if (els.nonEmpty)
          flattenFilters(els, Some("/" + elseTmp.head), counter) else Nil)
        val post = PluginDef("delete_entries", Map("with_keys" -> tmps))
        (pre +: bodies) :+ post
    }

  // ------------------------------------------------------------- mapping

  private def str(v: Any): String = String.valueOf(v)

  private def strSeq(v: Any): Seq[String] = v match {
    case l: Seq[Any] @unchecked => l.map(str)
    case other => Seq(str(other))
  }

  /** Rename attributes per a mapping-yaml-style table; unmapped attributes
    * are dropped (AbstractLogstashPluginAttributesMapper behavior);
    * repeated attributes resolve last-wins except where a plugin merges
    * them explicitly (grok match, mutate). */
  private def mapAttrs(p: LsPlugin, table: Map[String, String],
      additional: Map[String, Any] = Map.empty): Map[String, Any] =
    additional ++ p.lastWins.flatMap { case (k, v) => table.get(k).map(_ -> v) }

  /** One Logstash filter plugin → one or more engine processors. */
  def mapFilter(p: LsPlugin): Seq[PluginDef] = p.name match {
    case "grok" =>
      // grok.mapping.yaml + GrokMatchAttributeHelper.mergeMatchAttributes:
      // every repeated `match` merges into one field→patterns map; the
      // hash form contributes each (field, pattern), the array form must
      // be [field, pattern]; fields go through nested-syntax conversion
      val merged = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
      def add(f: String, pat: String): Unit = {
        val k = nestedToPointer(f)
        merged(k) = merged.getOrElse(k, Vector.empty) :+ convertGrokPattern(pat)
      }
      p.all("match").foreach {
        case h: Map[String, Any] @unchecked => h.foreach { case (f, v) => add(f, str(v)) }
        case l: Seq[Any] @unchecked if l.size == 2 => add(str(l.head), str(l(1)))
        case other => throw new IllegalArgumentException(
          s"grok match must be a hash or [field, pattern] pair, got: $other")
      }
      require(merged.nonEmpty, "grok: 'match' is required")
      val renames = Map("break_on_match" -> "break_on_match",
        "keep_empty_captures" -> "keep_empty_captures",
        "pattern_definitions" -> "pattern_definitions",
        "patterns_dir" -> "patterns_directories",
        "patterns_files_glob" -> "patterns_files_glob",
        "timeout_millis" -> "timeout_millis",
        "overwrite" -> "keys_to_overwrite",
        "named_captures_only" -> "named_captures_only")
      val extra = mapAttrs(p, renames).map {
        case ("keys_to_overwrite", v) => "keys_to_overwrite" -> strSeq(v).map(nestedToPointer)
        case kv => kv
      }
      Seq(PluginDef("grok", extra + ("match" -> merged.toMap.map {
        case (k, v) => k -> (v: Seq[String]) })))

    case "date" =>
      // date.mapping.yaml + DateLogstashPluginAttributesMapper: match
      // array [field, fmt...] → [{key, patterns}]; fixed additionals
      val entry = p.first("match") match {
        case Some(l: Seq[Any] @unchecked) if l.size >= 2 =>
          Map("key" -> nestedToPointer(str(l.head)),
            "patterns" -> l.tail.map(str))
        case _ => throw new IllegalArgumentException(
          "date: 'match' must be [field, format, ...]")
      }
      val renames = Map("target" -> "destination",
        "timezone" -> "source_timezone", "locale" -> "locale")
      val mapped = mapAttrs(p, renames,
        additional = Map("from_time_received" -> false,
          "destination_timezone" -> "UTC")).map {
        case ("destination", v) => "destination" -> nestedToPointer(str(v))
        case kv => kv
      }
      Seq(PluginDef("date", mapped + ("match" -> Seq(entry))))

    case "kv" =>
      val renames = Map("source" -> "source", "target" -> "destination",
        "field_split" -> "field_split_characters",
        "field_split_pattern" -> "field_delimiter_regex",
        "value_split" -> "value_split_characters",
        "value_split_pattern" -> "key_value_delimiter_regex",
        "remove_char_key" -> "delete_key_regex",
        "remove_char_value" -> "delete_value_regex")
      val mapped = mapAttrs(p, renames).map {
        case (k @ ("source" | "destination"), v) => k -> nestedToPointer(str(v))
        case kv => kv
      }
      Seq(PluginDef("key_value", mapped))

    case "csv" =>
      val renames = Map("columns" -> "column_names",
        "quote_char" -> "quote_character", "separator" -> "delimiter",
        "source" -> "source")
      Seq(PluginDef("csv",
        mapAttrs(p, renames, additional = Map("delete_header" -> true))))

    case "drop" =>
      // bare `drop {}` outside a conditional drops every event
      Seq(PluginDef("drop_events", Map("drop_when" -> "1 == 1")))

    case "mutate" =>
      // MutateMapper: one engine processor per mutate sub-action, in
      // FIRST-APPEARANCE order, accumulating repeated attributes into the
      // same processor; hash keys (and string hash values / list elements)
      // go through nested-syntax conversion
      def hashEntries(v: Any): Seq[(String, Any)] = v match {
        case h: Map[String, Any] @unchecked => h.toSeq.map {
          case (k, s: String) => nestedToPointer(k) -> nestedToPointer(s)
          case (k, other) => nestedToPointer(k) -> other
        }
        case _ => throw new IllegalArgumentException("mutate: hash expected")
      }
      def keyList(v: Any): Seq[String] = strSeq(v).map(nestedToPointer)
      val order = p.attrs.map(_._1).distinct
      order.flatMap { action =>
        val vs = p.all(action)
        action match {
          case "rename" => Some(PluginDef("rename_keys", Map("entries" ->
            vs.flatMap(hashEntries).map { case (f, t) =>
              Map("from_key" -> f, "to_key" -> str(t)) })))
          case "copy" => Some(PluginDef("copy_values", Map("entries" ->
            vs.flatMap(hashEntries).map { case (f, t) =>
              Map("from_key" -> f, "to_key" -> str(t)) })))
          case "add_field" => Some(PluginDef("add_entries", Map("entries" ->
            vs.flatMap(hashEntries).map { case (k, value) =>
              Map("key" -> k, "value" -> value) })))
          case "remove_field" =>
            Some(PluginDef("delete_entries", Map("with_keys" -> vs.flatMap(keyList))))
          case "gsub" =>
            // flat [source, pattern, replacement, ...] triples
            val flat = vs.flatMap(strSeq)
            require(flat.size % 3 == 0, "mutate.gsub expects triples")
            Some(PluginDef("substitute_string", Map("entries" ->
              flat.grouped(3).map(t => Map("source" -> nestedToPointer(t(0)),
                "from" -> t(1), "to" -> t(2))).toSeq)))
          case "lowercase" =>
            Some(PluginDef("lowercase_string", Map("with_keys" -> vs.flatMap(keyList))))
          case "uppercase" =>
            Some(PluginDef("uppercase_string", Map("with_keys" -> vs.flatMap(keyList))))
          // Logstash's actual mutate option is `strip`; the reference's
          // MutateMapper matches `trim` (its own attribute name). Accept
          // both so real configs convert.
          case "strip" | "trim" =>
            Some(PluginDef("trim_string", Map("with_keys" -> vs.flatMap(keyList))))
          case "split" => Some(PluginDef("split_string", Map("entries" ->
            vs.flatMap(hashEntries).map { case (f, d) =>
              Map("source" -> f, "delimiter" -> str(d)) })))
          case _ => None // unsupported sub-action: dropped like the reference
        }
      }

    case other =>
      throw new IllegalArgumentException(
        s"logstash filter '$other' has no mapping (reference maps grok, date, kv, csv, drop, mutate)")
  }

  /** Flatten output items into sinks, mapping conditionals onto the
    * engine's ROUTE system: each conditional sink gets a synthesized
    * route whose expression is its full branch guard (`not(c0) … and
    * (ck)`, conjoined with any enclosing guard). Unlike the filter
    * section, no guard materialization is needed — routes evaluate once
    * on the final post-processor frame and sinks cannot mutate events. */
  private def flattenOutputs(items: Seq[LsItem], enclosing: Option[String],
      routes: scala.collection.mutable.ArrayBuffer[(String, String)]): Seq[SinkDef] =
    items.flatMap {
      case p: LsPlugin =>
        val sink = mapOutput(p)
        enclosing match {
          case Some(c) =>
            val rname = s"__lsout_${routes.size}"
            routes += rname -> c
            Seq(SinkDef(sink.plugin, sink.routes :+ rname))
          case None => Seq(sink)
        }
      case LsIf(branches, els) =>
        val conds = branches.map { case (raw, _) => convertCondition(raw) }
        val negs = conds.map(c => s"not ($c)")
        def conj(own: String): String =
          enclosing.map(p => s"($p) and $own").getOrElse(own)
        branches.zipWithIndex.flatMap { case ((_, its), k) =>
          flattenOutputs(its,
            Some(conj((negs.take(k) :+ s"(${conds(k)})").mkString(" and "))),
            routes)
        } ++ (if (els.isEmpty) Seq.empty
        else flattenOutputs(els, Some(conj(negs.mkString(" and "))), routes))
    }

  private def mapOutput(p: LsPlugin): SinkDef = p.name match {
    case "opensearch" | "elasticsearch" | "amazon_es" =>
      // opensearch.mapping.yaml: user→username, ssl_certificate_verification
      // → NEGATED insecure; default index logstash-%{uuuu.MM.dd}
      val renames = Map("hosts" -> "hosts", "user" -> "username",
        "password" -> "password", "index" -> "index")
      var opts = mapAttrs(p, renames,
        additional = Map("index" -> "logstash-%{uuuu.MM.dd}"))
      p.first("ssl_certificate_verification").foreach {
        case b: Boolean => opts += ("insecure" -> !b)
        case _ => ()
      }
      SinkDef(PluginDef("opensearch", opts), Seq.empty)
    case "stdout" => SinkDef(PluginDef("stdout", Map.empty), Seq.empty)
    case "file" => SinkDef(PluginDef("file", p.lastWins), Seq.empty)
    case other =>
      throw new IllegalArgumentException(s"logstash output '$other' has no mapping")
  }

  /** Convert a Logstash config to a [[PipelineYaml.PipelineDef]] named like
    * the reference's `logstash-converted-pipeline`. */
  def convert(text: String,
      name: String = "logstash-converted-pipeline"): PipelineDef = {
    val conf = parse(text)
    require(conf.input.size <= 1,
      "multiple logstash inputs are out of subset (the reference maps one)")
    val source = conf.input.headOption
      .map(in => PluginDef(in.name, in.lastWins))
      .getOrElse(PluginDef("stdin", Map.empty))
    val processors = flattenFilters(conf.filter, None,
      new java.util.concurrent.atomic.AtomicInteger())
    val routes = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val sinks = flattenOutputs(conf.output, None, routes)
    require(sinks.nonEmpty, "logstash config needs at least one output")
    PipelineDef(name, source, processors, routes = routes.toSeq, sinks = sinks)
  }

  /** Convert + compile through the shared YAML pipeline compiler. */
  def compile(spark: SparkSession, confText: String,
      inputs: Map[String, DataFrame] = Map.empty): Seq[PipelineYaml.SinkOutput] =
    PipelineYaml.compileDefs(spark, Seq(convert(confText)), inputs)
}
