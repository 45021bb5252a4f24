package graft.pipeline

import scala.collection.mutable

/** JVM scanner kernel behind [[Processors.KeyValueAdvanced]] /
  * [[Processors.KeyValueRecursive]] — the reference's character-level
  * bracket/quote machinery (KeyValueProcessor.java:279-339 findInStartGroup/
  * skipGroup, :421-491 bracket stack, :570-640 executeConfigs). Pure
  * functions over strings; executor-side, no driver state.
  */
object KeyValueKernel {

  private val GroupEnd = Map('"' -> '"', '\'' -> '\'', '(' -> ')',
    '[' -> ']', '<' -> '>', '{' -> '}')

  /** Split on any of `splitChars`, optionally keeping quoted/bracketed/url
    * groups intact (value_grouping). */
  def splitFields(s: String, splitChars: Set[Char],
      valueGrouping: Boolean): List[String] = {
    val out = mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (splitChars.contains(c)) { out += cur.toString; cur.clear(); i += 1 }
      else if (valueGrouping &&
          (s.startsWith("http://", i) || s.startsWith("https://", i))) {
        while (i < s.length && s.charAt(i) != ' ') { cur += s.charAt(i); i += 1 }
      } else if (valueGrouping && GroupEnd.contains(c)) {
        val end = GroupEnd(c)
        cur += c; i += 1
        while (i < s.length && s.charAt(i) != end) { cur += s.charAt(i); i += 1 }
        if (i < s.length) { cur += s.charAt(i); i += 1 }
      } else { cur += c; i += 1 }
    }
    out += cur.toString
    out.filter(_.nonEmpty).toList
  }

  /** Split one `key<delim>value` pair on the FIRST delimiter char; no
    * delimiter → (group, null) like the reference's non_match branch. */
  def splitPair(pair: String, kvChars: Set[Char]): (String, String) = {
    val idx = pair.indexWhere(kvChars.contains)
    if (idx < 0) (pair, null)
    else (pair.substring(0, idx), pair.substring(idx + 1))
  }

  def parseToMap(s: String, cfg: Processors.KeyValueAdvanced)
      : Map[String, Seq[String]] = {
    val splitChars = cfg.fieldSplitCharacters.toSet
    val kvChars = cfg.keyValueDelimiterCharacters.toSet
    val include = cfg.includeKeys.toSet
    val exclude = cfg.excludeKeys.toSet
    val out = mutable.LinkedHashMap.empty[String, mutable.ListBuffer[String]]
    for (pair <- splitFields(s, splitChars, cfg.valueGrouping)) {
      var (key, value) = splitPair(pair, kvChars)
      // executeConfigs order: include/exclude → delete regexes → prefix →
      // whitespace → transform → remove_brackets
      val rawKey = key
      val included = (include.isEmpty || include.contains(rawKey)) &&
        !exclude.contains(rawKey)
      if (included) {
        if (cfg.deleteKeyRegex.nonEmpty) key = key.replaceAll(cfg.deleteKeyRegex, "")
        if (value != null && cfg.deleteValueRegex.nonEmpty)
          value = value.replaceAll(cfg.deleteValueRegex, "")
        key = cfg.keyPrefix + key
        if (cfg.whitespace == "strict") {
          key = key.stripTrailing()
          if (value != null) value = value.stripLeading()
        }
        key = cfg.transformKey match {
          case "lowercase" => key.toLowerCase
          case "uppercase" => key.toUpperCase
          case "capitalize" =>
            if (key.isEmpty) key else key.substring(0, 1).toUpperCase + key.substring(1)
          case _ => key
        }
        if (cfg.removeBrackets && value != null)
          value = value.replaceAll("[\\[\\]()<>]", "")
        val keep = key.nonEmpty && !(cfg.dropKeysWithNoValue && value == null)
        if (keep) {
          val vs = out.getOrElseUpdate(key, mutable.ListBuffer.empty[String])
          if (!(cfg.skipDuplicateValues && vs.contains(value))) vs += value
        }
      }
    }
    for ((k, v) <- cfg.defaultValues if !out.contains(k))
      out(k) = mutable.ListBuffer(v)
    out.map { case (k, v) => k -> v.toSeq }.toMap
  }

  /** Recursive parse → JSON object string (createRecursedMap analog). */
  def parseRecursiveJson(s: String, fieldSplit: String, kvSplit: String): String = {
    val splitChars = fieldSplit.toSet
    val kvChars = kvSplit.toSet
    def esc(x: String): String = x.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def render(input: String): String = {
      val pairs = splitFields(input, splitChars, valueGrouping = true)
      val items = pairs.map { p =>
        val (k, v) = splitPair(p, kvChars)
        val rendered =
          if (v == null) "null"
          else if (v.length >= 2 && GroupEnd.contains(v.charAt(0)) &&
              v.charAt(v.length - 1) == GroupEnd(v.charAt(0)) &&
              !"\"'".contains(v.charAt(0)))
            render(v.substring(1, v.length - 1)) // nested bracket group
          else "\"" + esc(v) + "\""
        "\"" + esc(k) + "\":" + rendered
      }
      items.mkString("{", ",", "}")
    }
    render(s)
  }
}
