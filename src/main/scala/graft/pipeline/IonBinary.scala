package graft.pipeline

/** Amazon Ion BINARY → JSON converter — the binary-wire half of the
  * `parse_ion` kernel (reference ParseIonProcessor delegates both forms to
  * ion-java, absent offline; the binary encoding is the public Amazon Ion
  * 1.0 specification). Produces the same canonical compact JSON as
  * [[IonText.toJson]] on the equivalent text document — string-identical
  * for nulls/bools/ints/strings/symbols/clobs/blobs/containers/timestamps
  * and decimals written with an explicit exponent; floats render in Java
  * shortest form (the text kernel preserves the author's spelling, which
  * binary cannot know) — so the downstream `parse_ion` plumbing is shared
  * and wire form is a reader detail (IonBinarySpec pins text ≡ binary on
  * paired fixtures).
  *
  * Subset (mirrors IonText's documented subset):
  *  - typed nulls → JSON null; bool; pos/neg ints (≤ 8 magnitude bytes);
  *    float32/float64 (nan/±inf → null, IonText's lossy-JSON choice);
  *    decimals → `<coeff>E<exp>` JSON numbers (the text kernel's `d`→`e`);
  *  - strings; symbols → strings via the local symbol table
  *    ($ion_symbol_table struct with a `symbols` list, prepended to the
  *    system table); clobs → the payload as a JSON string; blobs → the
  *    payload base64-encoded as a JSON string (the text form shows the
  *    base64 text, so both wire forms render identically);
  *  - lists and s-expressions → JSON arrays; structs → JSON objects;
  *  - annotation wrappers stripped (like IonJsonConverter);
  *  - timestamps → ISO-8601 JSON strings at the encoded precision
  *    (offset 0 → `Z`, unknown offset → `-00:00`);
  *  - NOP padding skipped.
  *
  * Shared symbol-table imports resolve against a caller-provided catalog
  * (`toJson(bytes, catalog)` — the analog of ion-java's SimpleCatalog):
  * each `imports` entry {name, version, max_id} pulls max_id symbol slots
  * from the named shared table, null-padding slots the catalog cannot
  * fill (unknown-symbol semantics per spec); `imports:
  * $ion_symbol_table` keeps LST-append semantics; a local table WITH
  * explicit imports resets to system + imports + inline symbols.
  *
  * NOT covered (documented): ints beyond 64 bits, arbitrary-precision
  * decimal coefficients (> 8 bytes).
  */
object IonBinary {

  /** System symbol table, Ion 1.0 (§ binary encoding, SIDs 1-9). */
  private val SystemSymbols = Array("", "$ion", "$ion_1_0",
    "$ion_symbol_table", "name", "version", "imports", "symbols", "max_id",
    "$ion_shared_symbol_table")

  /** A shared symbol table as a catalog entry (keyed by name; the caller
    * supplies the version it published). */
  final case class SharedTable(name: String, version: Int,
      symbols: IndexedSeq[String])

  def toJson(bytes: Array[Byte]): String = toJson(bytes, Map.empty)

  def toJson(bytes: Array[Byte], catalog: Map[String, SharedTable]): String = {
    if (bytes == null || bytes.length < 4) return null
    if (!(bytes(0) == 0xE0.toByte && bytes(1) == 0x01.toByte &&
        bytes(2) == 0x00.toByte && bytes(3) == 0xEA.toByte)) return null
    try {
      val r = new Cursor(bytes, 4, bytes.length)
      var symbols: Vector[String] = SystemSymbols.toVector
      val values = Vector.newBuilder[String]
      while (r.hasMore) {
        // top level: local symbol tables apply to subsequent values
        val mark = r.pos
        val td = r.u8()
        if (td == 0xE0) { r.skipN(3) } // mid-stream BVM: reset to system? keep symbols
        else {
          val (t, l) = (td >> 4, td & 0xF)
          if (t == 14 && l != 15) {
            // annotation wrapper — may be a $ion_symbol_table
            val len = if (l == 14) r.varUInt().toInt else l
            val end = r.pos + len
            val annLen = r.varUInt().toInt
            val annEnd = r.pos + annLen
            var firstAnn = -1L
            if (r.pos < annEnd) firstAnn = r.varUInt()
            r.pos = annEnd
            if (firstAnn == 3L) { // $ion_symbol_table
              symbols = readSymbolTable(r, end, symbols, catalog)
              r.pos = end
            } else {
              values += value(r, symbols) // annotations stripped
              r.pos = end
            }
          } else {
            r.pos = mark
            val v = value(r, symbols)
            if (v != null) values += v // NOP pads yield null markers
          }
        }
      }
      val vs = values.result()
      if (vs.isEmpty) null
      else if (vs.size == 1) vs.head
      else vs.mkString("[", ",", "]") // multi-value stream → array
    } catch { case _: Exception => null } // corrupt payload → null (quarantine)
  }

  private final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def skipN(n: Int): Unit = { pos += n; require(pos <= end, "truncated") }
    def varUInt(): Long = {
      var v = 0L
      var b = u8()
      var n = 1
      while ((b & 0x80) == 0) {
        v = (v << 7) | b
        b = u8()
        n += 1
        require(n <= 9, "varUInt too long")
      }
      (v << 7) | (b & 0x7f)
    }
    def varInt(): Long = {
      var b = u8()
      val neg = (b & 0x40) != 0
      var v = (b & 0x3f).toLong
      var n = 1
      while ((b & 0x80) == 0) {
        b = u8()
        if ((b & 0x80) == 0) { v = (v << 7) | b } else v = (v << 7) | (b & 0x7f)
        n += 1
        require(n <= 9, "varInt too long")
      }
      if (neg) -v else v
    }
    def uIntN(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      v
    }
    /** Signed Int field (sign-and-magnitude, high bit of first byte). */
    def intN(n: Int): Long = {
      if (n == 0) return 0L
      val first = u8()
      val neg = (first & 0x80) != 0
      var v = (first & 0x7f).toLong
      var i = 1
      while (i < n) { v = (v << 8) | u8(); i += 1 }
      if (neg) -v else v
    }
  }

  /** Read the body of a $ion_symbol_table struct. Per spec, `imports`
    * (SID 6) resolves FIRST regardless of field order: the symbol
    * `$ion_symbol_table` (SID 3) keeps the current table (append
    * semantics); a list of {name, version, max_id} structs pulls slots
    * from the catalog's shared tables, null-padding what the catalog
    * can't supply; then the inline `symbols` (SID 7) list appends. A
    * table with NO `imports: $ion_symbol_table` resets to system +
    * imports + inline. */
  private def readSymbolTable(r: Cursor, end: Int, current: Vector[String],
      catalog: Map[String, SharedTable]): Vector[String] = {
    val td = r.u8()
    require(td >> 4 == 13, "symbol table must be a struct")
    val l = td & 0xF
    val structEnd =
      if (l == 14 || l == 1) { val n = r.varUInt().toInt; r.pos + n }
      else r.pos + l
    var appendMode = false
    var imported = Vector.empty[String]
    var inline = Vector.empty[String]
    while (r.pos < structEnd) {
      val fieldSid = r.varUInt()
      val ftd = r.u8()
      val (t, fl) = (ftd >> 4, ftd & 0xF)
      val flen =
        if (fl == 14) r.varUInt().toInt
        else if (fl == 15) 0
        else fl
      val fend = r.pos + flen
      if (fieldSid == 7L && t == 11) { // symbols: list of strings
        while (r.pos < fend) {
          val std = r.u8()
          val (st, sl) = (std >> 4, std & 0xF)
          val slen = if (sl == 14) r.varUInt().toInt else if (sl == 15) 0 else sl
          if (st == 8 && sl != 15) {
            inline = inline :+ new String(r.buf, r.pos, slen,
              java.nio.charset.StandardCharsets.UTF_8)
          } else inline = inline :+ null // non-string entry still takes a SID slot
          r.pos += slen
        }
      } else if (fieldSid == 6L && t == 7) { // imports: symbol
        // $ion_symbol_table (SID 3) → append to the current table
        if (flen > 0 && r.uIntN(flen) == 3L) appendMode = true
      } else if (fieldSid == 6L && t == 11) { // imports: list of structs
        while (r.pos < fend) {
          val itd = r.u8()
          val (it, il) = (itd >> 4, itd & 0xF)
          val ilen =
            if (il == 14 || (it == 13 && il == 1)) r.varUInt().toInt
            else if (il == 15) 0
            else il
          val iend = r.pos + ilen
          if (it == 13) imported = imported ++ readImport(r, iend, catalog)
          r.pos = iend
        }
      }
      r.pos = fend
    }
    if (appendMode) current ++ inline
    else SystemSymbols.toVector ++ imported ++ inline
  }

  /** One import struct {name: SID 4, version: SID 5, max_id: SID 8} →
    * the symbol slots it contributes. */
  private def readImport(r: Cursor, end: Int,
      catalog: Map[String, SharedTable]): Vector[String] = {
    var name: String = null
    var maxId: Long = -1L
    while (r.pos < end) {
      val sid = r.varUInt()
      val ftd = r.u8()
      val (t, fl) = (ftd >> 4, ftd & 0xF)
      val flen = if (fl == 14) r.varUInt().toInt else if (fl == 15) 0 else fl
      val fend = r.pos + flen
      sid match {
        case 4L if t == 8 => name = new String(r.buf, r.pos, flen,
          java.nio.charset.StandardCharsets.UTF_8)
        case 8L if t == 2 => maxId = r.uIntN(flen)
        case _ => // version (SID 5) read lenient: name-keyed catalog
      }
      r.pos = fend
    }
    require(name != null, "import without name")
    catalog.get(name) match {
      case Some(t) =>
        val syms = t.symbols.toVector
        if (maxId < 0) syms
        else if (maxId <= syms.length) syms.take(maxId.toInt)
        else syms ++ Vector.fill((maxId - syms.length).toInt)(null: String)
      case None =>
        // unknown table: max_id null slots (spec's unknown-symbol
        // semantics); without max_id the stream is undecodable
        require(maxId >= 0, s"import of unknown shared table '$name' without max_id")
        Vector.fill(maxId.toInt)(null: String)
    }
  }

  private def esc(raw: String): String = raw.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Decode one value to its canonical JSON text; NOP padding → null
    * (caller drops it). */
  private def value(r: Cursor, symbols: Vector[String]): String = {
    val td = r.u8()
    val t = td >> 4
    val l = td & 0xF
    if (l == 15) { // typed null
      return if (t == 14) throw new IllegalArgumentException("bad annotation")
        else "null"
    }
    t match {
      case 0 => // NOP padding
        val n = if (l == 14) r.varUInt().toInt else l
        r.skipN(n)
        null
      case 1 => if (l == 1) "true" else "false"
      case 2 | 3 => // pos/neg int
        val n = if (l == 14) r.varUInt().toInt else l
        require(n <= 8, "int too wide for the documented subset")
        val mag = r.uIntN(n)
        if (t == 3) "-" + java.lang.Long.toUnsignedString(mag)
        else java.lang.Long.toUnsignedString(mag)
      case 4 => // float
        val n = if (l == 14) r.varUInt().toInt else l
        val d = n match {
          case 0 => 0.0
          case 4 => java.lang.Float.intBitsToFloat(r.uIntN(4).toInt).toDouble
          case 8 => java.lang.Double.longBitsToDouble(r.uIntN(8))
          case _ => throw new IllegalArgumentException(s"float of $n bytes")
        }
        if (d.isNaN || d.isInfinite) "null" // IonText's lossy-JSON choice
        else java.lang.Double.toString(d) // "1.5", "2.0" — Java shortest form
      case 5 => // decimal: VarInt exponent + Int coefficient
        val n = if (l == 14) r.varUInt().toInt else l
        if (n == 0) "0"
        else {
          val valueEnd = r.pos + n
          val exp = r.varInt()
          val coeffBytes = valueEnd - r.pos
          require(coeffBytes <= 8, "decimal coefficient too wide for subset")
          val coeff = r.intN(coeffBytes)
          if (exp == 0) coeff.toString else s"${coeff}E$exp"
        }
      case 6 => // timestamp
        val n = if (l == 14) r.varUInt().toInt else l
        tsToIso(r, r.pos + n)
      case 7 => // symbol
        val n = if (l == 14) r.varUInt().toInt else l
        val sid = r.uIntN(n).toInt
        val name = if (sid >= 0 && sid < symbols.size && symbols(sid) != null)
          symbols(sid) else s"$$$sid"
        "\"" + esc(name) + "\""
      case 8 => // string
        val n = if (l == 14) r.varUInt().toInt else l
        val s = new String(r.buf, r.pos, n, java.nio.charset.StandardCharsets.UTF_8)
        r.skipN(n)
        "\"" + esc(s) + "\""
      case 9 => // clob: payload as string
        val n = if (l == 14) r.varUInt().toInt else l
        val s = new String(r.buf, r.pos, n, java.nio.charset.StandardCharsets.ISO_8859_1)
        r.skipN(n)
        "\"" + esc(s) + "\""
      case 10 => // blob: base64 text (what the text form displays)
        val n = if (l == 14) r.varUInt().toInt else l
        val b = java.util.Arrays.copyOfRange(r.buf, r.pos, r.pos + n)
        r.skipN(n)
        "\"" + java.util.Base64.getEncoder.encodeToString(b) + "\""
      case 11 | 12 => // list / sexp → JSON array
        val n = if (l == 14) r.varUInt().toInt else l
        val end = r.pos + n
        val items = Vector.newBuilder[String]
        while (r.pos < end) {
          val v = valueMaybeAnnotated(r, symbols)
          if (v != null) items += v
        }
        items.result().mkString("[", ",", "]")
      case 13 => // struct → JSON object
        val n = if (l == 14 || l == 1) r.varUInt().toInt else l
        val end = r.pos + n
        val fields = Vector.newBuilder[String]
        while (r.pos < end) {
          val sid = r.varUInt().toInt
          val name = if (sid >= 0 && sid < symbols.size && symbols(sid) != null)
            symbols(sid) else s"$$$sid"
          val v = valueMaybeAnnotated(r, symbols)
          if (v != null) fields += "\"" + esc(name) + "\":" + v
        }
        fields.result().mkString("{", ",", "}")
      case 14 => // annotation wrapper (nested): strip
        val n = if (l == 14) r.varUInt().toInt else l
        val end = r.pos + n
        val annLen = r.varUInt().toInt
        r.skipN(annLen)
        val v = value(r, symbols)
        r.pos = end
        v
      case other => throw new IllegalArgumentException(s"type $other")
    }
  }

  private def valueMaybeAnnotated(r: Cursor, symbols: Vector[String]): String =
    value(r, symbols)

  /** Timestamp body → ISO-8601 at the encoded precision. */
  private def tsToIso(r: Cursor, end: Int): String = {
    val offset: Option[Int] = {
      // offset VarInt; negative zero (0xC0) = unknown offset
      val b0 = r.buf(r.pos) & 0xff
      val v = r.varInt()
      if (v == 0 && (b0 & 0x40) != 0) None else Some(v.toInt)
    }
    val year = r.varUInt().toInt
    def part(): Option[Int] = if (r.pos < end) Some(r.varUInt().toInt) else None
    val month = part()
    val day = part()
    val hour = part()
    val minute = part()
    val second = part()
    val frac: Option[String] = if (r.pos < end) {
      val exp = r.varInt().toInt
      val coeffBytes = end - r.pos
      val coeff = if (coeffBytes == 0) 0L else r.intN(coeffBytes)
      if (exp >= 0 || coeff < 0) None
      else Some(("%0" + (-exp) + "d").format(coeff))
    } else None
    r.pos = end
    val sb = new StringBuilder(f"$year%04d")
    month.foreach(m => sb.append(f"-$m%02d"))
    day.foreach(d => sb.append(f"-$d%02d"))
    (hour, minute) match {
      case (Some(h), Some(mi)) =>
        sb.append(f"T$h%02d:$mi%02d")
        second.foreach(s => sb.append(f":$s%02d"))
        frac.foreach(f0 => sb.append("." + f0))
        offset match {
          case Some(0) => sb.append("Z")
          case Some(o) =>
            val sign = if (o < 0) "-" else "+"
            sb.append(f"$sign${math.abs(o) / 60}%02d:${math.abs(o) % 60}%02d")
          case None => sb.append("-00:00")
        }
      case _ if month.isEmpty => sb.append("T") // year precision
      case _ => if (day.isEmpty) sb.append("T") // month precision ends in T per spec
    }
    "\"" + sb.toString + "\""
  }
}
