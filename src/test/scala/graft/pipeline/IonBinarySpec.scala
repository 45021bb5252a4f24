package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Binary-Ion own kernel vs the text kernel on paired fixtures — wire form
  * must be a reader detail. Binary bytes are hand-assembled from the
  * public Ion 1.0 binary encoding. */
class IonBinarySpec extends AnyFunSuite {

  private val BVM = Seq(0xE0, 0x01, 0x00, 0xEA)

  private def bin(body: Int*): Array[Byte] = (BVM ++ body).map(_.toByte).toArray

  private def dblBits(d: Double): Seq[Int] = {
    val v = java.lang.Double.doubleToLongBits(d)
    (7 to 0 by -1).map(i => ((v >>> (8 * i)) & 0xff).toInt)
  }

  test("scalars: ints, bools, nulls, string, float, decimal") {
    assert(IonBinary.toJson(bin(0x21, 0x2A)) == "42")
    assert(IonBinary.toJson(bin(0x31, 0x07)) == "-7")
    assert(IonBinary.toJson(bin(0x20)) == "0")
    assert(IonBinary.toJson(bin(0x11)) == "true")
    assert(IonBinary.toJson(bin(0x10)) == "false")
    assert(IonBinary.toJson(bin(0x0F)) == "null")   // null.null
    assert(IonBinary.toJson(bin(0x2F)) == "null")   // null.int
    assert(IonBinary.toJson(bin(0x82, 'h', 'i')) == "\"hi\"")
    assert(IonBinary.toJson(bin(Seq(0x48) ++ dblBits(1.5): _*)) == "1.5")
    assert(IonBinary.toJson(bin(Seq(0x48) ++ dblBits(Double.NaN): _*)) == "null")
    assert(IonBinary.toJson(bin(0x40)) == "0.0")    // 0e0
    // decimal 15E-1: exponent VarInt -1 (0xC1), coefficient Int 15
    assert(IonBinary.toJson(bin(0x52, 0xC1, 0x0F)) == "15E-1")
    // text equivalence for the decimal (text kernel maps D -> E)
    assert(IonText.toJson("15D-1") == "15E-1")
  }

  test("containers: list, sexp, nested struct with local symbol table") {
    // [1, "a"] : list L=4 -> 0xB4, int 1 (0x21 0x01), string "a" (0x81 'a')
    assert(IonBinary.toJson(bin(0xB4, 0x21, 0x01, 0x81, 'a')) == "[1,\"a\"]")
    assert(IonText.toJson("[1, \"a\"]") == "[1,\"a\"]")
    // sexp (1 2) -> array
    assert(IonBinary.toJson(bin(0xC4, 0x21, 0x01, 0x21, 0x02)) == "[1,2]")

    // local symbol table (annotation-wrapped {symbols:["k","sym"]}),
    // then struct {k: sym}; list body = 0x81 'k' ++ 0x83 's' 'y' 'm'
    val symList = Seq(0xB6, 0x81, 'k'.toInt, 0x83, 's'.toInt, 'y'.toInt, 'm'.toInt)
    val symStruct = Seq(0xD0 + symList.size + 1, 0x87) ++ symList
    val wrapper = Seq(0xE0 | (symStruct.size + 2), 0x81, 0x83) ++ symStruct
    // struct {k(sid 10): sym(sid 11)}: field VarUInt 10 (0x8A), symbol 0x71 0x0B
    val body = wrapper ++ Seq(0xD3, 0x8A, 0x71, 0x0B)
    assert(IonBinary.toJson(bin(body: _*)) == "{\"k\":\"sym\"}")
    assert(IonText.toJson("{k: sym}") == "{\"k\":\"sym\"}")
  }

  // ---- binary assembly helpers for symbol-table fixtures ----
  private def vu(n: Int): Seq[Int] =
    if (n < 128) Seq(0x80 | n) else Seq(n >> 7, 0x80 | (n & 0x7f))
  private def td(t: Int, len: Int): Seq[Int] =
    if (len < 14) Seq((t << 4) | len) else Seq((t << 4) | 14) ++ vu(len)
  private def istr(s: String): Seq[Int] =
    td(8, s.length) ++ s.getBytes("UTF-8").map(_ & 0xff)
  private def ifield(sid: Int, body: Seq[Int]): Seq[Int] = vu(sid) ++ body
  private def istruct(fields: Seq[Int]*): Seq[Int] = {
    val body = fields.flatten
    require(body.size != 1) // L=1 means sorted-struct w/ varUInt length
    td(13, body.size) ++ body
  }
  private def ilist(items: Seq[Int]*): Seq[Int] =
    td(11, items.map(_.size).sum) ++ items.flatten
  private def iint(v: Int): Seq[Int] = if (v == 0) Seq(0x20) else Seq(0x21, v)
  private def isym(sid: Int): Seq[Int] = Seq(0x71, sid)
  private def iannot(sids: Seq[Int], value: Seq[Int]): Seq[Int] = {
    val ann = sids.flatMap(vu)
    td(14, vu(ann.size).size + ann.size + value.size) ++ vu(ann.size) ++ ann ++ value
  }

  test("shared symbol-table imports resolve through the catalog; text ≡ binary") {
    // LST: imports: [{name: "com.example.app", version: 1, max_id: 3}],
    //      symbols: ["extra"]  →  SIDs 10..12 from the shared table, 13 inline
    val lst = iannot(Seq(3), istruct(
      ifield(6, ilist(istruct(
        ifield(4, istr("com.example.app")),
        ifield(5, iint(1)),
        ifield(8, iint(3))))),
      ifield(7, ilist(istr("extra")))))
    // {status(10): ok(12), code(11): 7, extra(13): "x"}
    val value = istruct(ifield(10, isym(12)), ifield(11, iint(7)),
      ifield(13, istr("x")))
    val bytes = bin((lst ++ value): _*)
    val catalog = Map("com.example.app" ->
      IonBinary.SharedTable("com.example.app", 1, Vector("status", "code", "ok")))
    val viaBinary = IonBinary.toJson(bytes, catalog)
    val viaText = IonText.toJson("""{status: ok, code: 7, extra: "x"}""")
    assert(viaBinary == viaText)
    assert(viaBinary == """{"status":"ok","code":7,"extra":"x"}""")
    // without the catalog, the import's max_id slots are unknown symbols
    assert(IonBinary.toJson(bytes) == """{"$10":"$12","$11":7,"extra":"x"}""")
    // short shared table + larger max_id → null-padded tail slots
    val shortCat = Map("com.example.app" ->
      IonBinary.SharedTable("com.example.app", 1, Vector("status")))
    assert(IonBinary.toJson(bytes, shortCat) == """{"status":"$12","$11":7,"extra":"x"}""")
  }

  test("imports: $ion_symbol_table appends; a table without it resets") {
    // LST1 {symbols:["a"]} → SID 10 = a
    val lst1 = iannot(Seq(3), istruct(ifield(7, ilist(istr("a")))))
    // LST2 with imports: $ion_symbol_table (SID 3), symbols:["b"] → append: 11 = b
    val lstAppend = iannot(Seq(3), istruct(
      ifield(6, isym(3)), ifield(7, ilist(istr("b")))))
    val appended = bin((lst1 ++ Seq(0x71, 0x0A) ++ lstAppend ++
      Seq(0x71, 0x0A, 0x71, 0x0B)): _*)
    assert(IonBinary.toJson(appended) == """["a","a","b"]""")
    // LST2 WITHOUT imports → reset: SID 10 = b, old "a" gone
    val lstReset = iannot(Seq(3), istruct(ifield(7, ilist(istr("b")))))
    val reset = bin((lst1 ++ Seq(0x71, 0x0A) ++ lstReset ++ Seq(0x71, 0x0A)): _*)
    assert(IonBinary.toJson(reset) == """["a","b"]""")
  }

  test("annotations stripped; NOP padding skipped; unknown SIDs render as $n") {
    // ann::42 : wrapper T=14 L=4 (annLen 1, SID 4 "name", int 42)
    assert(IonBinary.toJson(bin(0xE4, 0x81, 0x84, 0x21, 0x2A)) == "42")
    assert(IonText.toJson("name::42") == "42")
    // NOP pad (0x01 0x00 = 1-byte pad) then int 5
    assert(IonBinary.toJson(bin(0x01, 0x00, 0x21, 0x05)) == "5")
    // symbol with no table entry -> $10
    assert(IonBinary.toJson(bin(0x71, 0x0A)) == "\"$10\"")
  }

  test("timestamps at each precision") {
    // 2026T: offset unknown (0xC0), year VarUInt 2026 = 0x0F 0xEA
    assert(IonBinary.toJson(bin(0x63, 0xC0, 0x0F, 0xEA)) == "\"2026T\"")
    // 2026-02-03: + month 2, day 3
    assert(IonBinary.toJson(bin(0x65, 0xC0, 0x0F, 0xEA, 0x82, 0x83)) ==
      "\"2026-02-03\"")
    // 2026-02-03T04:05Z: offset 0 (0x80), hour 4, minute 5
    assert(IonBinary.toJson(bin(0x67, 0x80, 0x0F, 0xEA, 0x82, 0x83, 0x84, 0x85)) ==
      "\"2026-02-03T04:05Z\"")
    // with seconds + offset +01:00 (60 -> VarInt 0xBC)
    assert(IonBinary.toJson(bin(0x68, 0xBC, 0x0F, 0xEA, 0x82, 0x83, 0x84, 0x85, 0x86)) ==
      "\"2026-02-03T04:05:06+01:00\"")
    assert(IonText.toJson("2026-02-03T04:05:06+01:00") ==
      "\"2026-02-03T04:05:06+01:00\"")
  }

  test("blob and clob render as strings; corrupt payloads return null") {
    // blob {{ aGk= }} = bytes "hi" -> base64 string
    assert(IonBinary.toJson(bin(0xA2, 'h', 'i')) == "\"aGk=\"")
    // clob: payload as string
    assert(IonBinary.toJson(bin(0x92, 'h', 'i')) == "\"hi\"")
    assert(IonBinary.toJson(null) == null)
    assert(IonBinary.toJson(Array[Byte](1, 2, 3)) == null)          // no BVM
    assert(IonBinary.toJson(bin(0x21)) == null)                     // truncated
    assert(IonBinary.toJson(bin(0x8A, 'h', 'i')) == null)           // short string
  }

  test("ParseIonBinary stage parses binary events like ParseIon parses text") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    // {k: 42} with a local symbol table defining "k"
    val symList = Seq(0xB2, 0x81, 'k'.toInt)
    val symStruct = Seq(0xD0 + symList.size + 1, 0x87) ++ symList
    val wrapper = Seq(0xE0 | (symStruct.size + 2), 0x81, 0x83) ++ symStruct
    val payload = bin(wrapper ++ Seq(0xD3, 0x8A, 0x21, 0x2A): _*)
    val binDf = Seq(Tuple1(payload)).toDF("raw")
    val out = Processors.ParseIonBinary("raw", "k INT")(binDf)
      .select("parsed.k").as[Int].collect()
    assert(out.toSeq == Seq(42))
    val textDf = Seq(Tuple1("{k: 42}")).toDF("raw")
    val outText = Processors.ParseIon("raw", "k INT")(textDf)
      .select("parsed.k").as[Int].collect()
    assert(outText.toSeq == out.toSeq)
  }
}
