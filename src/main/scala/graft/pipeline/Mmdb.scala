package graft.pipeline

import scala.collection.mutable

/** Own-kernel MaxMind DB (mmdb) reader + fixture writer.
  *
  * The reference's `geoip` processor opens a MaxMind database file
  * (geoip-processor/.../GeoIPProcessor.java:43 via GeoIPDatabaseManager);
  * this decodes the same PUBLIC file format
  * (https://maxmind.github.io/MaxMind-DB/ — binary search tree over
  * address bits + type-tagged data section + metadata map) with no
  * external library, in the repo's own-kernel style (IonBinary,
  * OtlpProto). The Spark-native serving shape is unchanged: the decoded
  * (cidr → record) table feeds [[Enrich.geoLookup]]'s broadcast range
  * join — the mmdb is a DIMENSION FILE, decoded once on the driver
  * (databases are MBs; the 10^12-row fact side never touches the binary).
  *
  * Reader supports the full data format: all record sizes (24/28/32),
  * pointers, strings, double/float, bytes, uint16/32/64/128, int32, maps,
  * arrays, booleans. Writer (fixture synthesis + tests) emits 24/28/32-bit
  * trees and deduplicates the data section via backward pointers, so
  * round-trips exercise the pointer path.
  */
object Mmdb {

  /** 14-byte metadata marker: \xab\xcd\xef + "MaxMind.com". */
  private val Marker: Array[Byte] =
    Array(0xab.toByte, 0xcd.toByte, 0xef.toByte) ++ "MaxMind.com".getBytes("UTF-8")

  // ------------------------------------------------------------------ reader

  /** A decoded database: metadata plus lazy tree access. */
  final class Db(buf: Array[Byte]) {
    val metadata: Map[String, Any] = {
      val at = lastIndexOfMarker(buf)
      require(at >= 0, "no MaxMind.com metadata marker")
      new DataDecoder(buf, at + Marker.length).decode(at + Marker.length)._1
        .asInstanceOf[Map[String, Any]]
    }
    val nodeCount: Int = metadata("node_count").asInstanceOf[Long].toInt
    val recordSize: Int = metadata("record_size").asInstanceOf[Long].toInt
    val ipVersion: Int = metadata("ip_version").asInstanceOf[Long].toInt
    require(Set(24, 28, 32)(recordSize), s"record_size $recordSize")
    private val nodeBytes = recordSize * 2 / 8
    private val treeBytes = nodeCount * nodeBytes
    /** Data section begins after the tree and its 16-byte null separator. */
    private val dataStart = treeBytes + 16
    private val decoder = new DataDecoder(buf, dataStart)

    /** Record `side` (0=left, 1=right) of `node`. */
    private def record(node: Int, side: Int): Int = {
      val base = node * nodeBytes
      def b(i: Int) = buf(base + i) & 0xff
      recordSize match {
        case 24 => if (side == 0) (b(0) << 16) | (b(1) << 8) | b(2)
                   else (b(3) << 16) | (b(4) << 8) | b(5)
        case 28 => if (side == 0) ((b(3) & 0xf0) << 20) | (b(0) << 16) | (b(1) << 8) | b(2)
                   else ((b(3) & 0x0f) << 24) | (b(4) << 16) | (b(5) << 8) | b(6)
        case 32 => if (side == 0) (b(0) << 24) | (b(1) << 16) | (b(2) << 8) | b(3)
                   else (b(4) << 24) | (b(5) << 16) | (b(6) << 8) | b(7)
      }
    }

    private def dataAt(recordValue: Int): Any =
      // spec: file offset = (value - node_count) + tree bytes; the first
      // 16 of those bytes are the separator, so the data-section-relative
      // offset is value - node_count - 16
      decoder.decode(dataStart + (recordValue - nodeCount - 16))._1

    /** Walk the tree for one address (network byte order). */
    def lookupBits(addr: Array[Byte]): Option[Any] = {
      var node = 0
      var i = 0
      val nBits = addr.length * 8
      while (i < nBits) {
        val bit = (addr(i >> 3) >> (7 - (i & 7))) & 1
        val r = record(node, bit)
        if (r == nodeCount) return None
        if (r > nodeCount) return Some(dataAt(r))
        node = r
        i += 1
      }
      None
    }

    /** Look up a dotted-quad IPv4 address (an IPv6 tree embeds IPv4 under
      * 96 leading zero bits, per spec). */
    def lookup(ipv4: String): Option[Any] = {
      val q = ipv4.split("\\.").map(s => s.toInt.toByte)
      require(q.length == 4, s"not an IPv4 address: $ipv4")
      lookupBits(if (ipVersion == 6) new Array[Byte](12) ++ q else q)
    }

    /** Enumerate every (cidr, record) the tree stores — the decode-to-
      * dimension-table path that feeds the broadcast range join. */
    def entries(): Seq[(String, Any)] = {
      val maxDepth = if (ipVersion == 6) 128 else 32
      val out = Seq.newBuilder[(String, Any)]
      def walk(node: Int, bits: Long, bitsHi: Long, depth: Int): Unit = {
        var side = 0
        while (side < 2) {
          val (lo, hi) =
            if (depth < 64) (bits, bitsHi | (side.toLong << (63 - depth)))
            else (bits | (side.toLong << (127 - depth)), bitsHi)
          val r = record(node, side)
          if (r < nodeCount) {
            require(depth + 1 < maxDepth, "tree deeper than address")
            walk(r, lo, hi, depth + 1)
          } else if (r > nodeCount) {
            out += formatCidr(lo, hi, depth + 1, maxDepth) -> dataAt(r)
          }
          side += 1
        }
      }
      // bitsHi carries address bits 0-63, bits carries 64-127 (ipv4 uses
      // only the top 32 of bitsHi)
      if (nodeCount > 0) walk(0, 0L, 0L, 0)
      out.result()
    }

    private def formatCidr(lo: Long, hi: Long, prefix: Int, maxDepth: Int): String =
      if (maxDepth == 32) {
        val ip = (hi >>> 32).toInt
        s"${(ip >>> 24) & 0xff}.${(ip >>> 16) & 0xff}.${(ip >>> 8) & 0xff}.${ip & 0xff}/$prefix"
      } else {
        val groups = (0 until 4).map(i => ((hi >>> (48 - 16 * i)) & 0xffff).toInt) ++
          (0 until 4).map(i => ((lo >>> (48 - 16 * i)) & 0xffff).toInt)
        groups.map(g => f"$g%x").mkString(":") + s"/$prefix"
      }
  }

  def read(bytes: Array[Byte]): Db = new Db(bytes)

  private def lastIndexOfMarker(buf: Array[Byte]): Int = {
    var i = buf.length - Marker.length
    while (i >= 0) {
      var j = 0
      while (j < Marker.length && buf(i + j) == Marker(j)) j += 1
      if (j == Marker.length) return i
      i -= 1
    }
    -1
  }

  /** Type-tagged data-format decoder. `sectionStart` anchors pointers
    * (spec: pointer values are relative to the start of the data
    * section). Returns (value, position after the value). */
  private final class DataDecoder(buf: Array[Byte], sectionStart: Int) {
    def decode(pos: Int): (Any, Int) = {
      require(pos >= 0 && pos < buf.length, s"decode out of range: $pos")
      val ctrl = buf(pos) & 0xff
      var p = pos + 1
      var tpe = ctrl >>> 5
      if (tpe == 0) { tpe = (buf(p) & 0xff) + 7; p += 1 } // extended type

      if (tpe == 1) { // pointer: size bits encode width, value is an offset
        val ss = (ctrl >>> 3) & 3
        val top = ctrl & 7
        var (v, np) = ss match {
          case 0 => ((top << 8) | (buf(p) & 0xff), p + 1)
          case 1 => (((top << 16) | ((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff)) + 2048, p + 2)
          case 2 => (((top << 24) | ((buf(p) & 0xff) << 16) | ((buf(p + 1) & 0xff) << 8) |
            (buf(p + 2) & 0xff)) + 526336, p + 3)
          case _ => (((buf(p) & 0xff) << 24) | ((buf(p + 1) & 0xff) << 16) |
            ((buf(p + 2) & 0xff) << 8) | (buf(p + 3) & 0xff), p + 4)
        }
        val (value, _) = decode(sectionStart + v)
        return (value, np)
      }

      var size = ctrl & 0x1f
      if (size == 29) { size = 29 + (buf(p) & 0xff); p += 1 }
      else if (size == 30) { size = 285 + ((buf(p) & 0xff) << 8) + (buf(p + 1) & 0xff); p += 2 }
      else if (size == 31) {
        size = 65821 + ((buf(p) & 0xff) << 16) + ((buf(p + 1) & 0xff) << 8) + (buf(p + 2) & 0xff)
        p += 3
      }

      def uintN(n: Int): Long = {
        var r = 0L; var i = 0
        while (i < n) { r = (r << 8) | (buf(p + i) & 0xff); i += 1 }
        r
      }
      tpe match {
        case 2 => (new String(buf, p, size, "UTF-8"), p + size)
        case 3 =>
          require(size == 8, "double size"); (java.lang.Double.longBitsToDouble(uintN(8)), p + 8)
        case 4 => (java.util.Arrays.copyOfRange(buf, p, p + size), p + size)
        case 5 | 6 | 9 => (uintN(size), p + size) // uint16/32/64 → Long
        case 7 =>
          var q = p
          val m = Map.newBuilder[String, Any]
          var i = 0
          while (i < size) {
            val (k, q1) = decode(q)
            val (v, q2) = decode(q1)
            m += k.asInstanceOf[String] -> v
            q = q2; i += 1
          }
          (m.result(), q)
        case 8 => // int32: sign-extend from the stored width
          val u = uintN(size)
          val shift = 64 - 8 * math.max(size, 1)
          (if (size == 0) 0L else (u << shift) >> shift, p + size)
        case 10 => (BigInt(1, java.util.Arrays.copyOfRange(buf, p, p + size)), p + size)
        case 11 =>
          var q = p
          val a = Vector.newBuilder[Any]
          var i = 0
          while (i < size) { val (v, q1) = decode(q); a += v; q = q1; i += 1 }
          (a.result(), q)
        case 12 => // data cache container: decode contents like an array
          var q = p
          var i = 0
          while (i < size) { val (_, q1) = decode(q); q = q1; i += 1 }
          (Vector.empty[Any], q)
        case 13 => (null, p) // end marker
        case 14 => (size == 1, p) // boolean: size IS the value
        case 15 =>
          require(size == 4, "float size")
          (java.lang.Float.intBitsToFloat(uintN(4).toInt), p + 4)
        case t => throw new IllegalArgumentException(s"mmdb type $t")
      }
    }
  }

  // ------------------------------------------------------------------ writer

  /** Synthesize a database from (cidr → record) entries. IPv4 trees only
    * (fixtures); record values support String / Long / Int / Double /
    * Boolean / Map / Seq. Deterministic bytes for fixed input (build_epoch
    * pinned). Identical values share one data-section encoding via
    * backward pointers. */
  def write(entries: Seq[(String, Map[String, Any])], recordSize: Int = 24,
      databaseType: String = "graft-Test"): Array[Byte] = {
    require(Set(24, 28, 32)(recordSize), s"record_size $recordSize")

    // --- binary trie over prefix bits
    final class Node {
      var left: Node = _; var right: Node = _; var data: Option[Int] = None
    }
    val root = new Node
    val values = mutable.ArrayBuffer[Map[String, Any]]()
    entries.foreach { case (cidr, value) =>
      val Array(base, bitsS) = cidr.split("/")
      val prefix = bitsS.toInt
      val q = base.split("\\.").map(_.toInt)
      val ip = (q(0) << 24) | (q(1) << 16) | (q(2) << 8) | q(3)
      var node = root
      var i = 0
      while (i < prefix) {
        val bit = (ip >>> (31 - i)) & 1
        node = if (bit == 0) {
          if (node.left == null) node.left = new Node
          node.left
        } else {
          if (node.right == null) node.right = new Node
          node.right
        }
        require(node.data.isEmpty || i == prefix - 1, s"$cidr nests inside a data node")
        i += 1
      }
      require(node.left == null && node.right == null, s"$cidr covers narrower entries")
      node.data = Some { values += value; values.length - 1 }
    }

    // --- number internal nodes (breadth-first; root = 0)
    val internal = mutable.ArrayBuffer[Node]()
    val idx = mutable.AnyRefMap[Node, Int]()
    val queue = mutable.Queue[Node](root)
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      idx(n) = internal.length
      internal += n
      for (c <- Seq(n.left, n.right) if c != null && c.data.isEmpty) queue += c
    }
    val nodeCount = internal.length

    // --- data section with pointer dedup
    val data = new java.io.ByteArrayOutputStream()
    val offsets = mutable.HashMap[Any, Int]()
    def writeCtrl(tpe: Int, size: Int): Unit = {
      val (c, extra) =
        if (size < 29) (size, Array.empty[Int])
        else if (size < 285) (29, Array(size - 29))
        else (30, Array((size - 285) >> 8, (size - 285) & 0xff))
      if (tpe <= 7) data.write((tpe << 5) | c)
      else { data.write(c); data.write(tpe - 7) }
      extra.foreach(data.write)
    }
    def writePointer(offset: Int): Unit = {
      if (offset < 2048) { data.write((1 << 5) | (offset >> 8)); data.write(offset & 0xff) }
      else if (offset < 526336) {
        val v = offset - 2048
        data.write((1 << 5) | (1 << 3) | (v >> 16)); data.write((v >> 8) & 0xff); data.write(v & 0xff)
      } else {
        val v = offset - 526336
        data.write((1 << 5) | (2 << 3) | (v >> 24))
        data.write((v >> 16) & 0xff); data.write((v >> 8) & 0xff); data.write(v & 0xff)
      }
    }
    def encode(v: Any): Int = offsets.get(v) match {
      case Some(off) => writePointer(off); -1
      case None =>
        val off = data.size()
        v match {
          case s: String =>
            val b = s.getBytes("UTF-8"); writeCtrl(2, b.length); data.write(b)
          case d: Double =>
            writeCtrl(3, 8)
            val bits = java.lang.Double.doubleToLongBits(d)
            (7 to 0 by -1).foreach(i => data.write(((bits >> (8 * i)) & 0xff).toInt))
          case b: Boolean => writeCtrl(14, if (b) 1 else 0)
          case i: Int => encodeLong(i.toLong)
          case l: Long => encodeLong(l)
          case m: Map[_, _] =>
            writeCtrl(7, m.size)
            m.foreach { case (k, mv) => encode(k.asInstanceOf[String]); encode(mv) }
          case xs: Seq[_] =>
            writeCtrl(11, xs.size)
            xs.foreach(encode)
          case other => throw new IllegalArgumentException(s"unsupported value $other")
        }
        // maps/seqs contain pointers to shared children, still dedupable
        // as wholes only if re-encoded identically — cache by VALUE
        offsets(v) = off
        off
    }
    def encodeLong(l: Long): Unit = {
      require(l >= 0, "writer encodes unsigned ints only")
      val bytes = (0 to 7).reverse.map(i => ((l >> (8 * i)) & 0xff).toInt).dropWhile(_ == 0)
      val (tpe, bs) =
        if (l <= 0xffffL) (5, bytes) else if (l <= 0xffffffffL) (6, bytes) else (9, bytes)
      writeCtrl(tpe, bs.length); bs.foreach(data.write)
    }
    val valueOffsets = values.map(encode).toArray
    // dedup can return -1 only for repeat top-level values; recover offset
    values.indices.foreach { i =>
      if (valueOffsets(i) < 0) valueOffsets(i) = offsets(values(i))
    }

    // --- tree section
    val nodeBytes = recordSize * 2 / 8
    val tree = new Array[Byte](nodeCount * nodeBytes)
    def recordValue(c: Node): Int =
      if (c == null) nodeCount
      else c.data match {
        case Some(vi) => nodeCount + 16 + valueOffsets(vi)
        case None => idx(c)
      }
    internal.zipWithIndex.foreach { case (n, i) =>
      val l = recordValue(n.left)
      val r = recordValue(n.right)
      val base = i * nodeBytes
      recordSize match {
        case 24 =>
          tree(base) = (l >> 16).toByte; tree(base + 1) = (l >> 8).toByte; tree(base + 2) = l.toByte
          tree(base + 3) = (r >> 16).toByte; tree(base + 4) = (r >> 8).toByte; tree(base + 5) = r.toByte
        case 28 =>
          tree(base) = (l >> 16).toByte; tree(base + 1) = (l >> 8).toByte; tree(base + 2) = l.toByte
          tree(base + 3) = (((l >> 24) << 4) | ((r >> 24) & 0x0f)).toByte
          tree(base + 4) = (r >> 16).toByte; tree(base + 5) = (r >> 8).toByte; tree(base + 6) = r.toByte
        case 32 =>
          tree(base) = (l >> 24).toByte; tree(base + 1) = (l >> 16).toByte
          tree(base + 2) = (l >> 8).toByte; tree(base + 3) = l.toByte
          tree(base + 4) = (r >> 24).toByte; tree(base + 5) = (r >> 16).toByte
          tree(base + 6) = (r >> 8).toByte; tree(base + 7) = r.toByte
      }
    }

    // --- assemble: tree | 16-byte separator | data | marker | metadata
    // (metadata is pointer-free and deterministic: fixed build_epoch)
    val out = new java.io.ByteArrayOutputStream()
    out.write(tree)
    out.write(new Array[Byte](16))
    data.writeTo(out)
    out.write(Marker)
    // metadata map encoded standalone (no pointers): use a fresh encoder
    out.write(encodeStandalone(Map(
      "binary_format_major_version" -> 2L,
      "binary_format_minor_version" -> 0L,
      "build_epoch" -> 1700000000L,
      "database_type" -> databaseType,
      "description" -> Map("en" -> "graft synthetic fixture"),
      "ip_version" -> 4L,
      "languages" -> Seq("en"),
      "node_count" -> nodeCount.toLong,
      "record_size" -> recordSize.toLong)))
    out.toByteArray
  }

  /** Pointer-free standalone encoding (metadata section). */
  private def encodeStandalone(v: Any): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ctrl(tpe: Int, size: Int): Unit = {
      val (c, extra) =
        if (size < 29) (size, Array.empty[Int])
        else if (size < 285) (29, Array(size - 29))
        else (30, Array((size - 285) >> 8, (size - 285) & 0xff))
      if (tpe <= 7) out.write((tpe << 5) | c)
      else { out.write(c); out.write(tpe - 7) }
      extra.foreach(out.write)
    }
    def enc(v: Any): Unit = v match {
      case s: String => val b = s.getBytes("UTF-8"); ctrl(2, b.length); out.write(b)
      case l: Long =>
        val bytes = (0 to 7).reverse.map(i => ((l >> (8 * i)) & 0xff).toInt).dropWhile(_ == 0)
        val tpe = if (l <= 0xffffL) 5 else if (l <= 0xffffffffL) 6 else 9
        ctrl(tpe, bytes.length); bytes.foreach(out.write)
      case m: Map[_, _] =>
        ctrl(7, m.size); m.foreach { case (k, mv) => enc(k.asInstanceOf[String]); enc(mv) }
      case xs: Seq[_] => ctrl(11, xs.size); xs.foreach(enc)
      case other => throw new IllegalArgumentException(s"metadata value $other")
    }
    enc(v)
    out.toByteArray
  }
}
