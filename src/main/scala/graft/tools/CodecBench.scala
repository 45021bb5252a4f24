package graft.tools

import graft.index.{PForDelta, VarByte}

/** Diagnostic main: posting-codec size + decode-speed comparison on the
  * three gap regimes a web index sees (stopword / mid-df / rare terms).
  * Usage: `sbt "runMain graft.tools.CodecBench"`. Numbers land in
  * README "Scale design" and BENCH.md commentary.
  */
object CodecBench {
  def main(a: Array[String]): Unit = {
    val rng = new java.util.Random(42)
    def mk(n: Int, maxGap: Int) = {
      var d = 0L
      Array.fill(n) { d += 1 + rng.nextInt(maxGap); d }
    }
    for ((name, ids) <- Seq(
        ("dense (stopword, gap~4)", mk(1 << 20, 7)),
        ("medium (gap~100)", mk(1 << 18, 199)),
        ("rare (gap~50k)", mk(1 << 14, 99999)))) {
      val vb = VarByte.encodeGaps(ids, ids(0))
      val pf = PForDelta.encodeGaps(ids, ids(0))
      def time(f: => Unit): Double = {
        var i = 0; while (i < 3) { f; i += 1 }
        val t0 = System.nanoTime; var j = 0; while (j < 10) { f; j += 1 }
        (System.nanoTime - t0) / 10e6
      }
      val tv = time(VarByte.decodeGaps(vb, ids.length, ids(0)))
      val tp = time(PForDelta.decodeGaps(pf, ids.length, ids(0)))
      val ev = time(VarByte.encodeGaps(ids, ids(0)))
      val ep = time(PForDelta.encodeGaps(ids, ids(0)))
      assert(PForDelta.decodeGaps(pf, ids.length, ids(0)).sameElements(ids))
      println(f"$name%-26s n=${ids.length}%8d  vbyte=${vb.length}%9dB  pfor=${pf.length}%9dB  ratio=${pf.length.toDouble / vb.length}%.3f  dec: vb=$tv%.1fms pf=$tp%.1fms  enc: vb=$ev%.1fms pf=$ep%.1fms  bits/post=${pf.length * 8.0 / ids.length}%.2f")
    }
  }
}
