package graft.query

import graft.index.PForDelta

/** Exact phrase top-k over a POSITIONAL index (built with
  * `IndexParams(positions = true)`).
  *
  * Semantics (documented, and mirrored by [[BruteForce.phraseScoreAll]] and
  * the q_phrase_topk DuckDB oracle): a document matches when the phrase's
  * tokens occur at strictly consecutive positions; `phrase_tf` = number of
  * match start positions; score = BM25 with tf = phrase_tf and
  * idf = Σ over phrase SLOTS of the member term's idf (a duplicated term
  * contributes once per slot — the multi-term weighting Lucene's
  * PhraseQuery uses). Replaces the reference's delegation of `match_phrase`
  * to OpenSearch/Lucene.
  *
  * Execution per shard: leapfrog document-at-a-time intersection over one
  * positional cursor per phrase slot — `advanceTo` skips whole blocks via
  * (firstDocId, lastDocId) metadata without decoding, and a block's
  * position payload is decoded only when a document actually aligns on all
  * slots. Cost is driven by the rarest term, like every conjunctive
  * executor; the shard fan-out is the same structural skew story as WAND
  * (a hot term's postings are spread over all docId shards).
  */
object Phrase {

  /** Positional cursor over one phrase slot's blocks within one shard
    * (blocks docId-disjoint, sorted by firstDocId). Ids/tfs/dls decode
    * per block on entry; the position payload decodes lazily on first
    * [[positions]] call for the block. */
  final class PosCursor(blocks: Array[SegmentRead]) {
    private var bi = 0
    private var i = 0
    private var ids: Array[Long] = null
    private var tfs: Array[Long] = null
    private var dls: Array[Long] = null
    private var posOff: Array[Int] = null
    private var posAll: Array[Long] = null

    decodeIfNeeded()

    private def decodeIfNeeded(): Unit = {
      if (bi < blocks.length && ids == null) {
        val b = blocks(bi)
        ids = PForDelta.decodeGaps(b.gaps, b.n, b.firstDocId)
        tfs = PForDelta.decode(b.tfs, b.n)
        dls = PForDelta.decode(b.dls, b.n)
        posOff = null
        posAll = null
        i = 0
      }
    }

    def exhausted: Boolean = bi >= blocks.length
    def curDoc: Long = if (exhausted) Long.MaxValue else ids(i)
    def dl: Long = dls(i)

    /** Absolute ascending positions of the current posting, as
      * (array, from, until) into the block's decoded payload. */
    def positions(): (Array[Long], Int, Int) = {
      if (posAll == null) {
        val b = blocks(bi)
        require(b.pos != null,
          "no positional payload in segment — index built with positions=false")
        posOff = new Array[Int](b.n + 1)
        var t = 0
        var j = 0
        while (j < b.n) { t += tfs(j).toInt; posOff(j + 1) = t; j += 1 }
        posAll = PForDelta.decode(b.pos, t)
        // un-delta within each posting (first value is absolute)
        j = 0
        while (j < b.n) {
          var p = posOff(j) + 1
          while (p < posOff(j + 1)) { posAll(p) += posAll(p - 1); p += 1 }
          j += 1
        }
      }
      (posAll, posOff(i), posOff(i + 1))
    }

    def advance(): Unit = {
      i += 1
      if (i >= blocks(bi).n) { bi += 1; ids = null; decodeIfNeeded() }
    }

    /** First posting with docId >= target; whole-block skips never decode
      * the skipped payloads. */
    def advanceTo(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      while (bi < blocks.length && blocks(bi).lastDocId < target) {
        bi += 1; ids = null
      }
      if (bi >= blocks.length) return
      decodeIfNeeded()
      var lo = i
      var hi = blocks(bi).n - 1
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ids(mid) < target) lo = mid + 1 else hi = mid
      }
      i = lo
    }
  }

  /** Match-start count for the aligned document: for each occurrence p of
    * slot 0, every later slot j must contain p + j. Positions ascend and
    * starts ascend, so each slot keeps a monotone pointer — O(Σ tf). */
  private def phraseTf(cursors: Array[PosCursor]): Long = {
    val m = cursors.length
    val arrs = new Array[(Array[Long], Int, Int)](m)
    var j = 0
    while (j < m) { arrs(j) = cursors(j).positions(); j += 1 }
    phraseTfArrs(arrs)
  }

  /** [[phraseTf]] over raw (positions, from, until) slot views — shared
    * with the match_phrase_prefix path, whose last slot is a MERGED union
    * of expansion terms' positions rather than one cursor's. */
  private[query] def phraseTfArrs(arrs: Array[(Array[Long], Int, Int)])
      : Long = {
    val m = arrs.length
    val (p0, f0, u0) = arrs(0)
    val ptr = Array.tabulate(m)(j => arrs(j)._2)
    var count = 0L
    var a = f0
    while (a < u0) {
      val want0 = p0(a)
      var ok = true
      var j = 1
      while (ok && j < m) {
        val (pj, _, uj) = arrs(j)
        val want = want0 + j
        var q = ptr(j)
        while (q < uj && pj(q) < want) q += 1
        ptr(j) = q
        ok = q < uj && pj(q) == want
        j += 1
      }
      if (ok) count += 1
      a += 1
    }
    count
  }

  /** Ordered-proximity match-start count (the `slop` path — semantics on
    * [[BruteForce.phraseSlopScoreAll]]): for each occurrence p₀ of slot 0
    * the GREEDY chain picks the smallest position pⱼ > pⱼ₋₁ of each later
    * slot; the start matches when the chain exists with stretch
    * `p_{m-1} − p₀ − (m−1)` ≤ slop. Greedy picks are monotone in p₀, so
    * each slot keeps a monotone pointer — O(Σ tf), same complexity as the
    * exact counter. `slop = 0` counts exactly [[phraseTf]]'s starts
    * (greedy minimizes the stretch; PhraseSpec pins the equivalence). */
  private def phraseTfSlop(cursors: Array[PosCursor], slop: Int): Long = {
    val m = cursors.length
    val arrs = new Array[(Array[Long], Int, Int)](m)
    var j = 0
    while (j < m) { arrs(j) = cursors(j).positions(); j += 1 }
    phraseTfSlopArrs(arrs, slop)
  }

  /** [[phraseTfSlop]] over raw slot views (see [[phraseTfArrs]]). */
  private[query] def phraseTfSlopArrs(arrs: Array[(Array[Long], Int, Int)],
      slop: Int): Long = {
    val m = arrs.length
    val (p0, f0, u0) = arrs(0)
    val ptr = Array.tabulate(m)(j => arrs(j)._2)
    var count = 0L
    var a = f0
    while (a < u0) {
      var prev = p0(a)
      var ok = true
      var j = 1
      while (ok && j < m) {
        val (pj, _, uj) = arrs(j)
        var q = ptr(j)
        while (q < uj && pj(q) <= prev) q += 1
        ptr(j) = q
        if (q < uj) prev = pj(q) else ok = false
        j += 1
      }
      if (ok && prev - p0(a) - (m - 1) <= slop) count += 1
      a += 1
    }
    count
  }

  /** Executor-side per-shard phrase scorer emitting EVERY matching doc —
    * the composition primitive behind [[shardTopK]] and the query-string
    * engine's phrase clauses (which need full per-doc phrase scores to sum
    * with term clauses, not a pre-truncated page). Same leapfrog
    * skeleton: `slop = 0` runs the exact consecutive-position counter;
    * `slop > 0` the greedy ordered-proximity counter (a document still
    * must contain every slot term). Matches per shard are bounded by the
    * shard's doc range, so the buffer is shard-sized at worst. */
  def shardScores(avgdl: Double, phrase: Seq[String], idfSum: Double,
      deleted: Array[Long] = null, slop: Int = 0)(
      shard: Long, rows: Iterator[SegmentRead]): Iterator[Scored] = {
    val byTerm = rows.toArray.groupBy(_.term)
    // a shard missing ANY slot term cannot match the phrase
    if (phrase.distinct.exists(t => !byTerm.contains(t))) return Iterator.empty
    val cursors = phrase.map { t =>
      new PosCursor(byTerm(t).sortBy(_.firstDocId))
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var live = true
    while (live && !cursors.exists(_.exhausted)) {
      var target = 0L
      var j = 0
      while (j < cursors.length) {
        if (cursors(j).curDoc > target) target = cursors(j).curDoc
        j += 1
      }
      var aligned = true
      j = 0
      while (j < cursors.length) {
        cursors(j).advanceTo(target)
        if (cursors(j).exhausted) { aligned = false; live = false }
        else if (cursors(j).curDoc != target) aligned = false
        j += 1
      }
      if (aligned) {
        val ptf =
          if (IndexReader.isDeleted(deleted, target)) 0
          else if (slop == 0) phraseTf(cursors)
          else phraseTfSlop(cursors, slop)
        if (ptf > 0)
          out += Scored(target,
            Bm25.score(idfSum, ptf.toDouble, cursors(0).dl.toDouble, avgdl))
        j = 0
        while (j < cursors.length) { cursors(j).advance(); j += 1 }
      }
    }
    out.iterator
  }

  /** Executor-side per-shard phrase top-k — top-level so the Spark closure
    * captures only scalars + the phrase. `idfSum` is computed driver-side
    * from the GLOBAL merged dfs (a shard only sees its own generations).
    * Selection = [[shardScores]] through a bounded heap. */
  def shardTopK(avgdl: Double, k: Int, phrase: Seq[String], idfSum: Double,
      deleted: Array[Long] = null, slop: Int = 0)(
      shard: Long, rows: Iterator[SegmentRead]): Iterator[Scored] = {
    val topk = new TopKHeap(k)
    shardScores(avgdl, phrase, idfSum, deleted, slop)(shard, rows)
      .foreach(s => topk.offer(s.docId, s.score))
    topk.result().iterator
  }

  /** Executor-side per-shard match_phrase_prefix scorer: slots
    * `exact` match their terms, the LAST slot matches ANY `expansion`
    * term — its position list per document is the MERGED union of the
    * expansion cursors' positions. Leapfrog drives on the exact slots
    * (every doc must contain them all); expansion cursors advance to each
    * aligned target and only contributors' payloads decode. Emits every
    * matching doc (selection is the caller's heap/TakeOrdered). */
  def shardPrefixScores(avgdl: Double, exact: Seq[String],
      expansion: Seq[String], idfSum: Double, deleted: Array[Long] = null,
      slop: Int = 0)(
      shard: Long, rows: Iterator[SegmentRead]): Iterator[Scored] = {
    require(exact.nonEmpty,
      "match_phrase_prefix needs >= 1 exact slot (use a prefix query for 1-term)")
    val byTerm = rows.toArray.groupBy(_.term)
    if (exact.distinct.exists(t => !byTerm.contains(t))) return Iterator.empty
    val expTerms = expansion.distinct.sorted.filter(byTerm.contains)
    if (expTerms.isEmpty) return Iterator.empty
    val cursors = exact.map { t =>
      new PosCursor(byTerm(t).sortBy(_.firstDocId))
    }.toArray
    val expCursors = expTerms.map { t =>
      new PosCursor(byTerm(t).sortBy(_.firstDocId))
    }.toArray
    val out = scala.collection.mutable.ArrayBuffer.empty[Scored]
    var live = true
    while (live && !cursors.exists(_.exhausted)) {
      var target = 0L
      var j = 0
      while (j < cursors.length) {
        if (cursors(j).curDoc > target) target = cursors(j).curDoc
        j += 1
      }
      var aligned = true
      j = 0
      while (j < cursors.length) {
        cursors(j).advanceTo(target)
        if (cursors(j).exhausted) { aligned = false; live = false }
        else if (cursors(j).curDoc != target) aligned = false
        j += 1
      }
      if (aligned) {
        if (!IndexReader.isDeleted(deleted, target)) {
          // merged ascending union of the expansion terms' positions
          var total = 0
          val slices = new Array[(Array[Long], Int, Int)](expCursors.length)
          j = 0
          while (j < expCursors.length) {
            expCursors(j).advanceTo(target)
            if (!expCursors(j).exhausted && expCursors(j).curDoc == target) {
              val s = expCursors(j).positions()
              slices(j) = s
              total += s._3 - s._2
            }
            j += 1
          }
          if (total > 0) {
            val merged = new Array[Long](total)
            var w = 0
            j = 0
            while (j < slices.length) {
              val s = slices(j)
              if (s != null) {
                var q = s._2
                while (q < s._3) { merged(w) = s._1(q); w += 1; q += 1 }
              }
              j += 1
            }
            java.util.Arrays.sort(merged)
            val arrs = new Array[(Array[Long], Int, Int)](cursors.length + 1)
            j = 0
            while (j < cursors.length) { arrs(j) = cursors(j).positions(); j += 1 }
            arrs(cursors.length) = (merged, 0, merged.length)
            val ptf =
              if (slop == 0) phraseTfArrs(arrs) else phraseTfSlopArrs(arrs, slop)
            if (ptf > 0)
              out += Scored(target,
                Bm25.score(idfSum, ptf.toDouble, cursors(0).dl.toDouble, avgdl))
          }
        }
        j = 0
        while (j < cursors.length) { cursors(j).advance(); j += 1 }
      }
    }
    out.iterator
  }
}
