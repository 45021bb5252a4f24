package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Byte-pair-encoding tokenizer — trainer and encoder — the subword
  * tokenization stage of a training-data pipeline (Sennrich, Haddow &
  * Birch 2016, "Neural Machine Translation of Rare Words with Subword
  * Units"; the algorithm behind GPT-2/SentencePiece-BPE vocabularies).
  *
  * Representation: a word is its characters, each prefixed with the
  * sentinel U+0001 and space-joined (`"the"` → `"␁t ␁h ␁e"`). A merge
  * (l, r) rewrites every adjacent `"␁l ␁r"` to `"␁lr"` left-to-right
  * non-overlapping — plain string `replace`, available as a codegen'd
  * Column function in Spark AND as the same builtin in DuckDB, so the
  * whole encode path is oracle-replayable. The sentinel makes the rewrite
  * boundary-exact: `"␁a ␁b"` can never false-match the tail of `"␁xa ␁b"`.
  *
  * Apply order: merges apply in RANK order, each globally. For any merge
  * table produced by [[train]] this equals the classic lowest-rank-first
  * loop, because a later merge's output symbol cannot appear as an
  * earlier merge's operand (symbols are only ever built from strictly
  * earlier merges) — BpeSpec pins the two apply strategies equal over the
  * corpus vocabulary.
  *
  * Scale shape: training iterates on the DISTINCT-WORD frequency table
  * (one groupBy of the corpus, then k small jobs over ~10⁶–10⁸ rows with
  * periodic localCheckpoint lineage truncation); encoding is one
  * projection — either the fold-of-replaces Column chain (exact, oracle
  * form) or the [[encodeUdf]] kernel (rank-map loop, O(len²) per word,
  * the production form for 10⁴–10⁵-merge vocabularies where a 50k-deep
  * replace chain would not compile).
  */
object Bpe {

  /** Symbol sentinel (see object doc). */
  val S = "\u0001"

  /** Word → sentinel-prefixed space-joined character symbols, as a
    * Column. The regex replaces each char `c` with `␁c␣`; the trailing
    * space is trimmed. Same regexp replay works in DuckDB
    * (`regexp_replace(w, '(.)', chr(1) || '\1' || ' ', 'g')`). */
  def toSymbols(word: Column): Column =
    rtrim(regexp_replace(word, "(.)", S + "$1 "))

  /** Apply a literal merge table in rank order as a fold of `replace`
    * calls — whole-stage-codegen'd Column algebra, zero shuffles. */
  def applyMerges(symbols: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbols) { case (c, (l, r)) =>
      call_function("replace", c, lit(S + l + " " + S + r), lit(S + l + r))
    }

  /** Encode a word column: symbols → merges → array of subword tokens
    * (sentinels stripped). */
  def encodeCol(word: Column, merges: Seq[(String, String)]): Column =
    transform(split(applyMerges(toSymbols(word), merges), " "),
      t => regexp_replace(t, S, ""))

  /** Production encoder kernel (documented UDF seam): lowest-rank-first
    * merge loop with a rank map — O(len²·log) per word independent of
    * vocabulary size. Equal to [[encodeCol]] for trained tables (object
    * doc; BpeSpec differential). */
  def encodeUdf(merges: Seq[(String, String)]) = {
    val rank = merges.zipWithIndex.toMap
    udf { (w: String) =>
      if (w == null) null
      else {
        var syms = w.map(_.toString).toVector
        var done = false
        while (!done && syms.length > 1) {
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
            if (r < bestRank) bestRank = r
            i += 1
          }
          if (bestRank == Int.MaxValue) done = true
          else {
            val (l, r) = merges(bestRank)
            val out = Vector.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += l + r; j += 2
              } else { out += syms(j); j += 1 }
            }
            syms = out.result()
          }
        }
        syms.toArray
      }
    }
  }

  /** Train `numMerges` merges over a corpus text column.
    *
    * Word frequencies come from one corpus-wide groupBy (the analyzer's
    * tokens); each iteration counts sentinel-symbol adjacent pairs
    * weighted by word frequency (overlapping occurrences count, the
    * classic `get_stats`), picks the max — ties broken by (left, right)
    * ascending for determinism — and rewrites the distinct-word table.
    * Driver traffic per iteration is ONE row; the word table
    * localCheckpoints every 8 iterations so lineage stays flat. */
  def train(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var words = df
      .select(explode(Analyzer.tokensCol(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(toSymbols(col("w")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val arr = split(col("sym"), " ")
      val pairs = transform(sequence(lit(0), size(arr) - 2), j =>
        struct(element_at(arr, j + 1).as("l"), element_at(arr, j + 2).as("r")))
      val top = words
        .filter(size(arr) >= 2)
        .select(explode(pairs).as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getAs[String]("l").substring(1) // strip sentinel
        val r = top(0).getAs[String]("r").substring(1)
        merges += ((l, r))
        words = words.select(
          call_function("replace", col("sym"),
            lit(S + l + " " + S + r), lit(S + l + r)).as("sym"),
          col("freq"))
        if ((i + 1) % 8 == 0) words = words.localCheckpoint()
      }
      i += 1
    }
    merges.result()
  }

  /** Per-document subword token count under a merge table — the budget
    * column sequence packing and token-count accounting consume. Column
    * path (exact replay form). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column =
    aggregate(
      transform(Analyzer.tokensCol(text), w => size(encodeCol(w, merges))),
      lit(0), (acc, x) => acc + x)
}
