package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analyze.Analyzer

/** Result-shaping and query-expansion operators over a scored result set
  * or the corpus term dictionary — the query-side features a Data Prepper
  * deployment gets from OpenSearch's search API (`collapse`, `fuzziness`,
  * `more_like_this`) and therefore part of the replace-the-stack surface,
  * reference `opensearch/.../OpenSearchSink.java:63` being the hand-off
  * point where the reference stops and OpenSearch takes over.
  *
  * All three are plain Catalyst plans: one keyed window (collapse), one
  * pruned dictionary scan (fuzzy), two aggregations + a scorer reuse
  * (more-like-this). Nothing here materializes candidate result sets on
  * the driver.
  */
object Search {

  /** Field-collapse top-k (OpenSearch `collapse`): keep the best `perKey`
    * rows per collapse key (e.g. host — one result per site), then the
    * global top `k` by score. Tie-break on ascending id, the engine's
    * rank-stability convention.
    *
    * Plan: one window over the collapse key (keyed shuffle; at 10¹² docs
    * the scored set entering collapse is already ≤ shards×k from the
    * WAND/top-k stage, so the window input is small by construction) +
    * a global TakeOrderedAndProject. */
  def collapseTopK(scored: DataFrame, keyCol: String, scoreCol: String,
      idCol: String, k: Int, perKey: Int = 1): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(desc(scoreCol), col(idCol))
    // collision-proof temp name: withColumn + drop on a fixed "_rnk" would
    // silently clobber a caller column of the same name (ADVICE r5)
    var rnk = "_rnk"
    while (scored.columns.contains(rnk)) rnk += "_"
    scored.withColumn(rnk, row_number().over(w))
      .filter(col(rnk) <= perKey)
      .drop(rnk)
      .orderBy(desc(scoreCol), col(idCol))
      .limit(k)
  }

  /** Fuzzy term expansion (OpenSearch `fuzziness`): dictionary terms
    * within Levenshtein distance `maxDist` of the query term, with their
    * distance. The length pre-filter is exact-preserving (an edit
    * distance of d cannot change length by more than d), so Catalyst
    * prunes most of the dictionary before the O(len²) comparison runs.
    * `dict` is the (term, …) dictionary — `IndexReader` metadata or a
    * distinct-token aggregate; either way ≪ corpus size. */
  def fuzzyExpand(dict: DataFrame, termCol: String, query: String,
      maxDist: Int = 1): DataFrame = {
    val q = Analyzer.lowerLikeCatalyst(query)
    dict
      .filter(abs(length(col(termCol)) - lit(q.length)) <= maxDist)
      .withColumn("dist", levenshtein(col(termCol), lit(q)))
      .filter(col("dist") <= maxDist)
  }

  /** Fuzzy-expanded BM25 top-k: expand each query term against the corpus
    * dictionary ([[fuzzyExpand]]), then score the UNION of surviving
    * terms with the standard BM25 scorer. OpenSearch semantics: an
    * expanded term scores with its own document frequency. The expansion
    * is collected to the driver — it is query construction (bounded by
    * the dictionary slice within edit distance, tiny by nature), not a
    * data move. */
  def fuzzyTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int, maxDist: Int = 1): DataFrame = {
    val dict = Analyzer.tokens(docs, idCol, textCol).select("term").distinct()
    val expanded = queryTerms.flatMap { t =>
      fuzzyExpand(dict, "term", t, maxDist)
        .select("term").collect().map(_.getString(0))
    }.distinct.sorted
    // schema-stable empty page (ADVICE r5): zero rows but the documented
    // (idCol, score) shape, so downstream select/union keeps working when
    // no dictionary term is within edit distance of a misspelled query
    if (expanded.isEmpty)
      docs.select(col(idCol), lit(0.0).as("score")).limit(0)
    else BruteForce.scoreAll(docs, idCol, textCol, expanded)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** "Did you mean" suggester (OpenSearch `term` suggester semantics):
    * dictionary terms within `maxDist` of the input, ranked by edit
    * distance first (closer is better), then corpus frequency (more
    * common is better), then term — so a typo's dominant correction
    * surfaces first. `dict` must carry (termCol, freqCol). */
  def suggest(dict: DataFrame, termCol: String, freqCol: String,
      query: String, maxDist: Int = 2, n: Int = 5): DataFrame =
    fuzzyExpand(dict, termCol, query, maxDist)
      .orderBy(col("dist"), desc(freqCol), col(termCol))
      .limit(n)

  /** Facet counts (OpenSearch `terms` aggregation beside a query): bucket
    * counts of `facetCol` over the full MATCH SET (any query term
    * present), not just the returned page — one semi-join + one keyed
    * aggregation with map-side partial combine. */
  def facets(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], facetCol: String): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val matching = Analyzer.tokens(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .select(col(idCol)).distinct()
    docs.join(matching, Seq(idCol), "left_semi")
      .groupBy(col(facetCol))
      .agg(count(lit(1)).as("doc_count"))
  }

  /** Keyset pagination (OpenSearch `search_after`): the page after cursor
    * `(afterScore, afterId)` in (score desc, id asc) order — stateless
    * and O(page) per request, the deep-pagination shape that `from +
    * size` offsets can't give a 10¹²-doc index. Scores are compared on
    * the same round-4 values the ranking uses. */
  def searchAfter(scored: DataFrame, idCol: String, scoreCol: String,
      afterScore: Double, afterId: Long, k: Int): DataFrame =
    scored.filter(col(scoreCol) < afterScore ||
        (col(scoreCol) === afterScore && col(idCol) > afterId))
      .orderBy(desc(scoreCol), col(idCol))
      .limit(k)

  /** Boolean query (OpenSearch `bool`): `must` terms are all REQUIRED,
    * `mustNot` terms exclude a document outright, `should` terms only add
    * score. Scoring = BM25 summed over (must ∪ should) terms, standard
    * Lucene bool semantics with every clause a term query.
    *
    * Plan: the scorer's aggregates + two keyed semi/anti joins on docId —
    * the presence checks ride the same tokens relation Catalyst already
    * builds for scoring (ReuseExchange collapses the scans). */
  def boolTopK(docs: DataFrame, idCol: String, textCol: String,
      must: Seq[String], should: Seq[String], mustNot: Seq[String],
      k: Int, minShouldMatch: Int = 0): DataFrame = {
    val mustN = must.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val notN = mustNot.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val shouldN = should.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val scoreTerms = (mustN ++ shouldN).distinct.sorted
    require(scoreTerms.nonEmpty, "bool query needs must or should terms")
    require(mustN.intersect(notN).isEmpty, "a term cannot be must AND must_not")
    val toks = Analyzer.tokens(docs, idCol, textCol)
    var scored = BruteForce.scoreAll(docs, idCol, textCol, scoreTerms)
    if (mustN.nonEmpty) {
      val hasAll = toks.filter(col("term").isin(mustN: _*))
        .select(col(idCol), col("term")).distinct()
        .groupBy(col(idCol)).agg(count(lit(1)).as("nm"))
        .filter(col("nm") === mustN.size)
        .select(col(idCol).as("docId"))
      scored = scored.join(hasAll, Seq("docId"), "left_semi")
    }
    if (minShouldMatch > 0 && shouldN.nonEmpty) {
      // OpenSearch minimum_should_match: at least m distinct should
      // clauses must be present (must clauses do not count toward m)
      val hasM = toks.filter(col("term").isin(shouldN: _*))
        .select(col(idCol), col("term")).distinct()
        .groupBy(col(idCol)).agg(count(lit(1)).as("ns"))
        .filter(col("ns") >= minShouldMatch)
        .select(col(idCol).as("docId"))
      scored = scored.join(hasM, Seq("docId"), "left_semi")
    }
    if (notN.nonEmpty) {
      val excluded = toks.filter(col("term").isin(notN: _*))
        .select(col(idCol).as("docId")).distinct()
      scored = scored.join(excluded, Seq("docId"), "left_anti")
    }
    scored
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** The `more_like_this` query-term selection: the source document's top
    * `m` terms ranked by (tf desc, df asc, term asc) — most frequent in
    * the document, rarest in the corpus. Integer-only sort keys keep the
    * selection bit-stable across engines (a float tf·idf rank would tie-
    * break on last-ulp noise). Returns (term, tf, df). */
  def moreLikeThisTerms(docs: DataFrame, idCol: String, textCol: String,
      docId: Long, m: Int): DataFrame = {
    val toks = Analyzer.tokens(docs, idCol, textCol)
    val tf = toks.filter(col(idCol) === docId)
      .groupBy("term").agg(count(lit(1)).as("tf"))
    val df = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .orderBy(desc("tf"), col("df"), col("term"))
      .limit(m)
  }

  /** More-like-this top-k: BM25 over [[moreLikeThisTerms]], source doc
    * excluded. The m query terms are collected (query construction,
    * m ≤ a few dozen). */
  def moreLikeThisTopK(docs: DataFrame, idCol: String, textCol: String,
      docId: Long, m: Int, k: Int): DataFrame = {
    val terms = moreLikeThisTerms(docs, idCol, textCol, docId, m)
      .select("term").collect().map(_.getString(0)).toSeq.sorted
    BruteForce.scoreAll(docs, idCol, textCol, terms)
      .filter(col("docId") =!= docId)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Disjunction-max query (OpenSearch/Lucene `dis_max`): per-doc score =
    * best single term's BM25 plus `tieBreaker` × the remaining terms'
    * scores — `max + tie·(sum − max)`. `tie = 0` is pure best-field
    * semantics, `tie = 1` degenerates to the bool `should` sum. Fold
    * order: `sum` accumulates in ascending term order (the pivot
    * convention); `max` is order-free. */
  def disMaxTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], tieBreaker: Double, k: Int): DataFrame = {
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0, "tie_breaker in [0,1]")
    val norm = queryTerms.map(Analyzer.lowerLikeCatalyst)
    val (pivoted, terms) = BruteForce.scorePivot(docs, idCol, textCol, norm)
    val cols = terms.map(t => coalesce(col(s"`$t`"), lit(0.0)))
    val sum = cols.reduceLeft(_ + _)
    val mx = if (cols.size == 1) cols.head else greatest(cols: _*)
    pivoted
      .select(col("docId"),
        round(mx + lit(tieBreaker) * (sum - mx), 4).as("score"))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Per-term boosted query (OpenSearch `term^boost`): each term's BM25
    * contribution is multiplied by its boost before the ascending-term
    * fixed-order sum. Unlisted behavior matches OpenSearch: boosts scale
    * scores only — df/idf and the match set are unchanged. */
  def boostedTopK(docs: DataFrame, idCol: String, textCol: String,
      boosts: Seq[(String, Double)], k: Int): DataFrame = {
    require(boosts.nonEmpty, "boosted query needs terms")
    val byTerm = boosts.map { case (t, b) =>
      (Analyzer.lowerLikeCatalyst(t), b)
    }.toMap
    require(byTerm.size == boosts.size, "duplicate boost term")
    val (pivoted, terms) = BruteForce.scorePivot(
      docs, idCol, textCol, byTerm.keys.toSeq)
    val total = terms.map(t =>
      coalesce(col(s"`$t`"), lit(0.0)) * lit(byTerm(t))).reduceLeft(_ + _)
    pivoted
      .select(col("docId"), round(total, 4).as("score"))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Regexp query (OpenSearch `regexp`): dictionary terms fully matching
    * `pattern` — anchored both ends, Lucene's contract — expanded in
    * ascending term order capped at `maxExpansions`, then scored as a
    * `should` bool. The brute form derives its dictionary from the corpus
    * token stream; [[IndexSearch.regexpTopK]] reads termstats/ instead. */
  def regexpTopK(docs: DataFrame, idCol: String, textCol: String,
      pattern: String, k: Int, maxExpansions: Int = 50): DataFrame = {
    val dict = Analyzer.tokens(docs, idCol, textCol).select("term").distinct()
    val expanded = dict.filter(col("term").rlike(s"^(?:$pattern)$$"))
      .select("term").collect().map(_.getString(0)).sorted
      .take(maxExpansions).toSeq
    if (expanded.isEmpty)
      docs.select(col(idCol), lit(0.0).as("score")).limit(0)
    else BruteForce.scoreAll(docs, idCol, textCol, expanded)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Query-time synonym expansion (OpenSearch `synonym` filter applied at
    * query time): every query term expands to itself ∪ its synonym set;
    * the union scores as a `should` bool — each expanded term with its
    * OWN document frequency (`expand=true` semantics). */
  def synonymTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], synonyms: Map[String, Seq[String]],
      k: Int): DataFrame = {
    val expanded = queryTerms.flatMap { t0 =>
      val t = Analyzer.lowerLikeCatalyst(t0)
      t +: synonyms.getOrElse(t, Nil).map(Analyzer.lowerLikeCatalyst)
    }.distinct.sorted
    BruteForce.scoreAll(docs, idCol, textCol, expanded)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Stats aggregation beside a query (OpenSearch `stats` agg): count /
    * min / max / sum / avg of `valueCol` over the full MATCH SET (any
    * query term present). Integer aggregates are exact; `avg` is the one
    * division, rounded to 6. */
  def matchStats(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], valueCol: String): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val matching = Analyzer.tokens(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .select(col(idCol)).distinct()
    docs.join(matching, Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("doc_count"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"),
        sum(col(valueCol)).as("sum_v"),
        round(sum(col(valueCol)).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_v"))
  }

  /** Significant-terms aggregation (OpenSearch `significant_terms`, JLH
    * heuristic): terms overrepresented in the query's match set vs the
    * corpus. fg% = fg_df/|M| (docs in the match set containing the term),
    * bg% = df/N; JLH = (fg% − bg%) · (fg%/bg%). Query terms themselves are
    * excluded (they are the match set's definition, not a finding), terms
    * below `minDocCount` foreground docs are dropped, ranking is
    * (rounded score desc, term asc). All inputs are exact integers; the
    * two divisions and one multiply happen in the same order on both
    * engines. */
  def significantTerms(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], n: Int, minDocCount: Int = 3): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val termDocs = Analyzer.tokens(docs, idCol, textCol)
      .select(col(idCol), col("term")).distinct()
    val matching = termDocs.filter(col("term").isin(terms: _*))
      .select(col(idCol)).distinct()
    val spark = docs.sparkSession
    import spark.implicits._
    val nDocs = docs.count()
    val fgCount = matching.count()
    require(fgCount > 0, "query matched nothing")
    val fg = termDocs.join(matching, Seq(idCol), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("fg_df"))
    val bg = termDocs.groupBy("term").agg(count(lit(1)).as("df"))
    val fgPct = col("fg_df").cast("double") / lit(fgCount.toDouble)
    val bgPct = col("df").cast("double") / lit(nDocs.toDouble)
    fg.join(bg, "term")
      .filter(!col("term").isin(terms: _*) && col("fg_df") >= minDocCount)
      .select(col("term"), col("fg_df"), col("df"),
        round((fgPct - bgPct) * (fgPct / bgPct), 6).as("jlh"))
      .orderBy(desc("jlh"), col("term"))
      .limit(n)
  }

  /** Combine a primary and a secondary score per the OpenSearch `rescore`
    * `score_mode` contract. Primary enters ROUNDED (it is the ranking the
    * window was selected on); secondary enters raw and the combination
    * rounds once. */
  private[query] def rescoreCombine(primary: Column, secondary: Column,
      queryWeight: Double, rescoreWeight: Double, scoreMode: String)
      : Column = {
    val p = lit(queryWeight) * primary
    val s = lit(rescoreWeight) * coalesce(secondary, lit(0.0))
    val c = scoreMode match {
      case "total" => p + s
      case "multiply" => p * s
      case "max" => greatest(p, s)
      case "avg" => (p + s) / lit(2.0)
      case other => throw new IllegalArgumentException(
        s"unknown score_mode: $other")
    }
    round(c, 4)
  }

  /** Query rescoring (OpenSearch `rescore`): rank by the primary BM25
    * query, then re-rank ONLY the top `windowSize` docs with a secondary
    * phrase query — combined = query_weight × primary + rescore_weight ×
    * phrase (score_mode total; multiply/max/avg supported). Docs outside
    * the window keep their primary order BELOW every window doc (the
    * returned page is capped at the window, OpenSearch's contract when
    * k ≤ window — enforced here). The expensive phrase scorer touches
    * window-many docs, not the corpus: exactly why rescore exists. */
  def rescoreTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], phrase: Seq[String], slop: Int,
      windowSize: Int, k: Int, queryWeight: Double = 1.0,
      rescoreWeight: Double = 1.0, scoreMode: String = "total"): DataFrame = {
    require(k <= windowSize, "k must be <= windowSize (page is the window)")
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val window = BruteForce.scoreAll(docs, idCol, textCol, terms)
      .withColumn("score", round(col("score"), 4))
      .orderBy(desc("score"), col("docId"))
      .limit(windowSize)
    val ph = BruteForce.phraseSlopScoreAll(docs, idCol, textCol,
        phrase.map(Analyzer.lowerLikeCatalyst), slop)
      .select(col("docId"), col("score").as("_ph"))
    window.join(ph, Seq("docId"), "left_outer")
      .select(col("docId"),
        rescoreCombine(col("score"), col("_ph"), queryWeight,
          rescoreWeight, scoreMode).as("score"))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** function_score / field_value_factor (OpenSearch): final score =
    * BM25 × modifier(factor × field). Modifiers: none, log1p, ln1p, sqrt,
    * square, reciprocal — the well-defined subset (log1p = log10(1+x),
    * Lucene's table). The field is `valueCol` of the docs table itself
    * (the index-served form takes a docId-keyed dimension instead); null
    * field → factor term 0. */
  def fieldValueFactorTopK(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], valueCol: String,
      factor: Double, modifier: String, k: Int): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val scored = BruteForce.scoreAll(docs, idCol, textCol, terms)
    val m = docs.select(col(idCol).as("docId"),
      col(valueCol).cast("double").as("_fv"))
    scored.join(m, Seq("docId"), "left_outer")
      .select(col("docId"),
        round(col("score") * fvfModifier(
          lit(factor) * coalesce(col("_fv"), lit(0.0)), modifier), 4)
          .as("score"))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
      .withColumnRenamed("docId", idCol)
  }

  /** Percentiles aggregation beside a query (OpenSearch `percentiles`,
    * exact): continuous (linearly interpolated) quantiles of `valueCol`
    * over the any-term match set — one row per requested percentile,
    * (pct, value) with value rounded to 6. Spark's `percentile` and
    * DuckDB's `quantile_cont` share the rank = p·(n−1) interpolation, so
    * the oracle replays bit-stably on integer inputs. */
  def matchPercentiles(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], valueCol: String, ps: Seq[Double])
      : DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "percentiles in [0,1]")
    val m = matchSet(docs, idCol, textCol, queryTerms)
    val arr = ps.mkString(", ")
    m.agg(expr(s"percentile($valueCol, array($arr))").as("q"))
      .select(posexplode(col("q")).as(Seq("pos", "value")))
      .select(element_at(array(ps.map(lit): _*), col("pos") + 1).as("pct"),
        round(col("value"), 6).as("value"))
      .orderBy("pct")
  }

  /** Fixed-interval numeric histogram beside a query (OpenSearch
    * `histogram` agg): bucket = floor(v / interval) · interval over the
    * match set, empty buckets omitted (`min_doc_count: 1` semantics). */
  def matchHistogram(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], valueCol: String, interval: Double)
      : DataFrame = {
    require(interval > 0, "interval must be > 0")
    matchSet(docs, idCol, textCol, queryTerms)
      .groupBy((floor(col(valueCol).cast("double") / interval) *
        interval).as("bucket"))
      .agg(count(lit(1)).as("doc_count"))
  }

  /** Cardinality aggregation beside a query (OpenSearch `cardinality`):
    * KMV bottom-k estimate of distinct `valueCol` over the match set
    * ([[graft.ops.Sketches]] — deterministic, engine-portable, exact below
    * k), with the exact distinct count alongside so the gate pins the
    * estimator against it. */
  def matchCardinality(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], valueCol: String, k: Int = 64): DataFrame = {
    val m = matchSet(docs, idCol, textCol, queryTerms)
    val sk = graft.ops.Sketches.kmvEstimate(
      graft.ops.Sketches.kmvSketch(m, Nil, valueCol, k), k)
    sk.crossJoin(m.agg(countDistinct(col(valueCol)).as("exact_distinct")))
      .select(col("sketch_size"), col("est_distinct"), col("exact_distinct"))
  }

  /** Composite aggregation beside a query (OpenSearch `composite`): the
    * bucket-EXPORT aggregation — multi-source bucket keys
    * (`sources` = named grouping expressions, e.g. a terms source plus a
    * histogram source), buckets ordered by the composite key ascending,
    * paginated with an `after` key (strict lexicographic greater-than —
    * the stateless cursor that walks an unbounded bucket space in
    * size-bounded pages, where a terms agg's top-N would truncate).
    * Output: one row per bucket `(source..., doc_count)`. The after
    * cursor compares as a struct, so pages are disjoint and exhaustive
    * under any partitioning. */
  def compositeAgg(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], sources: Seq[(String, Column)], size: Int,
      after: Option[Seq[Column]] = None): DataFrame = {
    require(sources.nonEmpty, "composite needs at least one source")
    compositePage(
      matchSet(docs, idCol, textCol, queryTerms), sources, size, after)
  }

  /** Shared composite pagination (brute + served): grouped bucket counts,
    * key-ordered, after-filtered, one page. Docs where any source
    * evaluates to null are EXCLUDED — OpenSearch's `missing_bucket:
    * false` default (null buckets would also order differently in Spark
    * vs the row-value-comparison oracle; excluding them keeps the cursor
    * contract engine-independent). */
  private[query] def compositePage(matchRows: DataFrame,
      sources: Seq[(String, Column)], size: Int,
      after: Option[Seq[Column]]): DataFrame = {
    val keyed = matchRows
      .filter(sources.map { case (_, c) => c.isNotNull }.reduce(_ && _))
      .groupBy(sources.map { case (n, c) => c.as(n) }: _*)
      .agg(count(lit(1)).as("doc_count"))
    val key = struct(sources.map { case (n, _) => col(n) }: _*)
    val paged = after match {
      case Some(vals) =>
        require(vals.length == sources.length,
          "after key must have one value per source")
        keyed.filter(key > struct(vals: _*))
      case None => keyed
    }
    paged.orderBy(sources.map { case (n, _) => col(n).asc }: _*).limit(size)
  }

  /** top_hits inside a terms aggregation (OpenSearch `terms` +
    * `top_hits`): bucket the match set by `facetCol`, keep the
    * `nBuckets` biggest buckets (doc_count desc, facet asc — the terms
    * agg's order), and inside each bucket the top `perBucket` docs by
    * (rounded score desc, docId asc). Output (facet, doc_count, rnk,
    * docId, score) — one row per returned hit. */
  def topHits(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], facetCol: String, nBuckets: Int,
      perBucket: Int): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val scored = BruteForce.scoreAll(docs, idCol, textCol, terms)
      .withColumn("score", round(col("score"), 4))
      .join(docs.select(col(idCol).as("docId"), col(facetCol).as("facet")),
        "docId")
    topHitsShape(scored, nBuckets, perBucket)
      .withColumnRenamed("docId", idCol)
  }

  /** Shared bucket/rank shape behind the brute and index-served top_hits
    * forms: input (docId, score, facet) for the whole match set. */
  private[query] def topHitsShape(scored: DataFrame, nBuckets: Int,
      perBucket: Int): DataFrame = {
    val counts = scored.groupBy("facet")
      .agg(count(lit(1)).as("doc_count"))
      .orderBy(desc("doc_count"), col("facet"))
      .limit(nBuckets)
    val w = Window.partitionBy(col("facet"))
      .orderBy(desc("score"), col("docId"))
    scored.join(counts, "facet")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= perBucket)
      .select(col("facet"), col("doc_count"), col("rnk"),
        col("docId"), col("score"))
      .orderBy(desc("doc_count"), col("facet"), col("rnk"))
  }

  /** filters aggregation (OpenSearch `filters`): one named bucket per
    * entry, doc_count = docs matching ANY of the bucket's terms; empty
    * buckets kept at 0 (OpenSearch's contract). Output (name, doc_count)
    * ordered by name. */
  def filtersAgg(docs: DataFrame, idCol: String, textCol: String,
      filters: Seq[(String, Seq[String])]): DataFrame =
    filtersShape(docs.sparkSession,
      membershipsOf(docs, idCol, textCol, filters), filters.map(_._1))

  /** adjacency_matrix aggregation (OpenSearch): per-filter doc counts
    * plus every pairwise intersection as `a&b` (filter declaration
    * order), buckets with zero docs omitted — the co-occurrence matrix
    * over match sets. Output (key, doc_count) ordered by key. */
  def adjacencyMatrix(docs: DataFrame, idCol: String, textCol: String,
      filters: Seq[(String, Seq[String])]): DataFrame =
    adjacencyShape(membershipsOf(docs, idCol, textCol, filters),
      filters.map(_._1))

  /** (docId, name) memberships — one row per (matching doc, filter). */
  private def membershipsOf(docs: DataFrame, idCol: String,
      textCol: String, filters: Seq[(String, Seq[String])]): DataFrame = {
    require(filters.nonEmpty, "filters agg needs >= 1 named filter")
    require(filters.map(_._1).distinct.size == filters.size,
      "duplicate filter name")
    val spark = docs.sparkSession
    import spark.implicits._
    val mapping = filters.flatMap { case (n, ts) =>
      ts.map(Analyzer.lowerLikeCatalyst).distinct.map(t => (t, n))
    }.toDF("term", "name")
    Analyzer.tokens(docs, idCol, textCol)
      .join(broadcast(mapping), "term")
      .select(col(idCol).as("docId"), col("name")).distinct()
  }

  /** Shared count shape behind the brute/index filters agg. */
  private[query] def filtersShape(spark: org.apache.spark.sql.SparkSession,
      memberships: DataFrame, names: Seq[String]): DataFrame = {
    import spark.implicits._
    val counts = memberships.groupBy("name")
      .agg(count(lit(1)).as("doc_count"))
    names.toDF("name").join(counts, Seq("name"), "left_outer")
      .select(col("name"), coalesce(col("doc_count"), lit(0L)).as("doc_count"))
      .orderBy("name")
  }

  /** Shared matrix shape behind the brute/index adjacency_matrix. */
  private[query] def adjacencyShape(memberships: DataFrame,
      names: Seq[String]): DataFrame = {
    val order = names.zipWithIndex.toMap
    val ordIdx = typedLit(order)
    val singles = memberships.groupBy(col("name").as("key"))
      .agg(count(lit(1)).as("doc_count"))
    val a = memberships.select(col("docId"), col("name").as("n1"))
    val b = memberships.select(col("docId"), col("name").as("n2"))
    val pairs = a.join(b, "docId")
      .filter(element_at(ordIdx, col("n1")) < element_at(ordIdx, col("n2")))
      .groupBy(concat(col("n1"), lit("&"), col("n2")).as("key"))
      .agg(count(lit(1)).as("doc_count"))
    singles.unionByName(pairs)
      .filter(col("doc_count") > 0)
      .orderBy("key")
  }

  /** Cumulative sum over a (bucket, doc_count) histogram (OpenSearch
    * `cumulative_sum` pipeline agg). */
  def cumulativeSum(hist: DataFrame, bucketCol: String,
      valueCol: String): DataFrame =
    hist.withColumn("cumulative",
      sum(col(valueCol)).over(
        Window.orderBy(col(bucketCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(bucketCol)

  /** First derivative over a histogram (OpenSearch `derivative` pipeline
    * agg): value − previous bucket's value, null for the first bucket.
    * Gaps are NOT filled — buckets are as the histogram produced them. */
  def derivative(hist: DataFrame, bucketCol: String,
      valueCol: String): DataFrame =
    hist.withColumn("derivative",
      col(valueCol) - lag(col(valueCol), 1).over(
        Window.orderBy(col(bucketCol))))
      .orderBy(bucketCol)

  /** Trailing moving average over a histogram (OpenSearch `moving_fn`
    * with `MovingFunctions.unweightedAvg`): mean of the last `window`
    * buckets INCLUDING the current one, rounded to 6. */
  def movingAvg(hist: DataFrame, bucketCol: String, valueCol: String,
      window: Int): DataFrame = {
    require(window >= 1, "window >= 1")
    hist.withColumn("moving_avg",
      round(avg(col(valueCol)).over(
        Window.orderBy(col(bucketCol))
          .rowsBetween(-(window - 1), Window.currentRow)), 6))
      .orderBy(bucketCol)
  }

  /** Docs matching ANY query term — the agg family's shared semi-join. */
  private def matchSet(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    val terms = queryTerms.map(Analyzer.lowerLikeCatalyst).distinct.sorted
    val matching = Analyzer.tokens(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .select(col(idCol)).distinct()
    docs.join(matching, Seq(idCol), "left_semi")
  }

  /** OpenSearch `multi_match` across fields, brute form: each field is a
    * (textCol, boost) pair scored independently with ITS OWN BM25
    * statistics (per-field df/dl/avgdl — Lucene semantics: every field is
    * its own inverted index), then combined per document:
    * `most_fields` sums the boosted field scores, `best_fields` takes the
    * best field plus `tieBreaker` × the rest. Scores round to 4 after
    * combination, ordering (score desc, docId) — the engine's rank
    * convention. [[graft.query.IndexSearch.multiMatchTopK]] is the served
    * twin (per-field indexes, postings-decoded scores), pinned
    * rank-identical in IndexSearchSpec. */
  def multiMatchTopK(docs: DataFrame, idCol: String,
      fields: Seq[(String, Double)], queryTerms: Seq[String], k: Int,
      matchType: String = "best_fields", tieBreaker: Double = 0.0): DataFrame = {
    require(fields.nonEmpty, "multi_match needs at least one field")
    val per = fields.map { case (textCol, boost) =>
      BruteForce.scoreAll(docs, idCol, textCol, queryTerms)
        .filter(col("score") > 0.0)
        .select(col("docId"), (col("score") * boost).as("s"))
    }
    combineFields(per, k, matchType, tieBreaker)
  }

  /** Shared multi_match combination (brute + served): per-field
    * (docId, s) frames → combined rounded top-k. */
  private[query] def combineFields(perField: Seq[DataFrame], k: Int,
      matchType: String, tieBreaker: Double): DataFrame = {
    val u = perField.reduce(_ unionByName _)
    val c = u.groupBy("docId").agg(max(col("s")).as("mx"), sum(col("s")).as("sm"))
    val combined = matchType match {
      case "most_fields" => col("sm")
      case "best_fields" => col("mx") + lit(tieBreaker) * (col("sm") - col("mx"))
      case other => throw new IllegalArgumentException(
        s"unknown multi_match type: $other (best_fields | most_fields)")
    }
    c.select(col("docId"), round(combined, 4).as("score"))
      .orderBy(desc("score"), col("docId"))
      .limit(k)
  }

  /** The field_value_factor modifier table (shared brute/index). */
  private[query] def fvfModifier(x: Column, modifier: String): Column =
    modifier match {
      case "none" => x
      case "log1p" => log(10.0, lit(1.0) + x)
      case "ln1p" => log(lit(1.0) + x)
      case "sqrt" => sqrt(x)
      case "square" => x * x
      case "reciprocal" => lit(1.0) / x
      case other => throw new IllegalArgumentException(
        s"unknown field_value_factor modifier: $other")
    }
}
