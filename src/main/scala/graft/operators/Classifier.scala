package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document quality scoring: a multinomial Naive-Bayes
  * token classifier, trained and applied inside the engine.
  *
  * This is the engine-native analogue of the fasttext/CCNet-style
  * "quality classifier" step every large-scale LLM curation pipeline
  * runs after rule-based gates (the reference stops at rule gates —
  * quality_score is a stored float filled by its validation flow,
  * /root/reference/src/models/schemas.py:64-69,
  * great_expectations/expectations/corc_nah_corpus_suite.json:26-273;
  * the classifier generalizes that to a *learned* score). Training is
  * bootstrap-style, exactly as in practice: a cheap deterministic
  * heuristic (a rule gate, a trusted-source flag) labels the corpus,
  * the classifier smooths those labels into a per-document log-odds
  * score, and curation thresholds the score instead of the brittle
  * rule.
  *
  * Everything is counting, so the whole flow is aggregation-shaped —
  * no model object, no driver-side fit, no UDF:
  *
  *   - train: one explode → one `groupBy(token)` shuffle with map-side
  *     partial aggregation → a vocabulary-sized `(token, llr)`
  *     dictionary. Corpus-scale data crosses exactly one exchange.
  *   - totals (class token counts, vocabulary size, class priors):
  *     single-row aggregates attached by broadcast cross join — the
  *     same broadcast-totals shape the stats operators use.
  *   - score: the token stream joins the dictionary on `token`
  *     (vocabulary-sized build side — Spark/AQE broadcasts it when it
  *     fits, which at sane vocabularies it does) and sums per doc_id:
  *     one more exchange, proportional to token hits.
  *
  * At 100 TB: two corpus scans (one to count, one to score — inherent
  * to self-training; callers holding a persisted token stream can pass
  * it to both halves), two corpus-scale exchanges total, and a
  * dictionary whose size is the vocabulary, not the corpus. Laplace
  * (+1) smoothing keeps unseen/rare tokens finite, so the dictionary
  * can also be truncated to the top-N tokens by |llr| before scoring
  * without changing the plan shape.
  */
object Classifier {

  /** Lowercased whitespace word tokens, empties dropped — ONE
    * definition shared with [[Retrieval.wordTokens]] (the oracle SQL
    * mirrors it; two copies could drift and silently break q125/q126
    * parity). */
  def wordTokens(c: Column): Column = Retrieval.wordTokens(c)

  /** Multinomial NB token dictionary from boolean-labeled documents:
    * `(token, llr)` where
    * `llr = ln((c_pos+1)/(N_pos+V)) − ln((c_neg+1)/(N_neg+V))`
    * (Laplace-smoothed class-conditional log-likelihood ratio;
    * `N_±` = total token occurrences per class, `V` = vocabulary
    * size). Both label classes must be non-empty — an absent class
    * degenerates the prior, not this dictionary (smoothing keeps
    * every llr finite), so the guard lives in [[nbQualityScore]].
    */
  def nbTrain(docs: DataFrame, textCol: Column, labelCol: Column): DataFrame =
    dictFromCounts(tokenClassCounts(docs, textCol, labelCol))

  /** The countable half of [[nbTrain]]: per-token class-conditional
    * occurrence counts `(token, cpos, cneg)` — one explode, one
    * token-keyed shuffle with map-side partial aggregation. Counts
    * are the MERGEABLE representation of the classifier (sums of
    * longs), which is what the incremental state family persists
    * ([[Incremental.writeNbCounts]]); the dictionary itself (log
    * ratios) is not mergeable. */
  def tokenClassCounts(docs: DataFrame, textCol: Column,
      labelCol: Column): DataFrame =
    docs
      .select(labelCol.as("__pos"), explode(wordTokens(textCol)).as("token"))
      .groupBy("token")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("cneg"))

  /** The arithmetic half of [[nbTrain]]: `(token, cpos, cneg)` counts
    * → the Laplace-smoothed `(token, llr)` dictionary. Totals are a
    * single-row aggregate attached by broadcast — vocabulary-sized
    * work after the counts exist. */
  def dictFromCounts(counts: DataFrame): DataFrame = {
    val totals = counts.agg(
      sum("cpos").as("__np"), sum("cneg").as("__nn"),
      count(lit(1)).as("__v"))
    counts.crossJoin(broadcast(totals))
      .select(col("token"),
        (log((col("cpos") + lit(1.0)) / (col("__np") + col("__v"))) -
          log((col("cneg") + lit(1.0)) / (col("__nn") + col("__v")))).as("llr"))
  }

  /** Per-doc sum of matched-token llr: `(idCol, __s)` for docs with
    * at least one dictionary hit. The dictionary is the join's build
    * side candidate (vocabulary-sized); AQE picks the physical build
    * side from runtime sizes, which at corpus scale broadcasts the
    * dictionary. */
  private def hitSums(
      docs: DataFrame, idCol: String, textCol: Column,
      dict: DataFrame): DataFrame =
    docs.select(col(idCol), explode(wordTokens(textCol)).as("token"))
      .join(dict, "token")
      .groupBy(idCol)
      .agg(sum("llr").as("__s"))

  /** Score documents against a `(token, llr)` dictionary: per-doc sum
    * of matched-token llr plus `logPrior` (a foldable/literal column,
    * e.g. `lit(math.log(pPos / pNeg))`), as
    * `(idCol, nb_llr double round-4, hq boolean = score > 0)`.
    * Documents with no dictionary hits (or no tokens at all) score
    * exactly the prior. Tokens absent from the dictionary contribute
    * nothing (an inner join drops them — the conventional
    * ignore-unseen NB variant, which keeps scoring a pure hit-stream
    * computation).
    */
  def nbScore(
      docs: DataFrame, idCol: String, textCol: Column,
      dict: DataFrame, logPrior: Column): DataFrame =
    docs.select(col(idCol))
      .join(hitSums(docs, idCol, textCol, dict), Seq(idCol), "left")
      .select(col(idCol),
        round(coalesce(col("__s"), lit(0.0)) + logPrior, 4).as("nb_llr"),
        ((coalesce(col("__s"), lit(0.0)) + logPrior) > 0).as("hq"))

  /** Self-trained quality score: heuristic boolean labels → NB
    * dictionary → score the same corpus, prior = ln(pos docs / neg
    * docs). One call, end to end; `(idCol, nb_llr, hq)` per document.
    *
    * Contract: `labelCol` must produce BOTH classes — a one-class
    * corpus has no likelihood ratio to learn (the prior divides by
    * the absent class's count). Plan shape: the training tokenization
    * is shuffled once and the totals read it back through a
    * ReusedExchange; the doc-level prior is a one-row aggregate cross-
    * joined onto the FINAL id-level result (never into the token
    * lineage); scoring re-tokenizes in a second scan — inherent to
    * self-training. Two heavy (text) scans, two cheap (id/label-only,
    * footer-pruned) scans, total.
    */
  def nbQualityScore(
      docs: DataFrame, idCol: String, textCol: Column,
      labelCol: Column): DataFrame = {
    val dict = nbTrain(docs, textCol, labelCol)
    val prior = docs.agg(
      log(sum(when(labelCol, 1L).otherwise(0L)) /
        sum(when(!labelCol, 1L).otherwise(0L))).as("__p"))
    docs.select(col(idCol))
      .join(hitSums(docs, idCol, textCol, dict), Seq(idCol), "left")
      .crossJoin(broadcast(prior))
      .select(col(idCol),
        round(coalesce(col("__s"), lit(0.0)) + col("__p"), 4).as("nb_llr"),
        ((coalesce(col("__s"), lit(0.0)) + col("__p")) > 0).as("hq"))
  }

  /** Per-stratum NB dictionaries in ONE pass — the CCNet stance of a
    * separate quality model per language/domain, without training a
    * model per partition: `(strataCol, token, llr)`, each stratum
    * smoothed over its OWN class totals and vocabulary. Plan shape is
    * [[nbTrain]]'s with the stratum riding the keys: one explode →
    * one `groupBy(stratum, token)` shuffle (map-side combined) →
    * stratum-level totals (vocabulary-scale input) attached back by a
    * BROADCAST join on the stratum key (|strata| rows). A stratum
    * with only one label class still gets finite llrs (smoothing) —
    * its PRIOR is the degenerate part, handled by the scorer. */
  def nbTrainStratified(
      docs: DataFrame, strataCol: Column, textCol: Column,
      labelCol: Column): DataFrame = {
    val counts = docs
      .select(strataCol.as("__st"), labelCol.as("__pos"),
        explode(wordTokens(textCol)).as("token"))
      .groupBy("__st", "token")
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__cpos"),
        sum(when(!col("__pos"), 1L).otherwise(0L)).as("__cneg"))
    // null-safe totals attach: a NULL stratum is a stratum like any
    // other (groupBy already keyed it); a plain equality join would
    // silently drop its whole dictionary
    val totals = counts.groupBy(col("__st").as("__stt")).agg(
      sum("__cpos").as("__np"), sum("__cneg").as("__nn"),
      count(lit(1)).as("__v"))
    counts.join(broadcast(totals), col("__st") <=> col("__stt"))
      .select(col("__st"), col("token"),
        (log((col("__cpos") + lit(1.0)) / (col("__np") + col("__v"))) -
          log((col("__cneg") + lit(1.0)) / (col("__nn") + col("__v")))).as("llr"))
  }

  /** Self-trained per-stratum quality score: [[nbQualityScore]] with
    * a separate dictionary AND prior per stratum, one call. Output
    * `(idCol, stratum, nb_llr round-4, hq)` — exactly one row per
    * input doc, like [[nbQualityScore]]. A one-class stratum has no
    * odds ratio — its docs score NULL `nb_llr`/`hq` (honest "no model
    * for this stratum"; ANSI-safe via the lazily-evaluated branch
    * guard). The hit join is keyed `(stratum, token)` so identical
    * spellings in different strata never cross-score. A NULL stratum
    * is a stratum like any other: the joins are null-safe (`<=>`), so
    * its docs score against the NULL-keyed model instead of silently
    * vanishing from the output. */
  def nbQualityScoreStratified(
      docs: DataFrame, idCol: String, strataCol: Column, textCol: Column,
      labelCol: Column): DataFrame = {
    val dict = nbTrainStratified(docs, strataCol, textCol, labelCol)
    val priors = stratPriors(docs, strataCol, labelCol)
    val toks = docs.select(col(idCol), strataCol.as("__st"),
      explode(wordTokens(textCol)).as("token"))
    val hits = toks
      .join(dict, toks("__st") <=> dict("__st") && toks("token") === dict("token"))
      .groupBy(toks(idCol))
      .agg(sum("llr").as("__s"))
    val base = docs.select(col(idCol), strataCol.as("stratum"))
      .join(hits, Seq(idCol), "left")
    base.join(broadcast(priors), base("stratum") <=> priors("__st"), "left")
      .select(base(idCol), base("stratum"),
        round(coalesce(col("__s"), lit(0.0)) + col("__p"), 4).as("nb_llr"),
        ((coalesce(col("__s"), lit(0.0)) + col("__p")) > 0).as("hq"))
  }

  /** Per-stratum priors frame `(__st, __p)` — [[collectPrior]]'s
    * grouped sibling. One-class strata carry a NULL `__p` (the ANSI-
    * safe lazily-evaluated guard): "no model for this stratum".
    * Strata-count rows — broadcast it wherever it joins. */
  def stratPriors(docs: DataFrame, strataCol: Column,
      labelCol: Column): DataFrame = {
    val pos = sum(when(labelCol, 1L).otherwise(0L))
    val neg = sum(when(!labelCol, 1L).otherwise(0L))
    docs.groupBy(strataCol.as("__st")).agg(
      when(pos > 0 && neg > 0, log(pos.cast("double") / neg)).as("__p"))
  }

  /** Raw stratified map-side hit sum (no prior): the
    * [[graft.functions.SumWeightsByHash]] lookup keyed by
    * `xxhash64(stratum, token)` against a [[collectDictStratified]]
    * dictionary — zero exchanges, streaming-legal. Missing strata and
    * unseen tokens contribute 0; the PRIOR carries the per-stratum
    * part (join the [[stratPriors]] frame and add `__p`). */
  def stratHitSum(strataCol: Column, textCol: Column,
      keys: Array[Long], weights: Array[Double]): Column = {
    import graft.functions.text.{col2expr, expr2col}
    val digests = transform(wordTokens(textCol), t => xxhash64(strataCol, t))
    coalesce(expr2col(graft.functions.SumWeightsByHash(
      col2expr(digests), keys, weights)), lit(0.0))
  }

  /** Doc-count log-prior `ln(pos docs / neg docs)` as a driver-side
    * double — the scalar companion to the one-row aggregate
    * [[nbQualityScore]] attaches lazily; use with the map-side
    * scoring path, which needs the prior as a literal. One bounded
    * driver action (a single-row agg). */
  def collectPrior(docs: DataFrame, labelCol: Column): Double = {
    // A one-class (or empty) corpus has no odds ratio — ANSI mode
    // would throw DIVIDE_BY_ZERO, so guard the division (CaseWhen
    // evaluates the matched branch only) and surface the degenerate
    // case as NaN so callers gate on isFinite.
    val pos = sum(when(labelCol, 1L).otherwise(0L))
    val neg = sum(when(!labelCol, 1L).otherwise(0L))
    val row = docs.agg(
      when(pos > 0 && neg > 0, log(pos.cast("double") / neg))
        .otherwise(lit(Double.NaN)).as("p"))
      .head()
    if (row.isNullAt(0)) Double.NaN else row.getDouble(0)
  }

  /** Compact driver-side form of a `(token, llr)` dictionary: parallel
    * `(sorted xxhash64 digests, weights)` arrays for the map-side
    * scoring kernel ([[graft.functions.SumWeightsByHash]]). 16 bytes
    * per token — a 1M-token vocabulary is a 16 MB broadcast, the same
    * envelope as the eval-digest decontamination gates. `maxTokens >
    * 0` keeps only the strongest tokens by |llr| (ties broken by
    * token for determinism) — the standard fasttext-style truncation
    * when the raw vocabulary is unbounded. One bounded driver action
    * (the dictionary is vocabulary-sized by construction).
    *
    * Digests come from Spark's own `xxhash64(token)` so batch, stream
    * and dictionary agree byte-for-byte. A 64-bit collision between
    * two vocabulary tokens would silently merge their weights, so
    * collisions fail fast instead (P ≈ v²/2⁶⁵ — never in practice).
    */
  def collectDict(dict: DataFrame, maxTokens: Int = 0): (Array[Long], Array[Double]) = {
    val cut =
      if (maxTokens > 0)
        dict.orderBy(abs(col("llr")).desc, col("token")).limit(maxTokens)
      else dict
    packDigests(cut, xxhash64(col("token")))
  }

  /** [[collectDict]] for a [[nbTrainStratified]] dictionary: ONE flat
    * `(sorted digest, weight)` pair serves every stratum — digests
    * are `xxhash64(stratum, token)`, so a spelling shared across
    * strata hashes to distinct entries and the scoring column
    * ([[stratHitSum]]) can never cross-score. `maxTokens` truncates
    * PER STRATUM (rank by |llr| within each stratum) — a global top-N
    * would let one verbose language's vocabulary evict another's
    * entire model, silently un-scoring its documents. */
  def collectDictStratified(
      dict: DataFrame, maxTokens: Int = 0): (Array[Long], Array[Double]) = {
    val cut =
      if (maxTokens > 0) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("__st").orderBy(abs(col("llr")).desc, col("token"))
        dict.withColumn("__rk", row_number().over(w))
          .filter(col("__rk") <= maxTokens).drop("__rk")
      } else dict
    packDigests(cut, xxhash64(col("__st"), col("token")))
  }

  private def packDigests(dict: DataFrame,
      digest: Column): (Array[Long], Array[Double]) = {
    val rows = dict.select(digest.as("h"), col("llr"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    rows.iterator.zip(rows.iterator.drop(1)).foreach { case ((a, _), (b, _)) =>
      require(a != b, s"xxhash64 collision in NB dictionary on digest $a")
    }
    (rows.map(_._1), rows.map(_._2))
  }

  /** Map-side NB score of a text column against a collected
    * dictionary: per-row token digests → sorted-array weight lookup →
    * sum + prior, all inside one codegen'd projection. No explode, no
    * join, no shuffle — the at-scale and streaming scoring path
    * (train once with [[nbTrain]]+[[collectDict]], score any corpus
    * or stream for the cost of a scan). Null text scores exactly the
    * prior, matching [[nbScore]]'s left-join semantics. */
  def nbScoreColumn(
      textCol: Column, keys: Array[Long], weights: Array[Double],
      logPrior: Double): Column = {
    import graft.functions.text.{col2expr, expr2col}
    val digests = transform(wordTokens(textCol), t => xxhash64(t))
    coalesce(expr2col(graft.functions.SumWeightsByHash(
      col2expr(digests), keys, weights)), lit(0.0)) + lit(logPrior)
  }

  /** [[nbScore]] through the map-side kernel: same output contract
    * `(idCol, nb_llr round-4, hq)`, zero exchanges. Scores agree with
    * the join-based path to double-sum reassociation (identical after
    * the round-4 surface). */
  def nbScoreMapSide(
      docs: DataFrame, idCol: String, textCol: Column,
      keys: Array[Long], weights: Array[Double], logPrior: Double): DataFrame = {
    val s = nbScoreColumn(textCol, keys, weights, logPrior)
    docs.select(col(idCol), round(s, 4).as("nb_llr"), (s > 0).as("hq"))
  }
}
