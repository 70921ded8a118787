package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text retrieval over a document corpus: BM25-scored top-k search.
  *
  * Generalizes the reference's corpus "find relevant rows" analytics
  * (top-k frequency reports, benchmark/generate_stats.py value_counts
  * and the alignment kNN search, /root/reference/pipeline/alignment/
  * aligner.py:15-52) to the standard lexical ranking function a
  * training-data pipeline needs for corpus triage: given query terms,
  * rank documents by Okapi BM25 (Lucene's variant:
  * idf = ln(1 + (N − df + ½)/(df + ½))).
  *
  * Scale shape (the part that matters at 100 TB):
  *   - the exploded token stream is filtered to the query's terms
  *     BEFORE any shuffle — the per-(doc,term) aggregation sees only
  *     matching tokens, so its exchange is proportional to hit count,
  *     not corpus size;
  *   - doc length rides the token stream and is folded as a `min`
  *     aggregate buffer (constant within a group), so no separate
  *     doc-length table is joined on the hot path;
  *   - per-term document frequencies are a broadcast back-join (the
  *     df table has ≤ |query| rows);
  *   - corpus-level N/avgdl is one narrow partial-agg scan broadcast
  *     as a single row;
  *   - final ranking is `orderBy(...).limit(k)` — Spark plans a
  *     TakeOrderedAndProject (per-partition heap + driver merge of k
  *     rows), never a total sort.
  */
object Retrieval {

  /** Lowercased whitespace word tokens, empties dropped. */
  def wordTokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Top-k documents by BM25 score against `queryTerms`.
    *
    * Output: `(idCol, bm25_score)` — score rounded to 4 decimals,
    * ordered by (score desc, id asc) for a deterministic cut.
    * Documents containing none of the query terms never leave the
    * scan. Terms absent from the corpus contribute nothing (df = 0
    * rows simply don't exist — same behavior as Lucene).
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: Column,
      queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {

    // corpus stats: one narrow agg scan → single broadcast row.
    // coalesce(·,0) so null-text docs count as length-0 documents.
    val stats = docs.agg(
      count(lit(1)).as("__n"),
      avg(coalesce(size(wordTokens(textCol)), lit(0))).as("__avgdl"))

    // (id, dl, term) token stream, pre-filtered to the query terms:
    // everything after this line is proportional to hits, not corpus.
    val toks = docs
      .select(col(idCol), wordTokens(textCol).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms.map(t => t: Any): _*))

    val tf = toks
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__tf"), min(col("__dl")).as("__dl"))

    // document frequency per term: ≤ |queryTerms| rows → broadcast.
    val df = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))

    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfNorm = col("__tf") * (lit(k1) + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))

    tf.join(broadcast(df), "__term")
      .crossJoin(broadcast(stats))
      .groupBy(col(idCol))
      .agg(round(sum(idf * tfNorm), 4).as("bm25_score"))
      .orderBy(desc("bm25_score"), col(idCol))
      .limit(k)
  }
}
