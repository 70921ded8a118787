package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // two "high-quality" docs sharing the token `good`, two "low" docs
  // sharing `spam`; `both` appears once in each class.
  private val corpus = Seq(
    (1L, "good good both", true),
    (2L, "good wiki", true),
    (3L, "spam spam both", false),
    (4L, "spam junk", false)).toDF("doc_id", "text", "pos")

  test("nbTrain matches hand-computed Laplace-smoothed LLRs") {
    val dict = Classifier.nbTrain(corpus, col("text"), col("pos"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // N_pos = 5 tokens, N_neg = 5, V = 5 distinct tokens
    def llr(cp: Long, cn: Long): Double =
      math.log((cp + 1.0) / 10.0) - math.log((cn + 1.0) / 10.0)
    assert(dict.keySet == Set("good", "both", "wiki", "spam", "junk"))
    assert(math.abs(dict("good") - llr(3, 0)) < 1e-12)
    assert(math.abs(dict("spam") - llr(0, 3)) < 1e-12)
    assert(math.abs(dict("both") - llr(1, 1)) < 1e-12) // exactly 0
    assert(dict("both") == 0.0)
    assert(math.abs(dict("wiki") - llr(1, 0)) < 1e-12)
  }

  test("nbQualityScore separates the classes and scores every doc") {
    val scored = Classifier.nbQualityScore(corpus, "doc_id",
        col("text"), col("pos"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(scored.keySet == Set(1L, 2L, 3L, 4L))
    // balanced classes: prior = ln(2/2) = 0; good-docs positive,
    // spam-docs negative, symmetric corpus → symmetric scores
    assert(scored(1L)._1 > 0 && scored(1L)._2)
    assert(scored(2L)._1 > 0 && scored(2L)._2)
    assert(scored(3L)._1 < 0 && !scored(3L)._2)
    assert(scored(4L)._1 < 0 && !scored(4L)._2)
    assert(scored(1L)._1 == -scored(3L)._1)
    assert(scored(2L)._1 == -scored(4L)._1)
  }

  test("nbScore: no-hit and token-less docs score exactly the prior") {
    val dict = Classifier.nbTrain(corpus, col("text"), col("pos"))
    val strays = Seq((9L, "unseen tokens only"), (10L, "   "))
      .toDF("doc_id", "text")
    val out = Classifier.nbScore(strays, "doc_id", col("text"),
        dict, lit(0.7))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(9L -> 0.7, 10L -> 0.7))
  }

  test("map-side scoring reproduces the join-based path on a real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = col("n_chars") >= 300
    val joined = Classifier.nbQualityScore(docs, "doc_id", col("text"), label)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    val (keys, weights) =
      Classifier.collectDict(Classifier.nbTrain(docs, col("text"), label))
    assert(keys.sameElements(keys.sorted), "dictionary digests must be sorted")
    val prior = Classifier.collectPrior(docs, label)
    val mapside = Classifier.nbScoreMapSide(docs, "doc_id", col("text"),
        keys, weights, prior)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    assert(mapside.sameElements(joined),
      "the two scoring paths must agree exactly at the round-4 surface")
  }

  test("map-side scoring is a single projection — zero exchanges") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = col("n_chars") >= 300
    val (keys, weights) =
      Classifier.collectDict(Classifier.nbTrain(docs, col("text"), label))
    val plan = Classifier.nbScoreMapSide(docs, "doc_id", col("text"),
        keys, weights, 0.1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"scoring must never shuffle — dictionary rides as a referenced object:\n$plan")
    assert(!plan.contains("Generate"),
      s"scoring must not explode the token stream:\n$plan")
  }

  test("collectDict maxTokens keeps the strongest tokens by |llr|") {
    val dict = Classifier.nbTrain(corpus, col("text"), col("pos"))
    val full = dict.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (keys, weights) = Classifier.collectDict(dict, maxTokens = 2)
    assert(keys.length == 2 && weights.length == 2)
    // good and spam (|llr| = ln 4) dominate wiki/junk (ln 2) and both (0)
    assert(weights.map(math.abs).forall(w => math.abs(w - math.abs(full("good"))) < 1e-12))
    // truncated dictionary still scores: doc with only weak tokens → prior
    val strays = Seq((1L, "wiki junk both")).toDF("doc_id", "text")
    val out = Classifier.nbScoreMapSide(strays, "doc_id", col("text"),
      keys, weights, 0.25).collect()
    assert(out.head.getDouble(1) == 0.25)
  }

  test("stratified: per-stratum dictionaries never cross-score a shared token") {
    // `tok` is pure-positive in stratum A and pure-negative in B —
    // one global model would wash it out; per-stratum models keep
    // opposite signs
    val rows = Seq(
      (1L, "A", "tok alpha", true), (2L, "A", "beta", false),
      (3L, "B", "tok gamma", false), (4L, "B", "delta", true))
      .toDF("doc_id", "st", "text", "pos")
    val dict = Classifier.nbTrainStratified(rows, col("st"), col("text"), col("pos"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(dict(("A", "tok")) > 0 && dict(("B", "tok")) < 0)
    assert(dict(("A", "tok")) === -dict(("B", "tok")),
      "mirror-image strata must produce mirror-image weights")
    // per-stratum V: stratum A's smoothing uses only A's 3 tokens
    // N_pos(A)=2 ("tok","alpha"), N_neg(A)=1 ("beta"), V(A)=3
    val expect = math.log(2.0 / (2 + 3)) - math.log(1.0 / (1 + 3))
    assert(math.abs(dict(("A", "tok")) - expect) < 1e-12)
  }

  test("stratified scoring: per-stratum priors; one-class strata score NULL") {
    val rows = Seq(
      (1L, "A", "x y", true), (2L, "A", "x z", false),
      (3L, "C", "only positive docs here", true),
      (4L, "C", "more positive text", true))
      .toDF("doc_id", "st", "text", "pos")
    val out = Classifier.nbQualityScoreStratified(rows, "doc_id",
        col("st"), col("text"), col("pos"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L)._1 === "A" && out(1L)._2.isDefined)
    // stratum C has no negative docs → no odds ratio → honest NULL
    assert(out(3L)._2.isEmpty && out(4L)._2.isEmpty)
  }

  test("stratified: NULL strata score against their own model, never vanish") {
    val rows = Seq(
      (1L, "A", "x y", true), (2L, "A", "x z", false),
      (3L, null.asInstanceOf[String], "n1 n2", true),
      (4L, null.asInstanceOf[String], "n1 n3", false))
      .toDF("doc_id", "st", "text", "pos")
    val out = Classifier.nbQualityScoreStratified(rows, "doc_id",
        col("st"), col("text"), col("pos"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.isNullAt(2)))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L),
      "one output row per input doc — NULL strata must not drop")
    assert(out(3L)._1.isEmpty && !out(3L)._2,
      "the NULL stratum is two-class here: its docs get real scores")
    // ...and the scores carry real token EVIDENCE, not just the prior:
    // n2 is pure-positive in the NULL stratum (llr = ln 2), n3 pure-
    // negative; a null-unsafe dictionary join would score both 0.0
    val scores = Classifier.nbQualityScoreStratified(rows, "doc_id",
        col("st"), col("text"), col("pos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(3L) === 0.6931 && scores(4L) === -0.6931,
      s"NULL-stratum docs must score against their own dictionary: $scores")
  }

  test("stratified truncation is per stratum — a loud stratum can't evict a quiet one") {
    // stratum A: strong weights on many tokens; stratum B: weak weights
    val rows = Seq(
      (1L, "A", "a1 a2 a3 a4", true), (2L, "A", "a5 a6 a7 a8", false),
      (3L, "B", "b1 b1 b2", true), (4L, "B", "b3 b2", false))
      .toDF("doc_id", "st", "text", "pos")
    val dict = Classifier.nbTrainStratified(rows, col("st"), col("text"), col("pos"))
    val (keys, _) = Classifier.collectDictStratified(dict, maxTokens = 2)
    // 2 per stratum → 4 entries total, and B keeps its strongest two
    assert(keys.length === 4)
    val bTop = dict.filter(col("__st") === "B")
      .orderBy(abs(col("llr")).desc, col("token")).limit(2)
      .select(xxhash64(col("__st"), col("token"))).collect().map(_.getLong(0)).toSet
    assert(bTop.subsetOf(keys.toSet), "stratum B's own top tokens must survive")
  }

  test("stratified map-side kernel reproduces the join-based stratified scorer") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val label = col("n_chars") >= 300
    val joined = Classifier.nbQualityScoreStratified(docs, "doc_id",
        col("lang"), col("text"), label)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
    val dict = Classifier.nbTrainStratified(docs, col("lang"), col("text"), label)
    val (keys, weights) = Classifier.collectDictStratified(dict)
    val priors = Classifier.stratPriors(docs, col("lang"), label)
    val score = Classifier.stratHitSum(col("lang"), col("text"), keys, weights) +
      col("__p")
    val mapside = docs.join(broadcast(priors), col("lang") === col("__st"), "left")
      .select(col("doc_id"), round(score, 4).as("nb_llr"), (score > 0).as("hq"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    assert(mapside.sameElements(joined),
      "stratified paths must agree at the round-4 surface")
  }

  test("prior shifts scores: unbalanced labels bias toward the bigger class") {
    val skewed = Seq(
      (1L, "alpha beta", true),
      (2L, "alpha gamma", true),
      (3L, "alpha delta", true),
      (4L, "omega", false)).toDF("doc_id", "text", "pos")
    val scored = Classifier.nbQualityScore(skewed, "doc_id",
        col("text"), col("pos"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // prior = ln(3) > 0 pulls everything up; the lone negative doc's
    // evidence must still win against the prior (its only token is
    // pure-negative: llr = ln(1/9) - ln(2/7) < -ln 3)
    assert(scored(4L) < 0)
    assert(Seq(1L, 2L, 3L).forall(scored(_) > 0))
  }
}
