package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{analysis, text}
import graft.sources.CorpusIO

class AnalysisSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("s").select(c.as("r")).head().getAs[T](0)

  test("token_count: whitespace tokens, zero for blank") {
    assert(one[Int](analysis.token_count(col("s")), "a  b\tc") === 3)
    assert(one[Int](analysis.token_count(col("s")), "   ") === 0)
    assert(one[Int](analysis.token_count(col("s")), "") === 0)
  }

  test("token_count_bpe: long words cost more, punctuation counts") {
    val short = one[Int](analysis.token_count_bpe(col("s")), "cat dog")
    val long = one[Int](analysis.token_count_bpe(col("s")), "extraordinarily incomprehensible")
    assert(short === 2)
    assert(long > 2, "long words must cost extra subword tokens")
    assert(one[Int](analysis.token_count_bpe(col("s")), "a, b!") > 2)
  }

  test("quality_score in [0,1]: clean text high, noise low") {
    val clean = one[Double](analysis.quality_score(col("s")),
      "a perfectly reasonable sentence of normal words")
    val noisy = one[Double](analysis.quality_score(col("s")), "@#$%^&*!~``|||")
    val empty = one[Double](analysis.quality_score(col("s")), "")
    assert(clean >= 0.8 && clean <= 1.0)
    assert(noisy < 0.5)
    assert(empty >= 0.0 && empty <= 1.0)
  }

  test("stopword_ratio counts list membership") {
    assert(one[Double](analysis.stopword_ratio(col("s")), "the cat and the dog") === 0.6)
    assert(one[Double](analysis.stopword_ratio(col("s")), "") === 0.0)
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq("The Quick  Fox", "the quick fox", "the quick dog").toDF("s")
    val fps = df.select(analysis.fingerprint(col("s")).as("f")).collect().map(_.getLong(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("sentences_of splits on terminal punctuation") {
    val r = Seq("One two. Three! Four? five").toDF("s")
      .select(analysis.sentences_of(col("s")).as("r")).head().getSeq[String](0)
    assert(r === Seq("One two.", "Three!", "Four?", "five"))
  }

  test("sentences_of: pysbd-grade Spanish — abbreviations, initials, ellipses, decimals") {
    def seg(s: String): Seq[String] =
      Seq(s).toDF("s").select(analysis.sentences_of(col("s")).as("r"))
        .head().getSeq[String](0)
    // title abbreviations never break, even before the capitalized name
    assert(seg("El Sr. López llegó. La Dra. Ruiz salió.") ===
      Seq("El Sr. López llegó.", "La Dra. Ruiz salió."))
    // "p. ej." holds as one unit
    assert(seg("Hay casos, p. ej. este, y más. Fin") ===
      Seq("Hay casos, p. ej. este, y más.", "Fin"))
    // general abbreviation: no break before lowercase, break before capital
    assert(seg("Libros, mapas, etc. fueron vendidos. Todo") ===
      Seq("Libros, mapas, etc. fueron vendidos.", "Todo"))
    assert(seg("Libros, mapas, etc. Fueron vendidos.") ===
      Seq("Libros, mapas, etc.", "Fueron vendidos."))
    // decimals never break (no whitespace after the period)
    assert(seg("El valor 3.14 es pi. Sí") === Seq("El valor 3.14 es pi.", "Sí"))
    // ellipsis: continues in lowercase, breaks before a capital
    assert(seg("Pensaba... y siguió. Fin") === Seq("Pensaba... y siguió.", "Fin"))
    assert(seg("Pensaba... Entonces salió.") ===
      Seq("Pensaba...", "Entonces salió."))
    // a RUN of initials (the two-pass shield): never split mid-name
    assert(seg("J. R. R. Tolkien escribió mucho. Fin") ===
      Seq("J. R. R. Tolkien escribió mucho.", "Fin"))
    assert(seg("A. B. C. D. E. Cinco iniciales aquí. Fin") ===
      Seq("A. B. C. D. E. Cinco iniciales aquí.", "Fin"))
    // protections restore the periods verbatim — no shield bytes leak
    assert(seg("El Sr. López, p. ej. J. R. Ruiz... sigue aquí")
      .forall(s => !s.exists(c => c == '' || c == '')))
  }

  test("sentences_of: extended pysbd inventory — compounds, ordinals, months, street prefixes") {
    def seg(s: String): Seq[String] =
      Seq(s).toDF("s").select(analysis.sentences_of(col("s")).as("r"))
        .head().getSeq[String](0)
    // doubled-plural compounds: one unit before lowercase, the final
    // period still breaks before a capital
    assert(seg("Vive en EE. UU. desde 1990. Fin") ===
      Seq("Vive en EE. UU. desde 1990.", "Fin"))
    assert(seg("Vive en EE. UU. La política cambió.") ===
      Seq("Vive en EE. UU.", "La política cambió."))
    assert(seg("Las FF. AA. respondieron. Fin") ===
      Seq("Las FF. AA. respondieron.", "Fin"))
    assert(seg("El área de RR. HH. contrató. Fin") ===
      Seq("El área de RR. HH. contrató.", "Fin"))
    // era markers: the inner period never breaks
    assert(seg("Nació en 44 a. C. aproximadamente. Fin") ===
      Seq("Nació en 44 a. C. aproximadamente.", "Fin"))
    assert(seg("Murió en 14 d. C. según dicen. Fin") ===
      Seq("Murió en 14 d. C. según dicen.", "Fin"))
    // ordinal indicators bind their period
    assert(seg("El 1.º de mayo es fiesta. Fin") ===
      Seq("El 1.º de mayo es fiesta.", "Fin"))
    assert(seg("Vive en el N.º 12 de la calle. Fin") ===
      Seq("Vive en el N.º 12 de la calle.", "Fin"))
    assert(seg("La 2.ª edición salió. Fin") ===
      Seq("La 2.ª edición salió.", "Fin"))
    // month abbreviations continue before lowercase and digits
    assert(seg("Llegó el 5 dic. de 2020 al puerto. Fin") ===
      Seq("Llegó el 5 dic. de 2020 al puerto.", "Fin"))
    assert(seg("Nació el 1 ene. de 1990 en Lima. Fin") ===
      Seq("Nació el 1 ene. de 1990 en Lima.", "Fin"))
    // abbreviation before a NUMBER is the same utterance
    assert(seg("Véase la pág. 12 del libro. Fin") ===
      Seq("Véase la pág. 12 del libro.", "Fin"))
    assert(seg("Está en el vol. 3 de la serie. Fin") ===
      Seq("Está en el vol. 3 de la serie.", "Fin"))
    // street-type prefixes act as titles before the capitalized name
    assert(seg("Vive en el Blvd. Insurgentes 10. Fin") ===
      Seq("Vive en el Blvd. Insurgentes 10.", "Fin"))
    assert(seg("La Avda. Juárez cruza el centro. Fin") ===
      Seq("La Avda. Juárez cruza el centro.", "Fin"))
    // extended honorifics
    assert(seg("El Excmo. Sr. Presidente habló. Fin") ===
      Seq("El Excmo. Sr. Presidente habló.", "Fin"))
  }

  test("chunk_sentences packs sentences under the budget, oversize stands alone") {
    val s = "aaaa. bbbb. cccc. ddddddddddddddddddddddd. ee."
    val chunks = Seq(s).toDF("s")
      .select(analysis.chunk_sentences(col("s"), 12).as("r")).head().getSeq[String](0)
    assert(chunks === Seq("aaaa. bbbb.", "cccc.", "ddddddddddddddddddddddd.", "ee."))
    assert(chunks.mkString(" ").split("\\s+").sorted.toSeq === s.split("\\s+").sorted.toSeq,
      "chunking must preserve every sentence")
  }

  test("content_id: 16 hex chars, deterministic, input-sensitive (F15)") {
    val df = Seq(("http://a", "2026-01-01T00:00:00"), ("http://b", "2026-01-01T00:00:00"))
      .toDF("url", "ts")
    val ids = df.select(text.content_id(col("url"), col("ts")).as("id"))
      .collect().map(_.getString(0))
    assert(ids.forall(_.matches("[0-9a-f]{16}")))
    assert(ids(0) !== ids(1))
  }

  test("rewrite_orthography: central and huasteca variants (F11)") {
    assert(one[String](text.rewrite_orthography(col("s"), "central"), "wan a’mo") === "huan ahmo")
    assert(one[String](text.rewrite_orthography(col("s"), "huasteca"), "huan") === "wan")
    assert(one[String](text.rewrite_orthography(col("s"), "other"), "x") === "x")
  }

  test("adaptUniMorph maps morphology rows into the record schema (S12)") {
    val rows = Seq(("kalli", "kaltin", "N;PL"), ("", "tlaxkalli", "N;SG")).toDF("lemma", "form", "tags")
    val out = CorpusIO.adaptUniMorph(rows).collect()
    assert(out.forall(_.getAs[String]("layer") === "bronze"))
    assert(out.map(_.getAs[String]("nah")).toSet === Set("kaltin", "tlaxkalli"))
    assert(out.head.getAs[String]("origin_file") === "kalli:N;PL")
  }

  test("adaptTatoeba: translation struct with per-config key variants (S12)") {
    // nah-es config shape
    val pairs = Seq(
      (("Niltze", "Hola"), "train"),
      (("", "sin nahuatl"), "train")).map { case ((n, e), s) => (n, e, s) }
      .toDF("n", "e", "split")
      .select(struct(col("n").as("nah"), col("e").as("es")).as("translation"), col("split"))
    val out = CorpusIO.adaptTatoeba(pairs).collect()
    assert(out.length === 1, "rows without indigenous text dropped")
    assert(out.head.getAs[String]("nah") === "Niltze")
    assert(out.head.getAs[String]("es") === "Hola")
    assert(out.head.getAs[String]("origin_file") === "tatoeba:train")

    // nah_Latn-spa_Latn config shape: different struct keys, same adapter
    val latn = Seq(("Tlazohcamati", "Gracias", "test")).toDF("n", "e", "split")
      .select(struct(col("n").as("nah_Latn"), col("e").as("spa_Latn")).as("translation"),
        col("split"))
    val out2 = CorpusIO.adaptTatoeba(latn).collect()
    assert(out2.head.getAs[String]("nah") === "Tlazohcamati")
    assert(out2.head.getAs[String]("es") === "Gracias")
  }

  test("adaptFlores: sentence/sentence_es with provenance id (S12)") {
    val rows = Seq(
      ("In cualli tonalli", "El buen día", "dev", 7L),
      ("", "vacío", "dev", 8L)).toDF("sentence", "sentence_es", "split", "id")
    val out = CorpusIO.adaptFlores(rows).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("nah") === "In cualli tonalli")
    assert(out.head.getAs[String]("origin_file") === "flores:dev:7")
    // config without the Spanish side still adapts
    val noEs = Seq(("Niltze", "devtest", 1L)).toDF("sentence", "split", "id")
    val out2 = CorpusIO.adaptFlores(noEs).collect()
    assert(out2.head.getAs[String]("nah") === "Niltze")
    assert(out2.head.getAs[String]("es") === null)
  }

  test("adaptAmericasNlp: text/source fallback, task rides in category (S12)") {
    val rows = Seq(
      ("Niltze", null, "Hola", "train", "translation"),
      (null, "Tlen", "Qué", "train", "asr"),
      (null, null, "nada", "train", "translation"))
      .toDF("text", "source", "target", "split", "task")
    val out = CorpusIO.adaptAmericasNlp(rows).collect()
    assert(out.length === 2, "rows with no indigenous text dropped")
    val byNah = out.map(r => r.getAs[String]("nah") -> r).toMap
    assert(byNah("Niltze").getAs[String]("es") === "Hola")
    assert(byNah("Niltze").getAs[String]("category") === "translation")
    assert(byNah("Tlen").getAs[String]("category") === "asr",
      "dataset's own source column is the fallback text")
    assert(out.forall(_.getAs[String]("source") === "americasnlp"))
  }

  test("wordRepetition flags keyword-stuffed docs and scores clean ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "buy now buy now buy now buy now buy now"),          // stuffed
      (2L, "a perfectly ordinary sentence with distinct words"), // clean
      (3L, ""),                                                  // empty → no row
      (4L, "word")                                               // single word
    ).toDF("doc_id", "text")
    val prof = graft.operators.Stats.wordRepetition(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!prof.contains(3L), "empty text produces no profile row")
    assert(prof(1L).getAs[Long]("n_words") === 10L)
    assert(prof(1L).getAs[Double]("top_word_frac") === 0.5)
    assert(prof(1L).getAs[Double]("ttr") === 0.2)
    assert(prof(2L).getAs[Double]("top_word_frac") === 0.142857)
    assert(prof(4L).getAs[Double]("top_word_frac") === 1.0)
    assert(prof(4L).getAs[Double]("ttr") === 1.0)
  }

  test("driftReport: zero PSI on identical corpora, positive on shift, null bucket surfaces") {
    import graft.operators.Stats
    val ref = Seq((1L, "en", 10), (2L, "en", 20), (3L, "es", 30),
      (4L, "es", 40)).toDF("doc_id", "lang", "n")
    // identical distributions → every bucket and feature at PSI 0
    val same = Stats.driftReport(ref, ref,
      Seq("lang" -> col("lang"))).collect()
    assert(same.forall(_.getAs[Double]("psi") === 0.0))
    assert(same.forall(_.getAs[Double]("feature_psi") === 0.0))
    assert(same.map(r => (r.getAs[String]("bucket"),
      r.getAs[Double]("ref_share"))).toSet === Set("en" -> 0.5, "es" -> 0.5))
    // shifted: cur is all-en plus a bucket ref never saw (null lang)
    val cur = Seq((5L, "en", 10), (6L, "en", 20), (7L, "en", 30),
      (8L, null.asInstanceOf[String], 40)).toDF("doc_id", "lang", "n")
    val drift = Stats.driftReport(ref, cur, Seq("lang" -> col("lang")))
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    assert(drift.keySet === Set("en", "es", "<null>"),
      "buckets on either side all surface, nulls as <null>")
    assert(drift("es").getAs[Long]("cur_n") === 0L)
    assert(drift("<null>").getAs[Long]("ref_n") === 0L)
    assert(drift.values.forall(_.getAs[Double]("feature_psi") > 0.1),
      "an all-bucket shift must read as drifted")
    // a one-side-only bucket contributes a finite (eps-floored) spike
    assert(drift("es").getAs[Double]("psi") > 0 &&
      !drift("es").getAs[Double]("psi").isInfinite)
    // two features → independent feature_psi groups
    val two = Stats.driftReport(ref, cur,
      Seq("lang" -> col("lang"), "n_bucket" -> floor(col("n") / lit(25))))
      .collect().map(r => r.getAs[String]("feature")).distinct
    assert(two.toSet === Set("lang", "n_bucket"))
  }

  test("tokenDrift: stable stream at zero, injected boilerplate folds to its token or <other>") {
    import graft.operators.Stats
    val ref = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    val same = Stats.tokenDrift(ref, ref, col("text"), k = 10).collect()
    assert(same.forall(_.getAs[Double]("psi") === 0.0))
    // cur injects a boilerplate token ref never saw: with k large it
    // is NOT in the ref vocab → folds to <other>, which spikes
    val cur = Seq((3L, "alpha beta spamspam"), (4L, "spamspam spamspam gamma"))
      .toDF("doc_id", "text")
    val drift = Stats.tokenDrift(ref, cur, col("text"), k = 10)
      .collect().map(r => r.getAs[String]("bucket") -> r).toMap
    assert(drift.contains("<other>"), "unseen tokens fold to <other>")
    assert(drift("<other>").getAs[Long]("ref_n") === 0L)
    assert(drift("<other>").getAs[Long]("cur_n") === 3L)
    assert(drift("<other>").getAs[Double]("psi") > 0.1)
    // shares are over the token STREAM (occurrences), not documents
    assert(drift("alpha").getAs[Double]("ref_share") === 0.333333)
    // k = 1 keeps only the top ref token (tie broken on the token:
    // alpha/beta both ×2 → alpha); everything else is <other>
    val k1 = Stats.tokenDrift(ref, ref, col("text"), k = 1)
      .collect().map(_.getAs[String]("bucket")).toSet
    assert(k1 === Set("alpha", "<other>"))
  }

  test("dupNgramProfile: phrase-stuffed vs clean docs; short docs produce no row") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),              // bigrams: "a b"×3, "b a"×2 — all duplicated
      (2L, "one two three four"),        // all bigrams distinct
      (3L, "word"),                      // < n words → no grams, no row
      (4L, "")
    ).toDF("doc_id", "text")
    val prof = graft.operators.Stats.dupNgramProfile(docs, "doc_id", col("text"), n = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!prof.contains(3L) && !prof.contains(4L))
    assert(prof(1L).getAs[Long]("n_grams") === 5L)
    assert(prof(1L).getAs[Long]("distinct_grams") === 2L)
    assert(prof(1L).getAs[Double]("dup_gram_char_frac") === 1.0)
    assert(prof(1L).getAs[Double]("top_gram_char_frac") === 0.6) // 3×3 chars of 15
    assert(prof(2L).getAs[Double]("dup_gram_char_frac") === 0.0)
    assert(prof(2L).getAs[Long]("n_grams") === 3L)
  }

  test("unigramSurprisal: stuffed docs score low, rare-word docs high, exact on known freqs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the"),          // only the hottest word
      (2L, "the rare1 rare2 rare3"),    // mostly singletons
      (3L, "")                          // no words → no row
    ).toDF("doc_id", "text")
    val prof = graft.operators.Stats.unigramSurprisal(docs, "doc_id", col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!prof.contains(3L))
    // freqs over 8 words: the=5, rare*=1 → surprisal(the)=log2(8/5), rare=3 bits
    // mirror the operator's integer-space arithmetic (per-term round
    // to 4 → ×10⁴ ints → exact sum → half-up integer mean)
    val sThe = math.log(8.0 / 5.0) / math.log(2.0)
    val kThe = math.round(
      BigDecimal(sThe).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * 10000)
    val exp1 = ((4 * kThe * 200 + 4) / (2L * 4)) / 1000000.0
    assert(math.abs(prof(1L).getAs[Double]("mean_surprisal") - exp1) < 1e-9)
    assert(prof(2L).getAs[Double]("mean_surprisal") >
      prof(1L).getAs[Double]("mean_surprisal"),
      "rare-word doc must out-score the stuffed doc")
    assert(prof(1L).getAs[Long]("n_words") === 4L)
  }

  test("chunk_overlap: stride windows, tail reaches the end, short/empty inputs") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "abc"), (3L, "")).toDF("id", "text")
    val chunks = docs.select(col("id"),
        graft.functions.analysis.chunk_overlap(col("text"), 4, 3).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // len 10, size 4, stride 3 → lastIdx = ceil(6/3) = 2 → starts 0,3,6
    assert(chunks(1L) === Seq("abcd", "defg", "ghij"))
    assert(chunks(2L) === Seq("abc"), "text shorter than size is one chunk")
    assert(chunks(3L) === Seq.empty, "empty text has no chunks")
    // overlap invariant: consecutive chunks share size - stride chars
    val Seq(a, b, _) = chunks(1L)
    assert(a.takeRight(1) === b.take(1))
  }

  test("vocabCoverage: ranked top-k with cumulative share of the FULL stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the cat"),
      (2L, "the cat sat on rare")
    ).toDF("doc_id", "text")
    // freqs: the=4, cat=2, sat=1, on=1, rare=1 → total 9
    val top = graft.operators.Stats.vocabCoverage(docs, col("text"), k = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(top.toSeq === Seq(
      (1, "the", 4L, 0.444444),
      (2, "cat", 2L, 0.666667))) // cum share vs ALL 9 tokens, not the top-2 mass
  }

  test("quantileProfile: exact interpolating quantiles, global and grouped") {
    import spark.implicits._
    val vals = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5),
      ("b", 10), ("b", 20)).toDF("k", "v")
    val global = graft.operators.Stats.quantileProfile(
        vals.filter(col("k") === "a"), col("v"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(global === Map(0.25 -> 2.0, 0.5 -> 3.0, 0.75 -> 4.0))
    val grouped = graft.operators.Stats.quantileProfile(
        vals, col("v"), Seq(0.5), groupBy = Seq(col("k")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(grouped === Map("a" -> 3.0, "b" -> 15.0))
  }

  test("quantileProfile approx: bounded-state sketch tracks exact within rank error") {
    // the 100 TB path — same output contract, GK sketch instead of
    // buffering every group value in the aggregation state
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq(0.1, 0.5, 0.9)
    def profile(approx: Boolean) = graft.operators.Stats.quantileProfile(
        docs, col("n_chars"), qs, approx = approx)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = profile(approx = false)
    val approx = profile(approx = true)
    assert(approx.keySet === exact.keySet)
    // at accuracy=10000 on a small corpus the sketch is rank-exact;
    // values may differ only by interpolation (approx returns a real
    // data point, exact interpolates between two)
    qs.foreach { q =>
      assert(math.abs(approx(q) - exact(q)) <= 1.0 + exact(q) * 0.01,
        s"q=$q approx=${approx(q)} exact=${exact(q)}")
    }
    // schema is mode-independent: both emit double values
    val schema = graft.operators.Stats.quantileProfile(
      docs, col("n_chars"), qs, approx = true).schema
    assert(schema("value").dataType.typeName === "double")
  }

  test("compression_ratio separates boilerplate from prose, deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),
      (2L, "The quick brown fox jumps over a lazy dog while reading Spark plans."),
      (3L, "")
    ).toDF("id", "text")
    val ratios = docs
      .select(col("id"), graft.functions.analysis.compression_ratio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ratios(1L) < ratios(2L), s"boilerplate must compress better: $ratios")
    assert(ratios(1L) < 0.5 && ratios(2L) > 0.5, s"signal magnitudes: $ratios")
    assert(ratios(3L) === 1.0, "empty string convention")
    val again = docs
      .select(col("id"), graft.functions.analysis.compression_ratio(col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === ratios, "deterministic")
  }

  test("columnProfile: one-pass per-column stats, nulls and distinct exact, approx close") {
    val df = Seq(
      (1L, Option("x"), 10), (2L, Option("y"), 10), (3L, None, 20)
    ).toDF("id", "s", "v")
    val prof = graft.operators.Stats.columnProfile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(prof("id").getAs[Long]("n_non_null") === 3L)
    assert(prof("id").getAs[Long]("n_distinct") === 3L)
    assert(prof("id").getAs[String]("min_value") === "1")
    assert(prof("id").getAs[String]("max_value") === "3")
    assert(prof("s").getAs[Long]("n_non_null") === 2L)
    assert(prof("s").getAs[Double]("null_rate") === 0.333333)
    assert(prof("s").getAs[Long]("n_distinct") === 2L)
    assert(prof("v").getAs[Long]("n_distinct") === 2L)
    // the 100 TB swap: HLL estimate lands on the exact value at this n
    val approx = graft.operators.Stats.columnProfile(df, Seq("v"), approximate = true)
      .head().getAs[Long]("n_distinct")
    assert(approx === 2L)
  }

  test("mixtureReport: exact shares and means per stratum") {
    val df = Seq(("a", 10L), ("a", 30L), ("b", 60L)).toDF("g", "cost")
    val rep = graft.operators.Stats.mixtureReport(df, Seq(col("g")), col("cost"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep("a").getAs[Long]("docs") === 2L)
    assert(rep("a").getAs[Long]("total_cost") === 40L)
    assert(rep("a").getAs[Double]("mean_cost") === 20.0)
    assert(rep("a").getAs[Double]("doc_share") === 0.666667)
    assert(rep("a").getAs[Double]("cost_share") === 0.4)
    assert(rep("b").getAs[Double]("doc_share") === 0.333333)
    assert(rep("b").getAs[Double]("cost_share") === 0.6)
  }

  test("bigramSurprisal: rare transitions score high, exact on known freqs, short docs rowless") {
    val docs = Seq((1L, "x y x y"), (2L, "y y x"), (3L, "solo")).toDF("id", "text")
    val out = graft.operators.Stats.bigramSurprisal(docs, "id", col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L), "single-word docs have no bigrams")
    // corpus: f1(x)=3, f1(y)=4; f2("x y")=2, "y x"=2, "y y"=1
    def lg(p: Double): Double = -math.log(p) / math.log(2)
    // mirror the operator's cross-engine-stable arithmetic: each term
    // rounded to 4 places and integer-ized (×10⁴), exact integer sum,
    // half-up mean in integer space ((200s + n) div 2n), then /10⁶
    def expect(terms: Double*): Double = {
      val ks = terms.map(t => math.round(
        BigDecimal(t).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * 10000))
      val n = terms.length
      ((ks.sum * 200 + n) / (2L * n)) / 1000000.0
    }
    assert(out(1L).getAs[Long]("n_bigrams") === 3L)
    assert(math.abs(out(1L).getAs[Double]("mean_surprisal")
      - expect(lg(2.0 / 3), lg(2.0 / 3), lg(2.0 / 4))) < 1e-9)
    assert(math.abs(out(2L).getAs[Double]("mean_surprisal")
      - expect(lg(1.0 / 4), lg(2.0 / 4))) < 1e-9)
    assert(out(2L).getAs[Double]("mean_surprisal") >
      out(1L).getAs[Double]("mean_surprisal"),
      "word salad (rare transitions over common words) must score higher")
  }

  test("importanceWeight: target-like docs score positive, off-domain negative, exact on known freqs") {
    val raw = Seq((1L, "x x"), (2L, "y y")).toDF("id", "text")
    val target = Seq("x x x").toDF("text")
    val out = graft.operators.Stats.importanceWeight(raw, "id", col("text"),
        target, col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // fr: x=2,y=2; ft: x=3,y=0; V=2, tr=4, tt=3 (add-one smoothing)
    val lrx = math.log(((3.0 + 1) / (3 + 2)) / ((2.0 + 1) / (4 + 2))) / math.log(2)
    val lry = math.log(((0.0 + 1) / (3 + 2)) / ((2.0 + 1) / (4 + 2))) / math.log(2)
    // mirror the operator's integer-space arithmetic, sign-split for
    // negative log-ratios (half-up = half away from zero on |sum|)
    def expect(lr: Double, n: Int): Double = {
      val k = math.round(
        BigDecimal(lr).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * 10000)
      val sk = n * k
      val m = if (sk >= 0) (sk * 200 + n) / (2L * n)
              else -((-sk * 200 + n) / (2L * n))
      m / 1000000.0
    }
    assert(out(1L).getAs[Long]("n_words") === 2L)
    assert(math.abs(out(1L).getAs[Double]("importance") - expect(lrx, 2)) < 1e-9)
    assert(math.abs(out(2L).getAs[Double]("importance") - expect(lry, 2)) < 1e-9)
    assert(out(1L).getAs[Double]("importance") > 0, "target-like doc selected")
    assert(out(2L).getAs[Double]("importance") < 0, "off-domain doc rejected")
    // a real-corpus sanity pass: scoring documents against their own
    // subset is deterministic and finite
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sub = docs.filter(col("lang") === "de")
    val a = graft.operators.Stats.importanceWeight(docs, "doc_id", col("text"),
      sub, col("text")).agg(sum("importance")).head().getDouble(0)
    val b = graft.operators.Stats.importanceWeight(docs, "doc_id", col("text"),
      sub, col("text")).agg(sum("importance")).head().getDouble(0)
    assert(a === b && !a.isNaN && !a.isInfinite)
  }

  test("strip_markup: tags, blocks, entities, double-escapes, whitespace; markup_ratio") {
    def strip(s: String): String = one[String](analysis.strip_markup(col("s")), s)
    // tags drop, content survives, whitespace collapses
    assert(strip("""<p class="x">hello <b>world</b></p>""") === "hello world")
    // script/style/comment CONTENT goes too, case-insensitively,
    // across newlines
    assert(strip("<SCRIPT>\nvar a = 1;\n</SCRIPT>keep") === "keep")
    assert(strip("<style type=\"a\">p { c: red }</style>keep") === "keep")
    assert(strip("a<!-- multi\nline\ncomment -->b") === "a b")
    // named entities decode; numeric references drop; the
    // double-escape &amp;lt; ends as LITERAL "&lt;", never "<"
    assert(strip("a &lt;tag&gt; &quot;q&quot; &apos;s&apos; b&nbsp;c") ===
      "a <tag> \"q\" 's' b c")
    assert(strip("x &#65;&#x42; y") === "x y")
    assert(strip("&amp;lt; &amp; &amp;amp;") === "&lt; & &amp;")
    // plain text passes through modulo whitespace normalization
    assert(strip("  already   clean\ttext\n") === "already clean text")
    // markup density: 0 for clean text and empty input, high for chrome
    def ratio(s: String): Double = one[Double](analysis.markup_ratio(col("s")), s)
    assert(ratio("") === 0.0)
    assert(ratio("plain words") === 0.0)
    assert(ratio("<div><div><div>x</div></div></div>") > 0.9)
  }

  test("canonicalize_url: case, ports, fragments, tracking params, slashes, passthrough") {
    def canon(s: String): String = one[String](analysis.canonicalize_url(col("s")), s)
    // host case folds, path case preserved
    assert(canon("https://EXAMPLE.com/Articles/X") === "https://example.com/Articles/X")
    // default ports strip; non-default ports stay
    assert(canon("https://h.com:443/p") === "https://h.com/p")
    assert(canon("http://h.com:80/p") === "http://h.com/p")
    assert(canon("http://h.com:8080/p") === "http://h.com:8080/p")
    assert(canon("https://h.com:8443/p") === "https://h.com:8443/p")
    // fragments drop
    assert(canon("https://h.com/p#section-2") === "https://h.com/p")
    // tracking params drop wherever they sit; non-tracked keep order
    assert(canon("https://h.com/p?utm_source=feed&gclid=abc") === "https://h.com/p")
    assert(canon("https://h.com/p?b=2&utm_x=1&a=1") === "https://h.com/p?b=2&a=1")
    assert(canon("https://h.com/p?utm_a=1&b=2") === "https://h.com/p?b=2")
    assert(canon("https://h.com/p?ref=home") === "https://h.com/p")
    // 'ref' needs a literal '=': refresh/referrer survive
    assert(canon("https://h.com/p?a=1&refresh=2&utm_c=x") ===
      "https://h.com/p?a=1&refresh=2")
    assert(canon("https://h.com/p?referrer=x") === "https://h.com/p?referrer=x")
    // trailing slashes trim
    assert(canon("https://h.com/p/") === "https://h.com/p")
    assert(canon("https://h.com/p/?ref=home") === "https://h.com/p")
    // non-URLs pass through untouched
    assert(canon("hello world") === "hello world")
    // idempotent on already-canonical urls
    assert(canon("https://h.com/p?a=1") === "https://h.com/p?a=1")
  }

  test("redact_pii: typed placeholders, stage-order disambiguation, idempotence") {
    def red(s: String): String = one[String](analysis.redact_pii(col("s")), s)
    assert(red("mail me at jane.doe+x@corp.example.org today") ===
      "mail me at <EMAIL> today")
    assert(red("server 192.168.254.3 answered") === "server <IP> answered")
    assert(red("call +44 20-7946-0958 now") === "call <PHONE> now")
    assert(red("account 9876543210 flagged") === "account <ID> flagged")
    // an IPv4 is an IP, not two short digit runs; an id inside an
    // email is an email
    assert(red("id9 10.0.13.7 x") === "id9 <IP> x")
    assert(red("123456789@example.com") === "<EMAIL>")
    // short digit runs survive (dates, counts)
    assert(red("year 2026 count 123") === "year 2026 count 123")
    val messy = "jane@ex.co from 10.1.2.3 ref 987654321 call +1 555-000-1234 end"
    assert(red(messy) === "<EMAIL> from <IP> ref <ID> call <PHONE> end")
    assert(red(red(messy)) === red(messy), "idempotent on redacted text")
    // counts mirror the redaction stages
    val counts = Seq(messy).toDF("s")
      .select(analysis.pii_counts(col("s")).as("p")).select("p.*").head()
    assert((counts.getInt(0), counts.getInt(1), counts.getInt(2), counts.getInt(3))
      === ((1, 1, 1, 1)))
    val clean = Seq("no pii here at all").toDF("s")
      .select(analysis.pii_counts(col("s")).as("p")).select("p.*").head()
    assert((clean.getInt(0), clean.getInt(1), clean.getInt(2), clean.getInt(3))
      === ((0, 0, 0, 0)))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, null-safely") {
    import graft.operators.Stats
    val v1 = Seq(
      (1L, Option("alpha"), Option("en")),
      (2L, Option("beta"), Option("en")),
      (3L, Option("gamma"), Option("de")),
      (4L, None: Option[String], Option("en")),  // null text in v1
      (5L, Option(""), Option("en"))             // empty text in v1
    ).toDF("id", "text", "lang")
    val v2 = Seq(
      (1L, Option("alpha"), Option("en")),       // unchanged
      (3L, Option("gamma EDIT"), Option("de")),  // changed (text)
      (4L, Option(""), Option("en")),            // null → "" IS a change
      (5L, Option(""), Option("en")),            // unchanged empty
      (6L, Option("new"), Option("en"))          // added
    ).toDF("id", "text", "lang")
    val out = Stats.snapshotDiff(v1, v2, "id", Seq("text", "lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "unchanged", 6L -> "added"))
    // a lang-only change is still a change (multi-column content)
    val v2b = Seq((1L, Option("alpha"), Option("de"))).toDF("id", "text", "lang")
    val only1 = Stats.snapshotDiff(v1.filter(col("id") === 1), v2b, "id",
      Seq("text", "lang")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(only1(1L) === "changed")
  }

  test("ngramNovelty: min-id ownership, hand-computed fractions, null below n words") {
    import graft.operators.Stats
    val docs = Seq(
      (1L, "a b c d e"),  // owns "a b c d", "b c d e"
      (2L, "a b c d x"),  // "a b c d" owned by 1; owns "b c d x"
      (3L, "a b c"),      // < 4 words: no grams
      (4L, "b c d e f")   // "b c d e" owned by 1; owns "c d e f"
    ).toDF("doc_id", "text")
    val out = Stats.ngramNovelty(docs, "doc_id", col("text"), n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1L) === ((2L, 2L, Some(1.0))))
    assert(out(2L) === ((2L, 1L, Some(0.5))))
    assert(out(3L) === ((0L, 0L, None)))
    assert(out(4L) === ((2L, 1L, Some(0.5))))

    // duplicate-id input rows: per-document distinctness holds and
    // the output stays one row per id
    val dup = Stats.ngramNovelty(docs.unionByName(docs.filter(col("doc_id") === 1)),
      "doc_id", col("text"), n = 4)
    assert(dup.count() === 4)
    val d1 = dup.filter(col("doc_id") === 1).collect().head
    assert((d1.getLong(1), d1.getLong(2)) === ((2L, 2L)))
  }

  test("ngramNovelty is partitioning-invariant and total (every input id present)") {
    import graft.operators.Stats
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Stats.ngramNovelty(docs, "doc_id", col("text"))
    val b = Stats.ngramNovelty(docs.repartition(7), "doc_id", col("text"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() === docs.count())
  }
}
