package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Split

class SplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("split is deterministic: same key+seed, same assignment, any partitioning") {
    val a = Split.split(docs, Seq("doc_id")).select("doc_id", "split")
    val b = Split.split(docs.repartition(13), Seq("doc_id")).select("doc_id", "split")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("splits are disjoint and exhaustive (O5 invariant)") {
    val s = Split.split(docs, Seq("doc_id")).cache()
    val train = s.filter(col("split") === "train")
    val va = s.filter(col("split") === "validation")
    val te = s.filter(col("split") === "test")
    assert(train.count() + va.count() + te.count() === docs.count())
    assert(Split.disjoint(train, va, Seq("doc_id")))
    assert(Split.disjoint(train, te, Seq("doc_id")))
    assert(Split.disjoint(va, te, Seq("doc_id")))
    s.unpersist()
  }

  test("ratios within tolerance (±5% absolute at n=500, matches reference ±2% at corpus n)") {
    val s = Split.split(docs, Seq("doc_id"))
    val n = docs.count().toDouble
    val frac = s.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / n).toMap
    assert(math.abs(frac("train") - 0.9) < 0.05, s"train=${frac("train")}")
    assert(math.abs(frac.getOrElse("validation", 0.0) - 0.05) < 0.05)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.05) < 0.05)
  }

  test("stratified split: EXACT per-stratum counts, partition of input, deterministic") {
    val s = Split.stratified(docs, col("lang"), col("doc_id"),
      ratios = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1))
    val counts = s.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      val train = math.ceil(0.8 * n).toLong
      val valTo = math.ceil(0.9 * n).toLong
      assert(counts.getOrElse((lang, "train"), 0L) === train, s"$lang train")
      assert(counts.getOrElse((lang, "validation"), 0L) === valTo - train, s"$lang validation")
      assert(counts.getOrElse((lang, "test"), 0L) === n - valTo, s"$lang test")
    }
    assert(s.count() === docs.count(), "partition of the input")
    val again = Split.stratified(docs, col("lang"), col("doc_id"),
      ratios = Seq("train" -> 0.8, "validation" -> 0.1, "test" -> 0.1))
    assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty, "deterministic")
  }

  test("budgetSample caps every stratum's cost, deterministically and monotonically") {
    val b20k = Split.budgetSample(docs, col("lang"), col("doc_id"), col("n_chars"), 20000L)
    // strict cap per stratum
    b20k.groupBy("lang").agg(org.apache.spark.sql.functions.sum("n_chars").as("c"))
      .collect().foreach(r => assert(r.getLong(1) <= 20000L, s"${r.getString(0)} over budget"))
    // nonempty and smaller than the corpus (fixture has >20k chars/lang)
    assert(b20k.count() > 0 && b20k.count() < docs.count())
    // deterministic
    val again = Split.budgetSample(docs, col("lang"), col("doc_id"), col("n_chars"), 20000L)
    assert(b20k.exceptAll(again).isEmpty && again.exceptAll(b20k).isEmpty)
    // monotone: larger budget keeps a superset
    val b40k = Split.budgetSample(docs, col("lang"), col("doc_id"), col("n_chars"), 40000L)
    assert(b20k.select("doc_id").exceptAll(b40k.select("doc_id")).isEmpty)
  }

  test("packSequences: concat-and-cut pack assignment is exact and deterministic") {
    val rows = Seq(
      (1L, "en", 1000L), (2L, "en", 1000L), (3L, "en", 100L),
      (4L, "en", 2500L), // longer than capacity: starts in one pack, spills
      (5L, "fr", 10L)
    ).toDF("doc_id", "lang", "toks")
    val packed = Split.packSequences(rows, key = col("doc_id"), cost = col("toks"),
        capacity = 2048L, strata = Seq(col("lang")))
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    // en stream offsets: 0, 1000, 2000, 2100 → packs 0,0,0,1 (2100/2048)
    assert(packed(1L) === (0L, 0L))
    assert(packed(2L) === (0L, 1000L))
    assert(packed(3L) === (0L, 2000L), "doc straddling the cut keeps its start pack")
    assert(packed(4L) === (1L, 52L))
    assert(packed(5L) === (0L, 0L), "strata pack independently")
    // invariants: offset < capacity; deterministic under repartition
    val repacked = Split.packSequences(rows.repartition(7), key = col("doc_id"),
        cost = col("toks"), capacity = 2048L, strata = Seq(col("lang")))
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(repacked === packed)
    assert(packed.values.forall(_._2 < 2048L))
  }

  test("weightedSample: A-RES selection matches the driver-side replay, excludes invalid weights") {
    val base = (1L to 400L).map(i => (i, if (i <= 40) 1000.0 else 1.0))
    val withBad = base ++ Seq((501L, 0.0), (502L, -3.0), (503L, Double.NaN))
    val df = withBad.toDF("id", "w")
    val out = Split.weightedSample(df, col("id"), col("w"), k = 60)
      .select("id").as[Long].collect().toSet

    // replay the rule driver-side from the engine's own uniforms:
    // score = round(u^(1/w), 9), top-k by (score desc, id asc)
    // NaN orders above 0 in Spark — the replay must exclude it
    // explicitly, exactly as the operator does
    val us = df.filter(!isnan(col("w")) && col("w") > 0)
      .select(col("id"), Split.uniform(col("id")).as("u"), col("w"))
      .as[(Long, Double, Double)].collect()
    val expected = us
      .map { case (id, u, w) =>
        (id, BigDecimal(math.pow(u, 1.0 / w))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }
      .take(60).map(_._1).toSet
    assert(out === expected)

    // invalid weights can never be drawn
    assert(out.intersect(Set(501L, 502L, 503L)).isEmpty)
    // the 10%-of-rows heavy-weight group dominates a k=60 draw
    assert(out.count(_ <= 40) >= 30,
      s"heavy group underrepresented: ${out.count(_ <= 40)}/40 drawn")

    // deterministic on any partitioning
    val again = Split.weightedSample(df.repartition(7), col("id"), col("w"), k = 60)
      .select("id").as[Long].collect().toSet
    assert(again === out)

    // k >= valid rows keeps all of them
    val all = Split.weightedSample(df, col("id"), col("w"), k = 1000)
      .select("id").as[Long].collect().toSet
    assert(all === base.map(_._1).toSet)
  }

  test("chunkConcat: exact-ctx examples, boundary docs split, every token used once") {
    val df = Seq((1L, 100L), (2L, 2000L), (3L, 5000L), (4L, 0L), (5L, -1L))
      .toDF("id", "cost")
    val out = Split.chunkConcat(df, col("id"), col("cost"), ctx = 1024L)
      .select("id", "chunk_id", "seg_begin", "seg_len", "chunk_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // non-positive costs contribute nothing
    assert(!out.exists(r => r._1 == 4L || r._1 == 5L))
    // doc 2 starts at offset 100 and spans examples 0, 1, 2 with the
    // hand-computed segment arithmetic
    val d2 = out.filter(_._1 == 2L).sortBy(_._2).toSeq
    assert(d2 === Seq((2L, 0L, 0L, 924L, 100L), (2L, 1L, 924L, 1024L, 0L),
      (2L, 2L, 1948L, 52L, 0L)))
    // every token of every doc is covered exactly once, in order
    val byDoc = out.groupBy(_._1)
    assert(byDoc(1L).map(_._4).sum === 100L)
    assert(byDoc(2L).map(_._4).sum === 2000L)
    assert(byDoc(3L).map(_._4).sum === 5000L)
    byDoc.values.foreach { segs =>
      val s = segs.sortBy(_._2)
      assert(s.head._3 === 0L, "first segment starts at token 0")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + a._4, "segments contiguous")
          assert(b._5 === 0L, "continuation segments start their example")
        case _ =>
      }
    }
    // every example except the last is exactly ctx tokens
    val perChunk = out.groupBy(_._2).map { case (c, segs) => (c, segs.map(_._4).sum) }
    val lastChunk = perChunk.keys.max
    perChunk.foreach { case (c, total) =>
      if (c != lastChunk) assert(total === 1024L, s"chunk $c") }
    // deterministic under repartitioning
    val again = Split.chunkConcat(df.repartition(5), col("id"), col("cost"), 1024L)
      .select("id", "chunk_id", "seg_begin", "seg_len", "chunk_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSet === out.toSet)
  }

  test("capPerStratum: salted two-stage equals the plain cap, caps hold, determinism") {
    val capped = Split.capPerStratum(docs, col("source"), col("doc_id"),
      cap = 7, salts = 8)
    // output-identical to the single-window cap (salts = 1) AND to
    // budgetSample with unit cost — three formulations, one set
    val plain = Split.capPerStratum(docs, col("source"), col("doc_id"),
      cap = 7, salts = 1)
    val viaBudget = Split.budgetSample(docs, col("source"), col("doc_id"),
      lit(1L), budget = 7L)
    val ids = capped.select("doc_id").as[Long].collect().toSet
    assert(ids === plain.select("doc_id").as[Long].collect().toSet)
    assert(ids === viaBudget.select("doc_id").as[Long].collect().toSet)
    // no stratum exceeds the cap; strata smaller than the cap are intact
    val perSource = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSource.values.forall(_ <= 7))
    totals.foreach { case (src, n) =>
      assert(perSource.getOrElse(src, 0L) === math.min(n, 7L), src)
    }
    // deterministic under any partitioning
    val again = Split.capPerStratum(docs.repartition(13), col("source"),
      col("doc_id"), cap = 7, salts = 8).select("doc_id").as[Long].collect().toSet
    assert(again === ids)
    // cap >= stratum size keeps everything
    val all = Split.capPerStratum(docs, col("source"), col("doc_id"),
      cap = 100000, salts = 8)
    assert(all.count() === docs.count())
  }

  test("temperatureSample: n^alpha quotas, size caps, determinism, alpha=1 proportional") {
    // strata sized 100 / 25 / 4: sqrt weights 10 / 5 / 2 → shares
    // 10/17, 5/17, 2/17 of targetTotal=34 → quotas 20 / 10 / 4
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++
      (126 to 129).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "g").repartition(7)
    val out = Split.temperatureSample(df, col("g"), col("id"),
      targetTotal = 34L, alpha = 0.5)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("a" -> 20L, "b" -> 10L, "c" -> 4L),
      s"sqrt-temperature quotas: $byG")
    // alpha = 1: proportional (129 rows, target 43 → floor(n/3))
    val prop = Split.temperatureSample(df, col("g"), col("id"),
      targetTotal = 43L, alpha = 1.0)
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop === Map("a" -> 33L, "b" -> 8L, "c" -> 1L), s"proportional: $prop")
    // a target above the corpus keeps everything (quota caps at n_g)
    val everything = Split.temperatureSample(df, col("g"), col("id"),
      targetTotal = 100000L, alpha = 0.5)
    assert(everything.count() === 129L)
    // deterministic in (key, seed); a different seed rotates membership
    val again = Split.temperatureSample(df, col("g"), col("id"), 34L, 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    val first = out.select("id").as[Long].collect().sorted.toSeq
    assert(again === first)
    val reseeded = Split.temperatureSample(df, col("g"), col("id"), 34L, 0.5, seed = 7L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(reseeded !== first, "seed must rotate the kept prefix")
    assert(reseeded.size === first.size, "quotas are seed-independent")
  }

  test("leakageSafeSplit: clusters never straddle splits; isolated rows behave like split()") {
    val n = 400
    val df = (1L to n.toLong).toDF("id")
    // clusters {1,2,3} (a chain, not a clique — components must close
    // it), {4,5}, and 6..400 isolated
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Split.leakageSafeSplit(df, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === n, "every row survives with a label")
    assert(Set(out(1L), out(2L), out(3L)).size === 1, "chain cluster moves together")
    assert(out(4L) === out(5L))
    // isolated rows get exactly the per-row assignment (cluster = own id)
    val plain = Split.split(df, Seq("id")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (6L to n.toLong).foreach(i => assert(out(i) === plain(i)))
    // deterministic; ratios hold roughly at n=400
    val again = Split.leakageSafeSplit(df, "id", pairs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === out)
    val trainFrac = out.values.count(_ == "train").toDouble / n
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction off: $trainFrac")
  }

  test("temperatureResample: exact quotas via replacement, upsample low-resource, downsample head") {
    // strata 100 / 25 / 4, alpha 0.5 → weights 10/5/2, target 170 →
    // quotas 100 / 50 / 20: a kept as-is, b doubled, c 5x
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 125).map(i => (i.toLong, "b")) ++
      (126 to 129).map(i => (i.toLong, "c"))
    val df = rows.toDF("id", "g").repartition(7)
    val out = Split.temperatureResample(df, col("g"), col("id"),
      targetTotal = 170L, alpha = 0.5)
    val byG = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("a" -> 100L, "b" -> 50L, "c" -> 20L), s"exact quotas: $byG")
    // every b row appears exactly twice (50 = 2*25, remainder 0)
    val bCopies = out.filter(col("g") === "b").groupBy("id").count()
      .select("count").as[Long].collect()
    assert(bCopies.forall(_ === 2L))
    // copy indices are 0-based and dense per row
    assert(out.filter(col("g") === "c" && col("id") === 126L)
      .select("copy").as[Long].collect().sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    // downsampling shares the formula: target 50 → quotas 29/14/5;
    // stratum a keeps only its md5-prefix (base 0 copies)
    val down = Split.temperatureResample(df, col("g"), col("id"), 50L, 0.5)
    val downG = down.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(downG === Map("a" -> 29L, "b" -> 14L, "c" -> 5L), s"down quotas: $downG")
    // the flattening still upsamples the TINY stratum (quota 5 > 4
    // rows → one doc repeats); the big strata are pure prefixes
    assert(down.filter(col("g") =!= "c").select("copy").distinct()
      .as[Long].collect().toSeq === Seq(0L))
    assert(down.filter(col("g") === "c").groupBy("id").count()
      .select("count").as[Long].collect().sorted.toSeq === Seq(1L, 1L, 1L, 2L))
    // deterministic
    val again = Split.temperatureResample(df, col("g"), col("id"), 170L, 0.5)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = out.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === first)
  }

  test("assignShards equals the sequential cumsum definition, invariant to bucket count") {
    val base = docs.select(col("doc_id"), length(col("text")).cast("long").as("c"))
    // sequential reference: exclusive cumsum over doc_id order, driver-side
    val seq = base.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val target = 4000L
    var acc = 0L
    val expected = seq.map { case (id, c) =>
      val r = (id, acc / target, acc % target); acc += c; r
    }.toSet
    for (b <- Seq(1, 7, 64)) {
      val got = Split.assignShards(docs.repartition(13), col("doc_id"),
          length(col("text")), target, buckets = b)
        .select("doc_id", "shard", "shard_offset").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"buckets=$b must not change the assignment")
    }
  }

  test("assignShards balances shard cost to target ± max doc cost") {
    val target = 4000L
    val out = Split.assignShards(docs, col("doc_id"), length(col("text")), target)
      .withColumn("c", length(col("text")).cast("long"))
    val maxCost = out.agg(max("c")).head().getLong(0)
    val perShard = out.groupBy("shard").agg(sum("c").as("t"))
      .orderBy("shard").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(perShard.length > 2, "fixture must produce several shards")
    perShard.init.foreach { case (s, t) =>
      assert(t > target - maxCost && t < target + maxCost,
        s"shard $s total $t outside target±maxCost")
    }
  }

  test("assignShards: empty input and degenerate single-shard input") {
    val empty = Split.assignShards(docs.limit(0), col("doc_id"),
      length(col("text")), 1000L)
    assert(empty.count() === 0L)
    val one = Split.assignShards(docs, col("doc_id"),
      length(col("text")), Long.MaxValue)
    assert(one.select("shard").distinct().as[Long].collect().toSeq === Seq(0L))
  }

  test("writeShards emits one file per shard directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Split.writeShards(docs, col("doc_id"), length(col("text")), 4000L, dir)
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length > 2)
    shardDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"${d.getName} must hold exactly one file")
    }
    val back = spark.read.parquet(dir)
    assert(back.count() === docs.count())
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("different seeds give different assignments") {
    val a = Split.split(docs, Seq("doc_id"), seed = 42L)
    val b = Split.split(docs, Seq("doc_id"), seed = 43L)
    val agree = a.alias("a").join(b.alias("b"), Seq("doc_id"))
      .filter(col("a.split") === col("b.split")).count()
    assert(agree < docs.count(), "seeds must shuffle membership")
  }

  test("interleaveStrata: weighted fair order, prefix proportionality, determinism") {
    import spark.implicits._
    // stratum A: 4 rows, stratum B: 1 row, α = 1 → w_A = 4, w_B = 1;
    // positions A = .125 .375 .625 .875, B = .5 → order A A B A A
    val rows = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "A"), (10L, "B"))
      .toDF("id", "g")
    val mixed = Split.interleaveStrata(rows, col("g"), col("id"), alpha = 1.0)
    val order = mixed.orderBy(col("mix_pos"), col("id"))
      .select("g").collect().map(_.getString(0)).toSeq
    assert(order === Seq("A", "A", "B", "A", "A"))

    // prefix proportionality on a larger mixture: any prefix of the
    // mix_pos order holds each stratum within ±1 of its weight share
    val big = ((1 to 60).map(i => (i.toLong, "x")) ++
      (101 to 130).map(i => (i.toLong, "y")) ++
      (201 to 210).map(i => (i.toLong, "z"))).toDF("id", "g")
    val ordered = Split.interleaveStrata(big, col("g"), col("id"), alpha = 1.0)
      .orderBy(col("mix_pos"), col("id"))
      .select("g").collect().map(_.getString(0))
    val share = Map("x" -> 0.6, "y" -> 0.3, "z" -> 0.1)
    for (k <- 1 to ordered.length; g <- share.keys) {
      val got = ordered.take(k).count(_ == g)
      assert(math.abs(got - k * share(g)) <= 1.0,
        s"prefix $k: stratum $g has $got of expected ${k * share(g)}")
    }

    // ranks are per-stratum contiguous and the op is deterministic
    val again = Split.interleaveStrata(rows, col("g"), col("id"), alpha = 1.0)
      .select("id", "mix_rank", "mix_pos").collect().toSet
    assert(again === mixed.select("id", "mix_rank", "mix_pos").collect().toSet)
  }

  test("domainReweight: hand-computed multiplicative-weights step") {
    // A: losses 10,20 (mean 15); B: 0,10 (mean 5); global mean 10
    // excess A=5, B=0; w0=0.5 each; eta=0.1, smoothing=0.02
    val rows = Seq(("A", 10L), ("A", 20L), ("B", 0L), ("B", 10L))
      .toDF("dom", "loss")
    val out = Split.domainReweight(rows, col("dom"), col("loss"),
        eta = 0.1, smoothing = 0.02)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("A") === ((2L, 5.0, 0.62001)))
    assert(out("B") === ((2L, 0.0, 0.37999)))
  }

  test("domainReweight invariants: weights sum to 1, eta=0 is the smoothed baseline, below-mean domains clamp at 0 excess") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = Split.domainReweight(docs, col("source"), col("n_chars"),
      eta = 0.01, smoothing = 0.01).collect()
    assert(math.abs(w.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(w.forall(_.getDouble(2) >= 0.0), "excess is clamped at 0")
    // eta=0: weight = (1-c)*n/tn + c/k exactly
    val k = w.length
    val tn = w.map(_.getLong(1)).sum.toDouble
    val w0 = Split.domainReweight(docs, col("source"), col("n_chars"),
      eta = 0.0, smoothing = 0.01).collect()
    w0.foreach { r =>
      val expect = 0.99 * r.getLong(1) / tn + 0.01 / k
      assert(math.abs(r.getDouble(3) - expect) < 1e-6, s"${r.getString(0)}")
    }
  }

  test("epochOrder: a bijective permutation, invariant to buckets, epoch-distinct, resumable") {
    val ids = docs.select("doc_id")
    val n = ids.count()
    // driver-side truth: sort by the same md5-prefix key
    def key(id: Long, epoch: Int) = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$epoch:42".getBytes)
      var v = 0L; for (i <- 0 until 8) v = (v << 8) | (md(i) & 0xffL)
      v >>> 4
    }
    val allIds = ids.collect().map(_.getLong(0))
    val expected = allIds.map(id => (key(id, 3), id)).sorted
      .zipWithIndex.map { case ((k, id), pos) => (id, k, pos.toLong) }.toSet
    for (b <- Seq(1, 5, 16)) {
      val got = Split.epochOrder(ids.repartition(13), col("doc_id"), 3,
          buckets = b)
        .select("doc_id", "shuffle_key", "epoch_pos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"buckets=$b must not change the permutation")
    }
    // epoch_pos is a bijection 0..n-1 (implied by === expected, spelled out)
    assert(expected.map(_._3) === (0L until n).toSet)
    // a different epoch is a genuinely different order
    val e4 = Split.epochOrder(ids, col("doc_id"), 4)
      .select("doc_id", "epoch_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val e3 = expected.map(t => t._1 -> t._3).toMap
    val moved = allIds.count(id => e3(id) != e4(id))
    assert(moved > n * 0.9, s"epochs must decorrelate, only $moved/$n moved")
    // addressable resume: the tail from epoch_pos >= P is exactly the
    // last n-P rows of the permutation
    val p = n / 2
    val tail = Split.epochOrder(ids, col("doc_id"), 3)
      .filter(col("epoch_pos") >= p).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(tail === expected.filter(_._3 >= p).map(_._1))
    // no global window: a 1-partition sort would plan Exchange
    // SinglePartition in front of the Window
    val plan = Split.epochOrder(ids, col("doc_id"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"the position window must be bucket-partitioned:\n$plan")
  }
}
