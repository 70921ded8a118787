package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.text

/** Deduplication operator family (SURVEY §2.4, D1-D8).
  *
  * All exact variants are expressed as composite-key + window/`max_by`
  * aggregations — one shuffle on the dedup key, no driver
  * materialization, no reliance on implicit row order (the reference's
  * pandas `drop_duplicates(keep='last')` depends on insertion order,
  * /root/reference/src/transforms/deduplicators.py:95-118; here the
  * keep policy is an explicit ORDER BY, which is the only definition
  * that survives a distributed shuffle).
  *
  * Scale notes (100 TB design point):
  *  - keepFirst/keepLast/keepBest are a single hash-partitioned
  *    aggregation (`max_by`/`min_by` over a struct) — partial
  *    aggregation happens map-side, so heavy duplicate skew collapses
  *    before the shuffle.
  *  - fuzzy dedup never collects duplicate ids to the driver (the
  *    reference does, src/scala_examples/SparkDedup.scala:63-67);
  *    removal is a `left_anti` join.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger("graft.operators.Dedup")

  /** D1 composite normalized key over the given columns (F8+F9). */
  def compositeKey(cols: Seq[String]): Column =
    text.dedup_key(cols.map(col): _*)

  /** D1/D2/D3/D7 generalized: keep exactly one row per key, the one
    * maximizing `order` (ties broken deterministically by `tieBreak`).
    * Implemented with `max_by(struct(allCols), struct(order, tieBreak))`
    * — single aggregation, map-side partial combine. */
  def keepBest(df: DataFrame, key: Column, order: Seq[Column]): DataFrame = {
    val valueStruct = struct(df.columns.toIndexedSeq.map(col): _*)
    val ordStruct = struct(order: _*)
    df.groupBy(key.as("__key"))
      .agg(max_by(valueStruct, ordStruct).as("__best"))
      .select("__best.*")
  }

  /** Window-based variant: keeps the first full row per key under the
    * given ordering (which may use asc/desc SortOrder). */
  def keepBestWindow(df: DataFrame, key: Column, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D4 — column-subset exact dedup (arbitrary keep). */
  def dropDuplicates(df: DataFrame, cols: Seq[String]): DataFrame =
    df.dropDuplicates(cols)

  /** D8 — duplicate statistics without removal: one aggregation over
    * the key, then a single-row rollup. */
  def duplicateStats(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val groups = df.groupBy(compositeKey(keyCols).as("dup_key")).agg(count(lit(1)).as("n"))
    groups.agg(
      sum(col("n")).as("total_records"),
      count(lit(1)).as("unique_records"),
      (sum(col("n")) - count(lit(1))).as("duplicate_records"),
      round((sum(col("n")) - count(lit(1))) / sum(col("n")), 6).as("duplicate_rate"),
      sum(when(col("n") > 1, lit(1)).otherwise(lit(0))).as("groups_with_duplicates"),
      max(col("n")).as("largest_group_size"))
  }

  /** D5 — MinHash-LSH fuzzy dedup (J2+J3), seeds pinned for
    * reproducibility (SURVEY §7.4 risk 4).
    *
    * Pipeline: tokenize → HashingTF(numFeatures) → MinHashLSH
    * (numHashTables) → approxSimilarityJoin(self) at `threshold`
    * Jaccard distance → canonical pair orientation (idA < idB) →
    * left_anti join removes the non-canonical member of each pair.
    * The LSH join shuffle-partitions on band hashes, so cost is
    * O(n·k) not O(n²) — the rewrite that took the reference from 48 h
    * to 12 min (ADR-003:165-189) is structural here.
    */
  def fuzzyDedup(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      threshold: Double = 0.2,
      numFeatures: Int = 1 << 14,
      numHashTables: Int = 5,
      shingleSize: Int = 1): DataFrame = {
    // Word shingles (n-grams of tokens) instead of bare tokens when
    // shingleSize > 1: documents that merely share vocabulary stop
    // colliding (their shingle sets are near-disjoint), which collapses
    // the LSH candidate-pair count — the difference between O(n·k) and
    // an accidental O(n²) when the corpus has a small vocabulary.
    // Bare tokens (shingleSize=1) match the reference's SparkDedup
    // featurization for short sentence pairs.
    val tokens = spreadWide(df).select(col(idCol), shingles(textCol, shingleSize).as("__tokens"))
      .filter(size(col("__tokens")) > 0)
    val tf = new HashingTF()
      .setInputCol("__tokens").setOutputCol("__features")
      .setNumFeatures(numFeatures)
    fuzzyDedupFromFeatured(df, idCol, tf.transform(tokens), threshold, numHashTables)
  }

  /** [[fuzzyDedup]] over an ALREADY-featurized frame (a `__features`
    * column in [[fuzzyDedup]]'s HashingTF shape): the shingle+hash
    * featurization is the operator's expensive narrow map, so a caller
    * that computed it — e.g. to export model state — should not pay it
    * twice. Same fit/join/anti-join pipeline and cache discipline:
    * the featurized frame is scanned three times (LSH fit + both sides
    * of the self-join) — the same reuse the reference caches
    * (SparkDedup.scala:43). The dup-id set (small: ids only) is
    * eagerly local-checkpointed while the cache is hot, which cuts the
    * lineage so the cache can be released before returning the
    * still-lazy anti-join. */
  def fuzzyDedupFromFeatured(
      df: DataFrame, idCol: String, featuredDf: DataFrame,
      threshold: Double = 0.2, numHashTables: Int = 5): DataFrame = {
    val featured = featuredDf.cache()
    try {
      val lsh = new MinHashLSH()
        .setInputCol("__features").setOutputCol("__hashes")
        .setNumHashTables(numHashTables)
        .setSeed(42L)
      val model = lsh.fit(featured)
      val pairs = model
        .approxSimilarityJoin(featured, featured, threshold, "jaccard_distance")
        .select(
          col(s"datasetA.$idCol").as("id_a"),
          col(s"datasetB.$idCol").as("id_b"))
        .filter(col("id_a") < col("id_b"))
      val dupIds = pairs.select(col("id_b").as(idCol)).distinct()
        .localCheckpoint(true)
      df.join(dupIds, Seq(idCol), "left_anti")
    } finally featured.unpersist(blocking = false)
  }

  /** SimHash near-duplicate signature (64-bit) from a token array —
    * native Catalyst expression with codegen (graft.functions.SimHash64);
    * documents whose signatures agree are near-dup candidates. */
  def simhash(tokens: Column): Column =
    graft.functions.text.expr2col(
      graft.functions.SimHash64(graft.functions.text.col2expr(tokens)))

  /** Word shingles of size n ("a b c d",2 → ["a b","b c","c d"]);
    * shorter texts collapse to a single whole-text shingle. */
  def shingles(textCol: Column, n: Int): Column = {
    val words = split(textCol, "\\s+")
    if (n <= 1) words
    else when(size(words) <= n, array(array_join(words, " ")))
      .otherwise(transform(
        sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + lit(1), lit(n)), " ")))
  }

  private def minhashSig(tokens: Column, numPerm: Int): Column =
    graft.functions.text.expr2col(
      graft.functions.MinHashSig(graft.functions.text.col2expr(tokens), numPerm))

  private[graft] def minhashSigForTest(tokens: Column, numPerm: Int = 256): Column =
    minhashSig(tokens, numPerm)

  /** Banded MinHash LSH dedup — the classic shingle → minhash → band →
    * bucket-join pipeline, built directly on DataFrame ops with the
    * native [[graft.functions.MinHashSig]] expression.
    *
    * vs [[fuzzyDedup]] (spark.ml MinHashLSH): ml's LSH has only
    * OR-amplification (each hash table = ONE MinHash function), so
    * moderately-similar pairs collide constantly and the join
    * explodes. Banding r rows per band gives AND-amplification —
    * P(candidate) = 1-(1-J^r)^b — which suppresses sub-threshold pairs
    * exponentially. Candidate verification is the exact signature
    * agreement fraction; removal is a left_anti join (never a driver
    * collect).
    *
    * Scale shape: one narrow map per row (signature), one explode ×
    * bands (b small rows), one hash-partitioned self-join on
    * (band, bucket), one window-free verify on candidate pairs.
    * Skewed buckets (boilerplate shingles) are AQE-splittable.
    */
  /** Candidate (id_a, id_b) pairs whose estimated Jaccard (signature
    * agreement fraction) meets `threshold` — the enumeration behind
    * [[minhashDedup]], exposed so skew bounds are spec-testable.
    *
    * Skew hardening: a bucket of near-identical boilerplate (the same
    * members colliding in EVERY band) makes the self-join O(B²) per
    * band. Buckets larger than `maxBucketSize` switch to a star
    * pattern — every member is verified against the bucket's min-id
    * member only (B−1 pairs instead of B²). On the pathological case
    * that creates oversized buckets (a near-clique), the star reaches
    * the same removable set, because every member verifies against the
    * min; a member of an oversized MIXED bucket that only matches some
    * non-min member can be missed there, but it still collides with it
    * in the other bands' (smaller) buckets. Cost is bounded at
    * `bands × max(maxBucketSize, B−1)` per bucket either way. */
  /** Candidate enumeration from an already-signed frame `(id, __sig)`.
    * The bucket-size stats aggregation carries ONLY counts (signature
    * arrays never enter its shuffle); min-id signatures are aggregated
    * over oversized-bucket members alone, which the cap makes rare by
    * construction. */
  private def candidatesFromSig(
      withSig: DataFrame, idCol: String,
      threshold: Double, numPerm: Int, bands: Int,
      maxBucketSize: Int): DataFrame = {
    val r = numPerm / bands
    // ids-only banded rows: the (band, bucket) exchange — the widest
    // in the operator — carries ~28-byte rows, never the numPerm-long
    // signature. The earlier sig-carrying formulation shuffled and
    // SMJ-sorted ~1 KB rows (measured 5 GB vs 130 MB on a 150k-doc
    // rehearsal; that exchange dominated the whole operator).
    val banded = withSig.select(col(idCol),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("__sig"), b * r + 1, lit(r))).as("bucket")))).as("__b"))
      .select(col(idCol), col("__b.band"), col("__b.bucket"))
    val sizes = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
    val tagged = banded.join(sizes, Seq("band", "bucket"))
    // normal buckets: ids-only self-join of the literally-same frame,
    // so the two hash exchanges canonicalize identically and Spark
    // plans a ReusedExchange — the (band, bucket) shuffle is written
    // ONCE and read twice.
    val small = tagged.filter(col("__bsz") <= maxBucketSize)
      .select(col(idCol), col("band"), col("bucket"))
    val smallPairs = small.as("l").join(small.as("r"), Seq("band", "bucket"))
      .filter(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
    // oversized buckets: star pattern against the min-id member —
    // B−1 pairs instead of B².
    val big = tagged.filter(col("__bsz") > maxBucketSize)
    val bigStats = big.groupBy(col("band"), col("bucket"))
      .agg(min(col(idCol)).as("__bmin"))
    val bigPairs = big.join(bigStats, Seq("band", "bucket"))
      .filter(col(idCol) =!= col("__bmin"))
      .select(col("__bmin").as("id_a"), col(idCol).as("id_b"))
    // a pair colliding in k bands is distinct'd to ONE 16-byte row
    // BEFORE the verify; signatures re-attach to the few unique
    // candidates by id, and the (numPerm-position) native agreement
    // kernel runs once per pair instead of once per colliding band.
    def estJaccard(x: Column, y: Column): Column =
      text.expr2col(graft.functions.SigAgreeCount(
        text.col2expr(x), text.col2expr(y))).cast("double") / numPerm
    val sa = withSig.select(col(idCol).as("id_a"), col("__sig").as("__siga"))
    val sb = withSig.select(col(idCol).as("id_b"), col("__sig").as("__sigb"))
    smallPairs.union(bigPairs).distinct()
      .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .filter(estJaccard(col("__siga"), col("__sigb")) >= threshold)
      .select(col("id_a"), col("id_b"))
  }

  private def signed(df: DataFrame, idCol: String, textCol: Column,
      numPerm: Int, shingleSize: Int): DataFrame =
    spreadWide(df).select(col(idCol),
      minhashSig(shingles(text.norm_key(textCol), shingleSize), numPerm).as("__sig"))

  private[graft] def minhashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      threshold: Double,
      numPerm: Int,
      bands: Int,
      shingleSize: Int,
      maxBucketSize: Int): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    // the candidate plan reads the signed frame from three subplans
    // (banded rows + both re-attach sides) — the standalone entry
    // point leaves it lazy so plan-shape specs can inspect the full
    // tree; minhashDedup persists it around this call.
    candidatesFromSig(signed(df, idCol, textCol, numPerm, shingleSize),
      idCol, threshold, numPerm, bands, maxBucketSize)
  }

  def minhashDedup(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      threshold: Double = 0.8,
      numPerm: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3,
      maxBucketSize: Int = 1024): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    // signatures are the expensive narrow map (numPerm hashes per
    // shingle); the candidate plan references the signed frame from
    // several subplans (both self-join sides + the size stats), so
    // persist it for the duration of the dup-id computation — same
    // cache-then-localCheckpoint discipline as fuzzyDedup: the dup-id
    // set (ids only) is materialized eagerly, the cache released, and
    // the returned anti-join stays lazy.
    val withSig = signed(df, idCol, textCol, numPerm, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Materialize the cache EAGERLY: the candidate plan fans out into
      // ~8 independent map stages (band explode sides, bucket-size agg,
      // star-verify agg) that AQE submits concurrently — against a lazy
      // cache they all miss and each recomputes the full signature pass
      // (observable as "Block rdd_N already exists" warnings and an 8×
      // signature cost). One count() populates the cache first, so the
      // fan-out reads blocks.
      withSig.count()
      val dupIds = candidatesFromSig(withSig, idCol, threshold, numPerm, bands, maxBucketSize)
        .select(col("id_b").as(idCol)).distinct()
        .localCheckpoint(true)
      df.join(dupIds, Seq(idCol), "left_anti")
    } finally withSig.unpersist(blocking = false)
  }

  /** Persistable MinHash signature table `(idCol, __sig)` — compute
    * ONCE per corpus and store as parquet: incremental ingestion then
    * dedups a new batch against the corpus by reading signatures
    * (numPerm longs/doc), never re-reading corpus text. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: Column,
      numPerm: Int = 128, shingleSize: Int = 3): DataFrame =
    signed(df, idCol, textCol, numPerm, shingleSize)

  /** [[minhashDedup]] over an ALREADY-computed signature table
    * `(idCol, __sig)` (a [[minhashSignatures]] product, typically read
    * back from parquet): signatures are the operator's expensive
    * narrow map, so a caller that has them persisted — the recurring-
    * ingestion shape, or a query that just exported them — should not
    * pay the shingle+hash pass twice. Same candidate/verify/anti-join
    * pipeline and the same cache discipline; `sigDf` must cover
    * exactly `df`'s rows with `numPerm`-long signatures. */
  def minhashDedupFromSigs(
      df: DataFrame, idCol: String, sigDf: DataFrame,
      threshold: Double = 0.8,
      numPerm: Int = 128,
      bands: Int = 32,
      maxBucketSize: Int = 1024): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val withSig = sigDf
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      withSig.count() // eager: the candidate plan fans out (see minhashDedup)
      val dupIds = candidatesFromSig(withSig, idCol, threshold, numPerm, bands, maxBucketSize)
        .select(col("id_b").as(idCol)).distinct()
        .localCheckpoint(true)
      df.join(dupIds, Seq(idCol), "left_anti")
    } finally withSig.unpersist(blocking = false)
  }

  /** Incremental near-dup removal: drop every `incoming` row whose
    * estimated Jaccard against ANY row of the (typically precomputed,
    * [[minhashSignatures]]-persisted) corpus signature table meets
    * `threshold`. The growth path of a deduplicated corpus: the corpus
    * is never re-scanned, the bipartite banded bucket join touches
    * only hash-colliding (incoming, corpus) pairs, and removal is a
    * left_anti on incoming ids. Follow with [[minhashDedup]] on the
    * survivors to dedup the batch against itself, then append.
    *
    * Envelope: bucket sizes are corpus-driven; a corpus already
    * deduped at the same threshold cannot hold mega-buckets of mutual
    * near-dups, so the join stays hit-proportional (pre-dedup
    * templated corpora should pass through [[minhashDedup]] first). */
  def minhashDedupAgainst(
      incoming: DataFrame, idCol: String, textCol: Column,
      corpusSigned: DataFrame,
      threshold: Double = 0.8,
      numPerm: Int = 128,
      bands: Int = 32,
      shingleSize: Int = 3): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val r = numPerm / bands
    // ids-only banded rows — the band explode multiplies every row by
    // `bands`, so a signature riding it crosses the (band, bucket)
    // exchange `bands` TIMES over (the corpus side of this bipartite
    // join is the big one). Bucket-collide on ids, distinct the
    // candidate pairs, and re-attach each side's signature ONCE by id
    // for a single verify per pair — the corpus signature table is
    // then read twice (banding + re-attach) but its arrays never ride
    // a banded exchange. [[graft.operators.Incremental
    // .minhashDedupAgainstTable]] is the variant where pre-banded
    // sig-carrying state is the right trade (it arrives bucket-aligned
    // from disk with no exchange at all).
    def banded(sigDf: DataFrame, idC: String, side: String): DataFrame =
      sigDf.select(col(idC).as(s"__id$side"),
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("band"), xxhash64(slice(col("__sig"), b * r + 1, lit(r))).as("bucket")))).as("__b"))
        .select(col(s"__id$side"), col("__b.band"), col("__b.bucket"))
    def estJaccard(x: Column, y: Column): Column =
      text.expr2col(graft.functions.SigAgreeCount(
        text.col2expr(x), text.col2expr(y))).cast("double") / numPerm
    val corpusIdCol = corpusSigned.columns.head
    val incSigned = signed(incoming, idCol, textCol, numPerm, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      incSigned.count() // eager: referenced by the banding AND the re-attach
      val cand = banded(incSigned, idCol, "I")
        .join(banded(corpusSigned, corpusIdCol, "C"), Seq("band", "bucket"))
        .select(col("__idI"), col("__idC")).distinct()
      val dupIds = cand
        .join(incSigned.select(col(idCol).as("__idI"), col("__sig").as("__sigI")), Seq("__idI"))
        .join(corpusSigned.select(col(corpusIdCol).as("__idC"), col("__sig").as("__sigC")),
          Seq("__idC"))
        .filter(estJaccard(col("__sigI"), col("__sigC")) >= threshold)
        .select(col("__idI").as(idCol)).distinct()
        .localCheckpoint(true)
      incoming.join(dupIds, Seq(idCol), "left_anti")
    } finally incSigned.unpersist(blocking = false)
  }

  /** The 64-bit SimHash signature of a text column, exactly as the
    * SimHash operator family computes it (whitespace tokens of the
    * normalized key). Exposed so queries can EXPORT signatures for the
    * DuckDB oracle, which replays the SQL-expressible grouping /
    * Hamming semantics (xor + bit_count) over them. */
  def simhashSignature(textCol: Column): Column =
    simhash(split(text.norm_key(textCol), "\\s+"))

  /** Exact-dedup by SimHash band equality: groups rows whose simhash
    * agree on all 4 16-bit bands (cheap near-dup bucketing; a
    * candidate-verify pass can follow). */
  def simhashDedup(df: DataFrame, idCol: String, textCol: Column): DataFrame = {
    val sig = simhashSignature(textCol)
    keepBestWindow(spreadWide(df).withColumn("__sig", sig), col("__sig"), Seq(col(idCol).asc))
      .drop("__sig")
  }

  /** Candidate near-dup pairs within a TRUE Hamming-distance budget on
    * the 64-bit SimHash — [[simhashDedup]] only groups exact signature
    * equality, which misses the near-dups SimHash exists to find (a
    * one-word edit flips a few signature bits).
    *
    * Pigeonhole banding: split the 64 bits into `maxHamming + 1`
    * strided bands ([[graft.functions.Bits]] — bit entropy is uneven
    * in real signatures, so contiguous ranges skew); two signatures
    * within distance `maxHamming`
    * MUST agree exactly on at least one band (at most `maxHamming`
    * bands can contain a differing bit), so an equi-join per band finds
    * every qualifying pair — candidates are then verified with the
    * exact popcount `bit_count(a ^ b) <= maxHamming`. Unlike MinHash
    * banding this is a GUARANTEE, not a probability: output pairs are
    * exactly the pairs within the Hamming budget (of the token-set
    * signature — the semantic approximation lives in SimHash itself).
    *
    * Scale shape mirrors [[minhashCandidates]]: one narrow signature
    * map, explode × (k+1) bands of plain longs (no arrays cross any
    * exchange — the 8-byte signature rides along), hash self-join per
    * band, popcount verify at collision time. Near-identical
    * boilerplate floods a band bucket; buckets over `maxBucketSize`
    * degrade to star verification against the bucket's min-id member
    * (B−1 pairs instead of B², same cap rationale as the MinHash path:
    * a near-clique's members all verify against the min). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: Column,
      maxHamming: Int = 3, maxBucketSize: Int = 4096): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming must be in [0, 32)")
    val sigDf = spreadWide(df).select(col(idCol),
      simhashSignature(textCol).as("__sig"))
    // exact maxHamming+1 layout on BOTH sides (this self-join reuses
    // one banded frame, so the asymmetric multi-probe form doesn't
    // fit; at the default budget 3 the exact layout is already the
    // wide one) — native kernel, not a per-bit Column gather
    val banded = sigDf
      .select(col(idCol), col("__sig"),
        explode(graft.functions.Bits.hammingBandCol(col("__sig"),
          maxHamming, maxHamming + 1, probeSide = false)).as("__e"))
      .select(col(idCol), col("__sig"),
        graft.functions.Bits.unpackBand(col("__e")).as("band"),
        graft.functions.Bits.unpackBucket(col("__e")).as("bucket"))
    val sizes = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bsz"))
    val tagged = banded.join(sizes, Seq("band", "bucket"))
    def withinBudget(x: Column, y: Column): Column =
      bit_count(x.bitwiseXOR(y)) <= maxHamming
    val small = tagged.filter(col("__bsz") <= maxBucketSize)
      .select(col(idCol), col("__sig"), col("band"), col("bucket"))
    val smallPairs = small.as("l").join(small.as("r"), Seq("band", "bucket"))
      .filter(col(s"l.$idCol") < col(s"r.$idCol") &&
        withinBudget(col("l.__sig"), col("r.__sig")))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
    val big = tagged.filter(col("__bsz") > maxBucketSize)
    val bigStats = big.groupBy(col("band"), col("bucket")).agg(
      min(col(idCol)).as("__bmin"),
      min_by(col("__sig"), col(idCol)).as("__bminsig"))
    val bigPairs = big.join(bigStats, Seq("band", "bucket"))
      .filter(col(idCol) =!= col("__bmin") &&
        withinBudget(col("__sig"), col("__bminsig")))
      .select(col("__bmin").as("id_a"), col(idCol).as("id_b"))
    // the same pair collides in up to nBands bands → distinct
    smallPairs.union(bigPairs).distinct()
  }

  /** DISTINCT 64-bit signature VALUE pairs (__ham_sa, __ham_sb) within a true
    * Hamming budget across two frames — the enumerator behind
    * [[graft.plans.HammingJoinRewrite]], which joins the value pairs
    * back to each side's rows by signature equality (the
    * vecPairsByCosine shape). EXACT: pigeonhole banding over
    * `maxHamming + 1` bands guarantees every qualifying pair collides
    * in some band, and the popcount verify admits nothing else — no
    * star cap here, because the rewrite's contract is identical
    * output, not best-effort dedup. Null signatures never pair (the
    * theta-join predicate is null on them too). `strict` verifies
    * `< maxHamming` instead of `<=` while banding at the same width
    * (a strictly-smaller distance is also ≤). */
  /** Near-duplicate id pairs over ANY precomputed 64-bit signature
    * frame `(<idCol>, <sigCol>)`: every (id_a < id_b, dist) with
    * popcount(sig_a XOR sig_b) ≤ maxHamming — EXACT output (the
    * pigeonhole banding never misses a within-budget pair). Null
    * signatures never pair. Value-level banding + id re-attach, so
    * duplicate signature VALUES cost one bucket row each regardless
    * of multiplicity — a million byte-identical payloads are one
    * value row, not a 10¹²-pair bucket. The shared engine under the
    * image (aHash/dHash, [[Images.nearDupPairs]]) and audio
    * ([[Audio]] energy-contour hash) perceptual-dedup families.
    *
    * '''`shardCols` — the >10⁶-signature escape hatch.''' The batch
    * self-join's candidate mass is quadratic in DISTINCT signatures
    * per join (healthy to ~10⁶; SCALING.md's envelope). When a corpus
    * has an orthogonal partition no duplicate should cross anyway —
    * source site, ingest day, tenant — folding it into the band join
    * key bounds each n to the shard's size: pairs are only sought
    * WITHIN equal shard values (the semantic change is the point:
    * cross-shard pairs are declared out of scope, exactly like
    * [[graft.operators.Video.clipNearDupPairs]] scoping frame pairs
    * to equal positions). Value-level dedup becomes per (shard, sig);
    * ids re-attach by (shard, sig). NULL shard values form ONE group
    * (the groupBy convention, via null-safe struct equality) — a raw
    * equi-join would silently exempt null-shard rows from dedup. */
  def hammingNearDupPairs(sigs: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, shardCols: Seq[String] = Nil): DataFrame = {
    val sharded = shardCols.nonEmpty
    // the SAME struct construction hammingPairsValues packs its
    // `__shard` output with — identical types, so the re-attach joins
    // below key on it directly (null-safe by struct equality)
    def shardKey = struct(shardCols.map(col): _*).as("__shard")
    val ids = sigs
      .select((col(idCol) +: col(sigCol) +: shardCols.map(col)): _*)
      .filter(col(sigCol).isNotNull)
    val valPairs = hammingPairsValues(ids, col(sigCol), ids, col(sigCol),
      maxHamming, strict = false, shardCols)
    val attachKeysA = "__ham_sa" +: (if (sharded) Seq("__shard") else Nil)
    val attachKeysB = "__ham_sb" +: (if (sharded) Seq("__shard") else Nil)
    valPairs
      .join(ids.select((col(idCol).as("id_a") +:
        col(sigCol).as("__ham_sa") +:
        (if (sharded) Seq(shardKey) else Nil)): _*), attachKeysA)
      .join(ids.select((col(idCol).as("id_b") +:
        col(sigCol).as("__ham_sb") +:
        (if (sharded) Seq(shardKey) else Nil)): _*), attachKeysB)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ham_sa").bitwiseXOR(col("__ham_sb"))).as("dist"))
      .distinct()
  }

  /** Driver-side pigeonhole index over a BOUNDED 64-bit signature set
    * — a media BLOCKLIST (flagged imagery, licensed content,
    * takedown signatures: request-scale, thousands to low millions,
    * NOT corpus-scale; for corpus-scale recurring dedup use
    * [[Incremental.writeHammingState]]). Per band: bucket-sorted
    * (buckets, sigs) arrays, ~16(k+1) B per signature. Feed to
    * [[hammingNearSet]] / [[graft.streaming.StreamOps
    * .hammingBlockGateStream]]. */
  /** A driver-built pigeonhole blocklist index. Carries the
    * `maxHamming` it was banded with so a probe can never be issued
    * at a DIFFERENT band layout — a mismatch would silently produce
    * false negatives, the one failure a compliance gate must not
    * have. Construct only via [[hammingIndex]]. */
  final case class HammingIndex(maxHamming: Int,
      buckets: Array[Array[Long]], sigs: Array[Array[Long]])

  def hammingIndex(df: DataFrame, sigCol: String,
      maxHamming: Int, maxSignatures: Int = 4_000_000): HammingIndex = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming must be in [0, 32)")
    val vals = df.select(col(sigCol).cast("long"))
      .filter(col(sigCol).isNotNull).distinct()
      .collect().map(_.getLong(0))
    // the index is embedded in the codegen'd probe via addReferenceObj
    // — ~16·(maxHamming + 2) bytes per signature ride the PLAN into
    // every task binary. Request-scale inputs (blocklists) fit; a
    // corpus-scale input would OOM the driver or bloat tasks silently,
    // so refuse it loudly and name the corpus-scale path. The bound
    // is a PARAMETER (default 4M ≈ 0.5+ GB serialized): an operator
    // who accepts the task-binary weight for a bigger blocklist
    // raises it explicitly instead of being hard-walled.
    require(vals.length <= maxSignatures,
      s"hammingIndex: ${vals.length} distinct signatures exceeds the " +
        s"$maxSignatures driver-index bound (~16·(maxHamming+2) B each, " +
        "serialized with the plan into every task). Raise maxSignatures " +
        "to accept the weight knowingly; corpus-scale recurring dedup " +
        "is Incremental.writeHammingState + hammingDupIdsAgainstTable " +
        "(bucketed state, batch-sized probes).")
    if (vals.length > maxSignatures / 4)
      System.err.println(s"[graft] hammingIndex: ${vals.length} distinct " +
        s"signatures — approaching the $maxSignatures driver-index " +
        "bound; consider Incremental.writeHammingState for corpus-scale " +
        "sets")
    val nBands = maxHamming + 1
    val buckets = Array.ofDim[Array[Long]](nBands)
    val sigs = Array.ofDim[Array[Long]](nBands)
    var b = 0
    while (b < nBands) {
      val pairs = vals
        .map(v => (graft.functions.Bits.bandOf(v, b, maxHamming), v)).sortBy(_._1)
      buckets(b) = pairs.map(_._1)
      sigs(b) = pairs.map(_._2)
      b += 1
    }
    HammingIndex(maxHamming, buckets, sigs)
  }

  /** Boolean Column: is `sig` within the index's `maxHamming` bits of
    * any indexed signature? EXACT (pigeonhole — no false negatives,
    * and every candidate is popcount-verified, unlike the Bloom
    * gates), pure map-side codegen, streaming-legal in any output
    * mode. The Hamming budget comes from the index itself — the band
    * layout is fixed at build time. */
  def hammingNearSet(sig: Column, index: HammingIndex): Column =
    graft.functions.text.expr2col(graft.functions.HammingNearSet(
      graft.functions.text.col2expr(sig.cast("long")),
      index.maxHamming, index.buckets, index.sigs))

  /** Value-level banded Hamming join. Band layout comes from
    * [[graft.functions.Bits.joinBands]]: the exact `maxHamming + 1`
    * layout at small budgets; at `maxHamming ≥ 6` (where exact-layout
    * buckets collapse to ≤ 9 bits and the bucket join's candidate
    * mass goes n²·k/2⁹ — the measured 16×-wall-at-10×-docs shape) the
    * 1-error multi-probe layout: LEFT banded exactly, RIGHT emitting
    * each band bucket plus its single-bit flips. Both are EXACT — a
    * within-budget pair shares an exact band, or (probe layout, by
    * `probeBands`'s pigeonhole) a band with ≤ 1 differing bit that
    * one flip reaches. */
  private[graft] def hammingPairsValues(
      ldf: DataFrame, lsig: Column,
      rdf: DataFrame, rsig: Column,
      maxHamming: Int, strict: Boolean = false,
      shardCols: Seq[String] = Nil): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32, "maxHamming must be in [0, 32)")
    val nBands = graft.functions.Bits.joinBands(maxHamming)
    val sharded = shardCols.nonEmpty
    // shard values are packed into ONE non-null struct key: Spark
    // struct equality compares fields with null-safe semantics, so a
    // NULL shard value forms a real group (the groupBy convention)
    // instead of silently exempting its rows from dedup the way a
    // raw equi-join on a nullable column would — silent under-dedup
    // is the one failure a dedup knob must not have. Output carries
    // `__shard` when sharded (callers re-attach ids by it).
    def banded(df: DataFrame, sig: Column, out: String,
        probe: Boolean): DataFrame = {
      // value-level dedup per (shard, sig): a signature re-occurring
      // across shards is one value row PER SHARD — the shard is part
      // of the value's identity once it joins the band key
      val keyed =
        if (sharded)
          spreadWide(df).select(struct(shardCols.map(col): _*).as("__shard"),
            sig.cast("long").as(out))
        else spreadWide(df).select(sig.cast("long").as(out))
      val keys = if (sharded) Seq(col("__shard")) else Nil
      val base = keyed.filter(col(out).isNotNull).distinct()
      base.select((keys :+ col(out) :+
          explode(graft.functions.Bits.hammingBandCol(
            col(out), maxHamming, nBands, probe)).as("__e")): _*)
        .select((keys :+ col(out) :+
          graft.functions.Bits.unpackBand(col("__e")).as("band") :+
          graft.functions.Bits.unpackBucket(col("__e")).as("bucket")): _*)
    }
    val verify =
      if (strict) bit_count(col("__ham_sa").bitwiseXOR(col("__ham_sb"))) < maxHamming
      else bit_count(col("__ham_sa").bitwiseXOR(col("__ham_sb"))) <= maxHamming
    val joinKeys = (if (sharded) Seq("__shard") else Nil) ++ Seq("band", "bucket")
    val outCols = (if (sharded) Seq(col("__shard")) else Nil) :+
      col("__ham_sa") :+ col("__ham_sb")
    banded(ldf, lsig, "__ham_sa", probe = false)
      .join(banded(rdf, rsig, "__ham_sb", probe = true), joinKeys)
      .filter(verify)
      .select(outCols: _*)
      .distinct()
  }

  /** Hamming-budget SimHash dedup: drop the higher-id side of every
    * [[simhashPairs]] pair (cluster-wide resolution: feed the pairs to
    * [[DupClusters.clusterDedup]] instead). Removal is a left_anti on
    * ids — never a driver-side set. */
  def simhashNearDedup(df: DataFrame, idCol: String, textCol: Column,
      maxHamming: Int = 3, maxBucketSize: Int = 4096): DataFrame = {
    val dupIds = simhashPairs(df, idCol, textCol, maxHamming, maxBucketSize)
      .select(col("id_b").as(idCol)).distinct()
      .localCheckpoint(true)
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** WITHIN-document line dedup — the scraped-page cleanup pass
    * [[dedupLines]] deliberately does not do: each document keeps only
    * the FIRST occurrence of every line it contains (repeated nav
    * blocks, duplicated paragraphs from templating bugs), in original
    * order; other documents never influence the decision. Entirely
    * per-document: one posexplode, one (doc, line) first-position
    * aggregation, one ordered reassembly — no cross-document state at
    * all, so the operator is embarrassingly parallel at any scale.
    * SQL-expressible end to end (q113 hash-gates it). */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val rebuilt = lines
      .groupBy(col(idCol), col("__line"))
      .agg(min(col("__pos")).as("__pos"))
      .groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as("__text"))
    df.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__text")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Cross-document LINE dedup — the CCNet/RefinedWeb boilerplate
    * pass: a line occurring in `minDocs`+ DISTINCT documents (nav
    * menus, cookie banners, licence footers) is removed from EVERY
    * document; in-document repetition alone never triggers removal.
    * Documents keep their surviving lines in original order (empty
    * string when nothing survives); all non-text columns pass through.
    *
    * Scale shape: one posexplode, one (line → distinct-doc count)
    * aggregation — partial aggregation compresses the heavy boilerplate
    * keys map-side — one left_anti on the line, one per-doc
    * reassembly aggregation. Nothing driver-side. At 100 TB set
    * `keyByDigest = true`: the count and anti-join shuffle a 128-bit
    * line digest (two independent xxhash64 seeds) instead of raw line
    * strings — same plan, ~16-byte keys instead of whole lines, at
    * the CCNet-standard cost of treating digest-colliding lines as
    * equal (2⁻¹²⁸-scale). The raw-string default keeps the operator
    * exactly SQL-expressible for the oracle. */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, sep: String = "\n",
      keyByDigest: Boolean = false): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would remove every line")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val key: Column => Column =
      if (keyByDigest) c => struct(xxhash64(c), xxhash64(c, lit(0x9e3779b9L)))
      else c => c
    val boilerplate = lines.groupBy(key(col("__line")).as("__k"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select("__k")
    val rebuilt = lines.withColumn("__k", key(col("__line")))
      .join(boilerplate, Seq("__k"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as("__text"))
    df.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__text")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Cross-document duplicated-SPAN profile — the scalable stand-in
    * for exact-substring dedup (the suffix-array pass of
    * "Deduplicating Training Data Makes Language Models Better"):
    * every `spanWords`-word window of each document (word-boundary
    * anchored, so a shared run matches at ANY byte offset —
    * fixed-stride char windows only match offset-aligned copies) is
    * counted across distinct documents, and each doc reports how much
    * of it consists of spans that also appear in `minDocs`+ documents.
    * Long verbatim overlaps (mirrored articles, quoted boilerplate,
    * near-dup clusters) surface as a high `dup_span_frac` even when
    * full-document fuzzy dedup misses them; pipe high scorers into
    * [[minhashDedup]]/[[jaccardPairs]] for removal decisions.
    *
    * Output per doc with ≥ `spanWords` words: `n_spans`, `dup_spans`
    * (with multiplicity), `dup_span_frac` (integer-ratio,
    * hash-oracle-safe). Shorter docs have no spans and no row.
    *
    * Scale shape mirrors [[dedupLines]]: one explode (≈word-count
    * rows per doc, generated by the native [[wordNGrams]] kernel), one
    * (span → distinct-doc count) aggregation, one flag join, one
    * per-doc rollup. `keyByDigest = true` shuffles 128-bit span
    * digests instead of raw span strings — the 100 TB form. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: Column,
      spanWords: Int = 8, minDocs: Int = 2,
      keyByDigest: Boolean = false): DataFrame = {
    require(spanWords >= 1, "spanWords must be >= 1")
    require(minDocs >= 2, "minDocs < 2 would flag every span")
    val spans = spreadWide(df.select(col(idCol), textCol.as("__t")))
      .select(col(idCol), explode(wordNGrams(col("__t"), spanWords)).as("__span"))
    val key: Column => Column =
      if (keyByDigest) c => struct(xxhash64(c), xxhash64(c, lit(0x9e3779b9L)))
      else c => c
    val dup = spans.groupBy(key(col("__span")).as("__k"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__k"), lit(1L).as("__dup"))
    spans.withColumn("__k", key(col("__span")))
      .join(dup, Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(coalesce(col("__dup"), lit(0L))).as("dup_spans"))
      .withColumn("dup_span_frac",
        round(col("dup_spans").cast("double") / col("n_spans"), 6))
  }

  /** VERBATIM-overlap benchmark contamination profile — flag corpus
    * documents sharing any `nWords`-word gram with an evaluation set
    * (the GPT-3/Pile rule: a training doc containing a verbatim eval
    * n-gram leaks the benchmark into training; 13 grams is the
    * published default, tunable down for short eval items). The fuzzy
    * whole-document sibling is [[decontaminate]] (n-gram Jaccard ≥ t
    * against any eval doc); this one catches the QUOTED-span leak a
    * document-level similarity misses — an eval question pasted into
    * an otherwise-unrelated page. Output: every corpus row plus
    * `n_grams` (spans in the doc), `hit_grams` (spans, WITH
    * multiplicity, that also appear anywhere in the eval set) and
    * `contaminated` (hit_grams > 0). Docs shorter than `nWords` words
    * have zero grams and are clean by definition. Filter
    * `!contaminated` for the training cut; keep the flag for audits.
    *
    * Scale shape: the eval set is benchmark-sized while the corpus is
    * the 100 TB side — eval grams are distinct'd to a small set and
    * BROADCAST, so the corpus gram stream semi-joins map-side and the
    * big side never shuffles on gram. `broadcastEval = false` falls
    * back to a hash join for an oversized eval union; `keyByDigest`
    * joins on 128-bit gram digests instead of raw strings (the wire
    * format at scale — grams are ~nWords·6 bytes each). */
  def contaminationProfile(corpus: DataFrame, idCol: String, textCol: Column,
      evalSet: DataFrame, evalTextCol: Column, nWords: Int = 13,
      broadcastEval: Boolean = true, keyByDigest: Boolean = false): DataFrame = {
    require(nWords >= 1, "nWords must be >= 1")
    val key: Column => Column =
      if (keyByDigest) c => struct(xxhash64(c), xxhash64(c, lit(0x9e3779b9L)))
      else c => c
    val evalGrams0 = evalSet
      .select(explode(wordNGrams(evalTextCol, nWords)).as("__g"))
      .select(key(col("__g")).as("__k")).distinct()
    val evalGrams = (if (broadcastEval) broadcast(evalGrams0) else evalGrams0)
      .withColumn("__hit", lit(1L))
    val grams = spreadWide(corpus.select(col(idCol), textCol.as("__t")))
      .select(col(idCol), explode_outer(wordNGrams(col("__t"), nWords)).as("__g"))
    val profile = grams
      .withColumn("__k", key(col("__g")))
      .join(evalGrams, Seq("__k"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__g")).as("n_grams"),
        sum(when(col("__g").isNotNull, coalesce(col("__hit"), lit(0L)))
          .otherwise(lit(0L))).as("hit_grams"))
    corpus.join(profile, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("hit_grams", coalesce(col("hit_grams"), lit(0L)))
      .withColumn("contaminated", col("hit_grams") > 0L)
  }

  /** [[contaminationProfile]] for an eval set too large to broadcast
    * as a distinct gram table or collect as a digest array: eval gram
    * digests are folded into a Bloom filter (~3.6 BYTES per gram at
    * fpp=1e-6 vs 8 for a raw digest) and the whole corpus-side
    * profile becomes ONE map — no explode past the gram kernel, no
    * join, no shuffle at all; `n_grams`/`hit_grams` come from `size`
    * and the [[graft.functions.CountInBloom]] membership kernel over
    * the per-document digest array. Same output columns as
    * [[contaminationProfile]]; the one-sided Bloom error means
    * `hit_grams` can only OVER-count (at ~`fpp` per clean gram), so
    * filtering `!contaminated` still removes every true leak —
    * over-removal is the fpp envelope, leakage is impossible.
    *
    * Building the filter makes two passes over the (distinct'd) eval
    * gram digests — a count to size it, then the `stat.bloomFilter`
    * aggregation. Both are aggregations of the eval side only; the
    * 100 TB corpus side is untouched until the final map. */
  def contaminationProfileBloom(corpus: DataFrame, idCol: String, textCol: Column,
      evalSet: DataFrame, evalTextCol: Column, nWords: Int = 13,
      fpp: Double = 1e-6): DataFrame = {
    require(nWords >= 1, "nWords must be >= 1")
    require(fpp > 0 && fpp < 1, "fpp must be in (0, 1)")
    val bloom = evalGramBloom(evalSet, evalTextCol, nWords, fpp)
    val digests = transform(wordNGrams(textCol, nWords), g => xxhash64(g))
    val hits = text.expr2col(graft.functions.CountInBloom(
      text.col2expr(digests), bloom))
    corpus
      .withColumn("n_grams", size(digests).cast("long"))
      .withColumn("hit_grams", hits.cast("long"))
      .withColumn("contaminated", col("hit_grams") > 0L)
  }

  /** Bloom filter over an eval set's distinct word-n-gram xxhash64
    * digests — the shareable artifact behind
    * [[contaminationProfileBloom]] and
    * [[graft.streaming.StreamOps.decontaminateStreamBloom]]: build
    * once per eval set, reuse across batch jobs and streams. */
  def evalGramBloom(evalSet: DataFrame, evalTextCol: Column, nWords: Int,
      fpp: Double = 1e-6): org.apache.spark.util.sketch.BloomFilter = {
    val k = evalSet
      .select(explode(wordNGrams(evalTextCol, nWords)).as("__g"))
      .select(xxhash64(col("__g")).as("__k")).distinct()
    k.stat.bloomFilter("__k", math.max(k.count(), 1L), fpp)
  }

  /** Exact-substring span REMOVAL — the rewrite step of
    * "Deduplicating Training Data Makes Language Models Better"
    * (ExactSubstr): [[duplicateSpans]] FLAGS cross-document verbatim
    * runs; this operator REWRITES each document with every word
    * covered by a duplicated span cut out, keeping the unique
    * remainder. Word-boundary semantics match [[duplicateSpans]]
    * (lower/trim/whitespace-split), so the rewritten text is the
    * NORMALIZED word stream minus covered words — the standard
    * normalize-then-rewrite shape for training corpora (original
    * casing/spacing is not preserved). Docs shorter than `spanWords`
    * have no spans and survive as their normalized selves; a fully
    * duplicated doc becomes the empty string (row survives).
    *
    * Scale shape: two posexplodes of the native [[wordNGrams]] kernel
    * (its output is ordered, so the ARRAY INDEX is the span's word
    * position — no HOF slice chain, one static-call codegen site),
    * one (span → distinct-doc count) aggregation, a flag join, a
    * bounded `sequence` explode (spanWords rows per FLAGGED span
    * only), a positional anti-join, and one ordered reassembly
    * aggregation — every join keyed by (id, pos) or the span. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanWords >= 1, "spanWords must be >= 1")
    require(minDocs >= 2, "minDocs < 2 would cut every span")
    val base = spreadWide(df.select(col(idCol), col(textCol).as("__t")))
    val words = base
      .select(col(idCol), posexplode(wordNGrams(col("__t"), 1)).as(Seq("__pos", "__w")))
    val spans = base
      .select(col(idCol), posexplode(wordNGrams(col("__t"), spanWords)).as(Seq("__p", "__s")))
    val dup = spans.groupBy(col("__s"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__s"))
    val covered = spans.join(dup, Seq("__s"))
      .select(col(idCol), explode(sequence(col("__p"), col("__p") + (spanWords - 1)))
        .as("__pos"))
      .distinct()
    val rebuilt = words.join(covered, Seq(idCol, "__pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("__pos"), col("__w")))),
          s => s.getField("__w"))).as("__text"))
    df.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__text")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** ExactSubstr span removal that preserves the ORIGINAL text outside
    * cut spans — the byte-faithful sibling of [[removeDuplicateSpans]]
    * (which emits the normalized word stream minus covered words).
    * Span MATCHING is identical (lower/trim/whitespace-split word
    * grams, so duplicated runs match case-insensitively at any
    * offset); the REWRITE maps each maximal covered word run back to a
    * character range of the original string via the native
    * [[graft.functions.WordCharSpans]] offsets — word k of the
    * normalized stream is word k of the original by construction — and
    * cuts exactly `[start(first word), end(last word))`. Original
    * casing, inter-word whitespace outside cuts, and edge whitespace
    * all survive; whitespace INTERIOR to a cut run goes with it, and
    * the separators flanking a cut both remain (the ExactSubstr
    * contract: bytes outside the span are untouched). Docs with no
    * covered span pass through bit-identical (null text stays null); a
    * fully-covered doc keeps only its edge whitespace.
    *
    * Scale shape: [[removeDuplicateSpans]]'s explode/agg/flag-join
    * stages, plus one gaps-and-islands window keyed by the doc id
    * (covered runs), two (id, word-pos) equi-joins mapping run ends to
    * char offsets, and one per-doc fold over the (few) cut ranges —
    * nothing new shuffles more than ids and positions. */
  def removeDuplicateSpansRaw(df: DataFrame, idCol: String, textCol: String,
      spanWords: Int = 8, minDocs: Int = 2): DataFrame = {
    require(spanWords >= 1, "spanWords must be >= 1")
    require(minDocs >= 2, "minDocs < 2 would cut every span")
    val base = spreadWide(df.select(col(idCol), col(textCol).as("__t")))
    val spans = base
      .select(col(idCol), posexplode(wordNGrams(col("__t"), spanWords)).as(Seq("__p", "__s")))
    val dup = spans.groupBy(col("__s"))
      .agg(count_distinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("__s"))
    val covered = spans.join(dup, Seq("__s"))
      .select(col(idCol), explode(sequence(col("__p"), col("__p") + (spanWords - 1)))
        .as("__pos"))
      .distinct()
    // maximal covered runs: classic gaps-and-islands on word positions
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val runs = covered
      .withColumn("__grp", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__pos")).as("__w0"), max(col("__pos")).as("__w1"))
    // original-text char offsets per word (packed (start << 32) | end)
    val offs = base
      .select(col(idCol), posexplode(text.expr2col(
        graft.functions.WordCharSpans(text.col2expr(col("__t"))))).as(Seq("__pos", "__se")))
    val cuts = runs
      .join(offs.select(col(idCol), col("__pos").as("__w0"),
        shiftright(col("__se"), 32).cast("int").as("__cs")), Seq(idCol, "__w0"))
      .join(offs.select(col(idCol), col("__pos").as("__w1"),
        col("__se").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("__ce")), Seq(idCol, "__w1"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__cs"), col("__ce")))).as("__cuts"))
    // rebuild: fold over the sorted cut ranges keeping the text between
    // them — a per-doc HOF over a handful of cut structs, not a hot loop
    val rebuilt = base.join(cuts, Seq(idCol), "left")
      .withColumn("__new", when(col("__cuts").isNull, col("__t")).otherwise(
        aggregate(col("__cuts"),
          struct(lit(0).as("p"), lit("").as("acc")),
          (st, c) => struct(
            c.getField("__ce").as("p"),
            concat(st.getField("acc"),
              col("__t").substr(st.getField("p") + 1,
                c.getField("__cs") - st.getField("p"))).as("acc")),
          st => concat(st.getField("acc"),
            col("__t").substr(st.getField("p") + 1, length(col("__t")))))))
      .select(col(idCol), col("__new"))
    df.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, col("__new"))
      .drop("__new")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Collapse CONSECUTIVE duplicate lines within each document (the
    * in-doc half of the RefinedWeb line rules; [[dedupLines]] is the
    * cross-doc half): `a\na\nb\na` → `a\nb\na` — only adjacent repeats
    * collapse, later reappearances stay. Non-text columns pass through.
    *
    * Scale shape: one posexplode, one per-document window (shuffle
    * keyed by the doc id — perfectly spread), one reassembly
    * aggregation. */
  def collapseRepeatedLines(df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("__pos", "__line")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__pos"))
    val rebuilt = lines
      .withColumn("__prev", lag(col("__line"), 1).over(w))
      .filter(col("__prev").isNull || col("__line") =!= col("__prev"))
      .groupBy(col(idCol))
      .agg(concat_ws(sep,
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          s => s.getField("__line"))).as("__text"))
    df.drop(textCol).join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__text")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }

  /** Distinct character n-grams via the native
    * [[graft.functions.CharNGrams]] expression (sorted ascending;
    * single static-call codegen site). Prefer this in any hot path. */
  def charNGrams(c: Column, n: Int = 3): Column =
    text.expr2col(graft.functions.CharNGrams(text.col2expr(c), n))

  /** Ordered, multiplicity-preserving word n-grams of
    * `lower(trim(c))` split on whitespace — the native
    * [[graft.functions.WordNGrams]] kernel (one static-call codegen
    * site; the HOF formulation interprets 3 lambda dispatches and a
    * slice allocation per gram — PropertySpec cross-validates). */
  def wordNGrams(c: Column, n: Int = 2): Column =
    text.expr2col(graft.functions.WordNGrams(text.col2expr(c), n))

  /** Distinct character n-gram set of a string column — the
    * Column/HOF reference formulation (PropertySpec cross-validates
    * [[charNGrams]] against it). Higher-order functions are
    * interpreted (not codegen'd) in Spark, so gram sets should be
    * computed ONCE per document and joined — never inside a pair
    * predicate where they'd be re-evaluated O(n²) times. */
  def ngrams(c: Column, n: Int = 3): Column =
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(c) - n, lit(0))),
          i => c.substr(i + lit(1), lit(n))),
        g => length(g) === n))

  /** Jaccard similarity from two precomputed gram-SET columns
    * (distinct elements). Implemented with the codegen'd two-pointer
    * merge kernel [[graft.functions.SortedIntersectSize]] over
    * `sort_array`-ed inputs plus |A∪B| = |A|+|B|−|A∩B| — bit-identical
    * to `size(array_intersect)/size(array_union)` on distinct-element
    * arrays, without the two per-row hash-set builds. */
  def jaccardOfSets(ga: Column, gb: Column): Column = {
    val inter = text.expr2col(graft.functions.SortedIntersectSize(
      text.col2expr(sort_array(ga)), text.col2expr(sort_array(gb)))).cast("double")
    val uni = size(ga) + size(gb) - inter
    when(uni === 0, lit(1.0)).otherwise(inter / uni)
  }

  /** Character n-gram Jaccard similarity between two strings (for
    * one-off candidate verification; for pair enumeration precompute
    * [[ngrams]] per side and use [[jaccardOfSets]]). */
  def ngramJaccard(a: Column, b: Column, n: Int = 3): Column =
    jaccardOfSets(ngrams(a, n), ngrams(b, n))

  /** Exact all-pairs character-n-gram Jaccard join — every pair of
    * documents with J ≥ `t`, WITHOUT the O(n²) theta-join, and with
    * output identical to the brute-force cross join on any input (no
    * probabilistic recall — safe behind a hash-checking oracle).
    *
    * COUNT-BASED formulation (the "tokenize–join–aggregate" exact
    * set-similarity join): explode each doc's distinct gram set once,
    * self-join on the gram, and COUNT rows per (id_a, id_b) — that
    * count IS |A∩B| exactly, so J = |∩| / (|A|+|B|−|∩|) needs no gram
    * array anywhere past the explode. Pairs sharing zero grams are
    * never enumerated and have J = 0 < t (the {""} sentinel makes
    * empty-set pairs share a token, preserving J(∅,∅)=1).
    *
    * Scale shape:
    *  - gram sets come from the native [[graft.functions.CharNGrams]]
    *    expression (one static-call codegen site — the equivalent
    *    HOF-chain expression tree generates multi-KB Janino methods
    *    that overflow HotSpot's JIT limits);
    *  - the token join carries (id, size, gram) rows only — ~20 bytes;
    *    no array ever crosses an exchange, no plan-dependent broadcast
    *    of array tables, nothing for AQE to flip between runs;
    *  - a size filter (J ≥ t ⟹ t·max(|A|,|B|) ≤ min(|A|,|B|)) drops
    *    pairs INSIDE the join stage, before the aggregation;
    *  - the pair count aggregates map-side (partial agg) in the same
    *    stage as the join — the token-match fan-out collapses before
    *    its exchange; what shuffles is one row per surviving pair.
    * Cost is Σ_gram df² join rows. Stop-grams make that quadratic on
    * heavy-tailed corpora — there, bound the fan-out upstream (drop
    * boilerplate with [[minhashDedup]], or raise `n`: an 8-gram's df
    * is a fraction of a 3-gram's). The earlier prefix-filter variant
    * (AllPairs/PPJoin) bounded candidates by rarest-token prefixes but
    * needed the gram ARRAYS at verify time — the array-carrying join
    * was 10× the cost of the extra count rows at every tested scale.
    *
    * Reference analog: near-dup detection over the corpus
    * (/root/reference/pipeline/processing/deduplication.py:19-31) —
    * re-expressed as an exact relational algorithm instead of a cap. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: Column,
      t: Double, n: Int = 3): DataFrame = {
    require(t > 0 && t <= 1, "threshold must be in (0, 1]")
    // The token join is a broadcast join when one side fits, so NO
    // exchange precedes it — the explode→join→partial-agg pipeline
    // (the Σdf² fan-out, the expensive part of the whole operator)
    // inherits the SCAN's partitioning. A source with fewer splits
    // than cores (one unsplittable file, a gzip'd dump) would run it
    // near-sequentially; spread it first. Well-partitioned at-scale
    // inputs skip the extra shuffle entirely.
    val tok = tokens(spreadWide(df), idCol, textCol, n)
    countedPairs(
      tok.select(col("__id").as("id_a"), col("__sz").as("__sza"), col("__gram")),
      tok.select(col("__id").as("id_b"), col("__sz").as("__szb"), col("__gram")),
      t, antiReflexive = true)
  }

  /** Exact BIPARTITE n-gram Jaccard join: every (left, right) pair
    * across two corpora with J ≥ `t` — the same count-based exact
    * algorithm as [[jaccardPairs]] with the self-join specialization
    * removed. This is the decontamination primitive: `left` = eval
    * set, `right` = training corpus, a returned pair is a leak.
    *
    * UNGUARDED oracle companion, like [[jaccardPairs]]: cost is
    * Σ_gram dfL·dfR joined rows, which goes quadratic when BOTH sides
    * scale (the round-4 rehearsal measured 20.6× growth at 10× with a
    * corpus-proportional eval side). Defaults never hit that shape —
    * [[decontaminate]] and the leak-report queries route through
    * [[jaccardJoinAuto]], whose probe measures Σ dfL·dfR first. */
  def jaccardJoin(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column,
      t: Double, n: Int = 3): DataFrame = {
    require(t > 0 && t <= 1, "threshold must be in (0, 1]")
    val ta = tokens(spreadWide(left), leftId, leftText, n)
      .select(col("__id").as("id_a"), col("__sz").as("__sza"), col("__gram"))
    val tb = tokens(spreadWide(right), rightId, rightText, n)
      .select(col("__id").as("id_b"), col("__sz").as("__szb"), col("__gram"))
    countedPairs(ta, tb, t, antiReflexive = false)
  }

  /** Decontamination: drop every `corpus` row whose text is ≥ `t`
    * n-gram-Jaccard-similar to ANY `reference` row — e.g. scrub an
    * eval/benchmark set out of a training corpus (or vice versa)
    * before fine-tuning. Removal ids come from [[jaccardJoinAuto]] (the
    * Σ-df guarded bipartite join: exact count join while its probe
    * fits, banded-MinHash candidates + exact verify past the budget),
    * removal is a left_anti join. The documented contract used to be
    * "benchmark-sized reference side only"; the guard lifts it — an
    * oversized reference routes to the near-linear candidate path
    * instead of detonating the Σ dfL·dfR token join. */
  def decontaminate(
      corpus: DataFrame, idCol: String, textCol: Column,
      reference: DataFrame, refIdCol: String, refTextCol: Column,
      t: Double = 0.8, n: Int = 8,
      maxJoinRowsPerDoc: Long = 8192L): DataFrame = {
    val leaked = jaccardJoinAuto(corpus, idCol, textCol,
        reference, refIdCol, refTextCol, t, n, maxJoinRowsPerDoc)
      .select(col("id_a").as(idCol)).distinct()
    corpus.join(leaked, Seq(idCol), "left_anti")
  }

  /** Marker-based exact n-gram Jaccard similarity for JOIN PREDICATES:
    * `a.join(b, Dedup.jaccardSim(a("text"), b("text"), n) >= lit(t))`.
    * Evaluates exactly like [[ngramJaccard]] anywhere, but as a single
    * recognizable expression node that
    * [[graft.plans.JaccardJoinRewrite]] pattern-matches in join
    * conditions and replaces with the count-based exact set-similarity
    * join — the naive cross product never executes when the rule is
    * installed ([[graft.GraftSession]] installs it; plain sessions get
    * it via `spark.sql.extensions=graft.GraftExtensions`). */
  def jaccardSim(a: Column, b: Column, n: Int = 3): Column =
    text.expr2col(graft.functions.NGramJaccardSim(
      text.col2expr(a), text.col2expr(b), n))

  /** DISTINCT text pairs `(__ta, __tb)` whose exact n-gram Jaccard
    * satisfies the threshold — the relational core behind
    * [[graft.plans.JaccardJoinRewrite]]. Same count-based algorithm as
    * [[jaccardPairs]] but keyed by the text VALUES themselves (the
    * rewrite has no row ids to pack) and compared UNROUNDED so the
    * decision agrees bit-for-bit with evaluating
    * [[graft.functions.NGramJaccardSim]] per pair. */
  private[graft] def textPairsByJaccard(
      left: DataFrame, leftText: Column,
      right: DataFrame, rightText: Column,
      t: Double, n: Int, strict: Boolean): DataFrame = {
    // Distinct texts per side, keyed by a 128-bit hash (two independent
    // xxhash64 seeds): the token join and the pair-count aggregation
    // must never carry or group on the TEXTS themselves — a ~300-char
    // document as a grouping key makes the hot aggregation hash and
    // compare ~600-byte keys per joined token row (measured 10× the
    // whole operator's cost). Texts are re-attached only to the few
    // threshold-passing pairs. 128 bits ⇒ a collision (which could
    // merge two pairs' counts) needs ~2^64 distinct texts.
    def keyed(src: DataFrame, textExpr: Column): DataFrame =
      spreadWide(src.select(textExpr.as("__t")).filter(col("__t").isNotNull))
        .distinct()
        .select(col("__t"), xxhash64(col("__t")).as("__h1"),
          xxhash64(col("__t"), lit(1)).as("__h2"))
    val lt = keyed(left, leftText)
    val rt = keyed(right, rightText)
    def toks(k: DataFrame, p: String): DataFrame = {
      val grams = text.expr2col(
        graft.functions.CharNGrams(text.col2expr(col("__t")), n, sentinel = true))
      k.select(col("__h1").as(s"__${p}1"), col("__h2").as(s"__${p}2"), grams.as("__g"))
        .select(col(s"__${p}1"), col(s"__${p}2"),
          size(col("__g")).as(s"__sz$p"), explode(col("__g")).as("__gram"))
    }
    val ta = toks(lt, "a")
    val tb = toks(rt, "b")
    // loose size bound (ε guards double rounding of t·max): prunes
    // inside the join stage; the exact unrounded J filter decides.
    val sizeOk = least(col("__sza"), col("__szb")).cast("double") >=
      greatest(col("__sza"), col("__szb")) * t - lit(1e-9)
    val j = col("__i").cast("double") / (col("__sza") + col("__szb") - col("__i"))
    val hits = ta.join(tb, Seq("__gram"))
      .filter(sizeOk)
      .groupBy(col("__a1"), col("__a2"), col("__b1"), col("__b2"))
      .agg(count(lit(1)).as("__i"),
        min(col("__sza")).as("__sza"), min(col("__szb")).as("__szb"))
      .filter(if (strict) j > t else j >= t)
      .select(col("__a1"), col("__a2"), col("__b1"), col("__b2"))
    hits
      .join(lt.select(col("__t").as("__ta"), col("__h1").as("__a1"), col("__h2").as("__a2")),
        Seq("__a1", "__a2"))
      .join(rt.select(col("__t").as("__tb"), col("__h1").as("__b1"), col("__h2").as("__b2")),
        Seq("__b1", "__b2"))
      .select(col("__ta"), col("__tb"))
  }

  /** `(__id, __sz, __gram)` exploded token stream of a doc frame. */
  private def tokens(df: DataFrame, idCol: String, textCol: Column, n: Int): DataFrame =
    gramSets(df, idCol, textCol, n)
      .select(col("__id"), size(col("__g")).as("__sz"), explode(col("__g")).as("__gram"))

  /** Repartition an under-split source up to the session's default
    * parallelism. Expensive narrow maps (LSH featurization, MinHash/
    * SimHash signatures, the n-gram explode) inherit the SCAN's
    * partitioning: a source with fewer splits than cores (one
    * unsplittable file, a single parquet row group, a gzip'd dump)
    * would run them near-sequentially — spread it first.
    * Well-partitioned at-scale inputs skip the extra shuffle
    * entirely.
    *
    * The probe uses `queryExecution.toRdd` (InternalRow RDD: plans the
    * physical tree but skips `df.rdd`'s extra deserializer stage and
    * its second plan copy). Any static probe reads the pre-AQE split
    * count — exactly what's wanted here, since the question is "how
    * parallel is the SCAN", not what AQE coalesces the first shuffle
    * to. At-scale jobs can pin the answer and skip the probe entirely
    * via `graft.spread.partitions`: 0 = never repartition, k > 0 =
    * always repartition(k). */
  private[graft] def spreadWide(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    df.sparkSession.conf.getOption("graft.spread.partitions").map(_.toInt) match {
      case Some(0)           => df
      case Some(k) if k > 0  => df.repartition(k)
      case _ =>
        if (df.queryExecution.toRdd.getNumPartitions < math.max(2, par / 2))
          df.repartition(par)
        else df
    }
  }

  /** Count-based pair enumeration shared by [[jaccardPairs]] (self
    * join, `antiReflexive` orients pairs id_a < id_b) and
    * [[jaccardJoin]] (bipartite, every cross pair once). Inputs are
    * `(id_a|id_b, __sza|__szb, __gram)` token streams. */
  private def countedPairs(
      a: DataFrame, b: DataFrame, t: Double, antiReflexive: Boolean): DataFrame = {
    // ε guards float noise in t·size (0.3·10 = 3.0000000000000004),
    // and the relaxed t−1e-6 covers pairs whose true J sits just below
    // t but ROUNDS to ≥ t (the output filter is on the rounded value):
    // the bound may only ever round DOWN, never drop an emitted pair.
    val sizeOk = least(col("__sza"), col("__szb")).cast("double") >=
      greatest(col("__sza"), col("__szb")) * (t - 1e-6) - lit(1e-9)
    val joined = a.join(b, Seq("__gram"))
    val scoped = if (antiReflexive) joined.filter(col("id_a") < col("id_b")) else joined
    // SELF-join (antiReflexive): the hot aggregation groups on ONE
    // packed long (ids read as 32-bit; widen the pack if your ids
    // exceed 2^31) — a third the hash-agg state of grouping on
    // (id_a, id_b, sza, szb). The sizes ride along as min() buffers
    // (constant within a pair), so no per-doc side table exists
    // downstream. BIPARTITE: the two sides are UNRELATED id spaces —
    // a ≥ 2^32 reference id would silently overflow into the
    // corpus-id bits and drop the WRONG rows — so that path groups on
    // both ids (16-byte key; correctness over the pack's state win).
    val grouped =
      if (antiReflexive)
        scoped.filter(sizeOk)
          .groupBy((shiftleft(col("id_a"), 32) + col("id_b")).as("__pair"))
          .agg(count(lit(1)).as("__i"),
            min(col("__sza")).as("__sza"), min(col("__szb")).as("__szb"))
          .select(shiftright(col("__pair"), 32).as("id_a"),
            col("__pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"),
            col("__i"), col("__sza"), col("__szb"))
      else
        scoped.filter(sizeOk)
          .groupBy(col("id_a"), col("id_b"))
          .agg(count(lit(1)).as("__i"),
            min(col("__sza")).as("__sza"), min(col("__szb")).as("__szb"))
    grouped
      .withColumn("jaccard", round(col("__i").cast("double") /
        (col("__sza") + col("__szb") - col("__i")), 6))
      .filter(col("jaccard") >= t)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard join via PPJoin-style PREFIX
    * filtering — same output contract as [[jaccardPairs]] (provably
    * identical to the brute-force cross join), different cost shape.
    *
    * [[jaccardPairs]]'s count-based join costs Σ_gram df² rows. On a
    * corpus whose gram vocabulary saturates (templated/boilerplate
    * text: few distinct grams, each in hundreds of documents) that sum
    * goes quadratic even though almost no pair passes the threshold.
    * Prefix filtering bounds candidates instead by RARE grams: order
    * grams globally by (document frequency, gram); a pair with
    * J ≥ t must share a gram inside both sides' first
    * `|A| − ⌈t·|A|⌉ + 1` grams of that order (Chaudhuri/Xiao AllPairs–
    * PPJoin bound: the suffix has < t·|A| ≤ |A∩B| elements, so the
    * intersection cannot avoid the prefix; symmetrically for B). Only
    * prefix tokens are joined — Σ over prefix grams of (prefix-df)²,
    * which selects each doc's rarest grams — then candidates are
    * verified with the exact codegen'd set intersection
    * ([[jaccardOfSets]]).
    *
    * Scale shape: one df aggregation (gram vocabulary), one window
    * rank per doc (hash shuffle on doc id), one equi-join on prefix
    * grams, one pair-distinct, two hash joins to re-attach gram sets
    * (arrays shuffle only for candidate rows). Prefer this over
    * [[jaccardPairs]] when the corpus is template-heavy; prefer the
    * count-based join when gram df is low (its joined rows carry no
    * arrays and skip the window + verify joins).
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: Column,
      t: Double, n: Int = 3): DataFrame = {
    require(t > 0 && t <= 1, "threshold must be in (0, 1]")
    val sets = gramSets(spreadWide(df), idCol, textCol, n)
    val tok = sets
      .select(col("__id"), size(col("__g")).as("__sz"), explode(col("__g")).as("__gram"))
    val dfTab = tok.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
    // The output filter is on ROUNDED J ≥ t, which admits true J down
    // to t − 5e-7 — so all pruning runs at the relaxed tC < t (longer
    // prefix, looser size bound: strictly more candidates, never
    // fewer), and the ε inside ceil guards float noise the same way.
    val tC = math.max(t - 1e-6, 1e-12)
    val prefLen = (col("__sz") - ceil(col("__sz") * tC - lit(1e-9)) + 1).cast("int")
    val rankW = Window.partitionBy(col("__id")).orderBy(col("__df"), col("__gram"))
    val pref = tok.join(dfTab, Seq("__gram"))
      .withColumn("__pos", row_number().over(rankW))
      .filter(col("__pos") <= prefLen)
    val a = pref.select(col("__id").as("id_a"), col("__sz").as("__sza"), col("__gram"))
    val b = pref.select(col("__id").as("id_b"), col("__sz").as("__szb"), col("__gram"))
    val sizeOk = least(col("__sza"), col("__szb")).cast("double") >=
      greatest(col("__sza"), col("__szb")) * tC - lit(1e-9)
    val cand = a.join(b, Seq("__gram"))
      .filter(col("id_a") < col("id_b") && sizeOk)
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    val sa = sets.select(col("__id").as("id_a"), col("__g").as("__ga"))
    val sb = sets.select(col("__id").as("id_b"), col("__g").as("__gb"))
    // same numerator/denominator values as jaccardPairs' count-based
    // formula, so the rounded output is bit-identical.
    cand.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("jaccard", round(jaccardOfSets(col("__ga"), col("__gb")), 6))
      .filter(col("jaccard") >= t)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** `(__id, __g)` with `__g` = lexically-sorted distinct n-gram set
    * (sentinel {""} for sub-n docs), via the native
    * [[graft.functions.CharNGrams]] expression. */
  private[graft] def gramSets(df: DataFrame, idCol: String, textCol: Column, n: Int): DataFrame = {
    val grams = text.expr2col(
      graft.functions.CharNGrams(text.col2expr(textCol), n, sentinel = true))
    df.select(col(idCol).as("__id"), grams.as("__g"))
  }

  /** Σ_gram df² — the exact count-based pair join's joined-row count —
    * from one narrow tokenize pass plus a vocabulary-sized aggregation.
    * This is [[jaccardPairsAuto]]'s routing probe: the quantity that
    * goes quadratic on gram-saturated corpora (ADR-003's 48-hour
    * lesson) is measurable for the cost of a map-side count BEFORE the
    * join is committed to. */
  private[graft] def gramJoinRows(df: DataFrame, idCol: String, textCol: Column,
      n: Int): Long = {
    val tok = tokens(spreadWide(df), idCol, textCol, n)
    val row = tok.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
      .agg(coalesce(sum(col("__df") * col("__df")), lit(0L)).as("__rows"))
      .head()
    row.getLong(0)
  }

  /** Band width r for [[jaccardPairsBanded]]: the widest divisor of
    * `numPerm` whose per-pair MISS probability at J = t,
    * (1 − t^r)^(numPerm/r), stays ≤ 1e-6. Wider bands (AND-
    * amplification) suppress sub-threshold candidates exponentially;
    * the bound keeps threshold-passing pairs from being suppressed
    * with them. r = 1 (miss (1−t)^numPerm) is the always-valid floor. */
  private[graft] def recallBandRows(t: Double, numPerm: Int): Int =
    (1 to numPerm).filter(numPerm % _ == 0).filter { r =>
      (numPerm / r) * math.log1p(-math.pow(t, r)) <= math.log(1e-6)
    }.maxOption.getOrElse(1)

  /** Exact-verified all-pairs n-gram Jaccard join with banded-MinHash
    * CANDIDATE generation — the Σdf²-safe sibling of [[jaccardPairs]].
    *
    * Same output columns and the same rounded J values (verification
    * is the exact codegen'd [[jaccardOfSets]] over the gram sets, not
    * the signature-agreement estimate), but candidates come from LSH
    * band buckets instead of the gram-token join, so cost is
    * Σ_bucket |bucket|² over AND-amplified buckets — near-linear on
    * corpora whose gram vocabulary saturates, where Σ_gram df² (the
    * count join's row count) goes quadratic. The one contract
    * difference: per-pair recall at J ≥ t is 1 − (1 − t^r)^b with r
    * chosen by [[recallBandRows]] so the miss probability is ≤ 1e-6
    * (deterministic per corpus: signatures are seeded) — vs the count
    * join's exactly 1.
    *
    * Scale shape: one narrow signature map (numPerm hashes per gram),
    * one ids-only bucket self-join (16-byte rows, ReusedExchange), one
    * packed-long pair distinct, two hash joins re-attaching gram sets
    * to CANDIDATE pairs only. The pair set is materialized eagerly
    * (localCheckpoint) while the gram-set cache is hot. */
  def jaccardPairsBanded(df: DataFrame, idCol: String, textCol: Column,
      t: Double, n: Int = 3, numPerm: Int = 128): DataFrame = {
    require(t > 0 && t <= 1, "threshold must be in (0, 1]")
    val sets = gramSets(spreadWide(df), idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      sets.count() // eager: the plan fans out (sig side + both verify sides)
      jaccardPairsBandedFromSets(sets, t, numPerm)
    } finally sets.unpersist(blocking = false)
  }

  /** [[jaccardPairsBanded]]'s body over an ALREADY persisted +
    * materialized `(__id, __g)` gram-set frame — shared with
    * [[jaccardPairsAuto]], whose probe builds the same cache; the
    * result is `localCheckpoint`ed before the caller unpersists. */
  private def jaccardPairsBandedFromSets(
      sets: DataFrame, t: Double, numPerm: Int): DataFrame = {
    {
      val r = recallBandRows(t, numPerm)
      val bands = numPerm / r
      // band index rides INSIDE the hash (seed column) so the bucket
      // join keys on one long; a cross-band hash collision only adds a
      // spurious candidate that exact verification discards.
      val banded = sets
        .select(col("__id"), minhashSig(col("__g"), numPerm).as("__sig"))
        .select(col("__id"), explode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("__sig"), b * r + 1, lit(r)), b))).as("__bucket"))
      val cand = banded.as("l").join(banded.as("r"), Seq("__bucket"))
        .filter(col("l.__id") < col("r.__id"))
        .select((shiftleft(col("l.__id"), 32) + col("r.__id")).as("__pair"))
        .distinct()
      val sa = sets.select(col("__id").cast("long").as("id_a"), col("__g").as("__ga"))
      val sb = sets.select(col("__id").cast("long").as("id_b"), col("__g").as("__gb"))
      cand
        .select(shiftright(col("__pair"), 32).as("id_a"),
          col("__pair").bitwiseAND(lit(0xFFFFFFFFL)).as("id_b"))
        .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
        .withColumn("jaccard", round(jaccardOfSets(col("__ga"), col("__gb")), 6))
        .filter(col("jaccard") >= t)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .localCheckpoint(true)
    }
  }

  /** Routing decision behind [[jaccardPairsAuto]], exposed so the
    * guardrail is spec-testable: true ⟹ the exact count-based join's
    * Σdf² row count fits the per-document budget. */
  private[graft] def routeExact(df: DataFrame, idCol: String, textCol: Column,
      n: Int, maxJoinRowsPerDoc: Long): Boolean = {
    val joinRows = gramJoinRows(df, idCol, textCol, n)
    val nDocs = math.max(df.count(), 1L)
    logRoute(joinRows, nDocs, maxJoinRowsPerDoc)
  }

  private def logRoute(joinRows: Long, nDocs: Long, maxJoinRowsPerDoc: Long): Boolean = {
    val exact = joinRows <= maxJoinRowsPerDoc * nDocs
    val msg = s"jaccardPairsAuto: ngram join probe Σdf²=$joinRows over $nDocs docs " +
      s"(budget ${maxJoinRowsPerDoc}/doc) → ${if (exact) "exact count join"
        else "banded-MinHash candidates + exact verify"}"
    if (exact) log.info(msg) else log.warn(msg)
    exact
  }

  /** Self-protecting exact n-gram Jaccard pair join: probes the gram
    * document-frequency distribution (one cheap aggregation) and runs
    * the count-based [[jaccardPairs]] only while its Σ_gram df² joined
    * rows fit `maxJoinRowsPerDoc · nDocs`; past the budget — the gram-
    * saturated regime where the count join goes quadratic — it routes
    * to [[jaccardPairsBanded]] (LSH candidates, exact verify) and logs
    * the decision at WARN.
    *
    * The gram-set frame is tokenized ONCE and persisted; the probe,
    * the exact join's both token sides, and the banded route all read
    * the cache — so the guarded join costs one tokenize pass total,
    * not one for the probe plus one per consumer (the cache also
    * spares the exact join a second scan+normalize of the source).
    *
    * EAGER on both routes: the probe is an action, and the result is
    * materialized (`localCheckpoint`) while the cache is hot, then the
    * cache is dropped — callers composing further pruning (limit,
    * narrow filters) pay full materialization at call time. Use
    * [[jaccardPairs]] / [[jaccardPairsBanded]] directly when a lazy
    * composable plan matters more than the guardrail. */
  def jaccardPairsAuto(df: DataFrame, idCol: String, textCol: Column,
      t: Double, n: Int = 3, maxJoinRowsPerDoc: Long = 8192L): DataFrame =
    if (recallBandRows(t, 128) < 2) {
      // r = 1 bands have no AND-amplification: every pair sharing a
      // single minhash value becomes a candidate, so the banded path
      // costs ≥ the count join WITH the signature overhead on top
      // (measured 7× slower at t = 0.3). Below the amplification
      // regime the exact count join is also the cheaper join.
      log.warn(s"jaccardPairsAuto: threshold $t too low for AND-amplified banding " +
        "(r < 2 at numPerm=128) — staying on the exact count join; on a " +
        "gram-saturated corpus raise t or pre-dedup with minhashDedup")
      jaccardPairs(df, idCol, textCol, t, n)
    } else {
      val sets = gramSets(spreadWide(df), idCol, textCol, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val nDocs = math.max(sets.count(), 1L) // materializes the cache
        val tok = sets.select(col("__id"),
          size(col("__g")).as("__sz"), explode(col("__g")).as("__gram"))
        val joinRows = tok.groupBy(col("__gram")).agg(count(lit(1)).as("__df"))
          .agg(coalesce(sum(col("__df") * col("__df")), lit(0L)).as("__rows"))
          .head().getLong(0)
        if (logRoute(joinRows, nDocs, maxJoinRowsPerDoc))
          countedPairs(
            tok.select(col("__id").as("id_a"), col("__sz").as("__sza"), col("__gram")),
            tok.select(col("__id").as("id_b"), col("__sz").as("__szb"), col("__gram")),
            t, antiReflexive = true)
            .localCheckpoint(true)
        else jaccardPairsBandedFromSets(sets, t, numPerm = 128)
      } finally sets.unpersist(blocking = false)
    }

  /** Σ_gram dfL·dfR — the exact bipartite count join's joined-row
    * count — [[jaccardJoinAuto]]'s routing probe. The self-join probe
    * ([[gramJoinRows]]) guards the within-corpus shape; this is its
    * two-sided analog, the quantity that detonated the reference's
    * decontamination when both sides scaled
    * (/root/reference/docs/adr/003-pandas-vs-pyspark-strategy.md:
    * 165-189's 48-hour nested-loop lesson, measured here as 20.6×
    * growth at 10× in the round-4 rehearsal). */
  private[graft] def bipartiteJoinRows(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column, n: Int): Long =
    bipartiteJoinRowsFromTokens(
      tokens(spreadWide(left), leftId, leftText, n),
      tokens(spreadWide(right), rightId, rightText, n))

  /** Σ_gram dfL·dfR over two `__gram` token streams — the ONE
    * implementation of the bipartite routing formula, shared by the
    * spec-facing [[routeExactBipartite]] probe and [[jaccardJoinAuto]]
    * (which feeds it the token streams read from its gram-set caches,
    * so the guardrail the spec tests and the guardrail production
    * routes on cannot drift apart). */
  private def bipartiteJoinRowsFromTokens(ta: DataFrame, tb: DataFrame): Long =
    ta.groupBy(col("__gram")).agg(count(lit(1)).as("__dfl"))
      .join(tb.groupBy(col("__gram")).agg(count(lit(1)).as("__dfr")), Seq("__gram"))
      .agg(coalesce(sum(col("__dfl") * col("__dfr")), lit(0L)).as("__rows"))
      .head().getLong(0)

  /** Routing decision behind [[jaccardJoinAuto]], exposed so the
    * guardrail is spec-testable: true ⟹ the exact bipartite count
    * join's Σ dfL·dfR row count fits the per-document budget. */
  private[graft] def routeExactBipartite(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column,
      n: Int, maxJoinRowsPerDoc: Long): Boolean = {
    val joinRows = bipartiteJoinRows(left, leftId, leftText, right, rightId, rightText, n)
    val nDocs = math.max(left.count() + right.count(), 1L)
    logRouteBipartite(joinRows, nDocs, maxJoinRowsPerDoc)
  }

  private def logRouteBipartite(joinRows: Long, nDocs: Long,
      maxJoinRowsPerDoc: Long): Boolean = {
    val exact = joinRows <= maxJoinRowsPerDoc * nDocs
    val msg = s"jaccardJoinAuto: bipartite ngram probe ΣdfL·dfR=$joinRows over " +
      s"$nDocs docs (budget ${maxJoinRowsPerDoc}/doc) → ${if (exact) "exact count join"
        else "banded-MinHash candidates + exact verify"}"
    if (exact) log.info(msg) else log.warn(msg)
    exact
  }

  /** Self-protecting BIPARTITE n-gram Jaccard join — [[jaccardJoin]]'s
    * guarded sibling, the decontamination/leak-report default. Probes
    * Σ_gram dfL·dfR (the exact count join's joined-row count, ONE
    * vocabulary-sized aggregation per side) and runs the count-based
    * [[jaccardJoin]] only while that fits `maxJoinRowsPerDoc · (|L| +
    * |R|)`; past the budget — the oversized-reference regime where the
    * two-sided join goes quadratic — it routes to banded-MinHash
    * candidate pairs verified by the exact codegen'd [[jaccardOfSets]],
    * and logs the decision at WARN. Same output columns and the same
    * rounded J values on either route; the banded route's one contract
    * difference is per-pair recall 1 − (1 − t^r)^b ≥ 1 − 1e-6
    * ([[recallBandRows]]) instead of exactly 1.
    *
    * Both sides' gram-set frames are tokenized ONCE and persisted; the
    * probe, the exact join's token streams, and the banded route's
    * signatures + verify all read the caches. Like
    * [[jaccardPairsAuto]], the result is EAGER on both routes
    * (materialized via `localCheckpoint` while the caches are hot). */
  def jaccardJoinAuto(
      left: DataFrame, leftId: String, leftText: Column,
      right: DataFrame, rightId: String, rightText: Column,
      t: Double, n: Int = 3, maxJoinRowsPerDoc: Long = 8192L): DataFrame = {
    require(t > 0 && t <= 1, "threshold must be in (0, 1]")
    if (recallBandRows(t, 128) < 2) {
      // r = 1 bands have no AND-amplification — same reasoning as
      // jaccardPairsAuto: below the amplification regime the exact
      // count join is also the cheaper join.
      log.warn(s"jaccardJoinAuto: threshold $t too low for AND-amplified banding " +
        "(r < 2 at numPerm=128) — staying on the exact count join")
      jaccardJoin(left, leftId, leftText, right, rightId, rightText, t, n)
    } else {
      val lv = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val setsL = gramSets(spreadWide(left), leftId, leftText, n).persist(lv)
      val setsR = gramSets(spreadWide(right), rightId, rightText, n).persist(lv)
      try {
        val nDocs = math.max(setsL.count() + setsR.count(), 1L) // materializes both
        def toks(sets: DataFrame): DataFrame = sets.select(col("__id"),
          size(col("__g")).as("__sz"), explode(col("__g")).as("__gram"))
        val ta = toks(setsL)
        val tb = toks(setsR)
        val joinRows = bipartiteJoinRowsFromTokens(ta, tb)
        if (logRouteBipartite(joinRows, nDocs, maxJoinRowsPerDoc))
          countedPairs(
            ta.select(col("__id").as("id_a"), col("__sz").as("__sza"), col("__gram")),
            tb.select(col("__id").as("id_b"), col("__sz").as("__szb"), col("__gram")),
            t, antiReflexive = false)
            .localCheckpoint(true)
        else jaccardJoinBandedFromSets(setsL, setsR, t, numPerm = 128)
      } finally {
        setsL.unpersist(blocking = false)
        setsR.unpersist(blocking = false)
      }
    }
  }

  /** Banded-MinHash candidates + exact verify over two ALREADY
    * persisted `(__id, __g)` gram-set frames — [[jaccardJoinAuto]]'s
    * oversized-reference route, the bipartite analog of
    * [[jaccardPairsBandedFromSets]]. Candidates are L×R band-bucket
    * collisions (ids-only 16-byte rows), never an id-ordered self
    * pair, so every cross pair is considered exactly once. */
  private def jaccardJoinBandedFromSets(
      setsL: DataFrame, setsR: DataFrame, t: Double, numPerm: Int): DataFrame = {
    val r = recallBandRows(t, numPerm)
    val bands = numPerm / r
    def bandedSide(sets: DataFrame): DataFrame = sets
      .select(col("__id"), minhashSig(col("__g"), numPerm).as("__sig"))
      .select(col("__id"), explode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("__sig"), b * r + 1, lit(r)), b))).as("__bucket"))
    // distinct on BOTH ids, not a packed long: unlike the self-join
    // hot aggregation (countedPairs, where the pack is the measured
    // hash-agg win and the 32-bit assumption is documented), the two
    // sides here are UNRELATED id spaces — a reference set with
    // ≥ 2^32 ids would silently overflow into the corpus-id bits and
    // drop the wrong rows. A 16-byte distinct key on a candidate list
    // costs nothing measurable.
    val cand = bandedSide(setsL).as("l").join(bandedSide(setsR).as("r"), Seq("__bucket"))
      .select(col("l.__id").cast("long").as("id_a"),
        col("r.__id").cast("long").as("id_b"))
      .distinct()
    val sa = setsL.select(col("__id").cast("long").as("id_a"), col("__g").as("__ga"))
    val sb = setsR.select(col("__id").cast("long").as("id_b"), col("__g").as("__gb"))
    cand
      .join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("jaccard", round(jaccardOfSets(col("__ga"), col("__gb")), 6))
      .filter(col("jaccard") >= t)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .localCheckpoint(true)
  }

  /** N-gram-Jaccard near-duplicate removal: drops every document whose
    * gram set is ≥ `t` Jaccard-similar to an earlier (lower-id) one,
    * with candidate pairs from [[jaccardPairsAuto]] — the count-based
    * exact join while its Σdf² cost probe fits, banded-MinHash
    * candidates + exact verify on gram-saturated corpora — and removal
    * via left_anti; never a driver collect. */
  def ngramDedup(df: DataFrame, idCol: String, textCol: Column,
      t: Double = 0.8, n: Int = 3,
      maxJoinRowsPerDoc: Long = 8192L): DataFrame = {
    val dupIds = jaccardPairsAuto(df, idCol, textCol, t, n, maxJoinRowsPerDoc)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** Embedding-cosine near-duplicate removal: rows whose embedding is
    * within `threshold` cosine of an earlier (lower-id) row are
    * dropped via left_anti.
    *
    * Default candidate generation is the cell-pruned pair join
    * ([[Similarity.similarPairsApprox]]): seeded k-means cells +
    * triangle-inequality pruning on angular distance, exact cosine
    * verify on survivors — identical output to the exact cross join on
    * any input, with cost ≈ Σ|cell|² on clustered (i.e. duplicated)
    * corpora. `exact = true` keeps the O(n²) cross join as a
    * cross-check baseline for small inputs. */
  def embeddingDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, exact: Boolean = false, nCells: Int = 0): DataFrame = {
    val pairs =
      if (exact)
        Similarity.similarPairs(
          df.withColumn(vecCol, col(vecCol).cast("array<double>")), idCol, vecCol, threshold)
      else Similarity.similarPairsApprox(df, idCol, vecCol, threshold, nCells)
    val dupIds = pairs.select(col("id_b").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SemDeDup-style semantic deduplication ("SemDeDup: Data-efficient
    * learning at web-scale through semantic deduplication", Abbas et
    * al. 2023): cluster the embedding space, compare pairs ONLY within
    * a cluster, and drop every row whose cosine to an earlier
    * (lower-id) cluster-mate is ≥ `1 − eps`. The deliberate contrast
    * with [[embeddingDedup]]: that operator is EXACT (cell pruning is
    * loss-free, cross-cell candidates survive via the triangle-
    * inequality allowlist), while SemDeDup's whole scale story is to
    * NEVER look across clusters — recall is bounded by cluster
    * locality, and in exchange cost is a strict Σ|cell|² with no
    * cross-cell join at all. Use it where the paper does: aggressive
    * semantic thinning of web-scale corpora at thresholds (eps ~
    * 0.03–0.1) where near-dup pairs are overwhelmingly co-located.
    *
    * Clusters are the engine's deterministic hyperplane-signature
    * buckets (seeded sign bits — one narrow map, no k-means fit, no
    * model broadcast; [[Similarity.cellPartition]] documents why they
    * have exactly the angular locality wanted here). `nCells <= 0`
    * auto-sizes to ~256 vectors/cell — UNCLAMPED above, unlike
    * [[Similarity.autoCells]]: that clamp bounds `similarPairsApprox`'s
    * driver-side centroid/radius/allowlist metadata, but SemDeDup
    * keeps NO per-cell metadata, so the cell count can track the
    * corpus indefinitely (the paper runs ~100k clusters on billions)
    * and Σ|cell|² stays ~256·n at any scale instead of going
    * quadratic past the clamp. Rows whose embedding is null, empty,
    * or NaN-poisoned can never be PROVEN duplicate, so they are
    * kept — same keep-on-doubt contract as every other dedup path.
    *
    * Scale shape: one narrow assignment map, ONE (cell)-keyed
    * self-join (the same frame instance aliased twice ⇒ the exchange
    * is written once and read twice), map-side distinct of dropped
    * ids, left_anti removal. Nothing but (cell, id, vec) rides the
    * shuffle, and the vec rides exactly once.
    *
    * `nCells <= 0` auto-sizing runs an EAGER sizing job at call time
    * (a count over the persisted comparable frame — the cache keeps
    * the scan+filter from executing a second time under the cell
    * join). At 100 TB pass `nCells` explicitly (you know the corpus
    * size); the operator then stays fully lazy. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      eps: Double = 0.05, nCells: Int = 0, seed: Long = 42L): DataFrame = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    val t = 1.0 - eps
    val vd = col(vecCol).cast("array<double>")
    val clean = spreadWide(df)
      .filter(semanticComparable(vd))
      .select(col(idCol).as("__id"), vd.as("__v"))
    val (comparable, cells) =
      if (nCells > 0) (clean, nCells)
      else {
        // localCheckpoint (not cache-then-unpersist): the returned
        // plan is lazy, so there is no post-action point to release a
        // cache at — the checkpoint materializes the comparable frame
        // once and both the sizing count and the cell join read it.
        val cp = clean.localCheckpoint(true)
        (cp, semanticCells(cp.count()))
      }
    val assigned = comparable.withColumn("__cell", semanticCell(col("__v"), cells, seed))
    val dup = assigned.as("l").join(assigned.as("r"), Seq("__cell"))
      .filter(col("l.__id") < col("r.__id"))
      .filter(Similarity.cosine(col("l.__v"), col("r.__v")) >= t)
      .select(col("r.__id").as(idCol)).distinct()
    df.join(dup, Seq(idCol), "left_anti")
  }

  /** ~256 vectors/cell, unclamped above (30-bit signature ceiling =
    * ~10⁹ cells): [[semanticDedup]]'s auto-sizing, exposed for the
    * spec. */
  private[graft] def semanticCells(n: Long): Int =
    math.min(1L << 30, math.max(8L, n / 256L)).toInt

  /** Seeded hyperplane cell of a vector — THE SemDeDup bucketing,
    * shared by the batch operator, the incremental state table
    * ([[Incremental.writeCellVectors]]), and the streaming keyer
    * ([[graft.streaming.StreamOps.keyByCell]]); one definition so the
    * three paths can never disagree on which rows share a cell.
    * Null-safe to cell 0 for pass-through rows. */
  private[graft] def semanticCell(vec: Column, nCells: Int, seed: Long): Column =
    coalesce(Similarity
      .hyperplaneSignature(vec, Similarity.cellBits(nCells), seed).cast("int"), lit(0))

  /** Comparability predicate shared by the batch and incremental
    * paths: a row can be PROVEN duplicate only with a non-null,
    * non-empty, NaN-free embedding. The streaming state function
    * applies the same rule in-JVM (non-comparable rows pass through
    * un-flagged there — a stream must emit a decision per row). */
  private[graft] def semanticComparable(vec: Column): Column =
    vec.isNotNull && size(vec) > 0 && !exists(vec, x => isnan(x))

  /** The `(__cell, __rv)` eval-side frame behind
    * [[semanticDecontaminate]] and
    * [[graft.streaming.StreamOps.semanticDecontaminateStream]]:
    * comparable reference vectors, distinct'd, keyed by their seeded
    * hyperplane cell. Build ONCE per eval set (it is benchmark-sized
    * by the decontamination contract) and share across batch jobs and
    * streams, exactly like [[evalGramBloom]]. */
  def evalCellVectors(reference: DataFrame, refVecCol: String,
      nCells: Int, seed: Long = 42L): DataFrame = {
    val rv = col(refVecCol).cast("array<double>")
    reference
      .select(rv.as("__rv"))
      .filter(semanticComparable(col("__rv")))
      .distinct()
      .select(semanticCell(col("__rv"), nCells, seed).as("__cell"), col("__rv"))
  }

  /** Embedding-space decontamination: drop corpus rows whose embedding
    * lies within cosine `eps` of ANY reference (eval-set) embedding —
    * the PARAPHRASE-level member of the decontamination family. The
    * verbatim n-gram gates ([[contaminationProfile]], the Bloom and
    * streaming variants) catch exact token overlap; the fuzzy doc
    * gate ([[decontaminate]]) catches high-Jaccard rewordings; this
    * one catches leaks that share no surface n-grams at all
    * (translations, heavy paraphrases) — the shape reported for
    * benchmark leakage audits of web-scale pretraining sets.
    *
    * Comparisons happen only WITHIN shared seeded hyperplane cells —
    * [[semanticCell]], the SAME bucketing as the batch / streaming /
    * incremental SemDeDup paths, so one definition decides which rows
    * are ever compared everywhere. The recall contract is therefore
    * SemDeDup's, not an exact join's: a (corpus, eval) pair split
    * across cells is never compared. Run it BEHIND the verbatim/Bloom
    * gates (which are exact) as the paraphrase net, not instead of
    * them. Corpus rows whose embedding is null, empty, or
    * NaN-poisoned can never be PROVEN contaminated → kept; such
    * reference rows prove nothing → ignored.
    *
    * Scale shape: one narrow map per side, reference distinct'd and
    * BROADCAST (the decontamination contract: the eval side is
    * benchmark-sized — use the cell-bucketed incremental state table
    * pattern if yours is not), map-side cell equi-join + cosine
    * verify, distinct hit ids, left_anti removal. The corpus never
    * self-joins and never shuffles anything but the matched ids.
    *
    * `nCells <= 0` auto-sizes from the CORPUS like [[semanticDedup]]
    * (eager sizing count at call time — pass `nCells` explicitly at
    * scale); fewer cells trade cost (more pairs compared) for recall
    * (fewer split pairs), so decontamination callers may want coarser
    * cells than dedup callers. */
  def semanticDecontaminate(
      corpus: DataFrame, idCol: String, vecCol: String,
      reference: DataFrame, refVecCol: String,
      eps: Double = 0.05, nCells: Int = 0, seed: Long = 42L): DataFrame = {
    require(eps > 0 && eps < 1, "eps must be in (0, 1)")
    val t = 1.0 - eps
    val cv = col(vecCol).cast("array<double>")
    val clean = spreadWide(corpus)
      .filter(semanticComparable(cv))
      .select(col(idCol).as("__id"), cv.as("__cv"))
    val (comparable, cells) =
      if (nCells > 0) (clean, nCells)
      else {
        // same localCheckpoint discipline as semanticDedup: the
        // returned plan is lazy, so the checkpoint is the only point
        // where the sizing count and the cell join can share one scan
        val cp = clean.localCheckpoint(true)
        (cp, semanticCells(cp.count()))
      }
    val evalCells = evalCellVectors(reference, refVecCol, cells, seed)
    val hit = comparable
      .withColumn("__cell", semanticCell(col("__cv"), cells, seed))
      .join(broadcast(evalCells), Seq("__cell"))
      .filter(Similarity.cosine(col("__cv"), col("__rv")) >= t)
      .select(col("__id").as(idCol)).distinct()
    corpus.join(hit, Seq(idCol), "left_anti")
  }
}
