package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-skew diagnostics and mitigation for shuffle joins/aggregations.
  *
  * At 100 TB the difference between a 20-minute and a 20-hour join is
  * usually ONE hot key: every `groupBy`/`join` hash-partitions on the
  * key, so the partition owning the heaviest key runs as long as that
  * key is large, no matter how many executors idle beside it. The
  * reference never hits this (single-node pandas/SQLite have no
  * partitions), but its workloads — dedup keys where one boilerplate
  * sentence repeats 10⁶ times, joins on `run_id` where one backfill
  * run dwarfs the rest — are exactly the shapes that skew. These
  * operators make skew measurable first (report/heavy hitters), then
  * survivable (salted join) when AQE's runtime skew-split can't apply
  * (it only covers sort-merge joins without agg-fused sides).
  */
object Skew {

  /** One-row skew report for a prospective shuffle key: row/key
    * counts, heaviest-key mass, and the max/avg ratio — the direct
    * read on "will one partition own the job's tail latency". A ratio
    * near 1 is uniform; ≥ ~8 warrants salting or AQE skew handling.
    * One hash shuffle (map-side partial agg), scalar output.
    */
  def keySkewReport(df: DataFrame, key: Column): DataFrame =
    df.groupBy(key.as("__k"))
      .agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("__c")).as("max_key_rows"),
        round(avg(col("__c")), 4).as("avg_key_rows"),
        round(max(col("__c")) / avg(col("__c")), 4).as("skew_ratio"))

  /** Top-k heaviest keys with their share of total rows — the keys a
    * salted join (or an isin-split broadcast) should target. Ends in
    * TakeOrdered: per-partition heaps, k rows to the driver side of
    * the plan, never a total sort. */
  def heavyHitters(df: DataFrame, key: Column, k: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("__total"))
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("key_rows"))
      .crossJoin(broadcast(total))
      .withColumn("share_pct", round(col("key_rows") * 100.0 / col("__total"), 4))
      .drop("__total")
      .orderBy(desc("key_rows"), col("key"))
      .limit(k)
  }

  /** Skew-proof equi-join: salt the (large, skewed) left side into
    * `saltFactor` sub-keys and replicate each right-side row once per
    * salt, so a hot key's rows spread over `saltFactor` partitions
    * instead of landing on one straggler. Semantically identical to
    * `left.join(right, keys, joinType)` — the salt is join-local and
    * never escapes.
    *
    * The left salt is `pmod(xxhash64(all left columns), saltFactor)`:
    * deterministic (plans/retries recompute the same salt — `rand()`
    * here would break task retry under shuffle replay) and spreading
    * for duplicate keys as long as SOME non-key column varies, which
    * is what "hot key" means in practice (10⁶ distinct rows sharing
    * one key). Right-side replication is an `explode(sequence(...))`
    * — `saltFactor`× the SMALL side, the standard trade.
    *
    * Supports inner/left joins (the salted right side would produce
    * `saltFactor` null-expansions per unmatched right row under
    * right/full joins — reject those rather than silently corrupt).
    */
  def saltedJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left joins, got $joinType")
    require(saltFactor > 1, "saltFactor must be > 1")
    val leftCols = left.columns.map(col).toSeq
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols: _*), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
