package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `events.ts` normalization in [[Tables.events]] must land on the
  * same instant under EVERY session timezone (ADVICE round 4: a bare
  * NTZ->Timestamp cast re-interprets the wall clock in the session tz).
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("events NTZ branch is timezone-independent, incl. DST fall-back overlap") {
    // write an events-shaped parquet whose ts column is TIMESTAMP_NTZ
    // carrying known UTC wall-clocks. 2023-11-05T08:30:00Z lands on
    // 01:30 in America/Los_Angeles — the fall-back hour that occurs
    // TWICE (PDT and PST), where any convert-to-local-then-cast path
    // materializes an ambiguous wall clock and can shift 1 h (ADVICE
    // round 5). The third instant carries a micros fraction.
    val dir = Files.createTempDirectory("graft-ntz").toString
    val instants = Seq(
      1700000000000000L, // 2023-11-14T22:13:20Z (plain)
      1699173000000000L, // 2023-11-05T08:30:00Z (LA DST overlap hour)
      1699173000123456L) // same, with a micros fraction
    instants.zipWithIndex.map { case (us, i) =>
        (i.toLong, 1L, "click", us, 1.0)
      }.toDF("event_id", "user_id", "event_type", "us", "value")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val tzConf = "spark.sql.session.timeZone"
    val ntzConf = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val (tz0, ntz0) = (spark.conf.get(tzConf), spark.conf.get(ntzConf))
    try {
      spark.conf.set(ntzConf, "true") // force the NTZ read path
      for (tz <- Seq("UTC", "America/Mexico_City", "Asia/Tokyo", "America/Los_Angeles")) {
        spark.conf.set(tzConf, tz)
        val read = Tables.events(spark, dir)
        assert(read.schema("ts").dataType.typeName === "timestamp")
        val got = read.orderBy("event_id")
          .select(unix_micros(col("ts"))).as[Long].collect().toSeq
        assert(got === instants, s"instant drifted under session tz=$tz")
      }
    } finally {
      spark.conf.set(tzConf, tz0)
      spark.conf.set(ntzConf, ntz0)
    }
  }
}
