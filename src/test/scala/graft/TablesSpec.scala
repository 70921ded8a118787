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

  test("events NTZ branch is timezone-independent") {
    // write an events-shaped parquet whose ts column is TIMESTAMP_NTZ
    // carrying a known UTC wall-clock
    val dir = Files.createTempDirectory("graft-ntz").toString
    val epochMicros = 1700000000000000L // 2023-11-14T22:13:20Z
    spark.range(1)
      .select(
        lit(1L).as("event_id"),
        lit(1L).as("user_id"),
        lit("click").as("event_type"),
        timestamp_micros(lit(epochMicros)).cast("timestamp_ntz").as("ts"),
        lit(1.0).as("value"))
      .write.parquet(s"$dir/events.parquet")

    val tzConf = "spark.sql.session.timeZone"
    val ntzConf = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val (tz0, ntz0) = (spark.conf.get(tzConf), spark.conf.get(ntzConf))
    try {
      spark.conf.set(ntzConf, "true") // force the NTZ read path
      for (tz <- Seq("UTC", "America/Mexico_City", "Asia/Tokyo")) {
        spark.conf.set(tzConf, tz)
        val read = Tables.events(spark, dir)
        assert(read.schema("ts").dataType.typeName === "timestamp")
        val got = read.select(unix_micros(col("ts"))).as[Long].head()
        assert(got === epochMicros, s"instant drifted under session tz=$tz")
      }
    } finally {
      spark.conf.set(tzConf, tz0)
      spark.conf.set(ntzConf, ntz0)
    }
  }
}
