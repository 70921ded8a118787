package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run (session spin-up is
  * ~5 s; per-suite sessions would dominate test time). */
object SparkTestSession {
  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()
}
