package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC connectors (SURVEY §2.1 S8-S10): incremental CDC scans with a
  * pushed watermark predicate, partitioned parallel reads, and a
  * batched bulk sink with exponential-backoff retry.
  *
  * The reference streams `SELECT * FROM t WHERE wm > :last_sync` with
  * client-side batching (/root/reference/src/connectors/
  * oracle_connector.py:95-169, generic_jdbc_connector.py:186-229).
  * Spark-first: the watermark predicate lives inside the `dbtable`
  * subquery (pushed to the database, nothing filtered client-side) and
  * `partitionColumn`/`numPartitions` shard the scan across executors —
  * the distributed replacement for `cursor.arraysize` batching.
  */
object Jdbc {

  /** S10 — driver registry + URL templating. `derby` is the embedded
    * engine (ships with Spark's distribution for the Hive metastore):
    * `database` is the on-disk path, host/port unused — it is what CI
    * drives the scan/sink paths against for a REAL round-trip
    * (JdbcSpec), standing in for the server databases below. */
  val driverRegistry: Map[String, String] = Map(
    "postgresql" -> "org.postgresql.Driver",
    "mysql" -> "com.mysql.cj.jdbc.Driver",
    "sqlserver" -> "com.microsoft.sqlserver.jdbc.SQLServerDriver",
    "db2" -> "com.ibm.db2.jcc.DB2Driver",
    "oracle" -> "oracle.jdbc.OracleDriver",
    // the reference ships a dedicated Teradata connector
    // (/root/reference/src/connectors/teradata_connector.py) — its
    // JDBC equivalent is the public TeraDriver
    "teradata" -> "com.teradata.jdbc.TeraDriver",
    "derby" -> "org.apache.derby.jdbc.EmbeddedDriver")

  def urlFor(kind: String, host: String, port: Int, database: String): String = kind match {
    case "postgresql" => s"jdbc:postgresql://$host:$port/$database"
    case "mysql" => s"jdbc:mysql://$host:$port/$database"
    case "sqlserver" => s"jdbc:sqlserver://$host:$port;databaseName=$database"
    case "db2" => s"jdbc:db2://$host:$port/$database"
    case "oracle" => s"jdbc:oracle:thin:@$host:$port/$database"
    case "teradata" => s"jdbc:teradata://$host/DATABASE=$database,DBS_PORT=$port"
    case "derby" => s"jdbc:derby:$database"
    case other => throw new IllegalArgumentException(s"unknown jdbc kind: $other")
  }

  final case class Conn(kind: String, host: String, port: Int, database: String,
      user: String, password: String) {
    def url: String = urlFor(kind, host, port, database)
    def driver: String = driverRegistry(kind)
  }

  /** S8 — the pushed-down incremental subquery (pure function, unit
    * tested without a database). `lastSync == null` ⇒ full scan. */
  def incrementalSubquery(table: String, wmCol: String, lastSync: String): String =
    if (lastSync == null) table
    else s"(SELECT * FROM $table WHERE $wmCol > '$lastSync') AS graft_incr"

  /** S8 — incremental partitioned scan. The watermark predicate is in
    * the dbtable subquery (DB-side); partition bounds shard the read. */
  def incrementalScan(
      spark: SparkSession, conn: Conn, table: String,
      wmCol: String, lastSync: String,
      partitionCol: Option[String] = None,
      lowerBound: Long = 0L, upperBound: Long = 1L << 40,
      numPartitions: Int = 8,
      fetchSize: Int = 10000): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
      .option("user", conn.user)
      .option("password", conn.password)
      .option("dbtable", incrementalSubquery(table, wmCol, lastSync))
      .option("fetchsize", fetchSize)
    partitionCol.foreach { pc =>
      r = r.option("partitionColumn", pc)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
    }
    r.load()
  }

  /** S9 — bulk sink with exponential-backoff retry (3 attempts à la
    * oracle_connector.py:171-241); batched writes executor-side. */
  def bulkWrite(df: DataFrame, conn: Conn, table: String,
      batchSize: Int = 5000, maxRetries: Int = 3, baseBackoffMs: Long = 1000L): Unit =
    retryWithBackoff(maxRetries, baseBackoffMs) { () =>
      df.write.format("jdbc")
        .option("url", conn.url)
        .option("driver", conn.driver)
        .option("user", conn.user)
        .option("password", conn.password)
        .option("dbtable", table)
        .option("batchsize", batchSize)
        .mode("append")
        .save()
    }

  /** The retry loop behind [[bulkWrite]]: attempt, on failure sleep
    * `baseBackoffMs · 2^(attempt-1)` and retry, up to `maxRetries`
    * retries, then rethrow. Package-visible so JdbcSpec can drive it
    * with an injected transient fault whose final attempt performs the
    * real database write. */
  private[graft] def retryWithBackoff(maxRetries: Int, baseBackoffMs: Long)(
      action: () => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      try { action(); done = true }
      catch {
        case _: Exception if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(baseBackoffMs * (1L << (attempt - 1)))
        case e: Exception => throw e
      }
    }
  }
}
