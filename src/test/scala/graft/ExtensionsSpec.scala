package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.bridge
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injections expose the SQL surface on an un-registered session") {
    // `spark.sql.extensions` is a static conf applied at SparkContext
    // creation, so with the shared test context the application step is
    // driven through the bridge; the injection tuples under test are
    // exactly what a `--conf spark.sql.extensions=graft.GraftExtensions`
    // session would receive.
    val s = SparkTestSession.spark.newSession() // fresh registry, no registerFunctions
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    bridge.applyFunctionExtensions(ext, s)

    val row = s.sql(
      """SELECT
        |  unicode_nfc('a' || decode(X'CC84', 'UTF-8')) AS nfc,
        |  char_ngrams('abcd', 3) AS grams,
        |  sorted_intersect_size(array('a','b'), array('b','c')) AS isz,
        |  vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  sig_agree_count(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        |  hyperplane_sig(array(1.0d, -2.0d, 0.5d), 8, 42L) AS sig,
        |  winnow_fps('a b c d e f g h i j', 4, 4) AS wfps
        |""".stripMargin).collect().head
    assert(row.getString(0) === "ā", "NFC composes a + combining macron")
    assert(row.getSeq[String](1) === Seq("abc", "bcd"))
    assert(row.getInt(2) === 1)
    assert(row.getDouble(3) === 11.0)
    assert(row.getInt(4) === 2)
    // must equal the Column-API signature on the same vector
    val viaColumn = {
      import org.apache.spark.sql.functions._
      val sp = SparkTestSession.spark
      import sp.implicits._
      Seq(Seq(1.0, -2.0, 0.5)).toDF("v")
        .select(operators.Similarity.hyperplaneSignature(col("v"), bits = 8, seed = 42L))
        .collect().head.getLong(0)
    }
    assert(row.getLong(5) === viaColumn)
    // 10 words, k=4 → 7 grams, w=4 → 4 windows; selection non-empty,
    // sorted ascending, distinct — the kernel's output contract
    val wfps = row.getSeq[Long](6)
    assert(wfps.nonEmpty && wfps === wfps.sorted && wfps.distinct === wfps)
  }

  test("a session without the extensions or registerFunctions does NOT see the functions") {
    val bare = SparkTestSession.spark.newSession()
    val err = intercept[Exception](bare.sql("SELECT unicode_nfc('x')").collect())
    assert(err.getMessage.contains("unicode_nfc"))
  }
}
