package graft.tools

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry, Tables}

/** Throwaway A/B probe for the q172 blockText-multiplicity change:
  * times the OLD html_main_text (blockText re-evaluated per use) and
  * the NEW one (struct-carried, once per block) alternately in ONE
  * JVM, on the exact q172 page synthesis. Not part of the bench. */
object ScratchQ172 {

  private val hiddenRegionRe: String = {
    val tags = Seq("script", "style", "noscript", "template", "head",
      "nav", "header", "footer", "aside")
    tags.map(t => s"<$t\\b[^>]*>.*?</$t>").mkString("(?is)", "|", "|<!--.*?-->")
  }
  private val blockBoundaryRe: String =
    "(?i)</?(?:p|div|section|article|main|h1|h2|h3|h4|h5|h6|li|ul|ol|" +
      "table|thead|tbody|tr|td|th|br|blockquote|figure|figcaption|" +
      "details|summary|form|fieldset|pre|hr|title|body|html)" +
      "(?:\\s[^>]*)?/?>"
  private val wsRe = "[ \\t\\n\\r\\f]+"

  private def decodeEntities(c: Column): Column = {
    val steps = Seq(
      "&nbsp;" -> " ", "&#160;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (k, v)) => F.replace(acc, lit(k), lit(v)) }
  }
  private def blockText(b: Column): Column =
    trim(regexp_replace(decodeEntities(regexp_replace(b, "<[^>]+>", " ")),
      wsRe, " "))
  private def blockLinkLen(b: Column): Column =
    aggregate(
      regexp_extract_all(b, lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)),
      lit(0),
      (acc, a) => acc + length(blockText(a)))

  def oldMain(html: Column, minWords: Int = 3, maxLd: Double = 0.33): Column = {
    val blocks = split(regexp_replace(html, hiddenRegionRe, " "), blockBoundaryRe)
    val kept = filter(blocks, b => {
      val t = blockText(b)
      (size(split(t, " ")) >= minWords) && (t =!= "") &&
        (blockLinkLen(b).cast("double") <= lit(maxLd) * length(t).cast("double"))
    })
    array_join(transform(kept, b => blockText(b)), "\n")
  }

  def newMain(html: Column, minWords: Int = 3, maxLd: Double = 0.33): Column = {
    val blocks = split(regexp_replace(html, hiddenRegionRe, " "), blockBoundaryRe)
    val cleaned = transform(blocks, b => struct(b.as("raw"), blockText(b).as("txt")))
    val kept = filter(cleaned, s => {
      val t = s.getField("txt")
      (size(split(t, " ")) >= minWords) && (t =!= "") &&
        (blockLinkLen(s.getField("raw")).cast("double") <=
          lit(maxLd) * length(t).cast("double"))
    })
    array_join(transform(kept, s => s.getField("txt")), "\n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wsCollapsed = trim(regexp_replace(col("text"), wsRe, " "))
    val docs = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull && size(split(wsCollapsed, " ")) >= 3)
      .select(col("doc_id"), col("text"))
    val page = concat(
      lit("<html><head><title>Doc "), col("doc_id").cast("string"),
      lit(" of the corpus archive</title><style>p{margin:0}</style>" +
        "<script>var beacon = 'analytics payload';</script></head>" +
        "<body><header><h1>Corpus Site Banner Headline</h1></header>" +
        "<nav><a href=\"/\">home page</a> <a href=\"/about\">about " +
        "page</a></nav><!-- hidden comment words -->" +
        "<div><a href=\"/r1\">related article one</a> " +
        "<a href=\"/r2\">related article two</a></div><article><p>"),
      graft.functions.web.encode_entities(col("text")),
      lit("</p><p>doc "), col("doc_id").cast("string"),
      lit(" section 2 content words</p></article>" +
        "<footer>Copyright footer navigation words</footer>" +
        "</body></html>"))

    def run(label: String, c: Column): Double = {
      val df = docs.select(col("doc_id"), c.as("main_text"))
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-6s $s%.3f s")
      s
    }
    // parity first
    val a = docs.select(col("doc_id"), oldMain(page).as("m")).orderBy("doc_id").collect()
    val b = docs.select(col("doc_id"), newMain(page).as("m")).orderBy("doc_id").collect()
    require(a.sameElements(b), "old/new outputs differ!")
    println(s"parity OK over ${a.length} rows")
    // warm both
    run("warm-o", oldMain(page)); run("warm-n", newMain(page))
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 5) { olds += run("OLD", oldMain(page)); news += run("NEW", newMain(page)) }
    println(f"OLD min ${olds.min}%.3f  NEW min ${news.min}%.3f  speedup ${olds.min / news.min}%.2fx")
    spark.stop()
  }
}
