package graft.tools

import graft.sources.Pdf

/** Scratch steady-state microbench for the classic-layout PDF
  * reader/writer pair (the q142 hot path) with Spark, sbt, and JIT
  * warm-up taken OUT of the measurement: synthesize a deterministic
  * corpus once, then time `extractText` (and `synthesize`) over it
  * for many in-JVM iterations and report per-iteration walls. The
  * q142 bench samples are best-of-2 on a cold generated-code cache —
  * run-to-run they mix warm-up modes; this pins the per-document
  * steady-state cost the 100 TB deployment actually pays (JIT warms
  * once per executor, then millions of documents ride the compiled
  * code). Not part of the library surface.
  *
  * Usage: runMain graft.tools.PdfBench [nDocs=500] [iters=12]
  */
object PdfBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(500)
    val iters = args.lift(1).map(_.toInt).getOrElse(12)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
      "xi", "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi",
      "chi", "psi", "omega", "corpus", "document", "sample", "words",
      "page", "text", "token")
    val rnd = new scala.util.Random(42)
    // ~60-word single-line word soup per doc — the sf documents shape
    val docs = (0 until nDocs).map { i =>
      (0 until 60).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ") +
        s" doc $i"
    }
    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    var pdfs: IndexedSeq[Array[Byte]] = null
    val wWalls = (0 until iters).map { _ =>
      timeMs {
        pdfs = docs.zipWithIndex.map { case (t, i) =>
          Pdf.synthesize(Seq(t, s"doc $i page 2"))
        }
      }
    }
    var sink = 0L
    val rWalls = (0 until iters).map { _ =>
      timeMs {
        pdfs.foreach { b =>
          val e = Pdf.extractText(b)
          sink += e.text.length + e.pages
        }
      }
    }
    def stats(w: Seq[Double]) =
      f"min=${w.min}%.1f p50=${w.sorted.apply(w.size / 2)}%.1f " +
        f"first3=${w.take(3).map(x => f"$x%.1f").mkString(",")} " +
        f"last3=${w.takeRight(3).map(x => f"$x%.1f").mkString(",")}"
    println(s"[pdfbench] nDocs=$nDocs iters=$iters sink=$sink")
    println(s"[pdfbench] synthesize ms/iter: ${stats(wWalls)}")
    println(s"[pdfbench] extractText ms/iter: ${stats(rWalls)}")
  }
}
