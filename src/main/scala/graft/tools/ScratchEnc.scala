package graft.tools

import java.io.ByteArrayOutputStream
import java.util.concurrent.{Callable, Executors}

import graft.operators.Images

/** Throwaway: ImageIO.write vs cached-writer encode, 1 and 32 threads. */
object ScratchEnc {
  def refEncode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    javax.imageio.ImageIO.write(img, fmt, mos)
    mos.close()
    bos.toByteArray
  }

  def img(seed: Long): java.awt.image.BufferedImage = {
    val i = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 32) { var x = 0; while (x < 32) {
      i.setRGB(x, y, (graft.functions.Bits.mix64(seed ^ (x << 8) ^ y) & 0xFFFFFF).toInt)
      x += 1 }; y += 1 }
    i
  }

  def main(args: Array[String]): Unit = {
    val n = 2000
    def bench(label: String, fmt: String, f: (java.awt.image.BufferedImage, String) => Array[Byte]): Unit = {
      // warm
      for (s <- 0 until 200) f(img(s), fmt)
      val t0 = System.nanoTime()
      for (s <- 0 until n) f(img(s), fmt)
      val one = (System.nanoTime() - t0) / 1e9
      // 32 threads
      val pool = Executors.newFixedThreadPool(32)
      val t1 = System.nanoTime()
      val futs = (0 until 32).map { t => pool.submit(new Runnable {
        override def run(): Unit = { for (s <- 0 until n / 4) f(img(t * 1000 + s), fmt) }
      }) }
      futs.foreach(_.get())
      val many = (System.nanoTime() - t1) / 1e9
      pool.shutdown()
      println(f"$label%-22s $fmt  1thr: $one%.2f s/${n}  32thr: $many%.2f s/${32 * n / 4}")
    }
    for (fmt <- Seq("jpg", "png")) {
      bench("ImageIO.write", fmt, refEncode)
      bench("cached encodeImage", fmt, Images.encodeImage)
      bench("ImageIO.write", fmt, refEncode)
      bench("cached encodeImage", fmt, Images.encodeImage)
    }
    // interleaved encode+decode, the real pipeline shape (syntheticAvi
    // encodes frames; frameSignatures decodes them on the same
    // executor threads, through the cached READER either way)
    def benchED(label: String, f: (java.awt.image.BufferedImage, String) => Array[Byte]): Unit = {
      def work(seed: Long, n: Int): Long = {
        var acc = 0L
        for (s <- 0 until n) {
          val bytes = f(img(seed + s), "jpg")
          acc ^= Images.decodeGray(bytes).map(_._3(0).toLong).getOrElse(0L)
        }
        acc
      }
      work(99000, 200) // warm
      val t0 = System.nanoTime(); work(0, 2000)
      val one = (System.nanoTime() - t0) / 1e9
      val pool = Executors.newFixedThreadPool(32)
      val t1 = System.nanoTime()
      val futs = (0 until 32).map { t => pool.submit(new Callable[Long] {
        override def call(): Long = work(t * 1000L, 500)
      }) }
      futs.foreach(_.get())
      val many = (System.nanoTime() - t1) / 1e9
      pool.shutdown()
      println(f"$label%-22s enc+dec jpg  1thr: $one%.2f s/2000  32thr: $many%.2f s/16000")
    }
    for (_ <- 1 to 2) {
      benchED("ImageIO.write", refEncode)
      benchED("cached encodeImage", Images.encodeImage)
    }
  }
}
