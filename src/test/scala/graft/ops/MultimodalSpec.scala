package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The real-codec invariant behind q61: encoding the closed-form test
  * pattern to PNG via javax.imageio and decoding it back must reproduce
  * the pattern's statistics exactly (PNG is lossless), for any id.
  */
class MultimodalSpec extends AnyFunSuite {

  private def expected(id: Long): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    for (y <- 0 until Multimodal.H; x <- 0 until Multimodal.W) {
      sr += (id * 31 + x * 7 + y * 13) % 256
      sg += (id * 17 + x * 3 + y * 5) % 256
      sb += (id * 11 + x * 13 + y * 7) % 256
    }
    (sr, sg, sb)
  }

  test("PNG encode/decode roundtrip is lossless for the pattern stats") {
    for (id <- Seq(0L, 1L, 7L, 255L, 123456789L)) {
      val bytes = Multimodal.encodePng(id)
      // real PNG container: magic header present
      assert(bytes.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
      val (w, h, sr, sg, sb) = Multimodal.decodePng(bytes)
      val (er, eg, eb) = expected(id)
      assert((w, h) == (Multimodal.W.toLong, Multimodal.H.toLong))
      assert((sr, sg, sb) == (er, eg, eb), s"id=$id")
    }
  }
}
