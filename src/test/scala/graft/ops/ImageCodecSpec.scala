package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** m13's real codec seam: PNG encode (javax.imageio) must round-trip the
  * payload bytes losslessly through the sniffed decode, and the extracted
  * pixel stats must equal the direct byte stats the DuckDB oracle
  * recomputes from the text. */
class ImageCodecSpec extends AnyFunSuite with Matchers {

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("encodePng produces a sniffable PNG (magic bytes + ImageIO reader)") {
    val png = Multimodal.encodePng(bytes("hello, multimodal world"))
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A
    png.take(8).map(_ & 0xff).toSeq shouldBe
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val f = Multimodal.decodeImage(png)
    assert(f.exists(_.decoded))
  }

  test("decode stats equal direct byte stats (oracle parity), padding included") {
    for (s <- Seq("", "a", "x" * 31, "y" * 32, "z" * 33,
        "The quick brown fox jumps over the lazy dog. " * 9)) {
      val b = bytes(s)
      val f = Multimodal.decodeImage(Multimodal.encodePng(b)).get
      val expectedH = math.max(1, (b.length + 31) / 32)
      assert(f.width == 32 && f.height == expectedH, s"dims for len=${b.length}")
      assert(f.px_sum == b.map(_ & 0xffL).sum, s"sum for len=${b.length}")
      assert(f.px_max == (if (b.isEmpty) 0L else b.map(_ & 0xffL).max),
        s"max for len=${b.length}")
    }
  }

  test("non-image payloads return None (fallback path stays reachable)") {
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }
}
