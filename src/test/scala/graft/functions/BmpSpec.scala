package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalPipeline

/** Codec contracts for the pure-JVM BMP parser. The golden-file test is
  * the anti-circularity anchor: encode/decode could share a layout bug
  * and still round-trip, so the decoder is ALSO pinned against a BMP
  * written out literally, byte by byte, from the published format spec
  * (little-endian headers, 4-byte row padding, bottom-up rows). */
class BmpSpec extends AnyFunSuite {

  test("decode of a hand-written golden BMP recovers raster order") {
    // 2x2, 24-bpp: raster pixels (top-down, BGR)
    //   row 0: (1,2,3) (4,5,6)
    //   row 1: (7,8,9) (10,11,12)
    // stride = ceil(6/4)*4 = 8 -> 2 pad bytes per row; stored BOTTOM-UP,
    // so the file's first pixel row is raster row 1.
    val golden: Array[Byte] = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header (size 54+16=70)
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, // DIB: 40, w=2, h=2, planes, bpp
      0, 0, 0, 0, 16, 0, 0, 0, 19, 11, 0, 0, 19, 11, 0, 0, // BI_RGB, image size, 2835 dpi
      0, 0, 0, 0, 0, 0, 0, 0, // palette counts
      7, 8, 9, 10, 11, 12, 0, 0, // bottom row first (+2 pad)
      1, 2, 3, 4, 5, 6, 0, 0 // top row (+2 pad)
    ).map(_.toByte)
    val img = Bmp.decode(golden)
    assert(img.width === 2 && img.height === 2 && img.bpp === 24)
    assert(img.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("decode honors negative height (top-down storage)") {
    // same golden file, height = -2 and pixel rows NOT flipped
    val topDown: Array[Byte] = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0, 2, 0, 0, 0, 0xFE, 0xFF, 0xFF, 0xFF, 1, 0, 24, 0, // h = -2
      0, 0, 0, 0, 16, 0, 0, 0, 19, 11, 0, 0, 19, 11, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0,
      1, 2, 3, 4, 5, 6, 0, 0, // raster row 0 stored first
      7, 8, 9, 10, 11, 12, 0, 0
    ).map(_.toByte)
    val img = Bmp.decode(topDown)
    assert(img.height === 2)
    assert(img.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
  }

  test("encode/decode round-trips arbitrary dimensions incl. padded strides") {
    // width 3 (stride 12, no pad) and width 5 (stride 16, 1 pad byte)
    for ((w, h) <- Seq((3, 2), (5, 4), (4, 1), (19, 15))) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
      val img = Bmp.decode(Bmp.encode(w, h, px))
      assert(img.width === w && img.height === h, s"${w}x$h")
      assert(img.pixels.toSeq === px.toSeq, s"${w}x$h raster mismatch")
    }
  }

  test("decode refuses non-BMP and unsupported variants loudly") {
    intercept[IllegalArgumentException](Bmp.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Bmp.decode("XX".getBytes ++ new Array[Byte](60)))
    // valid file downgraded to 8-bpp must be refused, not misread
    val bad = Bmp.encode(2, 2, new Array[Byte](12))
    bad(28) = 8
    intercept[IllegalArgumentException](Bmp.decode(bad))
    // truncated pixel array
    val trunc = Bmp.encode(4, 4, new Array[Byte](48)).dropRight(5)
    intercept[IllegalArgumentException](Bmp.decode(trunc))
  }

  test("decodeDims agrees with decode and rejects the same byte streams") {
    // the header-only parse (q41's dims-only seam) must accept exactly
    // what decode accepts and report the same dimensions, with no
    // raster copy — shared validateHeader makes divergence impossible,
    // this pins the contract from outside
    for ((w, h) <- Seq((3, 2), (5, 4), (4, 1), (19, 15))) {
      val enc = Bmp.encode(w, h, Array.tabulate(w * h * 3)(_.toByte))
      assert(Bmp.decodeDims(enc) === (w, h))
    }
    intercept[IllegalArgumentException](Bmp.decodeDims(Array[Byte](1, 2, 3)))
    val bad = Bmp.encode(2, 2, new Array[Byte](12))
    bad(28) = 8
    intercept[IllegalArgumentException](Bmp.decodeDims(bad))
    val trunc = Bmp.encode(4, 4, new Array[Byte](48)).dropRight(5)
    intercept[IllegalArgumentException](Bmp.decodeDims(trunc))
  }

  test("fixture render parses back to its generation parameters") {
    // the generator/decoder pair used by q27/q41/q38, checked directly
    // on a text: dims from bmpDims, pixels recovered exactly
    val text = "the quick brown fox jumps over the lazy dog"
    val (w, h) = MultimodalPipeline.bmpDims(text.length)
    val px = MultimodalPipeline.bmpPixels(text, w, h)
    val img = Bmp.decode(Bmp.encode(w, h, px))
    assert((img.width, img.height) === (w, h))
    assert(img.pixels.toSeq === px.toSeq)
    assert(Bmp.encodedSize(w, h) === Bmp.encode(w, h, px).length)
  }
}
