package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codec for UNCOMPRESSED 24-bpp Windows BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER, the public format every image tool writes with
  * `compression = BI_RGB`): the REAL codec behind the multimodal seam
  * (round-8 verdict gap #5 — the decode step was a deterministic stub).
  * No media libraries ship in this environment, but BMP needs none: the
  * format is little-endian header fields plus raw pixel rows, so a full
  * encoder/decoder is ~60 lines of byte arithmetic, and q27/q41/q38 can
  * parse genuine image bytes end-to-end with the DuckDB oracle replaying
  * the pixel content formula.
  *
  * Layout facts this codec implements (and the spec pins on a
  * hand-written golden file):
  *  - 14-byte file header: "BM", file size (LE u32), two reserved u16s,
  *    pixel-data offset (LE u32, 54 here);
  *  - 40-byte info header: header size 40, width (i32), height (i32 —
  *    POSITIVE means bottom-up row order, negative top-down), planes 1,
  *    bpp 24, compression 0 (BI_RGB), image size, 2835 px/m resolutions,
  *    0 palette entries;
  *  - each pixel row is `width*3` BGR bytes padded with zeros to a
  *    4-byte boundary (`stride = ceil(w*3/4)*4`); rows are stored
  *    bottom-up, so decoding must FLIP them to recover raster order.
  *
  * [[decode]] returns pixels in top-down raster order — the natural
  * order every consumer (histogram, resize, model input) wants — so the
  * row flip and padding skip are exactly what the decoder proves. */
object Bmp {

  /** A decoded image: dimensions plus the pixel array in top-down
    * raster order (height*width*3 bytes, BGR as stored). */
  final case class Image(width: Int, height: Int, bpp: Int,
                         pixels: Array[Byte])

  val HeaderBytes = 54 // 14 (file header) + 40 (BITMAPINFOHEADER)

  /** Row byte stride: pixel bytes padded to a 4-byte boundary. */
  def stride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Total encoded size for a width×height 24-bpp image. */
  def encodedSize(width: Int, height: Int): Int =
    HeaderBytes + stride(width) * height

  /** Encode raster-order pixels (top-down, width*height*3 bytes) as a
    * standard bottom-up 24-bpp BMP. */
  def encode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(pixels.length == width * height * 3,
      s"pixel array ${pixels.length} != ${width}x$height x3")
    val rowStride = stride(width)
    val size = encodedSize(width, height)
    val b = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
      .putInt(size).putShort(0).putShort(0).putInt(HeaderBytes)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(rowStride * height)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = height - 1 // bottom-up storage
    while (row >= 0) {
      b.put(pixels, row * width * 3, width * 3)
      var p = width * 3
      while (p < rowStride) { b.put(0.toByte); p += 1 }
      row -= 1
    }
    b.array()
  }

  /** Header-only parse: validate the container exactly as [[decode]]
    * does (magic, DIB size, plane count, 24-bpp BI_RGB, pixel-array
    * bounds) and return the dimensions WITHOUT allocating or copying
    * the raster. This is the decode the metadata-only consumers (q41's
    * resize planning) want: at real media sizes [[decode]] materializes
    * megabytes per record that a dims-only query immediately discards.
    * Shares [[decode]]'s validation helper so the two parses can never
    * accept different byte streams. */
  def decodeDims(payload: Array[Byte]): (Int, Int) = {
    val (width, height, _, _) = validateHeader(payload)
    (width, height)
  }

  /** Shared container validation: returns (width, height, bottomUp,
    * dataOffset) or throws the same loud errors [[decode]] always has. */
  private def validateHeader(payload: Array[Byte]): (Int, Int, Boolean, Int) = {
    def u16(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def i32(o: Int) = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8) |
      ((payload(o + 2) & 0xff) << 16) | ((payload(o + 3) & 0xff) << 24)
    require(payload.length >= HeaderBytes &&
      payload(0) == 'B'.toByte && payload(1) == 'M'.toByte,
      "not a BMP: bad magic or truncated header")
    val dataOffset = i32(10)
    val dibSize = i32(14)
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = i32(18)
    val heightRaw = i32(22)
    val bottomUp = heightRaw > 0
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0, s"bad dimensions ${width}x$heightRaw")
    require(u16(26) == 1, s"bad plane count ${u16(26)}")
    val bpp = u16(28)
    require(bpp == 24, s"only uncompressed 24-bpp supported, got $bpp")
    require(i32(30) == 0, s"compressed BMP (method ${i32(30)}) unsupported")
    val rowStride = stride(width)
    require(dataOffset >= HeaderBytes &&
      payload.length.toLong >= dataOffset.toLong + rowStride.toLong * height,
      s"truncated pixel array: ${payload.length} bytes, need " +
        s"${dataOffset + rowStride * height}")
    (width, height, bottomUp, dataOffset)
  }

  /** Parse an uncompressed 24-bpp BMP. Honors the header's pixel-data
    * offset (tools may insert gap bytes), both row orders (positive
    * height = bottom-up, negative = top-down), and row padding; refuses
    * — loudly, this is a decode seam — anything that is not plain
    * BI_RGB 24-bpp (compressed/paletted/16-bpp variants would need the
    * rest of the format family). */
  def decode(payload: Array[Byte]): Image = {
    val (width, height, bottomUp, dataOffset) = validateHeader(payload)
    val rowStride = stride(width)
    val out = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      val srcRow = if (bottomUp) height - 1 - row else row
      System.arraycopy(payload, dataOffset + srcRow * rowStride,
        out, row * width * 3, width * 3)
      row += 1
    }
    Image(width, height, 24, out) // validateHeader only admits 24-bpp
  }
}
