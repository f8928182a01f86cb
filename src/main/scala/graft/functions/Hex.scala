package graft.functions

/** Lowercase hex rendering of a byte array — byte-identical to
  * `bytes.map("%02x".format(_)).mkString`, which the multimodal
  * closures used per byte: `String.format` costs ~a microsecond per
  * call (locale lookup, format parsing, boxing), so hex-ing a corpus
  * of payload slices dominated the whole query (q37 measured ~2.4M
  * format calls per run). A char-table encoder is the standard
  * replacement; outputs are identical by construction, and
  * MultimodalSpec's hash gates pin it.
  */
object Hex {
  private val digits = "0123456789abcdef".toCharArray

  def lower(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = digits(b >>> 4)
      out(2 * i + 1) = digits(b & 0xf)
      i += 1
    }
    new String(out)
  }
}
