package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Golden-file + round-trip tests for the RIFF/WAVE 16-bit PCM codec —
  * the [[BmpSpec]] discipline applied to the audio seam: the golden
  * bytes are written out BY HAND from the published layout, so the
  * decoder is checked against the format spec, not against the
  * encoder's own idea of it. */
class WavSpec extends AnyFunSuite {

  test("decode of a hand-written golden WAV recovers format and samples") {
    // 2 samples, mono, 8000 Hz: data size 4, RIFF size 36 + 4 = 40
    val golden = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0,             // PCM
      1, 0,             // mono
      0x40, 0x1f, 0, 0, // 8000 Hz
      0x80, 0x3e, 0, 0, // byte rate 16000
      2, 0,             // block align
      16, 0,            // bits
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      0x34, 0x12,       // sample 0 = 0x1234 = 4660
      0x00, 0x80        // sample 1 = 0x8000 = -32768
    ).map(_.toByte)
    val a = Wav.decode(golden)
    assert(a.sampleRate === 8000)
    assert(a.channels === 1)
    assert(a.samples.toSeq === Seq[Short](4660, -32768))
  }

  test("decode walks extra chunks between fmt and data (RIFF pad rule)") {
    // insert a 3-byte 'LIST' chunk (odd size -> 1 pad byte) before data
    val base = Wav.encode(16000, 1, Array[Short](7, -7, 300))
    val extra = Array[Int]('L', 'I', 'S', 'T', 3, 0, 0, 0,
      'x', 'y', 'z', 0).map(_.toByte)
    val patched = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field (bytes 4-7, LE)
    val total = patched.length - 8
    patched(4) = (total & 0xff).toByte
    patched(5) = ((total >> 8) & 0xff).toByte
    val a = Wav.decode(patched)
    assert(a.samples.toSeq === Seq[Short](7, -7, 300))
  }

  test("encode/decode round-trips samples incl. extremes and empty") {
    for (samples <- Seq(
      Array[Short](0, 1, -1, 32767, -32768, 12345, -12345),
      Array.tabulate[Short](1000)(i => ((i * 1103 + 7) % 65536 - 32768).toShort),
      Array.empty[Short])) {
      val a = Wav.decode(Wav.encode(44100, 1, samples))
      assert(a.sampleRate === 44100 && a.channels === 1)
      assert(a.samples.toSeq === samples.toSeq)
    }
    // stereo interleave preserved
    val st = Wav.decode(Wav.encode(8000, 2, Array[Short](1, -1, 2, -2)))
    assert(st.channels === 2 && st.samples.toSeq === Seq[Short](1, -1, 2, -2))
  }

  test("decode refuses non-WAV and unsupported variants loudly") {
    intercept[IllegalArgumentException](Wav.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](
      Wav.decode("RIFFxxxxNOPE".getBytes ++ new Array[Byte](40)))
    // valid file downgraded to 8-bit must be refused, not misread
    val bad8 = Wav.encode(8000, 1, Array[Short](1, 2))
    bad8(34) = 8
    intercept[IllegalArgumentException](Wav.decode(bad8))
    // non-PCM format code
    val badFmt = Wav.encode(8000, 1, Array[Short](1, 2))
    badFmt(20) = 3
    intercept[IllegalArgumentException](Wav.decode(badFmt))
    // truncated data chunk
    intercept[IllegalArgumentException](
      Wav.decode(Wav.encode(8000, 1, Array[Short](1, 2, 3)).dropRight(2)))
    // hostile chunk size near 2^31: int math would wrap the bound check
    // negative and admit a giant allocation; must refuse loudly
    val hostile = Wav.encode(8000, 1, Array[Short](1, 2))
    // the data-chunk size field lives at bytes 40-43 (after "data" at 36)
    hostile(40) = 0xf6.toByte; hostile(41) = 0xff.toByte
    hostile(42) = 0xff.toByte; hostile(43) = 0x7f.toByte // size 0x7ffffff6
    intercept[IllegalArgumentException](Wav.decode(hostile))
    // torn final frame: stereo data whose sample count isn't divisible
    // by the channel count — encode can never produce it, so decode
    // must refuse it rather than truncate the last frame silently
    val torn = Wav.encode(8000, 2, Array[Short](1, -1, 2, -2))
    // shrink the data chunk (bytes 40-43) and RIFF size (4-7) by one
    // 2-byte sample: 8 -> 6 data bytes = 3 samples over 2 channels
    val tornCut = torn.dropRight(2)
    tornCut(40) = 6; tornCut(4) = (tornCut.length - 8).toByte
    intercept[IllegalArgumentException](Wav.decode(tornCut))
    // data before fmt must not decode with guessed format fields
    val noFmt = Array[Int]('R', 'I', 'F', 'F', 8, 0, 0, 0, 'W', 'A', 'V', 'E',
      'd', 'a', 't', 'a', 2, 0, 0, 0, 1, 0).map(_.toByte)
    intercept[IllegalArgumentException](Wav.decode(noFmt))
  }

  test("fixture render parses back to its generation parameters") {
    // the generator/decoder pair used by q61, checked directly on a text
    val text = "the quick brown fox"
    val samples = Array.tabulate[Short](text.length * 2) { k =>
      (((text.charAt(k % text.length).toInt * 131 + k * 71) % 65536)
        - 32768).toShort
    }
    val a = Wav.decode(Wav.encode(16000, 1, samples))
    assert(a.samples.toSeq === samples.toSeq)
    assert(Wav.encodedSize(samples.length) ===
      Wav.encode(16000, 1, samples).length)
  }
}
