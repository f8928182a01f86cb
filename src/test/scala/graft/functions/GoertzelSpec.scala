package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Goertzel recurrence vs the direct DFT sum — two independent
  * formulations of Σ x_n e^{−iωn} that must agree exactly at the
  * integer-twiddle frequencies (every phase-rotation branch of the
  * closing identity exercised via len % 4), and the fixed-point Q15
  * variant gated against both the exact path (quarter band, where the
  * Q15 coefficient is exact) and a double-precision reference. */
class GoertzelSpec extends AnyFunSuite {

  /** Deterministic pseudo-audio: the wav fixture's formula shape. */
  private def sig(len: Int, seed: Int): Array[Short] =
    Array.tabulate(len)(k =>
      ((((seed + 7) * 131 + k * 71) * (k % 5 + 1)) % 65536 - 32768).toShort)

  /** The direct sums the DuckDB oracle runs: ±1/0 coefficient patterns. */
  private def direct(x: Array[Short], off: Int, len: Int,
                     period: Int): (Long, Long) = period match {
    case 1 => ((off until off + len).map(i => x(i).toLong).sum, 0L)
    case 2 => ((0 until len).map(n =>
      x(off + n).toLong * (if (n % 2 == 0) 1 else -1)).sum, 0L)
    case 4 =>
      val re = (0 until len).map(n => (n % 4) match {
        case 0 => x(off + n).toLong
        case 2 => -x(off + n).toLong
        case _ => 0L
      }).sum
      val im = (0 until len).map(n => (n % 4) match {
        case 1 => -x(off + n).toLong
        case 3 => x(off + n).toLong
        case _ => 0L
      }).sum
      (re, im)
  }

  test("exactBin == direct DFT sum at DC/quarter/Nyquist for every " +
      "phase-rotation residue (len % 4), offsets, and edge lengths") {
    for (seed <- 0 until 6; len <- Seq(0, 1, 2, 3, 4, 5, 7, 64, 255, 256);
         period <- Seq(1, 2, 4)) {
      val x = sig(300, seed)
      val off = seed % 3
      assert(Goertzel.exactBin(x, off, len, period) ===
        direct(x, off, len, period),
        s"seed=$seed len=$len period=$period")
    }
  }

  test("extreme samples (all ±32767/-32768) stay exact at full window") {
    val hi = Array.fill[Short](256)(32767)
    val lo = Array.fill[Short](256)(-32768)
    for (x <- Seq(hi, lo); period <- Seq(1, 2, 4))
      assert(Goertzel.exactBin(x, 0, 256, period) === direct(x, 0, 256, period))
  }

  test("powerQ15 at the quarter band (coefficient exactly 0 in Q15) " +
      "equals the exact path's re^2 + im^2") {
    for (seed <- 0 until 4; len <- Seq(64, 255, 256)) {
      val x = sig(256, seed)
      val (re, im) = Goertzel.exactBin(x, 0, len, 4)
      assert(Goertzel.powerQ15(x, 0, len, k = 64, n = 256) ===
        re * re + im * im, s"seed=$seed len=$len")
    }
  }

  test("powerQ15 at arbitrary mid-band bins tracks a double-precision " +
      "Goertzel within quantization tolerance") {
    def powerDouble(x: Array[Short], len: Int, k: Int, n: Int): Double = {
      val c = 2.0 * StrictMath.cos(2.0 * StrictMath.PI * k / n)
      var s1 = 0.0; var s2 = 0.0
      for (i <- 0 until len) { val t = x(i) + c * s1 - s2; s2 = s1; s1 = t }
      s1 * s1 + s2 * s2 - c * s1 * s2
    }
    for (seed <- 0 until 4; k <- Seq(19, 37, 64, 97, 110)) {
      val x = sig(256, seed)
      val exact = powerDouble(x, 256, k, 256)
      val q15 = Goertzel.powerQ15(x, 0, 256, k, 256).toDouble
      val scale = math.max(math.abs(exact), 1e6)
      assert(math.abs(q15 - exact) / scale < 0.02,
        s"seed=$seed k=$k: q15=$q15 exact=$exact")
    }
  }
}
