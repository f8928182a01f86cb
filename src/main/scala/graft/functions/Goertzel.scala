package graft.functions

/** GOERTZEL single-bin spectral analysis — the O(len) per-frequency
  * recurrence every tone detector / feature front-end uses when it wants
  * a handful of bins instead of a full FFT:
  * `s_n = x_n + 2cos(ω)·s_{n-1} − s_{n-2}`, then
  * `X(ω) = (s_{L−1} − e^{−iω} s_{L−2}) · e^{−iω(L−1)}`.
  *
  * Two disciplines, matching the engine's audio hash-gating strategy
  * (q61: exact integer features the DuckDB oracle replays bit-for-bit):
  *
  *  - [[exactBin]]: at the analysis frequencies whose twiddle factors
  *    are EXACT integers — ω = 0 (DC), π/2 (quarter band, e^{−iω} = −i),
  *    π (Nyquist) — the whole recurrence and the final 90°/180° phase
  *    rotations stay in integer arithmetic, so the result EQUALS the
  *    direct DFT sum `Σ x_n e^{−iωn}` exactly and the oracle replays
  *    that sum with ±1/0 coefficient patterns (period 4 and 2). The
  *    algorithm under test (recurrence) and the oracle's formulation
  *    (direct sum) are independent — the differential-oracle strategy.
  *
  *  - [[powerQ15]]: arbitrary bins via the standard FIXED-POINT Q15
  *    coefficient `c = round(2cos(2πk/N)·2¹⁵)` with an arithmetic-shift
  *    recurrence — every operation is integer, so the result is
  *    deterministic across JVMs (StrictMath.cos pins the one
  *    transcendental to its published bit spec). Not oracle-replayable
  *    (the per-sample floor shift is a 256-step recurrence SQL would
  *    have to replay recursively); gated instead by the spec's
  *    differential vs [[exactBin]] at the quarter band (where the Q15
  *    coefficient 0 is exact, so the two must agree EXACTLY) and vs a
  *    double-precision Goertzel at arbitrary bins (relative tolerance).
  *
  * Magnitude headroom (|x| < 2¹⁵, len ≤ 256): the DC recurrence grows
  * as Σ(n−j+1)x_j ≤ len²·2¹⁵ = 2³¹; quarter/Nyquist stay ≤ len·2¹⁵.
  * Powers ≤ 2·(len·2¹⁵)² ≈ 2⁴⁷. All far inside Long. Q15 bins near DC
  * inherit the len² growth times the 2¹⁶ coefficient (≈ 2⁴⁷ before the
  * shift) — still safe, but callers wanting squared power should stay
  * off the extreme-resonance bins the exact path already covers.
  */
object Goertzel {

  /** Exact integer Goertzel at ω = 2π/period for the integer-twiddle
    * periods — 1 (DC), 4 (quarter band), 2 (Nyquist). Returns
    * (re, im) of the direct DFT sum `Σ_{n<len} x_{off+n} e^{−iωn}`,
    * exactly. */
  def exactBin(x: Array[Short], off: Int, len: Int,
               period: Int): (Long, Long) = {
    val c: Long = period match {
      case 1 => 2L   // 2cos(0)
      case 4 => 0L   // 2cos(pi/2)
      case 2 => -2L  // 2cos(pi)
      case p => throw new IllegalArgumentException(
        s"period $p has irrational twiddles; use powerQ15")
    }
    var s1 = 0L
    var s2 = 0L
    var n = 0
    while (n < len) {
      val t = x(off + n) + c * s1 - s2
      s2 = s1
      s1 = t
      n += 1
    }
    if (len == 0) return (0L, 0L)
    period match {
      case 1 => (s1 - s2, 0L) // e^{-i0} = 1; no phase rotation
      case 2 => // e^{-ipi} = -1: X = (s1 + s2) * (-1)^(len-1)
        val re = s1 + s2
        (if ((len - 1) % 2 == 0) re else -re, 0L)
      case 4 => // e^{-ipi/2} = -i: X = (s1 + i*s2) * (-i)^(len-1)
        var re = s1
        var im = s2
        var r = (len - 1) % 4
        while (r > 0) { // multiply by -i: (re, im) -> (im, -re)
          val t = re; re = im; im = -t
          r -= 1
        }
        (re, im)
    }
  }

  /** Fixed-point Q15 Goertzel POWER |X(2πk/N)|² at an arbitrary bin:
    * integer-only recurrence with the quantized coefficient, arithmetic
    * right shift as the Q15 renormalization (floor semantics,
    * deterministic), power via the standard
    * `s1² + s2² − (c·s1 >> 15)·s2` closing identity. */
  def powerQ15(x: Array[Short], off: Int, len: Int, k: Int, n: Int): Long = {
    val c = Math.round(
      2.0 * StrictMath.cos(2.0 * StrictMath.PI * k / n) * (1L << 15))
    var s1 = 0L
    var s2 = 0L
    var i = 0
    while (i < len) {
      val t = x(off + i) + ((c * s1) >> 15) - s2
      s2 = s1
      s1 = t
      i += 1
    }
    s1 * s1 + s2 * s2 - ((c * s1) >> 15) * s2
  }
}
