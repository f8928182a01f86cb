package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Randomized ground-truth check for the bisection quantiles: random
  * multisets dense in duplicates and spikes (the shapes that stress
  * bucket-boundary handling), every percentile checked against the
  * sorted array at a collect limit small enough to force several
  * histogram rounds. Deterministic seeds so a failure replays. */
class QuantileRandomSpec extends SparkSpec {

  private val dataGen: Gen[List[Double]] = for {
    n <- Gen.choose(50, 3000)
    // small value domain → heavy duplication; occasional huge outlier
    xs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.choose(0, 40).map(_.toDouble),
      2 -> Gen.choose(-1000000, 1000000).map(_ / 97.0),
      1 -> Gen.oneOf(1e12, -1e12, 0.0)))
  } yield xs

  test("global bisection matches sorted ground truth on 12 random multisets") {
    import spark.implicits._
    for (i <- 0 until 12) {
      val data = dataGen.apply(Gen.Parameters.default, Seed(4242L + i))
        .getOrElse(fail(s"gen $i failed"))
      val sorted = data.sorted
      val df = data.toDF("value").repartition(6)
      val n = data.length.toLong
      for (p <- Seq(1, 25, 50, 75, 99, 100)) {
        val target = (n * p + 99) / 100
        val got = RelationalQueries.quantileByBisect(
          df, n, sorted.head, sorted.last, target, collectLimit = 30L)
        assert(got === sorted(target.toInt - 1),
          s"seed $i p$p: got $got want ${sorted(target.toInt - 1)}")
      }
    }
  }

  test("grouped bisection matches ground truth on random group layouts") {
    import spark.implicits._
    val g = for {
      nGroups <- Gen.choose(1, 6)
      rows <- Gen.listOfN(800, for {
        grp <- Gen.choose(1, nGroups).map(i => s"g$i")
        v <- Gen.frequency(5 -> Gen.choose(0L, 30L), 1 -> Gen.choose(-9999L, 9999L))
      } yield (grp, v))
    } yield rows
    for (i <- 0 until 8) {
      val data = g.apply(Gen.Parameters.default, Seed(777L + i))
        .getOrElse(fail(s"gen $i failed"))
      val pcts = Seq(10, 50, 90)
      val got = RelationalQueries.groupedQuantiles(
        data.toDF("g", "v").repartition(5), pcts, collectLimit = 25L).toSet
      val want = (for {
        (grp, rows) <- data.groupBy(_._1)
        vs = rows.map(_._2).sorted
        p <- pcts
      } yield (grp, p, vs(((vs.length.toLong * p + 99) / 100).toInt - 1))).toSet
      assert(got === want, s"seed $i grouped mismatch")
    }
  }

  test("grouped bisection over the full Long domain (overflow regression)") {
    import spark.implicits._
    // the round-11 advice item: the old bucket index multiplied
    // (v - lo) * 256 and wrapped once a group's range passed ~3.6e16 —
    // these groups span the ENTIRE Long domain (range ~1.8e19, with the
    // exact Min/Max endpoints present), so a wrapping index either
    // crashes the descent ("lost rank") or lands ranks in wrong buckets
    val rnd = new scala.util.Random(31337)
    val extremes = Seq(Long.MinValue, Long.MaxValue, Long.MinValue + 1,
      Long.MaxValue - 1, 0L, -1L, 1L)
    val data: Seq[(String, Long)] =
      extremes.map("full" -> _) ++
        (1 to 400).map(_ => "full" -> rnd.nextLong()) ++
        (1 to 300).map(_ => "hi" ->
          (Long.MaxValue - rnd.nextInt(1 << 20).toLong)) ++
        (1 to 300).map(_ => "wide" ->
          (rnd.nextLong() >> rnd.nextInt(40)))
    val pcts = Seq(1, 50, 99)
    val got = RelationalQueries.groupedQuantiles(
      data.toDF("g", "v").repartition(7), pcts, collectLimit = 20L).toSet
    val want = (for {
      (grp, rows) <- data.groupBy(_._1)
      vs = rows.map(_._2).sorted
      p <- pcts
    } yield (grp, p, vs(((vs.length.toLong * p + 99) / 100).toInt - 1))).toSet
    assert(got === want, "full-Long-domain grouped quantiles mismatch")
  }
}
