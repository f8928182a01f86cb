package graft.plans

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsofJoin

/** Randomized differential for the native as-of join: many generated
  * relations, each adversarially dense in the dimensions that broke (or
  * could break) the merge scan — tiny key domains (long runs per key),
  * tiny timestamp domains (massive (key, ts) tie groups), left rows
  * before/after all right rows, keys on one side only. Every dataset is
  * checked native ≡ composed row-for-row. Deterministic seeds so a
  * failure replays. */
class AsofRandomSpec extends SparkSpec {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private val relGen: Gen[(Seq[(Long, Timestamp, Long)],
      Seq[(Long, Timestamp, Long, Long)])] = for {
    nKeys <- Gen.choose(1, 4) // tiny domain: long per-key runs
    nTs <- Gen.choose(1, 6) // tiny domain: many exact ties
    nL <- Gen.choose(0, 40)
    nR <- Gen.choose(0, 40)
    left <- Gen.listOfN(nL, for {
      k <- Gen.choose(1L, nKeys.toLong)
      t <- Gen.choose(0L, nTs.toLong)
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts(t), v))
    right <- Gen.listOfN(nR, for {
      k <- Gen.choose(1L, nKeys.toLong + 1) // +1: right-only keys
      t <- Gen.choose(0L, nTs.toLong)
      a <- Gen.choose(0L, 3L) // tiny: rightCols ties too
      b <- Gen.choose(0L, 1000L)
    } yield (k, ts(t), a, b))
  } yield (left, right)

  test("native ≡ composed over 30 adversarial random relations") {
    import spark.implicits._
    var checked = 0
    for (i <- 0 until 30) {
      val (l, r) = relGen.apply(Gen.Parameters.default, Seed(1337L + i))
        .getOrElse(fail(s"gen $i failed"))
      val left = l.toDF("k", "t", "lv").repartition(5)
      val right = r.toDF("k", "t", "ra", "rb").repartition(3)
      val cols = Seq("ra", "rb")
      val nat = NativeAsofJoin.asof(left, right, "k", "t", cols)
      val comp = AsofJoin.asof(left, right, "k", "t", cols)
      assert(nat.count() === l.size.toLong, s"seed $i: left rows lost")
      val d1 = nat.exceptAll(comp)
      val d2 = comp.exceptAll(nat)
      assert(d1.isEmpty && d2.isEmpty,
        s"seed $i diverged; native-only:\n${d1.collect().mkString("\n")}\n" +
          s"composed-only:\n${d2.collect().mkString("\n")}")
      checked += 1
    }
    assert(checked === 30)
  }
}
