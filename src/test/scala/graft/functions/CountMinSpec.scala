package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the count-min sketch aggregate's three load-bearing properties:
  * the structural over-count guarantee (est >= true for EVERY key — what
  * makes the heavy-hitter prefilter sound), bit-parity between the JVM
  * update hash and the built-in-SQL probe expression (one drifting bit
  * silently mis-routes every probe), and mergeability (the distributed
  * partial/final path is vector addition). */
class CountMinSpec extends SparkSpec {

  private val W = 64 // small width so collisions actually occur

  private def jvmDigest(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  test("JVM rowIndex ≡ the SQL probe expression, all four rows") {
    import spark.implicits._
    val keys = Seq("table", "scan join", "a", "", "Zß漢 mixed",
      "x" * 300) ++ (0 until 50).map(i => s"key$i")
    val df = keys.toDF("k")
    val probes = (0 until CountMinAgg.Depth).map { j =>
      ((conv(substring(md5(col("k")), j * 8 + 1, 8), 16, 10)
        .cast("long") % W) + 0).cast("int").as(s"i$j")
    }
    val got = df.select(col("k") +: probes: _*).collect()
      .map(r => r.getString(0) -> (0 until CountMinAgg.Depth)
        .map(j => r.getInt(j + 1)))
    got.foreach { case (k, idxs) =>
      val d = jvmDigest(k)
      val want = (0 until CountMinAgg.Depth)
        .map(j => CountMinAgg.rowIndex(d, j, W))
      assert(idxs === want, s"hash drift for key '$k'")
    }
  }

  test("estimates over-count, never under-count, and row sums equal N") {
    import spark.implicits._
    // zipfian-ish synthetic stream with guaranteed collisions at W=64
    val stream = (0 until 2000).map(i => s"k${i % 150}") ++
      (0 until 500).map(_ => "hot") ++ (0 until 90).map(_ => "warm")
    val df = stream.toDF("k")
    val flat = df.agg(CountMinAgg.sketch(col("k"), W)).head
      .getSeq[Long](0).toArray
    val rows = flat.grouped(W).toArray
    assert(rows.forall(_.sum === stream.length.toLong),
      "every CMS row must sum to N")
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val overs = exact.map { case (k, c) =>
      val d = jvmDigest(k)
      val est = (0 until CountMinAgg.Depth)
        .map(j => rows(j)(CountMinAgg.rowIndex(d, j, W))).min
      assert(est >= c, s"CMS under-counted '$k': est $est < true $c")
      est - c
    }
    // with 151 keys in 64 counters collisions are certain — the MIN rule
    // should still keep inflation far below a row's average load
    assert(overs.exists(_ > 0), "test isn't exercising collisions")
    assert(overs.max <= stream.length / 4,
      s"implausible inflation ${overs.max} — min rule broken?")
  }

  test("sketch(A ++ B) ≡ sketch(A) + sketch(B) (the merge contract)") {
    import spark.implicits._
    val a = (0 until 400).map(i => s"k${i % 37}")
    val b = (0 until 300).map(i => s"k${i % 53}")
    def sk(xs: Seq[String]): Array[Long] =
      xs.toDF("k").agg(CountMinAgg.sketch(col("k"), W)).head
        .getSeq[Long](0).toArray
    val whole = sk(a ++ b)
    val summed = sk(a).zip(sk(b)).map { case (x, y) => x + y }
    assert(whole.toSeq === summed.toSeq)
  }

  test("the distributed prefilter is a superset of the truth and small") {
    // the q102 shape in miniature: candidates = keys whose estimate
    // clears T must contain every true heavy hitter; collisions may add
    // a few false positives, which the exact verify removes
    import spark.implicits._
    // N = 4000, T = 400; hh1/hh2 clear it, every k* sits at 15
    val stream = (0 until 3000).map(i => s"k${i % 200}") ++
      (0 until 550).map(_ => "hh1") ++ (0 until 450).map(_ => "hh2")
    val df = stream.toDF("k").repartition(7) // force partial/final merge
    val flat = df.agg(CountMinAgg.sketch(col("k"), W)).head
      .getSeq[Long](0).toArray
    val rows = flat.grouped(W).toArray
    val n = rows(0).sum
    val t = n / 10
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val truth = exact.collect { case (k, c) if c >= t => k }.toSet
    val candidates = exact.keySet.filter { k =>
      val d = jvmDigest(k)
      (0 until CountMinAgg.Depth)
        .map(j => rows(j)(CountMinAgg.rowIndex(d, j, W))).min >= t
    }
    assert(truth === Set("hh1", "hh2"))
    assert(truth.subsetOf(candidates), "prefilter dropped a true heavy hitter")
    assert(candidates.size <= exact.size / 4,
      s"prefilter admitted ${candidates.size} of ${exact.size} keys")
  }
}
