package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RelationalQueries

/** The bottom-k quantile sketch (q123): merge-order invariance (the
  * property that licenses the hash-checked oracle), the exact-small-group
  * contract, and the rank-error bound against an exact ground truth on
  * data large enough that sampling genuinely engages. */
class QuantileSketchSpec extends SparkSpec {

  private val hashCol =
    conv(substring(md5(col("id").cast("string")), 1, 15), 16, 10)
      .cast("long")

  test("merge-order invariance: identical sample across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(1301)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100000).toLong))
    def sketchOf(parts: Int): Map[String, Seq[Long]] = {
      val df = rows.toDF("id", "v").repartition(parts)
      df.select(lit("g").as("g"), hashCol.as("h"), col("v"))
        .groupBy("g")
        .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 128).as("s"))
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    }
    val one = sketchOf(1)
    assert(one("g").length === 128)
    for (p <- Seq(3, 7, 32))
      assert(sketchOf(p) === one,
        s"sample differs at $p partitions — merge order leaked into it")
  }

  test("small groups return every value sorted: estimates are exact") {
    import spark.implicits._
    val df = Seq(("a", 1L, 30L), ("a", 2L, 10L), ("a", 3L, 20L),
      ("b", 4L, 5L)).toDF("g", "id", "v")
    val got = df.select(col("g"), hashCol.as("h"), col("v"))
      .groupBy("g")
      .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 256).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("a") === Seq(10L, 20L, 30L))
    assert(got("b") === Seq(5L))
  }

  test("hash collisions cannot make the sample order-dependent") {
    import spark.implicits._
    // every row carries the SAME hash: the kept multiset must be the k
    // smallest (hash, value) pairs — i.e. the k smallest values — no
    // matter how the rows are partitioned
    val rows = (1L to 200L).map(i => (i, 1000L - i))
    def run(parts: Int): Seq[Long] =
      rows.toDF("id", "v").repartition(parts)
        .select(lit("g").as("g"), lit(7L).as("h"), col("v"))
        .groupBy("g")
        .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 16).as("s"))
        .head.getSeq[Long](1)
    val want = rows.map(_._2).sorted.take(16)
    assert(run(1) === want)
    assert(run(13) === want)
  }

  test("rank error vs exact ground truth within the 1/sqrt(k) regime") {
    import spark.implicits._
    // 40k skewed values, k=256: sampling engages at ~0.6% rate; the
    // estimate's true rank must sit within 5/sqrt(k) ~ 0.31 of the
    // target (generous w.h.p. bound; the sketch is deterministic given
    // the hash, so this assertion is stable) — and typically far closer
    val rnd = new scala.util.Random(9090)
    val values = (1L to 40000L).map(i =>
      (i, math.round(math.pow(rnd.nextDouble(), 3) * 1e6)))
    val sorted = values.map(_._2).sorted
    val n = sorted.length
    val got = values.toDF("id", "v")
      .select(lit("g").as("g"), hashCol.as("h"), col("v"))
      .groupBy("g")
      .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 256).as("s"))
      .select(explode(typedLit(Seq(50, 95))).as("pct"),
        element_at(col("s"),
          expr("CAST((size(s) * pct + 99) DIV 100 AS INT)")).as("est"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    for ((pct, est) <- got) {
      // true rank of the estimate (upper rank among duplicates)
      val rank = sorted.count(_ <= est).toDouble / n
      val err = math.abs(rank - pct / 100.0)
      assert(err <= 5.0 / math.sqrt(256),
        s"p$pct estimate $est has rank error $err")
      assert(err > 0 || n <= 256, "suspiciously exact at this scale")
    }
  }

  test("q123 on the fixture: sample_n == min(group, k); estimates exact " +
      "when the sample holds the whole group") {
    val feats = graft.operators.TextQueries.docFeatures(spark, sfDir)
      .select(col("lang"), col("token_cnt").cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byLang = feats.groupBy(_._1).map { case (l, vs) =>
      l -> vs.map(_._2).sorted
    }
    val got = RelationalQueries.q123SketchQuantiles(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    for (((lang, pct), (est, m)) <- got) {
      val vs = byLang(lang)
      assert(m === math.min(vs.length, 256).toLong,
        s"$lang sample_n drift")
      if (vs.length <= 256) {
        val want = vs(((vs.length * pct + 99) / 100 - 1).toInt)
        assert(est === want, s"$lang p$pct: small group must be exact")
      }
    }
  }

  test("sketchPairs: pair content's values == the value sketch, and " +
      "re-aggregating pairs reproduces the direct sketch (merge)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9177)
    val rows = (1L to 4000L).map(i => (i, rnd.nextInt(50000).toLong))
    val df = rows.toDF("id", "v")
      .select(lit("g").as("g"), hashCol.as("h"), col("v"))
    val direct = df.groupBy("g")
      .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 128).as("s"))
      .head().getSeq[Long](1)
    val pairs = df.groupBy("g")
      .agg(QuantileSketchAgg.sketchPairs(col("h"), col("v"), 128).as("s"))
      .select(explode(col("s")).as("p"))
      .select(col("p.h").as("h"), col("p.v").as("v"))
    assert(pairs.collect().map(_.getLong(1)).sorted.toSeq === direct)
    // the merge theorem at the API level: sketching the emitted pairs
    // again (even under a different grouping en route) == the direct
    // sketch of the raw rows
    val resketched = pairs.repartition(7)
      .select(lit("g").as("g"), col("h"), col("v"))
      .groupBy("g")
      .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 128).as("s"))
      .head().getSeq[Long](1)
    assert(resketched === direct)
  }

  test("q141's window merge == direct whole-window sketch (multi-sketch " +
      "merge correctness at the query level)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7411)
    // 20 days x 600 events: windows hold ~4200 rows >> k=256, so the
    // merge path genuinely subsamples; a merge bug cannot hide
    val rows = for {
      d <- 1 to 20; i <- 1 to 600
    } yield (java.sql.Date.valueOf(f"2024-03-$d%02d"),
      d * 100000L + i, rnd.nextInt(100000).toLong)
    val base = rows.toDF("day", "id", "v")
      .select(col("day"), hashCol.as("h"), col("v"))
    val got = RelationalQueries.slidingQuantilesOf(base).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.size === 40)
    // direct twin: one sketch over each window's RAW rows (no daily
    // level) — the merged path must match it exactly
    val days = rows.map(_._1).distinct
    for (end <- days) {
      val winRows = base.where(col("day").between(date_sub(lit(end), 6),
          lit(end)))
        .select(lit("g").as("g"), col("h"), col("v"))
      val direct = winRows.groupBy("g")
        .agg(QuantileSketchAgg.sketch(col("h"), col("v"), 256).as("s"))
        .head().getSeq[Long](1)
      for (pct <- Seq(50, 95)) {
        val (est, m) = got((end.toString, pct))
        assert(m === direct.length.toLong, s"$end sample_n drift")
        assert(est === direct(((direct.length * pct + 99) / 100 - 1)),
          s"$end p$pct merged != direct")
      }
    }
  }
}
