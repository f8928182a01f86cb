package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q140 (curation pipeline v3) — the composition proof the verdict
  * pattern demands: every stage replayed independently in plain JVM
  * code (trim → tokenize → MAD gate → survivor deciles → exact-count
  * sample) and compared row-for-row, plus stage-count pins against the
  * STANDALONE queries the pipeline composes (trimmedFeatures vs
  * docFeatures on span-free docs, hv vs q127's hash, per-lang sample
  * size == ceil(rate·survivors)). */
class CurationV3Spec extends SparkSpec {

  /** The reference tokenizer's count (lower → split [^a-z0-9]+ → drop
    * empties; the 255-char cap never changes the COUNT). */
  private def tokCount(text: String): Long =
    text.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty).toLong

  private def ceilRank(n: Long, p: Long): Long = (n * p + 99) / 100

  /** k-th smallest (1-based) — the groupedQuantiles rank contract. */
  private def kth(vs: Seq[Long], k: Long): Long =
    vs.sorted.apply((k - 1).toInt)

  private def hv(lang: String, docId: Long): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"exact:$lang:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)

  /** The full JVM replay of q140's stages off the raw tables. */
  private lazy val replay: (Map[Long, (String, Long)],   // trimmed feats
                            Map[String, Seq[Long]],      // survivors/lang
                            Seq[(Long, String, Long, Long, Long)]) = {
    val spans = SuffixQueries.q119TrimPlan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // stage 1: trim + tokenize
    val feats = docs.map { case (d, lang, t) =>
      val cuts = spans.getOrElse(d, Array.empty).sortBy(_._2)
      val sb = new StringBuilder
      var p = 1L
      for ((_, s, e) <- cuts) {
        sb.append(t.substring((p - 1).toInt, (s - 1).toInt))
        p = e
      }
      sb.append(t.substring((p - 1).toInt))
      d -> (lang, tokCount(sb.toString))
    }.toMap
    // stage 2: per-lang MAD gate on the trimmed counts
    val byLang = feats.toSeq.groupBy(_._2._1)
    val survivors = byLang.map { case (lang, rows) =>
      val vs = rows.map(_._2._2)
      val med = kth(vs, ceilRank(vs.size, 50))
      val mad = kth(vs.map(v => math.abs(v - med)), ceilRank(vs.size, 50))
      lang -> rows.collect {
        case (d, (_, v)) if math.abs(v - med) <= 2 * mad => d
      }.sorted
    }
    // stage 3: deciles over the survivor distribution
    val deciles = survivors.map { case (lang, ds) =>
      val vs = ds.map(d => feats(d)._2)
      val th = (10 to 90 by 10).map(p => kth(vs, ceilRank(vs.size, p)))
      lang -> ds.map { d =>
        val v = feats(d)._2
        d -> (1L + th.count(v > _))
      }.toMap
    }
    // stage 4: exact-count stratified sample of the survivors
    val sampled = survivors.toSeq.flatMap { case (lang, ds) =>
      val pct = if (lang == "en") 50L else 20L
      val k = ceilRank(ds.size, pct)
      ds.map(d => (d, hv(lang, d))).sortBy(x => (x._2, x._1)).take(k.toInt)
        .map { case (d, h) =>
          (d, lang, feats(d)._2, deciles(lang)(d), h) }
    }.sortBy(_._1)
    (feats, survivors, sampled)
  }

  test("q140 == full JVM stage replay, row for row") {
    val (feats, survivors, expected) = replay
    val got = CurationPipeline.q140CurationV3(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    // non-vacuity: the gate really removed docs, the sample really
    // subsampled, and deciles really spread
    val total = feats.size
    val nSurv = survivors.values.map(_.size).sum
    assert(nSurv < total, "MAD gate removed nothing — vacuous")
    assert(got.size < nSurv, "sample kept every survivor — vacuous")
    assert(got.map(_._4).distinct.size > 3, "deciles degenerate")
  }

  test("trimmedFeatures: JVM trim+tokenize doc-for-doc; span-free docs " +
    "match the raw docFeatures counts") {
    val (feats, _, _) = replay
    val got = CurationPipeline.trimmedFeatures(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === feats)
    // standalone pin: a doc without trim spans has exactly its raw
    // docFeatures token count — the trim stage only ever LOWERS counts
    val raw = TextQueries.docFeatures(spark, sfDir)
      .select(col("doc_id"), col("token_cnt").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val spanDocs = SuffixQueries.q119TrimPlan(spark, sfDir)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    got.foreach { case (d, (_, v)) =>
      if (spanDocs.contains(d)) assert(v <= raw(d), s"doc $d count grew")
      else assert(v === raw(d), s"span-free doc $d count drifted")
    }
    assert(spanDocs.exists(d => got(d)._2 < raw(d)),
      "no span doc lost a token — trim stage vacuous for counts")
  }

  test("stage counts and hash pins vs the standalone queries") {
    val (_, survivors, _) = replay
    val got = CurationPipeline.q140CurationV3(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    // exact-count contract: per-lang sample size == ceil(rate·N_g/100)
    val perLang = got.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    survivors.foreach { case (lang, ds) =>
      val pct = if (lang == "en") 50L else 20L
      assert(perLang.getOrElse(lang, 0L) === ceilRank(ds.size, pct),
        s"lang $lang sample size not exact")
    }
    // sampled rows are survivors
    got.foreach { case (d, lang, _) =>
      assert(survivors(lang).contains(d), s"doc $d sampled but gated out")
    }
    // the sampling hash IS q127's (same salt, same construction): the
    // standalone query's hv agrees on every shared doc
    val q127hv = CurationPipeline.q127ExactSample(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val shared = got.filter(r => q127hv.contains(r._1))
    assert(shared.nonEmpty, "no doc shared with q127's sample")
    shared.foreach { case (d, _, h) =>
      assert(h === q127hv(d), s"doc $d hv drifted from q127")
    }
  }
}
