package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec, Tables}

/** Operator-level invariants on the sf0.001 tables. Full value-level
  * correctness is the driver's DuckDB differential gate (tools/selfcheck.py
  * replicates it); these specs assert the properties that gate can't see —
  * plan shape, internal consistency, and cross-operator agreement. */
class OperatorSpec extends SparkSpec {

  test("every declared query runs and is non-empty at sf0.001") {
    // q9_anti / q12_except are legitimately empty (every customer ordered)
    val mayBeEmpty = Set("q9_anti_join", "q12_except")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(mayBeEmpty.contains(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle twin (non-SQL-expressible ops excepted)") {
    // driver hash-compare sorts columns by name: names must align exactly.
    // q34 and q180 are approximate (HLL++) — they get the weaker
    // rows-only driver check and dedicated error-bound specs instead
    // (ScaleSpec for q34, TableProfileSpec for q180).
    val rowsOnly = Set("q34_approx_distinct", "q180_table_profile_approx")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
      === rowsOnly)
  }

  test("q36 asof join: every match is the latest view at or before the click") {
    import spark.implicits._
    val got = AsofJoin.q36AsofJoin(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click").count()
    assert(got.count() === clicks) // left join: one row per click
    // spot-verify semantics on one user via a collect
    val u = got.where(col("view_event_id").isNotNull)
      .select("user_id").as[Long].head()
    // compare at MICROsecond precision: getTime alone is millis and a
    // view within the same millisecond after the click would slip through
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val views = ev.where(col("event_type") === "view" && col("user_id") === u)
      .select(col("ts"), col("event_id")).collect()
      .map(r => (micros(r.getTimestamp(0)), r.getLong(1)))
    got.where(col("user_id") === u && col("view_event_id").isNotNull)
      .collect().foreach { r =>
        val clickTs = micros(java.sql.Timestamp.valueOf(r.getString(1)))
        val matched = r.getLong(3)
        val best = views.filter(_._1 <= clickTs).maxBy(v => (v._1, v._2))
        assert(matched === best._2,
          s"user $u click@$clickTs matched $matched, expected ${best._2}")
      }
  }

  test("q24's combined quality equals the shared qualityScore builder") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        graft.functions.Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextQueries.qualityScore(col("text"), col("toks")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    TextQueries.q24QualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality")).collect().foreach { r =>
        assert(docs(r.getLong(0)) === r.getDouble(1),
          s"doc ${r.getLong(0)}: builder=${docs(r.getLong(0))} q24=${r.getDouble(1)}")
      }
  }

  test("q27 decodes real BMPs: metadata matches the fixture formulas") {
    // the oracle replays the generation formulas; this pins the SPARK
    // side to the same formulas THROUGH the container parse — if the
    // encoder and decoder shared a compensating layout bug the golden
    // BmpSpec file catches it, and if the decode drifted from the
    // formulas this does
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = MultimodalPipeline.q27MultimodalMeta(spark, sfDir).collect()
    assert(rows.length === texts.size)
    rows.foreach { r =>
      val (id, text) = (r.getLong(0), texts(r.getLong(0)))
      val (w, h) = MultimodalPipeline.bmpDims(text.length)
      assert(r.getInt(2) === w && r.getInt(3) === h, s"doc $id dims")
      assert(r.getInt(1) === graft.functions.Bmp.encodedSize(w, h),
        s"doc $id container size")
      val hex = MultimodalPipeline.bmpPixels(text, w, h)
        .map("%02x".format(_)).mkString
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(5) === md5, s"doc $id raster checksum")
    }
  }

  test("q38 embeddings are unit-norm, deterministic, similarity-ready") {
    def vecs = MultimodalPipeline.embedVectors(spark, sfDir).orderBy("doc_id")
    val a = vecs.collect()
    val b = vecs.collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getSeq[Float](1) === y.getSeq[Float](1))
    }
    a.foreach { r =>
      val v = r.getSeq[Float](1)
      assert(v.length === 16)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-3, s"norm=$norm")
    }
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q10 window rank: exactly one row per customer with orders") {
    val custs = Tables.orders(spark, sfDir)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(RelationalQueries.q10WindowTopOrder(spark, sfDir).count() === custs)
  }

  test("q15 exact dedup groups: sum of dup_cnt equals total docs") {
    val total = Tables.documents(spark, sfDir).count()
    val summed = DedupQueries.q15ExactDedup(spark, sfDir)
      .agg(sum(col("dup_cnt"))).collect().head.getLong(0)
    assert(summed === total)
  }

  test("q18 MinHash estimates vs q19 exact Jaccard: bounded estimator error") {
    val est = DedupQueries.q18MinhashLsh(spark, sfDir)
      .select(col("doc_id_1"), col("doc_id_2"), col("est_jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = DedupQueries.q19NgramJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // every exact near-dup pair above the LSH design threshold should be a
    // candidate, and the 16-hash estimate should be within 0.35 of exact
    exact.filter(_._2 >= 0.5).keys.foreach { pair =>
      assert(est.contains(pair), s"LSH missed strong pair $pair")
    }
    est.foreach { case (pair, e) =>
      exact.get(pair).foreach(x => assert(math.abs(e - x) <= 0.35,
        s"pair $pair: est=$e exact=$x"))
    }
  }

  test("q20 simhash: near-identical docs differ in few bits") {
    // dup groups from q15 (same normalized text) must have equal simhash
    val fp = DedupQueries.q20Simhash(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val groups = Tables.documents(spark, sfDir)
      .groupBy(graft.functions.Text.normalized(col("text")).as("n"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .collect().map(_.getSeq[Long](1))
    groups.foreach { ids =>
      val fps = ids.map(fp)
      assert(fps.distinct.size === 1,
        s"dup group $ids has differing simhashes $fps")
    }
  }

  test("q21 exact near-dups are all found by q17 brute-force ranking space") {
    val pairs = SimilarityQueries.q21EmbeddingNearDup(spark, sfDir).count()
    assert(pairs > 0) // corpus contains planted near-duplicates
  }

  test("q22 LSH candidates are a subset of exact pair similarities") {
    val exact = SimilarityQueries.q21EmbeddingNearDup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SimilarityQueries.q22AnnLsh(spark, sfDir)
      .where(col("sim") >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("similarity joins use the native codegen cosine (no HOF fallback)") {
    val plan = SimilarityQueries.q21EmbeddingNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("cosine_similarity"))
    assert(!plan.contains("zip_with"))
  }

  test("narrow-key dedup routes real duplicate groups through the verify pass") {
    import spark.implicits._
    // the test corpus has no exact-dup norms below sf0.1, so the
    // multi-hash verify path would otherwise only ever see empty input —
    // drive it with a synthetic relation: two dup groups, two singletons
    val idNorm = Seq(
      (10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"),
      (20L, "gamma"), (21L, "gamma"),
      (30L, "delta"), (31L, "epsilon")
    ).toDF("doc_id", "norm")
    val groups = DedupQueries.hashGroups(idNorm).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // one row per distinct norm-hash; counts and min ids are exact
    assert(groups.length === 4)
    assert(groups.map(_._2).sorted.toSeq === Seq(1L, 1L, 2L, 3L))
    val (multiH, keepers, dropped) = DedupQueries.dupGroups(idNorm)
    assert(multiH.count() === 2)
    val keep = keepers.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(keep === Map(10L -> 3L, 20L -> 2L),
      "multi groups keep min doc_id with exact group size")
    // the narrow decision list: exactly the non-keeper members
    assert(dropped.collect().map(_.getLong(0)).sorted.toSeq
      === Seq(11L, 12L, 21L),
      "dropped = multi members minus keepers, nothing else")
  }

  test("label propagation: log-rounds on a long chain; past the cap it THROWS") {
    import spark.implicits._
    // a path graph 0-1-...-120: diameter 120. Linear propagation needs
    // ~120 rounds; pointer jumping must land it within 10 (2^10 ≫ 120) —
    // this cap IS the pin that rounds scale with log(diameter), not
    // diameter. Symmetric edge list, as computeClusters feeds it.
    val chain = (0L until 120L).map(i => (i, i + 1))
    val edges = (chain ++ chain.map(_.swap))
      .toDF("doc_id_1", "doc_id_2").localCheckpoint()
    val ok = DedupQueries.propagateMinLabels(edges, maxRounds = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.length === 121)
    assert(ok.forall(_._2 === 0L), "one component, all labeled by the min id")
    // a chain deeper than the round budget reaches must be a hard error,
    // not a silently-wrong labeling with duplicate representatives
    val e = intercept[IllegalStateException] {
      DedupQueries.propagateMinLabels(edges, maxRounds = 2)
    }
    assert(e.getMessage.contains("not converged"))
    assert(e.getMessage.contains("diameter"))
  }

  test("q42 clusters match a union-find over the same edge set") {
    // rebuild the edge set exactly as q42 does, then union-find locally
    val near = DedupQueries.q18MinhashLsh(spark, sfDir)
      .where(col("est_jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exactGroups = Tables.documents(spark, sfDir)
      .groupBy(graft.functions.Text.normalized(col("text")).as("n"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .collect().map(_.getSeq[Long](1))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      ()
    }
    near.foreach { case (a, b) => union(a, b) }
    exactGroups.foreach(ids => ids.tail.foreach(union(ids.head, _)))
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = DedupQueries.q42DupClusters(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("asof join carries whole right rows, never mixes fields across rows") {
    import spark.implicits._
    // right row at t=2 has a NULL payload; the t=3 left row must get the
    // (id=20, null) ROW — not id=20 with the stale payload from t=1
    val left = Seq((1L, 3L, "probe")).toDF("k", "ts", "tag")
    val right = Seq((1L, 1L, Some(10L), Some("old")),
                    (1L, 2L, Some(20L), Option.empty[String]))
      .toDF("k", "ts", "rid", "payload")
    val got = AsofJoin.asof(left, right, "k", "ts", Seq("rid", "payload"))
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(3) === 20L) // rid from the t=2 row
    assert(got.head.isNullAt(4), // payload must be that row's null,
      s"mixed-row carry: ${got.head}") // not t=1's "old"
  }

  test("q34 HLL approx distinct is within 5% of exact per group") {
    val approx = RelationalQueries.q34ApproxDistinct(spark, sfDir)
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sfDir)
      .join(broadcast(Tables.customer(spark, sfDir)),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.get(0).toString.toLong -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(1L, (e * 0.05).toLong),
        s"nation $k: approx=${approx(k)} exact=$e")
    }
  }

  test("q48's band width is the candidate/recall knob (pigeonhole holds)") {
    // 2 bands of 16 bits: pigeonhole guarantees every hamming<=1 pair
    // collides on one half-word, and the 65536-bucket bands collide far
    // less than the default 256-bucket ones
    val c2 = DedupQueries.simhashCandidates(spark, sfDir, bands = 2).count()
    val c4 = DedupQueries.simhashCandidates(spark, sfDir).count()
    assert(c2 < c4, s"expected fewer wide-band collisions: c2=$c2 c4=$c4")
    val fp = DedupQueries.q20Simhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = DedupQueries.simhashCandidates(spark, sfDir, bands = 2)
      .select("doc_id_1", "doc_id_2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (i, f1) <- fp; (j, f2) <- fp
      if i < j && java.lang.Long.bitCount(f1 ^ f2) <= 1
    } assert(got.contains((i, j)), s"pigeonhole missed hamming<=1 pair ($i,$j)")
  }

  test("wide (64-bit-class) simhash shrinks candidates, keeps hamming<=3 recall") {
    // SCALING.md measured the 32-bit/8-bit-band layout colliding on ~20%
    // of pairs on this dense corpus; the documented fix is a wider
    // fingerprint at the same band count (15-bit bands → 32768 buckets)
    val c32 = DedupQueries.simhashCandidates(spark, sfDir).count()
    val c60 = DedupQueries.simhashCandidates(spark, sfDir, fpBits = 60).count()
    assert(c60 < c32, s"expected fewer wide-fp collisions: c60=$c60 c32=$c32")
    // pigeonhole recall is unchanged: every hamming<=3 pair of 60-bit
    // fingerprints must still surface as a candidate (4 bands ⇒ any pair
    // differing in <=3 bits agrees on at least one whole band)
    val fp = DedupQueries.simhashFingerprints(spark, sfDir, bits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = DedupQueries.simhashCandidates(spark, sfDir, fpBits = 60)
      .select("doc_id_1", "doc_id_2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (i, f1) <- fp; (j, f2) <- fp
      if i < j && java.lang.Long.bitCount(f1 ^ f2) <= 3
    } assert(got.contains((i, j)), s"wide-fp pigeonhole missed ($i,$j)")
  }

  test("q52 decontamination broadcasts the benchmark shingle set") {
    // the corpus side must never shuffle on the shingle key: the join has
    // to be a broadcast hash join with the (small) benchmark set built.
    // The join now runs at contamination-ARTIFACT build time (q52 itself
    // reads the bucketed table — ScaleSpec pins that), so the shape pin
    // applies to the build plan.
    val plan = DedupQueries.computeContamination(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast contamination join in:\n$plan")
  }

  test("q53 scan never reads the text column (metadata-only sampling)") {
    // at corpus scale this is the difference between scanning the
    // (doc_id, lang) columns and scanning 100 TB of text
    val readSchema = TextQueries.q53HashSample(spark, sfDir)
      .queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.nonEmpty && !readSchema.contains("text"),
      s"column pruning failed: $readSchema")
  }

  test("q53 hash sample is deterministic and respects stratum rates") {
    val docs = Tables.documents(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sample = TextQueries.q53HashSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // identical on re-run (content-keyed hash, not row/partition order)
    val again = TextQueries.q53HashSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sample === again)
    // each stratum's observed rate is within ±20pp of its target — the
    // md5 bucket is uniform, strata at sf0.001 are ~100 docs
    sample.foreach { case (lang, n) =>
      val target = if (lang == "en") 0.5 else 0.2
      val rate = n.toDouble / docs(lang)
      assert(math.abs(rate - target) < 0.2, s"$lang rate=$rate target=$target")
    }
  }

  test("q55 repetition counts are internally consistent") {
    TextQueries.q55Repetition(spark, sfDir).collect().foreach { r =>
      val (n, top, big, dbig) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(big === math.max(n - 1, 0), s"doc ${r.getLong(0)}: $n toks, $big bigrams")
      assert(top <= n && dbig <= big)
      assert(n == 0 || top >= 1)
    }
  }

  test("q55 plan has no optimizer-inserted hash exchange (one logical shuffle)") {
    // the explicit doc_id repartition must satisfy every downstream
    // distribution: any ENSURE_REQUIREMENTS hashpartitioning exchange
    // means token-level rows are being reshuffled
    val plan = TextQueries.q55Repetition(spark, sfDir)
      .queryExecution.executedPlan.toString
    val offending = "hashpartitioning[^\\n]*ENSURE_REQUIREMENTS".r
      .findFirstIn(plan)
    assert(offending.isEmpty, s"unexpected exchange: $offending\n$plan")
  }

  test("q56 LM scores are consistent with the corpus unigram distribution") {
    val tf = Tables.documents(spark, sfDir)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = tf.values.sum.toDouble
    val perTok = tf.values.map(c => math.floor(math.log(total / c) * 1e6).toLong)
    val (minLp, maxLp) = (perTok.min, perTok.max)
    TextQueries.q56UnigramLogprob(spark, sfDir).collect().foreach { r =>
      val (n, s) = (r.getLong(2), r.getLong(1))
      // every token's micro-logprob lies in [minLp, maxLp], so the sum
      // must land in [n*minLp, n*maxLp]; zero-token docs score 0
      assert(s >= n * minLp && s <= n * maxLp,
        s"doc ${r.getLong(0)}: sum=$s outside [$n*$minLp, $n*$maxLp]")
      assert(n > 0 || s === 0L)
    }
  }

  test("q62 heap top-k equals the window top-k and pre-aggregates map-side") {
    val agg = RelationalQueries.q62TopkAgg(spark, sfDir)
    val windowed = Tables.orders(spark, sfDir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))).cast("long"))
      .where(col("rk") <= 3)
      .select("o_custkey", "rk", "o_totalprice", "o_orderkey")
      .orderBy("o_custkey", "rk")
    assert(agg.collect().map(_.toSeq).toSeq
      === windowed.collect().map(_.toSeq).toSeq)
    // the whole point: a typed imperative aggregate runs partial->final
    // (ObjectHashAggregate), so each map task ships <= k rows per group —
    // the window version must shuffle and sort every row
    val plan = agg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n${plan.take(3000)}")
    assert(plan.contains("partial_topk"),
      s"expected a partial topk phase:\n${plan.take(3000)}")
  }

  test("q64 curation v2 keeps only corpus-side survivors") {
    val rows = CurationPipeline.q64CurationV2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) % 20 != 0),
      "benchmark docs (doc_id % 20 = 0) must never survive curation")
  }

  test("q63 KMV estimate lands near the exact distinct count") {
    val exact = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    RelationalQueries.q63KmvDistinct(spark, sfDir).collect().foreach { r =>
      val (et, sz, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      val d = exact(et)
      if (sz < RelationalQueries.KmvK) assert(est === d,
        s"$et: small-range rule must be exact ($est vs $d)")
      else assert(math.abs(est - d) <= d * 0.5,
        s"$et: KMV est $est too far from exact $d") // k=64 → ~12.5% stderr
    }
  }

  test("wide media fixture: real >0x7F bytes, byte-true frame offsets") {
    // the fixture must actually be non-ASCII — otherwise the byte-slicing
    // oracles degenerate back to the chars==bytes special case
    val payloads = MultimodalPipeline.mediaTableWide(spark, sfDir)
      .limit(50).collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(payloads.nonEmpty)
    val high = payloads.map(_._2.count(b => (b & 0xff) > 0x7f).toLong).sum
    assert(high > 0L, "wide payloads must contain bytes above 0x7F")
    // every payload is the 2-bytes-per-char expansion of its document
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    payloads.foreach { case (id, bytes) =>
      val t = texts(id)
      assert(bytes.length === 2 * t.length)
      assert(t.indices.forall { i =>
        (bytes(2 * i) & 0xff) == t.charAt(i).toInt &&
          (bytes(2 * i + 1) & 0xff) == (t.charAt(i).toInt * 7 + 13) % 256
      }, s"doc $id: expansion formula mismatch")
    }
    // q37 frames are byte slices of that payload: offsets advance by the
    // 64-byte stride and each frame covers real bytes, never chars
    val frames = MultimodalPipeline.q37FrameSample(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    frames.groupBy(_._1).foreach { case (id, fs) =>
      val sorted = fs.sortBy(_._2)
      assert(sorted.forall(f => f._3 === f._2 * 64))
      val nb = texts(id).length * 2
      sorted.foreach(f => assert(f._4 === math.min(64, nb - f._3),
        s"doc $id frame ${f._2}: frame_len must be byte arithmetic"))
    }
  }

  test("wav fixture: genuine RIFF containers; q61 energies match a JVM replay") {
    import graft.functions.Wav
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val payloads = MultimodalPipeline.wavMediaTable(spark, sfDir)
      .limit(50).collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(payloads.nonEmpty)
    payloads.foreach { case (id, bytes) =>
      // a real container: magic + full header, and the decoded samples
      // are the fixture formula over the doc's text
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF", s"doc $id")
      val a = Wav.decode(bytes)
      assert(a.sampleRate === 16000 && a.channels === 1)
      val t = texts(id)
      assert(a.samples.length === 2 * t.length)
      assert(a.samples.indices.forall { k =>
        a.samples(k) ==
          (((t.charAt(k % t.length).toInt * 131 + k * 71) % 65536) - 32768).toShort
      }, s"doc $id: sample formula mismatch through the codec")
    }
    // q61's energy must equal a direct JVM replay over the decoded
    // samples (the DuckDB oracle is the third implementation)
    val got = MultimodalPipeline.q61AudioWindows(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    payloads.take(10).foreach { case (id, bytes) =>
      val s = Wav.decode(bytes).samples
      val nWin = math.min(16, math.max(1, s.length / 128))
      (0 until nWin).foreach { i =>
        val off = i * 128
        val end = math.min(off + 256, s.length)
        val e = (off until end).map(k => s(k).toLong * s(k)).sum
        assert(got((id, i)) === ((off, end - off, e)), s"doc $id win $i")
      }
    }
  }

  test("q153 spectral bins: direct-DFT JVM replay over the decoded WAV " +
      "samples; power identities hold") {
    import graft.functions.Wav
    val got = MultimodalPipeline.q153SpectralBins(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)))).toMap
    assert(got.nonEmpty)
    // powers are the squared norms of the emitted re/im, every row
    got.values.foreach { case (_, _, reQ, imQ, powQ, _) =>
      assert(powQ === reQ * reQ + imQ * imQ)
    }
    // direct DFT sums over the DECODED container samples — independent
    // of the Goertzel recurrence under test (the oracle is the third
    // implementation, off the fixture formula instead of the decode)
    val payloads = MultimodalPipeline.wavMediaTable(spark, sfDir)
      .limit(10).collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    payloads.foreach { case (id, bytes) =>
      val s = Wav.decode(bytes).samples
      val nWin = math.min(16, math.max(1, s.length / 128))
      (0 until nWin).foreach { i =>
        val off = i * 128
        val len = math.min(256, s.length - off)
        val dc = (0 until len).map(n => s(off + n).toLong).sum
        val reQ = (0 until len).map(n => (n % 4) match {
          case 0 => s(off + n).toLong; case 2 => -s(off + n).toLong
          case _ => 0L
        }).sum
        val imQ = (0 until len).map(n => (n % 4) match {
          case 1 => -s(off + n).toLong; case 3 => s(off + n).toLong
          case _ => 0L
        }).sum
        val nyq = (0 until len).map(n =>
          s(off + n).toLong * (if (n % 2 == 0) 1 else -1)).sum
        assert(got((id, i)) ===
          ((len, dc, reQ, imQ, reQ * reQ + imQ * imQ, nyq * nyq)),
          s"doc $id win $i")
      }
    }
  }

  test("q61 audio windows advance by hop and overlap 50%") {
    val rows = MultimodalPipeline.q61AudioWindows(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, ws) =>
      val sorted = ws.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices.toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 === 128, s"doc $doc: offsets must advance by hop")
          // full-width windows must overlap their successor by window-hop
          if (a._4 == 256) assert(a._3 + a._4 > b._3, s"doc $doc: no overlap")
        case _ => ()
      }
    }
  }

  test("q56 tokenizes the corpus once: a single Generate in the plan") {
    // tf is materialized (localCheckpoint), so the vocabulary side and
    // the total scalar must NOT re-explode the corpus — the scoring
    // join's explode is the plan's only Generate
    val plan = TextQueries.q56UnigramLogprob(spark, sfDir)
      .queryExecution.executedPlan.toString
    // word-boundary match: counts every Generate operator line regardless
    // of tree-prefix (:, +-) or codegen-star decoration, and does not
    // match identifiers like GenerateExec/Generated
    val generates = "\\bGenerate\\b".r.findAllIn(plan).size
    assert(generates === 1, s"expected exactly one Generate, got $generates:\n$plan")
  }

  test("q5 filter pushes predicates into the parquet scan") {
    val plan = RelationalQueries.q5FilterAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filters in:\n$plan")
  }

  test("q6 scan prunes to only referenced lineitem columns") {
    val scan = RelationalQueries.q6GroupByAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_comment"),
      s"column pruning failed: $readSchema")
  }

  test("q7 broadcasts the small side of the join") {
    val plan = RelationalQueries.q7JoinAgg(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join")
  }

  test("q57 k-means refines the codebook deterministically") {
    // (recompute determinism — exact-integer component sums — is what the
    // DuckDB oracle hash-checks: it rebuilds the codebook independently)
    val refined = SimilarityQueries.kmeansCodebook(spark, sfDir)
    val init = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") < SimilarityQueries.NumCells)
      .select(col("vec_id"),
        graft.functions.Vectors.asDouble(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // Lloyd must actually move centroids off the init vectors
    val moved = refined.count { case (c, cv) => cv != init(c) }
    assert(moved > 0, "k-means left every centroid at its init vector")
  }

  test("probeCells' nProbe is a real knob: nested probe sets per query") {
    val cents = SimilarityQueries.kmeansCodebook(spark, sfDir)
    val q = Tables.embeddings(spark, sfDir).where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        graft.functions.Vectors.asDouble(col("embedding")).as("qv"))
    def probes(n: Int) = SimilarityQueries.probeCells(q, cents, "qv", n)
      .select("query_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (p2, p3) = (probes(2), probes(3))
    // rank order: widening nProbe only ADDS cells, never swaps them
    assert(p2.subsetOf(p3), "nProbe=2 probes must be a prefix of nProbe=3")
    assert(p2.size === 20 && p3.size === 30) // 10 queries × n distinct cells
    assert(probes(cents.size).size === 10 * cents.size) // all cells probed
  }

  test("q65 packing is shard-contiguous: no gaps, no overlaps, exact spans") {
    val rows = TextQueries.q65SequencePack(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getInt(2), // shard, token_cnt
        r.getLong(3) * TextQueries.PackSeqLen + r.getLong(4))) // abs start
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      // documents tile the shard's token stream exactly: offsets sorted,
      // each doc starts where the previous one ended, first starts at 0
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 === 0L, s"shard $shard starts at ${sorted.head._3}")
      sorted.sliding(2).foreach {
        case Array((_, cnt, off), (_, _, off2)) =>
          assert(off + cnt === off2, s"shard $shard: gap/overlap at $off")
        case _ =>
      }
    }
    // span accounting: seqs_spanned == number of SeqLen windows the
    // document's [start, start+cnt) token range intersects
    TextQueries.q65SequencePack(spark, sfDir).collect().foreach { r =>
      val (cnt, first, off, spans) =
        (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expected = (off + cnt - 1) / TextQueries.PackSeqLen + 1
      assert(spans === expected && first >= 0 && off < TextQueries.PackSeqLen,
        s"doc ${r.getLong(0)}: spans=$spans expected=$expected")
    }
  }

  test("q65 plan has no single-partition window (packing is shard-local)") {
    // a global running sum would plan as Exchange SinglePartition — the
    // scale killer the shard split exists to avoid
    val plan = TextQueries.q65SequencePack(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the final presentation orderBy is allowed to range-partition; no
    // stage may collapse to a single partition
    assert(!plan.contains("SinglePartition"),
      s"packing collapsed to one partition:\n${plan.take(3000)}")
  }

  test("q66 bloom prefilter changes nothing: output equals q52 exactly") {
    val exact = DedupQueries.q52Decontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val bloom = DedupQueries.q66BloomDecontaminate(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bloom === exact)
  }

  test("q66 bloom has no false negatives and a low measured FP rate") {
    import spark.implicits._
    val bench = graft.functions.Text.shingleRows(
      Tables.documents(spark, sfDir).where(col("doc_id") % 20 === 0),
      "doc_id", "text", 3).select("s").distinct()
    val words = DedupQueries.buildBloom(bench)
    // no false negatives: every member key must probe positive
    bench.as[String].collect().foreach { s =>
      assert(DedupQueries.bloomMightContain(words, s), s"false negative: $s")
    }
    // false-positive rate on known-absent keys (tokenizer never emits
    // '_', so these cannot collide with real shingles) stays near the
    // analytic (1 - e^(-2n/m))^2 — assert a generous 4x bound
    val n = bench.count().toDouble
    val analytic = math.pow(1 - math.exp(-2 * n / DedupQueries.BloomBits), 2)
    val probes = 20000
    val fps = (0 until probes)
      .count(i => DedupQueries.bloomMightContain(words, s"_absent_$i"))
    assert(fps.toDouble / probes <= analytic * 4 + 0.001,
      s"fp rate ${fps.toDouble / probes} vs analytic $analytic")
  }

  test("bloom sizing: power of two ≥ 8 bits/key, clamped to 8 KB .. 2 MB") {
    // the dedup verify guard sizes its filter from the observed
    // multi-hash count; the clamp keeps the literal bounded and the
    // floor keeps tiny corpora on the spec'd default
    assert(DedupQueries.bloomBitsFor(0) === DedupQueries.BloomBits)
    assert(DedupQueries.bloomBitsFor(8192) === DedupQueries.BloomBits)
    assert(DedupQueries.bloomBitsFor(8193) === DedupQueries.BloomBits * 2)
    assert(DedupQueries.bloomBitsFor(1000000) === (1 << 23))
    assert(DedupQueries.bloomBitsFor(1L << 40) === (1 << 24))
  }

  test("q67 per-source counts reconcile with the corpus-wide primitives") {
    val rep = CurationPipeline.q67SourceReport(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    // doc counts partition the corpus
    assert(rep.map(_.getLong(1)).sum === docs.count())
    // exact_dups summed over sources == corpus-wide non-representatives
    val dupTotal = DedupQueries.q15ExactDedup(spark, sfDir)
      .agg(sum(col("dup_cnt") - 1)).head().getLong(0)
    assert(rep.map(_.getLong(4)).sum === dupTotal)
    // contaminated summed over sources == q52 docs at the >= 3 threshold
    val contamTotal = DedupQueries.q52Decontaminate(spark, sfDir)
      .where(col("contaminated_shingles") >= 3).count()
    assert(rep.map(_.getLong(5)).sum === contamTotal)
  }

  test("q97 shard order: reproducible, dense per shard, balanced, seed-sensitive") {
    val a = CurationPipeline.q97ShardOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val b = CurationPipeline.q97ShardOrder(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq, "the training order must be reproducible")
    // per shard: positions dense 0..n-1 and consistent with the md5 key
    // order (replayed in plain JVM as the third implementation)
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byShard = a.groupBy(_._2)
    assert(byShard.size === 8, "all 8 shards populated at this corpus size")
    byShard.foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (0L until rows.length).toSeq,
        s"shard $shard positions not dense")
      val expected = rows.map(_._1).sortBy(id => md5hex(s"epoch0:$id"))
      assert(rows.sortBy(_._3).map(_._1).toSeq === expected.toSeq,
        s"shard $shard order diverges from the md5 key order")
      rows.foreach { case (id, s, _) =>
        assert(s === (java.lang.Long.parseLong(
          md5hex(s"epoch0:$id").substring(0, 8), 16) % 8).toInt)
      }
    }
    // md5 is uniform: no shard more than 2x the mean at 500+ docs
    val mean = a.length.toDouble / 8
    byShard.foreach { case (s, rows) =>
      assert(rows.length < mean * 2, s"shard $s skewed: ${rows.length}")
    }
    // a new epoch seed is a new permutation, not a reorder of shards
    val e1 = CurationPipeline.q97ShardOrder(spark, sfDir, seed = "epoch1")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(e1.toSeq !== a.toSeq, "seed change must change the order")
    // the plan must carry NO global sort of the order key: the rank is
    // per-shard (partitioned window), so the only Sort above the scan
    // sorts within shard partitions + the presentation orderBy(doc_id)
    val plan = CurationPipeline.q97ShardOrder(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a per-shard window:\n$plan")
  }

  test("q96 learner reproduces the committed vocab on the fixture corpus") {
    // the train→freeze→apply loop: BpeUnits (the vocab q74 applies) is
    // COMMITTED as the output of q96's distributed learner on this
    // fixture corpus — re-running the learner must reproduce it merge
    // for merge, in order. A drift in pair counting, tie-break, or
    // greedy application shows up as a different trajectory here (and
    // corpus-wide as a q96 oracle-hash mismatch).
    val got = TextQueries.q96BpeLearn(spark, sfDir).collect()
    assert(got.map(_.getString(3)).toSeq === TextQueries.BpeUnits)
    // well-formedness: ranks 1..n dense, merged = lhs || rhs, freq >= 1
    assert(got.map(_.getInt(0)).toSeq === (1 to TextQueries.BpeUnits.length))
    got.foreach { r =>
      assert(r.getString(1) + r.getString(2) === r.getString(3))
      assert(r.getLong(4) >= 1L)
    }
  }

  test("q96 driver fast path ≡ distributed learner, trajectory for trajectory") {
    // the clamped local path (one aggregate job) must reproduce the
    // distributed per-round loop EXACTLY — rank, pair, merged unit and
    // frequency — or the fast path silently trains a different vocab;
    // run both directly on the same frequency relation
    val words = DedupQueries.spanFeatures(spark, sfDir)
      .groupBy(col("w").as("word")).agg(count(lit(1)).as("cnt"))
    val dist = TextQueries.learnBpeDistributed(words, 12)
    val local = TextQueries.learnBpeLocal(
      words.collect().map(r => (r.getString(0), r.getLong(1))), 12)
    assert(local === dist)
    // and the local greedy fold matches the Catalyst fold's run parity
    assert(TextQueries.bpeMergeLocal(
      Array("a", "a", "a", "a"), "a", "a").toSeq === Seq("aa", "aa"))
    assert(TextQueries.bpeMergeLocal(
      Array("x", "a", "b", "a"), "a", "b").toSeq === Seq("x", "ab", "a"))
  }

  test("q96 greedy merge application: overlapping runs merge at even offsets") {
    // the "a a a a" + (a,a) -> "aa aa" rule, pinned on the SHIPPED fold
    // (the DuckDB oracle implements the same rule via window run parity,
    // so this is the JVM half of that differential)
    import spark.implicits._
    val expect = Map(
      "aaaa" -> Seq("aa", "aa"),   // run of 3 candidates: even offsets merge
      "aaa"  -> Seq("aa", "a"),
      "baab" -> Seq("b", "aa", "b"), // isolated candidate mid-word
      "abab" -> Seq("ab", "ab"),     // under (a,b): non-overlapping chain
      "b"    -> Seq("b"))            // no candidate: unchanged
    val folded = expect.keys.toSeq.toDF("word")
      .select(col("word"),
        TextQueries.bpeMergeFold(
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))), "a", "a").as("maa"),
        TextQueries.bpeMergeFold(
          transform(sequence(lit(1), length(col("word"))),
            i => col("word").substr(i, lit(1))), "a", "b").as("mab"))
      .collect()
      .map(r => r.getString(0) -> (r.getSeq[String](1), r.getSeq[String](2)))
      .toMap
    assert(folded("aaaa")._1 === expect("aaaa"))
    assert(folded("aaa")._1 === expect("aaa"))
    assert(folded("baab")._1 === expect("baab"))
    assert(folded("abab")._2 === expect("abab"))
    assert(folded("b")._1 === expect("b"))
  }

  test("q74 subword counts match a JVM longest-match reference") {
    // independent reimplementation of both halves — tokenizer and greedy
    // longest-match scan — in plain Scala, compared doc by doc (the
    // DuckDB oracle is a third implementation via recursive CTE)
    def toksOf(t: String): Seq[String] =
      t.toLowerCase.split("[^a-z0-9]+").toSeq.map(_.take(255))
        .filter(_.nonEmpty)
    val units = TextQueries.BpeUnits.sortBy(u => (-u.length, u))
    def pieces(w: String): Long = {
      var i = 0; var c = 0L
      while (i < w.length) {
        i += units.find(u => w.regionMatches(i, u, 0, u.length))
          .map(_.length).getOrElse(1)
        c += 1
      }
      c
    }
    // the vocab must actually fire: whole-word and subword matches
    assert(pieces("window") === 1L)   // a fully-merged learned unit
    assert(pieces("customer") === 5L) // c + u + st + o + mer
    assert(pieces("xyzzy") === 5L)    // pure single-char fallback

    val expected = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map { r =>
        val ts = toksOf(r.getString(1))
        r.getLong(0) -> (ts.length.toLong, ts.map(pieces).sum)
      }.toMap
    val got = TextQueries.q74BpeTokens(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === expected)
    // subword counts sit strictly between word and char counts somewhere
    assert(got.exists { case (id, (n, b)) => b > n })
  }

  test("IVF recall rises with nProbe; probing all cells IS brute force") {
    // the recall sweep (tools.IvfRecall, table in SCALING.md) pinned to
    // its two invariants: candidates only grow with nProbe (so recall@10
    // against q17's exact top-10 is nondecreasing), and probing every
    // cell makes the IVF path return exactly the brute-force result —
    // same candidates, same rounded-sim ranking, same tie-break.
    // topSets/recallVs are the TOOL's own helpers, so the spec measures
    // the exact metric the SCALING.md table reports.
    import graft.tools.IvfRecall.{recallVs, topSets}
    val exact = topSets(SimilarityQueries.q17AnnBrute(spark, sfDir))
    def recall(ivf: Map[Long, Set[Long]]): Double = recallVs(exact, ivf)
    Seq(
      SimilarityQueries.codebook(spark, sfDir),
      SimilarityQueries.kmeansCodebook(spark, sfDir)
    ).foreach { cents =>
      val sweep = Seq(1, 2, SimilarityQueries.NumCells).map { np =>
        topSets(SimilarityQueries.ivfTopK(spark, sfDir, cents, np))
      }
      val recalls = sweep.map(recall)
      assert(recalls.sliding(2).forall(p => p.head <= p.last),
        s"recall not monotone in nProbe: $recalls")
      assert(sweep.last === exact,
        "nProbe = NumCells must reproduce the exact brute-force top-10")
    }
  }

  test("q76 PQ codes are well-formed and the quantizer is non-degenerate") {
    val rows = ProductQuantization.q76PqCodes(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val codeLists = rows.map(_._2.split(",").map(_.toInt).toSeq)
    // M codes per vector, each a valid sub-codebook index
    assert(codeLists.forall(_.length === ProductQuantization.M))
    assert(codeLists.flatten.forall(c =>
      c >= 0 && c < ProductQuantization.K))
    // quantization error is a sum of integer squares
    assert(rows.forall(_._3 >= 0L))
    // every subspace actually discriminates (≥ 2 codes in use — a
    // single-code subspace would mean the Lloyd round collapsed)
    (0 until ProductQuantization.M).foreach { m =>
      assert(codeLists.map(_(m)).distinct.length >= 2,
        s"subspace $m uses a single code")
    }
  }

  test("q77 ADC ranking is valid and finds true neighbors") {
    val rows = ProductQuantization.q77AnnIvfPq(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1 to rs.length),
        s"query $q ranks not contiguous")
      assert(byRank.map(_._3).sliding(2).forall(p => p.head <= p.last),
        s"query $q adc not ascending")
    }
    // the asymmetric-distance ranking over quantized codes must still
    // recover a solid fraction of the exact top-10 (the compression
    // trade: codes are M·log2(K) bits, not 64 floats)
    import graft.tools.IvfRecall.{recallVs, topSets}
    val exact = topSets(SimilarityQueries.q17AnnBrute(spark, sfDir))
    val got = rows.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(_._2).toSet }
    val recall = recallVs(exact, got)
    assert(recall >= 0.4, s"ADC recall@10 collapsed: $recall")
  }

  test("q78 rerank recovers recall the quantized ranking loses") {
    import graft.tools.IvfRecall.{recallVs, topSets}
    val exact = topSets(SimilarityQueries.q17AnnBrute(spark, sfDir))
    def recall(ivf: Map[Long, Set[Long]]): Double = recallVs(exact, ivf)
    val adc = recall(topSets(ProductQuantization.q77AnnIvfPq(spark, sfDir)))
    val rr = recall(topSets(ProductQuantization.q78AnnPqRerank(spark, sfDir)))
    // exact re-ranking of the ADC shortlist can only help, and must land
    // near the IVF ceiling (the true neighbors just have to make the
    // shortlist, not win the quantized ranking)
    assert(rr >= adc, s"rerank lost recall: adc=$adc rerank=$rr")
    assert(rr >= 0.7, s"rerank recall collapsed: $rr")
  }

  test("q84/q85 ship the production PQ point: one-byte codes, rerank wins") {
    import graft.tools.IvfRecall.{recallVs, topSets}
    val exact = topSets(SimilarityQueries.q17AnnBrute(spark, sfDir))
    val adc256 = ProductQuantization.q84AnnPq256(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(adc256.nonEmpty)
    adc256.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.sortBy(_._4).map(_._4).toSeq === (1 to rs.length),
        s"query $q ranks not contiguous")
    }
    val r84 = recallVs(exact,
      adc256.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet })
    val r85 = recallVs(exact,
      topSets(ProductQuantization.q85AnnPq256Rerank(spark, sfDir)))
    assert(r84 >= 0.3, s"K=256 ADC recall collapsed: $r84")
    assert(r85 >= r84, s"rerank lost recall: adc=$r84 rerank=$r85")
    assert(r85 >= 0.7, s"K=256 rerank recall collapsed: $r85")
  }

  test("pq init wraps modulo the corpus when k exceeds it; depth reaches the heap") {
    // k larger than the corpus: init must wrap deterministically, train,
    // and produce a full k-entry codebook per subspace (duplicate init
    // centroids are legal — ties route to the smallest code)
    val n = Tables.embeddings(spark, sfDir).count().toInt
    val k = n + 12
    val (_, cents) = ProductQuantization.pqModelAt(spark, sfDir, 8, k)
    assert(cents.length === 8)
    assert(cents.forall(_.length === k))
    // the wrapped entries start from the same residuals as their mod-n
    // twins (post-Lloyd they may drift apart only if rows were assigned)
    // — at minimum the model is fully populated and usable:
    val ranked = ProductQuantization.adcRankedAt(spark, sfDir,
      ProductQuantization.M, ProductQuantization.K, depth = 5)
    val maxRank = ranked.agg(max("rank")).collect()(0).getInt(0)
    assert(maxRank === 5,
      s"depth=5 must bound the ADC heap at 5 ranks, got $maxRank")
  }

  test("q79 diff partitions exactly into the snapshot-B derivation rules") {
    val docs = Tables.documents(spark, sfDir)
    val byLast = (d: Long) => docs.where(col("doc_id") % 10 === d).count()
    val rows = CurationPipeline.q79SnapshotDiff(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byChange = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // every ...7 doc removed, every ...3 doc modified, every ...1 doc
    // re-added under a new id — and NOTHING else appears in the delta
    assert(byChange.getOrElse("removed", 0L) === byLast(7))
    assert(byChange.getOrElse("modified", 0L) === byLast(3))
    assert(byChange.getOrElse("added", 0L) === byLast(1))
    assert(rows.length === byLast(7) + byLast(3) + byLast(1))
    // added rows carry the negative synthetic-id namespace (disjoint
    // from real non-negative ids at any corpus size)
    rows.filter(_._2 == "added").foreach { case (id, _) =>
      assert(id < 0L, s"added doc $id outside the synthetic-id namespace")
    }
  }

  test("q157 CDC refresh: the commit-range delta equals the snapshot " +
      "diff, and the CDC-driven refresh equals the diff-driven one") {
    // run the query first so the manifest table (v1 = A, v2 = merged B)
    // exists under the warehouse for the delta comparison below
    val got = CurationPipeline.q157CdcRefresh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val root = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      "manifest_cdc_" + Tables.dirKey(spark, sfDir)).toString
    // (a) the row-level delta reconciled from changed FILES is exactly
    // the q79 snapshot diff (same keys, same change kinds, same hashes)
    val cdc = CurationPipeline.cdcDocDelta(spark, root, 1, 2)
      .select("doc_id", "change", "old_md5", "new_md5").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    val diff = CurationPipeline.computeSnapshotDelta(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(cdc === diff, "CDC delta != snapshot diff")
    // (b) the refresh built from commits equals q80's diff-driven one
    val q80 = CurationPipeline.q80IncrementalRefresh(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === q80, "CDC-driven refresh != diff-driven refresh")
  }

  test("q57 output is a valid per-query ranking") {
    val rows = SimilarityQueries.q57AnnIvfKmeans(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1 to rs.length),
        s"query $q ranks not contiguous")
      assert(byRank.map(_._2).sliding(2).forall(p => p.head >= p.last),
        s"query $q sims not descending")
    }
  }

  test("q87 SemDeDup matches an exhaustive in-cell recomputation") {
    // independent oracle in plain Scala: collect (vec_id, cell, v),
    // redo every in-cell pair with index-order double cosine + HALF_UP
    // rounding (the engine's documented arithmetic), apply the min-id
    // keep rule, and demand exact agreement
    val asg = SimilarityQueries.cellAssignments(spark, sfDir,
        SimilarityQueries.kmeansCodebook(spark, sfDir))
      .select("vec_id", "cell", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // group by cell first, pair only within each group — matching the
    // "exhaustive in-cell" intent without an O(n²) whole-corpus scan
    // per vector (which would dominate spec runtime at higher SF)
    val byCell = asg.groupBy(_._2)
    val expected = asg.map { case (id, cell, v) =>
      val mates = byCell(cell).filter(o => o._1 < id &&
        cos(o._3, v) >= SimilarityQueries.SemDedupTau).map(_._1)
      id -> (if (mates.isEmpty) (1, id) else (0, mates.min))
    }.toMap
    val got = SimilarityQueries.q87SemDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet, "one row per vector")
    got.foreach { case (id, (kept, rep)) =>
      assert((kept, rep) === (expected(id)._1, expected(id)._2),
        s"vec $id: got kept=$kept rep=$rep, " +
          s"expected ${expected(id)}")
    }
    // the candidate generator must do real work: some vector shares a
    // cell with a smaller id (the join is non-trivially exercised)
    assert(asg.groupBy(_._2).exists(_._2.length > 1),
      "degenerate fixture: every vector alone in its cell")
  }

  test("q87 never runs the all-pairs join (cell-bounded, no cartesian)") {
    val plan = SimilarityQueries.q87SemDedup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "SemDeDup must join on cell, never cross")
    assert(!plan.contains("Window"), "no window operator in the dedup")
  }

  test("q88 duplicated-span fractions match a token-level recomputation") {
    import graft.functions.Text
    // independent oracle: re-tokenize in the JVM from raw text, slide a
    // SpanTokens window positionally, count corpus-wide occurrences
    val n = DedupQueries.SpanTokens
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    val spans = docs.flatMap { case (id, t) =>
      if (t.length < n) Array.empty[(Long, String)]
      else (0 to t.length - n).map(i =>
        (id, t.slice(i, i + n).mkString(" "))).toArray
    }
    val totals = spans.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = spans.groupBy(_._1).view.mapValues { ss =>
      val dup = ss.count(s => totals(s._2) >= 2)
      (ss.length.toLong, dup.toLong)
    }.toMap
    val got = DedupQueries.q88DupSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expected.keySet,
      "exactly the docs with >= SpanTokens tokens appear")
    got.foreach { case (id, (tot, dup, ratio)) =>
      val (et, ed) = expected(id)
      assert((tot, dup) === (et, ed),
        s"doc $id: got ($tot, $dup), expected ($et, $ed)")
      val er = BigDecimal(ed.toDouble / et)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio === er, s"doc $id ratio: got $ratio expected $er")
    }
    // the signal must be non-trivial both ways at this sf: some position
    // recurs corpus-wide AND some doc stays fully fresh
    assert(got.values.exists(_._2 > 0), "no duplicated span found")
    assert(got.values.exists(v => v._2 < v._1), "every span duplicated")
  }

  test("q89 trim extents are the disjoint maximal covers of duplicated positions") {
    import graft.functions.Text
    // same JVM oracle base as q88's, with positions kept; islands by the
    // width-aware gap rule (new run when the jump exceeds SpanTokens)
    val n = DedupQueries.SpanTokens
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    val spans = docs.flatMap { case (id, t) =>
      if (t.length < n) Array.empty[(Long, Int, String)]
      else (0 to t.length - n).map(i =>
        (id, i, t.slice(i, i + n).mkString(" "))).toArray
    }
    val totals = spans.groupBy(_._3).view.mapValues(_.length).toMap
    val expected = spans.filter(s => totals(s._3) >= 2)
      .groupBy(_._1).view.mapValues { ss =>
        val ps = ss.map(_._2).sorted
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var start = ps.head
        var last = ps.head
        ps.tail.foreach { p =>
          if (p - last <= n) last = p
          else {
            runs += ((start.toLong, (last - start + n).toLong))
            start = p; last = p
          }
        }
        runs += ((start.toLong, (last - start + n).toLong))
        runs.toSeq
      }.toMap
    val got = DedupQueries.q89DupSpanTrim(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq).toMap
    assert(got.keySet === expected.keySet,
      "exactly the docs with a duplicated position appear")
    got.foreach { case (id, runs) =>
      assert(runs === expected(id), s"doc $id extents differ")
      // the trim contract: extents disjoint, ordered, with fresh text
      // strictly between them (the gap rule leaves >= 1 token)
      runs.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) =>
          // strict gap: the rule guarantees s2 >= s1 + l1 + 1
          assert(s2 > s1 + l1, s"doc $id: overlapping/touching extents")
        case _ => ()
      }
    }
    assert(got.values.exists(_.size >= 1), "no extents found at this sf")
  }

  test("q92 trimming ties out: removed = covered extent mass, kept + removed = tokens") {
    import graft.functions.Text
    // extents are disjoint and never extend past the last token (a dup
    // position p <= n-w has coverage ending at p+w-1 <= n-1), so the
    // removed count must equal the sum of extent lengths exactly
    val extLen = DedupQueries.q89DupSpanTrim(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val tokCnt = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val got = DedupQueries.q92SpanTrimmed(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, kept, removed, md5hex) =>
      assert(kept + removed === tokCnt(id),
        s"doc $id: kept $kept + removed $removed != ${tokCnt(id)} tokens")
      assert(removed === extLen.getOrElse(id, 0L),
        s"doc $id: removed $removed != extent mass ${extLen.getOrElse(id, 0L)}")
      assert(md5hex.length === 32)
    }
    // the trim must bite somewhere and spare something at this sf
    assert(got.exists(_._3 > 0), "no tokens removed anywhere")
    assert(got.exists(r => r._2 > 0 && r._3 > 0),
      "no doc is partially trimmed — extents look degenerate")
  }

  test("q94 novelty matches a cross-doc distinct-gram recomputation") {
    import graft.functions.Text
    // independent JVM oracle: per-position grams as in q88's oracle,
    // but the corpus statistic is the DISTINCT-doc frequency
    val n = DedupQueries.SpanTokens
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    val spans = docs.flatMap { case (id, t) =>
      if (t.length < n) Array.empty[(Long, String)]
      else (0 to t.length - n).map(i =>
        (id, t.slice(i, i + n).mkString(" "))).toArray
    }
    val docFreq = spans.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = spans.groupBy(_._1).view.mapValues { ss =>
      (ss.length.toLong, ss.count(s => docFreq(s._2) == 1).toLong)
    }.toMap
    val got = DedupQueries.q94NgramNovelty(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // relationship to q88's dup rule: a cross-doc-shared gram (df >= 2)
    // is always dup (total >= 2), so non-novel ⊆ dup, i.e. novel >=
    // tot − dup for EVERY doc — strict only when a within-doc repeat is
    // cross-doc unique (possible in general, absent from this tiny
    // corpus). Pin the invariant plus non-trivial signal both ways.
    val dup = DedupQueries.q88DupSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (tot, novel)) =>
      assert(novel >= tot - dup(id),
        s"doc $id: novel $novel < tot $tot - dup ${dup(id)}")
    }
    assert(got.values.exists(v => v._2 > 0), "no novel span anywhere")
    assert(got.values.exists(v => v._2 < v._1), "every span novel")
  }

  test("q93 drift matches a JVM recount of both snapshots") {
    import graft.functions.Text
    val raw = Tables.documents(spark, sfDir)
      .select(col("doc_id"), Text.tokens(col("text")).as("t")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toArray))
    // snapshot B per q79's rules; the %10==3 edit appends two tokens
    val bTokens = raw.filter(_._1 % 10 != 7).flatMap { case (id, t) =>
      if (id % 10 == 3) t ++ Array("updated", "v2") else t
    } ++ raw.filter(_._1 % 10 == 1).flatMap(_._2)
    val aTokens = raw.flatMap(_._2)
    def cnt(ts: Array[String]) =
      ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (ca, cb) = (cnt(aTokens), cnt(bTokens))
    val (totA, totB) = (aTokens.length.toLong, bTokens.length.toLong)
    val expected = (ca.keySet ++ cb.keySet).map { w =>
      val (a, b) = (ca.getOrElse(w, 0L), cb.getOrElse(w, 0L))
      w -> ((a, b, a * 1000000L / totA - b * 1000000L / totB))
    }.toMap
    val got = CurationPipeline.q93TokenDrift(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._3 != 0), "no drift measured — degenerate")
  }

  test("q93/q94 read artifacts: no corpus tokenize outside the delta") {
    // q94 must be entirely artifact-backed (the q88 discipline); q93's
    // only tokenize subtree is the delta-sized fresh-doc branch, so its
    // plan joins the staged delta rather than re-tokenizing snapshot B
    val q94 = DedupQueries.q94NgramNovelty(spark, sfDir)
    q94.collect()
    val p94 = q94.queryExecution.executedPlan.toString
    assert(p94.contains("graft_spanfeat"), "q94 not on the artifact")
    assert(!p94.contains("lower("), s"q94 re-tokenizes:\n$p94")
    val q93 = CurationPipeline.q93TokenDrift(spark, sfDir)
    q93.collect()
    val p93 = q93.queryExecution.executedPlan.toString
    assert(p93.contains("graft_spanfeat"),
      "q93 snapshot-A counts not off the artifact")
    assert(p93.contains("graft_delta"), "q93 not on the staged delta")
  }

  test("q101 phrase search: single pass, pushed vocabulary filter, no joins") {
    val df = ReferenceQueries.q101PhraseSearch(spark, sfDir)
    val rows = df.collect()
    // JVM oracle: replay each phrase by scanning token arrays directly
    // independent tokenizer replay (the pinned contract: lower → split
    // on non-alnum → drop empties → 255-char cap)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty).map(_.take(255)))
    val expected = (for {
      ph <- ReferenceQueries.PhraseSet
      ts = ph.split(" ").toSeq
      (id, toks) <- docs
      hits = toks.indices.dropRight(ts.length - 1)
        .count(i => toks.slice(i, i + ts.length) == ts)
      if hits > 0
    } yield (ph, id) -> hits).toMap
    assert(rows.map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap === expected)
    // every phrase in the set must actually occur in the corpus, or the
    // query stops exercising multi-phrase matching silently
    assert(rows.map(_.getString(0)).distinct.sorted ===
      ReferenceQueries.PhraseSet.sorted)
    // plan: postings scan carries the pushed vocabulary IN-filter, one
    // window, and NO join anywhere (the textbook k-way self-join shape
    // is exactly what this formulation exists to avoid)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(w"),
      s"vocabulary filter not pushed to the artifact scan:\n$plan")
    assert(!plan.contains("Join"), s"join leaked into the phrase plan:\n$plan")
    assert("RunningWindowFunction|Window".r.findFirstIn(plan).isDefined)
  }

  test("q105 bisection finds exact order statistics through forced rounds") {
    import spark.implicits._
    // duplicates, negatives, a heavy spike, and a collect limit of 50 so
    // the histogram loop must actually recurse (at test SF the real
    // limit collects immediately and the loop never runs)
    val data: Seq[Double] = (1 to 4000).map(i => (i % 997).toDouble) ++
      Seq.fill(500)(123.0) ++ (1 to 300).map(i => -i / 7.0)
    val sorted = data.sorted
    val df = data.toDF("value").repartition(8)
    val n = data.length.toLong
    for (p <- Seq(1, 37, 50, 95, 99, 100)) {
      val target = (n * p + 99) / 100
      val got = RelationalQueries.quantileByBisect(
        df, n, sorted.head, sorted.last, target, collectLimit = 50L)
      assert(got === sorted(target.toInt - 1), s"p$p wrong")
    }
    // degenerate range: all values equal
    val const = Seq.fill(200)(42.0).toDF("value")
    assert(RelationalQueries.quantileByBisect(
      const, 200, 42.0, 42.0, 100, collectLimit = 50L) === 42.0)
    // the shared-first-histogram composition (q105's hoist: one
    // full-range histogram, every percentile descends from its own
    // bucket of it) must agree with the unshared descent
    val hist = RelationalQueries.histogramForTest(df, sorted.head, sorted.last)
    for (p <- Seq(37, 95)) {
      val target = (n * p + 99) / 100
      val (r, cum) = RelationalQueries.pickBucketForTest(hist, target)
      val viaShared = RelationalQueries.quantileByBisect(
        df.where(col("value") >= r.getDouble(2) &&
          col("value") <= r.getDouble(3)),
        r.getLong(1), r.getDouble(2), r.getDouble(3), target - cum,
        collectLimit = 50L)
      assert(viaShared === sorted(target.toInt - 1), s"shared path p$p wrong")
    }
    // and the public query agrees with a brute-force sort at this SF
    val ev = Tables.events(spark, sfDir).select("value")
      .collect().map(_.getDouble(0)).sorted
    val rows = RelationalQueries.q105ExactQuantiles(spark, sfDir).collect()
    rows.foreach { r =>
      val t = (ev.length.toLong * r.getInt(0) + 99) / 100
      assert(r.getDouble(1) === ev(t.toInt - 1))
    }
  }

  test("q107 sketch linearity: refresh equals from-scratch, counter for counter") {
    // CMS is linear, so the refreshed vector must be IDENTICAL (not
    // approximately equal) to a from-scratch sketch of snapshot B's
    // bigram stream — one drifting counter means the subtraction read a
    // different multiset than A actually contained
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    val feats = DedupQueries.spanFeatures(spark, sfDir)
    val stale = col("doc_id") % 10 === 7 || col("doc_id") % 10 === 3
    val base = TextQueries.baseSketch(spark, sfDir)
    val sub = TextQueries.cmsSketchOf(TextQueries.bigramsFrom(feats.where(stale)))
    val fresh = CurationPipeline.snapshotB(docs)
      .where(col("doc_id") < 0 || col("doc_id") % 10 === 3)
      .select("doc_id", "text")
    val add = TextQueries.cmsSketchOf(TextQueries.bigramsOfDocs(fresh))
    val refreshed = base.indices.map(i => base(i) - sub(i) + add(i))
    val scratch = TextQueries.cmsSketchOf(TextQueries.bigramsOfDocs(
      CurationPipeline.snapshotB(docs).select("doc_id", "text")))
    assert(refreshed.toSeq === scratch.toSeq)
    // and no counter went negative (a subtraction exceeding the base
    // would mean the removed stream wasn't a subset of A's)
    assert(refreshed.forall(_ >= 0L))
    // the refresh must actually change the answer vs snapshot A, or
    // the scenario isn't exercising the delta
    val aSet = TextQueries.q102HeavyHitters(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    val bSet = TextQueries.q107SketchRefresh(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    assert(aSet !== bSet, "recrawl left the heavy set unchanged — weak test")
  }

  test("aHash edges: sub-64-byte rasters, uniform input, naive-replay parity") {
    // naive reimplementation (per-chunk lists, BigInt cross-multiply) —
    // an independent path for the fused loop, over lengths that exercise
    // the empty-chunk rule (n < 64) and chunk-boundary rounding
    def naive(bytes: Array[Byte]): Long = {
      val n = bytes.length
      val chunks = bytes.indices.groupBy(k => ((k.toLong * 64) / n).toInt)
      val total = BigInt(bytes.map(b => (b & 0xff).toLong).sum)
      (0 until 64).map { j =>
        chunks.get(j) match {
          case Some(ks) =>
            val s = BigInt(ks.map(k => (bytes(k) & 0xff).toLong).sum)
            if (s * n >= total * ks.length) 1L << j else 0L
          case None => 0L
        }
      }.reduce(_ | _)
    }
    val rnd = new scala.util.Random(99)
    for (len <- Seq(1, 2, 48, 63, 64, 65, 100, 855)) {
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      assert(MultimodalPipeline.aHash(bytes) === naive(bytes), s"len $len")
    }
    // uniform input: every chunk mean equals the global mean, so every
    // NON-EMPTY chunk bit is 1 (>= rule) and empty chunks stay 0
    val uni = Array.fill(32)(7.toByte)
    val h = MultimodalPipeline.aHash(uni)
    assert(java.lang.Long.bitCount(h) === 32)
  }

  test("aHash crossGe: 128-bit cross-multiply exact where 64-bit wraps") {
    // the round-11 advice item: sums(j)*n wraps for rasters past
    // ~190 MB. Pin the comparator itself against BigInt on the exact
    // overflow regime (sum ~ 255*n, n ~ multi-GB raster) and on random
    // full-range non-negative operands, including near-tie pairs where
    // the products differ by 1 — a wrapped compare gets these wrong
    // long before the all-random cases notice.
    def big(a: Long, b: Long, c: Long, d: Long): Boolean =
      BigInt(a) * BigInt(b) >= BigInt(c) * BigInt(d)
    val n3g = 3L * 1024 * 1024 * 1024 // a 3 GB raster
    val cases = Seq(
      (255L * n3g / 64, n3g, 255L * n3g, n3g / 64),       // exact tie
      (255L * n3g / 64 + 1, n3g, 255L * n3g, n3g / 64),   // off by one up
      (255L * n3g / 64 - 1, n3g, 255L * n3g, n3g / 64),   // off by one down
      (Long.MaxValue, Long.MaxValue, Long.MaxValue, Long.MaxValue - 1),
      (0L, Long.MaxValue, 1L, 1L), (0L, 0L, 0L, 0L))
    for ((a, b, c, d) <- cases) {
      assert(MultimodalPipeline.crossGe(a, b, c, d) === big(a, b, c, d),
        s"($a,$b,$c,$d)")
      assert(MultimodalPipeline.crossGe(c, d, a, b) === big(c, d, a, b),
        s"swapped ($c,$d,$a,$b)")
    }
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 2000) {
      val Seq(a, b, c, d) = Seq.fill(4)(rnd.nextLong() & Long.MaxValue)
      assert(MultimodalPipeline.crossGe(a, b, c, d) === big(a, b, c, d),
        s"random ($a,$b,$c,$d)")
    }
  }

  test("q106 image hashes replay from the pixel formula; band join is exhaustive") {
    // independent path: compute each doc's raster from the FIXTURE
    // FORMULA (no BMP container anywhere), hash it, and require the
    // container-decoding pipeline to agree hash-for-hash — a decode bug
    // (row flip, padding) or a hash drift fails on every doc, not just
    // on the one emitted pair
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, text) =>
      val (w, h) = MultimodalPipeline.bmpDims(text.length)
      id -> MultimodalPipeline.aHash(
        MultimodalPipeline.bmpPixels(text, w, h))
    }.toMap
    import spark.implicits._
    val got = MultimodalPipeline.bmpMediaTable(spark, sfDir)
      .as[MultimodalPipeline.MediaRecord]
      .map(r => (r.doc_id,
        MultimodalPipeline.aHash(graft.functions.Bmp.decode(r.payload).pixels)))
      .collect().toMap
    assert(got === expected)
    // the banded join must find exactly the brute-force pairs at the
    // threshold (pigeonhole completeness: 8 bands > hamming 7)
    val ids = expected.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      hm = java.lang.Long.bitCount(expected(ids(i)) ^ expected(ids(j)))
      if hm <= 7
    } yield (ids(i), ids(j), hm)).toSeq
    val pairs = MultimodalPipeline.q106ImageNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(pairs.sorted === brute.sorted)
    assert(pairs.nonEmpty, "threshold emits nothing at this SF — vacuous gate")
  }

  test("q109 grouped bisection: batched rounds, exact per-group ranks") {
    import spark.implicits._
    // groups of very different sizes and shapes: a big skewed group
    // (forces several rounds at limit 40), a group under the limit
    // (straight to final collect), a constant group (lo==hi resolve),
    // and a two-value group
    val data: Seq[(String, Long)] =
      (1 to 5000).map(i => "big" -> (i % 613).toLong) ++
        (1 to 30).map(i => "small" -> i.toLong) ++
        Seq.fill(100)("const" -> 7L) ++
        (1 to 80).map(i => "duo" -> (if (i % 3 == 0) 5L else 9L))
    val vals = data.toDF("g", "v").repartition(8)
    val pcts = Seq(10, 50, 95)
    val got = RelationalQueries.groupedQuantiles(vals, pcts,
      collectLimit = 40L).toSet
    val expected = (for {
      (g, vs0) <- data.groupBy(_._1)
      vs = vs0.map(_._2).sorted
      p <- pcts
    } yield (g, p, vs(((vs.length.toLong * p + 99) / 100).toInt - 1))).toSet
    assert(got === expected)
    // and the public query agrees with brute force at this SF
    val byLang = TextQueries.docFeatures(spark, sfDir)
      .select("lang", "token_cnt").collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(_.getInt(1).toLong).sorted).toMap
    RelationalQueries.q109GroupedQuantiles(spark, sfDir).collect()
      .foreach { r =>
        val vs = byLang(r.getString(0))
        val t = (vs.length.toLong * r.getInt(1) + 99) / 100
        assert(r.getLong(2) === vs(t.toInt - 1), s"${r.getString(0)} wrong")
      }
  }

  test("q111 bigram LM: JVM replay, conditional ordering, empty-doc rule") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase
        .split("[^a-z0-9]+").toSeq.filter(_.nonEmpty).map(_.take(255)))
    val bigrams = docs.flatMap { case (id, ts) =>
      ts.zip(ts.drop(1)).map(p => (id, p._1, p._2)) }
    val bc = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val hist = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val v = docs.flatMap(_._2).distinct.size
    val expected = docs.map { case (id, ts) =>
      val lpms = ts.zip(ts.drop(1)).map { case (a, b) =>
        math.floor(math.log((hist(a) + v).toDouble /
          (bc((a, b)) + 1).toDouble) * 1e6).toLong
      }
      id -> ((lpms.sum, lpms.size.toLong))
    }.toMap
    val got = TextQueries.q111BigramLm(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // the conditional model must rank differently than q56's unigram
    // model on SOME doc, or the upgrade is vacuous on this corpus
    val uniOrder = TextQueries.q56UnigramLogprob(spark, sfDir).collect()
      .sortBy(r => (r.getLong(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val biOrder = got.toSeq.sortBy { case (id, (s, _)) => (s, id) }
      .map(_._1)
    assert(uniOrder !== biOrder, "bigram ranking identical to unigram")
  }

  test("q102 heavy hitters: JVM replay oracle + sketch invisibility") {
    val rows = TextQueries.q102HeavyHitters(spark, sfDir).collect()
    // replay exactly: bigrams from the pinned tokenizer contract, exact
    // counts, phi threshold — the CMS must be invisible in the output
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(_.getString(1).toLowerCase.split("[^a-z0-9]+")
        .toSeq.filter(_.nonEmpty).map(_.take(255)))
    val bigrams = docs.flatMap(ts => ts.zip(ts.drop(1))
      .map { case (a, b) => s"$a $b" })
    val n = bigrams.length.toLong
    val t = math.max(1L, n / TextQueries.HeavyPhiDen)
    val expected = bigrams.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= t).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap === expected)
    assert(rows.nonEmpty, "threshold admits nothing at this SF")
    assert(expected.size < bigrams.distinct.size,
      "threshold admits everything — not exercising the filter")
  }

  test("q103 ORC round-trip prunes columns at the scan") {
    val df = graft.sources.DelimitedSources.q103OrcSource(spark, sfDir)
    // value identity vs the parquet original
    val orig = Tables.customer(spark, sfDir)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy("c_mktsegment").collect()
    assert(df.collect().toSeq === orig.toSeq)
    // the ORC scan must read ONLY the two referenced columns — the
    // pruning contract is the point of switching containers, not just
    // parsing success
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("FileScan orc"))
      .getOrElse(fail("no ORC scan in the plan"))
    assert(scan.contains("ReadSchema: struct<c_mktsegment:string,c_acctbal:double>")
      || scan.contains("ReadSchema: struct<c_acctbal:double,c_mktsegment:string>"),
      s"ORC scan not pruned to the referenced columns:\n$scan")
  }

  test("q108 gzip round-trip: values exact, single non-split partition") {
    val df = graft.sources.DelimitedSources.q108GzipSource(spark, sfDir)
    val orig = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("orders"),
        round(sum(col("o_totalprice")), 2).as("total_price"))
      .orderBy("o_orderpriority").collect()
    assert(df.collect().toSeq === orig.toSeq)
    // the 100 TB caveat this query documents: gzip is not splittable,
    // so the one staged file must plan as exactly one input partition —
    // if Spark ever split it the parse would be corrupt, and if the
    // fixture grew more files this pin keeps the claim honest
    val schema = Tables.orders(spark, sfDir).schema
    val raw = graft.sources.DelimitedSources.readCsv(spark,
      graft.sources.DelimitedSources.stagedPathForTest(
        spark, sfDir, "orders", "csvgz"), schema)
    assert(raw.rdd.getNumPartitions === 1,
      "gzip input split — non-splittable codec contract broken")
  }

  test("q112 session funnel: JVM sessionizer replay; one hash exchange") {
    // independent ground truth: collect the events and sessionize in
    // plain Scala at MICROsecond precision (the window's own rule:
    // order by (ts, event_id), split on >= 30 min since the previous
    // event, convert iff min(view ts) <= max(click ts) in-session)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .collect()
      .map { r =>
        val t = r.getTimestamp(1).toInstant
        (r.getLong(0), t.getEpochSecond * 1000000L + t.getNano / 1000L,
          r.getString(2), r.getLong(3))
      }
    val gapMicros = 30L * 60 * 1000000
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4)).toList
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(Long, Long, String, Long)]]
      for (r <- sorted) {
        if (sessions.isEmpty || r._2 - sessions.last.last._2 >= gapMicros)
          sessions += scala.collection.mutable.ArrayBuffer(r)
        else sessions.last += r
      }
      val conv = sessions.count { s =>
        val views = s.filter(_._3 == "view").map(_._2)
        val clicks = s.filter(_._3 == "click").map(_._2)
        views.nonEmpty && clicks.nonEmpty && views.min <= clicks.max
      }
      (u, sessions.length.toLong, sorted.length.toLong, conv.toLong)
    }.toSet
    val df = RelationalQueries.q112SessionFunnel(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    // the scale claim: windows, per-session agg and per-user rollup all
    // cluster on user_id, so the whole query shuffles ONCE on the hash
    // key (the only other exchange is the presentation orderBy's range
    // partitioning over the per-user rollup)
    // the AQE toString repeats the plan under "== Initial Plan ==" —
    // count exchanges in the final section only
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("q113 cluster canonicalization: JVM argmax replay; broadcast plan") {
    // ground truth: collect the (tiny) cluster table and the token
    // counts, pick keepers in plain Scala with the documented rule
    // (max token_cnt, ties to min doc_id), rebuild every output column
    val toks = TextQueries.docFeatures(spark, sfDir)
      .select(col("doc_id"), col("token_cnt")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labels = DedupQueries.clusterLabels(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = labels.groupBy(_._2).map { case (c, ms) =>
      val members = ms.map(_._1)
      val keep = members.minBy(d => (-toks(d), d))
      (c, keep, members.length.toLong,
        members.map(d => toks(d).toLong).sum - toks(keep))
    }.toSet
    val df = DedupQueries.q113ClusterCanonical(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(want.exists(_._3 > 2), "no cluster beyond a pair — weak fixture")
    // scale shape: the corpus-sized docFeatures side must NOT shuffle —
    // the dup-only cluster table broadcasts into it, and the only hash
    // exchange is the clusters-sized aggregate after the join
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"cluster table must broadcast:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx === 1,
      s"expected one hash exchange (the per-cluster agg):\n$plan")
  }

  test("q124 fuzzy degree: JVM brute-force replay; blocking is complete") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = names.map { case (k, n) =>
      val partners = names.filter { case (k2, n2) =>
        k2 != k && lev(n, n2) <= 1 }.map(_._1)
      (k, n, partners.length.toLong,
        if (partners.isEmpty) null else partners.min)
    }.toSet
    val got = FuzzyJoin.q124FuzzyDegree(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got === want)
    assert(want.exists(_._3 > 0), "no fuzzy pair at sf0.001 — weak fixture")
  }

  test("q124 blocking: shared variant without distance <= 1 is filtered") {
    import spark.implicits._
    // "ab" and "ba" share deletion variants ("a", "b") but sit at
    // edit distance 2 — the candidate join must surface them and the
    // Levenshtein verify must drop them; "ab"/"aab" is a true pair
    val names = Seq((1L, "ab"), (2L, "ba"), (3L, "aab"))
      .toDF("key", "name")
    val got = FuzzyJoin.fuzzyDegreeOf(names).collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got === Set((1L, 1L, 3L), (2L, 0L, null), (3L, 1L, 1L)))
    // the d=1 neighborhood is distinct members only: "aab" deletes to
    // "ab" twice — the contract is the SET {self} + {1-deletions}
    val v = names.where(col("key") === 3L)
      .select(FuzzyJoin.deletionVariants(col("name")).as("v"))
      .as[Seq[String]].head().toSet
    assert(v === Set("aab", "ab", "aa"))
  }

  test("q143 fuzzy degree d=2: JVM brute-force replay; blocking complete " +
      "at the wider radius") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = Tables.part(spark, sfDir)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = names.map { case (k, n) =>
      val partners = names.filter { case (k2, n2) =>
        k2 != k && lev(n, n2) <= 2 }.map(_._1)
      (k, n, partners.length.toLong,
        if (partners.isEmpty) null else partners.min)
    }.toSet
    val got = FuzzyJoin.q143FuzzyDegree2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3))).toSet
    assert(got === want)
    // non-vacuity: d=2 must find pairs d=1 misses, or the radius is idle
    val d1Total = FuzzyJoin.q124FuzzyDegree(spark, sfDir)
      .agg(sum("n_fuzzy")).head().getLong(0)
    assert(want.toSeq.map(_._3).sum > d1Total,
      "d=2 found nothing beyond d=1 — weak fixture")
  }

  test("q143 neighborhood: variant-count contract and d=2 completeness " +
      "cases (substitution x2, transposition, insert+delete)") {
    import spark.implicits._
    // variant COUNT contract: distinct members of {self} + {1-del} +
    // {2-del}; on an all-distinct-characters string nothing collides,
    // so the count is exactly 1 + n + n(n-1)/2
    val distinctChars = "abcdefgh" // n=8 -> 1 + 8 + 28 = 37
    val vs = Seq(Tuple1(distinctChars)).toDF("name")
      .select(FuzzyJoin.deletionVariants2(col("name")).as("v"))
      .as[Seq[String]].head()
    assert(vs.length === 37)
    assert(vs.distinct.length === 37)
    assert(vs.forall(x => lev2Ok(distinctChars, x)))
    // repeated characters dedup below the bound; edge cases stay total
    for ((s, members) <- Seq(
      "aa" -> Set("aa", "a", ""),
      "a" -> Set("a", ""),
      "" -> Set(""))) {
      val got = Seq(Tuple1(s)).toDF("name")
        .select(FuzzyJoin.deletionVariants2(col("name")).as("v"))
        .as[Seq[String]].head().toSet
      assert(got === members, s"neighborhood of '$s'")
    }
    // completeness at d=2, the Bocek §3 cases: every pair at ed <= 2
    // must share a variant BEFORE the verify step
    val cases = Seq(
      ("abcdef", "axcdyf"), // two substitutions
      ("abcdef", "bacdef"), // transposition (= 2 subs under Levenshtein)
      ("abcdef", "bcdefg"), // delete front + insert back
      ("abcdef", "abdef"),  // single deletion
      ("abcdef", "abcdef")) // identity
    for ((a, b) <- cases) {
      val na = Seq(Tuple1(a)).toDF("name")
        .select(FuzzyJoin.deletionVariants2(col("name")).as("v"))
        .as[Seq[String]].head().toSet
      val nb = Seq(Tuple1(b)).toDF("name")
        .select(FuzzyJoin.deletionVariants2(col("name")).as("v"))
        .as[Seq[String]].head().toSet
      assert(na.intersect(nb).nonEmpty, s"'$a' / '$b' neighborhoods disjoint")
    }
  }

  /** true iff `x` is reachable from `s` by deleting at most 2 chars —
    * the membership contract of the 2-deletion neighborhood. */
  private def lev2Ok(s: String, x: String): Boolean = {
    def isSubseq(sub: String, sup: String): Boolean = {
      var i = 0
      for (c <- sup if i < sub.length && sub(i) == c) i += 1
      i == sub.length
    }
    s.length - x.length <= 2 && isSubseq(x, s)
  }

  test("q126 scd2: incremental merge == full rebuild; one hash exchange") {
    val updates = RelationalQueries.scd2Updates(Tables.events(spark, sfDir))
    // cutoff at the median event ts: both halves non-trivial, and the
    // delta is strictly later than every base row (global time split)
    val cutoff = updates.selectExpr("percentile(unix_micros(ts), 0.5)")
      .head().getDouble(0).toLong
    val base = updates.where(unix_micros(col("ts")) <= cutoff)
    val delta = updates.where(unix_micros(col("ts")) > cutoff)
    assert(base.count() > 0 && delta.count() > 0, "degenerate split")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3),
        if (r.isNullAt(4)) null else r.getTimestamp(4), r.getBoolean(5))
    }.toSet
    val merged = RelationalQueries.scd2Merge(
      RelationalQueries.scd2Of(base), delta)
    val full = RelationalQueries.scd2Of(updates)
    assert(rows(merged) === rows(full))
    // delta must touch SOME base current rows (else the close-out path
    // went untested) and leave untouched users byte-identical
    val closedOut = RelationalQueries.scd2Of(base)
      .where(col("is_current")).count() -
      merged.where(col("is_current") &&
        col("valid_from_ts") <= lit(new java.sql.Timestamp(cutoff / 1000)))
        .count()
    assert(closedOut > 0, "no current base row was closed out")
    // plan shape: the history build is ONE hash exchange (the user_id
    // window); the output orderBy adds a range exchange only
    val df = RelationalQueries.q126Scd2(spark, sfDir)
    df.count()
    val s = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("Exchange hashpartitioning".r.findAllIn(s).length === 1,
      s"expected one hash exchange:\n$s")
  }

  test("q127 exact sample: ceil counts, window-twin equality, resharding, ties") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        CurationPipeline.exactSampleHash(col("lang"), col("doc_id"))
          .as("hv"),
        when(col("lang") === "en", lit(50)).otherwise(lit(20)).as("pct"))
    val got = CurationPipeline.exactStratifiedSample(docs)
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    // EXACT per-stratum counts: ceil(rate·N_g/100), the property q53's
    // binomial threshold cannot give
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val k = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (l, ng) =>
      val pct = if (l == "en") 50L else 20L
      assert(k(l) === (ng * pct + 99) / 100, s"stratum $l: N=$ng")
    }
    // differential vs the full-sort rank-window twin
    val twin = CurationPipeline.exactSampleByWindow(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids === twin)
    // content-keyed: re-sharding the input reproduces the same sample
    val resharded = CurationPipeline.exactStratifiedSample(docs.repartition(7))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(resharded === ids)
    // ties AT the threshold: N=6 at 50% -> target 3; rank-3 value 20 is
    // triplicated, so one strictly-below row + two of the three tied
    // rows, taken in doc_id order
    val tied = Seq(
      (1L, "g1", 10L, 50), (2L, "g1", 20L, 50), (3L, "g1", 20L, 50),
      (4L, "g1", 20L, 50), (5L, "g1", 30L, 50), (6L, "g1", 40L, 50))
      .toDF("doc_id", "lang", "hv", "pct")
    val sel = CurationPipeline.exactStratifiedSample(tied)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sel === Set(1L, 2L, 3L))
    // tiny stratum whose WHOLE quota is threshold ties: 3 rows all at
    // the same hash, 20% -> target 1; nothing is strictly below the
    // k-th-smallest hash, so the below-count aggregate has NO row for
    // the stratum — the quota join must still keep it (left join +
    // coalesce(0)), selecting exactly 1 row in doc_id order
    val allTie = Seq(
      (1L, "g1", 10L, 50), (2L, "g1", 20L, 50),
      (7L, "tiny", 5L, 20), (8L, "tiny", 5L, 20), (9L, "tiny", 5L, 20))
      .toDF("doc_id", "lang", "hv", "pct")
    val selTie = CurationPipeline.exactStratifiedSample(allTie)
    val byG = selTie.collect()
      .groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(0)).toSet)
    assert(byG("tiny") === Set(7L), "all-tie stratum must keep its quota")
    assert(byG("g1") === Set(1L))
    // and the rank-window twin agrees on the constructed case
    val twinTie = CurationPipeline.exactSampleByWindow(allTie)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(selTie.select("doc_id").collect().map(_.getLong(0)).toSet === twinTie)
  }

  test("q128 weighted sample: JVM replay, E-S marginals, bounded-heap plan") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // differential: the engine's top-100 equals a driver-side replay of
    // the exact key construction over the collected corpus
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val replay = docs.map { case (id, src) =>
      val w = 1 + src.drop(3).toInt % 5
      val key = (1 to w).map(i => md5hex(s"wsamp:$id:$i")).max
      (id, key)
    }.sortBy { case (id, key) => (key, -id) }(
      Ordering.Tuple2(Ordering.String.reverse, Ordering.Long.reverse))
      .take(100)
    val got = CurationPipeline.q128WeightedSample(spark, sfDir)
      .select("doc_id", "sample_key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === replay.toSeq)
    // the Efraimidis-Spirakis marginal: for k=1, P(item wins) = w/Σw.
    // 3000 deterministic salt trials over weights (1, 2, 4): frequencies
    // must land within 4σ of (1/7, 2/7, 4/7) — fixed input, fixed
    // outcome, no flake
    val weights = Seq("a" -> 1, "b" -> 2, "c" -> 4)
    val trials = 3000
    val wins = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    for (t <- 1 to trials) {
      val winner = weights.maxBy { case (id, w) =>
        (1 to w).map(i => md5hex(s"trial$t:$id:$i")).max
      }._1
      wins(winner) += 1
    }
    weights.foreach { case (id, w) =>
      val p = w / 7.0
      val tol = 4 * math.sqrt(p * (1 - p) / trials)
      val freq = wins(id).toDouble / trials
      assert(math.abs(freq - p) <= tol,
        s"item $id (w=$w): freq $freq vs expected $p +/- $tol")
    }
    // plan: top-k is a bounded per-partition heap + driver merge
    // (TakeOrderedAndProject), never a global sort exchange
    val plan = CurationPipeline.q128WeightedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q145 stratified weighted sample: per-lang JVM replay; bounded-heap " +
      "aggregate plan, no per-stratum window sort") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val replay = docs.map { case (id, lang, src) =>
      val w = 1 + src.drop(3).toInt % 5
      val key = (1 to w).map(i => md5hex(s"wsamp:$id:$i")).max
      (lang, id, w.toLong, key)
    }.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy { case (_, id, _, key) => (key, -id) }(
        Ordering.Tuple2(Ordering.String.reverse, Ordering.Long.reverse))
        .take(20).zipWithIndex
        .map { case ((_, id, w, key), i) => (lang, (i + 1).toLong, id, w, key) }
    }.sortBy(r => (r._1, r._2))
    val df = CurationPipeline.q145StratifiedWeightedSample(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getInt(3).toLong, r.getString(4)))
    assert(got.toSeq === replay)
    // every lang fills its quota (the fixture has > 20 docs per lang)
    assert(got.groupBy(_._1).forall(_._2.length == 20))
    // plan: the per-group top-k is the bounded-heap aggregate (partial
    // + final ObjectHashAggregate) — NEVER a per-stratum window sort of
    // the corpus
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"),
      s"q145 must not window-sort the corpus:\n${plan.take(3000)}")
  }

  test("q150 unpivot: round trip == direct long aggregate; Expand, no " +
      "extra exchange") {
    // the round-trip identity, independently: melt(pivot(x)) minus the
    // zero cells equals the raw long-form counts
    val direct = Tables.events(spark, sfDir)
      .where(col("event_type").isin(
        "click", "error", "purchase", "signup", "view"))
      .groupBy("user_id", "event_type").count().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        r.getString(1)) -> r.getLong(2)).toMap
    val got = RelationalQueries.q150Unpivot(spark, sfDir).collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        r.getString(1)) -> r.getLong(2)).toMap
    assert(got === direct)
    // zero cells really were dropped (the pivot manufactured them)
    assert(got.values.forall(_ > 0))
    // melt is a codegen'd Expand over q45's aggregate — it must add
    // ZERO exchanges beyond the pivot's own (two: the per-(user, type)
    // count and the pivotfirst by user)
    def hashEx(d: org.apache.spark.sql.DataFrame): Int = {
      d.queryExecution.toRdd.count()
      "Exchange hashpartitioning".r.findAllIn(
        d.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head).length
    }
    val df = RelationalQueries.q150Unpivot(spark, sfDir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("Expand"), plan.take(3000))
    assert(hashEx(df) === hashEx(RelationalQueries.q45Pivot(spark, sfDir)),
      s"unpivot added exchanges:\n${plan.take(3000)}")
  }

  test("q149 concurrent sessions: JVM brute-force overlap replay; " +
      "bucketed equi-join plan, no nested loop") {
    // independent replay: sessions and overlap counts straight from
    // the collected events
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select("user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val gapMicros = 30L * 60 * 1000000
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos % 1000000) / 1000
    val ivs = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (micros(r._2), r._3))
      val sessions = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[java.sql.Timestamp]]
      var prev: java.sql.Timestamp = null
      for ((_, ts, _) <- sorted) {
        if (prev == null || micros(ts) - micros(prev) >= gapMicros)
          sessions += scala.collection.mutable.ArrayBuffer(ts)
        else sessions.last += ts
        prev = ts
      }
      sessions.map(s => (u, s.head, s.last))
    }
    val expect = ivs.map { case (u, s, e) =>
      val n = ivs.count { case (u2, s2, e2) =>
        u2 != u && !s.after(e2) && !s2.after(e) }
      ((u, s.toString), n.toLong)
    }.toMap
    val got = RangeJoin.q149ConcurrentSessions(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length === expect.size)
    got.foreach { case (u, st, n) =>
      // session_start is formatted with 6-digit micros; Timestamp
      // .toString trims trailing zeros — compare on the parsed instant
      val key = (u, java.sql.Timestamp.valueOf(st).toString)
      assert(expect(key) === n, s"user $u session $st")
    }
    // non-vacuity: overlaps exist AND some session is alone
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0))
    // the plan must be the bucketed EQUI-join — never a nested loop
    val df = RangeJoin.q149ConcurrentSessions(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"overlap join fell back to a nested loop:\n${plan.take(3000)}")
  }

  test("q148 balanced mixture: JVM replay through deciles + weighted " +
      "draw; every stratum fills its quota; no window sort") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val feats = TextQueries.docFeatures(spark, sfDir)
      .select("doc_id", "lang", "source", "token_cnt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getInt(3).toLong))
    def ceilRank(n: Long, p: Long): Long = (n * p + 99) / 100
    val expect = feats.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      val vs = rows.map(_._4).sorted
      val th = (10 to 90 by 10)
        .map(p => vs((ceilRank(vs.length, p) - 1).toInt))
      rows.map { case (id, _, src, v) =>
        val w = 1 + src.drop(3).toInt % 5
        val key = (1 to w).map(i => md5hex(s"wsamp:$id:$i")).max
        (lang, 1L + th.count(v > _), id, w.toLong, key)
      }.groupBy(_._2).toSeq.flatMap { case (dec, ds) =>
        ds.sortBy { case (_, _, id, _, key) => (key, -id) }(
          Ordering.Tuple2(Ordering.String.reverse, Ordering.Long.reverse))
          .take(5).zipWithIndex.map { case ((_, _, id, w, key), i) =>
            (lang, dec, (i + 1).toLong, id, w, key) }
      }
    }.sortBy(r => (r._1, r._2, r._3))
    val df = CurationPipeline.q148BalancedMixture(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getInt(4).toLong, r.getString(5)))
    assert(got.toSeq === expect)
    // the BALANCE property: equi-depth deciles hold >= 5 docs per
    // stratum at this fixture, so every (lang, decile) fills its quota
    assert(got.groupBy(r => (r._1, r._2)).forall(_._2.length == 5))
    assert(got.map(_._2).distinct.sorted.toSeq === (1L to 10L),
      "missing deciles — the mixture is not length-balanced")
    // bounded-heap plan, never a per-stratum window sort
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
  }

  test("q147 pricing summary: JVM integer-unit replay; pushed shipdate " +
      "filter; partial aggregation") {
    // UTC instant (the session TZ), not Timestamp.valueOf's default-TZ
    // parse — keeps the replay's cutoff identical to the engine's on
    // any machine
    val cutoff = java.sql.Timestamp.from(
      java.time.Instant.parse("2000-06-01T00:00:00Z"))
    val rows = Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_shipdate").collect()
      .filter(r => !r.getTimestamp(6).after(cutoff))
      .map { r =>
        ((r.getString(0), r.getString(1)),
          (math.round(r.getDouble(2)), math.round(r.getDouble(3) * 100),
            math.round(r.getDouble(4) * 100), math.round(r.getDouble(5) * 100)))
      }
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val n = rs.length.toLong
      val sq = rs.map(_._2._1).sum
      val sp = rs.map(_._2._2).sum
      val sd4 = rs.map { case (_, (_, pc, dp, _)) => pc * (100 - dp) }.sum
      val sc6 = rs.map { case (_, (_, pc, dp, tp)) =>
        pc * (100 - dp) * (100 + tp) }.sum
      val sdp = rs.map(_._2._3).sum
      (g._1, g._2, sq, sp, sd4, sc6,
        sq * 10000 / n, sp / n, sdp * 100 / n, n)
    }
    val df = RelationalQueries.q147PricingSummary(spark, sfDir)
    val got = df.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))
    assert(got.toSeq === expect)
    assert(got.nonEmpty && rows.length <
      Tables.lineitem(spark, sfDir).count(), "cutoff filter vacuous")
    // the shipdate filter reaches the scan; the aggregate has its
    // map-side partial half
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      plan.take(3000))
    assert(plan.contains("HashAggregate"), plan.take(3000))
  }

  test("q146 sliding top users: JVM full-window recount replay; " +
      "bounded-heap plan, no rank window") {
    // independent replay: recount each 7-day window STRAIGHT from the
    // raw events (no daily level), so a partials-summation bug shows
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = ev.map(_._1).distinct
    val expect = days.toSeq.sortBy(_.toString).flatMap { end =>
      val counts = ev.filter { case (d, _) =>
        !d.isAfter(end) && !d.isBefore(end.minusDays(6)) }
        .groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      counts.sortBy { case (u, c) => (-c, u) }.take(10).zipWithIndex
        .map { case ((u, c), i) => (end.toString, (i + 1).toLong, u, c) }
    }
    val df = RelationalQueries.q146SlidingTopUsers(spark, sfDir)
    val got = df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
    // plan: per-window top-k is the bounded-heap aggregate; the
    // rank-window formulation must not appear
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("ObjectHashAggregate"), plan.take(3000))
    assert(!plan.contains("Window"),
      s"q146 must not rank-window:\n${plan.take(3000)}")
    // the rollup->windows attach is the explode-to-covering-windows
    // equi form: a BETWEEN join would plan as a broadcast nested loop
    // evaluating |days| predicates per rollup row
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"q146 window attach fell back to a nested loop:\n${plan.take(3000)}")
    assert(plan.contains("Generate explode"),
      s"q146 must fan via explode(sequence):\n${plan.take(3000)}")
  }

  test("q129 bm25: JVM formula replay, pushed postings filter, heap plan") {
    val dfq = TextQueries.q129Bm25(spark, sfDir)
    val got = dfq.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // replay the Okapi arithmetic driver-side from the same inputs
    val terms = TextQueries.Bm25Terms
    val tf = DedupQueries.spanFeatures(spark, sfDir)
      .select("doc_id", "w").where(col("w").isin(terms: _*))
      .groupBy("doc_id", "w").count().collect()
      .map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    val feats = TextQueries.docFeatures(spark, sfDir)
      .select("doc_id", "token_cnt").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val n = feats.length.toDouble
    val avgdl = feats.map(_._2).sum.toDouble / n
    val dfc = terms.map(t => t -> tf.keys.count(_._2 == t).toDouble).toMap
    val dlm = feats.toMap
    val expect = tf.keys.map(_._1).toSet.toSeq.map { id: Long =>
      val dl = dlm(id).toDouble
      val s = terms.map { t =>
        val tfv = tf.getOrElse((id, t), 0L).toDouble
        val idf = math.log((n - dfc(t) + 0.5) / (dfc(t) + 0.5) + 1.0)
        idf * (tfv * 2.2) / (tfv + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
      (id, s)
    }.sortBy { case (id, s) => (-s, id) }.take(50)
    assert(got.map(_._1).toSeq === expect.map(_._1))
    got.zip(expect).foreach { case ((id, b, _), (_, s)) =>
      assert(math.abs(b - s) <= 0.00005 + 1e-12, s"doc $id: $b vs $s")
    }
    // only the query vocabulary's postings are read (pushed In filter),
    // and top-k is a bounded heap, not a global sort
    val plan = dfq.queryExecution.executedPlan.toString
    assert(plan.contains("In(w"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q131 kmv set ops: small-range exact, JVM estimator replay, resharding") {
    import spark.implicits._
    // at sf0.001 every event type has < 64 distinct users, so theta is
    // the full domain and BOTH set estimates must be EXACT
    val ev = Tables.events(spark, sfDir).select("event_type", "user_id")
    val got = RelationalQueries.kmvSetOpsOf(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val sets = ev.distinct().collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }
    for (((a, b), (ea, eb, eu, ei)) <- got) {
      assert(ea === sets(a).size.toLong, s"$a")
      assert(eb === sets(b).size.toLong, s"$b")
      assert(eu === (sets(a) | sets(b)).size.toLong, s"union $a/$b")
      assert(ei === (sets(a) & sets(b)).size.toLong, s"inter $a/$b")
    }
    // full-sketch path: constructed overlap (500 vs 400 users, 200
    // common) — engine must equal an independent JVM replay of the
    // bottom-k samples and Theta arithmetic, and the replay must land
    // within the sketch's documented error of the truth
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(u: Long): Long = java.lang.Long.parseLong(
      md5hex(u.toString).take(15), 16)
    val aUsers = (0L until 500L).toSeq            // 0..499
    val bUsers = (300L until 700L).toSeq          // 300..699, 200 common
    val df = (aUsers.map(("a", _)) ++ bUsers.map(("b", _)))
      .toDF("event_type", "user_id")
    val eng = RelationalQueries.kmvSetOpsOf(df).collect().map(r =>
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).head
    val k = 64
    val dom = 1152921504606846976.0
    def sample(us: Seq[Long]) = us.map(h60).distinct.sorted.take(k)
    val (sa, sb) = (sample(aUsers), sample(bUsers))
    def estOf(s: Seq[Long], n: Int) =
      if (n < k) n.toLong
      else math.floor((k - 1).toDouble * dom / s.last).toLong
    val su = (sa ++ sb).distinct.sorted.take(k)
    val theta = math.min(sa.last, sb.last)
    val c = (sa.toSet & sb.toSet).count(_ < theta)
    val replay = (estOf(sa, 500), estOf(sb, 400),
      estOf(su, (aUsers ++ bUsers).distinct.size),
      math.floor(c.toDouble * dom / theta.toDouble).toLong)
    assert(eng === replay)
    // truth-distance is a sanity rail, not the correctness pin (that is
    // the replay equality above): KMV RSE at k=64 is ~12.7% and this
    // FIXED draw happens to sit ~3 sigma out on the union (968 vs 700),
    // so the rail is 4 sigma
    assert(math.abs(eng._3 - 700.0) / 700.0 < 0.51, s"union est ${eng._3}")
    assert(math.abs(eng._4 - 200.0) / 700.0 < 0.51, s"inter est ${eng._4}")
    // deterministic under resharding
    val re = RelationalQueries.kmvSetOpsOf(df.repartition(7)).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .head
    assert(re === eng)
  }

  test("q132 cohort retention: driver-side matrix replay") {
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"),
        to_date(date_trunc("day", col("ts"))).as("day"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val cohortOf = ev.groupBy(_._1).map { case (u, rs) =>
      u -> rs.map(_._2).min(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
    }
    val cohortSize = cohortOf.groupBy(_._2).map { case (c, us) =>
      c -> us.size.toLong }
    val cells = ev.distinct.groupBy { case (u, d) =>
      (cohortOf(u), d.toEpochDay - cohortOf(u).toEpochDay)
    }.map { case ((c, off), rs) => (c.toString, off, rs.map(_._1).toSet.size.toLong) }
    val expect = cells.map { case (c, off, n) =>
      (c, off, n, n * 1000 / cohortSize(java.time.LocalDate.parse(c)))
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = RelationalQueries.q132CohortRetention(spark, sfDir)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expect)
    // retention at offset 0 is the full cohort by construction
    assert(got.filter(_._2 == 0L).forall(_._4 == 1000L))
  }

  test("q134 sliding sketch: small-range exact; merge == direct sketch") {
    // at sf0.001 (< 64 users) every window estimate must be EXACT
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val got = RelationalQueries.slidingSketchOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val raw = ev.collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = raw.map(_._1).distinct
    for (w <- days) {
      val exact = raw.filter { case (d, _) =>
        !d.isBefore(w.minusDays(6)) && !d.isAfter(w) }
        .map(_._2).distinct.size.toLong
      assert(got(w.toString) === exact, s"window $w")
    }
    // estimator path at sf0.01 (daily sketches full): the MERGED window
    // sketch must equal the sketch built DIRECTLY from the window's raw
    // values — the KMV merge-correctness theorem (any union-bottom-k
    // element is inside its own day's bottom-k), replayed in the JVM
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(u: Long): Long =
      java.lang.Long.parseLong(md5hex(u.toString).take(15), 16)
    val ev01 = Tables.events(spark, "/root/testdata/sf0.01")
      .where(col("user_id").isNotNull && col("ts").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val eng = RelationalQueries.slidingSketchOf(ev01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val raw01 = ev01.collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val k = 64
    val dom = 1152921504606846976.0
    def estOf(hs: Seq[Long]): (Long, Long) = {
      val s = hs.distinct.sorted.take(k)
      (s.size.toLong,
        if (s.size < k) s.size.toLong
        else math.floor((k - 1).toDouble * dom / s.last).toLong)
    }
    val dailySample = raw01.groupBy(_._1).map { case (d, rs) =>
      d -> rs.map(r => h60(r._2)).distinct.sorted.take(k).toSeq }
    for ((w, sz, est) <- eng) {
      val wd = java.time.LocalDate.parse(w)
      val inWin = (d: java.time.LocalDate) =>
        !d.isBefore(wd.minusDays(6)) && !d.isAfter(wd)
      // merged-from-daily-samples replay
      val merged = estOf(dailySample.filter(e => inWin(e._1))
        .values.flatten.toSeq)
      // direct sketch over the window's RAW values
      val direct = estOf(raw01.filter(r => inWin(r._1))
        .map(r => h60(r._2)).toSeq)
      assert((sz, est) === merged, s"window $w: merge replay")
      assert(merged === direct, s"window $w: merge != direct sketch")
    }
    assert(eng.exists(_._2 == 64L), "estimator path never engaged")
  }

  test("q136 MAD outliers: JVM replay; masking contrast vs z-scores") {
    // replay: medians at the ceil-rank contract, integer flags
    val vals = TextQueries.docFeatures(spark, sfDir)
      .select("doc_id", "lang", "token_cnt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong))
    def medAt(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.size * 50 + 99) / 100 - 1).toInt)
    }
    val med = vals.groupBy(_._2).map { case (l, rs) =>
      l -> medAt(rs.map(_._3).toSeq) }
    val mad = vals.groupBy(_._2).map { case (l, rs) =>
      l -> medAt(rs.map(r => math.abs(r._3 - med(l))).toSeq) }
    val expect = vals.map { case (id, l, v) =>
      val dev = math.abs(v - med(l))
      (id, l, v, med(l), dev, mad(l), dev > 2 * mad(l))
    }.sortBy(_._1).toSeq
    val got = TextQueries.q136MadOutliers(spark, sfDir).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got === expect)
    assert(got.exists(_._7) && got.exists(!_._7),
      "flag column is vacuous on the fixture")
    // the property that justifies MAD over q70's z-score: one extreme
    // value inflates sigma until a moderate outlier stops flagging
    // (masking); the median/MAD pair doesn't move
    val pop = (1 to 90).map(i => 90L + i % 21) ++ // bulk 90..110
      Seq(200L, 1000000L)                          // moderate + extreme
    val m = medAt(pop)
    val md = medAt(pop.map(x => math.abs(x - m)))
    assert(math.abs(200L - m) > 2 * md, "MAD must flag the moderate outlier")
    val mean = pop.sum.toDouble / pop.size
    val sigma = math.sqrt(pop.map(x => (x - mean) * (x - mean)).sum /
      (pop.size - 1))
    assert(math.abs(200.0 - mean) < 2 * sigma,
      "z-score was expected to MISS the moderate outlier (masking)")
  }

  test("q138 revenue report: JVM replay; pushed filters and heap top-k") {
    val dfq = RelationalQueries.q138RevenueReport(spark, sfDir)
    val got = dfq.collect().map(r => (r.getLong(0), r.getString(2),
      r.getDouble(4), r.getLong(5)))
    // driver replay of the star join in exact integer units
    val li = Tables.lineitem(spark, sfDir)
      .where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0),
        math.round(r.getDouble(1) * 100) *
          (100L - math.round(r.getDouble(2) * 100))))
    val ord = Tables.orders(spark, sfDir)
      .where(col("o_orderdate") >= lit(java.sql.Date.valueOf("1996-01-01")) &&
        col("o_orderdate") < lit(java.sql.Date.valueOf("1996-04-01")))
      .select("o_orderkey", "o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val cust = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_nationkey").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val nat = Tables.nation(spark, sfDir)
      .select("n_nationkey", "n_name").collect()
      .map(r => (r.getInt(0), r.getString(1))).toMap
    val agg = li.flatMap { case (ok, rev) => ord.get(ok).map((_, rev)) }
      .groupBy(_._1).map { case (ck, rs) =>
        (ck, nat(cust(ck)), rs.map(_._2).sum, rs.size.toLong) }
    val expect = agg.toSeq
      .sortBy { case (ck, _, rev, _) => (-rev, ck) }.take(20)
      .map { case (ck, nn, rev, n) => (ck, nn, rev.toDouble / 10000.0, n) }
    assert(got.toSeq === expect)
    // filters reach the scans; the top-20 is a bounded heap
    val plan = dfq.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan.take(3000))
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("q139 decile binning: JVM replay, monotonicity, equal-value cohesion") {
    val got = TextQueries.q139DecileBinning(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // replay: nine ceil-rank thresholds, count strictly-below
    val byLang = got.groupBy(_._2)
    for ((lang, rows) <- byLang) {
      val vs = rows.map(_._3).toSeq.sorted
      val ths = (10 to 90 by 10).map(p => vs(((vs.size * p + 99) / 100 - 1).toInt))
      rows.foreach { case (id, _, v, d) =>
        assert(d === 1 + ths.count(v > _), s"doc $id ($lang)")
      }
      // deciles are monotone in the value, and EQUAL values always share
      // a decile (the property ntile() cannot give)
      val sortedByV = rows.sortBy(_._3)
      assert(sortedByV.map(_._4).toSeq === sortedByV.map(_._4).toSeq.sorted)
      rows.groupBy(_._3).values.foreach { same =>
        assert(same.map(_._4).distinct.length === 1,
          "equal values split across deciles")
      }
      // equi-depth: with near-unique values no decile may be empty or
      // hold more than ~2x its share (duplicates can skew, bounded here)
      val sizes = rows.groupBy(_._4).view.mapValues(_.size)
      assert(sizes.keys.min >= 1L && sizes.keys.max <= 10L)
      assert(sizes.values.sum === rows.size)
    }
  }

  test("q112 boundary: a gap of EXACTLY 30 minutes starts a session") {
    import spark.implicits._
    def ts(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(micros / 1000)
      t.setNanos((micros % 1000000).toInt * 1000)
      t
    }
    val m30 = 30L * 60 * 1000000
    val base = 1700000000L * 1000000
    // user 1: gap one microsecond UNDER the threshold -> one session
    // user 2: gap exactly 30:00.000000 -> two sessions (the >= rule)
    // user 3: gap one microsecond OVER -> two sessions
    // user 2's second session converts via a same-timestamp view+click
    // pair (the non-strict rule's own boundary)
    val ev = Seq(
      (1L, ts(base), "view", 10L),
      (1L, ts(base + m30 - 1), "click", 11L),
      (2L, ts(base), "view", 20L),
      (2L, ts(base + m30), "view", 21L),
      (2L, ts(base + m30), "click", 22L),
      (3L, ts(base), "view", 30L),
      (3L, ts(base + m30 + 1), "click", 31L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val got = RelationalQueries.sessionFunnelOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === Set(
      (1L, 1L, 2L, 1L), // one session, converted (view then click inside)
      (2L, 2L, 3L, 1L), // split at the exact boundary; session 2 converts
      (3L, 2L, 2L, 0L)  // split; view and click in different sessions
    ))
  }

  test("q88 pre-aggregates per doc before the gram-keyed exchange") {
    // the (doc_id, gram) aggregate must collapse within-doc repeats
    // map-side BEFORE grams travel: partial aggregation on both the
    // pair aggregate and the totals aggregate
    val plan = DedupQueries.q88DupSpans(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val partials = "partial_count|partial_sum".r
      .findAllIn(plan).length
    assert(partials >= 2,
      s"expected map-side partial aggregates in both stages:\n$plan")
  }
}
