package graft

/** Benchmark main: times each SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (BENCH_r{N}.json).
  *
  * Methodology: every query is first executed once at sf0.001 (untimed) so
  * JIT/codegen/classloading warmup — ~25 s for the first aggregate pipeline
  * in a cold JVM — doesn't land on an arbitrary query. The timed run then
  * measures steady-state plan execution, which is what would matter on a
  * long-lived cluster.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warmDir = "/root/testdata/sf0.001"
    // shuffle partitions DERIVE from the core count (scale-adaptive,
    // guide §2.2: a constant tuned for either local mode or the cluster
    // is wrong at the other) — at the driver's 32-core bench this is the
    // same 32 every committed record used, so totals stay comparable,
    // while the lower-core scaling probe now runs a genuinely
    // scaled-down config instead of 32 shuffle tasks on 8 cores
    val spark = GraftSession.create(
      appName = "graft-bench", master = Some(s"local[$cpus]"),
      shufflePartitions = cpus.toIntOption.getOrElse(32))
    // NonFatal only: a swallowed OutOfMemoryError would leave the JVM
    // heap-exhausted and every later sample silently garbage
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // 1-minute loadavg snapshot — recorded around the single-sample
    // phases so a reader can tell "the box was loaded" from "the build
    // regressed" (r9's committed artifacts_sec read 114 s on a loaded
    // box vs 53.6 s idle; a single sample can't defend itself without
    // its load context)
    def load1(): Double = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").head.toDouble).getOrElse(-1.0)
    // min-of-N for the re-runnable one-off metrics (the refresh/rebuild
    // pairs are PLANS, re-executed per call, so re-sampling is honest):
    // a single sample on this shared box can catch a 2-7x load spike,
    // and r9's committed JSON inverted the refresh-vs-rebuild crossover
    // exactly that way (2.06 vs 1.61 committed; 0.76 vs 0.94 idle)
    val oneoffRuns = 3
    def minTimed(thunk: => Unit): Double = scala.util.Try(
      (1 to oneoffRuns).map { _ =>
        val t = System.nanoTime(); thunk; (System.nanoTime() - t) / 1e9
      }.min).getOrElse(-1.0)
    // Materialize the shared artifacts (shingles, signatures) for the
    // TIMED scale dir up front and report their one-off build cost as its
    // own metric. Consumers would otherwise pay the build on their first
    // timed run and min-of-2 would silently hide it — the honest
    // accounting is "one artifact job + N cheap consumers", which is also
    // exactly the production shape. Artifact builds happen ONCE per
    // session (the registry caches), so this metric is inherently a
    // single sample — it carries its loadavg bracket instead.
    val artLoadBefore = load1()
    val tArt = System.nanoTime()
    val artifactsSec = scala.util.Try {
      operators.TextQueries.docFeatures(spark, sfDir).count()
      operators.DedupQueries.shingles(spark, sfDir).count()
      operators.DedupQueries.spanFeatures(spark, sfDir).count()
      operators.DedupQueries.signatures(spark, sfDir).count()
      operators.DedupQueries.contamination(spark, sfDir).count()
      operators.DedupQueries.clusterLabels(spark, sfDir).count()
      operators.CurationPipeline.prewarmDedupMeta(spark, sfDir)
      operators.CurationPipeline.curatedHandoff(spark, sfDir).count()
      operators.SuffixQueries.suffixShared(spark, sfDir).count()
      operators.SuffixQueries.suffixPositions(spark, sfDir).count()
      operators.CurationPipeline.trimmedFeatures(spark, sfDir).count()
      // driver-held index models (IVF codebooks, PQ sub-codebooks) and
      // the PQ-coded index table — trained/written once per session;
      // without the prebuild the first timed q57/q76-q78 pass would pay
      // them and min-of-N would hide it
      operators.SimilarityQueries.kmeansCodebook(spark, sfDir)
      operators.ProductQuantization.pqIndex(spark, sfDir).count()
      operators.ProductQuantization.pqIndexAt(spark, sfDir,
        operators.ProductQuantization.M256,
        operators.ProductQuantization.K256).count()
      operators.CurationPipeline.refreshedShingles(spark, sfDir).count()
      operators.CurationPipeline.refreshedSignatures(spark, sfDir).count()
      operators.CurationPipeline.refreshedSpanFeatures(spark, sfDir).count()
      operators.CurationPipeline.refreshedDocFeatures(spark, sfDir).count()
      operators.SuffixQueries.suffixSharedB(spark, sfDir).count()
      operators.ProductQuantization.refreshedPqIndex(spark, sfDir).count()
      // q154's stored A-state (the partition-tagged suffix index, its
      // per-partition maxes and summaries) — built once per session
      operators.SuffixRefresh.indexA(spark, sfDir).count()
      operators.SuffixRefresh.innerMaxA(spark, sfDir).count()
      operators.SuffixRefresh.summariesA(spark, sfDir).count()
      sources.PartitionedSink.eventsDaily(spark, sfDir).count()
      sources.ZOrderLayout.zEvents(spark, sfDir).count()
      (System.nanoTime() - tArt) / 1e9
    }.getOrElse(-1.0)
    val artLoadAfter = load1()
    // the staged snapshot diffs' BUILD cost, on its own (they were built
    // by the refresh prebuilds above, so this re-derives them through
    // the same plans, timed): the honest refresh accounting is "ONE
    // staged diff per snapshot pair + N delta-sized refreshes" — the
    // refresh_sec/pq_refresh_sec numbers below measure the per-consumer
    // refresh against the staged diff, and delta_sec is the shared
    // one-off they amortize
    val deltaSec = minTimed {
      operators.CurationPipeline.computeSnapshotDelta(spark, sfDir).count()
      operators.ProductQuantization.computeVectorDelta(spark, sfDir).count()
      ()
    }
    // the incremental-refresh claim, measured: applying q79's delta to
    // the base shingle artifact vs re-shingling snapshot B from scratch.
    // Refresh cost must scale with the delta (~27% of docs under q79's
    // rules), not the corpus — this pair of numbers is that evidence.
    val refreshSec = minTimed {
      operators.CurationPipeline.computeRefreshedShingles(spark, sfDir).count()
      ()
    }
    val rebuildSec = minTimed {
      graft.functions.Text.shingleRows(
        operators.CurationPipeline.snapshotB(Tables.documents(spark, sfDir)),
        "doc_id", "text", 3).count()
      ()
    }
    // the same refresh-vs-rebuild pair for the ANN index family: the
    // q91 delta-applied code table against coding snapshot B in full
    // with the same frozen model
    val pqRefreshSec = minTimed {
      operators.ProductQuantization.computeRefreshedPqCodes(spark, sfDir).count()
      ()
    }
    val pqRebuildSec = minTimed {
      operators.ProductQuantization.computeSnapshotBPqCodes(spark, sfDir).count()
      ()
    }
    // the q95 pair: the positional census (the most expensive artifact
    // at scale) refreshed from the staged delta vs rebuilt from scratch
    // over snapshot B
    val spanRefreshSec = minTimed {
      operators.CurationPipeline
        .computeRefreshedSpanFeatures(spark, sfDir).count()
      ()
    }
    val spanRebuildSec = minTimed {
      operators.DedupQueries.spanFeaturesOf(
        operators.CurationPipeline.snapshotB(Tables.documents(spark, sfDir))
          .select("doc_id", "text")).count()
      ()
    }
    // the q98 pair: the per-doc feature table refreshed vs recomputed
    val docfeatRefreshSec = minTimed {
      operators.CurationPipeline
        .computeRefreshedDocFeatures(spark, sfDir).count()
      ()
    }
    val docfeatRebuildSec = minTimed {
      operators.TextQueries.docFeaturesOf(
        operators.CurationPipeline.snapshotB(
          Tables.documents(spark, sfDir))).count()
      ()
    }
    // the q107 pair: the count-min index delta-maintained (two
    // delta-sized passes + 32 KB vector math over the stored base
    // sketch, built untimed — it IS the stored index) vs re-sketched
    // from snapshot B's whole stream
    operators.TextQueries.baseSketch(spark, sfDir)
    val sketchRefreshSec = minTimed {
      operators.TextQueries.refreshedSketch(spark, sfDir); ()
    }
    val sketchRebuildSec = minTimed {
      operators.TextQueries.rebuiltBSketch(spark, sfDir); ()
    }
    // min across INTERLEAVED full-suite passes: this box is shared and
    // load spikes inflate single samples 2-7x. Back-to-back repeats of
    // one query land both samples inside the same spike (round 4 showed
    // 4-6x phantom "regressions" on unchanged sub-second queries);
    // running the whole suite N times and taking the per-query min
    // across passes separates each query's samples by a full suite
    // (~30 s), so a spike can inflate at most one of them.
    val passes = 3
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // per-query shuffle-write bytes, so a bench regression self-diagnoses
    // from the JSON: a query whose TIME moved but whose SHUFFLE volume
    // didn't (q57, round 5) is fixed-overhead/box noise, not a plan
    // regression. Counted on the last pass only (caches warm, artifacts
    // prebuilt); the listener bus is drained before each snapshot so the
    // async task-end events can't smear across queries.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    val shuffleByQuery = scala.collection.mutable.Map.empty[String, Long]
    // per-query streaming state rows (numRowsTotal/numRowsRemoved from
    // the final progress), captured on the counted pass: the stateful
    // family's scale signal is STATE GROWTH, which wall-time and shuffle
    // MB can't show — a round-over-round jump here is a state leak
    val stateByQuery = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val samples = (1 to passes).map { pass =>
      val arr = new Array[Double](names.size)
      // per-pass DETERMINISTIC shuffle of the query order (seeded by the
      // pass number, so runs reproduce): with a fixed alphabetical order
      // a single load burst poisons the same contiguous stretch in every
      // pass it spans — r9's committed run carried spreads of 8-36 on
      // exactly q30-q42 — whereas with per-pass orders a burst lands on
      // a DIFFERENT subset each pass and the per-query min survives
      val order = new scala.util.Random(1000003L * pass)
        .shuffle(names.indices.toList)
      order.foreach { i =>
        val (name, fn) = names(i)
        // on the counted pass, start from a drained bus so the previous
        // query's in-flight events can't leak into this window
        if (pass == passes) {
          org.apache.spark.graftbridge.SparkBridge
            .drainListenerBus(spark.sparkContext)
          // clear accumulated state metrics so a previous query's
          // streaming drains can't attribute to this one
          streaming.EventStreams.takeStateMetrics()
          ()
        }
        val t0 = System.nanoTime()
        val before = shuffleBytes.get()
        // a failed query must read as -1, not as a suspiciously fast run
        // (NonFatal: let OOM and friends abort the whole run visibly)
        arr(i) = try {
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          if (pass == passes) {
            org.apache.spark.graftbridge.SparkBridge
              .drainListenerBus(spark.sparkContext)
            shuffleByQuery(name) = shuffleBytes.get() - before
            streaming.EventStreams.takeStateMetrics()
              .foreach(stateByQuery(name) = _)
          }
          dt
        }
        catch { case scala.util.control.NonFatal(_) => -1.0 }
      }
      arr.toSeq
    }
    val results = names.zipWithIndex.map { case ((name, _), i) =>
      val times = samples.map(_(i))
      name -> (if (times.exists(_ < 0)) -1.0 else times.min)
    }
    // per-query pass spread (max/min across the interleaved passes): a
    // reported min with a wide spread means the other samples caught box
    // spikes — a judge comparing rounds can split noise from regression
    // without re-deriving it from raw passes
    val spreads = names.zipWithIndex.map { case ((name, _), i) =>
      val times = samples.map(_(i))
      val s = if (times.exists(_ <= 0)) -1.0
      else math.round(times.max / times.min * 100) / 100.0
      name -> s
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sh = names.map { case (name, _) =>
      val mb = shuffleByQuery.get(name).map(_ / 1e6).getOrElse(-1.0)
      "\"" + name + "\":" + math.round(mb * 100) / 100.0
    }.mkString("{", ",", "}")
    // stateful queries only (insertion order of `names`): total state
    // rows at the final micro-batch and rows evicted by watermarks
    val st = names.flatMap { case (name, _) =>
      stateByQuery.get(name).map { case (t, r) =>
        "\"" + name + "\":{\"total\":" + t + ",\"removed\":" + r + "}" }
    }.mkString("{", ",", "}")
    // the headline total sums SUCCESSFUL queries only — adding the -1
    // sentinels would make a newly-failing query read as a speedup in a
    // round-over-round compare; `failed` makes the omission visible
    val ok = results.map(_._2).filter(_ >= 0)
    val total = ok.sum
    val failed = results.size - ok.size
    // box-load context: this machine is shared and load spikes inflate
    // samples 2-7x; the 1/5/15-min loadavg lets a reader separate real
    // regressions from noise
    val loadavg = scala.util.Try(
      scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split("\\s+").take(3).mkString("[", ",", "]")).getOrElse("[]")
    // key order matters downstream: the driver captures the TAIL of this
    // line and has twice truncated it mid-JSON, so the per-query seconds
    // map — the one map a reader must have — goes LAST, with the
    // diagnostic maps (spread, shuffle) just before it
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"sf":${GraftSession.jsonString(sfDir)},"loadavg":$loadavg,"runs_per_query":$passes,"interleaved":true,"shuffled_order":true,"oneoff_runs":$oneoffRuns,"artifacts_sec":$artifactsSec,"artifacts_load":[$artLoadBefore,$artLoadAfter],"delta_sec":$deltaSec,"refresh_sec":$refreshSec,"full_rebuild_sec":$rebuildSec,"pq_refresh_sec":$pqRefreshSec,"pq_rebuild_sec":$pqRebuildSec,"span_refresh_sec":$spanRefreshSec,"span_rebuild_sec":$spanRebuildSec,"docfeat_refresh_sec":$docfeatRefreshSec,"docfeat_rebuild_sec":$docfeatRebuildSec,"sketch_refresh_sec":$sketchRefreshSec,"sketch_rebuild_sec":$sketchRebuildSec,"state_rows":$st,"pass_spread":$sp,"shuffle_mb":$sh,"queries":$qs}"""
    println(json)
    // also land the line in a file: sbt interleaves its own log lines with
    // stdout, so a driver grepping the tail can mis-parse — a dedicated
    // file is unambiguous
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .failed.foreach(e =>
        System.err.println(s"[bench] could not write $outFile: $e"))
    // COMPACT summary as the LAST stdout line: the driver's tail capture
    // holds ~2 KB, so the 14 KB full line above truncates mid-map every
    // round (BENCH_rN.json `parsed: null`) — this line is self-contained
    // and small enough to survive the window whole: suite total, the
    // common-subset compare against the newest committed bench_full_r*,
    // and the loadavg bracket, with a pointer to the full per-query file.
    val commonPrev: String = scala.util.Try {
      val rx = """bench_full_r(\d+)\.json""".r
      // exclude the file THIS run just wrote (outFile) — the newest
      // bench_full_r* in cwd is otherwise this very run's output and
      // the round-over-round compare degenerates to self == self
      val own = new java.io.File(outFile).getCanonicalPath
      val prev = new java.io.File(".").listFiles().toSeq
        .filter(_.getCanonicalPath != own)
        .flatMap(f => f.getName match {
          case rx(n) => Some((n.toInt, f))
          case _ => None
        }).sortBy(_._1).lastOption
      prev.map { case (_, f) =>
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val q = om.readTree(f).get("queries")
        val resMap = results.toMap
        var thisSum = 0.0; var prevSum = 0.0; var n = 0
        val it = q.fields()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getValue.asDouble(-1.0)
          resMap.get(e.getKey).filter(_ >= 0).foreach { t =>
            if (p >= 0) { thisSum += t; prevSum += p; n += 1 }
          }
        }
        s""","common_prev":{"file":"${f.getName}","n":$n,""" +
          s""""this":${math.round(thisSum * 100) / 100.0},""" +
          s""""prev":${math.round(prevSum * 100) / 100.0}}"""
      }.getOrElse("")
    }.getOrElse("")
    val summaryJson =
      s"""{"metric":"total","value":$total,"unit":"sec","summary":true,""" +
        s""""failed":$failed,"queries_n":${results.size},""" +
        s""""sf":${GraftSession.jsonString(sfDir)},"loadavg":$loadavg,""" +
        s""""artifacts_sec":$artifactsSec,"refresh_sec":$refreshSec,""" +
        s""""full_rebuild_sec":$rebuildSec,"full":"$outFile"""" +
        commonPrev + "}"
    println(summaryJson)
    // ...and as its own FILE, so the driver's truncated stdout tail
    // (BENCH_rN.json `parsed: null`) stops mattering: the whole summary
    // object is always available on disk next to the full record
    val summaryFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_SUMMARY",
      "bench_summary.json")
    scala.util.Try(java.nio.file.Files.write(
      java.nio.file.Paths.get(summaryFile),
      (summaryJson + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8)))
      .failed.foreach(e =>
        System.err.println(s"[bench] could not write $summaryFile: $e"))
    spark.stop()
  }
}
