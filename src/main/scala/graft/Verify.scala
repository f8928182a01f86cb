package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [queryNameSubstring...] — the optional filters
    // are a dev loop: dump only the named queries (plus the full
    // oracle_sql.json, which selfcheck needs either way). The driver
    // always calls with exactly two args.
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [query...]")
    val (sfDir, outDir) = (args(0), args(1))
    val filters = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(
      appName = "graft-verify", master = Some(s"local[$cpus]"))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) =>
        filters.isEmpty || filters.exists(name.contains) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a reused outDir may hold this query's parquet from a PRIOR
        // run — left in place, the driver's compare would read the
        // stale (possibly passing) result and mask the regression
        GraftSession.deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape shared with Bench (GraftSession.jsonString):
    // a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = GraftSession.jsonString(s)
    // Written in FULL even under dev filters: a filtered run into a
    // reused outDir must not shrink the oracle map while prior queries'
    // parquet dirs remain, or a later selfcheck over that dir would
    // silently skip their compares.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
