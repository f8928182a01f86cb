package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.GraftSession

/** Per-micro-batch cost attribution for the streaming family (dev
  * tool): drains q43's stream-stream interval-join shape with a memory
  * sink and prints each micro-batch's duration breakdown
  * (triggerExecution / addBatch / getBatch / walCommit /
  * commitOffsets / state commit), so a wall-time delta between rounds
  * can be attributed to batch COUNT × fixed overhead vs data work.
  *
  *   runMain graft.tools.StreamDiag [sfDir] [passes]
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.create("graft-streamdiag", Some("local[32]"))
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    (1 to passes).foreach { pass =>
      val ev = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .withColumn("ts", timestamp_micros(
          expr("ts DIV 1000 - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"),
          col("event_id").as("click_id"))
        .withWatermark("click_ts", "1 hour")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"),
          col("event_id").as("view_id"))
        .withWatermark("view_ts", "1 hour")
      val joined = clicks.join(views,
        col("user_id") === col("v_user_id") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("memory")
        .queryName(s"diag_$pass").outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[streamdiag] pass $pass wall=$wall%.2fs batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.toString).getOrElse("-")
        println(s"[streamdiag]   batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${ms("triggerExecution")} addBatch=${ms("addBatch")} " +
          s"getBatch=${ms("getBatch")} latestOffset=${ms("latestOffset")} " +
          s"walCommit=${ms("walCommit")} commitOffsets=${ms("commitOffsets")} " +
          s"queryPlanning=${ms("queryPlanning")} " +
          s"stateRows=${p.stateOperators.map(_.numRowsTotal).sum} " +
          s"stateCommitMs=${p.stateOperators.map(_.commitTimeMs).sum}")
      }
    }
    spark.stop()
  }
}
