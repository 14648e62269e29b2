package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: where does a replay's wall time go? Runs the tumbling
  * replay graph twice and dumps each micro-batch's durationMs map plus
  * the start/stop bracketing times. */
object ProfileReplay {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.SparkEntry.entry(spark).count() // warmup

    (1 to 3).foreach { iter =>
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.shuffle.partitions", "2")
      s2.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val ckpt = java.nio.file.Files.createTempDirectory("profile_ckpt").toString
      val t0 = System.nanoTime()
      val raw = s2.read.option("pathGlobFilter", "events.parquet")
        .parquet(sfDir).schema
      val t1 = System.nanoTime()
      val src = graft.util.Tables.normalizeEventsTs(
        s2.readStream.schema(raw).option("pathGlobFilter", "events.parquet")
          .parquet(sfDir))
      val g = src.groupBy(window($"ts", "10 minutes"), $"event_type")
        .agg(count(lit(1)).as("n"))
      val t2 = System.nanoTime()
      val q = g.writeStream.format("memory")
        .queryName(s"profile_replay_$iter").outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val t3 = System.nanoTime()
      q.awaitTermination()
      val t4 = System.nanoTime()
      val n = s2.table(s"profile_replay_$iter").count()
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long): Long = (b - a) / 1000000L
      println(s"[profile] iter $iter rows=$n schemaRead=${ms(t0, t1)}ms " +
        s"build=${ms(t1, t2)}ms start=${ms(t2, t3)}ms " +
        s"run=${ms(t3, t4)}ms sinkCount=${ms(t4, t5)}ms")
      q.recentProgress.foreach { p =>
        println(s"[profile]   batch=${p.batchId} numInput=${p.numInputRows} " +
          s"durationMs=${p.durationMs}")
      }
      graft.util.Scratch.deleteRecursively(java.nio.file.Paths.get(ckpt))
    }
    spark.stop()
  }
}
