package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of q_dedup_clusters internals. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.util.Tables.documents(spark, sfDir)
    val pairs = graft.ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 0.1)
      .select(col("a_id"), col("b_id"))
    time("jaccardPairs count")(println(pairs.count()))
    time("jaccardPairs count again")(println(pairs.count()))
    val cached = pairs.cache()
    time("pairs cache materialize")(println(cached.count()))
    def withConf[T](kvs: (String, String)*)(f: => T): T = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    time("fresh pairs, AQE ON, r8")(
      println(graft.ops.LlmOps.clustersFromPairs(
        graft.ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 0.1)
          .select(col("a_id"), col("b_id")), 8).count()))
    time("fresh pairs, AQE ON, r8 again")(
      println(graft.ops.LlmOps.clustersFromPairs(
        graft.ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 0.1)
          .select(col("a_id"), col("b_id")), 8).count()))
    withConf("spark.sql.adaptive.enabled" -> "false") {
      time("fresh pairs, AQE OFF, r8")(
        println(graft.ops.LlmOps.clustersFromPairs(
          graft.ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 0.1)
            .select(col("a_id"), col("b_id")), 8).count()))
      time("fresh pairs, AQE OFF, r8 again")(
        println(graft.ops.LlmOps.clustersFromPairs(
          graft.ops.LlmOps.jaccardPairs(spark, docs, 3, 0.3, 0.1)
            .select(col("a_id"), col("b_id")), 8).count()))
    }
    spark.stop()
  }
}
