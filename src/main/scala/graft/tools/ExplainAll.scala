package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dumps the formatted physical plan of every registered query to
  * outDir/<name>.plan.txt — the `.explain("formatted")` audit loop:
  * check pushdown (PushedFilters), pruning (ReadSchema), join strategy
  * (BroadcastHashJoin vs SortMergeJoin), codegen spans
  * (WholeStageCodegen), and exchange count per query.
  *
  * Usage: sbt "runMain graft.tools.ExplainAll /root/testdata/sf0.001 /tmp/plans"
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val summary = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize THIS plan's AQE so codegen spans appear
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val exec = df.queryExecution.executedPlan.toString
        Files.writeString(Paths.get(s"$outDir/$name.plan.txt"),
          plan + "\n\n== Executed (AQE-final) ==\n" + exec)
        val nExchange = "Exchange".r.findAllIn(exec).length
        val nCodegen = "\\*\\(\\d+\\)".r.findAllIn(exec).toSet.size
        val joins = Seq("BroadcastHashJoin", "SortMergeJoin",
          "BroadcastNestedLoopJoin", "ShuffledHashJoin")
          .filter(exec.contains).mkString("+")
        summary.append(f"$name%-28s exchanges=$nExchange codegen=$nCodegen joins=$joins%n")
      } catch {
        case e: Throwable =>
          summary.append(f"$name%-28s EXPLAIN FAILED: ${e.getMessage.take(80)}%n")
      }
    }
    Files.writeString(Paths.get(s"$outDir/SUMMARY.txt"), summary.toString)
    print(summary)
    spark.stop()
  }
}
