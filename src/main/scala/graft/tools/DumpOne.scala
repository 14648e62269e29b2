package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump ONE registry query exactly the way Verify does —
  * `sbt "runMain graft.tools.DumpOne q_dedup_clusters /root/testdata/sf0.01 /tmp/one"`
  * writes `/tmp/one/<name>/` (coalesced parquet) and, if the query has
  * an oracle, `/tmp/one/oracle_sql.json` holding just that entry, so
  * `tools/check_oracle.py <sfDir> /tmp/one` checks the single query
  * without a full Verify run. */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
        s"{${q(name)}: ${q(sql)}}")
      Files.writeString(Paths.get(s"$outDir/queries.json"), s"[${q(name)}]")
    }
    graft.util.Caches.clear(spark)
    spark.stop()
  }
}
