package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DbgRls {
  def main(a: Array[String]): Unit = {
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = graft.util.Scratch.dir("dbg_rls2")
    graft.util.Tables.customer(spark, "/root/testdata/sf0.001")
      .select($"c_custkey", $"c_name", round($"c_acctbal", 4).as("c_acctbal"))
      .repartitionByRange(6, $"c_custkey")
      .write.format("graft-avro").mode("overwrite").save(s"$root/cust.avro")
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    s2.conf.set("spark.sql.catalog.graft.root", root)
    val df = s2.sql("""MERGE INTO graft.cust t
      USING (SELECT c_custkey AS k, round(c_acctbal*2.0,4) AS nb
             FROM graft.cust WHERE c_custkey < 10) f
      ON t.c_custkey = f.k
      WHEN MATCHED THEN UPDATE SET c_acctbal = f.nb""")
    println("=== merge plan ===")
    println(df.queryExecution.executedPlan.toString.take(7000))
    spark.stop()
  }
}
