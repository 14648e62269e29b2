package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MEASURED avro-OCF vs vectorized-parquet scan comparison (r20, the
  * r19 verdict's #2): the fleet's transactional tier stores
  * row-oriented Avro containers; this main quantifies what a columnar
  * (Parquet) data tier would buy on scan-bound analytics so the
  * SURVEY §8 note argues from numbers, not vibes.
  *
  * Method: replicate lineitem sf0.1 ×N (default 10 → ~6M rows, 16
  * columns) once into a committed graft-avro fleet and once into
  * plain parquet (both written by the same job, same row order, snappy
  * both sides), then time three canonical shapes, warm (min of `iters`
  * post-cold runs per engine, interleaved to keep page-cache parity):
  *
  *  W  wide aggregate   — 8-column full-scan agg (decode-bound)
  *  N  narrow projection — 2-column sum (column-pruning bound)
  *  F  filtered narrow   — 2 columns under a 1% selective predicate
  *                         (pushdown + pruning)
  *
  * Usage: runMain graft.tools.ScanTierBench [sfDir] [replicas] [iters]
  * Prints one JSON line per (shape, engine) plus a summary ratio. */
object ScanTierBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val replicas = if (args.length > 1) args(1).toInt else 10
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = graft.util.Scratch.dir("scan_tier_bench")
    // identical logical schema both sides (the avro sink takes flat
    // primitives; NTZ timestamps cast to TIMESTAMP for parity)
    val base0 = graft.util.Tables.lineitem(spark, sfDir)
    val base = base0.select(base0.schema.fields.map { f =>
      f.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          col(f.name).cast("timestamp").as(f.name)
        case _ => col(f.name)
      }
    }.toSeq: _*)
    val wide = (0 until replicas).map(i =>
      base.withColumn("l_orderkey",
        $"l_orderkey" + lit(i.toLong * 100000000L))).reduce(_ union _)
    val avroDir = s"$root/lineitem.avro"
    val parqDir = s"$root/lineitem.parquet"
    wide.write.format("graft-avro").mode("overwrite").save(avroDir)
    wide.write.mode("overwrite").parquet(parqDir)

    def avro() = spark.read.format("graft-avro").load(avroDir)
    def parq() = spark.read.parquet(parqDir)

    val shapes: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame)] = Seq(
      "wide_agg" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity"), sum($"l_extendedprice"),
            avg($"l_discount"), avg($"l_tax"),
            count(lit(1)), max($"l_shipdate"), min($"l_shipdate"),
            sum($"l_partkey"), sum($"l_suppkey"))),
      "narrow_sum" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.agg(sum($"l_quantity"), sum($"l_extendedprice"))),
      "filtered" -> ((df: org.apache.spark.sql.DataFrame) =>
        df.filter($"l_shipdate" >= "1998-11-01")
          .agg(sum($"l_quantity"), count(lit(1)))))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, Double]
    for ((name, q) <- shapes) {
      // cold once each (interleaved), then warm min-of-iters
      q(avro()).collect(); q(parq()).collect()
      var aBest = Double.MaxValue
      var pBest = Double.MaxValue
      (1 to iters).foreach { _ =>
        aBest = math.min(aBest, time(q(avro()).collect()))
        pBest = math.min(pBest, time(q(parq()).collect()))
      }
      results(s"${name}_avro") = aBest
      results(s"${name}_parquet") = pBest
      println(f"""{"shape":"$name","avro_sec":$aBest%.3f,""" +
        f""""parquet_sec":$pBest%.3f,"avro_over_parquet":${
          aBest / pBest}%.2f}""")
    }
    val rows = parq().count()
    println(f"""{"metric":"scan_tier_bench","rows":$rows,""" +
      f""""replicas":$replicas,"ratios":{${
        shapes.map { case (n, _) =>
          f""""$n":${results(s"${n}_avro") / results(s"${n}_parquet")}%.2f"""
        }.mkString(",")}}}""")
    spark.stop()
  }
}
