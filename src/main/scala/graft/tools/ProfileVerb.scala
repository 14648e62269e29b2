package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase timing for the staged SQL row-level verbs — attribution tool
  * for the r16→r17 bench question ("is the fleet-verb slowdown the
  * commit protocol, the scan-side vector resolution, or staging?").
  * Times (1) the golden-clone staging, (2) the UPDATE command itself,
  * (3) the read-back, separately, over N reps. Not part of any
  * registered query. */
object ProfileVerb {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // session warmup
    try {
      val jobs = new java.util.concurrent.atomic.AtomicInteger()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
        })
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val s2 = graft.ops.Crud.profileStage(spark, sf, s"profverb_$i")
        val t1 = System.nanoTime()
        val j1 = jobs.get()
        s2.sql(
          """UPDATE graft.cust SET c_acctbal = round(c_acctbal + 500.0, 4)
            |WHERE c_custkey < 100""".stripMargin)
        val t2 = System.nanoTime()
        val j2 = jobs.get()
        val n = s2.sql("SELECT * FROM graft.cust ORDER BY c_custkey")
          .collect().length
        val t3 = System.nanoTime()
        val j3 = jobs.get()
        // second readback: same path, warm listing/stats
        val n2 = s2.sql("SELECT * FROM graft.cust ORDER BY c_custkey")
          .collect().length
        val t4 = System.nanoTime()
        val j4 = jobs.get()
        def ms(a: Long, b: Long) = (b - a) / 1e6
        println(f"[profverb] iter $i: stage=${ms(t0, t1)}%.1f ms " +
          f"update=${ms(t1, t2)}%.1f ms (${j2 - j1} jobs) " +
          f"readback=${ms(t2, t3)}%.1f ms (${j3 - j2} jobs) " +
          f"readback2=${ms(t3, t4)}%.1f ms (${j4 - j3} jobs) " +
          f"($n/$n2 rows)")
      }
    } finally spark.stop()
  }
}
