package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B a set of session confs over a list of registry queries — the
  * r21 tool for testing guide-§2.2 partition-sizing postures before
  * committing them to GraftSession.defaults.
  *
  * Usage:
  *   sbt "runMain graft.tools.ConfBench <sfDir> <iters> \
  *     q_a,q_b,q_c  k1=v1,k2=v2"
  * (empty conf string = baseline)
  */
object ConfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args(2).split(",").toSeq
    val confs = if (args.length > 3 && args(3).nonEmpty)
      args(3).split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq else Seq.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = GraftSessionBuilder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = graft.util.GraftSession.defaults(b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count()
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to iters).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = times.drop(1)
      println(f"[confbench] $name cold=${times.head}%.3f " +
        f"warmMin=${warm.min}%.3f warmMed=${warm.sorted.apply(warm.size / 2)}%.3f " +
        times.map(t => f"$t%.2f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
  private def GraftSessionBuilder() = SparkSession.builder()
}
