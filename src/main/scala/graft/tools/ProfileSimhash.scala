package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for the simhash-pairs pipeline: times each stage and
  * prints candidate-set sizes, to locate where the seconds go at a
  * given SF. Usage: sbt "runMain graft.tools.ProfileSimhash /root/testdata/sf0.1" */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    spark.range(1).count() // session warmup

    val tok = graft.util.Shingles.tokDistinct(spark,
      graft.util.Tables.documents(spark, sfDir), 3)
    t("tok count")(println("  rows=" + tok.count()))

    // the PRODUCTION fingerprint pipeline (no copy — measurement and
    // production must not drift)
    val fpBase = graft.ops.DedupAdvanced.fingerprints(spark, sfDir)
    t("fingerprint agg")(println("  docs=" + fpBase.count()))

    val fp = fpBase.withColumn("lenb", ($"n_sh" / 16).cast("int")).cache()
    t("fp cache materialize")(fp.count())

    val banded = fp.select($"doc_id", $"fp",
      explode(graft.ops.DedupAdvanced.bandKeys($"fp", $"lenb")).as("band"))
    t("banded count")(println("  bands=" + banded.count()))

    val joined = banded.as("a").join(banded.as("b"), Seq("band"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.fp").as("a_fp"), col("b.fp").as("b_fp"))
    t("raw candidates")(println("  cand=" + joined.count()))

    val dist = joined.distinct()
    t("distinct candidates")(println("  dcand=" + dist.count()))

    val out = dist
      .withColumn("hamming", expr("bit_count(a_fp ^ b_fp)").cast("long"))
      .filter($"hamming" <= 16)
    t("hamming+filter")(println("  pairs=" + out.count()))

    spark.stop()
  }
}
