package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/parquet-footer warmup so the first timed query isn't
    // charged ~3s of one-time session cost.
    SparkEntry.entry(spark).count()
    // Deterministic (sorted) order + time the SECOND of two runs per
    // query: round-1 showed trivial single-shuffle queries absorbing
    // ~3s of residual JIT/session warmup purely by map-iteration
    // position, masking real plan regressions round-over-round. The
    // first (cold) run is timed too so shared-cache materialization
    // regressions stay observable in total_cold.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // GC hygiene, OUTSIDE the timed window: without it, garbage from
      // earlier queries gets collected inside a later query's timing —
      // round 8's driver run showed multi-second spikes on untouched
      // trivial queries that a clean re-run reproduced none of. Shared
      // plan caches are deliberately KEPT across queries (cross-query
      // reuse is part of the design and of total_cold's meaning).
      System.gc()
      val c0 = System.nanoTime()
      val coldOk = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val cold = if (coldOk) (System.nanoTime() - c0) / 1e9 else -1.0
      // WARM = min of two post-cold runs (r19, the r18 verdict's #6):
      // this VM showed ±30-80% same-code noise on single warm runs;
      // the min of two cuts the band while staying comparable (a min
      // can only be ≤ the old single run). A crashing query must
      // surface as -1, not as a tiny "fast" time.
      val warm = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      (name, if (warm.exists(_ < 0)) -1.0 else warm.min, cold)
    }
    // 3-decimal values keep the whole per-query JSON line under the
    // driver's 4 KB output-tail capture (17-digit doubles overflowed it
    // in rounds 1-2, truncating the line and losing the total).
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val failures = results.filter(_._2 < 0).map(_._1)
    // failed queries are excluded from the totals (a -1 sentinel summed
    // in would understate the total and make rounds non-comparable)
    val total = r3(results.map(_._2).filter(_ >= 0).sum)
    val totalCold = r3(results.map(_._3).filter(_ >= 0).sum)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fs = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Self-diagnosis of environment noise (round-8 lesson: the driver
    // sandbox showed 3-10× warm-run spikes on untouched queries that a
    // clean re-run reproduced none of): a SECOND run slower than 3× a
    // meaningful cold run is contention/GC interference, not plan cost
    // — warm follows cold immediately with every cache hot, so honest
    // work can only shrink. Flagged, not excluded: totals stay
    // comparable; the field tells the reader which entries to distrust.
    val suspect = results.filter { case (_, warm, cold) =>
      warm > 0 && cold > 0 && warm > 3 * cold && warm - cold > 0.5 }
    val sus = suspect.map { case (k, w, c) =>
      s"\"" + k + "\":{\"warm\":" + r3(w) + ",\"cold\":" + r3(c) + "}" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$fs,"total_cold":$totalCold,"sf":"$sfDir"}""")
    // Final, short, self-contained line: even if the line above ever
    // outgrows the 4 KB tail again, this one survives truncation and
    // carries the gate number. Distinct metric name so a parser keying
    // on "metric" can never confuse the two lines. heap_used_mb (after
    // the run, pre-clear) contextualizes GC-pressure noise round-over-
    // round; suspect_warm lists queries whose warm run exceeded 3× cold.
    val rt = Runtime.getRuntime
    val heapMb = r3((rt.totalMemory() - rt.freeMemory()) / 1e6)
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","n_queries":${results.size},"n_failed":${failures.size},"total_cold":$totalCold,"heap_used_mb":$heapMb,"suspect_warm":$sus,"warm_runs":2,"sf":"$sfDir"}""")
    graft.util.Caches.clear(spark)
    spark.stop()
  }
}
