package graft.tools

import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Per-JOB time attribution for one registry query — the r21
  * optimization round's measurement loop (guide §1: measure first).
  * Runs `q_name` N times exactly as Bench does (`fn(s, sf).count()`)
  * and prints every Spark job the iteration launched with its wall
  * time, stage count, task count and description, plus the
  * driver-side gap (iteration wall − Σ job wall) that exposes
  * planning / manifest-IO / listing cost no job accounts for.
  *
  * Usage: sbt "runMain graft.tools.JobProfile q_name /root/testdata/sf0.1 3"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.GraftSession.defaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.entry(spark).count() // session warmup

    case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var tasks: Int = 0, var stages: Int = 0)
    val jobs = ArrayBuffer.empty[Job]
    val lock = new Object
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          lock.synchronized {
            val desc = Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(Option(e.properties).flatMap(p =>
                Option(p.getProperty("callSite.short"))))
              .getOrElse("?")
            jobs += Job(e.jobId, desc, e.time,
              stages = e.stageInfos.size,
              tasks = e.stageInfos.map(_.numTasks).sum)
          }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          lock.synchronized {
            jobs.find(_.id == e.jobId).foreach(_.end = e.time)
          }
      })

    // self-sampler: every 50 ms, record the top in-app frame of every
    // RUNNABLE thread (skipping JVM/GC service threads) — prints an
    // aggregate at the end, attributing the driver gap.
    val frames = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val sampling = new java.util.concurrent.atomic.AtomicBoolean(true)
    val sampler = new Thread(() => {
      while (sampling.get()) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          if (t.getState == Thread.State.RUNNABLE &&
              t.getId != Thread.currentThread().getId && st.nonEmpty) {
            // find the first frame that names spark/graft code; else top
            val top = st.find { f =>
              val c = f.getClassName
              c.startsWith("org.apache.spark") || c.startsWith("graft") ||
                c.startsWith("org.apache.hadoop")
            }.getOrElse(st.head)
            val key = top.getClassName + "." + top.getMethodName
            frames.merge(key, 1, (a, b) => a + b)
            // deep attribution for shell forks: record WHO invoked it
            if (top.getClassName.endsWith("util.Shell")) {
              val chain = st.iterator.map(f =>
                f.getClassName.split('.').last + "." + f.getMethodName)
                .filterNot(_.startsWith("Shell")).take(6).mkString(" <- ")
              frames.merge("SHELLCALL: " + chain, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val fn = graft.SparkEntry.queries(name)
    (1 to iters).foreach { i =>
      lock.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain end events
      lock.synchronized {
        val byTime = jobs.toSeq.sortBy(j => -(j.end - j.start))
        val jobSum = jobs.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        println(f"[jobprofile] $name iter $i: wall=$wall%.3f s " +
          f"jobs=${jobs.size} jobSum=$jobSum%.3f s " +
          f"driverGap=${wall - jobSum}%.3f s ($n rows)")
        byTime.take(15).foreach { j =>
          println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3f s " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(90)}")
        }
      }
    }
    sampling.set(false)
    import scala.jdk.CollectionConverters._
    println("[jobprofile] top RUNNABLE frames across run:")
    frames.asScala.toSeq.sortBy(-_._2.intValue).take(40).foreach {
      case (k, n) => println(f"  $n%5d  $k")
    }
    spark.stop()
  }
}
