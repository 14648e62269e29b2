package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Data-layout management (SURVEY.md §2 extension): Z-order clustering,
  * the standard multi-dimensional file-clustering technique for big
  * scan-heavy tables (Delta/Iceberg expose the same verb as `OPTIMIZE
  * ... ZORDER BY`). A table range-partitioned and sorted on ONE key
  * skips beautifully on that key and not at all on any other; sorting
  * on the interleaved-bit Morton code of TWO (or more) normalized keys
  * gives every participating dimension locality, so parquet min/max
  * row-group pruning and file skipping work for predicates on EITHER
  * column — the 100 TB answer to "we filter this table by customer AND
  * by date".
  *
  * Everything here is plain column algebra (shift/and/or — whole-stage
  * codegen'd, no UDF), one scalar-aggregate job for the normalization
  * bounds (broadcast back, never collected to literals inside the plan
  * builder — the bounds frame is 1 row), one bucketed-shuffle write. The
  * rewrite reads each row once and writes it once, the same cost shape
  * as a compaction pass; at 100 TB it would run per-partition
  * incrementally, but the per-file z-locality property proven by the
  * spec is scale-invariant.
  */
object Layout {

  /** Morton code: interleave the low 16 bits of `x` (even positions)
    * and `y` (odd positions) into one 32-bit z-value. Pure bitwise
    * column algebra — stays inside whole-stage codegen. */
  private[graft] def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale a long column into [0, 65535] given broadcast min/max
    * columns (`greatest(..,1)` guards the constant-column case). */
  private def norm16(c: Column, lo: Column, hi: Column): Column =
    ((c - lo) * lit(65535L) / greatest(hi - lo, lit(1L))).cast("long")

  /** Rewrite `lineitem` Z-ordered on (l_orderkey, l_partkey): compute
    * per-column bounds (one tiny scalar agg, broadcast), normalize both
    * keys to 16 bits, Morton-interleave, range-partition + sort on the
    * z-value, write parquet. Returns the rewritten table so callers can
    * scan it; the registered query reads it back through a 2-D box
    * predicate — at scale that scan opens only the files whose z-range
    * intersects the box (parquet min/max prunes the rest), which the
    * LayoutSpec quantifies (per-file extent of BOTH dims shrinks vs the
    * incoming layout). */
  /** INT64-column bounds straight from parquet FOOTER statistics —
    * the same commit-stats source the fleet sidecar tier captures
    * (guide §6): one footer read per file, no scan job, exact for
    * INT64 (never truncated, unlike strings). `None` on any missing/
    * unsound chunk stat, and the caller falls back to the scan-side
    * scalar aggregate — a skipped fast path, never a wrong bound. At
    * 100 TB these bounds come from the table format's column stats
    * (Iceberg/Delta OPTIMIZE reads exactly this) instead of an extra
    * full-column pass. */
  private def footerLongBounds(s: SparkSession, table: String,
      wanted: Seq[String]): Option[Map[String, (Long, Long)]] = try {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val p = new org.apache.hadoop.fs.Path(table)
    val conf = s.sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    val files =
      (if (fs.getFileStatus(p).isDirectory) {
        val listed = fs.listStatus(p).toSeq.filter { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        // a layout mixing top-level data files with partition subdirs
        // would compute bounds from the top-level files ONLY — narrower
        // than what the scan reads, so norm16 would emit out-of-range
        // values and a WRONG z-order (ADVICE r21). Any visible subdir
        // alongside data files forfeits the fast path; the scan-side
        // aggregate fallback is always sound.
        if (listed.exists(_.isDirectory)) return None
        listed.filter(_.isFile)
      }
      else Seq(fs.getFileStatus(p))).map(_.getPath)
    if (files.isEmpty) return None
    val perFile = files.map { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val footer = reader.getFooter
        val blocks = footer.getBlocks.asScala.toSeq
        wanted.map { c =>
          val tpe = footer.getFileMetaData.getSchema.getFields.asScala
            .find(t => t.getName == c && t.isPrimitive)
            .map(_.asPrimitiveType())
            .filter(_.getPrimitiveTypeName ==
              org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
            .getOrElse(return None)
          val _ = tpe
          val stats = blocks.map(_.getColumns.asScala.find { cc =>
            val parts = cc.getPath.toArray
            parts.length == 1 && parts(0) == c
          }.map(_.getStatistics).orNull)
          if (stats.exists(st => st == null || !st.hasNonNullValue))
            return None
          c -> (stats.map(_.genericGetMin.asInstanceOf[Long]).min,
            stats.map(_.genericGetMax.asInstanceOf[Long]).max)
        }.toMap
      } finally reader.close()
    }
    Some(wanted.map { c =>
      val bs = perFile.map(_(c))
      c -> (bs.map(_._1).min, bs.map(_._2).max)
    }.toMap)
  } catch { case scala.util.control.NonFatal(_) => None }

  def zorderLineitem(s: SparkSession, dir: String, out: String): DataFrame = {
    import s.implicits._
    val li = lineitem(s, dir)
    val cols = li.columns.toSeq
    // bounds from footer metadata when sound (no job at all); else the
    // one tiny scalar-aggregate scan, broadcast — never collected
    val z = footerLongBounds(s, s"$dir/lineitem.parquet",
        Seq("l_orderkey", "l_partkey")) match {
      case Some(b) =>
        val (okLo, okHi) = b("l_orderkey")
        val (pkLo, pkHi) = b("l_partkey")
        li.withColumn("zval", interleave16(
          norm16($"l_orderkey", lit(okLo), lit(okHi)),
          norm16($"l_partkey", lit(pkLo), lit(pkHi))))
      case None =>
        val bounds = li.agg(
          min($"l_orderkey").as("ok_lo"), max($"l_orderkey").as("ok_hi"),
          min($"l_partkey").as("pk_lo"), max($"l_partkey").as("pk_hi"))
        li.crossJoin(broadcast(bounds))
          .withColumn("zval", interleave16(
            norm16($"l_orderkey", $"ok_lo", $"ok_hi"),
            norm16($"l_partkey", $"pk_lo", $"pk_hi")))
    }
    val z2 = z
      // bucket on the TOP 3 z-bits rather than repartitionByRange(zval):
      // range boundaries are SAMPLED (seeded by RDD id — run-dependent)
      // and land anywhere in z-space, so a file could straddle a
      // dimension's bit boundary and cover both halves of that dim.
      // Bit-aligned buckets make every file's extent provably bounded
      // by its bucket's z-box (bits 31/30/29 = pk₁₅, ok₁₅, pk₁₄ → pk
      // extent ≤ ¼ range, ok ≤ ½), deterministically on every run.
      .withColumn("zbucket", shiftright($"zval", 29))
    z2.repartition(8, $"zbucket")
      .sortWithinPartitions($"zbucket", $"zval")
      .select((cols :+ "zbucket").map(col): _*)
      .write.mode("overwrite").partitionBy("zbucket").parquet(out)
    s.read.parquet(out).select(cols.map(col): _*)
  }

  /** §2-extension Z-ORDER rewrite + 2-D box scan: cluster lineitem on
    * (l_orderkey, l_partkey), then aggregate a box predicate on the
    * clustered copy. Result-identical to the same query on the base
    * table (layout is invisible to semantics — that is the point, and
    * the oracle pins it); the win is that on the clustered copy the box
    * touches a handful of files instead of all of them. */
  def qLayoutZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = graft.util.Scratch.dir("zorder_lineitem")
    zorderLineitem(s, dir, out)
      .filter($"l_orderkey".between(100L, 1200L) &&
        $"l_partkey".between(10L, 120L))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        r4(sum($"l_extendedprice")).as("sum_price"))
      .orderBy($"l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> qLayoutZorder _
  )

  val oracleSql: Map[String, String] = Map(
    "q_layout_zorder" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem
        |WHERE l_orderkey BETWEEN 100 AND 1200
        |  AND l_partkey BETWEEN 10 AND 120
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
