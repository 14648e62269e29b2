package graft

import org.apache.spark.sql.functions._
import graft.ops.{Crud, Layout, Relational, Windows}

/** Layout + maintenance-op specs: z-order clustering quality (the
  * property the oracle cannot see — the RESULT is layout-invariant by
  * design, the LOCALITY is the point), SCD2 versioning semantics, the
  * profile unpivot, and the sorted-groups secondary sort. */
class LayoutSpec extends SparkSpec {

  test("morton interleave is the textbook z-curve on small inputs") {
    import spark.implicits._
    // (x, y) -> z for the 4x4 grid: z = interleave(x even bits, y odd)
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 0L),
      (3L, 3L), (2L, 3L))
      .toDF("x", "y")
      .select($"x", $"y", Layout.interleave16($"x", $"y").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // z(x,y) with x in even bit positions, y in odd
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((1L, 1L)) == 3L)
    assert(got((2L, 0L)) == 4L)
    assert(got((2L, 3L)) == 14L)
    assert(got((3L, 3L)) == 15L)
  }

  test("z-order rewrite shrinks per-file extents on BOTH dimensions") {
    import spark.implicits._
    val out = graft.util.Scratch.dir("zorder_spec")
    val z = Layout.zorderLineitem(spark, sfDir, out)
    // rewrite is lossless
    val base = graft.util.Tables.lineitem(spark, sfDir)
    assert(z.count() == base.count())
    // per-file min/max extents: with 8 z-ordered files, the average
    // file must cover far less than the full range of EACH key — a
    // single-column sort would ace one dim and cover ~100% of the
    // other; z-order bounds both. The split is ASYMMETRIC by design:
    // 8 files = the top 3 z-bits, which alternate dims (one dim gets 2
    // bits -> ~4x shrink, the other 1 bit -> ~2x), so assert >1.4x on
    // each dim AND a combined product a one-dim sort cannot reach
    // (its product caps at ~n_files x 1).
    val ext = z.groupBy(input_file_name().as("f"))
      .agg((max($"l_orderkey") - min($"l_orderkey")).as("ok_ext"),
        (max($"l_partkey") - min($"l_partkey")).as("pk_ext"))
      .agg(avg($"ok_ext").as("ok_mean"), avg($"pk_ext").as("pk_mean"),
        count(lit(1)).as("n_files"))
      .collect()(0)
    val okRange = base.agg(max($"l_orderkey") - min($"l_orderkey"))
      .collect()(0).getLong(0).toDouble
    val pkRange = base.agg(max($"l_partkey") - min($"l_partkey"))
      .collect()(0).getLong(0).toDouble
    assert(ext.getLong(2) >= 4, "rewrite should produce multiple files")
    val okShrink = okRange / ext.getDouble(0)
    val pkShrink = pkRange / ext.getDouble(1)
    assert(okShrink > 1.4 && pkShrink > 1.4,
      f"per-dim shrink ($okShrink%.2fx, $pkShrink%.2fx) — z-order must " +
        "bound BOTH dims; a one-dim sort leaves one near 1x")
    assert(okShrink * pkShrink > 5.0,
      f"combined shrink ${okShrink * pkShrink}%.2f < 5 — locality too weak")
  }

  test("scd2 versions are contiguous, gap-free, and single-current per key") {
    import spark.implicits._
    val h = Crud.qCdcScd2(spark, sfDir).cache()
    // exactly one current version per key
    val multi = h.filter($"is_current")
      .groupBy($"c_custkey").count().filter($"count" =!= 1).count()
    assert(multi == 0, "a key has != 1 current version")
    // versions are 1..n dense per key
    val dense = h.groupBy($"c_custkey")
      .agg(count(lit(1)).as("n"), max($"version").as("vmax"),
        min($"version").as("vmin"))
      .filter($"vmin" =!= 1 || $"vmax" =!= $"n").count()
    assert(dense == 0, "version numbering has gaps")
    // each non-current row's valid_to equals the next version's
    // valid_from (the half-open interval chain)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_custkey").orderBy($"version")
    val broken = h.withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
      .count()
    assert(broken == 0, "validity chain is broken")
    // F-status orders appear as NULL-value tombstone versions
    assert(h.filter($"val".isNull).count() > 0,
      "expected delete tombstones from F-status orders")
    h.unpersist()
  }

  test("profile runs Expand-free over two column-pruned passes") {
    val df = Relational.qProfileTable(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 4)
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val nRows = graft.util.Tables.lineitem(spark, sfDir).count()
    assert(byCol("l_orderkey").getLong(1) == nRows)
    assert(byCol("l_returnflag").getLong(3) == 3) // A/N/R
    assert(byCol("l_orderkey").getLong(2) == 0)   // no nulls
    // the multi-countDistinct formulation lowers to an Expand that
    // copies every row |cols|+1 times through a wide shuffle (measured
    // 5.6-8.4 s at sf0.1); the unpivot-then-two-level-aggregate shape
    // must stay Expand-free (stack is a Generate, not an Expand) and
    // read at most the two deliberate passes over the relation
    val plan = df.queryExecution.optimizedPlan
    assert(!plan.toString.contains("Expand"),
      s"profile must not multi-distinct via Expand:\n$plan")
    val leaves = plan.collectLeaves()
    assert(leaves.size == 2, s"profile reads two pruned passes: $leaves")
  }

  test("sorted-groups gaps equal the declarative lag-window twin") {
    import spark.implicits._
    val typed = Windows.qWinSortedGroups(spark, sfDir)
    val ev = graft.util.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("ts_s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_s", $"event_id")
    val decl = ev.select($"user_id", $"event_id",
      coalesce($"ts_s" - lag($"ts_s", 1).over(w), lit(-1L)).as("gap_s"))
    assert(typed.exceptAll(decl).count() == 0 &&
      decl.exceptAll(typed).count() == 0,
      "flatMapSortedGroups disagrees with the lag window")
    // first event of every user carries the -1 sentinel
    assert(typed.filter($"gap_s" === -1L).count() ==
      ev.select($"user_id").distinct().count())
  }
}
