package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Join operators (SURVEY.md §2.C).
  *
  * Scale notes:
  *  - Physical join choice is Catalyst's (broadcast-hash / sort-merge /
  *    shuffled-hash); we steer with `broadcast()` for dimension tables
  *    (region/nation/supplier/part/customer all ≪ 10 MB even at sf100).
  *  - The as-of join is the union-tag + running-`last` window form: ONE
  *    shuffle on the key, sort by time within partitions — the canonical
  *    distributed as-of; never a per-row lookup.
  *  - The interval join keeps an equi key (user_id) so it lowers to a
  *    keyed join + range filter, not a cartesian; at 100 TB skewed users
  *    are handled by AQE skew-join splitting.
  *  - The theta join (no equi key) is range-bucketed: per-bucket
  *    pre-aggregation + suffix sums for strictly-higher buckets, an
  *    equi-join only for the supplier's own bucket — no
  *    BroadcastNestedLoopJoin anywhere.
  */
object Joins {

  /** §2.C equi inner join (reference: cross-sheet key lookup). */
  def qJoinInner(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    orders(s, dir)
      .join(customer(s, dir), $"o_custkey" === $"c_custkey", "inner")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"o_totalprice")
      .orderBy($"o_orderkey")
  }

  /** §2.C left outer: every customer, orders only in a date window. */
  def qJoinLeft(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o96 = orders(s, dir)
      .filter($"o_orderdate" >= lit("1995-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1995-07-01").cast("timestamp"))
    customer(s, dir)
      .join(o96, $"c_custkey" === $"o_custkey", "left_outer")
      .select($"c_custkey", $"c_name", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** §2.C right outer (mirror of left; exercises the other null side). */
  def qJoinRight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = orders(s, dir).filter($"o_totalprice" > 450.0)
    bigOrders
      .join(customer(s, dir), $"o_custkey" === $"c_custkey", "right_outer")
      .select($"c_custkey", $"c_mktsegment", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** §2.C full outer join on partial key overlap. */
  def qJoinFull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lo = orders(s, dir).filter($"o_custkey" < 300).groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    val hi = customer(s, dir).filter($"c_custkey" >= 200 && $"c_custkey" < 500)
      .select($"c_custkey", $"c_acctbal")
    lo.join(hi, $"o_custkey" === $"c_custkey", "full_outer")
      .select($"o_custkey", $"n_orders", $"c_custkey", $"c_acctbal")
      .orderBy($"o_custkey".asc_nulls_last, $"c_custkey".asc_nulls_last)
  }

  /** §2.C left-semi: customers having at least one high-value order. */
  def qJoinSemi(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = orders(s, dir).filter($"o_totalprice" > 400.0)
    customer(s, dir)
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_acctbal")
      .orderBy($"c_custkey")
  }

  /** §2.C left-anti: customers with no open ('O') order. */
  def qJoinAnti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val open = orders(s, dir).filter($"o_orderstatus" === "O")
    customer(s, dir)
      .join(open, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** §2.C broadcast dim join: revenue by part type (plan asserts
    * BroadcastHashJoin in the unit test). */
  def qJoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    lineitem(s, dir)
      .join(broadcast(part(s, dir)), $"l_partkey" === $"p_partkey")
      .groupBy($"p_type")
      .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"p_type")
  }

  /** §2.C theta (non-equi, no key): per supplier, how many customers
    * out-balance it. RANGE-BUCKETED, not BNLJ: bucket acctbal on both
    * sides (fixed width), pre-aggregate customers per bucket, take the
    * suffix-sum for strictly-higher buckets, and resolve only the
    * supplier's OWN bucket with an equi-join compare. Compare count goes
    * from O(|cust|·|supp|) to O(|supp|·cust-per-bucket) + a
    * constant-size bucket table; every join is equi/broadcast (the unit
    * test asserts no BNLJ/CartesianProduct in the plan). Correct on
    * boundaries: a customer in a strictly higher bucket has
    * c ≥ (sb+1)·w > s, and floor handles negatives. */
  def qJoinTheta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    thetaCore(s, customer(s, dir).select($"c_acctbal"),
      supplier(s, dir).select($"s_suppkey", $"s_acctbal"))
  }

  /** Bucketed theta core over any (c_acctbal) / (s_suppkey, s_acctbal)
    * frames; factored out so tests can hammer bucket-boundary values
    * (exact multiples of the width, ties, negatives) against a naive
    * cross-join reference. */
  private[graft] def thetaCore(s: SparkSession, cust0: DataFrame,
      sup0: DataFrame): DataFrame = {
    import s.implicits._
    val w = 50.0 // bucket width; bucket count stays O(range/w) — constant
    val cust = cust0.select($"c_acctbal",
      floor($"c_acctbal" / w).as("cb"))
    val sup = sup0.select($"s_suppkey", $"s_acctbal",
      floor($"s_acctbal" / w).as("sb"))
    val perB = cust.groupBy($"cb").agg(count(lit(1)).as("cnt"))
    // suffix-sum over OBSERVED buckets only (customer buckets ∪ supplier
    // buckets — unobserved buckets hold no customers, so skipping them
    // changes nothing), never a densified range: a single outlier
    // acctbal must not materialize a giant sequence(). The window runs
    // over this small distinct-bucket table, not the data.
    val allB = perB.select($"cb", $"cnt").unionByName(
      sup.select($"sb".as("cb"), lit(0L).as("cnt")))
      .groupBy($"cb").agg(sum($"cnt").as("cnt"))
    val wCum = Window.orderBy($"cb".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = allB
      .withColumn("above", coalesce(sum($"cnt").over(wCum), lit(0L)))
      .select($"cb", $"above")
    // same-bucket residual: equi-join on the bucket + in-bucket compare
    val same = sup.join(cust,
        $"sb" === $"cb" && $"c_acctbal" > $"s_acctbal")
      .groupBy($"s_suppkey").agg(count(lit(1)).as("n_same"))
    sup.join(broadcast(cum), $"sb" === $"cb")
      .join(same, Seq("s_suppkey"), "left")
      .select($"s_suppkey",
        ($"above" + coalesce($"n_same", lit(0L))).as("n_richer_cust"))
      .filter($"n_richer_cust" > 0) // inner-join semantics of the oracle
      .orderBy($"s_suppkey")
  }

  /** §2.C cartesian (tiny dims only). */
  def qJoinCross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    region(s, dir).crossJoin(nation(s, dir))
      .select($"r_regionkey", $"r_name", $"n_nationkey", $"n_name")
      .orderBy($"r_regionkey", $"n_nationkey")
  }

  /** §4 skew posture, oracle-gated: the salted join (`util/Skew`) run
    * as a registry query — orders salted 8 ways against the replicated
    * customer dim, then the revenue-per-segment aggregate. Salting is
    * SEMANTICS-PRESERVING (the oracle is the plain join), which is
    * exactly what this entry proves; the ScaleSpec equality test
    * already pins it against the unsalted join, this pins it against
    * an independent engine. At 100 TB this is the shape for a
    * pathologically hot key that AQE's sort-merge skew split can't
    * help (single hot hash partition): big side salted by a
    * deterministic row hash, small side exploded `salts` ways. */
  def qJoinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = orders(s, dir).select($"o_custkey".as("custkey"), $"o_totalprice")
    val small = customer(s, dir)
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    graft.util.Skew.saltedJoin(big, small, "custkey", 8)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), r4(sum($"o_totalprice")).as("sum_price"))
      .select($"c_mktsegment".cast("string").as("c_mktsegment"), $"n", $"sum_price")
      .orderBy($"c_mktsegment")
  }

  /** §2.C as-of join: for each purchase event, the latest click event of
    * the same user at-or-before it. Union-tag + running `last` window —
    * one shuffle on user_id, DuckDB's native ASOF JOIN as the oracle.
    *
    * Precondition for oracle parity: (user_id, ts) is unique among
    * clicks (holds in every fixture scale). DuckDB ASOF picks an
    * ARBITRARY click on a ts tie, so no Spark-side tie-break can
    * reconcile duplicates; the trailing click_id sort key below only
    * makes OUR output deterministic (max click_id wins) if a refreshed
    * fixture ever violates the precondition. */
  def qJoinAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val tagged = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"), lit(0).as("tag"),
        lit(null).cast("long").as("purchase_id"))
      .unionByName(
        e.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", lit(null).cast("long").as("click_id"),
            lit(1).as("tag"), $"event_id".as("purchase_id")))
    // clicks sort before purchases at equal ts => "at-or-before" semantics
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"click_id".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"purchase_id", $"user_id", tstr($"ts").as("purchase_ts"),
        $"last_click_id")
      .orderBy($"purchase_id")
  }

  /** §2.C as-of join with TOLERANCE: each purchase attributed to the
    * user's last click at-or-before it, but only when that click is
    * within 30 minutes — stale matches null out (the standard
    * attribution-window semantics). Same union-tag + running-last core
    * as qJoinAsof (one shuffle on user_id, no join at all), carrying
    * the matched click's timestamp so the tolerance is a post-window
    * filter, not a second pass. */
  def qJoinAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val tagged = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"), lit(0).as("tag"),
        lit(null).cast("long").as("purchase_id"))
      .unionByName(
        e.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", lit(null).cast("long").as("click_id"),
            lit(1).as("tag"), $"event_id".as("purchase_id")))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"click_id".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when($"tag" === 0, $"ts"), ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"purchase_id", $"user_id", tstr($"ts").as("purchase_ts"),
        when($"last_click_ts" >= $"ts" - expr("INTERVAL 30 MINUTES"),
          $"last_click_id").as("attributed_click_id"))
      .orderBy($"purchase_id")
  }

  /** §2.C NEAREST-direction as-of join: each purchase attributed to the
    * user's click closest in time in EITHER direction (tie → the
    * earlier, at-or-before click). Completes the as-of family
    * (backward = `q_join_asof`, backward+tolerance =
    * `q_join_asof_tolerance`). Same union-tag core, ONE shuffle on
    * user_id: the backward candidate rides the running-last frame and
    * the forward candidate the mirrored first-following frame — both
    * windows share the single (ts, tag, click_id) partition sort, so
    * adding the second direction costs no extra exchange. Clicks sort
    * before purchases at equal ts, which puts an equal-ts click in the
    * BACKWARD frame only — distance 0, always wins, matching the
    * oracle's tie CASE. Same (user_id, ts)-uniqueness precondition as
    * `q_join_asof` (DuckDB ASOF breaks exact-ts ties arbitrarily). */
  def qJoinAsofNearest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val tagged = e.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"), lit(0).as("tag"),
        lit(null).cast("long").as("purchase_id"))
      .unionByName(
        e.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", lit(null).cast("long").as("click_id"),
            lit(1).as("tag"), $"event_id".as("purchase_id")))
    val ord = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"click_id".asc_nulls_last)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // distances in exact MICROSECONDS (events carry sub-second ts;
    // second-floored arithmetic mis-ranks the two directions and
    // drifts ±1 s against the oracle's epoch math)
    val tsUs = unix_micros($"ts")
    tagged
      .withColumn("b_id", last($"click_id", ignoreNulls = true).over(wB))
      .withColumn("b_us",
        last(when($"tag" === 0, tsUs), ignoreNulls = true).over(wB))
      .withColumn("f_id", first($"click_id", ignoreNulls = true).over(wF))
      .withColumn("f_us",
        first(when($"tag" === 0, tsUs), ignoreNulls = true).over(wF))
      .filter($"tag" === 1)
      .withColumn("pick_b",
        $"f_id".isNull ||
          ($"b_id".isNotNull && (tsUs - $"b_us") <= ($"f_us" - tsUs)))
      .select($"purchase_id", $"user_id", tstr($"ts").as("purchase_ts"),
        when($"pick_b", $"b_id").otherwise($"f_id").as("nearest_click_id"),
        when($"pick_b", tsUs - $"b_us").otherwise($"f_us" - tsUs).as("dist_us"))
      .orderBy($"purchase_id")
  }

  /** §2.C STORAGE-PARTITIONED join: both sides land as `clusterBy`
    * fleets through the V2 writer — one shard value per file, proven
    * by each file's sidecar min==max — so the scans report
    * `KeyGroupedPartitioning` and the join on the shard key runs with
    * ZERO exchanges (SpjSpec asserts it in the final adaptive plan).
    * This is the 100 TB fact-to-fact posture one step past bucketed
    * tables (`q_join_bucketed`): no metastore, the co-location proof
    * travels in the data's own sidecars, and an unprovable layout
    * lapses to a plain shuffled join rather than mis-grouping. The
    * `merge` hint keeps the tiny fixture-side dim from broadcasting so
    * the exchange-free path is what actually executes. Semantics are
    * layout-invariant — the oracle is the plain join. */
  def qJoinSpj(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("spj_join")
    val ev = events(s, dir)
      .select($"user_id", $"value",
        pmod($"user_id", lit(8)).cast("long").as("shard"))
    val perUser = ev.groupBy($"shard", $"user_id")
      .agg(r4(sum($"value")).as("user_spend"))
    val perShard = ev.groupBy($"shard")
      .agg(r4(sum($"value")).as("shard_total"))
    perUser.repartition(4, $"shard").write.format("graft-avro")
      .option("clusterBy", "shard").mode("overwrite").save(s"$root/user.avro")
    perShard.repartition(2, $"shard").write.format("graft-avro")
      .option("clusterBy", "shard").mode("overwrite").save(s"$root/shard.avro")
    val a = s.read.format("graft-avro")
      .option("clusterBy", "shard").load(s"$root/user.avro")
    val b = s.read.format("graft-avro")
      .option("clusterBy", "shard").load(s"$root/shard.avro")
    a.join(b.hint("merge"), Seq("shard"))
      .select($"shard", $"user_id", $"user_spend", $"shard_total",
        r6($"user_spend" / $"shard_total").as("share"))
      .orderBy($"shard", $"user_id")
  }

  /** §2.C PARTIALLY-clustered storage-partitioned join: only ONE side
    * is a proven clustered fleet; the other is an ordinary in-plan
    * aggregate with no layout proof. With
    * `v2.bucketing.shuffle.enabled` (GraftSession), the planner keeps
    * the fleet's `KeyGroupedPartitioning` and shuffles JUST the plain
    * side into it — one exchange instead of re-shuffling both sides
    * (SpjSpec pins exactly-one-exchange on the scan-vs-fleet case).
    * This is the common 100 TB shape: the big fact table is laid out
    * once, and every ad-hoc per-key table computed against it rides
    * the existing layout instead of forcing a two-sided shuffle.
    * Semantics are layout-invariant — the oracle is the plain join. */
  def qJoinSpjPartial(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = graft.util.Scratch.dir("spj_partial_join")
    val ev = events(s, dir)
      .select($"user_id", $"value",
        pmod($"user_id", lit(8)).cast("long").as("shard"))
    val perUser = ev.groupBy($"shard", $"user_id")
      .agg(r4(sum($"value")).as("user_spend"))
    perUser.repartition(4, $"shard").write.format("graft-avro")
      .option("clusterBy", "shard").mode("overwrite").save(s"$root/user.avro")
    val a = s.read.format("graft-avro")
      .option("clusterBy", "shard").load(s"$root/user.avro")
    val perShard = ev.groupBy($"shard")
      .agg(r4(sum($"value")).as("shard_total"))
    a.join(perShard.hint("merge"), Seq("shard"))
      .select($"shard", $"user_id", $"user_spend", $"shard_total",
        r6($"user_spend" / $"shard_total").as("share"))
      .orderBy($"shard", $"user_id")
  }

  /** §2.C interval join: events of the same user within 1 hour after each
    * signup. Equi key (user_id) + range predicate → keyed join, not a
    * cartesian. */
  def qJoinInterval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = events(s, dir)
    val signups = e.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id".as("su_user"), $"ts".as("su_ts"))
    val follow = e.select($"user_id", $"ts", $"event_id")
    signups
      .join(follow,
        $"su_user" === $"user_id" &&
          $"ts" > $"su_ts" &&
          $"ts" <= $"su_ts" + expr("INTERVAL 1 HOUR"))
      .groupBy($"signup_id")
      .agg(count(lit(1)).as("n_follow"), min($"event_id").as("first_follow_id"))
      .orderBy($"signup_id")
  }

  /** §2.C bucketed (storage-co-located) join: both sides land as
    * bucketed tables on the join key — the 100 TB posture for a fact
    * table repeatedly joined on the same dimension key. Each side is
    * `bucketBy(8, custkey)` + `sortBy`, pre-`repartition`ed on the key
    * so every bucket is ONE file; the scans then report
    * `HashPartitioning(custkey, 8)` and the merge-hinted join plans as
    * a sort-merge join with ZERO shuffle exchanges, and the follow-on
    * `GROUP BY c_custkey` reuses the same partitioning (SMJ exposes
    * both sides' partitionings, so the aggregate is exchange-free
    * too). The only exchange in the whole plan is the presentation
    * `ORDER BY` — plan-asserted in OperatorSpec. At scale this is the
    * "pay the shuffle once at ingest, never again" pattern: the
    * bucketed layout amortizes across every subsequent join/agg on
    * the key. Results are layout-independent, so the oracle is the
    * plain join. */
  def qJoinBucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = graft.util.Scratch.dir("bucketed_join")
    orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .repartition(8, $"o_custkey")
      .write.mode("overwrite").option("path", s"$out/orders")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_bkt_orders")
    customer(s, dir).select($"c_custkey", $"c_name")
      .repartition(8, $"c_custkey")
      .write.mode("overwrite").option("path", s"$out/customer")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_bkt_customer")
    s.table("graft_bkt_orders").hint("merge")
      .join(s.table("graft_bkt_customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name")
      .agg(count(lit(1)).as("n_orders"),
        r4(sum($"o_totalprice")).as("sum_price"))
      .orderBy($"c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> qJoinInner _,
    "q_join_bucketed" -> qJoinBucketed _,
    "q_join_left" -> qJoinLeft _,
    "q_join_right" -> qJoinRight _,
    "q_join_full" -> qJoinFull _,
    "q_join_semi" -> qJoinSemi _,
    "q_join_anti" -> qJoinAnti _,
    "q_join_broadcast" -> qJoinBroadcast _,
    "q_join_theta" -> qJoinTheta _,
    "q_join_cross" -> qJoinCross _,
    "q_join_skew_salted" -> qJoinSkewSalted _,
    "q_join_asof" -> qJoinAsof _,
    "q_join_asof_tolerance" -> qJoinAsofTolerance _,
    "q_join_asof_nearest" -> qJoinAsofNearest _,
    "q_join_spj" -> qJoinSpj _,
    "q_join_spj_partial" -> qJoinSpjPartial _,
    "q_join_interval" -> qJoinInterval _
  )

  val oracleSql: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,
    // bucketing is a physical layout; the oracle is the plain join
    "q_join_bucketed" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q_join_left" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN (
        |  SELECT * FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1995-07-01') o
        |ON c_custkey = o_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_join_right" ->
      """SELECT c_custkey, c_mktsegment, o_orderkey, o_totalprice
        |FROM (SELECT * FROM orders WHERE o_totalprice > 450.0) o
        |RIGHT JOIN customer ON o_custkey = c_custkey
        |ORDER BY c_custkey, o_orderkey""".stripMargin,
    "q_join_full" ->
      """SELECT o_custkey, n_orders, c_custkey, c_acctbal
        |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders
        |      WHERE o_custkey < 300 GROUP BY o_custkey) lo
        |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer
        |      WHERE c_custkey >= 200 AND c_custkey < 500) hi
        |ON o_custkey = c_custkey
        |ORDER BY o_custkey NULLS LAST, c_custkey NULLS LAST""".stripMargin,
    "q_join_semi" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400.0)
        |ORDER BY c_custkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_broadcast" ->
      """SELECT p_type,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin,
    "q_join_theta" ->
      """SELECT s_suppkey, count(*) AS n_richer_cust
        |FROM customer JOIN supplier ON c_acctbal > s_acctbal
        |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin,
    "q_join_cross" ->
      """SELECT r_regionkey, r_name, n_nationkey, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_regionkey, n_nationkey""".stripMargin,
    // salting is semantics-preserving: the oracle is the PLAIN join
    "q_join_skew_salted" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(sum(o_totalprice), 4) AS sum_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_asof" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  c.event_id AS last_click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    "q_join_asof_tolerance" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  CASE WHEN c.ts >= p.ts - INTERVAL 30 MINUTE
        |       THEN c.event_id END AS attributed_click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY purchase_id""".stripMargin,
    // backward via ASOF >=, forward via ASOF <=; the CASE mirrors the
    // Spark tie-break (equal distance → the at-or-before click)
    "q_join_asof_nearest" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click'),
        |b AS (SELECT p.event_id AS pid, p.user_id, p.ts AS pts,
        |        c.event_id AS bid, c.ts AS bts
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts >= c.ts),
        |f AS (SELECT p.event_id AS pid, c.event_id AS fid, c.ts AS fts
        |      FROM p ASOF LEFT JOIN c
        |        ON p.user_id = c.user_id AND p.ts <= c.ts)
        |SELECT b.pid AS purchase_id, b.user_id,
        |  strftime(b.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  CASE WHEN f.fid IS NULL THEN b.bid
        |       WHEN b.bid IS NOT NULL
        |            AND epoch_us(b.pts) - epoch_us(b.bts)
        |                <= epoch_us(f.fts) - epoch_us(b.pts) THEN b.bid
        |       ELSE f.fid END AS nearest_click_id,
        |  CASE WHEN f.fid IS NULL THEN epoch_us(b.pts) - epoch_us(b.bts)
        |       WHEN b.bid IS NOT NULL
        |            AND epoch_us(b.pts) - epoch_us(b.bts)
        |                <= epoch_us(f.fts) - epoch_us(b.pts)
        |       THEN epoch_us(b.pts) - epoch_us(b.bts)
        |       ELSE epoch_us(f.fts) - epoch_us(b.pts) END AS dist_us
        |FROM b JOIN f ON b.pid = f.pid
        |ORDER BY purchase_id""".stripMargin,
    // layout is invisible to semantics: the oracle is the plain join
    "q_join_spj" ->
      """WITH ev AS (
        |  SELECT user_id, value, user_id % 8 AS shard FROM events),
        |pu AS (SELECT shard, user_id, round(sum(value), 4) AS user_spend
        |       FROM ev GROUP BY shard, user_id),
        |ps AS (SELECT shard, round(sum(value), 4) AS shard_total
        |       FROM ev GROUP BY shard)
        |SELECT pu.shard, pu.user_id, pu.user_spend, ps.shard_total,
        |  round(pu.user_spend / ps.shard_total, 6) AS share
        |FROM pu JOIN ps ON pu.shard = ps.shard
        |ORDER BY pu.shard, pu.user_id""".stripMargin,
    // same layout-invariance: one side clustered, the other plain
    "q_join_spj_partial" ->
      """WITH ev AS (
        |  SELECT user_id, value, user_id % 8 AS shard FROM events),
        |pu AS (SELECT shard, user_id, round(sum(value), 4) AS user_spend
        |       FROM ev GROUP BY shard, user_id),
        |ps AS (SELECT shard, round(sum(value), 4) AS shard_total
        |       FROM ev GROUP BY shard)
        |SELECT pu.shard, pu.user_id, pu.user_spend, ps.shard_total,
        |  round(pu.user_spend / ps.shard_total, 6) AS share
        |FROM pu JOIN ps ON pu.shard = ps.shard
        |ORDER BY pu.shard, pu.user_id""".stripMargin,
    "q_join_interval" ->
      """SELECT s.event_id AS signup_id, count(*) AS n_follow,
        |  min(e.event_id) AS first_follow_id
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |JOIN events e
        |  ON e.user_id = s.user_id
        | AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
        |GROUP BY s.event_id
        |ORDER BY signup_id""".stripMargin
  )
}
