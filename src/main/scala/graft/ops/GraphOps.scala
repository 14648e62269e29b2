package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._
import graft.util.Determinism._

/** Graph operators (SURVEY.md §2.J extension — link-graph analytics a
  * training-data pipeline runs over citation/hyperlink structure:
  * importance scoring for corpus weighting, triangle/clustering stats
  * for spam-farm detection).
  *
  * The fixture ships no edge table, so both queries derive a
  * deterministic citation graph from `documents` in closed form — doc
  * `d` always cites `(7d+1) mod N`, even docs also cite `(13d+3) mod
  * N`, and multiples of 3 also cite `(29d+5) mod N` (doc_ids are
  * verified 0..N-1 contiguous; N comes from a broadcast one-row count
  * aggregate, so no scale factor is hard-coded and plan construction
  * launches zero jobs). Out-degree therefore varies 1..3 and in-degree
  * follows three overlaid bijections restricted to residue classes —
  * an IRREGULAR graph, so PageRank has a non-uniform fixed point (the
  * all-cite-3 variant is in-regular: every map is a bijection mod N,
  * which pins rank at exactly 1/N and tests nothing). The DuckDB
  * oracle mirrors the same arithmetic, making both computations fully
  * hash-checkable.
  *
  * Scale: these are JOIN-shaped graph algorithms, not Pregel — each
  * PageRank iteration is one shuffle (the contribution aggregation on
  * `dst`) plus one join back to the node list, exactly the GraphX/
  * Giraph dataflow lowered to Catalyst. Triangle counting uses the
  * oriented (a<b<c) edge representation so every wedge is generated
  * once.
  */
object GraphOps {

  /** Node list + broadcast one-row count. The cross join is a broadcast
    * nest of a single row — free at any scale. */
  private def nodesWithN(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = documents(s, dir).select($"doc_id")
    docs.crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
  }

  /** Directed edge list (src, dst, odeg, w): odeg is the closed-form
    * out-degree 1 + [d≡0 (2)] + [d≡0 (3)]; `w = 102/odeg` ∈
    * {102, 51, 34} is the EXACT integer per-edge PageRank weight (see
    * `qGraphPagerank` — 102 = 0.85·120 with 120 the lcm that clears
    * every denominator), carried on the edge so the iteration never
    * divides. */
  private[graft] def edges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emptyL = array().cast("array<bigint>")
    val odeg = (lit(1) +
      when(pmod($"doc_id", lit(2)) === 0, 1).otherwise(0) +
      when(pmod($"doc_id", lit(3)) === 0, 1).otherwise(0)).cast("long")
    nodesWithN(s, dir)
      .select(
        $"doc_id".as("src"),
        odeg.as("odeg"),
        when(odeg === 1, 102L).when(odeg === 2, 51L).otherwise(34L).as("w"),
        explode(concat(
          array(pmod($"doc_id" * 7 + 1, $"n")),
          when(pmod($"doc_id", lit(2)) === 0,
            array(pmod($"doc_id" * 13 + 3, $"n"))).otherwise(emptyL),
          when(pmod($"doc_id", lit(3)) === 0,
            array(pmod($"doc_id" * 29 + 5, $"n"))).otherwise(emptyL)))
          .as("dst"))
  }

  /** §2.J PageRank, 3 iterations, damping 0.85, in EXACT INTEGER
    * arithmetic. Floating PageRank is hash-hazardous across engines: a
    * rank landing within half an ulp of the r6 rounding boundary flips
    * the last digit (observed: 1 row in 500). Instead the iteration is
    * rescaled so every quantity is a BIGINT — with damping 17/20 and
    * out-degrees in {1,2,3}, multiplying rank_k by N·120^k clears all
    * denominators:
    *   R₀ = 1,   R_{k+1}(v) = 18·120^k + Σ_{u→v} (102/odeg_u)·R_k(u)
    * (102/odeg ∈ {102, 51, 34} exactly — the `w` edge column). Integer
    * sums are order-independent, so the result is bit-identical in any
    * engine at any parallelism: rank_scaled = R₃ = rank·N·120³ is
    * hash-gated with no rounding discipline at all, and the readable
    * `rank_n = R₃/120³` double is safe because both engines divide the
    * SAME integers (one IEEE op, no accumulated drift). Every node has
    * ≥1 out-edge, so no dangling-mass term.
    *
    * Scale: the loop composes a declarative plan — no driver-side
    * `collect`, no RDD; per iteration one hash shuffle on `dst` (with
    * map-side partial sums — longs, so partials stay exact) and one
    * left join back to the node list. Lineage grows linearly with
    * iterations; a production run with tens of iterations would
    * `localCheckpoint` every ~5 to keep the plan bounded — at 3
    * iterations the composed plan is the faster shape (no
    * materialization barrier). 64-bit headroom: R_k ≤ 3·120^k·N-ish;
    * tens of iterations would renormalize periodically or move the
    * readable division inward — the fixture's 3 stay far below 2⁶³. */
  def qGraphPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = edges(s, dir)
    // ranks carries (doc_id, rank_i); names stay disjoint from the
    // edge list's (src, dst, odeg, w) so the iterated joins resolve by
    // bare name with no self-join ambiguity.
    var ranks = nodesWithN(s, dir).select($"doc_id", lit(1L).as("rank_i"))
    var scaleK = 1L // 120^k
    for (_ <- 1 to 3) {
      val contribs = e.join(ranks, $"src" === $"doc_id")
        .groupBy($"dst").agg(sum($"w" * $"rank_i").as("contrib"))
      ranks = ranks.select($"doc_id")
        .join(contribs, $"doc_id" === $"dst", "left")
        .select($"doc_id",
          (lit(18L * scaleK) + coalesce($"contrib", lit(0L))).as("rank_i"))
      scaleK *= 120L
    }
    ranks.select($"doc_id", $"rank_i".as("rank_scaled"),
        ($"rank_i" / lit(1728000.0)).as("rank_n"))
      .orderBy($"doc_id")
  }

  /** Deep-iteration PageRank — the production variant of
    * [[qGraphPagerank]] for iteration counts where (a) the composed
    * lineage would grow unbounded and (b) the integer rescaling
    * overflows 64 bits (3·120^k clears 2⁶³ at k ≥ 9). Same exact
    * arithmetic, two changes:
    *  - ranks are DECIMAL(38,0): Spark decimal sums are exact and
    *    order-independent like longs, and 38 digits carry ~19
    *    iterations of 120^k growth (the next rung is periodic
    *    renormalization, documented, not needed at these depths);
    *  - every `checkpointEvery` rounds the rank table is EAGERLY
    *    `localCheckpoint`ed, truncating lineage so round k+1 plans
    *    against a materialized table instead of a k-deep join tree —
    *    bounded planning time and a bounded DAG at any depth. The
    *    3-iteration registry query keeps the no-barrier composed plan
    *    (faster at that depth); this is the shape a 50-iteration run
    *    uses.
    * GraphIncrementalSpec pins 10 iterations label-exact against a
    * driver-side BigInt replay of the same recurrence. */
  private[graft] def pagerankExact(s: SparkSession, dir: String,
      iterations: Int, checkpointEvery: Int = 5): DataFrame = {
    import s.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val e = edges(s, dir)
    var ranks = nodesWithN(s, dir)
      .select($"doc_id", lit(1L).cast(dec).as("rank_i"))
    var scale = java.math.BigDecimal.ONE // 120^k
    for (k <- 1 to iterations) {
      val contribs = e.join(ranks, $"src" === $"doc_id")
        .groupBy($"dst")
        .agg(sum($"w".cast(dec) * $"rank_i").cast(dec).as("contrib"))
      val base = new java.math.BigDecimal(18).multiply(scale)
      ranks = ranks.select($"doc_id")
        .join(contribs, $"doc_id" === $"dst", "left")
        .select($"doc_id",
          (lit(base).cast(dec) +
            coalesce($"contrib", lit(0).cast(dec))).cast(dec).as("rank_i"))
      if (k % checkpointEvery == 0 && k < iterations)
        ranks = ranks.localCheckpoint(true)
      scale = scale.multiply(new java.math.BigDecimal(120))
    }
    ranks
  }

  /** §2.J triangle census: undirected-distinct edge count, wedge count,
    * triangle count, global clustering coefficient — one summary row of
    * exact integers (+ one r6 ratio). `n_wedges` is the FULL wedge
    * count Σ_v C(deg(v), 2) — every unordered neighbor pair at every
    * center — so `clustering = 3·n_triangles / n_wedges` is the
    * standard global (transitivity) coefficient, bounded in [0, 1].
    * Triangle ENUMERATION still runs on the oriented (a<b<c)
    * representation, which generates each triangle exactly once; the
    * oriented wedge stream is an internal candidate set, not the
    * reported denominator.
    *
    * Scale: edges are canonically ORIENTED (a < b) before joining, so
    * each triangle is enumerated once and the closing-edge probe is an
    * equi-join on both endpoints — never an all-pairs product; the
    * degree aggregation is one shuffle on vertex id. At 100 TB the
    * standard refinement is degree-based orientation (point each edge
    * at the higher-degree endpoint) which bounds per-key fan-out by
    * sqrt(m); the join shape is unchanged. */
  def qGraphTriangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val und = edges(s, dir)
      .filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .distinct()
    val wedges = und.as("e1").join(und.as("e2"), col("e1.b") === col("e2.a"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    val closing = und.select(col("a").as("ca"), col("b").as("cb"))
    val tri = wedges.join(closing,
      col("a") === col("ca") && col("c") === col("cb"))
    // full wedge count: deg(v) over BOTH endpoints, then Σ C(deg, 2)
    // (deg·(deg−1) is even, so DIV 2 is exact)
    val allWedges = und.select($"a".as("v")).unionAll(und.select($"b".as("v")))
      .groupBy($"v").agg(count(lit(1)).as("deg"))
      .agg(sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    // Summary row assembled IN-PLAN: each count is a one-row aggregate
    // cross-joined (broadcast of a single row) — no plan-build jobs.
    documents(s, dir).agg(count(lit(1)).as("n_nodes"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
      .crossJoin(allWedges)
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        r6(when($"n_wedges" === 0, lit(0.0))
          .otherwise(lit(3.0) * $"n_triangles" / $"n_wedges"))
          .as("clustering"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> qGraphPagerank _,
    "q_graph_triangles" -> qGraphTriangles _
  )

  // the shared edge CTE (odeg = closed-form out-degree on every edge)
  private val edgesCte =
    """nn AS (SELECT count(*) AS n FROM documents),
      |e AS (
      |  SELECT doc_id AS src, (doc_id*7+1) % n AS dst,
      |    1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
      |      + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS odeg
      |  FROM documents, nn
      |  UNION ALL
      |  SELECT doc_id, (doc_id*13+3) % n,
      |    1 + 1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
      |  FROM documents, nn WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, (doc_id*29+5) % n,
      |    1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END + 1
      |  FROM documents, nn WHERE doc_id % 3 = 0)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // exact-integer mirror: R0=1; R_{k+1} = 18·120^k + Σ w·R_k with
    // w = 102/odeg (integer). CASTs pin DuckDB's HUGEINT sums back to
    // BIGINT so the arrow types match Spark's longs.
    "q_graph_pagerank" ->
      (s"""WITH $edgesCte,
        |r0 AS (SELECT doc_id, CAST(1 AS BIGINT) AS rank_i FROM documents),
        |r1 AS (SELECT d.doc_id,
        |         CAST(18 + coalesce(c.s, 0) AS BIGINT) AS rank_i
        |       FROM documents d
        |       LEFT JOIN (SELECT e.dst, sum((102 // e.odeg) * r.rank_i) AS s
        |                  FROM e JOIN r0 r ON r.doc_id = e.src GROUP BY e.dst) c
        |         ON c.dst = d.doc_id),
        |r2 AS (SELECT d.doc_id,
        |         CAST(18*120 + coalesce(c.s, 0) AS BIGINT) AS rank_i
        |       FROM documents d
        |       LEFT JOIN (SELECT e.dst, sum((102 // e.odeg) * r.rank_i) AS s
        |                  FROM e JOIN r1 r ON r.doc_id = e.src GROUP BY e.dst) c
        |         ON c.dst = d.doc_id),
        |r3 AS (SELECT d.doc_id,
        |         CAST(18*14400 + coalesce(c.s, 0) AS BIGINT) AS rank_i
        |       FROM documents d
        |       LEFT JOIN (SELECT e.dst, sum((102 // e.odeg) * r.rank_i) AS s
        |                  FROM e JOIN r2 r ON r.doc_id = e.src GROUP BY e.dst) c
        |         ON c.dst = d.doc_id)
        |SELECT doc_id, rank_i AS rank_scaled,
        |  rank_i / CAST(1728000 AS DOUBLE) AS rank_n
        |FROM r3 ORDER BY doc_id""").stripMargin,
    "q_graph_triangles" ->
      (s"""WITH $edgesCte,
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |w AS (SELECT e1.a, e1.b, e2.b AS c
        |      FROM und e1 JOIN und e2 ON e1.b = e2.a),
        |t AS (SELECT w.a FROM w JOIN und e3 ON w.a = e3.a AND w.c = e3.b),
        |wa AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
        |       FROM (SELECT v, count(*) AS deg
        |             FROM (SELECT a AS v FROM und
        |                   UNION ALL SELECT b FROM und) GROUP BY v))
        |SELECT (SELECT count(*) FROM documents) AS n_nodes,
        |  (SELECT count(*) FROM und) AS n_edges,
        |  (SELECT n_wedges FROM wa) AS n_wedges,
        |  (SELECT count(*) FROM t) AS n_triangles,
        |  round(CASE WHEN (SELECT n_wedges FROM wa) = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE CAST(3.0 AS DOUBLE) * (SELECT count(*) FROM t)
        |         / (SELECT n_wedges FROM wa)
        |  END, 6) AS clustering""").stripMargin
  )
}
