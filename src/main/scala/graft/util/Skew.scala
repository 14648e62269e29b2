package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper (SURVEY.md §7.5 R7).
  *
  * AQE's skew-join split handles sort-merge joins at runtime, but a
  * hash-partitioned aggregation or join on a pathologically hot key
  * (one key ≫ everything else, e.g. a null-ish default or a viral
  * user_id at 100 TB) still lands on one task. Salting splits the hot
  * side's rows across `salts` sub-keys and replicates the small side to
  * every sub-key, restoring parallelism at the cost of a small-side
  * blow-up factor of `salts`.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * `big` gets a random-but-deterministic salt per row (hash of the
    * whole row, not rand() — keeps the result reproducible); `small` is
    * exploded to all salt values. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    // outer-preserving the SMALL side is unsound here: its rows are
    // replicated `salts` ways, so right/full outer would emit each
    // unmatched small row `salts` times
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "semi", "left_anti", "leftanti", "anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti join types, got $joinType")
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)),
        lit(salts.toLong)))
    val smallSalted = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    bigSalted.join(smallSalted,
      Seq(key, "__salt"), joinType).drop("__salt")
  }
}
