package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for the shapes that hurt at 100 TB: skewed equi-joins
  * and non-equi (range) joins.
  *
  * Spark's AQE skew-join handles sort-merge skew adaptively at runtime;
  * [[saltedEquiJoin]] is the explicit operator form for when the skew is
  * known ahead of time (a handful of mega-keys in a fact table) or when the
  * join is hash-based / statically planned. [[rangeJoin]] is the
  * broadcast-dimension interval join (bucket lookup tables, SCD ranges).
  */
object Joins {

  /** Skew-proof equi-join: deterministically salt the big (skewed) side
    * into `saltN` sub-keys, replicate the small side once per salt value,
    * join on (keys :+ salt). Produces EXACTLY the rows of
    * `big.join(small, keys)` — the salt only spreads each hot key's rows
    * across `saltN` reducers, so no single task sees a whole mega-key.
    *
    * Cost model: small side shuffles/broadcasts saltN x its size — cheap
    * when |small| is dimension-sized; the big side gains nothing if its
    * keys are uniform (use a plain join then). The salt is
    * `pmod(monotonically_increasing_id(), saltN)`: it references NO data
    * column (hashing payload columns for the salt would drag every column
    * into the scan and defeat parquet column pruning), cycles through all
    * saltN buckets within each partition (perfectly uniform even for a
    * single mega-key of identical rows), and any salt assignment yields
    * the same join rows, so task-retry nondeterminism is harmless. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                     saltN: Int): DataFrame = {
    require(saltN > 0, "saltN must be positive")
    val salted = big.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltN.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(array((0 until saltN).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Interval join of a fact `value` against a broadcast dimension of
    * `[lo, hi)` ranges. Plans as BroadcastNestedLoopJoin — correct for
    * dimension-sized range tables (the 100 TB fact side streams through
    * once, never shuffles). For fact-fact range joins, pre-bucket both
    * sides on `floor(value / bucketWidth)` and equi-join the bucket id
    * first. */
  def rangeJoin(facts: DataFrame, ranges: DataFrame, value: Column,
                lo: Column, hi: Column): DataFrame =
    facts.join(broadcast(ranges), value >= lo && value < hi)
}
