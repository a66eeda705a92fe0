package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-threshold and fuzzy-match primitives whose whole point is
  * avoiding the quadratic / full-cardinality plans a naive formulation
  * shuffles at 100 TB. Shared by the registry queries and their specs
  * (the specs run THESE functions on adversarial synthetic data — no
  * drift between what is tested and what ships). */
object FrequentItems {

  /** Two-pass EXACT heavy hitters: every key of `key` whose count
    * exceeds N/k, computed without shuffling the full key cardinality.
    *
    * Pass 1 — ONE global ObjectHashAggregate running the Misra-Gries
    * summary ([[graft.functions.MisraGriesAgg]], capacity `cap`) plus
    * the stream total N. The MG undercount bound (<= N/(cap+1)) makes
    * the surviving keys a SUPERSET of every key with count > N/k
    * whenever cap >= k-1 (enforced here). Driver state: <= cap entries.
    *
    * Pass 2 — exact counting restricted to the candidates: the IN-set
    * filter sits BELOW the exchange, so the only key-shuffle carries
    * rows of <= cap keys, then the exact `cnt * k > N` threshold.
    * Result == the naive groupBy/HAVING answer, bit for bit.
    *
    * Returns (key, cnt) with `cnt` the exact count. */
  def exactHeavyHitters(s: SparkSession, df: DataFrame, key: Column,
      k: Long, cap: Int): DataFrame = {
    require(cap >= k - 1,
      s"capacity $cap < k-1 = ${k - 1}: the Misra-Gries superset " +
        "guarantee (keys above N/(cap+1) survive) would not cover the " +
        "report threshold N/k")
    val toks = df.select(key.as("token"))
    val sk = toks.agg(
      graft.functions.GraftFunctions.misraGries(s, col("token"), cap)
        .as("mg"),
      count(lit(1)).as("n")).collect()(0)
    val candidates = sk.getMap[String, Long](0).keys.toSeq.sorted
    val n = sk.getLong(1)
    toks.where(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }

  /** Edit-distance-1 similarity self-join via deletion-neighborhood
    * blocking (the SymSpell/FastSS signature scheme): every string emits
    * itself plus each single-character deletion as signatures; two
    * strings within Levenshtein distance 1 ALWAYS share a signature
    * (substitution: delete the differing position from both;
    * insert/delete: the shorter IS a deletion of the longer), so an
    * EQUI-join on the signature finds every true pair, and the final
    * exact `levenshtein` discards collisions (two different deletions
    * can meet at distance 2, e.g. "abc"/"cab" at "ab").
    *
    * Input must be distinct non-null strings in column `name`. A
    * signature bucket only holds strings one insertion away from the
    * signature — bounded by alphabet x length, never corpus-sized — so
    * the join is linear-ish in rows where the exact formulation is
    * quadratic. Returns (name_a, name_b, dist) with name_a < name_b
    * and dist <= 1. */
  def editDistance1Pairs(names: DataFrame): DataFrame = {
    // lazy-checkpointed: the self-join would otherwise re-plan (and
    // re-execute) the per-name deletion-neighborhood explode on BOTH
    // sides — the string-transform scan is the expensive half of the
    // query, and at any scale you materialize the signature table once
    val sigs = names.select(col("name"), explode(array_distinct(concat(
      array(col("name")),
      transform(sequence(lit(1), length(col("name"))), i =>
        concat(col("name").substr(lit(1), i - lit(1)),
          col("name").substr(i + lit(1), length(col("name")))))))).as("sig"))
      .localCheckpoint(false)
    // verify BEFORE dedup: a pair reached via several signatures computes
    // the (cheap, thresholded) distance per occurrence, but the distinct
    // then shuffles only the surviving pairs — the smaller set by far
    sigs.as("a")
      .join(sigs.as("b"),
        col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
      .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
        // thresholded levenshtein: banded O(threshold·n) with early exit
        // instead of the full O(n²) DP per pair — the verify is the hot
        // phase (every candidate pair pays it), and for dist <= t the
        // returned value equals the unthresholded distance (> t returns
        // -1), so results are unchanged
        levenshtein(col("a.name"), col("b.name"), 1).cast("long")
          .as("dist"))
      .where(col("dist") >= 0)
      .distinct()
  }
}
