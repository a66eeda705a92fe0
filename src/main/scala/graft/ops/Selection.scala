package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT order-statistic selection.
  *
  * Spark's built-in exact `percentile()` is a `TypedImperativeAggregate`
  * that buffers every distinct value of the group in one task's memory
  * (an OpenHashMap of value -> count). For a 100 TB fact column with
  * high-cardinality doubles that buffer IS the dataset — the aggregate
  * works at test scale and OOMs at cluster scale. `percentile_approx`
  * bounds memory but surrenders exactness.
  *
  * This operator computes exact quantiles with bounded memory everywhere
  * via iterative range narrowing (distributed k-selection). Each round is
  * ONE whole-table aggregation that, per open selection problem,
  * histograms the group's values against the problem's current [lo, hi]
  * range (plus below/above overflow buckets). The driver picks the bucket
  * region covering the target rank and repeats with the shrunk range; a
  * problem whose in-range count fits `collectThreshold` (a constant) is
  * resolved by one bounded gather pass.
  *
  * Floating-point discipline — why this is exact, not approximately so:
  * the histogram is only a NARROWING HEURISTIC. Rank accounting never
  * crosses rounds through bucket arithmetic: every round recomputes the
  * rows below `lo` with a direct comparison (`v < lo` — exact for any
  * doubles), so the target's absolute rank is re-anchored from scratch
  * each round. The chosen bucket region is widened by one bucket on each
  * side, so 1-ulp disagreement between `floor((v-lo)/w)` and the
  * recomputed region edges can never push the target value outside the
  * next range — and if an adversarial distribution ever did, the rank
  * re-anchoring detects it and the operator throws rather than returning
  * a silently wrong quantile.
  *
  * Cost: ~log_{buckets/3}(n / collectThreshold) rounds (3 rounds for
  * n = 1e12 at the defaults buckets = 512 / collectThreshold = 65536 —
  * raised from 128/8192 after the 10x ladder showed the per-round
  * whole-table pass, not the shuffle, dominates: wider histograms and an
  * earlier gather cut a full round off the common shapes for a shuffle
  * of still only O(partitions x problems x buckets) fixed-size rows and
  * a <=64k-distinct-value driver gather per problem). Driver state is
  * O(groups x quantiles x buckets) longs — model-sized, like the IVF
  * centroid table, NOT data-sized. Intended for dashboard-shaped group
  * cardinalities (the regime where anyone reads per-group quantiles);
  * for millions of groups use `percentile_approx` / t-digest instead.
  *
  * Reference analogue: none (the reference has no quantiles); engine
  * extension in the GlobalScan/GlobalRank family — the "one task holds
  * everything" shape replaced by passes + bounded partials.
  */
object Selection {

  private val B_BELOW = -1 // bucket id for v < lo
  // bucket id `buckets` is v > hi

  /** Relative SD for every ride-along HLL distinct estimate. The
    * estimates only STEER (gather-vs-narrow decisions); exactness comes
    * from the gathers' loud require bounds. At the default 0.05 each
    * per-(problem, bucket) partial carries a 512-register sketch —
    * hundreds of bytes × problems × buckets × partitions of pure
    * steering overhead per histogram pass; 0.2 shrinks the sketch 16x.
    * Decision safety: every gather trigger compares the estimate
    * against HALF the gather's require bound, so the sketch would have
    * to under-read by 2x (10 standard errors at rsd 0.2) before a
    * too-big gather is even attempted — and the require still catches
    * that case loudly before results could be affected. */
  private val DistinctRsd = 0.2

  /** One open problem: the group's order statistic `k` (0-indexed,
    * absolute within the group) is known to lie in [lo, hi]. */
  private final case class Problem(pid: Int, gkey: String, k: Long,
                                   lo: Double, hi: Double)

  /** Exact `quantile_cont` per group, scale-out shape.
    *
    * One row per group: groupCols ++ one double column per quantile
    * (named by `qNames`, default q_0, q_1, ...) ++ `cnt`. Linear
    * interpolation between adjacent order statistics — the same contract
    * as Spark's `percentile(col, q)` and DuckDB's `quantile_cont(col, q)`
    * (result = lower + (higher - lower) * frac at position q * (n - 1);
    * nulls excluded). NaN values are EXCLUDED alongside nulls (documented
    * deviation: Spark's sort ranks NaN greatest, but a NaN range endpoint
    * makes every bucket comparison false and the narrowing cannot make
    * progress — a quantile clean of NaN is also the answer callers
    * want from a metrics column). Values are compared in double
    * precision: exact for double/float columns and for integral columns
    * within 2^53. */
  def quantileCont(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   qs: Seq[Double], qNames: Seq[String] = Nil,
                   buckets: Int = 512, collectThreshold: Int = 65536,
                   maxRounds: Int = 64): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be within [0, 1]")
    require(buckets >= 8 && collectThreshold >= 1)
    val spark = df.sparkSession
    val names = if (qNames.nonEmpty) qNames else qs.indices.map(i => s"q_$i")
    require(names.length == qs.length, "qNames must match qs")

    // One comparable string key per group, computed ONCE in Spark and
    // shared verbatim by the seed, histogram and gather passes — the
    // driver never re-derives it, so executor-vs-driver formatting
    // (java.sql.Timestamp's ".0" suffix vs Spark's cast, "null" vs
    // dropped null) can never make the keys disagree. Encoding: null ->
    // "u0000", value -> "u0001" ++ cast(string), plain concat —
    // concat_ws silently DROPS nulls, which would collide ("a", null)
    // with (null, "a"). A group value containing the marker characters
    // could still forge a boundary — the same documented contract as the
    // exact-dedup key idiom.
    val keyCol: Column =
      if (groupCols.isEmpty) lit("")
      else concat(groupCols.map(c => when(col(c).isNull, lit("\u0000"))
        .otherwise(concat(lit("\u0001"), col(c).cast("string")))): _*)
    // NaN excluded alongside nulls (see scaladoc): a NaN min/max endpoint
    // poisons the bucket arithmetic (every comparison false), spinning
    // the narrowing to maxRounds. Non-floating inputs never cast to NaN.
    val clean = df.where(col(valueCol).isNotNull &&
      !isnan(col(valueCol).cast("double")))
    // lazily checkpointed: every pass (seed + each narrowing round's
    // histogram/gather) re-reads this slim frame — materializing the
    // (key, double, group tuple) projection once beats re-running the
    // source scan + filter + cast per pass (~log rounds of them). The
    // typed group columns ride IN the checkpoint (they are the model-
    // cardinality group tuple, one small value per row) so the seed pass
    // below also runs off the checkpoint instead of a second source scan.
    val rows = clean
      .select(keyCol.as("_gkey") +:
        col(valueCol).cast("double").as("_v") +:
        groupCols.map(c => col(c).as(s"_g_$c")): _*)
      .localCheckpoint(false)

    // Pass 0: per-group count/min/max seeds every problem's range, keyed
    // by the SAME _gkey the later passes join on (it is a materialized
    // column of the checkpoint — driver and executors can never disagree
    // on it). Within one key every row carries the identical group
    // tuple, so first() is deterministic. This is also the action that
    // materializes the checkpoint. The approx distinct count rides
    // along so a LOW-CARDINALITY group (an integral or enum-like metric
    // column) resolves by ONE bounded gather with no histogram round at
    // all — the same duplicate-plateau escape the in-loop path has,
    // decided a full pass earlier; the gather's loud `require` bound
    // still backstops the sketch.
    val gatherDistinctBound = math.max(collectThreshold, 4 * buckets)
    val seed = rows
      .groupBy(col("_gkey"))
      .agg(count(lit(1)).as("_n"),
        (Seq(min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
          approx_count_distinct(col("_v"), DistinctRsd).as("_d")) ++
          groupCols.map(c => first(col(s"_g_$c")).as(s"_g_$c"))): _*)
      .collect()

    var nextPid = 0
    var open = List.empty[Problem]
    var gatherNow = List.empty[Problem]
    val resolved = collection.mutable.Map.empty[(String, Long), Double]
    val meta = seed.map { r =>
      val gkey = r.getString(0)
      val n = r.getLong(1)
      val lo = r.getDouble(2)
      val hi = r.getDouble(3)
      val d = r.getLong(4)
      val gvals = groupCols.indices.map(i => r.get(5 + i))
      val positions = qs.map(q => q * (n - 1).toDouble)
      val ranks = positions.flatMap(p =>
        Seq(math.floor(p).toLong, math.ceil(p).toLong)).distinct
      ranks.foreach { k =>
        if (lo == hi) resolved((gkey, k)) = lo
        else {
          val p = Problem(nextPid, gkey, k, lo, hi); nextPid += 1
          if (n <= collectThreshold || d <= gatherDistinctBound / 2)
            gatherNow ::= p
          else open ::= p
        }
      }
      (gvals, gkey, n, positions)
    }
    if (gatherNow.nonEmpty) {
      val got = gatherDeduped(spark, rows, gatherNow, buckets,
        collectThreshold)
      gatherNow.foreach { p =>
        val vcs = got(p)
        var cum = 0L; var i = 0
        while (i < vcs.length && cum + vcs(i)._2 <= p.k) {
          cum += vcs(i)._2; i += 1
        }
        require(i < vcs.length,
          s"selection gather underflow (group=${p.gkey})")
        resolved((p.gkey, p.k)) = vcs(i)._1
      }
    }

    var round = 0
    while (open.nonEmpty && round < maxRounds) {
      round += 1
      // ONE histogram pass serves every open problem: per (pid, bucket)
      // counts with exact below/above overflow buckets re-anchoring the
      // absolute rank (see scaladoc)
      val hist = histogramPass(spark, rows, open, buckets)
      val (toGather, stillOpen) = open.map { p =>
        val h = hist.getOrElse(p.pid, Map.empty[Int, (Long, Long)])
        val nBelow = h.getOrElse(B_BELOW, (0L, 0L))._1
        val nIn = (0 until buckets).map(j => h.getOrElse(j, (0L, 0L))._1).sum
        val dIn = (0 until buckets).map(j => h.getOrElse(j, (0L, 0L))._2).sum
        val kIn = p.k - nBelow
        if (kIn < 0 || kIn >= nIn)
          throw new IllegalStateException(
            s"selection invariant violated: rank ${p.k} re-anchored to " +
              s"$kIn of $nIn in-range rows (group=${p.gkey}, " +
              s"range=[${p.lo}, ${p.hi}]) — widened narrowing should " +
              "make this unreachable")
        // Gather when the in-range ROW count fits, or when the in-range
        // DISTINCT count does: a duplicate plateau (many rows, one value)
        // otherwise narrows forever without ever fitting the row
        // threshold. The distinct estimate is an HLL sketch (fixed-size
        // partials — the shuffle stays bounded); the /2 safety factor
        // dwarfs its 5% rsd, and the gather's own `require` backstops
        // exactness if the sketch ever lied badly.
        if (nIn <= collectThreshold || dIn <= gatherDistinctBound / 2)
          Left((p, kIn))
        else {
          val w = (p.hi - p.lo) / buckets
          var cum = 0L; var j = 0
          while (cum + h.getOrElse(j, (0L, 0L))._1 <= kIn) {
            cum += h.getOrElse(j, (0L, 0L))._1; j += 1
          }
          // widen one bucket each side: boundary fuzz can never evict
          // the target; clamp and keep global endpoints exact
          val nlo = if (j <= 1) p.lo else p.lo + (j - 1) * w
          val nhi = if (j >= buckets - 2) p.hi else p.lo + (j + 2) * w
          if (nlo >= nhi || (nlo == p.lo && nhi == p.hi)) {
            // range can no longer shrink (ulp-scale span): resolve by
            // bounded distinct-gather — a span of adjacent doubles holds
            // few distinct values however many duplicate rows it has
            Left((p, kIn))
          } else Right(Problem(p.pid, p.gkey, p.k, nlo, nhi))
        }
      }.partitionMap(identity)
      if (toGather.nonEmpty) {
        val got = gatherDeduped(spark, rows, toGather.map(_._1), buckets,
          collectThreshold)
        toGather.foreach { case (p, kIn) =>
          val vcs = got(p)
          var cum = 0L; var i = 0
          while (i < vcs.length && cum + vcs(i)._2 <= kIn) {
            cum += vcs(i)._2; i += 1
          }
          require(i < vcs.length,
            s"selection gather underflow (group=${p.gkey})")
          resolved((p.gkey, p.k)) = vcs(i)._1
        }
      }
      open = stillOpen
    }
    if (open.nonEmpty)
      throw new IllegalStateException(
        s"quantile selection did not converge within $maxRounds rounds " +
          s"(${open.length} problems open) — raise maxRounds")

    val outRows = meta.map { case (gvals, gkey, n, positions) =>
      val qVals = positions.map { p =>
        val i0 = math.floor(p).toLong; val i1 = math.ceil(p).toLong
        val lo = resolved((gkey, i0))
        if (i1 == i0) lo
        else lo + (resolved((gkey, i1)) - lo) * (p - i0.toDouble)
      }
      Row.fromSeq(gvals ++ qVals :+ n)
    }
    val groupSchema = df.select(groupCols.map(col): _*).schema
    val outSchema = StructType(groupSchema.fields ++
      names.map(StructField(_, DoubleType, nullable = false)) :+
      StructField("cnt", LongType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1), outSchema)
  }

  /** Exact WEIGHTED lower quantile per group, scale-out shape — the
    * importance-weighted twin of [[quantileCont]] (corpus statistics
    * where each row carries a repeat/importance count: token-weighted
    * median document length, quantity-weighted price percentiles).
    *
    * Semantics: for each quantile q, the smallest value v whose
    * cumulative weight (in ascending value order) reaches
    * k = max(1, ceil(q · W)), W = Σ weights — the "weighted lower
    * quantile" (no interpolation: the answer is an actual data value,
    * so cross-engine equality is EXACT, no rounding discipline needed).
    * Weights must be non-negative integers (cast to long): every rank
    * accounting quantity is then an exact long, immune to
    * float-accumulation order, and k itself is computed from one
    * correctly-rounded double product ceil(q · W) — bit-identical on
    * any IEEE engine. Zero-weight rows cannot be selected; a group with
    * W = 0 throws.
    *
    * Same bounded-memory narrowing as [[quantileCont]] — each round is
    * ONE whole-table aggregation histogramming per-bucket WEIGHT sums
    * (with exact below-range re-anchoring), the same duplicate-plateau
    * distinct-gather escape, the same loud invariant checks. Driver
    * state stays O(groups × quantiles × buckets).
    */
  def weightedQuantile(df: DataFrame, valueCol: String, weightCol: String,
                       groupCols: Seq[String], qs: Seq[Double],
                       qNames: Seq[String] = Nil,
                       buckets: Int = 512, collectThreshold: Int = 65536,
                       maxRounds: Int = 64): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must be within [0, 1]")
    require(buckets >= 8 && collectThreshold >= 1)
    val spark = df.sparkSession
    val names = if (qNames.nonEmpty) qNames else qs.indices.map(i => s"q_$i")
    require(names.length == qs.length, "qNames must match qs")
    val keyCol: Column =
      if (groupCols.isEmpty) lit("")
      else concat(groupCols.map(c => when(col(c).isNull, lit("\u0000"))
        .otherwise(concat(lit("\u0001"), col(c).cast("string")))): _*)
    val clean = df.where(col(valueCol).isNotNull &&
      !isnan(col(valueCol).cast("double")) && col(weightCol).isNotNull)
    val rows = clean
      .select(keyCol.as("_gkey") +:
        col(valueCol).cast("double").as("_v") +:
        col(weightCol).cast("long").as("_w") +:
        groupCols.map(c => col(c).as(s"_g_$c")): _*)
      .localCheckpoint(false)

    val gatherDistinctBound = math.max(collectThreshold, 4 * buckets)
    val seed = rows
      .groupBy(col("_gkey"))
      .agg(sum(col("_w")).as("_tw"),
        (Seq(min(col("_w")).as("_wmin"),
          min(col("_v")).as("_lo"), max(col("_v")).as("_hi"),
          count(lit(1)).as("_n"),
          approx_count_distinct(col("_v"), DistinctRsd).as("_d")) ++
          groupCols.map(c => first(col(s"_g_$c")).as(s"_g_$c"))): _*)
      .collect()

    var nextPid = 0
    var open = List.empty[Problem]
    var gatherNow = List.empty[Problem]
    // here Problem.k is the 1-based target CUMULATIVE WEIGHT
    val resolved = collection.mutable.Map.empty[(String, Long), Double]
    val meta = seed.map { r =>
      val gkey = r.getString(0)
      val w = r.getLong(1)
      require(r.getLong(2) >= 0L,
        s"weightedQuantile: negative weight in group $gkey")
      require(w > 0L,
        s"weightedQuantile: group $gkey has zero total weight")
      val lo = r.getDouble(3)
      val hi = r.getDouble(4)
      val n = r.getLong(5)
      val d = r.getLong(6)
      val gvals = groupCols.indices.map(i => r.get(7 + i))
      // ceil(q * W): one correctly-rounded double product + ceil —
      // identical on every IEEE engine, exact for W < 2^52
      val ks = qs.map(q => math.max(1L, math.ceil(q * w.toDouble).toLong))
      ks.distinct.foreach { k =>
        if (lo == hi) resolved((gkey, k)) = lo
        else {
          val p = Problem(nextPid, gkey, k, lo, hi); nextPid += 1
          // same seed-time gather shortcut as quantileCont: a group
          // whose rows or distinct values already fit the gather bound
          // skips the histogram rounds entirely (loud require backstops)
          if (n <= collectThreshold || d <= gatherDistinctBound / 2)
            gatherNow ::= p
          else open ::= p
        }
      }
      (gvals, gkey, w, ks)
    }
    if (gatherNow.nonEmpty) {
      val got = wgatherDeduped(spark, rows, gatherNow, buckets,
        collectThreshold)
      gatherNow.foreach { p =>
        val vcs = got(p)
        var cum = 0L; var i = 0
        while (i < vcs.length && cum + vcs(i)._2 < p.k) {
          cum += vcs(i)._2; i += 1
        }
        require(i < vcs.length,
          s"weighted selection gather underflow (group=${p.gkey})")
        resolved((p.gkey, p.k)) = vcs(i)._1
      }
    }

    var round = 0
    while (open.nonEmpty && round < maxRounds) {
      round += 1
      val hist = whistogramPass(spark, rows, open, buckets)
      val (toGather, stillOpen) = open.map { p =>
        val h = hist.getOrElse(p.pid, Map.empty[Int, (Long, Long, Long)])
        val wBelow = h.getOrElse(B_BELOW, (0L, 0L, 0L))._1
        val wIn = (0 until buckets).map(j =>
          h.getOrElse(j, (0L, 0L, 0L))._1).sum
        val nIn = (0 until buckets).map(j =>
          h.getOrElse(j, (0L, 0L, 0L))._2).sum
        val dIn = (0 until buckets).map(j =>
          h.getOrElse(j, (0L, 0L, 0L))._3).sum
        val kIn = p.k - wBelow
        if (kIn < 1 || kIn > wIn)
          throw new IllegalStateException(
            s"weighted selection invariant violated: target weight " +
              s"${p.k} re-anchored to $kIn of $wIn in-range weight " +
              s"(group=${p.gkey}, range=[${p.lo}, ${p.hi}])")
        if (nIn <= collectThreshold || dIn <= gatherDistinctBound / 2)
          Left((p, kIn))
        else {
          val w = (p.hi - p.lo) / buckets
          var cum = 0L; var j = 0
          while (cum + h.getOrElse(j, (0L, 0L, 0L))._1 < kIn) {
            cum += h.getOrElse(j, (0L, 0L, 0L))._1; j += 1
          }
          val nlo = if (j <= 1) p.lo else p.lo + (j - 1) * w
          val nhi = if (j >= buckets - 2) p.hi else p.lo + (j + 2) * w
          if (nlo >= nhi || (nlo == p.lo && nhi == p.hi)) Left((p, kIn))
          else Right(Problem(p.pid, p.gkey, p.k, nlo, nhi))
        }
      }.partitionMap(identity)
      if (toGather.nonEmpty) {
        val got = wgatherDeduped(spark, rows, toGather.map(_._1), buckets,
          collectThreshold)
        toGather.foreach { case (p, kIn) =>
          val vcs = got(p)
          var cum = 0L; var i = 0
          while (i < vcs.length && cum + vcs(i)._2 < kIn) {
            cum += vcs(i)._2; i += 1
          }
          require(i < vcs.length,
            s"weighted selection gather underflow (group=${p.gkey})")
          resolved((p.gkey, p.k)) = vcs(i)._1
        }
      }
      open = stillOpen
    }
    if (open.nonEmpty)
      throw new IllegalStateException(
        s"weighted quantile selection did not converge within " +
          s"$maxRounds rounds (${open.length} problems open)")

    val outRows = meta.map { case (gvals, gkey, w, ks) =>
      Row.fromSeq(gvals ++ ks.map(k => resolved((gkey, k))) :+ w)
    }
    val groupSchema = df.select(groupCols.map(col): _*).schema
    val outSchema = StructType(groupSchema.fields ++
      names.map(StructField(_, DoubleType, nullable = false)) :+
      StructField("total_w", LongType, nullable = false))
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq, 1), outSchema)
  }

  /** Weighted histogram pass: pid -> (bucket -> (weight sum, row count,
    * approx distinct count)) — the weight sum re-anchors the target, the
    * row/distinct counts drive the same gather escape as the unweighted
    * operator. All sums are exact longs. */
  private def whistogramPass(spark: SparkSession, rows: DataFrame,
                             ps: List[Problem], buckets: Int)
      : Map[Int, Map[Int, (Long, Long, Long)]] = {
    val probsDf = spark.createDataFrame(
      ps.map(p => (p.pid, p.gkey, p.lo, p.hi)))
      .toDF("_pid", "_pgkey", "_plo", "_phi")
    val v = col("_v")
    val w = (col("_phi") - col("_plo")) / lit(buckets.toDouble)
    val inB = least(greatest(
      floor((v - col("_plo")) / w).cast("int"), lit(0)), lit(buckets - 1))
    val b = when(v < col("_plo"), lit(B_BELOW))
      .when(v > col("_phi"), lit(buckets)).otherwise(inB)
    rows.join(broadcast(probsDf), col("_gkey") === col("_pgkey"))
      .groupBy(col("_pid"), b.as("_b"))
      .agg(sum(col("_w")).as("_ws"), count(lit(1)).as("_c"),
        approx_count_distinct(v, DistinctRsd).as("_d"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (pid, rs) =>
        pid -> rs.map(r =>
          r.getInt(1) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      }
  }

  /** Weighted bounded gather: per problem, the distinct in-range values
    * with their WEIGHT sums, ascending. */
  private def wgatherPass(spark: SparkSession, rows: DataFrame,
                          ps: List[Problem], buckets: Int,
                          collectThreshold: Int)
      : Map[Int, Array[(Double, Long)]] = {
    val probsDf = spark.createDataFrame(
      ps.map(p => (p.pid, p.gkey, p.lo, p.hi)))
      .toDF("_pid", "_pgkey", "_plo", "_phi")
    val v = col("_v")
    // the global LIMIT bounds what can ever reach the driver (CollectLimit
    // pulls partitions incrementally), so a badly lying distinct sketch
    // fails the require below instead of surfacing as driver memory
    // pressure; under the bound the limit is a no-op
    val bound = ps.size * math.max(collectThreshold, 4 * buckets) + 1
    val out = rows.join(broadcast(probsDf), col("_gkey") === col("_pgkey"))
      .where(v >= col("_plo") && v <= col("_phi"))
      .groupBy(col("_pid"), v.as("_val")).agg(sum(col("_w")).as("_ws"))
      .limit(bound)
      .collect()
    require(out.length < bound,
      s"weighted selection gather exceeded its global bound ($bound rows " +
        s"for ${ps.size} problems)")
    out.groupBy(_.getInt(0)).map { case (pid, rs) =>
      require(rs.length <= math.max(collectThreshold, 4 * buckets),
        s"weighted selection gather exceeded its bound: ${rs.length} " +
          s"distinct values for problem $pid")
      pid -> rs.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
    }
  }

  /** Weighted twin of [[gatherDeduped]]: one gather per distinct
    * (gkey, lo, hi), served to every problem of that group/range. */
  private def wgatherDeduped(spark: SparkSession, rows: DataFrame,
                             ps: List[Problem], buckets: Int,
                             collectThreshold: Int)
      : Map[Problem, Array[(Double, Long)]] = {
    val reps = ps.groupBy(p => (p.gkey, p.lo, p.hi)).values
      .map(_.head).toList
    val got = wgatherPass(spark, rows, reps, buckets, collectThreshold)
    val byRange = reps
      .map(r => (r.gkey, r.lo, r.hi) ->
        got.getOrElse(r.pid, Array.empty[(Double, Long)]))
      .toMap
    ps.map(p => p -> byRange((p.gkey, p.lo, p.hi))).toMap
  }

  /** One aggregation serving every open problem: returns
    * pid -> (bucket -> (count, approx distinct count)), bucket in {-1} ++
    * [0, buckets] where -1 is v < lo and `buckets` is v > hi (both by
    * direct comparison — the exact re-anchoring buckets). The distinct
    * estimate rides along as an HLL sketch aggregate (equal values land
    * in equal buckets, so per-bucket sketches sum to the in-range
    * distinct count) — it is what lets the driver detect duplicate
    * plateaus and resolve them by gather instead of narrowing forever.
    * Problems are broadcast (model-sized); a row joins only the problems
    * of its own group, so the blow-up per row is the group's
    * open-problem count (<= 2 x quantiles). Partial aggregation bounds
    * the shuffle at O(partitions x problems x buckets) fixed-size rows
    * (HLL partials are fixed-size sketches, NOT value sets). */
  private def histogramPass(spark: SparkSession, rows: DataFrame,
                            ps: List[Problem], buckets: Int)
      : Map[Int, Map[Int, (Long, Long)]] = {
    val probsDf = spark.createDataFrame(
      ps.map(p => (p.pid, p.gkey, p.lo, p.hi)))
      .toDF("_pid", "_pgkey", "_plo", "_phi")
    val v = col("_v")
    val w = (col("_phi") - col("_plo")) / lit(buckets.toDouble)
    val inB = least(greatest(
      floor((v - col("_plo")) / w).cast("int"), lit(0)), lit(buckets - 1))
    val b = when(v < col("_plo"), lit(B_BELOW))
      .when(v > col("_phi"), lit(buckets)).otherwise(inB)
    rows.join(broadcast(probsDf), col("_gkey") === col("_pgkey"))
      .groupBy(col("_pid"), b.as("_b"))
      .agg(count(lit(1)).as("_c"), approx_count_distinct(v, DistinctRsd).as("_d"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (pid, rs) =>
        pid -> rs.map(r =>
          r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
      }
  }

  /** Gather once per DISTINCT (gkey, lo, hi) and serve every problem of
    * that group/range from the same value list — a group carrying
    * several open ranks (multi-quantile queries) otherwise joins and
    * collects its rows once per rank. Returns a per-PROBLEM lookup. */
  private def gatherDeduped(spark: SparkSession, rows: DataFrame,
                            ps: List[Problem], buckets: Int,
                            collectThreshold: Int)
      : Map[Problem, Array[(Double, Long)]] = {
    val reps = ps.groupBy(p => (p.gkey, p.lo, p.hi)).values
      .map(_.head).toList
    val got = gatherPass(spark, rows, reps, buckets, collectThreshold)
    val byRange = reps
      .map(r => (r.gkey, r.lo, r.hi) ->
        got.getOrElse(r.pid, Array.empty[(Double, Long)]))
      .toMap
    ps.map(p => p -> byRange((p.gkey, p.lo, p.hi))).toMap
  }

  /** Bounded exact gather: per problem, the distinct in-range values with
    * their duplicate counts, sorted ascending. Every problem handed here
    * has either <= collectThreshold in-range ROWS or an ulp-scale range
    * (few distinct values); the distinct-level collect is bounded either
    * way, and a loud require backstops the claim. */
  private def gatherPass(spark: SparkSession, rows: DataFrame,
                         ps: List[Problem], buckets: Int,
                         collectThreshold: Int)
      : Map[Int, Array[(Double, Long)]] = {
    val probsDf = spark.createDataFrame(
      ps.map(p => (p.pid, p.gkey, p.lo, p.hi)))
      .toDF("_pid", "_pgkey", "_plo", "_phi")
    val v = col("_v")
    // global LIMIT before the collect — see wgatherPass
    val bound = ps.size * math.max(collectThreshold, 4 * buckets) + 1
    val out = rows.join(broadcast(probsDf), col("_gkey") === col("_pgkey"))
      .where(v >= col("_plo") && v <= col("_phi"))
      .groupBy(col("_pid"), v.as("_val")).agg(count(lit(1)).as("_c"))
      .limit(bound)
      .collect()
    require(out.length < bound,
      s"selection gather exceeded its global bound ($bound rows for " +
        s"${ps.size} problems)")
    val grouped = out.groupBy(_.getInt(0)).map { case (pid, rs) =>
      require(rs.length <= math.max(collectThreshold, 4 * buckets),
        s"selection gather exceeded its bound: ${rs.length} distinct " +
          s"values for problem $pid")
      pid -> rs.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
    }
    grouped
  }
}
