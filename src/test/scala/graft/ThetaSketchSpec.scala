package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the Theta/KMV sketch set-operation family:
  * the native KmvSketchAgg retention contract (exactly the k smallest
  * distinct hashes, any partitioning), lossless union merge, and the
  * estimator identities the registry queries rely on — beyond the
  * DuckDB hash compare, which pins values but not the reasons they
  * are right. */
class ThetaSketchSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private val P60 = 1152921504606846976L // 2^60

  test("KmvSketchAgg retains exactly the k smallest distinct values " +
    "under any partitioning") {
    import spark.implicits._
    // adversarial input: duplicates, unsorted, several partitions
    val vals = (1L to 500L).flatMap(v => Seq(v * 7919L % 100003L,
      v * 7919L % 100003L)) // every value twice
    val expected = vals.distinct.sorted.take(32)
    for (parts <- Seq(1, 3, 8)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(graft.functions.GraftFunctions
          .kmvSketch(spark, col("h"), 32).as("ks"))
        .head().getAs[scala.collection.Seq[Long]]("ks")
      assert(got.toSeq == expected,
        s"parts=$parts: ${got.take(5)}... != ${expected.take(5)}...")
    }
  }

  test("KMV union merge is lossless: merged per-day partials equal the " +
    "sketch of the concatenated data") {
    // rel_theta_union_merge's oracle is the DIRECT k-smallest of the
    // union — so its very correctness pass proves this; here the claim
    // is pinned at the sketch-content level for a different k to rule
    // out coincidence
    import spark.implicits._
    val base = SparkEntry.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .select(to_date(col("ts")).as("day"),
        (col("user_id") * 100000L + unix_date(to_date(col("ts"))))
          .cast("long").as("key"))
    val h = conv(substring(md5(col("key").cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    val k = 48
    val direct = base.select(h.as("h"))
      .agg(graft.functions.GraftFunctions.kmvSketch(spark, col("h"), k))
      .head().getSeq[Long](0)
    val merged = base.select(col("day"), h.as("h"))
      .groupBy("day")
      .agg(graft.functions.GraftFunctions.kmvSketch(spark, col("h"), k)
        .as("ks"))
      .select(explode(col("ks")).as("h"))
      .agg(graft.functions.GraftFunctions.kmvSketch(spark, col("h"), k))
      .head().getSeq[Long](0)
    assert(direct == merged, "per-day merge lost a global k-smallest hash")
  }

  test("theta estimates land within 3 rsd of exact and the set algebra " +
    "is consistent") {
    // KMV rsd ~ 1/sqrt(k-2) with k=128 → ~9%; 3 sigma is the
    // conventional sketch-accuracy bar (same shape as the HLL/CMS
    // contracts elsewhere in the registry)
    val rsd3 = 3.0 / math.sqrt(126.0)
    run("rel_theta_sketch_distinct").collect().foreach { r =>
      val est = r.getAs[Double]("est")
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(est - exact) <= rsd3 * exact + 1e-9,
        s"${r.getAs[String]("event_type")}: est $est vs exact $exact")
    }
    val u = run("rel_theta_union_merge").head()
    assert(math.abs(u.getAs[Double]("est") -
      u.getAs[Long]("exact").toDouble) <=
      rsd3 * u.getAs[Long]("exact") + 1e-9)
    // intersection + difference partition segment A below the shared θ:
    // s_inter + s_diff = |kA below θ| exactly, so the two estimates sum
    // to the A-below-θ estimate — the inclusion-exclusion consistency a
    // user composes set expressions with
    val i = run("rel_theta_intersect").head()
    val d = run("rel_theta_diff").head()
    assert(i.getAs[Long]("exact") + d.getAs[Long]("exact") > 0)
    val sumParts = i.getAs[Long]("s_inter") + d.getAs[Long]("s_diff")
    assert(sumParts <= 128,
      s"retained below-theta rows exceed k: $sumParts")
    // and each estimate is nonnegative with theta in range by
    // construction: est = s * 2^60 / theta >= s >= 0
    assert(i.getAs[Double]("est") >= 0.0 && d.getAs[Double]("est") >= 0.0)
  }

  test("theta IVM refresh equals the from-scratch sketch (registry " +
    "query invariant at the row level)") {
    // rel_theta_ivm's oracle IS the from-scratch sketch; this pins the
    // same merge-equals-recompute identity against the batch query
    // directly so a drift in either path localizes here
    val ivm = run("rel_theta_ivm").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val direct = run("rel_theta_sketch_distinct").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ivm == direct,
      s"incremental refresh diverged from recompute:\n$ivm\nvs\n$direct")
  }

  test("table checksum is order- and partitioning-independent") {
    val base = run("rel_table_checksum").head()
    val (n, sum) = (base.getAs[Long]("n_rows"),
      base.getAs[String]("checksum"))
    // same rows, shuffled hard: checksum must not move
    val reshuffled = SparkEntry.queries("rel_table_checksum")(
      TestSpark.spark, sf)
    assert(reshuffled.head().getAs[String]("checksum") == sum)
    import org.apache.spark.sql.functions._
    val df = TestSpark.spark.read.parquet(s"$sf/lineitem.parquet")
      .orderBy(rand(7)).repartition(7)
    df.createOrReplaceTempView("graft_ck_shuffled")
    val h = conv(substring(md5(concat_ws("|",
      col("l_orderkey").cast("string"), col("l_partkey").cast("string"),
      col("l_suppkey").cast("string"),
      col("l_quantity").cast("decimal(18,2)").cast("string"),
      col("l_returnflag")).cast("binary")), 1, 15), 16, 10)
      .cast("decimal(38,0)")
    val got = df.select(h.as("h"))
      .agg(count(lit(1)).as("n"), sum2(col("h")))
      .head()
    assert(got.getLong(0) == n)
    assert(got.getDecimal(1).toBigInteger.toString == sum,
      "checksum changed under reorder/repartition")
  }

  private def sum2(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.sum(c)
      .cast("decimal(38,0)")

  test("sub-k segments estimate exactly (theta = 2^60 regime)") {
    import spark.implicits._
    // 40 distinct keys < k=128: the sketch holds the full distinct set
    // and est must equal exact — the estimator's exact-mode branch
    val df = (1L to 200L).map(v => v % 40L).toDF("key")
    val h = conv(substring(md5(col("key").cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    val ks = df.select(h.as("h"))
      .agg(graft.functions.GraftFunctions.kmvSketch(spark, col("h"), 128))
      .head().getSeq[Long](0)
    assert(ks.size == 40, s"expected 40 retained, got ${ks.size}")
    assert(ks == ks.sorted && ks.distinct.size == ks.size)
    assert(ks.forall(v => v >= 0 && v < P60),
      "hashes must be 60-bit nonnegative")
  }
}
