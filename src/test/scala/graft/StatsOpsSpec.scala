package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-14 statistics/TPC-H operators
  * (Mann-Whitney U, autocorrelation, token entropy, Q4/Q9/Q10/Q14
  * shapes) on the sf0.001 tables — cross-checks against independent
  * brute-force computations and conservation laws the DuckDB
  * hash-compare can't express. */
class StatsOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("rel_mann_whitney: U matches the brute-force pair count") {
    val row = run("rel_mann_whitney").head()
    val n1 = row.getAs[Long]("n1")
    val n2 = row.getAs[Long]("n2")
    val u1 = row.getAs[Double]("u1")
    val z = row.getAs[Double]("z")
    // brute force on the collected sf0.001 sample: U1 counts (a, b)
    // pairs with a > b, ties at half weight — the DEFINITION the
    // rank-sum shortcut must reproduce
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .where(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), col("value")).collect()
    val a = ev.filter(_.getString(0) == "purchase").map(_.getDouble(1))
    val b = ev.filter(_.getString(0) == "click").map(_.getDouble(1))
    assert(n1 == a.length && n2 == b.length)
    val brute = a.iterator.map { x =>
      b.count(x > _) + 0.5 * b.count(x == _)
    }.sum
    assert(math.abs(u1 - brute) < 1e-6, s"u1 $u1 != brute $brute")
    // z is a finite standardized statistic; for samples this size the
    // normal approximation keeps it within a loose envelope
    assert(!z.isNaN && math.abs(z) < 50)
  }

  test("rel_autocorrelation: 24 lags, each in [-1, 1], lag-1 matches " +
      "a naive float pass") {
    val acf = run("rel_autocorrelation").collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("acf")).toMap
    assert(acf.keySet == (1L to 24L).toSet)
    acf.values.foreach(v => assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    // independent naive recompute of lag-1 in plain doubles
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ts = spark.read.parquet(s"$sf/events.parquet").select("ts")
    val hours = (ts.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        ts.select(expr("ts div 3600000000000").as("h"))
      case _ => ts.select(expr("unix_micros(cast(ts as timestamp)) " +
        "div 3600000000").as("h"))
    }).groupBy("h").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1).toDouble).toMap
    val mu = hours.values.sum / hours.size
    val den = hours.values.map(x => (x - mu) * (x - mu)).sum
    val num = hours.collect {
      case (h, x) if hours.contains(h + 1) => (x - mu) * (hours(h + 1) - mu)
    }.sum
    assert(math.abs(acf(1L) - num / den) < 1e-4,
      s"acf(1) ${acf(1L)} != naive ${num / den}")
  }

  test("text_token_entropy: bounds and token-mass conservation") {
    val e = run("text_token_entropy").collect()
    assert(e.nonEmpty)
    e.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val distinct = r.getAs[Long]("n_distinct")
      assert(h >= -1e-6, s"negative entropy $h")
      assert(h <= math.log(distinct.toDouble) / math.log(2.0) + 1e-6,
        s"entropy $h exceeds log2($distinct)")
    }
    // Σ n_tokens over langs equals the corpus token count under the
    // same scrub+tokenize pipeline
    val total = e.map(_.getAs[Long]("n_tokens")).sum
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ops.TextOps.tokenize(
        graft.ops.TextOps.scrub(col("text")))).as("t"))
      .where(length(col("t")) > 0).count()
    assert(total == direct, s"$total != $direct")
  }

  test("rel_q14_promo: promo_rev <= total_rev and pct consistent") {
    val rows = run("rel_q14_promo").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Double]("promo_rev")
      val tot = r.getAs[Double]("total_rev")
      val pct = r.getAs[Double]("promo_pct")
      assert(promo >= 0 && promo <= tot + 1e-9)
      assert(math.abs(pct - 100.0 * promo / tot) < 1e-5)
    }
  }

  test("rel_q10_returned: exactly <=20 rows, sorted cut is the true " +
      "top set") {
    val rows = run("rel_q10_returned").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_: Double)),
      "revenue not descending")
  }

  test("rel_q4_late_orders: counts bounded by orders per priority") {
    val late = run("rel_q4_late_orders").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_late_orders")).toMap
    val all = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(late.nonEmpty)
    late.foreach { case (p, n) =>
      assert(n <= all(p), s"$p: late $n > total ${all(p)}")
    }
  }

  test("rel_gini_revenue: matches brute-force Gini, bounded") {
    val row = run("rel_gini_revenue").head()
    val gini = row.getAs[Double]("gini")
    assert(gini >= 0.0 && gini < 1.0, s"gini $gini out of range")
    // brute force on collected per-customer cents
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(r => (r._2, r._1)).map(_._2)
    val n = cents.length.toDouble
    val s0 = cents.map(BigInt(_)).sum
    val sic = cents.zipWithIndex
      .map { case (x, i) => BigInt(i + 1) * x }.sum
    val brute = (BigDecimal(2 * sic) - BigDecimal((n + 1).toLong) *
      BigDecimal(s0)).toDouble / (n * s0.toDouble)
    assert(math.abs(gini - brute) < 1e-6, s"$gini != $brute")
    assert(row.getAs[Long]("n_customers") == cents.length)
  }

  test("text_zipf_fit: negative slope, r2 in [0,1], full vocab") {
    val row = run("text_zipf_fit").head()
    assert(row.getAs[Double]("slope") < 0, "zipf slope must be negative")
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
    val vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(graft.ops.TextOps.tokenize(
        graft.ops.TextOps.scrub(col("text")))).as("t"))
      .where(length(col("t")) > 0).select("t").distinct().count()
    assert(row.getAs[Long]("n_terms") == vocab)
  }

  test("rel_hll_intersect_bounded: contract holds, exact side correct") {
    val row = run("rel_hll_intersect_bounded").head()
    assert(row.getAs[Long]("within_bound") == 1L)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val a = ev.where(col("event_type") === "purchase")
      .select("user_id").distinct()
    val b = ev.where(col("event_type") === "click")
      .select("user_id").distinct()
    assert(row.getAs[Long]("exact_in") == a.join(b, "user_id").count())
  }

  test("rel_q9_profit: groups partition the joined fact rows") {
    // profit rows exist for every (nation, year) present in the join;
    // spot-check the join cardinality conservation instead of money
    // values (those are oracle-checked): Σ years per nation covers all
    // order years present in lineitem⨝orders
    val years = run("rel_q9_profit").select("o_year").distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .select(year(col("o_orderdate")).cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(years == expect, s"$years != $expect")
  }
}
