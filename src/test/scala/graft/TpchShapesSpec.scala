package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-15 TPC-H shapes (Q8, Q11, Q12,
  * Q13, Q16, Q17, Q19, Q21, Q22) on the sf0.001 tables —
  * conservation laws and brute-force cross-checks the DuckDB
  * hash-compare can't express. */
class TpchShapesSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)
  private def t(name: String) =
    spark.read.parquet(s"$sf/$name.parquet")

  test("rel_q8_market_share: shares in [0,1], line mass matches an " +
      "independent join count") {
    val rows = run("rel_q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      assert(share >= 0.0 && share <= 1.0, s"share $share")
      assert(r.getAs[Double]("total_rev") > 0.0)
    }
    // independent recount of qualifying lines (set algebra, no revenue)
    val asiaNations = t("nation").join(t("region")
        .where(col("r_name") === "ASIA"),
      col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val custs = t("customer")
      .where(col("c_nationkey").isin(asiaNations.toSeq: _*))
      .select("c_custkey")
    val stdParts = t("part").where(col("p_type") === "STANDARD")
      .select("p_partkey")
    val expected = t("lineitem")
      .join(stdParts, col("l_partkey") === col("p_partkey"))
      .join(t("orders").join(custs,
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(rows.map(_.getAs[Long]("n_lines")).sum == expected)
  }

  test("rel_q11_important_parts: exactly the parts above the exact " +
      "0.1% threshold") {
    val got = run("rel_q11_important_parts").collect()
      .map(r => r.getAs[Long]("partkey")).toSet
    // brute-force recompute in BigDecimal cents
    val euroNations = t("nation").join(t("region")
        .where(col("r_name") === "EUROPE"),
      col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    val euroSupp = t("supplier")
      .where(col("s_nationkey").isin(euroNations.toSeq: _*))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    val byPart = t("lineitem")
      .where(col("l_suppkey").isin(euroSupp.toSeq: _*))
      .select("l_partkey", "l_extendedprice").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
      }
    val total = byPart.values.sum
    val expect = byPart.filter { case (_, v) => v * 1000 > total }.keySet
    assert(got == expect)
  }

  test("rel_q12_priority_class: high + low equals the qualifying " +
      "line count") {
    val rows = run("rel_q12_priority_class").collect()
    val massGot = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val expected = t("lineitem")
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(t("orders"), col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .count()
    assert(massGot == expected && massGot > 0)
  }

  test("rel_q13_order_dist: distribution conserves customers and " +
      "orders, includes the zero bucket") {
    val rows = run("rel_q13_order_dist").collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist"))
    assert(rows.map(_._2).sum == t("customer").count())
    val orderMass = rows.map { case (c, n) => c * n }.sum
    val expected = t("orders")
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")
        && col("o_orderdate") < lit("2000-01-01").cast("timestamp")
        && col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .count()
    assert(orderMass == expected)
    assert(rows.exists(_._1 == 0L),
      "narrow one-year window must leave some customers at zero")
  }

  test("rel_q16_supplier_cnt: counts bounded by the supplier pool, " +
      "groups respect every predicate") {
    val pool = t("supplier").where(col("s_acctbal") >= 0).count()
    val rows = run("rel_q16_supplier_cnt").collect()
    assert(rows.nonEmpty)
    val sizes = Set(1, 5, 9, 13, 17, 21, 25, 29)
    rows.foreach { r =>
      assert(r.getAs[String]("p_brand") != "Brand#13")
      assert(r.getAs[String]("p_type") != "PROMO")
      assert(sizes.contains(r.getAs[Int]("p_size")))
      val c = r.getAs[Long]("supplier_cnt")
      assert(c >= 1 && c <= pool)
    }
  }

  test("rel_q17_small_qty: matches a brute-force recompute") {
    val row = run("rel_q17_small_qty").head()
    val parts = t("part").where(col("p_brand") === "Brand#23")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val lines = t("lineitem")
      .where(col("l_partkey").isin(parts.toSeq: _*))
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
    val avgQ = lines.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getDouble(1)).sum / rs.length
    }
    val small = lines.filter(r =>
      r.getDouble(1) < 0.2 * avgQ(r.getLong(0)))
    assert(row.getAs[Long]("n_lines") == small.length)
    val brute = small.map(r => BigDecimal(r.getDouble(2)).setScale(2,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / 7.0
    assert(math.abs(row.getAs[Double]("avg_yearly") - brute) < 1e-4)
  }

  test("rel_q19_disjunctive: line count matches independent branch " +
      "evaluation") {
    val row = run("rel_q19_disjunctive").head()
    val parts = t("part")
      .select("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    val n = t("lineitem").select("l_partkey", "l_quantity").collect()
      .count { r =>
        val (brand, size) = parts(r.getLong(0))
        val q = r.getDouble(1)
        (brand == "Brand#12" && size >= 1 && size <= 5 &&
          q >= 1 && q <= 11) ||
          (brand == "Brand#23" && size >= 1 && size <= 10 &&
            q >= 10 && q <= 20) ||
          (brand == "Brand#3" && size >= 1 && size <= 15 &&
            q >= 20 && q <= 30)
      }
    assert(row.getAs[Long]("n_lines") == n)
    assert(row.getAs[Double]("revenue") > 0.0)
  }

  test("rel_q21_waiting_supplier: numwait conserves qualifying orders") {
    val rows = run("rel_q21_waiting_supplier").collect()
    // brute-force: per F-order supplier sets, exactly one late supplier
    val od = t("orders").where(col("o_orderstatus") === "F")
      .selectExpr("o_orderkey",
        "unix_millis(cast(o_orderdate as timestamp)) AS odm").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qualifying = t("lineitem")
      .selectExpr("l_orderkey", "l_suppkey",
        "unix_millis(cast(l_shipdate as timestamp)) AS lsm").collect()
      .filter(r => od.contains(r.getLong(0)))
      .groupBy(_.getLong(0)).count { case (ok, ls) =>
        val supps = ls.map(_.getLong(1)).toSet
        val lateSupps = ls.filter(r => r.getLong(2) >
          od(ok) + 75L * 86400000L).map(_.getLong(1)).toSet
        supps.size > 1 && lateSupps.size == 1
      }
    assert(rows.map(_.getAs[Long]("numwait")).sum == qualifying)
    assert(qualifying > 0, "fixture must exercise the shape")
  }

  test("rel_q22_idle_rich: exactly the rich idle customers of the " +
      "nation set (sf0.01 — the pool is empty at sf0.001)") {
    val sf01 = "/root/testdata/sf0.01"
    def t(name: String) = spark.read.parquet(s"$sf01/$name.parquet")
    val got = SparkEntry.queries("rel_q22_idle_rich")(spark, sf01)
      .collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        r.getAs[Long]("numcust")).toMap
    val pool = t("customer")
      .where(col("c_nationkey").isin(3, 8, 13, 18, 23))
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)))
    val pos = pool.filter(_._3 > 0).map(_._3)
    val recent = t("orders")
      .where(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = pool
      .filter { case (ck, _, bal) =>
        bal * pos.length > pos.sum && !recent.contains(ck)
      }
      .groupBy(_._2).map { case (nk, rs) => nk -> rs.length.toLong }
    assert(got == expect)
    got.keySet.foreach(nk => assert(Set(3, 8, 13, 18, 23).contains(nk)))
  }

  test("rel_q15_top_supplier: every returned supplier sits at the " +
      "exact quarterly max, ties all kept") {
    val rows = run("rel_q15_top_supplier").collect()
    assert(rows.nonEmpty)
    // brute-force per-supplier revenue in BigDecimal cents
    val byS = t("lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .select("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0)).map { case (k, rs) =>
        k -> rs.map { r =>
          val p = BigDecimal(r.getDouble(1)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP)
          val d = BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP)
          p * (BigDecimal(1) - d)
        }.sum
      }
    val maxRev = byS.values.max
    val expect = byS.filter(_._2 == maxRev).keySet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == expect)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("total_revenue") -
      maxRev.toDouble) < 1e-6))
  }

  test("rel_q20_excess_suppliers: every majority holder verified, no " +
      "duplicates") {
    val rows = run("rel_q20_excess_suppliers").collect()
    val keys = rows.map(_.getAs[Long]("s_suppkey"))
    assert(keys.length == keys.distinct.length, "distinct() must hold")
    // brute-force the (part, supplier) majority set
    val promo = t("part").where(col("p_type") === "PROMO")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val byPS = t("lineitem")
      .where(col("l_shipdate") >= lit("1998-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity").collect()
      .filter(r => promo.contains(r.getLong(0)))
      .groupBy(r => (r.getLong(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(2)).sum }
    val byP = byPS.groupBy(_._1._1).map { case (p, m) =>
      p -> m.values.sum
    }
    val expect = byPS.collect {
      case ((p, sArr), q) if q * 2 > byP(p) => sArr
    }.toSet
    assert(keys.toSet == expect)
  }
}
