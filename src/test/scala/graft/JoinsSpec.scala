package graft

import graft.ops.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("saltedEquiJoin returns exactly the plain join's rows on skew") {
    // 90% of the big side lands on one mega-key — the salted plan splits it
    val big = (0 until 2000)
      .map(i => (if (i % 10 == 0) i % 7L else 7L, s"row$i"))
      .toDF("k", "bv")
    val small = (0L until 10L).map(k => (k, s"dim$k")).toDF("k", "sv")
    val plain = big.join(small, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val salted = Joins.saltedEquiJoin(big, small, Seq("k"), saltN = 8)
      .select(plain.head.indices.map(i => col(big.join(small, Seq("k"))
        .columns(i))): _*)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(salted == plain)
  }

  test("saltedEquiJoin spreads a mega-key evenly across salt buckets") {
    // even 1000 byte-identical rows of one key cycle through every bucket
    val big = Seq.fill(1000)((7L, "x")).toDF("k", "bv")
    val counts = big.select(
      pmod(monotonically_increasing_id(), lit(8L)).as("s"))
      .groupBy("s").count().collect().map(_.getLong(1))
    assert(counts.length == 8, s"expected all 8 salt buckets used")
    assert(counts.max - counts.min <= big.rdd.getNumPartitions,
      s"expected near-even spread, got ${counts.mkString(",")}")
  }

  test("rangeJoin assigns each fact to its [lo, hi) band") {
    val facts = Seq(0.0, 99.9, 100.0, 249.9, 250.0, 400.0).toDF("v")
    val ranges = Seq((0.0, 100.0, "low"), (100.0, 250.0, "mid"),
      (250.0, 1e9, "high")).toDF("lo", "hi", "band")
    val got = Joins.rangeJoin(facts, ranges, col("v"), col("lo"), col("hi"))
      .select("v", "band").as[(Double, String)].collect().toSet
    assert(got == Set((0.0, "low"), (99.9, "low"), (100.0, "mid"),
      (249.9, "mid"), (250.0, "high"), (400.0, "high")))
  }
}
