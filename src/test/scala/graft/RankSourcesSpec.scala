package graft

import graft.ops.Rank
import graft.sources.NaiveCsvSource
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RankSourcesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val counts = Seq(("a", 5L), ("b", 9L), ("c", 5L), ("d", 1L))
    .toDF("key", "cnt")

  test("ranked assigns 1..n by cnt desc, key asc tiebreak") {
    val got = Rank.ranked(counts, col("cnt"), Seq(col("key")))
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("rank"), r.getString(0))).toSeq
    assert(got == Seq((1L, "b"), (2L, "a"), (3L, "c"), (4L, "d")))
  }

  test("ranked with limit keeps top-k (TakeOrderedAndProject path)") {
    val got = Rank.ranked(counts, col("cnt"), Seq(col("key")), limit = 2)
      .orderBy("rank").collect().map(_.getString(0)).toSeq
    assert(got == Seq("b", "a"))
  }

  test("rankedBig (GlobalRank planned path) matches ranked") {
    val a = Rank.ranked(counts, col("cnt"), Seq(col("key")))
      .select("rank", "key", "cnt").collect().map(_.toSeq).toSet
    val b = Rank.rankedBig(counts, col("cnt"), Seq(col("key")))
      .select("rank", "key", "cnt").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("NaiveCsvSource round-trips reference-style csv with negative index") {
    val dir = java.nio.file.Files.createTempDirectory("graftcsv").toString
    NaiveCsvSource.writeTextSingle(
      Seq(",headline,date,stock", "1,Some News, More,2020, MS ", "2,short")
        .toDF("value"), dir)
    val got = NaiveCsvSource.read(spark, dir,
      Seq("id" -> 0, "ticker" -> -1), minFields = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // header row is data; ticker trimmed; 2-field row kept (minFields=2)
    assert(got == Set(("", "stock"), ("1", "MS"), ("2", "short")))
  }
}
