package graft

import graft.ops.{Quality, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilarityQualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cosine similarity on known vectors") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)),
      (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
      round(Similarity.cosine(col("embedding"), array(lit(1.0), lit(0.0))), 9)
        .as("c")).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0, 4L -> -1.0))
  }

  test("knn returns top-k by cosine with id tiebreak") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)),
      (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.knn(df, col("embedding"), col("vec_id"),
      Seq(1.0, 0.0), 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L)) // both cos=1.0, id ascending
  }

  test("centroids computes element-wise means per group") {
    val df = Seq(("a", Seq(1f, 3f)), ("a", Seq(3f, 5f)), ("b", Seq(0f, 2f)))
      .toDF("label", "embedding")
    val got = Similarity.centroids(df, col("embedding"), col("label"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") == Seq(2.0, 4.0) && got("b") == Seq(0.0, 2.0))
  }

  test("nearDupPairsBlocked only compares within blocks, id1 < id2") {
    val df = Seq((1L, "x", Seq(1f, 0f)), (2L, "x", Seq(1f, 0f)),
      (3L, "y", Seq(1f, 0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.nearDupPairsBlocked(df, col("embedding"),
      col("vec_id"), col("label"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L))) // (x,y) cross-block pair excluded
  }

  test("tokenCount handles blanks and runs of whitespace") {
    val got = Seq("", "   ", "one", " one  two\tthree ").toDF("t")
      .select(Quality.tokenCount(col("t"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 3L))
  }

  test("ratios on a known sentence") {
    val t = "the cat sat on the mat!!"
    val Seq((sw, punct, uniq)) = Seq(t).toDF("t").select(
      Quality.stopwordRatio(col("t")), Quality.punctRatio(col("t")),
      Quality.uniqueRatio(col("t"))).as[(Double, Double, Double)]
      .collect().toSeq
    // tokens: the cat sat on the mat -> 6; stop: the,on,the -> 3
    assert(sw == 0.5)
    assert(punct == 2.0 / 24.0)
    assert(uniq == 5.0 / 6.0)
  }

  test("langId picks the marker-dominant language, unknown when none") {
    val got = Seq(
      "the cat and the dog of the house",
      "el gato y la casa de los perros que corren",
      "zzz qqq xxx www").toDF("t")
      .select(Quality.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "unknown"))
  }
}
