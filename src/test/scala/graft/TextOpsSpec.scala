package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("fastTokenize ≡ tokenize(scrub) on 500 random noisy strings") {
    val rnd = new scala.util.Random(17)
    val alphabet = "aBc d.,!3\t%-'é"
    val texts = Seq("", " ", "U.S. Stocks, Rally 5%!", "...", "a") ++
      Seq.fill(500)((0 until rnd.nextInt(40))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val got = texts.toDF("t").select(
      TextOps.fastTokenize(col("t")),
      TextOps.tokenize(TextOps.scrub(col("t"))))
      .as[(Seq[String], Seq[String])].collect()
    got.zip(texts).foreach { case ((fast, slow), t) =>
      assert(fast.filter(_.nonEmpty) == slow.filter(_.nonEmpty), s"text=$t")
    }
  }

  test("scrub matches the reference replaceAll semantics") {
    // WordCount.java:53 — toLowerCase().replaceAll("[^a-zA-Z ]", " ")
    val got = Seq("U.S. Q1-EPS Up 5.2%").toDF("t")
      .select(TextOps.scrub(col("t"))).as[String].head()
    assert(got == "U.S. Q1-EPS Up 5.2%".toLowerCase.replaceAll("[^a-z ]", " "))
  }

  test("stop-word list is the reference's full list, lowercased") {
    // 319 entries: the committed file has 318 newlines but no trailing
    // newline, and the reference's readLine loop (WordCount.java:31-36)
    // loads all 319 — including the quirky truncated entries herse"/himse"
    assert(TextOps.stopWords.size == 319)
    assert(TextOps.stopWords.contains("the"))
    assert(TextOps.stopWords.forall(w => w == w.toLowerCase.trim))
  }

  test("keepToken drops empties and stop words") {
    val got = Seq("the", "", "revenue", "a", "s").toDF("t")
      .where(TextOps.keepToken(col("t"))).as[String].collect().toSeq
    assert(got == Seq("revenue", "s"))
  }
}
