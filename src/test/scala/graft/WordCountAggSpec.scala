package graft

import graft.pipelines.WordCount
import org.scalatest.funsuite.AnyFunSuite

/** The map-side-aggregate word count must produce exactly the declarative
  * pipeline's results. */
class WordCountAggSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def collectRanked(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq

  test("fromLinesAgg == fromLines on the reference-shaped fixture") {
    val fixture = Seq(
      ",headline,date,stock",
      "1,Agilent's Q1 EPS Beats Views, Revenue Up 5.2%,2020-02-18,A",
      "2,Morgan Stanley Upgrades Apple, Maintains Overweight,2019-01-02,AAPL",
      "3,short row,MS",
      "5,U.S. Stocks Rally Rally Rally,2018-05-04,MS").toDF("value")
    assert(collectRanked(WordCount.fromLinesAgg(fixture)) ==
      collectRanked(WordCount.fromLines(fixture)))
  }

  test("fromLinesAgg == fromLines on 300 random csv-ish lines") {
    val rnd = new scala.util.Random(23)
    // includes non-ASCII so the agg's ASCII fast path and its fallback
    // both get exercised against the declarative pipeline
    val alphabet = "abc XY.,z!2 the andÉü"
    val lines = Seq.fill(300)((0 until rnd.nextInt(60))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString).toDF("value")
    assert(collectRanked(WordCount.fromLinesAgg(lines)) ==
      collectRanked(WordCount.fromLines(lines)))
  }

  test("StockCount.fromLinesAgg == fromLines on fixture + random lines") {
    val rnd = new scala.util.Random(31)
    val alphabet = "ab,c MS.,A!2 ,,"
    val fixture = Seq(",headline,date,stock", "1,Some News, More,2020, MS ",
      "2,short", "3,a,b,c,,", "")
    val lines = (fixture ++ Seq.fill(300)((0 until rnd.nextInt(40))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)).toDF("value")
    val a = graft.pipelines.StockCount.fromLinesAgg(lines)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val b = graft.pipelines.StockCount.fromLines(lines)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(a == b)
  }
}
