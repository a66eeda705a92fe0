package graft

import graft.pipelines.{StockCount, WordCount}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-parity tests over a miniature analyst_ratings-shaped fixture
  * (FIXTURES.md §1): header row counted as data, embedded commas re-joined,
  * short rows filtered, punctuation scrubbed, stop words removed. */
class PipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val fixture = Seq(
    ",headline,date,stock",                                          // header: counted!
    "0,\"Stocks That Hit 52-Week Highs On Friday\",2020-06-05,A",
    "1,Agilent's Q1 EPS Beats Views, Revenue Up 5.2%,2020-02-18,A",  // embedded comma
    "2,Morgan Stanley Upgrades Apple, Maintains Overweight,2019-01-02,AAPL",
    "3,short row,MS",                                                // 3 fields: dropped
    "4,Benzinga's Top Upgrades,2018-05-04,MS",
    "5,U.S. Stocks Rally,2018-05-04, MS ")                           // ticker trimmed

  private def stock = StockCount.fromLines(fixture.toDF("value"))
  private def word = WordCount.fromLines(fixture.toDF("value"))

  test("StockCount counts header as data, trims tickers, drops short rows") {
    val rows = stock.collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(rows == Map("A" -> 2, "MS" -> 2, "AAPL" -> 1, "stock" -> 1))
    // row "3,short row,MS" has 3 fields -> NOT counted for MS
  }

  test("StockCount ranks dense 1..n by count desc then key asc") {
    val ranked = stock.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(ranked.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(ranked.toSeq == Seq((1L, "A"), (2L, "MS"), (3L, "AAPL"), (4L, "stock")))
  }

  test("StockCount output format matches the reference byte format") {
    val lines = StockCount.formatted(stock).as[String].collect()
    assert(lines.head == "1: A, 2")
    assert(lines.forall(_.matches("""\d+: .*, \d+""")))
  }

  test("WordCount re-joins embedded commas before tokenizing") {
    val counts = word.collect().map(r => (r.getString(1), r.getLong(2))).toMap
    // "Agilent's Q1 EPS Beats Views, Revenue Up 5.2%" -> the comma-embedded
    // headline survives as one string; "revenue" must be counted
    assert(counts.contains("revenue"))
    // "U.S." scrubs to "u s"; "u" then... "s" is a non-stop-word token
    assert(counts.contains("s"))
    // stop words (on, up, that) removed; digits scrubbed
    assert(!counts.contains("on") && !counts.contains("up"))
    assert(!counts.keys.exists(_.exists(_.isDigit)))
  }

  test("WordCount header row contributes only 'headline' (date/stock dropped)") {
    // header ",headline,date,stock" -> fields ["", headline, date, stock];
    // P3 keeps index 1 only -> token "headline"
    val counts = word.collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(counts.get("headline").contains(1L))
    assert(!counts.contains("date") && !counts.contains("stock"))
  }

  test("WordCount output format uses tab separator") {
    val lines = WordCount.formatted(word).as[String].collect()
    assert(lines.forall(_.matches("""\d+: \S+\t\d+""")))
  }

  test("invariant: sum of stock counts == qualifying row count") {
    val qualifying = fixture.count(_.split(",").length > 3)
    assert(stock.collect().map(_.getLong(2)).sum == qualifying)
  }
}
