package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The streaming as-of enrichment must reproduce the batch as-of window
  * exactly — parity on real data plus the same-instant tiebreak corner
  * the (tsUs, eventId) total order defines. */
class StreamAsOfSpec extends AnyFunSuite {
  import TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stream_asof_enrich equals the batch as-of window row for row") {
    def keyed(name: String): Map[Long, (Long, Option[Long])] =
      run(name).collect().map { r =>
        r.getAs[Long]("event_id") ->
          ((r.getAs[Long]("user_id"),
            Option(r.getAs[java.lang.Long]("last_view_us"))
              .map(_.longValue())))
      }.toMap
    val stream = keyed("stream_asof_enrich")
    val batch = keyed("rel_asof_last_view")
    assert(stream.size == batch.size,
      s"row counts differ: ${stream.size} vs ${batch.size}")
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("same-instant tiebreak follows the (ts, event_id) 1-PRECEDING " +
    "frame") {
    import spark.implicits._
    // user 1: view id=1 then purchase id=2 at the SAME instant — the
    //   view sorts first, so the purchase sees it (the batch frame
    //   includes same-ts smaller-id rows);
    // user 2: view id=5, purchase id=4 at the same instant — the view
    //   sorts AFTER the purchase, so the purchase sees nothing;
    // user 3: strictly prior view, then a later view after the purchase
    //   which must not leak backward.
    val ds = Seq(
      (1L, 1L, 100L, true), (1L, 2L, 100L, false),
      (2L, 5L, 100L, true), (2L, 4L, 100L, false),
      (3L, 7L, 50L, true), (3L, 8L, 90L, false), (3L, 9L, 95L, true))
      .toDS()
    // flatMapGroupsWithState runs on batch Datasets with empty state —
    // exercising the fold (sort + carry) directly
    val got = graft.streaming.EventStream.asOfLastView(ds)
      .collect().map(r => r.eventId -> r.lastViewUs).toMap
    assert(got == Map(2L -> Some(100L), 4L -> None, 8L -> Some(50L)))
  }
}
