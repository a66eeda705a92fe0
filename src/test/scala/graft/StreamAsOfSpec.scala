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

  test("stream_asof_bounded equals the batch as-of window cut at the " +
    "watermark horizon") {
    val ev = SparkEntry.events(spark, sf)
      .where(col("event_type").isin("view", "purchase"))
    val maxMs = ev.agg(max(unix_micros(col("ts")))).head().getLong(0) / 1000L
    val horizonUs = (maxMs - 600000L) * 1000L
    val batch = run("rel_asof_last_view")
      .join(ev.select(col("event_id"), unix_micros(col("ts")).as("t_us")),
        "event_id")
      .where(col("t_us") <= horizonUs)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_view_us")).map(_.longValue()))
      .toMap
    val stream = run("stream_asof_bounded")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_view_us")).map(_.longValue()))
      .toMap
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("asOfLastViewBounded: multi-batch out-of-order stream enriches " +
    "across batch boundaries within the lateness") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // one user, two time-ordered files -> two micro-batches
    // (maxFilesPerTrigger=1, oldest modTime first); lateness 10 s.
    //   batch A: view@0, purchase@20, view@30, purchase@100
    //   batch B: view@95, purchase@96, purchase@120  (95 s/96 s are
    //     out-of-order vs batch A's max 100 s but inside the lateness)
    // watermark after A = 90 s -> drains {view@0, p@20 -> 0, view@30};
    // watermark after B = 110 s -> timeout batch drains {view@95,
    // p@96 -> 95, p@100 -> 95}: the purchase from batch A is enriched
    // by the LATER-batch view with larger event time — exactly the
    // disorder asOfLastView cannot handle; p@120 stays unfinalized.
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    def us(sec: Long): Long = (base.getEpochSecond + sec) * 1000000L
    def row(id: Long, sec: Long, isView: Boolean): String = {
      val s = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(base.plusSeconds(sec))
      s"1,$id,$s,${us(sec)},$isView"
    }
    val dir = TestSpark.scratchDir("asof-mb")
    val fa = dir.resolve("a.csv")
    val fb = dir.resolve("b.csv")
    java.nio.file.Files.write(fa, Seq(
      row(1, 0, true), row(2, 20, false), row(3, 30, true),
      row(4, 100, false)).mkString("\n").getBytes)
    java.nio.file.Files.write(fb, Seq(
      row(5, 95, true), row(6, 96, false), row(7, 120, false))
      .mkString("\n").getBytes)
    java.nio.file.Files.setLastModifiedTime(fa,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(fb,
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("eventId", LongType),
      StructField("ts", TimestampType), StructField("tsUs", LongType),
      StructField("isView", BooleanType)))
    val got = graft.streaming.StreamGate.replayCsvMultiBatch(spark,
      dir.toString, schema, "gate_asof_mb", "append")(df =>
      graft.streaming.EventStream.asOfLastViewBounded(
        df.as[graft.streaming.EventStream.AsOfIn], "10 seconds").toDF())
      .collect().map(r => r.getAs[Long]("eventId") ->
        Option(r.getAs[java.lang.Long]("lastViewUs")).map(_.longValue()))
      .toMap
    assert(got == Map(
      2L -> Some(us(0)), 6L -> Some(us(95)), 4L -> Some(us(95))))
  }

  test("asOfLastViewBounded: a row at EXACTLY the watermark is " +
    "accepted and finalized; one strictly below is dropped — the " +
    "symmetric boundary convention") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // batch A: view@0 and view@100 (sets watermark = 100 - 10 = 90 s).
    // batch B: purchase@90 — event time EXACTLY the watermark — must be
    //   ACCEPTED (>= wm) and FINALIZED this batch (<= wm), enriched by
    //   the strictly-prior view@0; purchase@85 (< wm) is late-dropped.
    // Before the symmetric convention, the @90 row's fate depended on
    // which batch it arrived in (buffered-then-emitted vs dropped).
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    def us(sec: Long): Long = (base.getEpochSecond + sec) * 1000000L
    def row(id: Long, sec: Long, isView: Boolean): String = {
      val s = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(base.plusSeconds(sec))
      s"1,$id,$s,${us(sec)},$isView"
    }
    val dir = TestSpark.scratchDir("asof-boundary")
    val fa = dir.resolve("a.csv")
    val fb = dir.resolve("b.csv")
    java.nio.file.Files.write(fa,
      Seq(row(1, 0, true), row(2, 100, true)).mkString("\n").getBytes)
    java.nio.file.Files.write(fb,
      Seq(row(3, 90, false), row(4, 85, false)).mkString("\n").getBytes)
    java.nio.file.Files.setLastModifiedTime(fa,
      java.nio.file.attribute.FileTime.fromMillis(1000000000000L))
    java.nio.file.Files.setLastModifiedTime(fb,
      java.nio.file.attribute.FileTime.fromMillis(1000000002000L))
    val schema = StructType(Seq(
      StructField("userId", LongType), StructField("eventId", LongType),
      StructField("ts", TimestampType), StructField("tsUs", LongType),
      StructField("isView", BooleanType)))
    val got = graft.streaming.StreamGate.replayCsvMultiBatch(spark,
      dir.toString, schema, "gate_asof_boundary", "append")(df =>
      graft.streaming.EventStream.asOfLastViewBounded(
        df.as[graft.streaming.EventStream.AsOfIn], "10 seconds").toDF())
      .collect().map(r => r.getAs[Long]("eventId") ->
        Option(r.getAs[java.lang.Long]("lastViewUs")).map(_.longValue()))
      .toMap
    assert(got == Map(3L -> Some(us(0))),
      s"boundary row mishandled: $got")
  }

  test("asOfLastByType: per-type carries respect the (ts, event_id) " +
    "order and types stay independent") {
    import spark.implicits._
    // user 1: view@10, click@20, purchase@30 -> view 10 / click 20;
    //   click@30 (same instant, larger id than the purchase) must NOT
    //   leak into the purchase; purchase@40 then sees click@30.
    // user 2: click only -> view carry stays null.
    val ds = Seq(
      (1L, 1L, 10L, "view"), (1L, 2L, 20L, "click"),
      (1L, 3L, 30L, "purchase"), (1L, 4L, 30L, "click"),
      (1L, 5L, 40L, "purchase"),
      (2L, 6L, 15L, "click"), (2L, 7L, 25L, "purchase"))
      .toDS()
    val got = graft.streaming.EventStream.asOfLastByType(ds)
      .collect().map(r => (r.eventId, r.lookupType) -> r.lastUs).toMap
    assert(got == Map(
      (3L, "view") -> Some(10L), (3L, "click") -> Some(20L),
      (5L, "view") -> Some(10L), (5L, "click") -> Some(30L),
      (7L, "view") -> None, (7L, "click") -> Some(15L)))
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
