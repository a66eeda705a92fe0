package graft

import graft.ops.{NaiveCsv, Rank, TextOps}
import graft.pipelines.{StockCount, WordCount}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ extensions), each paired with equivalent DuckDB SQL in
  * `oracleSql` over the same parquet tables.
  *
  * Conventions for oracle parity (the driver hash-compares after sorting
  * columns by name):
  *   - every computed column is aliased identically on both sides;
  *   - counts/ranks/sizes are BIGINT on both sides (Spark `size`/`row_number`
  *     are cast to long);
  *   - money/value aggregates go through DECIMAL (order-independent exact
  *     sums — double sums would be nondeterministic across partitions) and
  *     are cast to the same final precision/scale on both sides.
  */
object SparkEntry {

  // ---- shared inputs ------------------------------------------------------

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark rejects by default;
    * read nanos as long and rebuild a (microsecond) timestamp. Integer `div`
    * (not `/`) — nanos ~1.7e18 exceeds double's 2^53 exact-integer range. */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tbl(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Synthetic raw-CSV-line view of `documents`, exercising the reference's
    * naive-split semantics: field 0 = id, interior = headline (with embedded
    * commas injected around the word "spark"), field n-2 = lang ("date"
    * slot), field n-1 = source ("stock" slot). */
  private def docLines(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      concat_ws(",", col("doc_id"),
        regexp_replace(col("text"), " spark ", ",spark,"),
        col("lang"), col("source")).as("line"))

  /** Same construction in DuckDB SQL (regexp_replace is single-occurrence by
    * default in DuckDB, hence the 'g' flag to match Spark). */
  private val linesCte =
    """WITH lines AS (
      |  SELECT doc_id, lang,
      |         concat_ws(',', doc_id,
      |                   regexp_replace(text, ' spark ', ',spark,', 'g'),
      |                   lang, source) AS line
      |  FROM documents
      |)""".stripMargin

  private lazy val stopListSql: String =
    TextOps.stopWords.map(w => s"'$w'").mkString("(", ", ", ")")

  /** DuckDB token stream (scrub + whitespace split + unnest), matching
    * [[TextOps.scrub]]/[[TextOps.tokenize]]. */
  private def tokensCte(src: String): String =
    s"""toks AS (
       |  SELECT unnest(string_split_regex(
       |           regexp_replace(lower($src), '[^a-z ]', ' ', 'g'),
       |           '\\s+')) AS token
       |  FROM documents
       |)""".stripMargin

  // ---- flagship -----------------------------------------------------------

  /** Flagship: the full StockCount pipeline on sf0.001 document lines. */
  def entry(spark: SparkSession): DataFrame =
    StockCount.fromLines(
      docLines(spark, "/root/testdata/sf0.001").select(col("line").as("value")))

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1: parquet scan + projection + filter (pushdown/pruning path)
    "s1_scan_project_filter" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), col("source"))
        .where(col("n_chars") > 200)),

    // P1: Java-split parity — field arity per line
    "p1_java_split_arity" -> ((s, dir) =>
      docLines(s, dir).select(col("doc_id"),
        size(NaiveCsv.javaSplit(col("line"))).cast("long").as("n_fields"))),

    // P2: last-field extraction + trim
    "p2_last_field" -> ((s, dir) =>
      docLines(s, dir).select(col("doc_id"),
        NaiveCsv.lastField(NaiveCsv.javaSplit(col("line"))).as("ticker"))),

    // P3: headline reconstruction (slice + re-join on ",")
    "p3_headline_rejoin" -> ((s, dir) =>
      docLines(s, dir).select(col("doc_id"),
        NaiveCsv.headline(NaiveCsv.javaSplit(col("line"))).as("headline"))),

    // F1: row-arity filter feeding an aggregate
    "f1_arity_filter" -> ((s, dir) =>
      docLines(s, dir)
        .where(NaiveCsv.arityAtLeast(NaiveCsv.javaSplit(col("line")), 4))
        .groupBy("lang").agg(count(lit(1)).as("cnt"))),

    // T1+T2: case fold + punctuation scrub
    "t1_t2_scrub" -> ((s, dir) =>
      tbl(s, dir, "documents").select(col("doc_id"),
        TextOps.scrub(col("text")).as("scrubbed"))),

    // T3+F3: tokenize + explode (generator), empty-token filter, count
    "t3_token_counts" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(explode(TextOps.tokenize(TextOps.scrub(col("text"))))
          .as("token"))
        .where(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))),

    // F2: stop-word filter (InSet ≙ broadcast anti-join)
    "f2_stopword_filter" -> ((s, dir) =>
      tbl(s, dir, "documents")
        .select(explode(TextOps.tokenize(TextOps.scrub(col("text"))))
          .as("token"))
        .where(TextOps.keepToken(col("token")))
        .groupBy("token").agg(count(lit(1)).as("cnt"))),

    // A1: count-per-key aggregation (partial+final hash agg)
    "a1_count_by_key" -> ((s, dir) =>
      events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))),

    // O1+O2: global sort by count desc + row_number rank
    "o1_o2_rank_events" -> ((s, dir) => {
      val counts = events(s, dir)
        .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      Rank.ranked(counts, col("cnt"), Seq(col("event_type")))
        .select(col("rank"), col("event_type"), col("cnt"))
    }),

    // Full StockCount pipeline (P1+F1+P2+A1+O1+O2)
    "stock_count_pipeline" -> ((s, dir) =>
      StockCount.fromLines(docLines(s, dir).select(col("line").as("value")))),

    // Full WordCount pipeline (P1+P3+T1..T3+F2+F3+A1+O1..O3, top-100)
    "word_count_pipeline" -> ((s, dir) =>
      WordCount.fromLines(docLines(s, dir).select(col("line").as("value")))),
  )

  def oracleSql: Map[String, String] = Map(

    "s1_scan_project_filter" ->
      "SELECT doc_id, n_chars, source FROM documents WHERE n_chars > 200",

    "p1_java_split_arity" ->
      s"""$linesCte
         |SELECT doc_id, len(string_split(line, ',')) AS n_fields
         |FROM lines""".stripMargin,

    "p2_last_field" ->
      s"""$linesCte
         |SELECT doc_id, trim(line_split[-1]) AS ticker
         |FROM (SELECT doc_id, string_split(line, ',') AS line_split
         |      FROM lines)""".stripMargin,

    "p3_headline_rejoin" ->
      s"""$linesCte
         |SELECT doc_id,
         |       array_to_string(l[2:len(l)-2], ',') AS headline
         |FROM (SELECT doc_id, string_split(line, ',') AS l FROM lines)""".stripMargin,

    "f1_arity_filter" ->
      s"""$linesCte
         |SELECT lang, count(*) AS cnt FROM lines
         |WHERE len(string_split(line, ',')) > 3
         |GROUP BY lang""".stripMargin,

    "t1_t2_scrub" ->
      """SELECT doc_id,
        |       regexp_replace(lower(text), '[^a-z ]', ' ', 'g') AS scrubbed
        |FROM documents""".stripMargin,

    "t3_token_counts" ->
      s"""WITH ${tokensCte("text")}
         |SELECT token, count(*) AS cnt FROM toks
         |WHERE len(token) > 0 GROUP BY token""".stripMargin,

    "f2_stopword_filter" ->
      s"""WITH ${tokensCte("text")}
         |SELECT token, count(*) AS cnt FROM toks
         |WHERE len(token) > 0 AND token NOT IN $stopListSql
         |GROUP BY token""".stripMargin,

    "a1_count_by_key" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",

    "o1_o2_rank_events" ->
      """SELECT row_number() OVER (ORDER BY cnt DESC, event_type) AS rank,
        |       event_type, cnt
        |FROM (SELECT event_type, count(*) AS cnt FROM events
        |      GROUP BY event_type)""".stripMargin,

    "stock_count_pipeline" ->
      s"""$linesCte,
         |tickers AS (
         |  SELECT trim(l[-1]) AS ticker
         |  FROM (SELECT string_split(line, ',') AS l FROM lines)
         |  WHERE len(l) > 3
         |),
         |counts AS (SELECT ticker, count(*) AS cnt FROM tickers GROUP BY ticker)
         |SELECT row_number() OVER (ORDER BY cnt DESC, ticker) AS rank,
         |       ticker, cnt
         |FROM counts""".stripMargin,

    "word_count_pipeline" ->
      s"""$linesCte,
         |heads AS (
         |  SELECT array_to_string(l[2:len(l)-2], ',') AS h
         |  FROM (SELECT string_split(line, ',') AS l FROM lines)
         |  WHERE len(l) > 1
         |),
         |toks AS (
         |  SELECT unnest(string_split_regex(
         |           regexp_replace(lower(h), '[^a-z ]', ' ', 'g'),
         |           '\\s+')) AS word
         |  FROM heads
         |),
         |counts AS (
         |  SELECT word, count(*) AS cnt FROM toks
         |  WHERE len(word) > 0 AND word NOT IN $stopListSql
         |  GROUP BY word
         |),
         |ranked AS (
         |  SELECT row_number() OVER (ORDER BY cnt DESC, word) AS rank,
         |         word, cnt
         |  FROM counts
         |)
         |SELECT rank, word, cnt FROM ranked WHERE rank <= 100""".stripMargin,
  )
}
