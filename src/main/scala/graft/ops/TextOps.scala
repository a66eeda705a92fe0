package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / tokenization operators (reference ops T1-T3, F2, F3).
  *
  * Semantics from `/root/reference/src/WordCount.java:53-61`:
  *   T1 case fold:  `toLowerCase()`
  *   T2 scrub:      `replaceAll("[^a-zA-Z ]", " ")` — every non-ASCII-letter,
  *                  non-space char (digits included) becomes a space
  *   T3 tokenize:   `split("\\s+")` then emit one record per token
  *   F2 stop-words: drop token if in the 318-word list (loaded lowercased)
  *   F3 empties:    drop zero-length tokens
  *
  * All pure built-in expressions: `lower`/`regexp_replace`/`split` are
  * codegen'd, `explode` is a Catalyst Generator, and the stop-word test uses
  * `isInCollection` which Catalyst converts to an O(1) `InSet` hash probe —
  * the Spark-native equivalent of the reference's broadcast side-file
  * (`WordCount.java:25-38`) with no per-task re-read.
  */
object TextOps {

  /** Training-data redaction: mask emails, URLs, then digit runs (in that
    * order — emails/URLs contain digits). Pure regexp_replace (codegen'd,
    * engine-portable: the patterns avoid lookarounds so Java regex and
    * RE2-family engines agree). */
  def redact(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^\\s]+", "<URL>")
    regexp_replace(url, "[0-9]+", "<NUM>")
  }

  /** The reference's stop-word list
    * (`/root/reference/src/stop-word-list.txt`; 319 entries — the file has
    * no trailing newline, so `wc -l` says 318 but the reference's readLine
    * loop loads 319), loaded once per JVM from resources, trimmed +
    * lowercased as at `WordCount.java:34`. CRLF endings are handled by the
    * same trim. */
  lazy val stopWords: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/stop-word-list.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim.toLowerCase).filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** T1+T2: case-fold then scrub punctuation/digits to spaces. */
  def scrub(c: Column): Column =
    regexp_replace(lower(c), "[^a-z ]", " ")

  /** T3 as an array (pre-explode): whitespace tokenization. Note Java
    * `"".split("\\s+")` yields `[""]` and leading whitespace yields a
    * leading `""` token — both removed downstream by [[keepToken]] (F3),
    * so plain Spark `split` (same Java regex engine) is exact parity. */
  def tokenize(c: Column): Column = split(c, "\\s+")

  /** One-regex-pass tokenizer, exactly equivalent to
    * `tokenize(scrub(c))`: splitting the lowered text on runs of
    * non-letters yields the same token stream as replacing `[^a-z ]` with
    * spaces and then splitting on whitespace (maximal `[a-z]+` runs, plus a
    * leading "" when the text starts with a non-letter — removed by F3
    * downstream either way). Saves a full-string regexp_replace and the
    * intermediate string allocation on the hot path; equivalence is
    * property-tested in TextOpsSpec. */
  def fastTokenize(c: Column): Column = split(lower(c), "[^a-z]+", -1)

  /** F2+F3 combined token predicate: non-empty and not a stop word. */
  def keepToken(tok: Column, stop: Seq[String] = stopWords): Column =
    length(tok) > 0 && !tok.isInCollection(stop)

  /** Full T1..F3 pipeline as a single exploded-token Column: callers do
    * `df.select(explode(cleanTokens(col)).as("token"))` then filter, or use
    * the convenience shape below that keeps the filter with the generator. */
  def cleanTokens(c: Column, stop: Seq[String] = stopWords): Column =
    filter(tokenize(scrub(c)),
      t => length(t) > 0 && !t.isInCollection(stop))
}
