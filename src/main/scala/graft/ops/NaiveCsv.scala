package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Naive (quote-blind) CSV field operations with exact Java
  * `String.split(",")` parity.
  *
  * The reference engine splits every line with Java `split(",")`
  * (`/root/reference/src/StockCount.java:26`,
  * `/root/reference/src/WordCount.java:41`): no RFC-4180 quote awareness,
  * trailing empty fields dropped, leading/interior empties kept. We therefore
  * must NOT use `spark.read.csv` (quote-aware); instead these are pure
  * `Column` expression builders over a raw line column, fully covered by
  * whole-stage codegen (no UDFs).
  *
  * Java `split` semantics reproduced exactly (property-tested against
  * `String.split` in `NaiveCsvSpec`):
  *   - `""`      -> `[""]`   (no match on empty input yields the input)
  *   - `",,"`    -> `[]`     (all-empty fields are all trailing, all dropped)
  *   - `"a,b,,"` -> `["a","b"]` (trailing empties dropped)
  *   - `",a"`    -> `["","a"]`  (leading/interior empties kept)
  *
  * Implementation note: dropping trailing empty fields is equivalent to
  * stripping trailing separators *before* splitting, except for the two
  * degenerate inputs handled by the `when` guards. This keeps the whole
  * expression inside built-in, codegen'd Catalyst expressions — at 100 TB the
  * per-row cost is one regex pass + one split, no JVM lambda.
  */
object NaiveCsv {

  /** Exact Java-`String.split(sep)`-parity split. `sep` must be a single
    * literal (non-regex-meta) character, as in the reference (","). */
  def javaSplit(c: Column, sep: String = ","): Column = {
    val q = java.util.regex.Pattern.quote(sep)
    when(c === "", array(lit("")))
      .when(c.rlike(s"^(?:$q)+$$"), array().cast("array<string>"))
      .otherwise(split(regexp_replace(c, s"(?:$q)+$$", ""), q, -1))
  }

  /** P2 (`StockCount.java:29`): last field, trimmed — the stock ticker. */
  def lastField(arr: Column): Column = trim(element_at(arr, -1))

  /** P3 (`WordCount.java:45-52`): headline reconstruction. Drop field 0
    * (row id) and the last two fields (date, stock); re-join the interior
    * with "," — this undoes the naive split for headlines containing
    * embedded commas. Empty result for arrays shorter than 4 fields,
    * matching the Java loop bounds (i = 1 .. length-3). */
  def headline(arr: Column): Column =
    array_join(slice(arr, lit(2), greatest(size(arr) - lit(3), lit(0))), ",")

  /** F1 (`StockCount.java:27`): row-arity predicate — at least `n`+1 fields. */
  def arityAtLeast(arr: Column, n: Int): Column = size(arr) > (n - 1)
}
