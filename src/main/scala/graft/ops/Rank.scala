package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ranking operators (reference ops O1-O3).
  *
  * The reference sorts the whole reduce-side HashMap by count descending and
  * assigns `rank = 1..n` sequentially (`StockCount.java:51-66`,
  * `WordCount.java:82-93`); tie order there is nondeterministic (HashMap
  * iteration). This engine declares a deterministic total order —
  * `(count DESC, key ASC)` — a documented deviation (SURVEY.md §7.4).
  *
  * Scale note: `row_number` over a window with no `partitionBy` collapses to
  * a single partition, exactly mirroring the reference's single reducer. For
  * the ranked-aggregate queries here that is correct AND scalable, because
  * the window runs *after* the aggregation: its input is one row per distinct
  * key (5.9k tickers / 100-word top-K in the reference), not the raw data —
  * at 100 TB the heavy lifting stays in the partial/final hash aggregate and
  * the shuffle, and only the small key space hits the window. For ranking
  * large un-aggregated data use [[rankedBig]], which range-partitions the
  * sort and derives global ranks from per-partition offsets — no single-
  * partition stage at any size.
  */
object Rank {

  /** O1+O2: order by `cnt` desc (tiebreak: `keys` asc), assign rank 1..n.
    * Optionally O3: `limit` > 0 truncates — Catalyst plans sort+limit as
    * `TakeOrderedAndProject`, a true distributed top-K. */
  def ranked(df: DataFrame, cnt: Column, keys: Seq[Column],
             limit: Int = -1): DataFrame = {
    val w = Window.orderBy(cnt.desc +: keys.map(_.asc): _*)
    val base = if (limit > 0) {
      // pre-limit BEFORE the single-partition window: distributed top-K
      df.orderBy(cnt.desc +: keys.map(_.asc): _*).limit(limit)
    } else df
    base.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Scale-out variant for ranking data too large for one partition
    * (the reference never needs this — its ranked sets are post-aggregate).
    * Delegates to the planned [[graft.plans.GlobalRank]] operator: range-
    * partitioned sort + per-partition offset ranks, all inside Catalyst —
    * no RDD round-trip, so codegen/AQE survive and rows never deserialize
    * to Scala objects. */
  def rankedBig(df: DataFrame, cnt: Column, keys: Seq[Column]): DataFrame = {
    val cntName = df.select(cnt).columns.head
    val keyNames = keys.map(k => df.select(k).columns.head)
    graft.plans.GlobalRank.ranked(
      df, (cntName -> true) +: keyNames.map(_ -> false): _*)
  }
}
