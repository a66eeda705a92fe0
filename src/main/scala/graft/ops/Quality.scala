package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token statistics,
  * quality scoring, and a lightweight language-ID heuristic.
  *
  * Ratios are exact-integer-over-exact-integer double divisions (IEEE-
  * deterministic, reproducible across engines); no floating-point
  * accumulation anywhere.
  */
object Quality {

  /** Whitespace token count of raw text (0 for blank). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** Distinct-token count over clean (scrubbed, lowercased) tokens. */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(Dedup.cleanTokens(text))).cast("long")

  /** Stop-word share of clean tokens (quality signal: natural prose has a
    * substantial stop-word fraction; keyword soup doesn't). */
  def stopwordRatio(text: Column,
                    stop: Seq[String] = TextOps.stopWords): Column = {
    val toks = Dedup.cleanTokens(text)
    val stops = filter(toks, t => t.isInCollection(stop))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Share of characters that are not letters/digits/whitespace. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", "")))
          .cast("double") / length(text).cast("double"))

  /** Type-token ratio (lexical diversity). */
  def uniqueRatio(text: Column): Column = {
    val toks = Dedup.cleanTokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite [0,1] quality score: prose-like stop-word share, low
    * punctuation noise, reasonable length. Weights are fixed, arithmetic is
    * deterministic. */
  def qualityScore(text: Column): Column =
    qualityScoreFrom(text, stopwordRatio(text))

  /** [[qualityScore]] with the stop-word ratio supplied by the caller —
    * lets hot paths pass the native [[graft.functions.WordSetRatioExpr]]
    * (via `GraftFunctions.stopRatio`) instead of the interpreted-HOF
    * [[stopwordRatio]]; identical arithmetic either way. */
  def qualityScoreFrom(text: Column, sw: Column): Column = {
    val lenOk = when(length(text).between(20, 20000), lit(1.0))
      .otherwise(lit(0.0))
    val swOk = when(sw.between(0.05, 0.6), lit(1.0)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(1.0)).otherwise(lit(0.0))
    (lenOk + swOk + punctOk) / lit(3.0)
  }

  /** N-gram-free language-ID heuristic: score by share of language-marker
    * function words among clean tokens; emit the argmax language or
    * "unknown" when no marker reaches the floor. Marker lists are tiny and
    * fixed — the whole thing is one pass of array expressions. */
  /** Fixed evaluation order for [[langId]] tie-breaks (and the native
    * [[graft.functions.LangIdExpr]], which must match it). */
  val langOrder: Seq[String] = Seq("en", "es", "fr", "de")

  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"))

  def markerRatio(text: Column, markers: Seq[String]): Column = {
    val toks = Dedup.cleanTokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.isInCollection(markers)))
        .cast("double") / size(toks).cast("double"))
  }

  /** Predicted language code; deterministic argmax with fixed evaluation
    * order (en > es > fr > de) and a 2% floor. Declarative reference
    * implementation — hot paths use `GraftFunctions.langId` (native, one
    * token pass instead of four interpreted HOF filters), property-tested
    * equal in NativeFunctionsSpec. */
  def langId(text: Column): Column = {
    val order = langOrder
    val ratios = order.map(l => l -> markerRatio(text, langMarkers(l)))
    val best = ratios.map(_._2).reduce((a, b) => greatest(a, b))
    order.foldRight(lit("unknown"): Column) { case (l, els) =>
      when(best >= 0.02 && ratios.toMap.apply(l) === best, lit(l))
        .otherwise(els)
    }
  }
}
