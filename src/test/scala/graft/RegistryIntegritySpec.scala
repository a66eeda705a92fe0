package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry is a Map literal, so a DUPLICATE key silently shadows
  * the earlier entry — the earlier query (and its oracle) vanish from
  * the surface with no compile error and no test failure anywhere else
  * (this nearly shipped once: a second "text_feature_hashing" replaced
  * the round-13 bucket-profile query). This spec counts the keys in the
  * SOURCE and requires the constructed Maps to be the same size, and
  * pins that every query carries an oracle. */
class RegistryIntegritySpec extends AnyFunSuite {

  private lazy val source = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    src
  }

  test("no duplicate query key shadows an earlier registry entry") {
    val names = """"([a-z0-9_]+)" -> \(\(s, dir\)""".r
      .findAllMatchIn(source).map(_.group(1)).toSeq
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query keys in source: $dupes")
    assert(SparkEntry.queries.size == names.size,
      "constructed queries map lost entries vs source")
  }

  test("every registered query has a DuckDB oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("plan-census exclusion list names only real registry queries") {
    // EagerQueries is the shared justified exclusion set for the plan
    // censuses; a renamed/deleted query must not leave a stale entry
    // silently weakening nothing (or worse, masking a future query
    // that reuses the name without being eager).
    val stale = EagerQueries.names -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"EagerQueries entries not in registry: $stale")
  }

  test("output-schema census: no registry query emits a top-level " +
    "array/map/struct column") {
    // COST NOTE (ADVICE r13): constructing stream_* / store-roundtrip
    // queries executes full replays + scratch writes eagerly, so this
    // census runs dozens of end-to-end sf0.001 jobs just to read
    // schemas. Measured acceptable today; if CI time grows, swap the
    // eager names (EagerQueries + stream_*) to a declared-schema map
    // validated by their functional specs, keeping the census
    // exhaustive.
    // The driver's correctness harness loads both result sets into
    // pandas and sorts every column to hash rows; an ndarray/dict-valued
    // cell makes that sort throw (`unhashable type`), so the query's
    // oracle compare silently degrades to `err` instead of failing CI.
    // Canonical fix at the query site: serialize the collection as an
    // exact string (`concat_ws(";", col.cast("array<string>"))` — the
    // embedding / text_hashed_features precedent). This census walks
    // EVERY registry query's output schema so the next array-valued
    // query fails here, not in the driver.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    import TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(offenders.isEmpty,
      "harness-unhashable top-level columns (serialize them as " +
        s"strings):\n${offenders.mkString("\n")}")
  }
}
