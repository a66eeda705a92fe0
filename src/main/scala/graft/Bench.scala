package graft

import org.apache.spark.sql.SparkSession

/** Decision core of the bench outlier guard and its circuit breakers —
  * extracted from the sweep loop so BenchGuardSpec can pin the artifact-
  * always-parses property (the breakers firing) without a second Spark
  * session. One instance per sweep; mutable by design (the guard IS
  * sweep state).
  *
  * Per-query rule: a reading > K× its committed reference AND > 1 s over
  * it is an outlier — re-run (at most twice) and keep the min. Breakers,
  * both disclosed in the JSON:
  *  - global re-run budget: total extra seconds ≤ 10% of the committed
  *    reference total (floor 30 s) — scattered transients get weathered,
  *    the sweep never doubles;
  *  - host-stall mode: 3 CONSECUTIVE guarded queries tripping means the
  *    HOST is stalled, not the queries (the r16 artifact died this way:
  *    stall × re-runs × driver timeout = rc 124, no JSON at all) — stop
  *    re-running entirely and finish single-pass, so the artifact always
  *    exists and always parses. Only a guarded query reading normal
  *    breaks a streak; un-guarded (new this round) queries are blind. */
final class BenchGuard(refTimes: Map[String, Double], outlierK: Double) {
  val rerunBudgetSec: Double = math.max(30.0, 0.10 * refTimes.values.sum)
  var rerunSpentSec: Double = 0.0
  private var consecutiveTrips = 0
  var hostStall: Boolean = false

  def isOutlier(name: String, best: Double): Boolean =
    best > 0 && refTimes.get(name).exists(r =>
      best > outlierK * r && best - r > 1.0)

  /** May the sweep spend another re-run on this query right now? */
  def mayRerun(name: String, best: Double, reranSoFar: Int): Boolean =
    isOutlier(name, best) && reranSoFar < 2 && !hostStall &&
      rerunSpentSec < rerunBudgetSec

  def chargeRerun(sec: Double): Unit = rerunSpentSec += sec

  /** Called once per query AFTER its re-runs settle, with the PRE-rerun
    * tripped flag — drives the stall detector. */
  def queryDone(name: String, tripped: Boolean, ok: Boolean): Unit =
    if (tripped) {
      consecutiveTrips += 1
      if (consecutiveTrips >= 3) hostStall = true
    } else if (ok && refTimes.contains(name)) consecutiveTrips = 0
}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"value":...,"unit":"sec","queries":
  * {...},"sf":...}. A warmup action first absorbs session/JIT/codegen init
  * so per-query numbers measure the queries, not the JVM. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_BENCH_CONF: semicolon-separated key=value Spark confs
    // applied on top of the defaults — the scale-ladder A/B protocol's
    // regime switch (e.g. autoBroadcastJoinThreshold=-1 to measure the
    // cannot-broadcast regime a 100 TB dimension forces, or lowered AQE
    // skew thresholds so OptimizeSkewedJoin engages at rung scale).
    // Unset in driver runs: official numbers always use the defaults.
    val extraConf = sys.env.get("SPARK_GRAFT_BENCH_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        (k, v)
      }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extraConf.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder
      // session-wide graft surface: native functions + the GlobalRank/
      // GlobalScan rewrites, so textbook global windows plan distributed
      // without per-query registration
      .withExtensions(graft.functions.GraftExtensions.inject)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table + JIT the hot stacks once (flagship
    // pipeline, relational agg, and the text-hash/minhash pipeline — the
    // alphabetically-early dedup queries would otherwise absorb the
    // one-time compile cost of the whole hashing stack into their number)
    try {
      SparkEntry.queries("stock_count_pipeline")(spark, sfDir).count()
      SparkEntry.queries("rel_q1_lineitem_agg")(spark, sfDir).count()
      // covers shingles, from-shingles minhash, LSH banding, and the
      // candidate joins — the whole stack the dedup_* queries share
      SparkEntry.queries("dedup_jaccard_pairs")(spark, sfDir).count()
      // the *_x100 flagship queries run the typed TokenCountsAgg paths
      // (ticker AND word modes) that nothing above touches — without this
      // the alphabetically-first of them absorbs that stack's one-time
      // JIT/codegen cost into the baseline-comparable number (measured as
      // an 8x swing on stock_count_x100 in round 4)
      SparkEntry.queries("stock_count_x100")(spark, sfDir).count()
      SparkEntry.queries("word_count_x100")(spark, sfDir).count()
    } catch { case _: Throwable => () }

    // dev knobs (unset in driver runs): SPARK_GRAFT_BENCH_ONLY narrows the
    // sweep to a comma-separated query list, SPARK_GRAFT_BENCH_REPEAT times
    // each query N times (min reported — isolates steady-state cost from
    // run-to-run variance). Default is 2: with a single run, a GC pause or
    // page-cache eviction reads as a phantom multi-x regression (seen twice
    // in official runs; every one vanished under repeats).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEAT", "2").toInt

    // Host-stall guard: two official runs have carried 50x+ phantom
    // readings from a single sustained host transient (one survived
    // min-of-2 because the stall spanned both repeats). Against the last
    // COMMITTED reference at the SAME sf dir (BENCH_FULL.json by
    // default, overridable via SPARK_GRAFT_BENCH_REF), any query reading
    // > K× its committed time (and > 1 s over it — tiny queries jitter
    // in ratios) is automatically re-run in-session and the min kept;
    // the JSON flags every such query in "reruns" so a reader can
    // distinguish a measured regression from a weathered transient. A
    // missing/mismatched-sf reference disables the guard (rung sweeps at
    // ×10/×30 pass their own reference via the env).
    val outlierK =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUTLIER_K", "5.0").toDouble
    val refPath = sys.env.get("SPARK_GRAFT_BENCH_REF").orElse {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      if (java.nio.file.Files.exists(p)) Some(p.toString) else None
    }
    val refTimes: Map[String, Double] = refPath.flatMap { p =>
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p)), java.nio.charset.StandardCharsets.UTF_8)
        val node = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(txt)
        if (node.path("sf").asText() != sfDir) None
        else {
          import scala.jdk.CollectionConverters._
          Some(node.path("queries").fields().asScala
            .map(e => e.getKey -> e.getValue.asDouble())
            .filter(_._2 > 0).toMap)
        }
      } catch { case _: Throwable => None }
    }.getOrElse(Map.empty)
    // guard + circuit breakers (see BenchGuard above — the r16 artifact
    // was lost to re-runs multiplying under a sustained host stall)
    val guard = new BenchGuard(refTimes, outlierK)
    val rerunsByQuery =
      scala.collection.mutable.LinkedHashMap.empty[String, (Int, Double)]
    // SPARK_GRAFT_BENCH_EXPLAIN=1 dumps each selected query's formatted
    // physical plan to stderr before timing — used by the scale-ladder
    // adjudication protocol to check e.g. broadcast-vs-shuffle flips
    // across rungs without a separate driver program.
    // SPARK_GRAFT_BENCH_EXPLAIN=final EXECUTES the query once first and
    // dumps the ADAPTIVE final plan — the only place AQE's runtime
    // decisions (OptimizeSkewedJoin's skew=true markers, coalesced
    // partition counts) are visible; the static plan only shows
    // isFinalPlan=false. Used by the skew-rung A/B protocol.
    val explainEnv = sys.env.get("SPARK_GRAFT_BENCH_EXPLAIN")
    val explainFinal = explainEnv.contains("final")
    val explain = explainEnv.contains("1") || explainFinal

    // SPARK_GRAFT_BENCH_SPILL=1 (unset in driver runs): register a
    // task-metrics listener and report per-query shuffle/sort/agg SPILL
    // bytes as an extra "spill_bytes" JSON field — the memory-pressure
    // ladder's evidence that a heavy query under a deliberately small
    // heap COMPLETES by spilling (the 100 TB behavior: executors never
    // size to the data) rather than OOMing. Listener delivery is
    // asynchronous, so per-query attribution is exact only when the
    // process runs ONE query (SPARK_GRAFT_BENCH_ONLY solo protocol);
    // in a full sweep adjacent queries can trade a task's attribution.
    val spillOn = sys.env.get("SPARK_GRAFT_BENCH_SPILL").contains("1")
    val spillMem = new java.util.concurrent.atomic.AtomicLong
    val spillDisk = new java.util.concurrent.atomic.AtomicLong
    if (spillOn) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    val spillByQuery =
      scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]

    // sweep-order randomization: the one residual class the per-query
    // guard cannot adjudicate is adjacent-query context (page cache, GC
    // debt) — a query can read slow in a sweep and fast solo without
    // either number being wrong. A per-sweep seeded shuffle decorrelates
    // neighbor effects across rounds, so a residual that persists across
    // orders is attributable to the query, not its neighbors. The seed
    // is recorded in the JSON; SPARK_GRAFT_BENCH_ORDER_SEED pins it
    // (0 = legacy alphabetical, for explicit order A/B comparisons).
    val orderSeed = sys.env.get("SPARK_GRAFT_BENCH_ORDER_SEED")
      .map(_.toLong).getOrElse(System.currentTimeMillis())
    val alphabetical = SparkEntry.queries.toSeq.sortBy(_._1)
    val swept =
      if (orderSeed == 0L) alphabetical
      else new scala.util.Random(orderSeed).shuffle(alphabetical)

    // noop sink: forces full evaluation of every output column (a count()
    // would let Catalyst prune projection-only work and under-measure)
    // failed queries report -1, never their time-to-failure (a crash after
    // 0.1s must not read as a 0.1s result)
    val results = swept
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        if (explain) {
          try {
            val df = fn(spark, sfDir)
            // a `write` would execute a SEPARATE QueryExecution and
            // leave this one unfinalized (isFinalPlan=false); running
            // the df's own toRdd is what finalizes ITS adaptive plan
            if (explainFinal)
              df.queryExecution.toRdd.foreachPartition(_ => ())
            System.err.println(s"=== explain $name ===\n" +
              df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] explain $name failed: ${e.getMessage}") }
        }
        val (m0, d0) = (spillMem.get(), spillDisk.get())
        val times = (1 to repeat).map { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        // storage hygiene between queries: localCheckpoint blocks from
        // iterative queries persist until GC — across a 360+-query
        // sweep in one JVM they accumulate into heap pressure (the ×30
        // rung OOM'd mid-sweep at 8 GiB without this). Each query is
        // measured against a clean storage pool, as it would run alone.
        // HAZARD: unpersisting a localCheckpointed RDD truncates its
        // lineage permanently — it can never be recomputed. Safe here
        // only because every registry query builds its frames per
        // invocation; a future cross-query memoized checkpointed frame
        // would fail far from this line with a missing-checkpoint-block
        // error. If such a cache is ever added, restrict this sweep to
        // RDD ids that first appeared during the current query's loop.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        if (spillOn)
          spillByQuery(name) =
            (spillMem.get() - m0, spillDisk.get() - d0)
        var best = if (times.contains(-1.0)) -1.0 else times.min
        // the stall guard: re-measure (at most twice) when the reading is
        // an outlier against the committed reference at this sf — unless
        // a circuit breaker has tripped (see BenchGuard)
        val raw = best // pre-rerun reading: published so a reader can see
                       // the MAGNITUDE that was weathered, not just that
                       // a re-run happened
        val tripped = guard.isOutlier(name, best)
        var reran = 0
        while (guard.mayRerun(name, best, reran)) {
          reran += 1
          System.err.println(f"[bench] $name%s read $best%.2fs vs " +
            f"committed ${refTimes(name)}%.2fs — outlier re-run $reran")
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            best = math.min(best, (System.nanoTime() - t0) / 1e9)
          } catch { case _: Throwable => () }
          guard.chargeRerun((System.nanoTime() - t0) / 1e9)
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
        val wasStalled = guard.hostStall
        guard.queryDone(name, tripped, ok = best > 0)
        if (guard.hostStall && !wasStalled)
          System.err.println("[bench] 3 consecutive outlier queries — " +
            "host stall: disabling re-runs, finishing single-pass")
        if (reran > 0) rerunsByQuery(name) = (reran, raw)
        name -> best
      }
    // the JSON stays alphabetical regardless of sweep order — diffs
    // between round artifacts line up key-by-key
    val qs = results.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val rm = results.toMap
    // baseline_comparable: the *_x100 queries run the full reference
    // pipelines on 100x-replicated document lines; at sf0.1 that is ~500k
    // rows — the scale of BASELINE.md's 486,634-row input (23 s / 22 s)
    val cmp = s"""{"stock_count_x100_sec":${rm.getOrElse("stock_count_x100", -1.0)},""" +
      s""""word_count_x100_sec":${rm.getOrElse("word_count_x100", -1.0)}}"""
    val spillField =
      if (spillByQuery.isEmpty) ""
      else spillByQuery.map { case (k, (m, d)) =>
        "\"" + k + "\":{\"mem\":" + m + ",\"disk\":" + d + "}"
      }.mkString(""","spill_bytes":{""", ",", "}")
    // measurement provenance: repeats per query, which queries tripped
    // the outlier guard (and how many extra runs), and the reference the
    // guard compared against — so a reader of the round artifact can
    // tell a weathered host stall from a real regression
    val rerunField =
      if (rerunsByQuery.isEmpty) ""
      else rerunsByQuery.map { case (k, (n, raw)) =>
        "\"" + k + "\":{\"n\":" + n + ",\"raw\":" + raw + "}"
      }.mkString(""","reruns":{""", ",", "}")
    val refField = refTimes.headOption.map(_ =>
      s""","outlier_ref":"${refPath.get}","outlier_k":$outlierK""" +
        s""","rerun_budget_sec":${guard.rerunBudgetSec}""")
      .getOrElse("")
    val stallField = if (guard.hostStall) ""","host_stall":true""" else ""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","repeat":$repeat,"order_seed":$orderSeed,"queries":$qs,"baseline_comparable":$cmp$spillField$rerunField$refField$stallField,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line to a file: the driver's BENCH_r0N.json
    // captures only a bounded stdout tail, which truncates the per-query
    // map once the registry grew past ~60 queries — the file is the
    // complete record (committed per round as BENCH_FULL.json).
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json"))
    Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
