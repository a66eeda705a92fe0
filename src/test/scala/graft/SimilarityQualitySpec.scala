package graft

import graft.ops.{Quality, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilarityQualitySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("cosine similarity on known vectors") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)),
      (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
      round(Similarity.cosine(col("embedding"), array(lit(1.0), lit(0.0))), 9)
        .as("c")).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.0, 3L -> 1.0, 4L -> -1.0))
  }

  test("knn returns top-k by cosine with id tiebreak") {
    val df = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(2f, 0f)),
      (4L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val got = Similarity.knn(df, col("embedding"), col("vec_id"),
      Seq(1.0, 0.0), 2).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 3L)) // both cos=1.0, id ascending
  }

  test("centroids computes element-wise means per group") {
    val df = Seq(("a", Seq(1f, 3f)), ("a", Seq(3f, 5f)), ("b", Seq(0f, 2f)))
      .toDF("label", "embedding")
    val got = Similarity.centroids(df, col("embedding"), col("label"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("a") == Seq(2.0, 4.0) && got("b") == Seq(0.0, 2.0))
  }

  test("vecMean equals the declarative posexplode+avg on fractional data") {
    // fractional values + several partitions: the native partial+final
    // buffer path must agree with avg per (group, position) to 1e-9
    val rows = (0 until 97).map(i =>
      (s"g${i % 3}", Seq.tabulate(5)(d => (i * 31 + d * 7 + 1) / 9.0f)))
    val df = rows.toDF("label", "embedding").repartition(7)
    val native = Similarity.centroids(df, col("embedding"), col("label"))
      .as[(String, Seq[Double])].collect().toMap
    val declared = df
      .select(col("label"), posexplode(col("embedding").cast("array<double>"))
        .as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label").agg(sort_array(collect_list(struct(col("pos"),
        col("m")))).as("s"))
      .select(col("label"), expr("transform(s, e -> e.m)").as("c"))
      .as[(String, Seq[Double])].collect().toMap
    assert(native.keySet == declared.keySet)
    for (k <- native.keySet; (a, b) <- native(k).zip(declared(k)))
      assert(math.abs(a - b) < 1e-9, s"group $k: $a vs $b")
  }

  test("vecMean skips null vectors and fails loudly on length mismatch") {
    val df = Seq((1L, Seq(2f, 4f)), (2L, null.asInstanceOf[Seq[Float]]),
      (3L, Seq(4f, 8f))).toDF("id", "embedding")
    val got = Similarity.centroids(df, col("embedding"), lit("all"))
      .as[(String, Seq[Double])].collect().toMap
    assert(got("all") == Seq(3.0, 6.0)) // null row not counted in n
    val bad = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("embedding")
    val e = intercept[Exception] {
      Similarity.centroids(bad, col("embedding"), lit("all")).collect()
    }
    assert(e.getMessage != null)
  }

  test("nearDupPairsBlocked only compares within blocks, id1 < id2") {
    val df = Seq((1L, "x", Seq(1f, 0f)), (2L, "x", Seq(1f, 0f)),
      (3L, "y", Seq(1f, 0f))).toDF("vec_id", "label", "embedding")
    val got = Similarity.nearDupPairsBlocked(df, col("embedding"),
      col("vec_id"), col("label"), 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L))) // (x,y) cross-block pair excluded
  }

  test("maxBlock cap bounds block pair fan-out while keeping near-dup " +
    "recall") {
    // one giant block of 200 vectors = 50 tight clusters x 4 near-identical
    // members (deterministic tiny perturbations, pairwise cos ~ 0.9999) —
    // the degenerate fixed-cardinality-blocking shape the cap exists for
    val dims = 16
    // decorrelated pseudo-random cluster centers (integer LCG hash — a
    // smooth function of (c, d) like sin(a*c + b*d) makes distinct
    // clusters collide whenever a*Δc wraps near 2πk)
    def base(c: Int)(d: Int): Float =
      (((c * 2654435761L + d * 97531L + 12345L) % 2000L) / 1000.0f) - 1f
    val rows = for (c <- 0 until 50; m <- 0 until 4) yield
      (c * 4L + m, Seq.tabulate(dims)(d =>
        base(c)(d) + 0.001f * math.sin(c * 7 + m * 3 + d).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    def pairs(cap: Int) = Similarity.nearDupPairsBlocked(df,
      col("embedding"), col("vec_id"), lit("all"), minCos = -2.0,
      maxBlock = cap, dims = dims)
      .select(col("id1"), col("id2"), col("cos"))
      .as[(Long, Long, Double)].collect()
    val uncapped = pairs(Int.MaxValue)
    val capped = pairs(40) // b=200, s=5 -> e=3 -> 8 LSH sub-buckets
    assert(uncapped.length == 200 * 199 / 2)
    // the quadratic is actually cut: candidate volume shrinks ~8x
    assert(capped.length < uncapped.length / 3,
      s"cap did not reduce pair volume: ${capped.length}")
    // ...but the REFINEMENT split (extra sign planes, not a random salt)
    // keeps near-identical vectors co-bucketed: recall on the true
    // within-cluster near-dup pairs stays high
    val trueDups = (for (c <- 0 until 50; i <- 0 until 4; j <- i + 1 until 4)
      yield (c * 4L + i, c * 4L + j)).toSet
    assert(trueDups.size == 300) // 50 clusters x C(4,2)
    // sanity: the fixture is what it claims — every within-cluster pair
    // really is near-identical in the uncapped exact result
    assert(uncapped.filter(p => trueDups((p._1, p._2)))
      .forall(_._3 >= 0.999))
    val kept = capped.map(p => (p._1, p._2)).toSet.intersect(trueDups)
    val recall = kept.size.toDouble / trueDups.size
    assert(recall >= 0.9, s"near-dup recall under the cap: $recall")
  }

  test("maxBlock cap hard-bounds a colinear block the hyperplanes cannot " +
    "split (md5-salt second level)") {
    // 100 IDENTICAL vectors: every refinement plane assigns the same sign
    // bits, so level 1 cannot split — the md5 salt level must bound the
    // join anyway (this is exact-dup territory; losing cross-salt pairs
    // there is the documented trade)
    val df = (0 until 100).map(i => (i.toLong, Seq.fill(8)(1.0f)))
      .toDF("vec_id", "embedding")
    val capped = Similarity.nearDupPairsBlocked(df, col("embedding"),
      col("vec_id"), lit("all"), minCos = -2.0, maxBlock = 10, dims = 8)
      .collect()
    assert(capped.nonEmpty)
    // 5 salts (hard bound = 2 x cap = 20/salt) over 100 rows ->
    // ~5 x C(20,2) = 950 pairs, vs 4950 uncapped
    assert(capped.length < 1200,
      s"salt level failed to bound the colinear block: ${capped.length}")
  }

  test("multiProbeSearch probes exactly the base + flipped buckets and " +
    "ranks candidates like brute force") {
    val dims = 8
    // query + 60 deterministic perturbations of it: small enough to stay
    // near-duplicates, large enough that several cross the low-margin
    // hyperplanes into adjacent buckets
    val qv = Seq.tabulate(dims)(d => math.sin(d * 5 + 1))
    val rows = (1 to 60).map { i =>
      (i.toLong, Seq.tabulate(dims)(d =>
        (qv(d) + 0.5 * math.sin(i * 13 + d * 7)).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    // Scala-side model of the probe set (same LCG weights)
    val dots = Similarity.lshPlaneDots(qv, dims, 8)
    val base = dots.zipWithIndex
      .map { case (d, p) => if (d > 0) 1L << p else 0L }.sum
    val flips = dots.zipWithIndex
      .sortBy { case (d, p) => (math.abs(d), p) }.take(3).map(_._2)
    val probeSet = (base +: flips.map(p => base ^ (1L << p))).toSet
    def bucketOf(v: Seq[Float]): Long =
      Similarity.lshPlaneDots(v.map(_.toDouble), dims, 8).zipWithIndex
        .map { case (d, p) => if (d > 0) 1L << p else 0L }.sum
    val expected = rows.filter(r => probeSet(bucketOf(r._2))).map(_._1).toSet
    val inBase = rows.filter(r => bucketOf(r._2) == base).map(_._1).toSet
    // the fixture actually exercises the probes: some neighbors sit in
    // flipped buckets, none of this is vacuous
    assert(inBase.nonEmpty && (expected -- inBase).nonEmpty)
    val got = Similarity.multiProbeSearch(df, col("embedding"),
      col("vec_id"), qv, dims, k = 60)
      .as[(Long, Double)].collect()
    assert(got.map(_._1).toSet == expected)
    // ranking agrees with brute-force knn restricted to the candidates
    val brute = Similarity.knn(df, col("embedding"), col("vec_id"), qv, 60)
      .as[(Long, Double)].collect().filter(r => expected(r._1))
    assert(got.toSeq == brute.toSeq)
    // plan: one scan + filter + distributed top-k, no join, no shuffle
    // beyond the TakeOrderedAndProject
    val plan = Similarity.multiProbeSearch(df, col("embedding"),
      col("vec_id"), qv, dims, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("tokenCount handles blanks and runs of whitespace") {
    val got = Seq("", "   ", "one", " one  two\tthree ").toDF("t")
      .select(Quality.tokenCount(col("t"))).as[Long].collect().toSeq
    assert(got == Seq(0L, 0L, 1L, 3L))
  }

  test("ratios on a known sentence") {
    val t = "the cat sat on the mat!!"
    val Seq((sw, punct, uniq)) = Seq(t).toDF("t").select(
      Quality.stopwordRatio(col("t")), Quality.punctRatio(col("t")),
      Quality.uniqueRatio(col("t"))).as[(Double, Double, Double)]
      .collect().toSeq
    // tokens: the cat sat on the mat -> 6; stop: the,on,the -> 3
    assert(sw == 0.5)
    assert(punct == 2.0 / 24.0)
    assert(uniq == 5.0 / 6.0)
  }

  test("langId picks the marker-dominant language, unknown when none") {
    val got = Seq(
      "the cat and the dog of the house",
      "el gato y la casa de los perros que corren",
      "zzz qqq xxx www").toDF("t")
      .select(Quality.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "unknown"))
  }

  test("emb_mrl_recall: overlap of the two exact top-10 sets, " +
      "recall in tenths") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("emb_mrl_recall")(spark, sf).collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("recall")).toMap
    assert(rows.keySet == (0L until 20L).toSet)
    rows.values.foreach { r =>
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs(r * 10 - math.round(r * 10)) < 1e-9,
        "recall@10 must be a multiple of 0.1")
    }
    // brute-force qid=0 on the collected fixture: both top-10 lists
    // under (round-6 cosine DESC, vec_id ASC), overlap/10
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      BigDecimal(d / (math.sqrt(aa) * math.sqrt(bb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val q = all(0L)
    def top10(dims: Int): Set[Long] = all.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v.take(dims), q.take(dims))) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val expect = (top10(64) & top10(16)).size / 10.0
    assert(math.abs(rows(0L) - expect) < 1e-9,
      s"recall ${rows(0L)} != brute $expect")
  }

  test("emb_ivf_nprobe_curve: recall and candidate cost are monotone " +
      "in nprobe, and the exhaustive rung is exact") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("emb_ivf_nprobe_curve")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_overlap"), r.getAs[Double]("recall_at_10")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 4L, 10L))
    // cost rises with probes; recall never falls (the curve an ANN
    // deployment tunes against must be well-ordered)
    assert(rows.sliding(2).forall(p =>
      p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3), rows.mkString("; "))
    // nprobe = 10 probes every cell: identical to brute force, so
    // recall@10 is exactly 1.0 and every vector is a candidate
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(rows.last._2 == n && rows.last._4 == 1.0, rows.last.toString)
    rows.foreach { case (_, _, ov, r) =>
      assert(ov >= 0 && ov <= 10 && math.abs(r - ov / 10.0) < 1e-9)
    }
  }

  test("emb_ivfpq_search: the composition's recall/cost point sits on " +
      "the ANN trade-off curve — exact-scored cost below IVF-raw below " +
      "exhaustive, recall never above the stage it adds loss to") {
    val sf = "/root/testdata/sf0.001"
    // exact ground truth: brute-force top-10
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val qvec = emb.where(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    val exactTop = Similarity.knn(emb, col("embedding"), col("vec_id"),
      qvec, 10).collect().map(_.getLong(0)).toSet
    // IVF-raw at the same nprobe=3 (emb_ivf_search's plan)
    val ivfTop = SparkEntry.queries("emb_ivf_search")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // the composition
    val ivfpqRows = SparkEntry.queries("emb_ivfpq_search")(spark, sf)
      .collect()
    val ivfpqTop = ivfpqRows.map(_.getLong(0)).toSet
    assert(ivfpqRows.length == 10)
    def recall(s: Set[Long]): Double = (s & exactTop).size / 10.0
    // recall ordering: exhaustive = 1.0 >= IVF-raw >= IVF×PQ (each stage
    // can only lose candidates: PQ's shortlist is a subset of the probed
    // cells' population, which is a subset of everything)
    assert(recall(exactTop) == 1.0)
    assert(recall(ivfpqTop) <= recall(ivfTop) + 1e-9,
      s"composition recall ${recall(ivfpqTop)} above IVF-raw ${recall(ivfTop)}")
    // and the composition must still be USEFUL — it keeps at least half
    // of IVF-raw's recall (measured here: IVF-raw 0.5, composition 0.4 —
    // the PQ shortlist drops one true neighbor; a collapse to ~0 would
    // mean the ADC tables or the shortlist wiring are broken, not lossy)
    assert(recall(ivfpqTop) >= recall(ivfTop) / 2 && recall(ivfpqTop) > 0,
      s"recall collapsed: ${recall(ivfpqTop)} vs IVF-raw ${recall(ivfTop)}")
    // cost ordering (exact-arithmetic vector scorings per query):
    // exhaustive scores N raw vectors, IVF-raw scores the probed cells'
    // population, the composition exactly re-ranks only its shortlist
    val n = emb.count()
    val probedPop = SparkEntry.queries("emb_ivf_nprobe_curve")(spark, sf)
      .where(col("nprobe") === 4).head().getAs[Long]("n_candidates")
    // nprobe=3's population is below nprobe=4's rung (monotone curve)
    assert(50L < probedPop && probedPop < n,
      s"cost ordering broken: 50 < $probedPop < $n expected")
    // the PQ stage scored only probed-cell candidates, never N; its
    // output shortlist is what got exact-scored — 50 rows by construction
    val adcVals = ivfpqRows.map(_.getDouble(1))
    assert(adcVals.forall(_ >= 0.0), "ADC distances must be non-negative")
  }

  test("emb_hamming_recall: qid=0 matches a brute-force sign-code " +
      "hamming ranking, recall in tenths") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("emb_hamming_recall")(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("qid") -> r.getAs[Double]("recall")).toMap
    assert(rows.keySet == (0L until 20L).toSet)
    rows.values.foreach { r =>
      assert(r >= 0.0 && r <= 1.0)
      assert(math.abs(r * 10 - math.round(r * 10)) < 1e-9)
    }
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      BigDecimal(d / (math.sqrt(aa) * math.sqrt(bb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def ham(a: Array[Double], b: Array[Double]): Int =
      a.indices.count(i => (a(i) > 0) != (b(i) > 0))
    val q = all(0L)
    val others = all.toSeq.filter(_._1 != 0L)
    val topCos = others.map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val topHam = others.map { case (id, v) => (id, ham(v, q)) }
      .sortBy { case (id, h) => (h, id) }.take(10).map(_._1).toSet
    val expect = (topCos & topHam).size / 10.0
    assert(math.abs(rows(0L) - expect) < 1e-9,
      s"recall ${rows(0L)} != brute $expect")
  }
}
