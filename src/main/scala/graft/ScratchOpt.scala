package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for optimization experiments (not part of the
  * driver contract; deleted or inert in driver runs). Times named
  * variants of a query body against the same session/dir. */
object ScratchOpt {
  def time[A](name: String, reps: Int = 3)(body: => DataFrame): Unit = {
    var best = Double.MaxValue
    for (_ <- 1 to reps) {
      val t = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t) / 1e9
      best = math.min(best, sec)
    }
    println(f"[scratch] $name%-40s best=${best}%7.3fs")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(graft.functions.GraftExtensions.inject)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val which = args.headOption.getOrElse("ssjoin")
    Scratches.run(spark, sfDir, which)
    spark.stop()
  }
}

object Scratches {
  import ScratchOpt.time

  def run(spark: SparkSession, dir: String, which: String): Unit =
    which match {
      case "ssjoin" => ssjoin(spark, dir)
      case "edit" => edit(spark, dir)
      case "boot" => boot(spark, dir)
      case "edit2" => edit2(spark, dir)
      case other => println(s"unknown scratch: $other")
    }

  def boot(s: SparkSession, dir: String): Unit = {
    time("A_current") {
      graft.SparkEntry.queries("rel_bootstrap_ci")(s, dir)
    }
    // explode-free: per-row array of 20 replica weights, one zip_with
    // array-sum aggregate
    time("B_arrayfold") {
      val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      def pois(u: org.apache.spark.sql.Column) =
        when(u < 0.36787944117144233, 0L)
          .when(u < 0.7357588823428847, 1L)
          .when(u < 0.9196986029286058, 2L)
          .when(u < 0.9810118431238462, 3L)
          .when(u < 0.9963401531726563, 4L)
          .when(u < 0.9994058151824183, 5L).otherwise(6L)
      val BootP = graft.SparkEntry.BootP
      val bootMix = graft.SparkEntry.bootMix
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val withW = o
        .select(col("cents"),
          (conv(substring(md5(col("o_orderkey").cast("string")), 1, 8),
            16, 10).cast("long") % BootP).as("x"))
        .select(
          array(bootMix.map { case (_, a, c) =>
            val w = pois(((lit(a) * col("x") + lit(c)) % BootP)
              .cast("double") / lit(BootP.toDouble))
            struct(d38(w * col("cents")).as("wc"), w.as("w"))
          }: _*).as("arr"))
      val sums = withW.agg(
        bootMix.map { case (b, _, _) =>
          sum(col("arr").getItem(b.toInt).getField("wc")).as(s"swc_$b")
        }.head,
        (bootMix.map { case (b, _, _) =>
          sum(col("arr").getItem(b.toInt).getField("wc")).as(s"swc_$b")
        }.tail ++ bootMix.map { case (b, _, _) =>
          sum(col("arr").getItem(b.toInt).getField("w")).as(s"sw_$b")
        }): _*)
      val means = sums.select(array(bootMix.map { case (b, _, _) =>
        col(s"swc_$b").cast("double") / col(s"sw_$b").cast("double")
      }: _*).as("msRaw"))
        .select(sort_array(col("msRaw")).as("ms"))
      val point = o.agg(
        (sum(d38(col("cents"))).cast("double") /
          count(lit(1)).cast("double")).as("mean_cents"))
      point.crossJoin(broadcast(means))
        .select(round(col("mean_cents"), 6).as("mean_cents"),
          round(element_at(col("ms"), 2), 6).as("boot_lo"),
          round(element_at(col("ms"), 19), 6).as("boot_hi"),
          size(col("ms")).cast("long").as("n_replicas"))
    }
  }

  def edit(s: SparkSession, dir: String): Unit = {
    def names = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_name").as("name")).distinct()

    time("A_current") {
      graft.ops.FrequentItems.editDistance1Pairs(names)
    }
    time("B_names_only") { names }
    time("C_sigs_only") {
      names.select(col("name"), explode(array_distinct(concat(
        array(col("name")),
        transform(sequence(lit(1), length(col("name"))), i =>
          concat(col("name").substr(lit(1), i - lit(1)),
            col("name").substr(i + lit(1), length(col("name")))))))).as("sig"))
    }
    // hash the signature to a long immediately — join and broadcast carry
    // 8-byte keys; collisions only ADD candidates, which the exact
    // levenshtein verify rejects, so the result set is unchanged
    time("D_hashed_sig") {
      val sigs = names.select(col("name"), explode(array_distinct(transform(
        sequence(lit(0), length(col("name"))), i =>
          xxhash64(concat(col("name").substr(lit(1), i - lit(1)),
            when(i === 0, col("name"))
              .otherwise(col("name").substr(i + lit(1),
                length(col("name"))))))))).as("sig"))
        .localCheckpoint(false)
      sigs.as("a")
        .join(sigs.as("b"),
          col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
          levenshtein(col("a.name"), col("b.name"), 1).cast("long")
            .as("dist"))
        .where(col("dist") >= 0)
        .distinct()
    }
  }

  def edit2(s: SparkSession, dir: String): Unit = {
    def names = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_name").as("name")).distinct()
    def sigs = names.select(col("name"), explode(array_distinct(concat(
      array(col("name")),
      transform(sequence(lit(1), length(col("name"))), i =>
        concat(col("name").substr(lit(1), i - lit(1)),
          col("name").substr(i + lit(1), length(col("name")))))))).as("sig"))
      .localCheckpoint(false)

    time("E_join_no_lev") {
      val sg = sigs
      sg.as("a")
        .join(sg.as("b"),
          col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
        .groupBy().agg(count(lit(1)).as("n"))
    }
    time("F_join_lev_nodistinct") {
      val sg = sigs
      sg.as("a")
        .join(sg.as("b"),
          col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
          levenshtein(col("a.name"), col("b.name"), 1).cast("long")
            .as("dist"))
        .where(col("dist") >= 0)
        .groupBy().agg(count(lit(1)).as("n"))
    }
    time("H_positional") {
      val sg = names
        .select(col("name"),
          expr("""transform(sequence(1, length(name)),
                 |  i -> concat(substr(name, 1, i-1), substr(name, i+1)))
                 |""".stripMargin).as("ds"))
        .select(col("name"), explode(concat(
          array(struct(col("name").as("sig"),
            array(lit(0)).as("ps"))),
          expr("""transform(array_distinct(ds),
                 |  s -> struct(s AS sig,
                 |    filter(sequence(1, size(ds)),
                 |           i -> element_at(ds, i) = s) AS ps))
                 |""".stripMargin))).as("e"))
        .select(col("name"), col("e.sig").as("sig"), col("e.ps").as("ps"))
        .localCheckpoint(false)
      sg.as("a")
        .join(sg.as("b"),
          col("a.sig") === col("b.sig") && col("a.name") < col("b.name") &&
            (length(col("a.name")) =!= length(col("b.name")) ||
              arrays_overlap(col("a.ps"), col("b.ps"))))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
          lit(1L).as("dist"))
        .distinct()
    }
    time("G_lev_after_join") {
      val sg = sigs
      sg.as("a")
        .join(sg.as("b"),
          col("a.sig") === col("b.sig") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b"), 1).cast("long")
            .as("dist"))
        .where(col("dist") >= 0 && spark_partition_id() >= 0)
    }
  }

  def ssjoin(s: SparkSession, dir: String): Unit = {
    def sets = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        array_distinct(
          graft.functions.GraftFunctions.shingles(s, col("text"))).as("sh"))
      .localCheckpoint(false)

    // current
    time("A_current") {
      graft.ops.Dedup.exactSimilarityPairs(sets, 0.6)
    }

    // candidate-generation alone (current shape)
    val t = 0.6
    def candOf(sets: DataFrame): DataFrame = {
      val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val freq = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
      val sorted = ex.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("shingle")))),
          x => x.getField("shingle")).as("ssh"))
      val pref = sorted.select(col("doc_id"), size(col("ssh")).as("n"),
        explode(slice(col("ssh"), lit(1),
          (size(col("ssh")) - ceil(size(col("ssh")) * t) + 1).cast("int")))
          .as("shingle"))
        .localCheckpoint(false)
      pref.as("a")
        .join(pref.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("b.n") >= ceil(col("a.n") * t) &&
            col("a.n") >= ceil(col("b.n") * t))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
    }
    time("B_cand_only") { candOf(sets) }

    // dictionary-encoded: map each shingle to a dense long id (row_number
    // over the freq table ordered by shingle — injective, so intersection
    // counts and set sizes are EXACTLY preserved), then candidates and
    // verify run over long keys/arrays instead of strings
    time("D_dict_encoded") {
      val ss = sets
      val ex = ss.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("shingle"))
      val dict = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .select(col("shingle"), col("df"),
          row_number().over(w).cast("long").as("sid"))
      val exid = ex.join(dict, "shingle")
        .select(col("doc_id"), col("sid"), col("df"))
        .localCheckpoint(false)
      val sorted = exid
        .groupBy("doc_id")
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("sid")))),
          x => x.getField("sid")).as("ssh"))
        .localCheckpoint(false)
      val pref = sorted.select(col("doc_id"), size(col("ssh")).as("n"),
        explode(slice(col("ssh"), lit(1),
          (size(col("ssh")) - ceil(size(col("ssh")) * t) + 1).cast("int")))
          .as("sid"))
      val cand = pref.as("a")
        .join(pref.as("b"),
          col("a.sid") === col("b.sid") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("b.n") >= ceil(col("a.n") * t) &&
            col("a.n") >= ceil(col("b.n") * t))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(sorted.select(col("doc_id").as("id1"), col("ssh").as("sh1")),
          "id1")
        .join(sorted.select(col("doc_id").as("id2"), col("ssh").as("sh2")),
          "id2")
        .select(col("id1"), col("id2"),
          size(array_intersect(col("sh1"), col("sh2"))).cast("double")
            .as("inter"),
          (size(col("sh1")) + size(col("sh2"))).cast("double").as("tot"))
        .select(col("id1"), col("id2"),
          (col("inter") / (col("tot") - col("inter"))).as("raw"))
        .where(col("raw") >= t)
        .select(col("id1"), col("id2"), round(col("raw"), 6).as("jaccard"))
    }

    // E = D + PPJoin positional upper-bound filter on candidates and no
    // exid checkpoint
    time("E_dict_positional") {
      val ss = sets
      val ex = ss.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("shingle"))
      val dict = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
        .select(col("shingle"), col("df"),
          row_number().over(w).cast("long").as("sid"))
      val exid = ex.join(dict, "shingle")
        .select(col("doc_id"), col("sid"), col("df"))
      val sorted = exid
        .groupBy("doc_id")
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("sid")))),
          x => x.getField("sid")).as("ssh"))
        .localCheckpoint(false)
      val pref = sorted.select(col("doc_id"), size(col("ssh")).as("n"),
        posexplode(slice(col("ssh"), lit(1),
          (size(col("ssh")) - ceil(size(col("ssh")) * t) + 1).cast("int"))))
        .select(col("doc_id"), col("n"), (col("pos") + 1).as("p"),
          col("col").as("sid"))
      val cand = pref.as("a")
        .join(pref.as("b"),
          col("a.sid") === col("b.sid") &&
            col("a.doc_id") < col("b.doc_id") &&
            col("b.n") >= ceil(col("a.n") * t) &&
            col("a.n") >= ceil(col("b.n") * t) &&
            (least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) +
              lit(1)) >=
              ceil(lit(t) / (1 + t) * (col("a.n") + col("b.n"))))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(sorted.select(col("doc_id").as("id1"), col("ssh").as("sh1")),
          "id1")
        .join(sorted.select(col("doc_id").as("id2"), col("ssh").as("sh2")),
          "id2")
        .select(col("id1"), col("id2"),
          size(array_intersect(col("sh1"), col("sh2"))).cast("double")
            .as("inter"),
          (size(col("sh1")) + size(col("sh2"))).cast("double").as("tot"))
        .select(col("id1"), col("id2"),
          (col("inter") / (col("tot") - col("inter"))).as("raw"))
        .where(col("raw") >= t)
        .select(col("id1"), col("id2"), round(col("raw"), 6).as("jaccard"))
    }

    // barrier verify: intersect computed once per candidate in a Project
    // the filter cannot be pushed below (nondet guard)
    time("C_barrier_verify") {
      val ss = sets
      val cand = candOf(ss)
      cand
        .join(ss.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
        .join(ss.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
        .select(col("id1"), col("id2"),
          size(array_intersect(col("sh1"), col("sh2"))).cast("double")
            .as("inter"),
          (size(col("sh1")) + size(col("sh2"))).cast("double").as("tot"))
        .select(col("id1"), col("id2"),
          (col("inter") / (col("tot") - col("inter"))).as("raw"))
        .where(col("raw") >= t && spark_partition_id() >= 0)
        .select(col("id1"), col("id2"), round(col("raw"), 6).as("jaccard"))
    }
  }
}
