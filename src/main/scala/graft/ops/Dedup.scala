package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Everything here is pure built-in Catalyst expressions (codegen'd, no
  * UDFs) and — deliberately — *portable* hashing: MD5 hex strings compared
  * lexicographically, so the same logic is expressible in any ANSI-ish SQL
  * engine for oracle checking. (Spark's `hash`/`xxhash64` are faster but
  * engine-specific; swap [[portableHash]] for `xxhash64` when oracle
  * portability is not needed.)
  *
  * Scale design: every operator is a single `groupBy` on a hash key —
  * shuffle size is O(rows), keys are uniformly distributed by construction
  * (no skew), and partial aggregation halves shuffle volume. The MinHash-LSH
  * path turns O(n²) near-dup search into per-bucket candidate generation.
  */
object Dedup {

  /** Portable deterministic hash of a string column: lowercase MD5 hex. */
  def portableHash(c: Column): Column = md5(c.cast("binary"))

  /** Canonical text form for near-exact matching: case-fold, collapse
    * whitespace runs, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact-duplicate groups: one row per distinct content hash with the
    * representative (minimum) id and the duplicate count. Dedup itself is
    * `df.where(...)` against `keep = id == min(id) over hash` or a
    * semi-join on this output. */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(portableHash(text).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Whitespace/case-insensitive document fingerprint (near-exact dedup). */
  def fingerprint(text: Column): Column = portableHash(normalize(text))

  /** Non-empty lowercase word tokens of `text` (scrub + split + drop ""). */
  def cleanTokens(text: Column): Column =
    filter(split(TextOps.scrub(text), "\\s+"), t => length(t) > 0)

  /** Word n-gram shingles over the clean tokens; whole text as the single
    * shingle when there are fewer than `n` tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = cleanTokens(text)
    val k = size(toks)
    when(k >= n,
      transform(sequence(lit(1), k - lit(n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Full k-component MinHash signature `(id, sig0..sig{k-1})` over the
    * Mersenne field p = 2^61-1: each shingle is MD5-hashed ONCE
    * (u = first 8 digest bytes, unsigned big-endian), then mixed by k
    * fixed universal hashes `h_i = (a_i * (u mod p) + b_i) mod p`
    * ([[graft.functions.TextHashes.mixConsts]]); sig_i is the minimum of
    * h_i over the shingle set — the textbook k-permutation MinHash, one
    * strong hash per shingle instead of k. Computed as explode(shingles)
    * -> groupBy(id).agg(min(h_i) x k).
    *
    * Deliberately aggregation-shaped rather than k array-fold columns over
    * one row: Catalyst's projection collapsing would re-evaluate the whole
    * tokenize+shingle pipeline once per signature column (k-fold waste,
    * measured 8x on the bench), while the exploded form hashes every
    * shingle exactly once and the `min` partial-aggregates map-side — the
    * shuffle carries k longs per doc, not the shingles.
    *
    * All arithmetic is exact: u (< 2^64) and the mix products (< 2^122)
    * run in DECIMAL(38,0) on the declarative path, so the same values come
    * out of the native expression, this plan, and the DuckDB oracle's
    * HUGEINT math. */
  def minhashSignature(df: DataFrame, text: Column, id: Column,
                       k: Int = 8): DataFrame = {
    val p = lit(new java.math.BigDecimal(graft.functions.TextHashes.P61))
    val idName = df.select(id).columns.head
    val exploded = df.select(id.as("_mh_id"),
      explode(shingles(text)).as("_shingle"))
    // conv(hex, 16, 10) renders the UNSIGNED 64-bit value as digits
    val x = (conv(substring(md5(col("_shingle").cast("binary")), 1, 16),
      16, 10).cast("decimal(20,0)") % p).cast("decimal(19,0)")
    val cs = graft.functions.TextHashes.mixConsts(k)
    val aggs = (0 until k).map { i =>
      val (a, b) = cs(i)
      min(((lit(new java.math.BigDecimal(a)).cast("decimal(19,0)") * x
        + lit(new java.math.BigDecimal(b))) % p).cast("long")).as(s"sig$i")
    }
    exploded.groupBy(col("_mh_id")).agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_mh_id", idName)
  }

  /** LSH band ids: hash `rows`-sized runs of the signature (','-separated
    * decimal rendering — unambiguous across engines); two docs sharing ANY
    * band are near-dup candidates. bandCount = k / rows. */
  def lshBands(k: Int = 8, rows: Int = 2): Seq[Column] =
    (0 until k / rows).map { b =>
      md5(concat_ws(",", (b * rows until (b + 1) * rows)
        .map(i => col(s"sig$i").cast("string")): _*).cast("binary"))
        .as(s"band$b")
    }

  /** Candidate near-duplicate pairs via LSH: docs sharing any band,
    * deduplicated across bands, id1 < id2. The self-join is per-bucket —
    * at scale, bucket sizes stay O(dups), not O(n). */
  /** `maxBucket` bounds degenerate buckets by SALTING, not dropping: a
    * bucket of b docs yields b(b-1)/2 candidate pairs, so one
    * non-discriminative band value over a huge corpus would go quadratic.
    * An over-cap bucket is split into s = ceil(b/maxBucket) sub-buckets
    * by a deterministic md5 salt on the doc id, and pairs form only
    * within a sub-bucket: per-band join work stays O(b * maxBucket)
    * instead of O(b^2), while the lost pairs are a RANDOM 1 - 1/s of the
    * bucket — at 100 TB a hot band (boilerplate shingles) degrades
    * recall smoothly instead of silently dropping its dup cluster
    * wholesale. Sub-bucket sizes concentrate tightly around b/s (md5 is
    * uniform; deviation is O(sqrt(b/s))), so the bound is solid in
    * practice. The salt is md5-derived (not JVM hash), so retries,
    * re-partitions, and the DuckDB oracle all agree on it. */
  def lshCandidatePairs(sigs: DataFrame, id: String,
                        k: Int = 8, rows: Int = 2,
                        maxBucket: Int = 10000): DataFrame = {
    // single pass: all bands emitted via posexplode (a union of per-band
    // selects would re-evaluate the signature expressions once per band);
    // materialized once via localCheckpoint because it is consumed three
    // times below (bucket sizing + both self-join sides) — without it the
    // full shingle->minhash pipeline feeding `sigs` re-runs per consumer,
    // the dominant cost at corpus scale. RDD-level storage (not
    // Dataset.persist, whose CacheManager entry would outlive the query and
    // accumulate across calls): the ContextCleaner reclaims the blocks once
    // the result plan is unreachable. On a multi-node cluster prefer a
    // reliable checkpoint dir — localCheckpoint trades executor-loss
    // recovery for speed.
    val bands = sigs.select(col(id).as("doc_a"),
      posexplode(array(lshBands(k, rows): _*)).as(Seq("bi", "band")))
      .select(col("doc_a"), col("band"))
      .localCheckpoint(false)
    val sized = bands.groupBy("band")
      .agg(count(lit(1)).as("_bsz"))
    // s = ceil(bucket/maxBucket) sub-buckets; normal buckets get s = 1
    // (salt 0 for every member — the join is within-bucket, unchanged)
    val salted = bands.join(sized, "band")
      .select(col("doc_a"), col("band"),
        (conv(substring(md5(col("doc_a").cast("string").cast("binary")),
          1, 8), 16, 10).cast("long") %
          (floor((col("_bsz") - 1) / maxBucket) + 1)).as("_salt"))
    val l = salted.as("l"); val r = salted.as("r")
    l.join(r, col("l.band") === col("r.band") &&
        col("l._salt") === col("r._salt") &&
        col("l.doc_a") < col("r.doc_a"))
      .select(col("l.doc_a").as("id1"), col("r.doc_a").as("id2"))
      .distinct()
  }

  /** Connected components over a (typically near-dup-pair) edge list:
    * iterative min-label propagation — every node starts labeled with its
    * own id; each round every node takes the min of its own and its
    * neighbors' labels; fixpoint = each node carries the min id of its
    * component (the canonical representative for cluster-level dedup).
    *
    * Scale shape: the driver loop runs one distributed join+agg per round
    * and reads back a single convergence COUNT — O(diameter) rounds, and
    * near-dup clusters have tiny diameters (pairs come from shared LSH
    * bands, so clusters are dense). Labels and the symmetrized edge list
    * are `localCheckpoint`ed: edges are re-consumed every round and the
    * label lineage would otherwise grow by one join per round; each
    * round's checkpoint blocks are explicitly released once the next
    * round is materialized, so the storage footprint stays bounded at two
    * label snapshots regardless of diameter. For graphs with
    * continent-sized components (social graphs, not dedup), swap the
    * propagation for large-star/small-star — same driver-loop shape.
    *
    * Throws `IllegalStateException` if the propagation has not converged
    * after `maxIter` rounds: a truncated run would silently return SPLIT
    * labels for any component whose diameter exceeds the budget, and the
    * caller has no way to tell a converged fixpoint from a partial one. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
                          idCol: String = "doc_id",
                          maxIter: Int = 20): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    // materialize the INCOMING edge list before symmetrizing: a union of
    // two selects re-evaluates its input per branch, and the edge list is
    // typically the full LSH->jaccard candidate pipeline — without this
    // the dominant hashing work would run twice before the loop starts
    val e0 = edges.select(col("id1"), col("id2")).localCheckpoint(false)
    // hash-partitioned on the per-round join key before the one-time
    // checkpoint: localCheckpoint preserves physical partitioning, so
    // every propagation round shuffles only the O(nodes) label frame —
    // the O(edges) side never re-crosses the wire after round 0
    val e = e0.select(col("id1").as("src"), col("id2").as("dst"))
      .union(e0.select(col("id2").as("src"), col("id1").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint(false)
    var labels = nodes.select(col(idCol).as("node"), col(idCol).as("lab"))
      .localCheckpoint(false)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // one job per round: propagate neighbor minima, take min with the
      // node's own label, and CARRY the old label through so convergence
      // is a filter over the checkpointed result — no second join
      val nbMin = e.join(labels, col("dst") === col("node"))
        .groupBy(col("src").as("nb_node")).agg(min("lab").as("nb"))
      val next = labels.select(col("node"), col("lab").as("old"))
        .join(nbMin, col("node") === col("nb_node"), "left_outer")
        .select(col("node"),
          least(col("old"), coalesce(col("nb"), col("old"))).as("lab"),
          col("old"))
        .localCheckpoint(false)
      converged = next.where(col("lab") =!= col("old")).limit(1).count() == 0L
      // the convergence count materialized `next`'s blocks, so the prior
      // round's snapshot is no longer referenced by anything — release it
      // now instead of waiting for the ContextCleaner (bounds the cached
      // footprint to two rounds however deep the propagation runs)
      Bridge.unpersistLocalCheckpoint(labels)
      labels = next.select("node", "lab")
      iter += 1
    }
    // the symmetrized edges were consumed once per round; the returned
    // labels are their own checkpoint and no longer reference them
    Bridge.unpersistLocalCheckpoint(e)
    Bridge.unpersistLocalCheckpoint(e0)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds — " +
          "a component has diameter > maxIter and its labels would be " +
          "silently split; raise maxIter (rounds are O(diameter), and " +
          "near-dup clusters normally converge in a handful)")
    labels.select(col("node").as(idCol), col("lab").as("component"))
  }

  /** 64-bit SimHash over clean tokens, built from the first 16 hex chars of
    * each token's MD5: bit j of the result is the sign of the sum over
    * tokens of (2*bit_j(token) - 1). Near-identical docs differ in few
    * bits (Hamming distance). Pure expressions; the per-token 64-bit
    * unpack stays inside codegen. */
  def simhash64(text: Column): Column = {
    val toks = cleanTokens(text)
    // per-token ±1 bit vector (64 ints) from the hex nibbles of md5
    val bitVecs = transform(toks, t => {
      val chars = split(substring(md5(t.cast("binary")), 1, 16), "")
      transform(sequence(lit(0), lit(63)), j => {
        val nib = conv(get(chars, (j / 4).cast("int")), 16, 10).cast("int")
        val mask = when(j % 4 === 0, 8).when(j % 4 === 1, 4)
          .when(j % 4 === 2, 2).otherwise(1)
        when(nib.bitwiseAND(mask) > 0, 1).otherwise(-1)
      })
    })
    val zero = transform(sequence(lit(0), lit(63)), _ => lit(0))
    val sums = aggregate(bitVecs, zero,
      (acc, v) => zip_with(acc, v, (a, b) => a + b))
    // fold sign bits into one long (1L << 63 is the sign-bit pattern)
    val powers = array((0 until 64).map(j => lit(1L << (63 - j))): _*)
    aggregate(
      zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** EXACT set-similarity self-join (Jaccard >= t) via rarest-first
    * prefix filtering (AllPairs/PPJoin family). Input: (doc_id, sh)
    * with `sh` the DISTINCT element array per id. Guarantee: with every
    * set sorted by one canonical corpus order (element document
    * frequency asc, element asc), two sets at Jaccard >= t always share
    * an element inside their first n - ceil(t*n) + 1 positions — if the
    * smallest common element sat outside either prefix, all >= ceil(t*n)
    * common elements would have to fit in that side's ceil(t*n) - 1
    * suffix. The size band (|a| >= t*|b|) holds for every true pair, so
    * prefix + band lose nothing and the exact Jaccard verify on the
    * candidates makes the result identical to the quadratic all-pairs
    * answer. Candidate buckets track the df of RARE elements (frequent
    * boilerplate sorts out of prefixes) — the property that keeps the
    * equi-join linear-ish where all-pairs is quadratic. */
  def exactSimilarityPairs(sets: DataFrame, t: Double): DataFrame = {
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    // Dictionary-encode shingles to dense longs before anything heavy:
    // row_number over the (already-needed) document-frequency table is
    // an INJECTIVE map, so per-doc set sizes and pairwise intersection
    // counts — hence every Jaccard value — are exactly preserved, while
    // the candidate equi-join keys and the verify's array_intersect run
    // over longs instead of ~20-char strings (measured 2x on the verify,
    // which is the hot phase). The global row_number plans distributed
    // through the GlobalRank session rewrite; ordering by (df, sid) is
    // the same canonical total order as (df, shingle) because sid is
    // assigned in shingle order within the freq table.
    val dictW = org.apache.spark.sql.expressions.Window
      .orderBy(col("shingle"))
    val dict = ex.groupBy("shingle").agg(count(lit(1)).as("df"))
      .select(col("shingle"), col("df"),
        row_number().over(dictW).cast("long").as("sid"))
    // lazily checkpointed: the per-doc rarity-sorted sid arrays feed the
    // prefix explode AND both sides of the verify join — the df-join +
    // per-doc sort aggregation is the expensive half of candidate
    // generation; materialize it once
    val sorted = ex.join(dict, "shingle")
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
    // PPJoin positional upper bound (Xiao et al.): a true pair's overlap
    // is >= ceil(t/(1+t)·(n_a+n_b)), and for the SMALLEST common element
    // (minimal position in BOTH arrays under the one canonical order)
    // the overlap can be at most min(n_a-p_a, n_b-p_b)+1 — so at least
    // that match row passes the bound and the pair always survives to
    // `distinct`; later match rows may be pruned, which only removes
    // duplicates. The 1e-9 slack keeps the double ceil() conservative
    // (never above the true rational bound), so pruning can only be
    // LOOSER than exact, never tighter — exactness stays with the
    // verify. Candidate keys, band and positional filters are all
    // long/int arithmetic.
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.sid") === col("b.sid") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("b.n") >= ceil(col("a.n") * t) &&
          col("a.n") >= ceil(col("b.n") * t) &&
          (least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) +
            lit(1)) >=
            ceil(lit(t / (1 + t)) * (col("a.n") + col("b.n")) - lit(1e-9)))
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
      // threshold on the RAW ratio (the oracle does the same); round only
      // for output so a just-below-t pair can't sneak in via rounding
      .where(col("raw") >= t)
      .select(col("id1"), col("id2"), round(col("raw"), 6).as("jaccard"))
  }
}
