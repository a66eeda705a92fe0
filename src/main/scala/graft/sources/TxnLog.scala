package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction log over plain parquet — the lakehouse metadata
  * layer (the public Delta Lake / Iceberg design, VLDB 2020) re-expressed
  * with nothing but a directory of commit files, giving four capabilities
  * no raw parquet directory has:
  *
  *   - **snapshot isolation / time travel**: a snapshot AS OF version v is
  *     the file set `adds(<=v) \ removes(<=v)`, resolved from O(commits)
  *     metadata — the data directory is NEVER listed;
  *   - **incremental (CDC-style) consumption**: the rows that changed
  *     between two versions live only in the files added/removed in that
  *     version range, so a consumer reads O(transaction) bytes, not two
  *     full snapshots;
  *   - **metadata-transacted maintenance**: compaction is a commit that
  *     removes N small files and adds their size-targeted rewrite — a
  *     content no-op visible atomically, with every older version intact;
  *   - **vacuum**: a file is physically deletable exactly when every
  *     snapshot that references it is older than the retention floor
  *     (`removeVersion <= retain`), so storage reclaim never touches a
  *     retained snapshot.
  *
  * Commit protocol: one file per version, `%020d.commit`, published via
  * the store's ATOMIC create-exclusive primitive (see
  * [[createExclusive]] — POSIX O_EXCL for local stores, HDFS
  * create-exclusive otherwise; Hadoop's local `create(!overwrite)` is a
  * non-atomic check-then-create and is deliberately NOT used). That
  * publish IS optimistic concurrency control: two writers racing to the
  * same version — the serial `latest + 1` — collide on the create and
  * the loser retries on a fresh read of the log; TxnLogSpec's
  * two-thread race pins exactly-one-winner. (Object stores without
  * atomic create need a putIfAbsent coordination service; that is a
  * log-store property, not a log-format one — same as the public Delta
  * design.)
  *
  * Scale: the log is O(commits) driver-side metadata, the same listing
  * any table-format client performs; snapshot resolution, diff, and
  * vacuum planning are pure log algebra. Data-file reads stay fully
  * distributed (`spark.read.parquet(liveFiles: _*)`). At 100 TB the
  * difference between this and re-listing the lake per query is the
  * difference between milliseconds of metadata and minutes of S3 LIST.
  *
  * Commit-file format: one action per line, `add\t<path>` or
  * `remove\t<path>` (paths contain no tabs/newlines by construction —
  * they are staged under a managed root). A text format keeps the log
  * readable by anything, like Delta's JSON commits.
  */
object TxnLog {

  final case class Action(version: Long, action: String, path: String)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitPath(logDir: String, version: Long): Path =
    new Path(logDir, f"$version%020d.commit")

  /** The atomic-publish primitive, chosen PER STORE (the same split the
    * public Delta LogStore design makes): Hadoop's RawLocalFileSystem
    * implements `create(path, overwrite = false)` as a NON-atomic
    * exists-check-then-create — TxnLogSpec's two-writer race test
    * double-committed through it — so local stores go through POSIX
    * O_EXCL (`CREATE_NEW`) directly, which the kernel arbitrates; other
    * stores use the filesystem's own create-exclusive (atomic on HDFS;
    * object stores without it need an external putIfAbsent service).
    * Note the publish unit is the commit FILE's existence: a reader
    * racing the writer between create and close can see a partial
    * commit and fails loudly on the malformed line (never silently) —
    * full read-after-publish needs temp-file + atomic-rename, which is
    * a store property, not a format one. */
  private def createExclusive(f: org.apache.hadoop.fs.FileSystem,
      p: Path): java.io.OutputStream =
    if (f.getScheme == "file") {
      java.nio.file.Files.newOutputStream(
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
    } else f.create(p, /* overwrite = */ false)

  /** Append commit `version` with the given file actions. Enforces the
    * serial-history invariant (`version == latestVersion + 1`) and then
    * relies on create-exclusive for the atomic publish: if a concurrent
    * writer won the race after our check, the create throws and no
    * partial commit is visible. */
  def commit(spark: SparkSession, logDir: String, version: Long,
      adds: Seq[String], removes: Seq[String] = Nil): Unit = {
    require(adds.nonEmpty || removes.nonEmpty, "empty commit")
    (adds ++ removes).foreach { p =>
      require(!p.contains('\t') && !p.contains('\n'),
        s"path not representable in the commit format: $p")
    }
    val f = fs(spark, logDir)
    f.mkdirs(new Path(logDir))
    val latest = latestVersion(spark, logDir)
    require(version == latest + 1,
      s"non-serial commit: version=$version, latest=$latest")
    val out = createExclusive(f, commitPath(logDir, version))
    try {
      val body = (adds.map(p => s"add\t$p") ++
        removes.map(p => s"remove\t$p")).mkString("", "\n", "\n")
      out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
  }

  /** Idempotent publish for sinks keyed by an EXTERNAL transaction id
    * (Structured Streaming's foreachBatch batchId): if `version` is
    * already committed, the batch published before a crash-and-replay —
    * do nothing and return false; otherwise commit and return true.
    * This is the public Delta-streaming exactly-once mechanism (the
    * sink's txn version = the engine's batchId), and the reason a
    * TxnLog store needs NO read-side dedup and NO partition-replace
    * discipline: the data object may be rewritten by the replay, but
    * the log names it exactly once, and a half-written object whose
    * commit never published is simply invisible. Single writer per
    * version assumed (one streaming query owns the sink); the
    * create-exclusive commit file is the backstop if that is violated. */
  def idempotentCommit(spark: SparkSession, logDir: String, version: Long,
      adds: Seq[String], removes: Seq[String] = Nil): Boolean = {
    val f = fs(spark, logDir)
    if (f.exists(commitPath(logDir, version))) false
    else { commit(spark, logDir, version, adds, removes); true }
  }

  /** Highest committed version, or -1 for an empty/absent log. */
  def latestVersion(spark: SparkSession, logDir: String): Long = {
    val f = fs(spark, logDir)
    val p = new Path(logDir)
    if (!f.exists(p)) -1L
    else {
      val vs = f.listStatus(p).iterator
        .map(_.getPath.getName)
        .filter(_.endsWith(".commit"))
        .map(n => n.stripSuffix(".commit").toLong)
      if (vs.isEmpty) -1L else vs.max
    }
  }

  /** The full action log, version-ordered. O(commits) driver work — the
    * metadata a table-format client holds, never data-sized. */
  def readLog(spark: SparkSession, logDir: String): Seq[Action] = {
    val f = fs(spark, logDir)
    f.listStatus(new Path(logDir)).iterator.toSeq
      .filter(_.getPath.getName.endsWith(".commit"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val v = st.getPath.getName.stripSuffix(".commit").toLong
        val in = f.open(st.getPath)
        val text =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        text.split('\n').iterator.filter(_.nonEmpty).map { line =>
          val i = line.indexOf('\t')
          require(i > 0, s"malformed commit line in v$v: $line")
          Action(v, line.substring(0, i), line.substring(i + 1))
        }
      }
  }

  /** Snapshot file set AS OF `asOf`: adds up to the version minus removes
    * up to it, in first-add order (deterministic read plans). A remove of
    * a never-added path and a second add of a live path are both history
    * corruption and fail loudly. */
  def liveFiles(log: Seq[Action], asOf: Long): Seq[String] = {
    require(log.nonEmpty && asOf >= log.head.version,
      s"asOf=$asOf precedes the log")
    require(asOf <= log.map(_.version).max,
      s"asOf=$asOf is past the latest commit")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    log.iterator.takeWhile(_.version <= asOf).foreach {
      case Action(v, "add", p) =>
        require(live.add(p), s"v$v re-adds live file $p")
      case Action(v, "remove", p) =>
        require(live.remove(p), s"v$v removes non-live file $p")
      case Action(v, a, _) => sys.error(s"v$v: unknown action '$a'")
    }
    live.toSeq
  }

  /** Distributed read of the snapshot AS OF `asOf` — only the live files,
    * resolved from the log; the data directory is never listed. */
  def readSnapshot(spark: SparkSession, logDir: String, asOf: Long)
      : DataFrame = {
    val files = liveFiles(readLog(spark, logDir), asOf)
    require(files.nonEmpty, s"snapshot v$asOf is empty")
    spark.read.parquet(files: _*)
  }

  /** Files added and removed in `(sinceV, untilV]` — the O(transaction)
    * footprint an incremental consumer reads instead of two snapshots.
    * Semantics are NET per path (the liveness delta between the two
    * snapshots): a path whose in-window adds and removes balance (e.g.
    * ingested then compacted away) contributes no change, while a path
    * removed and later RE-added in the window is a net add — the naive
    * added∩removed cancellation would wrongly drop it (caught by the
    * TxnLogSpec re-add property; valid histories alternate add/remove
    * per path, so the net is always −1, 0, or +1). The identity the
    * property pins: live(untilV) == (live(sinceV) \ removed) ∪ added. */
  def changedBetween(log: Seq[Action], sinceV: Long, untilV: Long)
      : (Seq[String], Seq[String]) = {
    require(sinceV < untilV, s"empty version range ($sinceV, $untilV]")
    val window = log.filter(a => a.version > sinceV && a.version <= untilV)
    val net = window.groupBy(_.path).map { case (p, as) =>
      p -> as.map(a => if (a.action == "add") 1 else -1).sum
    }
    val added = window.collect { case Action(_, "add", p) => p }
      .distinct.filter(net(_) > 0)
    val removed = window.collect { case Action(_, "remove", p) => p }
      .distinct.filter(net(_) < 0)
    (added, removed)
  }

  /** Files physically deletable under a retention floor: every snapshot
    * that references a file removed at version r is strictly older than
    * r, so `removeVersion <= retain` keeps all snapshots >= retain
    * readable. Files removed AFTER the floor stay, because snapshot
    * `retain` itself may reference them. */
  def vacuumCandidates(log: Seq[Action], retain: Long): Seq[String] =
    log.collect {
      case Action(v, "remove", p) if v <= retain => p
    }

  /** Physically delete the vacuum candidates. Returns the deleted paths.
    * Irreversible by design — time travel to versions older than the
    * retention floor fails afterwards (resolution still succeeds, the
    * read hits the missing file), exactly the public Delta/Iceberg
    * VACUUM contract. */
  def vacuum(spark: SparkSession, logDir: String, retain: Long)
      : Seq[String] = {
    val victims = vacuumCandidates(readLog(spark, logDir), retain)
    val f = fs(spark, logDir)
    // recursive: a log entry is a data OBJECT — the directory one
    // distributed write laid down, not necessarily a single file
    victims.foreach { p => f.delete(new Path(p), true) }
    victims
  }
}
