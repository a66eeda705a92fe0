package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, element_at, split}

/** Minimal transaction log over plain parquet — the lakehouse metadata
  * layer (the public Delta Lake / Iceberg design, VLDB 2020) re-expressed
  * with nothing but a directory of commit files, giving the capabilities
  * no raw parquet directory has:
  *
  *   - **snapshot isolation / time travel**: a snapshot AS OF version v is
  *     the file set `adds(<=v) \ removes(<=v)`, resolved from O(commits)
  *     metadata — the data directory is NEVER listed;
  *   - **checkpointed resolution**: every N commits a full live-set
  *     snapshot file is written (`%020d.checkpoint` + a `_last_checkpoint`
  *     pointer, the public Delta design), so resolving a snapshot reads
  *     ONE checkpoint plus the commits after it — O(tail), not
  *     O(total-commits) driver file opens on a long-lived table;
  *   - **incremental (CDC-style) consumption**: the rows that changed
  *     between two versions live only in the files added/removed in that
  *     version range, so a consumer reads O(transaction) bytes, not two
  *     full snapshots;
  *   - **metadata-transacted maintenance**: compaction is a commit that
  *     removes N small files and adds their size-targeted rewrite — a
  *     content no-op visible atomically, with every older version intact;
  *   - **file-level stats → metadata-only data skipping**: an add action
  *     optionally carries a stats string written ONCE at write time
  *     (e.g. per-file `[min,max]` of the cluster columns); readers prune
  *     whole objects from the log alone, before any data file is opened;
  *   - **vacuum**: a file is physically deletable exactly when NO snapshot
  *     at or above the retention floor references it — a path removed at
  *     `r <= retain` but re-added later is live again and is NEVER
  *     reclaimed (the remove-then-re-add histories the log algebra
  *     explicitly supports);
  *   - **optimistic concurrency**: concurrent writers race on the
  *     create-exclusive commit file; [[commitRetry]] re-reads the log on
  *     collision, re-stamps when the intervening commits touch a DISJOINT
  *     file set (disjoint commits commute — e.g. appends to different
  *     partitions), and fails loudly on a logical conflict;
  *   - **schema in the log**: a `meta` action declares the table schema
  *     (a Spark DataType JSON), commits whose adds disagree with it are
  *     rejected, and evolution is widening/add-nullable-column only —
  *     so a snapshot read pins its schema from METADATA (old files serve
  *     null for later columns) instead of sampling 100 TB of footers;
  *   - **column mapping**: a field whose metadata carries the
  *     `graft.phys` key decouples its LOGICAL name from the PHYSICAL
  *     name stored in the data files (the public Delta column-mapping
  *     design) — RENAME, and once every column is explicitly mapped
  *     DROP, become metadata-only `meta` commits instead of a 100 TB
  *     rewrite, and files from every generation read through one
  *     logical schema;
  *   - **merge-on-read deletes (deletion vectors)**: a row-level delete
  *     publishes a commit that re-adds the SAME object with a DV — a
  *     `<leaf>:<rowIndex>` position list applied as a broadcast
  *     anti-join at read — so the object's bytes are untouched (the
  *     public Delta/Iceberg v2 answer to high-churn tables, where
  *     copy-on-write rewrites whole objects per delete); compaction
  *     later folds the DV into a rewritten object and retires it.
  *
  * Commit protocol: one file per version, `%020d.commit`, published via
  * the store's ATOMIC exclusive-publish primitive (see
  * [[publishExclusive]]). On local stores the body is first written to a
  * temp file and then published via a POSIX hard link — `link(2)` is both
  * atomic and exclusive (fails if the target exists), so a reader can
  * never observe a torn commit and two racing writers get exactly one
  * winner (Hadoop's local `create(!overwrite)` is a non-atomic
  * check-then-create and is deliberately NOT used). On stores without an
  * atomic full-content publish (HDFS create-exclusive streams the body),
  * torn writes are still DETECTED at read: every commit file ends with a
  * `commit\t<n>` terminator line carrying the action count, and
  * [[readLog]] fails loudly on a missing/short terminator — a truncated
  * body can never silently drop trailing actions. (Object stores without
  * atomic create need a putIfAbsent coordination service; that is a
  * log-store property, not a log-format one — same as the public Delta
  * LogStore design.)
  *
  * Scale: the log is O(commits) driver-side metadata, the same listing
  * any table-format client performs — and with checkpoints, resolution
  * is O(live set + tail). Snapshot resolution, diff, skipping, and
  * vacuum planning are pure log algebra. Data-file reads stay fully
  * distributed (`spark.read.parquet(liveFiles: _*)`). At 100 TB the
  * difference between this and re-listing the lake per query is the
  * difference between milliseconds of metadata and minutes of S3 LIST.
  *
  * Commit-file format: one action per line —
  * `add\t<path>[\t<stats>[\t<dv>]]` (a DV-carrying add writes `-` for
  * an absent stats slot) or `remove\t<path>` — closed by a
  * `commit\t<actionCount>` terminator (paths, stats and DV payloads
  * contain no tabs/newlines by construction — they are staged under a
  * managed root). Removes render BEFORE adds, so a single commit can
  * atomically swap a path's DV (remove + re-add of the same object,
  * the Delta representation of a merge-on-read delete). A text format
  * keeps the log readable by anything, like Delta's JSON commits.
  * Checkpoint files use the same line format (adds only — the live set
  * in first-add order, stats and DVs carried forward) with the same
  * terminator.
  */
object TxnLog {

  /** One log line. `dv` is the object's deletion vector — a
    * `<leaf>:<rowIndex>` position list ([[dvEntries]]) naming rows the
    * snapshot must NOT serve; it rides the add action (a DV update is
    * remove + re-add of the same path in one commit), so the pure
    * replay algebra is untouched by merge-on-read deletes. */
  final case class Action(version: Long, action: String, path: String,
      stats: Option[String] = None, dv: Option[String] = None)

  /** Loud failure type for logical write-write conflicts under OCC. */
  final class CommitConflictException(msg: String)
    extends RuntimeException(msg)

  /** Lost the exclusive-publish race: some other writer owns this commit
    * version. The ONLY commit failure that is safe to retry blindly —
    * [[commitRetry]] catches exactly this type, so a persistent real I/O
    * failure (disk full, permissions) propagates with its own cause
    * instead of being retried ten times and reported as log churn. */
  final class CommitRaceException(msg: String, cause: Throwable)
    extends java.io.IOException(msg, cause)

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def commitPath(logDir: String, version: Long): Path =
    new Path(logDir, f"$version%020d.commit")

  private def checkpointPath(logDir: String, version: Long): Path =
    new Path(logDir, f"$version%020d.checkpoint")

  private def lastCheckpointPath(logDir: String): Path =
    new Path(logDir, "_last_checkpoint")

  // ---------------------------------------------------------------------
  // Publish primitives
  // ---------------------------------------------------------------------

  /** Atomic, exclusive, FULL-CONTENT publish, chosen PER STORE (the same
    * split the public Delta LogStore design makes). Local stores: write a
    * temp file in the same directory, then `Files.createLink(target,
    * temp)` — the kernel arbitrates `link(2)`, which is atomic AND fails
    * with EEXIST if the target exists, so the publish unit is the
    * complete body (a reader can never see a torn commit, and two racing
    * writers get exactly one winner). Hadoop's RawLocalFileSystem
    * `create(path, overwrite = false)` is a NON-atomic
    * exists-check-then-create — TxnLogSpec's two-writer race test
    * double-committed through it — and rename-based publish is not
    * exclusive (POSIX rename silently replaces), which is why the hard
    * link is the right local primitive. Other stores use the
    * filesystem's own create-exclusive stream (atomic publish-by-
    * existence on HDFS; the content-torn-write case is covered by the
    * terminator line [[readLog]] requires). */
  private def publishExclusive(f: org.apache.hadoop.fs.FileSystem,
      p: Path, body: Array[Byte]): Unit =
    if (f.getScheme == "file") {
      val target = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, s".${target.getFileName}.", ".tmp")
      try {
        java.nio.file.Files.write(tmp, body)
        try java.nio.file.Files.createLink(target, tmp)
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw new CommitRaceException(
              s"commit file already exists (lost the publish race): $p", e)
        }
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val out =
        try f.create(p, /* overwrite = */ false)
        catch {
          // publish-by-existence stores signal the lost race at create
          case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
            throw new CommitRaceException(
              s"commit file already exists (lost the publish race): $p", e)
        }
      try out.write(body) finally out.close()
    }

  /** Atomic full-content OVERWRITE publish for checkpoint artifacts
    * (checkpoint files and the `_last_checkpoint` pointer): write a temp
    * file, then `rename(2)` into place — atomic replacement, so a reader
    * racing a checkpointer sees either the old complete file or the new
    * complete file, never an empty/truncated one. Checkpoint content is
    * a pure function of the log, so WHICH complete version wins is
    * irrelevant — only tornness would be a bug, and rename excludes it.
    * Non-local stores fall back to the filesystem's own overwrite create
    * (HDFS readers of a mid-write file are covered by the body
    * terminator [[parseBody]] requires, and [[liveActionsAt]] treats an
    * unreadable pointer as absent). */
  private def publishOverwrite(f: org.apache.hadoop.fs.FileSystem,
      p: Path, body: Array[Byte]): Unit =
    if (f.getScheme == "file") {
      val target = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(target.getParent)
      val tmp = java.nio.file.Files.createTempFile(
        target.getParent, s".${target.getFileName}.", ".tmp")
      try {
        java.nio.file.Files.write(tmp, body)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val out = f.create(p, /* overwrite = */ true)
      try out.write(body) finally out.close()
    }

  /** Serialize actions + terminator into the commit/checkpoint body. */
  private def renderBody(lines: Seq[String]): Array[Byte] =
    (lines :+ s"commit\t${lines.size}")
      .mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private def actionLine(action: String, path: String,
      stats: Option[String], dv: Option[String] = None): String = dv match {
    // the DV needs the 4th slot, so an absent stats slot renders as `-`
    case Some(d) => s"$action\t$path\t${stats.getOrElse("-")}\t$d"
    case None => stats match {
      case Some(st) => s"$action\t$path\t$st"
      case None => s"$action\t$path"
    }
  }

  /** Parse one commit/checkpoint body. Fails loudly on a malformed line,
    * a missing terminator, or an action count that disagrees with the
    * terminator — a torn or truncated write (including one truncated AT
    * a newline boundary, which would otherwise parse as a shorter but
    * well-formed body) is always detected, never silently shortened. */
  private def parseBody(text: String, v: Long, where: String)
      : Seq[Action] = {
    val lines = text.split('\n').toSeq.filter(_.nonEmpty)
    require(lines.nonEmpty, s"torn $where v$v: empty body")
    val term = lines.last
    require(term.startsWith("commit\t"),
      s"torn $where v$v: missing commit terminator (last line: $term)")
    val declared = term.substring("commit\t".length).toLong
    val actions = lines.init
    require(actions.size.toLong == declared,
      s"torn $where v$v: terminator declares $declared actions, " +
        s"body has ${actions.size}")
    // a checkpoint legitimately snapshots an EMPTY live set (a
    // removes-everything commit landing on a checkpoint boundary) — its
    // zero-action body is still torn-write-proof via the terminator;
    // commits stay non-empty by the commit() contract
    require(declared > 0 || where == "checkpoint",
      s"$where v$v declares zero actions")
    actions.map { line =>
      val parts = line.split('\t')
      require(parts.length >= 2 && parts.length <= 4,
        s"malformed $where line in v$v: $line")
      require(parts(0) == "add" || parts(0) == "remove" ||
          parts(0) == "meta",
        s"malformed $where line in v$v: unknown action '${parts(0)}'")
      require(parts.length == 2 || parts(0) == "add",
        s"malformed $where line in v$v: stats on a ${parts(0)}: $line")
      // 4-slot add: stats (`-` = absent) + deletion vector
      val stats =
        if (parts.length < 3 || parts(2) == "-") None else Some(parts(2))
      val dv = if (parts.length == 4) Some(parts(3)) else None
      Action(v, parts(0), parts(1), stats, dv)
    }
  }

  private def readActionFile(f: org.apache.hadoop.fs.FileSystem,
      p: Path, v: Long, where: String): Seq[Action] = {
    val in = f.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    parseBody(text, v, where)
  }

  // ---------------------------------------------------------------------
  // Commit
  // ---------------------------------------------------------------------

  /** Append commit `version` with the given file actions. Enforces the
    * serial-history invariant (`version == latestVersion + 1`) and then
    * relies on the exclusive publish for atomicity: if a concurrent
    * writer won the race after our check, the publish throws and no
    * partial commit is ever visible. `stats` optionally carries a
    * per-added-path stats string (written once, at write time — the
    * data-skipping metadata readers prune from without opening data
    * files). `checkpointEvery > 0` writes a live-set checkpoint after
    * every Nth commit (see [[checkpoint]]).
    *
    * Schema discipline (the public Delta metaData design): `meta`
    * declares or EVOLVES the table schema (a Spark DataType JSON string)
    * — evolution from an existing schema must pass
    * [[schemaEvolutionOk]] (widen/add-nullable-column only), anything
    * else is rejected before any file is visible. `addsSchema` names the
    * schema of the data objects this commit adds; when the table
    * declares a schema, adds whose columns disagree with the
    * (post-`meta`) current schema are rejected — the enforcement that
    * keeps every live object readable under the declared schema. Both
    * checks resolve the current schema through the checkpoint
    * (O(checkpoint + tail), never a full-history replay when a
    * checkpoint exists). A schema-only commit (meta, no file actions)
    * is legal — that is what an ALTER TABLE is.
    *
    * `dvs` attaches a deletion vector ([[dvEntries]] format) to an
    * added path — the merge-on-read delete publishes `removes = Seq(p),
    * adds = Seq(p), dvs = Map(p -> positions)`: removes render before
    * adds, so the one commit atomically swaps the object's DV while
    * its bytes stay untouched on disk. */
  def commit(spark: SparkSession, logDir: String, version: Long,
      adds: Seq[String] = Nil, removes: Seq[String] = Nil,
      stats: Map[String, String] = Map.empty,
      checkpointEvery: Int = 0, meta: Option[String] = None,
      addsSchema: Option[String] = None,
      dvs: Map[String, String] = Map.empty): Unit = {
    require(adds.nonEmpty || removes.nonEmpty || meta.isDefined,
      "empty commit")
    (adds ++ removes ++ stats.values ++ meta ++ dvs.values).foreach { p =>
      require(!p.contains('\t') && !p.contains('\n'),
        s"not representable in the commit format: $p")
    }
    stats.keys.foreach(p => require(adds.contains(p),
      s"stats for a path this commit does not add: $p"))
    dvs.keys.foreach(p => require(adds.contains(p),
      s"deletion vector for a path this commit does not add: $p"))
    val f = fs(spark, logDir)
    f.mkdirs(new Path(logDir))
    val latest = latestVersion(spark, logDir)
    require(version == latest + 1,
      s"non-serial commit: version=$version, latest=$latest")
    if (meta.isDefined || addsSchema.isDefined) {
      val current =
        if (latest >= 0) schemaAtVersion(spark, logDir, latest) else None
      meta.foreach { m =>
        current.filter(_ != m).foreach { c =>
          require(schemaEvolutionOk(c, m),
            s"v$version: illegal schema evolution (only widening / " +
              s"adding nullable columns): $c -> $m")
        }
      }
      val effective = meta.orElse(current)
      addsSchema.foreach { ws =>
        require(effective.isDefined,
          s"v$version declares an adds schema but the table has none — " +
            "declare the table schema with a meta action first")
        require(sameColumns(ws, effective.get),
          s"v$version: adds disagree with the table schema: " +
            s"table=${effective.get} adds=$ws")
      }
    }
    // removes BEFORE adds: a DV swap (or any same-path replace) must
    // replay as remove-then-re-add within the one commit
    val lines = meta.map(m => actionLine("meta", m, None)).toSeq ++
      removes.map(p => actionLine("remove", p, None)) ++
      adds.map(p => actionLine("add", p, stats.get(p), dvs.get(p)))
    publishExclusive(f, commitPath(logDir, version), renderBody(lines))
    if (checkpointEvery > 0 && version > 0 && version % checkpointEvery == 0)
      checkpoint(spark, logDir, version)
  }

  /** Physical column name under COLUMN MAPPING (the public Delta
    * design): a field whose metadata carries the `graft.phys` key is
    * decoupled from its logical name — data files store the physical
    * name, the schema serves the logical one, so a RENAME is a `meta`
    * commit, not a rewrite. A field without the key uses its logical
    * name as the physical name (the legacy identity mapping, and the
    * name every pre-mapping file was written with). */
  def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains("graft.phys")) f.metadata.getString("graft.phys")
    else f.name

  /** Column-level agreement between a writer's FILE schema and the
    * table's declared schema: the file's names must match the table's
    * PHYSICAL names (data files always store physical names — under
    * the identity mapping those are the logical names, so pre-mapping
    * behavior is unchanged), same types, same order, nullability
    * ignored (a parquet writer marks everything nullable; the table
    * contract is the declared one). */
  private def sameColumns(addsJson: String, tableJson: String): Boolean = {
    import org.apache.spark.sql.types.{DataType, StructType}
    def s(j: String) = DataType.fromJson(j).asInstanceOf[StructType]
    val fileCols = s(addsJson).fields.toSeq.map(f => (f.name, f.dataType))
    val tableCols = s(tableJson).fields.toSeq
      .map(f => (physName(f), f.dataType))
    fileCols == tableCols
  }

  /** OCC commit with logical conflict detection and bounded retry — the
    * multi-writer path. The writer names the snapshot version it READ
    * (`readVersion`); on a publish collision the log is re-read and the
    * intervening commits `(readVersion, latest]` are checked for logical
    * compatibility: commits touching DISJOINT file sets commute (e.g.
    * appends to different partitions), so the commit is re-stamped at
    * `latest + 1` and retried; any path overlap (the winner removed a
    * file we also remove, or touched one we read-modify-write) is a real
    * write-write conflict and fails loudly with
    * [[CommitConflictException]] — never silently last-writer-wins.
    * Returns the version the commit landed at. */
  def commitRetry(spark: SparkSession, logDir: String,
      readVersion: Long, adds: Seq[String], removes: Seq[String] = Nil,
      stats: Map[String, String] = Map.empty,
      maxAttempts: Int = 10, meta: Option[String] = None,
      addsSchema: Option[String] = None,
      dvs: Map[String, String] = Map.empty): Long = {
    val mine = (adds ++ removes).toSet
    var attempt = 0
    var lastRace: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      val latest = latestVersion(spark, logDir)
      if (latest > readVersion) {
        // opens ONLY the intervening commit files — the conflict check
        // is O(race window), not O(history)
        val intervening =
          readCommitRange(spark, logDir, readVersion, latest)
        val overlap = intervening.filter(_.action != "meta")
          .map(_.path).toSet intersect mine
        if (overlap.nonEmpty)
          throw new CommitConflictException(
            s"write-write conflict: commits ($readVersion, $latest] " +
              s"touched ${overlap.mkString(", ")}")
        // two concurrent schema changes never commute — and our adds
        // were validated against the schema we READ, so an intervening
        // evolution also conflicts with a schema-declaring write
        if ((meta.isDefined || addsSchema.isDefined) &&
            intervening.exists(_.action == "meta"))
          throw new CommitConflictException(
            s"schema conflict: commits ($readVersion, $latest] changed " +
              "the table schema")
      }
      try {
        commit(spark, logDir, latest + 1, adds, removes, stats,
          meta = meta, addsSchema = addsSchema, dvs = dvs)
        return latest + 1
      } catch {
        // ONLY the lost publish race (another writer owns latest+1) and
        // the serial pre-check tripping on it are retryable — the next
        // loop iteration re-reads the log and re-checks conflicts. A
        // real I/O failure (disk full, permissions) propagates with its
        // own cause instead of masquerading as log churn.
        case e: CommitRaceException => lastRace = e
        case e: IllegalArgumentException
          if e.getMessage != null && e.getMessage.contains("non-serial") =>
            lastRace = e
      }
    }
    throw new java.io.IOException(
      s"commit did not land after $maxAttempts attempts (log churn)",
      lastRace)
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
    * commit never published is simply invisible. The exists-then-commit
    * is NOT atomic, so a concurrent duplicate presenter of the same
    * version (a zombie attempt racing the recovery replay) may pass the
    * exists check and lose the exclusive publish — that loss is
    * re-checked and deduped to `false`, never surfaced as a failure of
    * the streaming query. */
  def idempotentCommit(spark: SparkSession, logDir: String, version: Long,
      adds: Seq[String], removes: Seq[String] = Nil,
      meta: Option[String] = None, addsSchema: Option[String] = None)
      : Boolean = {
    val f = fs(spark, logDir)
    if (f.exists(commitPath(logDir, version))) false
    else try {
      commit(spark, logDir, version, adds, removes,
        meta = meta, addsSchema = addsSchema); true
    } catch {
      // someone published this exact version while we were trying: the
      // external txn id is committed — dedup, don't fail the query.
      // A SCHEMA violation does NOT match this guard (the version was
      // never published), so a mid-stream drift in the sink's write
      // schema still fails the streaming query loudly.
      case _: java.io.IOException | _: IllegalArgumentException
        if f.exists(commitPath(logDir, version)) => false
    }
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

  // ---------------------------------------------------------------------
  // Log reading
  // ---------------------------------------------------------------------

  /** The full action log, version-ordered. O(commits) driver work — the
    * metadata a table-format client holds, never data-sized. Full-history
    * consumers (vacuum planning, change feeds from v0) need this;
    * snapshot RESOLUTION should prefer [[liveActionsAt]], which reads one
    * checkpoint + the tail. */
  def readLog(spark: SparkSession, logDir: String): Seq[Action] =
    readCommitRange(spark, logDir, -1L, Long.MaxValue)

  /** Commit actions in `(fromExclusive, toInclusive]` — opens ONLY the
    * commit files in the range (the checkpoint tail-read primitive). */
  def readCommitRange(spark: SparkSession, logDir: String,
      fromExclusive: Long, toInclusive: Long): Seq[Action] = {
    val f = fs(spark, logDir)
    f.listStatus(new Path(logDir)).iterator.toSeq
      .filter(_.getPath.getName.endsWith(".commit"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val v = st.getPath.getName.stripSuffix(".commit").toLong
        if (v > fromExclusive && v <= toInclusive)
          readActionFile(f, st.getPath, v, "commit")
        else Nil
      }
  }

  // ---------------------------------------------------------------------
  // Checkpoints
  // ---------------------------------------------------------------------

  /** Write a live-set checkpoint at `version`: a `%020d.checkpoint` file
    * holding the snapshot's current `meta` (schema) line, if any, and the
    * snapshot's add actions (first-add order, stats carried forward),
    * plus the `_last_checkpoint` pointer (the public Delta
    * `_last_checkpoint` design). Resolution for any `asOf >= version`
    * then reads this one file plus the commits after it. Checkpoint
    * content is a pure function of the log and both files publish via
    * atomic rename ([[publishOverwrite]]), so a reader racing a
    * concurrent checkpointer sees a complete file — old or new, never
    * torn. An EMPTY live set (a removes-everything commit landing on the
    * boundary) checkpoints fine: the zero-action body is legal for
    * checkpoints and still terminator-guarded. */
  def checkpoint(spark: SparkSession, logDir: String, version: Long)
      : Unit = {
    // resolve THROUGH the previous checkpoint: each checkpoint reads
    // O(prev checkpoint + tail), so a table checkpointing every N
    // commits does O(live set) work per checkpoint forever — the naive
    // full-log replay here would make the k-th checkpoint cost O(k·N)
    // and the log's lifetime maintenance quadratic
    val resolved = resolvedActionsAt(spark, logDir, version)
    val f = fs(spark, logDir)
    val lines = resolved.map { a =>
      if (a.action == "meta") actionLine("meta", a.path, None)
      else actionLine("add", a.path, a.stats, a.dv)
    }
    publishOverwrite(f, checkpointPath(logDir, version), renderBody(lines))
    publishOverwrite(f, lastCheckpointPath(logDir),
      s"$version\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Latest checkpoint version at or below `asOf`, if any. Fast path:
    * the `_last_checkpoint` pointer names the newest checkpoint — if it
    * qualifies, no listing filter is needed; otherwise (time travel
    * below the newest checkpoint, or an absent/unreadable pointer —
    * treated as absent, the listing is the ground truth) fall back to
    * listing `.checkpoint` files. */
  def lastCheckpointAtOrBefore(spark: SparkSession, logDir: String,
      asOf: Long): Option[Long] = {
    val f = fs(spark, logDir)
    val ptrP = lastCheckpointPath(logDir)
    val fromPtr: Option[Long] =
      if (!f.exists(ptrP)) None
      else {
        val in = f.open(ptrP)
        val v =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        v.toLongOption.filter(pv =>
          pv <= asOf && f.exists(checkpointPath(logDir, pv)))
      }
    fromPtr.orElse {
      val vs = f.listStatus(new Path(logDir)).iterator
        .map(_.getPath.getName)
        .filter(_.endsWith(".checkpoint"))
        .map(_.stripSuffix(".checkpoint").toLong)
        .filter(_ <= asOf)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Checkpoint-aware resolution of ALL current actions at `asOf`: the
    * live add set (first-add order, DVs riding their adds) preceded by
    * the current `meta` (schema) action, if the table declares one.
    * Validates `asOf <= latest` on BOTH resolution paths — with a
    * checkpoint the tail replay would otherwise silently serve the head
    * state for a version that was never committed (full replay fails
    * that loudly).
    *
    * Fault tolerance mirrors the `_last_checkpoint` pointer's
    * treated-as-absent rule at the CONTENT level: a checkpoint file
    * that fails to parse (a torn overwrite on a store without atomic
    * rename) is skipped and resolution falls back to the next older
    * checkpoint, then to full replay — a checkpoint is a shortcut, so
    * an unreadable one may cost time, never correctness. Both paths
    * fail LOUDLY on pruned commits their replay needs: the full replay
    * requires the log to start at v0 with no version gaps (a log whose
    * pre-checkpoint commits were pruned under a checkpoint that was
    * later GC'd must not silently resolve an incomplete live set), and
    * the checkpoint path requires every commit in `(cv, asOf]`. */
  private def resolvedActionsAt(spark: SparkSession, logDir: String,
      asOf: Long): Seq[Action] = {
    val f = fs(spark, logDir)
    def fullReplay(): Seq[Action] = {
      val log = readLog(spark, logDir)
      if (log.nonEmpty) {
        val vs = log.map(_.version).distinct
        require(vs.head == 0L,
          s"log head is v${vs.head}, not v0: pre-checkpoint commits were " +
            "pruned but no readable checkpoint covers them — refusing to " +
            "resolve an incomplete snapshot")
        vs.lazyZip(vs.tail).foreach { (a, b) =>
          require(b == a + 1,
            s"commit gap v$a -> v$b: refusing to resolve an incomplete " +
              "snapshot")
        }
      }
      schemaAt(log, asOf).map(Action(asOf, "meta", _)).toSeq ++
        liveActions(log, asOf)
    }
    def fromCheckpoint(cv: Long, base: Seq[Action]): Seq[Action] = {
      // a checkpoint at cv proves cv committed even when the
      // pre-checkpoint commit files have been physically deleted
      require(asOf <= math.max(latestVersion(spark, logDir), cv),
        s"asOf=$asOf is past the latest commit")
      val tail = readCommitRange(spark, logDir, cv, asOf)
      val got = tail.map(_.version).distinct
      require(got == (cv + 1 to asOf),
        s"commits missing in ($cv, $asOf]: have $got — refusing to " +
          "resolve an incomplete snapshot")
      val meta = (base ++ tail).filter(_.action == "meta")
        .lastOption.map(a => Action(asOf, "meta", a.path))
      meta.toSeq ++ replayActions(base.filterNot(_.action == "meta"),
        tail.filterNot(_.action == "meta"))
    }
    // candidate checkpoints newest-first: the pointer's target leads
    // when it qualifies, then every listed checkpoint at or below asOf
    val listed = f.listStatus(new Path(logDir)).iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong)
      .filter(_ <= asOf)
      .toSeq.sorted(Ordering[Long].reverse)
    val candidates =
      (lastCheckpointAtOrBefore(spark, logDir, asOf).toSeq ++ listed)
        .distinct
    candidates.iterator
      .map { cv =>
        // ONLY the checkpoint file's own read/parse failure (torn body,
        // vanished file) falls back to the next candidate — the tail
        // replay in fromCheckpoint runs OUTSIDE this try, so its
        // requires (missing commits, asOf past latest, corrupt history)
        // stay loud
        try Some(cv -> readActionFile(f, checkpointPath(logDir, cv), cv,
          "checkpoint"))
        catch {
          case _: IllegalArgumentException | _: java.io.IOException => None
        }
      }
      .collectFirst { case Some((cv, base)) => fromCheckpoint(cv, base) }
      .getOrElse(fullReplay())
  }

  /** Snapshot resolution through the checkpoint: read the newest
    * checkpoint at or below `asOf` (one file, O(live set)) and replay
    * only the commits after it. Without a checkpoint, falls back to the
    * full-log replay. Equal to `liveActions(readLog(..), asOf)` by
    * construction — TxnLogPropertySpec pins the identity at every
    * version of every generated history. Returns file add actions only;
    * the schema rides [[schemaAtVersion]]. */
  def liveActionsAt(spark: SparkSession, logDir: String, asOf: Long)
      : Seq[Action] =
    resolvedActionsAt(spark, logDir, asOf).filterNot(_.action == "meta")

  /** The table schema (as a Spark DataType JSON string) AS OF `asOf`,
    * resolved through the checkpoint like any other snapshot read.
    * None for a table that never declared one. */
  def schemaAtVersion(spark: SparkSession, logDir: String, asOf: Long)
      : Option[String] =
    resolvedActionsAt(spark, logDir, asOf)
      .find(_.action == "meta").map(_.path)

  def liveFilesAt(spark: SparkSession, logDir: String, asOf: Long)
      : Seq[String] = liveActionsAt(spark, logDir, asOf).map(_.path)

  // ---------------------------------------------------------------------
  // Pure log algebra
  // ---------------------------------------------------------------------

  /** Replay `tail` on top of an initial live set — the shared algebra of
    * full-log and checkpointed resolution (pure; property-tested). A
    * re-add of a live path and a remove of a non-live path are history
    * corruption and fail loudly. First-add order is preserved
    * (deterministic read plans); a removed-then-re-added path re-enters
    * at its re-add position, exactly as the full replay orders it. */
  def replayActions(initial: Seq[Action], tail: Seq[Action])
      : Seq[Action] = {
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Action]
    initial.foreach { a =>
      require(!live.contains(a.path), s"checkpoint re-adds ${a.path}")
      live(a.path) = a
    }
    tail.foreach { a =>
      a.action match {
        case "add" =>
          require(!live.contains(a.path),
            s"v${a.version} re-adds live file ${a.path}")
          live(a.path) = a
        case "remove" =>
          require(live.remove(a.path).isDefined,
            s"v${a.version} removes non-live file ${a.path}")
        case other => sys.error(s"v${a.version}: unknown action '$other'")
      }
    }
    live.values.toSeq
  }

  /** Snapshot live ADD actions (path + stats) AS OF `asOf`, replayed from
    * the full log in first-add order. `meta` (schema) actions are not
    * part of the file live set — they resolve via [[schemaAt]]. */
  def liveActions(log: Seq[Action], asOf: Long): Seq[Action] = {
    require(log.nonEmpty && asOf >= log.head.version,
      s"asOf=$asOf precedes the log")
    require(asOf <= log.map(_.version).max,
      s"asOf=$asOf is past the latest commit")
    replayActions(Nil,
      log.filter(a => a.version <= asOf && a.action != "meta"))
  }

  /** The table schema (Spark DataType JSON) AS OF `asOf` from a full
    * log: the LAST `meta` action at or below `asOf` wins — schema
    * changes supersede, they don't accumulate. Pure; the
    * checkpoint-aware variant is [[schemaAtVersion]]. */
  def schemaAt(log: Seq[Action], asOf: Long): Option[String] =
    log.filter(a => a.action == "meta" && a.version <= asOf)
      .lastOption.map(_.path)

  /** May a table's schema evolve from `oldJson` to `newJson` in one
    * metaData commit? The public widening/add-column rules, matched on
    * PHYSICAL names ([[physName]]): every existing column keeps its
    * physical identity and keeps its type or widens it (int→bigint,
    * float→double — old files upcast losslessly at read), a required
    * column may relax to nullable (never the reverse), and new columns
    * may be added only as nullable (old files lack them, so reads must
    * be able to serve null). Under column mapping that allows
    * metadata-only RENAME (the new field carries the old physical name
    * in `graft.phys`); DROP additionally requires the new schema to be
    * FULLY mapped (every field carries an explicit physical name — the
    * public "enable column mapping first" discipline, which keeps a
    * later re-add of the dropped logical name from colliding with the
    * orphaned physical data). Everything else — narrowing, new
    * required columns, and (per ADVICE r17) REORDERING existing
    * columns or duplicate logical/physical names — is a REWRITE, not
    * an evolution, and is rejected at commit. */
  def schemaEvolutionOk(oldJson: String, newJson: String): Boolean = {
    import org.apache.spark.sql.types._
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (IntegerType, LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }
    val oldS = DataType.fromJson(oldJson).asInstanceOf[StructType]
    val newS = DataType.fromJson(newJson).asInstanceOf[StructType]
    val oldPhys = oldS.fields.map(physName).toSeq
    val newPhys = newS.fields.map(physName).toSeq
    // duplicate logical or physical names make resolution ambiguous —
    // never legal (the old by-name map silently collapsed duplicates)
    val uniqueOk = newPhys.distinct.length == newPhys.length &&
      newS.fieldNames.toSeq.distinct.length == newS.fields.length
    // drop is metadata-only ONLY once every column is explicitly mapped
    val fullyMapped = newS.fields.forall(_.metadata.contains("graft.phys"))
    val newByPhys = newS.fields.map(f => physName(f) -> f).toMap
    val keptOk = oldS.fields.forall { of =>
      newByPhys.get(physName(of)) match {
        case Some(nf) =>
          // nullability may relax (required -> nullable), never tighten:
          // existing files already hold nulls a tightened column forbids
          widens(of.dataType, nf.dataType) && (!of.nullable || nf.nullable)
        case None => fullyMapped // a DROP, legal only under full mapping
      }
    }
    // reordering is NOT evolution: surviving old columns keep their
    // relative order, and absent full mapping (no drops possible) the
    // old schema must be a positional prefix of the new one
    val survivors = oldPhys.filter(newByPhys.contains)
    val orderOk = newPhys.filter(oldPhys.toSet) == survivors
    val prefixOk = fullyMapped || newPhys.startsWith(oldPhys)
    val addedOk = newS.fields
      .filterNot(f => oldPhys.contains(physName(f))).forall(_.nullable)
    uniqueOk && keptOk && orderOk && prefixOk && addedOk
  }

  /** Snapshot file set AS OF `asOf` (see [[liveActions]]). */
  def liveFiles(log: Seq[Action], asOf: Long): Seq[String] =
    liveActions(log, asOf).map(_.path)

  /** Parse a DV payload: comma-separated `<leaf>:<rowIndex>` entries,
    * where `leaf` is the parquet part-file name inside the data object
    * (globally unique by construction — Spark part files carry a write
    * UUID) and `rowIndex` is the row's position in that file (the
    * `_metadata.row_index` the scan serves). Position lists stay small
    * by the same discipline as public DVs: a delete that would name a
    * large fraction of an object should rewrite it instead. */
  def dvEntries(payload: String): Seq[(String, Long)] =
    payload.split(',').toSeq.filter(_.nonEmpty).map { e =>
      val i = e.lastIndexOf(':')
      require(i > 0 && i < e.length - 1, s"malformed DV entry: $e")
      (e.substring(0, i), e.substring(i + 1).toLong)
    }

  /** Render DV entries into the payload format (sorted — a DV is a set,
    * so the rendering is canonical and comparable as a string). */
  def dvRender(entries: Seq[(String, Long)]): String =
    entries.sorted.map { case (l, i) => s"$l:$i" }.mkString(",")

  /** Plan a merge-on-read DELETE against one live object: the
    * (leaf, rowIndex) positions of its rows matching `pred`, unioned
    * with the object's current vector (`existing`) — the payload the
    * caller publishes as `removes = Seq(obj), adds = Seq(obj),
    * dvs = Map(obj -> payload)`. The position scan is distributed; only
    * the DELETED positions come to the driver, O(|DV|) like the log
    * metadata itself, with `maxRows` as the loud backstop enforcing the
    * public DV discipline: a delete naming a large fraction of an
    * object should rewrite (compact) it instead of growing a vector. */
  def planDvDelete(spark: SparkSession, objPath: String,
      pred: org.apache.spark.sql.Column, existing: Option[String] = None,
      maxRows: Int = 100000): String = {
    val hits = spark.read.parquet(objPath)
      .where(pred)
      .select(element_at(split(col("_metadata.file_path"), "/"), -1)
        .as("leaf"), col("_metadata.row_index").as("pos"))
      .limit(maxRows + 1).collect()
    require(hits.length <= maxRows,
      s"DV delete names > $maxRows rows of $objPath — rewrite the " +
        "object instead of growing a vector this large")
    val pairs = hits.toSeq.map(r => (r.getString(0), r.getLong(1)))
    dvRender((existing.map(dvEntries).getOrElse(Nil) ++ pairs).distinct)
  }

  /** Distributed read of the snapshot AS OF `asOf` — only the live files,
    * resolved from one checkpoint + the commit tail (or the full log when
    * no checkpoint exists); the data directory is never listed. When the
    * table declares a schema in the log, the read is pinned to it: files
    * written before an add-column evolution serve null for the new
    * columns, and the scan needs NO footer-sampling schema inference —
    * at 100 TB, reading the schema from metadata instead of sampling
    * file footers is the difference the metaData action exists for.
    * Under column mapping the files are read by PHYSICAL name and
    * projected to the logical schema — files from before and after a
    * rename serve through one logical column.
    *
    * Merge-on-read: when live objects carry deletion vectors, the DV'd
    * rows are subtracted by a BROADCAST ANTI-JOIN on
    * (part-file leaf, `_metadata.row_index`) — O(|DV|) driver-side
    * metadata shipped once, zero data rewritten, and the scan itself
    * stays a plain distributed parquet read. */
  def readSnapshot(spark: SparkSession, logDir: String, asOf: Long)
      : DataFrame = {
    val resolved = resolvedActionsAt(spark, logDir, asOf)
    val addActs = resolved.filter(_.action == "add")
    val files = addActs.map(_.path)
    require(files.nonEmpty, s"snapshot v$asOf is empty")
    val logical = resolved.find(_.action == "meta").map { a =>
      org.apache.spark.sql.types.DataType.fromJson(a.path)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val raw = logical match {
      case Some(st) =>
        // files store PHYSICAL names; identity mapping reads unchanged
        val phys = org.apache.spark.sql.types.StructType(st.fields.map(f =>
          org.apache.spark.sql.types.StructField(
            physName(f), f.dataType, f.nullable)))
        spark.read.schema(phys).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
    val dvPairs = addActs.flatMap(a => a.dv.toSeq.flatMap(dvEntries))
    val undeleted =
      if (dvPairs.isEmpty) raw
      else {
        import spark.implicits._
        val dataCols = raw.columns.toSeq
        val dvDf = dvPairs.toDF("__dv_leaf", "__dv_pos")
        raw
          .withColumn("__dv_leaf",
            element_at(split(col("_metadata.file_path"), "/"), -1))
          .withColumn("__dv_pos", col("_metadata.row_index"))
          .join(broadcast(dvDf), Seq("__dv_leaf", "__dv_pos"), "left_anti")
          .select(dataCols.map(c => col(s"`$c`")): _*)
      }
    logical match {
      case Some(st) if st.fields.exists(f => physName(f) != f.name) =>
        undeleted.select(st.fields.toSeq.map(f =>
          col(s"`${physName(f)}`").as(f.name)): _*)
      case _ => undeleted
    }
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
    val added = window.collect { case Action(_, "add", p, _, _) => p }
      .distinct.filter(net(_) > 0)
    val removed = window.collect { case Action(_, "remove", p, _, _) => p }
      .distinct.filter(net(_) < 0)
    (added, removed)
  }

  /** The DV-aware half of CDC: paths live at BOTH ends of
    * `(sinceV, untilV]` whose deletion vector CHANGED — a merge-on-read
    * delete is liveness-neutral (remove + re-add of the same path nets
    * to zero, so [[changedBetween]] reports nothing) yet its rows
    * changed. Returns `(path, dvBefore, dvAfter)`; the deleted rows are
    * exactly the positions in `dvAfter \ dvBefore`, readable from the
    * UNTOUCHED object — O(transaction) consumption, like the add/remove
    * half. */
  def dvChangedBetween(log: Seq[Action], sinceV: Long, untilV: Long)
      : Seq[(String, Option[String], Option[String])] = {
    require(sinceV < untilV, s"empty version range ($sinceV, $untilV]")
    val before = liveActions(log, sinceV).map(a => a.path -> a.dv).toMap
    liveActions(log, untilV)
      .filter(a => before.get(a.path).exists(_ != a.dv))
      .map(a => (a.path, before(a.path), a.dv))
  }

  /** Files physically deletable under a retention floor — deletable
    * exactly when NO snapshot at or above `retain` references the path:
    * its last action at `version <= retain` is a remove (it is dead in
    * snapshot `retain` itself) AND it has no add after `retain` (a
    * later RE-add makes it live again in some retained snapshot — the
    * remove-then-re-add histories `changedBetween` handles net-wise
    * would otherwise lose live data irreversibly here). Files removed
    * AFTER the floor always stay, because snapshot `retain` may still
    * reference them. */
  def vacuumCandidates(log: Seq[Action], retain: Long): Seq[String] = {
    val byPath = log.groupBy(_.path) // groupBy preserves log order
    log.collect { case Action(v, "remove", p, _, _) if v <= retain => p }
      .distinct
      .filter { p =>
        val history = byPath(p)
        val atFloor = history.filter(_.version <= retain)
        atFloor.last.action == "remove" &&
          !history.exists(a => a.version > retain && a.action == "add")
      }
  }

  /** RESTORE — history-preserving rollback (the public Delta RESTORE):
    * append ONE commit that makes the head snapshot equal the snapshot
    * AS OF `toVersion`. Nothing is rewritten or physically deleted —
    * the restore re-adds the target's missing objects (legal re-adds;
    * their files still exist unless vacuum reclaimed them, in which
    * case the later read fails loudly, same as any below-floor time
    * travel) and removes the objects added since. Because the restore
    * is itself a transaction, it can be time-traveled past or restored
    * again. Returns the new head version (the old head if the snapshots
    * already match — an empty commit is illegal, not a no-op). Restores
    * the FILE set; the schema, being append-only-evolving, stays at the
    * head declaration — the restored (older) files remain readable under
    * it, serving null for any column added since. */
  def restore(spark: SparkSession, logDir: String, toVersion: Long)
      : Long = {
    // both snapshots resolve through checkpoints — RESTORE on a
    // long-lived table reads O(checkpoint + tail) twice, never the
    // full history
    val head = latestVersion(spark, logDir)
    require(head >= 0, "cannot restore an empty log")
    val target = liveActionsAt(spark, logDir, toVersion)
    val cur = liveActionsAt(spark, logDir, head)
    val curByPath = cur.map(a => a.path -> a).toMap
    val targetSet = target.map(_.path).toSet
    // a path live in BOTH snapshots whose DV differs (rows were
    // merge-on-read-deleted since the target) is restored by the same
    // atomic remove + re-add that created the DV — re-stamping the
    // TARGET's vector (possibly none: a full row-level undelete)
    val dvSwaps = target.filter(a =>
      curByPath.get(a.path).exists(_.dv != a.dv))
    val adds = target.filterNot(a => curByPath.contains(a.path)) ++ dvSwaps
    val removes = cur.map(_.path).filterNot(targetSet.contains) ++
      dvSwaps.map(_.path)
    if (adds.isEmpty && removes.isEmpty) head
    else {
      commit(spark, logDir, head + 1, adds = adds.map(_.path),
        removes = removes,
        stats = adds.flatMap(a => a.stats.map(a.path -> _)).toMap,
        dvs = adds.flatMap(a => a.dv.map(a.path -> _)).toMap)
      head + 1
    }
  }

  /** SHALLOW CLONE — a NEW table whose v0 references the source
    * snapshot's objects with ZERO data copied (the public Delta SHALLOW
    * CLONE): the clone then diverges with its own commits while the
    * source is untouched, and stats ride along so the clone keeps
    * metadata-only skipping. The caveat is the public one, not hidden:
    * the clone references the SOURCE's objects, so a vacuum/GC on the
    * source can break clones — coordinate retention across clones or
    * deep-copy before reclaiming. */
  def shallowClone(spark: SparkSession, srcLogDir: String, asOf: Long,
      dstLogDir: String): Unit = {
    val resolved = resolvedActionsAt(spark, srcLogDir, asOf)
    val live = resolved.filter(_.action == "add")
    require(live.nonEmpty, s"cannot clone an empty snapshot v$asOf")
    commit(spark, dstLogDir, 0L, adds = live.map(_.path),
      stats = live.flatMap(a => a.stats.map(a.path -> _)).toMap,
      meta = resolved.find(_.action == "meta").map(_.path),
      dvs = live.flatMap(a => a.dv.map(a.path -> _)).toMap)
  }

  /** ORPHAN reclaim — the other half of storage GC: a crashed writer's
    * half-written object sits under the table root referenced by NO
    * commit (its publish never happened, so snapshots cannot see it —
    * TxnLogSpec pins that invisibility), and nothing above ever deletes
    * it. An object is an orphan exactly when the log never NAMED it
    * (neither an add nor a remove — removed files are [[vacuum]]'s
    * business, under the retention floor) and it is older than the
    * grace horizon (a writer may be mid-stage right now: publish
    * happens AFTER the object write, so anything younger than
    * `graceMs` must be presumed in-flight — the public Delta VACUUM
    * "untracked files + retention window" rule). This is the ONE
    * operation that legitimately lists the data directory: GC is
    * reconciling the physical store against the log, which metadata
    * alone cannot do. `nowMs` is passed in, not sampled, so tests and
    * replays are deterministic. Returns the deleted paths. */
  def vacuumOrphans(spark: SparkSession, tableRoot: String,
      logDir: String, graceMs: Long, nowMs: Long): Seq[String] = {
    val referenced = readLog(spark, logDir).map(_.path).toSet
    val f = fs(spark, tableRoot)
    val logLeaf = new Path(logDir).getName
    f.listStatus(new Path(tableRoot)).toSeq
      .filter { st =>
        st.getPath.getName != logLeaf &&
          !referenced.contains(st.getPath.toString) &&
          !referenced.contains(st.getPath.toUri.getPath) &&
          st.getModificationTime < nowMs - graceMs
      }
      .map { st =>
        f.delete(st.getPath, true)
        st.getPath.toUri.getPath
      }
  }

  /** Physically delete the vacuum candidates. Returns the deleted paths.
    * Irreversible by design — time travel to versions older than the
    * retention floor fails afterwards (resolution still succeeds, the
    * read hits the missing file), exactly the public Delta/Iceberg
    * VACUUM contract. `keepCheckpoints > 0` additionally GCs stale
    * checkpoint files in the same maintenance pass (see
    * [[gcCheckpoints]]) — the metadata half of the reclaim a long-lived
    * table needs. */
  def vacuum(spark: SparkSession, logDir: String, retain: Long,
      keepCheckpoints: Int = 0): Seq[String] = {
    val victims = vacuumCandidates(readLog(spark, logDir), retain)
    val f = fs(spark, logDir)
    // recursive: a log entry is a data OBJECT — the directory one
    // distributed write laid down, not necessarily a single file
    victims.foreach { p => f.delete(new Path(p), true) }
    if (keepCheckpoints > 0) gcCheckpoints(spark, logDir, keepCheckpoints)
    victims
  }

  /** Checkpoint GC — the metadata counterpart of [[vacuum]]: a table
    * checkpointing every N commits accumulates O(commits/N) checkpoint
    * files forever without this. Keeps the newest `keep` checkpoints
    * and ALWAYS the one `_last_checkpoint` points to (a reader that
    * just loaded the pointer must find its target); deletes the rest.
    * Returns the deleted checkpoint versions.
    *
    * Safety: a checkpoint is a pure SHORTCUT — deleting one never loses
    * state, because resolution falls back to an older retained
    * checkpoint or the full commit replay ([[lastCheckpointAtOrBefore]]
    * lists, it does not trust only the pointer). The one coupling to
    * respect operationally: pre-checkpoint COMMIT files may only be
    * pruned for versions covered by a checkpoint you retain — GC
    * checkpoints before pruning commits, never after. The resolution-
    * survives-GC property is pinned over the 200-history harness in
    * TxnLogPropertySpec. */
  def gcCheckpoints(spark: SparkSession, logDir: String, keep: Int)
      : Seq[Long] = {
    require(keep >= 1, s"must keep at least one checkpoint, got $keep")
    val f = fs(spark, logDir)
    val all = f.listStatus(new Path(logDir)).iterator
      .map(_.getPath.getName)
      .filter(_.endsWith(".checkpoint"))
      .map(_.stripSuffix(".checkpoint").toLong)
      .toSeq.sorted
    val ptrP = lastCheckpointPath(logDir)
    val pointed: Option[Long] =
      if (!f.exists(ptrP)) None
      else {
        val in = f.open(ptrP)
        val v =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        v.toLongOption
      }
    val retained = all.takeRight(keep).toSet ++ pointed
    val victims = all.filterNot(retained.contains)
    victims.foreach(v => f.delete(checkpointPath(logDir, v), false))
    victims
  }
}
