package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned-manifest commits — the transactional close of the T7
  * exactly-once story (SURVEY §2.8).
  *
  * [[Tables.appendDedup]] makes re-runs safe by re-reading the sink's
  * keys; that works, but a crash between a data append and the state
  * swap still double-applies on any sink that is NOT re-read before
  * writing (the reference has the mirror-image bug: it advances state
  * even when the write failed, pipeline.py:562-568, losing rows).
  * This sink closes the window structurally, Delta-style but with no
  * external dependency — and the log spans a whole BASE DIRECTORY, so
  * one commit can atomically append to several tables AND replace a
  * state snapshot:
  *
  * Layout under `baseDir/`:
  *   - `<table>/data/<txn>-<uuid>/part-*.parquet` — data files,
  *     written FIRST, invisible until referenced by a manifest;
  *   - `_log/v00000000001` … — one small manifest file per commit:
  *     `txn:<id>` (idempotence key), `add:<table>/…` file references,
  *     `snap:<table>` markers (this version REPLACES that table's
  *     contents with its own adds — snapshot semantics for state
  *     tables), and an optional one-line `state:` payload.
  *
  * The commit point is a single Hadoop `rename` of the manifest into
  * `_log/` — atomic on HDFS and local FS. Crash before the rename ⇒
  * orphan data files that no reader ever sees (reclaimed by
  * [[vacuum]]); crash after ⇒ the commit is complete, and re-running
  * the same `txnId` is a recorded no-op. Because every table touched
  * by a sync rides in the SAME manifest, "some sinks advanced but not
  * the watermark" can no longer happen — the whole sync is one rename.
  *
  * Readers take the union of `add:` entries across contiguous
  * versions (resetting at `snap:` markers) — a 100 TB table is listed
  * via one small-file directory scan of `_log/`, never a recursive
  * data-directory listing.
  *
  * Concurrency stance: single writer per base dir (the reference's
  * sync is a single loop; Spark jobs coordinate upstream). On HDFS the
  * rename doubles as optimistic concurrency control — rename onto an
  * existing version fails and the loser retries against the new log.
  * On local/POSIX filesystems rename OVERWRITES the destination, so
  * the version slot is claimed via hard link instead (atomic
  * create-exclusive, and it publishes the fully-written tmp file in
  * one syscall). Object stores without atomic rename-if-absent or
  * link would need an external lock — out of scope here.
  */
object ManifestTable {

  private val LogDir = "_log"
  private val DataDir = "data"

  private def fsAndPath(spark: SparkSession, p: String) = {
    val hp = new org.apache.hadoop.fs.Path(p)
    (hp.getFileSystem(spark.sessionState.newHadoopConf()), hp)
  }

  private def versionName(v: Long): String = f"v$v%020d"

  private case class Manifest(version: Long, txn: String,
      adds: Seq[String], snaps: Seq[String], state: Option[String])

  private def parseManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Manifest = {
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val lines = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
    Manifest(
      version = p.getName.drop(1).toLong,
      txn = lines.collectFirst { case l if l.startsWith("txn:") => l.drop(4) }
        .getOrElse(""),
      adds = lines.collect { case l if l.startsWith("add:") => l.drop(4) },
      snaps = lines.collect { case l if l.startsWith("snap:") => l.drop(5) },
      state = lines.collectFirst { case l if l.startsWith("state:") => l.drop(6) })
  }

  /** Committed manifests with version > `after`, oldest first — the
    * incremental read: commit retries re-open only NEW versions, not
    * the whole O(versions) history per attempt. */
  private def readLogAfter(
      spark: SparkSession, baseDir: String, after: Long): Seq[Manifest] = {
    val (fs, log) = fsAndPath(spark, s"$baseDir/$LogDir")
    if (!fs.exists(log)) return Nil
    fs.listStatus(log).toSeq
      .map(_.getPath)
      .filter(p => p.getName.matches("v\\d{20}") && p.getName.drop(1).toLong > after)
      .sortBy(_.getName)
      .map(p => parseManifest(fs, p))
  }

  /** All committed manifests, oldest first. */
  private def readLog(spark: SparkSession, baseDir: String): Seq[Manifest] =
    readLogAfter(spark, baseDir, 0L)

  /** Transaction ids already committed — the idempotence check. */
  def committedTxns(spark: SparkSession, baseDir: String): Set[String] =
    readLog(spark, baseDir).map(_.txn).filter(_.nonEmpty).toSet

  /** The state payload of the LATEST commit that carried one (e.g. the
    * sync watermark that was advanced atomically with its data). */
  def lastState(spark: SparkSession, baseDir: String): Option[String] =
    readLog(spark, baseDir).reverse.flatMap(_.state).headOption

  /** The live file set per the log: appends accumulate; a `snap:`
    * marker resets its table to that manifest's adds. */
  private def liveFiles(log: Seq[Manifest], table: String): Seq[String] = {
    val prefix = s"$table/"
    log.foldLeft(Vector.empty[String]) { (acc, m) =>
      val mine = m.adds.filter(_.startsWith(prefix))
      if (m.snaps.contains(table)) mine.toVector else acc ++ mine
    }
  }

  /** Single-table append facade over [[commitMulti]]. */
  def commit(
      batch: DataFrame,
      baseDir: String,
      table: String,
      txnId: String,
      state: Option[String] = None,
      beforeCommit: () => Unit = () => ()): Long =
    commitMulti(batch.sparkSession, baseDir, txnId,
      appends = Map(table -> batch), state = state,
      beforeCommit = beforeCommit).values.sum

  /** Atomically commit appends to several tables plus full-replace
    * snapshots (state tables) in ONE manifest rename. Re-running a
    * `txnId` that already committed is a no-op returning an empty map
    * — crash-rerun cannot double-apply, and no subset of the tables
    * can ever be visible without the rest.
    *
    * `beforeCommit` is a test seam: it runs after all data files are
    * durable but before the manifest rename (the crash window the
    * protocol closes). Production callers leave the default. */
  def commitMulti(
      spark: SparkSession,
      baseDir: String,
      txnId: String,
      appends: Map[String, DataFrame] = Map.empty,
      snapshots: Map[String, DataFrame] = Map.empty,
      state: Option[String] = None,
      beforeCommit: () => Unit = () => ()): Map[String, Long] = {
    require(txnId.nonEmpty && !txnId.contains("\n"), s"bad txnId: $txnId")
    require(state.forall(!_.contains("\n")), "state payload must be one line")
    require((appends.keySet & snapshots.keySet).isEmpty,
      "a table cannot be both appended and snapshotted in one commit")
    // One full log parse; the retry loop below only reads NEWER versions.
    var log = readLog(spark, baseDir)
    if (log.exists(_.txn == txnId)) return Map.empty

    // 1. Data files first — invisible until a manifest references them.
    val safeTxn = txnId.replaceAll("[^A-Za-z0-9._-]", "_")
    def writeOut(table: String, df: DataFrame): (Seq[String], Long) = {
      val rel = s"$table/$DataDir/$safeTxn-${java.util.UUID.randomUUID()}"
      df.write.mode(SaveMode.ErrorIfExists).parquet(s"$baseDir/$rel")
      val (fs, dataPath) = fsAndPath(spark, s"$baseDir/$rel")
      val files = fs.listStatus(dataPath).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      // Row counts from the parquet footers we just wrote — driver-side
      // metadata reads, not a second Spark scan job per table.
      val conf = spark.sessionState.newHadoopConf()
      val n = files.map { f =>
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
      (files.map(f => s"$rel/${f.getName}"), n)
    }
    val written = (appends ++ snapshots).map { case (t, df) => t -> writeOut(t, df) }

    beforeCommit()

    // 2. Commit = one atomic claim of the next version slot. On HDFS
    // that is a rename (rename onto an existing path fails). On local /
    // POSIX filesystems rename OVERWRITES, so rename-as-OCC does not
    // hold — there we claim via hard link, which is create-exclusive
    // AND publishes the fully-written tmp content in one syscall.
    // Retry versions forward: on a lost race, re-check only the new
    // log entries (the winner may have been OUR txn from a previous
    // attempt) and try the next slot.
    val (fs, logPath) = fsAndPath(spark, s"$baseDir/$LogDir")
    fs.mkdirs(logPath)
    val body = (Seq(s"txn:$txnId") ++
      snapshots.keys.toSeq.sorted.map(t => s"snap:$t") ++
      written.toSeq.sortBy(_._1).flatMap(_._2._1).map(f => s"add:$f") ++
      state.map(s => s"state:$s")).mkString("", "\n", "\n")
    val tmp = new org.apache.hadoop.fs.Path(logPath,
      s"_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    def claim(next: org.apache.hadoop.fs.Path): Boolean =
      if (fs.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(next.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else !fs.exists(next) && fs.rename(tmp, next)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 100) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"manifest commit for $txnId lost 100 races — aborting")
      }
      log = log ++ readLogAfter(spark, baseDir,
        log.lastOption.map(_.version).getOrElse(0L))
      if (log.exists(_.txn == txnId)) { // a prior attempt of ours won
        fs.delete(tmp, false)
        return Map.empty
      }
      done = claim(new org.apache.hadoop.fs.Path(logPath,
        versionName(log.lastOption.map(_.version).getOrElse(0L) + 1)))
    }
    if (fs.getScheme == "file") fs.delete(tmp, false)
    written.map { case (t, (_, n)) => t -> n }
  }

  /** Read the committed snapshot of one table. `schema` serves the
    * zero-commit case (a table that exists logically but has no data
    * yet). */
  def read(
      spark: SparkSession,
      baseDir: String,
      table: String,
      schema: Option[StructType] = None): DataFrame = {
    val files = liveFiles(readLog(spark, baseDir), table)
    if (files.isEmpty) {
      schema.map(s => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
        .getOrElse(throw new java.io.FileNotFoundException(
          s"$baseDir/$table has no committed data and no schema was supplied"))
    } else spark.read.parquet(files.map(f => s"$baseDir/$f"): _*)
  }

  /** Delete orphan data dirs under one table (written by a crashed
    * commit, referenced by NO manifest — old snapshot versions stay,
    * preserving time travel). Safe any time under the single-writer
    * stance. Returns the number of directories removed. */
  def vacuum(spark: SparkSession, baseDir: String, table: String): Int = {
    val referenced = readLog(spark, baseDir).flatMap(_.adds).toSet
    val (fs, dataRoot) = fsAndPath(spark, s"$baseDir/$table/$DataDir")
    if (!fs.exists(dataRoot)) return 0
    var removed = 0
    fs.listStatus(dataRoot).foreach { dir =>
      val keep = fs.listStatus(dir.getPath).exists { f =>
        referenced.contains(s"$table/$DataDir/${dir.getPath.getName}/${f.getPath.getName}")
      }
      if (!keep) { fs.delete(dir.getPath, true); removed += 1 }
    }
    removed
  }
}
