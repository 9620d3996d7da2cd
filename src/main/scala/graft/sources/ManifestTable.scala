package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Versioned-manifest table commit — the transactional close of the
  * T7 exactly-once story (SURVEY §2.8).
  *
  * [[Tables.appendDedup]] makes re-runs safe by re-reading the sink's
  * keys; that works, but a crash between a data append and the state
  * swap still double-applies on any sink that is NOT re-read before
  * writing (the reference has the mirror-image bug: it advances state
  * even when the write failed, pipeline.py:562-568, losing rows).
  * This sink closes the window structurally, Delta-style but with no
  * external dependency:
  *
  * Layout under `baseDir/table/`:
  *   - `data/<txn>-<uuid>/part-*.parquet` — data files, written FIRST,
  *     invisible until referenced by a manifest;
  *   - `_log/v00000000001` … — one small manifest file per commit,
  *     listing the files that version adds (`add:` lines), the
  *     transaction id (`txn:` line) and an optional opaque state
  *     payload (`state:` line).
  *
  * The commit point is a single Hadoop `rename` of the manifest into
  * `_log/` — atomic on HDFS and local FS. Crash before the rename ⇒
  * orphan data files that no reader ever sees (reclaimed by
  * [[vacuum]]); crash after ⇒ the commit is complete, and re-running
  * the same `txnId` is a recorded no-op. Because the state payload
  * rides in the SAME manifest, "data committed but watermark not" can
  * no longer happen — the pair is one rename.
  *
  * Readers take the union of `add:` entries across contiguous
  * versions — a 100 TB table is listed via one small-file directory
  * scan of `_log/`, never a recursive data-directory listing.
  *
  * Concurrency stance: single writer per table (the reference's sync
  * is a single loop; Spark jobs coordinate upstream). On HDFS the
  * rename doubles as optimistic concurrency control — rename onto an
  * existing version fails and the loser retries against the new log.
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
      adds: Seq[String], state: Option[String])

  /** All committed manifests, oldest first. */
  private def readLog(spark: SparkSession, tableDir: String): Seq[Manifest] = {
    val (fs, log) = fsAndPath(spark, s"$tableDir/$LogDir")
    if (!fs.exists(log)) return Nil
    fs.listStatus(log).toSeq
      .map(_.getPath)
      .filter(_.getName.matches("v\\d{20}"))
      .sortBy(_.getName)
      .map { p =>
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val lines = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").toSeq.filter(_.nonEmpty)
        Manifest(
          version = p.getName.drop(1).toLong,
          txn = lines.collectFirst { case l if l.startsWith("txn:") => l.drop(4) }
            .getOrElse(""),
          adds = lines.collect { case l if l.startsWith("add:") => l.drop(4) },
          state = lines.collectFirst { case l if l.startsWith("state:") => l.drop(6) })
      }
  }

  /** Transaction ids already committed — the idempotence check. */
  def committedTxns(spark: SparkSession, baseDir: String, table: String): Set[String] =
    readLog(spark, Tables.path(baseDir, table)).map(_.txn).filter(_.nonEmpty).toSet

  /** The state payload of the LATEST commit that carried one (e.g. the
    * sync watermark that was advanced atomically with its data). */
  def lastState(spark: SparkSession, baseDir: String, table: String): Option[String] =
    readLog(spark, Tables.path(baseDir, table)).reverse.flatMap(_.state).headOption

  /** Append `batch` and (optionally) advance an opaque state payload in
    * ONE atomic commit. Re-running a `txnId` that already committed is
    * a no-op returning 0 — crash-rerun cannot double-apply.
    *
    * `beforeCommit` is a test seam: it runs after the data files are
    * durable but before the manifest rename (the crash window the
    * protocol closes). Production callers leave the default. */
  def commit(
      batch: DataFrame,
      baseDir: String,
      table: String,
      txnId: String,
      state: Option[String] = None,
      beforeCommit: () => Unit = () => ()): Long = {
    require(txnId.nonEmpty && !txnId.contains("\n"), s"bad txnId: $txnId")
    require(state.forall(!_.contains("\n")), "state payload must be one line")
    val spark = batch.sparkSession
    val tableDir = Tables.path(baseDir, table)
    if (committedTxns(spark, baseDir, table).contains(txnId)) return 0L

    // 1. Data files first — invisible until a manifest references them.
    val safeTxn = txnId.replaceAll("[^A-Za-z0-9._-]", "_")
    val rel = s"$DataDir/$safeTxn-${java.util.UUID.randomUUID()}"
    batch.write.mode(SaveMode.ErrorIfExists).parquet(s"$tableDir/$rel")
    val (fs, dataPath) = fsAndPath(spark, s"$tableDir/$rel")
    val files = fs.listStatus(dataPath).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).sorted
    val rows = spark.read.parquet(s"$tableDir/$rel").count()

    beforeCommit()

    // 2. Commit = one rename. Retry versions forward: on HDFS a lost
    // race fails the rename; re-check the log (the winner may have
    // been OUR txn from a previous attempt) and try the next slot.
    val (_, logPath) = fsAndPath(spark, s"$tableDir/$LogDir")
    fs.mkdirs(logPath)
    val body = (Seq(s"txn:$txnId") ++ files.map(f => s"add:$rel/$f") ++
      state.map(s => s"state:$s")).mkString("", "\n", "\n")
    val tmp = new org.apache.hadoop.fs.Path(logPath,
      s"_tmp_${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      if (attempts > 100) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"manifest commit for $table/$txnId lost 100 races — aborting")
      }
      val log = readLog(spark, tableDir)
      if (log.exists(_.txn == txnId)) { // a prior attempt of ours won
        fs.delete(tmp, false)
        return 0L
      }
      val next = new org.apache.hadoop.fs.Path(logPath,
        versionName(log.lastOption.map(_.version).getOrElse(0L) + 1))
      done = !fs.exists(next) && fs.rename(tmp, next)
    }
    rows
  }

  /** Read the committed snapshot. `schema` serves the zero-commit case
    * (a table that exists logically but has no data yet). */
  def read(
      spark: SparkSession,
      baseDir: String,
      table: String,
      schema: Option[StructType] = None): DataFrame = {
    val tableDir = Tables.path(baseDir, table)
    val adds = readLog(spark, tableDir).flatMap(_.adds)
    if (adds.isEmpty) {
      schema.map(s => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s))
        .getOrElse(throw new java.io.FileNotFoundException(
          s"$tableDir has no committed data and no schema was supplied"))
    } else spark.read.parquet(adds.map(a => s"$tableDir/$a"): _*)
  }

  /** Delete orphan data files (written by a crashed commit, referenced
    * by no manifest). Safe any time under the single-writer stance.
    * Returns the number of files removed. */
  def vacuum(spark: SparkSession, baseDir: String, table: String): Int = {
    val tableDir = Tables.path(baseDir, table)
    val live = readLog(spark, tableDir).flatMap(_.adds).toSet
    val (fs, dataRoot) = fsAndPath(spark, s"$tableDir/$DataDir")
    if (!fs.exists(dataRoot)) return 0
    var removed = 0
    fs.listStatus(dataRoot).foreach { dir =>
      val keep = fs.listStatus(dir.getPath).exists { f =>
        live.contains(s"$DataDir/${dir.getPath.getName}/${f.getPath.getName}")
      }
      if (!keep) { fs.delete(dir.getPath, true); removed += 1 }
    }
    removed
  }
}
