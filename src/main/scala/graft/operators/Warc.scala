package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) record extraction — the ingest format of every
  * web-scale text pipeline (Common Crawl ships ~100 TB/month of
  * WARC). A crawl shard is one string of concatenated records:
  *
  * {{{
  * WARC/1.0\r\n
  * WARC-Type: response\r\n
  * WARC-Target-URI: https://…\r\n
  * Content-Length: N\r\n
  * \r\n
  * <N chars of content block>\r\n\r\n
  * }}}
  *
  * Parsing is OFFSET-DRIVEN: `Content-Length` decides where each
  * record's block ends, so a payload that itself contains
  * `WARC/1.0` (a page quoting a WARC, an HTTP response embedding
  * one) cannot split a record — the failure mode of every
  * regex-split "parser". For `response` records whose block is an
  * HTTP message, the status code and body are peeled off the
  * embedded HTTP envelope; other record types (warcinfo, request,
  * resource, revisit, metadata) surface their block verbatim.
  *
  * Scale design: one shard string → its records is per-row
  * imperative work with NO cross-row state, so it rides the same
  * batched `mapPartitions` boundary as the media codecs
  * ([[Multimodal.gzipMeta]]) — each task walks its own shards,
  * nothing shuffles until the caller aggregates. On a real crawl
  * the upstream split is file-granular (one WARC = one input row or
  * one `wholeTextFiles` entry); gzip members compose via
  * [[Multimodal.gzipMeta]]'s codec.
  *
  * TWO parse modes — pick by what the column holds:
  *   - [[parseShardBytes]]/[[parseWarcBytes]] (binary column) is the
  *     ISO 28500 contract: `Content-Length` counts OCTETS. This is
  *     the mode for real crawl data — raw `.warc` bytes, gzip-member
  *     output — where payloads carry multi-byte UTF-8 and binary.
  *   - [[parseShard]]/[[parseWarc]] (string column) counts CHARS of
  *     the already-decoded shard — the contract the mirrored DuckDB
  *     oracle can replay. CAVEAT: feeding a DECODED real crawl file
  *     here mis-offsets every record after the first multi-byte
  *     character (octets ≠ chars) and cascades into malformed
  *     quarantines — that is the byte mode's job; text mode is for
  *     shards that were STRINGS all along (synthetic corpora, logs).
  *
  * A malformed region (missing header terminator, unparseable or
  * overrunning Content-Length) emits ONE `malformed` row carrying
  * the failing offset in `content_length` and parsing of that shard
  * stops — strict-quarantine like the codec boundary, never a
  * silent skip. */
object Warc {

  /** One parsed record; `httpStatus`/`body` peel the HTTP envelope
    * for response blocks, otherwise `body` IS the block. */
  final case class Rec(
      recIdx: Long,
      warcType: String,
      targetUri: Option[String],
      recordId: Option[String],
      contentLength: Long,
      httpStatus: Option[Long],
      body: String)

  private val Version = "WARC/1.0\r\n"
  private val HdrEnd = "\r\n\r\n"

  private def headerMap(headerText: String): Map[String, String] =
    headerText.split("\r\n").iterator
      .map(_.split(":", 2))
      .collect { case Array(k, v) => k.trim.toLowerCase -> v.trim }
      .toMap

  /** Walk one shard string into records (pure, driver-testable).
    * CHAR-mode offsets — see the object doc's mode caveat. */
  def parseShard(shard: String): Seq[Rec] = {
    val out = Seq.newBuilder[Rec]
    var pos = 0
    var idx = 0L
    var done = false
    def malformed(at: Long): Unit = {
      out += Rec(idx, "malformed", None, None, at, None, "")
      done = true
    }
    while (!done) {
      val start = shard.indexOf(Version, pos)
      if (start < 0) done = true
      else {
        val hdrEnd = shard.indexOf(HdrEnd, start)
        if (hdrEnd < 0) malformed(start.toLong)
        else {
          val headers =
            headerMap(shard.substring(start + Version.length, hdrEnd))
          headers.get("content-length")
            .flatMap(_.toLongOption).filter(_ >= 0) match {
            case None => malformed(start.toLong)
            case Some(len) =>
              val blockStart = hdrEnd + HdrEnd.length
              if (blockStart + len > shard.length)
                malformed(start.toLong)
              else {
                val block =
                  shard.substring(blockStart, blockStart + len.toInt)
                val typ = headers.getOrElse("warc-type", "unknown")
                val (status, body) =
                  if (typ == "response" && block.startsWith("HTTP/")) {
                    val split = block.indexOf(HdrEnd)
                    val statusLine =
                      if (split < 0) block
                      else block.substring(0, block.indexOf("\r\n"))
                    val code = statusLine.split(" ")
                      .lift(1).flatMap(_.toLongOption)
                    val b =
                      if (split < 0) ""
                      else block.substring(split + HdrEnd.length)
                    (code, b)
                  } else (None, block)
                out += Rec(idx, typ, headers.get("warc-target-uri"),
                  headers.get("warc-record-id"), len, status, body)
                idx += 1
                pos = blockStart + len.toInt
              }
          }
        }
      }
    }
    out.result()
  }

  /** One byte-mode record: `body` is the raw block (or the raw HTTP
    * body for peeled response records) — octet-exact, binary-safe. */
  final case class BRec(
      recIdx: Long,
      warcType: String,
      targetUri: Option[String],
      recordId: Option[String],
      contentLength: Long,
      httpStatus: Option[Long],
      body: Array[Byte])

  private def indexOfBytes(
      hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Walk one RAW shard (octets) into records — the ISO 28500
    * contract for real crawl data: `Content-Length` counts bytes, so
    * multi-byte UTF-8 and binary payloads offset correctly where the
    * char-mode walk would drift. Headers decode as UTF-8 (they are
    * ASCII per spec; lossy replacement on violations), bodies stay
    * bytes. Same strict quarantine as [[parseShard]]. */
  def parseShardBytes(shard: Array[Byte]): Seq[BRec] = {
    val version = Version.getBytes("US-ASCII")
    val hdrSep = HdrEnd.getBytes("US-ASCII")
    val out = Seq.newBuilder[BRec]
    var pos = 0
    var idx = 0L
    var done = false
    def malformed(at: Long): Unit = {
      out += BRec(idx, "malformed", None, None, at, None,
        Array.emptyByteArray)
      done = true
    }
    while (!done) {
      val start = indexOfBytes(shard, version, pos)
      if (start < 0) done = true
      else {
        val hdrEnd = indexOfBytes(shard, hdrSep, start)
        if (hdrEnd < 0) malformed(start.toLong)
        else {
          val headers = headerMap(new String(shard,
            start + version.length, hdrEnd - start - version.length,
            java.nio.charset.StandardCharsets.UTF_8))
          headers.get("content-length")
            .flatMap(_.toLongOption).filter(_ >= 0) match {
            case None => malformed(start.toLong)
            case Some(len) =>
              val blockStart = hdrEnd + hdrSep.length
              if (blockStart + len > shard.length)
                malformed(start.toLong)
              else {
                val block = java.util.Arrays.copyOfRange(
                  shard, blockStart, blockStart + len.toInt)
                val typ = headers.getOrElse("warc-type", "unknown")
                val httpMark = "HTTP/".getBytes("US-ASCII")
                val (status, body) =
                  if (typ == "response" &&
                      indexOfBytes(block, httpMark, 0) == 0) {
                    val split = indexOfBytes(block, hdrSep, 0)
                    val eol = indexOfBytes(block,
                      "\r\n".getBytes("US-ASCII"), 0)
                    val statusLine = new String(block, 0,
                      if (eol < 0) block.length else eol,
                      java.nio.charset.StandardCharsets.UTF_8)
                    val code = statusLine.split(" ")
                      .lift(1).flatMap(_.toLongOption)
                    val b =
                      if (split < 0) Array.emptyByteArray
                      else java.util.Arrays.copyOfRange(block,
                        split + hdrSep.length, block.length)
                    (code, b)
                  } else (None, block)
                out += BRec(idx, typ, headers.get("warc-target-uri"),
                  headers.get("warc-record-id"), len, status, body)
                idx += 1
                pos = blockStart + len.toInt
              }
          }
        }
      }
    }
    out.result()
  }

  /** Binary shard column → one row per record, bodies kept as BYTES
    * (decode downstream only where the payload is known text).
    * Output: (idCol, rec_idx, warc_type, target_uri, record_id,
    * content_length, http_status, body binary). NULL shards
    * quarantine as a single `malformed` row. */
  def parseWarcBytes(
      df: DataFrame,
      idCol: String,
      warcCol: String,
      batchSize: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(warcCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, shard) =>
            val recs =
              if (shard == null) Seq(BRec(0L, "malformed", None, None,
                -1L, None, Array.emptyByteArray))
              else parseShardBytes(shard)
            recs.map(r => (id, r.recIdx, r.warcType, r.targetUri,
              r.recordId, r.contentLength, r.httpStatus, r.body))
          }
        }
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "record_id",
        "content_length", "http_status", "body")
  }

  /** Shard column → one row per record. Output: (idCol, rec_idx,
    * warc_type, target_uri, record_id, content_length, http_status,
    * body). NULL shards quarantine as a single `malformed` row. */
  def parseWarc(
      df: DataFrame,
      idCol: String,
      warcCol: String,
      batchSize: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("string"), col(warcCol))
      .as[(String, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.flatMap { case (id, shard) =>
            val recs =
              if (shard == null) Seq(Rec(0L, "malformed", None, None,
                -1L, None, ""))
              else parseShard(shard)
            recs.map(r => (id, r.recIdx, r.warcType, r.targetUri,
              r.recordId, r.contentLength, r.httpStatus, r.body))
          }
        }
      }
      .toDF(idCol, "rec_idx", "warc_type", "target_uri", "record_id",
        "content_length", "http_status", "body")
  }
}
