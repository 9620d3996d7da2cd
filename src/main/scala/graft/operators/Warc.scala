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
  * [[Multimodal.gzipMeta]]'s codec. Text-mode (String) is the
  * char-exact twin of the byte parser: WARC headers are ASCII and
  * `Content-Length` here counts chars of the already-decoded shard,
  * which is the contract the mirrored DuckDB oracle can replay.
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

  /** Walk one shard string into records (pure, driver-testable). */
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
          val headers = shard.substring(start + Version.length, hdrEnd)
            .split("\r\n").iterator
            .map(_.split(":", 2))
            .collect { case Array(k, v) =>
              k.trim.toLowerCase -> v.trim }
            .toMap
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
