package graft.streaming

import graft.SparkSpec
import graft.operators.Warc
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming WARC ingest: the stream must extract the same records
  * the batch parser does (however micro-batched), keep only HTTP-200
  * documents, and dedup/land exactly once across restarts. */
class WarcStreamSpec extends SparkSpec {

  private val crlf = "\r\n"
  private def ts(s: String) = Timestamp.valueOf(s)

  private def rec(typ: String, uri: String, block: String): String =
    s"WARC/1.0${crlf}WARC-Type: $typ${crlf}" +
      s"WARC-Target-URI: $uri${crlf}" +
      s"Content-Length: ${block.length}$crlf$crlf$block$crlf$crlf"

  private def http(status: String, body: String): String =
    s"HTTP/1.1 $status${crlf}Content-Type: text/plain$crlf$crlf$body"

  private val longA =
    "the quick brown fox jumps over the lazy dog and runs far home"
  private val longB =
    "a completely different page about the distributed stream " +
      "processing systems of today"

  test("recordsOf: stream extraction matches the batch parser across batches") {
    import spark.implicits._
    val s1 = rec("warcinfo", "meta", "software: graft") +
      rec("response", "https://a/1", http("200 OK", longA)) +
      rec("response", "https://a/2", http("404 Not Found", "nope"))
    val s2 = rec("resource", "https://b/raw", "raw bytes here") +
      rec("response", "https://b/3", http("200 OK", longB))
    val input = MemoryStream[(String, Timestamp, String)](spark)
    val q = WarcStream.recordsOf(
        input.toDF().toDF("sid", "ts", "warc"), "sid", "ts", "warc")
      .writeStream.format("memory").queryName("wrecs")
      .outputMode("append").start()
    try {
      input.addData(("s1", ts("2024-01-01 10:00:00"), s1))
      q.processAllAvailable()
      input.addData(("s2", ts("2024-01-01 10:05:00"), s2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("wrecs")
      .select("sid", "rec_idx", "warc_type", "target_uri",
        "content_length", "http_status", "body")
      .collect().map(_.toSeq).toSet
    val batch = Warc.parseWarc(
        Seq(("s1", s1), ("s2", s2)).toDF("sid", "warc"), "sid", "warc")
      .select("sid", "rec_idx", "warc_type", "target_uri",
        "content_length", "http_status", "body")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch && streamed.size == 5)
  }

  test("warcIngest: 200s only, gate + dedup state, stable doc ids") {
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp, String)](spark)
    val q = WarcStream.warcIngest(
        input.toDF().toDF("sid", "ts", "warc"), "sid", "ts", "warc")
      .writeStream.format("memory").queryName("wdocs")
      .outputMode("append").start()
    try {
      input.addData(("s1", ts("2024-01-01 10:00:00"),
        rec("response", "https://a/1", http("200 OK", longA)) +
          rec("response", "https://a/2", http("500 Oops", longB)) +
          rec("response", "https://a/3", http("200 OK", "tiny"))))
      q.processAllAvailable()
      // Second shard: a 200 duplicate of longA (content dedup must
      // drop it) and a genuinely new 200.
      input.addData(("s2", ts("2024-01-01 10:10:00"),
        rec("response", "https://b/1", http("200 OK", longA)) +
          rec("response", "https://b/2", http("200 OK", longB))))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("wdocs").select("doc_id")
      .as[String].collect().sorted.toSeq
    // s1/0 = longA (first), s1/1 = 500 -> dropped, s1/2 = quality
    // gate drops "tiny", s2/0 = dup of longA -> dropped,
    // s2/1 = longB lands.
    assert(kept == Seq("s1/0", "s2/1"))
  }
}
