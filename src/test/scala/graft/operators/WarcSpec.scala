package graft.operators

import graft.SparkSpec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val crlf = "\r\n"

  private def rec(typ: String, uri: String, block: String): String =
    s"WARC/1.0${crlf}WARC-Type: $typ${crlf}" +
      s"WARC-Target-URI: $uri${crlf}" +
      s"WARC-Record-ID: <urn:uuid:$typ-$uri>${crlf}" +
      s"Content-Length: ${block.length}$crlf$crlf$block$crlf$crlf"

  test("parseShard: Content-Length wins over an embedded WARC/1.0") {
    // The payload of the first record CONTAINS a full fake record
    // boundary — a regex/split parser would cut here; the offset walk
    // must not.
    val trap = s"quoted:$crlf$crlf" + "WARC/1.0" + crlf +
      "Content-Length: 0" + crlf
    val shard = rec("resource", "https://a/1", trap) +
      rec("resource", "https://a/2", "tail")
    val got = Warc.parseShard(shard)
    assert(got.map(_.warcType) == Seq("resource", "resource"))
    assert(got.head.body == trap)
    assert(got(1).body == "tail")
    assert(got.map(_.recIdx) == Seq(0L, 1L))
  }

  test("parseShard: HTTP envelope peel and status parse") {
    val http = s"HTTP/1.1 301 Moved Permanently${crlf}" +
      s"Location: https://b/${crlf}${crlf}gone"
    val got = Warc.parseShard(rec("response", "https://b/x", http))
    assert(got.size == 1)
    assert(got.head.httpStatus.contains(301L))
    assert(got.head.body == "gone")
    assert(got.head.contentLength == http.length.toLong)
    assert(got.head.targetUri.contains("https://b/x"))
  }

  test("parseShard: non-HTTP response block passes through whole") {
    val got = Warc.parseShard(rec("response", "https://c/", "raw"))
    assert(got.head.httpStatus.isEmpty && got.head.body == "raw")
  }

  test("parseShard: malformed quarantine stops the shard") {
    // Overrunning Content-Length: declared 999 but only 4 chars left.
    val bad = s"WARC/1.0${crlf}WARC-Type: resource$crlf" +
      s"Content-Length: 999$crlf$crlf" + "oops"
    val got = Warc.parseShard(rec("resource", "https://d/", "ok") + bad)
    assert(got.map(_.warcType) == Seq("resource", "malformed"))
    // Missing Content-Length entirely.
    val noLen = s"WARC/1.0${crlf}WARC-Type: resource$crlf$crlf" + "x"
    assert(Warc.parseShard(noLen).map(_.warcType) == Seq("malformed"))
    // Header block never terminates.
    assert(Warc.parseShard(s"WARC/1.0${crlf}WARC-Type: r")
      .map(_.warcType) == Seq("malformed"))
  }

  test("parseWarc: DataFrame boundary, per-shard indices, null shard") {
    val shards = Seq(
      ("s1", rec("resource", "u1", "a") + rec("resource", "u2", "bb")),
      ("s2", rec("warcinfo", "u3", "meta")),
      ("s3", null.asInstanceOf[String]))
      .toDF("sid", "warc")
    val got = Warc.parseWarc(shards, "sid", "warc")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got == Set(("s1", 0L, "resource"), ("s1", 1L, "resource"),
      ("s2", 0L, "warcinfo"), ("s3", 0L, "malformed")))
  }
}
