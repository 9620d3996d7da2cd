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

  private def recBytes(typ: String, uri: String,
      block: Array[Byte]): Array[Byte] =
    (s"WARC/1.0${crlf}WARC-Type: $typ${crlf}" +
      s"WARC-Target-URI: $uri${crlf}" +
      s"Content-Length: ${block.length}$crlf$crlf")
      .getBytes("US-ASCII") ++ block ++ s"$crlf$crlf".getBytes("US-ASCII")

  test("parseShardBytes: octet Content-Length over multi-byte UTF-8") {
    // 'héllo→' is 6 chars but 9 octets — a char-mode walk fed these
    // DECODED bytes would start the next record 3 early and
    // quarantine; the byte walk (the ISO 28500 contract) must not.
    val multibyte = "héllo→".getBytes("UTF-8")
    assert(multibyte.length == 9 && "héllo→".length == 6)
    val shard = recBytes("resource", "https://u/1", multibyte) ++
      recBytes("resource", "https://u/2", "tail".getBytes("US-ASCII"))
    val got = Warc.parseShardBytes(shard)
    assert(got.map(_.warcType) == Seq("resource", "resource"))
    assert(got.head.contentLength == 9L)
    assert(new String(got.head.body, "UTF-8") == "héllo→")
    assert(new String(got(1).body, "UTF-8") == "tail")
    // The char-mode twin on the decoded string drifts as documented:
    // Content-Length: 9 spans 9 CHARS there, swallowing the record
    // separator into the body.
    val decoded = new String(shard, "UTF-8")
    assert(Warc.parseShard(decoded).head.body != "héllo→")
  }

  test("parseShardBytes: binary payload with zero/0xFF bytes intact") {
    val payload = Array[Byte](0, -1, 13, 10, 13, 10, 0x57, 0x41, 0x52)
    val got = Warc.parseShardBytes(
      recBytes("resource", "https://u/bin", payload))
    assert(got.size == 1 && got.head.body.sameElements(payload))
  }

  test("parseShardBytes: HTTP peel + strict quarantine") {
    val http = (s"HTTP/1.1 200 OK${crlf}X: y$crlf$crlf").getBytes(
      "US-ASCII") ++ Array[Byte](1, 2, 3)
    val got = Warc.parseShardBytes(
      recBytes("response", "https://u/h", http))
    assert(got.head.httpStatus.contains(200L))
    assert(got.head.body.sameElements(Array[Byte](1, 2, 3)))
    val bad = (s"WARC/1.0${crlf}WARC-Type: resource$crlf" +
      s"Content-Length: 999$crlf$crlf" + "oops").getBytes("US-ASCII")
    assert(Warc.parseShardBytes(bad).map(_.warcType) ==
      Seq("malformed"))
  }

  test("parseWarcBytes: DataFrame boundary, binary column, null") {
    val shards = Seq(
      ("s1", recBytes("resource", "u1", "é".getBytes("UTF-8"))),
      ("s2", null.asInstanceOf[Array[Byte]]))
      .toDF("sid", "warc")
    val got = Warc.parseWarcBytes(shards, "sid", "warc")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(5)))
      .toSet
    assert(got == Set(("s1", 0L, "resource", 2L),
      ("s2", 0L, "malformed", -1L)))
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
