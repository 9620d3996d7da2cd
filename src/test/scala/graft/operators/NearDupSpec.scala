package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SimHash byte-band near-dup and chunk-fingerprint specs (round-2
  * operators). */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  test("simhashNearDups equals brute-force Hamming<=3 (pigeonhole recall)") {
    val docs = (1L to 60L).map { i =>
      // Clusters of 3 share most tokens → small Hamming distances.
      val base = s"alpha beta gamma delta epsilon zeta eta theta iota kappa g${i / 3}"
      (i, if (i % 3 == 0) base else s"$base extra${i % 3}")
    }.toDF("doc_id", "text")

    val banded = sortedRows(Dedup.simhashNearDups(docs, "doc_id", "text"))

    val sims = Dedup.simhash32(docs, "doc_id", "text")
    val l = sims.select($"doc_id".as("a"), $"simhash".as("sa"))
    val r = sims.select($"doc_id".as("b"), $"simhash".as("sb"))
    val brute = sortedRows(
      l.crossJoin(r).filter($"a" < $"b")
        .withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .filter($"hamming" <= 3)
        .select($"a", $"b", $"hamming"))

    assert(banded == brute, "byte-band LSH must have exact recall at Hamming<=3")
    assert(brute.nonEmpty, "fixture must actually produce near-dup pairs")
  }

  test("prefixJaccardPairs equals brute-force Jaccard>=t (exact recall guarantee)") {
    val docs = Seq(
      (1L, "the cat sat on the xylophone mat today"),
      (2L, "the cat sat on the xylophone hat today"),
      (3L, "a dog runs in a quiet zebra park every day"),
      (4L, "a dog runs in a quiet zebra yard every day"),
      (5L, "completely unrelated text about spark engines and shuffles"))
      .toDF("doc_id", "text")
    val pref = sortedRows(
      Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, 0.5))
    val brute = sortedRows(
      Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5))
    assert(pref == brute, "prefix filter must lose no pair above threshold")
    assert(pref.nonEmpty, "fixture must produce pairs")
  }

  test("prefixJaccardPairs ≡ brute force on randomized corpora (seeded)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    // Template-with-mutations corpus: high overlap by construction.
    val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (1L to 40L).map { i =>
      val words = base.split(" ").toBuffer
      (0 until rnd.nextInt(4)).foreach { _ =>
        words(rnd.nextInt(words.size)) = vocab(rnd.nextInt(vocab.size))
      }
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.7, 0.9)) {
      val pref = sortedRows(Dedup.prefixJaccardPairs(docs, "doc_id", "text", 3, t))
      val brute = sortedRows(Dedup.jaccardPairs(docs, "doc_id", "text", 3, t))
      assert(pref == brute, s"prefix filter lost pairs at threshold $t")
    }
  }

  test("chunkFingerprints: chunk count, sizes, and md5-over-hex construction") {
    val media = Seq((1L, "abcdefghijklmnopqrstuvwxyz012345EXTRA".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = rows(Multimodal.chunkFingerprints(media, "media_id", "content", 16))
      .sortBy(_.getAs[Long]("chunk_idx"))
    assert(out.map(_.getAs[Long]("chunk_idx")) == Seq(0L, 1L, 2L))
    assert(out.map(_.getAs[Int]("chunk_octets")) == Seq(16, 16, 5))
    // Fingerprint = md5 of the UPPERCASE hex of the chunk bytes.
    def hexMd5(s: String): String = {
      val hx = s.getBytes("UTF-8").map("%02X".format(_)).mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hx.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    assert(out.head.getAs[String]("fp") == hexMd5("abcdefghijklmnop"))
    assert(out.last.getAs[String]("fp") == hexMd5("EXTRA"))
  }

  test("chunkFingerprints drops empty content rather than emitting a phantom chunk") {
    val media = Seq((1L, Array.empty[Byte]), (2L, "xy".getBytes("UTF-8")))
      .toDF("media_id", "content")
    val out = rows(Multimodal.chunkFingerprints(media, "media_id", "content", 16))
    assert(out.map(_.getAs[Long]("media_id")) == Seq(2L))
  }
}
