package graft

import org.apache.spark.sql.functions._

/** Throwaway perf-investigation main (not part of the surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("scratch")
    import graft.operators._
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    val docs = Graft.table(spark, dir, "documents")
    time("tokens_only") {
      docs.select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .select(sum(size(col("t")))).collect().head.getLong(0)
    }
    time("shingle_sets") {
      docs.select(col("doc_id"),
        array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("sh"))
        .select(sum(size(col("sh")))).collect().head.getLong(0)
    }
    time("q36_sig_cands") {
      val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
      Dedup.minhashCandidates(
        Dedup.minhashBands(sigs, "doc_id", 16, 4), "doc_id").count()
    }
    time("q36_full") {
      Dedup.minhashNearDups(docs, "doc_id", "text").count()
    }
    time("q46_simhash_only") {
      Dedup.simhash32(docs, "doc_id", "text").count()
    }
    time("q46_full") {
      Dedup.simhashNearDups(docs, "doc_id", "text").count()
    }
    time("q20_full") {
      Dedup.jaccardPairs(
        docs.filter(col("doc_id") < 300), "doc_id", "text", 3, 0.05).count()
    }
    val emb = Graft.table(spark, dir, "embeddings")
    time("q31_prepare") {
      Similarity.prepare(emb, "vec_id", "embedding")
        .agg(sum(col("nsq"))).collect().head.getLong(0)
    }
    time("q31_full") {
      val cents = Similarity.ivfCentroids(emb, "vec_id", "embedding", 16)
      val index = Similarity.ivfIndex(emb, "vec_id", "embedding", 16)
      Similarity.ivfTopK(index, cents, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", 10, 4).count()
    }
    Dedup.simhashNearDups(docs, "doc_id", "text").explain("formatted")
    spark.stop()
  }
}
