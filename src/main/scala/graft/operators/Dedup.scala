package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines — exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard variants.
  *
  * Scale design: every variant is (map → one shuffle on a derived
  * bucket key → bounded per-bucket work). Nothing is pairwise over the
  * corpus; candidate generation always goes through a band/bucket
  * equi-join so 100 TB shards only ever compare within buckets.
  * All hashing is md5-derived (deterministic, engine-portable).
  */
object Dedup {

  /** Exact dedup: canonical survivor per identical text = min(id).
    * One hash-aggregate shuffle on the digest. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash signatures: K independent permutations approximated by
    * md5(k:shingle); signature = per-k min over the doc's shingle set.
    * Map-only (higher-order functions, no explode). */
  def minhashSignatures(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      shingleSize: Int): DataFrame = {
    val sh = array_distinct(shingles(col(textCol), shingleSize))
    val sig = transform(sequence(lit(1), lit(k)),
      ki => array_min(transform(sh, s => hash60(concat_ws(":", ki, s)))))
    // Docs too short to shingle have no signature — drop, not bucket-collide.
    docs.select(col(idCol), sh.as("sh"), sig.as("sig"))
      .filter(size(col("sh")) > 0)
      .drop("sh")
  }

  /** LSH bands: split the K-long signature into bands of `rowsPerBand`
    * and emit (band_id, band_key) per doc — the bucket-join key. */
  def minhashBands(sigs: DataFrame, idCol: String, k: Int, rowsPerBand: Int): DataFrame = {
    val nBands = k / rowsPerBand
    val bands = transform(sequence(lit(0), lit(nBands - 1)), b =>
      struct(b.as("band_id"),
        md5(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))
          .as("band_key")))
    sigs.select(col(idCol), explode(bands).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.band_key"))
  }

  /** Candidate near-dup pairs: self-join on (band_id, band_key),
    * distinct (a < b). The join shuffles on the band key only. */
  def minhashCandidates(bands: DataFrame, idCol: String): DataFrame = {
    val l = bands.select(col("band_id"), col("band_key"), col(idCol).as("a"))
    val r = bands.select(col("band_id"), col("band_key"), col(idCol).as("b"))
    l.join(r, Seq("band_id", "band_key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: candidates verified by exact
    * shingle-set Jaccard ≥ `threshold`. */
  def minhashNearDups(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 16,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.6): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol, k, shingleSize)
    val cands = minhashCandidates(minhashBands(sigs, idCol, k, rowsPerBand), idCol)
    val sets = docs.select(col(idCol),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    cands
      .join(sets.withColumnRenamed(idCol, "a").withColumnRenamed("sh", "sh_a"), "a")
      .join(sets.withColumnRenamed(idCol, "b").withColumnRenamed("sh", "sh_b"), "b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter").cast("double") / col("uni").cast("double"))
          .otherwise(0.0))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 32-bit SimHash over whitespace tokens: per-bit majority vote of
    * token-hash bits. Map-only; near-dup = small Hamming distance. */
  def simhash32(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashes = transform(array_distinct(tokens(col(textCol))), t => hash60(t))
    val packed = (0 until 32).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1L).otherwise(-1L))
      when(vote >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    docs.select(col(idCol), packed.as("simhash"))
  }

  /** Exact-Jaccard near-dups within a bounded id range (the brute-force
    * oracle-checkable variant; production path is [[minhashNearDups]]). */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    val sets = docs.select(col(idCol),
      array_distinct(shingles(col(textCol), shingleSize)).as("sh"))
    val l = sets.select(col(idCol).as("a"), col("sh").as("sh_a"))
    val r = sets.select(col(idCol).as("b"), col("sh").as("sh_b"))
    l.crossJoin(r).filter(col("a") < col("b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("uni") > 0)
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }
}
