package graft.operators

import graft.functions.{GraftExpressions, TextFunctions}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistics — signals computed over the whole document
  * set rather than per document. */
object Corpus {

  /** Collocation mining: bigrams occurring ≥ `minCount` times, scored
    * by the PMI *ratio* p(x,y)/(p(x)p(y)) = c_xy·N / (c_x·c_y) — the
    * exponent-free form of pointwise mutual information. Keeping the
    * score a single IEEE divide of exact integer products (no log)
    * makes it bit-reproducible across engines and partitionings, and
    * rank order is identical to PMI.
    *
    * Scale: one unigram hash-agg, one bigram hash-agg (both map-side
    * combinable; the gram explode is the native [[GraftExpressions
    * .ShingleList]]), two equi-joins keyed on the token (the count
    * tables are tiny next to the corpus — AQE broadcasts them), and a
    * 1-row total attach. Never corpus×corpus.
    *
    * Output: (bigram, c_xy, c_x, c_y, pmi_ratio). */
  def collocations(
      docs: DataFrame,
      textCol: String,
      minCount: Long): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    val toks = TextFunctions.tokens(col(textCol))
    val uni = docs.select(explode(toks).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("n"))
    val big = docs
      .select(explode(GraftExpressions.shingleList(toks, 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .withColumn("x", split(col("bigram"), " ").getItem(0))
      .withColumn("y", split(col("bigram"), " ").getItem(1))
    big
      .join(uni.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(total))
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round((col("c_xy") * col("n")).cast("double")
          / (col("c_x") * col("c_y")).cast("double"), 6).as("pmi_ratio"))
  }
}
