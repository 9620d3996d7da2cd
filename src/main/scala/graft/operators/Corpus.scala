package graft.operators

import graft.functions.{GraftExpressions, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level statistics — signals computed over the whole document
  * set rather than per document. */
object Corpus {

  /** The PMI-ratio score c_xy·n / (c_x·c_y), 6-dp rounded. Every count
    * is cast to double BEFORE multiplying: Long products wrap silently
    * at corpus scale (c_xy=5e8 × n=1e11 > 2^63), while the double
    * product only rounds — rank order and the displayed rounding are
    * unaffected, and the score stays positive and finite for positive
    * counts of any magnitude. */
  def pmiRatio(cXy: Column, n: Column, cX: Column, cY: Column): Column =
    round((cXy.cast("double") * n.cast("double"))
      / (cX.cast("double") * cY.cast("double")), 6)

  /** Collocation mining: bigrams occurring ≥ `minCount` times, scored
    * by the PMI *ratio* p(x,y)/(p(x)p(y)) = c_xy·N / (c_x·c_y) — the
    * exponent-free form of pointwise mutual information. Each count is
    * cast to double BEFORE the multiply: the products are then IEEE
    * operations that cannot wrap (a Long product c_xy·N overflows
    * silently at corpus scale — n≈1e11 occurrences × a 5e8-count
    * bigram exceeds 2^63 — while the double product merely rounds,
    * preserving rank order and the 6-dp display rounding). The score
    * stays a deterministic multiply-divide, bit-stable across engines
    * and partitionings.
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
        pmiRatio(col("c_xy"), col("n"), col("c_x"), col("c_y"))
          .as("pmi_ratio"))
  }
}
