package graft.plans

import graft.functions.{GraftExpressions, TextFunctions}
import graft.operators.Dedup
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom expressions, registered via
  * `SparkSessionExtensions` so `spark.sql("SELECT graft_simhash(...)")`
  * works on any session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => PushTimestampConversion)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (identifier, info, builder) triples — shared by build-time
    * injection (class above) and runtime registration ([[register]]). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokens) - 32-bit SimHash of a token array"),
      (children: Seq[Expression]) =>
        GraftExpressions.SimHashFromTokens(children.head, 32)),
    (FunctionIdentifier("graft_lang_id"),
      info("graft_lang_id", "graft_lang_id(tokens) - stopword-marker language ID"),
      (children: Seq[Expression]) =>
        GraftExpressions.LangId(children.head, TextFunctions.langMarkers)),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(tokens) - 16-value MinHash signature over 3-word shingles"),
      (children: Seq[Expression]) => {
        val params = Dedup.minhashParams(16)
        GraftExpressions.MinHashFromTokens(children.head, 3,
          params.map(_._1).toArray, params.map(_._2).toArray, Dedup.MinhashP)
      }),
    (FunctionIdentifier("graft_self_pairs"),
      info("graft_self_pairs",
        "graft_self_pairs(ids) - all (a, b) combinations with a before b"),
      (children: Seq[Expression]) => GraftExpressions.SelfPairs(children.head)),
    (FunctionIdentifier("graft_ws_tokens"),
      info("graft_ws_tokens",
        "graft_ws_tokens(text) - lower-cased whitespace tokens, one native byte scan"),
      (children: Seq[Expression]) =>
        GraftExpressions.WhitespaceTokens(children.head)),
    (FunctionIdentifier("graft_sorted_shingles"),
      info("graft_sorted_shingles",
        "graft_sorted_shingles(tokens) - sorted distinct 3-word shingle set"),
      (children: Seq[Expression]) =>
        GraftExpressions.SortedShingleSet(children.head, 3)),
    (FunctionIdentifier("graft_jaccard_sorted"),
      info("graft_jaccard_sorted",
        "graft_jaccard_sorted(a, b) - Jaccard of two sorted distinct string arrays"),
      (children: Seq[Expression]) =>
        GraftExpressions.JaccardSorted(children.head, children(1))),
    (FunctionIdentifier("graft_dot_q"),
      info("graft_dot_q",
        "graft_dot_q(a, b) - exact integer dot product of quantized vectors"),
      (children: Seq[Expression]) =>
        GraftExpressions.DotProductQ(children.head, children(1))))

  /** Register on a live session (the extensions config only applies at
    * session construction; the harness may own the session). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, b) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, id.funcName, inf, b)
    }
}
