package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BoundReference, GenericInternalRow, JoinedRow, RowOrdering, SortOrder,
  UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan,
  SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Native AS-OF join — the whole-operator custom-plan path
  * (LogicalPlan + Strategy + SparkPlan): for every left row, attach
  * the LATEST right row of the same key with right_time ≤ left_time,
  * or nulls if none. The kdb `aj` / pandas `merge_asof` / DuckDB
  * `ASOF JOIN` operator Spark has no native node for — the state
  * lookup the reference does per-device in a dict
  * (`pipeline.py:472-572`, J2 in SURVEY §2), here as one pass.
  *
  * The repo's composed form ([[graft.operators.Incremental]]: union
  * both sides, per-key window, filter) answers the same question in
  * 1 shuffle of left+right UNION plus a window sort; this node does
  * it in the textbook sort-merge shape: co-partition both sides on
  * the key (2 exchanges EnsureRequirements already dedups against
  * upstream partitioning), sort each partition by (key, time), then
  * ONE forward-only merge pass per partition — no union blow-up, no
  * window buffer, O(1) state per key (the single trailing candidate
  * row), early-stop lookahead. Both inputs stream; neither side is
  * ever collected or broadcast, so a 100 TB fact side against a
  * 10 TB state side holds nothing in memory beyond one row per side.
  *
  * Semantics pinned by the gate + spec: ties (right_time ==
  * left_time) MATCH (the "as of now" convention, = DuckDB
  * `ON l.t >= r.t`); equal right times for one key pick the LAST in
  * (key, time)-sort order deterministically only if the caller makes
  * times per-key unique (same contract as every Ranking tiebreaker);
  * NULL left time or NULL-beyond-all-right time yields the null
  * extension; keys compare with NULLS-FIRST natural ordering, so
  * NULL keys group together and as-of-match each other (a lookup
  * semantic, not SQL equi-join NULL≠NULL — documented divergence).
  */
object AsOfJoinPlan {

  /** Left as-of join `left` to `right` on equal `keys` and the
    * latest `rightTimeCol` ≤ `leftTimeCol`. Time columns must be
    * TIMESTAMP or BIGINT (compared as their underlying Long). Right
    * columns must not collide with left's (rename first — same
    * contract as a plain join). Output: left columns ++ right's
    * non-key, non-time columns (nullable).
    *
    * If `right` shares lineage with `left` (a self-as-of), its plan
    * is re-rooted through an RDD barrier so attribute ids stay
    * disjoint — the analyzer's DeduplicateRelations does not know
    * custom nodes. */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    val spark = left.sparkSession
    GraftSqlBridge.installStrategy(spark, AsOfJoinStrategy)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlanRaw = GraftSqlBridge.analyzed(right)
    val collide = lPlan.outputSet.intersect(rPlanRaw.outputSet).nonEmpty
    val rightDf =
      if (collide) spark.createDataFrame(right.rdd, right.schema)
      else right
    val rPlan = GraftSqlBridge.analyzed(rightDf)

    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in [${plan.output.map(_.name).mkString(", ")}]"))
    def timeAttr(plan: LogicalPlan, name: String): Attribute = {
      val a = attr(plan, name)
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of time column '$name' must be BIGINT or TIMESTAMP, " +
          s"got ${a.dataType.simpleString}")
      a
    }
    // Pairwise type equality, not just per-side validity: the merge
    // compares RIGHT rows under the LEFT key ordering and raw-long
    // times — an INT-vs-BIGINT key or TIMESTAMP-vs-BIGINT time pair
    // would silently mis-compare, never error.
    val lk = keys.map(attr(lPlan, _))
    val rk = keys.map(attr(rPlan, _))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key '${a.name}' type mismatch: left " +
          s"${a.dataType.simpleString} vs right ${b.dataType.simpleString}" +
          " — cast one side first")
    }
    val lt = timeAttr(lPlan, leftTimeCol)
    val rt = timeAttr(rPlan, rightTimeCol)
    require(lt.dataType == rt.dataType,
      s"as-of time type mismatch: left ${lt.dataType.simpleString} vs " +
        s"right ${rt.dataType.simpleString} — cast one side first")
    val node = AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt)
    // Drop the right side's join machinery columns — they duplicate
    // the left's (keys) or are internal (time); keep right payload.
    // Projected by ATTRIBUTE (a logical Project over the node's own
    // output), because the key NAMES exist on both sides and a
    // by-name select would be ambiguous.
    val (lSide, rSide) = node.output.splitAt(lPlan.output.length)
    val keep = lSide ++ rSide.filterNot(a =>
      keys.contains(a.name) || a.name == rightTimeCol)
    GraftSqlBridge.ofRows(spark,
      org.apache.spark.sql.catalyst.plans.logical.Project(keep, node))
  }
}

/** Resolved logical node: output = left ++ right-made-nullable. */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner hook: one custom node → one custom exec, children planned
  * by Spark as usual. Installed via `spark.experimental
  * .extraStrategies` (idempotently, by [[AsOfJoinPlan.join]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Physical as-of: requires both children clustered on the join keys
  * and sorted by (keys, time) — EnsureRequirements inserts (or
  * reuses!) the exchanges and sorts — then merges each co-partition
  * pair in one forward pass. Never materializes a partition: state is
  * one lookahead row + one candidate row per side. */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTime: Attribute,
    rightTime: Attribute) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def sortKeys(
      keys: Seq[Attribute], time: Attribute): Seq[SortOrder] =
    (keys :+ time).map(SortOrder(_, Ascending))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(sortKeys(leftKeys, leftTime), sortKeys(rightKeys, rightTime))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = sortKeys(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // Emit UnsafeRows (the SMJ convention) so any parent — codegen
      // input adapters, exchanges, sorters — consumes without caring
      // that the backing JoinedRow is reused. Built from explicit
      // BoundReferences with the RIGHT side forced nullable: binding
      // against the child's own attributes would inherit
      // nullable=false and skip the null check exactly on the
      // null-extension rows this join mints.
      val resultProj = UnsafeProjection.create(
        lOut.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        } ++ rOut.zipWithIndex.map { case (a, i) =>
          BoundReference(lOut.length + i, a.dataType, true)
        })

      new Iterator[InternalRow] {
        // The lookahead right row: read but not yet consumed (its key
        // or time is ahead of the current left row). Safe to HOLD
        // without copying — sorter iterators reuse row buffers only
        // across next() calls, and we never call rIter.next() while
        // retaining it. The candidate IS copied: the lookahead may
        // advance (invalidating buffers) while it is still the match
        // for future left rows.
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var cand: InternalRow = _
        private var candKey: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = lKeyProj(l)
          val lTimeRow = lTimeProj(l)
          if (lTimeRow.isNullAt(0)) return resultProj(joined(l, nullRight))
          val lt = lTimeRow.getLong(0)
          var ahead = false
          while (!ahead && (rHead != null || rIter.hasNext)) {
            if (rHead == null) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead).copy()
            }
            val cmp = keyOrd.compare(rHeadKey, lKey)
            if (cmp < 0) {
              rHead = null // stale key — can never match a later left
            } else if (cmp > 0) {
              ahead = true // future key — keep for later left rows
            } else {
              val rTimeRow = rTimeProj(rHead)
              if (rTimeRow.isNullAt(0)) {
                rHead = null // NULL time sorts FIRST (asc) — never a match
              } else if (rTimeRow.getLong(0) <= lt) {
                cand = rHead.copy() // newest so far for this key
                candKey = rHeadKey
                rHead = null
              } else {
                ahead = true // same key, later time
              }
            }
          }
          if (cand != null && keyOrd.compare(candKey, lKey) == 0)
            resultProj(joined(l, cand))
          else resultProj(joined(l, nullRight))
        }
      }
    }
  }
}
