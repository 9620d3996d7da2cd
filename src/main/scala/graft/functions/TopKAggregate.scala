package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, InterpretedOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k as a first-class AGGREGATE — the scale-safe
  * replacement for `row_number().over(partitionBy(g)) <= k`: a window
  * moves EVERY row of a group onto one task before discarding all but
  * k, while this aggregate's state never exceeds k rows per group at
  * any point — on the map side (partial aggregation keeps ≤ k per
  * group per input partition, so the shuffle carries ≤ k·partitions
  * rows per group, not the group), in the merge, and in the final
  * buffer. The unbounded-group top-k (BM25 candidates per query, any
  * per-key "best n") stops being a hot-partition risk entirely.
  *
  * Ordering: entries are whole structs compared by the struct's
  * natural ASCENDING lexicographic field order (Spark's own
  * interpreted ordering — same NULLS FIRST / binary-string semantics
  * as `ORDER BY` on the fields). The caller encodes direction by
  * field construction (negate a numeric key for descending) and MUST
  * place a per-group-unique tiebreaker field before any
  * payload-only fields, making the order total and the result
  * deterministic under any partitioning — the same contract as
  * [[graft.operators.Ranking.groupRank]].
  */
object TopKAggregate {

  /** The k smallest struct values of `child` by the struct's
    * ascending lexicographic order, as a sorted `array<struct>`.
    * State, serialized form, and output are all bounded by k. */
  case class TopKRows(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKRows.Buffer] with UnaryLike[Expression] {

    require(k > 0, "k must be positive")

    private def structType: StructType = child.dataType.asInstanceOf[StructType]

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case s: StructType => TypeUtils.checkForOrderingExpr(s, prettyName)
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a struct input, got ${other.catalogString}")
    }

    override def dataType: DataType = ArrayType(structType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "top_k_rows"

    // Per-task machinery (not serialized with the expression): the
    // interpreted row ordering over the struct's field types and an
    // UnsafeProjection to copy incoming (possibly reused) rows.
    @transient private lazy val ord: InterpretedOrdering =
      InterpretedOrdering.forSchema(structType.fields.map(_.dataType).toSeq)
    @transient private lazy val proj: UnsafeProjection =
      UnsafeProjection.create(structType)

    override def createAggregationBuffer(): TopKRows.Buffer =
      new TopKRows.Buffer(k)

    override def update(buf: TopKRows.Buffer, input: InternalRow): TopKRows.Buffer = {
      val v = child.eval(input)
      // A NULL struct (e.g. from an outer join) contributes nothing —
      // NULL ranks neither above nor below data in a top-k.
      if (v != null) {
        buf.offer(v.asInstanceOf[InternalRow], ord, proj)
      }
      buf
    }

    override def merge(buf: TopKRows.Buffer, other: TopKRows.Buffer): TopKRows.Buffer = {
      other.foreach(r => buf.offer(r, ord, proj))
      buf
    }

    override def eval(buf: TopKRows.Buffer): Any =
      new GenericArrayData(buf.sortedAscending(ord).toArray[Any])

    override def serialize(buf: TopKRows.Buffer): Array[Byte] = {
      val rows = buf.sortedAscending(ord)
      var size = 4
      rows.foreach(r => size += 4 + r.getSizeInBytes)
      val bb = ByteBuffer.allocate(size)
      bb.putInt(rows.length)
      rows.foreach { r =>
        bb.putInt(r.getSizeInBytes)
        r.writeTo(bb)
      }
      bb.array()
    }

    override def deserialize(storage: Array[Byte]): TopKRows.Buffer = {
      val bb = ByteBuffer.wrap(storage)
      val n = bb.getInt()
      val buf = new TopKRows.Buffer(k)
      val nFields = structType.size
      var i = 0
      while (i < n) {
        val len = bb.getInt()
        val bytes = new Array[Byte](len)
        bb.get(bytes)
        val row = new UnsafeRow(nFields)
        row.pointTo(bytes, len)
        // Rows arrive pre-filtered to the serializing side's top-k and
        // already own their bytes — offer (not raw add) so a merge of
        // many partials still bounds state at k.
        buf.offer(row, ord, null)
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): TopKRows =
      copy(child = newChild)
  }

  object TopKRows {
    /** Bounded max-heap: root = current WORST (largest) of the ≤ k
      * kept entries, so admission is an O(log k) replace when a
      * smaller candidate arrives and O(1) reject otherwise. Entries
      * are owned UnsafeRow copies. */
    final class Buffer(val k: Int) {
      private var heap: java.util.PriorityQueue[UnsafeRow] = _

      private def ensureHeap(ord: InterpretedOrdering): Unit =
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](
            k,
            new java.util.Comparator[UnsafeRow] {
              override def compare(a: UnsafeRow, b: UnsafeRow): Int =
                ord.compare(b, a) // reversed: largest at the root
            })
        }

      /** Admit `row` if it belongs in the k smallest. `proj` may be
        * null when `row` is already an owned UnsafeRow copy. */
      def offer(row: InternalRow, ord: InterpretedOrdering,
          proj: UnsafeProjection): Unit = {
        ensureHeap(ord)
        if (heap.size() < k) {
          heap.add(own(row, proj))
        } else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(own(row, proj))
        }
      }

      private def own(row: InternalRow, proj: UnsafeProjection): UnsafeRow =
        row match {
          case u: UnsafeRow if proj == null => u
          case other => proj(other).copy()
        }

      def foreach(f: UnsafeRow => Unit): Unit =
        if (heap != null) heap.forEach(r => f(r))

      def sortedAscending(ord: InterpretedOrdering): Seq[UnsafeRow] = {
        if (heap == null) return Seq.empty
        val arr = heap.toArray(new Array[UnsafeRow](heap.size()))
        java.util.Arrays.sort(arr, new java.util.Comparator[UnsafeRow] {
          override def compare(a: UnsafeRow, b: UnsafeRow): Int =
            ord.compare(a, b)
        })
        arr.toSeq
      }
    }
  }

  /** Column API: the k smallest `struct(fields…)` values in ascending
    * lexicographic field order, as a sorted array column. Negate a
    * numeric field for descending; include a unique tiebreaker before
    * payload fields (see [[TopKRows]]). */
  def topKStructs(fields: Seq[Column], k: Int): Column =
    topKStructsOf(struct(fields: _*), k)

  /** [[topKStructs]] over a caller-built struct column — the form for
    * CONDITIONAL collection (`when(cond, struct(...))`: NULL structs
    * contribute nothing), letting several filtered top-k collections
    * ride one aggregation. */
  def topKStructsOf(structCol: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKRows(GraftSqlBridge.expression(structCol), k)
        .toAggregateExpression())
}
