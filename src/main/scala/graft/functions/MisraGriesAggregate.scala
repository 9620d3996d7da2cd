package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}

/** Misra–Gries frequent-items summary as a first-class mergeable
  * AGGREGATE — the deterministic-guarantee sibling of the hash-based
  * Count-Min registers in [[graft.operators.Sketches]]: CM answers
  * point estimates with a probabilistic over-count, while this sketch
  * guarantees (no probability involved) that EVERY item whose true
  * count exceeds n/(k+1) of an n-item stream is present in the k-entry
  * summary, with per-item undercount at most n/(k+1) (Misra & Gries
  * 1982; merge rule and its preserved error bound from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * Scale story: the state is O(k) at every point — per input partition
  * during map-side partial aggregation, on the shuffle wire (one ≤ k
  * entry summary per partition, not the token stream), in the merge,
  * and in the final buffer. A corpus-wide heavy-hitter census costs
  * one all-to-one exchange of model-sized summaries, never a
  * vocabulary-scale shuffle. The WEIGHTS in the summary are
  * order-dependent (decrement timing varies with partitioning) — only
  * the membership GUARANTEE is deterministic, so gates should assert
  * "all true-heavy items are present", not pin weights (the q156 gate
  * and MisraGriesSpec both do exactly that; the reference's analogous
  * consistency check is the lifetime-totals probe, A2,
  * `src/data_quality.py:24-52`).
  */
object MisraGriesAggregate {

  /** The ≤ k surviving (item, wt) entries of a Misra–Gries pass over
    * `child` (a string column; NULLs contribute nothing), as an
    * `array<struct<item string, wt long>>` sorted (wt DESC, item ASC)
    * for stable presentation. `wt` is the residual counter — a LOWER
    * bound on the item's true count, undercounting by ≤ n/(k+1). */
  case class MisraGries(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

    require(k > 0, "k must be positive")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.catalogString}")
    }

    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("wt", LongType, nullable = false))),
      containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "misra_gries"

    override def createAggregationBuffer(): java.util.HashMap[String, Long] =
      new java.util.HashMap[String, Long](k * 2)

    override def update(
        buf: java.util.HashMap[String, Long],
        input: InternalRow): java.util.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
      buf
    }

    /** Classic MG step: bump a tracked item; admit an untracked item
      * while there is room; otherwise decrement EVERY counter by one
      * (the arriving item cancels against the k incumbents — the move
      * that caps total undercount at n/(k+1)). */
    private def add(
        buf: java.util.HashMap[String, Long], item: String, w: Long): Unit = {
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + w)
      else if (buf.size < k) buf.put(item, w)
      else {
        // Decrement all by min(w, smallest counter) in one sweep;
        // weighted arrivals (from merge) may need several sweeps, but
        // each sweep either exhausts w or frees a slot.
        var rem = w
        while (rem > 0 && buf.size >= k) {
          var minC = Long.MaxValue
          val it0 = buf.values().iterator()
          while (it0.hasNext) { val c = it0.next(); if (c < minC) minC = c }
          val dec = math.min(rem, minC)
          val it = buf.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val nv = e.getValue - dec
            if (nv <= 0L) it.remove() else e.setValue(nv)
          }
          rem -= dec
        }
        if (rem > 0) buf.put(item, rem)
      }
    }

    /** Mergeable-summaries rule: sum counters pairwise, then if more
      * than k survive, subtract the (k+1)-th largest combined counter
      * from every entry and drop the non-positive — the pruned result
      * keeps the n/(k+1) undercount bound of the COMBINED stream
      * (Agarwal et al. 2012, §3.1). */
    override def merge(
        buf: java.util.HashMap[String, Long],
        other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
      val it = other.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf.get(e.getKey)
        buf.put(e.getKey, cur + e.getValue)
      }
      if (buf.size > k) {
        val vals = new Array[Long](buf.size)
        var i = 0
        val vi = buf.values().iterator()
        while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
        java.util.Arrays.sort(vals)
        val cut = vals(buf.size - k - 1) // (k+1)-th largest
        val ei = buf.entrySet().iterator()
        while (ei.hasNext) {
          val e = ei.next()
          val nv = e.getValue - cut
          if (nv <= 0L) ei.remove() else e.setValue(nv)
        }
      }
      buf
    }

    override def eval(buf: java.util.HashMap[String, Long]): Any = {
      val entries = new Array[(String, Long)](buf.size)
      var i = 0
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
      }
      java.util.Arrays.sort(entries, new java.util.Comparator[(String, Long)] {
        override def compare(a: (String, Long), b: (String, Long)): Int = {
          val byWt = java.lang.Long.compare(b._2, a._2)
          if (byWt != 0) byWt else a._1.compareTo(b._1)
        }
      })
      new GenericArrayData(entries.map { case (item, wt) =>
        InternalRow(UTF8String.fromString(item), wt)
      }.toArray[Any])
    }

    override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
      var size = 4
      val it0 = buf.keySet().iterator()
      val keys = new Array[Array[Byte]](buf.size)
      var i = 0
      while (it0.hasNext) {
        keys(i) = it0.next().getBytes(StandardCharsets.UTF_8)
        size += 4 + keys(i).length + 8
        i += 1
      }
      val bb = ByteBuffer.allocate(size)
      bb.putInt(buf.size)
      val it = buf.entrySet().iterator()
      i = 0
      while (it.hasNext) {
        val e = it.next()
        bb.putInt(keys(i).length)
        bb.put(keys(i))
        bb.putLong(e.getValue)
        i += 1
      }
      bb.array()
    }

    override def deserialize(storage: Array[Byte]): java.util.HashMap[String, Long] = {
      val bb = ByteBuffer.wrap(storage)
      val n = bb.getInt()
      val buf = new java.util.HashMap[String, Long](k * 2)
      var i = 0
      while (i < n) {
        val len = bb.getInt()
        val bytes = new Array[Byte](len)
        bb.get(bytes)
        buf.put(new String(bytes, StandardCharsets.UTF_8), bb.getLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): MisraGries =
      copy(child = newChild)
  }

  /** Column API: `misraGries(col, k)` → sorted
    * `array<struct<item, wt>>`, ≤ k entries. Every item with true
    * count STRICTLY above n/(k+1) is guaranteed present. */
  def misraGries(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      MisraGries(GraftSqlBridge.expression(item), k).toAggregateExpression())
}
