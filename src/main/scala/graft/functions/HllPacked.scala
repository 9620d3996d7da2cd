package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Packed HLL register vectors (r18 optimization round).
  *
  * [[graft.operators.Sketches.hllRegisters]] keeps sketch state as
  * (group, j, mj) ROWS — the right shape for SQL-mergeable register
  * tables, but an iterative router like HyperBall then joins
  * M = 64 register rows per edge per round (edges × 64 rows through
  * every exchange). Since a register value mj ∈ [1, 55] fits a byte,
  * the whole register set packs into one 64-byte BINARY cell: the
  * per-round "union your neighbors' balls" becomes edges × ONE row
  * through a broadcast-joinable node-sized table, and the max-merge
  * is a bytewise-max aggregate with constant (64 B) state
  * (guide §2.3: shuffle fewer bytes; §2.4: remove the register-row
  * explosion entirely). Packed state is bit-equivalent to the row
  * form: byte j == M_j, 0 == register absent.
  */
object HllPacked {

  import graft.operators.Sketches.{M, MaxRank, EstimatorNumerator}

  /** `hllPackOne(j, r)`: the packed register vector of a SINGLE
    * element that landed in bucket j with rank r — the seed state
    * (one row per node/key). */
  case class HllPackOne(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "hll_pack_one"

    def compute(j: Any, r: Any): Array[Byte] = {
      val out = new Array[Byte](M)
      out(j.asInstanceOf[Long].toInt) = r.asInstanceOf[Long].toByte
      out
    }

    override def nullSafeEval(j: Any, r: Any): Any = compute(j, r)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("packExpr", this,
        "graft.functions.HllPacked.HllPackOne")
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = $ref.compute($a, $b);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): HllPackOne =
      copy(left = newLeft, right = newRight)
  }

  def hllPackOne(j: Column, r: Column): Column =
    GraftSqlBridge.column(HllPackOne(
      GraftSqlBridge.expression(j), GraftSqlBridge.expression(r)))

  /** Bytewise-max aggregate over packed register vectors — the
    * max-merge of HLL registers in one 64-byte buffer. NULL inputs
    * contribute nothing; an empty group yields NULL. */
  case class ByteMaxAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "byte_max"

    override def createAggregationBuffer(): Array[Byte] = null

    private def mergeInto(buf: Array[Byte], v: Array[Byte]): Array[Byte] = {
      if (buf == null) return v.clone()
      // Equal lengths are structural (every producer emits M-register
      // cells); a malformed input must fail loudly, not silently
      // truncate the merge to the shorter vector and corrupt the
      // estimate (r18 ADVICE).
      require(buf.length == v.length,
        s"byte_max: register vectors of ${buf.length} and ${v.length} " +
          "bytes cannot merge")
      var i = 0
      val n = buf.length
      while (i < n) {
        if (v(i) > buf(i)) buf(i) = v(i)
        i += 1
      }
      buf
    }

    override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
      val v = child.eval(input)
      if (v == null) buf else mergeInto(buf, v.asInstanceOf[Array[Byte]])
    }

    override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
      if (other == null) buf else mergeInto(buf, other)

    override def eval(buf: Array[Byte]): Any = buf

    override def serialize(buf: Array[Byte]): Array[Byte] =
      if (buf == null) Array.emptyByteArray else buf

    override def deserialize(storage: Array[Byte]): Array[Byte] =
      if (storage.isEmpty) null else storage

    override def withNewMutableAggBufferOffset(newOffset: Int): ByteMaxAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): ByteMaxAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): ByteMaxAgg =
      copy(child = newChild)
  }

  def byteMax(packed: Column): Column =
    GraftSqlBridge.column(
      ByteMaxAgg(GraftSqlBridge.expression(packed)).toAggregateExpression())

  /** `hllEstimatePacked(packed)`: the per-key reach estimate off a
    * packed register vector — bit-identical to
    * [[graft.operators.Sketches.hllEstimate]] + the gate's
    * linear-counting correction: with V = #zero registers and
    * harmonic_q55 = Σ 2^(MaxRank − mj) (absent registers contribute
    * 2^MaxRank), estimate = EstimatorNumerator / harmonic_q55;
    * result = lcTable(V) when V > 0 ∧ estimate < 2.5·M, else
    * round(estimate) — the same IEEE divide, the same driver-side
    * literal table, the same HALF_UP round. */
  case class HllEstimatePacked(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "hll_estimate_packed"

    private val lc: Array[Long] =
      graft.operators.Sketches.hllLinearCountTable.toArray

    def compute(input: Any): Long = {
      val regs = input.asInstanceOf[Array[Byte]]
      var hsum = 0L
      var zeros = 0
      var j = 0
      while (j < M) {
        val mj = if (j < regs.length) regs(j).toInt else 0
        if (mj == 0) { zeros += 1; hsum += 1L << MaxRank }
        else hsum += 1L << (MaxRank - mj)
        j += 1
      }
      val est = EstimatorNumerator / hsum.toDouble
      if (zeros > 0 && est < 2.5 * M) lc(zeros - 1)
      else SeriesKernels.roundHalfUp(est)
    }

    override def nullSafeEval(input: Any): Any = compute(input)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("estExpr", this,
        "graft.functions.HllPacked.HllEstimatePacked")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
    }

    override protected def withNewChildInternal(
        newChild: Expression): HllEstimatePacked = copy(child = newChild)
  }

  def hllEstimatePacked(packed: Column): Column =
    GraftSqlBridge.column(
      HllEstimatePacked(GraftSqlBridge.expression(packed)))
}
