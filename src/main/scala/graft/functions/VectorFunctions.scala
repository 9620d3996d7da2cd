package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * Everything routes through fixed-point quantization (×1e6, round,
  * int64): dot products and norms then become EXACT integer arithmetic
  * — bit-identical across engines, partitionings, and reduction orders,
  * which is what makes similarity results reproducible on a 1000-node
  * cluster (float summation order is not). The only floating ops are
  * the final divide/sqrt, which are single IEEE operations.
  */
object VectorFunctions {

  val Scale = 1000000L

  /** array<float> → array<long>, fixed-point. Cast to double first so
    * the multiply is exact-widened before rounding. */
  def quantize(vec: Column): Column =
    transform(vec, e => round(e.cast("double") * Scale).cast("long"))

  /** Exact integer dot product of two quantized vectors (native
    * codegen'd loop — see GraftExpressions.DotProductQ). */
  def dotQ(a: Column, b: Column): Column =
    GraftExpressions.dotQNative(a, b)

  /** Exact integer squared norm of a quantized vector. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from quantized ints: one divide over two sqrts —
    * deterministic given the exact integer inputs. */
  def cosineQ(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") /
      (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Deterministic ±1 hyperplane weights for sign-random-projection:
    * parity of md5(s"$seed:$plane:$dim"). Computed driver-side once and
    * embedded as literals — no per-row hashing, and the DuckDB oracle
    * can embed the identical constants. */
  def srpWeights(planes: Int, dim: Int, seed: String): Seq[Seq[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (0 until dim).map { d =>
        val h = md.digest(s"$seed:$p:$d".getBytes("UTF-8"))
        if ((h(15) & 1) == 0) 1L else -1L
      }
    }
  }

  /** Sign-random-projection bucket (LSH for cosine): sign bit per
    * hyperplane, packed into a long in [0, 2^planes). Exact integer
    * arithmetic on the quantized vector. */
  def srpBucket(qvec: Column, weights: Seq[Seq[Long]]): Column = {
    val bits = weights.zipWithIndex.map { case (w, p) =>
      val proj = dotQ(qvec, typedlit(w))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Binary (sign-bit) quantization: one bit per dimension (qvec[i] >
    * 0), packed 64 per word into array<long> — a 32× compression of
    * float32 whose Hamming distance tracks cosine angle (Charikar
    * 2002: the SRP guarantee with the identity basis). Dims whose
    * quantized value is exactly 0 code as 0. Bit 63 is
    * Long.MinValue — the signed two's-complement pattern is the point,
    * not the arithmetic value, and each bit value is added exactly
    * once so + is OR here (keeps the oracle twin a plain list_sum). */
  def bqSignature(qvec: Column, dim: Int): Column = {
    require(dim > 0, "dim must be positive")
    val words = (0 until dim by 64).map { w0 =>
      (w0 until math.min(w0 + 64, dim)).map { i =>
        when(element_at(qvec, i + 1) > 0, lit(1L << (i - w0)))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }
    array(words: _*)
  }

  /** Hamming distance between two packed signatures: Σ popcount(xor)
    * over words. Pure integer — bit-stable anywhere. */
  def hammingQ(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
}
