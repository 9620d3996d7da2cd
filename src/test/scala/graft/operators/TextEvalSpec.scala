package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed BLEU/chrF cases — the arithmetic is small enough to
  * verify on paper, which is the whole point of pinning it here. */
class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  test("bleu: perfect n-gram precisions with brevity penalty exp(-1)") {
    // cand "the cat sat" ⊂ ref "the cat sat on the mat": p1 = p2 = 1,
    // BP exponent = 1 − 6/3 = −1 ⇒ BLEU-2 = exp(−1) = 0.367879…
    val df = Seq((1L, "g", "the cat sat", "the cat sat on the mat"))
      .toDF("id", "grp", "cand", "ref")
    val r = TextEval.bleu(df, "id", "grp", "cand", "ref", maxN = 2)
      .collect().head
    assert(r.getAs[Long]("cand_len") == 3L)
    assert(r.getAs[Long]("ref_len") == 6L)
    assert(r.getAs[Long]("p1_micro") == 1000000L)
    assert(r.getAs[Long]("p2_micro") == 1000000L)
    assert(r.getAs[Long]("bleu_micro") == 367879L)
  }

  test("bleu: clipping caps repeated tokens; long candidate has BP 1") {
    // "the the the" vs "the cat": clip₁ = min(3, 1) = 1 ⇒ p1 = 1/3,
    // candidate longer than reference ⇒ no brevity penalty.
    val df = Seq((1L, "g", "the the the", "the cat"))
      .toDF("id", "grp", "cand", "ref")
    val r = TextEval.bleu(df, "id", "grp", "cand", "ref", maxN = 1)
      .collect().head
    assert(r.getAs[Long]("p1_micro") == 333333L)
    assert(r.getAs[Long]("bleu_micro") == 333333L)
  }

  test("bleu: any zero p_n (or an empty candidate) scores 0, not NaN") {
    val df = Seq(
      (1L, "short", "xyz", "completely different words here"),
      (2L, "empty", "", "some reference")).toDF("id", "grp", "cand", "ref")
    val got = TextEval.bleu(df, "id", "grp", "cand", "ref", maxN = 2)
      .collect().map(r => r.getAs[String]("grp") ->
        r.getAs[Long]("bleu_micro")).toMap
    assert(got == Map("short" -> 0L, "empty" -> 0L))
  }

  test("bleu: corpus-level pooling sums counts across rows per group") {
    // Two rows, each p1 = 1/2 at the row level — pooled: (1+1)/(2+2).
    val df = Seq(
      (1L, "g", "a b", "a x"), (2L, "g", "c d", "c y"))
      .toDF("id", "grp", "cand", "ref")
    val r = TextEval.bleu(df, "id", "grp", "cand", "ref", maxN = 1)
      .collect().head
    assert(r.getAs[Long]("p1_micro") == 500000L)
    assert(r.getAs[Long]("cand_len") == 4L)
  }

  test("chrF: identical 3-char pair scores exactly 1/2 under 6 orders") {
    // Orders 1–3 are perfect (1e6 each), orders 4–6 have no grams
    // (count-as-zero convention) ⇒ chrP = chrR = 3e6/6 = 500000, and
    // the β-weighted F of equal P = R is the same value.
    val df = Seq((1L, "g", "abc", "abc")).toDF("id", "grp", "cand", "ref")
    val r = TextEval.chrF(df, "id", "grp", "cand", "ref").collect().head
    assert(r.getAs[Long]("chrp_micro") == 500000L)
    assert(r.getAs[Long]("chrr_micro") == 500000L)
    assert(r.getAs[Long]("chrf_micro") == 500000L)
  }

  test("chrF: whitespace is condensed before gramming; empty cand is 0") {
    // "a b c" vs "abc" condense to the same string — chrF must agree.
    val same = Seq((1L, "g", "a b c", "abc")).toDF("id", "grp", "cand", "ref")
    val r1 = TextEval.chrF(same, "id", "grp", "cand", "ref").collect().head
    assert(r1.getAs[Long]("chrf_micro") == 500000L)
    val empty = Seq((1L, "g", "", "abc")).toDF("id", "grp", "cand", "ref")
    val r2 = TextEval.chrF(empty, "id", "grp", "cand", "ref").collect().head
    assert(r2.getAs[Long]("chrf_micro") == 0L)
    assert(r2.getAs[Long]("chrr_micro") == 0L)
  }

  test("chrF: beta weights recall over precision") {
    // cand "ab", ref "abcd…": recall low, precision perfect; β=2 pulls
    // the F toward recall, so F < arithmetic midpoint of P and R.
    val df = Seq((1L, "g", "ab", "abcdefgh")).toDF("id", "grp", "cand", "ref")
    val r = TextEval.chrF(df, "id", "grp", "cand", "ref").collect().head
    val (p, rr, f) = (r.getAs[Long]("chrp_micro"),
      r.getAs[Long]("chrr_micro"), r.getAs[Long]("chrf_micro"))
    assert(p > rr && f < (p + rr) / 2 && f > rr)
  }

  test("rougeN: hand-computed orders, per-row clipping, empty-side NULLs") {
    val df = Seq(
      (1L, "g", "the cat sat", "the cat lay"),
      (2L, "clip", "a a a", "a b"),
      (3L, "nil", "x", ""))
      .toDF("id", "grp", "cand", "ref")
    val got = TextEval.rougeN(df, "id", "grp", "cand", "ref", maxN = 2)
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("n")) -> r).toMap
    // unigrams 2/3 both sides -> P = R = F1 = 2/3
    assert(got(("g", 1L)).getAs[Long]("p_micro") == 666667L)
    assert(got(("g", 1L)).getAs[Long]("r_micro") == 666667L)
    assert(got(("g", 1L)).getAs[Long]("f1_micro") == 666667L)
    // bigrams: only "the cat" matches -> 1/2 everywhere
    assert(got(("g", 2L)).getAs[Long]("f1_micro") == 500000L)
    // "a a a" vs "a b": clip caps repeated "a" at the ref count 1
    assert(got(("clip", 1L)).getAs[Long]("clip") == 1L)
    assert(got(("clip", 1L)).getAs[Long]("p_micro") == 333333L)
    assert(got(("clip", 1L)).getAs[Long]("r_micro") == 500000L)
    assert(got(("clip", 1L)).getAs[Long]("f1_micro") == 400000L)
    // empty reference: recall and F1 are undefined, not zero
    val nil1 = got(("nil", 1L))
    assert(nil1.getAs[Long]("p_micro") == 0L)
    assert(nil1.isNullAt(nil1.fieldIndex("r_micro")))
    assert(nil1.isNullAt(nil1.fieldIndex("f1_micro")))
  }
}
