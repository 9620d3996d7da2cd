package graft.operators

import graft.SparkSpec

class RecsysSpec extends SparkSpec {
  import spark.implicits._

  test("covisitation: dedup, power-user cut, exact lift") {
    val inter = Seq(
      ("u1", "A"), ("u1", "A"), ("u1", "B"), // revisit of A dedupes
      ("u2", "A"), ("u2", "B"),
      ("u3", "A"), ("u3", "C"),
      // bot touches everything: > maxItemsPerActor -> dropped entirely
      ("bot", "A"), ("bot", "B"), ("bot", "C"), ("bot", "D"),
      ("bot", "E"))
      .toDF("u", "i")
    val got = Recsys.covisitation(inter, "u", "i",
        minShared = 2, maxItemsPerActor = 4)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // 3 kept actors; A in 3, B in 2; (A,B) shared by 2.
    // lift = 1e6 * 2 * 3 / (3 * 2) = exactly independence.
    assert(got == Map(("A", "B") -> ((2L, 3L, 2L, 1000000L))))
    // With minShared = 1 the (A,C) pair appears; (B,C) never co-occur.
    val loose = Recsys.covisitation(inter, "u", "i",
        minShared = 1, maxItemsPerActor = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(loose == Set(("A", "B"), ("A", "C")))
  }
}
