package graft.sources

import graft.SparkSpec
import java.nio.file.Files

class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft-tables").toString

  test("overwriteState swaps atomically and survives repeated overwrites") {
    val dir = freshDir()
    Tables.overwriteState(Seq(("d1", 1L)).toDF("dev", "n"), dir, "state")
    assert(Tables.read(spark, dir, "state").as[(String, Long)].collect()
      .toSeq == Seq(("d1", 1L)))
    Tables.overwriteState(Seq(("d1", 2L), ("d2", 5L)).toDF("dev", "n"), dir, "state")
    val got = Tables.read(spark, dir, "state").as[(String, Long)]
      .collect().sorted.toSeq
    assert(got == Seq(("d1", 2L), ("d2", 5L)))
    // No leftover park/tmp dirs after a clean swap.
    assert(!new java.io.File(s"$dir/_old_state").exists())
    assert(!new java.io.File(s"$dir/_tmp_state").exists())
  }

  test("overwriteState recovers state parked by a crash between renames") {
    val dir = freshDir()
    Tables.overwriteState(Seq(("d1", 7L)).toDF("dev", "n"), dir, "state")
    // Simulate a crash AFTER parking the old state and BEFORE promoting
    // the new one: target missing, parked copy present.
    val target = new java.io.File(s"$dir/state")
    val parked = new java.io.File(s"$dir/_old_state")
    assert(target.renameTo(parked))

    // READERS must see the recovered state (recovery at write time only
    // would let a sync cold-start before the next overwrite).
    assert(Tables.exists(spark, dir, "state"))
    assert(Tables.read(spark, dir, "state").as[(String, Long)].collect()
      .toSeq == Seq(("d1", 7L)))
    assert(!parked.exists() && target.exists())

    // And the next overwrite proceeds normally on the recovered state.
    Tables.overwriteState(Seq(("d1", 8L)).toDF("dev", "n"), dir, "state")
    assert(Tables.read(spark, dir, "state").as[(String, Long)].collect()
      .toSeq == Seq(("d1", 8L)))
  }
}
