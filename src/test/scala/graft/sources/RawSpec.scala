package graft.sources

import graft.SparkSpec

class RawSpec extends SparkSpec {

  private def writeLanding(): String = {
    val dir = java.nio.file.Files.createTempDirectory("landing")
    val f = dir.resolve("batch1.json")
    java.nio.file.Files.writeString(f,
      """{"timestamp":"2024-01-01T10:00:00.000Z","device_name":"d1","state":"cleaning","battery":90,"clean_time":120,"clean_area":50000.0}
        |this line is not json at all
        |{"timestamp":"2024-01-01T10:01:00.000Z","device_name":"d2","state":"idle","battery":77}
        |{"broken": [1,
        |""".stripMargin)
    dir.toString
  }

  test("DROPMALFORMED read keeps only parseable records (F6)") {
    val df = Raw.readStatusDropMalformed(spark, writeLanding())
    val got = rows(df.select("device_name", "battery"))
      .map(r => (r.getString(0), r.getInt(1))).sorted
    assert(got == Seq(("d1", 90), ("d2", 77)))
  }

  test("PERMISSIVE read quarantines malformed lines in _corrupt_record") {
    // Spark disallows queries touching ONLY the corrupt-record column
    // on a raw file scan — materialize first (documented restriction).
    val df = Raw.readStatusQuarantine(spark, writeLanding()).cache()
    try {
      import org.apache.spark.sql.functions.col
      assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
      assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    } finally df.unpersist()
  }
}
