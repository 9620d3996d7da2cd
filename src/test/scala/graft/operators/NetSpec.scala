package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NetSpec extends SparkSpec {
  import spark.implicits._

  test("ipv4ToLong: valid quads parse, garbage quarantines to NULL") {
    val got = Seq("10.0.0.1", "255.255.255.255", "0.0.0.0", "010.0.0.1",
        "256.0.0.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "1.2.3.4x", "")
      .toDF("ip")
      .select(col("ip"), Net.ipv4ToLong(col("ip")).as("n"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(got("10.0.0.1") == 167772161L)
    assert(got("255.255.255.255") == 4294967295L)
    assert(got("0.0.0.0") == 0L)
    assert(got("010.0.0.1") == 167772161L) // inet_aton-style leading zero
    assert(got("256.0.0.1") == null) // octet out of range
    assert(got("1.2.3") == null)
    assert(got("1.2.3.4.5") == null)
    assert(got("a.b.c.d") == null)
    assert(got("1.2.3.4x") == null)
    assert(got("") == null)
  }

  test("longToIpv4 round-trips ipv4ToLong") {
    val ips = Seq("10.0.0.1", "192.168.17.254", "8.8.8.8").toDF("ip")
    val back = ips
      .select(Net.longToIpv4(Net.ipv4ToLong(col("ip"))).as("rt"),
        col("ip"))
      .collect()
    back.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("maskToPrefix: netmask literals, /0 masks to zero") {
    val addr = Seq(0xC0A811FEL).toDF("a") // 192.168.17.254
    val got = addr.select(
      Net.maskToPrefix(col("a"), 0).as("p0"),
      Net.maskToPrefix(col("a"), 8).as("p8"),
      Net.maskToPrefix(col("a"), 24).as("p24"),
      Net.maskToPrefix(col("a"), 32).as("p32")).head()
    assert(got.getLong(0) == 0L)
    assert(got.getLong(1) == 0xC0000000L) // 192.0.0.0
    assert(got.getLong(2) == 0xC0A81100L) // 192.168.17.0
    assert(got.getLong(3) == 0xC0A811FEL)
  }

  test("lpmJoin: most-specific route wins; unrouted rows absent") {
    // Routes: 10.0.0.0/8 -> big, 10.1.0.0/16 -> mid, 10.1.2.0/24 -> fine.
    val routes = Seq(
      (8, Net.ipv4ToLongScala("10.0.0.0"), "big"),
      (16, Net.ipv4ToLongScala("10.1.0.0"), "mid"),
      (24, Net.ipv4ToLongScala("10.1.2.0"), "fine"))
      .toDF("prefix_len", "network", "name")
    val addrs = Seq(
      (1L, "10.9.9.9"),   // only /8 covers
      (2L, "10.1.9.9"),   // /8 and /16 -> /16 wins
      (3L, "10.1.2.3"),   // all three -> /24 wins
      (4L, "172.16.0.1")) // unrouted
      .toDF("id", "ip")
      .select(col("id"), Net.ipv4ToLong(col("ip")).as("addr"))
    val got = Net.lpmJoin(addrs, "id", "addr", routes, Seq("name"))
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(4)))
      .toMap
    assert(got == Map(
      1L -> ((8, "big")), 2L -> ((16, "mid")), 3L -> ((24, "fine"))))
  }

  test("lpmJoin rejects out-of-range prefix lengths") {
    val routes = Seq((33, 0L, "bad")).toDF("prefix_len", "network", "name")
    val addrs = Seq((1L, 5L)).toDF("id", "addr")
    val e = intercept[IllegalArgumentException] {
      Net.lpmJoin(addrs, "id", "addr", routes, Seq("name"))
    }
    assert(e.getMessage.contains("prefix_len"))
  }
}
