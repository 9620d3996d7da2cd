package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Network-address analytics — the geo/ASN enrichment layer of a
  * crawl pipeline: every fetched page carries a server IP, and
  * routing it to its announcing network (ASN, hosting provider,
  * country registry) is a prefix-table lookup, not an equality — the
  * classic longest-prefix-match that SQL engines have no native join
  * for. The reference's analogue is its device→config state lookup
  * (J1, `pipeline.py:472-572`); here the key is a CIDR range.
  */
object Net {

  /** Dotted-quad IPv4 string → unsigned 32-bit address as a Long
    * (`"10.0.0.1"` → 167772161). NULL for anything that is not four
    * dot-separated decimal octets in [0, 255] — leading zeros
    * accepted (inet_aton style), garbage quarantined as NULL rather
    * than half-parsed. Map-only. */
  def ipv4ToLong(ip: Column): Column = {
    val octets = transform(split(ip, "\\."), p => p.cast("long"))
    when(ip.rlike("^[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}$") &&
        forall(octets, o => o <= 255),
      element_at(octets, 1) * 16777216L + element_at(octets, 2) * 65536L +
        element_at(octets, 3) * 256L + element_at(octets, 4))
  }

  /** Driver-side twin of [[ipv4ToLong]] for literal route tables and
    * specs. Throws on malformed input (a literal table wants a loud
    * failure, not a NULL row). */
  def ipv4ToLongScala(ip: String): Long = {
    val parts = ip.split('.')
    require(parts.length == 4 && parts.forall(p =>
        p.nonEmpty && p.forall(_.isDigit) && p.toLong <= 255),
      s"not a dotted-quad IPv4: $ip")
    parts.foldLeft(0L)((a, o) => a * 256L + o.toLong)
  }

  /** Unsigned-32-bit-as-Long address → dotted quad. Exact integer
    * bit extraction (shift + mask — the standing integer-exactness
    * rule; no float division); an address outside [0, 2³²) is
    * quarantined as NULL, mirroring [[ipv4ToLong]]'s treatment of
    * malformed input. Map-only. */
  def longToIpv4(addr: Column): Column =
    when(addr >= 0L && addr < 4294967296L,
      concat_ws(".",
        shiftright(addr, 24).bitwiseAND(lit(255L)),
        shiftright(addr, 16).bitwiseAND(lit(255L)),
        shiftright(addr, 8).bitwiseAND(lit(255L)),
        addr.bitwiseAND(lit(255L))))

  /** `addr` masked to its top `prefixLen` bits (the network part of a
    * /prefixLen CIDR block) via a compile-time netmask literal —
    * exact integer bitwise AND, identical in every engine; /0 masks
    * to 0. */
  def maskToPrefix(addr: Column, prefixLen: Int): Column = {
    require(prefixLen >= 0 && prefixLen <= 32,
      s"prefixLen out of [0, 32]: $prefixLen")
    if (prefixLen == 0) lit(0L)
    else addr.bitwiseAND(lit((1L << 32) - (1L << (32 - prefixLen))))
  }

  /** Longest-prefix-match join: route every address to the MOST
    * SPECIFIC covering CIDR block — the IP→ASN / IP→geo enrichment
    * every crawl log needs, expressed as pure equi-joins. The trick
    * is standard (how routers and Hive/BigQuery recipes both do it):
    * the prefix-length SET of the route table is tiny (≤ 33 values),
    * so each address expands to one masked candidate key per distinct
    * prefix length present, the candidates equi-join the route table
    * on (prefix_len, network), and the winner per address is the max
    * prefix length — a k-bounded max_by, k ≤ 33.
    *
    * `routes` must be (prefix_len int, network long)-distinct with
    * `network` already masked to its own prefix (the fixture dedups;
    * real BGP tables are). The distinct prefix-length list is
    * collected to the driver — a ≤ 33-row action on a model-sized
    * dimension, the same bounded-collect contract as the IVF
    * centroid attach.
    *
    * Scale: addresses × |prefix lens| candidate rows, broadcast
    * route table (a full BGP table is ~1M rows ≈ tens of MB — still
    * broadcastable; beyond that the same plan works as a shuffle
    * equi-join), max_by winner agg keyed on the address row id. No
    * range join, no cross join, no UDF.
    *
    * Output: input id + addr + (prefix_len, network, + `payloadCols`)
    * of the winning route; unrouted addresses absent (inner-join
    * semantics — the caller left-joins back if default-route rows are
    * wanted). */
  def lpmJoin(
      addrs: DataFrame,
      idCol: String,
      addrCol: String,
      routes: DataFrame,
      payloadCols: Seq[String]): DataFrame = {
    val lens = routes.select(col("prefix_len").cast("int"))
      .distinct().collect().map(_.getInt(0)).sorted
    require(lens.nonEmpty, "routes table has no prefix lengths")
    require(lens.forall(l => l >= 0 && l <= 32),
      s"prefix_len out of [0, 32]: ${lens.mkString(",")}")
    // One (prefix_len, masked network) candidate per distinct length,
    // with each netmask folded in as a compile-time literal.
    val lenMask = explode(array(lens.map(l =>
      struct(lit(l).as("prefix_len"),
        lit(if (l == 0) 0L else (1L << 32) - (1L << (32 - l)))
          .as("__mask"))): _*)).as("__lm")
    val cand = addrs
      .select(col(idCol), col(addrCol).as("__addr"))
      .select(col(idCol), col("__addr"), lenMask)
      .select(col(idCol), col("__addr"),
        col("__lm.prefix_len").as("prefix_len"),
        col("__addr").bitwiseAND(col("__lm.__mask")).as("network"))
    val hits = cand.join(broadcast(routes), Seq("prefix_len", "network"))
    val payload = struct(
      col("prefix_len") +: col("network") +: payloadCols.map(col): _*)
    hits
      .groupBy(col(idCol), col("__addr").as(addrCol))
      .agg(max_by(payload, col("prefix_len")).as("__win"))
      .select(col(idCol), col(addrCol), col("__win.*"))
  }
}
