package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 / CIDR column functions (SURVEY §2.2 P6, §2.5 F5).
  *
  * Re-expresses the semantics of AQL `INCIDR('10.0.0.0/8', ip)`
  * (reference: qradar/input/queries.json:2-3) and the strict IPv4
  * validation gate (reference: clickhouse/helpers.py:122-128) as pure
  * Catalyst column expressions built from codegen'd builtins — no UDFs,
  * so whole-stage codegen and constant folding apply, and the dotted-quad
  * parse is shared by CSE. At 100 TB scale this keeps CIDR predicates
  * inside the scan stage instead of forcing a black-box UDF barrier.
  */
object Net {

  /** Strict dotted-quad IPv4: four 0-255 octets, no leading zeros —
    * matches python `ipaddress.IPv4Address` acceptance on strings
    * (reference: clickhouse/helpers.py:122-128).
    */
  private val Ipv4Regex =
    "^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"

  def isIpv4(ip: Column): Column = ip.rlike(Ipv4Regex)

  /** Dotted-quad string -> packed unsigned IPv4 as Long (0 .. 2^32-1).
    * Null/garbage input becomes null (try_ variants — under ANSI mode the
    * plain element_at/cast THROW on short arrays / non-numeric octets).
    */
  def ipToLong(ip: Column): Column = {
    val o = split(ip, "\\.")
    def oct(i: Int): Column = try_element_at(o, lit(i)).try_cast("long")
    oct(1) * 16777216L + oct(2) * 65536L + oct(3) * 256L + oct(4)
  }

  /** Packed Long -> dotted-quad string (inverse of ipToLong). */
  def longToIp(n: Column): Column =
    concat_ws(
      ".",
      (n / 16777216L).cast("long") % 256,
      (n / 65536L).cast("long") % 256,
      (n / 256L).cast("long") % 256,
      n % 256
    )

  /** Parse "a.b.c.d/p" at plan-build time -> (network, mask) packed Longs. */
  def parseCidr(cidr: String): (Long, Long) = {
    val Array(base, pLen) = cidr.split("/")
    val octets = base.split("\\.").map(_.toLong)
    require(octets.length == 4 && octets.forall(o => o >= 0 && o <= 255), s"bad CIDR base: $cidr")
    val p = pLen.toInt
    require(p >= 0 && p <= 32, s"bad CIDR prefix: $cidr")
    val ip = octets(0) * 16777216L + octets(1) * 65536L + octets(2) * 256L + octets(3)
    val mask = if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL
    (ip & mask, mask)
  }

  /** AQL `INCIDR(cidrLiteral, ip)` — true iff ip (dotted quad) falls in the
    * CIDR block. Gated on strict validation: without it, `ipToLong` packs
    * malformed strings numerically ("266.1.1.1" -> 266*2^24 masks into
    * 10.0.0.0/8) and the composed form would disagree with the native
    * strict parser on dirty data. The mask compare itself is two Long ops;
    * CSE shares the regex + parse across multiple incidr calls on one
    * column. Scale hot paths should pack once ([[ipToLong]] validated
    * upstream, or [[graft.plans.GraftFunctions.ipToLongNative]]) and use
    * [[incidrPacked]].
    */
  def incidr(cidr: String, ip: Column): Column = {
    val (net, mask) = parseCidr(cidr)
    if (mask == 0L) isIpv4(ip) // /0 contains every valid address
    else isIpv4(ip) && ipToLong(ip).bitwiseAND(lit(mask)) === lit(net)
  }

  /** Same, on an already-packed Long column (scale path: pack once, test
    * many CIDRs without re-parsing the string).
    */
  def incidrPacked(cidr: String, ipLong: Column): Column = {
    val (net, mask) = parseCidr(cidr)
    if (mask == 0L) ipLong.isNotNull
    else ipLong.bitwiseAND(lit(mask)) === lit(net)
  }

  /** The CIDR block lists of the AQL corpus queries (reference:
    * qradar/input/queries.json:2-3) — single source for both the string
    * and packed predicate variants (a block added to one variant only
    * would make them silently disagree).
    */
  val Rfc1918Blocks: Seq[String] =
    Seq("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16")
  val PrivateOrReservedBlocks: Seq[String] =
    Rfc1918Blocks ++ Seq("169.254.0.0/16", "127.0.0.0/8", "0.0.0.0/8")

  /** RFC1918 + loopback + link-local + 0/8 "not public" disjunction used by
    * both AQL corpus queries (reference: qradar/input/queries.json:2-3).
    */
  def isPrivateOrReserved(ip: Column): Column =
    inAnyCidr(PrivateOrReservedBlocks, ip)

  /** Membership in ANY of several CIDR blocks: validate and parse the
    * address ONCE, then mask-compare the shared packed form per block —
    * vs one regex + one dotted-quad parse per block via repeated
    * [[incidr]] calls.
    */
  def inAnyCidr(cidrs: Seq[String], ip: Column): Column = {
    val packed = ipToLong(ip)
    isIpv4(ip) && cidrs.map(c => incidrPacked(c, packed)).reduce(_ || _)
  }

  /** Column metadata marking a Long column as packed IPv4 (domain
    * [0, 2^32)). Attach where the packed column is produced —
    * `df.select(ipToLong(col("ip")).as("ip_long", Net.packedIpv4Metadata))`
    * — to license [[graft.plans.CidrRangeDerivation]]'s scan-pushable
    * range bounds for CIDR predicates on it. Survives parquet round-trips
    * (Spark persists field metadata in the file footer).
    */
  val packedIpv4Metadata: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.ipv4", value = true).build()

  /** The three RFC1918 private blocks only (the AQL queries' positive arm). */
  def isRfc1918(ip: Column): Column =
    inAnyCidr(Rfc1918Blocks, ip)

  /** Packed-Long forms of the two disjunctions — the pack-at-ingest hot
    * path (2 ALU ops per block, no parse, no validity regex: a packed
    * column is valid by construction or null).
    */
  def isRfc1918Packed(ipLong: Column): Column =
    Rfc1918Blocks.map(c => incidrPacked(c, ipLong)).reduce(_ || _)

  def isPrivateOrReservedPacked(ipLong: Column): Column =
    PrivateOrReservedBlocks.map(c => incidrPacked(c, ipLong)).reduce(_ || _)
}
