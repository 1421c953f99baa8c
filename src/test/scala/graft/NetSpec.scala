package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.functions.Net

/** P6/F5: CIDR containment + strict IPv4 validation (SURVEY §2.2, §2.5). */
class NetSpec extends SparkSpec {
  import spark.implicits._

  private def evalIncidr(cidr: String, ips: Seq[String]): Seq[Boolean] =
    ips.toDF("ip").select(Net.incidr(cidr, col("ip")).as("r"))
      .collect().map(r => !r.isNullAt(0) && r.getBoolean(0)).toSeq

  test("incidr basic containment") {
    assert(evalIncidr("10.0.0.0/8",
      Seq("10.0.0.0", "10.255.255.255", "9.255.255.255", "11.0.0.0")) ===
      Seq(true, true, false, false))
  }

  test("incidr /32 matches exactly one address") {
    assert(evalIncidr("192.168.1.7/32",
      Seq("192.168.1.7", "192.168.1.6", "192.168.1.8")) ===
      Seq(true, false, false))
  }

  test("incidr /0 contains every valid address but not garbage") {
    assert(evalIncidr("0.0.0.0/0",
      Seq("0.0.0.0", "255.255.255.255", "8.8.8.8", "999.1.1.1", "nope")) ===
      Seq(true, true, true, false, false))
  }

  test("incidr /12 boundary (172.16.0.0/12 covers 172.16-172.31)") {
    assert(evalIncidr("172.16.0.0/12",
      Seq("172.15.255.255", "172.16.0.0", "172.31.255.255", "172.32.0.0")) ===
      Seq(false, true, true, false))
  }

  test("incidr agrees with java.net reference implementation") {
    val cidrs = Seq("10.0.0.0/8", "172.16.0.0/12", "192.168.0.0/16",
      "8.8.8.0/24", "1.2.3.4/32")
    val gen = for {
      a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
      c <- Gen.chooseNum(0, 255); d <- Gen.chooseNum(0, 255)
    } yield s"$a.$b.$c.$d"
    val ips = Gen.listOfN(300, gen).sample.get
    def refContains(cidr: String, ip: String): Boolean = {
      val Array(base, plen) = cidr.split("/")
      def pack(s: String): Long = {
        val bytes = java.net.InetAddress.getByName(s).getAddress
        bytes.foldLeft(0L)((acc, x) => (acc << 8) | (x & 0xFF))
      }
      val p = plen.toInt
      val mask = if (p == 0) 0L else (0xFFFFFFFFL << (32 - p)) & 0xFFFFFFFFL
      (pack(ip) & mask) == (pack(base) & mask)
    }
    cidrs.foreach { cidr =>
      val got = evalIncidr(cidr, ips)
      val want = ips.map(refContains(cidr, _))
      assert(got === want, s"cidr $cidr")
    }
  }

  test("isIpv4 strict validation") {
    val cases = Seq(
      "0.0.0.0" -> true, "255.255.255.255" -> true, "1.2.3.4" -> true,
      "256.1.1.1" -> false, "999.1.1.1" -> false, "1.2.3" -> false,
      "1.2.3.4.5" -> false, "" -> false, "a.b.c.d" -> false,
      "01.2.3.4" -> false, // leading zero rejected (strict parse)
      "10.00.1.1" -> false)
    val got = cases.map(_._1).toDF("ip")
      .select(Net.isIpv4(col("ip")).as("r")).collect().map(_.getBoolean(0))
    assert(got.toSeq === cases.map(_._2))
  }

  test("strict native parse == regex-gated composed parse (sampled property)") {
    import graft.plans.GraftFunctions
    val octet = Gen.oneOf(
      Gen.chooseNum(0, 255).map(_.toString), Gen.const("00"), Gen.const("01"),
      Gen.const("256"), Gen.const("999"), Gen.const("x"), Gen.const(""))
    val quasi = for {
      n <- Gen.chooseNum(2, 5); ps <- Gen.listOfN(n, octet)
    } yield ps.mkString(".")
    val strs = (Gen.listOfN(400, quasi).sample.get ++
      Seq("1.2.3.4", "255.255.255.255", "", "1.2.3.4.", ".1.2.3.4")).distinct
    val rows = strs.toDF("ip").select(
        col("ip"),
        when(Net.isIpv4(col("ip")), Net.ipToLong(col("ip"))).as("composed"),
        GraftFunctions.ipToLongNative(col("ip")).as("native"))
      .collect()
    rows.foreach { r =>
      val c = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val n = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(c === n, s"ip='${r.getString(0)}'")
    }
  }

  test("ipToLong/longToIp roundtrip (sampled property)") {
    val ns = Gen.listOfN(200, Gen.chooseNum(0L, 4294967295L)).sample.get :+
      0L :+ 4294967295L
    val back = ns.toDF("n")
      .select(col("n"), Net.ipToLong(Net.longToIp(col("n"))).as("r"))
      .collect()
    back.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }
}
