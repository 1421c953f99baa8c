package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass strict dotted-quad IPv4 parser shared by the interpreted and
  * generated code paths of [[graft.plans.IpToLong]].
  *
  * Returns the packed address in [0, 2^32) or -1 for anything invalid:
  * wrong octet count, empty octet, non-digit, value > 255, or a leading
  * zero (matching strict validators; reference semantics
  * clickhouse/helpers.py:122-128). One pass over the bytes, zero
  * allocations — vs the composed-builtin form (split + 4 casts + arith)
  * which allocates an array and 4 substrings per evaluation.
  */
object IpParse {
  def parse(s: UTF8String): Long = {
    if (s == null) return -1L
    val n = s.numBytes()
    if (n < 7 || n > 15) return -1L
    var ip = 0L
    var octet = 0
    var digits = 0
    var dots = 0
    var leadingZero = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '.') {
        if (digits == 0 || (leadingZero && digits > 1)) return -1L
        ip = (ip << 8) | octet
        octet = 0; digits = 0; leadingZero = false
        dots += 1
        if (dots > 3) return -1L
      } else if (b >= '0' && b <= '9') {
        if (digits == 0 && b == '0') leadingZero = true
        octet = octet * 10 + (b - '0')
        digits += 1
        if (digits > 3 || octet > 255) return -1L
      } else return -1L
      i += 1
    }
    if (dots != 3 || digits == 0 || (leadingZero && digits > 1)) return -1L
    (ip << 8) | octet
  }
}
