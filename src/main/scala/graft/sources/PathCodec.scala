package graft.sources

/** Path/value codecs shared by the open-table-format sources — all from
  * public specs:
  *
  *   - percent-encoding per the Delta transaction-log protocol
  *     (PROTOCOL.md: `add.path` is "a relative path ... percent-encoded").
  *     Decoding is %XX-ONLY: `java.net.URLDecoder` is the wrong tool
  *     because it implements the form-encoding dialect that maps a
  *     literal '+' to a space — and '+' is legal UNencoded in both hive
  *     directory names and URI paths, so externally-written logs
  *     carrying `c++` in a path would resolve to the wrong file;
  *   - hive partition-directory escaping (a fixed special-char set
  *     escaped as %XX on write) — its unescape IS the %XX-only decode;
  *   - ZeroMQ Z85 (the public 0MQ spec 32/Z85): Delta deletion-vector
  *     descriptors carry inline DV bytes and on-disk DV file UUIDs in
  *     Z85.
  */
private[graft] object PathCodec {

  /** %XX-only percent-decode, UTF-8-aware (multi-byte sequences decode
    * byte-wise before the final UTF-8 read). Leaves '+' and every
    * non-escape byte untouched; malformed escapes pass through verbatim
    * rather than throwing — sound for path lookup (a writer that logged
    * a bare '%' meant a literal '%').
    */
  def percentDecode(s: String): String = {
    if (!s.contains('%')) return s
    val bytes = s.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var i = 0
    def hex(b: Byte): Int = b match {
      case d if d >= '0' && d <= '9' => d - '0'
      case a if a >= 'a' && a <= 'f' => a - 'a' + 10
      case a if a >= 'A' && a <= 'F' => a - 'A' + 10
      case _                         => -1
    }
    while (i < bytes.length) {
      if (bytes(i) == '%' && i + 2 < bytes.length &&
          hex(bytes(i + 1)) >= 0 && hex(bytes(i + 2)) >= 0) {
        out.write(hex(bytes(i + 1)) * 16 + hex(bytes(i + 2)))
        i += 3
      } else { out.write(bytes(i)); i += 1 }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Protocol encoding of a physical relative path for `add.path`:
    * readers percent-DECODE the logged path, so each segment is
    * percent-encoded here — decode(encode(x)) == x recovers the
    * hive-escaped PHYSICAL name exactly (a physical `t=12%3A30` logs as
    * `t%3D12%253A30`). Plain alphanumeric/`-._` names pass through.
    */
  def percentEncodePath(rel: String): String =
    rel.split("/").map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"

  private lazy val z85Inv: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85 encode; input length must be a multiple of 4 (Delta pads its
    * DV buffers to word boundaries before encoding).
    */
  def z85Encode(b: Array[Byte]): String = {
    require(b.length % 4 == 0, s"Z85 input length ${b.length} not 4-aligned")
    val sb = new StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (b(i + j) & 0xFFL); j += 1 }
      val chunk = new Array[Char](5)
      var k = 4
      while (k >= 0) { chunk(k) = Z85Alphabet(((v % 85).toInt)); v /= 85; k -= 1 }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not 5-aligned")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) z85Inv(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = ((v >> 24) & 0xFF).toByte
      out(o + 1) = ((v >> 16) & 0xFF).toByte
      out(o + 2) = ((v >> 8) & 0xFF).toByte
      out(o + 3) = (v & 0xFF).toByte
      i += 5
      o += 4
    }
    out
  }
}
