package graft.sources

/** Apache Iceberg partition-transform value functions, shared by the
  * writer (computing each file's partition tuple) and the reader
  * (transforming predicate literals to prune against stored tuples) —
  * implemented from the PUBLIC spec (iceberg.apache.org/spec — the
  * Partition Transforms table and Appendix B "32-bit Hash
  * Requirements", whose published test vectors pin this
  * implementation in IcebergTransformsSpec):
  *
  *   - `day`: days from the Unix epoch, floor division (negative
  *     timestamps land on the earlier day);
  *   - `bucket[N]`: `(murmur3_x86_32(bytes) & Int.MaxValue) % N`, where
  *     int/long/date values hash as the 8-byte little-endian LONG
  *     (ints widen first, so int 34 and long 34 bucket identically —
  *     the spec's cross-type compatibility rule) and strings hash
  *     their UTF-8 bytes;
  *   - `truncate[W]`: `v - (((v % W) + W) % W)` for integers (floored,
  *     so negatives truncate toward -infinity) and the first W
  *     CODEPOINTS for strings.
  *
  * Every function here is deterministic and total on its domain —
  * the refusal gates for unsupported (transform, type) pairs live in
  * the writer/reader, not here.
  */
private[graft] object IcebergTransforms {

  /** MurmurHash3 x86 32-bit (public domain algorithm), seed 0 per the
    * Iceberg spec's hash requirements.
    */
  def murmur3x86_32(data: Array[Byte], seed: Int = 0): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ => ()
    }
    if ((data.length & 3) != 0) {
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
    }
    // finalization mix
    h1 ^= data.length
    h1 ^= (h1 >>> 16)
    h1 *= 0x85ebca6b
    h1 ^= (h1 >>> 13)
    h1 *= 0xc2b2ae35
    h1 ^= (h1 >>> 16)
    h1
  }

  private def leLongBytes(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putLong(v)
    b.array()
  }

  /** Spec hash of an int/long/date value: the 8-byte little-endian
    * long (ints and date-days widen first).
    */
  def hashLong(v: Long): Int = murmur3x86_32(leLongBytes(v))

  /** Spec hash of a string: its UTF-8 bytes. */
  def hashString(s: String): Int =
    murmur3x86_32(s.getBytes("UTF-8"))

  def bucketOfLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketOfString(s: String, n: Int): Int =
    ((hashString(s) & Int.MaxValue) % n)

  /** Days from epoch of a timestamp in MICROseconds, floor division. */
  def dayOfMicros(us: Long): Int = {
    val d = 86400000000L
    java.lang.Math.floorDiv(us, d).toInt
  }

  /** Hours from epoch of a timestamp in MICROseconds, floor division
    * (the spec's `hour` transform — timestamps only).
    */
  def hourOfMicros(us: Long): Int =
    java.lang.Math.floorDiv(us, 3600000000L).toInt

  /** Months from 1970-01 of an epoch-days value (the spec's `month`
    * transform: 2017-11-16 → 574). Proleptic Gregorian via java.time,
    * matching the spec's calendar.
    */
  def monthOfDays(days: Int): Int = {
    val d = java.time.LocalDate.ofEpochDay(days.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }

  /** Years from 1970 of an epoch-days value (the spec's `year`
    * transform: 2017-11-16 → 47).
    */
  def yearOfDays(days: Int): Int =
    java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970

  def monthOfMicros(us: Long): Int = monthOfDays(dayOfMicros(us))
  def yearOfMicros(us: Long): Int = yearOfDays(dayOfMicros(us))

  /** Floored integer truncation: negatives truncate toward -inf. */
  def truncateLong(v: Long, w: Long): Long =
    v - java.lang.Math.floorMod(v, w)

  /** First `w` CODEPOINTS of a string (the spec truncates by
    * character, not byte).
    */
  def truncateString(s: String, w: Int): String =
    if (s.codePointCount(0, s.length) <= w) s
    else s.substring(0, s.offsetByCodePoints(0, w))
}
