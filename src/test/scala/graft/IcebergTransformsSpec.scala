package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.sources.IcebergTransforms]] to the PUBLIC test vectors
  * the Iceberg spec publishes in Appendix B ("32-bit Hash
  * Requirements") — if these pass, our bucket numbers agree with every
  * conforming Iceberg implementation, which is what makes the
  * reader's bucket-pruning sound against externally written tables.
  */
class IcebergTransformsSpec extends AnyFunSuite {
  import sources.IcebergTransforms._

  test("spec Appendix B hash vectors") {
    // int and long 34 hash identically (ints widen to 8-byte LE longs)
    assert(hashLong(34L) == 2017239379)
    // string "iceberg" hashes its UTF-8 bytes
    assert(hashString("iceberg") == 1210000089)
    // date 2017-11-16 = 17486 days from epoch, hashed as a long
    assert(hashLong(17486L) == -653330422)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(hashLong(1510871468000000L) == -2047944441)
  }

  test("bucket: non-negative, stable, cross-type consistent") {
    assert(bucketOfLong(34L, 16) == (2017239379 & Int.MaxValue) % 16)
    assert(bucketOfString("iceberg", 16)
      == (1210000089 & Int.MaxValue) % 16)
    // a hash that lands negative still buckets non-negatively
    assert(bucketOfLong(17486L, 16) >= 0)
    (0 until 100).foreach { i =>
      val b = bucketOfLong(i.toLong, 8)
      assert(b >= 0 && b < 8)
    }
  }

  test("day: floor division (negatives land on the earlier day)") {
    assert(dayOfMicros(0L) == 0)
    assert(dayOfMicros(86400000000L - 1) == 0)
    assert(dayOfMicros(86400000000L) == 1)
    assert(dayOfMicros(-1L) == -1)
    assert(dayOfMicros(1510871468000000L) == 17486)
  }

  test("year/month/hour: spec example values, floor semantics, java.time cross-check") {
    // the spec's Partition Transforms examples: 2017-11-16 is epoch
    // day 17486 → year 47 ("2017"), month 574 ("2017-11");
    // 2017-11-16T22:31:08 UTC → hour 17486*24 + 22 = 419686
    assert(yearOfDays(17486) == 47)
    assert(monthOfDays(17486) == 574)
    assert(hourOfMicros(1510871468000000L) == 419686)
    assert(yearOfMicros(1510871468000000L) == 47)
    assert(monthOfMicros(1510871468000000L) == 574)
    // boundaries: Dec 31 / Jan 1 straddle; pre-epoch floors down
    assert(yearOfDays(364) == 0 && yearOfDays(365) == 1) // 1970-12-31 / 1971-01-01
    assert(monthOfDays(30) == 0 && monthOfDays(31) == 1) // 1970-01-31 / 02-01
    assert(yearOfDays(-1) == -1, "1969-12-31 is year -1")
    assert(monthOfDays(-1) == -1, "1969-12-31 is month -1")
    assert(hourOfMicros(-1L) == -1, "pre-epoch micros floor to hour -1")
    // java.time cross-check over a broad sweep
    (-1000 to 30000 by 97).foreach { d =>
      val ld = java.time.LocalDate.ofEpochDay(d.toLong)
      assert(yearOfDays(d) == ld.getYear - 1970)
      assert(monthOfDays(d)
        == (ld.getYear - 1970) * 12 + ld.getMonthValue - 1)
    }
  }

  test("truncate: floored integers, codepoint strings") {
    assert(truncateLong(17L, 10L) == 10L)
    assert(truncateLong(-3L, 10L) == -10L)
    assert(truncateLong(0L, 10L) == 0L)
    assert(truncateString("iceberg", 3) == "ice")
    assert(truncateString("ab", 5) == "ab")
    // astral-plane codepoint counts as ONE character
    val s = new String(Character.toChars(0x1F600)) + "xyz"
    assert(truncateString(s, 2)
      == new String(Character.toChars(0x1F600)) + "x")
  }
}
