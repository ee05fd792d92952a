package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index.{Lexicoders, SimpleNumeric, SimpleNumericStrategy}

/**
 * Port of the reference's SimpleNumericIndexStrategyTest (parameterized
 * over the Short/Integer/Long strategies, core/index/src/test/java/.../
 * simple/SimpleNumericIndexStrategyTest.java:26-230) plus the
 * Short/Integer/LongLexicoderTest sort-order vectors: point and range
 * query decomposition, per-integer insertion-id replication for ranged
 * data, and unsigned-lexicographic byte order equalling value order.
 */
class SimpleNumericStrategySpec extends AnyFunSuite {

  private val strategies =
    Seq(SimpleNumeric.short, SimpleNumeric.int, SimpleNumeric.long)

  private def unsignedCompare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  test("testGetQueryRangesPoint: a point decomposes to one degenerate range") {
    for (s <- strategies) {
      val (start, end) = s.queryRange(10, 10)
      assert(java.util.Arrays.equals(start, end), s.name)
      assert(s.dec(start) === 10L, s.name)
    }
  }

  test("testGetQueryRangesRange: one contiguous range with the exact endpoints") {
    for (s <- strategies) {
      val (start, end) = s.queryRange(10, 15)
      assert(s.dec(start) === 10L, s.name)
      assert(s.dec(end) === 15L, s.name)
    }
  }

  test("testRangeSortOrder: unsigned byte sort equals value sort") {
    val values = Seq(10L, 0L, 15L, -275L, 982L, 430L, -1L, 1L, 82L)
    for (s <- strategies) {
      val sortedBytes = values.map(v => s.insertionIds(v.toDouble, v.toDouble).head)
        .sortWith(unsignedCompare(_, _) < 0)
      assert(sortedBytes.map(s.dec) === values.sorted, s.name)
    }
  }

  test("testGetInsertionIds: a point is one key; a range replicates per integer") {
    for (s <- strategies) {
      val point = s.insertionIds(5926, 5926)
      assert(point.length === 1 && s.dec(point.head) === 5926L, s.name)
      val range = s.insertionIds(9876, 9876 + 15)
      assert(range.length === 16, s.name)
      assert(range.map(s.dec) === (9876L to 9891L), s.name)
    }
  }

  test("lexicoder sort-order vectors incl. the type extremes (Short/Integer/LongLexicoderTest)") {
    val longs = Seq(-10L, Long.MinValue, 2678L, Long.MaxValue, 0L)
    assert(longs.map(Lexicoders.encodeLong).sortWith(unsignedCompare(_, _) < 0)
      .map(Lexicoders.decodeLong) === longs.sorted)
    val ints = Seq(-10, Int.MinValue, 2678, Int.MaxValue, 0)
    assert(ints.map(Lexicoders.encodeInt).sortWith(unsignedCompare(_, _) < 0)
      .map(Lexicoders.decodeInt) === ints.sorted)
    val shorts = Seq[Short](-10, Short.MinValue, 2678, Short.MaxValue, 0)
    assert(shorts.map(Lexicoders.encodeShort).sortWith(unsignedCompare(_, _) < 0)
      .map(Lexicoders.decodeShort) === shorts.sorted)
  }

  test("Java (T) doubleValue cast semantics on out-of-type-range values") {
    // SimpleShortIndexStrategy.cast is (short) value — wraps like Java
    val k = SimpleNumeric.short.insertionIds(40000, 40000).head
    assert(SimpleNumeric.short.dec(k) === 40000.toShort.toLong)
    // double→int SATURATES (JLS 5.1.3): an unbounded upper query bound
    // keys to Int.MaxValue, never a wrapped negative that inverts the range
    val (s0, e0) = SimpleNumeric.int.queryRange(0, Double.MaxValue)
    assert(SimpleNumeric.int.dec(e0) === Int.MaxValue.toLong)
    assert(unsignedCompare(s0, e0) < 0)
    val (s1, e1) = SimpleNumeric.long.queryRange(0, Double.MaxValue)
    assert(SimpleNumeric.long.dec(e1) === Long.MaxValue)
    assert(unsignedCompare(s1, e1) < 0)
    // Java (short) 3e9: saturate to int, then wrap to short = -1
    val k2 = SimpleNumeric.short.queryRange(3e9, 3e9)._1
    assert(SimpleNumeric.short.dec(k2) === -1L)
  }
}
