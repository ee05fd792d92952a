package graft.index

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ported reference vectors: BitmaskUtilsTest.java (all six tests) and the
 * four lexicoder sort-order tests (DoubleLexicoderTest.java,
 * LongLexicoderTest.java, IntegerLexicoderTest.java,
 * ShortLexicoderTest.java).
 */
class BitmaskLexicoderPortSpec extends AnyFunSuite {

  // ---- BitmaskUtilsTest ----

  test("testGenerateBitSet + testByteSize: single-bit masks match BitSet.toByteArray, minimal length") {
    def bitSetBytes(pos: Int): Array[Byte] = {
      val bs = new java.util.BitSet(); bs.set(pos); bs.toByteArray
    }
    assert(java.util.Arrays.equals(Bitmask.single(0), bitSetBytes(0)))
    assert(java.util.Arrays.equals(Bitmask.single(8), bitSetBytes(8)))
    assert(Bitmask.single(0).length == 1)
    assert(Bitmask.single(8).length == 2)
  }

  test("testGetOrdinal: single-bit masks decompose to their position") {
    assert(Bitmask.fieldPositions(Bitmask.single(0)) == List(0))
    assert(Bitmask.fieldPositions(Bitmask.single(1)) == List(1))
    assert(Bitmask.fieldPositions(Bitmask.single(8)) == List(8))
  }

  test("testCompositeBitmask + testDecompositionOfComposite: fields {0,1,2} round-trip") {
    val mask = Bitmask.composite(Seq(0, 1, 2))
    val bs = new java.util.BitSet(); bs.set(0); bs.set(1); bs.set(2)
    assert(java.util.BitSet.valueOf(mask) == bs)
    assert(Bitmask.fieldPositions(bs.toByteArray) == List(0, 1, 2))
  }

  test("testCompositeSortOrder: field infos sort by position (BitmaskedFieldInfoComparator)") {
    val shuffled = (8 to 0 by -1).map(p => (p, s"field$p"))
    assert(shuffled.sortBy(_._1).map(_._1) == (0 to 8))
  }

  test("AND mask and isAnySet (BitmaskUtils.java:16-38), subset-field descriptor") {
    val stored = Bitmask.composite(Seq(0, 2, 8))
    val wanted = Bitmask.composite(Seq(2, 3))
    assert(Bitmask.fieldPositions(Bitmask.and(stored, wanted)) == List(2))
    assert(Bitmask.isAnySet(Bitmask.and(stored, wanted)))
    assert(!Bitmask.isAnySet(Bitmask.and(Bitmask.single(1), Bitmask.single(2))))
    val fields = IndexedSeq("url", "warc_ts", "html", "text", "lang")
    assert(Bitmask.subsetFields(fields, Bitmask.composite(Seq(0, 3))) == Seq("url", "text"))
  }

  // ---- lexicoder sort-order ports ----

  private def unsignedSort(bs: Seq[Array[Byte]]): Seq[Array[Byte]] =
    bs.sortWith((a, b) => java.util.Arrays.compareUnsigned(a, b) < 0)

  test("LongLexicoderTest.testSortOrder: unsigned byte order == numeric order") {
    val values = Seq(-10L, Long.MinValue, 2678L, Long.MaxValue, 0L)
    val decoded = unsignedSort(values.map(Lexicoders.encodeLong)).map(Lexicoders.decodeLong)
    assert(decoded == values.sorted)
  }

  test("IntegerLexicoderTest.testSortOrder") {
    val values = Seq(-10, Int.MinValue, 2678, Int.MaxValue, 0)
    val decoded = unsignedSort(values.map(Lexicoders.encodeInt)).map(Lexicoders.decodeInt)
    assert(decoded == values.sorted)
  }

  test("ShortLexicoderTest.testSortOrder") {
    val values = Seq[Short](-10, Short.MinValue, 2678, Short.MaxValue, 0)
    val decoded = unsignedSort(values.map(Lexicoders.encodeShort)).map(Lexicoders.decodeShort)
    assert(decoded == values.sorted)
  }

  test("DoubleLexicoderTest.testSortOrder: the reference layout sorts under SIGNED bytes; ours under UNSIGNED") {
    val values = Seq(-10d, java.lang.Double.MIN_VALUE, 11d, -14.2, 14.2,
      -100.002, 100.002, -11d, java.lang.Double.MAX_VALUE, 0d)
    // the reference's DoubleLexicoder composes with the LONG lexicoder, so
    // its own test compares with SignedBytes (DoubleLexicoderTest.java:17-45)
    val refSorted = values.map(Lexicoders.encodeDoubleRef)
      .sortWith((a, b) => java.util.Arrays.compare(a, b) < 0)
      .map(Lexicoders.decodeDoubleRef)
    assert(refSorted == values.sorted)
    // our store layout: same order under UNSIGNED comparison (BinaryType)
    val oursSorted = unsignedSort(values.map(Lexicoders.encodeDouble)).map(Lexicoders.decodeDouble)
    assert(oursSorted == values.sorted)
    // byte-wise the two differ exactly in the leading byte's top bit
    for (v <- values) {
      val ref = Lexicoders.encodeDoubleRef(v)
      val ours = Lexicoders.encodeDouble(v)
      assert((ref(0) ^ ours(0)) == 0x80.toByte && ref.drop(1).sameElements(ours.drop(1)))
    }
  }
}
