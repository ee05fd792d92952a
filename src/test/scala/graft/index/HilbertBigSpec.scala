package graft.index

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** The unbounded (>62-bit) compact Hilbert path: bit-identity with the
  * Long path on every config the Long path serves, the HilbertSFCTest
  * goldens re-run through BigInteger, and round-trip + decomposition
  * soundness at 96 bits total (the reference serves such configs via
  * UnboundedHilbertSFCOperations.java:1-502). */
class HilbertBigSpec extends AnyFunSuite {

  private val rng = new scala.util.Random(20260819L)

  private def fuzzCoords(bits: Array[Int], n: Int): Seq[Array[Long]] =
    (0 until n).map { _ =>
      bits.map(b => if (b == 0) 0L else math.abs(rng.nextLong()) % (1L << b))
    }

  test("CompactHilbertBig == CompactHilbert on every shipped config (index + inverse)") {
    for (bits <- Seq(Array(31, 31), Array(20, 20, 20), Array(25, 25, 10),
                     Array(10, 10, 40), Array(5, 3), Array(1, 7, 2))) {
      val small = new CompactHilbert(bits)
      val big = new CompactHilbertBig(bits)
      for (p <- fuzzCoords(bits, 300)) {
        val hs = small.index(p)
        val hb = big.index(p.map(BigInteger.valueOf))
        assert(hb == BigInteger.valueOf(hs), s"bits=${bits.mkString(",")} p=${p.mkString(",")}")
        assert(big.indexInverse(hb).map(_.longValueExact()).toSeq == small.indexInverse(hs).toSeq)
      }
    }
  }

  test("HilbertSFCTest golden vectors reproduce through the BigInteger path") {
    val latLon = new HilbertSFCBig(
      Array(LatitudeDim(), LongitudeDim).map(d => SFCDimension(d, 31)))
    def toLong(b: Array[Byte]): Long = java.nio.ByteBuffer.wrap(b).getLong
    assert(latLon.byteCount == 8)
    assert(toLong(latLon.getId(Array(90, 180))) == 3074457345618258602L)
    assert(toLong(latLon.getId(Array(-90, -180))) == 0L)
    assert(toLong(latLon.getId(Array(0, 0))) == 768614336404564650L)
  }

  test("HilbertSFCBig.getId is byte-identical to HilbertSFC.getId at <=62 bits") {
    val dims = Array(SFCDimension(LongitudeDim, 31), SFCDimension(LatitudeDim(), 31))
    val small = new HilbertSFC(dims)
    val big = new HilbertSFCBig(dims)
    for (_ <- 0 until 500) {
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 180 - 90
      assert(java.util.Arrays.equals(small.getId(Array(lon, lat)), big.getId(Array(lon, lat))),
        s"($lon, $lat)")
    }
  }

  test("decomposeRange agrees with the Long path at <=62 bits (same boxes, same bytes)") {
    val dims = Array(SFCDimension(LongitudeDim, 31), SFCDimension(LatitudeDim(), 31))
    val small = new HilbertSFC(dims)
    val big = new HilbertSFCBig(dims)
    for (_ <- 0 until 40) {
      val x0 = rng.nextDouble() * 300 - 170; val x1 = x0 + rng.nextDouble() * 40
      val y0 = rng.nextDouble() * 140 - 80; val y1 = y0 + rng.nextDouble() * 30
      val q = Array(NumericData(x0, x1), NumericData(y0, y1))
      val rs = small.decomposeRange(q, overInclusiveOnEdge = true, 50)
      val rb = big.decomposeRange(q, overInclusiveOnEdge = true, 50)
      assert(rs.length == rb.length)
      for ((a, b) <- rs.zip(rb)) {
        assert(java.util.Arrays.equals(a.start, b.start))
        assert(java.util.Arrays.equals(a.end, b.end))
      }
    }
  }

  // -------------------------------------------- the >62-bit store key path

  private val dims96 = Array(SFCDimension(LongitudeDim, 48), SFCDimension(LatitudeDim(), 48))
  private val sfc96 = new HilbertSFCBig(dims96)

  test("96-bit keys: 12-byte width, round-trip, curve order == byte order") {
    assert(sfc96.byteCount == 12)
    val ids = (0 until 300).map { _ =>
      val lon = rng.nextDouble() * 360 - 180
      val lat = rng.nextDouble() * 180 - 90
      val id = sfc96.getId(Array(lon, lat))
      assert(id.length == 12)
      // id -> coordinates -> id round-trips exactly
      val p = sfc96.getCoordinates(id)
      assert(java.util.Arrays.equals(sfc96.idToBytes(sfc96.hilbert.index(p)), id))
      // the id's cell bounds contain the encoded point (up to the bucket
      // edge rules: the cell is [min, max) per dimension)
      val bounds = sfc96.getRangesForId(id)
      assert(bounds(0).min <= lon && lon <= bounds(0).max + 1e-9)
      assert(bounds(1).min <= lat && lat <= bounds(1).max + 1e-9)
      id
    }
    // unsigned byte comparison is consistent with BigInteger order
    for (Seq(a, b) <- ids.sliding(2).toSeq.take(100)) {
      val byBytes = ByteUtils.compareUnsigned(a, b)
      val byValue = sfc96.bytesToId(a).compareTo(sfc96.bytesToId(b))
      assert(math.signum(byBytes.toDouble) == math.signum(byValue.toDouble))
    }
  }

  test("96-bit bijectivity: index <-> inverse over fuzzed coordinates") {
    val ch = sfc96.hilbert
    for (_ <- 0 until 300) {
      val p = Array.fill(2)(new BigInteger(48, new java.util.Random(rng.nextLong())))
      val h = ch.index(p)
      assert(ch.indexInverse(h).toSeq == p.toSeq)
      assert(h.signum() >= 0 && h.bitLength() <= 96)
    }
  }

  test("96-bit decomposition soundness: every in-box point's key falls in a range") {
    for (_ <- 0 until 20) {
      val x0 = rng.nextDouble() * 300 - 170; val x1 = x0 + rng.nextDouble() * 20 + 0.001
      val y0 = rng.nextDouble() * 140 - 80; val y1 = y0 + rng.nextDouble() * 15 + 0.001
      val q = Array(NumericData(x0, x1), NumericData(y0, y1))
      val ranges = sfc96.decomposeRange(q, overInclusiveOnEdge = true, 200)
      assert(ranges.nonEmpty && ranges.length <= 200)
      // sorted & disjoint
      for (Array(a, b) <- ranges.sliding(2))
        assert(ByteUtils.compareUnsigned(a.end, b.start) < 0)
      // coverage: sampled interior points decode into some range
      for (_ <- 0 until 50) {
        val lon = x0 + rng.nextDouble() * (x1 - x0)
        val lat = y0 + rng.nextDouble() * (y1 - y0)
        val id = sfc96.getId(Array(lon, lat))
        assert(ranges.exists(r =>
          ByteUtils.compareUnsigned(r.start, id) <= 0 &&
            ByteUtils.compareUnsigned(id, r.end) <= 0),
          s"point ($lon, $lat) escaped the decomposition")
      }
    }
  }

  test("96-bit decomposition budget: merging smallest gaps keeps coverage") {
    val q = Array(NumericData(10, 57), NumericData(25, 50))
    val wide = sfc96.decomposeRange(q, overInclusiveOnEdge = true, 0)
    val capped = sfc96.decomposeRange(q, overInclusiveOnEdge = true, 5)
    assert(capped.length <= 5)
    // every uncapped range is contained in some capped range
    for (r <- wide)
      assert(capped.exists(c =>
        ByteUtils.compareUnsigned(c.start, r.start) <= 0 &&
          ByteUtils.compareUnsigned(r.end, c.end) <= 0))
  }
}
