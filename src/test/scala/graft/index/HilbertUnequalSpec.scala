package graft.index

import org.scalatest.funsuite.AnyFunSuite

/**
 * Properties pinning the UNEQUAL-precision compact Hilbert path
 * (Hamilton CS-2006-07 Algorithms 7/8 — the uzaygezen code path the
 * reference uses for non-uniform index configs, which ships no golden
 * vectors). Exhaustive over several bit layouts:
 *
 *  1. DEFINING PROPERTY — subgrid-rank projection: the compact index of
 *     a cell equals the RANK of its full-grid Hilbert index (max-bits
 *     equal-precision curve, the golden-pinned path) among all subgrid
 *     cells. Hamilton's construction forces exhausted dimensions' label
 *     bits to the entry pattern, and the gray-code rank is
 *     order-preserving on that constrained subset, so the compact curve
 *     IS the full curve restricted to the subgrid.
 *  2. bijectivity + index/inverse round-trip over every cell.
 *  3. decomposeRange soundness: for random query boxes the union of the
 *     decomposed inclusive id ranges covers exactly the ids of
 *     intersecting cells (small grids stay under the coarsening floor,
 *     so the cover is exact).
 *  4. equal-precision configs remain pinned by the existing goldens
 *     (HilbertSpec) — the mask is full and the rank the identity.
 */
class HilbertUnequalSpec extends AnyFunSuite {

  private val layouts = Seq(
    Array(2, 1), Array(1, 3), Array(3, 2), Array(2, 2, 1), Array(1, 2, 3),
    Array(4, 1), Array(25, 10).map(_ / 5) /* bias shape, scaled */)

  private def allCells(bits: Array[Int]): Seq[Array[Long]] = {
    val dims = bits.map(b => 0L until (1L << b))
    dims.foldLeft(Seq(Seq.empty[Long]))((acc, d) => acc.flatMap(p => d.map(p :+ _)))
      .map(_.toArray)
  }

  test("compact index == rank of the full-grid Hilbert index over the subgrid") {
    for (bits <- layouts) {
      val compact = new CompactHilbert(bits)
      val full = new CompactHilbert(Array.fill(bits.length)(bits.max))
      val cells = allCells(bits)
      val fullOrder = cells.sortBy(full.index)
      fullOrder.zipWithIndex.foreach { case (cell, rank) =>
        assert(compact.index(cell) === rank.toLong,
          s"bits=${bits.mkString("/")} cell=${cell.mkString(",")}")
      }
    }
  }

  test("bijectivity and index/inverse round-trip over every cell") {
    for (bits <- layouts) {
      val h = new CompactHilbert(bits)
      val cells = allCells(bits)
      val ids = cells.map(h.index)
      assert(ids.sorted === (0L until (1L << bits.sum)),
        s"bits=${bits.mkString("/")} not a bijection")
      cells.foreach { c =>
        assert(h.indexInverse(h.index(c)).toSeq === c.toSeq)
      }
    }
  }

  test("decomposeRange covers exactly the intersecting cells (exhaustive, random boxes)") {
    val rnd = new scala.util.Random(42L)
    for (bits <- Seq(Array(2, 1), Array(1, 3), Array(3, 2), Array(2, 2, 1))) {
      val dims = bits.map(b => SFCDimension(BasicDim(0, (1 << b).toDouble), b))
      val sfc = new HilbertSFC(dims)
      for (_ <- 1 to 40) {
        val box = bits.map { b =>
          val lo = rnd.nextInt(1 << b)
          val hi = lo + rnd.nextInt((1 << b) - lo)
          // cell-aligned box: [lo, hi] buckets == [lo, hi+1) native units
          NumericData(lo + 0.25, hi + 0.75)
        }
        val got = sfc.decomposeRange(box, overInclusiveOnEdge = false, maxRanges0 = 0)
          .flatMap(r => sfc.bytesToId(r.start) to sfc.bytesToId(r.end)).toSet
        val want = allCells(bits).filter { c =>
          c.indices.forall(d => c(d) >= math.floor(box(d).min) && c(d) <= math.floor(box(d).max))
        }.map(sfc.hilbert.index).toSet
        assert(got === want, s"bits=${bits.mkString("/")} box=${box.mkString(",")}")
      }
    }
  }

  test("Bias presets: allocations, codegen fast path == tiered insertion id, sound prefilter") {
    assert(TieredStrategy.biasBits("SPATIAL") === ((25, 10)))
    assert(TieredStrategy.biasBits("TEMPORAL") === ((10, 40)))
    assert(TieredStrategy.biasBits("BALANCED") === ((20, 20)))
    intercept[IllegalArgumentException] { TieredStrategy.biasBits("DIAGONAL") }
    val rnd = new scala.util.Random(7L)
    for (bias <- Seq("SPATIAL", "TEMPORAL", "BALANCED")) {
      val s = graft.spark.GeoCodec.stBiased(bias)
      val (sb, tb) = TieredStrategy.biasBits(bias)
      assert(s.sfcs.last.dimensions.map(_.bits).toSeq === Seq(sb, sb, tb))
      for (_ <- 1 to 50) {
        val lon = rnd.nextDouble() * 360 - 180
        val lat = rnd.nextDouble() * 180 - 90
        val ts = 1700000000000L + rnd.nextLong(31536000000L)
        // the codegen'd finest-tier fast path must equal the pure tiered
        // point insertion id byte-for-byte
        val fast = graft.spark.GeoCodec.cellIdSTBiased(lon, lat, ts, sb, tb)
        val tiered = s.getInsertionIds(Array(
          NumericData(lon, lon), NumericData(lat, lat),
          NumericData(ts.toDouble, ts.toDouble)))
        assert(tiered.length === 1, s"$bias point must land on one tier")
        assert(java.util.Arrays.equals(fast, tiered.head), s"$bias key mismatch")
      }
      // prefilter soundness: every point INSIDE a box+window must fall in
      // some decomposed biased range (coarse ranges may over-include,
      // never exclude)
      for (_ <- 1 to 20) {
        val lon0 = rnd.nextDouble() * 300 - 160; val lat0 = rnd.nextDouble() * 140 - 80
        val (lonMin, lonMax) = (lon0, lon0 + rnd.nextDouble() * 10)
        val (latMin, latMax) = (lat0, lat0 + rnd.nextDouble() * 10)
        val t0 = 1700000000000L + rnd.nextLong(20000000000L)
        val t1 = t0 + 1 + rnd.nextLong(5000000000L)
        val ranges = graft.spark.SpatialPlanner.stBoxRangesBiased(
          bias, lonMin, lonMax, latMin, latMax, t0, t1)
        for (_ <- 1 to 25) {
          val lon = lonMin + rnd.nextDouble() * (lonMax - lonMin)
          val lat = latMin + rnd.nextDouble() * (latMax - latMin)
          val ts = t0 + rnd.nextLong(t1 - t0)
          val key = graft.spark.GeoCodec.cellIdSTBiased(lon, lat, ts, sb, tb)
          val covered = ranges.exists { case (a, b) =>
            ByteUtils.compareUnsigned(a, key) <= 0 && ByteUtils.compareUnsigned(key, b) <= 0
          }
          assert(covered, s"$bias point ($lon,$lat,$ts) escaped the prefilter")
        }
      }
    }
  }

  test("single-dimension and zero-bit edge layouts") {
    // one dim: the curve is the identity over [0, 2^b)
    val h1 = new CompactHilbert(Array(3))
    (0L until 8L).foreach(v => assert(h1.index(Array(v)) === v))
    // a zero-bit dimension contributes nothing anywhere
    val h2 = new CompactHilbert(Array(2, 0))
    val flat = new CompactHilbert(Array(2))
    (0L until 4L).foreach { v =>
      assert(h2.index(Array(v, 0L)) === flat.index(Array(v)))
    }
  }
}
