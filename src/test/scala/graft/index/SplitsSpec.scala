package graft.index

import org.scalatest.funsuite.AnyFunSuite

/** Histogram-equalized split planning (the reference SplitsProvider's
  * split-largest / merge-two-smallest algorithm over row statistics). */
class SplitsSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def full: Splits.KeyRange = Splits.KeyRange(b(0), Array.fill(8)(0xff.toByte))

  // 16 one-byte prefixes 0x00..0xf0 step 0x10, uniform 100 rows each
  private val uniformHist: IndexedSeq[(Array[Byte], Long)] =
    (0 until 16).map(i => (b(i * 16), 100L))

  test("cdf/quantile round-trip and bucket interpolation") {
    assert(Splits.cdf(uniformHist, b(0)) == 0.0)
    assert(Splits.cdf(uniformHist, b(0x10)) == 100.0)
    // midway through bucket 0x10: prefix + 0x80 next byte = half of it
    assert(math.abs(Splits.cdf(uniformHist, b(0x10, 0x80)) - 150.0) < 1e-9)
    val q = Splits.quantile(uniformHist, 150.0)
    assert(math.abs(Splits.cdf(uniformHist, q) - 150.0) < 1e-6)
    assert(Splits.cdf(uniformHist, Array.fill(4)(0xff.toByte)) > 1599.0)
  }

  test("minSplits bisection: uniform histogram quarters evenly") {
    val splits = Splits.plan(Seq(full), uniformHist, minSplits = 4, maxSplits = 4)
    assert(splits.size == 4)
    val cards = splits.map(_.cardinality)
    assert(math.abs(cards.sum - 1600.0) < 1.0, cards.toString)
    cards.foreach(c => assert(math.abs(c - 400.0) < 40.0, cards.toString))
  }

  test("minSplits bisection subdivides a hot prefix (skewed histogram)") {
    // 90% of rows under prefix 0x80
    val hist: IndexedSeq[(Array[Byte], Long)] =
      (0 until 16).map(i => (b(i * 16), if (i == 8) 9000L else 67L))
    val splits = Splits.plan(Seq(full), hist, minSplits = 8, maxSplits = 8)
    assert(splits.size == 8)
    val cards = splits.map(_.cardinality)
    val mean = cards.sum / cards.size
    assert(cards.max / mean < 2.0, s"max ${cards.max} vs mean $mean")
    // the hot prefix was cut: several split boundaries start with 0x80
    val hotCuts = splits.flatMap(_.ranges).count(r =>
      r.start.nonEmpty && (r.start(0) & 0xff) == 0x80)
    assert(hotCuts >= 4, s"only $hotCuts cuts inside the hot prefix")
  }

  test("maxSplits merges the two smallest until within bound") {
    // 20 input ranges, one per prefix pair, skewed counts
    val hist: IndexedSeq[(Array[Byte], Long)] =
      (0 until 20).map(i => (b(i * 12), (i + 1) * 10L))
    val ranges = (0 until 20).map { i =>
      Splits.KeyRange(b(i * 12), b(i * 12, 0xff, 0xff))
    }
    val splits = Splits.plan(ranges, hist, minSplits = 1, maxSplits = 6)
    assert(splits.size == 6)
    val total = splits.map(_.cardinality).sum
    assert(math.abs(total - (1 to 20).map(_ * 10).sum) < 20.0, total.toString)
    // every input range survives in exactly one split
    assert(splits.map(_.ranges.size).sum == 20)
    // greedy smallest-pair merging balances: no split is tiny
    val cards = splits.map(_.cardinality)
    assert(cards.min >= 100.0, cards.toString) // singleton smalls all merged away
  }

  test("fuzz: planner invariants hold over random histograms and ranges") {
    val rnd = new scala.util.Random(20260817)
    for (trial <- 0 until 100) {
      // random sorted histogram of 1..40 single-byte-prefix buckets
      val nBuckets = 1 + rnd.nextInt(40)
      val prefixes = rnd.shuffle((0 until 256).toList).take(nBuckets).sorted
      val hist: IndexedSeq[(Array[Byte], Long)] =
        prefixes.map(p => (b(p), 1L + rnd.nextInt(10000).toLong)).toIndexedSeq
      // random disjoint input ranges
      val nRanges = 1 + rnd.nextInt(6)
      val cuts = Seq.fill(nRanges * 2)(rnd.nextInt(255)).sorted.distinct
      val ranges = cuts.grouped(2).collect {
        case Seq(s, e) if s < e => Splits.KeyRange(b(s), b(e, 0xff))
      }.toSeq
      if (ranges.nonEmpty) {
        val minS = 1 + rnd.nextInt(12)
        val maxS = minS + rnd.nextInt(12)
        val splits = Splits.plan(ranges, hist, minS, maxS)
        // size bounds (minS may be unreachable on degenerate mass)
        assert(splits.nonEmpty && splits.size <= maxS, s"trial $trial size ${splits.size}")
        // total estimated cardinality is conserved (bisection splits
        // exactly at interpolated cdf points; merging adds)
        val inCard = ranges.map(r => Splits.cardinality(hist, r.start, r.end)).sum
        val outCard = splits.map(_.cardinality).sum
        assert(math.abs(inCard - outCard) <= math.max(1.0, inCard * 1e-6),
          s"trial $trial cardinality $inCard -> $outCard")
        // every output piece nests inside exactly one input range, and the
        // pieces of each input range tile it exactly (adjacent boundaries)
        val pieces = splits.flatMap(_.ranges)
        for (r <- ranges) {
          val mine = pieces.filter(p =>
            ByteUtils.compareUnsigned(p.start, r.start) >= 0 &&
              ByteUtils.compareUnsigned(p.end, r.end) <= 0)
            .sortWith((x, y) => ByteUtils.compareUnsigned(x.start, y.start) < 0)
          assert(mine.nonEmpty, s"trial $trial range lost")
          assert(mine.head.start.sameElements(r.start) && mine.last.end.sameElements(r.end),
            s"trial $trial bounds not preserved")
          mine.sliding(2).foreach {
            case Seq(x, y) => assert(x.end.sameElements(y.start),
              s"trial $trial gap/overlap inside a range")
            case _ =>
          }
        }
        assert(pieces.size == ranges.map(r =>
          pieces.count(p => ByteUtils.compareUnsigned(p.start, r.start) >= 0 &&
            ByteUtils.compareUnsigned(p.end, r.end) <= 0)).sum,
          s"trial $trial piece outside every input range")
      }
    }
  }

  test("degenerate bisection terminates: all mass on one exact key") {
    // one bucket, and ranges so narrow the quantile key cannot separate
    val hist: IndexedSeq[(Array[Byte], Long)] = IndexedSeq((b(5, 5, 5, 5, 5, 5, 5), 1000L))
    val r = Splits.KeyRange(b(5, 5, 5, 5, 5, 5, 5), b(5, 5, 5, 5, 5, 5, 5, 0))
    val splits = Splits.plan(Seq(r), hist, minSplits = 16, maxSplits = 16)
    assert(splits.nonEmpty && splits.size <= 16) // stopped, no infinite loop
  }
}
