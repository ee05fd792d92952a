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

  test("degenerate bisection terminates: all mass on one exact key") {
    // one bucket, and ranges so narrow the quantile key cannot separate
    val hist: IndexedSeq[(Array[Byte], Long)] = IndexedSeq((b(5, 5, 5, 5, 5, 5, 5), 1000L))
    val r = Splits.KeyRange(b(5, 5, 5, 5, 5, 5, 5), b(5, 5, 5, 5, 5, 5, 5, 0))
    val splits = Splits.plan(Seq(r), hist, minSplits = 16, maxSplits = 16)
    assert(splits.nonEmpty && splits.size <= 16) // stopped, no infinite loop
  }
}
