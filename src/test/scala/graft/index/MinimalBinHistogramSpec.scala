package graft.index

import org.scalatest.funsuite.AnyFunSuite

/**
 * Port of the reference's NumericHistogramTest (core/store/src/test/...
 * /histogram/NumericHistogramTest.java:14-77) for the dynamic-bin
 * (MinimalBinDistanceHistogram) side: same seeded PRNG (347), same
 * 10000-value stream, same cdf/quantile expectations and tolerances.
 * (The fixed-bin side of that test is covered by the q09
 * FixedBinNumericStatistics oracle.)
 */
class MinimalBinHistogramSpec extends AnyFunSuite {

  test("NumericHistogramTest golden expectations (seeded stream)") {
    val r = new java.util.Random(347)
    val h = new MinimalBinHistogram()
    for (_ <- 0L until 10000L) h.add(2500 + r.nextDouble() * 99998.0)

    assert(math.abs(h.cdf(2500) - 0.0) < 0.001)
    assert(math.abs(h.cdf(102500) - 1.0) < 0.001)
    assert(math.abs(h.cdf(52500) - 0.5) < 0.02)

    assert(math.abs(h.quantile(0.25) / 1000.0 - 27) < 0.1)
    assert(math.abs(h.quantile(0.5) / 1000.0 - 52) < 0.3)
    assert(math.abs(h.quantile(0.75) / 1000.0 - 78) < 0.3)
  }

  test("merge (Algorithm 2) approximates the single-stream histogram") {
    val r = new java.util.Random(347)
    val values = Array.fill(10000)(2500 + r.nextDouble() * 99998.0)
    val whole = new MinimalBinHistogram()
    values.foreach(whole.add)
    // split into 8 partial histograms and merge pairwise — the
    // reference's DataStatistics.merge path
    val parts = values.grouped(1250).map { chunk =>
      val p = new MinimalBinHistogram()
      chunk.foreach(p.add)
      p
    }.toSeq
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    assert(merged.totalCount == 10000)
    for (q <- Seq(0.25, 0.5, 0.75))
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) < 2000.0,
        s"q=$q merged=${merged.quantile(q)} whole=${whole.quantile(q)}")
    assert(math.abs(merged.cdf(52500) - 0.5) < 0.02)
  }

  test("reference-layout byte round trip preserves the estimator") {
    val r = new java.util.Random(12)
    val h = new MinimalBinHistogram(64)
    for (_ <- 0 until 5000) h.add(r.nextGaussian() * 100 + 500)
    val back = MinimalBinHistogram.fromBytes(h.toBytes)
    assert(back.totalCount == h.totalCount)
    assert(back.numBins == h.numBins)
    for (q <- Seq(0.1, 0.5, 0.9)) assert(back.quantile(q) == h.quantile(q))
    assert(back.cdf(500) == h.cdf(500))
    assert(back.count(10).sameElements(h.count(10)))
  }

  test("trim merges closest bins: capped histogram stays near exact quantiles") {
    val h = new MinimalBinHistogram(16)
    for (i <- 1 to 1000) h.add(i.toDouble)
    assert(h.numBins <= 16)
    assert(math.abs(h.quantile(0.5) - 500) < 40)
    assert(math.abs(h.cdf(250) - 0.25) < 0.05)
  }
}
