package graft.index

import org.scalatest.funsuite.AnyFunSuite

/**
 * Ports of the reference's row-range histogram tests:
 *  - ByteUtilsTest (core/store/.../histogram/ByteUtilsTest.java:12-25) —
 *    the key→double projection's order and round-trip contract;
 *  - RowHistogramFixedDataStaticticsTest
 *    (core/store/.../statistics/RowHistogramFixedDataStaticticsTest.java:28-110)
 *    — cdf over 10k generated row ids, cross-partition merge, binary
 *    round-trip, all through the FIXED-bin histogram;
 *  - RowHistogramDataStaticticsTest
 *    (core/store/.../statistics/RowHistogramDataStaticticsTest.java:47-143)
 *    — the fixed-bin and dynamic (Ben-Haim/Tom-Tov) histograms agree on
 *    cdf within 0.02 over the reference's exact seeded-random key stream.
 */
class FixedBinHistogramPortSpec extends AnyFunSuite {

  test("ByteUtilsTest: key-to-double order and padded round trip") {
    val oneTwo = KeyBytes.toDouble("12".getBytes)
    val oneOneTwo = KeyBytes.toDouble("112".getBytes)
    val oneThree = KeyBytes.toDouble("13".getBytes)
    val oneOneThree = KeyBytes.toDouble("113".getBytes)
    assert(oneTwo > oneOneTwo)
    assert(oneThree > oneTwo)
    assert(oneOneTwo < oneOneThree)
    assert(java.util.Arrays.equals(
      KeyBytes.toPaddedBytes("113".getBytes), KeyBytes.toBytes(oneOneThree)))
  }

  // RowHistogramFixedDataStaticticsTest.genId: "\12%5h" of (base + id)
  // (octal 12 = \n; %h = lowercase hex of the boxed value's hashCode,
  // space-padded to width 5) followed by the literal suffix
  private val base = 7L
  private def genIdFixed(id: Long): Array[Byte] =
    (String.format("\n%5h", java.lang.Long.valueOf(base + id)) + "20030f89").getBytes

  test("RowHistogramFixedDataStaticticsTest: ingest, cdf, merge, binary round trip") {
    val stats = new FixedBinHistogram(1024)
    for (i <- 0L until 10000L) stats.add(KeyBytes.toDouble(genIdFixed(i)))

    assert(math.abs(stats.cdf(KeyBytes.toDouble(genIdFixed(10000))) - 1.0) < 0.00001)
    assert(math.abs(stats.cdf(KeyBytes.toDouble(genIdFixed(0))) - 0.0) < 0.00001)
    assert(math.abs(stats.cdf(KeyBytes.toDouble(genIdFixed(5000))) - 0.5) < 0.04)

    val stats2 = new FixedBinHistogram(1024)
    for (j <- 10000L until 20000L) stats2.add(KeyBytes.toDouble(genIdFixed(j)))
    assert(math.abs(stats2.cdf(KeyBytes.toDouble(genIdFixed(10000))) - 0.0) < 0.00001)

    stats.merge(stats2)
    assert(math.abs(stats.cdf(KeyBytes.toDouble(genIdFixed(10000))) - 0.5) < 0.15)

    // the reference round-trips the merged stats through its binary form
    val thawed = FixedBinHistogram.fromBytes(stats.toBytes)
    assert(math.abs(thawed.cdf(KeyBytes.toDouble(genIdFixed(10000))) - 0.5) < 0.15)
    assert(thawed.totalCount == stats.totalCount)
    assert(thawed.count(64).toSeq == stats.count(64).toSeq)
  }

  // ----- FeatureFixedBinNumericStaticticsTest ports (extensions/adapters/
  // vector/.../stats/FeatureFixedBinNumericStaticticsTest.java:63-379):
  // the reference's attribute-value statistics are this same histogram at
  // its default 32 bins; values go straight to add(), so the SimpleFeature
  // wrapper is irrelevant to the golden expectations.

  test("FeatureFixedBin testPositive: skewed merge, cdf and re-binned counts") {
    val stat = new FixedBinHistogram(32)
    val rand = new java.util.Random(7777)
    stat.add(100.0); stat.add(101.0); stat.add(2.0)
    var next = 1.0
    for (_ <- 0 until 10000) {
      next += math.round(rand.nextDouble()).toDouble
      stat.add(next)
    }
    var stat2 = new FixedBinHistogram(32)
    next += 1000
    val skewvalue = next + 1000 * rand.nextDouble()
    for (_ <- 0 until 10000) stat2.add(skewvalue)
    next += 1000
    var max = 0.0
    for (_ <- 0L until 10000L) {
      val v = next + 1000 * rand.nextDouble()
      stat2.add(v)
      max = math.max(v, max)
    }
    stat2 = FixedBinHistogram.fromBytes(stat2.toBytes) // reference round-trips here
    assert(math.abs(stat2.cdf(max + 1) - 1.0) < 0.00001)
    stat.merge(stat2)
    assert(math.abs(stat.cdf(max + 1) - 1.0) < 0.00001)
    assert(math.abs(stat.cdf(skewvalue - 1000) - 0.33) < 0.01)
    assert(stat.count(10).sum == 30003L)
    val r = stat.percentPopulationOverRange(skewvalue - 1000, skewvalue + 1000)
    assert(r > 0.45 && r < 0.55)
  }

  test("FeatureFixedBin testRapidIncreaseInRange: wide-range merges stay sane") {
    val rand = new java.util.Random(7777)
    var stat1 = new FixedBinHistogram(32)
    var next = 1.0
    for (_ <- 0 until 10000) { next += rand.nextDouble() * 100.0; stat1.add(next) }
    var stat2 = new FixedBinHistogram(32)
    next = 4839434.547854578
    for (_ <- 0L until 10000L) stat2.add(next + 1000.0 * rand.nextDouble())
    stat2 = FixedBinHistogram.fromBytes(stat2.toBytes)
    stat1 = FixedBinHistogram.fromBytes(stat1.toBytes)
    stat1.merge(stat2)
    stat2 = new FixedBinHistogram(32)
    for (_ <- 0 until 40000) stat2.add(math.round(rand.nextDouble()).toDouble)
    var stat3 = new FixedBinHistogram(32)
    next = 54589058545734.049454545458
    for (_ <- 0L until 10000L) stat3.add(next + rand.nextDouble())
    stat2 = FixedBinHistogram.fromBytes(stat2.toBytes)
    stat3 = FixedBinHistogram.fromBytes(stat3.toBytes)
    stat1.merge(stat3)
    stat1.merge(stat2)
    stat1 = FixedBinHistogram.fromBytes(stat1.toBytes)
    assert(stat1.totalCount == 70000L)
    assert(stat1.count(10).sum == 70000L)
  }

  test("FeatureFixedBin testMix: negative range, cdf ends and midpoint") {
    val stat = new FixedBinHistogram(32)
    val rand = new java.util.Random(7777)
    var min = 0.0
    var max = 0.0
    var next = 0.0
    for (_ <- 0 until 10000) {
      next += 100 * rand.nextDouble(); stat.add(next); max = math.max(next, max)
    }
    next = 0.0
    for (_ <- 0 until 10000) {
      next -= 100 * rand.nextDouble(); stat.add(next); min = math.min(next, min)
    }
    assert(math.abs(stat.cdf(min) - 0.0) < 0.00001)
    assert(math.abs(stat.cdf(max) - 1.0) < 0.00001)
    assert(math.abs(stat.cdf(0) - 0.5) < 0.05)
    assert(stat.count(10).sum == 20000L)
    assert(math.abs(stat.percentPopulationOverRange(min / 2, max / 2) - 0.5) < 0.05)
  }

  test("FeatureFixedBin testMix2: 100k Gaussian") {
    val stat = new FixedBinHistogram(32)
    val rand = new java.util.Random(7777)
    var max = 0.0
    for (_ <- 0 until 100000) {
      val next = 1000 * rand.nextGaussian(); stat.add(next); max = math.max(next, max)
    }
    assert(math.abs(stat.cdf(max) - 1.0) < 0.00001)
    assert(math.abs(stat.cdf(0) - 0.5) < 0.05)
    assert(stat.count(10).sum == 100000L)
    assert(math.abs(stat.percentPopulationOverRange(0.0 / 2, max / 2) - 0.5) < 0.05)
  }

  test("negative values follow the reference's Double.MIN_VALUE max init") {
    // the reference initializes maxValue to Java's Double.MIN_VALUE (the
    // smallest POSITIVE subnormal), so after add(-10) the range is
    // (-10, ~0] and add(-5) lands mid-histogram — NOT in the min==max
    // two-value branch a negative-max init would take. Reachable through
    // KeyBytes.toDouble (signed read) for keys with the high bit set.
    val h = new FixedBinHistogram(16)
    h.add(-10.0)
    h.add(-5.0)
    assert(math.abs(h.cdf(-7.5) - 0.5) < 1e-9,
      "add(-5) after add(-10) must land mid-range, not in the last bin")
    assert(h.maxValue == java.lang.Double.MIN_VALUE)
    // constrained histograms stay constrained through the binary form
    val c = new FixedBinHistogram(16, 0.0, 1.0)
    c.add(0.5); c.add(100.0) // out of range: ignored
    assert(c.totalCount == 1)
    val thawed = FixedBinHistogram.fromBytes(c.toBytes, constrained = true)
    thawed.add(100.0)
    assert(thawed.totalCount == 1, "thawed constrained histogram must still clip")
  }

  test("RowHistogramDataStaticticsTest: fixed-bin and dynamic histograms agree on cdf") {
    // the reference's exact key stream: java.util.Random(347), id =
    // "\12%6h" of the boxed DOUBLE bottom + r.nextDouble * (top - bottom)
    val r = new java.util.Random(347)
    def genId(bottom: Long, top: Long): Array[Byte] =
      (String.format("\n%6h",
        java.lang.Double.valueOf(bottom + r.nextDouble() * (top - bottom))) +
        "20030f89").getBytes

    val fixed = new FixedBinHistogram(1024)
    val dynamic = new MinimalBinHistogram(1024)
    for (_ <- 0 until 10000) {
      val id = genId(0, 100000)
      fixed.add(KeyBytes.toDouble(id))
      dynamic.add(KeyBytes.toDouble(id))
    }
    for (i <- 1000 until 100000 by 1000) {
      val half = KeyBytes.toDouble(genId(i, i + 1))
      assert(math.abs(fixed.cdf(half) - dynamic.cdf(half)) < 0.02, s"iteration $i")
    }
    for (_ <- 10000L until 20000L) {
      val id = genId(100000, 200000)
      fixed.add(KeyBytes.toDouble(id))
      dynamic.add(KeyBytes.toDouble(id))
    }
    for (i <- 1000 until 100000 by 1000) {
      val half = KeyBytes.toDouble(genId(i, i + 1))
      assert(math.abs(fixed.cdf(half) - dynamic.cdf(half)) < 0.02, s"iteration $i")
    }
    val nearfull = KeyBytes.toDouble(genId(79998, 89999))
    assert(math.abs(fixed.cdf(nearfull) - dynamic.cdf(nearfull)) < 0.02, "nearfull")
    val nearempty = KeyBytes.toDouble(genId(9998, 9999))
    assert(math.abs(fixed.cdf(nearempty) - dynamic.cdf(nearempty)) < 0.02, "nearempty")
  }
}
