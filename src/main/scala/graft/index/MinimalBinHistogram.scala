package graft.index

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/**
 * Streaming dynamic-bin histogram — Ben-Haim & Tom-Tov, "A Streaming
 * Parallel Decision Tree Algorithm" (JMLR 11, 2010) — re-expressed from
 * the reference's MinimalBinDistanceHistogram
 * (core/store/.../statistics/histogram/MinimalBinDistanceHistogram.java:40-516):
 * values insert as (lowerBound, count) bins found by binary search; an
 * over-full histogram trims by merging the closest bin pair into its
 * count-weighted average (ties broken uniformly by a FIXED-seed PRNG —
 * seed 31183, same as the reference — keeping single-stream runs
 * deterministic); merging two histograms is concatenate + stable sort +
 * trim (the paper's Algorithm 2). That merge makes it a mergeable
 * accumulator — the reference's DataStatistics shape — exposed to Spark
 * as an Aggregator by [[graft.spark.Analytics.minimalBinQuantiles]].
 *
 * Ported quirks kept: `add(count, v)` bumps `totalCount` by ONE (not
 * `count`) exactly as the reference does, and `maxValue` starts at 0.0.
 * One deliberate deviation: merging INTO an empty histogram deep-copies
 * the other side's bins where the reference aliases them
 * (MinimalBinDistanceHistogram.java:131-137) — observationally identical
 * when the source is discarded after the merge (the reference's own
 * combiner usage, and Spark's reduce-tree contract), but safe if it is
 * not. Golden-tested against NumericHistogramTest's seeded expectations.
 */
final class MinimalBinHistogram(val nbins: Int = 1024) extends Serializable {

  final class Bin(var lowerBound: Double, var count: Double) extends Serializable

  private var bins = new ArrayBuffer[Bin](math.min(nbins, 1024))
  private var totalCountVar = 0L
  private var maxValue = 0.0
  private val prng = new java.util.Random(31183)

  def totalCount: Long = totalCountVar
  def numBins: Int = bins.size
  def minValue: Double = if (bins.nonEmpty) bins(0).lowerBound else 0.0

  def add(v: Double): Unit = add(1L, v)

  /** Algorithm 1: binary-search the insertion point; exact (±1e-12)
    * lowerBound matches fold into the existing bin, otherwise insert
    * and trim back down to `nbins`. */
  def add(count: Long, v: Double): Unit = {
    totalCountVar += 1 // reference quirk: +1, not +count
    maxValue = math.max(maxValue, v)
    var bin = 0
    var l = 0
    var r = bins.size
    var exact = false
    while (l < r && !exact) {
      bin = (l + r) / 2
      if (bins(bin).lowerBound > v) r = bin
      else if (bins(bin).lowerBound < v) { bin += 1; l = bin }
      else exact = true
    }
    if (bin < bins.size && math.abs(bins(bin).lowerBound - v) < 1e-12) {
      bins(bin).count += count
    } else {
      bins.insert(bin, new Bin(v, count.toDouble))
      if (bins.size > nbins) trim()
    }
  }

  /** Algorithm 2: concatenate, stable-sort by lowerBound, trim. */
  def merge(other: MinimalBinHistogram): Unit = {
    if (other == null) return
    totalCountVar += other.totalCountVar
    maxValue = math.max(other.maxValue, maxValue)
    if (nbins == 0 || bins.isEmpty) {
      bins = other.bins.map(b => new Bin(b.lowerBound, b.count))
      trim() // the constrained bin sizes may not match
    } else {
      val merged = new ArrayBuffer[Bin](bins.size + other.bins.size)
      merged ++= bins
      other.bins.foreach(b => merged += new Bin(b.lowerBound, b.count))
      bins = merged.sortBy(_.lowerBound) // stable, like Collections.sort
      trim()
    }
  }

  /** merge the closest bin pair (count-weighted average position) until
    * back under `nbins`; equal gaps (±1e-12) picked uniformly at random
    * via the fixed-seed PRNG, exactly as the reference. */
  private def trim(): Unit = {
    while (bins.size > nbins) {
      var smallestDiff = bins(1).lowerBound - bins(0).lowerBound
      var loc = 0
      var ties = 1
      var i = 1
      val s = bins.size - 1
      while (i < s) {
        val diff = bins(i + 1).lowerBound - bins(i).lowerBound
        if (diff < smallestDiff) {
          smallestDiff = diff; loc = i; ties = 1
        } else if (diff - smallestDiff < 1e-12) {
          ties += 1
          if (prng.nextDouble() <= 1.0 / ties) loc = i
        }
        i += 1
      }
      val a = bins(loc)
      val b = bins(loc + 1)
      val d = a.count + b.count
      a.lowerBound *= a.count / d
      a.lowerBound += (b.lowerBound / d) * b.count
      a.count = d
      bins.remove(loc + 1)
    }
  }

  /** approximate q-quantile by linear interpolation between bin
    * positions (MinimalBinDistanceHistogram.java:306-330). */
  def quantile(q: Double): Double = {
    require(bins.nonEmpty && nbins > 0)
    var csum = 0.0
    var b = 0
    while (b < bins.size) {
      csum += bins(b).count
      if (csum / totalCountVar >= q) {
        if (b == 0) return bins(b).lowerBound
        csum -= bins(b).count
        return bins(b - 1).lowerBound +
          ((q * totalCountVar - csum) *
            (bins(b).lowerBound - bins(b - 1).lowerBound)) / bins(b).count
      }
      b += 1
    }
    maxValue
  }

  /** accumulates `val += increment` like the reference (java:289-299) —
    * NOT `(i+1)/n` — so the probed q values match the reference's to the
    * bit (the last probe is n·(1/n), not exactly 1.0). */
  def quantiles(n: Int): Array[Double] = {
    val increment = 1.0 / n
    val result = new Array[Double](n)
    var v = increment
    var i = 0
    while (i < n) { result(i) = quantile(v); v += increment; i += 1 }
    result
  }

  /** estimated number of values <= val — the paper's 'sum' procedure
    * (trapezoid area of the interpolated bin coordinates). */
  def sum(value: Double, inclusive: Boolean): Double = {
    if (bins.isEmpty) return 0.0
    val minV = bins(0).lowerBound
    val range = maxValue - minV
    if (range <= 0.0 || value > maxValue) return totalCountVar.toDouble
    if (value < minV) return 0.0
    var foundCount = 0.0
    var i = 0
    var stop = false
    while (i < bins.size && !stop) {
      if (bins(i).lowerBound < value) { foundCount += bins(i).count; i += 1 }
      else stop = true
    }
    val upperBoundary = if (i < numBins) bins(i).lowerBound else maxValue
    val lowerBoundary = if (i > 0) bins(i - 1).lowerBound else 0.0
    val upperCount = if (i < numBins) bins(i).count else 0.0
    val lowerCount = if (i > 0) bins(i - 1).count else 0.0
    foundCount -= lowerCount
    val mb = lowerCount +
      ((upperCount - lowerCount) / (upperBoundary - lowerBoundary)) *
        (value - lowerBoundary)
    val s = ((lowerCount + mb) / 2.0) * (value - lowerBoundary) /
      (upperBoundary - lowerBoundary)
    val r = foundCount + s + lowerCount / 2.0
    if (r > 1.0) r else if (inclusive) 1.0 else r
  }

  def cdf(value: Double): Double = sum(value, inclusive = false) / totalCountVar

  /** estimated per-bin counts over `n` equal-width bins of [min, max]. */
  def count(n: Int): Array[Long] = {
    val result = new Array[Long](n)
    var start = minValue
    val increment = (maxValue - start) / n
    start += increment
    var last = 0L
    var bin = 0
    while (bin < n) {
      val aggSum = math.ceil(sum(start, inclusive = false)).toLong
      result(bin) = aggSum - last
      last = aggSum
      bin += 1
      start += increment
    }
    result
  }

  /** reference-layout serialization (MinimalBinDistanceHistogram
    * .java:404-436): long totalCount ‖ double maxValue ‖ int nbins ‖
    * int used ‖ (double lowerBound, double count)*. */
  def toBytes: Array[Byte] = {
    val buf = ByteBuffer.allocate(bins.size * 16 + 24)
    buf.putLong(totalCountVar)
    buf.putDouble(maxValue)
    buf.putInt(nbins)
    buf.putInt(bins.size)
    bins.foreach { b => buf.putDouble(b.lowerBound); buf.putDouble(b.count) }
    buf.array()
  }
}

object MinimalBinHistogram {
  def fromBytes(bytes: Array[Byte]): MinimalBinHistogram = {
    val buf = ByteBuffer.wrap(bytes)
    val total = buf.getLong
    val maxV = buf.getDouble
    val nbins = buf.getInt
    val used = buf.getInt
    val h = new MinimalBinHistogram(nbins)
    var i = 0
    while (i < used) {
      val lb = buf.getDouble
      val c = buf.getDouble
      h.bins += new h.Bin(lb, c)
      i += 1
    }
    h.totalCountVar = total
    h.maxValue = maxV
    h
  }
}
