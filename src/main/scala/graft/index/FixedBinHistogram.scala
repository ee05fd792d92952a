package graft.index

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer

/**
 * Row-key → double projection for range histograms — a faithful port of the
 * reference's histogram ByteUtils
 * (core/store/.../statistics/histogram/ByteUtils.java:25-108): keys are
 * right-zero-padded to 8 bytes and read as a SIGNED big-endian integer, so
 * lexicographic byte order maps to numeric order for keys with the high bit
 * clear (ASCII row keys, our salt ‖ cell ids) — the projection the
 * reference's RowRangeHistogramStatistics ingests every row id through
 * (RowRangeHistogramStatistics.java:176-183).
 */
object KeyBytes {

  private val InfinityByte = Array.fill[Byte](8)(0xff.toByte)

  def toPaddedBytes(b: Array[Byte]): Array[Byte] = {
    if (b.length == 8) return b
    val out = new Array[Byte](8)
    System.arraycopy(b, 0, out, 0, math.min(b.length, 8))
    out
  }

  def toDouble(data: Array[Byte]): Double =
    new BigInteger(toPaddedBytes(data)).doubleValue()

  def toLong(data: Array[Byte]): Long =
    new BigInteger(toPaddedBytes(data)).longValue()

  /** inverse projection (reference toBytes(double)): BigInteger magnitude
    * bytes, the two's-complement leading zero clipped, clamped to the
    * 8-byte "infinity" key when wider. */
  def toBytes(v: Double): Array[Byte] = {
    var arr = new JBigDecimal(v).toBigInteger.toByteArray
    if (arr(0) == 0 && arr.length > 1 && arr(1) == 0xff.toByte)
      arr = java.util.Arrays.copyOfRange(arr, 1, arr.length)
    if (arr.length > 8) arr = InfinityByte
    toPaddedBytes(arr)
  }

  def toBytes(v: Long): Array[Byte] = {
    var arr = BigInteger.valueOf(v).toByteArray
    if (arr(0) == 0 && arr.length > 1 && arr(1) == 0xff.toByte)
      arr = java.util.Arrays.copyOfRange(arr, 1, arr.length)
    if (arr.length > 8) arr = InfinityByte
    toPaddedBytes(arr)
  }
}

/**
 * The reference's FixedBinNumericHistogram
 * (core/store/.../statistics/histogram/FixedBinNumericHistogram.java:40-355),
 * ported faithfully: a fixed number of bins whose [min, max] range expands
 * dynamically, REDISTRIBUTING existing counts into the wider bins (the
 * reference's proportional-overlap redistribute, including its round()
 * rule), or — when constructed with an explicit range — silently ignoring
 * out-of-range values. Mergeable (redistribute both to the union range,
 * add bin-wise) and binary-serializable in the reference's exact layout
 * (long totalCount, double min, double max, int nbins, long[] counts), so
 * per-partition histograms combine map-side like the reference's
 * per-tablet statistics merge. Golden-tested against
 * RowHistogramFixedDataStaticticsTest and RowHistogramDataStaticticsTest.
 */
final class FixedBinHistogram private (private var bins: Array[Long],
                                       private var constrainedRange: Boolean)
    extends Serializable {

  def this(nbins: Int = 32) = this(new Array[Long](nbins), false)

  def this(nbins: Int, minValue: Double, maxValue: Double) = {
    this(new Array[Long](nbins), true)
    minVar = minValue
    maxVar = maxValue
  }

  private var totalCountVar: Long = 0L
  // Java's Double.MIN_VALUE (4.9e-324, the smallest POSITIVE subnormal),
  // not Scala's Double.MinValue (-1.8e308): the reference initializes
  // maxValue to the former (FixedBinNumericHistogram.java:42), which
  // changes the first-expansion behavior for all-negative inputs —
  // reachable here because KeyBytes.toDouble reads keys SIGNED
  private var minVar: Double = Double.MaxValue
  private var maxVar: Double = java.lang.Double.MIN_VALUE

  def totalCount: Long = totalCountVar
  def numBins: Int = bins.length
  def minValue: Double = minVar
  def maxValue: Double = maxVar

  def add(v: Double): Unit = add(1L, v)

  def add(amount: Long, num: Double): Unit = {
    if (constrainedRange && (num < minVar || num > maxVar)) return
    if (totalCountVar == 0 || minVar == num) {
      bins(0) += amount
      minVar = num
      maxVar = math.max(num, maxVar)
    } else if (minVar == maxVar) { // two distinct values so far
      if (num < minVar) {
        bins(bins.length - 1) = bins(0)
        bins(0) = amount
        minVar = num
      } else if (num > maxVar) {
        bins(bins.length - 1) = amount
        maxVar = num
      }
    } else {
      if (num < minVar) { redistribute(num, maxVar); minVar = num }
      else if (num > maxVar) { redistribute(minVar, num); maxVar = num }
      val range = maxVar - minVar
      val bin = math.min(math.floor((num - minVar) / range * bins.length).toInt,
        bins.length - 1)
      bins(bin) += amount
    }
    totalCountVar += amount
  }

  private def binSize(): Double = {
    val v = (maxVar - minVar) / bins.length
    if (v == 0.0) 1.0 else v
  }

  /** estimated number of values at or below `v` (reference sum()). */
  def sum(v: Double, inclusive: Boolean): Double = {
    if (v < minVar) return 0.0
    val range = maxVar - minVar
    if (range <= 0.0 || totalCountVar == 0) return totalCountVar.toDouble
    val bin = math.min(math.floor((v - minVar) / range * bins.length).toInt,
      bins.length - 1)
    var c = 0.0
    val perBinSize = binSize()
    var i = 0
    while (i < bin) { c += bins(i); i += 1 }
    val fracOfLastBin = math.min(1.0, (v - (perBinSize * bin + minVar)) / perBinSize)
    c += fracOfLastBin * bins(bin)
    if (c > 0) c else if (inclusive) 1.0 else c
  }

  def cdf(v: Double): Double = sum(v, inclusive = false) / totalCountVar

  def quantile(percentage: Double): Double = {
    val fractionOfTotal = percentage * totalCountVar
    var countThisFar = 0.0
    var bin = 0
    while (bin < bins.length && countThisFar < fractionOfTotal) {
      countThisFar += bins(bin)
      bin += 1
    }
    if (bin == 0) return minVar
    val perBinSize = binSize()
    val countUptoLastBin = countThisFar - bins(bin - 1)
    minVar + perBinSize * bin +
      perBinSize * ((fractionOfTotal - countUptoLastBin) / bins(bin - 1))
  }

  def quantiles(n: Int): Array[Double] =
    Array.tabulate(n)(b => quantile((b + 1).toDouble / n))

  /** estimated population fraction inside [start, stop] (reference
    * percentPopulationOverRange). */
  def percentPopulationOverRange(start: Double, stop: Double): Double =
    cdf(stop) - cdf(start)

  /** counts re-binned to `n` equal-width bins over [min, max]. */
  def count(n: Int): Array[Long] = {
    val range = maxVar - minVar
    val increment = range / n
    var start = minVar + increment
    var last = 0L
    Array.tabulate(n) { _ =>
      val aggSum = math.ceil(sum(start, inclusive = false)).toLong
      val out = aggSum - last
      last = aggSum
      start += increment
      out
    }
  }

  def merge(other: FixedBinHistogram): Unit = {
    val newMin = math.min(minVar, other.minVar)
    val newMax = math.max(maxVar, other.maxVar)
    redistribute(newMin, newMax)
    other.redistribute(newMin, newMax)
    var i = 0
    while (i < bins.length) { bins(i) += other.bins(i); i += 1 }
    minVar = newMin
    maxVar = newMax
    totalCountVar += other.totalCountVar
  }

  /** the reference's proportional-overlap redistribution, verbatim —
    * including its Math.round partial-overlap rule and the tail spill of
    * counts past the last destination bin. */
  private def redistribute(newMinValue: Double, newMaxValue: Double): Unit = {
    val newCount = new Array[Long](bins.length)
    val perBinSize = binSize()
    val newRange = newMaxValue - newMinValue
    val newPerBinSize = newRange / bins.length
    var currentWindowStart = minVar
    var currentWindowStop = minVar + perBinSize
    var bin = 0
    while (bin < bins.length) {
      var destinationBin = math.min(
        math.floor((currentWindowStart - newMinValue) / newRange * bins.length).toInt,
        bins.length - 1)
      var destinationWindowStart = newMinValue + destinationBin * newPerBinSize
      var destinationWindowStop = destinationWindowStart + newPerBinSize
      while (bins(bin) > 0) {
        val distributionCount =
          if (currentWindowStart < destinationWindowStart) bins(bin)
          else {
            val diff = math.min(
              math.max(currentWindowStop - destinationWindowStop, 0.0), perBinSize)
            math.round(bins(bin) * (1.0 - diff / perBinSize))
          }
        newCount(destinationBin) += distributionCount
        bins(bin) -= distributionCount
        if (destinationWindowStop < currentWindowStop) {
          destinationWindowStart = destinationWindowStop
          destinationWindowStop += newPerBinSize
          destinationBin += 1
          if (destinationBin == bins.length && bins(bin) > 0) {
            newCount(bin) += bins(bin)
            bins(bin) = 0
          }
        }
      }
      currentWindowStart = currentWindowStop
      currentWindowStop += perBinSize
      bin += 1
    }
    bins = newCount
  }

  /** the reference's exact binary layout (FixedBinNumericHistogram
    * toBinary/fromBinary). */
  def toBytes: Array[Byte] = {
    val buf = ByteBuffer.allocate(28 + 8 * bins.length)
    buf.putLong(totalCountVar)
    buf.putDouble(minVar)
    buf.putDouble(maxVar)
    buf.putInt(bins.length)
    bins.foreach(buf.putLong)
    buf.array()
  }
}

object FixedBinHistogram {
  /** deserialize the reference layout. The binary form carries no
    * constrained-range flag (the reference's fromBinary is an instance
    * method that keeps the receiver's flag), so a constrained histogram
    * must be thawed with `constrained = true` or it would silently start
    * accepting out-of-range values and re-expanding. */
  def fromBytes(bytes: Array[Byte], constrained: Boolean = false): FixedBinHistogram = {
    val buf = ByteBuffer.wrap(bytes)
    val total = buf.getLong
    val mn = buf.getDouble
    val mx = buf.getDouble
    val n = buf.getInt
    val h = new FixedBinHistogram(n)
    h.constrainedRange = constrained
    h.totalCountVar = total
    h.minVar = mn
    h.maxVar = mx
    var i = 0
    while (i < n) { h.bins(i) = buf.getLong; i += 1 }
    h
  }
}
