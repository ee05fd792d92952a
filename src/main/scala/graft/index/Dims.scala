package graft.index

import java.util.{Calendar, TimeZone}

/** A closed numeric interval; a point is min == max.
  * (reference: core/index/.../sfc/data/NumericRange.java, NumericValue.java) */
final case class NumericData(min: Double, max: Double) {
  def isPoint: Boolean = min == max
  def centroid: Double = (min + max) / 2.0
}

/** One per-bin slice of a dimension range after binning.
  * `normMin`/`normMax` are in the dimension's *bin-local raw* units (for
  * unbinned dims these are just the clamped raw values).
  * (reference: core/index/.../dimension/bin/BinRange.java) */
final case class BinRange(
    binId: Array[Byte],
    normMin: Double,
    normMax: Double,
    fullExtent: Boolean) {
  def this(min: Double, max: Double) = this(Array.emptyByteArray, min, max, false)
}

/** Dimension definition: bounds + linear normalization with clamping + a
  * binning hook. (reference: core/index/.../dimension/BasicDimensionDefinition.java:40-84) */
trait NumericDim extends Serializable {
  def min: Double
  def max: Double

  protected def clampValue(x: Double): Double =
    if (x < min) min else if (x > max) max else x

  def normalize(v: Double): Double = (clampValue(v) - min) / (max - min)

  def denormalize(v0: Double): Double = {
    val v = if (v0 < 0) 0.0 else if (v0 > 1) 1.0 else v0
    v * (max - min) + min
  }

  def getNormalizedRanges(r: NumericData): Array[BinRange] =
    Array(new BinRange(clampValue(r.min), clampValue(r.max)))

  /** bin-local BinRange back to native units (identity unless binned). */
  def getDenormalizedRange(b: BinRange): NumericData = NumericData(b.normMin, b.normMax)

  def fixedBinIdSize: Int = 0
  def range: Double = max - min
}

final case class BasicDim(min: Double, max: Double) extends NumericDim

/** Longitude [-180,180] with dateline splitting on ranges.
  * (reference: core/geotime/.../index/dimension/LongitudeDefinition.java:38-96) */
case object LongitudeDim extends NumericDim {
  val min = -180.0
  val max = 180.0

  def normalizedLongitude(lon: Double): Double = {
    if (lon <= 180 && lon >= -180) return lon
    val offset = lon + 180
    (math.ceil(math.abs(offset) / 360) * 360 + offset) % 360 - 180
  }

  override def getNormalizedRanges(r: NumericData): Array[BinRange] = {
    if (r.min == r.max) return super.getNormalizedRanges(r)
    val nMin = normalizedLongitude(r.min)
    val nMax = normalizedLongitude(r.max)
    if (nMax < nMin)
      Array(new BinRange(-180, nMax), new BinRange(nMin, 180))
    else
      Array(new BinRange(nMin, nMax))
  }
}

/** Latitude; optionally over [-180,180] ("half range" trick for square SFC
  * cells) but always clamping data to [-90,90].
  * (reference: core/geotime/.../index/dimension/LatitudeDefinition.java:33-49) */
final case class LatitudeDim(useHalfRange: Boolean = false) extends NumericDim {
  val min: Double = if (useHalfRange) -180.0 else -90.0
  val max: Double = if (useHalfRange) 180.0 else 90.0
  override protected def clampValue(x: Double): Double =
    if (x < -90) -90 else if (x > 90) 90 else x
}

object TimeUnits extends Enumeration {
  val Minute, Hour, Day, Week, Month, Year, Decade = Value
}

/**
 * Calendar-unit temporal binning (GMT): bin ID is a human-readable string
 * ("2012", "2012_06", ...), bin size is the maximum unit extent (366 days for
 * YEAR, 31 for MONTH), in-bin value is millis since the bin's actual epoch.
 * (reference: core/geotime/.../index/dimension/TemporalBinningStrategy.java:126-429)
 */
final case class TemporalBinning(unit: TimeUnits.Value, timezone: String = "GMT")
    extends Serializable {
  import TimeUnits._

  val MillisPerDay = 86400000L

  def binSizeMillis: Long = unit match {
    case Decade => MillisPerDay * 3653
    case Year   => MillisPerDay * 366
    case Month  => MillisPerDay * 31
    case Week   => MillisPerDay * 7
    case Day    => MillisPerDay
    case Hour   => MillisPerDay / 24
    case Minute => MillisPerDay / 1440
  }

  private def newCal(): Calendar = Calendar.getInstance(TimeZone.getTimeZone(timezone))

  /** zero out sub-unit fields, mirroring the reference's fall-through switch
    * (TemporalBinningStrategy.setToEpoch:175-238). */
  def setToEpoch(c: Calendar): Unit = {
    if (unit == Week) {
      c.set(Calendar.DAY_OF_WEEK, c.getActualMinimum(Calendar.DAY_OF_WEEK))
      c.set(Calendar.HOUR_OF_DAY, c.getActualMinimum(Calendar.HOUR_OF_DAY))
      c.set(Calendar.MINUTE, c.getActualMinimum(Calendar.MINUTE))
      c.set(Calendar.SECOND, c.getActualMinimum(Calendar.SECOND))
      c.set(Calendar.MILLISECOND, c.getActualMinimum(Calendar.MILLISECOND))
      return
    }
    if (unit == Decade) c.set(Calendar.YEAR, (c.get(Calendar.YEAR) / 10) * 10)
    if (unit == Decade || unit == Year)
      c.set(Calendar.MONTH, c.getActualMinimum(Calendar.MONTH))
    if (unit == Decade || unit == Year || unit == Month)
      c.set(Calendar.DAY_OF_MONTH, c.getActualMinimum(Calendar.DAY_OF_MONTH))
    if (unit != Hour && unit != Minute)
      c.set(Calendar.HOUR_OF_DAY, c.getActualMinimum(Calendar.HOUR_OF_DAY))
    if (unit != Minute)
      c.set(Calendar.MINUTE, c.getActualMinimum(Calendar.MINUTE))
    c.set(Calendar.SECOND, c.getActualMinimum(Calendar.SECOND))
    c.set(Calendar.MILLISECOND, c.getActualMinimum(Calendar.MILLISECOND))
  }

  private def two(i: Int): String = f"$i%02d"

  def binId(c: Calendar): Array[Byte] = {
    val y = c.get(Calendar.YEAR).toString
    val s = unit match {
      case Year   => y
      case Decade => y
      case Month  => y + "_" + two(c.get(Calendar.MONTH))
      case Week   => y + "_" + two(c.get(Calendar.WEEK_OF_YEAR))
      case Day    => y + "_" + two(c.get(Calendar.MONTH)) + "_" + two(c.get(Calendar.DAY_OF_MONTH))
      case Hour =>
        y + "_" + two(c.get(Calendar.MONTH)) + "_" + two(c.get(Calendar.DAY_OF_MONTH)) +
          "_" + two(c.get(Calendar.HOUR_OF_DAY))
      case Minute =>
        y + "_" + two(c.get(Calendar.MONTH)) + "_" + two(c.get(Calendar.DAY_OF_MONTH)) +
          "_" + two(c.get(Calendar.HOUR_OF_DAY)) + "_" + two(c.get(Calendar.MINUTE))
    }
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  def fixedBinIdSize: Int = unit match {
    case Year | Decade => 4
    case Month | Week  => 7
    case Day           => 10
    case Hour          => 13
    case Minute        => 16
  }

  /** (binId, millis-within-bin) of a timestamp. */
  def binnedValue(millis: Long): (Array[Byte], Long) = {
    val epoch = newCal()
    epoch.setTimeInMillis(millis)
    setToEpoch(epoch)
    val value = newCal()
    value.setTimeInMillis(millis)
    (binId(value), millis - epoch.getTimeInMillis)
  }

  /** Range → one BinRange per calendar bin, with full-extent flags.
    * (reference: TemporalBinningStrategy.getNormalizedRanges:365-431) */
  def getNormalizedRanges(r: NumericData): Array[BinRange] = {
    if (r.max < r.min) return Array.empty
    val startEpoch = newCal()
    startEpoch.setTimeInMillis(r.min.toLong)
    setToEpoch(startEpoch)
    val startEpochMillis = startEpoch.getTimeInMillis
    var epochIterator = startEpochMillis
    val bins = Array.newBuilder[BinRange]
    var firstBin = r.min.toLong != startEpochMillis
    var lastBin = false
    while (!lastBin) {
      val nextEpochCal = newCal()
      nextEpochCal.setTimeInMillis(epochIterator + (binSizeMillis * 1.5).toLong)
      setToEpoch(nextEpochCal)
      val nextEpoch = nextEpochCal.getTimeInMillis
      val maxOfBin = nextEpoch - 1
      val cal = newCal()
      cal.setTimeInMillis(epochIterator)
      var endMillis = 0L
      var fullExtent = false
      if (r.max.toLong <= maxOfBin) {
        lastBin = true
        endMillis = r.max.toLong
        fullExtent = r.max == maxOfBin
      } else {
        endMillis = maxOfBin
        fullExtent = !firstBin
      }
      val startMillis = if (firstBin) { firstBin = false; r.min.toLong } else epochIterator
      bins += BinRange(binId(cal), (startMillis - epochIterator).toDouble,
        (endMillis - epochIterator).toDouble, fullExtent)
      epochIterator = nextEpoch
    }
    bins.result()
  }

  /** start epoch millis of the bin with the given human-readable ID. */
  def binStartEpoch(id: Array[Byte]): Long = {
    val s = new String(id, java.nio.charset.StandardCharsets.UTF_8)
    val cal = newCal()
    import TimeUnits._
    unit match {
      case Week =>
        cal.set(Calendar.YEAR, s.substring(0, 4).toInt)
        cal.set(Calendar.WEEK_OF_YEAR, s.substring(5, 7).toInt)
      case Decade =>
        cal.set(Calendar.YEAR, (s.substring(0, 4).toInt / 10) * 10)
      case _ =>
        if (unit == Minute) cal.set(Calendar.MINUTE, s.substring(14, 16).toInt)
        if (unit == Minute || unit == Hour) cal.set(Calendar.HOUR_OF_DAY, s.substring(11, 13).toInt)
        if (unit == Minute || unit == Hour || unit == Day)
          cal.set(Calendar.DAY_OF_MONTH, s.substring(8, 10).toInt)
        if (unit != Year) cal.set(Calendar.MONTH, s.substring(5, 7).toInt)
        cal.set(Calendar.YEAR, s.substring(0, 4).toInt)
    }
    setToEpoch(cal)
    cal.getTimeInMillis
  }
}

/** Unbounded (binned) time dimension; SFC-normalizes within a bin of the
  * maximum unit extent.
  * (reference: core/geotime/.../index/dimension/TimeDefinition.java +
  *  core/index/.../dimension/UnboundedDimensionDefinition.java) */
final case class TimeDim(binning: TemporalBinning) extends NumericDim {
  val min: Double = 0
  val max: Double = (binning.binSizeMillis - 1).toDouble
  override def getNormalizedRanges(r: NumericData): Array[BinRange] =
    binning.getNormalizedRanges(r)
  override def getDenormalizedRange(b: BinRange): NumericData = {
    val epoch = binning.binStartEpoch(b.binId)
    NumericData(epoch + b.normMin, epoch + b.normMax)
  }
  override def fixedBinIdSize: Int = binning.fixedBinIdSize
}

object TimeDim {
  def year: TimeDim = TimeDim(TemporalBinning(TimeUnits.Year))
}

/** Multi-dim data with a bin ID attached (the reference's BinnedNumericDataset). */
final case class BinnedData(binId: Array[Byte], ranges: Array[NumericData], fullExtent: Boolean)

object BinnedData {
  /** Cross-product of per-dimension bins into per-combination datasets.
    * (reference: core/index/.../sfc/data/BinnedNumericDataset.applyBins:107-157) */
  def applyBins(data: Array[NumericData], dims: Array[NumericDim]): Array[BinnedData] = {
    if (dims.isEmpty) return Array.empty
    val perDim: Array[Array[BinRange]] =
      dims.zipWithIndex.map { case (dim, d) => dim.getNormalizedRanges(data(d)) }
    var num = 1
    perDim.foreach(num *= _.length)
    if (num == 0) return Array.empty
    val out = new Array[BinnedData](num)
    for (d <- dims.indices) {
      val bins = perDim(d)
      for (b <- bins.indices) {
        var i = b
        while (i < num) {
          val br = bins(b)
          if (out(i) == null) {
            out(i) = BinnedData(br.binId, new Array[NumericData](dims.length), br.fullExtent)
          } else {
            out(i) = BinnedData(
              ByteUtils.concat(out(i).binId, br.binId),
              out(i).ranges,
              out(i).fullExtent | br.fullExtent)
          }
          out(i).ranges(d) = NumericData(br.normMin, br.normMax)
          i += bins.length
        }
      }
    }
    out
  }
}

object ByteUtils {
  val empty: Array[Byte] = Array.emptyByteArray

  def concat(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a == null || a.isEmpty) return if (b == null) empty else b
    if (b == null || b.isEmpty) return a
    val out = new Array[Byte](a.length + b.length)
    System.arraycopy(a, 0, out, 0, a.length)
    System.arraycopy(b, 0, out, a.length, b.length)
    out
  }

  /** add 1 at the least significant byte; returns false on overflow.
    * (reference: core/index/.../ByteArrayUtils.increment:103-112) */
  def increment(value: Array[Byte]): Boolean = {
    var i = value.length - 1
    while (i >= 0) {
      value(i) = (value(i) + 1).toByte
      if (value(i) != 0) return true
      i -= 1
    }
    value(0) != 0
  }

  /** unsigned lexicographic comparison (Accumulo/Spark BinaryType order). */
  def compareUnsigned(a: Array[Byte], b: Array[Byte]): Int = {
    java.util.Arrays.compareUnsigned(a, b)
  }

  /** position of `key` relative to the key interval covered by `prefix`
    * ([prefix, prefix‖ff…]): 0 = inside (prefix prefixes key), <0 = every
    * key in the interval sorts above `key`, >0 = below it. */
  def comparePrefixed(key: Array[Byte], prefix: Array[Byte]): Int = {
    val n = math.min(key.length, prefix.length)
    var i = 0
    while (i < n) {
      val c = (key(i) & 0xff) - (prefix(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    if (key.length >= prefix.length) 0 else -1 // strict prefix of prefix ⇒ below
  }

  def toHex(a: Array[Byte]): String = a.map(b => f"$b%02x").mkString
}
