package graft.index

import org.scalatest.funsuite.AnyFunSuite
import java.util.{Calendar, TimeZone}

/** Ports of TemporalBinningStrategyTest / TimeDefinitionTest /
  * LongitudeDefinitionTest semantics. */
class TemporalSpec extends AnyFunSuite {

  private def gmtCal(): Calendar = Calendar.getInstance(TimeZone.getTimeZone("GMT"))

  test("YEAR bin: 4-byte 'YYYY' bin id, 366-day bin size, GMT epoch") {
    val binning = TemporalBinning(TimeUnits.Year)
    assert(binning.binSizeMillis === 366L * 86400000L)
    assert(binning.fixedBinIdSize === 4)
    val cal = gmtCal()
    cal.clear()
    cal.set(2012, Calendar.JUNE, 15, 10, 30, 0)
    val (binId, inBin) = binning.binnedValue(cal.getTimeInMillis)
    assert(new String(binId) === "2012")
    val epoch = gmtCal()
    epoch.clear()
    epoch.set(2012, Calendar.JANUARY, 1, 0, 0, 0)
    assert(inBin === cal.getTimeInMillis - epoch.getTimeInMillis)
  }

  test("multi-year range -> one BinRange per year, middle years full extent (TemporalBinningStrategy.java:365-431)") {
    val binning = TemporalBinning(TimeUnits.Year)
    val cal = gmtCal()
    cal.clear(); cal.set(2011, Calendar.JULY, 1, 0, 0, 0)
    val start = cal.getTimeInMillis
    cal.clear(); cal.set(2013, Calendar.MARCH, 1, 0, 0, 0)
    val end = cal.getTimeInMillis
    val bins = binning.getNormalizedRanges(NumericData(start.toDouble, end.toDouble))
    assert(bins.length === 3)
    assert(bins.map(b => new String(b.binId)).toSeq === Seq("2011", "2012", "2013"))
    assert(!bins(0).fullExtent)
    assert(bins(1).fullExtent) // middle year fully covered
    assert(!bins(2).fullExtent)
    assert(bins(1).normMin === 0.0)
    // in-bin values are millis since the year's actual epoch
    val epoch2011 = { val c = gmtCal(); c.clear(); c.set(2011, 0, 1); c.getTimeInMillis }
    assert(bins(0).normMin === (start - epoch2011).toDouble)
  }

  test("bin start epoch roundtrip") {
    val binning = TemporalBinning(TimeUnits.Year)
    val epoch = binning.binStartEpoch("2012".getBytes)
    val c = gmtCal()
    c.setTimeInMillis(epoch)
    assert(c.get(Calendar.YEAR) === 2012)
    assert(c.get(Calendar.DAY_OF_YEAR) === 1)
    assert(c.get(Calendar.HOUR_OF_DAY) === 0)
  }

  test("time range within one bin is a single non-full-extent bin") {
    val binning = TemporalBinning(TimeUnits.Year)
    val cal = gmtCal()
    cal.clear(); cal.set(2012, Calendar.MARCH, 3, 11, 1, 1)
    val a = cal.getTimeInMillis
    cal.clear(); cal.set(2012, Calendar.MARCH, 3, 11, 5, 1)
    val b = cal.getTimeInMillis
    val bins = binning.getNormalizedRanges(NumericData(a.toDouble, b.toDouble))
    assert(bins.length === 1)
    assert(new String(bins(0).binId) === "2012")
    assert(!bins(0).fullExtent)
  }

  test("dateline crossing splits longitude into two bins (LongitudeDefinition.java:38-60)") {
    // range [170, 190] -> wraps: normalized max 190 -> -170 < 170
    val bins = LongitudeDim.getNormalizedRanges(NumericData(170, 190))
    assert(bins.length === 2)
    assert(bins(0).normMin === -180.0 && bins(0).normMax === -170.0)
    assert(bins(1).normMin === 170.0 && bins(1).normMax === 180.0)
  }

  test("non-crossing longitude range stays one bin; single value clamps") {
    val bins = LongitudeDim.getNormalizedRanges(NumericData(-10, 20))
    assert(bins.length === 1)
    assert(bins(0).normMin === -10.0 && bins(0).normMax === 20.0)
    val point = LongitudeDim.getNormalizedRanges(NumericData(200, 200))
    assert(point.length === 1)
    assert(point(0).normMin === 180.0) // clamped, not wrapped, for single values
  }

  test("latitude half-range normalizes over [-180,180] but clamps data to [-90,90]") {
    val lat = LatitudeDim(useHalfRange = true)
    assert(lat.normalize(90) === 0.75)
    assert(lat.normalize(-90) === 0.25)
    assert(lat.normalize(120) === 0.75) // clamped to 90 first
    assert(lat.normalize(0) === 0.5)
  }
}
