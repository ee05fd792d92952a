package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.index._
import graft.index.ConstraintAlgebra._
import graft.spark.{GeoCodec, MultiIndex}
import graft.spark.MultiIndex.IndexCandidate

/**
 * Port of the reference's ChooseHeuristicMatchQueryStrategyTest
 * (extensions/adapters/vector/src/test/java/.../index/
 * ChooseHeuristicMatchQueryStrategyTest.java:39-335) against
 * [[MultiIndex.chooseHeuristicMatch]]: the candidate list is two NullIndex
 * stand-ins (no dimensions), a YEAR-periodicity BALANCED spatio-temporal
 * index, a DAY-periodicity one, and the default spatial index; every
 * HOUSE/BLOCK/CITY × HOUR/DAY/WEEK constraint elects the YEAR
 * spatio-temporal index (3 constrained dimensions beat 2; YEAR's wider
 * time cells preserve more fixed prefix bits than DAY's, whose bins the
 * windows saturate — IndexUtils.getDimensionalBitsUsed's own comment:
 * "In temporal, YEAR is always chosen").
 */
class HeuristicChooserSpec extends AnyFunSuite {

  private val Hour = 3600000.0
  private val Day = Hour * 24
  private val Week = Day * 7
  private val House = 0.005
  private val Block = 0.07
  private val City = 1.25

  private val stDay: TieredStrategy = TieredStrategy.equalInterval(
    Array(LongitudeDim, LatitudeDim(useHalfRange = true),
      TimeDim(TemporalBinning(TimeUnits.Day))),
    Array(20, 20, 20), numIndices = 11)

  // the test's index list order: chip1, ST-year, ST-day, spatial, chip2
  private val candidates = Seq(
    IndexCandidate("chips1", GeoCodec.spatial, Seq.empty),
    IndexCandidate("st_year", GeoCodec.spatialTemporal,
      Seq("longitude", "latitude", "time")),
    IndexCandidate("st_day", stDay, Seq("longitude", "latitude", "time")),
    IndexCandidate("spatial", GeoCodec.spatial, Seq("longitude", "latitude")),
    IndexCandidate("chips2", GeoCodec.spatial, Seq.empty))

  /** the test's createConstraints: time cube cross-merged onto the
    * lat/lon cube (all ConstraintData marked default, as in the test). */
  private def constraints(lat: Double, lon: Double, time: Double): Constraints = {
    val cs1 = ConstraintSet.empty
      .addConstraint("latitude", ConstraintData(0, lat, isDefault = true))
      .addConstraint("longitude", ConstraintData(0, lon, isDefault = true))
    val cs2a = ConstraintSet.empty
      .addConstraint("time", ConstraintData(0, time, isDefault = true))
    Constraints(List(cs2a)).merge(Constraints(List(cs1)))
  }

  test("all nine extent x window scenarios elect the YEAR spatio-temporal index") {
    for (extent <- Seq(House, Block, City); window <- Seq(Hour, Day, Week)) {
      val chosen = MultiIndex.chooseHeuristicMatch(
        candidates, constraints(extent, extent, window))
      assert(chosen === Some("st_year"),
        s"extent=$extent window=$window elected $chosen")
    }
  }

  test("without a time constraint the spatio-temporal cubes vanish and spatial wins") {
    val spatialOnly = Constraints(List(ConstraintSet.empty
      .addConstraint("latitude", ConstraintData(0, Block, isDefault = true))
      .addConstraint("longitude", ConstraintData(0, Block, isDefault = true))))
    assert(MultiIndex.chooseHeuristicMatch(candidates, spatialOnly) === Some("spatial"))
  }

  test("all-full-scan constraints fall back to the FIRST dimensioned candidate") {
    assert(MultiIndex.chooseHeuristicMatch(candidates, Constraints.empty) === Some("st_year"))
    // a time-only constraint leaves every candidate cubeless too: the
    // spatial index misses the time dimension, the ST indexes miss lat/lon
    val timeOnly = Constraints(List(ConstraintSet.empty
      .addConstraint("time", ConstraintData(0, Hour, isDefault = true))))
    assert(MultiIndex.chooseHeuristicMatch(candidates, timeOnly) === Some("st_year"))
    // no dimensioned candidate at all: nothing to choose
    assert(MultiIndex.chooseHeuristicMatch(
      candidates.filter(_.dims.isEmpty), Constraints.empty) === None)
  }

  test("queryBestHeuristic refuses a half-bounded time window") {
    // pure-arg validation: no session or store needed — the require fires first
    intercept[IllegalArgumentException] {
      MultiIndex.queryBestHeuristic(null, 0, 1, 0, 1,
        tsMin = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")), tsMax = None)
    }
    intercept[IllegalArgumentException] {
      MultiIndex.queryBest(null, 0, 1, 0, 1,
        tsMin = None, tsMax = Some(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
    }
  }

  test("the balanced ST preset is the 20/20/20 default; point probes elect BALANCED over either bias") {
    def bits(s: TieredStrategy): Seq[Int] = s.sfcs.last.dimensions.map(_.bits).toSeq
    assert(bits(GeoCodec.spatialTemporal) === Seq(20, 20, 20))
    assert(bits(TieredStrategy.spatialTemporalBiased("SPATIAL")) === Seq(25, 25, 10))
    assert(bits(TieredStrategy.spatialTemporalBiased("TEMPORAL")) === Seq(10, 10, 40))
    // point probes saturate bits-used at the full per-dimension budget:
    // the score is 3 x min(bits) = 60 balanced vs 30 for either bias, so
    // the balanced layout must win the chooser regardless of list order
    val point = Constraints(List(ConstraintSet.empty
      .addConstraint("longitude", ConstraintData(10.0, 10.0 + 1e-9, isDefault = false))
      .addConstraint("latitude", ConstraintData(40.0, 40.0 + 1e-9, isDefault = false))
      .addConstraint("time", ConstraintData(0, 1.0, isDefault = false))))
    val stDims = Seq("longitude", "latitude", "time")
    val cands = Seq(
      IndexCandidate("st_spatial_bias", TieredStrategy.spatialTemporalBiased("SPATIAL"), stDims),
      IndexCandidate("st_temporal_bias", TieredStrategy.spatialTemporalBiased("TEMPORAL"), stDims),
      IndexCandidate("st_balanced", GeoCodec.spatialTemporal, stDims))
    assert(MultiIndex.chooseHeuristicMatch(cands, point) === Some("st_balanced"))
    assert(MultiIndex.chooseHeuristicMatch(cands.reverse, point) === Some("st_balanced"))
  }

  test("equal dimension count tie-breaks on bits-used: DAY never beats YEAR") {
    for (window <- Seq(Hour, Day, Week)) {
      val cons = constraints(House, House, window)
      val cubes = cons.indexConstraints(Seq("longitude", "latitude", "time"))
      val yearBits = cubes.map(c =>
        MultiIndex.dimensionalBitsUsed(GeoCodec.spatialTemporal, c.map(r => r._2 - r._1))).sum
      val dayBits = cubes.map(c =>
        MultiIndex.dimensionalBitsUsed(stDay, c.map(r => r._2 - r._1))).sum
      assert(yearBits >= dayBits, s"window=$window: year=$yearBits day=$dayBits")
    }
  }
}
