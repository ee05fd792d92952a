package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import GeoFunctions._

/**
 * Multi-index store + best-match index selection — the Spark-native form
 * of the reference's multi-index DataStore with
 * ChooseBestMatchIndexQueryStrategy (core/store/.../query/
 * ChooseBestMatchIndexQueryStrategy.java:27: among the indices that can
 * serve the query, pick the one that scans the fewest rows).
 *
 * A store row carries BOTH insertion keys — `cell_id` (tiered spatial,
 * Hilbert 31/31) and `cell_id_st` (tiered spatial-temporal 20/20/20,
 * YEAR-binned). The planner decomposes the constraints against each
 * candidate index and scores each by the queried FRACTION of its occupied
 * key universe (Σ range width / universe size; the spatial universe is the
 * 2^62 finest-tier curve, the spatial-temporal one is 2^60 per year bin ×
 * the year bins the store holds). Under row uniformity that fraction IS
 * the expected scanned-row fraction — the stats-free analogue of the
 * reference's RowRangeHistogramStatistics estimate, with the store's year
 * span supplied from its ingest-maintained time-range statistics.
 */
object MultiIndex {

  /** encode both index keys (ingest-side; one pass, both codegen'd). */
  def encode(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("cell_id", gw_cell_id(col("lon"), col("lat")))
      .withColumn("cell_id_st", gw_cell_id_st(col("lon"), col("lat"), col(tsCol)))

  /** queried fraction of a key universe: ranges share a constant
    * `prefixLen`-byte prefix (tier byte / tier+year); widths are measured
    * over the SFC tail and normalized by 2^universeBits × universeBins. */
  def queriedFraction(ranges: Seq[(Array[Byte], Array[Byte])],
                      prefixLen: Int, universeBits: Int, universeBins: Int = 1): Double = {
    if (ranges.isEmpty) return 0.0
    val total = (BigInt(1) << universeBits) * universeBins
    val card = ranges.map { case (s, e) =>
      (BigInt(1, e.drop(prefixLen)) - BigInt(1, s.drop(prefixLen))).max(BigInt(0)) + 1
    }.sum
    (BigDecimal(card) / BigDecimal(total)).toDouble
  }

  /**
   * Best-match query: spatial box + optional time interval. With a time
   * constraint both indices compete on expected scanned fraction; without
   * one the spatial-temporal index cannot constrain its third dimension,
   * so the spatial index wins outright (the reference reaches the same
   * outcome through its cardinality estimate). `storeYearBins` is the
   * store's time span in calendar years, from its time-range statistics.
   * Returns the chosen index name ("spatial" | "spatial_temporal") and the
   * filtered rows (prefilter on the winner's key + exact fine filters).
   */
  def queryBest(store: DataFrame,
                lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
                tsMin: Option[java.sql.Timestamp] = None,
                tsMax: Option[java.sql.Timestamp] = None,
                storeYearBins: Int = 1,
                tsCol: String = "ts"): (String, DataFrame) = {
    val spatialRanges = SpatialPlanner.spatialBoxRanges(lonMin, lonMax, latMin, latMax)
    val spatialFrac = queriedFraction(spatialRanges, prefixLen = 1, universeBits = 62)
    val fineBox = SpatialPlanner.boxPredicate(col("lon"), col("lat"),
      lonMin, lonMax, latMin, latMax)
    (tsMin, tsMax) match {
      case (Some(t0), Some(t1)) =>
        val stRanges = SpatialPlanner.stBoxRanges(lonMin, lonMax, latMin, latMax,
          t0.getTime, t1.getTime)
        val stFrac = queriedFraction(stRanges, prefixLen = 5, universeBits = 60,
          universeBins = storeYearBins)
        val fine = fineBox && col(tsCol) >= lit(t0) && col(tsCol) <= lit(t1)
        if (stFrac <= spatialFrac)
          ("spatial_temporal",
            store.where(SpatialPlanner.rangesPredicate(col("cell_id_st"), stRanges)).where(fine))
        else
          ("spatial",
            store.where(SpatialPlanner.rangesPredicate(col("cell_id"), spatialRanges)).where(fine))
      case _ =>
        ("spatial",
          store.where(SpatialPlanner.rangesPredicate(col("cell_id"), spatialRanges)).where(fineBox))
    }
  }
}
