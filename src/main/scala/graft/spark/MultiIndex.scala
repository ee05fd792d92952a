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

  /** encode with the time column DISCOVERED from the schema — the
    * reference configures its temporal index from TimeDescriptors
    * inference the same way (FeatureDataAdapter wiring of
    * TimeDescriptors.java:150-285). Only an unambiguous single-instant
    * schema auto-configures; a start/end RANGE schema needs interval
    * insertion (TieredStrategy range data), not this instant-keyed
    * column, so it is refused loudly rather than silently indexed by one
    * bound, and a schema with no temporal field has no ST key to build. */
  def encodeInferred(df: DataFrame): DataFrame =
    TimeDescriptors.infer(df.schema) match {
      case TimeDescriptors.SingleTime(t) => encode(df, t)
      case TimeDescriptors.RangeTime(s, e) => throw new IllegalArgumentException(
        s"schema carries a time RANGE [$s, $e]: interval insertion must go " +
          "through the tiered strategy's range path, not the instant ST key")
      case TimeDescriptors.NoTime => throw new IllegalArgumentException(
        "no temporal field in schema: spatial-only stores should not carry cell_id_st")
    }

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
    // a HALF-bounded window would silently fall through to the no-time
    // plan and drop the caller's bound — refuse it loudly instead
    require(tsMin.isDefined == tsMax.isDefined,
      "time window must be fully bounded (both tsMin and tsMax) or absent")
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

  // ------------------------------------------- locality-preserving path

  /**
   * Fixed prefix bits a query exploits on a strategy's FINEST curve — the
   * reference's IndexUtils.getDimensionalBitsUsed (core/index/.../
   * IndexUtils.java:45-106): per dimension, bits-from-the-right =
   * log2(ceil(width / cellRange)); the score is
   * min_d(bits_d − bitsFromRight_d) × numDims — the LEAST constrained
   * dimension bounds how long a common key prefix the query preserves,
   * scaled by dimensionality. Negative → 0 (full scan in some dimension).
   * Widths cap at the dimension extent (the bin extent for binned time).
   */
  def dimensionalBitsUsed(strategy: graft.index.TieredStrategy,
                          widths: Seq[Double]): Double = {
    val finest = strategy.sfcs.last
    require(widths.length == finest.dimensions.length)
    val perDim = finest.dimensions.zip(widths).map { case (sd, w0) =>
      val extent = sd.dim.max - sd.dim.min
      val cell = extent / (1L << sd.bits).toDouble
      val w = math.min(math.max(w0, 0.0), extent)
      val fromRight = math.log(math.max(math.ceil(w / cell), 1.0)) / math.log(2.0)
      sd.bits - fromRight
    }
    val m = perDim.min
    if (m < 0) 0.0 else m * finest.dimensions.length
  }

  /**
   * Locality-preserving index choice — the reference's
   * ChooseLocalityPreservingQueryStrategy (extensions/adapters/vector/.../
   * ChooseLocalityPreservingQueryStrategy.java:38-96): among the candidate
   * indexes, pick the one whose constrained query uses the MOST fixed
   * prefix bits, i.e. decomposes into the fewest, longest key runs — the
   * stats-free chooser that optimizes scan contiguity rather than
   * estimated row count. A wide box with a narrow time window prefers the
   * spatial-temporal index (time contributes its prefix bits); a tight box
   * with a year-wide window prefers pure spatial (the time dimension
   * degrades to 0 fixed bits and bounds the min).
   */
  def queryBestLocality(store: DataFrame,
                        lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
                        tsMin: java.sql.Timestamp, tsMax: java.sql.Timestamp,
                        tsCol: String = "ts"): (String, DataFrame, (Double, Double)) = {
    val spatialScore =
      dimensionalBitsUsed(GeoCodec.spatial, Seq(lonMax - lonMin, latMax - latMin))
    val stScore = dimensionalBitsUsed(GeoCodec.spatialTemporal,
      Seq(lonMax - lonMin, latMax - latMin, (tsMax.getTime - tsMin.getTime).toDouble))
    val fine = SpatialPlanner.boxPredicate(col("lon"), col("lat"),
      lonMin, lonMax, latMin, latMax) &&
      col(tsCol) >= lit(tsMin) && col(tsCol) <= lit(tsMax)
    if (stScore > spatialScore) {
      val ranges = SpatialPlanner.stBoxRanges(lonMin, lonMax, latMin, latMax,
        tsMin.getTime, tsMax.getTime)
      ("spatial_temporal",
        store.where(SpatialPlanner.rangesPredicate(col("cell_id_st"), ranges)).where(fine),
        (spatialScore, stScore))
    } else {
      val ranges = SpatialPlanner.spatialBoxRanges(lonMin, lonMax, latMin, latMax)
      ("spatial",
        store.where(SpatialPlanner.rangesPredicate(col("cell_id"), ranges)).where(fine),
        (spatialScore, stScore))
    }
  }

  // ------------------------------------------------- heuristic-match path

  /** one candidate index for the heuristic chooser: a name, its tiered
    * strategy, and the strategy's ordered dimension NAMES (the
    * [[graft.index.ConstraintAlgebra]] keys). Zero dimensions models the
    * reference's NullIndex (raster chip stores). */
  final case class IndexCandidate(name: String,
                                  strategy: graft.index.TieredStrategy,
                                  dims: Seq[String])

  /**
   * Heuristic-match index choice — the reference's
   * ChooseHeuristicMatchIndexQueryStrategy (extensions/adapters/vector/.../
   * ChooseHeuristicMatchIndexQueryStrategy.java:38-113): prefer the index
   * that satisfies the MOST query dimensions; among equal dimension counts
   * tie-break on the total fixed-prefix bits the constraints preserve
   * (Σ [[dimensionalBitsUsed]] over the query's constraint cubes — so a
   * YEAR-binned time dimension beats a DAY-binned one whose bins the window
   * saturates). An index whose constraints decompose to no cube (a full
   * table scan — IndexUtils.isFullTableScan) is kept only as the FIRST-seen
   * fallback; dimensionless candidates are skipped outright.
   */
  def chooseHeuristicMatch(candidates: Seq[IndexCandidate],
                           constraints: graft.index.ConstraintAlgebra.Constraints): Option[String] = {
    var bestBits = -1.0
    var bestCount = -1
    var best: Option[String] = None
    for (c <- candidates if c.dims.nonEmpty) {
      val cubes = constraints.indexConstraints(c.dims)
      if (cubes.isEmpty) {
        // full-table-scan candidate: first one seen is the default fallback
        if (best.isEmpty) best = Some(c.name)
      } else {
        val count = c.dims.length
        if (count >= bestCount) {
          val bits = cubes.map(cube =>
            dimensionalBitsUsed(c.strategy, cube.map(r => r._2 - r._1))).sum
          if (count > bestCount || bits > bestBits) {
            bestBits = bits; bestCount = count; best = Some(c.name)
          }
        }
      }
    }
    best
  }

  /** the store's two real indexes as heuristic-chooser candidates, in
    * store order (spatial cell_id, spatial-temporal cell_id_st). */
  def storeCandidates: Seq[IndexCandidate] = Seq(
    IndexCandidate("spatial", GeoCodec.spatial, Seq("longitude", "latitude")),
    IndexCandidate("spatial_temporal", GeoCodec.spatialTemporal,
      Seq("longitude", "latitude", "time")))

  /** box + optional time window as a ConstraintAlgebra composition: the
    * time cube CROSS-MERGED onto the spatial cube, exactly how the
    * reference assembles a spatio-temporal BasicQuery
    * (ChooseHeuristicMatchQueryStrategyTest.createConstraints). */
  def boxTimeConstraints(lonMin: Double, lonMax: Double,
                         latMin: Double, latMax: Double,
                         tsMin: Option[Long] = None,
                         tsMax: Option[Long] = None): graft.index.ConstraintAlgebra.Constraints = {
    import graft.index.ConstraintAlgebra._
    val spatial = ConstraintSet.empty
      .addConstraint("longitude", ConstraintData(lonMin, lonMax, isDefault = false))
      .addConstraint("latitude", ConstraintData(latMin, latMax, isDefault = false))
    val base = Constraints(List(spatial))
    (tsMin, tsMax) match {
      case (Some(a), Some(b)) =>
        Constraints(List(ConstraintSet.empty
          .addConstraint("time", ConstraintData(a.toDouble, b.toDouble, isDefault = false))))
          .merge(base)
      case _ => base
    }
  }

  /**
   * Heuristic-match query over the multi-index store: the chooser elects
   * by dimension count (then bits-used) — with a time window the
   * 3-dimension spatial-temporal index wins, without one it decomposes to
   * no cube and the spatial index is elected. Same result set as
   * q48/q64/q67 whichever index wins (prefilter + exact fine filter).
   */
  def queryBestHeuristic(store: DataFrame,
                         lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
                         tsMin: Option[java.sql.Timestamp] = None,
                         tsMax: Option[java.sql.Timestamp] = None,
                         tsCol: String = "ts"): (String, DataFrame) = {
    // refuse a half-bounded window: it would build no time constraint AND
    // no time fine filter, silently returning rows outside the given bound
    require(tsMin.isDefined == tsMax.isDefined,
      "time window must be fully bounded (both tsMin and tsMax) or absent")
    val cons = boxTimeConstraints(lonMin, lonMax, latMin, latMax,
      tsMin.map(_.getTime), tsMax.map(_.getTime))
    val fineBox = SpatialPlanner.boxPredicate(col("lon"), col("lat"),
      lonMin, lonMax, latMin, latMax)
    val fine = (tsMin, tsMax) match {
      case (Some(t0), Some(t1)) => fineBox && col(tsCol) >= lit(t0) && col(tsCol) <= lit(t1)
      case _ => fineBox
    }
    chooseHeuristicMatch(storeCandidates, cons) match {
      case Some("spatial_temporal") =>
        val ranges = SpatialPlanner.stBoxRanges(lonMin, lonMax, latMin, latMax,
          tsMin.get.getTime, tsMax.get.getTime)
        ("spatial_temporal",
          store.where(SpatialPlanner.rangesPredicate(col("cell_id_st"), ranges)).where(fine))
      case _ =>
        val ranges = SpatialPlanner.spatialBoxRanges(lonMin, lonMax, latMin, latMax)
        ("spatial",
          store.where(SpatialPlanner.rangesPredicate(col("cell_id"), ranges)).where(fine))
    }
  }

  // ------------------------------------------------- statistics-driven path

  /** default histogram prefix lengths: spatial keys are tier ‖ 8 sfc bytes
    * (prefix 3 = tier + top 16 curve bits), spatial-temporal keys are
    * tier ‖ "YYYY" ‖ 8 sfc bytes (prefix 7 = tier + year + top 16 bits). */
  val SpatialHistPrefix = 3
  val STHistPrefix = 7

  /**
   * Row-range histogram over a stored key column: row counts per
   * `prefixLen`-byte key prefix — the store's own
   * RowRangeHistogramStatistics (reference RowRangeHistogramStatistics
   * .java:20, maintained at ingest and consulted by the planner).
   * Driver-collected like the reference's statistics: the bucket space is
   * bounded by the prefix length and the occupied tiers, not by rows.
   */
  def prefixHistogram(store: DataFrame, keyCol: String,
                      prefixLen: Int): Seq[(Array[Byte], Long)] =
    store.groupBy(substring(col(keyCol), 1, prefixLen).as("p"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getAs[Array[Byte]](0), r.getLong(1))).toSeq

  /** estimated rows a range set scans, from a prefix histogram: Σ counts
    * of buckets whose key interval [p, p‖ff…] intersects any query range
    * (binary search over the merged disjoint ranges — the reference's
    * cardinality-from-histogram estimate,
    * ChooseBestMatchIndexQueryStrategy.java:27). */
  def estimateScannedRows(hist: Seq[(Array[Byte], Long)],
                          ranges: Seq[(Array[Byte], Array[Byte])]): Long = {
    if (hist.isEmpty || ranges.isEmpty) return 0L
    val merged = SpatialPlanner.mergeRanges(ranges).toIndexedSeq
    // a histogram bucket covers the OPEN prefix interval [p, p‖ff…∞] —
    // compare range bounds against the prefix with comparePrefixed rather
    // than padding p to some data-dependent length (padding to the longest
    // range bound undercounts whenever the prefix is already longer:
    // ranges starting inside (p, p‖ff…] were then missed)
    import graft.index.ByteUtils.comparePrefixed
    hist.iterator.filter { case (p, _) =>
      // rightmost range whose start is NOT above the bucket interval
      // (start <= p‖ff… — a monotone predicate over the sorted starts)
      var lo = 0; var hi = merged.length - 1; var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (comparePrefixed(merged(mid)._1, p) <= 0) { found = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      // overlap iff that range's end is not below the bucket interval
      found >= 0 && comparePrefixed(merged(found)._2, p) >= 0
    }.map(_._2).sum
  }

  /**
   * Best-match query driven by the store's OWN row statistics instead of
   * the uniformity assumption — the reference's
   * ChooseBestMatchIndexQueryStrategy: each candidate index is scored by
   * the estimated number of rows its decomposed ranges would scan
   * (per-prefix histogram counts), and the cheapest index wins. Catches
   * the cases uniformity gets wrong — e.g. a narrow time window over a
   * store whose rows all carry timestamps inside that window (the time
   * dimension is selective in the key universe but worthless in the
   * data). Histograms come from [[prefixHistogram]]; pass the ones
   * maintained at ingest. Returns (chosen index, filtered rows,
   * (spatialEstimate, stEstimate)).
   */
  def queryBestStats(store: DataFrame,
                     lonMin: Double, lonMax: Double, latMin: Double, latMax: Double,
                     tsMin: java.sql.Timestamp, tsMax: java.sql.Timestamp,
                     histSpatial: Seq[(Array[Byte], Long)],
                     histST: Seq[(Array[Byte], Long)],
                     tsCol: String = "ts"): (String, DataFrame, (Long, Long)) = {
    val spatialRanges = SpatialPlanner.spatialBoxRanges(lonMin, lonMax, latMin, latMax)
    val stRanges = SpatialPlanner.stBoxRanges(lonMin, lonMax, latMin, latMax,
      tsMin.getTime, tsMax.getTime)
    val spatialEst = estimateScannedRows(histSpatial, spatialRanges)
    val stEst = estimateScannedRows(histST, stRanges)
    val fine = SpatialPlanner.boxPredicate(col("lon"), col("lat"),
      lonMin, lonMax, latMin, latMax) &&
      col(tsCol) >= lit(tsMin) && col(tsCol) <= lit(tsMax)
    if (stEst <= spatialEst)
      ("spatial_temporal",
        store.where(SpatialPlanner.rangesPredicate(col("cell_id_st"), stRanges)).where(fine),
        (spatialEst, stEst))
    else
      ("spatial",
        store.where(SpatialPlanner.rangesPredicate(col("cell_id"), spatialRanges)).where(fine),
        (spatialEst, stEst))
  }
}
