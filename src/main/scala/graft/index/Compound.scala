package graft.index

/**
 * General two-strategy compound index — the port of the reference's
 * CompoundIndexStrategy (core/index/.../CompoundIndexStrategy.java:1-420):
 * row keys are `id1 ‖ id2 ‖ int32BE(len(id1))`, query ranges and insertion
 * ids are the CROSS PRODUCT of the sub-strategies' results, and per-id
 * introspection (cell bounds, grid coordinates, precision) concatenates the
 * sub-strategies' answers. The store's salt‖cell compound key (Ingest) is
 * the skew-salt special case; this is the full form — e.g. an attribute
 * index composed with a spatial index, GeoWave's layout for
 * partition-then-locality keys.
 *
 * Dimension mapping: the reference carries per-dimension mapping arrays;
 * its own tests (CompoundIndexStrategyTest) use the consecutive split
 * (strategy1 takes the first n1 dimensions, strategy2 the rest), which is
 * what this port fixes.
 *
 * Scale note: the cross product is ranges1 × ranges2 — the reference
 * caps it by giving strategy1 ceil(sqrt(max)) and strategy2 max/|ranges1|
 * (getQueryRanges:220-259); preserved exactly, because at 100 TB an
 * uncapped product of two fine decompositions is the difference between
 * hundreds and millions of scan ranges.
 */
object Compound {

  /** CompoundIndexStrategy.composeByteArrayId:128-138 —
    * id1 ‖ id2 ‖ int32BE(len(id1)). */
  def compose(id1: Array[Byte], id2: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(id1.length + id2.length + 4)
    buf.put(id1); buf.put(id2); buf.putInt(id1.length)
    buf.array()
  }

  /** CompoundIndexStrategy.decomposeByteArrayId:148-162 — the trailing int
    * gives the first id's length. */
  def decompose(id: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val len1 = java.nio.ByteBuffer.wrap(id).getInt(id.length - 4)
    (java.util.Arrays.copyOfRange(id, 0, len1),
      java.util.Arrays.copyOfRange(id, len1, id.length - 4))
  }

  /** a compound (start, end) key range. */
  final case class CompoundRange(start: Array[Byte], end: Array[Byte])

  final class CompoundStrategy(val s1: TieredStrategy, val s2: TieredStrategy)
      extends Serializable {

    val numDimensionsPerStrategy: Array[Int] =
      Array(s1.baseDims.length, s2.baseDims.length)
    val numDimensions: Int = numDimensionsPerStrategy.sum

    private def split(data: Array[NumericData]): (Array[NumericData], Array[NumericData]) = {
      require(data.length == numDimensions,
        s"compound query has ${data.length} dims, strategy has $numDimensions")
      (data.take(s1.baseDims.length), data.drop(s1.baseDims.length))
    }

    /** cross-product query ranges; `max < 1` = unlimited on both sides,
      * else strategy1 gets ceil(sqrt(max)) and strategy2 max/|ranges1|
      * (CompoundIndexStrategy.getQueryRanges:220-259). */
    def getQueryRanges(query: Array[NumericData], max: Int = -1): Seq[CompoundRange] = {
      val (q1, q2) = split(query)
      val (r1, r2) =
        if (max < 1) (s1.getQueryRanges(q1), s2.getQueryRanges(q2))
        else {
          val perStrategy = math.ceil(math.sqrt(max.toDouble)).toInt
          val a = s1.getQueryRanges(q1, perStrategy)
          (a, s2.getQueryRanges(q2, max / a.size))
        }
      for (a <- r1; b <- r2)
        yield CompoundRange(compose(a.start, b.start), compose(a.end, b.end))
    }

    /** cross-product insertion ids with the sqrt duplicate split
      * (CompoundIndexStrategy.getInsertionIds:270-287). */
    def getInsertionIds(data: Array[NumericData], maxDuplicates: Int): Seq[Array[Byte]] = {
      val (d1, d2) = split(data)
      val per = math.sqrt(maxDuplicates.toDouble).toInt
      val ids1 = s1.getInsertionIds(d1, per.toLong)
      val ids2 = s2.getInsertionIds(d2, (maxDuplicates / ids1.size).toLong)
      for (a <- ids1; b <- ids2) yield compose(a, b)
    }

    /** concatenated denormalized cell bounds
      * (CompoundIndexStrategy.getRangeForId:321-341). */
    def getRangeForId(id: Array[Byte]): Array[NumericData] = {
      val (id1, id2) = decompose(id)
      s1.getRangeForId(id1) ++ s2.getRangeForId(id2)
    }

    /** concatenated per-dimension grid coordinates. */
    def getCoordinatesPerDimension(id: Array[Byte]): Array[Long] = {
      val (id1, id2) = decompose(id)
      s1.getCoordinates(id1) ++ s2.getCoordinates(id2)
    }

    /** concatenated finest-tier cell width per dimension
      * (TieredSFCIndexStrategy.getHighestPrecisionIdRangePerDimension
      * concatenated by the compound). */
    def getHighestPrecisionIdRangePerDimension: Array[Double] =
      highestPrecision(s1) ++ highestPrecision(s2)

    private def highestPrecision(s: TieredStrategy): Array[Double] = {
      val finest = s.sfcs.last
      finest.dimensions.map(d => d.dim.range / (1L << d.bits).toDouble)
    }
  }
}
