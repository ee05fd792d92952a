package graft.index

/**
 * The reference's temporal constraint algebra — ordered closed ranges of
 * epoch millis with merge-on-add, pairwise intersection, and the stats
 * clip built on them (reference:
 * core/geotime/.../store/query/TemporalRange.java:13-110,
 * TemporalConstraints.java:14-205,
 * extensions/adapters/vector/.../util/QueryIndexHelper.java:54-106
 * clipIndexedTemporalConstraints).
 *
 * Faithful port notes:
 * - Ranges are CLOSED intervals; two ranges meeting exactly at an endpoint
 *   merge (add()'s `endTime.after(start) || endTime.equals(start)`).
 * - `findIntersections` with an EMPTY side returns the OTHER side verbatim
 *   (TemporalConstraints.java:158-163) — "no constraints" means
 *   unconstrained, not empty-set.
 * - add()'s insert-before-neighbor branch extends the inserted range to the
 *   following neighbor's end WITHOUT removing that neighbor
 *   (TemporalConstraints.java:92-106) — the resulting list can carry a
 *   subsumed trailing range. Reproduced as-is; equality and the clip only
 *   read start/end envelopes, matching the reference's observable behavior.
 */
object TemporalAlgebra {

  /** closed [start, end] in epoch millis (TemporalRange.java:13-16) */
  final case class TemporalRange(start: Long, end: Long)

  val StartTime = 0L
  val EndTime: Long = Long.MaxValue
  val FullRange: TemporalRange = TemporalRange(StartTime, EndTime)

  /** reference TemporalConstraints.add (TemporalConstraints.java:63-107):
    * keep the list ordered by start; subsume, extend, or insert. */
  def add(constraints: List[TemporalRange], range: TemporalRange): List[TemporalRange] = {
    val buf = scala.collection.mutable.ListBuffer.from(constraints)
    var pos = 0
    var nextNeighbor: TemporalRange = null
    val it = constraints.iterator
    var broke = false
    while (it.hasNext && !broke) {
      nextNeighbor = it.next()
      if (nextNeighbor.start > range.start) {
        broke = true
      } else if (nextNeighbor.end >= range.start) {
        if (range.end < nextNeighbor.end) {
          return constraints // subsumed
        } else {
          buf.update(pos, TemporalRange(nextNeighbor.start, range.end))
          return buf.toList // replaced with larger range
        }
      } else pos += 1
    }
    if (nextNeighbor != null && nextNeighbor.start < range.end)
      buf.insert(pos, TemporalRange(range.start, math.max(nextNeighbor.end, range.end)))
    else
      buf.insert(pos, range)
    buf.toList
  }

  /** reference TemporalConstraints.findIntersections
    * (TemporalConstraints.java:154-185): pairwise closed-interval
    * intersection; an empty side yields the OTHER side. */
  def findIntersections(l: List[TemporalRange], r: List[TemporalRange]): List[TemporalRange] = {
    if (l.isEmpty) return r
    if (r.isEmpty) return l
    var out = List.empty[TemporalRange]
    for (lr <- l; rr <- r)
      if (!(lr.end < rr.start || rr.end < lr.start))
        out = add(out, TemporalRange(math.max(lr.start, rr.start), math.min(lr.end, rr.end)))
    out
  }

  /** reference TemporalConstraints.merge (TemporalConstraints.java:187-204). */
  def merge(l: List[TemporalRange], r: List[TemporalRange]): List[TemporalRange] = {
    if (l.isEmpty) return r
    if (r.isEmpty) return l
    r.foldLeft(l)(add)
  }

  /** the stats clip (QueryIndexHelper.clipIndexedTemporalConstraints,
    * QueryIndexHelper.java:54-106): replace the query's ranges with their
    * intersections against the store's [statsMin, statsMax] time-range
    * statistic. For a start/end range schema the stats range spans
    * [startStats.min, endStats.max] (the fullRange in the reference). */
  def clipToStats(query: List[TemporalRange], statsMin: Long, statsMax: Long): List[TemporalRange] =
    findIntersections(query, List(TemporalRange(statsMin, statsMax)))

  /** TemporalConstraints.toBinary (TemporalConstraints.java:205-215 +
    * TemporalRange.java:87-101): int count, then 16 bytes per range
    * (two big-endian longs). */
  def toBinary(constraints: List[TemporalRange]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(4 + constraints.size * 16)
    buf.putInt(constraints.size)
    for (r <- constraints) { buf.putLong(r.start); buf.putLong(r.end) }
    buf.array()
  }

  /** inverse of [[toBinary]], rebuilt through [[add]] like the reference. */
  def fromBinary(data: Array[Byte]): List[TemporalRange] = {
    val buf = java.nio.ByteBuffer.wrap(data)
    val n = buf.getInt()
    var out = List.empty[TemporalRange]
    for (_ <- 0 until n) out = add(out, TemporalRange(buf.getLong(), buf.getLong()))
    out
  }

}

/**
 * Stats-driven query clipping (QueryIndexHelper, reference
 * extensions/adapters/vector/.../util/QueryIndexHelper.java): intersect a
 * query's constraints with the store's own statistics BEFORE range
 * decomposition, so an oversized query decomposes only the lived-in
 * envelope and a provably-disjoint one scans nothing.
 */
object StatsClip {

  /** axis-aligned envelope [minX, maxX] × [minY, maxY] — the pure-double
    * stand-in for the stats bounding box. */
  final case class Env(minX: Double, maxX: Double, minY: Double, maxY: Double) {
    def isEmpty: Boolean = minX > maxX || minY > maxY
  }

  /** the bbox stats clip (QueryIndexHelper.clipIndexedBBOXConstraints,
    * QueryIndexHelper.java:141-165): query ∩ stats envelope; None = the
    * store provably holds nothing in the query box (zero ranges to scan).
    * Missing stats leave the query unclipped. */
  def clipEnvelope(query: Env, stats: Option[Env]): Option[Env] = stats match {
    case None => Some(query)
    case Some(s) =>
      val e = Env(math.max(query.minX, s.minX), math.min(query.maxX, s.maxX),
        math.max(query.minY, s.minY), math.min(query.maxY, s.maxY))
      if (e.isEmpty) None else Some(e)
  }

  /** temporal stats clip (QueryIndexHelper.clipIndexedTemporalConstraints,
    * QueryIndexHelper.java:54-106) — delegates to the ported constraint
    * algebra. */
  def clipTime(query: List[TemporalAlgebra.TemporalRange],
               statsMin: Long, statsMax: Long): List[TemporalAlgebra.TemporalRange] =
    TemporalAlgebra.clipToStats(query, statsMin, statsMax)
}
