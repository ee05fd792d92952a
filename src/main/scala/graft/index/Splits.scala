package graft.index

import scala.collection.immutable.TreeSet

/**
 * Histogram-equalized split planning — the reference's MapReduce input-split
 * equalizer re-expressed as a pure planner over stored row statistics
 * (reference: core/mapreduce/.../splits/SplitsProvider.java:40-128 — split
 * the LARGEST split via histogram-quantile bisection until `minSplits`,
 * merge the two SMALLEST until within `maxSplits`;
 * IntermediateSplitInfo.java:38-115 — split point = quantile(cdfStart +
 * (cdfEnd − cdfStart) · fraction), degenerate bisections abandoned).
 *
 * Cardinality comes from a key-prefix row histogram (the store's own
 * RowRangeHistogramStatistics analogue, `MultiIndex.prefixHistogram`):
 * each bucket's rows are modeled uniform over its prefix interval
 * [p‖00…, p‖ff…] — cdf and quantile interpolate inside buckets.
 *
 * The Spark consumer assigns each row a split id with a codegen'd binary
 * search (`gw_split_id`) and repartitions on it: balanced scan/shuffle
 * partitions from statistics the store already maintains, with NO sampling
 * pass over the data (`repartitionByRange` samples its child; at 100 TB
 * that sampling scan is the cost this planner removes).
 */
object Splits {

  /** inclusive key range under unsigned-lex order. */
  final case class KeyRange(start: Array[Byte], end: Array[Byte])

  /** one planned split: its ranges (non-adjacent after merging) and the
    * histogram-estimated row count. */
  final case class Split(ranges: Vector[KeyRange], cardinality: Double)

  /** fractional position of a key inside bucket prefix `p` (key assumed to
    * start with p): the next 6 bytes read as a base-256 fraction. */
  private def fracWithin(key: Array[Byte], prefixLen: Int): Double = {
    var f = 0.0
    var scale = 1.0 / 256.0
    var i = prefixLen
    val stop = math.min(key.length, prefixLen + 6)
    while (i < stop) { f += (key(i) & 0xff) * scale; scale /= 256.0; i += 1 }
    f
  }

  /** estimated number of rows with key < `key` (strict), from a SORTED
    * prefix histogram. Buckets wholly below count fully; the bucket whose
    * prefix-interval contains `key` contributes its within-bucket
    * fraction. */
  def cdf(hist: IndexedSeq[(Array[Byte], Long)], key: Array[Byte]): Double = {
    var acc = 0.0
    var i = 0
    var done = false
    while (i < hist.length && !done) {
      val (p, c) = hist(i)
      val cmp = ByteUtils.comparePrefixed(key, p)
      if (cmp > 0) acc += c // bucket interval entirely below key
      else {
        if (cmp == 0) acc += c * fracWithin(key, p.length)
        done = true // sorted: later buckets sit at or above key
      }
      i += 1
    }
    acc
  }

  /** inverse cdf: the key at cumulative row position `targetRows`
    * (prefix + 6 interpolated bytes). */
  def quantile(hist: IndexedSeq[(Array[Byte], Long)], targetRows: Double): Array[Byte] = {
    var acc = 0.0
    var i = 0
    while (i < hist.length) {
      val (p, c) = hist(i)
      if (acc + c >= targetRows || i == hist.length - 1) {
        val frac = if (c == 0) 0.0 else math.max(0.0, math.min(1.0, (targetRows - acc) / c))
        val out = new Array[Byte](p.length + 6)
        System.arraycopy(p, 0, out, 0, p.length)
        var f = frac
        var j = 0
        while (j < 6) { f *= 256.0; val b = math.min(255, f.toInt); out(p.length + j) = b.toByte; f -= b; j += 1 }
        return out
      }
      acc += c
      i += 1
    }
    Array.emptyByteArray
  }

  /** estimated rows inside [start, end] (inclusive-bounds approximation —
    * the reference's RowRangeHistogramStatistics.cardinality). */
  def cardinality(hist: IndexedSeq[(Array[Byte], Long)],
                  start: Array[Byte], end: Array[Byte]): Double =
    math.max(0.0, cdf(hist, end) - cdf(hist, start))

  private implicit val splitOrd: Ordering[(Double, Int)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)

  /**
   * Plan splits over `ranges` (e.g. a query decomposition or the store's
   * occupied extent): start with one split per range, then
   *  - while fewer than `minSplits`: bisect the largest split at the
   *    histogram midpoint of its cardinality (quantile interpolation
   *    inside the range that straddles the midpoint); a split whose
   *    bisection key degenerates to its own bounds is left whole
   *    (reference warns "Cannot meet minimum splits");
   *  - while more than `maxSplits`: merge the two smallest splits
   *    (their range lists concatenate; cardinality adds).
   */
  def plan(ranges: Seq[KeyRange], hist: IndexedSeq[(Array[Byte], Long)],
           minSplits: Int, maxSplits: Int): Vector[Split] = {
    require(minSplits >= 1 && maxSplits >= minSplits,
      s"need 1 <= minSplits <= maxSplits (got $minSplits, $maxSplits)")
    var nextId = 0
    def id(): Int = { nextId += 1; nextId }
    // ordered multiset keyed by (cardinality, insertion id) — the
    // reference's TreeSet<IntermediateSplitInfo>
    var splits = TreeSet.empty[(Double, Int)]
    var byId = Map.empty[Int, Split]
    def add(s: Split): Unit = { val i = id(); splits += ((s.cardinality, i)); byId += i -> s }
    ranges.foreach(r => add(Split(Vector(r), cardinality(hist, r.start, r.end))))

    var stuck = false
    while (splits.size < minSplits && !stuck) {
      val key = splits.last
      val big = byId(key._2)
      bisect(big, hist) match {
        case Some((a, b)) =>
          splits -= key; byId -= key._2
          add(a); add(b)
        case None => stuck = true // largest split cannot bisect further
      }
    }
    while (splits.size > maxSplits) {
      val k1 = splits.head; splits -= k1
      val k2 = splits.head; splits -= k2
      val merged = Split(byId(k1._2).ranges ++ byId(k2._2).ranges,
        byId(k1._2).cardinality + byId(k2._2).cardinality)
      byId -= k1._2; byId -= k2._2
      add(merged)
    }
    splits.toVector.map { case (_, i) => byId(i) }
  }

  /** bisect a split at half its cardinality: ranges accumulate until one
    * straddles the midpoint; that range splits at the interpolated
    * quantile key (exclusive end / inclusive start, expressed here with
    * the key itself as the left range's end and the right range's start —
    * unsigned-lex adjacency keeps the scan predicates disjoint on real
    * keys, matching the reference's isStartKeyInclusive=false handoff). */
  private def bisect(s: Split, hist: IndexedSeq[(Array[Byte], Long)]): Option[(Split, Split)] = {
    if (s.ranges.isEmpty) return None
    val target = s.cardinality / 2
    var acc = 0.0
    val left = Vector.newBuilder[KeyRange]
    var i = 0
    while (i < s.ranges.length) {
      val r = s.ranges(i)
      val c = cardinality(hist, r.start, r.end)
      if (acc + c < target && i < s.ranges.length - 1) {
        left += r; acc += c; i += 1
      } else {
        // split r so the left side lands on the overall midpoint
        val frac = if (c <= 0) 0.5 else math.max(0.0, math.min(1.0, (target - acc) / c))
        val cut = quantile(hist, cdf(hist, r.start) + c * frac)
        if (ByteUtils.compareUnsigned(cut, r.start) <= 0 ||
          ByteUtils.compareUnsigned(cut, r.end) >= 0) {
          // degenerate (reference: splitKey == start || splitKey == end)
          return if (i == 0) None
          else Some((Split(left.result(), acc),
            Split(s.ranges.drop(i), s.cardinality - acc)))
        }
        left += KeyRange(r.start, cut)
        val lcard = acc + cardinality(hist, r.start, cut)
        val right = KeyRange(cut, r.end) +: s.ranges.drop(i + 1)
        return Some((Split(left.result(), lcard), Split(right, s.cardinality - lcard)))
      }
    }
    None
  }
}
