package graft.index

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

/**
 * UNBOUNDED compact Hilbert curve — the arbitrary-precision twin of
 * [[CompactHilbert]] for total precision > 62 bits (the reference serves
 * such configs through a BigInteger code path,
 * core/index/.../sfc/hilbert/UnboundedHilbertSFCOperations.java:1-502,
 * delegating the curve itself to uzaygezen's CompactHilbertCurve; this
 * class implements the same published Hamilton Algorithms 7/8 as the Long
 * path and SHARES its label-space machinery — levelMask/levelBits, gray
 * rank, entry/direction — which all live in n-bit space and stay
 * primitive). Only the accumulated index `h` and the per-dimension bucket
 * coordinates grow beyond 64 bits.
 *
 * For any configuration with total precision ≤ 62 bits this curve is
 * bit-identical to [[CompactHilbert]] (HilbertBigSpec cross-checks
 * exhaustively and re-runs the HilbertSFCTest golden vectors through this
 * path).
 */
final class CompactHilbertBig(val bits: Array[Int]) extends Serializable {
  import CompactHilbert._

  val n: Int = bits.length
  require(n >= 1 && n <= 62 && bits.forall(_ >= 0), s"invalid bits ${bits.mkString(",")}")
  val m: Int = bits.max
  val totalBits: Int = bits.sum

  private val dInit: Int = if (n <= 1) 0 else 1
  private val wMask: Long = (1L << n) - 1

  @inline private def dimBit(j: Int): Int = n - 1 - j

  /** free-bits mask at level i (label-bit space): dims with m_j > i. */
  val levelMask: Array[Long] = Array.tabulate(m) { i =>
    var mu = 0L
    var j = 0
    while (j < n) { if (bits(j) > i) mu |= 1L << dimBit(j); j += 1 }
    mu
  }
  val levelBits: Array[Int] = levelMask.map(java.lang.Long.bitCount)

  /** Hilbert index of the grid cell given per-dimension bucket coordinates. */
  def index(p: Array[BigInteger]): BigInteger = {
    var e = 0L
    var d = dInit
    var h = BigInteger.ZERO
    var i = m - 1
    while (i >= 0) {
      var l = 0L
      var j = 0
      while (j < n) {
        if (p(j).testBit(i)) l |= 1L << dimBit(j)
        j += 1
      }
      val lt = rotr(l ^ e, d + 1, n)
      val w = gcInverse(lt)
      val rho = levelBits(i)
      val r = if (rho == n) w else gcr(w, rotr(levelMask(i), d + 1, n), n)
      h = h.shiftLeft(rho).or(BigInteger.valueOf(r))
      e = e ^ rotl(entry(w), d + 1, n)
      d = (d + dir(w, n) + 1) % n
      i -= 1
    }
    h
  }

  /** Inverse: per-dimension bucket coordinates of a Hilbert index. */
  def indexInverse(h: BigInteger): Array[BigInteger] = {
    val p = Array.fill(n)(BigInteger.ZERO)
    var e = 0L
    var d = dInit
    var shift = totalBits
    var i = m - 1
    while (i >= 0) {
      val rho = levelBits(i)
      shift -= rho
      val r = h.shiftRight(shift).and(BigInteger.valueOf((1L << rho) - 1)).longValueExact()
      val w =
        if (rho == n) r
        else {
          val mu = rotr(levelMask(i), d + 1, n)
          val pi = rotr(e, d + 1, n) & ~mu & wMask
          gcrInverse(r, mu, pi, n)
        }
      val l = rotl(gc(w), d + 1, n) ^ e
      var j = 0
      while (j < n) {
        if (((l >>> dimBit(j)) & 1L) == 1L) p(j) = p(j).setBit(i)
        j += 1
      }
      e = e ^ rotl(entry(w), d + 1, n)
      d = (d + dir(w, n) + 1) % n
      i -= 1
    }
    p
  }

  /** quadtree frame for range-decomposition DFS (label space is still
    * primitive — identical to [[CompactHilbert.Frame]]). */
  final case class Frame(e: Long, d: Int) {
    def childW(r: Long, i: Int): Long =
      if (levelBits(i) == n) r
      else {
        val mu = rotr(levelMask(i), d + 1, n)
        val pi = rotr(e, d + 1, n) & ~mu & wMask
        gcrInverse(r, mu, pi, n)
      }
    def childLabel(w: Long): Long = rotl(gc(w), d + 1, n) ^ e
    def childFrame(w: Long): Frame =
      Frame(e ^ rotl(entry(w), d + 1, n), (d + dir(w, n) + 1) % n)
  }
  def rootFrame: Frame = Frame(0L, dInit)
  @inline def labelBit(l: Long, j: Int): Long = (l >>> dimBit(j)) & 1L
  @inline def activeAt(i: Int, j: Int): Boolean = bits(j) > i
}

/**
 * Arbitrary-precision Hilbert SFC over normalized dimensions — the store
 * key variant for total precision > 62 bits: value→id bytes, id→cell
 * bounds, and query-range decomposition, all mirroring [[HilbertSFC]] with
 * the reference's BigDecimal normalization rules
 * (UnboundedHilbertSFCOperations.normalizeDimension:160-199: FLOOR capped
 * at bins−1 for range-min, CEILING−1 floored at 0 for point/range-max) and
 * BigInteger quad coarsening (UNIT_CELL_SIZE 2^20, :46-49).
 * Keys stay fixed-width big-endian unsigned bytes, so lexicographic byte
 * order IS curve order at any precision.
 */
final class HilbertSFCBig(val dimensions: Array[SFCDimension]) extends Serializable {
  val n: Int = dimensions.length
  val hilbert = new CompactHilbertBig(dimensions.map(_.bits))
  val totalPrecision: Int = dimensions.map(_.bits).sum
  val byteCount: Int = math.ceil(totalPrecision / 8.0).toInt
  private val binsPerDim: Array[BigInteger] =
    dimensions.map(d => BigInteger.ONE.shiftLeft(d.bits))
  private val binsDecimal: Array[JBigDecimal] = binsPerDim.map(new JBigDecimal(_))
  private val maxHilbert: BigInteger =
    if (totalPrecision == 0) BigInteger.ZERO
    else BigInteger.ONE.shiftLeft(totalPrecision).subtract(BigInteger.ONE)
  val UnitCellSize: BigInteger = BigInteger.ONE.shiftLeft(20)

  /** fixed-width unsigned big-endian bytes of the low totalPrecision bits. */
  def idToBytes(h: BigInteger): Array[Byte] = {
    val out = new Array[Byte](byteCount)
    val raw = h.toByteArray // two's-complement big-endian, h >= 0 here
    val src = if (raw.length > byteCount) raw.length - byteCount else 0
    val dst = if (raw.length < byteCount) byteCount - raw.length else 0
    System.arraycopy(raw, src, out, dst, raw.length - src)
    out
  }

  def bytesToId(b: Array[Byte]): BigInteger = new BigInteger(1, b)

  /** bucket a value with the reference's BigDecimal edge rules. */
  def normalizeToBucket(d: Int, value: Double, isMin: Boolean,
                        overInclusiveOnEdge: Boolean): BigInteger = {
    val norm = dimensions(d).dim.normalize(value)
    require(norm >= 0 && norm <= 1, s"value $value normalizes outside [0,1]")
    val scaled = JBigDecimal.valueOf(norm).multiply(binsDecimal(d))
    if ((isMin && !overInclusiveOnEdge) || (!isMin && overInclusiveOnEdge))
      scaled.setScale(0, RoundingMode.FLOOR).toBigInteger
        .min(binsPerDim(d).subtract(BigInteger.ONE))
    else
      scaled.setScale(0, RoundingMode.CEILING).toBigInteger
        .subtract(BigInteger.ONE).max(BigInteger.ZERO)
  }

  def getId(values: Array[Double]): Array[Byte] = {
    val p = new Array[BigInteger](n)
    var d = 0
    while (d < n) {
      p(d) = normalizeToBucket(d, values(d), isMin = false, overInclusiveOnEdge = false)
      d += 1
    }
    idToBytes(hilbert.index(p))
  }

  def getCoordinates(id: Array[Byte]): Array[BigInteger] =
    hilbert.indexInverse(bytesToId(id))

  /** denormalized cell bounds [min,max) per dimension of an SFC id
    * (UnboundedHilbertSFCOperations.denormalizeDimension:253-282 —
    * exact BigDecimal division by 2^bits, then to double). */
  def getRangesForId(id: Array[Byte]): Array[NumericData] = {
    val p = getCoordinates(id)
    Array.tabulate(n) { d =>
      val lo = new JBigDecimal(p(d)).divide(binsDecimal(d)).doubleValue()
      val hi = new JBigDecimal(p(d).add(BigInteger.ONE)).divide(binsDecimal(d)).doubleValue()
      NumericData(dimensions(d).dim.denormalize(lo), dimensions(d).dim.denormalize(hi))
    }
  }

  private def bucketRanges(ranges: Array[NumericData], overInclusiveOnEdge: Boolean)
      : (Array[BigInteger], Array[BigInteger]) = {
    val mins = new Array[BigInteger](n)
    val maxes = new Array[BigInteger](n)
    var d = 0
    while (d < n) {
      val lo = normalizeToBucket(d, ranges(d).min, isMin = true, overInclusiveOnEdge)
      var hi = normalizeToBucket(d, ranges(d).max, isMin = false, overInclusiveOnEdge)
      if (lo.compareTo(hi) > 0) hi = lo // exclusive-max collapse
      mins(d) = lo
      maxes(d) = hi
      d += 1
    }
    (mins, maxes)
  }

  /** quads this size or smaller are emitted whole — BigInteger twin of the
    * Long path's coarsening floor (maxRange^n / 2^20, min 1). */
  private def minimumQuadSize(mins: Array[BigInteger], maxes: Array[BigInteger]): BigInteger = {
    var maxRange = BigInteger.ONE
    var d = 0
    while (d < n) {
      maxRange = maxRange.max(maxes(d).subtract(mins(d)).abs().add(BigInteger.ONE))
      d += 1
    }
    val decomposed = maxRange.pow(n)
    if (decomposed.compareTo(UnitCellSize) <= 0) BigInteger.ONE
    else decomposed.divide(UnitCellSize)
  }

  /** BigInteger twin of [[HilbertSFC.decomposeRange]]: DFS in curve order,
    * contained/coarsened quads emit whole, adjacent ranges merge, the
    * budget merges smallest gaps first. Never under-inclusive. */
  def decomposeRange(ranges: Array[NumericData], overInclusiveOnEdge: Boolean,
                     maxRanges0: Int): Array[SfcRange] = {
    val maxRanges = if (maxRanges0 <= 0) Int.MaxValue else maxRanges0
    if (totalPrecision == 0)
      return Array(SfcRange(ByteUtils.empty, ByteUtils.empty))
    val (qMins, qMaxes) = bucketRanges(ranges, overInclusiveOnEdge)
    val minQuad = minimumQuadSize(qMins, qMaxes)
    val m = hilbert.m
    def freeBits(j: Int, k: Int): Int = math.min(dimensions(j).bits, m - k)
    val spanAtDepth: Array[Int] =
      Array.tabulate(m + 1)(k => (0 until n).map(freeBits(_, k)).sum)

    val out = new scala.collection.mutable.ArrayBuffer[Array[BigInteger]]()
    def emit(start: BigInteger, end: BigInteger): Unit = {
      if (out.nonEmpty && out.last(1).add(BigInteger.ONE) == start) out.last(1) = end
      else out += Array(start, end)
    }

    def dfs(pref: Array[BigInteger], k: Int, h: BigInteger,
            frame: hilbert.Frame): Unit = {
      var d = 0
      var contained = true
      while (d < n) {
        val side = freeBits(d, k)
        val lo = pref(d).shiftLeft(side)
        val hi = lo.add(BigInteger.ONE.shiftLeft(side)).subtract(BigInteger.ONE)
        if (hi.compareTo(qMins(d)) < 0 || lo.compareTo(qMaxes(d)) > 0) return
        if (lo.compareTo(qMins(d)) < 0 || hi.compareTo(qMaxes(d)) > 0) contained = false
        d += 1
      }
      val span = spanAtDepth(k)
      val cells = BigInteger.ONE.shiftLeft(span)
      if (contained || k == m || cells.compareTo(minQuad) <= 0) {
        val start = h.shiftLeft(span)
        emit(start, start.add(cells).subtract(BigInteger.ONE))
        return
      }
      val level = m - 1 - k
      val rho = hilbert.levelBits(level)
      var r = 0L
      val child = new Array[BigInteger](n)
      while (r < (1L << rho)) {
        val w = frame.childW(r, level)
        val l = frame.childLabel(w)
        var j = 0
        while (j < n) {
          child(j) =
            if (hilbert.activeAt(level, j))
              pref(j).shiftLeft(1).or(BigInteger.valueOf(hilbert.labelBit(l, j)))
            else pref(j)
          j += 1
        }
        dfs(child, k + 1, h.shiftLeft(rho).or(BigInteger.valueOf(r)), frame.childFrame(w))
        r += 1
      }
    }

    dfs(Array.fill(n)(BigInteger.ZERO), 0, BigInteger.ZERO, hilbert.rootFrame)

    if (out.length > maxRanges) {
      val gaps = out.indices.dropRight(1)
        .map(i => (out(i + 1)(0).subtract(out(i)(1)), i))
        .sortBy(_._1)
      val mergeAt = new Array[Boolean](out.length)
      gaps.take(out.length - maxRanges).foreach { case (_, i) => mergeAt(i) = true }
      val merged = new scala.collection.mutable.ArrayBuffer[Array[BigInteger]]()
      var i = 0
      while (i < out.length) {
        var end = out(i)(1)
        var j = i
        while (j < out.length - 1 && mergeAt(j)) { j += 1; end = out(j)(1) }
        merged += Array(out(i)(0), end)
        i = j + 1
      }
      out.clear()
      out ++= merged
    }

    out.map { r =>
      SfcRange(
        idToBytes(r(0).max(BigInteger.ZERO).min(maxHilbert)),
        idToBytes(r(1).max(BigInteger.ZERO).min(maxHilbert)))
    }.toArray
  }
}
