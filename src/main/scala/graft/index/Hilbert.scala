package graft.index

/**
 * Compact Hilbert curve over an n-dimensional grid with m_j bits per
 * dimension, following C. Hamilton's algorithm ("Compact Hilbert Indices",
 * Dalhousie CS-2006-07, Algorithms 7/8) — the same published algorithm
 * behind the uzaygezen library the reference engine delegates to
 * (reference: core/index/.../sfc/hilbert/PrimitiveHilbertSFCOperations.java:74-139
 * for the equal-precision primitive path; unequal precisions go through
 * uzaygezen's CompactHilbertCurve).
 *
 * Equal precisions per dimension (every index configuration the reference
 * ships: spatial 31/31, spatial-temporal 20/20/20) make every level's
 * free-bits mask full, the gray-code rank the identity, and the algorithm
 * reduces bit-for-bit to the plain Hilbert recursion — pinned by the
 * reference's golden vectors (HilbertSFCTest.java:35,67,100:
 * id(max,max)=3074457345618258602, id(min,min)=0,
 * id(mid,mid)=768614336404564650 at 31+31 bits). UNEQUAL precisions (the
 * spatio-temporal Bias presets: 25/25/10, 10/10/40) skip exhausted
 * dimensions per level via the compact mask: at level i only dimensions
 * with m_j > i contribute label bits, and the index packs the gray-code
 * RANK of the transformed label restricted to that mask (Hamilton's gcr),
 * recovering the constrained bits in the inverse from the entry-point
 * pattern (gcrInverse). The reference publishes no unequal-precision
 * golden vectors; HilbertUnequalSpec pins this path by its DEFINING
 * property — the compact index equals the RANK of the cell's full-grid
 * (golden-pinned, equal-precision) Hilbert index over the subgrid —
 * plus exhaustive bijectivity/round-trip and range-decomposition
 * exactness. Note the compact curve is NOT grid-continuous: consecutive
 * compact indices can be several cells apart wherever the full curve
 * leaves and re-enters the subgrid (locality is inherited from the full
 * curve's visit order, not from adjacency).
 *
 * Total precision is capped at 62 bits in a primitive Long; configurations
 * beyond that (the reference's UnboundedHilbertSFCOperations BigInteger
 * path) are served by [[CompactHilbertBig]]/[[HilbertSFCBig]], which share
 * this class's label-space machinery and are cross-checked bit-identical
 * on every ≤62-bit config (HilbertBigSpec).
 */
final class CompactHilbert(val bits: Array[Int]) extends Serializable {
  import CompactHilbert._

  val n: Int = bits.length
  require(n >= 1 && bits.forall(_ >= 0), s"invalid bits ${bits.mkString(",")}")
  /** levels run m-1 downto 0 over the MAXIMUM precision. */
  val m: Int = bits.max
  val totalBits: Int = bits.sum
  require(totalBits <= 62, s"total precision $totalBits exceeds 62 bits")

  private val dInit: Int = if (n <= 1) 0 else 1
  private val wMask: Long = (1L << n) - 1

  /** bit position in the level-label for dimension j (dim 0 = MSB). */
  @inline private def dimBit(j: Int): Int = n - 1 - j

  /** free-bits mask at level i (label-bit space): dims with m_j > i. */
  val levelMask: Array[Long] = Array.tabulate(m) { i =>
    var mu = 0L
    var j = 0
    while (j < n) { if (bits(j) > i) mu |= 1L << dimBit(j); j += 1 }
    mu
  }
  /** active-dimension count per level. */
  val levelBits: Array[Int] = levelMask.map(java.lang.Long.bitCount)

  /** Hilbert index of the grid cell given per-dimension bucket coordinates. */
  def index(p: Array[Long]): Long = {
    var e = 0L
    var d = dInit
    var h = 0L
    var i = m - 1
    while (i >= 0) {
      var l = 0L
      var j = 0
      while (j < n) {
        if (((p(j) >>> i) & 1L) == 1L) l |= 1L << dimBit(j)
        j += 1
      }
      val lt = rotr(l ^ e, d + 1, n)
      val w = gcInverse(lt)
      val rho = levelBits(i)
      // full mask (every equal-precision config, and every level above
      // the first exhausted dimension): the rank is the identity — skip
      // the mask rotation + rank loop on the per-row ingest hot path
      h = (h << rho) | (if (rho == n) w else gcr(w, rotr(levelMask(i), d + 1, n), n))
      e = e ^ rotl(entry(w), d + 1, n)
      d = (d + dir(w, n) + 1) % n
      i -= 1
    }
    h
  }

  /** Inverse: per-dimension bucket coordinates of a Hilbert index. */
  def indexInverse(h: Long): Array[Long] = {
    val p = new Array[Long](n)
    var e = 0L
    var d = dInit
    var shift = totalBits
    var i = m - 1
    while (i >= 0) {
      val rho = levelBits(i)
      shift -= rho
      val r = (h >>> shift) & ((1L << rho) - 1)
      val w =
        if (rho == n) r // full mask: the rank IS the sub-hypercube id
        else {
          val mu = rotr(levelMask(i), d + 1, n)
          val pi = rotr(e, d + 1, n) & ~mu & wMask
          gcrInverse(r, mu, pi, n)
        }
      val l = rotl(gc(w), d + 1, n) ^ e
      var j = 0
      while (j < n) {
        // inactive dims' label bits provably cancel to 0 here
        if (((l >>> dimBit(j)) & 1L) == 1L) p(j) |= 1L << i
        j += 1
      }
      e = e ^ rotl(entry(w), d + 1, n)
      d = (d + dir(w, n) + 1) % n
      i -= 1
    }
    p
  }

  /** A quadtree node's Hilbert frame, used by range-decomposition DFS.
    * Children at a LEVEL are enumerated in Hilbert-rank order
    * `r = 0 .. 2^levelBits(i)-1`; the full sub-hypercube id `w`
    * reconstructs from the rank via the entry-point pattern. */
  final case class Frame(e: Long, d: Int) {
    /** the sub-hypercube id of the child with rank r at level i. */
    def childW(r: Long, i: Int): Long =
      if (levelBits(i) == n) r // full mask: rank == id
      else {
        val mu = rotr(levelMask(i), d + 1, n)
        val pi = rotr(e, d + 1, n) & ~mu & wMask
        gcrInverse(r, mu, pi, n)
      }
    /** untransformed child cell label; bit for dim j via `labelBit`. */
    def childLabel(w: Long): Long = rotl(gc(w), d + 1, n) ^ e
    def childFrame(w: Long): Frame =
      Frame(e ^ rotl(entry(w), d + 1, n), (d + dir(w, n) + 1) % n)
  }
  def rootFrame: Frame = Frame(0L, dInit)
  @inline def labelBit(l: Long, j: Int): Long = (l >>> dimBit(j)) & 1L
  /** is dimension j active (still contributing bits) at level i? */
  @inline def activeAt(i: Int, j: Int): Boolean = bits(j) > i
}

object CompactHilbert {
  /** binary-reflected Gray code */
  @inline def gc(i: Long): Long = i ^ (i >>> 1)

  @inline def gcInverse(g: Long): Long = {
    var i = g
    var shift = 1
    while (shift < 64) { i ^= i >>> shift; shift <<= 1 }
    i
  }

  /** number of trailing set bits */
  @inline def tsb(i: Long): Int = java.lang.Long.numberOfTrailingZeros(~i)

  /** entry point of sub-hypercube w */
  @inline def entry(w: Long): Long =
    if (w == 0L) 0L else gc(2L * ((w - 1L) / 2L))

  /** intra sub-hypercube direction of w */
  @inline def dir(w: Long, n: Int): Int =
    if (w == 0L) 0
    else if ((w & 1L) == 1L) tsb(w) % n
    else tsb(w - 1L) % n

  /** gray code rank (Hamilton Alg. 4): the bits of w at FREE (mask-set)
    * positions, MSB-first compacted. Full mask → identity. */
  def gcr(w: Long, mask: Long, n: Int): Long = {
    var r = 0L
    var j = n - 1
    while (j >= 0) {
      if (((mask >>> j) & 1L) == 1L) r = (r << 1) | ((w >>> j) & 1L)
      j -= 1
    }
    r
  }

  /** gray code rank inverse (Hamilton Alg. 5): reconstruct w from its
    * rank r over the free mask and the FIXED bits pattern `pi` of
    * t = gc(w) at the constrained positions. Scans MSB-down using
    * gc(w)_j = w_j ^ w_{j+1}: a free position takes w_j from r, a
    * constrained position solves w_j = pi_j ^ w_{j+1}. */
  def gcrInverse(r0: Long, mask: Long, pi: Long, n: Int): Long = {
    var w = 0L
    var wPrev = 0L // w_{j+1}, 0 above the MSB
    var rShift = java.lang.Long.bitCount(mask)
    var j = n - 1
    while (j >= 0) {
      val wj =
        if (((mask >>> j) & 1L) == 1L) { rShift -= 1; (r0 >>> rShift) & 1L }
        else ((pi >>> j) & 1L) ^ wPrev
      w |= wj << j
      wPrev = wj
      j -= 1
    }
    w
  }

  /** rotate right within the low n bits */
  @inline def rotr(x: Long, r0: Int, n: Int): Long = {
    if (n == 0) return 0L
    val r = r0 % n
    if (r == 0) return x & ((1L << n) - 1)
    val mask = (1L << n) - 1
    (((x & mask) >>> r) | (x << (n - r))) & mask
  }

  /** rotate left within the low n bits */
  @inline def rotl(x: Long, r0: Int, n: Int): Long = {
    if (n == 0) return 0L
    val r = r0 % n
    if (r == 0) return x & ((1L << n) - 1)
    val mask = (1L << n) - 1
    ((x << r) | ((x & mask) >>> (n - r))) & mask
  }
}
