package graft.index

/**
 * Hilbert curve over an n-dimensional grid with m bits per dimension,
 * following C. Hamilton's algorithm ("Compact Hilbert Indices", Dalhousie
 * CS-2006-07) — the same published algorithm behind the uzaygezen library the
 * reference engine delegates to
 * (reference: core/index/.../sfc/hilbert/PrimitiveHilbertSFCOperations.java:74-139).
 *
 * Every index configuration the reference ships uses equal bits per dimension
 * within one SFC tier (spatial 31/31, spatial-temporal 20/20/20, and every
 * tier produced by TieredSFCIndexFactory), so this implementation requires
 * equal precisions and supports up to 62 total bits in a primitive Long.
 *
 * Pinned against the reference's golden vectors (HilbertSFCTest.java:35,67,100:
 * id(max,max)=3074457345618258602, id(min,min)=0, id(mid,mid)=768614336404564650
 * at 31+31 bits). Those vectors are diagonal-symmetric, so the residual
 * dimension-rotation convention is pinned instead by the Hilbert continuity
 * property (verified in HilbertSpec) and used consistently engine-wide.
 */
final class CompactHilbert(val bits: Array[Int]) extends Serializable {
  import CompactHilbert._

  val n: Int = bits.length
  require(n >= 1 && bits.forall(_ == bits(0)),
    s"equal bits per dimension required (got ${bits.mkString(",")}); " +
      "all reference-shipped tier configs are equal-precision")
  val m: Int = bits(0)
  val totalBits: Int = n * m
  require(totalBits <= 62, s"total precision $totalBits exceeds 62 bits")

  private val dInit: Int = if (n <= 1) 0 else 1
  private val wMask: Long = (1L << n) - 1

  /** bit position in the level-label for dimension j (dim 0 = MSB). */
  @inline private def dimBit(j: Int): Int = n - 1 - j

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
      h = (h << n) | w
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
    var i = m - 1
    while (i >= 0) {
      val w = (h >>> (i * n)) & wMask
      val l = rotl(gc(w), d + 1, n) ^ e
      var j = 0
      while (j < n) {
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
    * Children are enumerated in Hilbert-rank order `w = 0..2^n-1`. */
  final case class Frame(e: Long, d: Int) {
    /** untransformed child cell label; bit for dim j via `labelBit`. */
    def childLabel(w: Int): Long = rotl(gc(w), d + 1, n) ^ e
    def childFrame(w: Int): Frame =
      Frame(e ^ rotl(entry(w), d + 1, n), (d + dir(w, n) + 1) % n)
  }
  def rootFrame: Frame = Frame(0L, dInit)
  @inline def labelBit(l: Long, j: Int): Long = (l >>> dimBit(j)) & 1L
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
