package graft.index

/**
 * Z-order (Morton) space-filling curve: bit-interleaved normalized buckets,
 * the reference's alternative curve behind the same SFC interface
 * (core/index/.../sfc/zorder/ZOrderSFC.java:62-160, ZOrderUtils.java:14).
 * Same bucket-edge rules as the Hilbert curve (point = ceil(norm*bins)-1).
 */
final class ZOrderSFC(val dims: Array[SFCDimension]) extends Serializable {
  val n: Int = dims.length
  val totalBits: Int = dims.map(_.bits).sum
  require(totalBits <= 62, "z-order id must fit a positive long")

  /** interleave: output bit (MSB-first round-robin across dims). */
  def index(buckets: Array[Long]): Long = {
    var out = 0L
    val maxBits = dims.map(_.bits).max
    var b = maxBits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        if (b < dims(d).bits) {
          out = (out << 1) | ((buckets(d) >>> b) & 1L)
        }
        d += 1
      }
      b -= 1
    }
    out
  }

  def indexInverse(z: Long): Array[Long] = {
    val out = new Array[Long](n)
    val maxBits = dims.map(_.bits).max
    // replay the interleave order to find each output bit's source
    var pos = totalBits
    var b = maxBits - 1
    while (b >= 0) {
      var d = 0
      while (d < n) {
        if (b < dims(d).bits) {
          pos -= 1
          out(d) |= ((z >>> pos) & 1L) << b
        }
        d += 1
      }
      b -= 1
    }
    out
  }

  def getId(values: Array[Double]): Long = {
    val buckets = new Array[Long](n)
    var d = 0
    while (d < n) {
      val bins = 1L << dims(d).bits
      val norm = dims(d).dim.normalize(values(d))
      buckets(d) = math.max(math.ceil(norm * bins) - 1.0, 0.0).toLong
      d += 1
    }
    index(buckets)
  }
}
