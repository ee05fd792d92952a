package graft.index

/**
 * Standard geohash (base-32 interleaved bisection, longitude first) — an
 * alternative cell-id scheme next to the Hilbert/Z-order curves, matching
 * the public geohash definition bit-for-bit (golden-tested against the
 * canonical vectors). The reference exposes the same pluggable-curve seam
 * through its NumericIndexStrategy SPI (core/index/.../IndexStrategy.java).
 */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val Base32Idx: Array[Int] = {
    val a = Array.fill(128)(-1)
    Base32.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  def encode(lon: Double, lat: Double, precision: Int): String = {
    require(precision >= 1 && precision <= 12)
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    val sb = new java.lang.StringBuilder(precision)
    var isLon = true
    var bit = 0
    var ch = 0
    while (sb.length < precision) {
      if (isLon) {
        val mid = (lonMin + lonMax) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonMin = mid } else { ch = ch << 1; lonMax = mid }
      } else {
        val mid = (latMin + latMax) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latMin = mid } else { ch = ch << 1; latMax = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { sb.append(Base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  /** cell bounds (lonMin, lonMax, latMin, latMax) of a geohash string. */
  def decodeBounds(gh: String): (Double, Double, Double, Double) = {
    var latMin = -90.0; var latMax = 90.0
    var lonMin = -180.0; var lonMax = 180.0
    var isLon = true
    for (c <- gh) {
      val lc = c.toLower.toInt
      val v = if (lc < 128) Base32Idx(lc) else -1 // non-ASCII must hit the guard, not AIOOBE
      require(v >= 0, s"invalid geohash char '$c'")
      var b = 4
      while (b >= 0) {
        val bitSet = ((v >> b) & 1) == 1
        if (isLon) {
          val mid = (lonMin + lonMax) / 2
          if (bitSet) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (bitSet) latMin = mid else latMax = mid
        }
        isLon = !isLon
        b -= 1
      }
    }
    (lonMin, lonMax, latMin, latMax)
  }
}
