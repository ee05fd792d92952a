package graft.index

/**
 * Sort-preserving byte encodings for secondary numeric indexes: unsigned
 * lexicographic order of the encoded bytes equals numeric order.
 * (reference: core/index/.../lexicoder/DoubleLexicoder.java:11-35 sign-flip
 * trick, LongLexicoder, IntegerLexicoder via Lexicoders.java)
 */
object Lexicoders {

  /** long: flip the sign bit so negatives sort first. */
  def encodeLong(v: Long): Array[Byte] = {
    val u = v ^ Long.MinValue
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (u >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def decodeLong(b: Array[Byte]): Long = {
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (b(i) & 0xffL); i += 1 }
    u ^ Long.MinValue
  }

  /** int: same sign-flip at 32 bits. */
  def encodeInt(v: Int): Array[Byte] = {
    val u = v ^ Int.MinValue
    Array((u >>> 24).toByte, (u >>> 16).toByte, (u >>> 8).toByte, u.toByte)
  }

  def decodeInt(b: Array[Byte]): Int =
    (((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)) ^ Int.MinValue

  /** double: IEEE754 bits; non-negative → flip sign bit, negative → flip
    * ALL bits (reverses the order of negatives). NaN-free contract. */
  def encodeDouble(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    val u = if (bits >= 0) bits ^ Long.MinValue else ~bits
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (u >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def decodeDouble(b: Array[Byte]): Double = {
    var u = 0L
    var i = 0
    while (i < 8) { u = (u << 8) | (b(i) & 0xffL); i += 1 }
    val bits = if (u < 0) u ^ Long.MinValue else ~u
    java.lang.Double.longBitsToDouble(bits)
  }

  /** short: sign-flip at 16 bits (reference ShortLexicoder.java:14-27). */
  def encodeShort(v: Short): Array[Byte] = {
    val u = v ^ 0x8000
    Array((u >>> 8).toByte, u.toByte)
  }

  def decodeShort(b: Array[Byte]): Short =
    ((((b(0) & 0xff) << 8) | (b(1) & 0xff)) ^ 0x8000).toShort

  /** the reference's exact DoubleLexicoder byte layout
    * (DoubleLexicoder.java:11-35): it composes the IEEE sign transform
    * with the LONG lexicoder, which flips the sign bit AGAIN — so its
    * bytes order correctly only under SIGNED byte comparison (its own
    * test compares with SignedBytes). Byte-wise this is [[encodeDouble]]
    * with the leading byte's top bit flipped; our store uses
    * [[encodeDouble]] because Spark's BinaryType and Parquet both compare
    * UNSIGNED. */
  def encodeDoubleRef(v: Double): Array[Byte] = {
    val out = encodeDouble(v)
    out(0) = (out(0) ^ 0x80).toByte
    out
  }

  def decodeDoubleRef(b: Array[Byte]): Double = {
    val c = b.clone()
    c(0) = (c(0) ^ 0x80).toByte
    decodeDouble(c)
  }
}
