package graft.index

/**
 * The reference's flattened-field-set bitmask (reference:
 * core/store/.../flatten/BitmaskUtils.java:14-98,
 * BitmaskedFieldInfoComparator.java): each row value is a per-field
 * bitmask + field encodings sorted by field position (SURVEY §1.1). Our
 * store is columnar parquet, so the mask is not a storage layout here —
 * it is the attribute-subset descriptor used when planning projection
 * pushdown (which field positions a subset scan materializes), with the
 * reference's exact byte layout: bit i of byte i/8 set ⇔ field i present
 * (java.util.BitSet.toByteArray order), minimal byte length.
 */
object Bitmask {

  /** composite bitmask for a set of field positions
    * (BitmaskUtils.generateCompositeBitmask, BitmaskUtils.java:49-58). */
  def composite(fieldPositions: Iterable[Int]): Array[Byte] = {
    require(fieldPositions.nonEmpty, "empty field set has no bitmask")
    val out = new Array[Byte](fieldPositions.max / 8 + 1)
    for (p <- fieldPositions) out(p / 8) = (out(p / 8) | (1 << (p % 8))).toByte
    out
  }

  /** single-field bitmask (BitmaskUtils.java:60-75). */
  def single(fieldPosition: Int): Array[Byte] = composite(Seq(fieldPosition))

  /** set (true) bits → ordered field positions
    * (BitmaskUtils.getFieldPositions, BitmaskUtils.java:85-98). */
  def fieldPositions(bitmask: Array[Byte]): List[Int] = {
    val out = List.newBuilder[Int]
    var byteIdx = 0
    for (b <- bitmask) {
      var bit = 0
      while (bit < 8) {
        if (((b >>> bit) & 0x1) == 1) out += byteIdx * 8 + bit
        bit += 1
      }
      byteIdx += 1
    }
    out.result()
  }

  /** bitwise AND truncated to the shorter mask
    * (BitmaskUtils.generateANDBitmask, BitmaskUtils.java:16-27). */
  def and(m1: Array[Byte], m2: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](math.min(m1.length, m2.length))
    var i = 0
    while (i < out.length) { out(i) = (m1(i) & m2(i)).toByte; i += 1 }
    out
  }

  /** any field present? (BitmaskUtils.isAnyBitSet, BitmaskUtils.java:29-38) */
  def isAnySet(mask: Array[Byte]): Boolean = mask.exists(_ != 0)

  /** field names a subset scan materializes, by adapter position — the
    * projection-pushdown descriptor built from a composite mask. */
  def subsetFields(allFields: IndexedSeq[String], mask: Array[Byte]): Seq[String] =
    fieldPositions(mask).filter(_ < allFields.length).map(allFields)
}
