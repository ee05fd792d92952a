package graft.index

/**
 * The reference's simple (non-SFC) one-dimensional numeric index strategies —
 * SimpleNumericIndexStrategy and its Short/Integer/Long concretions
 * (core/index/.../simple/SimpleNumericIndexStrategy.java:40-160,
 * SimpleShortIndexStrategy / SimpleIntegerIndexStrategy /
 * SimpleLongIndexStrategy): the row key IS the lexicoded value, so
 * lexicographic byte order equals numeric order and every query interval
 * decomposes to exactly ONE contiguous byte range.
 *
 * Faithful-port notes (pinned by SimpleNumericStrategySpec):
 *  - `insertionIds(data)`: no binning — a RANGE datum is replicated once
 *    per integer value in [min, ceil(max)] (the reference's documented
 *    duplication for ranged data).
 *  - `queryRange`: single [lexicode(cast(min)), lexicode(cast(ceil(max)))]
 *    closed range; `cast` is the Java `(T) doubleValue` conversion of the
 *    key type (saturating double→int/long, then wrapping int→short).
 *  - byte order: the sign-flipped big-endian [[Lexicoders]], whose unsigned
 *    lexicographic sort equals value sort (Short/Integer/LongLexicoderTest).
 */
final case class SimpleNumericStrategy(name: String,
                                       enc: Double => Array[Byte],
                                       dec: Array[Byte] => Long) {

  /** one key per integer value in [min, ceil(max)] — a point datum is a
    * single key (SimpleNumericIndexStrategy.getInsertionIds:118-139). */
  def insertionIds(min: Double, max: Double): Seq[Array[Byte]] = {
    val lo = min.toLong
    val hi = math.ceil(max).toLong
    (lo to hi).map(i => enc(i.toDouble))
  }

  /** the single contiguous query range
    * (SimpleNumericIndexStrategy.getQueryRanges:67-97). */
  def queryRange(min: Double, max: Double): (Array[Byte], Array[Byte]) =
    (enc(min), enc(math.ceil(max)))
}

object SimpleNumeric {
  /** Java `(T) doubleValue` cast per key type, then the matching lexicoder.
    * The double→int/long leg SATURATES at the type extremes (so an
    * unbounded upper query bound keys to the type maximum, not a wrapped
    * negative that would invert the range); the int→short leg then narrows
    * by wrapping — exactly the JLS conversion the reference's
    * `cast(double)` implementations perform. Scala's Double.toInt/toLong/
    * toShort follow the same JLS rules, applied to the DOUBLE directly. */
  val short: SimpleNumericStrategy = SimpleNumericStrategy("SIMPLE_SHORT_IDX",
    v => Lexicoders.encodeShort(v.toShort), b => Lexicoders.decodeShort(b).toLong)
  val int: SimpleNumericStrategy = SimpleNumericStrategy("SIMPLE_INT_IDX",
    v => Lexicoders.encodeInt(v.toInt), b => Lexicoders.decodeInt(b).toLong)
  val long: SimpleNumericStrategy = SimpleNumericStrategy("SIMPLE_LONG_IDX",
    v => Lexicoders.encodeLong(v.toLong), b => Lexicoders.decodeLong(b))
}
