package graft.index

import org.scalatest.funsuite.AnyFunSuite
import TemporalAlgebra.TemporalRange

/**
 * Ported reference vectors for the temporal constraint algebra and the
 * stats clip: QueryIndexHelperTest.java (clip expectations),
 * TemporalConstraintsTest.java (binary round trip), and the
 * TemporalConstraints.add/findIntersections semantics they exercise.
 */
class TemporalAlgebraSpec extends AnyFunSuite {

  private def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  // QueryIndexHelperTest.setup (QueryIndexHelperTest.java:84-86)
  private val statsStart = ms("2005-05-15T20:32:56Z")
  private val statsEnd   = ms("2005-05-20T20:32:56Z")

  test("QueryIndexHelperTest.testGetTemporalConstraintsForSingleClippedRange: overhanging query clips to stats start") {
    // query [05-14, 05-18] vs stats [05-15, 05-20] → [05-15, 05-18]
    val clipped = StatsClip.clipTime(
      List(TemporalRange(ms("2005-05-14T20:32:56Z"), ms("2005-05-18T20:32:56Z"))),
      statsStart, statsEnd)
    assert(clipped == List(TemporalRange(statsStart, ms("2005-05-18T20:32:56Z"))))
  }

  test("QueryIndexHelperTest.testGetTemporalConstraintsForSingleClippedRange: contained query is unchanged") {
    val q = TemporalRange(ms("2005-05-18T20:32:56Z"), ms("2005-05-19T20:32:56Z"))
    assert(StatsClip.clipTime(List(q), statsStart, statsEnd) == List(q))
  }

  test("QueryIndexHelperTest.testGetTemporalConstraintsForRangeClippedFullRange: start/end-range schema clips to the composed full range") {
    // stats start-range [05-18, 05-20], end-range [05-21, 05-24] → the
    // reference composes fullRange = [statsStartRange.start, statsEndRange.end]
    // (QueryIndexHelper.java:66-77); query [epoch 0, 05-19] → [05-18, 05-19]
    val fullLo = ms("2005-05-18T20:32:56Z")
    val fullHi = ms("2005-05-24T20:32:56Z")
    val clipped = StatsClip.clipTime(
      List(TemporalRange(0L, ms("2005-05-19T20:32:56Z"))), fullLo, fullHi)
    assert(clipped == List(TemporalRange(fullLo, ms("2005-05-19T20:32:56Z"))))
  }

  test("findIntersections: an empty side yields the OTHER side (TemporalConstraints.java:158-163)") {
    val r = List(TemporalRange(10L, 20L))
    assert(TemporalAlgebra.findIntersections(Nil, r) == r)
    assert(TemporalAlgebra.findIntersections(r, Nil) == r)
    // disjoint non-empty sides intersect to the empty set
    assert(TemporalAlgebra.findIntersections(
      List(TemporalRange(0L, 5L)), List(TemporalRange(6L, 9L))).isEmpty)
  }

  test("add: closed-interval semantics — ranges meeting at an endpoint merge; subsumed ranges vanish") {
    // end == next start merges (TemporalConstraints.java:73-75 endTime.equals)
    assert(TemporalAlgebra.add(List(TemporalRange(0L, 10L)), TemporalRange(10L, 20L))
      == List(TemporalRange(0L, 20L)))
    // strictly inside → subsumed, list unchanged
    assert(TemporalAlgebra.add(List(TemporalRange(0L, 10L)), TemporalRange(2L, 9L))
      == List(TemporalRange(0L, 10L)))
    // overlapping extension replaces with the larger range
    assert(TemporalAlgebra.add(List(TemporalRange(0L, 10L)), TemporalRange(5L, 15L))
      == List(TemporalRange(0L, 15L)))
    // disjoint inserts in start order
    assert(TemporalAlgebra.add(List(TemporalRange(10L, 20L)), TemporalRange(0L, 5L))
      == List(TemporalRange(0L, 5L), TemporalRange(10L, 20L)))
    // insert-before-overlapping-neighbor keeps the neighbor and extends the
    // inserted range to its end — the reference's exact (quirky) behavior
    // (TemporalConstraints.java:92-106)
    assert(TemporalAlgebra.add(List(TemporalRange(10L, 20L)), TemporalRange(5L, 15L))
      == List(TemporalRange(5L, 20L), TemporalRange(10L, 20L)))
  }

  test("TemporalConstraintsTest port: binary round trip of [(1000, 100002)]") {
    val c = List(TemporalRange(1000L, 100002L))
    val b = TemporalAlgebra.toBinary(c)
    assert(b.length == 4 + 16)
    assert(TemporalAlgebra.fromBinary(b) == c)
    // multi-range round trip holds too (count-prefixed 16-byte records)
    val c2 = List(TemporalRange(0L, 5L), TemporalRange(10L, 20L))
    assert(TemporalAlgebra.fromBinary(TemporalAlgebra.toBinary(c2)) == c2)
  }

  test("QueryIndexHelperTest.testGetBBOX: query bbox clips to the stats envelope") {
    // stats from points (22.25, 42.25) and (27.25, 41.25)
    // (QueryIndexHelperTest.java:468-524); query (21.23, 26.23, 41.75, 43.1)
    val stats = StatsClip.Env(22.25, 27.25, 41.25, 42.25)
    val clipped = StatsClip.clipEnvelope(StatsClip.Env(21.23, 26.23, 41.75, 43.1), Some(stats))
    assert(clipped.contains(StatsClip.Env(22.25, 26.23, 41.75, 42.25)))
  }

  test("clipEnvelope: missing stats leave the query unclipped; disjoint stats prove emptiness") {
    val q = StatsClip.Env(0, 10, 0, 10)
    assert(StatsClip.clipEnvelope(q, None).contains(q))
    assert(StatsClip.clipEnvelope(q, Some(StatsClip.Env(20, 30, 0, 10))).isEmpty)
    assert(StatsClip.clipEnvelope(q, Some(StatsClip.Env(0, 10, 20, 30))).isEmpty)
  }

  test("fuzz: findIntersections membership == pointwise AND over 200 random instances") {
    // soundness of the clip regardless of the reference add()'s
    // overlap-retaining quirk: a point is inside the intersection result
    // iff it is inside some range on BOTH sides (closed intervals)
    val rnd = new scala.util.Random(20260818L)
    def randRanges(): List[TemporalRange] =
      List.fill(1 + rnd.nextInt(4)) {
        val a = rnd.nextInt(200).toLong; TemporalRange(a, a + rnd.nextInt(40))
      }
    def member(t: Long, rs: List[TemporalRange]): Boolean =
      rs.exists(r => t >= r.start && t <= r.end)
    for (_ <- 0 until 200) {
      val (l, r) = (randRanges(), randRanges())
      val inter = TemporalAlgebra.findIntersections(l, r)
      for (t <- 0L to 250L)
        assert(member(t, inter) == (member(t, l) && member(t, r)),
          s"t=$t l=$l r=$r inter=$inter")
      // merge covers the union pointwise
      val merged = TemporalAlgebra.merge(l, r)
      for (t <- 0L to 250L)
        assert(member(t, merged) == (member(t, l) || member(t, r)),
          s"merge t=$t l=$l r=$r merged=$merged")
    }
  }
}
