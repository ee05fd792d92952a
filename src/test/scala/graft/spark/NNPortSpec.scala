package graft.spark

import org.apache.spark.sql.functions._

/**
 * NNProcessorTest port (analytics/api/src/test/.../nn/NNProcessorTest.java):
 * the within-partition NN primitive — neighbors require the SAME partition
 * (v/300) and distance <= 200 (NNProcessor.java:299 `distance <=
 * maxDistance`), so 1033 finds nothing even though 833 is exactly 200 away
 * (different partition) while 1833/2033 at exactly 200 pair up. This is
 * the partition-boundary miss the reference's overlapping orthodromic
 * partitioner (and our tile-neighborhood expansion) exists to fix — the
 * spec pins the primitive's exact semantics, and the contrast case shows
 * the neighborhood join recovering the boundary pair.
 */
class NNPortSpec extends SparkTestBase {
  import spark.implicits._

  private val items = Seq(293, 233, 735, 833, 1833, 2033, 1033, 533)

  test("NNProcessorTest.testNormalOp: same-partition pairs within <= 200") {
    val df = items.toDF("v").withColumn("p", floor(col("v") / 300))
    val pairs = df.as("a").join(df.as("b"),
        col("a.p") === col("b.p") && col("a.v") =!= col("b.v") &&
          abs(col("a.v") - col("b.v")) <= 200)
      .select(col("a.v").as("v"), col("b.v").as("n"))
      .collect().map(r => r.getInt(0) -> r.getInt(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = Map(
      293 -> Set(233), 233 -> Set(293),
      735 -> Set(833), 833 -> Set(735),
      1833 -> Set(2033), 2033 -> Set(1833))
    assert(pairs == expected)
    // 1033 and 533 have NO same-partition neighbor (1033-833 = 200 but
    // 833 lives in partition 2, 1033 in partition 3)
    assert(!pairs.contains(1033) && !pairs.contains(533))
  }

  test("neighborhood expansion recovers the cross-partition pair the flat partitioner misses") {
    // expand each left row to partitions {p-1, p, p+1} — the 1-D analog of
    // our tile-neighborhood join (Ops cellNeighborhood) and the reference's
    // OrthodromicDistancePartitioner overlap
    val df = items.toDF("v").withColumn("p", floor(col("v") / 300))
    val left = df.withColumn("p", explode(array(col("p") - 1, col("p"), col("p") + 1)))
    val pairs = left.as("a").join(df.as("b"),
        col("a.p") === col("b.p") && col("a.v") < col("b.v") &&
          abs(col("a.v") - col("b.v")) <= 200)
      .select(col("a.v"), col("b.v")).distinct()
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs.contains((833, 1033)), "boundary pair must be found with overlap")
    assert(pairs == Set((233, 293), (735, 833), (1833, 2033), (833, 1033)))
  }
}
