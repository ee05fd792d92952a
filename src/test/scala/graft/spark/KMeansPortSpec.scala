package graft.spark

import org.apache.spark.sql.functions._

/**
 * Ported kmeans-family reference vectors:
 * KMeansDistortionMapReduceTest.testReducer (the Sugar–James distortion
 * golden) and CentroidAssociationFnTest (assignment pairings + total cost)
 * driven through our codegen'd nearest-centroid argmin.
 */
class KMeansPortSpec extends SparkTestBase {
  import spark.implicits._

  test("KMeansDistortionMapReduceTest.testReducer: distortion((0.34, 0.75), dims=2) == 3.6697247706422016") {
    // reducer input g1 = (0.34, 1), (0.75, 1) → expectation 0.545,
    // distortion (0.545/2)^(-1) (KMeansDistortionMapReduce.java:236-246)
    assert(Analytics.distortion(0.34 + 0.75, 2, dims = 2).contains(3.6697247706422016))
    // a group with no points writes nothing (ptCount == 0 guard)
    assert(Analytics.distortion(0.0, 0).isEmpty)
  }

  test("distortion at 3 dims follows pow(expectation/3, -1.5)") {
    val e = (0.34 + 0.75) / 2.0
    assert(Analytics.distortion(0.34 + 0.75, 2, dims = 3)
      .contains(math.pow(e / 3.0, -1.5)))
  }

  test("CentroidAssociationFnTest: 1-D points {345,764,89,900} assign to {10,1000} with total |d| cost 750") {
    // the reference's fn with metric |x - y| (CentroidAssociationFnTest
    // .java:69-126); squared-Euclidean argmin on (value, 0) preserves the
    // 1-D assignment ordering
    val cents = Seq((10L, 10.0, 0.0), (1000L, 1000.0, 0.0))
    val pts = Seq(345L, 764L, 89L, 900L).toDF("v")
      .select(col("v"), col("v").cast("double").as("lon"), lit(0.0).as("lat"))
    val assigned = pts.select(col("v"),
        GeoFunctions.gw_nearest_centroid(col("lon"), col("lat"), cents)
          .getField("cid").as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(345L -> 10L, 89L -> 10L, 764L -> 1000L, 900L -> 1000L))
    val cost = assigned.map { case (v, c) => math.abs(v - c) }.sum
    assert(cost == 750L)
  }
}
