package graft.spark

import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.locationtech.jts.io.WKBWriter

/**
 * Verbatim port of the reference's SpatialQueryTest OVERLAPS/CONTAINS
 * truth table (core/geotime/src/test/java/.../SpatialQueryTest.java:73-170):
 * query polygon (24,33)-(28,37), four line geometries, expected
 * OVERLAPS = [T,T,F,F], CONTAINS = [F,T,F,F].
 */
class SpatialQueryPortSpec extends SparkTestBase {

  private val gf = new GeometryFactory()
  private val writer = new WKBWriter(2)

  private val queryPoly = gf.createPolygon(Array(
    new Coordinate(24, 33), new Coordinate(28, 33), new Coordinate(28, 37),
    new Coordinate(24, 37), new Coordinate(24, 33)))

  private val lines = Seq(
    Array(new Coordinate(22, 32), new Coordinate(25, 36)),
    Array(new Coordinate(25, 33.5), new Coordinate(26, 34)),
    Array(new Coordinate(21, 33.5), new Coordinate(23, 34)),
    Array(new Coordinate(29, 33.5), new Coordinate(30, 34)))

  private def df = {
    import spark.implicits._
    lines.zipWithIndex
      .map { case (cs, i) => (i.toLong, writer.write(gf.createLineString(cs))) }
      .toDF("id", "geom")
  }

  test("OVERLAPS truth table [T,T,F,F] (SpatialQueryTest.testOverlaps)") {
    val got = df.select(col("id"),
        GeoFunctions.st_geom_predicate(col("geom"), writer.write(queryPoly), contains = false).as("hit"))
      .orderBy("id").collect().map(_.getBoolean(1))
    assert(got.sameElements(Array(true, true, false, false)))
  }

  test("CONTAINS truth table [F,T,F,F] (SpatialQueryTest.testContains)") {
    val got = df.select(col("id"),
        GeoFunctions.st_geom_predicate(col("geom"), writer.write(queryPoly), contains = true).as("hit"))
      .orderBy("id").collect().map(_.getBoolean(1))
    assert(got.sameElements(Array(false, true, false, false)))
  }

  test("query round trip: box query polygon (24,33)-(28,31) finds points inside") {
    // the first SpatialQueryTest polygon, as an end-to-end box query
    val poly = gf.createPolygon(Array(
      new Coordinate(24, 33), new Coordinate(28, 33), new Coordinate(28, 31),
      new Coordinate(24, 31), new Coordinate(24, 33)))
    import spark.implicits._
    val pts = Seq((1L, 26.0, 32.0), (2L, 23.0, 32.0), (3L, 26.0, 34.0))
      .toDF("doc_id", "lon", "lat")
    val got = Ops.spatialGeometryQuery(pts, poly).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }
}
