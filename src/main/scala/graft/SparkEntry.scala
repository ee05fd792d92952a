package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spark.{Ops, Tables}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each query runs an operator from SURVEY.md §2 over the driver-provided
  * parquet at `sfDir`; `oracleSql` holds the DuckDB-equivalent SQL over the
  * same tables. Geo columns are derived deterministically from row ids with
  * integer arithmetic so both engines compute identical doubles
  * (see Tables.pages / Tables.geoEvents).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_spatial_box")(spark, "/root/testdata/sf0.001")

  // query window constants (shared between Spark and oracle SQL)
  private val Box = (10.0, 120.0, -20.0, 60.0) // lonMin, lonMax, latMin, latMax
  private val TsMin = java.sql.Timestamp.valueOf("2024-01-10 00:00:00")
  private val TsMax = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
  // triangle polygon for exact-geometry tests; vertices chosen so no
  // 0.01-grid point sits on a non-horizontal edge (see q02 oracle)
  private val TriWkt = "POLYGON ((0.005 0.005, 60.005 0.005, 30.005 40.005, 0.005 0.005))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_spatial_box" -> ((s, dir) => {
      Ops.spatialBoxQuery(Tables.pages(s, dir), Box._1, Box._2, Box._3, Box._4)
        .select(col("doc_id"), col("lon"), col("lat"))
    }),
    "q02_spatial_polygon" -> ((s, dir) => {
      val geom = new org.locationtech.jts.io.WKTReader().read(TriWkt)
      Ops.spatialGeometryQuery(Tables.pages(s, dir), geom)
        .select(col("doc_id"), col("lon"), col("lat"))
    }),
    "q03_st_box" -> ((s, dir) => {
      Ops.stBoxQuery(Tables.geoEvents(s, dir), Box._1, Box._2, Box._3, Box._4, TsMin, TsMax)
        .select(col("event_id"), col("lon"), col("lat"), col("ts"))
    }),
    "q04_distance_join" -> ((s, dir) => {
      Ops.distanceJoin(Tables.geoEvents(s, dir).withColumnRenamed("event_id", "id"),
        "id", d = 1.0, bits = 8)
    }),
    "q05_knn" -> ((s, dir) => {
      val pts = Tables.pages(s, dir)
      val cents = pts.where(col("doc_id") % 50 === 0)
      Ops.knnToCentroids(pts, "doc_id", cents, "doc_id", k = 10)
    }),
    "q06_tile_assign" -> ((s, dir) => {
      import graft.spark.GeoFunctions._
      Tables.pages(s, dir).select(
        col("doc_id"),
        gw_tile_x(col("lon"), 8).as("tx"),
        gw_tile_y(col("lat"), 8).as("ty"))
    }),
    "q07_bbox_stats" -> ((s, dir) => {
      Ops.bboxStats(Tables.pages(s, dir), Seq("lang"))
    }),
    "q08_time_range" -> ((s, dir) => {
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("cnt"), min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"))
    }),
    "q09_histogram" -> ((s, dir) => {
      Ops.fixedBinHistogram(s.read.parquet(s"$dir/orders.parquet"), "o_totalprice", 10000.0)
    }),
    "q10_dedup_exact" -> ((s, dir) => {
      Ops.exactDedup(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    }),
    "q11_text_quality" -> ((s, dir) => {
      Ops.textQuality(s.read.parquet(s"$dir/documents.parquet"), "doc_id", "text")
    }),
    "q12_ann_topk" -> ((s, dir) => {
      Ops.annBruteForce(s.read.parquet(s"$dir/embeddings.parquet"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
    }),
    "q13_distinct_knn" -> ((s, dir) => {
      val pts = Tables.pages(s, dir)
      val cents = pts.where(col("doc_id") % 50 === 0)
      Ops.distinctKnnToCentroids(pts, "doc_id", cents, "doc_id", k = 10)
    }),
    "q14_polygon_join" -> ((s, dir) => {
      graft.spark.SpatialJoin.polygonJoin(Tables.pages(s, dir), Tables.regionGeoms(40))
        .select(col("doc_id"), col("region_id"))
    }),
    "q15_knn_ring" -> ((s, dir) => {
      val pts = Tables.pages(s, dir)
      val queries = pts.where(col("doc_id") % 97 === 0)
      graft.spark.SpatialJoin.knnRing(pts, "doc_id", queries, "doc_id", k = 10)
    }),
  )

  private val pagesCte =
    s"""WITH pages AS (
       |  SELECT doc_id, ${Tables.pagesLonSql} AS lon, ${Tables.pagesLatSql} AS lat, text, lang
       |  FROM documents)""".stripMargin

  private val eventsCte =
    s"""WITH ev AS (
       |  SELECT event_id, ${Tables.eventsLonSql} AS lon, ${Tables.eventsLatSql} AS lat, ts
       |  FROM events)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_spatial_box" ->
      s"""$pagesCte
         |SELECT doc_id, lon, lat FROM pages
         |WHERE lon >= ${Box._1} AND lon <= ${Box._2} AND lat >= ${Box._3} AND lat <= ${Box._4}""".stripMargin,
    "q02_spatial_polygon" ->
      // triangle (0.005,0.005) (60.005,0.005) (30.005,40.005): half-plane signs.
      // edge1: y >= 0.005 (horizontal); edge2 right: cross((60.005,0.005)->(30.005,40.005), p) >= 0;
      // edge3 left: cross((30.005,40.005)->(0.005,0.005), p) >= 0
      s"""$pagesCte
         |SELECT doc_id, lon, lat FROM pages
         |WHERE lat >= 0.005
         |  AND (30.005 - 60.005) * (lat - 0.005) - (40.005 - 0.005) * (lon - 60.005) >= 0
         |  AND (0.005 - 30.005) * (lat - 40.005) - (0.005 - 40.005) * (lon - 30.005) >= 0""".stripMargin,
    "q03_st_box" ->
      s"""$eventsCte
         |SELECT event_id, lon, lat, ts FROM ev
         |WHERE lon >= ${Box._1} AND lon <= ${Box._2} AND lat >= ${Box._3} AND lat <= ${Box._4}
         |  AND ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'""".stripMargin,
    "q04_distance_join" ->
      s"""$eventsCte
         |SELECT a.event_id AS a_id, b.event_id AS b_id
         |FROM ev a JOIN ev b ON a.event_id < b.event_id
         |WHERE (a.lon - b.lon) * (a.lon - b.lon) + (a.lat - b.lat) * (a.lat - b.lat) < 1.0""".stripMargin,
    "q05_knn" ->
      s"""$pagesCte
         |SELECT centroid_id, id, rn FROM (
         |  SELECT c.doc_id AS centroid_id, p.doc_id AS id,
         |         ROW_NUMBER() OVER (PARTITION BY c.doc_id ORDER BY
         |           (p.lon - c.lon) * (p.lon - c.lon) + (p.lat - c.lat) * (p.lat - c.lat), p.doc_id) AS rn
         |  FROM pages p CROSS JOIN (SELECT * FROM pages WHERE doc_id % 50 = 0) c
         |) WHERE rn <= 10""".stripMargin,
    "q06_tile_assign" ->
      s"""$pagesCte
         |SELECT doc_id,
         |  CAST(GREATEST(CEIL(((lon + 180) / 360) * 256) - 1, 0) AS BIGINT) AS tx,
         |  CAST(GREATEST(CEIL(((lat + 180) / 360) * 256) - 1, 0) AS BIGINT) AS ty
         |FROM pages""".stripMargin,
    "q07_bbox_stats" ->
      s"""$pagesCte
         |SELECT lang, COUNT(*) AS cnt, MIN(lon) AS min_lon, MAX(lon) AS max_lon,
         |       MIN(lat) AS min_lat, MAX(lat) AS max_lat
         |FROM pages GROUP BY lang""".stripMargin,
    "q08_time_range" ->
      """SELECT event_type, COUNT(*) AS cnt, MIN(ts) AS min_ts, MAX(ts) AS max_ts
        |FROM events GROUP BY event_type""".stripMargin,
    "q09_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 10000.0) AS BIGINT) AS bin, COUNT(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin,
    "q10_dedup_exact" ->
      """SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_id, COUNT(*) AS dup_cnt
        |FROM documents GROUP BY 1""".stripMargin,
    "q11_text_quality" ->
      """SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars,
        |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS n_spaces,
        |  CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT) AS token_est,
        |  CAST((LENGTH(text) - LENGTH(REPLACE(text, 'the', ''))) / 3 AS BIGINT) AS the_cnt
        |FROM documents""".stripMargin,
    "q12_ann_topk" ->
      """WITH quant AS (
        |  SELECT vec_id, [CAST(ROUND(x * 1000) AS BIGINT) FOR x IN embedding] AS v
        |  FROM embeddings
        |), q AS (SELECT vec_id AS q_id, v AS qv FROM quant WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.q_id, b.vec_id,
        |    CAST(list_sum(list_transform(list_zip(q.qv, b.v), t -> t[1] * t[2])) AS DOUBLE) /
        |      SQRT(CAST(list_sum(list_transform(q.qv, x -> x * x)) AS DOUBLE) *
        |           CAST(list_sum(list_transform(b.v, x -> x * x)) AS DOUBLE)) AS cos
        |  FROM quant b CROSS JOIN q
        |)
        |SELECT q_id, vec_id, rn FROM (
        |  SELECT q_id, vec_id, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored
        |) WHERE rn <= 10""".stripMargin,
    "q13_distinct_knn" ->
      s"""$pagesCte
         |SELECT centroid_id, id, rn FROM (
         |  SELECT centroid_id, id,
         |         ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY d2, id) AS rn
         |  FROM (
         |    SELECT c.doc_id AS centroid_id, p.doc_id AS id,
         |           (p.lon - c.lon) * (p.lon - c.lon) + (p.lat - c.lat) * (p.lat - c.lat) AS d2,
         |           ROW_NUMBER() OVER (PARTITION BY p.doc_id ORDER BY
         |             (p.lon - c.lon) * (p.lon - c.lon) + (p.lat - c.lat) * (p.lat - c.lat), c.doc_id) AS cr
         |    FROM pages p CROSS JOIN (SELECT * FROM pages WHERE doc_id % 50 = 0) c
         |  ) WHERE cr = 1
         |) WHERE rn <= 10""".stripMargin,
    "q14_polygon_join" ->
      s"""$pagesCte
         |SELECT p.doc_id, r.region_id
         |FROM pages p
         |JOIN (VALUES ${Tables.regionBoxesSqlValues(40)}) r(region_id, lon_min, lon_max, lat_min, lat_max)
         |  ON p.lon >= r.lon_min AND p.lon <= r.lon_max
         | AND p.lat >= r.lat_min AND p.lat <= r.lat_max""".stripMargin,
    "q15_knn_ring" ->
      s"""$pagesCte
         |SELECT q_id, id, rn FROM (
         |  SELECT q.doc_id AS q_id, p.doc_id AS id,
         |         ROW_NUMBER() OVER (PARTITION BY q.doc_id ORDER BY
         |           (p.lon - q.lon) * (p.lon - q.lon) + (p.lat - q.lat) * (p.lat - q.lat), p.doc_id) AS rn
         |  FROM pages p CROSS JOIN (SELECT * FROM pages WHERE doc_id % 97 = 0) q
         |) WHERE rn <= 10""".stripMargin,
  )
}
