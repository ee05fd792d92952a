package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table derivations over the driver-provided parquet. The geo columns are
 * pure integer-arithmetic functions of the row id, so a DuckDB oracle can
 * derive the exact same doubles (no RNG, no floats until one final division).
 */
object Tables {

  /** Common-Crawl-style pages view over `documents`: deterministic lon/lat
    * per doc_id. lon in [-180, 179.99], lat in [-85, 84.99], 0.01° grid. */
  def pages(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("lon", ((col("doc_id") * col("doc_id") * 3L + col("doc_id") * 7919L) % 36000L) / 100.0 - 180.0)
      .withColumn("lat", ((col("doc_id") * col("doc_id") * 7L + col("doc_id") * 104729L) % 17000L) / 100.0 - 85.0)

  /** SQL fragment deriving the same lon/lat in DuckDB. */
  val pagesLonSql = "((doc_id * doc_id * 3 + doc_id * 7919) % 36000) / 100.0 - 180.0"
  val pagesLatSql = "((doc_id * doc_id * 7 + doc_id * 104729) % 17000) / 100.0 - 85.0"

  /** geo events view over `events`: deterministic lon/lat per event_id,
    * native timestamps. */
  def geoEvents(spark: SparkSession, sfDir: String): DataFrame =
    addEventGeo(spark.read.parquet(s"$sfDir/events.parquet"))

  /** the deterministic event geocode, applicable to batch AND streaming
    * frames — the single source of truth for the events lon/lat formula
    * (SQL twins: eventsLonSql/eventsLatSql). */
  def addEventGeo(df: DataFrame): DataFrame =
    df.withColumn("lon", ((col("event_id") * col("event_id") * 3L + col("event_id") * 7919L) % 36000L) / 100.0 - 180.0)
      .withColumn("lat", ((col("event_id") * col("event_id") * 7L + col("event_id") * 104729L) % 17000L) / 100.0 - 85.0)

  val eventsLonSql = "((event_id * event_id * 3 + event_id * 7919) % 36000) / 100.0 - 180.0"
  val eventsLatSql = "((event_id * event_id * 7 + event_id * 104729) % 17000) / 100.0 - 85.0"

  /** deterministic axis-aligned region boxes — the polygon-join dim table
    * (FIXTURES.md §2; sized/placed by integer arithmetic so a SQL oracle
    * can reproduce them as literals). */
  def regionBoxes(n: Int): Seq[(String, Double, Double, Double, Double)] =
    (0 until n).map { i =>
      val lonMin = ((i * 7919) % 300).toDouble - 170.0
      val latMin = ((i * 104729) % 150).toDouble - 80.0
      val w = 6.0 + (i % 7) * 4.0
      val h = 5.0 + (i % 5) * 4.0
      (f"r$i%03d", lonMin, lonMin + w, latMin, latMin + h)
    }

  def regionBoxesSqlValues(n: Int): String =
    regionBoxes(n).map { case (id, a, b, c, d) => s"('$id', $a, $b, $c, $d)" }.mkString(", ")

  def regionGeoms(n: Int): Seq[(String, org.locationtech.jts.geom.Geometry)] = {
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    regionBoxes(n).map { case (id, lonMin, lonMax, latMin, latMax) =>
      (id, gf.createPolygon(Array(
        new org.locationtech.jts.geom.Coordinate(lonMin, latMin),
        new org.locationtech.jts.geom.Coordinate(lonMax, latMin),
        new org.locationtech.jts.geom.Coordinate(lonMax, latMax),
        new org.locationtech.jts.geom.Coordinate(lonMin, latMax),
        new org.locationtech.jts.geom.Coordinate(lonMin, latMin))))
    }
  }

  /**
   * Deterministic synthetic document corpus with PLANTED near-duplicates
   * for dedup benchmarks: docs come in groups of 5 sharing 24 group words.
   * Docs 0/1 of each group are 25 words (base + 1 tail word) differing
   * only in that tail, so each has 23 word-3-gram shingles of which 22
   * are shared (only the gram touching the tail differs): Jaccard
   * 22/24 ≈ 0.92 — the true near-dup pair. Docs 2–4 append 24 distinct
   * words each (48 words → 46 shingles), pushing every other within-group
   * pair below a tau=0.5 gate (far↔far 22/70 ≈ 0.31, near↔far
   * 22/47 ≈ 0.47) — so the only true pairs at tau=0.5 are the planted
   * ones. Pure column arithmetic — reproducible, parallel.
   */
  def synthDocs(spark: SparkSession, n: Long): DataFrame = {
    val grp = expr("id DIV 5")
    val member = col("id") % 5
    val base = concat_ws(" ", (0 until 24).map(j =>
      lower(hex(xxhash64(grp, lit(j))))): _*)
    val nearTail = concat(lit(" tail"), (col("id") % 2).cast("string"))
    val farTail = concat_ws(" ", (0 until 24).map(j =>
      lower(hex(xxhash64(col("id"), lit(100 + j))))): _*)
    spark.range(n)
      .withColumn("text",
        when(member < 2, concat(base, nearTail))
          .otherwise(concat(base, lit(" "), farTail)))
      .withColumnRenamed("id", "doc_id")
      .select("doc_id", "text")
  }

  /**
   * Deterministic synthetic Common-Crawl-style pages table for benchmarks
   * (FIXTURES.md §1): 80% of points in 20 Gaussian-ish city clusters (hot
   * cells for skew), 20% uniform, ~1% hugging the antimeridian/poles.
   * Pure column arithmetic over `spark.range(n)` — no RNG state, fully
   * reproducible and generated in parallel.
   */
  def synthPages(spark: SparkSession, n: Long): DataFrame = {
    // deterministic 64-bit mix of the row id (xxhash64 of the id column)
    def h(seed: Int) = abs(xxhash64(col("id"), lit(seed)))
    val clusterLon = Array.tabulate(20)(i => ((i * 7919) % 360).toDouble - 180.0 + 0.5)
    val clusterLat = Array.tabulate(20)(i => ((i * 104729) % 170).toDouble - 85.0 + 0.5)
    val cLon = array(clusterLon.map(lit): _*)
    val cLat = array(clusterLat.map(lit): _*)
    val sel = h(1) % 100 // 0..79 cluster, 80..98 uniform, 99 dateline/pole
    val cluster = (h(2) % 20).cast("int")
    val jLon = (h(3) % 20000L) / 100000.0 - 0.1 // +-0.1 deg jitter
    val jLat = (h(4) % 20000L) / 100000.0 - 0.1
    val uLon = (h(5) % 3600000L) / 10000.0 - 180.0
    val uLat = (h(6) % 1700000L) / 10000.0 - 85.0
    val edgeLon = when(h(7) % 2 === 0, lit(179.5) + (h(8) % 10000L) / 20000.0)
      .otherwise(lit(-180.0) + (h(8) % 10000L) / 20000.0)
    val edgeLat = when(h(9) % 2 === 0, lit(89.5) + (h(10) % 10000L) / 20000.0)
      .otherwise(lit(-90.0) + (h(10) % 10000L) / 20000.0)
    spark.range(n)
      .withColumn("url", concat(lit("https://host-"), format_string("%06d", col("id") % 100000L),
        lit(".example/"), lower(hex(xxhash64(col("id"), lit(0))))))
      .withColumn("warc_ts", timestamp_seconds(lit(1293840000L) + (h(11) % (3L * 365 * 86400)))) // 2011-2013
      .withColumn("lon",
        when(sel < 80, element_at(cLon, cluster + 1) + jLon)
          .when(sel < 99, uLon)
          .otherwise(edgeLon))
      .withColumn("lat",
        when(sel < 80, element_at(cLat, cluster + 1) + jLat)
          .when(sel < 99, uLat)
          .otherwise(edgeLat))
      .withColumn("lang", element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"), lit("zh")),
        (h(12) % 5).cast("int") + 1))
      .withColumn("text", concat(lit("page text "), lower(hex(xxhash64(col("id"), lit(13))))))
      .withColumn("html", to_binary(concat(lit("3c68746d6c3e"), lower(hex(xxhash64(col("id"), lit(14))))), lit("hex")))
      .withColumnRenamed("id", "doc_id")
  }
}
