package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The reference's flat-file geo format plugins re-expressed as declarative
 * line parsers — GDELT (extensions/formats/gdelt/.../GDELTUtils.java:39-180,
 * GDELTIngestPlugin.java:150-240), GeoLife
 * (extensions/formats/geolife/.../GeoLifeIngestPlugin.java:180-240) and
 * T-Drive (extensions/formats/tdrive/.../TdriveIngestPlugin.java:110-130,
 * TdriveUtils.java:26-40). Each takes a frame of raw LINES (or whole
 * documents for GeoLife's per-file PLT layout) and yields the typed
 * feature frame; malformed rows drop exactly where the reference's
 * catch-and-continue loops drop them (expressed as try_-family nulls +
 * filters, so the plan stays codegen'd and scan-parallel).
 */
object FlatGeoSource {

  // try_element_at, not element_at: ANSI mode throws on out-of-bounds
  // indices, and Catalyst may evaluate a projection expression on rows a
  // sibling filter would have dropped — null-then-filter is the safe shape
  private def at(v: Column, zeroBased: Int): Column =
    try_element_at(v, lit(zeroBased + 1))

  /**
   * GDELT event lines (tab-separated, 57 or 58 columns). Reference rules:
   * wrong column count → skip; actionGeoType (col 49) unparseable or 0
   * (no geo) → skip; empty/unparseable action lat/lon (cols 53/54) →
   * skip; timestamp = col 1 as yyyyMMdd. `extended` adds the
   * actor/country/mentions/tone attribute set; the source URL (col 57)
   * exists only on 58-column lines.
   */
  def gdeltEvents(lines: DataFrame, lineCol: String,
                  extended: Boolean = false): DataFrame = {
    val v = split(col(lineCol), "\t", -1)
    val base = lines.select(v.as("v"))
      .where(size(col("v")) >= 57 && size(col("v")) <= 58)
      .where(try_element_at(col("v"), lit(50)).try_cast("int").isNotNull &&
        try_element_at(col("v"), lit(50)).try_cast("int") =!= 0)
      .withColumn("lat", at(col("v"), 53).try_cast("double"))
      .withColumn("lon", at(col("v"), 54).try_cast("double"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
      .withColumn("eventid", at(col("v"), 0).try_cast("int"))
      .withColumn("ts",
        try_to_timestamp(at(col("v"), 1), lit("yyyyMMdd")).cast("date"))
      .where(col("eventid").isNotNull && col("ts").isNotNull)
    val core = base.select(col("eventid"), col("ts"), col("lat"), col("lon"),
      col("v"))
    val out =
      if (!extended) core.drop("v")
      else core.select(
        col("eventid"), col("ts"), col("lat"), col("lon"),
        at(col("v"), 6).as("actor1"),
        at(col("v"), 16).as("actor2"),
        at(col("v"), 51).as("action_country"),
        at(col("v"), 31).try_cast("int").as("n_mentions"),
        at(col("v"), 32).try_cast("int").as("n_sources"),
        at(col("v"), 33).try_cast("int").as("n_articles"),
        at(col("v"), 34).try_cast("double").as("avg_tone"),
        when(size(col("v")) === 58, at(col("v"), 57)).as("source_url"))
    out
  }

  /**
   * GeoLife PLT documents: 6 header lines, then
   * `lat,lon,0,altitude,days,date,time` records; timestamp parses from
   * "date time" as yyyy-MM-dd HH:mm:ss. One point row per record, with
   * the 1-based in-file sequence (the reference's per-file point id).
   */
  def geolifePoints(docs: DataFrame, fileCol: String, contentCol: String): DataFrame =
    docs.select(col(fileCol).as("file_id"),
        posexplode(split(col(contentCol), "\n")).as(Seq("i", "line")))
      .where(col("i") >= 6 && length(trim(col("line"))) > 0)
      .select(col("file_id"), (col("i") - 5).as("seq"),
        split(col("line"), ",", -1).as("v"))
      .where(size(col("v")) >= 7)
      .select(col("file_id"), col("seq"),
        at(col("v"), 0).try_cast("double").as("lat"),
        at(col("v"), 1).try_cast("double").as("lon"),
        at(col("v"), 3).try_cast("double").as("altitude"),
        try_to_timestamp(concat(at(col("v"), 5), lit(" "), at(col("v"), 6)),
          lit("yyyy-MM-dd HH:mm:ss")).as("ts"))
      .where(col("lat").isNotNull && col("lon").isNotNull)

  /** GeoLife per-file trajectory: the reference's geolifetrack feature —
    * point count, time bounds, duration, ordered path arrays. */
  def geolifeTracks(docs: DataFrame, fileCol: String, contentCol: String): DataFrame =
    geolifePoints(docs, fileCol, contentCol)
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_points"),
        min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"),
        (unix_millis(max(col("ts"))) - unix_millis(min(col("ts")))).as("duration_ms"),
        transform(array_sort(collect_list(struct(col("seq"), col("lon"), col("lat")))),
          s => s.getField("lon")).as("lons"),
        transform(array_sort(collect_list(struct(col("seq"), col("lon"), col("lat")))),
          s => s.getField("lat")).as("lats"))

  /**
   * T-Drive taxi lines: `taxiid,datetime,lon,lat`. The reference keeps a
   * row whose datetime fails to parse (it only logs) — mirrored here as
   * a null ts; rows with unparseable id/coordinates drop (the outer
   * catch-and-continue).
   */
  def tdrivePoints(lines: DataFrame, lineCol: String): DataFrame = {
    val v = split(col(lineCol), ",", -1)
    lines.select(v.as("v"))
      .where(size(col("v")) >= 4)
      .select(
        at(col("v"), 0).try_cast("int").as("taxi_id"),
        try_to_timestamp(at(col("v"), 1), lit("yyyy-MM-dd HH:mm:ss")).as("ts"),
        at(col("v"), 2).try_cast("double").as("lon"),
        at(col("v"), 3).try_cast("double").as("lat"))
      .where(col("taxi_id").isNotNull && col("lon").isNotNull && col("lat").isNotNull)
  }
}
