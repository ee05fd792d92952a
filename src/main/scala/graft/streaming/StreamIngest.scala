package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.spark.GeoFunctions._

/**
 * Structured Streaming ingest — the Spark-native form of the reference's
 * Kafka ingest path (core/ingest/kafka/IngestFromKafkaDriver.java →
 * normal encode+write), which has no stream windows of its own (SURVEY
 * §2.9). We add the standard streaming semantics the reference lacks:
 * watermarked tumbling-window aggregation over the event time.
 *
 * Exactly-once resumability comes from the sink checkpoint (the
 * streaming twin of Ingest's per-bucket lineage): a restarted query
 * continues from the committed offsets.
 */
object StreamIngest {

  /** the per-record encode, shared with the batch path: SFC cell id +
    * single-tier tile coordinates. */
  def encode(df: DataFrame, bits: Int): DataFrame =
    df.withColumn("cell_id", gw_cell_id(col("lon"), col("lat")))
      .withColumn("tx", gw_tile_x(col("lon"), bits))
      .withColumn("ty", gw_tile_y(col("lat"), bits))

  /** file-source stream → encode → parquet sink, processing everything
    * currently available and stopping (Trigger.AvailableNow). Re-running
    * with the same checkpoint skips already-committed files. */
  def runFileIngest(spark: SparkSession, inputDir: String,
                    schema: org.apache.spark.sql.types.StructType,
                    addGeo: DataFrame => DataFrame,
                    outDir: String, checkpointDir: String, bits: Int): Unit = {
    val in = spark.readStream.schema(schema).parquet(inputDir)
    val enc = encode(addGeo(in), bits)
    val q = enc.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** running per-tile event counts with custom state — a
    * KeyValueGroupedDataset.mapGroupsWithState operator (arbitrary state
    * the reference's ingest-time statistics callbacks approximate): state
    * survives across micro-batches, every batch emits the updated total. */
  def runningTileCounts(stream: DataFrame, bits: Int)
      : org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = stream.sparkSession
    import spark.implicits._
    encode(stream, bits)
      .select(col("tx") * (1L << bits) + col("ty"))
      .as[Long]
      .groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tile: Long, events: Iterator[Long], state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + events.size
          state.update(total)
          (tile, total)
      }
  }

  /** streaming spatial enrichment: every streaming point tagged with the
    * region(s) containing it — the stream-static form of the
    * point-in-polygon join (stateless: polygons ride inside the broadcast
    * expression, so it runs per micro-batch with no stream state at all;
    * the streaming twin of SpatialJoin.polygonJoin). */
  def enrichWithRegions(stream: DataFrame,
                        regions: Seq[(String, org.locationtech.jts.geom.Geometry)]): DataFrame =
    graft.spark.SpatialJoin.polygonJoin(stream, regions)

  /** streaming exact dedup — the streaming twin of Ops.exactDedup: rows
    * whose content hash was already seen within the watermark horizon are
    * dropped. `dropDuplicatesWithinWatermark` evicts state older than the
    * watermark, so state size is bounded by the dedup horizon, not the
    * stream length — the property that makes ingest-time dedup viable on
    * an unbounded crawl feed. */
  def dedupedStream(stream: DataFrame, tsCol: String, textCol: String,
                    watermarkDelay: String): DataFrame =
    stream
      .withColumn("text_md5", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("text_md5")

  /** watermarked tumbling-window per-tile counts (event-time semantics the
    * reference's temporal binning approximates at the index layer). */
  def windowedTileCounts(stream: DataFrame, tsCol: String, bits: Int,
                         windowDur: String, watermarkDelay: String): DataFrame =
    encode(stream, bits)
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col("tx"), col("ty"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("tx"), col("ty"), col("cnt"))
}
