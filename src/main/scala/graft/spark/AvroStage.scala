package graft.spark

import java.io.ByteArrayInputStream
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Avro whole-file staging — the reference's HDFS staging format
 * (core/ingest/src/main/avro/wholefile.avsc: record WholeFile
 * {originalFile: bytes, originalFilePath: string|null}, written through
 * DataFileWriter in StageToHdfsDriver.java:47), implemented on the Avro
 * CORE library that ships with Spark (no spark-avro DataSource needed):
 * each task writes one Avro container file through the Hadoop FileSystem
 * API (works on local paths and HDFS alike); reading goes through Spark's
 * `binaryFile` source + DataFileStream, so the scan parallelizes per
 * container file.
 */
object AvroStage {

  /** the reference's wholefile.avsc, field-for-field. */
  val WholeFileSchemaJson: String =
    """{"type":"record","name":"WholeFile","namespace":"graft.avro","fields":[
      |{"name":"originalFile","type":"bytes"},
      |{"name":"originalFilePath","type":["string","null"]}]}""".stripMargin

  /** stage (path, content) rows into one Avro container file per
    * partition under `outDir`; returns the number of records written. */
  def stageToAvro(df: DataFrame, pathCol: String, contentCol: String,
                  outDir: String): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val hadoopConfBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    val counts = df.select(col(pathCol), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val schema = new Schema.Parser().parse(WholeFileSchemaJson)
          val fsPath = new org.apache.hadoop.fs.Path(outDir, f"stage-$pid%05d.avro")
          val fs = fsPath.getFileSystem(hadoopConfBc.value.value)
          val out = fs.create(fsPath, true)
          val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
          var n = 0L
          try {
            writer.create(schema, out)
            it.foreach { case (p, bytes) =>
              val rec = new GenericData.Record(schema)
              rec.put("originalFile", java.nio.ByteBuffer.wrap(bytes))
              rec.put("originalFilePath", p)
              writer.append(rec)
              n += 1
            }
          } finally writer.close() // no stream leak on mid-partition failure
          Iterator.single(n)
        }
      }.collect()
    counts.sum
  }

  /** read staged containers back as (path, content) — one input split per
    * container file via the binaryFile source. */
  def readStaged(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$dir/*.avro")
      .select(col("content"))
      .as[Array[Byte]]
      .flatMap { containerBytes =>
        val reader = new DataFileStream[GenericRecord](
          new ByteArrayInputStream(containerBytes),
          new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
        while (reader.hasNext) {
          val rec = reader.next()
          val buf = rec.get("originalFile").asInstanceOf[java.nio.ByteBuffer]
          val bytes = new Array[Byte](buf.remaining())
          buf.get(bytes)
          val p = Option(rec.get("originalFilePath")).map(_.toString).orNull
          out += ((p, bytes))
        }
        reader.close()
        out
      }
      .toDF("path", "content")
  }
}
