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
    * partition under `outDir`; returns the number of records written.
    *
    * Commit protocol: `outDir` must hold no previous stage files (a stale
    * `stage-*.avro` from an earlier run with more partitions would be
    * double-read by [[readStaged]]), and each task writes to a dot-hidden
    * temp name and renames into place only after a clean close — a failed
    * or straggling speculative attempt leaves only a temp file behind
    * (rename-if-absent: the second attempt to finish fails its rename
    * instead of corrupting the committed file). */
  def stageToAvro(df: DataFrame, pathCol: String, contentCol: String,
                  outDir: String): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val outFs = outPath.getFileSystem(hadoopConf)
    if (outFs.exists(outPath)) {
      val stale = outFs.globStatus(new org.apache.hadoop.fs.Path(outDir, "stage-*.avro"))
      require(stale == null || stale.isEmpty,
        s"stageToAvro: $outDir already holds ${if (stale == null) 0 else stale.length} stage-*.avro " +
          "files from a previous run; stage into an empty directory (stale files would be double-read)")
    }
    val hadoopConfBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
    val counts = df.select(col(pathCol), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
          val schema = new Schema.Parser().parse(WholeFileSchemaJson)
          val fs0 = new org.apache.hadoop.fs.Path(outDir)
            .getFileSystem(hadoopConfBc.value.value)
          val tmpPath = new org.apache.hadoop.fs.Path(outDir, f".stage-$pid%05d-$attempt.avro.tmp")
          val finalPath = new org.apache.hadoop.fs.Path(outDir, f"stage-$pid%05d.avro")
          val out = fs0.create(tmpPath, true)
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
          // commit: rename succeeds for exactly one attempt per partition.
          // A failed rename with the destination PRESENT means another
          // attempt of this same deterministic partition already committed
          // identical content — that is success, not an error (throwing
          // here would make a task retry after a lost-but-committed
          // attempt unrecoverable: every retry re-fails the rename).
          // CONTRACT: the input partitioning must be deterministic (no
          // sample()/unstable repartition upstream) — the returned count
          // is this attempt's n, which equals the committed file's only
          // under that determinism. That contract is ENFORCED here
          // cheaply: a lost-race attempt compares its tmp file's length
          // against the committed file before discarding it (identical
          // records ⇒ identical container length — the random sync marker
          // is fixed-width), so a nondeterministic upstream fails loudly
          // instead of silently reporting a count the committed bytes
          // don't hold.
          if (!fs0.rename(tmpPath, finalPath)) {
            if (!fs0.exists(finalPath)) {
              fs0.delete(tmpPath, false)
              throw new java.io.IOException(
                s"stageToAvro: commit rename failed with no committed file for partition $pid")
            }
            val tmpLen = fs0.getFileStatus(tmpPath).getLen
            val committedLen = fs0.getFileStatus(finalPath).getLen
            fs0.delete(tmpPath, false)
            if (tmpLen != committedLen)
              throw new java.io.IOException(
                s"stageToAvro: partition $pid lost the commit race to an attempt with " +
                  s"DIFFERENT content ($committedLen committed bytes vs $tmpLen staged) — " +
                  "the input partitioning is nondeterministic; stage from a deterministic plan")
          }
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
