package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video ride along as opaque
 * `binary` payloads with typed metadata; decode / feature-extract /
 * resize / frame-sample run as batched per-partition transforms over the
 * payload bytes.
 *
 * The actual media codecs are STUBBED (this container ships no image or
 * audio libraries): [[StubExtractor]] derives deterministic pseudo-features
 * from the raw bytes. The Spark-side contract — schema, batch shape,
 * partition-local execution, explode of per-frame rows — is real and
 * tested; swapping in a true decoder is a one-class change.
 */
object Multimodal {

  /** per-payload features; `vec` stands in for an embedding. */
  final case class MediaFeatures(id: Long, nBytes: Long, headByte: Int,
                                 checksum: Long, vec: Array[Float])

  /** batched payload → features transform; the stub derives everything
    * from the bytes so results are deterministic and portable. */
  trait FeatureExtractor extends Serializable {
    def extract(id: Long, payload: Array[Byte]): MediaFeatures
  }

  /** STUB decode: portable-hash checksum (fold of byte values mod 2^31-1,
    * matching TextOps.portableHash on ASCII payloads) + an 8-dim fake
    * embedding from byte samples. Replace with a real codec off-sandbox. */
  object StubExtractor extends FeatureExtractor {
    override def extract(id: Long, payload: Array[Byte]): MediaFeatures = {
      var acc = 0L
      var i = 0
      while (i < payload.length) { acc = (acc * 31 + (payload(i) & 0xff)) % TextOps.P; i += 1 }
      val vec = Array.tabulate(8) { d =>
        if (payload.isEmpty) 0f
        else (payload(d * payload.length / 8) & 0xff).toFloat / 255f
      }
      MediaFeatures(id, payload.length.toLong,
        if (payload.isEmpty) -1 else payload(0) & 0xff, acc, vec)
    }
  }

  /** payload column → feature rows, batched per partition (the
    * mapInPandas-shaped plumbing, JVM-native). */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
                      extractor: FeatureExtractor = StubExtractor): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, p) => extractor.extract(id, p) } }
  }

  /** video frame sampling: one row per sampled frame index (every
    * `stride`-th of `nFrames`), with a stub frame checksum derived from
    * (payload, frameIdx). Plumbing = explode + per-row transform. */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
                   nFramesCol: String, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol),
        col(nFramesCol).cast("int"))
      .as[(Long, Array[Byte], Int)]
      .flatMap { case (id, p, n) =>
        (0 until n by stride).map { f =>
          // STUB frame decode: checksum of payload bytes rotated by frame idx
          var acc = f.toLong
          var i = 0
          while (i < p.length) { acc = (acc * 31 + (p((i + f) % p.length) & 0xff)) % TextOps.P; i += 1 }
          (id, f, acc)
        }
      }
      .toDF("id", "frame_idx", "frame_checksum")
  }

  /** resize stub: deterministic byte subsample of the payload to a fixed
    * `outBytes`-sized tile (nearest-index sampling — the shape a real
    * bilinear resize would have). */
  def resizePayload(df: DataFrame, idCol: String, payloadCol: String,
                    outBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .map { case (id, p) =>
        val out =
          if (p.isEmpty) Array.emptyByteArray
          else Array.tabulate(outBytes)(i => p((i.toLong * p.length / outBytes).toInt))
        (id, out)
      }
      .toDF("id", "tile")
  }
}
