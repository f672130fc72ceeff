package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads ride as opaque `binary`
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The decode kernel is a clearly-marked DETERMINISTIC STUB (no image/audio
  * libraries ship in this environment — SURVEY/driver contract); everything
  * around it — binary schema, batch iteration via mapPartitions, typed
  * output rows, partition-level parallelism — is the real plumbing a codec
  * would plug into. At 100 TB the mapPartitions boundary is where a native
  * decoder (JNI/FFI) amortizes per-batch setup.
  */
object Multimodal {

  /** Typed result of the (stub) media decode. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      f0: Long, f1: Long, f2: Long, f3: Long)

  /** STUB decoder: deterministic pseudo-metadata from the payload bytes.
    * A real implementation would parse the container header and run a
    * decoder here; per-partition batching (Iterator in/out) is already the
    * right shape for that.
    */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length.toLong
    def b(i: Int): Long = if (n > i) (bytes(i) & 0xffL) else 0L
    MediaFeatures(
      doc_id = id,
      n_bytes = n,
      width = 64 + n % 576,
      height = 64 + (n * 7) % 416,
      f0 = b(0), f1 = b(1), f2 = b(2), f3 = b(3))
  }

  /** Batch feature extraction over a binary payload column. */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // real decoders initialize once per partition here
        batch.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /** Deterministic "frame sampler": every `stride`-th byte of the payload as
    * a frame checksum — models audio/video frame sampling over a binary
    * blob, batched per partition like [[extractFeatures]].
    */
  def sampleFrames(df: DataFrame, idCol: String, payloadCol: String,
      stride: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, (0 until bytes.length by stride).map(i => bytes(i) & 0xff).toSeq)
      })
      .toDF(idCol, "frames")
  }
}
