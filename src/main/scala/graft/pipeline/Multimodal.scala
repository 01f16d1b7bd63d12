package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media (image/audio/video) live as opaque
  * `binary` columns with typed metadata structs; decode / feature-extraction
  * runs per-partition in typed JVM code over batches.
  *
  * The actual codec step is a STUB (no media libraries in this environment):
  * [[FakeMediaCodec.decode]] is a deterministic fake that derives "frames"
  * from the payload bytes. Everything around it — the binary column schema,
  * the metadata struct, the partition-parallel batch shape, the typed
  * mapPartitions signature — is the real 100 TB plumbing: payloads never pass
  * through the driver, partitions process independently, and the decode
  * amortizes any per-batch model/codec init across its partition.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (schema: binary + struct). */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], fmt: String)

  /** Extracted features per media object. */
  final case class MediaFeatures(doc_id: Long, byte_len: Long, n_frames: Long)

  /** STUB codec: a real implementation would decode image/audio frames here.
    * Deterministic fake: frame count derived from payload length (256-byte
    * "frames"), so results are reproducible and oracle-checkable.
    */
  object FakeMediaCodec {
    val FrameBytes = 256
    def decode(r: MediaRow): MediaFeatures =
      MediaFeatures(r.doc_id, r.payload.length.toLong,
        r.payload.length.toLong / FrameBytes + 1L)
  }

  /** Build a multimodal table from `documents` (text bytes stand in for media
    * payloads), then run the partition-parallel decode.
    */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("fmt"))
      .as[MediaRow]
    // mapPartitions: codec init happens once per partition, not per row —
    // the shape a real (libjpeg/ffmpeg) decode needs.
    media.mapPartitions { rows =>
      val codec = FakeMediaCodec
      rows.map(codec.decode)
    }.toDF()
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_decode" -> ((s: SparkSession, d: String) => decodeFeatures(s, d)),
  )

  /** The fake decode is arithmetic on byte length — expressible in SQL, so the
    * full binary-column pipeline is oracle-checked end to end.
    */
  val oracles: Map[String, String] = Map(
    "q41_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(octet_length(encode(text)) // 256 + 1 AS BIGINT) AS n_frames
        |FROM documents""".stripMargin,
  )
}
