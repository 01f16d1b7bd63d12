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

  /** Sampled-frame features: every `SampleStride`-th frame's leading byte
    * summed — the shape of "sample every Nth video frame, featurize it".
    */
  final case class SampledFrames(doc_id: Long, n_sampled: Long, checksum: Long)

  /** STUB codec: a real implementation would decode image/audio frames here.
    * Deterministic fake: frame count derived from payload length (256-byte
    * "frames"), so results are reproducible and oracle-checkable.
    */
  object FakeMediaCodec {
    val FrameBytes = 256
    def decode(r: MediaRow): MediaFeatures =
      MediaFeatures(r.doc_id, r.payload.length.toLong,
        r.payload.length.toLong / FrameBytes + 1L)

    /** Frame sampling: visit frames 0, 2, 4, … (64-byte frames) and take each
      * sampled frame's first byte as its stand-in "feature". A frame whose
      * start lies past the payload (the +1 tail frame) contributes 0 — kept in
      * the sample count, as a real sampler would keep a short tail frame.
      */
    val SampleFrameBytes = 64
    val SampleStride = 2
    def sampleFrames(r: MediaRow): SampledFrames = {
      val len = r.payload.length
      val nFrames = len / SampleFrameBytes + 1
      var fi = 0; var n = 0L; var sum = 0L
      while (fi < nFrames) {
        val start = fi * SampleFrameBytes
        n += 1
        if (start < len) sum += (r.payload(start) & 0xff).toLong
        fi += SampleStride
      }
      SampledFrames(r.doc_id, n, sum)
    }
  }

  /** Windowed features per media object (the audio-feature shape: fixed
    * windows over the sample stream, one feature per window, summarized).
    */
  final case class WindowedFeatures(doc_id: Long, n_windows: Long,
                                    max_win_energy: Long, total_energy: Long)

  /** STUB feature extraction: 128-byte windows over the payload; a window's
    * "energy" is the sum of its unsigned byte values (a real extractor would
    * compute RMS/MFCC per window — same access pattern, float math instead).
    * Integer arithmetic keeps the oracle exact.
    */
  def windowFeatures(r: MediaRow, windowBytes: Int = 128): WindowedFeatures = {
    val len = r.payload.length
    val nWin = (len + windowBytes - 1) / windowBytes
    var w = 0; var maxE = 0L; var total = 0L
    while (w < nWin) {
      var i = w * windowBytes
      val end = math.min(i + windowBytes, len)
      var e = 0L
      while (i < end) { e += (r.payload(i) & 0xff).toLong; i += 1 }
      if (e > maxE) maxE = e
      total += e
      w += 1
    }
    WindowedFeatures(r.doc_id, nWin.toLong, maxE, total)
  }

  /** Nearest-neighbor "resized" media: fixed-size byte thumbnail. */
  final case class ResizedMedia(doc_id: Long, orig_len: Long, resized_len: Int,
                                resized_md5: String)

  /** STUB resize: nearest-neighbor downsample of the payload to `target`
    * bytes (sample i reads byte floor(i·len/target)) — the index arithmetic
    * of a real image resize, one dimension instead of two. Emits the md5 of
    * the thumbnail, not the bytes, to keep results compact and checkable.
    */
  def resizeTo(r: MediaRow, target: Int): ResizedMedia = {
    val len = r.payload.length
    val out = new Array[Byte](target)
    var i = 0
    while (i < target) {
      out(i) = r.payload((i.toLong * len / target).toInt)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5").digest(out)
    ResizedMedia(r.doc_id, len.toLong, target,
      md.map(b => f"$b%02x").mkString)
  }

  /** Build a multimodal table from `documents` (text bytes stand in for media
    * payloads), then run the partition-parallel decode.
    */
  private def mediaTable(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("text/plain").as("fmt"))
      .as[MediaRow]
  }

  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // mapPartitions: codec init happens once per partition, not per row —
    // the shape a real (libjpeg/ffmpeg) decode needs.
    mediaTable(spark, dir).mapPartitions { rows =>
      val codec = FakeMediaCodec
      rows.map(codec.decode)
    }.toDF()
  }

  /** Frame sampling over the binary column — same partition-parallel batch
    * shape as [[decodeFeatures]]; payloads never visit the driver.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      val codec = FakeMediaCodec
      rows.map(codec.sampleFrames)
    }.toDF()
  }

  /** Resize over the binary column — same partition-parallel shape; the
    * MessageDigest (stand-in for a resize kernel's buffers) inits per row
    * batch, never per driver round-trip.
    */
  def resize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      rows.map(r => resizeTo(r, 16))
    }.toDF()
  }

  /** Windowed feature extraction over the binary column — completes the
    * decode / feature-extract / resize / frame-sample multimodal surface.
    */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      rows.map(r => windowFeatures(r))
    }.toDF()
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_multimodal_decode" -> ((s: SparkSession, d: String) => decodeFeatures(s, d)),
    "q78_frame_sample" -> ((s: SparkSession, d: String) => frameSample(s, d)),
    "q93_media_resize" -> ((s: SparkSession, d: String) => resize(s, d)),
    "q102_media_features" -> ((s: SparkSession, d: String) => mediaFeatures(s, d)),
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
    // The corpus is pure ASCII (verified at ingest), so byte offsets equal
    // character offsets and ascii(substr(..)) reads the frame's first byte;
    // ascii('') = 0 matches the sampler's zero for past-the-end tail frames.
    "q93_media_resize" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
        |s AS (SELECT doc_id, text, len, unnest(generate_series(0, 15)) AS i FROM d)
        |SELECT doc_id, CAST(len AS BIGINT) AS orig_len, 16 AS resized_len,
        |  md5(string_agg(substr(text, (i*len)//16 + 1, 1), '' ORDER BY i)) AS resized_md5
        |FROM s GROUP BY doc_id, len""".stripMargin,
    "q78_frame_sample" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
        |f AS (SELECT doc_id, text, len, len // 64 + 1 AS n_frames FROM d),
        |s AS (SELECT doc_id, text, unnest(generate_series(0, n_frames - 1, 2)) AS fi FROM f)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(sum(ascii(substr(text, CAST(fi*64+1 AS BIGINT), 1))) AS BIGINT) AS checksum
        |FROM s GROUP BY doc_id""".stripMargin,
    // per-byte unnest (ASCII corpus: byte i = char i), window = i // 128
    "q102_media_features" ->
      """WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
        |b AS (SELECT doc_id, unnest(generate_series(1, len)) AS i FROM d),
        |w AS (SELECT b.doc_id, (i - 1) // 128 AS win,
        |        CAST(sum(ascii(substr(d.text, CAST(i AS BIGINT), 1))) AS BIGINT) AS e
        |      FROM b JOIN d USING (doc_id) GROUP BY b.doc_id, win)
        |SELECT doc_id, count(*) AS n_windows, max(e) AS max_win_energy,
        |       CAST(sum(e) AS BIGINT) AS total_energy
        |FROM w GROUP BY doc_id""".stripMargin,
  )
}
