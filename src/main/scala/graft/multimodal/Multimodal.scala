package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side shape is real and tested — binary columns, explicit
  * metadata schema, partition-aligned batched processing via
  * mapPartitions over an iterator (the JVM analog of an arrow-batched
  * decode UDF) — while the actual media decode is a STUB: this container
  * has no image/audio codecs, so [[stubDecode]] derives deterministic fake
  * dimensions/features from the bytes. Swap `decodeBatch` for a real codec
  * binding at deploy time; nothing else changes.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Wraps a documents-like table into a media table: payload bytes +
    * metadata struct. (In production the binary column comes off parquet
    * as-is; here text bytes stand in for an encoded image.) */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      col("source"))

  /** STUB decode: deterministic fake dimensions derived from payload size
    * (`???`-grade placeholder for a codec call — see object docs). Pure
    * column expressions so the "decode" stays codegen'd and distributed. */
  def stubDecode(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("meta", struct(
        lit("image/fake").as("media_type"),
        col("n_bytes"),
        (lit(64) + pmod(col("n_bytes"), lit(512)).cast("int")).as("width"),
        (lit(64) + pmod(col("n_bytes") * 7, lit(512)).cast("int")).as("height"),
        (lit(1) + pmod(col("n_bytes"), lit(16)).cast("int")).as("n_frames")))

  /** Row-level decoded feature record produced by the batched stage. */
  case class MediaFeature(media_id: Long, n_bytes: Long, mean_byte: Double,
                          width: Int, height: Int)

  /** Batched per-partition feature extraction — the mapPartitions shape a
    * real decoder plugs into (amortizes codec init per partition, streams
    * the iterator, never collects). The "feature" here is a byte-level
    * stat standing in for pixel features. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val out = media.select("media_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init would open the codec once here
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toLong).sum.toDouble / n
          MediaFeature(id, n, mean, 64 + (n % 512).toInt, 64 + (n * 7 % 512).toInt)
        }
      }
    out.toDF()
  }

  /** Resize stub: rescales the decoded metadata to a bounding box
    * preserving aspect ratio (integer math only); payload passes through
    * untouched — a real codec would transcode here. The column shape
    * (struct rewrite, no row explosion) is what matters. */
  def resizeStub(decoded: DataFrame, maxDim: Int): DataFrame = {
    val w = col("meta.width")
    val h = col("meta.height")
    val longest = greatest(w, h)
    val scaleNum = lit(maxDim)
    val newW = when(longest <= maxDim, w)
      .otherwise((w * scaleNum / longest).cast("int"))
    val newH = when(longest <= maxDim, h)
      .otherwise((h * scaleNum / longest).cast("int"))
    decoded.withColumn("meta", struct(
      col("meta.media_type").as("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      newW.as("width"),
      newH.as("height"),
      col("meta.n_frames").as("n_frames")))
  }

  /** Frame-sampling stub: every k-th frame index of an n_frames payload —
    * the explode shape of video frame extraction. */
  def sampleFrames(decoded: DataFrame, every: Int): DataFrame =
    decoded.select(
      col("media_id"),
      explode(sequence(lit(0), col("meta.n_frames") - 1, lit(every))).as("frame_idx"))
}
