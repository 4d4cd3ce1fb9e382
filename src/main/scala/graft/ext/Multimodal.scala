package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media as opaque `binary` columns + a typed metadata struct, with
  * decode / feature-extraction / resize / frame-sampling operators.
  *
  * CODEC STUBS: this container has no image/audio codecs, so the
  * decode/resize kernels are clearly-marked deterministic fakes operating
  * on a synthetic header layout (see FakeCodec). Everything Spark-side is
  * real and load-bearing: the schema contract, executor-side batch
  * processing via mapPartitions (one codec context per partition, the
  * same shape a JNI/FFmpeg binding needs), size-aware repartitioning, and
  * feature extraction (byte histograms — a real computation).
  *
  * Scale posture: media bytes never hit the driver; per-partition codec
  * contexts amortize init; `repartitionBySize` packs small blobs and
  * isolates huge ones so task skew stays bounded when blob sizes span
  * KB..GB.
  */
object Multimodal {

  /** Canonical media-table schema: (id, media, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))), nullable = true)))

  /** STUB codec: a deterministic fake media container.
    * Layout: 4-byte magic "GFTM" | u8 format | u16 width | u16 height |
    * u16 nFrames | payload bytes. A real deployment swaps these three
    * functions for JNI/FFI codec calls; nothing else changes.
    */
  object FakeCodec {
    val Magic: Array[Byte] = "GFTM".getBytes("UTF-8")
    val formats: Map[Int, String] = Map(0 -> "image", 1 -> "audio", 2 -> "video")

    def encode(format: Int, width: Int, height: Int, nFrames: Int, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](Magic.length + 7 + payload.length)
      System.arraycopy(Magic, 0, out, 0, Magic.length)
      out(4) = format.toByte
      out(5) = (width & 0xff).toByte; out(6) = ((width >> 8) & 0xff).toByte
      out(7) = (height & 0xff).toByte; out(8) = ((height >> 8) & 0xff).toByte
      out(9) = (nFrames & 0xff).toByte; out(10) = ((nFrames >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 11, payload.length)
      out
    }

    final case class Header(format: String, width: Int, height: Int, nFrames: Int, payloadOffset: Int)

    def decodeHeader(bytes: Array[Byte]): Option[Header] = {
      if (bytes == null || bytes.length < 11) return None
      if (!Magic.indices.forall(i => bytes(i) == Magic(i))) return None
      Some(Header(
        formats.getOrElse(bytes(4).toInt, "unknown"),
        (bytes(5) & 0xff) | ((bytes(6) & 0xff) << 8),
        (bytes(7) & 0xff) | ((bytes(8) & 0xff) << 8),
        (bytes(9) & 0xff) | ((bytes(10) & 0xff) << 8),
        11))
    }
  }

  /** Decode media headers into the typed metadata struct — a native
    * Catalyst expression (one static kernel call inside WholeStageCodegen;
    * the round-1 df.rdd.mapPartitions formulation re-encoded every row and
    * broke codegen). A real codec swaps the kernel body for a JNI call.
    */
  def decodeMeta(df: DataFrame, mediaCol: String = "media"): DataFrame =
    df.withColumn("decoded_meta", graft.functions.MediaFunctions.decodeMediaHeader(col(mediaCol)))

  /** Byte-histogram features (REAL computation, not stubbed): 256-bin
    * histogram pooled to `dims` normalized buckets — a cheap
    * content-sensitive embedding for dedup/clustering of blobs. Native
    * expression; the histogram loop runs inside codegen.
    */
  def byteHistogramFeatures(df: DataFrame, mediaCol: String = "media", dims: Int = 16): DataFrame =
    df.withColumn("features", graft.functions.MediaFunctions.byteHistogram(col(mediaCol), dims))

  /** STUB resize: re-encodes the container with new dimensions and a
    * deterministically subsampled payload (a real impl calls the codec).
    */
  def resizeStub(df: DataFrame, newWidth: Int, newHeight: Int, mediaCol: String = "media"): DataFrame =
    df.withColumn(mediaCol, graft.functions.MediaFunctions.resizeMedia(col(mediaCol), newWidth, newHeight))

  /** Frame sampling for video blobs: emits every `stride`-th frame as its
    * own row (frame payloads are equal slices of the container payload —
    * the stub's notion of frames; a real impl asks the demuxer). A native
    * Generator — one container parse per input row, planned as a Generate
    * node (no RDD round-trip).
    */
  def sampleFrames(df: DataFrame, stride: Int, idCol: String = "media_id",
      mediaCol: String = "media"): DataFrame =
    df.select(col(idCol).as("media_id"),
      graft.functions.MediaFunctions.frameSample(col(mediaCol), stride)
        .as(Seq("frame_index", "frame")))

  /** Repartition a media table so each partition holds ~`targetBytes` of
    * blob data. Genuinely size-aware (a round-robin `repartition(n)` would
    * still land a 1 GB blob next to others): a distributed byte prefix sum
    * over the stable `orderCol` (Packing.withRunningTotal — two-phase, no
    * single-task window) assigns each blob the bucket holding its FIRST
    * byte, so a bucket carries at most `targetBytes` plus the one blob
    * straddling its boundary, and a giant blob strands the buckets it
    * spans empty — it sits alone. Buckets map to partitions through an
    * IDENTITY partitioner: hash-repartitioning on the bucket id would
    * collide buckets and re-create exactly the skew this operator removes.
    * (The one deliberate RDD hop in this module — Spark's public API has
    * no identity partitioning for DataFrames; this is a terminal layout
    * op, so no Catalyst lineage is lost that a shuffle wouldn't lose.)
    */
  def repartitionBySize(df: DataFrame, targetBytes: Long, mediaCol: String = "media",
      orderCol: String = "media_id"): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sized = df.withColumn("__sz",
      when(col(mediaCol).isNull, 0L).otherwise(length(col(mediaCol)).cast(LongType)))
    val bucketed = Packing.withRunningTotal(sized, orderCol, "__sz", "__cum")
      .withColumn("__bucket", expr(s"(__cum - __sz) div ${targetBytes}L").cast(IntegerType))
    val maxB = bucketed.agg(max(col("__bucket"))).collect()(0)
    if (maxB.isNullAt(0)) return df // empty input
    val n = maxB.getInt(0) + 1
    val schema = bucketed.schema
    val idx = schema.fieldIndex("__bucket")
    val parted = bucketed.rdd
      .map(r => (r.getInt(idx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = n
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    df.sparkSession.createDataFrame(parted, schema).drop("__sz", "__cum", "__bucket")
  }
}
