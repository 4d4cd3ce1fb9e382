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

  /** Decode media headers into the typed metadata struct — executor-side
    * mapPartitions, one "codec context" per partition (the stub's context
    * is trivial; a real codec would open/close a native handle here).
    */
  def decodeMeta(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("decoded_meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("payload_bytes", IntegerType)))))
    val idx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // per-partition codec context would be opened here
      rows.map { r =>
        val bytes = r.get(idx).asInstanceOf[Array[Byte]]
        val meta = FakeCodec.decodeHeader(bytes) match {
          case Some(h) => Row(h.format, h.width, h.height, h.nFrames, bytes.length - h.payloadOffset)
          case None => null
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Byte-histogram features (REAL computation, not stubbed): 256-bin
    * histogram pooled to `dims` normalized buckets — a cheap
    * content-sensitive embedding for dedup/clustering of blobs.
    */
  def byteHistogramFeatures(df: DataFrame, mediaCol: String = "media", dims: Int = 16): DataFrame = {
    require(256 % dims == 0, "dims must divide 256")
    val idx = df.schema.fieldIndex(mediaCol)
    val schema = StructType(df.schema.fields :+ StructField("features", ArrayType(FloatType), nullable = true))
    val rdd = df.rdd.mapPartitions { rows =>
      val binSize = 256 / dims
      rows.map { r =>
        val bytes = r.get(idx).asInstanceOf[Array[Byte]]
        val feat = if (bytes == null) null else {
          val hist = new Array[Int](dims)
          var i = 0
          while (i < bytes.length) { hist((bytes(i) & 0xff) / binSize) += 1; i += 1 }
          val n = math.max(1, bytes.length).toFloat
          hist.map(_ / n)
        }
        Row.fromSeq(r.toSeq :+ (if (feat == null) null else feat.toSeq))
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** STUB resize: re-encodes the container with new dimensions and a
    * deterministically subsampled payload (a real impl calls the codec).
    */
  def resizeStub(df: DataFrame, newWidth: Int, newHeight: Int, mediaCol: String = "media"): DataFrame = {
    val idx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(idx).asInstanceOf[Array[Byte]]
        val resized = FakeCodec.decodeHeader(bytes) match {
          case Some(h) =>
            val payload = bytes.drop(h.payloadOffset)
            val keep = math.max(1, payload.length * (newWidth.toLong * newHeight) /
              math.max(1L, h.width.toLong * h.height)).toInt
            val sub = Array.tabulate(math.min(keep, payload.length))(i =>
              payload(i * payload.length / math.max(1, math.min(keep, payload.length))))
            FakeCodec.encode(0, newWidth, newHeight, h.nFrames, sub)
          case None => bytes
        }
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }
    df.sparkSession.createDataFrame(rdd, df.schema)
  }

  /** Frame sampling for video blobs: emits every `stride`-th frame as its
    * own row (frame payloads are equal slices of the container payload —
    * the stub's notion of frames; a real impl asks the demuxer).
    */
  def sampleFrames(df: DataFrame, stride: Int, idCol: String = "media_id",
      mediaCol: String = "media"): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val mIdx = df.schema.fieldIndex(mediaCol)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_index", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(idIdx)
        val bytes = r.get(mIdx).asInstanceOf[Array[Byte]]
        FakeCodec.decodeHeader(bytes) match {
          case Some(h) if h.nFrames > 0 =>
            val payload = bytes.drop(h.payloadOffset)
            val frameSize = math.max(1, payload.length / h.nFrames)
            (0 until h.nFrames by stride).map { f =>
              val start = f * frameSize
              Row(id, f, payload.slice(start, math.min(start + frameSize, payload.length)))
            }
          case _ => Seq.empty
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** Repartition a media table so each partition holds ~`targetBytes` of
    * blob data — avoids task skew when blob sizes vary wildly.
    */
  def repartitionBySize(df: DataFrame, targetBytes: Long, mediaCol: String = "media"): DataFrame = {
    val sized = df.withColumn("__sz", when(col(mediaCol).isNull, 0L).otherwise(length(col(mediaCol)).cast(LongType)))
    val total = sized.agg(sum(col("__sz"))).collect()(0).getLong(0)
    val parts = math.max(1, math.min(100000, (total / math.max(1L, targetBytes)).toInt + 1))
    sized.repartition(parts).drop("__sz")
  }
}
