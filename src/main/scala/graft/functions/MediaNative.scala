package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the multimodal (binary media) operators — called
  * from generated code so the header parse / histogram loops stay inside
  * WholeStageCodegen instead of bouncing rows through an RDD
  * (the round-1 formulation used df.rdd.mapPartitions + createDataFrame,
  * which re-encodes every row and kills codegen).
  *
  * The media container format is the FakeCodec stub layout
  * (graft.ext.Multimodal.FakeCodec): 4-byte magic "GFTM" | u8 format |
  * u16 width | u16 height | u16 nFrames | payload. Real deployments swap
  * the byte-level parse for a JNI codec call; the expression shape
  * (binary in, struct/array out, null on undecodable) is unchanged.
  */
object MediaKernels {
  private val Magic = Array[Byte]('G', 'F', 'T', 'M')
  val HeaderLen = 11

  private val FormatNames: Array[UTF8String] =
    Array(UTF8String.fromString("image"), UTF8String.fromString("audio"),
      UTF8String.fromString("video"))
  private val UnknownFormat = UTF8String.fromString("unknown")

  @inline private def hasMagic(b: Array[Byte]): Boolean =
    b.length >= HeaderLen && b(0) == Magic(0) && b(1) == Magic(1) &&
      b(2) == Magic(2) && b(3) == Magic(3)

  /** binary → struct(format, width, height, n_frames, payload_bytes),
    * or null when the blob is not a valid container.
    */
  def decodeHeader(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || !hasMagic(bytes)) return null
    val fmt = bytes(4).toInt
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      if (fmt >= 0 && fmt < FormatNames.length) FormatNames(fmt) else UnknownFormat,
      (bytes(5) & 0xff) | ((bytes(6) & 0xff) << 8),
      (bytes(7) & 0xff) | ((bytes(8) & 0xff) << 8),
      (bytes(9) & 0xff) | ((bytes(10) & 0xff) << 8),
      bytes.length - HeaderLen))
  }

  /** binary → `dims` pooled, normalized byte-histogram buckets (a cheap
    * content-sensitive embedding over the whole blob).
    */
  def byteHistogram(bytes: Array[Byte], dims: Int): ArrayData = {
    if (bytes == null) return null
    val binSize = 256 / dims
    val hist = new Array[Int](dims)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) / binSize) += 1; i += 1 }
    val n = math.max(1, bytes.length).toFloat
    val out = new Array[Any](dims)
    i = 0
    while (i < dims) { out(i) = hist(i) / n; i += 1 }
    new GenericArrayData(out)
  }

  /** Stub resize: re-encode with new dimensions and a deterministically
    * subsampled payload. Returns the input unchanged when undecodable.
    */
  def resize(bytes: Array[Byte], newWidth: Int, newHeight: Int): Array[Byte] = {
    if (bytes == null || !hasMagic(bytes)) return bytes
    val w = (bytes(5) & 0xff) | ((bytes(6) & 0xff) << 8)
    val h = (bytes(7) & 0xff) | ((bytes(8) & 0xff) << 8)
    val nFrames = (bytes(9) & 0xff) | ((bytes(10) & 0xff) << 8)
    val payloadLen = bytes.length - HeaderLen
    val keep = math.max(1L, payloadLen.toLong * (newWidth.toLong * newHeight) /
      math.max(1L, w.toLong * h)).toInt
    val outLen = math.min(keep, payloadLen)
    val out = new Array[Byte](HeaderLen + outLen)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = 0.toByte
    out(5) = (newWidth & 0xff).toByte; out(6) = ((newWidth >> 8) & 0xff).toByte
    out(7) = (newHeight & 0xff).toByte; out(8) = ((newHeight >> 8) & 0xff).toByte
    out(9) = (nFrames & 0xff).toByte; out(10) = ((nFrames >> 8) & 0xff).toByte
    var i = 0
    while (i < outLen) {
      out(HeaderLen + i) = bytes(HeaderLen + i.toLong.toInt * payloadLen / math.max(1, outLen))
      i += 1
    }
    out
  }
}

/** binary media → struct(format, width, height, n_frames, payload_bytes);
  * null for undecodable blobs. Codegen is a single static kernel call.
  */
case class DecodeMediaHeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecodeMediaHeaderExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaKernels.decodeHeader(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaKernels.decodeHeader($c);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "decode_media_header"
}

object DecodeMediaHeaderExpr {
  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("payload_bytes", IntegerType)))
}

/** binary media → array<float> pooled byte histogram (`dims` buckets). */
case class ByteHistogramExpr(child: Expression, dims: Int) extends UnaryExpression {
  require(dims > 0 && 256 % dims == 0, "dims must divide 256")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaKernels.byteHistogram(input.asInstanceOf[Array[Byte]], dims)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.byteHistogram($c, $dims)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "byte_histogram"
}

/** binary media → resized binary media (stub re-encode; see MediaKernels.resize). */
case class ResizeMediaExpr(child: Expression, newWidth: Int, newHeight: Int)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MediaKernels.resize(input.asInstanceOf[Array[Byte]], newWidth, newHeight)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode):
      org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MediaKernels.resize($c, $newWidth, $newHeight)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "resize_media"
}

/** Generator: video blob → one (frame_index, frame) row per `stride`-th
  * frame (frames are equal payload slices in the stub container; a real
  * impl asks the demuxer). A Generator keeps the explode inside the plan
  * (Generate node) with one container parse per input row.
  */
case class FrameSampleGen(child: Expression, stride: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {
  require(stride > 0, "stride must be positive")

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)

  override def elementSchema: StructType = StructType(Seq(
    StructField("frame_index", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null) return Nil
    val hdr = MediaKernels.decodeHeader(bytes)
    if (hdr == null) return Nil
    val nFrames = hdr.getInt(3)
    if (nFrames <= 0) return Nil
    val payloadLen = bytes.length - MediaKernels.HeaderLen
    val frameSize = math.max(1, payloadLen / nFrames)
    (0 until nFrames by stride).map { f =>
      val start = MediaKernels.HeaderLen + f * frameSize
      val end = math.min(start + frameSize, bytes.length)
      val frame = java.util.Arrays.copyOfRange(bytes, math.min(start, bytes.length), end)
      InternalRow(f, frame)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "frame_sample"
}

/** Column-API wrappers. */
object MediaFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

  def decodeMediaHeader(media: Column): Column = toCol(DecodeMediaHeaderExpr(toExpr(media)))

  def byteHistogram(media: Column, dims: Int): Column =
    toCol(ByteHistogramExpr(toExpr(media), dims))

  def resizeMedia(media: Column, newWidth: Int, newHeight: Int): Column =
    toCol(ResizeMediaExpr(toExpr(media), newWidth, newHeight))

  def frameSample(media: Column, stride: Int): Column =
    toCol(FrameSampleGen(toExpr(media), stride))
}
