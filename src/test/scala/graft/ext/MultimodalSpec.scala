package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ext.Multimodal.FakeCodec

class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def mediaDf = {
    import scala.jdk.CollectionConverters._
    val rows = (1L to 20L).map { i =>
      val payload = Array.tabulate(100 * i.toInt)(j => ((i * 31 + j) % 256).toByte)
      val fmt = (i % 3).toInt
      Row(i, FakeCodec.encode(fmt, 64 * i.toInt, 48, 10, payload), null)
    }
    spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
  }

  test("decodeMeta parses headers executor-side") {
    val out = Multimodal.decodeMeta(mediaDf)
    val metas = out.select(col("media_id"), col("decoded_meta.*")).orderBy("media_id").collect()
    assert(metas.length == 20)
    assert(metas(0).getString(1) == "audio") // id 1 -> format 1
    assert(metas(0).getInt(2) == 64)
    assert(metas(0).getInt(3) == 48)
    assert(metas(0).getInt(5) == 100) // payload bytes
    assert(metas(2).getString(1) == "image") // id 3 -> format 0
  }

  test("byteHistogramFeatures: real normalized histograms") {
    val out = Multimodal.byteHistogramFeatures(mediaDf, dims = 16)
    val feats = out.select("features").collect().map(_.getSeq[Float](0))
    assert(feats.forall(_.length == 16))
    feats.foreach { f =>
      val s = f.sum
      assert(math.abs(s - 1.0f) < 0.15f, s"histogram should roughly normalize, got $s")
    }
    // deterministic
    val feats2 = Multimodal.byteHistogramFeatures(mediaDf, dims = 16)
      .select("features").collect().map(_.getSeq[Float](0))
    assert(feats.toSeq == feats2.toSeq)
  }

  test("resizeStub rewrites dimensions and shrinks payload") {
    val out = Multimodal.decodeMeta(Multimodal.resizeStub(mediaDf, 32, 24))
    val metas = out.select(col("media_id"), col("decoded_meta.*")).orderBy("media_id").collect()
    assert(metas.forall(_.getInt(2) == 32))
    assert(metas.forall(_.getInt(3) == 24))
  }

  test("sampleFrames emits every stride-th frame with correct slicing") {
    val out = Multimodal.sampleFrames(mediaDf, stride = 2)
    val byId = out.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.values.forall(_ == 5)) // 10 frames, stride 2
    val frames = out.filter(col("media_id") === 2L).orderBy("frame_index").collect()
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.get(2).asInstanceOf[Array[Byte]].length == 20)) // 200/10
  }

  test("repartitionBySize bounds partitions by blob volume") {
    val out = Multimodal.repartitionBySize(mediaDf, targetBytes = 2000)
    assert(out.rdd.getNumPartitions > 1)
    assert(out.count() == 20)
  }

  test("repartitionBySize is size-aware: max partition bytes <= 2x target on a skewed fixture") {
    import scala.jdk.CollectionConverters._
    val target = 50000L
    // skewed sizes: many tiny blobs + several just under the target —
    // round-robin would mix them arbitrarily; size packing must not
    val sizes = (1L to 60L).map(i => if (i % 7 == 0) 40000 else 500)
    val rows = sizes.zipWithIndex.map { case (sz, i) =>
      Row(i.toLong, Array.fill(sz)((i % 127).toByte), null)
    }
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema).repartition(5)
    val out = Multimodal.repartitionBySize(df, target)
    assert(out.count() == 60)
    val perPart = out
      .withColumn("__p", spark_partition_id())
      .withColumn("__sz", length(col("media")).cast("long"))
      .groupBy("__p").agg(sum("__sz").as("bytes"))
      .collect().map(_.getLong(1))
    assert(perPart.forall(_ <= 2 * target),
      s"partition bytes exceed 2x target: ${perPart.mkString(",")}")
    // the prefix-sum layout also packs: far fewer partitions than blobs
    assert(out.rdd.getNumPartitions < 20)
  }

  test("repartitionBySize isolates a giant blob in its own partition") {
    import scala.jdk.CollectionConverters._
    val target = 10000L
    val rows = (0L until 20L).map { i =>
      val sz = if (i == 7L) 120000 else 800 // one blob 12x the target
      Row(i, Array.fill(sz)((i % 127).toByte), null)
    }
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema).repartition(3)
    val out = Multimodal.repartitionBySize(df, target)
    val withPart = out.withColumn("__p", spark_partition_id())
    val giantPart = withPart.filter(length(col("media")) > 100000)
      .select("__p").collect().map(_.getInt(0)).toSeq
    assert(giantPart.size == 1)
    // the invariant: a bucket holds at most `target` bytes BESIDES the one
    // blob that starts in it — so the giant's partition carries no more
    // than target extra, and every blob AFTER the giant skips past it
    val extras = withPart.filter(col("__p") === giantPart.head)
      .filter(length(col("media")) <= 100000)
      .agg(coalesce(sum(length(col("media")).cast("long")), lit(0L))).collect()(0).getLong(0)
    assert(extras <= target, s"giant's partition carries $extras extra bytes")
    val afterGiant = withPart.filter(col("media_id") > 7L)
      .select("__p").distinct().collect().map(_.getInt(0)).toSet
    assert(!afterGiant.contains(giantPart.head),
      "blobs ordered after the giant must land in later partitions")
  }
}
