package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ext.Multimodal
import graft.ext.Multimodal.FakeCodec
import graft.streaming.StreamOps
import graft.tables.TxTable

/** Throwaway exploration main (not part of the library surface): drives
  * the multimodal + streaming modules end-to-end through their public API.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import scala.jdk.CollectionConverters._

    // --- multimodal pipeline: synthesize blobs -> decode -> features -> frames
    val rows = (1L to 6L).map { i =>
      val payload = Array.tabulate(120 * i.toInt)(j => ((i * 7 + j) % 256).toByte)
      Row(i, FakeCodec.encode((i % 3).toInt, 320, 240, 12, payload), null)
    }
    val media = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    val decoded = Multimodal.decodeMeta(media)
    println("[demo] decoded meta:")
    decoded.select(col("media_id"), col("decoded_meta.*")).show(3, false)
    val feats = Multimodal.byteHistogramFeatures(media, dims = 8)
    println("[demo] feature dims: " + feats.select("features").first().getSeq[Float](0).length)
    val frames = Multimodal.sampleFrames(media, stride = 4)
    println("[demo] sampled frames: " + frames.count() + " (expect 6 media x 3 frames)")

    // --- streaming: parquet drop -> Tx table sink
    val srcDir = java.nio.file.Files.createTempDirectory("ev").toString
    val tbl = java.nio.file.Files.createTempDirectory("tx").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("ck").toString
    Seq((1L, 86400L * 1000000000L, 7L, "click", 1.5, "{}"),
        (2L, 86460L * 1000000000L, 7L, "purchase", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(srcDir + "/drop1")
    val q = StreamOps.writeToTxTable(
      StreamOps.eventFileStream(spark, srcDir + "/*").drop("props"),
      tbl, ckpt, Trigger.AvailableNow())
    q.awaitTermination(60000)
    println("[demo] tx table rows from stream:")
    TxTable.forLocation(spark, tbl).toDF.orderBy("event_id").show(false)
    spark.stop()
  }
}
