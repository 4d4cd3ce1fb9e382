package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PackingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("distributed running total equals the sequential one across many partitions") {
    val n = 10000
    val df = (0 until n).map(i => (i.toLong, (i % 7 + 1).toLong)).toDF("id", "v")
    val out = Packing.withRunningTotal(df, "id", "v", "cum")
      .orderBy("id").collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("cum")))
    var acc = 0L
    (0 until n).foreach { i =>
      acc += (i % 7 + 1).toLong
      assert(out(i) == (i.toLong, acc), s"mismatch at $i")
    }
  }

  test("running total never funnels the data through one partition") {
    val df = (0 until 5000).map(i => (i.toLong, 1L)).toDF("id", "v")
    val out = Packing.withRunningTotal(df, "id", "v", "cum")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window would collapse to one partition:\n$plan")
  }

  test("concatChunk: chunk of first token, contiguous offsets, capacity respected") {
    val df = Seq((0L, 100L), (1L, 300L), (2L, 200L), (3L, 50L), (4L, 500L))
      .toDF("id", "tok")
    val out = Packing.concatChunk(df, "id", "tok", chunkTokens = 512)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("stream_offset"), r.getAs[Long]("chunk_id")))
    // offsets: 0, 100, 400, 600, 650 -> chunks 0,0,0,1,1
    assert(out.toSeq == Seq((0L, 0L, 0L), (1L, 100L, 0L), (2L, 400L, 0L),
      (3L, 600L, 1L), (4L, 650L, 1L)))
  }
}
