package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Trained-weight classifier scoring: the user-supplied-vector overload,
  * the weights-from-table loader, and the plan shape (map-only, one fused
  * generate — same contract PlanQualitySpec pins for the pseudo-model).
  */
class ClassifierSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bucket(tok: String): Int = {
    var h = 0L
    var j = 0
    while (j < tok.length) { h = (h * 31L + tok.charAt(j).toLong) % 1048576L; j += 1 }
    h.toInt
  }

  test("classifierScore with an explicit weight vector computes the dot product") {
    val w = new Array[Float](ClassifierScoreGen.NumBuckets)
    w(bucket("good")) = 1.5f
    w(bucket("bad")) = -2.0f
    val df = Seq((1L, "good good bad"), (2L, "bad"), (3L, "")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextNativeFunctions.classifierScore(col("text"), w)
          .as(Seq("n_tokens", "raw_score", "score", "keep")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
    assert(out(0) == ((1L, 3L, 1.0, 1.0 / 3.0, true)))   // 1.5 + 1.5 - 2.0
    assert(out(1) == ((2L, 1L, -2.0, -2.0, false)))
    assert(out(2) == ((3L, 0L, 0.0, 0.0, false)))
  }

  test("weight vectors of the wrong dimensionality are rejected") {
    intercept[IllegalArgumentException] {
      TextNativeFunctions.classifierScore(lit("x"), Array(1.0f, 2.0f))
    }
  }

  test("classifierWeightsFromTable loads a sparse (bucket, weight) table densely") {
    val sparse = Seq((bucket("spark"), 0.25f), (bucket("noise"), -0.5f))
      .toDF("bucket", "weight")
    val w = TextNativeFunctions.classifierWeightsFromTable(sparse)
    assert(w(bucket("spark")) == 0.25f)
    assert(w(bucket("noise")) == -0.5f)
    assert(w(bucket("unseen")) == 0.0f)

    val df = Seq((1L, "spark noise noise"), (2L, "unseen")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextNativeFunctions.classifierScore(col("text"), w)
          .as(Seq("n_tokens", "raw_score", "score", "keep")))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(4)))
    assert(out(0) == ((1L, 0.25 - 0.5 - 0.5, false)))
    assert(out(1) == ((2L, 0.0, false)))

    intercept[IllegalArgumentException] {
      TextNativeFunctions.classifierWeightsFromTable(
        Seq((ClassifierScoreGen.NumBuckets, 1.0f)).toDF("bucket", "weight"))
    }
  }

  test("trained-weight scoring stays map-only: no shuffle, one generate pass") {
    val w = new Array[Float](ClassifierScoreGen.NumBuckets)
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val scored = df.select(col("doc_id"),
      TextNativeFunctions.classifierScore(col("text"), w)
        .as(Seq("n_tokens", "raw_score", "score", "keep")))
    val exec = scored.queryExecution.executedPlan
    assert(exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"trained classifier scoring must be map-only\n$exec")
    assert(exec.collect {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.size == 1, s"expected one fused generate pass\n$exec")
  }
}
