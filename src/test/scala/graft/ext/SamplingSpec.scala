package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = (0L until 10000L).map(i => (i, if (i % 3 == 0) "en" else "xx"))
    .toDF("id", "lang")

  test("hashSample is deterministic across repartitionings and ~proportional") {
    val a = Sampling.hashSample(docs, "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(17), "id", 0.2).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "selection must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 200, s"~20% expected, got ${a.size}")
    // nested property: a 10% sample is a subset of a 20% sample
    val c = Sampling.hashSample(docs, "id", 0.1).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a), "smaller fractions must nest inside larger ones")
  }

  test("stratifiedSample applies per-stratum fractions") {
    val out = Sampling.stratifiedSample(docs, "lang", "id",
      Map("en" -> 1.0), defaultFraction = 0.0)
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == Set("en"))
    assert(out.count() == docs.filter($"lang" === "en").count())
  }
}
