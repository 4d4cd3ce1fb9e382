package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{NearDup, TextOps}

/** Throwaway exploration main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(col("doc_id"), col("text"))
    val planted = d.unionAll(d.withColumn("doc_id", col("doc_id") + lit(10000000L)))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs (n=$n)")
    }

    time("count")(planted.count())
    time("tokens only")(planted.select(TextOps.tokens(col("text")).as("t")).selectExpr("size(t) n").agg(sum("n")).count())
    time("shingles only")(planted.select(TextOps.shingles(col("text"), 3).as("s")).selectExpr("size(s) n").agg(sum("n")).count())
    time("shingles+minhash") {
      planted.select(col("doc_id"), TextOps.shingles(col("text"), 3).as("sh"))
        .select(NearDup.minhashSignature(col("sh"), 64).as("sig"))
        .selectExpr("size(sig) n").agg(sum("n")).count()
    }
    import graft.functions.SketchFunctions
    val withBands = planted
      .select(col("doc_id").as("__id"),
        SketchFunctions.minhashBands(TextOps.shingles(col("text"), 3), 64, 16).as("__bands"))
      .select(col("__id"), posexplode(col("__bands")).as(Seq("__band", "__bucket")))
    val bandsOnly = planted.select(col("doc_id").as("__id"),
      SketchFunctions.minhashBands(TextOps.shingles(col("text"), 3), 64, 16).as("__bands"))
    time("bandsOnly")(bandsOnly.selectExpr("size(__bands) n").agg(sum("n")).count())
    time("bandsOnly collect")(bandsOnly.count())
    time("withBands")(withBands.count())
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
    time("withBands noInfer")(withBands.count())
    spark.conf.unset("spark.sql.optimizer.excludedRules")
    val bucketed = withBands.groupBy("__band", "__bucket").agg(collect_list(col("__id")).as("__ids"))
      .filter(size(col("__ids")) > 1 && size(col("__ids")) <= 1000)
    time("bucketed")(bucketed.count())
    time("candidates")(NearDup.minhashCandidates(planted).count())
    time("full dup pairs")(NearDup.minhashDupPairs(planted, threshold = 0.9).count())
    NearDup.minhashCandidates(planted).explain(true)
    spark.stop()
  }
}
