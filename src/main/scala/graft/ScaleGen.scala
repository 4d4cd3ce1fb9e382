package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic larger-SF fixture generator for LOCAL scale checks:
  * K key-shifted replicas of an existing fixture directory (default
  * sf0.1 × 10 ≈ sf1: 6M lineitem, 1.5M orders, 1M events, 50k docs,
  * 20k embeddings).
  *
  * Replication shifts the ENTITY keys (orderkey, event/user ids,
  * doc/vec ids) per replica so fact tables, user populations, and
  * document corpora grow 10× while the dimension tables stay fixed —
  * the shape that stresses scan/shuffle/join scaling without inventing
  * a new distribution. It is a plan-scaling instrument, not a
  * statistically fresh dataset: values within a replica are the
  * driver's original synthetic rows (TESTDATA.md, seed=42).
  *
  *   runMain graft.ScaleGen [srcDir] [outDir] [k]
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "/tmp/graft-sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      System.err.println(s"[scalegen] wrote $t")
    }

    val reps = broadcast(spark.range(k).select(col("id").as("__rep")))
    /** K replicas with each key column shifted by replica*(max+1) so
      * key spaces stay disjoint and join fan-outs keep their per-key
      * cardinality.
      */
    def amplify(df: DataFrame, shifted: Seq[String]): DataFrame = {
      val offsets = shifted.map { c =>
        c -> (df.agg(max(col(c))).collect()(0).getLong(0) + 1L)
      }
      offsets.foldLeft(df.crossJoin(reps)) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + col("__rep") * off)
      }.drop("__rep")
    }

    wr(amplify(rd("lineitem"), Seq("l_orderkey")), "lineitem")
    wr(amplify(rd("orders"), Seq("o_orderkey")), "orders")
    wr(amplify(rd("events"), Seq("event_id", "user_id")), "events")
    wr(amplify(rd("documents"), Seq("doc_id")), "documents")
    wr(amplify(rd("embeddings"), Seq("vec_id")), "embeddings")
    // boilerplate-skewed documents: the SAME 16-token header (two aligned
    // 8-token segments) prefixes EVERY document, so the hottest segment
    // in segment-level dedup has |documents| copies (500k at k=10) — the
    // corpus shape (license blocks, nav bars) that would OOM a
    // window-based keep-first in one reducer and must instead collapse
    // map-side under the partial-aggregating groupBy
    // (NearDup.dedupSegments). ExtOpsSpec pins the semantics; ScaleCheck
    // times it here at size.
    val boiler = "terms of service apply to all content here " +
      "copyright holder reserves all rights not granted herein"
    wr(amplify(rd("documents"), Seq("doc_id"))
        .withColumn("text", concat(lit(boiler + " "), col("text"))),
      "documents_boiler")
    // dimensions stay fixed — fact-side growth against stable dims is
    // the broadcast-join shape the bench queries are designed around
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => wr(rd(t), t))
    spark.stop()
  }
}
