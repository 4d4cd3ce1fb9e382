package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries against
  * sys.env("SPARK_GRAFT_SF_DIR") and prints one JSON line.
  *
  * Each query is fully materialized through the `noop` sink (so projections
  * and windows are actually computed, unlike a `count()` which Catalyst can
  * prune to a scan). Best-of-2 per query: the first pass pays JIT/codegen
  * warmup, the second measures steady-state — closer to the per-query cost
  * a long-running cluster job would see.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.headlineQueries.map { q =>
      val a = timeOnce(q.fn)
      System.err.println(f"[bench] ${q.name} pass1 $a%.2fs")
      val b = timeOnce(q.fn)
      System.err.println(f"[bench] ${q.name} pass2 $b%.2fs")
      val best = if (a < 0 || b < 0) -1.0 else math.min(a, b)
      q.name -> best
    }

    // Skew demo (diagnostic; NOT in the headline total): the q77 hot-key
    // join amplified 20x, with auto-broadcast disabled to model a dim
    // table too large to broadcast at production scale (locally customer
    // always broadcasts, which would hide the skew entirely). AQE stays
    // ON — its skew-join split is the fair baseline the salted plan
    // competes with; both numbers are reported as measured.
    val (skewNaive, skewSalted) = {
      import org.apache.spark.sql.functions._
      val key = "spark.sql.autoBroadcastJoinThreshold"
      val prev = spark.conf.get(key)
      spark.conf.set(key, "-1")
      try {
        def skewed = graft.queries.Tables.events(spark, sfDir)
          .withColumn("rep", explode(sequence(lit(1), lit(20))))
          .withColumn("hot_key",
            when(pmod(col("user_id"), lit(10)) < 8, lit(1L)).otherwise(col("user_id")))
        val dim = graft.queries.Tables.customer(spark, sfDir)
          .select(col("c_custkey").as("hot_key"), col("c_mktsegment"))
        def run(df: => org.apache.spark.sql.DataFrame): Double = {
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        def naive = skewed.join(dim, Seq("hot_key"))
          .groupBy("c_mktsegment").agg(sum("value"))
        def salted = graft.ext.Skew.saltedJoin(skewed, dim, Seq("hot_key"), salts = cpus.toInt)
          .groupBy("c_mktsegment").agg(sum("value"))
        val n1 = run(naive); val s1 = run(salted)
        val n2 = run(naive); val s2 = run(salted)
        System.err.println(f"[bench] skew_demo naive ${math.min(n1, n2)}%.2fs salted ${math.min(s1, s2)}%.2fs")
        (math.min(n1, n2), math.min(s1, s2))
      } finally spark.conf.set(key, prev)
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""skew_demo":{"naive_sec":$skewNaive,"salted_sec":$skewSalted},"sf":"$sfDir"}""")
    spark.stop()
  }
}
