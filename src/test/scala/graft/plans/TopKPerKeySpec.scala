package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKPerKeySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("results match the window row_number formulation exactly") {
    val custom = TopK.topKPerKey(li, Seq("l_suppkey"),
      Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toSeq).toSet

    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    val reference = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .collect().map(_.toSeq).toSet

    assert(custom == reference)
    assert(custom.size == 30) // 10 suppliers x top 3
  }

  test("physical plan uses the custom execs with no Sort operator") {
    val df = TopK.topKPerKey(li, Seq("l_suppkey"), Seq(("l_extendedprice", false)), 3)
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalTopK"), plan)
    assert(plan.contains("PartialTopK"), plan)
    assert(!plan.contains("Sort "), s"no sort expected:\n$plan")
    // partial pass runs before the exchange (map-side top-k)
    val partialIdx = plan.indexOf("PartialTopK")
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"partial should be below the exchange in the plan tree:\n$plan")
  }

  test("key cardinality far above the retained-row bound still yields exact results (flush + spill path)") {
    import spark.implicits._
    // 20k distinct keys x 4 rows, bound of 512 retained rows: the partial
    // pass flushes dozens of times and the final pass overflows into the
    // external-sort spill — results must still match the window plan
    val df = (0 until 80000).map(i => (i % 20000, i / 20000, (i * 2654435761L) % 1000))
      .toDF("key", "seq", "score")
    val custom = TopK.topKPerKey(df, Seq("key"), Seq(("score", false), ("seq", true)), 2,
        maxRetainedRows = 512)
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("key")).orderBy(col("score").desc, col("seq"))
    val reference = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .drop("rn").collect().map(_.toSeq).toSet
    assert(custom == reference)
    assert(custom.size == 40000) // 20k keys x top 2
  }

  test("works on string keys and composes with filters") {
    val top = TopK.topKPerKey(li.filter(col("l_quantity") > 10),
      Seq("l_returnflag", "l_linestatus"), Seq(("l_quantity", false), ("l_orderkey", true)), 2)
    val grouped = top.groupBy("l_returnflag", "l_linestatus").count().collect()
    assert(grouped.forall(_.getLong(2) <= 2))
    assert(top.count() == grouped.map(_.getLong(2)).sum)
  }
}
