package graft.tables

import org.apache.spark.SparkException
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** CHECK constraints (`delta.constraints.*`) and legacy column invariants
  * (`delta.invariants` field metadata) enforced inside the write job —
  * writer protocol v3 / the `checkConstraints` table feature, which this
  * writer previously honored only by refusal.
  */
class ConstraintsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def good: DataFrame =
    Seq((0L, 10.0, "a"), (1L, 20.0, "b")).toDF("id", "amount", "tag")
  private def bad: DataFrame =
    Seq((2L, -5.0, "c")).toDF("id", "amount", "tag")

  private def violates(body: => Unit): Unit = {
    val e = intercept[Exception](body)
    def mentions(t: Throwable): Boolean =
      t != null && (Option(t.getMessage).exists(_.contains("CHECK constraint")) ||
        mentions(t.getCause))
    assert(mentions(e), s"expected a CHECK-constraint violation, got: $e")
  }

  test("native table: create with a violating row fails; valid rows commit") {
    val loc = TestSpark.tmpDir("cons-native")
    val props = Map("delta.constraints.positive_amount" -> "amount > 0")
    violates(new TxTable(spark, loc).create(good.union(bad), properties = props))
    val t = new TxTable(spark, loc)
    t.create(good, properties = props)
    assert(t.toDF.count() == 2)
    violates(t.append(bad))
    assert(t.toDF.count() == 2) // failed write committed nothing
    t.append(Seq((3L, 30.0, "d")).toDF("id", "amount", "tag"))
    assert(t.toDF.count() == 3)
  }

  test("foreign Delta: constraint tables are writable and enforced, not refused") {
    val loc = TestSpark.tmpDir("cons-delta")
    DeltaLogWriter.create(spark, loc, good,
      properties = Map("delta.constraints.positive_amount" -> "amount > 0"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.append(Seq((4L, 1.5, "e")).toDF("id", "amount", "tag"))
    assert(t.toDF.count() == 3)
    violates(t.append(bad))
    violates(t.overwrite(bad))
    // UPDATE must also satisfy constraints on the post-image
    violates(t.update("id = 0", Map("amount" -> "-1.0")))
    t.update("id = 0", Map("amount" -> "99.0"))
    assert(t.toDF.filter("id = 0").select("amount").as[Double].head() == 99.0)
    // NULL passes (SQL UNKNOWN is not a violation)
    t.append(Seq((Some(5L), Option.empty[Double], Some("f")))
      .toDF("id", "amount", "tag"))
    assert(t.toDF.count() == 4)
  }

  test("merge-on-read UPDATE on a DV table enforces constraints") {
    val loc = TestSpark.tmpDir("cons-dv")
    DeltaLogWriter.create(spark, loc, good, properties = Map(
      "delta.constraints.positive_amount" -> "amount > 0",
      "delta.enableDeletionVectors" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    violates(t.update("id = 1", Map("amount" -> "-2.0")))
    t.update("id = 1", Map("amount" -> "42.0"))
    assert(t.toDF.filter("id = 1").select("amount").as[Double].head() == 42.0)
  }

  test("addConstraint validates existing data, upgrades the Delta protocol, enforces after") {
    val loc = TestSpark.tmpDir("cons-add")
    DeltaLogWriter.create(spark, loc, good.union(bad)) // protocol (1,2)
    val t = TxTable.forForeignDelta(spark, loc)
    val e = intercept[UnsupportedOperationError](
      t.addConstraint("positive_amount", "amount > 0"))
    assert(e.getMessage.contains("existing row violates"))
    t.delete("amount <= 0")
    t.addConstraint("positive_amount", "amount > 0")
    val (st, _) = DeltaLog.replayState(spark, loc, None)
    assert(st.minWriter == 3, s"expected writer v3 after ADD CONSTRAINT, got ${st.minWriter}")
    assert(st.props("delta.constraints.positive_amount") == "amount > 0")
    violates(t.append(bad))
    t.dropConstraint("positive_amount")
    t.append(bad)
    assert(t.toDF.count() == 3)
  }

  test("column invariants in schema metadata are enforced, not refused") {
    val loc = TestSpark.tmpDir("cons-inv")
    val invMeta = new MetadataBuilder().putString("delta.invariants",
      """{"expression":{"expression":"id < 100"}}""").build()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = true, invMeta),
      StructField("tag", StringType)))
    val data = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, "a")), schema)
    val loc2 = TestSpark.tmpDir("cons-inv2")
    DeltaLogWriter.create(spark, loc2, data)
    val t = TxTable.forForeignDelta(spark, loc2)
    t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(2L, "b")), schema))
    violates(t.append(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(500L, "c")), schema)))
    assert(t.toDF.count() == 2)
  }

  test("constraint referencing a column absent from a MERGE-evolution append passes as NULL") {
    val loc = TestSpark.tmpDir("cons-missing")
    val t = new TxTable(spark, loc)
    t.create(good, properties = Map("delta.constraints.tagged" -> "length(tag) > 0"))
    // append without the tag column: absent means NULL, NULL passes CHECK
    t.append(Seq((7L, 70.0)).toDF("id", "amount"),
      graft.catalog.SchemaEvolution.MERGE)
    assert(t.toDF.count() == 3)
  }
}
