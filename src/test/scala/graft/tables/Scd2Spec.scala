package graft.tables

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** SCD Type-2 maintenance: one MERGE per batch closes changed keys'
  * current versions and inserts the new ones; unchanged rows are no-ops;
  * every key always has exactly one current row.
  */
class Scd2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dim: DataFrame =
    Seq((1L, "gold", 10.0), (2L, "silver", 20.0), (3L, "bronze", 30.0))
      .toDF("id", "tier", "bal")

  private def rows(t: TxTable): Set[(Long, String, Double, Long, Option[Long], Boolean)] =
    t.toDF.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getBoolean(5))).toSet

  test("changed key closes old version and inserts new; unchanged is a no-op; new key inserts") {
    val loc = TestSpark.tmpDir("scd2")
    val t = new TxTable(spark, loc)
    t.create(Scd2.init(dim, tsVersion = 0L))
    val v0 = t.version

    val changes = Seq(
      (1L, "platinum", 10.0), // tier changed
      (2L, "silver", 20.0),   // identical -> no-op
      (4L, "gold", 40.0))     // brand-new key
      .toDF("id", "tier", "bal")
    Scd2.applyChanges(t, changes, keyCols = Seq("id"), tsVersion = 1L)

    assert(rows(t) == Set(
      (1L, "gold", 10.0, 0L, Some(1L), false),     // closed
      (1L, "platinum", 10.0, 1L, None, true),      // new version
      (2L, "silver", 20.0, 0L, None, true),        // untouched
      (3L, "bronze", 30.0, 0L, None, true),        // untouched
      (4L, "gold", 40.0, 1L, None, true)))         // inserted

    // exactly one current row per key
    val curPerKey = t.toDF.filter("is_current").groupBy("id").count()
      .collect().map(_.getLong(1)).toSet
    assert(curPerKey == Set(1L))

    // a second identical batch changes nothing (version unchanged content)
    Scd2.applyChanges(t, changes, keyCols = Seq("id"), tsVersion = 2L)
    assert(rows(t).count(_._6) == 4)
    assert(rows(t).size == 5, "identical re-apply must not create versions")

    // null-safe change detection: bal -> null IS a change
    Scd2.applyChanges(t,
      Seq((4L, "gold", null.asInstanceOf[java.lang.Double]))
        .toDF("id", "tier", "bal").selectExpr("id", "tier", "CAST(bal AS DOUBLE) AS bal"),
      keyCols = Seq("id"), tsVersion = 3L)
    val k4 = t.toDF.filter("id = 4").collect()
    assert(k4.length == 2 && k4.count(!_.getBoolean(5)) == 1)
    assert(v0 == 0)
  }

  test("partial-attribute batch: absent attrs inherit current values, null for new keys") {
    val loc = TestSpark.tmpDir("scd2-partial")
    val t = new TxTable(spark, loc)
    t.create(Scd2.init(dim, tsVersion = 0L))

    // the batch carries only (id, bal): tier must come along for the ride
    val partial = Seq((1L, 11.0), (5L, 50.0)).toDF("id", "bal")
    Scd2.applyChanges(t, partial, keyCols = Seq("id"), tsVersion = 1L)

    assert(rows(t) == Set(
      (1L, "gold", 10.0, 0L, Some(1L), false),       // closed
      (1L, "gold", 11.0, 1L, None, true),            // tier INHERITED
      (2L, "silver", 20.0, 0L, None, true),
      (3L, "bronze", 30.0, 0L, None, true),
      (5L, null, 50.0, 1L, None, true)))             // new key: nothing to inherit

    // identical partial re-apply: the unprovided attribute is equal by
    // construction, the provided one unchanged -> no-op
    Scd2.applyChanges(t, partial, keyCols = Seq("id"), tsVersion = 2L)
    assert(rows(t).size == 5, "identical partial re-apply must not create versions")
  }

  test("guards: missing bookkeeping, missing key, or unknown batch columns raise") {
    val loc = TestSpark.tmpDir("scd2-guard")
    val t = new TxTable(spark, loc)
    t.create(dim) // no SCD columns
    intercept[UnsupportedOperationError](
      Scd2.applyChanges(t, dim, Seq("id"), tsVersion = 1L))

    val loc2 = TestSpark.tmpDir("scd2-guard2")
    val t2 = new TxTable(spark, loc2)
    t2.create(Scd2.init(dim, 0L))
    // a batch without the KEY column is unresolvable
    intercept[UnsupportedOperationError](
      Scd2.applyChanges(t2, dim.withColumnRenamed("id", "key"), Seq("id"), tsVersion = 1L))
    // a column the dimension does not have is a caller bug, not silently dropped
    intercept[UnsupportedOperationError](
      Scd2.applyChanges(t2,
        dim.withColumn("extra", org.apache.spark.sql.functions.lit(1)),
        Seq("id"), tsVersion = 1L))
  }
}
