package graft.tables

import org.apache.spark.sql.functions._
import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** Iceberg sort orders (spec "Sort Orders"): setSortOrder commits a new
  * default order metadata-only; subsequent writes range-partition + sort
  * so files cover disjoint sort-key slices and min/max pruning bites.
  */
class IcebergSortOrderSpec extends AnyFunSuite {

  private implicit val fmts: Formats = DefaultFormats
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writes after setSortOrder cluster by range and prune") {
    val loc = TestSpark.tmpDir("ice-sort") + "/t"
    // shuffled ids, forced into 4 files that EACH span the whole range
    val shuffled = (0L until 400L).map(i => (i * 7919L % 400L, s"r$i"))
      .toDF("id", "s").repartition(4)
    IcebergWriter.create(spark, loc, shuffled)
    assert(IcebergLog.state(spark, loc).files.size == 4)
    // every unsorted file overlaps [0, 40): nothing prunes
    assert(IcebergLog.filesAfterPruning(spark, loc, "id < 40") == 4)

    IcebergWriter.setSortOrder(spark, loc, Seq(("id", true)))
    // metadata shape: fresh order id, default points at it
    val meta = IcebergLog.state(spark, loc).meta
    assert((meta \ "default-sort-order-id").extract[Int] == 1)
    assert(IcebergLog.sortOrderFields(meta) == Seq(("id", true)))

    // a sorted append: new files cover DISJOINT id ranges
    val more = (400L until 800L).map(i => (400L + (i * 7919L % 400L), s"r$i"))
      .toDF("id", "s").repartition(4)
    IcebergWriter.append(spark, loc, more)
    val total = IcebergLog.state(spark, loc).files.size
    assert(total > 4)
    // a narrow slice of the NEW range: old files prune by bounds (<400),
    // sorted new files prune to the one-or-two covering the slice
    val hit = IcebergLog.filesAfterPruning(spark, loc, "id >= 400 AND id < 440")
    assert(hit <= 2, s"sorted files must cover disjoint ranges, hit $hit of $total")
    // correctness unchanged
    assert(IcebergLog.toDF(spark, loc).count() == 800)
    assert(IcebergLog.scan(spark, loc, "id >= 400 AND id < 440").count() ==
      more.filter($"id" >= 400 && $"id" < 440).count())
  }

  test("sort order rides the TxTable surface and partitioned writes") {
    val loc = TestSpark.tmpDir("ice-sort-tx") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    t.create((0L until 100L).map(i => (i, s"g${i % 2}", (i * 31L) % 100L))
      .toDF("id", "g", "v"), partitionColumns = Seq("g"))
    IcebergWriter.setSortOrder(spark, loc, Seq(("v", false)))
    t.append((100L until 200L).map(i => (i, s"g${i % 2}", (i * 31L) % 100L))
      .toDF("id", "g", "v"))
    assert(t.toDF.count() == 200)
    assert(IcebergLog.scan(spark, loc, "g = 'g1' AND v >= 50").count() ==
      (0L until 200L).count(i => i % 2 == 1 && (i * 31L) % 100L >= 50))

    // unknown sort column refuses
    intercept[UnsupportedOperationError] {
      IcebergWriter.setSortOrder(spark, loc, Seq(("nope", true)))
    }
  }

  test("foreign-shaped sort order with non-identity transforms partially honors") {
    val loc = TestSpark.tmpDir("ice-sort-foreign") + "/t"
    IcebergWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"))
    // order 5: bucket transform (skipped) + identity desc on s (honored)
    val f = IcebergLog.fs(spark, loc)
    val v = IcebergLog.latestMetadataVersion(spark, loc).get
    val meta = IcebergLog.metaAt(spark, loc, v).asInstanceOf[JObject]
    import org.json4s.jackson.JsonMethods
    val ids = IcebergLog.topFields(meta).map { case (id, n, _) => n -> id }.toMap
    val order = JObject("order-id" -> JInt(5), "fields" -> JArray(List(
      JObject("transform" -> JString("bucket[4]"), "source-id" -> JInt(ids("id")),
        "direction" -> JString("asc"), "null-order" -> JString("nulls-first")),
      JObject("transform" -> JString("identity"), "source-id" -> JInt(ids("s")),
        "direction" -> JString("desc"), "null-order" -> JString("nulls-last")))))
    val newMeta = JObject(meta.obj.filterNot(kv =>
      kv._1 == "sort-orders" || kv._1 == "default-sort-order-id") ++ List(
      "sort-orders" -> (JArray(List(order)): JValue),
      "default-sort-order-id" -> (JInt(5): JValue)))
    val dir = IcebergLog.metadataDir(loc)
    val out = f.create(new org.apache.hadoop.fs.Path(dir, s"v${v + 1}.metadata.json"), true)
    out.write(JsonMethods.compact(JsonMethods.render(newMeta)).getBytes("UTF-8")); out.close()
    val hint = f.create(new org.apache.hadoop.fs.Path(dir, "version-hint.text"), true)
    hint.write((v + 1).toString.getBytes("UTF-8")); hint.close()

    assert(IcebergLog.sortOrderFields(IcebergLog.state(spark, loc).meta) ==
      Seq(("s", false)))
    // writes still land (partial order applied)
    IcebergWriter.append(spark, loc, Seq((2L, "b")).toDF("id", "s"))
    assert(IcebergLog.toDF(spark, loc).count() == 2)
  }
}
