package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** Dual-format publish (Delta UniForm's shape): Iceberg metadata over a
  * real Delta table's data files. Delta stays the writable source of
  * truth; Iceberg readers see the same rows without a byte copied.
  */
class IcebergDualFormatSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed = (0L until 100L).map(i => (i, s"g${i % 4}", i * 1.5))
    .toDF("id", "g", "v")

  test("publish mirrors a partitioned Delta table; iceberg reads + prunes") {
    val loc = TestSpark.tmpDir("uniform")
    DeltaLogWriter.create(spark, loc, seed, partitionColumns = Seq("g"))
    IcebergWriter.publishFromDelta(spark, loc)

    assert(IcebergLog.isIcebergTable(spark, loc))
    val ice = IcebergLog.toDF(spark, loc)
    assert(ice.count() == 100)
    assert(ice.select("id").as[Long].collect().sorted.toSeq == (0L until 100L))
    // identity partition values travel into the manifests: pruning works
    val all = IcebergLog.filesAfterPruning(spark, loc, "id >= 0")
    val g1 = IcebergLog.filesAfterPruning(spark, loc, "g = 'g1'")
    assert(g1 < all, s"partition pruning must drop files: $g1 vs $all")
    assert(IcebergLog.scan(spark, loc, "g = 'g1' AND id < 50").count() ==
      seed.filter($"g" === "g1" && $"id" < 50).count())
    // the delta log still wins dispatch — delta stays the write path
    assert(TxTable.forAnyLocation(spark, loc).log eq ForeignDeltaCommitLog)
  }

  test("re-publish after Delta commits appends a replace snapshot, ids stable") {
    val loc = TestSpark.tmpDir("uniform-sync")
    DeltaLogWriter.create(spark, loc, seed)
    IcebergWriter.publishFromDelta(spark, loc)
    val ids1 = IcebergLog.topFields(IcebergLog.state(spark, loc).meta)
      .map { case (id, n, _) => n -> id }.toMap

    val t = TxTable.forForeignDelta(spark, loc)
    t.append((100L until 120L).map(i => (i, s"g${i % 4}", i * 1.5)).toDF("id", "g", "v"))
    t.delete("id < 10")
    IcebergWriter.publishFromDelta(spark, loc)

    assert(IcebergLog.toDF(spark, loc).count() == 110)
    assert(IcebergLog.toDF(spark, loc).filter($"id" < 10).count() == 0)
    assert(IcebergLog.history(spark, loc).size == 2)
    val meta = IcebergLog.state(spark, loc).meta
    assert(IcebergLog.currentOperation(meta) == "replace")
    val ids2 = IcebergLog.topFields(meta).map { case (id, n, _) => n -> id }.toMap
    assert(ids1 == ids2, "field ids must be stable across publishes")

    // schema evolution on the Delta side carries through with kept ids
    t.append(Seq((200L, "g0", 1.0, "x")).toDF("id", "g", "v", "tag"),
      evolution = graft.catalog.SchemaEvolution.MERGE)
    IcebergWriter.publishFromDelta(spark, loc)
    val ids3 = IcebergLog.topFields(IcebergLog.state(spark, loc).meta)
      .map { case (id, n, _) => n -> id }.toMap
    assert(ids1.forall { case (n, id) => ids3(n) == id })
    assert(ids3("tag") > ids1.values.max)
    assert(IcebergLog.toDF(spark, loc).filter($"tag".isNotNull).count() == 1)
  }

  test("refusals: live deletion vectors and column-mapped tables") {
    val loc = TestSpark.tmpDir("uniform-dv")
    DeltaLogWriter.create(spark, loc, seed,
      properties = Map("delta.enableDeletionVectors" -> "true"))
    TxTable.forForeignDelta(spark, loc).delete("id < 5") // merge-on-read DV
    val ex = intercept[UnsupportedOperationError] {
      IcebergWriter.publishFromDelta(spark, loc)
    }
    assert(ex.getMessage.contains("deletion vectors"))

    val loc2 = TestSpark.tmpDir("uniform-cm")
    DeltaLogWriter.create(spark, loc2, seed,
      properties = Map("delta.columnMapping.mode" -> "name"))
    intercept[UnsupportedOperationError] {
      IcebergWriter.publishFromDelta(spark, loc2)
    }
  }
}
