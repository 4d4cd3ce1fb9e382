package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.UnsupportedOperationError

/** Iceberg inspection tables (`$snapshots`, `$history`, `$manifests`,
  * `$files`, `$delete_files`, `$partitions`, `$refs`): metadata-only
  * answers that mirror what iceberg-java's metadata tables report for
  * the same table state.
  */
class IcebergMetaSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed = Seq((1L, "g1", 1.0), (2L, "g1", 2.0), (3L, "g2", 3.0),
    (4L, "g2", 4.0), (5L, "g3", 5.0)).toDF("id", "g", "v")

  test("snapshots + history reflect every commit, ancestry flagged") {
    val loc = TestSpark.tmpDir("ice-meta-snap") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.append(spark, loc, Seq((6L, "g3", 6.0)).toDF("id", "g", "v"))
    IcebergWriter.delete(spark, loc, "g = 'g1'")

    val snaps = IcebergMeta.table(spark, loc, "snapshots")
      .orderBy("committed_at").collect()
    assert(snaps.length == 3)
    val ops = snaps.map(_.getAs[String]("operation")).toSeq
    assert(ops == Seq("append", "append", "delete"), s"got $ops")
    // parent chain: each later snapshot's parent is the previous id
    val ids = snaps.map(_.getAs[Long]("snapshot_id")).toSeq
    assert(snaps(1).getAs[Long]("parent_id") == ids(0))
    assert(snaps(2).getAs[Long]("parent_id") == ids(1))

    val hist = IcebergMeta.table(spark, loc, "history").orderBy("made_current_at").collect()
    assert(hist.length == 3)
    assert(hist.forall(_.getAs[Boolean]("is_current_ancestor")),
      "linear history: every snapshot is a current ancestor")
    assert(hist.map(_.getAs[Long]("snapshot_id")).toSeq == ids)
  }

  test("manifests table lists the current snapshot's manifest files") {
    val loc = TestSpark.tmpDir("ice-meta-man") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.append(spark, loc, Seq((6L, "g3", 6.0)).toDF("id", "g", "v"))
    val m = IcebergMeta.table(spark, loc, "manifests").collect()
    // append carries the create's manifest by reference + one new
    assert(m.length == 2)
    assert(m.forall(_.getAs[Long]("length") > 0))
    assert(m.forall(r => r.getAs[Int]("content") == 0))
    assert(m.map(r => r.getAs[Int]("added_files_count")).sum >= 2)
  }

  test("files / delete_files / partitions from manifest stats") {
    val loc = TestSpark.tmpDir("ice-meta-files") + "/t"
    IcebergWriter.create(spark, loc, seed, partitionColumns = Seq("g"))
    val files = IcebergMeta.table(spark, loc, "files").collect()
    assert(files.nonEmpty)
    assert(files.forall(_.getAs[Int]("content") == 0))
    assert(files.map(_.getAs[Long]("record_count")).sum == 5)

    val parts = IcebergMeta.table(spark, loc, "partitions")
      .select(element_at(col("partition"), "g").as("g"), col("record_count"),
        col("file_count"))
      .orderBy("g").collect()
    assert(parts.map(r => (r.getString(0), r.getAs[Long]("record_count"))).toSeq ==
      Seq(("g1", 2L), ("g2", 2L), ("g3", 1L)))
    assert(parts.forall(_.getAs[Long]("file_count") >= 1))

    // a position delete shows up under delete_files, not files
    IcebergWriter.delete(spark, loc, "id = 1")
    val dels = IcebergMeta.table(spark, loc, "delete_files").collect()
    assert(dels.length == 1 && dels.head.getAs[Int]("content") == 1)
    assert(IcebergMeta.table(spark, loc, "files").collect()
      .forall(_.getAs[Int]("content") == 0))
  }

  test("metadata-log tracks previous metadata documents") {
    val loc = TestSpark.tmpDir("ice-meta-log") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.append(spark, loc, Seq((6L, "g3", 6.0)).toDF("id", "g", "v"))
    IcebergWriter.append(spark, loc, Seq((7L, "g3", 7.0)).toDF("id", "g", "v"))
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val meta = IcebergLog.state(spark, loc).meta
    val entries = (meta \ "metadata-log").extract[Seq[JValue]]
    assert(entries.size == 2)
    val files = entries.map(e => (e \ "metadata-file").extract[String])
    assert(files.exists(_.endsWith("v1.metadata.json")))
    assert(files.exists(_.endsWith("v2.metadata.json")))
  }

  test("concurrent Iceberg appends both land via optimistic metadata race") {
    val loc = TestSpark.tmpDir("ice-conc") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    t.create(Seq((0L, "base")).toDF("id", "v").repartition(1), Seq.empty)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 4).map { k =>
      Future {
        TxTable.forIceberg(spark, loc).append(
          Seq((k.toLong, s"writer$k")).toDF("id", "v").repartition(1))
      }
    }
    Await.result(Future.sequence(futures), 120.seconds)
    assert(t.toDF.count() == 5)
    assert(t.toDF.select("v").as[String].collect().toSet ==
      Set("base", "writer1", "writer2", "writer3", "writer4"))
    // one snapshot per committed append, linear parent chain
    val snaps = IcebergMeta.table(spark, loc, "snapshots")
      .orderBy("committed_at").collect()
    assert(snaps.length == 5)
    assert(IcebergMeta.table(spark, loc, "history")
      .collect().forall(_.getAs[Boolean]("is_current_ancestor")))
  }

  test("refs empty on an unref'd table; unknown table name raises") {
    val loc = TestSpark.tmpDir("ice-meta-refs") + "/t"
    IcebergWriter.create(spark, loc, seed)
    assert(IcebergMeta.table(spark, loc, "refs").collect().isEmpty)
    intercept[UnsupportedOperationError] {
      IcebergMeta.table(spark, loc, "nope")
    }
  }
}
