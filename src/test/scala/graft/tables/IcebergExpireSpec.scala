package graft.tables

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.DoesNotExistError

/** Iceberg snapshot expiration: old snapshots leave the metadata in one
  * metadata-only commit, their manifest lists and orphaned manifests are
  * deleted, and ref-pinned snapshots survive any age cutoff.
  */
class IcebergExpireSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

  test("expire removes old snapshots, keeps current; travel to expired fails") {
    val loc = TestSpark.tmpDir("ice-exp-basic") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.append(spark, loc, Seq((4L, "d")).toDF("id", "s"))
    IcebergWriter.overwrite(spark, loc, Seq((9L, "z")).toDF("id", "s"))
    val all = IcebergLog.history(spark, loc)
    assert(all.size == 3)

    val res = IcebergWriter.expireSnapshots(spark, loc,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(res.removedSnapshotIds.toSet == all.dropRight(1).toSet)
    // one metadata-only commit: history is now just the current snapshot
    assert(IcebergLog.history(spark, loc) == Seq(all.last))
    assert(IcebergLog.toDF(spark, loc).count() == 1)
    intercept[DoesNotExistError] {
      IcebergLog.toDF(spark, loc, asOfSnapshotId = Some(all.head)).count()
    }
    // the overwrite snapshot references only its own manifests — the
    // expired snapshots' manifest lists AND manifests are deleted
    assert(res.deletedManifestLists == 2)
    assert(res.deletedManifests >= 1)
  }

  test("ref-pinned snapshots survive expiration and stay readable") {
    val loc = TestSpark.tmpDir("ice-exp-ref") + "/t"
    IcebergWriter.create(spark, loc, seed)
    val v1 = IcebergLog.history(spark, loc).head
    IcebergWriter.createTag(spark, loc, "pin", snapshotId = Some(v1))
    IcebergWriter.overwrite(spark, loc, Seq((9L, "z")).toDF("id", "s"))
    val res = IcebergWriter.expireSnapshots(spark, loc,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(res.removedSnapshotIds.isEmpty,
      "the only old snapshot is tag-pinned: nothing expires")
    assert(IcebergLog.toDFAtRef(spark, loc, "pin").count() == 3)
    // drop the pin: the snapshot now expires
    IcebergWriter.removeRef(spark, loc, "pin")
    val res2 = IcebergWriter.expireSnapshots(spark, loc,
      olderThanMs = System.currentTimeMillis() + 1000)
    assert(res2.removedSnapshotIds == Seq(v1))
  }

  test("retainLast keeps recent ancestors regardless of age") {
    val loc = TestSpark.tmpDir("ice-exp-retain") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.append(spark, loc, Seq((4L, "d")).toDF("id", "s"))
    IcebergWriter.append(spark, loc, Seq((5L, "e")).toDF("id", "s"))
    val all = IcebergLog.history(spark, loc)
    val res = IcebergWriter.expireSnapshots(spark, loc,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 2)
    assert(res.removedSnapshotIds == Seq(all.head))
    assert(IcebergLog.history(spark, loc) == all.drop(1))
    // the retained ancestor still time-travels
    assert(IcebergLog.toDF(spark, loc, asOfSnapshotId = Some(all(1))).count() == 4)
  }

  test("expiring nothing is a no-op with no new metadata version") {
    val loc = TestSpark.tmpDir("ice-exp-noop") + "/t"
    IcebergWriter.create(spark, loc, seed)
    val v = IcebergLog.latestMetadataVersion(spark, loc).get
    val res = IcebergWriter.expireSnapshots(spark, loc, olderThanMs = 0L)
    assert(res.removedSnapshotIds.isEmpty)
    assert(IcebergLog.latestMetadataVersion(spark, loc).get == v)
  }
}
