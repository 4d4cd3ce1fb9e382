package graft.tables

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.{DoesNotExistError, UnsupportedOperationError}

/** Iceberg snapshot references (spec v2 "Snapshot References"): tags pin
  * a snapshot against expiration and read as `VERSION AS OF 'tag'`;
  * branches are named lineage heads, with `main` tracking the table's
  * current snapshot across commits.
  */
class IcebergRefsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

  test("tag pins a snapshot; reads by ref see the tagged state") {
    val loc = TestSpark.tmpDir("ice-ref-tag") + "/t"
    IcebergWriter.create(spark, loc, seed)
    val v1 = IcebergLog.history(spark, loc).head
    IcebergWriter.createTag(spark, loc, "v1.0", maxRefAgeMs = Some(86400000L))
    IcebergWriter.append(spark, loc, Seq((4L, "d")).toDF("id", "s"))
    IcebergWriter.delete(spark, loc, "id = 1")

    assert(IcebergLog.snapshotIdForRef(spark, loc, "v1.0") == v1)
    assert(IcebergLog.toDFAtRef(spark, loc, "v1.0").count() == 3)
    assert(IcebergLog.toDF(spark, loc).count() == 3) // 4 rows - 1 deleted
    // the refs inspection table reports it with its retention
    val refs = IcebergMeta.table(spark, loc, "refs").collect()
    assert(refs.length == 1)
    assert(refs.head.getAs[String]("name") == "v1.0")
    assert(refs.head.getAs[String]("type") == "tag")
    assert(refs.head.getAs[Long]("max_ref_age_ms") == 86400000L)
  }

  test("main resolves implicitly and follows commits once explicit") {
    val loc = TestSpark.tmpDir("ice-ref-main") + "/t"
    IcebergWriter.create(spark, loc, seed)
    // implicit main = current snapshot even with no refs map written
    val s1 = IcebergLog.snapshotIdForRef(spark, loc, "main")
    assert(IcebergLog.history(spark, loc).contains(s1))
    // once written explicitly, commits must keep advancing it
    IcebergWriter.createBranch(spark, loc, "main")
    IcebergWriter.append(spark, loc, Seq((4L, "d")).toDF("id", "s"))
    val metaRefs = IcebergMeta.table(spark, loc, "refs")
      .filter(col("name") === "main").collect()
    assert(metaRefs.length == 1)
    val cur = IcebergLog.history(spark, loc).last
    assert(metaRefs.head.getAs[Long]("snapshot_id") == cur,
      "explicit main branch must track the current snapshot")
    assert(IcebergLog.snapshotIdForRef(spark, loc, "main") == cur)
  }

  test("non-main branch stays pinned while main moves on") {
    val loc = TestSpark.tmpDir("ice-ref-branch") + "/t"
    IcebergWriter.create(spark, loc, seed)
    val v1 = IcebergLog.history(spark, loc).head
    IcebergWriter.createBranch(spark, loc, "audit", minSnapshotsToKeep = Some(3))
    IcebergWriter.append(spark, loc, Seq((4L, "d")).toDF("id", "s"))
    IcebergWriter.append(spark, loc, Seq((5L, "e")).toDF("id", "s"))
    assert(IcebergLog.snapshotIdForRef(spark, loc, "audit") == v1)
    assert(IcebergLog.toDFAtRef(spark, loc, "audit").count() == 3)
    assert(IcebergLog.toDF(spark, loc).count() == 5)
  }

  test("removeRef drops tags, refuses main and unknowns") {
    val loc = TestSpark.tmpDir("ice-ref-rm") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.createTag(spark, loc, "keep")
    IcebergWriter.createTag(spark, loc, "drop")
    IcebergWriter.removeRef(spark, loc, "drop")
    val names = IcebergMeta.table(spark, loc, "refs")
      .select("name").as[String].collect().toSet
    assert(names == Set("keep"))
    intercept[UnsupportedOperationError] { IcebergWriter.removeRef(spark, loc, "main") }
    intercept[DoesNotExistError] { IcebergWriter.removeRef(spark, loc, "gone") }
    intercept[DoesNotExistError] { IcebergLog.snapshotIdForRef(spark, loc, "gone") }
    intercept[DoesNotExistError] {
      IcebergWriter.createTag(spark, loc, "bad", snapshotId = Some(999L))
    }
  }

  test("ref commits are metadata-only: no snapshot minted, data unchanged") {
    val loc = TestSpark.tmpDir("ice-ref-metaonly") + "/t"
    IcebergWriter.create(spark, loc, seed)
    val before = IcebergLog.history(spark, loc)
    val vBefore = IcebergLog.latestMetadataVersion(spark, loc).get
    IcebergWriter.createTag(spark, loc, "t1")
    assert(IcebergLog.history(spark, loc) == before)
    assert(IcebergLog.latestMetadataVersion(spark, loc).get == vBefore + 1)
    assert(IcebergLog.toDF(spark, loc).count() == 3)
  }

  test("WAP: staged branch appends are invisible to main until fastForward") {
    val loc = TestSpark.tmpDir("ice-wap") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.createBranch(spark, loc, "audit")

    // two staged appends stack on the branch
    IcebergWriter.appendToBranch(spark, loc, Seq((4L, "d")).toDF("id", "s"), "audit")
    IcebergWriter.appendToBranch(spark, loc, Seq((5L, "e")).toDF("id", "s"), "audit")
    // main readers see nothing
    assert(IcebergLog.toDF(spark, loc).count() == 3)
    // the audit query reads the staged state
    assert(IcebergLog.toDFAtRef(spark, loc, "audit")
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))

    // publish: one metadata-only commit moves main to the branch head
    IcebergWriter.fastForward(spark, loc, "audit")
    assert(IcebergLog.toDF(spark, loc)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // cleanup: the branch can go; data stays on main
    IcebergWriter.removeRef(spark, loc, "audit")
    assert(IcebergLog.toDF(spark, loc).count() == 5)
  }

  test("WAP: staged files survive VACUUM while the branch ref pins them") {
    val loc = TestSpark.tmpDir("ice-wap-vac") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.createBranch(spark, loc, "stage")
    IcebergWriter.appendToBranch(spark, loc, Seq((4L, "d")).toDF("id", "s"), "stage")
    // main never referenced the staged file — only the ref does. A forced
    // zero-retention vacuum must STILL keep it, or the later publish
    // points at a deleted file.
    val t = TxTable.forIceberg(spark, loc)
    t.vacuum(retentionMs = 0L, force = true)
    IcebergWriter.fastForward(spark, loc, "stage")
    assert(IcebergLog.toDF(spark, loc)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // once the ref is gone and main moved past it, the file can go
    IcebergWriter.removeRef(spark, loc, "stage")
  }

  test("WAP: branch staging enforces CHECK constraints like every write") {
    val loc = TestSpark.tmpDir("ice-wap-chk") + "/t"
    val t = TxTable.forIceberg(spark, loc)
    t.create(Seq((1L, "a")).toDF("id", "s"))
    t.addConstraint("id_pos", "id > 0")
    IcebergWriter.createBranch(spark, loc, "audit")
    // a violating staged row must be refused at STAGE time — fastForward
    // publishes branches with no further validation
    intercept[Exception] {
      IcebergWriter.appendToBranch(spark, loc, Seq((-5L, "bad")).toDF("id", "s"), "audit")
    }
    IcebergWriter.appendToBranch(spark, loc, Seq((2L, "ok")).toDF("id", "s"), "audit")
    IcebergWriter.fastForward(spark, loc, "audit")
    assert(IcebergLog.toDF(spark, loc)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("WAP: fastForward refuses a diverged main; abandoned stage reclaims") {
    val loc = TestSpark.tmpDir("ice-wap-div") + "/t"
    IcebergWriter.create(spark, loc, seed)
    IcebergWriter.createBranch(spark, loc, "stage")
    IcebergWriter.appendToBranch(spark, loc, Seq((4L, "d")).toDF("id", "s"), "stage")
    // main moves independently -> the branch head no longer descends from it
    IcebergWriter.append(spark, loc, Seq((9L, "z")).toDF("id", "s"))
    intercept[UnsupportedOperationError] {
      IcebergWriter.fastForward(spark, loc, "stage")
    }
    // abandon: drop the ref; main unaffected
    IcebergWriter.removeRef(spark, loc, "stage")
    assert(IcebergLog.toDF(spark, loc)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 9L))
    // staging errors: unknown branch, tag target, main target
    intercept[DoesNotExistError] {
      IcebergWriter.appendToBranch(spark, loc, seed, "nope")
    }
    IcebergWriter.createTag(spark, loc, "atag")
    intercept[UnsupportedOperationError] {
      IcebergWriter.appendToBranch(spark, loc, seed, "atag")
    }
    intercept[UnsupportedOperationError] {
      IcebergWriter.appendToBranch(spark, loc, seed, "main")
    }
  }
}
