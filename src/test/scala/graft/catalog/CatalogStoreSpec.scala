package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.types.UcType

/** Store-agnostic contract: every CatalogStore backend must satisfy the
  * reference's UC semantics (error types, pagination, rollback, cascades).
  */
abstract class CatalogStoreContract extends AnyFunSuite {

  /** A brand-new, empty store instance. */
  protected def newStore(): CatalogStore

  private def freshStore(): CatalogStore = {
    val s = newStore()
    s.createCatalog(CatalogInfo("main"))
    s.createSchema(SchemaInfo("default", "main"))
    s
  }

  private def table(name: String): TableInfo = TableInfo(
    name = name, catalogName = "main", schemaName = "default",
    tableType = TableType.EXTERNAL, fileType = FileType.PARQUET,
    columns = Seq(
      ColumnInfo("id", UcType.LongT, 0, nullable = false),
      ColumnInfo("val", UcType.DoubleT, 1)),
    storageLocation = Some("/tmp/nowhere"))

  test("catalog CRUD with UC error semantics") {
    val s = freshStore()
    intercept[AlreadyExistsError] { s.createCatalog(CatalogInfo("main")) }
    intercept[DoesNotExistError] { s.getCatalog("nope") }
    // non-empty catalog needs force
    intercept[UnsupportedOperationError] { s.deleteCatalog("main") }
    s.deleteCatalog("main", force = true)
    intercept[DoesNotExistError] { s.getCatalog("main") }
  }

  test("schema CRUD and rename cascades to tables") {
    val s = freshStore()
    s.createTable(table("t1"))
    s.updateSchema("main", "default", newName = Some("renamed"))
    assert(s.getTable("main", "renamed", "t1").schemaName == "renamed")
    intercept[DoesNotExistError] { s.getSchema("main", "default") }
  }

  test("table CRUD, duplicate and missing errors") {
    val s = freshStore()
    s.createTable(table("t1"))
    intercept[AlreadyExistsError] { s.createTable(table("t1")) }
    assert(s.getTable("main", "default", "t1").columns.map(_.name) == Seq("id", "val"))
    s.deleteTable("main", "default", "t1")
    intercept[DoesNotExistError] { s.getTable("main", "default", "t1") }
  }

  test("pagination walks the full list in order") {
    val s = freshStore()
    (1 to 7).foreach(i => s.createTable(table(f"t$i%02d")))
    var token: Option[String] = None
    var seen = Seq.empty[String]
    var done = false
    while (!done) {
      val (page, next) = s.listTables("main", "default", maxResults = Some(3), pageToken = token)
      seen ++= page.map(_.name)
      token = next
      done = next.isEmpty
    }
    assert(seen == (1 to 7).map(i => f"t$i%02d"))
  }

  test("overwriteTable rolls back on failed recreate (uc_api_wrapper.py:470-515)") {
    val s = freshStore()
    s.createTable(table("t1"))
    // invalid replacement: schema does not exist -> createTable throws
    val bad = table("t1").copy(schemaName = "missing_schema")
    intercept[DoesNotExistError] { s.overwriteTable(bad) }
    // original survived
    assert(s.getTable("main", "default", "t1").name == "t1")
  }

  test("default merge columns: validated and stored in reserved property") {
    val s = freshStore()
    s.createTable(table("t1"))
    intercept[DoesNotExistError] {
      s.setTableDefaultMergeColumns("main", "default", "t1", Seq("id", "nope"))
    }
    val updated = s.setTableDefaultMergeColumns("main", "default", "t1", Seq("id", "val"))
    assert(updated.defaultMergeColumns == Seq("id", "val"))
    // clearing removes the property
    val cleared = s.setTableDefaultMergeColumns("main", "default", "t1", Seq.empty)
    assert(cleared.defaultMergeColumns.isEmpty)
  }

  test("partition columns are modeled in the schema and ordered by partition index") {
    val t = table("t1").copy(columns = Seq(
      ColumnInfo("id", UcType.LongT, 0),
      ColumnInfo("p2", UcType.LongT, 1, partitionIndex = Some(1)),
      ColumnInfo("p1", UcType.LongT, 2, partitionIndex = Some(0))))
    assert(t.partitionColumns == Seq("p1", "p2"))
  }
}

/** The in-process backend. */
class CatalogStoreSpec extends CatalogStoreContract {
  override protected def newStore(): CatalogStore = new InMemoryCatalogStore
}
