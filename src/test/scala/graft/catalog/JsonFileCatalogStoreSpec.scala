package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.types.UcType

class JsonFileCatalogStoreSpec extends AnyFunSuite {

  test("state survives a store restart, including nested types and partition indices") {
    val path = TestSpark.tmpDir("jsoncat") + "/catalog.json"
    val s1 = new JsonFileCatalogStore(path)
    s1.createCatalog(CatalogInfo("main", Some("the catalog")))
    s1.createSchema(SchemaInfo("default", "main"))
    s1.createTable(TableInfo(
      name = "t", catalogName = "main", schemaName = "default",
      tableType = TableType.EXTERNAL, fileType = FileType.DELTA,
      columns = Seq(
        ColumnInfo("id", UcType.LongT, 0, nullable = false),
        ColumnInfo("d", UcType.DecimalT(10, 5), 1),
        ColumnInfo("arr", UcType.ArrayT(UcType.StructT(Seq("x" -> UcType.DoubleT))), 2),
        ColumnInfo("iv", UcType.IntervalT("HOUR TO SECOND"), 3),
        ColumnInfo("p", UcType.LongT, 4, partitionIndex = Some(0))),
      storageLocation = Some("/tmp/t"),
      properties = Map(TableInfo.DefaultMergeColumnsKey -> "id")))

    val s2 = new JsonFileCatalogStore(path)
    val t = s2.getTable("main", "default", "t")
    assert(t.columns.map(_.name) == Seq("id", "d", "arr", "iv", "p"))
    assert(t.columns(1).dataType == UcType.DecimalT(10, 5))
    assert(t.columns(2).dataType == UcType.ArrayT(UcType.StructT(Seq("x" -> UcType.DoubleT))))
    assert(t.columns(3).dataType == UcType.IntervalT("HOUR TO SECOND"))
    assert(t.partitionColumns == Seq("p"))
    assert(t.defaultMergeColumns == Seq("id"))
    assert(s2.getCatalog("main").comment.contains("the catalog"))
  }

  test("mutations through the durable store keep UC error semantics") {
    val path = TestSpark.tmpDir("jsoncat") + "/catalog.json"
    val s = new JsonFileCatalogStore(path)
    s.createCatalog(CatalogInfo("c"))
    intercept[AlreadyExistsError] { s.createCatalog(CatalogInfo("c")) }
    s.createSchema(SchemaInfo("s", "c"))
    intercept[UnsupportedOperationError] { s.deleteCatalog("c") }
    s.deleteCatalog("c", force = true)
    // restart sees the deletion
    val s2 = new JsonFileCatalogStore(path)
    intercept[DoesNotExistError] { s2.getCatalog("c") }
  }
}
