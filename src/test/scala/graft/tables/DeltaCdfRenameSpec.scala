package graft.tables
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
class DeltaCdfRenameSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  test("delta CDF across a column-mapping rename") {
    val loc = TestSpark.tmpDir("delta-ren-cdf")
    DeltaLogWriter.create(spark, loc, Seq((1L, "a")).toDF("id", "s"),
      properties = Map("delta.enableChangeDataFeed" -> "true"))
    val t = TxTable.forForeignDelta(spark, loc)
    t.renameColumn("s", "label")
    t.append(Seq((2L, "b")).toDF("id", "label"))
    t.delete("id = 1")
    val ch = t.tableChanges(0)
      .select("id", "label", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ch == Set((1L, "a", "insert"), (2L, "b", "insert"), (1L, "a", "delete")), ch.toString)
  }
}
