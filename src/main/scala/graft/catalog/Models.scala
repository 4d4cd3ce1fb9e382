package graft.catalog

import org.apache.spark.sql.types.{StructField, StructType}

import graft.types.UcType

/** Catalog data model — re-expression of the reference's pydantic models
  * (/root/reference/uchelper/models.py) as Scala case classes.
  */

// ---- exceptions (reference uchelper/exceptions.py) ----
final case class AlreadyExistsError(msg: String) extends RuntimeException(msg)
final case class DoesNotExistError(msg: String) extends RuntimeException(msg)
final case class UnsupportedOperationError(msg: String) extends RuntimeException(msg)
final case class SchemaMismatchError(msg: String) extends RuntimeException(msg)

// ---- enums ----
sealed trait TableType
object TableType {
  case object MANAGED extends TableType
  case object EXTERNAL extends TableType
  def fromString(s: String): TableType = s.toUpperCase match {
    case "MANAGED" => MANAGED
    case "EXTERNAL" => EXTERNAL
    case o => throw UnsupportedOperationError(s"unknown table type $o")
  }
}

/** Storage formats (reference models.py:159-172). DELTA here is backed by
  * the graft transactional log (graft.tables.TxLog) since this build has no
  * Delta jars — same observable semantics (ACID append/overwrite,
  * replaceWhere, schema evolution, MERGE, time travel).
  */
sealed trait FileType
object FileType {
  case object DELTA extends FileType
  case object ICEBERG extends FileType
  case object PARQUET extends FileType
  case object CSV extends FileType
  case object AVRO extends FileType
  case object JSON extends FileType
  case object ORC extends FileType
  case object TEXT extends FileType
  val all: Seq[FileType] = Seq(DELTA, ICEBERG, PARQUET, CSV, AVRO, JSON, ORC, TEXT)
  def fromString(s: String): FileType = s.toUpperCase match {
    case "DELTA" => DELTA
    case "ICEBERG" => ICEBERG
    case "PARQUET" => PARQUET
    case "CSV" => CSV
    case "AVRO" => AVRO
    case "JSON" => JSON
    case "ORC" => ORC
    case "TEXT" => TEXT
    case o => throw UnsupportedOperationError(s"unknown file type $o")
  }
}

/** Write modes (reference utils.py:39-47). */
sealed trait WriteMode
object WriteMode {
  case object APPEND extends WriteMode
  case object OVERWRITE extends WriteMode
  def fromString(s: String): WriteMode = s.toUpperCase match {
    case "APPEND" => APPEND
    case "OVERWRITE" => OVERWRITE
    case o => throw UnsupportedOperationError(s"unknown write mode $o")
  }
}

/** Schema evolution policies (reference dataframe.py:17-20). */
sealed trait SchemaEvolution
object SchemaEvolution {
  case object STRICT extends SchemaEvolution
  case object MERGE extends SchemaEvolution
  case object OVERWRITE extends SchemaEvolution
  def fromString(s: String): SchemaEvolution = s.toUpperCase match {
    case "STRICT" => STRICT
    case "MERGE" => MERGE
    case "OVERWRITE" => OVERWRITE
    case o => throw UnsupportedOperationError(s"unknown schema evolution $o")
  }
}

// ---- entities ----
final case class CatalogInfo(
    name: String,
    comment: Option[String] = None,
    properties: Map[String, String] = Map.empty,
    createdAtMs: Long = 0L,
    updatedAtMs: Option[Long] = None,
    id: String = "")

final case class SchemaInfo(
    name: String,
    catalogName: String,
    comment: Option[String] = None,
    properties: Map[String, String] = Map.empty,
    createdAtMs: Long = 0L,
    updatedAtMs: Option[Long] = None,
    schemaId: String = "") {
  def fullName: String = s"$catalogName.$name"
}

/** Column record (reference models.py:91-138). `partitionIndex` models
  * partitioning in the schema, as the reference does (models.py:106).
  */
final case class ColumnInfo(
    name: String,
    dataType: UcType,
    position: Int,
    comment: Option[String] = None,
    nullable: Boolean = true,
    partitionIndex: Option[Int] = None) {
  def typeText: String = dataType.typeText
  def toStructField: StructField = StructField(name, UcType.toSpark(dataType), nullable)
}

final case class TableInfo(
    name: String,
    catalogName: String,
    schemaName: String,
    tableType: TableType,
    fileType: FileType,
    columns: Seq[ColumnInfo],
    storageLocation: Option[String] = None,
    comment: Option[String] = None,
    properties: Map[String, String] = Map.empty,
    createdAtMs: Long = 0L,
    updatedAtMs: Option[Long] = None,
    tableId: String = "") {
  def fullName: String = s"$catalogName.$schemaName.$name"

  def schema: StructType = StructType(columns.sortBy(_.position).map(_.toStructField))

  /** Partition columns in partition-index order (reference
    * dataframe.py:172-177).
    */
  def partitionColumns: Seq[String] =
    columns.filter(_.partitionIndex.isDefined).sortBy(_.partitionIndex.get).map(_.name)

  /** Default merge columns from the reserved property (reference
    * models.py:8-10, 197-214).
    */
  def defaultMergeColumns: Seq[String] =
    properties.get(TableInfo.DefaultMergeColumnsKey)
      .map(_.split(";").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
}

object TableInfo {
  /** Reserved property key holding `;`-joined default merge columns. */
  val DefaultMergeColumnsKey = "graft.default_merge_columns"

  /** Derive catalog columns from a Spark schema (reference
    * client.py:463, 521-533).
    */
  def columnsFromSchema(schema: StructType, partitionCols: Seq[String] = Seq.empty): Seq[ColumnInfo] =
    schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      ColumnInfo(
        name = f.name,
        dataType = UcType.fromSpark(f.dataType),
        position = i,
        nullable = f.nullable,
        partitionIndex = {
          val pi = partitionCols.indexOf(f.name)
          if (pi >= 0) Some(pi) else None
        })
    }
}
