package graft.catalog

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import graft.types.UcType

/** Durable catalog store: the in-memory store's semantics plus JSON-file
  * persistence (write-through on every mutation, atomic tmp+rename swap).
  * Fills the durability role the reference delegates to the Unity Catalog
  * server's database — here the driver owns one metadata file.
  */
final class JsonFileCatalogStore(path: String) extends CatalogStore {

  import JsonFileCatalogStore._

  private val inner = new InMemoryCatalogStore
  private implicit val formats: Formats = DefaultFormats

  load()

  private def typeToText(t: UcType): String = t match {
    case UcType.DecimalT(p, s) => s"DECIMAL($p,$s)"
    case UcType.ArrayT(e) => s"ARRAY<${typeToText(e)}>"
    case UcType.MapT(k, v) => s"MAP<${typeToText(k)},${typeToText(v)}>"
    case UcType.StructT(fs) => s"STRUCT<${fs.map { case (n, ft) => s"$n:${typeToText(ft)}" }.mkString(",")}>"
    case UcType.IntervalT(q) => s"INTERVAL $q"
    case other => other.name
  }

  private def textToType(s: String): UcType = {
    val t = s.trim
    val upper = t.toUpperCase
    if (upper.startsWith("DECIMAL(")) {
      val Array(p, sc) = t.substring(8, t.length - 1).split(",").map(_.trim.toInt)
      UcType.DecimalT(p, sc)
    } else if (upper.startsWith("ARRAY<")) UcType.ArrayT(textToType(t.substring(6, t.length - 1)))
    else if (upper.startsWith("MAP<")) {
      val body = t.substring(4, t.length - 1)
      val comma = topLevelComma(body)
      UcType.MapT(textToType(body.substring(0, comma)), textToType(body.substring(comma + 1)))
    } else if (upper.startsWith("STRUCT<")) {
      val body = t.substring(7, t.length - 1)
      UcType.StructT(splitTopLevel(body).map { f =>
        val i = f.indexOf(':')
        f.substring(0, i) -> textToType(f.substring(i + 1))
      })
    } else UcType.fromString(t)
  }

  private def topLevelComma(s: String): Int = {
    var depth = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '<') depth += 1
      else if (c == '>') depth -= 1
      else if (c == ',' && depth == 0) return i
    }
    -1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    s.zipWithIndex.foreach { case (c, i) =>
      if (c == '<') depth += 1
      else if (c == '>') depth -= 1
      else if (c == ',' && depth == 0) { out += s.substring(start, i); start = i + 1 }
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  private def persist(): Unit = synchronized {
    val cats = inner.listCatalogs()._1
    val schemas = cats.flatMap(c => inner.listSchemas(c.name)._1)
    val tables = schemas.flatMap(s => inner.listTables(s.catalogName, s.name)._1)
    val state = PState(cats, schemas, tables.map(t => PTable(
      t.name, t.catalogName, t.schemaName, t.tableType.toString, t.fileType.toString,
      t.columns.map(c => PCol(c.name, typeToText(c.dataType), c.position, c.comment, c.nullable, c.partitionIndex)),
      t.storageLocation, t.comment, t.properties, t.createdAtMs, t.updatedAtMs, t.tableId)))
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, Serialization.write(state))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  private def load(): Unit = synchronized {
    val p = Paths.get(path)
    if (!Files.exists(p)) return
    val state = JsonMethods.parse(Files.readString(p)).extract[PState]
    state.catalogs.foreach(inner.createCatalog)
    state.schemas.foreach(inner.createSchema)
    state.tables.foreach { t =>
      inner.createTable(TableInfo(
        t.name, t.catalogName, t.schemaName, TableType.fromString(t.tableType),
        FileType.fromString(t.fileType),
        t.columns.map(c => ColumnInfo(c.name, textToType(c.dataType), c.position, c.comment,
          c.nullable, c.partitionIndex)),
        t.storageLocation, t.comment, t.properties, t.createdAtMs, t.updatedAtMs, t.tableId))
    }
  }

  private def through[T](f: => T): T = { val r = f; persist(); r }

  override def createCatalog(c: CatalogInfo): CatalogInfo = through(inner.createCatalog(c))
  override def getCatalog(name: String): CatalogInfo = inner.getCatalog(name)
  override def listCatalogs(maxResults: Option[Int], pageToken: Option[String]): (Seq[CatalogInfo], Option[String]) =
    inner.listCatalogs(maxResults, pageToken)
  override def updateCatalog(name: String, newName: Option[String], comment: Option[String],
      properties: Option[Map[String, String]]): CatalogInfo =
    through(inner.updateCatalog(name, newName, comment, properties))
  override def deleteCatalog(name: String, force: Boolean): Unit = through(inner.deleteCatalog(name, force))

  override def createSchema(s: SchemaInfo): SchemaInfo = through(inner.createSchema(s))
  override def getSchema(catalog: String, name: String): SchemaInfo = inner.getSchema(catalog, name)
  override def listSchemas(catalog: String, maxResults: Option[Int], pageToken: Option[String]): (Seq[SchemaInfo], Option[String]) =
    inner.listSchemas(catalog, maxResults, pageToken)
  override def updateSchema(catalog: String, name: String, newName: Option[String],
      comment: Option[String], properties: Option[Map[String, String]]): SchemaInfo =
    through(inner.updateSchema(catalog, name, newName, comment, properties))
  override def deleteSchema(catalog: String, name: String, force: Boolean): Unit =
    through(inner.deleteSchema(catalog, name, force))

  override def createTable(t: TableInfo): TableInfo = through(inner.createTable(t))
  override def getTable(catalog: String, schema: String, name: String): TableInfo =
    inner.getTable(catalog, schema, name)
  override def listTables(catalog: String, schema: String, maxResults: Option[Int],
      pageToken: Option[String]): (Seq[TableInfo], Option[String]) =
    inner.listTables(catalog, schema, maxResults, pageToken)
  override def updateTable(catalog: String, schema: String, name: String,
      comment: Option[String], properties: Option[Map[String, String]]): TableInfo =
    through(inner.updateTable(catalog, schema, name, comment, properties))
  override def deleteTable(catalog: String, schema: String, name: String): Unit =
    through(inner.deleteTable(catalog, schema, name))
  override def overwriteTable(t: TableInfo): TableInfo = through(inner.overwriteTable(t))

  override def healthCheck(): Boolean = inner.healthCheck()
}

object JsonFileCatalogStore {
  // serialized shapes (top-level: json4s cannot reflect inner classes) —
  // UcType flattened to its text form
  private[catalog] case class PCol(name: String, dataType: String, position: Int, comment: Option[String],
      nullable: Boolean, partitionIndex: Option[Int])
  private[catalog] case class PTable(name: String, catalogName: String, schemaName: String,
      tableType: String, fileType: String, columns: Seq[PCol], storageLocation: Option[String],
      comment: Option[String], properties: Map[String, String], createdAtMs: Long,
      updatedAtMs: Option[Long], tableId: String)
  private[catalog] case class PState(catalogs: Seq[CatalogInfo], schemas: Seq[SchemaInfo], tables: Seq[PTable])
}
