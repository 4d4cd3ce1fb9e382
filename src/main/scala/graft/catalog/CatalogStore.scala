package graft.catalog

import java.util.UUID
import scala.collection.mutable

/** Catalog control plane — the capability surface of the reference's UC
  * REST wrapper (/root/reference/uchelper/uc_api_wrapper.py, C1-C20 in
  * SURVEY.md §2.1) behind a store trait. The default implementation is
  * in-process (no REST hop — the Spark driver owns the metadata), which
  * also removes the reference's non-atomic delete+recreate window
  * (uc_api_wrapper.py:470-515) from the data path.
  */
trait CatalogStore {

  // ---- catalogs (C1-C5) ----
  def createCatalog(c: CatalogInfo): CatalogInfo
  def getCatalog(name: String): CatalogInfo
  def listCatalogs(maxResults: Option[Int] = None, pageToken: Option[String] = None): (Seq[CatalogInfo], Option[String])
  def updateCatalog(name: String, newName: Option[String] = None, comment: Option[String] = None,
      properties: Option[Map[String, String]] = None): CatalogInfo
  def deleteCatalog(name: String, force: Boolean = false): Unit

  // ---- schemas (C6-C10) ----
  def createSchema(s: SchemaInfo): SchemaInfo
  def getSchema(catalog: String, name: String): SchemaInfo
  def listSchemas(catalog: String, maxResults: Option[Int] = None, pageToken: Option[String] = None): (Seq[SchemaInfo], Option[String])
  def updateSchema(catalog: String, name: String, newName: Option[String] = None,
      comment: Option[String] = None, properties: Option[Map[String, String]] = None): SchemaInfo
  def deleteSchema(catalog: String, name: String, force: Boolean = false): Unit

  // ---- tables (C11-C17) ----
  def createTable(t: TableInfo): TableInfo
  def getTable(catalog: String, schema: String, name: String): TableInfo
  def listTables(catalog: String, schema: String, maxResults: Option[Int] = None,
      pageToken: Option[String] = None): (Seq[TableInfo], Option[String])
  /** Update comment/properties only (reference uc_api_wrapper.py:445-467). */
  def updateTable(catalog: String, schema: String, name: String,
      comment: Option[String] = None, properties: Option[Map[String, String]] = None): TableInfo
  def deleteTable(catalog: String, schema: String, name: String): Unit

  /** Replace full table metadata; on failure the original must survive
    * (reference overwrite_table with rollback, uc_api_wrapper.py:470-515).
    */
  def overwriteTable(t: TableInfo): TableInfo

  /** Validate columns exist, then store `;`-joined default merge columns
    * under the reserved property (reference uc_api_wrapper.py:518-550).
    */
  def setTableDefaultMergeColumns(catalog: String, schema: String, name: String,
      mergeColumns: Seq[String]): TableInfo = {
    val t = getTable(catalog, schema, name)
    val colNames = t.columns.map(_.name).toSet
    val missing = mergeColumns.filterNot(colNames.contains)
    if (missing.nonEmpty)
      throw DoesNotExistError(s"merge columns not in table ${t.fullName}: ${missing.mkString(", ")}")
    val props =
      if (mergeColumns.isEmpty) t.properties - TableInfo.DefaultMergeColumnsKey
      else t.properties + (TableInfo.DefaultMergeColumnsKey -> mergeColumns.mkString(";"))
    updateTable(catalog, schema, name, properties = Some(props))
  }

  /** Liveness check (reference health_check, uc_api_wrapper.py:59-74). */
  def healthCheck(): Boolean
}

/** Thread-safe in-memory store with UC-compatible error and pagination
  * semantics. Single-driver scope: on a real cluster only the driver
  * mutates catalog state, so a JVM-local store with synchronized access is
  * the correct concurrency domain (executors never touch it).
  */
final class InMemoryCatalogStore extends CatalogStore {

  private val catalogs = mutable.LinkedHashMap.empty[String, CatalogInfo]
  private val schemas = mutable.LinkedHashMap.empty[(String, String), SchemaInfo]
  private val tables = mutable.LinkedHashMap.empty[(String, String, String), TableInfo]

  private def now(): Long = System.currentTimeMillis()

  // ---- catalogs ----
  override def createCatalog(c: CatalogInfo): CatalogInfo = synchronized {
    if (catalogs.contains(c.name))
      throw AlreadyExistsError(s"catalog ${c.name} already exists")
    val rec = c.copy(createdAtMs = now(), id = UUID.randomUUID().toString)
    catalogs(c.name) = rec
    rec
  }

  override def getCatalog(name: String): CatalogInfo = synchronized {
    catalogs.getOrElse(name, throw DoesNotExistError(s"catalog $name does not exist"))
  }

  override def listCatalogs(maxResults: Option[Int], pageToken: Option[String]): (Seq[CatalogInfo], Option[String]) =
    synchronized { paginate(catalogs.values.toSeq.sortBy(_.name), (c: CatalogInfo) => c.name, maxResults, pageToken) }

  override def updateCatalog(name: String, newName: Option[String], comment: Option[String],
      properties: Option[Map[String, String]]): CatalogInfo = synchronized {
    val cur = getCatalog(name)
    val target = newName.getOrElse(name)
    if (target != name && catalogs.contains(target))
      throw AlreadyExistsError(s"catalog $target already exists")
    val updated = cur.copy(
      name = target,
      comment = comment.orElse(cur.comment),
      properties = properties.getOrElse(cur.properties),
      updatedAtMs = Some(now()))
    if (target != name) {
      catalogs.remove(name)
      // cascade rename into children
      val movedSchemas = schemas.collect { case ((c, s), v) if c == name => ((target, s), v.copy(catalogName = target)) }
      schemas.filterInPlace { case ((c, _), _) => c != name }
      schemas ++= movedSchemas
      val movedTables = tables.collect { case ((c, s, t), v) if c == name => ((target, s, t), v.copy(catalogName = target)) }
      tables.filterInPlace { case ((c, _, _), _) => c != name }
      tables ++= movedTables
    }
    catalogs(target) = updated
    updated
  }

  override def deleteCatalog(name: String, force: Boolean): Unit = synchronized {
    getCatalog(name)
    val children = schemas.keys.count(_._1 == name)
    if (children > 0 && !force)
      throw UnsupportedOperationError(s"catalog $name is not empty; use force")
    schemas.filterInPlace { case ((c, _), _) => c != name }
    tables.filterInPlace { case ((c, _, _), _) => c != name }
    catalogs.remove(name)
  }

  // ---- schemas ----
  override def createSchema(s: SchemaInfo): SchemaInfo = synchronized {
    getCatalog(s.catalogName)
    val key = (s.catalogName, s.name)
    if (schemas.contains(key))
      throw AlreadyExistsError(s"schema ${s.fullName} already exists")
    val rec = s.copy(createdAtMs = now(), schemaId = UUID.randomUUID().toString)
    schemas(key) = rec
    rec
  }

  override def getSchema(catalog: String, name: String): SchemaInfo = synchronized {
    schemas.getOrElse((catalog, name),
      throw DoesNotExistError(s"schema $catalog.$name does not exist"))
  }

  override def listSchemas(catalog: String, maxResults: Option[Int], pageToken: Option[String]): (Seq[SchemaInfo], Option[String]) =
    synchronized {
      getCatalog(catalog)
      paginate(schemas.values.filter(_.catalogName == catalog).toSeq.sortBy(_.name), (s: SchemaInfo) => s.name, maxResults, pageToken)
    }

  override def updateSchema(catalog: String, name: String, newName: Option[String],
      comment: Option[String], properties: Option[Map[String, String]]): SchemaInfo = synchronized {
    val cur = getSchema(catalog, name)
    val target = newName.getOrElse(name)
    if (target != name && schemas.contains((catalog, target)))
      throw AlreadyExistsError(s"schema $catalog.$target already exists")
    val updated = cur.copy(
      name = target,
      comment = comment.orElse(cur.comment),
      properties = properties.getOrElse(cur.properties),
      updatedAtMs = Some(now()))
    if (target != name) {
      schemas.remove((catalog, name))
      val moved = tables.collect { case ((c, s, t), v) if c == catalog && s == name =>
        ((c, target, t), v.copy(schemaName = target)) }
      tables.filterInPlace { case ((c, s, _), _) => !(c == catalog && s == name) }
      tables ++= moved
    }
    schemas((catalog, target)) = updated
    updated
  }

  override def deleteSchema(catalog: String, name: String, force: Boolean): Unit = synchronized {
    getSchema(catalog, name)
    val children = tables.keys.count { case (c, s, _) => c == catalog && s == name }
    if (children > 0 && !force)
      throw UnsupportedOperationError(s"schema $catalog.$name is not empty; use force")
    tables.filterInPlace { case ((c, s, _), _) => !(c == catalog && s == name) }
    schemas.remove((catalog, name))
  }

  // ---- tables ----
  override def createTable(t: TableInfo): TableInfo = synchronized {
    getSchema(t.catalogName, t.schemaName)
    val key = (t.catalogName, t.schemaName, t.name)
    if (tables.contains(key))
      throw AlreadyExistsError(s"table ${t.fullName} already exists")
    val rec = t.copy(createdAtMs = now(), tableId = UUID.randomUUID().toString)
    tables(key) = rec
    rec
  }

  override def getTable(catalog: String, schema: String, name: String): TableInfo = synchronized {
    tables.getOrElse((catalog, schema, name),
      throw DoesNotExistError(s"table $catalog.$schema.$name does not exist"))
  }

  override def listTables(catalog: String, schema: String, maxResults: Option[Int],
      pageToken: Option[String]): (Seq[TableInfo], Option[String]) = synchronized {
    getSchema(catalog, schema)
    paginate(tables.values.filter(t => t.catalogName == catalog && t.schemaName == schema)
      .toSeq.sortBy(_.name), (t: TableInfo) => t.name, maxResults, pageToken)
  }

  override def updateTable(catalog: String, schema: String, name: String,
      comment: Option[String], properties: Option[Map[String, String]]): TableInfo = synchronized {
    val cur = getTable(catalog, schema, name)
    val updated = cur.copy(
      comment = comment.orElse(cur.comment),
      properties = properties.getOrElse(cur.properties),
      updatedAtMs = Some(now()))
    tables((catalog, schema, name)) = updated
    updated
  }

  override def deleteTable(catalog: String, schema: String, name: String): Unit = synchronized {
    getTable(catalog, schema, name)
    tables.remove((catalog, schema, name))
  }

  override def overwriteTable(t: TableInfo): TableInfo = synchronized {
    val key = (t.catalogName, t.schemaName, t.name)
    val original = tables.get(key)
    original.foreach(_ => tables.remove(key))
    try createTable(t)
    catch {
      case e: Throwable =>
        original.foreach(tables(key) = _) // rollback (uc_api_wrapper.py:497-515)
        throw e
    }
  }

  override def healthCheck(): Boolean = true

  private def paginate[T](sorted: Seq[T], keyOf: T => String, maxResults: Option[Int],
      pageToken: Option[String]): (Seq[T], Option[String]) = {
    val from = pageToken match {
      case Some(tok) => sorted.indexWhere(t => keyOf(t) > tok) match {
        case -1 => sorted.length
        case i => i
      }
      case None => 0
    }
    val limited = maxResults match {
      case Some(n) if n > 0 => sorted.slice(from, from + n)
      case _ => sorted.drop(from)
    }
    val nextToken =
      if (limited.nonEmpty && from + limited.length < sorted.length) Some(keyOf(limited.last))
      else None
    (limited, nextToken)
  }
}
