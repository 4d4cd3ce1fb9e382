package graft.client

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.catalog._
import graft.io.TableIO
import graft.tables.{DeltaLog, TxLog, TxMerge, TxTable}

/** The user-facing facade — the reference's `UCClient` surface
  * (/root/reference/uchelper/client.py) over an in-process catalog store
  * and Spark execution. One class gives: catalog/schema/table CRUD,
  * read/scan, the full write matrix, create-as/register-as table, MERGE
  * with default-merge-column synthesis, property sync, and SQL over the
  * registered tables.
  */
final class LakehouseClient(val spark: SparkSession, val store: CatalogStore = new InMemoryCatalogStore) {

  // make this client's catalogs visible to 3-part names in spark.sql
  // (effective when the session was built with GraftSqlExtensions.install)
  graft.sql.GraftSqlExtensions.register(this)

  // ---- catalog CRUD passthrough (C1-C17) ----
  def createCatalog(name: String, comment: Option[String] = None): CatalogInfo =
    store.createCatalog(CatalogInfo(name, comment))
  def getCatalog(name: String): CatalogInfo = store.getCatalog(name)
  def listCatalogs(): Seq[CatalogInfo] = store.listCatalogs()._1
  def deleteCatalog(name: String, force: Boolean = false): Unit = store.deleteCatalog(name, force)

  def createSchema(catalog: String, name: String, comment: Option[String] = None): SchemaInfo =
    store.createSchema(SchemaInfo(name, catalog, comment))
  def getSchema(catalog: String, name: String): SchemaInfo = store.getSchema(catalog, name)
  def listSchemas(catalog: String): Seq[SchemaInfo] = store.listSchemas(catalog)._1
  def deleteSchema(catalog: String, name: String, force: Boolean = false): Unit =
    store.deleteSchema(catalog, name, force)

  def createTable(t: TableInfo): TableInfo = store.createTable(t)
  def getTable(catalog: String, schema: String, name: String): TableInfo =
    store.getTable(catalog, schema, name)
  def listTables(catalog: String, schema: String): Seq[TableInfo] =
    store.listTables(catalog, schema)._1
  def deleteTable(catalog: String, schema: String, name: String): Unit =
    store.deleteTable(catalog, schema, name)
  def setTableDefaultMergeColumns(catalog: String, schema: String, name: String,
      cols: Seq[String]): TableInfo =
    store.setTableDefaultMergeColumns(catalog, schema, name, cols)

  // ---- reads (T4) ----

  /** Eager-equivalent read (reference read_table, client.py:309-314).
    * Spark is lazy; eagerness in the reference is observational only
    * (SURVEY §7.4.2), so both readTable and scanTable return the plan.
    */
  def readTable(catalog: String, schema: String, name: String): DataFrame =
    TableIO.read(spark, getTable(catalog, schema, name))

  /** Lazy read (reference scan_table, client.py:316-321). */
  def scanTable(catalog: String, schema: String, name: String): DataFrame =
    readTable(catalog, schema, name)

  // ---- writes (T3) ----

  def writeTable(
      df: DataFrame,
      catalog: String, schema: String, name: String,
      mode: WriteMode = WriteMode.APPEND,
      schemaEvolution: SchemaEvolution = SchemaEvolution.STRICT,
      partitionFilters: Seq[(String, String, String)] = Seq.empty,
      replaceWhere: Option[String] = None): Unit = {
    val t = getTable(catalog, schema, name)
    val result = TableIO.write(spark, t, df, mode, schemaEvolution, partitionFilters, replaceWhere)
    // W10: push the evolved schema into the catalog
    result.evolvedColumns.foreach { cols =>
      store.overwriteTable(t.copy(columns = cols))
    }
  }

  /** String-typed convenience overload (the reference coerces literals,
    * client.py:381-384 / utils.py:39-61).
    */
  def writeTable(df: DataFrame, catalog: String, schema: String, name: String,
      mode: String, schemaEvolution: String): Unit =
    writeTable(df, catalog, schema, name,
      WriteMode.fromString(mode), SchemaEvolution.fromString(schemaEvolution))

  /** T1 create_as_table: infer catalog schema from the frame, register,
    * write data (reference client.py:429-487). EXTERNAL location required.
    */
  def createAsTable(
      df: DataFrame,
      catalog: String, schema: String, name: String,
      fileType: FileType,
      location: String,
      partitionColumns: Seq[String] = Seq.empty): TableInfo = {
    if (partitionColumns.nonEmpty && fileType != FileType.DELTA &&
        fileType != FileType.PARQUET && fileType != FileType.ICEBERG)
      throw UnsupportedOperationError(
        s"partitioned tables are only supported for DELTA, ICEBERG and PARQUET, not $fileType") // client.py:464-467
    val cols = TableInfo.columnsFromSchema(df.schema, partitionColumns)
    val t = store.createTable(TableInfo(
      name = name, catalogName = catalog, schemaName = schema,
      tableType = TableType.EXTERNAL, fileType = fileType, columns = cols,
      storageLocation = Some(location)))
    fileType match {
      case FileType.DELTA =>
        TxTable.forLocation(spark, TableIO.normalize(location)).create(df, partitionColumns)
      case FileType.ICEBERG =>
        graft.tables.IcebergWriter.create(spark, TableIO.normalize(location), df, partitionColumns)
      case _ =>
        TableIO.write(spark, t, df, WriteMode.OVERWRITE, SchemaEvolution.OVERWRITE)
    }
    t
  }

  /** T2 register_as_table: point at existing storage, infer the schema,
    * create only the catalog entry (reference client.py:489-535).
    */
  def registerAsTable(
      catalog: String, schema: String, name: String,
      fileType: FileType,
      location: String): TableInfo = {
    val (inferred, partCols) = TableIO.inferSchema(spark, fileType, location)
    // partition columns honored for DELTA/ICEBERG/PARQUET only (client.py:523-527)
    val effectiveParts = fileType match {
      case FileType.DELTA | FileType.ICEBERG | FileType.PARQUET => partCols
      case _ => Seq.empty
    }
    store.createTable(TableInfo(
      name = name, catalogName = catalog, schemaName = schema,
      tableType = TableType.EXTERNAL, fileType = fileType,
      columns = TableInfo.columnsFromSchema(inferred, effectiveParts),
      storageLocation = Some(location)))
  }

  // ---- merge (M1/M2) ----

  /** Transactional-table handle (reference get_delta_table, C18). Backed
    * by the native `_graft_log`, the real Delta protocol, or the Iceberg
    * log (forAnyLocation dispatches on what is on disk) — MERGE / time
    * travel / change feeds / DML work on all three.
    */
  def getTxTable(catalog: String, schema: String, name: String): TxTable = {
    val t = getTable(catalog, schema, name)
    if (t.fileType != FileType.DELTA && t.fileType != FileType.ICEBERG)
      throw UnsupportedOperationError(
        s"table ${t.fullName} is not a transactional (DELTA/ICEBERG) table")
    TxTable.forAnyLocation(spark, TableIO.normalize(t.storageLocation.get))
  }

  /** Build a MERGE. With no condition, synthesizes `s.c = t.c AND ...`
    * from the table's default merge columns property (M2, reference
    * dataframe.py:180-188).
    */
  def mergeTable(
      df: DataFrame,
      catalog: String, schema: String, name: String,
      mergeCondition: Option[String] = None,
      sourceAlias: String = "s",
      targetAlias: String = "t"): TxMerge = {
    val t = getTable(catalog, schema, name)
    val condition = mergeCondition.getOrElse {
      val cols = t.defaultMergeColumns
      if (cols.isEmpty)
        throw UnsupportedOperationError(
          s"no merge condition given and table ${t.fullName} has no default merge columns")
      cols.map(c => s"$sourceAlias.`$c` = $targetAlias.`$c`").mkString(" AND ")
    }
    getTxTable(catalog, schema, name).merge(df, condition, sourceAlias, targetAlias)
  }

  /** C19 sync: copy the table's log configuration into the catalog record,
    * dropping stale synced entries first (reference sync_delta_properties,
    * uc_api_wrapper.py:567-590: strips `delta.*` then merges the Delta
    * metadata configuration verbatim). Works on native `_graft_log` tables
    * AND foreign `_delta_log` tables (whose configuration is the `delta.*`
    * property set the reference op exists for); `graft.table.version` /
    * `numFiles` diagnostics ride along.
    */
  /** Re-read the log schema and push it into the catalog record — the
    * W10 reconciliation shape, for metadata-only DDL (DROP COLUMN etc.)
    * that changes the schema without a write. Columns are matched BY
    * NAME: same-named survivors keep their identity (comment,
    * partition_index); renames must update the catalog record directly
    * instead (see rewriteRenameColumn) or the renamed column's identity
    * is lost.
    */
  def syncTableSchema(catalog: String, schema: String, name: String): TableInfo = {
    val t = getTable(catalog, schema, name)
    val snapSchema = getTxTable(catalog, schema, name).snapshot.schema
    val old = t.columns.map(c => c.name -> c).toMap
    val cols = snapSchema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      old.get(f.name) match {
        case Some(c) => c.copy(dataType = graft.types.UcType.fromSpark(f.dataType),
          position = i, nullable = f.nullable)
        case None => graft.catalog.ColumnInfo(f.name,
          graft.types.UcType.fromSpark(f.dataType), i, nullable = f.nullable)
      }
    }
    store.overwriteTable(t.copy(columns = cols))
  }

  def syncTableProperties(catalog: String, schema: String, name: String): TableInfo = {
    val t = getTable(catalog, schema, name)
    val snap = getTxTable(catalog, schema, name).snapshot
    val kept = t.properties.filterNot { case (k, _) =>
      k.startsWith("graft.table.") || k.startsWith("delta.") }
    val fromLog = snap.properties ++
      Map("graft.table.version" -> snap.version.toString,
        "graft.table.numFiles" -> snap.files.size.toString)
    store.updateTable(catalog, schema, name, properties = Some(kept ++ fromLog))
  }

  // ---- SQL (Q1) ----

  /** Run SQL over all registered tables. Two naming schemes:
    *   - true 3-part `<catalog>.<schema>.<table>` names, when the session
    *     was built with GraftSqlExtensions.install (resolution-rule route);
    *   - flat `<catalog>_<schema>_<table>` temp views, registered here,
    *     which work in any session.
    * Strictly more capable than the reference's read-only Delta-only
    * DuckDB passthrough (client.py:537-544): all formats, full Spark SQL.
    */
  def sql(query: String): DataFrame = {
    registerAllViews()
    spark.sql(query)
  }

  /** Flat-view versions already registered, keyed by view name — DELTA
    * views whose log version hasn't moved are NOT re-read on the next
    * sql() call (a snapshot replay per table per statement was the
    * round-1 cost). Non-Delta formats stay eagerly re-registered: their
    * reads are a cheap lazy directory listing, and file-level changes
    * carry no version to key a cache on.
    */
  private val deltaViewVersions = scala.collection.mutable.Map.empty[String, (String, Long)]

  def registerAllViews(): Unit = {
    store.listCatalogs()._1.foreach { c =>
      store.listSchemas(c.name)._1.foreach { s =>
        store.listTables(c.name, s.name)._1.foreach { t =>
          val viewName = s"${c.name}_${s.name}_${t.name}"
          // keyed on (location, version): a drop-and-recreate at a new
          // location with the same version must invalidate too
          val currentKey: Option[(String, Long)] =
            if (t.fileType != FileType.DELTA) None
            else t.storageLocation.map(TableIO.normalize).flatMap { loc =>
              TxLog.latestVersion(spark, loc)
                .orElse(DeltaLog.latestVersion(spark, loc))
                .map(loc -> _)
            }
          val fresh = currentKey.exists(k =>
            deltaViewVersions.get(viewName).contains(k) && spark.catalog.tableExists(viewName))
          if (!fresh) {
            readTable(c.name, s.name, t.name).createOrReplaceTempView(viewName)
            currentKey.foreach(deltaViewVersions(viewName) = _)
          }
        }
      }
    }
  }

  def healthCheck(): Boolean = store.healthCheck()
}
