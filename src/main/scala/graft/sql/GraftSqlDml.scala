package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.classic.{SparkSession => ClassicSparkSession}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, expr, lit}

import graft.catalog.{DoesNotExistError, UnsupportedOperationError, WriteMode}
import graft.client.LakehouseClient

/** SQL DML over 3-part catalog names — the write-side counterpart of
  * `ResolveGraftRelations`'s read rewrites:
  *
  *   INSERT INTO / INSERT OVERWRITE [PARTITION (...)] [BY NAME] cat.sch.t
  *   DELETE FROM cat.sch.t [alias] WHERE ...
  *   UPDATE cat.sch.t [alias] SET ... [WHERE ...]
  *   MERGE INTO cat.sch.t [AS t] USING src [AS s] ON ... WHEN ...
  *
  * Each statement is rewritten (at analysis) into a leaf command that, at
  * execution, routes through the SAME LakehouseClient/TxTable surface the
  * programmatic API uses — so SQL writes get the full write matrix
  * (mode × evolution guards, replaceWhere-style partition overwrites,
  * merge-on-read deletes, row tracking, CDF) on all three log formats.
  * The statement's source query is kept UNRESOLVED inside the command and
  * analyzed only when the command runs, avoiding re-entrant analysis from
  * inside an analyzer rule; 3-part names inside it resolve through the
  * normal read rule then.
  */
object GraftSqlDml {

  /** An eagerly-executed DML action. Equality is over `label` — plan
    * nodes must be comparable, thunks are not — so every call site builds
    * the label via [[cmdLabel]], which appends a fingerprint of the FULL
    * statement: two commands on the same table with different
    * predicates/assignments/bodies must never compare equal, or Catalyst
    * machinery that dedups/caches by plan equality could conflate them.
    */
  final case class GraftDmlCommand(label: String)(body: () => Unit)
      extends LeafRunnableCommand {
    override def run(sparkSession: SparkSession): Seq[Row] = { body(); Seq.empty }
    override def simpleString(maxFields: Int): String = s"GraftDml $label"
    // the second (non-case) parameter list must ride along when the
    // analyzer clones the node (TreeNode.makeCopy)
    override protected def otherCopyArgs: Seq[AnyRef] = Seq(body)
  }

  /** Human-readable head plus a fingerprint of the originating statement
    * (plan `toString` is deterministic), keeping distinct statements
    * distinct under label-only case equality.
    */
  private def cmdLabel(head: String, stmt: Any): String =
    f"$head [${stmt.toString.hashCode}%08x]"

  /** Unwrap `[SubqueryAlias] UnresolvedRelation(cat.sch.tbl)` into the
    * 3-part name + the user's alias (None when unaliased). Non-3-part or
    * non-catalog targets return None and the statement falls through to
    * Spark's own resolution.
    */
  private def target3(client: LakehouseClient, plan: LogicalPlan)
      : Option[(Seq[String], Option[String])] = {
    val (inner, alias) = plan match {
      case SubqueryAlias(id, child) => (child, Some(id.name))
      case other => (other, None)
    }
    inner match {
      case UnresolvedRelation(parts, _, _) if parts.length == 3 =>
        try { client.getTable(parts(0), parts(1), parts(2)); Some((parts, alias)) }
        catch { case _: DoesNotExistError => None }
      case _ => None
    }
  }

  /** Strip a leading target-alias qualifier from attribute references so
    * predicate SQL evaluates against the unaliased table frame
    * (`DELETE FROM t x WHERE x.id = 1` → `id = 1`). Subqueries cannot
    * round-trip through unresolved Expression.sql (they render as
    * placeholders TxTable's predicate parser cannot execute) — refuse
    * them up front with a clear message instead of a downstream parse
    * error.
    */
  private def stripAlias(e: Expression, alias: Option[String]): Expression = {
    e.foreach {
      case _: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw UnsupportedOperationError(
          "subqueries in DELETE/UPDATE conditions are not supported; " +
            "use MERGE INTO with the subquery as the source instead")
      case _ => ()
    }
    alias.fold(e) { a =>
      e.transform {
        case attr: UnresolvedAttribute
            if attr.nameParts.length > 1 && attr.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(attr.nameParts.tail)
      }
    }
  }

  /** Assignment target column: after stripping the target alias the key
    * must be a SINGLE name part — a nested-field target (`SET a.b = 1`)
    * would otherwise silently become an assignment to top-level `b`.
    */
  private def assignName(key: Expression, alias: Option[String]): String =
    stripAlias(key, alias) match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
      case a: UnresolvedAttribute =>
        throw UnsupportedOperationError(
          s"nested field updates are not supported (SET ${a.name} = ...)")
      case other => other.sql
    }

  /** 4-part branch target `cat.s.t.branch_<name>` — Iceberg's suffix
    * syntax for writing to a snapshot branch (the WAP staging write).
    */
  private def branchTarget(client: LakehouseClient,
      plan: LogicalPlan): Option[(Seq[String], String)] = plan match {
    case UnresolvedRelation(parts, _, _) if parts.length == 4 &&
        parts(3).startsWith("branch_") =>
      val p = parts.take(3)
      try { client.getTable(p(0), p(1), p(2)); Some((p, parts(3).stripPrefix("branch_"))) }
      catch { case _: DoesNotExistError => None }
    case _ => None
  }

  /** INSERT INTO cat.s.t.branch_<b> SELECT ... — stage rows on an Iceberg
    * branch (write-audit-publish): the append advances only the branch;
    * main readers see nothing until FAST FORWARD publishes it.
    */
  def rewriteInsertToBranch(session: ClassicSparkSession, client: LakehouseClient,
      i: InsertIntoStatement): Option[LogicalPlan] =
    branchTarget(client, i.table).map { case (parts, branch) =>
      val Seq(cat, sch, tbl) = parts
      if (i.overwrite || i.partitionSpec.nonEmpty || i.userSpecifiedCols.nonEmpty)
        throw UnsupportedOperationError(
          "branch staging supports plain INSERT INTO (append) only")
      GraftDmlCommand(cmdLabel(s"INSERT INTO $cat.$sch.$tbl.branch_$branch", i)) { () =>
        val info = client.getTable(cat, sch, tbl)
        if (info.fileType != graft.catalog.FileType.ICEBERG)
          throw UnsupportedOperationError(
            s"branch writes require an ICEBERG table; ${info.fullName} is ${info.fileType}")
        val loc = graft.io.TableIO.normalize(info.storageLocation.get)
        val targetSchema = client.readTable(cat, sch, tbl).schema
        val src = org.apache.spark.sql.GraftColumnBridge.ofRows(session, i.query)
        val positioned =
          if (i.byName) src.select(targetSchema.fieldNames.toIndexedSeq.map(n => col(n)): _*)
          else {
            if (src.columns.length != targetSchema.fields.length)
              throw UnsupportedOperationError(
                s"INSERT: query produces ${src.columns.length} columns, " +
                  s"target expects ${targetSchema.fields.length}")
            src.toDF(targetSchema.fieldNames.toIndexedSeq: _*)
          }
        val aligned = positioned.select(targetSchema.fields.toIndexedSeq.map(f =>
          col(f.name).cast(f.dataType).as(f.name)): _*)
        graft.tables.IcebergWriter.appendToBranch(session, loc, aligned, branch)
      }
    }

  def rewriteInsert(session: ClassicSparkSession, client: LakehouseClient,
      i: InsertIntoStatement): Option[LogicalPlan] =
    target3(client, i.table).map { case (parts, _) =>
      val Seq(cat, sch, tbl) = parts
      if (i.ifPartitionNotExists)
        throw UnsupportedOperationError("INSERT ... IF NOT EXISTS is not supported")
      val static = i.partitionSpec.collect { case (k, Some(v)) => k -> v }
      val dynamicSpec = i.partitionSpec.collect { case (k, None) => k }.toSeq
      GraftDmlCommand(cmdLabel(s"INSERT INTO $cat.$sch.$tbl", i)) { () =>
        val targetSchema = client.readTable(cat, sch, tbl).schema
        val src = org.apache.spark.sql.GraftColumnBridge.ofRows(session, i.query)
        def typeOf(n: String) = targetSchema.fields
          .find(_.name.equalsIgnoreCase(n))
          .getOrElse(throw UnsupportedOperationError(s"unknown column $n in $cat.$sch.$tbl"))
          .dataType
        // columns the query must supply, in order: the user list, else
        // every table column not pinned by a static PARTITION value
        val expect: Seq[String] =
          if (i.userSpecifiedCols.nonEmpty) i.userSpecifiedCols
          else targetSchema.fieldNames.toSeq.filterNot(n =>
            static.keys.exists(_.equalsIgnoreCase(n)))
        val positioned =
          if (i.byName) {
            val missing = expect.filterNot(n => src.columns.exists(_.equalsIgnoreCase(n)))
            if (missing.nonEmpty) throw UnsupportedOperationError(
              s"INSERT BY NAME: source is missing columns ${missing.mkString(", ")}")
            src.select(expect.map(n => col(n)): _*)
          } else {
            if (src.columns.length != expect.length) throw UnsupportedOperationError(
              s"INSERT: query produces ${src.columns.length} columns, " +
                s"target expects ${expect.length} (${expect.mkString(", ")})")
            src.toDF(expect: _*)
          }
        val withStatic = static.foldLeft(positioned) { case (d, (k, v)) =>
          d.withColumn(k, lit(v).cast(typeOf(k)))
        }
        // table columns the statement never mentions (column-list INSERT)
        // fill with NULL, Spark/ANSI-style
        val aligned = withStatic.select(targetSchema.fields.toIndexedSeq.map { f =>
          val have = withStatic.columns.exists(_.equalsIgnoreCase(f.name))
          (if (have) col(f.name).cast(f.dataType)
           else lit(null).cast(f.dataType)).as(f.name)
        }: _*)
        // spark.sql.sources.partitionOverwriteMode=dynamic narrows INSERT
        // OVERWRITE on a partitioned table to "replace only the partitions
        // present in the data" — full OVERWRITE here would silently drop
        // untouched partitions for users running with that conf. Parquet
        // tables already get dynamic semantics from the write matrix (W6,
        // the reference's delete_matching); transactional logs route
        // through TxTable's dynamic overwrite.
        val info = client.getTable(cat, sch, tbl)
        val partitioned = info.columns.exists(_.partitionIndex.isDefined)
        val transactional = info.fileType == graft.catalog.FileType.DELTA ||
          info.fileType == graft.catalog.FileType.ICEBERG
        val dynamicMode = session.conf
          .get("spark.sql.sources.partitionOverwriteMode", "static")
          .equalsIgnoreCase("dynamic")
        if (!i.overwrite)
          client.writeTable(aligned, cat, sch, tbl, WriteMode.APPEND)
        else if (dynamicMode && partitioned && transactional)
          // static PARTITION values (if any) are already constant columns
          // in `aligned`, so the touched-partition set is a subset of the
          // static spec — dynamic overwrite covers both spec shapes
          client.getTxTable(cat, sch, tbl).overwritePartitionsDynamic(aligned)
        else if (static.isEmpty)
          client.writeTable(aligned, cat, sch, tbl, WriteMode.OVERWRITE)
        else
          // static PARTITION values → selective partition overwrite; any
          // dynamic columns in the spec ride the rows as usual
          client.writeTable(aligned, cat, sch, tbl, WriteMode.OVERWRITE,
            partitionFilters = static.toSeq.map { case (k, v) => (k, "=", v) })
        val _ = dynamicSpec // dynamic spec columns are just row columns
      }
    }

  def rewriteDelete(session: ClassicSparkSession, client: LakehouseClient,
      target: LogicalPlan, condition: Expression): Option[LogicalPlan] =
    target3(client, target).map { case (parts, alias) =>
      val Seq(cat, sch, tbl) = parts
      val predicate = stripAlias(condition, alias).sql
      GraftDmlCommand(cmdLabel(s"DELETE FROM $cat.$sch.$tbl", condition)) { () =>
        client.getTxTable(cat, sch, tbl).delete(predicate)
      }
    }

  def rewriteUpdate(session: ClassicSparkSession, client: LakehouseClient,
      target: LogicalPlan, assignments: Seq[Assignment],
      condition: Option[Expression]): Option[LogicalPlan] =
    target3(client, target).map { case (parts, alias) =>
      val Seq(cat, sch, tbl) = parts
      val predicate = condition.map(c => stripAlias(c, alias).sql).getOrElse("true")
      val set = assignments.map(a =>
        assignName(a.key, alias) -> stripAlias(a.value, alias).sql).toMap
      GraftDmlCommand(cmdLabel(s"UPDATE $cat.$sch.$tbl", (assignments, condition))) { () =>
        client.getTxTable(cat, sch, tbl).update(predicate, set)
      }
    }

  // ---- DDL: CREATE TABLE [AS SELECT] / REPLACE / DROP on 3-part names ----

  /** 3-part UnresolvedIdentifier whose leading part names a catalog this
    * client manages (DDL targets don't exist yet, so the gate is the
    * CATALOG, not the table).
    */
  private def ddlTarget3(client: LakehouseClient, name: LogicalPlan): Option[Seq[String]] =
    name match {
      case org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier(parts, _)
          if parts.length == 3 =>
        try { client.getCatalog(parts.head); Some(parts) }
        catch { case _: DoesNotExistError => None }
      case _ => None
    }

  private def fileTypeOf(provider: Option[String]): graft.catalog.FileType = {
    import graft.catalog.FileType
    provider.map(_.toLowerCase(java.util.Locale.ROOT)) match {
      case None | Some("delta") => FileType.DELTA
      case Some("iceberg") => FileType.ICEBERG
      case Some("parquet") => FileType.PARQUET
      case Some("csv") => FileType.CSV
      case Some("avro") => FileType.AVRO
      case Some("json") => FileType.JSON
      case Some("orc") => FileType.ORC
      case Some("text") => FileType.TEXT
      case Some(other) =>
        throw UnsupportedOperationError(s"unsupported table provider $other")
    }
  }

  private def specOf(tableSpec: TableSpecBase): (Option[String], Option[String]) =
    tableSpec match {
      case u: UnresolvedTableSpec => (u.provider, u.location)
      case t: TableSpec => (t.provider, t.location)
      case other =>
        throw UnsupportedOperationError(s"unsupported table spec $other")
    }

  private def identityCols(
      partitioning: Seq[org.apache.spark.sql.connector.expressions.Transform]): Seq[String] =
    partitioning.map { t =>
      if (t.name != "identity" || t.references.length != 1)
        throw UnsupportedOperationError(
          s"only identity PARTITIONED BY columns are supported in SQL, got $t")
      t.references.head.fieldNames.mkString(".")
    }

  private def locationOrThrow(loc: Option[String], what: String): String =
    loc.getOrElse(throw UnsupportedOperationError(
      s"$what requires LOCATION '<path>' — catalog tables are EXTERNAL"))

  def rewriteCreateTableAsSelect(session: ClassicSparkSession, client: LakehouseClient,
      ct: CreateTableAsSelect): Option[LogicalPlan] =
    ddlTarget3(client, ct.name).map { parts =>
      val Seq(cat, sch, tbl) = parts
      val ft = fileTypeOf(specOf(ct.tableSpec)._1)
      val loc = locationOrThrow(specOf(ct.tableSpec)._2, "CREATE TABLE AS SELECT")
      val partCols = identityCols(ct.partitioning)
      GraftDmlCommand(cmdLabel(s"CREATE TABLE $cat.$sch.$tbl AS SELECT", ct)) { () =>
        val exists =
          try { client.getTable(cat, sch, tbl); true }
          catch { case _: DoesNotExistError => false }
        if (exists) {
          if (!ct.ignoreIfExists)
            throw graft.catalog.AlreadyExistsError(s"table $cat.$sch.$tbl already exists")
          // IF NOT EXISTS: no-op
        } else {
          val df = org.apache.spark.sql.GraftColumnBridge.ofRows(session, ct.query)
          client.createAsTable(df, cat, sch, tbl, ft, loc, partCols)
        }
      }
    }

  def rewriteReplaceTableAsSelect(session: ClassicSparkSession, client: LakehouseClient,
      rt: ReplaceTableAsSelect): Option[LogicalPlan] =
    ddlTarget3(client, rt.name).map { parts =>
      val Seq(cat, sch, tbl) = parts
      val ft = fileTypeOf(specOf(rt.tableSpec)._1)
      val loc = locationOrThrow(specOf(rt.tableSpec)._2, "REPLACE TABLE AS SELECT")
      val partCols = identityCols(rt.partitioning)
      GraftDmlCommand(cmdLabel(s"REPLACE TABLE $cat.$sch.$tbl AS SELECT", rt)) { () =>
        val exists =
          try { client.getTable(cat, sch, tbl); true }
          catch { case _: DoesNotExistError => false }
        if (!exists && !rt.orCreate)
          throw DoesNotExistError(s"table $cat.$sch.$tbl does not exist (use OR REPLACE ... CREATE)")
        if (exists) client.deleteTable(cat, sch, tbl)
        val df = org.apache.spark.sql.GraftColumnBridge.ofRows(session, rt.query)
        client.createAsTable(df, cat, sch, tbl, ft, loc, partCols)
      }
    }

  def rewriteCreateTable(session: ClassicSparkSession, client: LakehouseClient,
      ct: CreateTable): Option[LogicalPlan] =
    ddlTarget3(client, ct.name).map { parts =>
      val Seq(cat, sch, tbl) = parts
      val ft = fileTypeOf(specOf(ct.tableSpec)._1)
      val loc = locationOrThrow(specOf(ct.tableSpec)._2, "CREATE TABLE")
      val partCols = identityCols(ct.partitioning)
      val schema = org.apache.spark.sql.types.StructType(ct.columns.map(c =>
        org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable)))
      GraftDmlCommand(cmdLabel(s"CREATE TABLE $cat.$sch.$tbl", ct)) { () =>
        val exists =
          try { client.getTable(cat, sch, tbl); true }
          catch { case _: DoesNotExistError => false }
        if (exists) {
          if (!ct.ignoreIfExists)
            throw graft.catalog.AlreadyExistsError(s"table $cat.$sch.$tbl already exists")
        } else {
          // register AND lay down an empty table of the declared schema,
          // so SELECT works before the first write
          val empty = session.createDataFrame(
            java.util.Collections.emptyList[Row](), schema)
          client.createAsTable(empty, cat, sch, tbl, ft, loc, partCols)
        }
      }
    }

  def rewriteDropTable(session: ClassicSparkSession, client: LakehouseClient,
      d: DropTable): Option[LogicalPlan] =
    ddlTarget3(client, d.child).map { parts =>
      val Seq(cat, sch, tbl) = parts
      GraftDmlCommand(cmdLabel(s"DROP TABLE $cat.$sch.$tbl", d)) { () =>
        try client.deleteTable(cat, sch, tbl)
        catch { case _: DoesNotExistError if d.ifExists => () }
      }
    }

  // ---- ALTER TABLE / SHOW / DESCRIBE ----

  /** A leaf command that RETURNS rows (SHOW/DESCRIBE) with the original
    * statement node's output attributes.
    */
  final case class GraftQueryCommand(label: String,
      override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])(
      rows: () => Seq[Row]) extends LeafRunnableCommand {
    override def run(sparkSession: SparkSession): Seq[Row] = rows()
    override def simpleString(maxFields: Int): String = s"GraftQuery $label"
    override protected def otherCopyArgs: Seq[AnyRef] = Seq(rows)
  }

  /** 3-part ALTER/DESCRIBE target (UnresolvedTable / UnresolvedTableOrView)
    * naming an existing catalog table.
    */
  private def alterTarget3(client: LakehouseClient, plan: LogicalPlan): Option[Seq[String]] = {
    val parts = plan match {
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTable => Some(t.multipartIdentifier)
      case t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView => Some(t.multipartIdentifier)
      case _ => None
    }
    parts.filter(_.length == 3).flatMap { p =>
      try { client.getTable(p(0), p(1), p(2)); Some(p) }
      catch { case _: DoesNotExistError => None }
    }
  }

  /** ALTER TABLE ... ADD COLUMNS: committed as an empty APPEND with MERGE
    * schema evolution — the evolved schema lands in the log (existing
    * rows read the new columns as NULL) and W10 pushes it into the
    * catalog, exactly like a programmatic evolving write.
    */
  def rewriteAddColumns(session: ClassicSparkSession, client: LakehouseClient,
      a: AddColumns): Option[LogicalPlan] =
    alterTarget3(client, a.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      a.columnsToAdd.foreach { c =>
        if (c.path.nonEmpty) throw UnsupportedOperationError(
          "ALTER TABLE ADD COLUMNS: nested column paths are not supported")
        if (c.position.nonEmpty) throw UnsupportedOperationError(
          "ALTER TABLE ADD COLUMNS: FIRST/AFTER positions are not supported")
        if (c.default.nonEmpty) throw UnsupportedOperationError(
          "ALTER TABLE ADD COLUMNS: DEFAULT values are not supported")
      }
      // Delta's rule: a column added to a table with existing rows must be
      // nullable — every existing row reads NULL for it, so committing
      // nullable=false would be inconsistent metadata. Force-nullable
      // rather than reject (the reference's ALTER path does the same).
      val newFields = a.columnsToAdd.map(c =>
        org.apache.spark.sql.types.StructField(c.colName, c.dataType, nullable = true))
      GraftDmlCommand(cmdLabel(s"ALTER TABLE $cat.$sch.$tbl ADD COLUMNS", a.columnsToAdd)) { () =>
        val current = client.readTable(cat, sch, tbl).schema
        val merged = org.apache.spark.sql.types.StructType(current.fields ++ newFields)
        val empty = session.createDataFrame(
          java.util.Collections.emptyList[Row](), merged)
        client.writeTable(empty, cat, sch, tbl,
          graft.catalog.WriteMode.APPEND, graft.catalog.SchemaEvolution.MERGE)
      }
    }

  /** ALTER TABLE ... RENAME COLUMN old TO new — metadata-only on
    * column-mapped Delta (auto-upgraded) and Iceberg; see
    * TxTable.renameColumn for the per-log contract. The catalog record
    * follows in the same command.
    */
  def rewriteRenameColumn(session: ClassicSparkSession, client: LakehouseClient,
      r: RenameColumn): Option[LogicalPlan] =
    alterTarget3(client, r.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      if (r.column.name.length != 1) throw UnsupportedOperationError(
        "ALTER TABLE RENAME COLUMN: nested column paths are not supported")
      val oldName = r.column.name.head
      GraftDmlCommand(s"ALTER TABLE $cat.$sch.$tbl RENAME COLUMN $oldName TO ${r.newName}") { () =>
        client.getTxTable(cat, sch, tbl).renameColumn(oldName, r.newName)
        // rename the catalog column IN PLACE so its identity (comment,
        // partition index) survives — the name-matched schema sync would
        // mint a fresh ColumnInfo and silently drop them
        val info = client.getTable(cat, sch, tbl)
        client.store.overwriteTable(info.copy(columns = info.columns.map(c =>
          if (c.name == oldName) c.copy(name = r.newName) else c)))
      }
    }

  /** ALTER TABLE ... DROP COLUMN(S) — metadata-only; see
    * TxTable.dropColumn.
    */
  def rewriteDropColumns(session: ClassicSparkSession, client: LakehouseClient,
      d: DropColumns): Option[LogicalPlan] =
    alterTarget3(client, d.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      val names = d.columnsToDrop.map { c =>
        if (c.name.length != 1) throw UnsupportedOperationError(
          "ALTER TABLE DROP COLUMN: nested column paths are not supported")
        c.name.head
      }
      if (d.ifExists) throw UnsupportedOperationError(
        "ALTER TABLE DROP COLUMN IF EXISTS is not supported")
      GraftDmlCommand(s"ALTER TABLE $cat.$sch.$tbl DROP COLUMNS (${names.mkString(", ")})") { () =>
        // ONE commit for the whole list — per-column commits would leave
        // the statement half-applied if a later column's guard fires
        client.getTxTable(cat, sch, tbl).dropColumns(names)
        client.syncTableSchema(cat, sch, tbl)
      }
    }

  /** Properties land in BOTH places they are read from: the transaction
    * log (a metadata commit — the write path and external engines read
    * `snapshot.properties`) for transactional tables, and the catalog
    * record. A catalog-only update would silently not affect e.g.
    * `graft.bloomFilter.columns` or `delta.enableDeletionVectors`.
    */
  private def isTransactional(client: LakehouseClient, cat: String, sch: String,
      tbl: String): Boolean = {
    val ft = client.getTable(cat, sch, tbl).fileType
    ft == graft.catalog.FileType.DELTA || ft == graft.catalog.FileType.ICEBERG
  }

  def rewriteSetProperties(session: ClassicSparkSession, client: LakehouseClient,
      s: SetTableProperties): Option[LogicalPlan] =
    alterTarget3(client, s.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      GraftDmlCommand(cmdLabel(s"ALTER TABLE $cat.$sch.$tbl SET TBLPROPERTIES", s.properties)) { () =>
        if (isTransactional(client, cat, sch, tbl))
          client.getTxTable(cat, sch, tbl).setProperties(s.properties)
        val existing = client.getTable(cat, sch, tbl).properties
        client.store.updateTable(cat, sch, tbl,
          properties = Some(existing ++ s.properties))
      }
    }

  def rewriteUnsetProperties(session: ClassicSparkSession, client: LakehouseClient,
      u: UnsetTableProperties): Option[LogicalPlan] =
    alterTarget3(client, u.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      GraftDmlCommand(cmdLabel(s"ALTER TABLE $cat.$sch.$tbl UNSET TBLPROPERTIES", u.propertyKeys)) { () =>
        if (isTransactional(client, cat, sch, tbl))
          // setProperties unsets keys mapped to null
          client.getTxTable(cat, sch, tbl).setProperties(
            u.propertyKeys.map(_ -> (null: String)).toMap)
        val existing = client.getTable(cat, sch, tbl).properties
        client.store.updateTable(cat, sch, tbl,
          properties = Some(existing -- u.propertyKeys))
      }
    }

  /** SHOW TABLES IN cat[.sch] over this client's catalogs. */
  def rewriteShowTables(session: ClassicSparkSession, client: LakehouseClient,
      st: ShowTables): Option[LogicalPlan] = {
    val ns = st.namespace match {
      case n: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace => n.multipartIdentifier
      case _ => return None
    }
    val schemas: Seq[(String, String)] = ns match {
      case Seq(cat, sch) =>
        try { client.getSchema(cat, sch); Seq(cat -> sch) }
        catch { case _: DoesNotExistError => return None }
      case Seq(cat) =>
        try client.listSchemas(cat).map(s => cat -> s.name)
        catch { case _: DoesNotExistError => return None }
      case _ => return None
    }
    // Spark's SHOW TABLES pattern language: '*' is a wildcard, '|' is
    // alternation, everything else matches LITERALLY — quote the chunks
    // so regex metacharacters ('+', '[', ...) don't misfire or throw
    def matches(name: String): Boolean = st.pattern.forall { p =>
      val alts = p.split("\\|").map(_.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*"))
      java.util.regex.Pattern
        .compile(alts.mkString("(", ")|(", ")"), java.util.regex.Pattern.CASE_INSENSITIVE)
        .matcher(name).matches()
    }
    Some(GraftQueryCommand(cmdLabel(s"SHOW TABLES IN ${ns.mkString(".")}", st.pattern), st.output) { () =>
      schemas.flatMap { case (cat, sch) =>
        client.listTables(cat, sch).filter(t => matches(t.name))
          .map(t => Row(s"$cat.$sch", t.name, false))
      }.sortBy(r => (r.getString(0), r.getString(1)))
    })
  }

  /** DESCRIBE TABLE cat.sch.t — column rows from the live table schema,
    * plus partitioning/provider/location detail (always; the EXTENDED
    * flag adds nothing we'd omit).
    */
  def rewriteDescribe(session: ClassicSparkSession, client: LakehouseClient,
      d: DescribeRelation): Option[LogicalPlan] =
    alterTarget3(client, d.relation).map { parts =>
      val Seq(cat, sch, tbl) = parts
      GraftQueryCommand(s"DESCRIBE $cat.$sch.$tbl", d.output) { () =>
        val info = client.getTable(cat, sch, tbl)
        val schema = client.readTable(cat, sch, tbl).schema
        val colRows = schema.fields.toSeq.map(f =>
          Row(f.name, f.dataType.simpleString, null))
        val partCols = info.columns.filter(_.partitionIndex.isDefined)
          .sortBy(_.partitionIndex.get).map(_.name)
        val partRows =
          if (partCols.isEmpty) Seq.empty
          else Row("# Partition Information", "", "") +:
            partCols.map(c => Row(c, schema.fields.find(_.name == c)
              .map(_.dataType.simpleString).getOrElse(""), null))
        val detail = Seq(
          Row("", "", ""),
          Row("# Detailed Table Information", "", ""),
          Row("Type", info.fileType.toString, null),
          Row("Location", info.storageLocation.getOrElse(""), null))
        colRows ++ partRows ++ detail
      }
    }

  /** SHOW TBLPROPERTIES cat.s.t [('key')]: the catalog record's
    * properties merged over the transaction log's (the log is
    * authoritative for delta.*-style configuration; the catalog may
    * carry extra graft.table.* diagnostics).
    */
  def rewriteShowTblProperties(session: ClassicSparkSession, client: LakehouseClient,
      st: ShowTableProperties): Option[LogicalPlan] =
    alterTarget3(client, st.table).map { parts =>
      val Seq(cat, sch, tbl) = parts
      GraftQueryCommand(s"SHOW TBLPROPERTIES $cat.$sch.$tbl", st.output) { () =>
        val info = client.getTable(cat, sch, tbl)
        val fromLog =
          if (info.fileType == graft.catalog.FileType.DELTA ||
              info.fileType == graft.catalog.FileType.ICEBERG)
            client.getTxTable(cat, sch, tbl).snapshot.properties
          else Map.empty[String, String]
        val all = info.properties ++ fromLog
        st.propertyKey match {
          case Some(k) => Seq(Row(k, all.getOrElse(k,
            s"Table ${cat}.${sch}.${tbl} does not have property: $k")))
          case None => all.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
        }
      }
    }

  def rewriteMerge(session: ClassicSparkSession, client: LakehouseClient,
      m: MergeIntoTable): Option[LogicalPlan] =
    target3(client, m.targetTable).map { case (parts, targetAliasOpt) =>
      val Seq(cat, sch, tbl) = parts
      if (m.withSchemaEvolution)
        throw UnsupportedOperationError(
          "MERGE WITH SCHEMA EVOLUTION is not supported through SQL; " +
            "evolve via writeTable(schemaEvolution = MERGE)")
      val targetAlias = targetAliasOpt.getOrElse(tbl)
      val (sourcePlan, sourceAliasOpt) = m.sourceTable match {
        case SubqueryAlias(id, child) => (child, Some(id.name))
        case other => (other, None)
      }
      val sourceAlias = sourceAliasOpt.getOrElse(sourcePlan match {
        case UnresolvedRelation(p, _, _) => p.last
        case _ => throw UnsupportedOperationError(
          "MERGE USING a subquery requires an alias (USING (...) AS s)")
      })
      val cond = m.mergeCondition.sql
      def condSql(c: Option[Expression]): Option[String] = c.map(_.sql)
      def setMap(as: Seq[Assignment]): Map[String, String] =
        as.map(a => assignName(a.key, Some(targetAlias)) -> a.value.sql).toMap
      GraftDmlCommand(cmdLabel(s"MERGE INTO $cat.$sch.$tbl", m)) { () =>
        val source = org.apache.spark.sql.GraftColumnBridge.ofRows(session, sourcePlan)
        var merge = client.mergeTable(source, cat, sch, tbl, Some(cond),
          sourceAlias = sourceAlias, targetAlias = targetAlias)
        m.matchedActions.foreach {
          case UpdateStarAction(c) => merge = merge.whenMatchedUpdateAll(condSql(c))
          case UpdateAction(c, _, true) => merge = merge.whenMatchedUpdateAll(condSql(c))
          case UpdateAction(c, as, _) => merge = merge.whenMatchedUpdate(setMap(as), condSql(c))
          case DeleteAction(c) => merge = merge.whenMatchedDelete(condSql(c))
          case other => throw UnsupportedOperationError(s"unsupported MERGE matched action $other")
        }
        m.notMatchedActions.foreach {
          case InsertStarAction(c) => merge = merge.whenNotMatchedInsertAll(condSql(c))
          case InsertAction(c, as) => merge = merge.whenNotMatchedInsert(setMap(as), condSql(c))
          case other => throw UnsupportedOperationError(s"unsupported MERGE not-matched action $other")
        }
        m.notMatchedBySourceActions.foreach {
          case UpdateAction(c, as, _) =>
            merge = merge.whenNotMatchedBySourceUpdate(setMap(as), condSql(c))
          case DeleteAction(c) => merge = merge.whenNotMatchedBySourceDelete(condSql(c))
          case other => throw UnsupportedOperationError(
            s"unsupported MERGE not-matched-by-source action $other")
        }
        merge.execute()
      }
    }
}
