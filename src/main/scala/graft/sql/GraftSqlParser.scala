package graft.sql

import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{BooleanType, DoubleType, IntegerType, LongType, StringType, StructType}

import graft.catalog.DoesNotExistError

/** Maintenance statements Spark's grammar doesn't know, parsed ahead of
  * the delegate (the Delta-connector pattern — injectParser with
  * pass-through):
  *
  *   OPTIMIZE cat.sch.t                      -- incremental small-file compaction
  *   OPTIMIZE cat.sch.t ZORDER BY (a, b)     -- Morton-curve re-clustering
  *   OPTIMIZE cat.sch.t HILBERT BY (a, b)    -- Hilbert-curve re-clustering
  *   VACUUM cat.sch.t                        -- default 7-day retention
  *   VACUUM cat.sch.t RETAIN <n> HOURS       -- explicit retention (the safety
  *                                              floor still applies)
  *
  * Targets must be 3-part names in a registered client's catalog;
  * everything else — including these keywords over non-catalog names —
  * falls through to the delegate parser verbatim.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  private val Optimize =
    ("""(?is)\s*OPTIMIZE\s+([\w.`]+)(?:\s+WHERE\s+(.+?))?""" +
      """(?:\s+(ZORDER|HILBERT)\s+BY\s*\(([^)]*)\))?\s*;?\s*""").r
  private val Vacuum =
    """(?is)\s*VACUUM\s+([\w.`]+)(?:\s+RETAIN\s+(\d+)\s+HOURS?)?(\s+DRY\s+RUN)?\s*;?\s*""".r
  // CREATE TABLE tgt [SHALLOW|DEEP] CLONE src [VERSION AS OF n] LOCATION '...'
  // (Delta CLONE syntax; not in Spark's grammar, so parsed ahead of it)
  private val Clone =
    ("""(?is)\s*CREATE\s+TABLE\s+([\w.`]+)\s+(SHALLOW|DEEP)\s+CLONE\s+([\w.`]+)""" +
      """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s+LOCATION\s+'([^']+)'\s*;?\s*""").r
  // CREATE MATERIALIZED VIEW v LOCATION '...' AS
  //   SELECT k..., COUNT(*) [AS n_rows], SUM(c) [AS sum_c]... FROM src GROUP BY k...
  // (the self-maintainable aggregate shape IncrementalView supports;
  // aliases, when given, must match the canonical n_rows / sum_<c>)
  private val CreateMv =
    ("""(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s+LOCATION\s+'([^']+)'\s+AS\s+""" +
      """SELECT\s+(.+?)\s+FROM\s+([\w.`]+)\s+GROUP\s+BY\s+([\w.`,\s]+?)\s*;?\s*""").r
  private val RefreshMv =
    """(?is)\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([\w.`]+)\s*;?\s*""".r
  // CREATE BLOOMFILTER INDEX ON [TABLE] t FOR COLUMNS (a, b)
  //   [OPTIONS (fpp [=] 0.01)]       (Delta's bloom-index DDL, table-level
  //   options) — builds BloomIndex's file-skipping sidecar
  private val CreateBloomIdx =
    ("""(?is)\s*CREATE\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?([\w.`]+)""" +
      """\s+FOR\s+COLUMNS\s*\(([^)]*)\)""" +
      """(?:\s+OPTIONS\s*\(\s*fpp\s*=?\s*([\d.eE+-]+)\s*\))?\s*;?\s*""").r
  private val RefreshBloomIdx =
    """(?is)\s*REFRESH\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r
  // DROP BLOOMFILTER INDEX ON [TABLE] t — unregisters the index (clears
  // the enabling properties and the rename-pin; sidecar files become
  // dead data removable by VACUUM) so lookups plan unpruned again
  private val DropBloomIdx =
    """(?is)\s*DROP\s+BLOOMFILTER\s+INDEX\s+ON\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r
  // ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS a, b (Spark's own
  // column-stats syntax, parens tolerated) — one scan stamps persisted
  // NDV stats (ColumnStats) and returns them. The optional trailing
  // SKIP SKETCHES skips the GK quantile layer (the stamp scan's
  // dominant state): APPROX_PERCENTILE keeps the scan, everything else
  // (NDV/SUM/MIN/MAX/CNT/moments, per-partition cells) stamps as usual
  private val AnalyzeRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS""" +
      """\s+FOR\s+COLUMNS\s+\(?([\w`,\s]+?)\)?(\s+SKIP\s+SKETCHES)?\s*;?\s*""").r
  private val AnalyzeAllRe =
    ("""(?is)\s*ANALYZE\s+TABLE\s+([\w.`]+)\s+COMPUTE\s+STATISTICS""" +
      """\s+FOR\s+ALL\s+COLUMNS(\s+SKIP\s+SKETCHES)?\s*;?\s*""").r
  // COPY INTO t FROM '<dir>' | (SELECT <exprs> FROM '<dir>')
  //   [FILEFORMAT = PARQUET|CSV|JSON|AVRO] [PATTERN = '<glob>']
  //   [FORCE = TRUE] [COPY_OPTIONS ('mergeSchema' = 'true')] —
  //   exactly-once bulk file ingestion (Delta's COPY INTO shape;
  //   CopyInto's write-ahead-intent protocol; the SELECT form
  //   transforms at load, recorded in the intent for crash replay;
  //   FORCE reloads every listed file as a new batch)
  private val CopyIntoRe =
    ("""(?is)\s*COPY\s+INTO\s+([\w.`]+)\s+FROM\s+""" +
      """(?:'([^']+)'|\(\s*SELECT\s+(.+?)\s+FROM\s+'([^']+)'\s*\))""" +
      """(?:\s+FILEFORMAT\s*=\s*(\w+))?(?:\s+PATTERN\s*=\s*'([^']+)')?""" +
      """(?:\s+FORCE\s*=\s*(TRUE|FALSE))?""" +
      """(?:\s+COPY_OPTIONS\s*\(\s*'mergeSchema'\s*=\s*'(\w+)'\s*\))?\s*;?\s*""").r
  // DESCRIBE HISTORY cat.sch.t (Delta's utility; not in Spark's grammar)
  private val DescHistory =
    """(?is)\s*DESCRIBE\s+HISTORY\s+([\w.`]+)\s*;?\s*""".r
  // DESCRIBE DETAIL cat.sch.t — one metadata-only summary row
  private val DescDetail =
    """(?is)\s*DESCRIBE\s+DETAIL\s+([\w.`]+)\s*;?\s*""".r
  // RESTORE TABLE t TO VERSION AS OF n | TO TIMESTAMP AS OF 'ts' —
  // each kind is tied to ITS value form (a quoted version or a bare
  // timestamp must fail to parse, not NPE at execution)
  private val Restore =
    ("""(?is)\s*RESTORE\s+TABLE\s+([\w.`]+)\s+TO\s+""" +
      """(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*;?\s*""").r
  // SHOW PARTITIONS cat.sch.t — metadata-only partition stats
  private val ShowParts =
    """(?is)\s*SHOW\s+PARTITIONS\s+([\w.`]+)\s*;?\s*""".r
  // SHOW STATISTICS FOR [TABLE] cat.sch.t — one row per ANALYZE-stamped
  // column (NDV / exact sum / exact min / max, rendered) plus whether
  // the stamp still describes the CURRENT snapshot (fresh=false means
  // readers are scanning; re-ANALYZE to restore the metadata-only path)
  private val ShowStats =
    """(?is)\s*SHOW\s+STATISTICS\s+FOR\s+(?:TABLE\s+)?([\w.`]+)\s*;?\s*""".r
  // CONVERT TO DELTA|ICEBERG parquet.`/path` — in-place zero-copy migration
  private val ConvertRe =
    """(?is)\s*CONVERT\s+TO\s+(DELTA|ICEBERG)\s+parquet\s*\.\s*`([^`]+)`\s*;?\s*""".r
  // REORG TABLE t APPLY (PURGE) — rewrite only the files carrying
  // deletion vectors / position deletes (Delta's REORG syntax)
  private val Reorg =
    """(?is)\s*REORG\s+TABLE\s+([\w.`]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*""".r
  // GENERATE symlink_format_manifest FOR TABLE t (Delta's GENERATE)
  private val Generate =
    """(?is)\s*GENERATE\s+symlink_format_manifest\s+FOR\s+TABLE\s+([\w.`]+)\s*;?\s*""".r
  // Iceberg snapshot-ref DDL + the WAP publish (Spark-Iceberg's ALTER
  // TABLE branch syntax; FAST FORWARD mirrors the fast_forward procedure)
  private val BranchDdl =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+(CREATE|DROP)\s+(BRANCH|TAG)\s+([\w.-]+)\s*;?\s*""".r
  private val FastForward =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+FAST\s+FORWARD\s+TO\s+([\w.-]+)\s*;?\s*""".r
  // Delta's CHECK-constraint DDL (delta.constraints.<name> table
  // properties; writes enforce via Constraints.enforce). Spark's own
  // grammar parses ADD CONSTRAINT but its analyzer can't target our
  // catalog tables, so the statement is claimed here.
  private val AddConstraint =
    ("""(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+ADD\s+CONSTRAINT\s+(\w+)""" +
      """\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val DropConstraint =
    """(?is)\s*ALTER\s+TABLE\s+([\w.`]+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r

  /** Validate + split the MV select list into (keys, sum columns, min
    * columns, max columns, approx-distinct columns). None -> not our
    * shape, delegate (and its error message) decide.
    */
  private def parseMvSelect(selectList: String, groupBy: String)
      : Option[(Seq[String], Seq[String], Seq[String], Seq[String], Seq[String],
        Seq[String])] = {
    def strip(s: String) = s.trim.stripPrefix("`").stripSuffix("`")
    val groupKeys = groupBy.split(",").map(strip).filter(_.nonEmpty).toSeq
    val CountRe = """(?i)\s*COUNT\s*\(\s*\*\s*\)(?:\s+AS\s+([\w`]+))?\s*""".r
    val AggRe =
      """(?i)\s*(SUM|MIN|MAX|APPROX_COUNT_DISTINCT|VAR_POP)\s*\(\s*([\w`]+)\s*\)(?:\s+AS\s+([\w`]+))?\s*""".r
    val KeyRe = """\s*([\w`]+)\s*""".r
    val keys = Seq.newBuilder[String]
    val sums = Seq.newBuilder[String]
    val mins = Seq.newBuilder[String]
    val maxs = Seq.newBuilder[String]
    val uniqs = Seq.newBuilder[String]
    val moments = Seq.newBuilder[String]
    var hasCount = false
    var ok = true
    import graft.tables.IncrementalView
    selectList.split(",").foreach {
      case CountRe(alias) =>
        if (alias != null && strip(alias) != IncrementalView.CountCol) ok = false
        hasCount = true
      case AggRe(fn, c, alias) =>
        val cc = strip(c)
        val (canonical, sink) = fn.toUpperCase(Locale.ROOT) match {
          case "SUM" => (IncrementalView.sumCol(cc), sums)
          case "MIN" => (IncrementalView.minCol(cc), mins)
          case "MAX" => (IncrementalView.maxCol(cc), maxs)
          // VAR_POP stores the RETRACTABLE moment state (cnt_<c>,
          // sq_<c>); avg/var/stddev derive on read (withVariances)
          case "VAR_POP" => (IncrementalView.sqCol(cc), moments)
          case _ => (IncrementalView.uniqCol(cc), uniqs)
        }
        if (alias != null && strip(alias) != canonical) ok = false
        sink += cc
      case KeyRe(k) => keys += strip(k)
      case _ => ok = false
    }
    val ks = keys.result()
    // a VAR_POP column needs its SUM in the same view (the state the
    // derivation divides by); auto-adding it would surprise the schema
    val ms = moments.result()
    if (!ms.forall(sums.result().contains)) ok = false
    if (ok && hasCount && ks.nonEmpty && ks.sorted == groupKeys.sorted)
      Some((ks, sums.result(), mins.result(), maxs.result(), uniqs.result(), ms))
    else None
  }

  private def parts3(ident: String): Option[Seq[String]] = {
    val parts = ident.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
    if (parts.length == 3) Some(parts) else None
  }

  private def txTable(parts: Seq[String]): Option[(String, graft.tables.TxTable)] = {
    val client = GraftSqlExtensions.clientFor(session).getOrElse(return None)
    try {
      client.getTable(parts(0), parts(1), parts(2))
      Some((parts.mkString("."), client.getTxTable(parts(0), parts(1), parts(2))))
    } catch { case _: DoesNotExistError => None }
  }

  override def parsePlan(sqlText: String): LogicalPlan = {
    val head = sqlText.trim.take(9).toUpperCase(Locale.ROOT)
    if (head.startsWith("OPTIMIZE ")) sqlText match {
      case Optimize(ident, whereClause, curve, cols) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            val colList = Option(cols).toSeq
              .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty)
            val where = Option(whereClause).map(_.trim).filter(_.nonEmpty)
            Option(curve).map(_.toUpperCase(Locale.ROOT)) match {
              case Some("ZORDER") =>
                if (where.isDefined) throw graft.catalog.UnsupportedOperationError(
                  "OPTIMIZE ... WHERE applies to compaction only; ZORDER is a full rewrite")
                return GraftSqlDml.GraftDmlCommand(s"OPTIMIZE $name ZORDER") { () =>
                  t.optimizeZOrder(colList)
                }
              case Some("HILBERT") =>
                if (where.isDefined) throw graft.catalog.UnsupportedOperationError(
                  "OPTIMIZE ... WHERE applies to compaction only; HILBERT is a full rewrite")
                return GraftSqlDml.GraftDmlCommand(s"OPTIMIZE $name HILBERT") { () =>
                  t.optimizeHilbert(colList)
                }
              case _ =>
                val label = s"OPTIMIZE $name" + where.map(w => s" WHERE $w").getOrElse("")
                return GraftSqlDml.GraftDmlCommand(label) { () =>
                  t.optimizeCompact(where = where)
                }
            }
          case None => // not ours — fall through to the delegate
        }
      case _ => // malformed OPTIMIZE — let the delegate raise its error
    }
    else if (head.startsWith("CREATE ")) sqlText match {
      case CreateBloomIdx(ident, cols, fpp) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            val colList = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
              .filter(_.nonEmpty).toSeq
            return GraftSqlDml.GraftDmlCommand(s"CREATE BLOOMFILTER INDEX ON $name") { () =>
              Option(fpp).map(_.toDouble) match {
                case Some(p) => graft.tables.BloomIndex.enable(t, colList, fpp = p)
                case None => graft.tables.BloomIndex.enable(t, colList)
              }
            }
          case None => // not ours — fall through to the delegate
        }
      case Clone(tgtIdent, kind, srcIdent, ver, loc) =>
        val srcParts = parts3(srcIdent)
        (parts3(tgtIdent), srcParts.flatMap(txTable)) match {
          case (Some(tp), Some((srcName, t))) =>
            val client = GraftSqlExtensions.clientFor(session).get
            val shallow = kind.equalsIgnoreCase("SHALLOW")
            // reuse the backtick-stripped parts — re-splitting the raw
            // identifier would hand getTable backticked name parts
            val sp = srcParts.get
            val label = s"CREATE TABLE ${tp.mkString(".")} ${kind.toUpperCase(Locale.ROOT)} " +
              s"CLONE $srcName${Option(ver).map(v => s" VERSION AS OF $v").getOrElse("")}"
            return GraftSqlDml.GraftDmlCommand(label) { () =>
              val srcInfo = client.getTable(sp(0), sp(1), sp(2))
              t.cloneTo(loc, shallow, Option(ver).map(_.toLong))
              client.registerAsTable(tp(0), tp(1), tp(2), srcInfo.fileType, loc)
              ()
            }
          case _ => // not a catalog clone — delegate (and its error message)
        }
      case CreateMv(tgtIdent, loc, selectList, srcIdent, groupBy) =>
        (parts3(tgtIdent), parts3(srcIdent).flatMap(txTable),
            parseMvSelect(selectList, groupBy)) match {
          case (Some(tp), Some((srcName, srcT)),
              Some((keys, sums, mins, maxs, uniqs, moments))) =>
            val client = GraftSqlExtensions.clientFor(session).get
            val label = s"CREATE MATERIALIZED VIEW ${tp.mkString(".")} OVER $srcName " +
              s"KEYS(${keys.mkString(",")}) SUMS(${sums.mkString(",")}) " +
              s"MINS(${mins.mkString(",")}) MAXS(${maxs.mkString(",")}) " +
              s"UNIQS(${uniqs.mkString(",")}) MOMENTS(${moments.mkString(",")})"
            return GraftSqlDml.GraftDmlCommand(label) { () =>
              import graft.tables.IncrementalView
              IncrementalView.refresh(srcT, loc, keys, sums, createProperties = Map(
                IncrementalView.SourceProp -> srcT.location,
                IncrementalView.KeysProp -> keys.mkString(","),
                IncrementalView.SumsProp -> sums.mkString(","),
                IncrementalView.MinsProp -> mins.mkString(","),
                IncrementalView.MaxsProp -> maxs.mkString(","),
                IncrementalView.UniqsProp -> uniqs.mkString(","),
                IncrementalView.MomentsProp -> moments.mkString(",")),
                minCols = mins, maxCols = maxs, uniqCols = uniqs,
                momentCols = moments)
              client.registerAsTable(tp(0), tp(1), tp(2),
                graft.catalog.FileType.DELTA, loc)
              ()
            }
          case _ => // not our shape — delegate decides
        }
      case _ =>
    }
    else if (head.startsWith("ANALYZE ")) {
      def analyzeCmd(ident: String, skipQs: Boolean,
          colsOf: graft.tables.TxTable => Seq[String]): Option[LogicalPlan] =
        parts3(ident).flatMap(txTable).map { case (name, t) =>
          GraftSqlDml.GraftQueryCommand(s"ANALYZE TABLE $name",
            Seq(AttributeReference("column", StringType, nullable = false)(),
              AttributeReference("ndv", LongType, nullable = false)())) { () =>
            graft.tables.ColumnStats.analyze(t, colsOf(t), skipQuantile = skipQs)
              .map { case (c, n) => org.apache.spark.sql.Row(c, n) }
          }
        }
      sqlText match {
        // ALL first — the narrower FOR COLUMNS regex would otherwise
        // capture the literal word ALL as a column name
        case AnalyzeAllRe(ident, skipQs) =>
          analyzeCmd(ident, skipQs != null, _.snapshot.schema.fieldNames.toSeq)
            .foreach(p => return p)
        case AnalyzeRe(ident, colsRaw, skipQs) =>
          analyzeCmd(ident, skipQs != null, _ => colsRaw.split(",")
            .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq)
            .foreach(p => return p)
        case _ => // not a catalog table — Spark's own ANALYZE
      }
    }
    else if (head.startsWith("COPY INTO")) sqlText match {
      case CopyIntoRe(ident, srcPlain, exprs, srcSub, fmt, pat, forceRaw, msRaw) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            val src = Option(srcPlain).getOrElse(srcSub)
            val transform = Option(exprs).map(_.trim).filter(_.nonEmpty)
            val format = Option(fmt).map(_.toLowerCase(Locale.ROOT)).getOrElse("parquet")
            val force = Option(forceRaw).exists(_.equalsIgnoreCase("TRUE"))
            val ms = Option(msRaw).exists(_.equalsIgnoreCase("true"))
            return GraftSqlDml.GraftQueryCommand(s"COPY INTO $name FROM '$src'",
              Seq(AttributeReference("files_loaded", LongType, nullable = false)(),
                AttributeReference("rows_loaded", LongType, nullable = false)(),
                AttributeReference("batch", LongType, nullable = false)())) { () =>
              val r = graft.tables.CopyInto.run(t, src, format, Option(pat), force,
                transform, ms)
              Seq(org.apache.spark.sql.Row(r.filesLoaded, r.rowsLoaded, r.batch))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("DROP BLOO")) sqlText match {
      case DropBloomIdx(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftDmlCommand(s"DROP BLOOMFILTER INDEX ON $name") { () =>
              graft.tables.BloomIndex.disable(t)
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("REFRESH B")) sqlText match {
      case RefreshBloomIdx(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"REFRESH BLOOMFILTER INDEX ON $name",
              Seq(AttributeReference("pairs_built", LongType, nullable = false)())) { () =>
              Seq(org.apache.spark.sql.Row(graft.tables.BloomIndex.refresh(t).toLong))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("REFRESH M")) sqlText match {
      case RefreshMv(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, viewT)) =>
            return GraftSqlDml.GraftQueryCommand(s"REFRESH MATERIALIZED VIEW $name",
              Seq(AttributeReference("mode", StringType, nullable = false)(),
                AttributeReference("from_version", LongType, nullable = false)(),
                AttributeReference("to_version", LongType, nullable = false)())) { () =>
              import graft.tables.{IncrementalView, TxTable}
              val props = viewT.snapshot.properties
              val srcLoc = props.getOrElse(IncrementalView.SourceProp,
                throw graft.catalog.UnsupportedOperationError(
                  s"$name is not a materialized view (no ${IncrementalView.SourceProp})"))
              def listProp(p: String) = props.getOrElse(p, "")
                .split(",").toSeq.filter(_.nonEmpty)
              val src = TxTable.forAnyLocation(session, srcLoc)
              val r = IncrementalView.refresh(src, viewT.location,
                listProp(IncrementalView.KeysProp), listProp(IncrementalView.SumsProp),
                minCols = listProp(IncrementalView.MinsProp),
                maxCols = listProp(IncrementalView.MaxsProp),
                uniqCols = listProp(IncrementalView.UniqsProp),
                momentCols = listProp(IncrementalView.MomentsProp))
              Seq(org.apache.spark.sql.Row(r.mode, r.fromVersion, r.toVersion))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("DESCRIBE ")) sqlText match {
      case DescHistory(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"DESCRIBE HISTORY $name",
              Seq(AttributeReference("version", LongType, nullable = false)(),
                AttributeReference("timestamp_ms", LongType, nullable = false)(),
                AttributeReference("operation", StringType, nullable = false)(),
                AttributeReference("added_files", IntegerType, nullable = false)(),
                AttributeReference("removed_files", IntegerType, nullable = false)())) { () =>
              t.describeHistory.collect().toSeq
            }
          case None => // not a catalog table — Spark's DESCRIBE handles it
        }
      case DescDetail(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"DESCRIBE DETAIL $name",
              Seq(AttributeReference("format", StringType, nullable = false)(),
                AttributeReference("location", StringType, nullable = false)(),
                AttributeReference("table_version", LongType, nullable = false)(),
                AttributeReference("num_files", LongType, nullable = false)(),
                AttributeReference("size_bytes", LongType, nullable = false)(),
                AttributeReference("num_rows", LongType, nullable = false)(),
                AttributeReference("partition_columns", StringType, nullable = false)(),
                AttributeReference("properties", StringType, nullable = false)())) { () =>
              // metadata-only, like SHOW PARTITIONS: counts from the log
              // (minus DV cardinalities), zero data read for stat-carrying
              // tables
              val snap = t.snapshot
              val fmt =
                if (t.log eq graft.tables.IcebergCommitLog) "iceberg"
                else if (t.log eq graft.tables.ForeignDeltaCommitLog) "delta"
                else "graft"
              Seq(org.apache.spark.sql.Row(fmt, t.location, snap.version,
                snap.files.size.toLong, snap.files.map(_.sizeBytes).sum,
                t.countRows(), snap.partitionColumns.mkString(","),
                snap.properties.toSeq.sorted.map { case (k, v) => s"$k=$v" }
                  .mkString(";")))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("RESTORE ")) sqlText match {
      case Restore(ident, ver, ts) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(
              s"RESTORE TABLE $name TO " +
                Option(ver).map(v => s"VERSION AS OF $v")
                  .getOrElse(s"TIMESTAMP AS OF '$ts'"),
              Seq(AttributeReference("table_version", LongType, nullable = false)())) { () =>
              if (ver != null) t.restore(ver.toLong)
              else {
                // 'yyyy-MM-dd[ HH:mm:ss[.f]]', resolved in the SESSION
                // timezone — the same instant the timestamp-travel
                // syntax targets (the JVM default zone may differ)
                val s = ts.trim.replace(" ", "T")
                val full = if (s.contains("T")) s else s + "T00:00:00"
                val zone = java.time.ZoneId.of(
                  session.sessionState.conf.sessionLocalTimeZone)
                t.restoreToTimestamp(java.time.LocalDateTime.parse(full)
                  .atZone(zone).toInstant.toEpochMilli)
              }
              Seq(org.apache.spark.sql.Row(t.version))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("SHOW STAT")) sqlText match {
      case ShowStats(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"SHOW STATISTICS FOR $name",
              Seq(AttributeReference("column", StringType, nullable = false)(),
                AttributeReference("ndv", LongType, nullable = true)(),
                AttributeReference("cnt", LongType, nullable = true)(),
                AttributeReference("sum", StringType, nullable = true)(),
                AttributeReference("avg", DoubleType, nullable = true)(),
                AttributeReference("stddev", DoubleType, nullable = true)(),
                AttributeReference("min", StringType, nullable = true)(),
                AttributeReference("max", StringType, nullable = true)(),
                AttributeReference("exact", BooleanType, nullable = true)(),
                AttributeReference("partition_tuples", LongType, nullable = true)(),
                AttributeReference("stamped_version", LongType, nullable = true)(),
                AttributeReference("fresh", BooleanType, nullable = false)(),
                // round-16: the partition layer's STORAGE regime —
                // inline properties / sidecar file / absent — plus the
                // sidecar file+size and which families the byte budget
                // dropped (a filtered percentile that scans while SUM
                // serves is now diagnosable from this surface alone)
                AttributeReference("layer_storage", StringType, nullable = false)(),
                AttributeReference("sidecar_file", StringType, nullable = true)(),
                AttributeReference("sidecar_bytes", LongType, nullable = true)(),
                AttributeReference("dropped_families", StringType, nullable = true)())) { () =>
              // metadata-only: the stamp lives in table properties (a
              // sidecar-stored partition layer inlines here so its
              // tuple counts stay inspectable)
              import graft.tables.ColumnStats._
              val snap = withLayer(t.spark, t.location, t.snapshot)
              val p = snap.properties
              val fresh = isFresh(snap)
              // `exact`: an NDV below the sketch size k is the sketch's
              // EXACT regime (every distinct hash retained) — "4,012
              // exactly" vs "≈812,345 ±1.6%" at a glance; null when no
              // NDV is stamped for the column. `stamped_version`: the
              // snapshot version the stamp currently binds to (analyze
              // scan / latest fold / maintenance restamp).
              val k = p.get(KProp).flatMap(_.toLongOption)
              val stampedV = p.get(VersionProp).flatMap(_.toLongOption)
                .map(java.lang.Long.valueOf).orNull
              // table-level storage surface, repeated per row (SHOW
              // outputs denormalize — one glance answers "where does the
              // layer live and what did the budget cost me")
              // the stored pointer is a bare file name under the
              // table's _graft_stats/; surface it dir-qualified
              val sidecarRel = p.get(PsidecarProp).filter(_ != null)
                .map(n => s"_graft_stats/$n")
              val layerStorage =
                if (sidecarRel.isDefined) "sidecar"
                else if (p.get(PvalsProp).exists(_ != null)) "inline"
                else "absent"
              val sidecarBytes = sidecarRel.flatMap { rel =>
                scala.util.Try {
                  val fp = new org.apache.hadoop.fs.Path(t.location, rel)
                  fp.getFileSystem(t.spark.sessionState.newHadoopConf())
                    .getFileStatus(fp).getLen
                }.toOption
              }.map(java.lang.Long.valueOf).orNull
              val droppedFamilies = p.get(LayerDroppedProp).filter(_ != null).orNull
              // every prefix that can be a column's LAST surviving stat
              // (after a tie-dropping delete or an update fold a column
              // can be down to just cnt — which still feeds the
              // planner's nullCount and must stay inspectable)
              val cols = p.keys.collect {
                case key if key.startsWith(NdvPropPrefix) => key.stripPrefix(NdvPropPrefix)
                case key if key.startsWith(SumPropPrefix) => key.stripPrefix(SumPropPrefix)
                case key if key.startsWith(MinPropPrefix) => key.stripPrefix(MinPropPrefix)
                case key if key.startsWith(CntPropPrefix) => key.stripPrefix(CntPropPrefix)
                case key if key.startsWith(SqPropPrefix) => key.stripPrefix(SqPropPrefix)
                case key if key.startsWith(QsPropPrefix) => key.stripPrefix(QsPropPrefix)
              }.toSeq.distinct.sorted
              def mm(prefix: String, c: String): String =
                p.get(prefix + c).map {
                  case "n" => null
                  case v => v.drop(1)
                }.orNull
              cols.map { c =>
                val ndv = p.get(NdvPropPrefix + c).flatMap(_.toLongOption)
                // the per-partition layer's visibility: how many stamped
                // partition tuples hold this column's sketch+scalar cells
                // (null = the layer doesn't cover the column)
                val ptuples = p.keys.count(_.startsWith(s"$PkmvPropPrefix$c."))
                // derived moment surface: AVG = exact sum ÷ non-null
                // count, STDDEV (population) from (n, Σx, Σx²) — the
                // same one-division-over-exact-integers the serve path
                // answers with; null when underivable (non-integral
                // column, "of" overflow, zero non-null values)
                val cnt = p.get(CntPropPrefix + c).flatMap(_.toLongOption)
                def moment(prefix: String): Option[BigInt] =
                  p.get(prefix + c).filter(v => v != "null" && v != "of")
                    .flatMap(v => scala.util.Try(BigInt(v)).toOption)
                val avg = for {
                  n <- cnt if n > 0L
                  s <- moment(SumPropPrefix)
                } yield java.lang.Double.valueOf(s.toDouble / n.toDouble)
                val stddev = for {
                  n <- cnt if n > 0L
                  s <- moment(SumPropPrefix)
                  q <- moment(SqPropPrefix)
                } yield {
                  val bn = BigInt(n)
                  java.lang.Double.valueOf(math.sqrt(
                    (bn * q - s * s).toDouble / (bn * bn).toDouble))
                }
                org.apache.spark.sql.Row(c,
                  ndv.map(java.lang.Long.valueOf).orNull,
                  cnt.map(java.lang.Long.valueOf).orNull,
                  p.get(SumPropPrefix + c).map(v => if (v == "null") null else v).orNull,
                  avg.orNull, stddev.orNull,
                  mm(MinPropPrefix, c), mm(MaxPropPrefix, c),
                  ndv.flatMap(n => k.map(kk => java.lang.Boolean.valueOf(n < kk))).orNull,
                  if (ptuples > 0) java.lang.Long.valueOf(ptuples.toLong) else null,
                  stampedV, fresh,
                  layerStorage, sidecarRel.orNull, sidecarBytes, droppedFamilies)
              }
            }
          case None => // not a catalog table
        }
      case _ =>
    }
    else if (head.startsWith("SHOW PART")) sqlText match {
      case ShowParts(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"SHOW PARTITIONS $name",
              Seq(AttributeReference("partition", StringType, nullable = false)(),
                AttributeReference("n_rows", LongType, nullable = false)(),
                AttributeReference("n_files", LongType, nullable = false)(),
                AttributeReference("size_bytes", LongType, nullable = false)())) { () =>
              // metadata-only: counts come from the log (minus DV
              // cardinalities), zero Spark jobs
              t.partitionStats().toSeq.sortBy(_._1.toSeq.sorted.mkString("/"))
                .map { case (pv, st) =>
                  val rendered = pv.toSeq.sortBy(_._1)
                    .map { case (k, v) => s"$k=$v" }.mkString("/")
                  org.apache.spark.sql.Row(rendered, st.rowCount, st.fileCount, st.sizeBytes)
                }
            }
          case None => // not a catalog table — Spark's SHOW PARTITIONS
        }
      case _ =>
    }
    else if (head.startsWith("CONVERT T")) sqlText match {
      case ConvertRe(fmt, path) =>
        val toIceberg = fmt.equalsIgnoreCase("ICEBERG")
        return GraftSqlDml.GraftQueryCommand(
          s"CONVERT TO ${fmt.toUpperCase(Locale.ROOT)} parquet.`$path`",
          Seq(AttributeReference("files_converted", LongType, nullable = false)())) { () =>
          val t =
            if (toIceberg) graft.tables.Convert.parquetToIceberg(session, path)
            else graft.tables.Convert.parquetToDelta(session, path)
          Seq(org.apache.spark.sql.Row(t.snapshot.files.size.toLong))
        }
      case _ =>
    }
    else if (head.startsWith("ALTER TAB")) sqlText match {
      case BranchDdl(ident, verb, kind, refName) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) if t.log eq graft.tables.IcebergCommitLog =>
            val label = s"ALTER TABLE $name ${verb.toUpperCase(Locale.ROOT)} " +
              s"${kind.toUpperCase(Locale.ROOT)} $refName"
            return GraftSqlDml.GraftDmlCommand(label) { () =>
              (verb.toUpperCase(Locale.ROOT), kind.toUpperCase(Locale.ROOT)) match {
                case ("CREATE", "BRANCH") =>
                  graft.tables.IcebergWriter.createBranch(session, t.location, refName)
                case ("CREATE", "TAG") =>
                  graft.tables.IcebergWriter.createTag(session, t.location, refName)
                case _ =>
                  graft.tables.IcebergWriter.removeRef(session, t.location, refName)
              }
            }
          case Some((name, _)) =>
            throw graft.catalog.UnsupportedOperationError(
              s"branches and tags need an ICEBERG table; $name is not one")
          case None => // not a catalog table — delegate
        }
      case FastForward(ident, branch) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) if t.log eq graft.tables.IcebergCommitLog =>
            return GraftSqlDml.GraftDmlCommand(s"ALTER TABLE $name FAST FORWARD TO $branch") { () =>
              graft.tables.IcebergWriter.fastForward(session, t.location, branch)
            }
          case Some((name, _)) =>
            throw graft.catalog.UnsupportedOperationError(
              s"FAST FORWARD needs an ICEBERG table; $name is not one")
          case None =>
        }
      case AddConstraint(ident, cName, checkSql) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftDmlCommand(
              s"ALTER TABLE $name ADD CONSTRAINT $cName") { () =>
              t.addConstraint(cName, checkSql.trim)
            }
          case None =>
        }
      case DropConstraint(ident, cName) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftDmlCommand(
              s"ALTER TABLE $name DROP CONSTRAINT $cName") { () =>
              t.dropConstraint(cName)
            }
          case None =>
        }
      case _ => // other ALTER TABLE forms — Spark's grammar + analyzer rule
    }
    else if (head.startsWith("GENERATE ")) sqlText match {
      case Generate(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(
              s"GENERATE symlink_format_manifest FOR TABLE $name",
              Seq(AttributeReference("manifests_written", IntegerType, nullable = false)())) { () =>
              Seq(org.apache.spark.sql.Row(t.generateSymlinkManifest()))
            }
          case None =>
        }
      case _ =>
    }
    else if (head.startsWith("REORG ")) sqlText match {
      case Reorg(ident) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            return GraftSqlDml.GraftQueryCommand(s"REORG TABLE $name APPLY (PURGE)",
              Seq(AttributeReference("purged", org.apache.spark.sql.types.BooleanType,
                nullable = false)())) { () =>
              Seq(org.apache.spark.sql.Row(t.reorgPurge()))
            }
          case None => // not a catalog table — delegate raises its error
        }
      case _ =>
    }
    else if (head.startsWith("VACUUM ")) sqlText match {
      case Vacuum(ident, hours, dry) =>
        parts3(ident).flatMap(txTable) match {
          case Some((name, t)) =>
            val retention = Option(hours).map(_.toLong * 3600L * 1000L)
            if (dry != null)
              // DRY RUN lists the would-be-deleted paths, removes nothing
              return GraftSqlDml.GraftQueryCommand(s"VACUUM $name DRY RUN",
                Seq(AttributeReference("path", StringType, nullable = false)())) { () =>
                // a preview deletes nothing, so the sub-floor safety gate
                // does not apply — the whole point is seeing what a forced
                // vacuum WOULD take
                val paths = retention match {
                  case Some(ms) => t.vacuumDryRun(retentionMs = ms, force = true)
                  case None => t.vacuumDryRun()
                }
                paths.sorted.map(org.apache.spark.sql.Row(_))
              }
            return GraftSqlDml.GraftQueryCommand(s"VACUUM $name",
              Seq(AttributeReference("deleted_files", IntegerType, nullable = false)())) { () =>
              val deleted = retention match {
                case Some(ms) => t.vacuum(retentionMs = ms)
                case None => t.vacuum()
              }
              Seq(org.apache.spark.sql.Row(deleted))
            }
          case None =>
        }
      case _ =>
    }
    delegate.parsePlan(sqlText)
  }

  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
