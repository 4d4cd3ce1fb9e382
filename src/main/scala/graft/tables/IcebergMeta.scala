package graft.tables

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._

import graft.catalog.UnsupportedOperationError

/** Iceberg inspection ("metadata") tables — the `table$snapshots`,
  * `$history`, `$manifests`, `$files`, `$delete_files`, `$partitions` and
  * `$refs` relations every Iceberg engine exposes (reference surface:
  * iceberg spec "Table Metadata"; the reference lakehouse delegates this
  * kind of introspection to its native engine's catalog calls).
  *
  * All of these are METADATA-sized by construction: they are built from
  * the same metadata-JSON + manifest replay the scan planner already
  * does — no data file is ever opened, so the cost is O(manifest bytes)
  * regardless of table size. That is exactly the property that makes
  * them usable operationally at 100 TB: "how many rows per partition"
  * answers from manifest stats, not a table scan.
  */
object IcebergMeta {

  private implicit val formats: Formats = DefaultFormats

  final case class SnapshotRow(committed_at: Timestamp, snapshot_id: Long,
      parent_id: Option[Long], operation: String, manifest_list: String,
      summary: Map[String, String])

  final case class HistoryRow(made_current_at: Timestamp, snapshot_id: Long,
      parent_id: Option[Long], is_current_ancestor: Boolean)

  final case class ManifestRow(content: Int, path: String, length: Long,
      partition_spec_id: Int, added_snapshot_id: Long,
      added_files_count: Option[Int], existing_files_count: Option[Int],
      deleted_files_count: Option[Int], added_rows_count: Option[Long])

  final case class FileRow(content: Int, file_path: String, file_format: String,
      partition: Map[String, String], record_count: Long, file_size_in_bytes: Long)

  final case class RefRow(name: String, `type`: String, snapshot_id: Long,
      min_snapshots_to_keep: Option[Int], max_snapshot_age_ms: Option[Long],
      max_ref_age_ms: Option[Long])

  /** Dispatch by inspection-table name (the `table$name` convention). */
  def table(spark: SparkSession, location: String, name: String): DataFrame =
    name match {
      case "snapshots" => snapshots(spark, location)
      case "history" => history(spark, location)
      case "manifests" => manifests(spark, location)
      case "files" => files(spark, location, wantContent = Set(0))
      case "delete_files" => files(spark, location, wantContent = Set(1, 2))
      case "partitions" => partitions(spark, location)
      case "refs" => refs(spark, location)
      case other => throw UnsupportedOperationError(
        s"iceberg: unknown metadata table '$other' (supported: snapshots, " +
          "history, manifests, files, delete_files, partitions, refs)")
    }

  private def currentMeta(spark: SparkSession, location: String): JValue = {
    val f = IcebergLog.fs(spark, location)
    IcebergLog.readJson(f, IcebergLog.currentMetadataPath(f, location))
  }

  private def snapshotJsons(meta: JValue): Seq[JValue] =
    (meta \ "snapshots").extractOrElse[Seq[JValue]](Seq.empty)

  /** Ancestor chain of the current snapshot (current id first). */
  private def ancestors(meta: JValue): Set[Long] = {
    val parents = snapshotJsons(meta).flatMap { s =>
      for (id <- (s \ "snapshot-id").extractOpt[Long])
        yield id -> (s \ "parent-snapshot-id").extractOpt[Long]
    }.toMap
    val out = Set.newBuilder[Long]
    var cur = (meta \ "current-snapshot-id").extractOpt[Long].filter(_ != -1L)
    while (cur.isDefined) {
      out += cur.get
      cur = parents.get(cur.get).flatten
    }
    out.result()
  }

  def snapshots(spark: SparkSession, location: String): DataFrame = {
    val meta = currentMeta(spark, location)
    val rows = snapshotJsons(meta).map { s =>
      val summary = (s \ "summary").extractOpt[Map[String, String]].getOrElse(Map.empty)
      SnapshotRow(
        new Timestamp((s \ "timestamp-ms").extractOrElse[Long](0L)),
        (s \ "snapshot-id").extract[Long],
        (s \ "parent-snapshot-id").extractOpt[Long],
        summary.getOrElse("operation", ""),
        (s \ "manifest-list").extractOrElse[String](""),
        summary - "operation")
    }
    import spark.implicits._
    rows.toDF()
  }

  def history(spark: SparkSession, location: String): DataFrame = {
    val meta = currentMeta(spark, location)
    val anc = ancestors(meta)
    val parents = snapshotJsons(meta).flatMap { s =>
      for (id <- (s \ "snapshot-id").extractOpt[Long])
        yield id -> (s \ "parent-snapshot-id").extractOpt[Long]
    }.toMap
    val rows = (meta \ "snapshot-log").extractOrElse[Seq[JValue]](Seq.empty).map { e =>
      val id = (e \ "snapshot-id").extract[Long]
      HistoryRow(
        new Timestamp((e \ "timestamp-ms").extractOrElse[Long](0L)),
        id, parents.get(id).flatten, anc.contains(id))
    }
    import spark.implicits._
    rows.toDF()
  }

  def manifests(spark: SparkSession, location: String): DataFrame = {
    val meta = currentMeta(spark, location)
    val f = IcebergLog.fs(spark, location)
    val current = (meta \ "current-snapshot-id").extractOpt[Long].filter(_ != -1L)
    val mlPath = current.flatMap(id => snapshotJsons(meta)
      .find(s => (s \ "snapshot-id").extractOpt[Long].contains(id))
      .flatMap(s => (s \ "manifest-list").extractOpt[String]))
    val rows = mlPath.toSeq.flatMap { ml =>
      IcebergLog.readAvro(f, IcebergLog.resolve(location, ml)).map { r =>
        def num(n: String): Option[Number] =
          if (r.getSchema.getField(n) == null) None
          else Option(r.get(n)).map(_.asInstanceOf[Number])
        ManifestRow(
          num("content").fold(0)(_.intValue),
          String.valueOf(r.get("manifest_path")),
          num("manifest_length").fold(0L)(_.longValue),
          num("partition_spec_id").fold(0)(_.intValue),
          num("added_snapshot_id").fold(0L)(_.longValue),
          num("added_files_count").orElse(num("added_data_files_count")).map(_.intValue),
          num("existing_files_count").orElse(num("existing_data_files_count")).map(_.intValue),
          num("deleted_files_count").orElse(num("deleted_data_files_count")).map(_.intValue),
          num("added_rows_count").map(_.longValue))
      }
    }
    import spark.implicits._
    rows.toDF()
  }

  private def files(spark: SparkSession, location: String,
      wantContent: Set[Int]): DataFrame = {
    val st = IcebergLog.state(spark, location)
    val dataRows = if (!wantContent.contains(0)) Seq.empty else st.files.map(a =>
      FileRow(0, a.path, "parquet", a.partitionValues, a.rows, a.sizeBytes))
    val deleteRows = st.deletes.filter(d => wantContent.contains(d.content)).map(d =>
      FileRow(d.content, d.path, d.format, Map.empty, d.records, d.bytes))
    import spark.implicits._
    (dataRows ++ deleteRows).toDF()
  }

  /** Per-partition file_count / record_count from manifest stats alone
    * (like Iceberg's `$partitions`: counts are of LIVE data files and do
    * not subtract merge-on-read deletes riding in content>=1 files).
    */
  def partitions(spark: SparkSession, location: String): DataFrame = {
    import org.apache.spark.sql.functions._
    files(spark, location, wantContent = Set(0))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("file_count"), sum(col("record_count")).as("record_count"))
  }

  def refs(spark: SparkSession, location: String): DataFrame = {
    val meta = currentMeta(spark, location)
    val rows = (meta \ "refs") match {
      case JObject(fields) => fields.map { case (name, v) =>
        RefRow(name,
          (v \ "type").extractOrElse[String]("branch"),
          (v \ "snapshot-id").extract[Long],
          (v \ "min-snapshots-to-keep").extractOpt[Int],
          (v \ "max-snapshot-age-ms").extractOpt[Long],
          (v \ "max-ref-age-ms").extractOpt[Long])
      }
      case _ => Seq.empty[RefRow]
    }
    import spark.implicits._
    rows.toDF()
  }
}
