package graft.tables

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

import graft.catalog.UnsupportedOperationError

/** Interop with the Apache Iceberg table format (the OTHER half of the
  * north star's "Delta/Iceberg"), implemented against the published spec
  * (iceberg.apache.org/spec — format versions 1 and 2) with no Iceberg
  * dependency:
  *
  *   - `metadata/vN.metadata.json` (+ `version-hint.text`) — table schema
  *     (id-addressed fields), partition specs, snapshots, snapshot-log;
  *   - manifest LISTS and manifest FILES are Avro container files, read
  *     driver-side with plain GenericRecord streams (they are
  *     metadata-sized, exactly like the Delta JSON log);
  *   - data files are parquet, planned as one distributed scan;
  *   - v2 POSITION deletes (content=1 manifests → parquet files of
  *     (file_path, pos)) are applied merge-on-read through the same
  *     broadcast bitmap filter deletion vectors use (DvIsRowLive) —
  *     position deletes name explicit data-file paths, so applying every
  *     live delete file to its named data file matches the spec's
  *     sequence-number rule for non-reused paths. EQUALITY deletes
  *     (content=2) are refused — their sequence-number semantics cannot
  *     be satisfied without tracking per-file sequence ordering.
  *
  * Scale posture mirrors DeltaLog: snapshot state is file metadata only;
  * the data read is a manifest-planned distributed parquet scan (no
  * directory listing); delete positions are bounded by deleted-row count
  * (the DV argument), broadcast once.
  */
object IcebergLog {

  private implicit val formats: Formats = DefaultFormats

  def metadataDir(location: String): Path = new Path(location, "metadata")

  private[tables] def fs(spark: SparkSession, location: String): FileSystem =
    new Path(location).getFileSystem(spark.sessionState.newHadoopConf())

  def isIcebergTable(spark: SparkSession, location: String): Boolean = {
    val f = fs(spark, location)
    val dir = metadataDir(location)
    f.exists(dir) && f.listStatus(dir).exists(_.getPath.getName.endsWith(".metadata.json"))
  }

  /** Highest-version metadata file — `version-hint.text` when present
    * (the HadoopCatalog convention), else the max vN lexicographic scan.
    */
  private[tables] def currentMetadataPath(f: FileSystem, location: String): Path = {
    val dir = metadataDir(location)
    val hint = new Path(dir, "version-hint.text")
    if (f.exists(hint)) {
      val in = f.open(hint)
      val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim finally in.close()
      val p = new Path(dir, s"v$v.metadata.json")
      if (f.exists(p)) return p
    }
    f.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".metadata.json"))
      .sortBy { p =>
        p.getName.stripSuffix(".metadata.json").stripPrefix("v").toLongOption.getOrElse(-1L)
      }
      .lastOption
      .getOrElse(throw graft.catalog.DoesNotExistError(s"no Iceberg metadata at $location"))
  }

  private[tables] def readJson(f: FileSystem, p: Path): JValue = {
    val in = f.open(p)
    try JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  // ---- Iceberg schema JSON -> Spark ----

  private[tables] def toSparkType(t: JValue): DataType = t match {
    case JString(s) => s match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType   // no zone
      case "timestamptz" => TimestampType    // UTC-adjusted
      case "string" => StringType
      case "uuid" => StringType
      case "binary" => BinaryType
      case dec if dec.startsWith("decimal(") =>
        val inner = dec.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim)
        DecimalType(inner(0).toInt, inner(1).toInt)
      case fixed if fixed.startsWith("fixed[") => BinaryType
      case other => throw UnsupportedOperationError(s"iceberg: unsupported type '$other'")
    }
    case obj: JObject => (obj \ "type") match {
      case JString("struct") => structOf(obj)
      case JString("list") =>
        ArrayType(toSparkType(obj \ "element"),
          containsNull = !(obj \ "element-required").extractOrElse[Boolean](false))
      case JString("map") =>
        MapType(toSparkType(obj \ "key"), toSparkType(obj \ "value"),
          valueContainsNull = !(obj \ "value-required").extractOrElse[Boolean](false))
      case other => throw UnsupportedOperationError(s"iceberg: unsupported nested type $other")
    }
    case other => throw UnsupportedOperationError(s"iceberg: unparseable type $other")
  }

  private[tables] def structOf(schema: JValue): StructType =
    StructType((schema \ "fields").extract[Seq[JValue]].map { f =>
      StructField(
        (f \ "name").extract[String],
        toSparkType(f \ "type"),
        nullable = !(f \ "required").extractOrElse[Boolean](false))
    })

  /** The current schema of a metadata document (schemas + current-schema-id,
    * falling back to the v1 top-level `schema` field).
    */
  private[tables] def currentSchema(meta: JValue): StructType = {
    val cur = (meta \ "current-schema-id").extractOpt[Int]
    val fromList = cur.flatMap { id =>
      (meta \ "schemas").extractOpt[Seq[JValue]]
        .flatMap(_.find(s => (s \ "schema-id").extractOpt[Int].contains(id)))
    }
    structOf(fromList.getOrElse(meta \ "schema"))
  }

  // ---- snapshots ----

  private[tables] final case class IceSnapshot(
      snapshotId: Long, timestampMs: Long, manifestList: String)

  private[tables] def snapshots(meta: JValue): Seq[IceSnapshot] =
    (meta \ "snapshots").extractOrElse[Seq[JValue]](Seq.empty).map { s =>
      IceSnapshot(
        (s \ "snapshot-id").extract[Long],
        (s \ "timestamp-ms").extractOrElse[Long](0L),
        (s \ "manifest-list").extract[String])
    }

  /** A data or delete file planned from the manifests. */
  private[tables] final case class IceFile(
      content: Int, path: String, format: String, records: Long, bytes: Long)

  /** Read every avro record of a metadata-sized container file. */
  private[tables] def readAvro(f: FileSystem, p: Path): Seq[GenericRecord] = {
    val in = f.open(p)
    try {
      val stream = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
      try {
        val out = Seq.newBuilder[GenericRecord]
        while (stream.hasNext) out += stream.next()
        out.result()
      } finally stream.close()
    } finally in.close()
  }

  private def str(v: Any): String = if (v == null) null else v.toString

  /** Resolve a manifest-recorded absolute URI/path against the table. */
  private[tables] def resolve(location: String, filePath: String): Path = {
    val p = new Path(filePath)
    if (p.isAbsolute || filePath.contains("://")) p else new Path(location, filePath)
  }

  /** Live files of a snapshot: walk its manifest list, then each manifest's
    * entries, keeping status != 2 (DELETED). Returns (data files, position
    * delete files); equality deletes raise.
    */
  private[tables] def liveFiles(spark: SparkSession, location: String,
      snap: IceSnapshot): (Seq[IceFile], Seq[IceFile]) = {
    val f = fs(spark, location)
    val manifests = readAvro(f, resolve(location, snap.manifestList)).map { r =>
      val path = str(r.get("manifest_path"))
      val content = Option(r.get("content")).map(_.asInstanceOf[Number].intValue).getOrElse(0)
      (path, content)
    }
    val data = Seq.newBuilder[IceFile]
    val deletes = Seq.newBuilder[IceFile]
    manifests.foreach { case (mPath, mContent) =>
      readAvro(f, resolve(location, mPath)).foreach { entry =>
        val status = Option(entry.get("status")).map(_.asInstanceOf[Number].intValue).getOrElse(0)
        if (status != 2) {
          val df = entry.get("data_file").asInstanceOf[GenericRecord]
          val content = Option(df.get("content")).map(_.asInstanceOf[Number].intValue)
            .getOrElse(mContent)
          val format = str(df.get("file_format"))
          if (!"parquet".equalsIgnoreCase(format))
            throw UnsupportedOperationError(s"iceberg: file_format '$format' is not supported")
          val file = IceFile(content, str(df.get("file_path")), format,
            Option(df.get("record_count")).map(_.asInstanceOf[Number].longValue).getOrElse(-1L),
            Option(df.get("file_size_in_bytes")).map(_.asInstanceOf[Number].longValue).getOrElse(0L))
          content match {
            case 0 => data += file
            case 1 => deletes += file
            case 2 => throw UnsupportedOperationError(
              "iceberg: equality deletes (content=2) are not supported; " +
                "rewrite the table with a compaction that applies them first")
            case other => throw UnsupportedOperationError(s"iceberg: unknown content $other")
          }
        }
      }
    }
    (data.result(), deletes.result())
  }

  private def metaOf(spark: SparkSession, location: String): JValue =
    readJson(fs(spark, location), currentMetadataPath(fs(spark, location), location))

  /** Snapshot ids, oldest first. */
  def history(spark: SparkSession, location: String): Seq[Long] =
    snapshots(metaOf(spark, location)).sortBy(_.timestampMs).map(_.snapshotId)

  private def pickSnapshot(meta: JValue, asOfSnapshotId: Option[Long]): Option[IceSnapshot] = {
    val all = snapshots(meta)
    asOfSnapshotId match {
      case Some(id) => Some(all.find(_.snapshotId == id).getOrElse(
        throw graft.catalog.DoesNotExistError(s"iceberg snapshot $id does not exist")))
      case None =>
        (meta \ "current-snapshot-id").extractOpt[Long].filter(_ != -1L)
          .flatMap(id => all.find(_.snapshotId == id))
    }
  }

  /** Latest snapshot at or before `tsMs` (snapshot-log order). */
  def snapshotIdAtTimestamp(spark: SparkSession, location: String, tsMs: Long): Long = {
    val all = snapshots(metaOf(spark, location)).sortBy(_.timestampMs)
    all.takeWhile(_.timestampMs <= tsMs).lastOption.map(_.snapshotId).getOrElse(
      throw graft.catalog.DoesNotExistError(
        s"timestamp $tsMs predates the first Iceberg snapshot at $location"))
  }

  /** Current (or time-traveled) contents of an Iceberg table, position
    * deletes applied merge-on-read.
    */
  def toDF(spark: SparkSession, location: String,
      asOfSnapshotId: Option[Long] = None): DataFrame = {
    val meta = metaOf(spark, location)
    val schema = currentSchema(meta)
    pickSnapshot(meta, asOfSnapshotId) match {
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case Some(s) =>
        val (data, deletes) = liveFiles(spark, location, s)
        if (data.isEmpty)
          return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        val paths = data.map(d => resolve(location, d.path).toString)
        val base = spark.read.schema(schema).parquet(paths: _*)
        if (deletes.isEmpty) base
        else applyPositionDeletes(spark, location, schema, paths, deletes)
    }
  }

  /** Merge-on-read position deletes: the delete parquet files hold
    * (file_path, pos) rows; per-file bitmaps broadcast into the same
    * codegen'd DvIsRowLive filter deletion vectors use — no join, no
    * shuffle, pushdown intact.
    */
  private def applyPositionDeletes(spark: SparkSession, location: String,
      schema: StructType, dataPaths: Seq[String], deletes: Seq[IceFile]): DataFrame = {
    val delPaths = deletes.map(d => resolve(location, d.path).toString)
    val rows = spark.read.parquet(delPaths: _*)
      .select(col("file_path"), col("pos"))
      .collect() // bounded by deleted-row count — the DV size argument
    val byFile = rows.groupBy(r => DeletionVectors.normalizedUri(r.getString(0)))
      .map { case (p, rs) =>
        val bm = new DeletionVectors.Bitmap64
        rs.foreach(r => bm.add(r.getLong(1)))
        p -> bm.serialize
      }
    val bc = spark.sparkContext.broadcast(new DvLookup(byFile))
    import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
    val withMeta = spark.read.schema(schema).parquet(dataPaths: _*)
      .select(schema.fieldNames.map(col).toIndexedSeq :+
        col("_metadata.file_path").as(DeltaLog.FileMetaCol) :+
        col("_metadata.row_index").as(DeltaLog.RowMetaCol): _*)
    withMeta
      .filter(toCol(DvIsRowLive(
        toExpr(col(DeltaLog.FileMetaCol)), toExpr(col(DeltaLog.RowMetaCol)), bc)))
      .drop(DeltaLog.FileMetaCol, DeltaLog.RowMetaCol)
  }
}

/** Minimal spec-compliant Iceberg v2 WRITER — create + append of
  * unpartitioned parquet tables, enough for round-trips here and for
  * external Iceberg readers (the HadoopTables / version-hint layout).
  * Data files are staged by the same distributed parquet job every other
  * writer uses; manifests / manifest lists / metadata are driver-side
  * metadata writes, exactly like the Delta JSON commit.
  */
object IcebergWriter {

  private implicit val formats: Formats = DefaultFormats

  /** Avro schema of a v2 manifest-list entry (spec "Manifest Lists") —
    * required fields with their spec field-ids.
    */
  private val ManifestListSchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"content","type":"int","field-id":517},
      |{"name":"sequence_number","type":"long","field-id":515},
      |{"name":"min_sequence_number","type":"long","field-id":516},
      |{"name":"added_snapshot_id","type":"long","field-id":503},
      |{"name":"added_files_count","type":"int","field-id":504},
      |{"name":"existing_files_count","type":"int","field-id":505},
      |{"name":"deleted_files_count","type":"int","field-id":506},
      |{"name":"added_rows_count","type":"long","field-id":512},
      |{"name":"existing_rows_count","type":"long","field-id":513},
      |{"name":"deleted_rows_count","type":"long","field-id":514}
      |]}""".stripMargin.replaceAll("\n", ""))

  /** Avro schema of a v2 manifest entry over an empty partition struct
    * (unpartitioned spec) — spec "Manifests".
    */
  private val ManifestEntrySchema: Schema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |{"name":"content","type":"int","field-id":134},
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"partition","type":{"type":"record","name":"r102","fields":[]},"field-id":102},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104}
      |]},"field-id":2}
      |]}""".stripMargin.replaceAll("\n", ""))

  private def writeAvro(f: FileSystem, p: Path, schema: Schema,
      records: Seq[GenericRecord], meta: Map[String, String]): Long = {
    val out = f.create(p, false)
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    meta.foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
    f.getFileStatus(p).getLen
  }

  /** Iceberg schema JSON of a Spark schema, ids assigned in field order
    * (top-level only — nested ids continue the sequence).
    */
  private[tables] def icebergSchemaJson(schema: StructType): (String, Int) = {
    var nextId = 0
    def typeJson(dt: DataType): JValue = dt match {
      case BooleanType => JString("boolean")
      case IntegerType | ShortType | ByteType => JString("int")
      case LongType => JString("long")
      case FloatType => JString("float")
      case DoubleType => JString("double")
      case DateType => JString("date")
      case TimestampNTZType => JString("timestamp")
      case TimestampType => JString("timestamptz")
      case StringType => JString("string")
      case BinaryType => JString("binary")
      case d: DecimalType => JString(s"decimal(${d.precision}, ${d.scale})")
      case a: ArrayType =>
        nextId += 1
        JObject("type" -> JString("list"), "element-id" -> JInt(nextId),
          "element" -> typeJson(a.elementType),
          "element-required" -> JBool(!a.containsNull))
      case s: StructType =>
        JObject("type" -> JString("struct"), "fields" -> JArray(s.fields.toList.map(fieldJson)))
      case m: MapType =>
        nextId += 1; val kId = nextId
        nextId += 1; val vId = nextId
        JObject("type" -> JString("map"), "key-id" -> JInt(kId),
          "key" -> typeJson(m.keyType), "value-id" -> JInt(vId),
          "value" -> typeJson(m.valueType),
          "value-required" -> JBool(!m.valueContainsNull))
      case other => throw UnsupportedOperationError(s"iceberg writer: unsupported type $other")
    }
    def fieldJson(f: StructField): JValue = {
      nextId += 1
      val id = nextId
      JObject("id" -> JInt(id), "name" -> JString(f.name),
        "required" -> JBool(!f.nullable), "type" -> typeJson(f.dataType))
    }
    val fields = schema.fields.toList.map(fieldJson)
    val json = JsonMethods.compact(JsonMethods.render(
      JObject("type" -> JString("struct"), "schema-id" -> JInt(0),
        "fields" -> JArray(fields))))
    (json, nextId)
  }

  private def writeMetadata(f: FileSystem, location: String, version: Long,
      body: String): Unit = {
    val dir = IcebergLog.metadataDir(location)
    if (!f.exists(dir)) f.mkdirs(dir)
    val target = new Path(dir, s"v$version.metadata.json")
    if (f.exists(target))
      throw graft.catalog.AlreadyExistsError(s"iceberg metadata v$version already exists")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID()}.json")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!f.rename(tmp, target)) {
      f.delete(tmp, false)
      throw graft.catalog.AlreadyExistsError(s"concurrent iceberg commit v$version at $location")
    }
    val hint = f.create(new Path(dir, "version-hint.text"), true)
    try hint.write(version.toString.getBytes("UTF-8")) finally hint.close()
  }

  /** Create an unpartitioned v2 Iceberg table with `df` as snapshot 1. */
  def create(spark: SparkSession, location: String, df: DataFrame,
      properties: Map[String, String] = Map.empty): Unit = {
    if (IcebergLog.isIcebergTable(spark, location))
      throw graft.catalog.AlreadyExistsError(s"iceberg table already exists at $location")
    val f = IcebergLog.fs(spark, location)
    val (schemaJson, lastColId) = icebergSchemaJson(df.schema)
    val added = TxLog.stageData(spark, location, df, Seq.empty)
    val snapId = 1L
    val (mlPath, now) = commitSnapshot(spark, f, location, added, snapId, seq = 1L,
      priorManifests = Seq.empty)
    val body = metadataJson(location, schemaJson, lastColId, properties,
      snapshots = Seq((snapId, now, mlPath, 1L)), currentSnapshotId = snapId,
      lastSeq = 1L)
    writeMetadata(f, location, 1L, body)
  }

  /** Append `df` as a new snapshot (STRICT schema equality). */
  def append(spark: SparkSession, location: String, df: DataFrame): Unit = {
    val f = IcebergLog.fs(spark, location)
    val metaPath = IcebergLog.currentMetadataPath(f, location)
    val meta = IcebergLog.readJson(f, metaPath)
    val schema = IcebergLog.currentSchema(meta)
    graft.types.SchemaEquality.requireEqual(schema, df.schema)
    val version = metaPath.getName.stripSuffix(".metadata.json").stripPrefix("v").toLong
    val prior = IcebergLog.snapshots(meta)
    val current = (meta \ "current-snapshot-id").extractOpt[Long].filter(_ != -1L)
      .flatMap(id => prior.find(_.snapshotId == id))
    // carry the current snapshot's manifests forward (full manifest list
    // per snapshot, spec "Snapshots")
    val priorManifests: Seq[GenericRecord] = current.toSeq.flatMap { s =>
      IcebergLog.readAvro(f, IcebergLog.resolve(location, s.manifestList))
    }
    val lastSeq = (meta \ "last-sequence-number").extractOrElse[Long](0L)
    val snapId = prior.map(_.snapshotId).maxOption.getOrElse(0L) + 1
    val added = TxLog.stageData(spark, location, df, Seq.empty)
    val (mlPath, now) = commitSnapshot(spark, f, location, added, snapId,
      seq = lastSeq + 1, priorManifests = priorManifests)
    val (schemaJson, lastColId) = icebergSchemaJson(schema)
    val snaps = prior.map(s => (s.snapshotId, s.timestampMs, s.manifestList, 0L)) :+
      ((snapId, now, mlPath, lastSeq + 1))
    val props = (meta \ "properties").extractOrElse[Map[String, String]](Map.empty)
    val body = metadataJson(location, schemaJson, lastColId, props,
      snapshots = snaps, currentSnapshotId = snapId, lastSeq = lastSeq + 1)
    writeMetadata(f, location, version + 1, body)
  }

  /** Write the snapshot's manifest + manifest list; returns (manifest-list
    * path, timestamp).
    */
  private def commitSnapshot(spark: SparkSession, f: FileSystem, location: String,
      added: Seq[TxLog.AddFile], snapId: Long, seq: Long,
      priorManifests: Seq[GenericRecord]): (String, Long) = {
    val dir = IcebergLog.metadataDir(location)
    if (!f.exists(dir)) f.mkdirs(dir)
    val now = System.currentTimeMillis()
    val entrySchema = ManifestEntrySchema
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val entries = added.map { a =>
      val dfr = new GenericData.Record(dataFileSchema)
      dfr.put("content", 0)
      dfr.put("file_path", new Path(location, a.path).toString)
      dfr.put("file_format", "PARQUET")
      dfr.put("partition", new GenericData.Record(partSchema))
      dfr.put("record_count", math.max(0L, a.rows))
      dfr.put("file_size_in_bytes", a.sizeBytes)
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapId)
      e.put("sequence_number", seq)
      e.put("file_sequence_number", seq)
      e.put("data_file", dfr)
      e
    }
    val manifestName = s"${java.util.UUID.randomUUID()}-m0.avro"
    val manifestPath = new Path(dir, manifestName)
    val mLen = writeAvro(f, manifestPath, entrySchema, entries, Map(
      "format-version" -> "2", "content" -> "data"))
    val ml = new GenericData.Record(ManifestListSchema)
    ml.put("manifest_path", manifestPath.toString)
    ml.put("manifest_length", mLen)
    ml.put("partition_spec_id", 0)
    ml.put("content", 0)
    ml.put("sequence_number", seq)
    ml.put("min_sequence_number", seq)
    ml.put("added_snapshot_id", snapId)
    ml.put("added_files_count", entries.size)
    ml.put("existing_files_count", 0)
    ml.put("deleted_files_count", 0)
    ml.put("added_rows_count", added.map(a => math.max(0L, a.rows)).sum)
    ml.put("existing_rows_count", 0L)
    ml.put("deleted_rows_count", 0L)
    val mlName = s"snap-$snapId-1-${java.util.UUID.randomUUID()}.avro"
    val mlPath = new Path(dir, mlName)
    writeAvro(f, mlPath, ManifestListSchema, priorManifests :+ ml,
      Map("format-version" -> "2"))
    (mlPath.toString, now)
  }

  private def metadataJson(location: String, schemaJson: String, lastColId: Int,
      properties: Map[String, String],
      snapshots: Seq[(Long, Long, String, Long)], currentSnapshotId: Long,
      lastSeq: Long): String = {
    val snapsJson = snapshots.map { case (id, ts, ml, seq) =>
      JObject(
        "snapshot-id" -> JLong(id),
        "timestamp-ms" -> JLong(ts),
        "sequence-number" -> JLong(seq),
        "summary" -> JObject("operation" -> JString("append")),
        "manifest-list" -> JString(ml),
        "schema-id" -> JInt(0))
    }
    val logJson = snapshots.map { case (id, ts, _, _) =>
      JObject("timestamp-ms" -> JLong(ts), "snapshot-id" -> JLong(id))
    }
    JsonMethods.compact(JsonMethods.render(JObject(
      "format-version" -> JInt(2),
      "table-uuid" -> JString(java.util.UUID.randomUUID().toString),
      "location" -> JString(location),
      "last-sequence-number" -> JLong(lastSeq),
      "last-updated-ms" -> JLong(System.currentTimeMillis()),
      "last-column-id" -> JInt(lastColId),
      "current-schema-id" -> JInt(0),
      "schemas" -> JArray(List(JsonMethods.parse(schemaJson))),
      "default-spec-id" -> JInt(0),
      "partition-specs" -> JArray(List(JObject(
        "spec-id" -> JInt(0), "fields" -> JArray(Nil)))),
      "last-partition-id" -> JInt(999),
      "default-sort-order-id" -> JInt(0),
      "sort-orders" -> JArray(List(JObject(
        "order-id" -> JInt(0), "fields" -> JArray(Nil)))),
      "properties" -> JObject(properties.toList.map { case (k, v) => k -> JString(v) }),
      "current-snapshot-id" -> JLong(currentSnapshotId),
      "snapshots" -> JArray(snapsJson.toList),
      "snapshot-log" -> JArray(logJson.toList),
      "metadata-log" -> JArray(Nil))))
  }
}
