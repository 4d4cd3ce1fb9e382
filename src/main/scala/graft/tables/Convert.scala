package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

import graft.catalog.UnsupportedOperationError

/** CONVERT TO DELTA / CONVERT TO ICEBERG: commit transactional metadata
  * over a pre-existing parquet directory IN PLACE — the standard
  * zero-copy migration path from a plain (optionally hive-partitioned)
  * parquet dataset to a transactional table. One recursive listing
  * builds the version-0 adds (relative paths, partition values parsed
  * from `k=v` directory segments, sizes from the listing); no data byte
  * moves, and the directory keeps working for legacy path-based readers
  * while gaining the full TxTable write surface (and any foreign
  * Delta/Iceberg engine can read it — the logs are protocol-real).
  *
  * At 100 TB this is O(files) driver metadata work: the listing and one
  * commit. The DELTA path stays pure-metadata — row counts are not in
  * the listing, so its adds carry rows = -1 (unknown; metadata-only
  * `countRows` falls back to scanning just the stat-less files, stats
  * backfill on the first OPTIMIZE). The ICEBERG path additionally runs
  * ONE distributed footer pass (executors read O(KB) footers, never
  * data pages) because the Iceberg spec makes `record_count` a required
  * manifest field and this library's `$partitions` / metadata-count
  * surfaces trust manifest stats; the same pass yields lower/upper
  * bounds, so the converted table prunes immediately.
  */
object Convert {

  private val HiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  private final case class Listed(
      schema: org.apache.spark.sql.types.StructType,
      partCols: Seq[String],
      adds: Seq[TxLog.AddFile])

  /** One recursive listing → (full schema incl. inferred partition
    * columns, partition columns, version-0 adds with relative paths).
    */
  private def listParquetTree(spark: SparkSession, location: String,
      op: String): Listed = {
    if (DeltaLog.isDeltaTable(spark, location) || TxLog.exists(spark, location) ||
        IcebergLog.isIcebergTable(spark, location))
      throw graft.catalog.AlreadyExistsError(
        s"$op: a transactional table already exists at $location")
    val f = TxLog.fs(spark, location)
    val root = f.makeQualified(new Path(location))
    def listRec(dir: Path): Seq[FileStatus] =
      f.listStatus(dir).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (st.isDirectory) listRec(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st)
        else Seq.empty
      }
    val files = listRec(root)
    if (files.isEmpty)
      throw UnsupportedOperationError(s"$op: no parquet files under $location")

    def relOf(p: Path): String = {
      val rootStr = root.toUri.getPath.stripSuffix("/")
      val pStr = f.makeQualified(p).toUri.getPath
      pStr.stripPrefix(rootStr).stripPrefix("/")
    }
    // partition values from the k=v directory segments, %xx-unescaped
    // the way hive writers escape them (NOT URLDecoder: hive leaves '+'
    // literal, URLDecoder would turn it into a space); the hive null
    // sentinel maps to an ABSENT entry (the null partition value)
    def tupleOf(rel: String): Seq[(String, Option[String])] =
      rel.split('/').dropRight(1).toSeq.flatMap { seg =>
        val i = seg.indexOf('=')
        if (i <= 0) None
        else {
          val v = TxLog.unescapePathName(seg.substring(i + 1))
          Some(seg.substring(0, i) ->
            (if (v == HiveNullPartition) None else Some(v)))
        }
      }
    val rels = files.map(st => (st, relOf(st.getPath)))
    val partCols = tupleOf(rels.head._2).map(_._1)
    rels.find { case (_, r) => tupleOf(r).map(_._1) != partCols }.foreach { case (_, r) =>
      throw UnsupportedOperationError(
        s"$op: inconsistent partition layout — '$r' does not follow " +
          s"[${partCols.mkString(", ")}]")
    }
    // data-column schema from the footers of the files ALREADY listed —
    // reading by explicit paths avoids a second recursive listing of the
    // tree (the dominant metadata cost on object stores). Partition
    // column types are inferred from the parsed values: all-integral →
    // long, all-numeric → double, else string (declare-your-own-schema
    // callers can ALTER afterwards).
    val dataSchema = spark.read
      .parquet(rels.map(_._1.getPath.toString): _*).schema
    val partFields = partCols.map { c =>
      val vs = rels.flatMap { case (_, r) =>
        tupleOf(r).collectFirst { case (`c`, Some(v)) => v }
      }
      val dt: org.apache.spark.sql.types.DataType =
        if (vs.nonEmpty && vs.forall(_.toLongOption.isDefined))
          org.apache.spark.sql.types.LongType
        else if (vs.nonEmpty && vs.forall(_.toDoubleOption.isDefined))
          org.apache.spark.sql.types.DoubleType
        else org.apache.spark.sql.types.StringType
      org.apache.spark.sql.types.StructField(c, dt, nullable = true)
    }
    val schema = org.apache.spark.sql.types.StructType(dataSchema.fields ++ partFields)
    val adds = rels.map { case (st, rel) =>
      TxLog.AddFile(rel,
        tupleOf(rel).collect { case (k, Some(v)) => k -> v }.toMap,
        rows = -1L, sizeBytes = st.getLen)
    }
    Listed(schema, partCols, adds)
  }

  /** Backfill row counts + min/max bounds + null counts from the parquet
    * footers in ONE distributed pass (footers are O(KB); data pages are
    * never read). Executors each handle a slice of the file list — at
    * 100 TB with millions of files this is an embarrassingly parallel
    * metadata job, not a data scan.
    */
  private def withFooterStats(spark: SparkSession, location: String,
      adds: Seq[TxLog.AddFile]): Seq[TxLog.AddFile] = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val statsByRel: Map[String, (Long, Map[String, String], Map[String, String], Map[String, Long])] =
      if (adds.size <= 4)
        adds.map(a => a.path ->
          FileStats.fromParquetFooter(hconf.value,
            new Path(TxLog.resolve(location, a.path)))).toMap
      else
        spark.sparkContext
          .parallelize(adds.map(_.path), math.max(1, math.min(adds.size, 64)))
          .map(rel => rel ->
            FileStats.fromParquetFooter(hconf.value,
              new Path(TxLog.resolve(location, rel))))
          .collect().toMap
    adds.map { a =>
      val (rows, mins, maxs, nulls) = statsByRel(a.path)
      a.copy(rows = rows,
        minValues = if (mins.isEmpty) None else Some(mins),
        maxValues = if (maxs.isEmpty) None else Some(maxs),
        nullCounts = if (nulls.isEmpty) None else Some(nulls))
    }
  }

  /** Convert the parquet directory at `location` to Delta; returns the
    * TxTable handle over the new `_delta_log`.
    */
  def parquetToDelta(spark: SparkSession, location: String,
      properties: Map[String, String] = Map.empty): TxTable = {
    val l = listParquetTree(spark, location, "CONVERT TO DELTA")
    DeltaLogWriter.createFromFiles(spark, location, l.schema, l.partCols,
      properties, l.adds, operation = "CONVERT")
    TxTable.forForeignDelta(spark, location)
  }

  /** Convert the parquet directory at `location` to Iceberg v2; returns
    * the TxTable handle over the new `metadata/` log. Hive-partitioned
    * layouts become identity-partitioned specs; the partition columns
    * are absent from the data files, so reads substitute the manifest's
    * partition value per the spec's column-projection rule (the standard
    * hive-migration shape `add_files` produces).
    */
  def parquetToIceberg(spark: SparkSession, location: String,
      properties: Map[String, String] = Map.empty): TxTable = {
    val l = listParquetTree(spark, location, "CONVERT TO ICEBERG")
    val adds = withFooterStats(spark, location, l.adds)
    IcebergWriter.createFromFiles(spark, location, l.schema, l.partCols, adds,
      properties + ("graft.converted-from" -> "parquet"))
    TxTable.forIceberg(spark, location)
  }
}
