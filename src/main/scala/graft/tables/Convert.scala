package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

import graft.catalog.UnsupportedOperationError

/** CONVERT TO DELTA: commit a real `_delta_log` over a pre-existing
  * parquet directory IN PLACE — the standard zero-copy migration path
  * from a plain (optionally hive-partitioned) parquet dataset to a
  * transactional table. One recursive listing builds the version-0 adds
  * (relative paths, partition values parsed from `k=v` directory
  * segments, sizes from the listing); no data byte moves, and the
  * directory keeps working for legacy path-based readers while gaining
  * the full TxTable write surface (and any foreign Delta engine can
  * read it — the log is protocol-real).
  *
  * At 100 TB this is O(files) driver metadata work: the listing and one
  * JSON commit. Row counts are not in the listing, so the adds carry
  * rows = -1 (unknown) — metadata-only `countRows` falls back to
  * scanning just the stat-less files, exactly like foreign-written
  * Delta files without stats; stats backfill on the first OPTIMIZE.
  */
object Convert {

  private val HiveNullPartition = "__HIVE_DEFAULT_PARTITION__"

  /** Convert the parquet directory at `location`; returns the TxTable
    * handle over the new Delta log.
    */
  def parquetToDelta(spark: SparkSession, location: String,
      properties: Map[String, String] = Map.empty): TxTable = {
    if (DeltaLog.isDeltaTable(spark, location) || TxLog.exists(spark, location) ||
        IcebergLog.isIcebergTable(spark, location))
      throw graft.catalog.AlreadyExistsError(
        s"CONVERT TO DELTA: a transactional table already exists at $location")
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
      throw UnsupportedOperationError(s"CONVERT TO DELTA: no parquet files under $location")

    def relOf(p: Path): String = {
      val rootStr = root.toUri.getPath.stripSuffix("/")
      val pStr = f.makeQualified(p).toUri.getPath
      pStr.stripPrefix(rootStr).stripPrefix("/")
    }
    // partition values from the k=v directory segments, %xx-unescaped
    // the way hive writers escape them (NOT URLDecoder: hive leaves '+'
    // literal, URLDecoder would turn it into a space); the hive null
    // sentinel maps to an ABSENT entry (Delta's null partition value)
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
        s"CONVERT TO DELTA: inconsistent partition layout — '$r' does not follow " +
          s"[${partCols.mkString(", ")}]")
    }
    // data-column schema from the footers of the files ALREADY listed —
    // reading by explicit paths avoids a second recursive listing of the
    // tree (the dominant metadata cost on object stores). Partition
    // column types are inferred from the parsed values: all-integral →
    // long, all-numeric → double, else string (declare-your-own-schema
    // callers can ALTER afterwards; Delta stores the values as strings
    // either way).
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
    DeltaLogWriter.createFromFiles(spark, location, schema, partCols,
      properties, adds, operation = "CONVERT")
    TxTable.forForeignDelta(spark, location)
  }
}
