package graft.io

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.catalog.UnsupportedOperationError

/** Avro source/sink built directly on avro + avro-mapred (this environment
  * ships no spark-avro connector). Reads are distributed via
  * AvroKeyInputFormat (splittable container files → executor-side decode);
  * the single-file write mirrors the reference's one-file-per-table Avro
  * layout (reference dataframe.py:222-223, 414-425).
  *
  * Type fidelity: primitives plus DATE (logical date), TIMESTAMP
  * (timestamp-micros), TIMESTAMP_NTZ (local-timestamp-micros) and
  * DECIMAL(p,s) (bytes + logical decimal).
  */
object AvroIO {

  // ---- schema bridge ----

  def toAvroSchema(s: StructType, recordName: String = "graft_record"): Schema = {
    val fields = s.fields.map { f =>
      new Schema.Field(f.name, nullable(toAvroType(f.dataType)), null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def nullable(t: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), t))

  private def toAvroType(t: DataType): Schema = t match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType => LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case a: ArrayType => Schema.createArray(nullable(toAvroType(a.elementType)))
    case other => throw UnsupportedOperationError(s"avro: unsupported Spark type $other")
  }

  def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD, s"expected record schema, got $avro")
    StructType(avro.getFields.asScala.toSeq.map { f =>
      StructField(f.name(), toSparkType(unwrap(f.schema())), nullable = true)
    })
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def toSparkType(s: Schema): DataType = {
    val logical = Option(s.getLogicalType)
    (s.getType, logical) match {
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (Schema.Type.LONG, Some(_: LogicalTypes.LocalTimestampMicros)) => TimestampNTZType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, Some(d: LogicalTypes.Decimal)) => DecimalType(d.getPrecision, d.getScale)
      case (Schema.Type.BYTES, _) => BinaryType
      case (Schema.Type.ARRAY, _) => ArrayType(toSparkType(unwrap(s.getElementType)))
      case (t, _) => throw UnsupportedOperationError(s"avro: unsupported Avro type $t")
    }
  }

  // ---- read (S5) ----

  def read(spark: SparkSession, location: String, declared: Option[StructType]): DataFrame = {
    val sparkSchema = declared.getOrElse {
      val fs = new Path(location).getFileSystem(spark.sessionState.newHadoopConf())
      val file = if (fs.getFileStatus(new Path(location)).isFile) new Path(location)
        else fs.listStatus(new Path(location)).map(_.getPath).find(_.getName.endsWith(".avro"))
          .getOrElse(throw UnsupportedOperationError(s"no .avro file under $location"))
      val in = fs.open(file)
      try {
        val reader = new org.apache.avro.file.DataFileStream(in,
          new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
        try toSparkSchema(reader.getSchema) finally reader.close()
      } finally in.close()
    }
    val schemaFields = sparkSchema.fields.map(f => (f.name, f.dataType))
    val rdd = spark.sparkContext.newAPIHadoopFile(
        location,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) =>
        val rec = k.datum()
        Row.fromSeq(schemaFields.toIndexedSeq.map { case (n, dt) => fromAvroValue(rec.get(n), dt) })
      }
    spark.createDataFrame(rdd, sparkSchema)
  }

  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: String, StringType) => s
    case (i: java.lang.Integer, DateType) => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (l: java.lang.Long, TimestampType) => java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(l * 1000L))
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L), (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
    case (b: ByteBuffer, d: DecimalType) =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), d.scale)
    case (b: ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes); bytes
    case (a: java.util.Collection[_], ArrayType(et, _)) =>
      a.asScala.toSeq.map(fromAvroValue(_, et))
    case (x, _) => x
  }

  // ---- write (W8): one container file at `target` ----

  def writeSingleFile(spark: SparkSession, df: DataFrame, target: String): Unit = {
    val avroSchemaJson = toAvroSchema(df.schema).toString
    val sparkSchema = df.schema
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroSchemaJson))

    val targetPath = new Path(target)
    val fs = targetPath.getFileSystem(spark.sessionState.newHadoopConf())
    val tmp = new Path(targetPath.getParent, s".graft-avro-tmp-${java.util.UUID.randomUUID()}")

    val pairRdd = df.coalesce(1).rdd.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroSchemaJson)
      it.map { row =>
        (new AvroKey[GenericRecord](rowToRecord(row, sparkSchema, schema)), NullWritable.get())
      }
    }
    try {
      pairRdd.saveAsNewAPIHadoopFile(
        tmp.toString,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration)
      val part = fs.listStatus(tmp).map(_.getPath).find(_.getName.endsWith(".avro"))
        .getOrElse(throw new java.io.IOException(s"no avro part file under $tmp"))
      if (fs.exists(targetPath)) fs.delete(targetPath, false)
      if (!fs.rename(part, targetPath))
        throw new java.io.IOException(s"failed to move $part to $targetPath")
    } finally fs.delete(tmp, true)
  }

  private def rowToRecord(row: Row, sparkSchema: StructType, avro: Schema): GenericRecord = {
    val rec = new GenericData.Record(avro)
    sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvroValue(row.get(i), f.dataType))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (s: String, StringType) => s
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (d: java.time.LocalDate, DateType) => d.toEpochDay.toInt
    case (t: java.sql.Timestamp, TimestampType) => t.getTime * 1000L + (t.getNanos % 1000000) / 1000L
    case (t: java.time.Instant, TimestampType) => t.getEpochSecond * 1000000L + t.getNano / 1000L
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + t.getNano / 1000L
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue().toByteArray)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (a: scala.collection.Seq[_], ArrayType(et, _)) =>
      a.map(toAvroValue(_, et)).asJava
    case (x, _) => x
  }
}
