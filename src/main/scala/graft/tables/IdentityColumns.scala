package graft.tables

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MetadataBuilder, StructField, StructType}

import graft.catalog.UnsupportedOperationError

/** Delta identity columns (PROTOCOL.md "Identity Columns"): a bigint
  * column whose values the WRITER allocates as an arithmetic progression
  * `start + n·step`, tracking the highest allocated value in the field's
  * `delta.identity.highWaterMark` metadata so successive writes never
  * collide.
  *
  * Writer obligations honored here:
  *   - a write that omits the column gets DENSE values allocated above the
  *     high watermark, and the same commit's metaData action carries the
  *     advanced watermark (allocation and publication are atomic — a
  *     failed write burns no values, a concurrent writer loses the version
  *     race and re-plans against the new watermark);
  *   - explicit values are refused unless `delta.identity.allowExplicitInsert`
  *     (GENERATED ALWAYS semantics); when allowed, values above the
  *     watermark advance it.
  *
  * Scale posture: dense allocation needs a global row index, which is two
  * passes over the incoming batch (count per partition, then assign with
  * per-partition offsets — RDD zipWithIndex); that is the unavoidable
  * barrier of gapless numbering and costs O(batch), never O(table).
  */
private[graft] object IdentityColumns {
  val StartKey = "delta.identity.start"
  val StepKey = "delta.identity.step"
  val HwmKey = "delta.identity.highWaterMark"
  val AllowKey = "delta.identity.allowExplicitInsert"

  def of(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f =>
      f.metadata.contains(StartKey) || f.metadata.contains(StepKey))

  private def longMeta(f: StructField, key: String, dflt: Long): Long =
    if (f.metadata.contains(key)) f.metadata.getLong(key) else dflt

  /** Complete `df` against the identity columns of `schema`: allocate
    * omitted columns, gate provided ones; returns the completed frame and
    * the advanced watermark per column (empty = nothing to publish).
    */
  def assign(df: DataFrame, schema: StructType): (DataFrame, Map[String, Long]) = {
    val ids = of(schema)
    if (ids.isEmpty) return (df, Map.empty)
    val present = df.schema.fieldNames.toSet
    var out = df
    var hwms = Map.empty[String, Long]
    ids.foreach { f =>
      val start = longMeta(f, StartKey, 1L)
      val step = longMeta(f, StepKey, 1L)
      require(step != 0, s"identity column ${f.name}: step must be nonzero")
      val hwm = if (f.metadata.contains(HwmKey)) Some(f.metadata.getLong(HwmKey)) else None
      if (present.contains(f.name)) {
        if (!(f.metadata.contains(AllowKey) && f.metadata.getBoolean(AllowKey)))
          throw UnsupportedOperationError(
            s"identity column ${f.name} is GENERATED ALWAYS; explicit values are not allowed " +
              s"(set $AllowKey to permit them)")
        // explicit values past the watermark advance it (spec: the
        // watermark must bound every stored value)
        val agg = out.agg(if (step > 0) max(col(f.name)) else min(col(f.name))).head
        if (!agg.isNullAt(0)) {
          val extreme = agg.getLong(0)
          val advanced = hwm.fold(extreme)(h => if (step > 0) math.max(h, extreme) else math.min(h, extreme))
          if (!hwm.contains(advanced)) hwms += f.name -> advanced
        }
      } else {
        val base = hwm.map(_ + step).getOrElse(start)
        val spark = out.sparkSession
        val schemaOut = StructType(out.schema.fields :+
          StructField(f.name, LongType, nullable = false, metadata = f.metadata))
        // two-pass dense allocation: count each partition (driver gets
        // O(#partitions) longs), then assign base + i*step from
        // per-partition offsets — the unavoidable shape of gapless ids.
        // The source RDD is persisted so the upstream plan (possibly a
        // heavy transform) evaluates ONCE: the count pass materializes the
        // cache and the assign pass reads it back. Spark's ContextCleaner
        // drops the blocks once the RDD goes out of scope after the write.
        val src = out.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val counts = src.mapPartitionsWithIndex((i, it) =>
          Iterator((i, it.size.toLong))).collect().toMap
        val offsets = counts.toSeq.sortBy(_._1)
          .scanLeft((0, 0L)) { case ((_, acc), (i, c)) => (i, acc + c) }
          .tail.map { case (i, cum) => i -> (cum - counts(i)) }.toMap
        val n = counts.values.sum
        val rdd = src.mapPartitionsWithIndex { (i, it) =>
          var k = offsets(i)
          it.map { r => val v = base + k * step; k += 1; Row.fromSeq(r.toSeq :+ v) }
        }
        out = spark.createDataFrame(rdd, schemaOut)
        if (n > 0) hwms += f.name -> (base + (n - 1) * step)
      }
    }
    (TableSchemas.inTableOrder(out, schema), hwms)
  }

  /** CTAS path: a table created WITH data and identity columns must be
    * born with the watermark covering the seeded values (delta-rs/Spark
    * stamp it at creation), or the first append would re-allocate them.
    * Returns `df` with the watermark stamped into its column metadata —
    * the schema the create commit records.
    */
  def stampCreate(df: DataFrame): DataFrame = {
    val ids = of(df.schema)
    if (ids.isEmpty) return df
    val updated = ids.flatMap { f =>
      val step = longMeta(f, StepKey, 1L)
      val agg = df.agg(if (step > 0) max(col(f.name)) else min(col(f.name))).head
      if (agg.isNullAt(0)) None else Some(f.name -> agg.getLong(0))
    }.toMap
    if (updated.isEmpty) df
    else {
      val stamped = withWatermarks(df.schema, updated)
      df.select(stamped.fields.map(f => col(f.name).as(f.name, f.metadata)).toIndexedSeq: _*)
    }
  }

  /** Publish advanced watermarks into the schema's field metadata (the
    * caller commits this schema in the same metaData action as the data).
    */
  def withWatermarks(schema: StructType, hwms: Map[String, Long]): StructType =
    if (hwms.isEmpty) schema
    else StructType(schema.fields.map { f =>
      hwms.get(f.name).fold(f) { h =>
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(HwmKey, h).build())
      }
    })
}
