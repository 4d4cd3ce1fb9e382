package graft.tables

import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Name-mapping resolution for ID-LESS data files in a renamed table
  * (spec "Column Projection" + "Name Mapping Serialization"): files
  * written by engines that stamp no parquet field ids resolve through
  * `schema.name-mapping.default` when set, else through the mapping the
  * schemas history implies — instead of failing or nulling out.
  */
class IcebergNameMappingSpec extends AnyFunSuite {

  private implicit val fmts: Formats = DefaultFormats
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seed = Seq((1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0))

  /** Strip parquet field ids from every data file of the table — the
    * footer shape a foreign id-less writer (or an imported hive table)
    * leaves behind. Row contents and column names stay untouched.
    */
  private def stripFieldIds(location: String): Unit = {
    val st = IcebergLog.state(spark, location)
    val fs = IcebergLog.fs(spark, location)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
    try st.files.foreach { a =>
      val rows = spark.read.schema(st.schema).parquet(a.path)
      val tmp = TestSpark.tmpDir("strip-ids")
      rows.repartition(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp))
        .map(_.getPath).find(_.getName.endsWith(".parquet")).get
      fs.delete(new Path(a.path), false)
      fs.rename(part, new Path(a.path))
    } finally spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
  }

  /** Foreign rename of a top-level column (same shape as
    * IcebergFieldIdSpec.foreignRename).
    */
  private def foreignRename(location: String, from: String, to: String): Unit = {
    val f = IcebergLog.fs(spark, location)
    val v = IcebergLog.latestMetadataVersion(spark, location).get
    val meta = IcebergLog.metaAt(spark, location, v)
    val cur = IcebergLog.currentSchemaJson(meta)
    val prior = (meta \ "schemas").extractOpt[Seq[JValue]].getOrElse(Seq(cur))
    val nextId = prior.flatMap(s => (s \ "schema-id").extractOpt[Int]).maxOption.getOrElse(0) + 1
    val renamed = cur.transformField {
      case ("fields", JArray(fs0)) => "fields" -> JArray(fs0.map {
        case fo: JObject if (fo \ "name") == JString(from) =>
          fo.transformField { case ("name", _) => "name" -> JString(to) }
        case other => other
      })
      case ("schema-id", _) => "schema-id" -> JInt(nextId)
    }
    val newMeta = meta
      .replace(List("schemas"), JArray((prior :+ renamed).toList))
      .replace(List("current-schema-id"), JInt(nextId))
    val body = JsonMethods.compact(JsonMethods.render(newMeta))
    val dir = IcebergLog.metadataDir(location)
    val out = f.create(new Path(dir, s"v${v + 1}.metadata.json"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    val hint = f.create(new Path(dir, "version-hint.text"), true)
    hint.write((v + 1).toString.getBytes("UTF-8")); hint.close()
  }

  private def setProperty(location: String, key: String, value: String): Unit = {
    val f = IcebergLog.fs(spark, location)
    val v = IcebergLog.latestMetadataVersion(spark, location).get
    val meta = IcebergLog.metaAt(spark, location, v)
    val props = (meta \ "properties") match {
      case JObject(fields) => fields.filterNot(_._1 == key)
      case _ => Nil
    }
    val newMeta = meta.asInstanceOf[JObject].obj.filterNot(_._1 == "properties") :+
      ("properties" -> (JObject(props :+ (key -> (JString(value): JValue))): JValue))
    val body = JsonMethods.compact(JsonMethods.render(JObject(newMeta)))
    val dir = IcebergLog.metadataDir(location)
    val out = f.create(new Path(dir, s"v${v + 1}.metadata.json"), true)
    out.write(body.getBytes("UTF-8")); out.close()
    val hint = f.create(new Path(dir, "version-hint.text"), true)
    hint.write((v + 1).toString.getBytes("UTF-8")); hint.close()
  }

  test("history-derived mapping: id-less files resolve after a rename") {
    val loc = TestSpark.tmpDir("ice-nm-hist") + "/t"
    IcebergWriter.create(spark, loc, seed.toDF("id", "name", "score"))
    stripFieldIds(loc)
    foreignRename(loc, "name", "label")
    val got = IcebergLog.toDF(spark, loc)
    assert(got.schema.fieldNames.toSeq == Seq("id", "label", "score"))
    assert(got.select("label").as[String].collect().toSet == Set("alpha", "beta", "gamma"))
    assert(got.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("explicit schema.name-mapping.default wins over history") {
    val loc = TestSpark.tmpDir("ice-nm-prop") + "/t"
    IcebergWriter.create(spark, loc, seed.toDF("id", "name", "score"))
    stripFieldIds(loc)
    foreignRename(loc, "name", "label")
    // the mapping says field 2 was ALSO known as "title" — and maps field
    // ids exactly the way iceberg-java serializes it
    setProperty(loc, "schema.name-mapping.default",
      """[{"field-id":1,"names":["id"]},{"field-id":2,"names":["label","name","title"]},{"field-id":3,"names":["score"]}]""")
    val got = IcebergLog.toDF(spark, loc)
    assert(got.select("label").as[String].collect().toSet == Set("alpha", "beta", "gamma"))
  }

  test("mixed eras: id-less old files + id-bearing new files union") {
    val loc = TestSpark.tmpDir("ice-nm-mixed") + "/t"
    IcebergWriter.create(spark, loc, seed.toDF("id", "name", "score"))
    stripFieldIds(loc)
    foreignRename(loc, "name", "label")
    // post-rename append goes through our writer: id-stamped, new name
    IcebergWriter.append(spark, loc, Seq((4L, "delta", 40.0)).toDF("id", "label", "score"))
    val got = IcebergLog.toDF(spark, loc)
    assert(got.count() == 4)
    assert(got.select("label").as[String].collect().toSet ==
      Set("alpha", "beta", "gamma", "delta"))
    // predicate scan across both eras stays correct
    assert(IcebergLog.scan(spark, loc, "label = 'beta' OR label = 'delta'")
      .select("id").as[Long].collect().toSet == Set(2L, 4L))
  }

  test("field absent from an id-less file reads as null (evolution add)") {
    val loc = TestSpark.tmpDir("ice-nm-null") + "/t"
    IcebergWriter.create(spark, loc, seed.toDF("id", "name", "score"))
    stripFieldIds(loc)
    foreignRename(loc, "name", "label")
    // evolve in a column through the TxTable surface: old id-less files
    // lack it entirely
    val t = TxTable.forAnyLocation(spark, loc)
    t.append(Seq((5L, "eps", 50.0, "x")).toDF("id", "label", "score", "tag"),
      evolution = graft.catalog.SchemaEvolution.MERGE)
    val got = IcebergLog.toDF(spark, loc)
    assert(got.count() == 4)
    assert(got.filter(got("tag").isNull).count() == 3)
    assert(got.filter(got("tag") === "x").count() == 1)
  }

  test("repeated plannings sniff each id-less footer once (immutable-file cache)") {
    val loc = TestSpark.tmpDir("ice-nm-cache") + "/t"
    // several files across two snapshots
    IcebergWriter.create(spark, loc,
      seed.toDF("id", "name", "score").repartition(3))
    IcebergWriter.append(spark, loc,
      Seq((4L, "delta", 40.0)).toDF("id", "name", "score"))
    stripFieldIds(loc)
    foreignRename(loc, "name", "label")
    val files = IcebergLog.state(spark, loc).files
    assert(files.size >= 2)
    // three separate plannings: scan, filtered scan, scan
    assert(IcebergLog.toDF(spark, loc).count() == 4)
    assert(IcebergLog.toDF(spark, loc)
      .filter(org.apache.spark.sql.functions.col("label") === "alpha").count() == 1)
    assert(IcebergLog.toDF(spark, loc).count() == 4)
    // every footer was sniffed EXACTLY once — later plannings hit the
    // JVM-wide cache (files are immutable; key includes manifest size)
    files.foreach { f =>
      assert(IcebergLog.footerSniffCounts.get(f.path) == 1L,
        s"${f.path} sniffed ${IcebergLog.footerSniffCounts.get(f.path)} times")
    }
  }
}
