package graft.catalog.rest

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.catalog._
import graft.types.UcType

/** Unity-Catalog-wire JSON for the catalog models — the snake_case field
  * names and column shape of the UC OSS REST API that the reference's
  * pydantic models (de)serialize (/root/reference/uchelper/models.py:
  * 13-38, 91-138, 175-214; aliases `type_name` models.py:97-98 and
  * `data_source_format` models.py:184).
  *
  * Columns carry both the display fields (type_name/type_text/precision/
  * scale/interval) and `type_json` (Spark StructField JSON — the lossless
  * field UC itself stores); decode prefers type_json.
  */
object UcJson {

  private def jstr(o: Option[String]): JValue = o.map(JString(_)).getOrElse(JNull)
  private def jprops(m: Map[String, String]): JValue =
    JObject(m.toList.map { case (k, v) => k -> (JString(v): JValue) })

  private def optStr(v: JValue): Option[String] = v match {
    case JString(s) => Some(s)
    case _ => None
  }
  private def str(v: JValue, default: String = ""): String = v match {
    case JString(s) => s
    case _ => default
  }
  private def long(v: JValue, default: Long = 0L): Long = v match {
    case JInt(i) => i.toLong
    case JLong(l) => l
    case JDecimal(d) => d.toLong
    case JDouble(d) => d.toLong
    case _ => default
  }
  private def int(v: JValue): Option[Int] = v match {
    case JInt(i) => Some(i.toInt)
    case JLong(l) => Some(l.toInt)
    case _ => None
  }
  private def bool(v: JValue, default: Boolean): Boolean = v match {
    case JBool(b) => b
    case _ => default
  }
  private def props(v: JValue): Map[String, String] = v match {
    case JObject(fields) => fields.collect { case (k, JString(s)) => k -> s }.toMap
    case _ => Map.empty
  }

  def render(v: JValue): String = JsonMethods.compact(JsonMethods.render(v))
  def parse(s: String): JValue = JsonMethods.parse(s)

  // ---- catalogs ----

  def catalogToJson(c: CatalogInfo): JValue = JObject(
    "name" -> JString(c.name),
    "comment" -> jstr(c.comment),
    "properties" -> jprops(c.properties),
    "created_at" -> JLong(c.createdAtMs),
    "updated_at" -> c.updatedAtMs.map(JLong(_): JValue).getOrElse(JNull),
    "id" -> JString(c.id))

  def catalogFromJson(v: JValue): CatalogInfo = CatalogInfo(
    name = str(v \ "name"),
    comment = optStr(v \ "comment"),
    properties = props(v \ "properties"),
    createdAtMs = long(v \ "created_at"),
    updatedAtMs = (v \ "updated_at") match { case JNull | JNothing => None; case x => Some(long(x)) },
    id = str(v \ "id"))

  // ---- schemas ----

  def schemaToJson(s: SchemaInfo): JValue = JObject(
    "name" -> JString(s.name),
    "catalog_name" -> JString(s.catalogName),
    "comment" -> jstr(s.comment),
    "properties" -> jprops(s.properties),
    "full_name" -> JString(s.fullName),
    "created_at" -> JLong(s.createdAtMs),
    "updated_at" -> s.updatedAtMs.map(JLong(_): JValue).getOrElse(JNull),
    "schema_id" -> JString(s.schemaId))

  def schemaFromJson(v: JValue): SchemaInfo = SchemaInfo(
    name = str(v \ "name"),
    catalogName = str(v \ "catalog_name"),
    comment = optStr(v \ "comment"),
    properties = props(v \ "properties"),
    createdAtMs = long(v \ "created_at"),
    updatedAtMs = (v \ "updated_at") match { case JNull | JNothing => None; case x => Some(long(x)) },
    schemaId = str(v \ "schema_id"))

  // ---- columns ----

  def columnToJson(c: ColumnInfo): JValue = {
    val (precision, scale) = c.dataType match {
      case UcType.DecimalT(p, s) => (Some(p), Some(s))
      case _ => (None, None)
    }
    val interval = c.dataType match {
      case UcType.IntervalT(q) => Some(q)
      case _ => None
    }
    JObject(
      "name" -> JString(c.name),
      "type_name" -> JString(c.dataType.name),
      "type_text" -> JString(c.typeText),
      "type_json" -> JString(
        org.apache.spark.sql.types.StructType(Seq(c.toStructField)).json match {
          // unwrap {"type":"struct","fields":[<field>]} to the bare field JSON
          case s => s.stripPrefix("""{"type":"struct","fields":[""").stripSuffix("]}")
        }),
      "type_precision" -> precision.map(JInt(_): JValue).getOrElse(JNull),
      "type_scale" -> scale.map(JInt(_): JValue).getOrElse(JNull),
      "type_interval_type" -> interval.map(JString(_): JValue).getOrElse(JNull),
      "position" -> JInt(c.position),
      "comment" -> jstr(c.comment),
      "nullable" -> JBool(c.nullable),
      "partition_index" -> c.partitionIndex.map(JInt(_): JValue).getOrElse(JNull))
  }

  def columnFromJson(v: JValue): ColumnInfo = {
    val dataType = optStr(v \ "type_json") match {
      case Some(json) =>
        val f = org.apache.spark.sql.types.DataType.fromJson(s"""{"type":"struct","fields":[$json]}""")
          .asInstanceOf[org.apache.spark.sql.types.StructType].fields(0)
        UcType.fromSpark(f.dataType)
      case None =>
        (str(v \ "type_name").toUpperCase, int(v \ "type_precision"), int(v \ "type_scale")) match {
          case ("DECIMAL", Some(p), Some(s)) => UcType.DecimalT(p, s)
          case ("INTERVAL", _, _) =>
            UcType.fromString(("INTERVAL " + str(v \ "type_interval_type")).trim)
          case (n, _, _) => UcType.fromString(n)
        }
    }
    ColumnInfo(
      name = str(v \ "name"),
      dataType = dataType,
      position = int(v \ "position").getOrElse(0),
      comment = optStr(v \ "comment"),
      nullable = bool(v \ "nullable", default = true),
      partitionIndex = int(v \ "partition_index"))
  }

  // ---- tables ----

  def tableToJson(t: TableInfo): JValue = JObject(
    "name" -> JString(t.name),
    "catalog_name" -> JString(t.catalogName),
    "schema_name" -> JString(t.schemaName),
    "table_type" -> JString(t.tableType.toString),
    "data_source_format" -> JString(t.fileType.toString),
    "columns" -> JArray(t.columns.toList.map(columnToJson)),
    "storage_location" -> jstr(t.storageLocation),
    "comment" -> jstr(t.comment),
    "properties" -> jprops(t.properties),
    "created_at" -> JLong(t.createdAtMs),
    "updated_at" -> t.updatedAtMs.map(JLong(_): JValue).getOrElse(JNull),
    "table_id" -> JString(t.tableId))

  def tableFromJson(v: JValue): TableInfo = TableInfo(
    name = str(v \ "name"),
    catalogName = str(v \ "catalog_name"),
    schemaName = str(v \ "schema_name"),
    tableType = TableType.fromString(str(v \ "table_type", "EXTERNAL")),
    fileType = FileType.fromString(str(v \ "data_source_format", "DELTA")),
    columns = (v \ "columns") match {
      case JArray(cols) => cols.map(columnFromJson)
      case _ => Seq.empty
    },
    storageLocation = optStr(v \ "storage_location"),
    comment = optStr(v \ "comment"),
    properties = props(v \ "properties"),
    createdAtMs = long(v \ "created_at"),
    updatedAtMs = (v \ "updated_at") match { case JNull | JNothing => None; case x => Some(long(x)) },
    tableId = str(v \ "table_id"))

  // ---- errors ----

  def errorJson(code: String, message: String): String =
    render(JObject("error_code" -> JString(code), "message" -> JString(message)))
}
