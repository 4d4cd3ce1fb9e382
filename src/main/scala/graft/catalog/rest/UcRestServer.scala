package graft.catalog.rest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.util.control.NonFatal

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._

import graft.catalog._

/** Unity-Catalog-compatible REST server over any CatalogStore — the
  * counterpart of the reference's HTTP client layer
  * (/root/reference/uchelper/uc_api_wrapper.py:18-21 routes, 24-56 error
  * shapes): `/api/2.1/unity-catalog/{catalogs,schemas,tables}` with UC's
  * snake_case JSON, `{error_code, message}` errors (ALREADY_EXISTS → 409,
  * NOT_FOUND → 404), `page_token`/`max_results` pagination with
  * `next_page_token`, and the root health banner "Hello, Unity Catalog!"
  * (uc_api_wrapper.py:59-72).
  *
  * Loopback-only by construction; a lakehouse catalog is driver-side
  * metadata (table counts, not data volumes), so a single-process HTTP
  * facade is the correct scale posture — data I/O never flows through it.
  */
final class UcRestServer(store: CatalogStore, port: Int = 0) {

  private val ApiPath = "/api/2.1/unity-catalog"

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def address: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  // bounded worker pool: concurrent clients must not serialize behind one
  // slow request (the store itself is synchronized — handlers are short
  // critical sections, so a small pool saturates it)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "uc-rest-worker"); t.setDaemon(true); t })

  def start(): UcRestServer = {
    server.createContext("/", exchange => safely(exchange)(handle))
    server.setExecutor(pool)
    server.start()
    this
  }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def safely(ex: HttpExchange)(f: HttpExchange => Unit): Unit =
    try f(ex)
    catch {
      case AlreadyExistsError(m) => respond(ex, 409, UcJson.errorJson("ALREADY_EXISTS", m))
      case DoesNotExistError(m) => respond(ex, 404, UcJson.errorJson("NOT_FOUND", m))
      case UnsupportedOperationError(m) => respond(ex, 400, UcJson.errorJson("INVALID_ARGUMENT", m))
      case NonFatal(e) =>
        respond(ex, 500, UcJson.errorJson("INTERNAL", Option(e.getMessage).getOrElse(e.toString)))
    } finally ex.close()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").toSeq
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  private def body(ex: HttpExchange): JValue =
    UcJson.parse(new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))

  private def optParam(q: Map[String, String], k: String): Option[String] =
    q.get(k).filter(s => s.nonEmpty && s != "None" && s != "null")

  private def handle(ex: HttpExchange): Unit = {
    val method = ex.getRequestMethod.toUpperCase
    val path = ex.getRequestURI.getPath
    val q = query(ex)

    if (!path.startsWith(ApiPath)) {
      // health banner, matched by the reference's health_check
      respond(ex, 200, "\"Hello, Unity Catalog!\"")
      return
    }

    val rest = path.stripPrefix(ApiPath)
    val parts = rest.split("/").toList.filter(_.nonEmpty)

    (method, parts) match {
      // ---- catalogs ----
      case ("POST", "catalogs" :: Nil) =>
        val c = UcJson.catalogFromJson(body(ex))
        respond(ex, 200, UcJson.render(UcJson.catalogToJson(store.createCatalog(c))))
      case ("GET", "catalogs" :: Nil) =>
        val (cs, next) = store.listCatalogs(
          optParam(q, "max_results").map(_.toInt), optParam(q, "page_token"))
        respond(ex, 200, UcJson.render(JObject(
          "catalogs" -> JArray(cs.toList.map(UcJson.catalogToJson)),
          "next_page_token" -> next.map(JString(_): JValue).getOrElse(JNull))))
      case ("GET", "catalogs" :: name :: Nil) =>
        respond(ex, 200, UcJson.render(UcJson.catalogToJson(store.getCatalog(name))))
      case ("PATCH", "catalogs" :: name :: Nil) =>
        val b = body(ex)
        val updated = store.updateCatalog(name,
          newName = (b \ "new_name") match { case JString(s) if s.nonEmpty => Some(s); case _ => None },
          comment = (b \ "comment") match { case JString(s) => Some(s); case _ => None },
          properties = (b \ "properties") match {
            case JObject(fs) => Some(fs.collect { case (k, JString(v)) => k -> v }.toMap)
            case _ => None
          })
        respond(ex, 200, UcJson.render(UcJson.catalogToJson(updated)))
      case ("DELETE", "catalogs" :: name :: Nil) =>
        try {
          store.deleteCatalog(name, q.get("force").contains("true"))
          respond(ex, 200, "{}")
        } catch {
          case UnsupportedOperationError(_) =>
            // reference detects this case by message text (uc_api_wrapper.py:125-126)
            respond(ex, 400, UcJson.errorJson("INVALID_ARGUMENT", "Cannot delete catalog with schemas"))
        }

      // ---- schemas ----
      case ("POST", "schemas" :: Nil) =>
        val s = UcJson.schemaFromJson(body(ex))
        respond(ex, 200, UcJson.render(UcJson.schemaToJson(store.createSchema(s))))
      case ("GET", "schemas" :: Nil) =>
        val catalog = q.getOrElse("catalog_name",
          throw UnsupportedOperationError("catalog_name query parameter is required"))
        val (ss, next) = store.listSchemas(catalog,
          optParam(q, "max_results").map(_.toInt), optParam(q, "page_token"))
        respond(ex, 200, UcJson.render(JObject(
          "schemas" -> JArray(ss.toList.map(UcJson.schemaToJson)),
          "next_page_token" -> next.map(JString(_): JValue).getOrElse(JNull))))
      case ("GET", "schemas" :: full :: Nil) =>
        val (cat, name) = splitFullName2(full)
        respond(ex, 200, UcJson.render(UcJson.schemaToJson(store.getSchema(cat, name))))
      case ("PATCH", "schemas" :: full :: Nil) =>
        val (cat, name) = splitFullName2(full)
        val b = body(ex)
        val updated = store.updateSchema(cat, name,
          newName = (b \ "new_name") match { case JString(s) if s.nonEmpty => Some(s); case _ => None },
          comment = (b \ "comment") match { case JString(s) => Some(s); case _ => None },
          properties = (b \ "properties") match {
            case JObject(fs) => Some(fs.collect { case (k, JString(v)) => k -> v }.toMap)
            case _ => None
          })
        respond(ex, 200, UcJson.render(UcJson.schemaToJson(updated)))
      case ("DELETE", "schemas" :: full :: Nil) =>
        val (cat, name) = splitFullName2(full)
        try {
          store.deleteSchema(cat, name, q.get("force").contains("true"))
          respond(ex, 200, "{}")
        } catch {
          case UnsupportedOperationError(_) =>
            respond(ex, 400, UcJson.errorJson("INVALID_ARGUMENT", "Cannot delete schema with tables"))
        }

      // ---- tables ----
      case ("POST", "tables" :: Nil) =>
        val t = UcJson.tableFromJson(body(ex))
        respond(ex, 200, UcJson.render(UcJson.tableToJson(store.createTable(t))))
      case ("GET", "tables" :: Nil) =>
        val catalog = q.getOrElse("catalog_name",
          throw UnsupportedOperationError("catalog_name query parameter is required"))
        val schema = q.getOrElse("schema_name",
          throw UnsupportedOperationError("schema_name query parameter is required"))
        val (ts, next) = store.listTables(catalog, schema,
          optParam(q, "max_results").map(_.toInt), optParam(q, "page_token"))
        respond(ex, 200, UcJson.render(JObject(
          "tables" -> JArray(ts.toList.map(UcJson.tableToJson)),
          "next_page_token" -> next.map(JString(_): JValue).getOrElse(JNull))))
      case ("GET", "tables" :: full :: Nil) =>
        val (cat, sch, name) = splitFullName3(full)
        respond(ex, 200, UcJson.render(UcJson.tableToJson(store.getTable(cat, sch, name))))
      case ("DELETE", "tables" :: full :: Nil) =>
        val (cat, sch, name) = splitFullName3(full)
        store.deleteTable(cat, sch, name)
        respond(ex, 200, "{}")

      case _ =>
        respond(ex, 404, UcJson.errorJson("NOT_FOUND", s"no route for $method $path"))
    }
  }

  private def splitFullName2(full: String): (String, String) = full.split("\\.", 2) match {
    case Array(a, b) => (a, b)
    case _ => throw UnsupportedOperationError(s"expected <catalog>.<schema>, got '$full'")
  }

  private def splitFullName3(full: String): (String, String, String) = full.split("\\.", 3) match {
    case Array(a, b, c) => (a, b, c)
    case _ => throw UnsupportedOperationError(s"expected <catalog>.<schema>.<table>, got '$full'")
  }
}
