package graft.api

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{GoldRush, GoldRush2021, JsonPathLite}
import graft.storage.Catalog

/** `module[::function]` invocation string (ModuleInvocation.java:11-27). */
final case class ModuleInvocation(module: String, function: Option[String])

object ModuleInvocation {
  def parse(s: String): ModuleInvocation = s.split("::", 2) match {
    case Array(m) => ModuleInvocation(m, None)
    case Array(m, f) => ModuleInvocation(m, Some(f))
  }
}

/** A registered code module (CodeModuleEntity.java:9-28). Types:
  *   - `jsonpath`: script is the JSONPath expression (F28)
  *   - `native`: script names a Scala matcher — a shipped one (`goldrush`,
  *     `goldrush2024`, `goldrush2021`) or one the embedding application
  *     registered via [[ModuleRegistry.registerNative]]. This is THE
  *     extension contract for custom matchers: a Scala lambda runs inside
  *     the ingest UDF on executors at full codegen throughput, where the
  *     reference pays a per-record JS-engine round trip
  *     (ModuleJavaScript.java:29-150).
  *   - `javascript`: the reference's stock matchkey scripts (recognized by
  *     their `url`) resolve through an alias table to the golden-verified
  *     native ports, so reference module configs load unmodified. Arbitrary
  *     user scripts would need an embedded JS engine (GraalVM polyglot)
  *     that this build intentionally excludes (zero-egress, no extra deps);
  *     they fail with an error pointing at the `native` SPI — the permanent
  *     contract, not a stopgap.
  */
final case class CodeModule(id: String, mtype: String, script: String,
    function: Option[String] = None, url: Option[String] = None)

/** Per-tenant module registry backed by the catalog, with an in-memory
  * resolve cache invalidated by `reload` (ModuleCache.java:14-18,
  * ReservoirService.java:64-80).
  */
final class ModuleRegistry(catalog: Catalog) {

  private val schema = StructType(Seq(
    StructField("id", StringType), StructField("mtype", StringType),
    StructField("script", StringType), StructField("function", StringType),
    StructField("url", StringType)))

  @volatile private var cache = Map.empty[String, String => Seq[String]]

  def put(m: CodeModule): Unit = {
    val rest = catalog.readOr("config_modules", schema)
      .filter(col("id") =!= m.id)
    val spark = catalog.spark
    val row = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(
        m.id, m.mtype, m.script, m.function.orNull, m.url.orNull)), schema)
    catalog.write("config_modules", rest.unionByName(row))
    reload()
  }

  /** Register a reference-style CodeModuleEntity JSON verbatim
    * (`{"id":…, "type":…, "url"|"script":…, "function":…}`,
    * CodeModuleEntity.java:9-28).
    */
  def putJson(json: String): CodeModule = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def str(f: String): Option[String] =
      Option(node.get(f)).filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
    val m = CodeModule(
      str("id").getOrElse(
        throw new IllegalArgumentException("module config must include 'id'")),
      str("type").getOrElse(
        throw new IllegalArgumentException("module config must include 'type'")),
      str("script").getOrElse(""),
      str("function"), str("url"))
    put(m)
    m
  }

  def list(): Seq[CodeModule] =
    catalog.readOr("config_modules", schema).collect().toSeq.map(r =>
      CodeModule(r.getString(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))

  def get(id: String): Option[CodeModule] = list().find(_.id == id)

  def delete(id: String): Unit = {
    catalog.write("config_modules",
      catalog.readOr("config_modules", schema).filter(col("id") =!= id))
    reload()
  }

  /** purge the compiled-matcher cache (POST /config/modules/reload) */
  def reload(): Unit = synchronized { cache = Map.empty }

  /** Resolve an invocation to a matcher function payloadJson → keys. */
  def resolveMatcher(invocation: String): String => Seq[String] = {
    cache.getOrElse(invocation, synchronized {
      cache.getOrElse(invocation, {
        val f = compile(invocation)
        cache = cache.updated(invocation, f)
        f
      })
    })
  }

  private def compile(invocation: String): String => Seq[String] = {
    val inv = ModuleInvocation.parse(invocation)
    val m = get(inv.module).getOrElse(
      throw new IllegalArgumentException(s"module not found: ${inv.module}"))
    m.mtype match {
      case "jsonpath" =>
        val path = JsonPathLite.compile(m.script)
        p => path.strings(p)
      case "native" => m.script match {
        case "goldrush" | "goldrush2024" =>
          p => try Seq(GoldRush.matchkeyFromPayload(p))
               catch { case _: Exception => Nil }
        case "goldrush2021" =>
          p => try Seq(GoldRush2021.matchkeyFromPayload(p))
               catch { case _: Exception => Nil }
        case other =>
          val f = ModuleRegistry.nativeMatcher(other).getOrElse(
            throw new IllegalArgumentException(
              s"unknown native matcher: $other — register it first: " +
                s"""ModuleRegistry.registerNative("$other", payloadJson => keys)"""))
          // same per-record guard as the builtins: one malformed payload
          // skips the record, never aborts a distributed ingest
          p => try f(p) catch { case _: Exception => Nil }
      }
      case "javascript" =>
        // the two stock matchkey scripts resolve to their golden-verified
        // native ports, so the reference's shipped module configs
        // (js/matchkeys/*/config-matchkeys-*.json) load unmodified
        val src = m.url.getOrElse(m.script)
        ModuleRegistry.stockJsAliases.collectFirst {
          case (marker, f) if src.contains(marker) => f
        }.getOrElse(throw new UnsupportedOperationException(
          s"javascript module '$src' is not a recognized stock script and " +
            "needs an embedded JS engine this build excludes by design. " +
            "Port the matcher to a Scala lambda and register it: " +
            "ModuleRegistry.registerNative(name, payloadJson => keys), then " +
            "re-register this module with type=native, script=name " +
            "(or use type=jsonpath for pure extractions)"))
      case other =>
        throw new IllegalArgumentException(s"unknown module type: $other")
    }
  }
}

object ModuleRegistry {

  private val userNatives =
    new java.util.concurrent.ConcurrentHashMap[String, String => Seq[String]]()

  /** The custom-matcher SPI (the role user JavaScript plays in the
    * reference): register a Scala matcher `payloadJson => keys` under
    * `name`, then register a module `{type: "native", script: name}` and
    * reference it from a matchkey config as `module:<id>`. The lambda must
    * be serializable (it ships to executors inside the ingest UDF) and
    * should return Nil — not throw — on records it cannot key.
    *
    * Process-wide (code, not tenant data): call it at application startup,
    * on every driver that runs ingests.
    */
  def registerNative(name: String, fn: String => Seq[String]): Unit =
    userNatives.put(name, fn)

  /** look up a matcher registered via [[registerNative]] */
  def nativeMatcher(name: String): Option[String => Seq[String]] =
    Option(userNatives.get(name))

  /** javascript→native alias table for the reference's stock matchkey
    * scripts, keyed by the url path segment that identifies each script
    * (checked in order — goldrush2024 before the goldrush/2021 variant).
    */
  val stockJsAliases: Seq[(String, String => Seq[String])] = Seq(
    "matchkeys/goldrush2024/" -> (p =>
      try Seq(GoldRush.matchkeyFromPayload(p))
      catch { case _: Exception => Nil }),
    "matchkeys/goldrush/" -> (p =>
      try Seq(GoldRush2021.matchkeyFromPayload(p))
      catch { case _: Exception => Nil }))
}
