package graft.spec

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Remote/custom schema plumbing — the driver-side configuration layer that
  * feeds [[JsonSchema]] (schemas are config artifacts, fetched and compiled
  * once on the driver, then shipped to executors inside expressions).
  *
  *  - [[SchemaResolver]] mirrors `schema_resolver.py:82-163`: walk a schema,
  *    inline every `$ref` (URL join + optional JSON-pointer fragment) by
  *    fetching the referenced document and merging the resolved object over
  *    the ref site (`dict.update` semantics: resolved keys win).
  *  - [[SchemaStore]] mirrors `schema_downloader.py:82-193`: asserts the
  *    remote URL shape `http(s)://<org>/<project>/schemas/<version>/`,
  *    resolves schemas by name against that base, and can persist resolved
  *    schemas locally (skipping existing files unless `overwrite`).
  *  - [[SchemaLoader]] mirrors `full_submission_validator.py:395-421`
  *    (`load_remote_schema`): split a schema URL into base + name, resolve,
  *    cache under the full URL (the `custom_data_schemas` cache).
  *
  * Fetching is pluggable (`fetch: uri => Option[json]`): production would
  * pass an HTTP fetcher; this sandbox has zero egress so tests pass a map-
  * or filesystem-backed fetcher — exactly how the reference's own test
  * suite mocks `requests.get`.
  */
final class SchemaNotFoundException(val uri: String)
    extends RuntimeException(s"Unable to find the desired schema $uri")

/** Shared fetch + parse + not-found wrapping for the resolver's inline walk
  * and the loader's native-$ref fallback crawl. */
private[spec] object SchemaFetch {
  def json(fetch: String => Option[String], uri: String): JValue =
    fetch(uri) match {
      case Some(body) =>
        try JsonMethods.parse(body)
        catch { case _: Exception => throw new SchemaNotFoundException(uri) }
      case None => throw new SchemaNotFoundException(uri)
    }
}

class SchemaResolver(schemasUri: String, fetch: String => Option[String]) {

  val baseUri: String =
    if (schemasUri.endsWith("/")) schemasUri else schemasUri + "/"

  /** RFC-3986 join (Python urljoin analogue for the http(s) cases used). */
  private def urljoin(base: String, ref: String): String =
    try java.net.URI.create(base).resolve(ref).toString
    catch { case _: IllegalArgumentException => ref }

  private def fetchDoc(uri: String): JValue = SchemaFetch.json(fetch, uri)

  /** Descend a `#/json/pointer` fragment. */
  private def pointer(doc: JValue, frag: String): JValue =
    frag.split("/").filter(_.nonEmpty).foldLeft(doc) { (j, part) =>
      val key = part.replace("~1", "/").replace("~0", "~")
      j match {
        case o: JObject => o \ key match {
          case JNothing => throw new SchemaNotFoundException(frag)
          case v => v
        }
        case JArray(xs) =>
          val i = key.toIntOption.getOrElse(throw new SchemaNotFoundException(frag))
          if (i < xs.size) xs(i) else throw new SchemaNotFoundException(frag)
        case _ => throw new SchemaNotFoundException(frag)
      }
    }

  /** Resolve a URI (absolute or relative to the base), returning the target
    * document/fragment plus the URI it actually lives at (for further
    * relative refs). */
  private def resolveUri(ref: String, relativeTo: String): (String, JValue) = {
    val full = urljoin(relativeTo, ref)
    val (docUri, frag) = full.split("#", 2) match {
      case Array(u, f) => (u, Some(f))
      case _ => (full, None)
    }
    val doc = fetchDoc(docUri)
    (docUri, frag.fold(doc)(pointer(doc, _)))
  }

  private def walkDict(obj: JObject, ref: String, depth: Int): JObject = {
    // depth counts $ref HOPS only (see below), never plain dict/array
    // nesting: a deeply-nested but non-recursive schema must inline exactly
    // as the reference does — only a genuine ref cycle should trip this (and
    // then SchemaLoader falls back to native-RefCell compilation)
    if (depth > 64)
      throw new SchemaNotFoundException(s"$$ref nesting too deep at $ref")
    val out = scala.collection.mutable.LinkedHashMap[String, JValue]()
    obj.obj.foreach {
      case ("$ref", _) => // applied after the loop (dict.update semantics)
      case (k, o: JObject) => out(k) = walkDict(o, ref, depth)
      case (k, JArray(xs)) => out(k) = JArray(xs.map {
        case o: JObject => walkDict(o, ref, depth)
        case v => v
      })
      case (k, v) => out(k) = v
    }
    // Python: out_obj.pop('$ref'); out_obj.update(resolved) — the resolved
    // object's keys win over ALL sibling keys of the $ref site
    obj.obj.collect { case ("$ref", JString(target)) => target }.foreach { t =>
      val (newRef, newObj) = resolveUri(t, ref)
      newObj match {
        case o: JObject =>
          walkDict(o, newRef, depth + 1).obj.foreach { case (k, v) => out(k) = v }
        case other => throw new SchemaNotFoundException(
          s"$$ref target is not an object: $other")
      }
    }
    JObject(out.toList)
  }

  /** Resolve a schema (by absolute URI or name relative to the base),
    * inlining every `$ref`. Throws [[SchemaNotFoundException]] if any
    * document can't be fetched (ref: schema_resolver.py:149-163). */
  def resolve(schemaUri: String): JValue = {
    val (topRef, topObj) = resolveUri(schemaUri, baseUri)
    topObj match {
      case o: JObject => walkDict(o, topRef, 0)
      case v => v
    }
  }
}

/** URL-shape-validated schema store (downloader analogue). */
class SchemaStore(val schemasUrl: String, fetch: String => Option[String]) {

  val normalizedUrl: String =
    if (schemasUrl.endsWith("/")) schemasUrl else schemasUrl + "/"

  // http(s)://<organization>/<project>/schemas/<version>/
  // (ref: schema_downloader.py:110-131)
  val (org, project, version) = {
    val nodes = normalizedUrl.split("/", -1)
    def ok = nodes.length > 5 &&
      nodes(0).matches("https?:") &&
      nodes(2).matches("[\\w.-]+.*") && nodes(2).nonEmpty &&
      nodes(3).matches("[\\w.-]+.*") && nodes(3).nonEmpty &&
      nodes(4) == "schemas" &&
      nodes(5).matches("v?\\d+\\.\\d+(\\.\\d+)?.*")
    if (!ok) throw new IllegalArgumentException("Invalid remote schemas URL")
    (nodes(2), nodes(3), nodes(5))
  }

  private val resolver = new SchemaResolver(normalizedUrl, fetch)

  def getSchemaSpec(schemaName: String): JValue = resolver.resolve(schemaName)

  def getSchemaType(schemaName: String): String = normalizedUrl + schemaName

  /** Persist a resolved schema under `dir/<org>/<project>/<version>/name`;
    * skips existing files unless `overwrite` (ref :167-193). */
  def saveLocally(dir: java.nio.file.Path, schemaName: String,
      schemaSpec: JValue, overwrite: Boolean = false): java.nio.file.Path = {
    val target = dir.resolve(org).resolve(project).resolve(version)
      .resolve(schemaName)
    if (!java.nio.file.Files.isRegularFile(target) || overwrite) {
      java.nio.file.Files.createDirectories(target.getParent)
      java.nio.file.Files.write(target,
        JsonMethods.pretty(JsonMethods.render(schemaSpec))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    target
  }
}

/** Cached loader of remote custom schemas, compiled for the engine
  * (`load_remote_schema` + `custom_data_schemas` analogue). */
class SchemaLoader(fetch: String => Option[String]) {

  private val cache =
    scala.collection.mutable.LinkedHashMap[String, JsonSchema.Compiled]()

  def loadedSchemas: Map[String, JsonSchema.Compiled] = cache.toMap

  /** Register a schema under an explicit type key (the
    * `DataFileValidator.load_custom_schema(type, path)` path). */
  def register(key: String, schemaJson: String): JsonSchema.Compiled =
    cache.getOrElseUpdate(key, JsonSchema.compile(schemaJson))

  /** Fetch + $ref-inline + compile + cache a schema by its full URL
    * (ref: full_submission_validator.py:395-421). Throws
    * [[SchemaNotFoundException]] if unresolvable,
    * IllegalArgumentException on a malformed base URL.
    *
    * RECURSIVE schemas cannot be inlined (the reference's own
    * schema_resolver.py would RecursionError the same way this resolver's
    * depth guard throws) — but jsonschema's VALIDATION path resolves $ref
    * natively and never inlines, so when the inline pass hits the depth
    * guard we fall back to crawling every transitively-referenced document
    * into a store and compiling with native RefCells ([[JsonSchema]]'s
    * cyclic-graph $ref support). */
  def loadRemoteSchema(schemaUrl: String): JsonSchema.Compiled =
    cache.getOrElseUpdate(schemaUrl, {
      val uri = java.net.URI.create(schemaUrl)
      val path = uri.getPath
      val slash = path.lastIndexOf('/')
      val (schemaPath, schemaName) = (path.substring(0, slash), path.substring(slash + 1))
      val baseUrl = s"${uri.getScheme}://${uri.getAuthority}$schemaPath"
      val store = new SchemaStore(baseUrl, fetch)
      try JsonSchema.compile(store.getSchemaSpec(schemaName))
      catch {
        case e: SchemaNotFoundException if e.uri.contains("nesting too deep") =>
          compileWithNativeRefs(schemaUrl)
      }
    })

  private def fetchJson(u: String): JValue = SchemaFetch.json(fetch, u)

  private def compileWithNativeRefs(schemaUrl: String): JsonSchema.Compiled = {
    def refs(j: JValue): List[String] = j match {
      case JObject(fs) => fs.flatMap {
        case ("$ref", JString(u)) => List(u)
        case (_, v) => refs(v)
      }
      case JArray(xs) => xs.flatMap(refs)
      case _ => Nil
    }
    def docOf(ref: String, base: String): Option[String] = {
      val doc = ref.split("#", 2)(0)
      if (doc.isEmpty) None // same-document pointer
      else Some(
        try java.net.URI.create(base).resolve(doc).toString
        catch { case _: Exception => doc })
    }
    val root = fetchJson(schemaUrl)
    val store = scala.collection.mutable.Map.empty[String, JValue]
    val seen = scala.collection.mutable.Set(schemaUrl)
    var frontier = refs(root).flatMap(docOf(_, schemaUrl)).distinct
    while (frontier.nonEmpty) {
      val u = frontier.head
      frontier = frontier.tail
      if (!seen(u)) {
        seen += u
        val doc = fetchJson(u)
        store(u) = doc
        frontier ++= refs(doc).flatMap(docOf(_, u)).filterNot(seen)
      }
    }
    JsonSchema.compile(root, store.toMap, Some(schemaUrl))
  }

  /** True iff the URL resolves (and caches it as a side effect) — the
    * computed replacement for FullSubmission's `resolvableSchemas` input. */
  def resolvable(schemaUrl: String): Boolean =
    try { loadRemoteSchema(schemaUrl); true }
    catch { case _: SchemaNotFoundException | _: IllegalArgumentException => false }

  def isLoaded(schemaUrl: String): Boolean = cache.contains(schemaUrl)
}

object SchemaLoader {
  /** Fetcher over an in-memory map (tests / pre-seeded registries). */
  def mapFetcher(m: Map[String, String]): String => Option[String] = m.get

  /** Fetcher that maps URLs into a local directory mirror:
    * `https://host/a/b.json` → `<root>/host/a/b.json`. */
  def dirFetcher(root: java.nio.file.Path): String => Option[String] = { url =>
    try {
      val uri = java.net.URI.create(url)
      val p = root.resolve(uri.getAuthority + uri.getPath.replaceAll("^/", "/").stripPrefix("/"))
      if (java.nio.file.Files.isRegularFile(p))
        Some(new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8))
      else None
    } catch { case _: Exception => None }
  }
}
