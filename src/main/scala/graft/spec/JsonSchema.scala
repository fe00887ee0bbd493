package graft.spec

import org.json4s._

/** A compiled JSON-Schema (draft-04/06 subset) and its evaluator — the
  * engine's analogue of the reference's custom-schema path
  * (data_file_validator.py:52-78,117-132: a user-supplied JSON Schema is
  * loaded per data `type` and documents are validated against it instead of
  * the standard HEPData schema).
  *
  * NOT a port of the `jsonschema` library: the schema is compiled ONCE on
  * the driver into this immutable tree, shipped inside a Catalyst expression
  * ([[JsonSchemaCheck]]), and evaluated per row in one recursive pass — the
  * shape that runs at 10^12 docs. Message grammar reproduces `jsonschema`'s
  * formatting as surfaced by the reference
  * (hepdata_validator/__init__.py:159-182): `<message> in '<location>'
  * (expected: {schema python-repr})`, with anyOf/oneOf "best error in
  * context" selection per `jsonschema.exceptions.by_relevance` (weak =
  * anyOf/oneOf).
  *
  * Supported keywords: type (incl. unions), properties, patternProperties,
  * required, additionalProperties (bool incl. the not-match-any-regex
  * wording, and schema form), items, anyOf, oneOf, allOf, not,
  * if/then/else, const, enum, pattern, maxLength, minLength,
  * minimum/maximum (incl. the draft-04 boolean exclusiveMinimum/Maximum
  * modifiers), exclusiveMinimum/Maximum (numeric form), multipleOf,
  * minProperties/maxProperties, minItems, maxItems, uniqueItems, contains
  * (+ minContains/maxContains at 2020-12), propertyNames, dependencies
  * (array and schema forms), the 2020-12 dependentRequired/
  * dependentSchemas split, tuple-form `items` + `additionalItems`
  * (draft-04/06/07), `prefixItems` + items-after-prefix incl. the
  * `items: false` "Expected at most N items" wording (2020-12), schema-form
  * `additionalProperties`, and `$ref` — same-document JSON-pointer refs
  * (`#`, `#/a/~1b`) incl. RECURSIVE schemas (compiled to a cyclic graph via
  * [[RefCell]], never inlined), plain-name anchors (`#name` via `$anchor`,
  * or the legacy `$id`/`id: "#name"` spellings), plus absolute-URI refs
  * against a caller store (opaque store docs inherit the referring draft).
  * Legacy drafts ignore `$ref` siblings (jsonschema
  * ignore_ref_siblings); 2020-12 evaluates them alongside. 2020-12
  * `unevaluatedProperties`/`unevaluatedItems` are implemented with
  * jsonschema's annotation-style evaluated-key/index discovery (valid
  * combinator branches, if/then/else, dependentSchemas, $ref targets —
  * _utils.find_evaluated_*_by_schema). Draft selection
  * follows the root `$schema` like jsonschema's validator_for (absent ⇒
  * 2020-12); keywords OUTSIDE the selected draft's vocabulary are
  * annotations there and are ignored, which is exactly what the reference
  * does.
  *
  * `$dynamicRef`/`$dynamicAnchor` complete the surface: static fallback to
  * the lexical anchor, 2020-12 bookending (rebinding walks the runtime
  * dynamic scope, outermost document first — cross-document extension
  * pinned live against jsonschema+referencing). Every validation keyword
  * of drafts 4/6/7/2020-12 that the reference's jsonschema enforces is now
  * implemented; schema BUGS (unresolvable refs/anchors, tuple items at
  * 2020-12, boolean exclusives at draft-06+) still fail loudly at compile
  * — never silently. `format` is annotation-only in the reference (no
  * FormatChecker is ever passed, __init__.py:97-122).
  */
object JsonSchema {

  /** Mutable resolution cell for a `$ref` — filled in after the main compile
    * pass so RECURSIVE schemas (a ref cycle in the schema graph) compile to a
    * cyclic object graph instead of infinite inlining. Identity equality on
    * purpose: case-class equals/hashCode on the cyclic [[Compiled]] graph
    * terminates because cells compare by reference. Java serialization
    * handles the cycles natively (back-references), so a compiled recursive
    * schema still ships inside a Catalyst expression. */
  final class RefCell(val key: String) extends Serializable {
    @volatile var target: Compiled = _
    override def toString: String = s"RefCell($key)"
  }

  /** `$dynamicRef "#name"` resolution state. Statically it behaves like an
    * anchor ref to `fallback` (the lexical match in its own document); when
    * that match is a `$dynamicAnchor`, evaluation REBINDS to the first
    * document in the DYNAMIC SCOPE (entry order, outermost first) that
    * declares a `$dynamicAnchor` of the same name — `candidates` maps
    * docUri → compiled anchor target (2020-12 bookending rule; behavior
    * pinned live against jsonschema+referencing). */
  final class DynCell(val name: String) extends Serializable {
    @volatile var isDynamic: Boolean = false
    @volatile var fallback: Compiled = _
    @volatile var candidates: Map[String, Compiled] = Map.empty
    override def toString: String = s"DynCell($name)"
  }

  final case class Compiled(
      draft: Int, // 4, 6, 7 or 2020 — selected by the ROOT $schema
      falseSchema: Boolean, // the boolean schema `false`: nothing validates
      types: Option[Seq[String]],
      properties: Seq[(String, Compiled)],
      patternProps: Seq[(String, Compiled)],
      required: Seq[String],
      additionalAllowed: Boolean,
      // schema-form additionalProperties: each extra key's VALUE validates
      // against this subschema (jsonschema _keywords.additionalProperties)
      additionalSchema: Option[Compiled],
      items: Option[Compiled],
      // draft-04/06/07 tuple form `items: [s0, s1, ...]` (positional)
      tupleItems: Option[Seq[Compiled]],
      // legacy additionalItems: schema form descends items past the tuple;
      // boolean false yields the "Additional items are not allowed" error
      addItemsSchema: Option[Compiled],
      addItemsAllowed: Boolean,
      // 2020-12: positional prefixItems; `items` then covers the rest, and
      // `items: false` gets the bespoke "Expected at most N items" wording
      prefixItems: Seq[Compiled],
      itemsFalse: Boolean,
      // 2020-12 unevaluated*: keys/indexes not covered by any evaluated
      // applicator (incl. valid combinator branches and $ref targets —
      // jsonschema _utils.find_evaluated_*_by_schema) must satisfy these
      additionalPresent: Boolean, // additionalProperties key present at all
      unevalProps: Option[Compiled],
      unevalPropsIsFalse: Boolean, // literal `false` picks the other wording
      unevalItems: Option[Compiled],
      // $ref: resolved lazily via the cell (legacy drafts ignore siblings;
      // 2020-12 evaluates $ref alongside them in dict order)
      refCell: Option[RefCell],
      dynRefCell: Option[DynCell], // 2020-12 $dynamicRef "#name"
      docUri: String, // document this node was compiled from ("" = root)
      anyOf: Seq[Compiled],
      oneOf: Seq[Compiled],
      allOf: Seq[Compiled],
      notSchema: Option[Compiled],
      // draft-04/06/07 `dependencies` (mixed array/schema forms, dict order)
      dependencies: Seq[(String, Either[Seq[String], Compiled])],
      dependentRequired: Seq[(String, Seq[String])], // 2020-12 split
      dependentSchemas: Seq[(String, Compiled)],
      propNames: Option[Compiled],
      containsSchema: Option[Compiled],
      minContains: Option[Long], maxContains: Option[Long],
      ifSchema: Option[Compiled],
      thenSchema: Option[Compiled], elseSchema: Option[Compiled],
      constVal: Option[JValue],
      enumVals: Option[Seq[JValue]],
      pattern: Option[String],
      maxLength: Option[Long], minLength: Option[Long],
      // bounds keep the RAW JValue: Python reprs 3 and 3.0 differently and
      // the bound is embedded verbatim in the message
      minimum: Option[JValue], maximum: Option[JValue],
      minExclusive: Boolean, maxExclusive: Boolean, // draft-04 boolean form
      exclusiveMinimum: Option[JValue], exclusiveMaximum: Option[JValue],
      multipleOf: Option[JValue], // raw: int vs float divisor semantics differ
      minProperties: Option[Long], maxProperties: Option[Long],
      minItems: Option[Long], maxItems: Option[Long],
      uniqueItems: Boolean,
      repr: String,          // python repr of the original schema dict
      hasSchemaKey: Boolean, // '$schema' present ⇒ no "(expected: ...)" suffix
      keyOrder: Seq[String]) // original dict key order — drives error order
      extends Serializable {
    @transient lazy val propMap: Map[String, Compiled] = properties.toMap
    @transient lazy val compiledPattern: Option[java.util.regex.Pattern] =
      pattern.map(java.util.regex.Pattern.compile)
    @transient lazy val compiledPatternProps: Seq[(java.util.regex.Pattern, Compiled)] =
      patternProps.map { case (p, sub) => java.util.regex.Pattern.compile(p) -> sub }
  }

  /** One validation error, pre-formatting. Path elements: Left(index) for
    * arrays, Right(key) for objects. */
  final case class Err(
      message: String,
      path: List[Either[Int, String]],
      validator: String,
      schema: Compiled,
      matchesType: Boolean,
      context: List[Err] = Nil)

  // ---------------------------------------------------------------- compile

  /** Spec-defined validation keywords the evaluator does NOT implement,
    * per draft — EMPTY as of round 4 (the full reference-enforced surface
    * is implemented). The loud-reject plumbing stays: silently ignoring a
    * keyword the reference's jsonschema WOULD enforce is under-validation,
    * the worst failure mode for a validator. Keywords OUTSIDE a draft's
    * vocabulary are a different story: jsonschema ignores them as
    * annotations (e.g. `dependencies` under 2020-12, `if` under draft-06,
    * or the reference's own non-spec 'name' key), so ignoring them is
    * faithful. */
  private def unsupportedIn(draft: Int): Set[String] = Set.empty

  /** The validation vocabulary of each draft — keywords outside it are
    * annotations there (jsonschema ignores them; so do we). */
  private val BaseKeywords = Set(
    "type", "properties", "patternProperties", "required",
    "additionalProperties", "items", "anyOf", "oneOf", "allOf", "not",
    "enum", "pattern", "maxLength", "minLength", "minimum", "maximum",
    "multipleOf", "minItems", "maxItems", "uniqueItems",
    "minProperties", "maxProperties")
  private def inDraft(kw: String, draft: Int): Boolean = kw match {
    case k if BaseKeywords(k) => true
    case "$ref" => true
    case "dependencies" | "additionalItems" => draft < 2020
    case "exclusiveMinimum" | "exclusiveMaximum" => true // bool@4, numeric@6+
    case "const" | "contains" | "propertyNames" => draft >= 6
    case "if" | "then" | "else" => draft >= 7
    case "dependentRequired" | "dependentSchemas" | "prefixItems" |
         "unevaluatedProperties" | "unevaluatedItems" | "$dynamicRef" |
         "minContains" | "maxContains" => draft >= 2020
    case _ => false
  }

  /** Python truthiness of a JSON value used as a draft-04 exclusive-bound
    * modifier. */
  private def truthyNum(v: JValue): Boolean = v match {
    case JInt(n) => n != 0
    case JDouble(n) => n != 0.0
    case JDecimal(n) => n != 0
    case JString(s) => s.nonEmpty
    case JArray(xs) => xs.nonEmpty
    case o: JObject => o.obj.nonEmpty
    case JNull | JNothing => false
    case JBool(b) => b
    case _ => true
  }

  private def draftOf(f: Map[String, JValue]): Int =
    f.get("$schema") match {
      case Some(JString(u)) if u.contains("draft-04") => 4
      case Some(JString(u)) if u.contains("draft-06") => 6
      case Some(JString(u)) if u.contains("draft-07") => 7
      case _ => 2020 // absent, 2019-09 and 2020-12 all get the modern set
    }

  /** Resolution context for ONE top-level compile: memoizes `$ref` cells by
    * normalized "docUri#fragment" key and resolves them AFTER the main pass
    * (worklist), so ref CYCLES compile to a finite cyclic graph. `store`
    * maps absolute URIs to raw schema documents (SchemaLoader/SchemaStore
    * can feed it); same-document refs (`#`, `#/a/b`) resolve into the
    * enclosing document. Unresolvable refs throw at COMPILE time — louder
    * than jsonschema, which resolves lazily and never notices a broken ref
    * that no document happens to evaluate. Deliberate divergence: at 10^12
    * docs a broken ref should fail before the job starts, not mid-run on
    * the first document that reaches it. */
  private final class RefCtx(val root: JValue, val store: Map[String, JValue],
      base: Option[String] = None) {
    import scala.collection.mutable
    val cells = mutable.Map.empty[String, RefCell]
    // each pending entry carries the draft of the REFERRING schema: a store
    // document without its own $schema inherits it (live-verified — the
    // reference keeps e.g. draft-04 semantics inside an opaque remote doc
    // referenced from a draft-04 root)
    private val pending = mutable.Queue.empty[(String, Int)]
    private val rootId: Option[String] = base.orElse(root match {
      case o: JObject => o.obj.collectFirst { case ("$id", JString(u)) => u }
      case _ => None
    })

    /** Normalized cell key for `ref` as written inside document `curDoc`
      * ("" = the root document): relative URIs resolve against the
      * enclosing document's URI (or the root `$id`). */
    def keyOf(curDoc: String, ref: String): String = {
      val (doc, frag) = ref.indexOf('#') match {
        case -1 => (ref, "")
        case i => (ref.substring(0, i), ref.substring(i + 1))
      }
      val docUri =
        if (doc.isEmpty) curDoc
        else {
          val base = if (curDoc.nonEmpty) Some(curDoc) else rootId
          val abs = base.map { b =>
            try new java.net.URI(b).resolve(doc).toString
            catch { case _: Exception => doc }
          }.getOrElse(doc)
          if (rootId.contains(abs)) "" else abs
        }
      s"$docUri#$frag"
    }

    def cell(curDoc: String, ref: String, refDraft: Int): RefCell = {
      val k = keyOf(curDoc, ref)
      cells.getOrElseUpdate(k, { pending.enqueue(k -> refDraft); new RefCell(k) })
    }

    /** Plain-name anchor lookup, first match in document order: `$anchor`
      * (2020-12), `$id: "#name"` (draft-06/07), `id: "#name"` (draft-04) —
      * all three live-verified. Unknown anchors throw, like jsonschema's
      * NoSuchAnchor. */
    /** SUBSCHEMA positions of a schema object — anchors register only at
      * schema locations (referencing walks specification-defined
      * subresources), so the anchor scans must NOT descend into data
      * positions like `enum`/`const`/`default` values: an anchor-shaped
      * object there is DATA, not a declaration (confirmed differentially —
      * treating it as one silently under-validates). */
    private val SingleSubschema = Set("items", "additionalProperties",
      "additionalItems", "not", "if", "then", "else", "propertyNames",
      "contains", "unevaluatedProperties", "unevaluatedItems")
    private val MapOfSubschemas = Set("properties", "patternProperties",
      "$defs", "definitions", "dependentSchemas")
    private val ArrayOfSubschemas = Set("allOf", "anyOf", "oneOf", "prefixItems")
    private def subschemaValues(o: JObject): Iterator[JValue] =
      o.obj.iterator.flatMap {
        case ("items", JArray(xs)) => xs.iterator // legacy tuple form
        case ("dependencies", JObject(fs)) =>
          fs.iterator.map(_._2).filter(_.isInstanceOf[JObject]) // schema form only
        case (k, v) if SingleSubschema(k) => Iterator.single(v)
        case (k, JObject(fs)) if MapOfSubschemas(k) => fs.iterator.map(_._2)
        case (k, JArray(xs)) if ArrayOfSubschemas(k) => xs.iterator
        case _ => Iterator.empty
      }

    def findAnchor(j: JValue, name: String, draft: Int): Option[JValue] = {
      // at 2020-12 a $dynamicAnchor is ALSO resolvable statically ($ref
      // "#name" to it works — live-verified)
      val keys: Set[String] =
        if (draft >= 2020) Set("$anchor", "$dynamicAnchor")
        else if (draft >= 6) Set("$id") else Set("id")
      val want = if (draft >= 2020) name else "#" + name
      def scan(v: JValue): Option[JValue] = v match {
        case o: JObject =>
          val here = o.obj.exists {
            case (k, JString(s)) => keys(k) && s == want
            case _ => false
          }
          if (here) Some(o)
          else subschemaValues(o).map(scan).collectFirst { case Some(x) => x }
        case _ => None
      }
      scan(j)
    }

    /** Node declaring `$dynamicAnchor: name` at a SCHEMA position of the
      * document, if any. */
    def findDynAnchor(j: JValue, name: String): Option[JValue] = {
      def scan(v: JValue): Option[JValue] = v match {
        case o: JObject =>
          if (o.obj.contains("$dynamicAnchor" -> JString(name))) Some(o)
          else subschemaValues(o).map(scan).collectFirst { case Some(x) => x }
        case _ => None
      }
      scan(j)
    }

    val dynCells = mutable.Map.empty[(String, String), DynCell]
    private val dynPending = mutable.Queue.empty[(String, String, Int)]

    def dynCell(curDoc: String, name: String, refDraft: Int): DynCell =
      dynCells.getOrElseUpdate(curDoc -> name, {
        dynPending.enqueue((curDoc, name, refDraft))
        new DynCell(name)
      })

    /** RFC-6901 JSON pointer: split on '/', then %xx-decode and ~1/~0
      * unescape each segment (that order — a %2F must not become a
      * separator, and ~1 before ~0 per the RFC). Non-pointer fragments are
      * anchors, handled by [[findAnchor]] before this is called. */
    private def pointer(j: JValue, frag: String): JValue = {
      if (frag.isEmpty) return j
      if (!frag.startsWith("/"))
        throw new IllegalArgumentException(
          s"unresolvable $$ref fragment '#$frag'")
      frag.substring(1).split("/", -1).foldLeft(j) { (cur, rawSeg) =>
        val seg = pctDecode(rawSeg).replace("~1", "/").replace("~0", "~")
        cur match {
          case JObject(fields) =>
            fields.collectFirst { case (k, v) if k == seg => v }.getOrElse(
              throw new IllegalArgumentException(
                s"unresolvable $$ref: no key '$seg' in '#$frag'"))
          case JArray(xs) =>
            val i = try seg.toInt catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"unresolvable $$ref: non-numeric array index '$seg' in '#$frag'")
            }
            if (i < 0 || i >= xs.size) throw new IllegalArgumentException(
              s"unresolvable $$ref: index $i out of bounds in '#$frag'")
            xs(i)
          case _ => throw new IllegalArgumentException(
            s"unresolvable $$ref: cannot descend past a scalar at '$seg' in '#$frag'")
        }
      }
    }

    private def pctDecode(s: String): String =
      if (!s.contains('%')) s
      else try {
        // decode %xx byte runs as UTF-8; copy other chars VERBATIM (chars,
        // not per-char bytes — per-char encoding would corrupt surrogate
        // pairs)
        val sb = new StringBuilder
        val bytes = new java.io.ByteArrayOutputStream()
        def flush(): Unit = if (bytes.size > 0) {
          sb.append(new String(bytes.toByteArray, "UTF-8")); bytes.reset()
        }
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '%' && i + 3 <= s.length) {
            bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
            i += 3
          } else { flush(); sb.append(c); i += 1 }
        }
        flush()
        sb.toString
      } catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"unresolvable $$ref: malformed percent-escape in '$s'")
      }

    /** Resolve every pending ref; targets may enqueue more (recursion
      * terminates because cells are memoized by key). Subschemas of the root
      * inherit the ROOT draft (jsonschema ignores nested `$schema` on
      * legacy drafts); store documents select their own. */
    private def docAndDraft(doc: String, rootDraft: Int,
        refDraft: Int): (JValue, Int) =
      if (doc.isEmpty) (root, rootDraft)
      else {
        val dj = store.getOrElse(doc, throw new IllegalArgumentException(
          s"unresolvable $$ref '$doc' — not in the schema store"))
        val dDraft = dj match {
          // a store doc selects its own draft only when it SAYS so;
          // otherwise it inherits the referring validator's (jsonschema
          // keeps the resolution scope's dialect — live-verified)
          case o: JObject if o.obj.exists(_._1 == "$schema") =>
            draftOf(o.obj.toMap)
          case _ => refDraft
        }
        (dj, dDraft)
      }

    def resolveAll(rootDraft: Int): Unit = {
      def drainRefs(): Unit =
        while (pending.nonEmpty) {
          val (k, refDraft) = pending.dequeue()
          val hash = k.indexOf('#')
          val (doc, frag) = (k.substring(0, hash), k.substring(hash + 1))
          val (docJson, draft) = docAndDraft(doc, rootDraft, refDraft)
          val target =
            if (frag.nonEmpty && !frag.startsWith("/"))
              findAnchor(docJson, frag, draft).getOrElse(
                throw new IllegalArgumentException(
                  s"unresolvable $$ref: no such anchor '#$frag'"))
            else pointer(docJson, frag)
          cells(k).target = compileNode(target, draft, this, doc)
        }
      drainRefs()
      // $dynamicRef cells: static fallback in the CONTAINING doc, plus the
      // per-document $dynamicAnchor candidates for runtime rebinding —
      // resolving either can enqueue new refs, so interleave to fixpoint
      while (dynPending.nonEmpty) {
        val (doc, name, refDraft) = dynPending.dequeue()
        val c = dynCells(doc -> name)
        val (docJson, draft) = docAndDraft(doc, rootDraft, refDraft)
        val staticNode = findAnchor(docJson, name, draft).getOrElse(
          throw new IllegalArgumentException(
            s"unresolvable $$dynamicRef: no such anchor '#$name'"))
        c.isDynamic = staticNode match {
          case o: JObject => o.obj.contains("$dynamicAnchor" -> JString(name))
          case _ => false
        }
        c.fallback = compileNode(staticNode, draft, this, doc)
        if (c.isDynamic) {
          // skip store entries that ARE the root under its $id: keyOf
          // normalizes those refs to "", so a URI-keyed candidate could
          // never match the scope — it would only duplicate the compile
          val docs = ("" -> root) +:
            store.toSeq.filterNot { case (u, _) => rootId.contains(u) }
          c.candidates = docs.flatMap { case (u, dj) =>
            findDynAnchor(dj, name).map { node =>
              // SAME draft rule as docAndDraft: a candidate doc without
              // $schema inherits the referring draft — the two paths must
              // not compile one document under two dialects
              val dDraft = docAndDraft(u, rootDraft, refDraft)._2
              u -> compileNode(node, dDraft, this, u)
            }
          }.toMap
        }
        drainRefs() // each dyn resolution may enqueue new $refs
      }
    }
  }

  def compile(j: JValue): Compiled = compile(j, Map.empty[String, JValue])

  /** Compile with a `$ref` store: absolute-URI refs (and refs relative to a
    * root `$id`) resolve against `store`'s raw schema documents; `#`-form
    * refs resolve within their enclosing document, including recursively. */
  def compile(j: JValue, store: Map[String, JValue]): Compiled =
    compile(j, store, None)

  /** As above with an EXPLICIT base URI for the root document (used when
    * the root was fetched from a URL but carries no `$id` — relative refs
    * then resolve against the fetch URL, like jsonschema's retrieval
    * scope). */
  def compile(j: JValue, store: Map[String, JValue],
      baseUri: Option[String]): Compiled = {
    val draft = j match {
      case o: JObject => draftOf(o.obj.toMap)
      case _ => 2020
    }
    val ctx = new RefCtx(j, store, baseUri)
    val c = compileNode(j, draft, ctx, "")
    ctx.resolveAll(draft)
    c
  }

  private def compileNode(
      j: JValue, draft: Int, ctx: RefCtx, curDoc: String): Compiled = j match {
    case o: JObject =>
      val f0 = o.obj.toMap
      val unsupported = f0.keySet.intersect(unsupportedIn(draft))
      if (unsupported.nonEmpty)
        throw new IllegalArgumentException(
          "unsupported JSON-Schema validation keyword(s): " +
            unsupported.toSeq.sorted.mkString(", ") +
            " — refusing to compile (silently ignoring a validation keyword" +
            " would under-validate)")
      // per-draft vocabulary: keywords the draft treats as annotations are
      // dropped here, so their walk() cases never see a value
      val f = f0.filter { case (k, _) => inDraft(k, draft) }
      def comp(x: JValue): Compiled = compileNode(x, draft, ctx, curDoc)
      def sub1(k: String): Option[Compiled] = f.get(k) match {
        case Some(o2: JObject) => Some(comp(o2))
        case Some(b: JBool) => Some(comp(b))
        case _ => None
      }
      def subs(k: String): Seq[Compiled] = f.get(k) match {
        case Some(JArray(xs)) => xs.map(comp)
        case _ => Nil
      }
      def strs(k: String): Seq[String] = f.get(k) match {
        case Some(JArray(xs)) => xs.collect { case JString(s) => s }
        case Some(JString(s)) => Seq(s)
        case _ => Nil
      }
      def num(k: String): Option[BigDecimal] = f.get(k) match {
        case Some(JInt(n)) => Some(BigDecimal(n))
        case Some(JDouble(n)) => Some(BigDecimal(n))
        case Some(JDecimal(n)) => Some(n)
        case _ => None
      }
      Compiled(
        draft = draft,
        falseSchema = false,
        types = f.get("type").map(_ => strs("type")),
        properties = f.get("properties") match {
          case Some(JObject(ps)) => ps.map { case (k, v) => k -> comp(v) }
          case _ => Nil
        },
        patternProps = f.get("patternProperties") match {
          case Some(JObject(ps)) => ps.map { case (k, v) => k -> comp(v) }
          case _ => Nil
        },
        required = strs("required"),
        additionalAllowed = f.get("additionalProperties") match {
          case Some(JBool(b)) => b
          case _ => true
        },
        additionalSchema = f.get("additionalProperties") match {
          case Some(o2: JObject) => Some(comp(o2))
          case _ => None
        },
        items = f.get("items") match {
          case Some(o2: JObject) => Some(comp(o2))
          case Some(JArray(_)) => None // tuple form — see tupleItems
          case Some(JBool(true)) => Some(comp(JObject()))
          case Some(JBool(false)) =>
            // 2020-12: bespoke "Expected at most N items" wording (itemsFalse
            // flag); legacy drafts treat it as a per-item False schema
            if (draft >= 2020) None else Some(comp(JBool(false)))
          case _ => None
        },
        tupleItems = f.get("items") match {
          case Some(JArray(xs)) if draft < 2020 => Some(xs.map(comp))
          case Some(JArray(_)) => throw new IllegalArgumentException(
            "array-form 'items' is invalid at 2020-12 (use prefixItems) — check_schema rejects it")
          case _ => None
        },
        addItemsSchema = f.get("additionalItems") match {
          case Some(o2: JObject) => Some(comp(o2))
          case _ => None
        },
        addItemsAllowed = f.get("additionalItems") match {
          case Some(JBool(b)) => b
          case _ => true
        },
        prefixItems = f.get("prefixItems") match {
          case Some(JArray(xs)) => xs.map(comp)
          case _ => Nil
        },
        itemsFalse = draft >= 2020 && f.get("items").contains(JBool(false)),
        additionalPresent = f.contains("additionalProperties"),
        unevalProps = f.get("unevaluatedProperties").map(comp),
        unevalPropsIsFalse = f.get("unevaluatedProperties").contains(JBool(false)),
        unevalItems = f.get("unevaluatedItems").map(comp),
        refCell = f.get("$ref") match {
          case Some(JString(u)) => Some(ctx.cell(curDoc, u, draft))
          case Some(other) => throw new IllegalArgumentException(
            s"non-string $$ref: $other — check_schema rejects it")
          case None => None
        },
        dynRefCell = f.get("$dynamicRef") match {
          case Some(JString(u))
              if u.length > 1 && u.startsWith("#") &&
                !u.substring(1).contains("/") =>
            Some(ctx.dynCell(curDoc, u.substring(1), draft))
          case Some(other) => throw new IllegalArgumentException(
            s"unsupported $$dynamicRef form: $other — only plain '#name'" +
              " anchors are supported")
          case None => None
        },
        docUri = curDoc,
        anyOf = subs("anyOf"), oneOf = subs("oneOf"), allOf = subs("allOf"),
        notSchema = f.get("not").map(comp),
        dependencies = f.get("dependencies") match {
          case Some(JObject(ds)) => ds.map {
            case (k, JArray(xs)) =>
              k -> Left(xs.collect { case JString(s) => s })
            case (k, JString(s)) => k -> Left(Seq(s)) // draft-03 relic form
            case (k, v) => k -> Right(comp(v))
          }
          case _ => Nil
        },
        dependentRequired = f.get("dependentRequired") match {
          case Some(JObject(ds)) => ds.map { case (k, v) =>
            k -> (v match {
              case JArray(xs) => xs.collect { case JString(s) => s }
              case _ => Nil
            })
          }
          case _ => Nil
        },
        dependentSchemas = f.get("dependentSchemas") match {
          case Some(JObject(ds)) => ds.map { case (k, v) => k -> comp(v) }
          case _ => Nil
        },
        propNames = sub1("propertyNames"),
        containsSchema = sub1("contains"),
        minContains = num("minContains").map(_.toLong),
        maxContains = num("maxContains").map(_.toLong),
        ifSchema = sub1("if"),
        thenSchema = sub1("then"), elseSchema = sub1("else"),
        constVal = f.get("const"),
        enumVals = f.get("enum").collect { case JArray(xs) => xs },
        pattern = f.get("pattern").collect { case JString(s) => s },
        maxLength = num("maxLength").map(_.toLong),
        minLength = num("minLength").map(_.toLong),
        minimum = f.get("minimum"), maximum = f.get("maximum"),
        // draft-04 spells exclusivity as a TRUTHY modifier of minimum/maximum
        // (its keyword map has no standalone exclusiveMinimum validator, so
        // a numeric value there — reachable via an opaque store doc; the
        // root's check_schema would reject it — still only modifies, Python
        // truthiness: nonzero = exclusive); draft-06+ has the standalone
        // numeric keywords, and a boolean there is a SCHEMA error
        // (check_schema raises in the reference), so reject
        minExclusive = f.get("exclusiveMinimum") match {
          case Some(_: JBool) if draft != 4 =>
            throw new IllegalArgumentException(
              "boolean exclusiveMinimum is draft-04 only (check_schema rejects it)")
          case Some(JBool(b)) => b
          case Some(v) if draft == 4 => truthyNum(v)
          case _ => false
        },
        maxExclusive = f.get("exclusiveMaximum") match {
          case Some(_: JBool) if draft != 4 =>
            throw new IllegalArgumentException(
              "boolean exclusiveMaximum is draft-04 only (check_schema rejects it)")
          case Some(JBool(b)) => b
          case Some(v) if draft == 4 => truthyNum(v)
          case _ => false
        },
        exclusiveMinimum = f.get("exclusiveMinimum") match {
          case Some(_: JBool) | None => None
          case _ if draft == 4 => None // modifier only — no standalone check
          case other => other
        },
        exclusiveMaximum = f.get("exclusiveMaximum") match {
          case Some(_: JBool) | None => None
          case _ if draft == 4 => None
          case other => other
        },
        multipleOf = f.get("multipleOf"),
        minProperties = num("minProperties").map(_.toLong),
        maxProperties = num("maxProperties").map(_.toLong),
        minItems = num("minItems").map(_.toLong),
        maxItems = num("maxItems").map(_.toLong),
        uniqueItems = f.get("uniqueItems").contains(JBool(true)),
        repr = PyRepr.render(j),
        hasSchemaKey = f0.contains("$schema"),
        keyOrder = o.obj.map(_._1))
    case JBool(true) =>
      // the boolean schema `true`: everything validates; its Python repr is
      // `True`, which surfaces inside PARENT messages (e.g. oneOf's "valid
      // under each of {}, True" — fuzz-caught). hasSchemaKey=true because
      // only DICT subschemas get the "(expected: ...)" suffix.
      compileNode(JObject(), draft, ctx, curDoc).copy(
        repr = "True", hasSchemaKey = true)
    case JBool(false) =>
      // the boolean schema `false`: nothing validates ("False schema does
      // not allow <instance>"). hasSchemaKey=true because the hepdata
      // formatter only appends "(expected: ...)" for DICT subschemas.
      compileNode(JObject(), draft, ctx, curDoc).copy(
        falseSchema = true, repr = "False",
        hasSchemaKey = true, keyOrder = Seq("$falseSchema$"))
    case other =>
      throw new IllegalArgumentException(s"unsupported schema node: $other")
  }

  def compile(json: String): Compiled =
    compile(org.json4s.jackson.JsonMethods.parse(json))

  def compile(json: String, store: Map[String, JValue]): Compiled =
    compile(org.json4s.jackson.JsonMethods.parse(json), store)

  // ----------------------------------------------------------------- types

  /** jsonschema draft-04/06 type checker: booleans are NOT numbers/integers
    * (unlike Python's bool-is-int), "integer" matches integral values,
    * "number" matches both. */
  def typeMatches(t: String, v: JValue): Boolean = (t, v) match {
    case ("object", _: JObject) => true
    case ("array", _: JArray) => true
    case ("string", _: JString) => true
    case ("integer", _: JInt) => true
    case ("integer", JDouble(d)) => d == d.floor && !d.isInfinite
    case ("integer", JDecimal(d)) => d.isWhole
    case ("number", _: JInt) | ("number", _: JDouble) | ("number", _: JDecimal) => true
    case ("boolean", _: JBool) => true
    case ("null", JNull) => true
    case _ => false
  }

  private def jsonEq(a: JValue, b: JValue): Boolean = (a, b) match {
    case (JInt(x), JDouble(y)) =>
      java.lang.Double.isFinite(y) && BigDecimal(x) == BigDecimal(y)
    case (JDouble(x), JInt(y)) =>
      java.lang.Double.isFinite(x) && BigDecimal(x) == BigDecimal(y)
    case (JArray(xs), JArray(ys)) =>
      xs.size == ys.size && xs.zip(ys).forall { case (x, y) => jsonEq(x, y) }
    case (JObject(xs), JObject(ys)) =>
      val (mx, my) = (xs.toMap, ys.toMap)
      mx.keySet == my.keySet && mx.forall { case (k, v) => jsonEq(v, my(k)) }
    case _ => a == b
  }

  /** Numeric value for range checks; non-finite doubles compare the way
    * Python floats do (inf > any maximum, -inf < any minimum, NaN neither). */
  private def numOf(v: JValue): Option[BigDecimal] = v match {
    case JInt(n) => Some(BigDecimal(n))
    case JDouble(n) if java.lang.Double.isFinite(n) => Some(BigDecimal(n))
    case JDouble(n) if n.isPosInfinity => Some(BigDecimal("1e999999"))
    case JDouble(n) if n.isNegInfinity => Some(BigDecimal("-1e999999"))
    case JDouble(_) => None // NaN: no ordering, no range error (Python semantics)
    case JDecimal(n) => Some(n)
    case _ => None
  }

  // ------------------------------------------------------------------ eval

  /** Guard against no-progress `$ref` cycles (e.g. `{"$ref": "#"}` applied
    * to any instance loops forever — the reference's Python would
    * RecursionError there too). Counts only SAME-INSTANCE schema hops
    * ($ref, combinators, dependent schemas) and resets whenever evaluation
    * descends into the instance, so arbitrarily deep documents are
    * unaffected — only schema-graph cycles that make no progress trip it. */
  private val MaxWalkDepth = 256

  /** All errors of `doc` against `schema`, in jsonschema's iteration order
    * (schema-keyword order, then instance recursion depth-first). */
  def errors(schema: Compiled, doc: JValue): List[Err] =
    errorsAt(schema, doc, 0, List(schema.docUri))

  private def errorsAt(schema: Compiled, doc: JValue, depth: Int,
      scope: List[String]): List[Err] = {
    val buf = List.newBuilder[Err]
    walk(schema, doc, Nil, buf, depth, scope)
    buf.result()
  }

  /** Dynamic-scope push: entering a ref target in ANOTHER document appends
    * that document to the scope (outermost-first entry order). */
  private def enterScope(scope: List[String], t: Compiled): List[String] =
    if (scope.nonEmpty && t.docUri == scope.last) scope else scope :+ t.docUri

  /** $dynamicRef target for the CURRENT dynamic scope: first entered
    * document declaring the $dynamicAnchor wins; plain-anchor targets (no
    * bookending) resolve statically. */
  private def dynTarget(c: DynCell, scope: List[String]): Compiled =
    if (!c.isDynamic) c.fallback
    else scope.collectFirst {
      case u if c.candidates.contains(u) => c.candidates(u)
    }.getOrElse(c.fallback)

  def isValid(schema: Compiled, doc: JValue): Boolean = {
    // short-circuit variant of errors() — no message materialization
    errors(schema, doc).isEmpty
  }

  private def err(schema: Compiled, doc: JValue, path: List[Either[Int, String]],
      validator: String, msg: String, context: List[Err] = Nil): Err =
    // jsonschema's error._matches_type() is False when the schema has no
    // 'type' keyword at all
    Err(msg, path.reverse, validator,
      schema, schema.types.exists(_.exists(typeMatches(_, doc))), context)

  /** `rpath` is the path in REVERSE (cheap prepend). Keyword checks run in
    * the schema dict's ORIGINAL key order — jsonschema iterates
    * `schema.items()`, so e.g. a schema written {properties, required}
    * emits nested property errors BEFORE its own required errors, and one
    * written {required, properties} the other way around. */
  private def walk(s: Compiled, v: JValue, rpath: List[Either[Int, String]],
      out: scala.collection.mutable.Growable[Err], depth: Int,
      scope: List[String]): Unit = {
    if (depth > MaxWalkDepth)
      throw new IllegalStateException(
        "jsonschema evaluation recursion limit exceeded — no-progress $ref" +
          " cycle (the reference's Python raises RecursionError here)")
    val d = depth + 1
    // legacy drafts apply ONLY $ref when present, ignoring every sibling
    // keyword (jsonschema _legacy_keywords.ignore_ref_siblings)
    if (s.draft < 2020 && s.refCell.isDefined) {
      val t = s.refCell.get.target
      walk(t, v, rpath, out, d, enterScope(scope, t))
      return
    }
    s.keyOrder.foreach {
      case "$ref" =>
        s.refCell.foreach(c =>
          walk(c.target, v, rpath, out, d, enterScope(scope, c.target)))
      case "$dynamicRef" =>
        s.dynRefCell.foreach { c =>
          val t = dynTarget(c, scope)
          walk(t, v, rpath, out, d, enterScope(scope, t))
        }
      case "$falseSchema$" if s.falseSchema =>
        out += err(s, v, rpath, "falseSchema",
          s"False schema does not allow ${PyRepr.render(v)}")
      case "type" => s.types.foreach { ts =>
        if (!ts.exists(typeMatches(_, v)))
          out += err(s, v, rpath, "type",
            s"${PyRepr.render(v)} is not of type ${ts.map(PyRepr.str).mkString(", ")}")
      }
      case "enum" => s.enumVals.foreach { es =>
        if (!es.exists(jsonEq(_, v)))
          out += err(s, v, rpath, "enum",
            s"${PyRepr.render(v)} is not one of ${PyRepr.render(JArray(es.toList))}")
      }
      case "const" => s.constVal.foreach { c =>
        if (!jsonEq(c, v))
          out += err(s, v, rpath, "const", s"${PyRepr.render(c)} was expected")
      }
      case "required" => v match {
        case JObject(fields) =>
          val keys = fields.map(_._1).toSet
          s.required.foreach { r =>
            if (!keys.contains(r))
              out += err(s, v, rpath, "required",
                s"${PyRepr.str(r)} is a required property")
          }
        case _ => ()
      }
      case "additionalProperties" => v match {
        case JObject(fields) if s.additionalSchema.isDefined =>
          // schema form: each extra key's VALUE validates against the
          // subschema. jsonschema iterates a python SET here (order is
          // hash-randomized run-to-run); we iterate sorted keys — identical
          // output whenever ≤1 extra fails, deterministic always.
          val named = s.properties.map(_._1).toSet
          val extras = fields.filter { case (k, _) =>
            !named.contains(k) &&
              !s.compiledPatternProps.exists(_._1.matcher(k).find())
          }.sortBy(_._1)
          extras.foreach { case (k, fv) =>
            walk(s.additionalSchema.get, fv, Right(k) :: rpath, out, 0, scope)
          }
        case JObject(fields) if !s.additionalAllowed =>
          // "additional" = not named in properties AND not matched by any
          // patternProperties regex (jsonschema find_additional_properties)
          val named = s.properties.map(_._1).toSet
          val extras = fields.map(_._1).distinct.filter { k =>
            !named.contains(k) &&
              !s.compiledPatternProps.exists(_._1.matcher(k).find())
          }.sorted
          if (extras.nonEmpty) {
            if (s.patternProps.nonEmpty) {
              val verb = if (extras.size == 1) "does" else "do"
              val pats = s.patternProps.map(_._1).sorted.map(PyRepr.str)
              out += err(s, v, rpath, "additionalProperties",
                s"${extras.map(PyRepr.str).mkString(", ")} $verb not match any of the regexes: ${pats.mkString(", ")}")
            } else {
              val verb = if (extras.size == 1) "was" else "were"
              out += err(s, v, rpath, "additionalProperties",
                s"Additional properties are not allowed (${extras.map(PyRepr.str).mkString(", ")} $verb unexpected)")
            }
          }
        case _ => ()
      }
      case "properties" => v match {
        case JObject(fields) =>
          s.properties.foreach { case (k, sub) =>
            fields.find(_._1 == k).foreach { case (_, fv) =>
              walk(sub, fv, Right(k) :: rpath, out, 0, scope)
            }
          }
        case _ => ()
      }
      case "patternProperties" => v match {
        case JObject(fields) =>
          s.compiledPatternProps.foreach { case (pat, sub) =>
            fields.foreach { case (k, fv) =>
              if (pat.matcher(k).find()) walk(sub, fv, Right(k) :: rpath, out, 0, scope)
            }
          }
        case _ => ()
      }
      case "propertyNames" => v match {
        case JObject(fields) => s.propNames.foreach { sub =>
          // each KEY is validated as an instance; the path stays put
          fields.foreach { case (k, _) => walk(sub, JString(k), rpath, out, 0, scope) }
        }
        case _ => ()
      }
      case "dependencies" => v match {
        case JObject(fields) =>
          val keys = fields.map(_._1).toSet
          s.dependencies.foreach {
            case (prop, _) if !keys.contains(prop) => ()
            case (prop, Left(reqs)) => reqs.foreach { r =>
              if (!keys.contains(r))
                out += err(s, v, rpath, "dependencies",
                  s"${PyRepr.str(r)} is a dependency of ${PyRepr.str(prop)}")
            }
            case (_, Right(sub)) => walk(sub, v, rpath, out, d, scope)
          }
        case _ => ()
      }
      case "dependentRequired" => v match {
        case JObject(fields) =>
          val keys = fields.map(_._1).toSet
          s.dependentRequired.foreach { case (prop, reqs) =>
            if (keys.contains(prop)) reqs.foreach { r =>
              if (!keys.contains(r))
                out += err(s, v, rpath, "dependentRequired",
                  s"${PyRepr.str(r)} is a dependency of ${PyRepr.str(prop)}")
            }
          }
        case _ => ()
      }
      case "dependentSchemas" => v match {
        case JObject(fields) =>
          val keys = fields.map(_._1).toSet
          s.dependentSchemas.foreach { case (prop, sub) =>
            if (keys.contains(prop)) walk(sub, v, rpath, out, d, scope)
          }
        case _ => ()
      }
      case "contains" => v match {
        case JArray(xs) => s.containsSchema.foreach { sub =>
          if (s.draft >= 2020) {
            // 2020-12: minContains/maxContains modify it; early-out on the
            // first overflow like jsonschema's loop
            val minC = s.minContains.getOrElse(1L)
            val maxC = s.maxContains.getOrElse(xs.size.toLong)
            var matches = 0L
            var overflowed = false
            val it = xs.iterator
            while (it.hasNext && !overflowed) {
              if (errorsAt(sub, it.next(), 0, scope).isEmpty) {
                matches += 1
                if (matches > maxC) {
                  overflowed = true
                  out += err(s, v, rpath, "maxContains",
                    s"Too many items match the given schema (expected at most $maxC)")
                }
              }
            }
            if (!overflowed && matches < minC) {
              if (matches == 0)
                out += err(s, v, rpath, "contains",
                  s"${PyRepr.render(v)} does not contain items matching the given schema")
              else
                out += err(s, v, rpath, "minContains",
                  s"Too few items match the given schema (expected at least $minC but only $matches matched)")
            }
          } else { // draft-06/07 wording
            if (!xs.exists(x => errorsAt(sub, x, 0, scope).isEmpty))
              out += err(s, v, rpath, "contains",
                s"None of ${PyRepr.render(v)} are valid under the given schema")
          }
        }
        case _ => ()
      }
      case "if" => s.ifSchema.foreach { cond =>
        if (errorsAt(cond, v, d, scope).isEmpty) s.thenSchema.foreach(walk(_, v, rpath, out, d, scope))
        else s.elseSchema.foreach(walk(_, v, rpath, out, d, scope))
      }
      case "items" => v match {
        case JArray(xs) =>
          if (s.draft >= 2020) {
            // 2020-12: items covers positions past prefixItems; items:false
            // gets the bespoke wording with the PARENT schema as the error's
            // schema (so its repr drives the "(expected: ...)" suffix)
            val prefix = s.prefixItems.size
            val extra = xs.size - prefix
            if (extra > 0) {
              if (s.itemsFalse) {
                val itemWord = if (prefix == 1) "item" else "items"
                val rest =
                  if (extra == 1) PyRepr.render(xs(prefix))
                  else PyRepr.render(JArray(xs.drop(prefix)))
                out += err(s, v, rpath, "items",
                  s"Expected at most $prefix $itemWord but found $extra extra: $rest")
              } else s.items.foreach { sub =>
                (prefix until xs.size).foreach { i =>
                  walk(sub, xs(i), Left(i) :: rpath, out, 0, scope)
                }
              }
            }
          } else s.tupleItems match {
            // legacy tuple form: position i validates against subschema i
            case Some(ts) =>
              xs.zip(ts).zipWithIndex.foreach { case ((x, sub), i) =>
                walk(sub, x, Left(i) :: rpath, out, 0, scope)
              }
            case None => s.items.foreach { sub =>
              xs.zipWithIndex.foreach { case (x, i) =>
                walk(sub, x, Left(i) :: rpath, out, 0, scope)
              }
            }
          }
        case _ => ()
      }
      case "prefixItems" => v match {
        case JArray(xs) =>
          xs.zip(s.prefixItems).zipWithIndex.foreach { case ((x, sub), i) =>
            walk(sub, x, Left(i) :: rpath, out, 0, scope)
          }
        case _ => ()
      }
      case "additionalItems" => v match {
        // fires only with TUPLE-form items (jsonschema returns early when
        // `items` is missing or single-schema — _legacy_keywords.py:106-112)
        case JArray(xs) if s.tupleItems.isDefined =>
          val n = s.tupleItems.get.size
          s.addItemsSchema match {
            case Some(sub) =>
              (n until xs.size).foreach { i =>
                walk(sub, xs(i), Left(i) :: rpath, out, 0, scope)
              }
            case None if !s.addItemsAllowed && xs.size > n =>
              val extras = xs.drop(n)
              val verb = if (extras.size == 1) "was" else "were"
              out += err(s, v, rpath, "additionalItems",
                "Additional items are not allowed (" +
                  s"${extras.map(PyRepr.render).mkString(", ")} $verb unexpected)")
            case _ => ()
          }
        case _ => ()
      }
      // jsonschema phrases the ==1/==0 bounds specially ("should be
      // non-empty" / "is expected to be empty") for both items and length
      case "minItems" => v match {
        case xs: JArray => s.minItems.foreach { n =>
          if (xs.arr.size < n)
            out += err(s, v, rpath, "minItems", s"${PyRepr.render(v)} " +
              (if (n == 1) "should be non-empty" else "is too short"))
        }
        case _ => ()
      }
      case "maxItems" => v match {
        case xs: JArray => s.maxItems.foreach { n =>
          if (xs.arr.size > n)
            out += err(s, v, rpath, "maxItems", s"${PyRepr.render(v)} " +
              (if (n == 0) "is expected to be empty" else "is too long"))
        }
        case _ => ()
      }
      case "uniqueItems" => v match {
        case xs: JArray if s.uniqueItems =>
          // Python equality: 1 == 1.0, dicts compare order-insensitively
          // (but True != 1 — jsonschema unbools before comparing), so
          // JValue equality is not enough
          val arr = xs.arr
          val dup = arr.indices.exists(i =>
            (i + 1 until arr.size).exists(k => jsonEq(arr(i), arr(k))))
          if (dup)
            out += err(s, v, rpath, "uniqueItems",
              s"${PyRepr.render(v)} has non-unique elements")
        case _ => ()
      }
      case "pattern" => v match {
        case JString(str) => s.pattern.foreach { p =>
          if (!s.compiledPattern.get.matcher(str).find())
            out += err(s, v, rpath, "pattern",
              s"${PyRepr.render(v)} does not match ${PyRepr.str(p)}")
        }
        case _ => ()
      }
      case "maxLength" => v match {
        case JString(str) => s.maxLength.foreach { n =>
          if (str.codePointCount(0, str.length) > n)
            out += err(s, v, rpath, "maxLength", s"${PyRepr.render(v)} " +
              (if (n == 0) "is expected to be empty" else "is too long"))
        }
        case _ => ()
      }
      case "minLength" => v match {
        case JString(str) => s.minLength.foreach { n =>
          if (str.codePointCount(0, str.length) < n)
            out += err(s, v, rpath, "minLength", s"${PyRepr.render(v)} " +
              (if (n == 1) "should be non-empty" else "is too short"))
        }
        case _ => ()
      }
      case "minimum" => numOf(v).foreach { n =>
        s.minimum.flatMap(m => numOf(m).map((m, _))).foreach { case (mj, m) =>
          // draft-04 boolean exclusiveMinimum modifies this keyword (the
          // error's validator is still 'minimum')
          if (if (s.minExclusive) n <= m else n < m)
            out += err(s, v, rpath, "minimum",
              s"${PyRepr.render(v)} is less than " +
                (if (s.minExclusive) "or equal to " else "") +
                s"the minimum of ${PyRepr.render(mj)}")
        }
      }
      case "maximum" => numOf(v).foreach { n =>
        s.maximum.flatMap(m => numOf(m).map((m, _))).foreach { case (mj, m) =>
          if (if (s.maxExclusive) n >= m else n > m)
            out += err(s, v, rpath, "maximum",
              s"${PyRepr.render(v)} is greater than " +
                (if (s.maxExclusive) "or equal to " else "") +
                s"the maximum of ${PyRepr.render(mj)}")
        }
      }
      case "exclusiveMinimum" => numOf(v).foreach { n =>
        s.exclusiveMinimum.flatMap(m => numOf(m).map((m, _))).foreach {
          case (mj, m) =>
            if (n <= m)
              out += err(s, v, rpath, "exclusiveMinimum",
                s"${PyRepr.render(v)} is less than or equal to the minimum of ${PyRepr.render(mj)}")
        }
      }
      case "exclusiveMaximum" => numOf(v).foreach { n =>
        s.exclusiveMaximum.flatMap(m => numOf(m).map((m, _))).foreach {
          case (mj, m) =>
            if (n >= m)
              out += err(s, v, rpath, "exclusiveMaximum",
                s"${PyRepr.render(v)} is greater than or equal to the maximum of ${PyRepr.render(mj)}")
        }
      }
      case "multipleOf" => s.multipleOf.foreach { m =>
        // jsonschema: float divisor -> integral-quotient test (with
        // OverflowError -> failed); int divisor -> Python `%`. Mirrored on
        // doubles; truthiness of a nonzero remainder matches Python's even
        // where the remainder's sign differs.
        val vd: Option[Double] = v match {
          case JInt(n) => Some(n.toDouble)
          case JDouble(d) => Some(d)
          case JDecimal(d) => Some(d.toDouble)
          case _ => None
        }
        vd.foreach { dv =>
          val failed = (v, m) match {
            case (JInt(vi), JInt(mi)) => (vi mod mi) != 0 // exact: > 2^53 ints
            case (_, JDouble(md)) =>
              val q = dv / md
              q.isInfinite || q.isNaN || q != math.floor(q)
            case (_, JDecimal(md)) =>
              val q = dv / md.toDouble
              q.isInfinite || q.isNaN || q != math.floor(q)
            case (_, JInt(mi)) => dv % mi.toDouble != 0.0
            case _ => false
          }
          if (failed)
            out += err(s, v, rpath, "multipleOf",
              s"${PyRepr.render(v)} is not a multiple of ${PyRepr.render(m)}")
        }
      }
      case "minProperties" => v match {
        case JObject(fields) => s.minProperties.foreach { n =>
          if (fields.size < n)
            out += err(s, v, rpath, "minProperties", s"${PyRepr.render(v)} " +
              (if (n == 1) "should be non-empty" else "does not have enough properties"))
        }
        case _ => ()
      }
      case "maxProperties" => v match {
        case JObject(fields) => s.maxProperties.foreach { n =>
          if (fields.size > n)
            out += err(s, v, rpath, "maxProperties", s"${PyRepr.render(v)} " +
              (if (n == 0) "is expected to be empty" else "has too many properties"))
        }
        case _ => ()
      }
      case "unevaluatedProperties" => v match {
        case o: JObject => s.unevalProps.foreach { sub =>
          val eval = evaluatedKeys(s, o, d, scope)
          // a non-evaluated key whose value FAILS the subschema is flagged
          // (for `false` every value fails, so every leftover key is)
          val bad = o.obj.collect {
            case (k, fv) if !eval.contains(k) && errorsAt(sub, fv, d, scope).nonEmpty => k
          }
          if (bad.nonEmpty) {
            if (s.unevalPropsIsFalse) {
              val extras = bad.sorted
              val verb = if (extras.size == 1) "was" else "were"
              out += err(s, v, rpath, "unevaluatedProperties",
                "Unevaluated properties are not allowed (" +
                  s"${extras.map(PyRepr.str).mkString(", ")} $verb unexpected)")
            } else {
              val verb = if (bad.size == 1) "was" else "were"
              out += err(s, v, rpath, "unevaluatedProperties",
                "Unevaluated properties are not valid under the given schema (" +
                  s"${bad.map(PyRepr.str).mkString(", ")} $verb unevaluated and invalid)")
            }
          }
        }
        case _ => ()
      }
      case "unevaluatedItems" => v match {
        case JArray(xs) => s.unevalItems.foreach { _ =>
          // the keyword itself already marked items VALID under it as
          // evaluated (find_evaluated_item_indexes_by_schema includes
          // 'unevaluatedItems' in its contains-style loop), so leftovers
          // here are the failing ones — flagged regardless of schema form
          val eval = evaluatedIdx(s, xs, d, scope)
          val extras = xs.zipWithIndex.collect {
            case (x, i) if !eval.contains(i) => x
          }
          if (extras.nonEmpty) {
            val verb = if (extras.size == 1) "was" else "were"
            out += err(s, v, rpath, "unevaluatedItems",
              "Unevaluated items are not allowed (" +
                s"${extras.map(PyRepr.render).mkString(", ")} $verb unexpected)")
          }
        }
        case _ => ()
      }
      case "not" => s.notSchema.foreach { sub =>
        if (errorsAt(sub, v, d, scope).isEmpty)
          out += err(s, v, rpath, "not",
            s"${PyRepr.render(v)} should not be valid under ${sub.repr}")
      }
      case "anyOf" if s.anyOf.nonEmpty =>
        val ctxs = s.anyOf.map(errorsAt(_, v, d, scope))
        if (!ctxs.exists(_.isEmpty)) {
          // context errors keep their path RELATIVE to this instance —
          // jsonschema's ValidationError.path on context errors is the
          // relative_path, and the reference formats whichever error
          // by_relevance picks without re-anchoring it
          val ctx = ctxs.flatten.toList
          out += err(s, v, rpath, "anyOf",
            s"${PyRepr.render(v)} is not valid under any of the given schemas", ctx)
        }
      case "oneOf" if s.oneOf.nonEmpty =>
        val ctxs = s.oneOf.map(errorsAt(_, v, d, scope))
        val nValid = ctxs.count(_.isEmpty)
        if (nValid == 0) {
          val ctx = ctxs.flatten.toList
          out += err(s, v, rpath, "oneOf",
            s"${PyRepr.render(v)} is not valid under any of the given schemas", ctx)
        } else if (nValid > 1) {
          // jsonschema lists the later-valid subschema REPRS first, then the
          // first-valid one (oneOf keyword impl: more_valid + [first_valid])
          val validIdx = ctxs.zipWithIndex.filter(_._1.isEmpty).map(_._2)
          val ordered = validIdx.tail :+ validIdx.head
          val reprs = ordered.map(i => s.oneOf(i).repr).mkString(", ")
          out += err(s, v, rpath, "oneOf",
            s"${PyRepr.render(v)} is valid under each of $reprs")
        }
      case "allOf" => s.allOf.foreach(walk(_, v, rpath, out, d, scope))
      case _ => () // $schema, $id, id, title, description, ...
    }
  }

  /** Keys of `v` "evaluated" by `s` for unevaluatedProperties — a faithful
    * mirror of jsonschema _utils.find_evaluated_property_keys_by_schema:
    * properties∩instance (regardless of value validity), keys whose VALUES
    * validate under additionalProperties/unevaluatedProperties, pattern
    * matches, dependentSchemas recursion, VALID allOf/anyOf/oneOf branches,
    * if(+then)/else recursion, and $ref targets. The instance never
    * descends — depth rides the same-instance guard. */
  private def evaluatedKeys(s: Compiled, v: JObject, depth: Int,
      scope: List[String]): Set[String] = {
    if (depth > MaxWalkDepth)
      throw new IllegalStateException(
        "jsonschema evaluation recursion limit exceeded — no-progress $ref" +
          " cycle (the reference's Python raises RecursionError here)")
    if (s.falseSchema) return Set.empty
    val d = depth + 1
    val out = Set.newBuilder[String]
    s.refCell.foreach(c =>
      out ++= evaluatedKeys(c.target, v, d, enterScope(scope, c.target)))
    s.dynRefCell.foreach { c =>
      val t = dynTarget(c, scope)
      out ++= evaluatedKeys(t, v, d, enterScope(scope, t))
    }
    val keys = v.obj.map(_._1)
    if (s.properties.nonEmpty) {
      val named = s.properties.map(_._1).toSet
      out ++= keys.filter(named.contains)
    }
    // additionalProperties / unevaluatedProperties: EVERY key whose value is
    // valid under the subschema counts as evaluated (not just "additional"
    // ones — jsonschema checks all instance items here)
    def validUnder(sub: Compiled, fv: JValue): Boolean =
      errorsAt(sub, fv, d, scope).isEmpty
    if (s.additionalPresent) {
      s.additionalSchema match {
        case Some(sub) => out ++= v.obj.collect {
          case (k, fv) if validUnder(sub, fv) => k }
        case None => if (s.additionalAllowed) out ++= keys // bool true/false
      }
    }
    s.unevalProps.foreach { sub =>
      out ++= v.obj.collect { case (k, fv) if validUnder(sub, fv) => k }
    }
    if (s.patternProps.nonEmpty)
      out ++= keys.filter(k =>
        s.compiledPatternProps.exists(_._1.matcher(k).find()))
    s.dependentSchemas.foreach { case (prop, sub) =>
      if (keys.contains(prop)) out ++= evaluatedKeys(sub, v, d, scope)
    }
    (s.allOf ++ s.oneOf ++ s.anyOf).foreach { sub =>
      if (errorsAt(sub, v, d, scope).isEmpty) out ++= evaluatedKeys(sub, v, d, scope)
    }
    s.ifSchema.foreach { cond =>
      if (errorsAt(cond, v, d, scope).isEmpty) {
        out ++= evaluatedKeys(cond, v, d, scope)
        s.thenSchema.foreach(t => out ++= evaluatedKeys(t, v, d, scope))
      } else s.elseSchema.foreach(e => out ++= evaluatedKeys(e, v, d, scope))
    }
    out.result()
  }

  /** Indexes of `xs` "evaluated" by `s` for unevaluatedItems — mirror of
    * jsonschema _utils.find_evaluated_item_indexes_by_schema: an `items`
    * keyword in ANY form evaluates the whole array (early return),
    * prefixItems evaluates its positions, contains/unevaluatedItems
    * evaluate items VALID under them, plus $ref, if/then/else and valid
    * combinator branches. */
  private def evaluatedIdx(s: Compiled, xs: List[JValue], depth: Int,
      scope: List[String]): Set[Int] = {
    if (depth > MaxWalkDepth)
      throw new IllegalStateException(
        "jsonschema evaluation recursion limit exceeded — no-progress $ref" +
          " cycle (the reference's Python raises RecursionError here)")
    if (s.falseSchema) return Set.empty
    // python: `if "items" in schema: return range(len(instance))` — ANY
    // items form, incl. a legacy tuple form reached via cross-draft $ref
    if (s.items.isDefined || s.itemsFalse || s.tupleItems.isDefined)
      return xs.indices.toSet
    val d = depth + 1
    val out = Set.newBuilder[Int]
    s.refCell.foreach(c =>
      out ++= evaluatedIdx(c.target, xs, d, enterScope(scope, c.target)))
    s.dynRefCell.foreach { c =>
      val t = dynTarget(c, scope)
      out ++= evaluatedIdx(t, xs, d, enterScope(scope, t))
    }
    out ++= s.prefixItems.indices
    s.ifSchema.foreach { cond =>
      if (errorsAt(cond, JArray(xs), d, scope).isEmpty) {
        out ++= evaluatedIdx(cond, xs, d, scope)
        s.thenSchema.foreach(t => out ++= evaluatedIdx(t, xs, d, scope))
      } else s.elseSchema.foreach(e => out ++= evaluatedIdx(e, xs, d, scope))
    }
    Seq(s.containsSchema, s.unevalItems).flatten.foreach { sub =>
      out ++= xs.zipWithIndex.collect {
        case (x, i) if errorsAt(sub, x, d, scope).isEmpty => i }
    }
    (s.allOf ++ s.oneOf ++ s.anyOf).foreach { sub =>
      if (errorsAt(sub, JArray(xs), d, scope).isEmpty) out ++= evaluatedIdx(sub, xs, d, scope)
    }
    out.result()
  }

  // ------------------------------------------------------------- formatting

  /** jsonschema.exceptions.by_relevance key (defaults: weak = anyOf/oneOf,
    * strong = ∅; the reference's default-schema path uses
    * by_relevance(strong='oneOf', weak=[]) — data_file_validator.py:132):
    * prefer deeper paths, then earlier sibling paths, then weak keywords,
    * then non-strong keywords, then errors matching the instance's type
    * (min-sort semantics, exactly as `sorted(...)[0]` applies them). */
  private def relevanceLess(weak: Set[String], strong: Set[String])(
      a: Err, b: Err): Boolean = {
    if (a.path.size != b.path.size) return a.path.size > b.path.size
    val pc = comparePaths(a.path, b.path)
    if (pc != 0) return pc < 0
    val aw = !weak.contains(a.validator)
    val bw = !weak.contains(b.validator)
    if (aw != bw) return !aw // False sorts first
    val as = strong.contains(a.validator)
    val bs = strong.contains(b.validator)
    if (as != bs) return !as
    val am = !a.matchesType
    val bm = !b.matchesType
    if (am != bm) return !am
    false
  }

  private def comparePaths(a: List[Either[Int, String]],
      b: List[Either[Int, String]]): Int = {
    (a, b) match {
      case (Nil, Nil) => 0
      case (Nil, _) => -1
      case (_, Nil) => 1
      case (x :: xs, y :: ys) =>
        val c = (x, y) match {
          case (Left(i), Left(j)) => i.compare(j)
          case (Right(s), Right(t)) => s.compareTo(t)
          case (Left(_), Right(_)) => -1 // ints before strings (py type order is undefined; stable choice)
          case (Right(_), Left(_)) => 1
        }
        if (c != 0) c else comparePaths(xs, ys)
    }
  }

  /** "Best error in context" (ref __init__.py:120-122): for each top-level
    * error, pick the most relevant of [error] + context. */
  def bestErrors(schema: Compiled, doc: JValue,
      weak: Set[String] = Set("anyOf", "oneOf"),
      strong: Set[String] = Set.empty): List[Err] =
    errors(schema, doc).map { e =>
      (e :: e.context).sortWith(relevanceLess(weak, strong)).head
    }

  /** Reference message formatting (__init__.py:159-182): location suffix
    * `a.b[0].c` and `(expected: {...})` when the failing subschema lacks
    * `$schema`. */
  def format(e: Err): String = {
    val location = e.path.foldLeft("") {
      case (acc, Left(i)) => acc + s"[$i]"
      case ("", Right(k)) => k
      case (acc, Right(k)) => acc + "." + k
    }
    val base = if (location.nonEmpty) s"${e.message} in '$location'" else e.message
    if (!e.schema.hasSchemaKey) s"$base (expected: ${e.schema.repr})" else base
  }

  /** Formatted best-error messages for a document — what the reference's
    * DataFileValidator would add to `messages` for this doc. */
  def validate(schema: Compiled, doc: JValue): List[String] =
    bestErrors(schema, doc).map(format)

  /** The reference's DEFAULT-schema selection (strong='oneOf', weak=[]) —
    * used when validating against the published HEPData schemas
    * (data_file_validator.py:127-132). */
  def validateStrongOneOf(schema: Compiled, doc: JValue): List[String] =
    bestErrors(schema, doc, weak = Set.empty, strong = Set("oneOf")).map(format)
}

/** Python `repr()` rendering of JSON values — needed because the reference
  * surfaces raw jsonschema messages, which embed Python reprs of instances
  * and schema dicts (True/False/None, single-quoted strings). */
object PyRepr {
  def str(s: String): String = {
    // Python repr: single quotes unless the string contains ' and not "
    val hasSingle = s.contains("'")
    val hasDouble = s.contains("\"")
    val (q, escapeSingle) =
      if (hasSingle && !hasDouble) ("\"", false) else ("'", hasSingle)
    val body = s.flatMap {
      case '\\' => "\\\\"
      case '\'' if escapeSingle => "\\'"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    }
    q + body + q
  }

  def num(d: BigDecimal): String =
    if (d.isWhole && d.abs < BigDecimal("1e16")) d.toBigInt.toString
    else double(d.toDouble)

  /** Python float repr for the common range (no exotic exponents). */
  def double(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0) { // repr(-0.0) keeps the sign
      if (1.0 / d < 0) "-0.0" else "0.0"
    } else if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16)
      s"${d.toLong}.0"
    else {
      val s = java.lang.Double.toString(d)
      if (!s.contains("E")) s
      else { // 1.0E22 -> 1e+22, 1.5E-7 -> 1.5e-07
        val Array(m, e) = s.split("E")
        val mant = if (m.endsWith(".0")) m.dropRight(2) else m
        val exp = e.toInt
        val sign = if (exp < 0) "-" else "+"
        f"${mant}e$sign${math.abs(exp)}%02d"
      }
    }
  }

  def render(j: JValue): String = j match {
    case JString(s) => str(s)
    case JInt(n) => n.toString
    case JDouble(n) => double(n)
    case JDecimal(n) => if (n.isWhole) num(n) else n.toString
    case JBool(true) => "True"
    case JBool(false) => "False"
    case JNull | JNothing => "None"
    case JArray(xs) => xs.map(render).mkString("[", ", ", "]")
    case JObject(fields) =>
      fields.map { case (k, v) => s"${str(k)}: ${render(v)}" }
        .mkString("{", ", ", "}")
    case JLong(n) => n.toString
    case JSet(xs) => xs.map(render).mkString("{", ", ", "}")
  }
}
