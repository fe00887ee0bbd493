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
  * required, additionalProperties (bool, incl. the not-match-any-regex
  * wording), items (single-schema form), anyOf, oneOf, allOf, not,
  * if/then/else, const, enum, pattern, maxLength, minLength,
  * minimum/maximum (incl. the draft-04 boolean exclusiveMinimum/Maximum
  * modifiers), exclusiveMinimum/Maximum (numeric form), multipleOf,
  * minProperties/maxProperties, minItems, maxItems, uniqueItems, contains
  * (+ minContains/maxContains at 2020-12), propertyNames, dependencies
  * (array and schema forms) and the 2020-12 dependentRequired/
  * dependentSchemas split. Draft selection follows the root `$schema` like
  * jsonschema's validator_for (absent ⇒ 2020-12); keywords OUTSIDE the
  * selected draft's vocabulary are annotations there and are ignored, which
  * is exactly what the reference does.
  *
  * The few remaining keywords that WOULD validate ($ref/$dynamicRef,
  * unevaluatedProperties/Items, prefixItems, tuple/boolean items,
  * schema-form additionalProperties) are rejected LOUDLY at compile —
  * silently ignoring a validation keyword would under-validate, the worst
  * failure mode for a validator. `format` is annotation-only in the
  * reference (no FormatChecker is ever passed, __init__.py:97-122).
  */
object JsonSchema {

  final case class Compiled(
      draft: Int, // 4, 6, 7 or 2020 — selected by the ROOT $schema
      falseSchema: Boolean, // the boolean schema `false`: nothing validates
      types: Option[Seq[String]],
      properties: Seq[(String, Compiled)],
      patternProps: Seq[(String, Compiled)],
      required: Seq[String],
      additionalAllowed: Boolean,
      items: Option[Compiled],
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

  /** Spec-defined validation keywords the evaluator does NOT implement, per
    * draft. These are rejected LOUDLY at compile: silently ignoring a
    * keyword the reference's jsonschema WOULD enforce is under-validation,
    * the worst failure mode for a validator. Keywords OUTSIDE a draft's
    * vocabulary are a different story: jsonschema ignores them as
    * annotations (e.g. `dependencies` under 2020-12, `if` under draft-06,
    * or the reference's own non-spec 'name' key), so ignoring them is
    * faithful. `format` is likewise annotation-only in the reference (no
    * FormatChecker is ever passed, __init__.py:97-122); $ref is inlined by
    * SchemaResolver BEFORE compile, so one surviving here is a resolution
    * bug. */
  private def unsupportedIn(draft: Int): Set[String] =
    if (draft >= 2020)
      Set("$ref", "$dynamicRef", "prefixItems",
        "unevaluatedProperties", "unevaluatedItems")
    else Set("$ref")

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
    case "dependencies" => draft < 2020
    case "exclusiveMinimum" | "exclusiveMaximum" => true // bool@4, numeric@6+
    case "const" | "contains" | "propertyNames" => draft >= 6
    case "if" | "then" | "else" => draft >= 7
    case "dependentRequired" | "dependentSchemas" |
         "minContains" | "maxContains" => draft >= 2020
    case _ => false
  }

  private def draftOf(f: Map[String, JValue]): Int =
    f.get("$schema") match {
      case Some(JString(u)) if u.contains("draft-04") => 4
      case Some(JString(u)) if u.contains("draft-06") => 6
      case Some(JString(u)) if u.contains("draft-07") => 7
      case _ => 2020 // absent, 2019-09 and 2020-12 all get the modern set
    }

  def compile(j: JValue): Compiled = j match {
    case o: JObject => compile(o, draftOf(o.obj.toMap))
    case other => compile(other, 2020)
  }

  private def compile(j: JValue, draft: Int): Compiled = j match {
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
      def sub1(k: String): Option[Compiled] = f.get(k) match {
        case Some(o2: JObject) => Some(compile(o2, draft))
        case Some(b: JBool) => Some(compile(b, draft))
        case _ => None
      }
      def subs(k: String): Seq[Compiled] = f.get(k) match {
        case Some(JArray(xs)) => xs.map(compile(_, draft))
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
          case Some(JObject(ps)) => ps.map { case (k, v) => k -> compile(v, draft) }
          case _ => Nil
        },
        patternProps = f.get("patternProperties") match {
          case Some(JObject(ps)) => ps.map { case (k, v) => k -> compile(v, draft) }
          case _ => Nil
        },
        required = strs("required"),
        additionalAllowed = f.get("additionalProperties") match {
          case Some(JBool(b)) => b
          case Some(_: JObject) => throw new IllegalArgumentException(
            "schema-form 'additionalProperties' unsupported — refusing to compile")
          case _ => true
        },
        items = f.get("items") match {
          case Some(o2: JObject) => Some(compile(o2, draft))
          case Some(JArray(_)) =>
            throw new IllegalArgumentException("tuple-form 'items' unsupported")
          case Some(JBool(true)) => Some(compile(JObject(), draft))
          case Some(JBool(false)) => throw new IllegalArgumentException(
            // 2020-12 gives items:false a bespoke "Expected at most 0
            // items" wording tied to prefixItems, which we don't model
            "boolean-form 'items: false' unsupported — refusing to compile")
          case _ => None
        },
        anyOf = subs("anyOf"), oneOf = subs("oneOf"), allOf = subs("allOf"),
        notSchema = f.get("not").map(compile(_, draft)),
        dependencies = f.get("dependencies") match {
          case Some(JObject(ds)) => ds.map {
            case (k, JArray(xs)) =>
              k -> Left(xs.collect { case JString(s) => s })
            case (k, JString(s)) => k -> Left(Seq(s)) // draft-03 relic form
            case (k, v) => k -> Right(compile(v, draft))
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
          case Some(JObject(ds)) => ds.map { case (k, v) => k -> compile(v, draft) }
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
        // draft-04 spells exclusivity as booleans modifying minimum/maximum;
        // draft-06+ as standalone numeric keywords — a boolean there is a
        // SCHEMA error (check_schema raises in the reference), so reject
        minExclusive = f.get("exclusiveMinimum") match {
          case Some(_: JBool) if draft != 4 =>
            throw new IllegalArgumentException(
              "boolean exclusiveMinimum is draft-04 only (check_schema rejects it)")
          case Some(JBool(b)) => b
          case _ => false
        },
        maxExclusive = f.get("exclusiveMaximum") match {
          case Some(_: JBool) if draft != 4 =>
            throw new IllegalArgumentException(
              "boolean exclusiveMaximum is draft-04 only (check_schema rejects it)")
          case Some(JBool(b)) => b
          case _ => false
        },
        exclusiveMinimum = f.get("exclusiveMinimum") match {
          case Some(_: JBool) | None => None
          case other => other
        },
        exclusiveMaximum = f.get("exclusiveMaximum") match {
          case Some(_: JBool) | None => None
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
    case JBool(true) => compile(JObject(), draft)
    case JBool(false) =>
      // the boolean schema `false`: nothing validates ("False schema does
      // not allow <instance>"). hasSchemaKey=true because the hepdata
      // formatter only appends "(expected: ...)" for DICT subschemas.
      compile(JObject(), draft).copy(falseSchema = true, repr = "False",
        hasSchemaKey = true, keyOrder = Seq("$falseSchema$"))
    case other =>
      throw new IllegalArgumentException(s"unsupported schema node: $other")
  }

  def compile(json: String): Compiled =
    compile(org.json4s.jackson.JsonMethods.parse(json))

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

  /** All errors of `doc` against `schema`, in jsonschema's iteration order
    * (schema-keyword order, then instance recursion depth-first). */
  def errors(schema: Compiled, doc: JValue): List[Err] = {
    val buf = List.newBuilder[Err]
    walk(schema, doc, Nil, buf)
    buf.result()
  }

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
      out: scala.collection.mutable.Growable[Err]): Unit = {
    s.keyOrder.foreach {
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
              walk(sub, fv, Right(k) :: rpath, out)
            }
          }
        case _ => ()
      }
      case "patternProperties" => v match {
        case JObject(fields) =>
          s.compiledPatternProps.foreach { case (pat, sub) =>
            fields.foreach { case (k, fv) =>
              if (pat.matcher(k).find()) walk(sub, fv, Right(k) :: rpath, out)
            }
          }
        case _ => ()
      }
      case "propertyNames" => v match {
        case JObject(fields) => s.propNames.foreach { sub =>
          // each KEY is validated as an instance; the path stays put
          fields.foreach { case (k, _) => walk(sub, JString(k), rpath, out) }
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
            case (_, Right(sub)) => walk(sub, v, rpath, out)
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
            if (keys.contains(prop)) walk(sub, v, rpath, out)
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
              if (errors(sub, it.next()).isEmpty) {
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
            if (!xs.exists(x => errors(sub, x).isEmpty))
              out += err(s, v, rpath, "contains",
                s"None of ${PyRepr.render(v)} are valid under the given schema")
          }
        }
        case _ => ()
      }
      case "if" => s.ifSchema.foreach { cond =>
        if (errors(cond, v).isEmpty) s.thenSchema.foreach(walk(_, v, rpath, out))
        else s.elseSchema.foreach(walk(_, v, rpath, out))
      }
      case "items" => v match {
        case JArray(xs) => s.items.foreach { sub =>
          xs.zipWithIndex.foreach { case (x, i) =>
            walk(sub, x, Left(i) :: rpath, out)
          }
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
      case "not" => s.notSchema.foreach { sub =>
        if (errors(sub, v).isEmpty)
          out += err(s, v, rpath, "not",
            s"${PyRepr.render(v)} should not be valid under ${sub.repr}")
      }
      case "anyOf" if s.anyOf.nonEmpty =>
        val ctxs = s.anyOf.map(errors(_, v))
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
        val ctxs = s.oneOf.map(errors(_, v))
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
      case "allOf" => s.allOf.foreach(walk(_, v, rpath, out))
      case _ => () // $schema, $id, id, title, description, ...
    }
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
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16)
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
