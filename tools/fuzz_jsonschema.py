#!/usr/bin/env python3
"""Broad randomized differential fuzz of the JSON-Schema evaluator.

Generates random schema trees over (nearly) the full supported keyword
space — per-draft vocabularies, combinators, $ref into generated $defs,
anchors, unevaluated*, items/prefixItems variants — plus random documents,
runs the LIVE reference on each, and emits (schema, doc, messages) JSONL
for the Scala replayer. Unlike the curated corpus families this explores
keyword INTERACTIONS blindly; use it to hunt divergences, then distill
interesting cases into the pinned corpus.

Excluded on purpose:
 - schema-form additionalProperties with >1 potentially-failing extra
   (python SET iteration order — messages would be PYTHONHASHSEED-
   dependent): the fuzzer simply never emits schema-form addProps.
 - schemas check_schema rejects (SchemaError cases are skipped).

Usage: fuzz_jsonschema.py <n_cases> <seed> [profile] > cases.jsonl

Profiles: "broad" (default, round-4 behavior, byte-stable for a given
seed) and "refheavy" — the round-5 campaign profile weighting the newest
surface: $ref chains between $defs (cycles allowed), plain-name $anchor
refs ("#name", incl. the draft-07 "$id" spelling), $dynamicRef, and
unevaluatedProperties/Items interacting with combinators.
"""
import json
import random
import sys
import warnings

warnings.filterwarnings("ignore")
sys.path.insert(0, "/root/reference")
from hepdata_validator import Validator  # noqa: E402
from jsonschema import validators, exceptions  # noqa: E402


class Probe(Validator):
    base_path = "."
    schema_name = "probe"

    def validate(self, **kwargs):  # pragma: no cover
        pass


DRAFTS = [None,  # 2020-12 default
          "https://json-schema.org/draft/2020-12/schema",
          "http://json-schema.org/draft-07/schema#",
          "http://json-schema.org/draft-06/schema#",
          "http://json-schema.org/draft-04/schema#"]

SCALARS = [0, 1, 3, -2, 2.5, 0.5, "a", "bc", "", True, False, None, 100]


def rand_value(rng, depth=0):
    r = rng.random()
    if depth > 2 or r < 0.55:
        return rng.choice(SCALARS)
    if r < 0.8:
        return [rand_value(rng, depth + 1) for _ in range(rng.randint(0, 3))]
    return {rng.choice(["a", "b", "k", "v", "x"]): rand_value(rng, depth + 1)
            for _ in range(rng.randint(0, 3))}


def rand_schema(rng, draft, depth=0, defs=None, allow_ref=True,
                profile="broad"):
    """A random schema dict using keywords valid at `draft`."""
    if depth > 3:
        return rng.choice([{"type": "number"}, {"type": "string"}, {}, True])
    legacy = draft is not None and "draft-0" in (draft or "")
    modern = not legacy
    kws = []

    def sub():
        return rand_schema(rng, draft, depth + 1, defs, allow_ref, profile)

    pool = ["type", "enum", "minimum", "maximum", "pattern", "maxLength",
            "minLength", "required", "properties", "items", "minItems",
            "maxItems", "uniqueItems", "anyOf", "oneOf", "allOf", "not",
            "minProperties", "maxProperties", "additionalPropsFalse",
            "patternProperties", "multipleOf"]
    if modern or "draft-07" in (draft or "") or "draft-06" in (draft or ""):
        pool += ["const", "contains", "propertyNames", "exclusiveMinimum"]
    if modern or "draft-07" in (draft or ""):
        pool += ["ifthen"]
    if legacy:
        pool += ["dependencies", "tupleItems"]
    if modern:
        pool += ["dependentRequired", "dependentSchemas", "prefixItems",
                 "unevaluatedProps", "unevaluatedItems", "minContains"]
    if allow_ref and defs is not None and depth > 0:
        pool += ["ref", "ref"]
        if getattr(defs, "has_dyn_anchor", False):
            pool += ["dynref"]
        if profile == "refheavy":
            pool += ["ref"] * 4
            if getattr(defs, "has_dyn_anchor", False):
                pool += ["dynref"] * 2
            if getattr(defs, "anchored", None):
                pool += ["anchorref"] * 3
    if profile == "refheavy" and modern:
        pool += ["unevaluatedProps", "unevaluatedItems", "ifthen"]

    schema = {}
    for kw in rng.sample(pool, k=min(len(pool), rng.randint(1, 3))):
        if kw == "type":
            schema["type"] = rng.choice(
                ["object", "array", "string", "number", "integer", "boolean",
                 "null", ["number", "string"], ["object", "null"]])
        elif kw == "enum":
            schema["enum"] = rng.sample(SCALARS, k=rng.randint(1, 3))
        elif kw == "const":
            schema["const"] = rng.choice(SCALARS)
        elif kw == "minimum":
            schema["minimum"] = rng.choice([0, 1, 2.5, -1])
        elif kw == "maximum":
            schema["maximum"] = rng.choice([3, 10, 0.5])
        elif kw == "exclusiveMinimum":
            schema["exclusiveMinimum"] = rng.choice([0, 2])
        elif kw == "multipleOf":
            schema["multipleOf"] = rng.choice([1, 2, 0.5, 2.5])
        elif kw == "pattern":
            schema["pattern"] = rng.choice(["^a", "b$", "\\d", "^$"])
        elif kw == "maxLength":
            schema["maxLength"] = rng.randint(0, 3)
        elif kw == "minLength":
            schema["minLength"] = rng.randint(0, 3)
        elif kw == "required":
            schema["required"] = rng.sample(["a", "b", "k", "v"],
                                            k=rng.randint(1, 2))
        elif kw == "properties":
            schema["properties"] = {
                k: sub() for k in rng.sample(["a", "b", "k", "v"],
                                             k=rng.randint(1, 2))}
        elif kw == "patternProperties":
            schema["patternProperties"] = {rng.choice(["^a", "b$"]): sub()}
        elif kw == "additionalPropsFalse":
            schema["additionalProperties"] = False
        elif kw == "items":
            schema["items"] = rng.choice([sub(), False] if modern else [sub()])
        elif kw == "tupleItems":
            schema["items"] = [sub() for _ in range(rng.randint(1, 2))]
            if rng.random() < 0.5:
                schema["additionalItems"] = rng.choice([False, sub()])
        elif kw == "prefixItems":
            schema["prefixItems"] = [sub() for _ in range(rng.randint(1, 2))]
        elif kw == "minItems":
            schema["minItems"] = rng.randint(0, 3)
        elif kw == "maxItems":
            schema["maxItems"] = rng.randint(0, 3)
        elif kw == "uniqueItems":
            schema["uniqueItems"] = True
        elif kw in ("anyOf", "oneOf", "allOf"):
            schema[kw] = [sub() for _ in range(rng.randint(1, 2))]
        elif kw == "not":
            schema["not"] = sub()
        elif kw == "minProperties":
            schema["minProperties"] = rng.randint(0, 3)
        elif kw == "maxProperties":
            schema["maxProperties"] = rng.randint(0, 3)
        elif kw == "contains":
            schema["contains"] = sub()
        elif kw == "minContains" and "contains" in schema:
            schema["minContains"] = rng.randint(0, 2)
        elif kw == "propertyNames":
            schema["propertyNames"] = rng.choice(
                [{"maxLength": 1}, {"pattern": "^[ab]"}])
        elif kw == "ifthen":
            schema["if"] = sub()
            if rng.random() < 0.8:
                schema["then"] = sub()
            if rng.random() < 0.5:
                schema["else"] = sub()
        elif kw == "dependencies":
            schema["dependencies"] = {
                rng.choice(["a", "b"]): rng.choice([["k"], sub()])}
        elif kw == "dependentRequired":
            schema["dependentRequired"] = {rng.choice(["a", "b"]): ["k"]}
        elif kw == "dependentSchemas":
            schema["dependentSchemas"] = {rng.choice(["a", "b"]): sub()}
        elif kw == "unevaluatedProps":
            schema["unevaluatedProperties"] = rng.choice(
                [False, {"type": "number"}])
        elif kw == "unevaluatedItems":
            schema["unevaluatedItems"] = rng.choice(
                [False, {"type": "number"}])
        elif kw == "ref":
            name = rng.choice(list(defs)) if defs else None
            if name:
                schema = {"$ref": f"#/$defs/{name}"
                          if modern else f"#/definitions/{name}"}
                if modern and rng.random() < 0.3:
                    schema["type"] = rng.choice(["number", "string"])
                return schema
        elif kw == "dynref":
            if defs and modern:
                return {"$dynamicRef": "#fuzzanchor"}
        elif kw == "anchorref":
            anchored = getattr(defs, "anchored", [])
            if anchored:
                return {"$ref": "#" + rng.choice(anchored)}
    return schema


def gen_case(rng, profile="broad"):
    if profile == "refheavy":
        return gen_case_refheavy(rng)
    draft = rng.choice(DRAFTS)
    modern = draft is None or "draft/20" in draft
    n_defs = rng.randint(0, 2)
    def_names = [f"d{i}" for i in range(n_defs)]
    defs = {}
    for name in def_names:
        defs[name] = rand_schema(rng, draft, depth=2, defs=None,
                                 allow_ref=False)
    has_dyn = False
    if defs and modern and rng.random() < 0.3:
        first = def_names[0]
        defs[first] = {"$dynamicAnchor": "fuzzanchor", **defs[first]}
        has_dyn = True

    class _Names(list):
        pass
    names = _Names(def_names)
    names.has_dyn_anchor = has_dyn
    root = rand_schema(rng, draft, depth=0, defs=names if def_names else None)
    if defs:
        root[("$defs" if modern else "definitions")] = defs
    if draft is not None:
        root = {"$schema": draft, **root}
    doc = rand_value(rng)
    return root, doc


class _Names(list):
    pass


def gen_case_refheavy(rng):
    """$ref/$anchor/$dynamicRef/unevaluated*-weighted generation: chained
    $defs (cycles allowed — the reference handles cyclic refs lazily, we
    compile a cyclic RefCell graph), plain-name anchors in both the
    modern $anchor and draft-07 "$id": "#name" spellings, and one
    $dynamicAnchor most of the time."""
    draft = rng.choice([None,
                        "https://json-schema.org/draft/2020-12/schema",
                        "http://json-schema.org/draft-07/schema#"])
    modern = draft is None or "draft/20" in draft
    n_defs = rng.randint(1, 3)
    def_names = [f"d{i}" for i in range(n_defs)]
    defs = {}
    anchored = []
    for i, name in enumerate(def_names):
        # earlier defs only — a DAG. True ref cycles make the reference
        # recurse schema-side without consuming the document; the
        # RecursionError surfaces inside jsonschema's Rust rpds layer and
        # ABORTS the process (uncatchable panic), so they can't be
        # differential cases. (graft compiles cyclic graphs fine; its
        # cyclic coverage lives in the curated recursive-$ref corpus.)
        visible = _Names(def_names[:i])
        visible.has_dyn_anchor = False
        visible.anchored = list(anchored)
        body = rand_schema(rng, draft, depth=2,
                           defs=visible if visible else None,
                           profile="refheavy")
        if not isinstance(body, dict):
            body = {"type": "number"}
        if rng.random() < 0.4:
            aname = f"anch{i}"
            if modern:
                body = {"$anchor": aname, **body}
            else:
                body = {"$id": f"#{aname}", **body}
            anchored.append(aname)
        defs[name] = body
    has_dyn = False
    if modern and rng.random() < 0.6:
        first = def_names[0]
        defs[first] = {"$dynamicAnchor": "fuzzanchor", **defs[first]}
        has_dyn = True
    names = _Names(def_names)
    names.has_dyn_anchor = has_dyn
    names.anchored = anchored
    root = rand_schema(rng, draft, depth=0, defs=names, profile="refheavy")
    if not isinstance(root, dict):
        root = {"type": "object"}
    root[("$defs" if modern else "definitions")] = defs
    if draft is not None:
        root = {"$schema": draft, **root}
    doc = rand_value(rng)
    return root, doc


def main():
    n, seed = int(sys.argv[1]), int(sys.argv[2])
    profile = sys.argv[3] if len(sys.argv) > 3 else "broad"
    rng = random.Random(seed)
    emitted = skipped = 0
    while emitted < n:
        schema, doc = gen_case(rng, profile)
        v = Probe()
        v.messages = {}
        try:
            v._validate_json_against_schema("f", doc, schema)
        except exceptions.SchemaError:
            skipped += 1
            continue
        except RecursionError:
            skipped += 1
            continue
        except Exception:
            skipped += 1  # unresolvable ref chains etc. — both sides loud
            continue
        msgs = [m.message for m in v.get_messages().get("f", [])]
        print(json.dumps({"schema": schema, "doc": doc, "messages": msgs}))
        emitted += 1
    print(f"emitted {emitted}, skipped {skipped}", file=sys.stderr)


if __name__ == "__main__":
    main()
