#!/usr/bin/env python3
"""Extend the jsonschema conformance corpus with the round-3 keywords
(not, exclusiveMinimum/Maximum incl. the draft-04 boolean form, multipleOf,
minProperties/maxProperties) plus combos with the existing surface.

Runs the REFERENCE implementation (hepdata_validator
_validate_json_against_schema, default sort_fn=by_relevance()) on each
generated (schema, doc) pair and records the formatted messages — the Scala
evaluator must replay them byte-exactly (JsonSchemaConformanceSpec).

Deterministic: seed 43 (the original 350 cases were seed 42). Appends to
src/test/resources/golden/jsonschema_conformance.jsonl when run with
--append; prints to stdout otherwise.
"""
import json
import random
import sys

sys.path.insert(0, "/root/reference")
from hepdata_validator import Validator  # noqa: E402


class Probe(Validator):
    base_path = "."
    schema_name = "probe"

    def validate(self, **kwargs):  # pragma: no cover
        pass


def messages_for(schema, doc):
    v = Probe()
    v.messages = {}
    v._validate_json_against_schema("f", doc, schema)
    return [m.message for m in v.get_messages().get("f", [])]


def assert_set_order_safe(schema, doc):
    """Schema-form additionalProperties iterates a python SET in jsonschema:
    with ≥2 failing extras the message ORDER is PYTHONHASHSEED-dependent
    and the corpus would not regenerate byte-identically (the Scala side
    iterates sorted keys). Generators must keep ≤1 failing extra per case —
    this guard fails LOUDLY on a future seed/family change that would bake
    a nondeterministic golden. (Top-level only: these families emit the
    schema form only at the top level.)"""
    import re
    from jsonschema import validators
    ap = schema.get("additionalProperties") if isinstance(schema, dict) else None
    if not isinstance(ap, dict) or not isinstance(doc, dict):
        return
    cls = validators.validator_for(schema)
    named = set(schema.get("properties", {}))
    pats = list(schema.get("patternProperties", {}))
    extras = [k for k in doc
              if k not in named and not any(re.search(p, k) for p in pats)]
    failing = [k for k in extras if not cls(ap).is_valid(doc[k])]
    assert len(failing) <= 1, \
        f"set-order hazard ({failing} all fail schema-form " \
        f"additionalProperties): {schema} / {doc}"


def shuffled(rng, d):
    keys = list(d.keys())
    rng.shuffle(keys)
    return {k: d[k] for k in keys}


def gen_cases(rng):
    cases = []

    def add(schema, doc):
        cases.append((schema, doc))

    nums = [0, 1, 3, -2, 2.5, 3.0, 3.5, -0.5, 10, 100]
    # 1. numeric exclusive bounds (2020-12 numeric form), with/without type
    for _ in range(24):
        kw = rng.choice(["exclusiveMinimum", "exclusiveMaximum"])
        bound = rng.choice(nums)
        schema = {kw: bound}
        if rng.random() < 0.5:
            schema = shuffled(rng, {"type": "number", **schema})
        add(schema, rng.choice(nums + ["x", [1], {"a": 1}, None, True]))

    # 2. draft-04 boolean exclusive form (+ plain bounds at draft-04)
    for _ in range(16):
        bound = rng.choice(nums)
        excl = rng.random() < 0.7
        kw = rng.choice([("minimum", "exclusiveMinimum"), ("maximum", "exclusiveMaximum")])
        schema = {"$schema": "http://json-schema.org/draft-04/schema#",
                  kw[0]: bound}
        if excl:
            schema[kw[1]] = True
        add(schema, rng.choice(nums))

    # 3. multipleOf: int and float divisors over int/float/non-number docs
    for _ in range(24):
        m = rng.choice([1, 2, 3, 5, 0.5, 0.1, 2.5, 1.5])
        schema = {"multipleOf": m}
        if rng.random() < 0.4:
            schema = shuffled(rng, {"type": ["number", "string"], **schema})
        add(schema, rng.choice(nums + [7, 15, 2.6, -7, "ab", [2], 0.30000000000000004]))

    # 4. min/maxProperties incl. the special 0/1 wordings
    for _ in range(20):
        kw = rng.choice(["minProperties", "maxProperties"])
        n = rng.choice([0, 1, 2, 3])
        schema = {kw: n}
        if rng.random() < 0.4:
            schema = shuffled(rng, {"type": "object", **schema})
        docs = [{}, {"a": 1}, {"a": 1, "b": 2}, {"a": 1, "b": 2, "c": 3}, "s", 4]
        add(schema, rng.choice(docs))

    # 5. not: scalar, enum, and object-shaped subschemas
    for _ in range(22):
        sub = rng.choice([
            {"type": "string"},
            {"type": ["number", "boolean"]},
            {"enum": ["a", 2, True]},
            {"const": 5},
            shuffled(rng, {"properties": {"a": {"const": 1}}, "required": ["a"]}),
            {"minimum": 3},
        ])
        add({"not": sub},
            rng.choice(["hi", 2, 5, True, {"a": 1}, {"b": 0}, [1, 2], None, 7.5]))

    # 6. nested: new keywords under properties/items (path + expected suffix)
    for _ in range(28):
        inner = rng.choice([
            {"multipleOf": rng.choice([2, 0.5, 3])},
            {"exclusiveMinimum": rng.choice([0, 2, 1.5])},
            {"exclusiveMaximum": rng.choice([3, 10.5])},
            {"minProperties": rng.choice([1, 2])},
            {"not": {"type": "null"}},
            shuffled(rng, {"type": "number", "exclusiveMinimum": 1}),
        ])
        shape = rng.random()
        if shape < 0.45:
            schema = {"properties": {rng.choice(["x", "beta", "k"]): inner}}
            doc = {rng.choice(["x", "beta", "k"]):
                   rng.choice([5, 1, 0, 2.5, {"a": 1}, {}, None, "s"])}
        elif shape < 0.8:
            schema = {"items": inner}
            doc = [rng.choice([5, 1, 0, 2.5, {}, None]) for _ in range(rng.randint(1, 3))]
        else:
            schema = shuffled(rng, {
                "properties": {"v": inner}, "required": ["v"],
                "minProperties": 1})
            doc = rng.choice([{}, {"v": 4}, {"v": 0.5, "w": 1}])
        add(schema, doc)

    # 7. combinators over the new keywords (context best-error selection)
    for _ in range(26):
        branch_a = rng.choice([
            shuffled(rng, {"type": "number", "multipleOf": 2}),
            {"exclusiveMinimum": 5},
            {"not": {"type": "number"}},
        ])
        branch_b = rng.choice([
            {"enum": ["a", "b"]},
            shuffled(rng, {"type": "object", "minProperties": 2}),
            {"multipleOf": 3},
        ])
        comb = rng.choice(["anyOf", "oneOf", "allOf"])
        schema = {comb: [branch_a, branch_b]}
        if rng.random() < 0.3:
            schema["$schema"] = "http://json-schema.org/draft-06/schema#"
            schema = shuffled(rng, schema)
        add(schema, rng.choice([4, 6, 15, "a", {"x": 1, "y": 2}, {"z": 1}, 2.5]))

    # 8. kitchen-sink objects mixing old + new keywords in random key order
    for _ in range(20):
        schema = shuffled(rng, {
            "type": "object",
            "properties": {
                "n": shuffled(rng, {"type": "integer", "multipleOf": 2,
                                    "exclusiveMaximum": 100}),
                "s": {"pattern": "^a"},
                "o": shuffled(rng, {"minProperties": 1, "maxProperties": 2}),
            },
            "required": rng.sample(["n", "s", "o"], rng.randint(1, 3)),
            "maxProperties": 3,
        })
        doc = rng.choice([
            {"n": 3, "s": "abc", "o": {}},
            {"n": 101, "s": "b", "o": {"a": 1, "b": 2, "c": 3}},
            {"n": 4},
            {"n": 2, "s": "a!", "o": {"k": 1}, "extra": 0},
            {},
        ])
        add(schema, doc)

    return cases


def gen_cases_44(rng):
    """Round-3 second batch: patternProperties, dependencies (both forms,
    across drafts), dependentRequired/Schemas, propertyNames, contains
    (+min/maxContains and the draft-07 wording), if/then/else, and the
    not-match-any-regex additionalProperties message."""
    cases = []

    def add(schema, doc):
        cases.append((schema, doc))

    objs = [{}, {"a1": "s"}, {"ab": "x"}, {"a1": 2, "b2": "y"}, {"b": 1.5},
            {"ab": 3, "zz": "w"}, {"a": 1, "b": 2}, {"x": [1]}, {"a": 5},
            {"ab": 1, "qqq": 2}, {"a": 1, "longkey": []}, {"ab": "x", "b": "y"}]
    # patternProperties alone + with properties + addProps regex wording
    for _ in range(24):
        pp = rng.choice([
            {"^a": {"type": "number"}},
            {"^a": {"type": "number"}, "b$": {"type": "string"}},
            {"\\d": shuffled(rng, {"type": "integer", "multipleOf": 2})},
        ])
        schema = {"patternProperties": pp}
        r = rng.random()
        if r < 0.3:
            schema["properties"] = {"ab": {"maxLength": 1}}
        if r > 0.75:
            schema["additionalProperties"] = False
        add(shuffled(rng, schema), rng.choice(objs))

    # dependencies across drafts; dependentRequired/Schemas at 2020-12
    for _ in range(26):
        form = rng.random()
        dep_arr = {rng.choice(["a", "ab"]): rng.sample(["b", "c", "zz"],
                                                       rng.randint(1, 2))}
        dep_sch = {"a": shuffled(rng, {"minProperties": 2, "required": ["b"]})}
        if form < 0.4:
            d = rng.choice(["http://json-schema.org/draft-04/schema#",
                            "http://json-schema.org/draft-07/schema#"])
            schema = shuffled(rng, {"$schema": d, "dependencies":
                                    rng.choice([dep_arr, dep_sch])})
        elif form < 0.6:
            # 2020-12 ignores `dependencies` entirely
            schema = {"dependencies": dep_arr}
        elif form < 0.8:
            schema = {"dependentRequired": dep_arr}
        else:
            schema = {"dependentSchemas": dep_sch}
        add(schema, rng.choice(objs))

    # propertyNames
    for _ in range(12):
        sub = rng.choice([{"maxLength": 2}, {"pattern": "^[ab]"},
                          shuffled(rng, {"type": "string", "minLength": 2})])
        schema = {"propertyNames": sub}
        if rng.random() < 0.3:
            schema = {"properties": {"p": schema}}
            add(schema, {"p": rng.choice(objs)})
        else:
            add(schema, rng.choice(objs + ["notobj", 3]))

    # contains across drafts + min/maxContains (biased toward failures)
    arrs = [[], ["a"], ["a", "b"], [1, "a"], [1, 2, "a"], [1, 2, 3],
            [[], {}], [2, 3], ["a", "b", "c"]]
    for _ in range(22):
        sub = rng.choice([{"type": "number"}, {"const": 1},
                          shuffled(rng, {"type": "string", "minLength": 1})])
        schema = {"contains": sub}
        r = rng.random()
        if r < 0.3:
            schema["$schema"] = rng.choice(
                ["http://json-schema.org/draft-06/schema#",
                 "http://json-schema.org/draft-07/schema#"])
        elif r < 0.6:
            if rng.random() < 0.5:
                schema["minContains"] = rng.randint(0, 3)
            if rng.random() < 0.5:
                schema["maxContains"] = rng.randint(0, 2)
        add(shuffled(rng, schema), rng.choice(arrs))

    # if/then/else (draft-07 and 2020-12), incl. nesting
    for _ in range(18):
        cond = rng.choice([{"type": "number"},
                           shuffled(rng, {"properties": {"a": {"const": 1}},
                                          "required": ["a"]})])
        schema = {"if": cond}
        if rng.random() < 0.8:
            schema["then"] = rng.choice([{"minimum": 5}, {"required": ["b"]}])
        if rng.random() < 0.6:
            schema["else"] = rng.choice([{"maxLength": 1}, {"required": ["c"]}])
        if rng.random() < 0.25:
            schema = {"properties": {"p": shuffled(rng, schema)}}
            add(schema, {"p": rng.choice([3, 7, "ab", {"a": 1}, {"a": 2}])})
        else:
            add(shuffled(rng, schema), rng.choice([3, 7, "ab", {"a": 1}, {"a": 2}]))

    # deterministic must-cover pairs: one per message form, immune to RNG
    # drift (the random cases above add breadth, these guarantee depth)
    cases += [
        ({"patternProperties": {"^a": {"type": "number"}},
          "additionalProperties": False}, {"zz": 1, "a1": 2}),
        ({"patternProperties": {"^a": {}}, "additionalProperties": False},
         {"b": 1, "c": 2}),
        ({"$schema": "http://json-schema.org/draft-04/schema#",
          "dependencies": {"a": ["b", "c"]}}, {"a": 1}),
        ({"$schema": "http://json-schema.org/draft-07/schema#",
          "dependencies": {"a": {"minProperties": 2}}}, {"a": 1}),
        ({"dependentRequired": {"a": ["b", "c"]}}, {"a": 1}),
        ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"a": 1}),
        ({"propertyNames": {"maxLength": 2}}, {"abc": 1, "ab": 2}),
        ({"propertyNames": {"pattern": "^x"}}, {"yz": 1}),
        ({"contains": {"type": "number"}}, ["a", "b"]),
        ({"contains": {"type": "number"}, "minContains": 2}, [1, "a"]),
        ({"contains": {"type": "number"}, "minContains": 3}, ["a"]),
        ({"contains": {"type": "number"}, "maxContains": 1}, [1, 2, "a"]),
        ({"contains": {"type": "number"}, "minContains": 0}, []),
        ({"$schema": "http://json-schema.org/draft-06/schema#",
          "contains": {"const": 1}}, [2, 3]),
        ({"if": {"type": "number"}, "then": {"minimum": 5}}, 3),
        ({"if": {"type": "number"}, "else": {"maxLength": 1}}, "abc"),
        ({"properties": {"p": {"if": {"type": "number"},
                               "then": {"multipleOf": 2}}}}, {"p": 3}),
        ({"minProperties": 2, "dependentRequired": {"a": ["b"]}}, {"a": 1}),
    ]
    return cases


def gen_cases_45(rng):
    """Round-4 batch: an EXPLICIT-2020-12 family (the corpus was
    draft-04/06/07-weighted; this pins the modern-draft vocabulary gating —
    dependencies ignored, dependentRequired/Schemas + min/maxContains
    active), plus the newly-supported keywords: prefixItems +
    items-after-prefix + items:false wording, legacy tuple items +
    additionalItems, schema-form additionalProperties, and $ref (same-doc
    pointers incl. RECURSIVE schemas, per-draft sibling semantics).

    Determinism note: schema-form additionalProperties cases keep at most
    ONE failing extra — jsonschema iterates a python SET there, so
    multi-error ORDER is hash-randomization-dependent and would not
    regenerate byte-identically."""
    cases = []
    D2020 = "https://json-schema.org/draft/2020-12/schema"

    def add(schema, doc):
        cases.append((schema, doc))

    arrs = [[], [1], [1, "a"], ["a", 2], [1, 2, 3], ["a", "b", "c"],
            [1, "a", True], [2.5, [1], {}], [1, 2, "x", 3], [None, 1]]

    # explicit-2020-12 vocabulary gating family
    for _ in range(30):
        pick = rng.random()
        if pick < 0.25:
            # `dependencies` is an ANNOTATION at 2020-12 — never errors
            schema = {"$schema": D2020,
                      "dependencies": {"a": rng.choice([["b"], {"required": ["b"]}])}}
            if rng.random() < 0.5:
                schema["dependentRequired"] = {"a": ["c"]}
            add(shuffled(rng, schema), rng.choice([{"a": 1}, {"a": 1, "b": 2}, {}]))
        elif pick < 0.5:
            schema = {"$schema": D2020,
                      "dependentSchemas": {"a": shuffled(rng, {
                          "minProperties": 2, "required": ["b"]})}}
            add(shuffled(rng, schema), rng.choice([{"a": 1}, {"a": 1, "c": 2}, {"b": 1}]))
        elif pick < 0.75:
            schema = {"$schema": D2020, "contains": rng.choice(
                [{"type": "number"}, {"const": 1}])}
            if rng.random() < 0.6:
                schema["minContains"] = rng.randint(0, 3)
            if rng.random() < 0.5:
                schema["maxContains"] = rng.randint(0, 2)
            add(shuffled(rng, schema), rng.choice(arrs))
        else:
            # draft-04-only spellings are annotations at 2020-12
            schema = {"$schema": D2020, "minimum": rng.choice([0, 2, 2.5])}
            if rng.random() < 0.5:
                schema["exclusiveMinimum"] = rng.choice([0, 2])
            add(shuffled(rng, schema), rng.choice([1, 2, 3, 0, -1, 2.5, "x"]))

    # prefixItems / items-after-prefix / items:false (2020-12)
    for _ in range(30):
        n_prefix = rng.randint(0, 3)
        prefix = [rng.choice([{"type": "number"}, {"type": "string"},
                              {"const": 1}, {"minimum": 2}])
                  for _ in range(n_prefix)]
        schema = {}
        if prefix:
            schema["prefixItems"] = prefix
        tail = rng.random()
        if tail < 0.4:
            schema["items"] = False
            if not prefix:
                schema["prefixItems"] = [{"type": "number"}] if rng.random() < 0.5 else []
                if not schema["prefixItems"]:
                    del schema["prefixItems"]
        elif tail < 0.8:
            schema["items"] = rng.choice([{"type": "number"}, {"type": "string"}])
        if rng.random() < 0.3:
            schema["$schema"] = D2020
        if not schema:
            schema = {"items": {"type": "number"}}
        add(shuffled(rng, schema), rng.choice(arrs))

    # legacy tuple items + additionalItems (bool + schema forms)
    for _ in range(26):
        d = rng.choice(["http://json-schema.org/draft-04/schema#",
                        "http://json-schema.org/draft-06/schema#",
                        "http://json-schema.org/draft-07/schema#"])
        n_tuple = rng.randint(1, 3)
        tup = [rng.choice([{"type": "number"}, {"type": "string"},
                           {"minimum": 2}]) for _ in range(n_tuple)]
        schema = {"$schema": d, "items": tup}
        ai = rng.random()
        if ai < 0.4:
            schema["additionalItems"] = False
        elif ai < 0.7:
            schema["additionalItems"] = {"type": "string"}
        add(shuffled(rng, schema), rng.choice(arrs))

    # schema-form additionalProperties (≤1 failing extra — see docstring)
    for _ in range(16):
        sub = rng.choice([{"type": "number"}, {"maxLength": 1},
                          shuffled(rng, {"type": "string", "minLength": 2})])
        schema = {"additionalProperties": sub}
        if rng.random() < 0.5:
            schema["properties"] = {"a": {}}
        if rng.random() < 0.3:
            schema["patternProperties"] = {"^p": {}}
        docs = [{"a": 1, "b": 5}, {"b": "xy"}, {"a": "s"}, {"pq": [1], "a": 1},
                {"b": True}, {}, {"a": 1, "pq": 2}]
        add(shuffled(rng, schema), rng.choice(docs))

    # $ref: same-doc pointers, sibling semantics per draft, recursion
    for _ in range(28):
        defs_key = "definitions" if rng.random() < 0.5 else "$defs"
        target = rng.choice([
            {"type": "number", "minimum": 0},
            {"type": "string"},
            shuffled(rng, {"minLength": 2, "pattern": "^a"}),
            {"enum": [1, "a"]},
        ])
        schema = {defs_key: {"pos": target},
                  "properties": {"x": {"$ref": f"#/{defs_key}/pos"}}}
        r = rng.random()
        if r < 0.3:
            schema["$schema"] = rng.choice(
                ["http://json-schema.org/draft-04/schema#",
                 "http://json-schema.org/draft-07/schema#"])
            # legacy: siblings of $ref are ignored
            if rng.random() < 0.5:
                schema["properties"]["x"]["type"] = "boolean"
        elif r < 0.45:
            # 2020-12: siblings evaluated alongside
            schema["properties"]["x"]["type"] = "boolean"
        elif r < 0.6:
            schema["required"] = ["x"]
        add(shuffled(rng, schema),
            rng.choice([{"x": -1}, {"x": "ab"}, {"x": "zz"}, {"x": 5},
                        {"x": True}, {}, {"x": [1]}]))

    # recursive tree schemas (the round-4 headline case family)
    for _ in range(12):
        defs_key = "$defs" if rng.random() < 0.5 else "definitions"
        node = {"type": "object",
                "properties": {"v": {"type": "number"},
                               "kids": {"type": "array",
                                        "items": {"$ref": f"#/{defs_key}/node"}}},
                "required": ["v"]}
        schema = {defs_key: {"node": node}, "$ref": f"#/{defs_key}/node"}
        if rng.random() < 0.3:
            schema["$schema"] = "http://json-schema.org/draft-07/schema#"
        docs = [
            {"v": 1, "kids": [{"v": 2}, {"v": "bad"}]},
            {"v": 1, "kids": [{"kids": []}]},
            {"kids": [{"v": 1}]},
            {"v": 1, "kids": [{"v": 2, "kids": [{"v": None, "kids": 3}]}]},
            {"v": 1},
            "notanode",
        ]
        add(schema, rng.choice(docs))

    # deterministic must-cover pairs for every new message form
    cases += [
        ({"prefixItems": [{"type": "number"}], "items": False}, [1, 2, 3]),
        ({"prefixItems": [{"type": "number"}], "items": False}, [1, "x"]),
        ({"items": False}, [1]),
        ({"items": False}, [1, 2]),
        ({"items": False}, []),
        ({"prefixItems": [{"type": "number"}, {"const": 2}]}, ["a", 3]),
        ({"prefixItems": [{"type": "number"}], "items": {"type": "string"}},
         [1, 2, "x", 3]),
        ({"$schema": "http://json-schema.org/draft-07/schema#",
          "items": [{"type": "number"}], "additionalItems": False}, [1, 2]),
        ({"$schema": "http://json-schema.org/draft-07/schema#",
          "items": [{"type": "number"}], "additionalItems": False}, [1, 2, 3]),
        ({"$schema": "http://json-schema.org/draft-04/schema#",
          "items": [{"type": "number"}], "additionalItems": {"type": "string"}},
         [1, 2, "x"]),
        ({"$schema": "http://json-schema.org/draft-06/schema#",
          "items": {"type": "number"}, "additionalItems": False}, [1, "a"]),
        ({"properties": {"a": {}}, "additionalProperties": {"type": "number"}},
         {"a": 1, "b": "x", "c": 2}),
        ({"definitions": {"pos": {"type": "number", "minimum": 0}},
          "properties": {"x": {"$ref": "#/definitions/pos"}}}, {"x": -1}),
        ({"$schema": "http://json-schema.org/draft-07/schema#",
          "definitions": {"pos": {"minimum": 0}},
          "properties": {"x": {"$ref": "#/definitions/pos", "type": "string"}}},
         {"x": -1}),
        ({"$defs": {"pos": {"minimum": 0}},
          "properties": {"x": {"$ref": "#/$defs/pos", "type": "string"}}},
         {"x": -1}),
        ({"$defs": {"node": {"type": "object",
                             "properties": {"v": {"type": "number"},
                                            "kids": {"type": "array",
                                                     "items": {"$ref": "#/$defs/node"}}},
                             "required": ["v"]}},
          "$ref": "#/$defs/node"},
         {"v": 1, "kids": [{"v": "bad", "kids": [{"kids": []}]}]}),
        ({"type": "object", "properties": {"next": {"$ref": "#"}}},
         {"next": {"next": 3}}),
        ({"$defs": {"a/b": {"type": "number"}, "c~d": {"type": "string"}},
          "properties": {"p": {"$ref": "#/$defs/a~1b"},
                         "q": {"$ref": "#/$defs/c~0d"}}},
         {"p": "s", "q": 1}),
        ({"$schema": "https://json-schema.org/draft/2020-12/schema",
          "dependencies": {"a": ["b"]}, "dependentRequired": {"a": ["c"]}},
         {"a": 1}),
    ]
    return cases


def gen_cases_46(rng):
    """Round-4 second batch: unevaluatedProperties / unevaluatedItems —
    annotation-style evaluation across properties/patternProperties/
    additionalProperties, valid combinator branches, if/then/else,
    dependentSchemas and $ref, plus both message wordings."""
    cases = []

    def add(schema, doc):
        cases.append((schema, doc))

    objs = [{}, {"a": 1}, {"a": 1, "b": 2}, {"a": 1, "b": 2, "c": 3},
            {"b": "x"}, {"px": 1, "q": 2}, {"a": "s", "b": 1},
            {"a": 1, "zz": [1]}, {"b": 2, "c": "y"}]
    for _ in range(34):
        pick = rng.random()
        if pick < 0.2:
            schema = {"properties": {"a": {}}, "unevaluatedProperties":
                      rng.choice([False, {"type": "number"}, {"maxLength": 1}])}
        elif pick < 0.35:
            branches = [{"properties": {"a": {}}},
                        shuffled(rng, {"properties": {"b": {"type": "number"}},
                                       "required": ["b"]})]
            schema = {rng.choice(["allOf", "anyOf", "oneOf"]): branches,
                      "unevaluatedProperties": False}
        elif pick < 0.5:
            schema = {"if": {"required": ["a"]},
                      "then": {"properties": {"b": {}}},
                      "unevaluatedProperties": False}
            if rng.random() < 0.5:
                schema["else"] = {"properties": {"c": {}}}
        elif pick < 0.6:
            schema = {"patternProperties": {"^p": {}},
                      "unevaluatedProperties": False}
        elif pick < 0.7:
            schema = {"dependentSchemas": {"a": {"properties": {"b": {}}}},
                      "unevaluatedProperties": False}
        elif pick < 0.8:
            schema = {"additionalProperties": rng.choice(
                          [True, {"type": "number"}]),
                      "unevaluatedProperties": False}
        else:
            schema = {"$defs": {"base": {"properties": {"a": {}}}},
                      "$ref": "#/$defs/base",
                      "unevaluatedProperties": False}
        add(shuffled(rng, schema), rng.choice(objs))

    arrs = [[], [1], [1, 2], [1, "x"], [1, 2, 3], ["a", 1, "b"],
            [1, 2, "z"], [[1], {"a": 1}]]
    for _ in range(26):
        pick = rng.random()
        if pick < 0.3:
            schema = {"prefixItems": [{"type": "number"}],
                      "unevaluatedItems": rng.choice([False, {"type": "number"}])}
        elif pick < 0.45:
            schema = {"contains": {"type": "string"},
                      "unevaluatedItems": False}
        elif pick < 0.6:
            # items in ANY form evaluates the whole array
            schema = {"items": rng.choice([{"type": "number"}, True]),
                      "unevaluatedItems": False}
        elif pick < 0.8:
            schema = {"anyOf": [
                {"prefixItems": [{"type": "number"}, {"type": "number"}]},
                {"contains": {"const": "z"}}],
                "unevaluatedItems": False}
        else:
            schema = {"if": {"contains": {"const": 1}},
                      "then": {"prefixItems": [{}, {}]},
                      "unevaluatedItems": False}
        add(shuffled(rng, schema), rng.choice(arrs))

    # deterministic must-cover pairs: each wording + the subtle evaluation
    # rules (invalid-branch ignored, additionalProperties value-validity)
    cases += [
        ({"properties": {"a": {}}, "unevaluatedProperties": False},
         {"a": 1, "b": 2, "c": 3}),
        ({"unevaluatedProperties": {"type": "number"}}, {"a": 1, "b": "x"}),
        ({"allOf": [{"properties": {"a": {"type": "number"}},
                     "required": ["a"]}],
          "unevaluatedProperties": False}, {"a": "bad", "b": 1}),
        ({"additionalProperties": {"type": "number"},
          "unevaluatedProperties": False}, {"a": 1, "b": "x"}),
        ({"$defs": {"base": {"properties": {"a": {}}}},
          "$ref": "#/$defs/base", "unevaluatedProperties": False},
         {"a": 1, "b": 2}),
        ({"prefixItems": [{"type": "number"}], "unevaluatedItems": False},
         [1, 2, 3]),
        ({"unevaluatedItems": {"type": "number"}}, [1, "x", 2]),
        ({"contains": {"type": "string"}, "unevaluatedItems": False},
         ["a", 1]),
        ({"items": {"type": "number"}, "unevaluatedItems": False}, [1, "x"]),
    ]
    return cases


def gen_cases_47(rng):
    """Round-4 third batch: HARD interactions between the newest machinery —
    $ref through plain-name anchors, unevaluated* fed by $ref/anchor
    targets, combinator-validity flips, nested unevaluated*, contains+
    minContains alongside unevaluatedItems, and all three anchor
    spellings."""
    cases = []
    D4 = "http://json-schema.org/draft-04/schema#"
    D7 = "http://json-schema.org/draft-07/schema#"

    def add(schema, doc):
        cases.append((schema, doc))

    objs = [{}, {"a": 1}, {"a": 1, "b": 2}, {"a": "s", "b": 2, "c": 3},
            {"b": "x"}, {"a": {"k": 1}}, {"a": 1, "c": [1, 2]},
            {"v": 1, "kids": [{"v": 2}]}, {"v": 1, "extra": 9}]
    arrs = [[], [1], [1, "x"], [1, 2, 3], ["z", 1], [1, "z", 2], [[1], {}]]

    # anchors (3 spellings) + combinators + required
    for _ in range(20):
        spelling = rng.choice(["2020", "d7", "d4"])
        target = rng.choice([
            {"type": "number", "minimum": 2},
            shuffled(rng, {"type": "string", "minLength": 2}),
            {"enum": [1, "a"]}])
        if spelling == "2020":
            defs = {"t": {"$anchor": "tgt", **target}}
            schema = {"$defs": defs, "properties": {"x": {"$ref": "#tgt"}}}
        elif spelling == "d7":
            defs = {"t": {"$id": "#tgt", **target}}
            schema = {"$schema": D7, "definitions": defs,
                      "properties": {"x": {"$ref": "#tgt"}}}
        else:
            defs = {"t": {"id": "#tgt", **target}}
            schema = {"$schema": D4, "definitions": defs,
                      "properties": {"x": {"$ref": "#tgt"}}}
        if rng.random() < 0.4:
            schema["required"] = ["x"]
        add(shuffled(rng, schema),
            rng.choice([{"x": 1}, {"x": 5}, {"x": "ab"}, {"x": "z"}, {}]))

    # unevaluatedProperties fed by $ref / anchor targets
    for _ in range(18):
        via_anchor = rng.random() < 0.5
        base = {"properties": {"a": {}},
                "patternProperties": {"^k": {}}} if rng.random() < 0.4 \
            else {"properties": {"a": {}, "b": {"type": "number"}}}
        if via_anchor:
            schema = {"$defs": {"base": {"$anchor": "base", **base}},
                      "$ref": "#base", "unevaluatedProperties":
                          rng.choice([False, {"type": "number"}])}
        else:
            schema = {"$defs": {"base": base}, "$ref": "#/$defs/base",
                      "unevaluatedProperties":
                          rng.choice([False, {"type": "number"}])}
        add(shuffled(rng, schema),
            rng.choice(objs + [{"k1": 1, "z": "s"}, {"a": 1, "k2": 2, "q": 3}]))

    # combinator-validity flips feeding unevaluated*
    for _ in range(18):
        b1 = shuffled(rng, {"properties": {"a": {"type": "number"}},
                            "required": ["a"]})
        b2 = {"properties": {"b": {}}}
        comb = rng.choice(["allOf", "anyOf", "oneOf"])
        schema = {comb: [b1, b2], "unevaluatedProperties": False}
        add(shuffled(rng, schema),
            rng.choice([{"a": 1}, {"a": "bad"}, {"a": 1, "b": 2},
                        {"a": "bad", "b": 2}, {"b": 2, "c": 3}, {"c": 1}]))

    # nested unevaluated*: inner objects with their own unevaluated rules
    for _ in range(14):
        inner = {"properties": {"v": {}}, "unevaluatedProperties": False}
        schema = {"properties": {"o": shuffled(rng, inner)},
                  "unevaluatedProperties": rng.choice([False, {"type": "array"}])}
        add(shuffled(rng, schema),
            rng.choice([{"o": {"v": 1}}, {"o": {"v": 1, "w": 2}},
                        {"o": {}, "q": [1]}, {"o": {"w": 1}, "q": "s"}]))

    # arrays: contains/minContains/prefixItems vs unevaluatedItems,
    # $ref-supplied prefixes
    for _ in range(18):
        pick = rng.random()
        if pick < 0.3:
            schema = {"contains": {"const": "z"},
                      "minContains": rng.randint(0, 2),
                      "unevaluatedItems": False}
        elif pick < 0.6:
            schema = {"$defs": {"p": {"prefixItems": [{"type": "number"}]}},
                      "$ref": "#/$defs/p", "unevaluatedItems":
                          rng.choice([False, {"type": "string"}])}
        else:
            schema = {"prefixItems": [{"type": "number"}],
                      "contains": {"type": "string"},
                      "unevaluatedItems": False}
        add(shuffled(rng, schema), rng.choice(arrs))

    # recursive anchor tree + unevaluatedProperties at the node level
    for _ in range(8):
        node = {"$anchor": "node", "type": "object",
                "properties": {"v": {"type": "number"},
                               "kids": {"type": "array",
                                        "items": {"$ref": "#node"}}},
                "required": ["v"], "unevaluatedProperties": False}
        schema = {"$defs": {"node": node}, "$ref": "#node"}
        docs = [{"v": 1, "kids": [{"v": 2, "x": 3}]},
                {"v": 1, "extra": 2},
                {"v": 1, "kids": [{"v": 2}, {"kids": []}]},
                {"v": "s", "kids": []}]
        add(schema, rng.choice(docs))

    # deterministic must-covers for each interaction family
    cases += [
        ({"$defs": {"base": {"$anchor": "base", "properties": {"a": {}}}},
          "$ref": "#base", "unevaluatedProperties": False},
         {"a": 1, "b": 2}),
        ({"$defs": {"p": {"prefixItems": [{"type": "number"}]}},
          "$ref": "#/$defs/p", "unevaluatedItems": False}, [1, "x"]),
        ({"oneOf": [{"required": ["a"], "properties": {"a": {}}},
                    {"required": ["b"], "properties": {"b": {}}}],
          "unevaluatedProperties": False}, {"a": 1, "x": 2}),
        ({"properties": {"o": {"properties": {"v": {}},
                               "unevaluatedProperties": False}},
          "unevaluatedProperties": False}, {"o": {"v": 1, "w": 2}, "q": 3}),
        ({"contains": {"const": "z"}, "minContains": 2,
          "unevaluatedItems": False}, ["z", 1]),
        ({"$schema": D7, "definitions": {"t": {"$id": "#tgt", "minimum": 2}},
          "properties": {"x": {"$ref": "#tgt"}}}, {"x": 1}),
        ({"$schema": D4, "definitions": {"t": {"id": "#tgt",
                                               "type": "string"}},
          "properties": {"x": {"$ref": "#tgt"}}}, {"x": 1}),
    ]
    return cases


def gen_cases_48(rng):
    """Round-4 fourth batch: single-document $dynamicRef — dynamic-anchor
    resolution, recursion through $dynamicRef, plain-$anchor fallback (no
    bookending), $ref to a $dynamicAnchor, and interactions with
    combinators/unevaluated*. (Cross-document rebinding needs a registry,
    which this generator's direct-schema path cannot express — pinned by
    hand in JsonSchemaConformanceSpec instead.)"""
    cases = []

    def add(schema, doc):
        cases.append((schema, doc))

    targets = [
        {"type": "number", "minimum": 2},
        {"type": "string"},
        {"enum": [1, "a"]},
        {"type": "object", "required": ["v"]},
    ]
    docs = [1, 5, "a", "zz", {"v": 1}, {"w": 2}, [1], None, 2.5]
    for _ in range(16):
        t = dict(rng.choice(targets))
        anchor_kw = rng.choice(["$dynamicAnchor", "$anchor"])
        ref_kw = rng.choice(["$dynamicRef", "$ref"])
        schema = {"$defs": {"n": {anchor_kw: "node", **t}}, ref_kw: "#node"}
        add(shuffled(rng, schema), rng.choice(docs))

    # recursion through $dynamicRef
    for _ in range(10):
        node = {"$dynamicAnchor": "node", "type": "object",
                "properties": {"v": {"type": "number"},
                               "next": {"$dynamicRef": "#node"}},
                "required": ["v"]}
        schema = {"$defs": {"n": node}, "$dynamicRef": "#node"}
        add(schema, rng.choice([
            {"v": 1}, {"v": 1, "next": {"v": 2}}, {"v": 1, "next": {}},
            {"next": {"v": 2}}, {"v": "s", "next": {"v": 2, "next": 3}}]))

    # $dynamicRef under combinators / with unevaluatedProperties
    for _ in range(12):
        t = dict(rng.choice(targets))
        schema = {"$defs": {"n": {"$dynamicAnchor": "node", **t}},
                  rng.choice(["anyOf", "oneOf", "allOf"]): [
                      {"$dynamicRef": "#node"}, {"type": "array"}]}
        add(shuffled(rng, schema), rng.choice(docs))
    for _ in range(8):
        schema = {"$defs": {"n": {"$dynamicAnchor": "props",
                                  "properties": {"a": {}}}},
                  "$dynamicRef": "#props", "unevaluatedProperties": False}
        add(shuffled(rng, schema),
            rng.choice([{"a": 1}, {"a": 1, "b": 2}, {"b": 2}, {}]))

    cases += [
        ({"$defs": {"n": {"$dynamicAnchor": "node", "type": "number"}},
          "$dynamicRef": "#node"}, "x"),
        ({"$defs": {"n": {"$anchor": "node", "type": "number"}},
          "$dynamicRef": "#node"}, "x"),
        ({"$defs": {"n": {"$dynamicAnchor": "node", "type": "number"}},
          "$ref": "#node"}, "x"),
    ]
    return cases


def main():
    rng = random.Random(43)
    cases = gen_cases(rng)
    if "--batch44" in sys.argv:
        cases = gen_cases_44(random.Random(44))
    if "--batch45" in sys.argv:
        cases = gen_cases_45(random.Random(45))
    if "--batch46" in sys.argv:
        cases = gen_cases_46(random.Random(46))
    if "--batch47" in sys.argv:
        cases = gen_cases_47(random.Random(47))
    if "--batch48" in sys.argv:
        cases = gen_cases_48(random.Random(48))
    lines = []
    n_msgs = 0
    for schema, doc in cases:
        assert_set_order_safe(schema, doc)
        msgs = messages_for(schema, doc)
        n_msgs += len(msgs)
        lines.append(json.dumps(
            {"schema": schema, "doc": doc, "messages": msgs}))
    out = "\n".join(lines) + "\n"
    if "--append" in sys.argv:
        path = "src/test/resources/golden/jsonschema_conformance.jsonl"
        with open(path, "a") as f:
            f.write(out)
        print(f"appended {len(lines)} cases ({n_msgs} messages) to {path}",
              file=sys.stderr)
    else:
        sys.stdout.write(out)
        print(f"{len(lines)} cases, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
