#!/usr/bin/env python3
"""Differential conformance corpus for the DATA-file rules (HepDataRules +
ErrorValuesKernel): seeded-random data-file documents within the HepRow row
model's shapes, expected messages from the live reference DataFileValidator,
rows emitted with exact Scala field names and Python-side raw-token
rendering. Deterministic: seed 46.

Output JSONL: {"file": ..., "row": <HepRow>, "messages": [...]}.
"""
import json
import random
import sys

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402
from hepdata_validator.data_file_validator import DataFileValidator  # noqa: E402


def py_str(v):
    if v is True:
        return "True"
    if v is False:
        return "False"
    return str(v)


def py_repr(v):
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if v is True:
        return "True"
    if v is False:
        return "False"
    if v is None:
        return "None"
    if isinstance(v, list):
        return "[" + ", ".join(py_repr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{py_repr(k)}: {py_repr(x)}"
                               for k, x in v.items()) + "}"
    return repr(v)


def is_scalar(v):
    return isinstance(v, (str, int, float)) and not isinstance(v, bool)


def num_or_none(v):
    # lowNum/highNum = plain Python float() of the raw value — the
    # reference's phase-3 checks parse STRINGS too ('-inf' counts as an
    # infinite edge; unparseable values make float() raise and the value is
    # skipped, which None models)
    if isinstance(v, bool):
        return None  # bools unrepresentable as bin edges; not generated
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def indep_val(m):
    """m: the value mapping dict."""
    has_v = "value" in m
    has_l, has_h = "low" in m, "high" in m
    return {
        "hasValue": has_v,
        "valueRaw": py_str(m["value"]) if has_v else None,
        "valueIsString": isinstance(m.get("value"), str),
        "hasLow": has_l,
        "lowRaw": py_str(m["low"]) if has_l else None,
        "lowIsNum": has_l and is_scalar(m["low"]) and
        not isinstance(m["low"], str),
        "lowNum": num_or_none(m.get("low")),
        "hasHigh": has_h,
        "highRaw": py_str(m["high"]) if has_h else None,
        "highIsNum": has_h and is_scalar(m["high"]) and
        not isinstance(m["high"], str),
        "highNum": num_or_none(m.get("high")),
        "instanceRepr": py_repr(m),
        "extraKeys": sorted(set(m) - {"value", "low", "high"})}


def err_item(e):
    """e: an error mapping dict. Only model-representable shapes allowed."""
    sym = e.get("symerror")
    asym = e.get("asymerror")
    has_sym = "symerror" in e
    has_asym = "asymerror" in e
    sym_bad = has_sym and not is_scalar(sym)
    asym_bad = has_asym and not isinstance(asym, dict)
    out = {
        "hasSym": has_sym,
        "symRaw": (py_str(sym) if has_sym and
                   (is_scalar(sym) or isinstance(sym, bool)) else None),
        "hasAsym": has_asym,
        "plusRaw": None, "minusRaw": None,
        "hasLabel": "label" in e,
        "labelRaw": py_str(e["label"]) if "label" in e else None,
        "labelIsString": isinstance(e.get("label"), str),
        "extraKeys": sorted(set(e) - {"symerror", "asymerror", "label"}),
        "hasPlus": False, "hasMinus": False,
        "asymExtraKeys": [],
        "instanceRepr": py_repr(e),
        "symRepr": py_repr(sym) if sym_bad else None,
        "asymRepr": py_repr(asym) if asym_bad else None,
        "plusRepr": None, "minusRepr": None}
    if has_asym and isinstance(asym, dict):
        out["hasPlus"] = "plus" in asym
        out["hasMinus"] = "minus" in asym
        out["asymExtraKeys"] = sorted(set(asym) - {"plus", "minus"})
        p, mn = asym.get("plus"), asym.get("minus")
        if "plus" in asym:
            out["plusRaw"] = (py_str(p) if is_scalar(p) or
                              isinstance(p, bool) else None)
            out["plusRepr"] = None if is_scalar(p) else py_repr(p)
        if "minus" in asym:
            out["minusRaw"] = (py_str(mn) if is_scalar(mn) or
                               isinstance(mn, bool) else None)
            out["minusRepr"] = None if is_scalar(mn) else py_repr(mn)
    return out


def dep_val(m):
    return {
        "hasValue": "value" in m,
        "valueRaw": py_str(m["value"]) if "value" in m else None,
        "hasErrors": "errors" in m,
        "errors": [err_item(e) for e in m.get("errors", [])],
        "extraKeys": sorted(set(m) - {"value", "errors"})}


def header_detail(v):
    h = v.get("header")
    if h is None or not isinstance(h, dict):
        return {"isObj": h is None or isinstance(h, dict),
                "repr": None if h is None else py_repr(h),
                "hasName": True, "nameRepr": None,
                "hasUnits": False, "unitsRepr": None, "extraKeys": []}
    return {"isObj": True, "repr": None,
            "hasName": "name" in h,
            "nameRepr": None if isinstance(h.get("name"), str) or
            "name" not in h else py_repr(h["name"]),
            "hasUnits": "units" in h,
            "unitsRepr": None if isinstance(h.get("units"), str) or
            "units" not in h else py_repr(h["units"]),
            "extraKeys": sorted(set(h) - {"name", "units"})}


def qualifier_item(q):
    def bad(key, ok_types):
        if key not in q or isinstance(q[key], bool):
            return py_repr(q[key]) if key in q else None
        return None if isinstance(q[key], ok_types) else py_repr(q[key])
    return {"hasName": "name" in q, "nameRepr": bad("name", str),
            "hasValue": "value" in q, "valueRepr": bad("value", (str, int, float)),
            "hasUnits": "units" in q, "unitsRepr": bad("units", str),
            "extraKeys": sorted(set(q) - {"name", "value", "units"})}


def indep_var(v):
    return {
        "headerName": (v.get("header") or {}).get("name", "X")
        if isinstance(v.get("header"), dict) else "X",
        "hasValues": "values" in v,
        "values": [indep_val(x) for x in v.get("values", [])],
        "hasHeader": "header" in v,
        "extraKeys": sorted(set(v) - {"header", "values"}),
        "header": header_detail(v)}


def dep_var(v):
    quals = v.get("qualifiers")
    return {
        "headerName": (v.get("header") or {}).get("name", "Y")
        if isinstance(v.get("header"), dict) else "Y",
        "hasHeader": "header" in v,
        "hasValues": "values" in v,
        "values": [dep_val(x) for x in v.get("values", [])],
        "extraKeys": sorted(set(v) - {"header", "qualifiers", "values"}),
        "header": header_detail(v),
        "hasQualifiers": "qualifiers" in v,
        "qualifiersRepr": None if quals is None or isinstance(quals, list)
        else py_repr(quals),
        "qualifiers": [qualifier_item(q) for q in quals]
        if isinstance(quals, list) else []}


def doc_to_row(name, doc):
    if doc is None:
        return {"file": name, "emptyDoc": True, "hasIndep": False,
                "indep": [], "hasDep": False, "dep": [],
                "indepBadRepr": None, "depBadRepr": None}
    indep = doc.get("independent_variables")
    dep = doc.get("dependent_variables")

    def bad(key, v):
        # present but not a list -> jsonschema type error repr
        return py_repr(v) if key in doc and not isinstance(v, list) else None
    return {
        "file": name, "emptyDoc": False,
        "hasIndep": "independent_variables" in doc,
        "indep": [indep_var(v) for v in indep] if isinstance(indep, list) else [],
        "hasDep": "dependent_variables" in doc,
        "dep": [dep_var(v) for v in dep] if isinstance(dep, list) else [],
        "indepBadRepr": bad("independent_variables", indep),
        "depBadRepr": bad("dependent_variables", dep)}


# ---------------------------------------------------------------- generator

def rand_indep_value(rng):
    r = rng.random()
    if r < 0.35:
        return {"value": rng.choice([7000, "7000", 2.5, "a b", "800 - 1000",
                                     "-5.3--2", "x"])}
    if r < 0.7:
        lo = rng.choice([0.0, 1, "-inf", float("-inf"), "2.0.0"])
        hi = rng.choice([1.0, 2, "inf", float("inf"), "7.0.0"])
        return {"low": lo, "high": hi}
    if r < 0.8:
        return {"low": rng.choice([1, "x"])}  # oneOf fail: low only
    if r < 0.9:
        m = {"value": rng.choice([1, "v"]), "low": 1, "high": 2}
        return m  # oneOf fail: both forms
    m = {"value": 1}
    m["zz"] = 3  # extra key -> oneOf fail
    return m


def rand_error(rng):
    r = rng.random()
    if r < 0.25:
        return {"symerror": rng.choice(
            [0.1, "0.2", "", "5x", "1.2%", 0, "0.0%", True, [1, 2], None])}
    if r < 0.45:
        asym = {}
        if rng.random() > 0.15:
            asym["plus"] = rng.choice([0.1, "", "p!", "0", False, [2]])
        if rng.random() > 0.15:
            asym["minus"] = rng.choice([-0.1, "", "-0", True])
        if rng.random() < 0.1:
            asym["zz"] = 1
        return {"asymerror": asym}
    if r < 0.55:
        return {"asymerror": rng.choice([5, "oops", [1]])}
    if r < 0.7:
        e = {"label": rng.choice(["sys", 123, "stat"])}
        return e  # neither key
    if r < 0.8:
        return {"symerror": 0.1, "asymerror": {"plus": 1, "minus": 1}}
    if r < 0.9:
        return {"symerror": rng.choice([0.3, "0.4%"]),
                "label": rng.choice(["sys", 77])}
    return {"label": "x", "foo": 1}  # neither + extra


def rand_dep_value(rng):
    m = {}
    if rng.random() > 0.1:
        m["value"] = rng.choice([6.7, "6.7", 0])
    if rng.random() > 0.25:
        m["errors"] = [rand_error(rng) for _ in range(rng.randint(0, 3))]
    if rng.random() < 0.08:
        m["extra"] = 1
    return m


def rand_doc(rng):
    # NB: no None docs — the reference's data=None kwarg falls back to
    # opening file_path, so the parses-to-nothing case can't be driven
    # through the data= path (the "No data found" golden covers it)
    r = rng.random()
    doc = {}
    n = rng.randint(1, 3)
    # present-but-not-array variables keys (~1 in 14 docs): the jsonschema
    # type error + the reference's silent phase-2/3 abort
    if rng.random() < 0.07:
        doc["independent_variables"] = rng.choice(
            [None, 5, 2.5, "xx", {"a": 1}])
    if rng.random() < 0.07:
        doc["dependent_variables"] = rng.choice([None, 7, "yy"])
    if "independent_variables" in doc or "dependent_variables" in doc:
        # fill the OTHER key (if absent) from the normal grammar below;
        # the bad key must not be overwritten
        pass
    if r > 0.1 and "independent_variables" not in doc:  # independent_variables present
        ivars = []
        for _ in range(rng.randint(1, 2)):
            v = {}
            if rng.random() > 0.08:
                v["header"] = rand_header(rng, "X")
            if rng.random() > 0.08:
                v["values"] = [rand_indep_value(rng) for _ in range(n)]
            if rng.random() < 0.08:
                v["zz"] = 1
            ivars.append(v)
        doc["independent_variables"] = ivars
    if (r > 0.06 or r < 0.03) and "dependent_variables" not in doc:  # dependent_variables present
        dvars = []
        for _ in range(rng.randint(1, 2)):
            v = {}
            if rng.random() > 0.08:
                v["header"] = rand_header(rng, "Y")
            if rng.random() < 0.25:
                v["qualifiers"] = rand_qualifiers(rng)
            if rng.random() > 0.08:
                nv = n if rng.random() > 0.2 else rng.randint(1, 3)
                v["values"] = [rand_dep_value(rng) for _ in range(nv)]
            if rng.random() < 0.08:
                v["qq"] = 2
            dvars.append(v)
        doc["dependent_variables"] = dvars
    return doc


def rand_header(rng, name):
    r = rng.random()
    if r < 0.7:
        return {"name": name}
    if r < 0.78:
        return {"units": "GEV"}  # missing required name
    if r < 0.84:
        return {"name": 5}  # name type error
    if r < 0.9:
        return {"name": name, "units": 7}  # units type error
    if r < 0.95:
        return {"name": name, "hdr_x": 1}  # extra key
    return rng.choice([5, "hdr", [1]])  # not a mapping


def rand_qualifiers(rng):
    if rng.random() < 0.12:
        return rng.choice([5, "qual"])  # not an array
    out = []
    for _ in range(rng.randint(1, 2)):
        r = rng.random()
        if r < 0.45:
            out.append({"name": "SQRT(S)", "value": rng.choice([7000, "7 TeV"])})
        elif r < 0.6:
            out.append({"value": 1})  # missing name
        elif r < 0.7:
            out.append({"name": "E"})  # missing value
        elif r < 0.8:
            out.append({"name": 3, "value": [1]})  # both type errors
        elif r < 0.9:
            out.append({"name": "E", "value": 1, "units": 9})  # units type
        else:
            out.append({"name": "E", "value": 1, "qz": 2})  # extra key
    return out


def main():
    # optional [n_docs seed] args for one-off FUZZ runs; defaults reproduce
    # the checked-in golden byte-identically
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 46
    rng = random.Random(seed)
    out = []
    n_msgs = 0
    for c in range(n_docs):
        doc = rand_doc(rng)
        name = f"data_{c:04d}.yaml"
        v = DataFileValidator()
        v.validate(file_path=name, data=doc)
        msgs = [m.message for m in v.get_messages().get(name, [])]
        n_msgs += len(msgs)
        # raw YAML for the Scala ingester differential: sort_keys=False so
        # the loaded dict order (hence instanceReprs) matches `doc`
        raw = yaml.safe_dump(doc, sort_keys=False)
        assert yaml.load(raw, Loader=YamlLoader) == doc, name
        out.append(json.dumps({
            "file": name, "row": doc_to_row(name, doc), "messages": msgs,
            "yaml": raw}))
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{n_docs} docs, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
