#!/usr/bin/env python3
"""Differential conformance corpus for SubmissionRules.

Generates seeded-random submission.yaml doc streams WITHIN the shapes the
SubFile/SubDoc row model can carry, runs the REFERENCE
SubmissionFileValidator over each stream, and emits JSONL lines

    {"file": ..., "docs": [<SubDoc-shaped row>...], "messages": [...]}

The row objects use the exact Scala field names, and every raw-token
rendering (Python str of numbers, etc.) is computed HERE — the Scala spec
just deserializes and replays, so a mismatch is a semantics bug, not a
translation bug. Deterministic: seed 45.
"""
import json
import random
import sys

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402
from hepdata_validator.submission_file_validator import SubmissionFileValidator  # noqa: E402

NO_LIC = {"present": False, "isNull": False, "value": None, "isString": True}


def lic_field(v, present):
    if not present:
        return NO_LIC
    if v is None:
        return {"present": True, "isNull": True, "value": None, "isString": True}
    return {"present": True, "isNull": False, "value": str(v),
            "isString": isinstance(v, str)}


def rel_item(v):
    if isinstance(v, str):
        return {"raw": v, "isString": True, "isInt": False, "num": None}
    if isinstance(v, bool):  # avoid: bools unrepresentable
        raise ValueError
    if isinstance(v, int):
        return {"raw": str(v), "isString": False, "isInt": True, "num": float(v)}
    return {"raw": str(v), "isString": False,
            "isInt": float(v).is_integer(), "num": float(v)}


def kw_val(v):
    return {"raw": str(v), "isString": isinstance(v, str)}


def doc_to_row(doc):
    """Translate a YAML-shaped doc (or None) into a SubDoc row."""
    if doc is None:
        return {"isEmpty": True, "hasName": False, "nameRaw": None,
                "nameIsString": False, "hasDescription": False,
                "hasKeywords": False, "keywords": [], "hasDataFile": False,
                "dataFileRaw": None, "dataFileIsString": False,
                "hasLicense": False, "licName": NO_LIC, "licUrl": NO_LIC,
                "licDesc": NO_LIC, "hasDois": False, "dois": [],
                "hasRecids": False, "recids": [], "extraKeys": [],
                "licExtraKeys": []}
    known = {"name", "description", "keywords", "data_file", "data_license",
             "related_to_table_dois", "related_to_hepdata_records",
             "additional_resources", "location"}
    kws = []
    for k in doc.get("keywords", []):
        kws.append({
            "hasName": "name" in k, "name": k.get("name"),
            "hasValues": "values" in k,
            "values": [kw_val(v) for v in k.get("values", [])],
            "extraKeys": sorted(set(k) - {"name", "values"})})
    licd = doc.get("data_license")
    has_lic = licd is not None
    return {
        "isEmpty": False,
        "hasName": "name" in doc,
        "nameRaw": str(doc["name"]) if "name" in doc else None,
        "nameIsString": isinstance(doc.get("name"), str),
        "hasDescription": "description" in doc,
        "hasKeywords": "keywords" in doc,
        "keywords": kws,
        "hasDataFile": "data_file" in doc,
        "dataFileRaw": str(doc["data_file"]) if "data_file" in doc else None,
        "dataFileIsString": isinstance(doc.get("data_file"), str),
        "hasLicense": has_lic,
        "licName": lic_field(licd.get("name") if has_lic else None,
                             has_lic and "name" in licd),
        "licUrl": lic_field(licd.get("url") if has_lic else None,
                            has_lic and "url" in licd),
        "licDesc": lic_field(licd.get("description") if has_lic else None,
                             has_lic and "description" in licd),
        "hasDois": "related_to_table_dois" in doc,
        "dois": [rel_item(v) for v in doc.get("related_to_table_dois", [])],
        "hasRecids": "related_to_hepdata_records" in doc,
        "recids": [rel_item(v)
                   for v in doc.get("related_to_hepdata_records", [])],
        "extraKeys": sorted(set(doc) - known),
        "licExtraKeys": sorted(set(licd) - {"name", "url", "description"})
        if has_lic else []}


def rand_keyword(rng):
    name = rng.choice(["cmenergies", "observables", "reactions", "phrases",
                       "energies", "cmenergies", "reactions"])
    k = {}
    if rng.random() > 0.08:
        k["name"] = name
    if rng.random() > 0.08:
        if name == "cmenergies":
            vals = rng.choice([
                [7000], [7000, 8000], ["1.7-4.7"], ["1.7-4.7", 2.5],
                ["abc"], [2.5], ["13TeV"], [""], ["7000"], ["-1.5"]])
        else:
            vals = rng.choice([
                ["P P --> X"], ["SIG"], ["x" * 140], [5, "y"], [2.5],
                ["a", "b", "c"]])
        k["values"] = list(vals)
    if rng.random() < 0.1:
        k["zz"] = 1
    return k


def rand_table_doc(rng, names, files):
    doc = {}
    r = rng.random()
    if r > 0.1:
        doc["name"] = rng.choice(
            [rng.choice(names), "n" * 70, 42, rng.choice(names)])
    if rng.random() > 0.1:
        doc["description"] = "d"
    if rng.random() > 0.15:
        doc["keywords"] = [rand_keyword(rng)
                           for _ in range(rng.randint(0, 3))]
    if rng.random() > 0.1:
        doc["data_file"] = rng.choice([rng.choice(files), 7, rng.choice(files)])
    if rng.random() < 0.3:
        lic = {}
        for f, pool in [("name", ["CC0", None, "x" * 300, 5]),
                        ("url", ["http://l", None, "u" * 280]),
                        ("description", ["ok", None])]:
            if rng.random() > 0.3:
                lic[f] = rng.choice(pool)
        if rng.random() < 0.15:
            lic["extra"] = 1
        doc["data_license"] = lic
    if rng.random() < 0.25:
        doc["related_to_table_dois"] = [
            rng.choice(["10.17182/hepdata.12345.v1/t2", "bad-doi",
                        "10.17182/hepdata.1.v1/t1", 7, "d" * 140])
            for _ in range(rng.randint(1, 3))]
    if rng.random() < 0.12:
        doc["extra_key"] = 1
    return doc


def rand_stream(rng):
    names = ["Table 1", "Table 2", "Table 3"]
    files = ["t1.yaml", "t2.yaml", "t3.yaml"]
    docs = []
    if rng.random() < 0.25:  # additional-info doc first
        ai = {"description": "info"} if rng.random() < 0.5 else {}
        if rng.random() < 0.6:
            ai["related_to_hepdata_records"] = [
                rng.choice([1, 17, 0, -3, 2.5, "r1", 17])
                for _ in range(rng.randint(1, 3))]
        docs.append(ai)
    n = rng.randint(0, 3)
    for _ in range(n):
        if rng.random() < 0.1:
            docs.append(None)
        else:
            docs.append(rand_table_doc(rng, names, files))
    return docs


def main():
    # optional [n_streams seed] args for one-off FUZZ runs; defaults
    # reproduce the checked-in golden byte-identically
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    rng = random.Random(seed)
    out = []
    n_msgs = 0
    for c in range(n_streams):
        docs = rand_stream(rng)
        name = f"sub_{c:04d}.yaml"
        v = SubmissionFileValidator()
        v.validate(file_path=name, data=iter(docs))
        msgs = [m.message for m in v.get_messages().get(name, [])]
        n_msgs += len(msgs)
        raw = yaml.safe_dump_all(docs, sort_keys=False)
        assert list(yaml.load_all(raw, Loader=YamlLoader)) == docs, name
        out.append(json.dumps({
            "file": name,
            "docs": [doc_to_row(d) for d in docs],
            "messages": msgs,
            "yaml": raw}))
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{n_streams} streams, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
