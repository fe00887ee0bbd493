#!/usr/bin/env python3
"""Differential conformance corpus for the FULL-SUBMISSION orchestration
(FullSubmission.validateAll over docs/files/dataViolations tables).

For each case a real temp directory is materialized (submission.yaml +
data files + stray files), the live reference FullSubmissionValidator runs
over it, and the JSONL line carries everything the graft side needs:

  {"file": caseName,
   "sub":   <SubFile row>          (for SubmissionRules short-circuit),
   "docs":  [{docIdx,name,hasDataFile,dataFile,resources}...],
   "files": [{fname,size,parseable,parseError}...],
   "hepRows": [<HepRow>...]        (data files that parse, within size),
   "messages": {strippedFile: [[level, message]...]}}

Row translations reuse gen_submission_corpus / gen_datafile_corpus, so raw
tokens are rendered once, Python-side. Deterministic: seed 47.
"""
import base64
import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402
from hepdata_validator.full_submission_validator import FullSubmissionValidator  # noqa: E402
import gen_submission_corpus as gs  # noqa: E402
import gen_datafile_corpus as gd  # noqa: E402

SIZE_LIMIT = 10485760

# ---- data-file content templates (dict form; HepRow via gd.doc_to_row) ----


def valid_data():
    return {"independent_variables": [
        {"header": {"name": "X"}, "values": [{"value": 7000}, {"value": 8000}]}],
        "dependent_variables": [
        {"header": {"name": "Y"}, "values": [
            {"value": 6.7, "errors": [{"symerror": 0.1}]},
            {"value": 5.7, "errors": [{"symerror": "0.2%"}]}]}]}


def zero_unc_data():
    d = valid_data()
    d["dependent_variables"][0]["values"][1]["errors"] = [{"symerror": 0.0}]
    return d


def oneof_data():
    d = valid_data()
    d["dependent_variables"][0]["values"][0]["errors"] = [{"label": "sys"},
                                                          {"symerror": "x!"}]
    return d


def lengths_data():
    d = valid_data()
    d["independent_variables"][0]["values"] = [{"value": 7000}]
    return d


DATA_TEMPLATES = [valid_data, valid_data, zero_unc_data, oneof_data,
                  lengths_data]


def table_doc(name, data_file, resources=None):
    doc = {"name": name, "description": "d",
           "keywords": [{"name": "reactions", "values": ["P P --> X"]}],
           "data_file": data_file}
    if resources is not None:
        doc["additional_resources"] = [
            {"location": loc, "description": "r"} for loc in resources]
    return doc


def rand_case(rng, case_dir):
    """Build a submission dir; returns (docs_stream, dataFileContents)."""
    stream = []
    data_contents = {}  # fname -> ("doc", dict) | ("raw", bytes)
    stray = []
    if rng.random() < 0.3:
        stream.append({"additional_resources": [
            {"location": "http://example.org/info", "description": "l"}]}
            if rng.random() < 0.4 else {})
    n_tables = rng.randint(1, 3)
    for t in range(1, n_tables + 1):
        f = f"data{t}.yaml"
        resources = None
        r = rng.random()
        if r < 0.15:
            resources = ["analysis.py"]  # exists
            stray.append(("analysis.py", b"print(1)\n"))
        elif r < 0.25:
            resources = ["missing.txt"]  # missing resource
        elif r < 0.32:
            resources = ["sub/res.txt"]  # '/' in location
        name = f"Table {t}"
        if rng.random() < 0.08:
            name = "Table 1"  # duplicate name -> short-circuit
        df_name = f
        r2 = rng.random()
        if r2 < 0.06:
            df_name = f"dir/{f}"  # '/' in data_file
        stream.append(table_doc(name, df_name, resources))
        if r2 < 0.06:
            continue  # slash doc: no file written, no further checks
        r3 = rng.random()
        if r3 < 0.12:
            pass  # missing data file
        elif r3 < 0.2:
            data_contents[f] = ("raw", b"a: b:\n - ]\n")  # unparseable
        elif r3 < 0.26:
            data_contents[f] = ("raw", b"")  # parses to None -> "No data"
        elif r3 < 0.3:
            data_contents[f] = ("big", None)  # over the 10 MB cap
        else:
            data_contents[f] = ("doc", rng.choice(DATA_TEMPLATES)())
    if rng.random() < 0.25:
        stray.append(("notes.txt", b"hello\n"))  # unreferenced
    if rng.random() < 0.15:
        stray.append(("._data1.yaml", b"\x00junk"))  # MacOS companion
    if rng.random() < 0.06 and stream:
        # invalid submission metadata -> short-circuit
        stream[-1].pop("keywords", None)

    # ---- materialize the directory
    os.makedirs(case_dir)
    with open(os.path.join(case_dir, "submission.yaml"), "w") as f:
        yaml.safe_dump_all(stream, f)
    for fname, (kind, payload) in data_contents.items():
        p = os.path.join(case_dir, fname)
        if kind == "doc":
            with open(p, "w") as fh:
                yaml.safe_dump(payload, fh)
        elif kind == "big":
            with open(p, "wb") as fh:
                fh.seek(SIZE_LIMIT + 5)
                fh.write(b"x")
        else:
            with open(p, "wb") as fh:
                fh.write(payload)
    for fname, payload in stray:
        with open(os.path.join(case_dir, fname), "wb") as fh:
            fh.write(payload)
    return stream


def raw_files_for(case_dir):
    """Embed each materialized file for the Scala raw-ingestion replay:
    text when UTF-8+JSON-safe, else base64; the >10MB sparse file as a
    size-only descriptor."""
    out = []
    for fname in sorted(os.listdir(case_dir)):
        p = os.path.join(case_dir, fname)
        size = os.path.getsize(p)
        if size > SIZE_LIMIT:
            out.append({"fname": fname, "kind": "big", "data": str(size)})
            continue
        with open(p, "rb") as fh:
            b = fh.read()
        try:
            t = b.decode("utf-8")
            out.append({"fname": fname, "kind": "text", "data": t})
        except UnicodeDecodeError:
            out.append({"fname": fname, "kind": "b64",
                        "data": base64.b64encode(b).decode("ascii")})
    return out


def tables_for(case_dir, stream):
    """docs/files/hepRows tables for the graft side."""
    docs = []
    for d, doc in enumerate(stream):
        if doc is None or (d == 0 and "data_file" not in doc):
            continue
        res = [r["location"] for r in doc.get("additional_resources", [])]
        docs.append({"docIdx": d, "name": doc.get("name"),
                     "hasDataFile": "data_file" in doc,
                     "dataFile": doc.get("data_file"), "resources": res})
    files = []
    hep_rows = []
    for fname in sorted(os.listdir(case_dir)):
        p = os.path.join(case_dir, fname)
        size = os.path.getsize(p)
        parseable, perr = True, None
        if fname != "submission.yaml" and size <= SIZE_LIMIT:
            try:
                # the reference's YamlLoader (CSafeLoader when available):
                # its error strings differ from the pure-Python loader's
                with open(p, "r") as fh:
                    contents = yaml.load(fh, Loader=YamlLoader)
                if contents is None:
                    hep_rows.append(gd.doc_to_row(fname, None))
                elif isinstance(contents, dict) and (
                        "independent_variables" in contents or
                        "dependent_variables" in contents):
                    hep_rows.append(gd.doc_to_row(fname, contents))
            except (UnicodeDecodeError, yaml.YAMLError) as e:
                parseable = False
                # strip the temp dir like the recorded messages do (the
                # yaml error embeds the opened path)
                perr = (str(e).replace("\n", "\n\t\t")
                        .replace(case_dir + "/", ""))
        files.append({"fname": fname, "size": size,
                      "parseable": parseable, "parseError": perr})
    return docs, files, hep_rows


def main():
    # optional [n_cases seed] args for one-off FUZZ runs; defaults
    # reproduce the checked-in golden byte-identically
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 47
    rng = random.Random(seed)
    root = tempfile.mkdtemp(prefix="graft_fullsub_")
    out = []
    n_msgs = 0
    try:
        for c in range(n_cases):
            case = f"case_{c:03d}"
            case_dir = os.path.join(root, case)
            stream = rand_case(rng, case_dir)
            v = FullSubmissionValidator()
            v.validate(directory=case_dir)
            msgs = {}
            for fpath, ms in v.get_messages().items():
                key = fpath.replace(case_dir + "/", "")
                msgs[key] = [[m.level, m.message.replace(case_dir + "/", "")]
                             for m in ms]
                n_msgs += len(ms)
            docs, files, hep_rows = tables_for(case_dir, stream)
            sub_rows = [gs.doc_to_row(d) for d in stream]
            out.append(json.dumps({
                "file": case, "sub": {"file": "submission.yaml",
                                      "docs": sub_rows},
                "docs": docs, "files": files, "hepRows": hep_rows,
                "messages": msgs, "rawFiles": raw_files_for(case_dir)}))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{n_cases} cases, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
