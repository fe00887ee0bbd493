#!/usr/bin/env python3
"""Differential conformance corpus for SINGLE-YAML submissions
(FullSubmission.validateSingleYaml): one combined stream carries the
submission header plus table docs with INLINE data; the reference
physically splits them into derived data files, validates, and attributes
failures to the submission path with a " (<table>)" suffix.

Each case writes the combined file into a temp cwd, runs the live
reference FullSubmissionValidator(file=...), and emits the translated
tables. The reference MUTATES the stream docs (_create_data_files pops
independent/dependent_variables and adds the derived data_file), so the
SubFile translation happens AFTER validate — exactly what its
SubmissionFileValidator saw — while the HepRows are captured before.
Deterministic: seed 48.
"""
import copy
import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import yaml  # noqa: E402
from hepdata_validator.full_submission_validator import FullSubmissionValidator  # noqa: E402
import gen_submission_corpus as gs  # noqa: E402
import gen_datafile_corpus as gd  # noqa: E402
import gen_fullsubmission_corpus as gf  # noqa: E402


def derived_name(table_name):
    return table_name.replace(" ", "_").replace("/", "-") + ".yaml"


def rand_case(rng):
    stream = [{"additional_resources": [
        {"location": "http://example.org/x", "description": "l"}]}
        if rng.random() < 0.3 else {}]
    n = rng.randint(1, 3)
    used = []  # LIST, not set: next(iter(set)) was PYTHONHASHSEED-dependent
    for t in range(1, n + 1):
        name = rng.choice([f"Table {t}", f"a/b {t}", f"T{t}"])
        if rng.random() < 0.05 and used:
            name = used[0]  # duplicate -> short-circuit (deterministic pick)
        if name not in used:
            used.append(name)
        doc = {"name": name, "description": "d",
               "keywords": [{"name": "reactions", "values": ["P P --> X"]}]}
        if rng.random() < 0.06:
            doc.pop("keywords")  # invalid metadata -> short-circuit
        data = rng.choice(gf.DATA_TEMPLATES)()
        doc.update(copy.deepcopy(data))
        stream.append(doc)
    return stream


def main():
    rng = random.Random(48)
    root = tempfile.mkdtemp(prefix="graft_singleyaml_")
    cwd = os.getcwd()
    out = []
    n_msgs = 0
    try:
        for c in range(80):
            case = f"single_{c:03d}.yaml"
            case_dir = os.path.join(root, f"case_{c:03d}")
            os.makedirs(case_dir)
            os.chdir(case_dir)
            stream = rand_case(rng)
            raw = yaml.safe_dump_all(stream)
            with open(case, "w") as f:
                f.write(raw)
            # capture inline data BEFORE the reference pops it; the
            # derived file carries BOTH keys (None when absent), exactly
            # like _create_data_files' doc.pop(key, None) writes
            hep_rows = []
            for doc in stream:
                if "name" in doc:
                    hep_rows.append(gd.doc_to_row(
                        derived_name(doc["name"]),
                        {k: copy.deepcopy(doc.get(k))
                         for k in ("independent_variables",
                                   "dependent_variables")}))
            v = FullSubmissionValidator()
            v.validate(file=case)
            msgs = {}
            for fpath, ms in v.get_messages().items():
                msgs[fpath] = [[m.level, m.message] for m in ms]
                n_msgs += len(ms)
            # replicate _create_data_files' mutation (the reference loads
            # its own doc copies from the file, so our stream is pristine):
            # derived data_file added, inline data popped — the state its
            # SubmissionFileValidator saw
            for doc in stream:
                if "name" in doc:
                    doc["data_file"] = derived_name(doc["name"])
                    doc.pop("independent_variables", None)
                    doc.pop("dependent_variables", None)
            sub_rows = [gs.doc_to_row(d) for d in stream]
            docs = [{"docIdx": i, "name": d.get("name"),
                     "resources": [r["location"] for r in
                                   d.get("additional_resources", [])]}
                    for i, d in enumerate(stream)]
            out.append(json.dumps({
                "file": case,
                "sub": {"file": case, "docs": sub_rows},
                "docs": docs, "hepRows": hep_rows, "messages": msgs,
                "yaml": raw}))
            os.chdir(cwd)
    finally:
        os.chdir(cwd)
        shutil.rmtree(root, ignore_errors=True)
    sys.stdout.write("\n".join(out) + "\n")
    print(f"80 cases, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
