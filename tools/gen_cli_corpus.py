#!/usr/bin/env python3
"""CLI transcript corpus for `hepdata-validate` parity (graft.Cli --dir /
--file): seeded-random submission directories and single-YAML files run
through the live reference FullSubmissionValidator, with the EXACT
cli.py transcript recorded (header, print_valid_files in SchemaType
order, per-file message blocks, exit code). Deterministic: seed 50.

Normalizations applied to recorded lines (mirrored by the Scala spec):
- the case directory prefix is stripped ("<dir>/x" -> "x") and a bare
  directory mention becomes "<DIR>";
- unreferenced-file message blocks are ordered by file NAME — the
  reference iterates os.listdir, whose order is filesystem-specific
  (ext4 hash order here) and not meaningful.

Output JSONL: {"mode": "dir"|"file", "case": ..., "exit": 0|1,
"lines": [...], "rawFiles": [...] (dir) | "yaml": ... (file),
"gzip": bool}
"""
import gzip as gzip_mod
import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import yaml  # noqa: E402
from hepdata_validator.full_submission_validator import (  # noqa: E402
    FullSubmissionValidator, SchemaType)
import gen_fullsubmission_corpus as gf  # noqa: E402
import gen_singleyaml_corpus as gy  # noqa: E402

REF_TEST_DATA = "/root/reference/testsuite/test_data"


def transcript(v, is_valid, target):
    lines = [f"{target} is valid." if is_valid
             else f"ERROR: {target} is invalid."]
    for type in SchemaType:
        if type in v.valid_files:
            if type == SchemaType.REMOTE:
                for schema, file in v.valid_files[type]:
                    lines.append(f'\t {file} is valid against schema {schema}.')
            else:
                for file in v.valid_files[type]:
                    lines.append(f'\t {file} is valid HEPData {type.value} YAML.')
    keys = list(v.messages.keys())
    sweep = [k for k in keys
             if any(m.message.endswith("is not referenced in the submission.")
                    for m in v.messages[k])]
    ordered = [k for k in keys if k not in sweep] + sorted(sweep)
    for f in ordered:
        for m in v.messages[f]:
            lines.append(f'\t {m.level} - {m.message}')
    return lines


def strip(lines, case_dir):
    return [l.replace(case_dir + "/", "").replace(case_dir, "<DIR>")
            for l in lines]


def dir_case(name, case_dir):
    v = FullSubmissionValidator()
    ok = v.validate(directory=case_dir)
    return {"mode": "dir", "case": name, "exit": 0 if ok else 1,
            "lines": strip(transcript(v, ok, case_dir), case_dir),
            "rawFiles": gf.raw_files_for(case_dir)}


def main():
    rng = random.Random(50)
    root = tempfile.mkdtemp(prefix="graft_cli_")
    cwd = os.getcwd()
    out = []
    try:
        # 40 random directories (the full-submission generator's grammar)
        for c in range(40):
            name = f"dir_{c:03d}"
            case_dir = os.path.join(root, name)
            gf.rand_case(rng, case_dir)
            out.append(dir_case(name, case_dir))

        # the reference repo's own TestHEPSubmission golden directory
        ref_dir = os.path.join(REF_TEST_DATA, "TestHEPSubmission")
        if os.path.isdir(ref_dir):
            v = FullSubmissionValidator()
            ok = v.validate(directory=ref_dir)
            out.append({"mode": "dir", "case": "TestHEPSubmission",
                        "exit": 0 if ok else 1, "refDir": "TestHEPSubmission",
                        "lines": strip(transcript(v, ok, ref_dir), ref_dir)})

        # 20 single-YAML files (the single-yaml generator's grammar),
        # every 5th one gzipped
        for c in range(20):
            case = f"single_{c:03d}.yaml"
            case_dir = os.path.join(root, f"file_{c:03d}")
            os.makedirs(case_dir)
            os.chdir(case_dir)
            stream = gy.rand_case(rng)
            raw = yaml.safe_dump_all(stream)
            use_gz = c % 5 == 4
            target = case + ".gz" if use_gz else case
            if use_gz:
                with gzip_mod.open(target, "wb") as f:
                    f.write(raw.encode("utf-8"))
            else:
                with open(case, "w") as f:
                    f.write(raw)
            v = FullSubmissionValidator()
            ok = v.validate(file=target)
            out.append({"mode": "file", "case": target,
                        "exit": 0 if ok else 1, "gzip": use_gz,
                        "lines": transcript(v, ok, target), "yaml": raw})
            os.chdir(cwd)

        # the reference CLI test's own edge cases
        v = FullSubmissionValidator()
        ok = v.validate(file="notarealfile")
        out.append({"mode": "file", "case": "notarealfile",
                    "exit": 0 if ok else 1, "gzip": False,
                    "lines": transcript(v, ok, "notarealfile"), "yaml": None})
        v = FullSubmissionValidator()
        ok = v.validate(directory="no_such_dir_xyz")
        out.append({"mode": "dir", "case": "no_such_dir_xyz",
                    "exit": 0 if ok else 1, "missing": True,
                    "lines": transcript(v, ok, "no_such_dir_xyz")})
    finally:
        os.chdir(cwd)
        shutil.rmtree(root, ignore_errors=True)
    sys.stdout.write("\n".join(json.dumps(o) for o in out) + "\n")
    print(f"{len(out)} CLI cases", file=sys.stderr)


if __name__ == "__main__":
    main()
