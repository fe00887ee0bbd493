#!/usr/bin/env python3
"""Differential corpus for PyYamlParse's scalar resolution/construction:
each case is one plain YAML scalar token; expected = what the reference's
YamlLoader (CSafeLoader) constructs, rendered as (kind, str, repr).
Curated quirk list + seeded-random tokens from a resolver-shaped grammar.
Deterministic: seed 49.

Output JSONL: {"token": ..., "kind": ..., "str": ..., "repr": ...}
kind in {null, bool, int, float, str, date, datetime, ERR}; for ERR,
"str" carries str(e) of the construction-time exception.
"""
import json
import random
import string
import sys

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402

CURATED = [
    "6000", "0.443", "-.inf", ".inf", "+.INF", ".NaN", ".nan", "1.0e2",
    "1e2", "1.0e+2", "12e03", "1.e2", "0x1A", "010", "09", "1_000",
    "1__0.5", "1:30", "1:30.5", ".5", ".5e+1", "~", "null", "Null", "NULL",
    "yes", "Yes", "YES", "no", "No", "NO", "on", "On", "ON", "off", "Off",
    "OFF", "true", "True", "TRUE", "false", "False", "FALSE", "y", "Y",
    "n", "N", "2.0.0", "-inf", "inf", "nan", "2021-01-02",
    "2021-1-2 3:04:05", "2021-01-02 03:04:05", "2021-01-02T03:04:05.5Z",
    "2021-01-02T03:04:05+05:30", "2021-01-02 03:04:05.123456789-07:00",
    "2001-12-14 21:59:43.10 -5", "-0", "+12", "0", "-0.0", "+1.5", "-.5",
    ".", "..", "1.", "0b101", "-0x_F", "0o17", "60:30:10", "-1:30",
    "685.230_15e+03", "0_", "0x_", "---x", "0.5.", "1_2:3_0", "1:99",
    "1:60", "0.0", "-0", "100.", "1e+2", "+.5", "0b_", "0b2", "08", "0_0",
    "9:00", "10:0", "1:0_0", "2021-13-02", "2021-00-00",
    "0.1", "0.2", "5x", "1.2%", "0.0%", "800 - 1000", "-5.3--2", "7000",
    "2.300e-003f", "2.5", "13TeV", "-1.5", "7 TeV", "P P --> X",
    "1e-05", "1.5e16", "123456789012345678901234567890", "0.30000000000000004",
    # fuzz-caught (seed 71): the leading-dot float form requires a digit
    # after the dot — these are strings
    "._00", "._19", "._5e+1", ".0_1",
]

TOK_PARTS = ["0", "1", "9", "00", "07", "08", "19", "_", ".", "-", "+", ":",
             "e", "E", "x", "b", "o", "inf", "Inf", "nan", "NaN", "5", "30",
             "59", "60", "99", "2021", "01", "02"]


def rand_token(rng):
    n = rng.randint(1, 6)
    return "".join(rng.choice(TOK_PARTS) for _ in range(n))


def classify(v):
    if v is None:
        return "null"
    if v is True or v is False:
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "str"
    import datetime
    if isinstance(v, datetime.datetime):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    return type(v).__name__


def case(token):
    # Block-scalar carrier keeps the token byte-exact as a plain scalar
    doc = "k: " + token + "\n"
    try:
        loaded = yaml.load(doc, Loader=YamlLoader)
    except Exception as e:
        return {"token": token, "kind": "ERR", "str": str(e), "repr": None}
    if not isinstance(loaded, dict) or list(loaded) != ["k"]:
        return None  # token broke the carrier shape; skip
    v = loaded["k"]
    return {"token": token, "kind": classify(v), "str": str(v),
            "repr": repr(v)}


def main():
    n_rand = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 49
    rng = random.Random(seed)
    seen = set()
    out = []
    for tok in CURATED:
        if tok in seen:
            continue
        seen.add(tok)
        c = case(tok)
        if c:
            out.append(json.dumps(c))
    made = 0
    while made < n_rand:
        tok = rand_token(rng)
        if tok in seen:
            continue
        seen.add(tok)
        # keep tokens that stay plain scalars in the carrier
        if any(ch in tok for ch in "#&*!|>%@`\"'{}[],"):
            continue
        c = case(tok)
        if c is None:
            continue
        out.append(json.dumps(c))
        made += 1
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{len(out)} scalar cases", file=sys.stderr)


if __name__ == "__main__":
    main()
