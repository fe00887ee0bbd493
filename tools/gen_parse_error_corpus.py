#!/usr/bin/env python3
"""Differential corpus for PyYamlParse's parse-ERROR rendering: curated
malformed (and near-malformed) YAML documents, expected behavior from the
reference's YamlLoader (CSafeLoader): either the loaded value's repr or
str(e) of the raised exception — the exact text the reference embeds in
"There was a problem parsing the file" messages.

Output JSONL: {"name": ..., "yaml": ..., "ok": bool, "out": repr|str(e)}
"""
import json
import sys

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402

CASES = [
    ("map-in-context", "a: b:\n - ]\n"),
    ("map-in-context2", "independent_variables: x: y\n"),
    ("flow-unclosed", "a: [1, 2\n"),
    ("flow-unclosed-map", "a: {x: 1\n"),
    ("control-char", "\x00junk"),
    ("control-char-mid", "a: b\nc: d\x07e\n"),
    ("unclosed-squote", "key: 'unclosed\n"),
    ("unclosed-dquote", 'key: "unclosed\n'),
    ("seq-then-map", "- a\nb: c\n"),
    ("py-tag", "!!python/object: x\n"),
    ("app-tag", "a: !myapp/thing 5\n"),
    ("at-char", "a: @bad\n"),
    ("backtick", "a: `cmd`\n"),
    ("value-tag", "a: =\n"),
    ("merge-val", "a: <<\n"),
    ("undef-alias", "*undefined\n"),
    ("undef-alias-val", "a: *nope\n"),
    ("tab-indent", "a: x\n\tb: y\n"),
    ("tab-in-plain", "a: x\ty\n"),
    ("literal-bad", "a: |\n bad\nindent\n"),
    ("colon-in-flow", "[a: b, c: d]\n"),
    ("bad-directive", "%YAML 9.9\n---\na: 1\n"),
    ("dup-directive", "%YAML 1.1\n%YAML 1.1\n---\na: 1\n"),
    ("doc-after-scalar", "word\nanother: x\n"),
    ("bad-hex-int", "a: 0x_\n"),
    ("bad-anchor", "a: &an&chor 1\n"),
    ("seq-bad-entry", "- 1\n-bad\n- 2\n"),
    ("flow-extra-comma", "a: [1,,2]\n"),
    ("mapping-no-space", "a:b\n"),
    ("deep-flow", "a: " + "[" * 60 + "1" + "]" * 60 + "\n"),
    ("empty", ""),
    ("only-comment", "# nothing\n"),
    ("doc-sep-only", "---\n"),
    ("two-docs-load", "a: 1\n---\nb: 2\n"),
    ("indent-jump", "a:\n- 1\n - 2\n"),
    ("dedent-scalar", "a:\n  x\n y\n"),
    ("question-key", "? complex\n: value\n"),
    ("colon-eol", "a:\n"),
    ("star-only", "a: *\n"),
    ("amp-only", "a: &\n"),
    ("percent-mid", "a: 50%\n"),
    ("bang-only", "a: !\n"),
    ("reserved-directive", "%FOO bar\n---\na: 1\n"),
    ("tag-directive", "%TAG !e! tag:example.com,2000:\n---\na: !e!thing 1\n"),
    ("block-scalar-indent", "a: |2\n  x\n y\n"),
    ("folded-ok", "a: >\n  folded\n  text\n"),
    ("anchor-alias-roundtrip", "a: &x [1, 2]\nb: *x\n"),
    ("doc-end-then-more", "a: 1\n...\nb: 2\n"),
    ("second-doc-directive", "a: 1\n...\n%YAML 1.1\n---\nb: 2\n"),
    ("second-doc-bad-directive", "a: 1\n...\n%NOPE x\n---\nb: 2\n"),
    ("explicit-doc-empty-key", "? \n: v\n"),
    ("flow-map-missing-colon", "a: {x 1}\n"),
    ("seq-in-map-value", "a: - 1\n"),
    ("dquote-bad-escape", "a: \"x\\q\"\n"),
    ("dquote-unicode-escape", "a: \"\\u00e9\"\n"),
    ("colon-no-space-flow", "{a:1}\n"),
    ("nested-flow-in-block-key", "{a: 1}: v\n"),
    ("sexagesimal-key", "1:30: v\n"),
    ("bom-start", "\ufeffa: 1\n"),
    ("high-unicode", "a: \u00e9\u4e2d\n"),
    # review-sweep round 5: error-position arbitration + constructor errors
    ("early-error-then-directive", "key: : value\n...\n%FOO x\n"),
    ("mid-doc-directive", "a: 1\n%FOO x\n"),
    ("merge-bad-scalar", "a: 1\n<<: 5\n"),
    ("merge-bad-list-item", "<<: [{a: 1}, 2]\na: 3\n"),
    ("merge-ok", "a: &A {x: 1}\nb:\n  <<: *A\n  y: 2\n"),
    ("merge-list-ok", "a: &A {x: 1}\nc: &C {z: 9, x: 7}\nb:\n  <<: [*A, *C]\n  y: 2\n"),
    ("tz-offset-range", "k: 2020-01-01 00:00:00 +25\n"),
    ("tz-offset-neg-range", "k: 2020-01-01 00:00:00 -25:30\n"),
    ("nan-dup-keys", "{.nan: 1, .nan: 2}\n"),
    ("float-key-aliasing", "{1: a, 1.0: b, !!bool true: c}\n"),
]


def main():
    out = []
    for name, text in CASES:
        try:
            v = yaml.load(text, Loader=YamlLoader)
            out.append(json.dumps(
                {"name": name, "yaml": text, "ok": True, "out": repr(v)}))
        except Exception as e:
            out.append(json.dumps(
                {"name": name, "yaml": text, "ok": False, "out": str(e)}))
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{len(out)} parse cases", file=sys.stderr)


if __name__ == "__main__":
    main()
