#!/usr/bin/env python3
"""Golden messages for the raw-YAML driver fixtures: run the live
reference DataFileValidator over the EXACT bytes in
src/main/resources/rawyaml/ (the same resources graft's
`raw_yaml_violations` query ingests) and record every message.

Output JSONL: {"file": ..., "messages": [...]}
"""
import json
import os
import sys

sys.path.insert(0, "/root/reference")
import yaml  # noqa: E402
from hepdata_validator import YamlLoader  # noqa: E402
from hepdata_validator.data_file_validator import DataFileValidator  # noqa: E402

RES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "src", "main", "resources", "rawyaml")

NAMES = ["raw_valid.yaml", "raw_zero_unc.yaml", "raw_oneof.yaml",
         "raw_badtypes.yaml", "raw_inf_bins.yaml", "raw_lengths.yaml",
         "raw_extras.yaml", "raw_scalar_quirks.yaml",
         "raw_missing_parts.yaml", "raw_bad_arrays.yaml", "raw_empty.yaml"]


def main():
    out = []
    n_msgs = 0
    for name in NAMES:
        path = os.path.join(RES, name)
        v = DataFileValidator()
        # file_path drives the reference's own open+yaml.load (the "No
        # data found in file." path included), exactly like a real run
        v.validate(file_path=path)
        msgs = [m.message for m in v.get_messages().get(path, [])]
        n_msgs += len(msgs)
        out.append(json.dumps({"file": name, "messages": msgs}))
    sys.stdout.write("\n".join(out) + "\n")
    print(f"{len(NAMES)} files, {n_msgs} messages", file=sys.stderr)


if __name__ == "__main__":
    main()
