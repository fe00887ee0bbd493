#!/usr/bin/env python3
"""Freeze a deterministic Verify query output into a golden-VALUES oracle.

Usage: pin_values_oracle.py <verify_out_dir> <query_name> <order_by_cols>

Reads <verify_out_dir>/<query_name>/*.parquet and prints a DuckDB SELECT
over a typed VALUES list reproducing it, ordered by <order_by_cols>
(comma-separated). Used for queries whose COMPUTATION is genuinely not
SQL-expressible (LSH/IVF candidate generation, SimHash signatures, KLL
drift sketches) but whose output on the fixed seeded test data is a
deterministic constant: the semantic correctness is anchored by ScalaTest
(recall-vs-exact, planted-pair, drift-injection tests) and the pinned
VALUES make any regression visible to the driver's oracle gate.
"""
import sys

import duckdb

SQL_TYPES = {"int64": "BIGINT", "int32": "INT", "float64": "DOUBLE",
             "bool": "BOOLEAN", "object": "VARCHAR"}


def lit(v, dtype):
    if dtype == "object":
        return "'" + str(v).replace("'", "''") + "'"
    if dtype == "bool":
        return "true" if v else "false"
    if dtype == "float64":
        # via a string literal: a bare decimal literal is typed DECIMAL
        # first and the cast to DOUBLE can land 1 ulp off; strtod on the
        # shortest round-trip repr is exact
        return "'" + repr(float(v)) + "'"
    return str(v)


def main():
    out_dir, name, order_by = sys.argv[1], sys.argv[2], sys.argv[3]
    df = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    df = df.sort_values(order_by.split(",")).reset_index(drop=True)
    cols = list(df.columns)
    dtypes = [str(df[c].dtype) for c in cols]
    rows = []
    for _, r in df.iterrows():
        vals = []
        for c, dt in zip(cols, dtypes):
            t = SQL_TYPES[dt]
            v = lit(r[c], dt)
            # bare decimal literals parse as DECIMAL in DuckDB — always cast
            vals.append(v if t in ("BOOLEAN", "VARCHAR")
                        else f"CAST({v} AS {t})")
        rows.append("(" + ", ".join(vals) + ")")
    collist = ", ".join(f'"{c}"' for c in cols)
    orderlist = ", ".join(f'"{c}"' for c in order_by.split(","))
    print("SELECT * FROM (VALUES " + ", ".join(rows) +
          f") AS t({collist}) ORDER BY {orderlist}")


if __name__ == "__main__":
    main()
