#!/usr/bin/env python3
"""Dev-only harness approximating the driver's correctness gate.

Runs each oracle SQL from oracle_sql.json in DuckDB against the same
parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name and rows by all columns, then compares values.

Usage: python3 scripts/local_verify.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)

This script is tooling for the build loop only — the shipped library has
no DuckDB dependency.
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def frame(con, rel):
    # Check the DuckDB-level types BEFORE fetchdf: fetchdf converts
    # DECIMAL to float64, so decimal columns render identically on both
    # sides HERE but NOT in the driver, which reads the Spark parquet
    # directly and renders decimal128 cells differently (the r6
    # divergence: 4 hash-fails invisible to this gate). Refuse them.
    for c, t in zip(rel.columns, rel.types):
        if "DECIMAL" in str(t).upper():
            raise TypeError(
                f"column {c!r} is decimal-typed ({t}) — the driver renders "
                "decimal128 differently; cast to DOUBLE at the output "
                "boundary (SURVEY §5)")
    df = rel.fetchdf()
    df = df[sorted(df.columns)]
    # The driver's comparator sorts RAW columns (pandas sort_values), which
    # crashes on array cells ("unhashable type: numpy.ndarray"). Refuse them
    # here too, so this local gate can never pass what the driver rejects
    # (the r4 divergence: str() used to hide array columns).
    for c in df.columns:
        non_null = df[c].dropna()
        if len(non_null):
            v0 = non_null.iloc[0]
            if isinstance(v0, (list, tuple, dict)) or \
                    type(v0).__name__ == "ndarray":
                raise TypeError(
                    f"column {c!r} is array-typed — driver-incomparable; "
                    "emit concat_ws/scalar columns instead")
    rows = [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]
    rows.sort()
    return list(df.columns), [str(t) for t in df.dtypes], rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver SFs are flat files; locally-generated probe SFs
        # (graft.GenTestData) are Spark output directories
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional subsetting for big probe SFs where some oracles (the dedup
    # WITH-chains) dominate wall time: --only a,b / --skip c,d.
    # Names are validated against the oracle keys: a typo must be a loud
    # error, never a silent 0-query "0 fail" green.
    only = skip = None
    bigcmp = set()
    argv = sys.argv[3:]
    while argv:
        if argv[0] not in ("--only", "--skip", "--bigcmp"):
            sys.exit(f"unknown argument: {argv[0]}")
        if len(argv) < 2:
            sys.exit(f"{argv[0]} needs a comma-separated query list")
        names = set(argv[1].split(","))
        unknown = names - set(oracle)
        if unknown:
            sys.exit(f"{argv[0]}: unknown queries {sorted(unknown)}")
        if argv[0] == "--only":
            only = names
        elif argv[0] == "--skip":
            skip = names
        else:
            bigcmp = names
        argv = argv[2:]
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if skip is not None and name in skip:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        if name in bigcmp:
            # DuckDB-side set-equality for outputs too large for the
            # Python row-sort path (e.g. dedup_embedding's 180M pair rows
            # at sf3): column names + row count + bidirectional EXCEPT ALL
            # (hash-based, spillable). Value comparison is BITWISE — a
            # stricter check than norm_cell's 10-sig-fig rendering, which
            # the bank's §5 exact-accumulation discipline is built to pass.
            try:
                got_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
                exp_rel = con.sql(oracle[name])
                # same type guards as frame(): a bigcmp-listed query must
                # never pass locally with decimal128 or array columns that
                # the driver comparator would reject
                for rel in (got_rel, exp_rel):
                    for c, t in zip(rel.columns, rel.types):
                        ts = str(t).upper()
                        if "DECIMAL" in ts:
                            raise TypeError(
                                f"column {c!r} is decimal-typed ({t}) — "
                                "driver renders decimal128 differently; "
                                "cast to DOUBLE at the output boundary")
                        if ts.endswith("[]") or ts.startswith(
                                ("STRUCT", "MAP", "LIST", "UNION")):
                            raise TypeError(
                                f"column {c!r} is nested-typed ({t}) — "
                                "driver-incomparable; emit scalar columns")
                g_cols, e_cols = sorted(got_rel.columns), sorted(exp_rel.columns)
                if g_cols != e_cols:
                    print(f"FAIL {name}: cols {g_cols} != {e_cols}")
                    n_fail += 1
                    continue
                cols = ", ".join(f'"{c}"' for c in g_cols)
                con.execute(f"CREATE OR REPLACE TEMP VIEW bq_got AS "
                            f"SELECT {cols} FROM read_parquet({files!r})")
                con.execute(f"CREATE OR REPLACE TEMP VIEW bq_exp AS "
                            f"SELECT {cols} FROM ({oracle[name]})")
                ng = con.execute("SELECT count(*) FROM bq_got").fetchone()[0]
                ne = con.execute("SELECT count(*) FROM bq_exp").fetchone()[0]
                nd = con.execute(
                    "SELECT count(*) FROM ((SELECT * FROM bq_got EXCEPT ALL "
                    "SELECT * FROM bq_exp) UNION ALL (SELECT * FROM bq_exp "
                    "EXCEPT ALL SELECT * FROM bq_got))").fetchone()[0]
            except Exception as e:  # noqa: BLE001
                print(f"FAIL {name}: {str(e)[:200]}")
                n_fail += 1
                continue
            if ng != ne or nd != 0:
                print(f"FAIL {name}: rows {ng} vs {ne}, symmetric diff {nd}")
                n_fail += 1
            else:
                print(f"PASS {name} ({ng} rows, bitwise set-equal)")
                n_pass += 1
            continue
        try:
            got_cols, got_dt, got = frame(
                con, con.sql(f"SELECT * FROM read_parquet({files!r})"))
            exp_cols, exp_dt, exp = frame(con, con.sql(oracle[name]))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: cols {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_dt != exp_dt:
            print(f"FAIL {name}: dtypes {list(zip(got_cols, got_dt, exp_dt))}")
            n_fail += 1
        elif got != exp:
            bad = [(a, b) for a, b in zip(got, exp) if a != b][:3]
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}; first diffs: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
