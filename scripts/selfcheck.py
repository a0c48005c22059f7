#!/usr/bin/env python3
"""Local differential check: replay oracle_sql.json in DuckDB over the same
parquet fixtures and compare against the Spark parquet dumps from
graft.Verify. Mimics the driver's t2 gate (sorts columns by name, compares
values) so failures are caught before handing the round over.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical text form kills -0.0 / 1e-13 repr noise
        return format(v, ".10g")
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return str(v)


def key(row):
    return tuple((x is None, x) if not isinstance(x, tuple)
                 else (False, x) for x in (norm(v) for v in row))


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            duck = con.execute(sql)
            dcols = [c[0] for c in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM parquet_scan('{out_dir}/{name}/*.parquet')")
            scols = [c[0] for c in sp.description]
            srows = sp.fetchall()
        except Exception as e:
            results[name] = f"SPARK OUTPUT MISSING: {e}"
            continue
        if sorted(dcols) != sorted(scols):
            results[name] = f"SCHEMA MISMATCH duck={sorted(dcols)} spark={sorted(scols)}"
            continue
        dperm = sorted(range(len(dcols)), key=lambda i: dcols[i])
        sperm = sorted(range(len(scols)), key=lambda i: scols[i])
        dr = [tuple(norm(r[i]) for i in dperm) for r in drows]
        sr = [tuple(norm(r[i]) for i in sperm) for r in srows]
        if len(dr) != len(sr):
            results[name] = f"ROWCOUNT duck={len(dr)} spark={len(sr)}"
            continue
        ordered = dr == sr
        unordered = ordered or sorted(map(repr, dr)) == sorted(map(repr, sr))
        if ordered:
            results[name] = f"OK ({len(dr)} rows)"
        elif unordered:
            results[name] = f"OK-UNORDERED ({len(dr)} rows) — row order differs!"
        else:
            diffs = [(a, b) for a, b in zip(sorted(map(repr, dr)),
                                            sorted(map(repr, sr))) if a != b]
            results[name] = (f"VALUE MISMATCH ({len(diffs)} rows differ of "
                             f"{len(dr)}); first: duck={diffs[0][0][:200]} "
                             f"spark={diffs[0][1][:200]}")
    bad = 0
    for name, res in sorted(results.items()):
        flag = "PASS" if res.startswith("OK (") else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {name}: {res}")
    print(f"\n{len(results) - bad}/{len(results)} oracle queries pass")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
