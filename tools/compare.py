#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the sf
parquet tables, and reports rows/schema/hash verdicts. The hash compare is
strict: columns sorted by name, rows sorted by all columns, values compared
bit-exact (doubles via struct packing) — stricter than or equal to whatever
the driver does, so green here should mean green there.
"""
import json
import math
import struct
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonical hashable form of one value."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NAN"
        return "f:" + struct.pack(">d", v).hex()
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, bytes):
        return "x:" + v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon(x)}" for k, x in sorted(v.items())) + "}"
    return f"{type(v).__name__}:{v}"


def table_rows(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    # DuckDB-native types (BIGINT vs HUGEINT vs DOUBLE ...): python fetchall
    # erases the distinction (everything becomes int/float) but the driver's
    # comparator does not — an uncast DuckDB sum() is HUGEINT and hash-fails
    # against Spark's BIGINT even when every value is equal. DESCRIBE keeps
    # that signal.
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    types = [r[1] for r in desc]
    return cols, types, rows


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        except Exception:
            pass

    failures = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        try:
            scols, stypes, srows = table_rows(
                con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        except Exception as e:
            print(f"{name}: SPARK-READ-ERR {e}")
            failures += 1
            continue
        try:
            ocols, otypes, orows = table_rows(con, oracle[name])
        except Exception as e:
            print(f"{name}: ORACLE-ERR {e}")
            failures += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        hash_ok = sr == orr
        # DuckDB type drift worth flagging even when values agree
        tmap_s = dict(zip(scols, stypes))
        tmap_o = dict(zip(ocols, otypes))
        type_notes = [
            f"{c}:{tmap_s.get(c)}|{tmap_o.get(c)}"
            for c in sorted(set(scols) & set(ocols))
            if tmap_s.get(c) != tmap_o.get(c)
        ]
        # type drift counts as FAIL: the driver's hash sees HUGEINT/DECIMAL
        # vs BIGINT/DOUBLE even when python-level values compare equal
        verdict = "PASS" if (rows_ok and schema_ok and hash_ok
                             and not type_notes) else "FAIL"
        if verdict == "FAIL":
            failures += 1
        note = f"  types[{' '.join(type_notes)}]" if type_notes else ""
        print(f"{name}: {verdict} rows={len(srows)}/{len(orows)} "
              f"schema={schema_ok} hash={hash_ok}{note}")
        if not hash_ok and rows_ok and schema_ok:
            for i, (a, b) in enumerate(zip(sr, orr)):
                if a != b:
                    print(f"    first diff row {i}:")
                    for c, x, y in zip(sc, a, b):
                        if x != y:
                            print(f"      {c}: spark={x} oracle={y}")
                    break
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
