#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet
dumps produced by `graft.Verify <sfDir> <outDir>` plus oracle_sql.json,
runs each oracle in DuckDB over the same sf tables, and compares
(row count, sorted column names, multiset of row values).

Usage: python3 tools/check_parity.py <sfDir> <outDir>
"""
import duckdb, glob, json, math, os, sys

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    mine = con.sql(f"SELECT * FROM '{d}/*.parquet'").fetchall()
    cols = [c for c in con.sql(f"SELECT * FROM '{d}/*.parquet'").columns]
    if name not in oracle:
        print(f"{name}: rows={len(mine)} (rows-only check, no oracle)")
        continue
    want = con.sql(oracle[name]).fetchall()
    wcols = con.sql(oracle[name]).columns
    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        def nv(v):
            if isinstance(v, float):
                return round(v, 9)
            return v
        def key(t):
            return tuple((v is None, v) for v in t)
        return sorted((tuple(nv(r[i]) for i in order) for r in rows), key=key)
    ok_cols = sorted(cols) == sorted(wcols)
    # The driver hash is TYPE-sensitive (r01: DuckDB HUGEINT sum() vs
    # Spark BIGINT hashed differently despite equal values) — compare
    # result column types by name too.
    mtypes = dict(zip(cols, map(str, con.sql(f"SELECT * FROM '{d}/*.parquet'").types)))
    wtypes = dict(zip(wcols, map(str, con.sql(oracle[name]).types)))
    type_mism = {c: (mtypes.get(c), wtypes.get(c))
                 for c in set(mtypes) | set(wtypes) if mtypes.get(c) != wtypes.get(c)}
    a, b = norm(mine, cols), norm(want, wcols)
    ok = ok_cols and a == b and not type_mism
    status = "OK " if ok else "FAIL"
    if type_mism:
        print(f"   type-mismatch {name}: {type_mism}")
    print(f"{status} {name}: mine={len(mine)} oracle={len(want)} cols={'ok' if ok_cols else (cols, wcols)}")
    if not ok:
        fails += 1
        if ok_cols:
            sa = set(map(tuple, a)); sb = set(map(tuple, b))
            onlya = list(sa - sb)[:3]; onlyb = list(sb - sa)[:3]
            print("   only-mine:", onlya)
            print("   only-oracle:", onlyb)
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
