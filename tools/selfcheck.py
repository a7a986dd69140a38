#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads the parquet dumps
produced by graft.Verify, runs each oracle SQL from oracle_sql.json in DuckDB
over the same sf tables, and compares strictly (schema names, row count,
ordered values). Usage: selfcheck.py <sfDir> <verifyOutDir>"""
import json, math, sys
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracles.items()):
    try:
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        want = con.execute(sql).df()
    except Exception as e:
        fails.append((name, f"EXEC: {e}"))
        print(f"FAIL {name}: exec error: {e}")
        continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"cols {gc} != {wc}"))
        print(f"FAIL {name}: columns {gc} vs {wc}")
        continue
    got, want = got[gc], want[gc]
    if len(got) != len(want):
        fails.append((name, f"rows {len(got)} != {len(want)}"))
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
        continue
    bad = None
    for c in gc:
        a, b = got[c].tolist(), want[c].tolist()
        for i, (x, y) in enumerate(zip(a, b)):
            xn = isinstance(x, float) and math.isnan(x)
            yn = isinstance(y, float) and math.isnan(y)
            if x is None and y is None: continue
            if xn and yn: continue
            if xn != yn or x is None or y is None or x != y:
                bad = (c, i, x, y); break
            # the driver hashes canonical reprs, where -0.0 != 0.0 —
            # plain float != treats them equal, so check the sign bit too
            if (isinstance(x, float) and isinstance(y, float) and x == 0.0
                    and math.copysign(1.0, x) != math.copysign(1.0, y)):
                bad = (c, i, x, y); break
        if bad: break
    if bad:
        c, i, x, y = bad
        fails.append((name, f"value {c}[{i}]: {x!r} != {y!r}"))
        print(f"FAIL {name}: {c}[row {i}]: spark={x!r} duckdb={y!r}")
    else:
        print(f"ok   {name} ({len(got)} rows)")

print(f"\n{len(oracles)-len(fails)}/{len(oracles)} queries match")
sys.exit(1 if fails else 0)
