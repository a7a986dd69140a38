#!/usr/bin/env python3
"""Mutation test of the correctness gate itself: perturb one value, drop
one row, and rename one column in COPIES of real graft.Verify output, and
assert selfcheck.py FAILS each mutant while still PASSING the pristine
copy. A gate that cannot catch a planted wrong answer is vacuous — this
proves the hash/row/schema compare has teeth.

Usage: gate_sensitivity.py <sfDir> <verifyOutDir>
(run AFTER a full graft.Verify dump; writes mutants under /tmp)"""
import json, shutil, subprocess, sys
from pathlib import Path

import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
here = Path(__file__).resolve().parent


def run_gate(d):
    r = subprocess.run(
        [sys.executable, str(here / "selfcheck.py"), sfdir, str(d)],
        capture_output=True, text=True)
    lines = r.stdout.strip().splitlines()
    if not lines:  # selfcheck crashed before printing its summary
        raise SystemExit(
            f"selfcheck produced no output (exit {r.returncode}); "
            f"stderr:\n{r.stderr}")
    return lines[-1]  # "N/M queries match"


def check(cond, msg):
    """Explicit exit, not assert: python -O strips asserts, and a
    vacuously-green sensitivity test would defeat its own purpose."""
    if not cond:
        raise SystemExit(f"GATE SENSITIVITY FAILURE: {msg}")


def clone(tag, only):
    """Copy outdir keeping ONLY `only`'s parquet + a filtered oracle map
    (one-query gate runs keep the mutation signal unambiguous)."""
    d = Path("/tmp") / f"gate_mut_{tag}"
    if d.exists():
        shutil.rmtree(d)
    d.mkdir()
    shutil.copytree(Path(outdir) / only, d / only)
    with open(Path(outdir) / "oracle_sql.json") as f:
        oracles = json.load(f)
    with open(d / "oracle_sql.json", "w") as f:
        json.dump({only: oracles[only]}, f)
    return d


TARGET = "q_t1_token_stats"  # plain typed columns: easy to mutate surgically
con = duckdb.connect()

# pristine copy must pass — otherwise the mutants prove nothing
base = clone("pristine", TARGET)
check(run_gate(base) == "1/1 queries match", "pristine copy failed the gate")

# mutant 1: one value off by one
d = clone("value", TARGET)
pq = next((d / TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE t AS SELECT * FROM '{pq}'")
con.execute("UPDATE t SET n_words = n_words + 1 WHERE doc_id = "
            "(SELECT min(doc_id) FROM t)")
con.execute(f"COPY t TO '{pq}' (FORMAT PARQUET)")
check(run_gate(d) == "0/1 queries match", "one-value mutation NOT caught")

# mutant 2: one row dropped
d = clone("row", TARGET)
pq = next((d / TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE t AS SELECT * FROM '{pq}' "
            f"WHERE doc_id <> (SELECT max(doc_id) FROM '{pq}')")
con.execute(f"COPY t TO '{pq}' (FORMAT PARQUET)")
check(run_gate(d) == "0/1 queries match", "dropped-row mutation NOT caught")

# mutant 3: one column renamed
d = clone("schema", TARGET)
pq = next((d / TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE t AS SELECT * EXCLUDE (n_words), "
            f"n_words AS n_wordz FROM '{pq}'")
con.execute(f"COPY t TO '{pq}' (FORMAT PARQUET)")
check(run_gate(d) == "0/1 queries match", "renamed-column mutation NOT caught")

# mutant 4: a SIGNED-ZERO flip — the exact failure class that shipped in
# round 6 (driver hash treats -0.0 != 0.0; python float != does not).
# Planted on q_e1's cov column, where the regression actually lived.
SZ_TARGET = "q_e1_gram_cov"
ds = clone("signedzero", SZ_TARGET)
pqz = next((ds / SZ_TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE z AS SELECT * FROM '{pqz}'")
n_zero = con.execute("SELECT count(*) FROM z WHERE cov = 0.0").fetchone()[0]
check(n_zero > 0, "q_e1 dump has no zero cov cell to flip — pick another")
# NB: a bare -0.0 literal binds as DECIMAL (no signed zero) and the flip
# would silently no-op — negate a DOUBLE cast instead
con.execute("""UPDATE z SET cov = -CAST(0.0 AS DOUBLE)
    WHERE i || '_' || j = (
      SELECT i || '_' || j FROM z WHERE cov = 0.0 ORDER BY i, j LIMIT 1)""")
check(con.execute(
    "SELECT count(*) FROM z WHERE cov = 0.0 AND signbit(cov)").fetchone()[0]
      == 1, "the -0.0 flip did not stick in the mutant table")
con.execute(f"COPY z TO '{pqz}' (FORMAT PARQUET)")
check(run_gate(ds) == "0/1 queries match", "signed-zero mutation NOT caught")

# mutant 5: CAST stripped from an oracle aggregate — the round-9 failure
# class (DuckDB sum(BIGINT) widens to DECIMAL(38,0); values identical, so
# a pandas value-compare passes, but the driver's canonical-repr hash —
# and selfcheck's Arrow type-class check — must distinguish it). Simulated
# by wrapping the oracle so one int64 column comes back DECIMAL(38,0).
d = clone("typedrift", TARGET)
with open(d / "oracle_sql.json") as f:
    o = json.load(f)
o[TARGET] = ("SELECT * EXCLUDE (n_words), CAST(n_words AS DECIMAL(38,0)) "
             f"AS n_words FROM ({o[TARGET]})")
with open(d / "oracle_sql.json", "w") as f:
    json.dump(o, f)
check(run_gate(d) == "0/1 queries match",
      "stripped-CAST (decimal-vs-int64) type drift NOT caught")

# mutant 6 (round 14): the PageRank early-exit round count off by one —
# the engine stops at a checkEvery-block boundary and the oracle
# recomputes the same schedule; a schedule drift (engine exits where the
# oracle says it should not, or vice versa) shows up as exactly this.
R_TARGET = "q_d16_pagerank"
d = clone("rounds", R_TARGET)
pq = next((d / R_TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE r AS SELECT * FROM '{pq}'")
con.execute("UPDATE r SET rounds = rounds + 1")
con.execute(f"COPY r TO '{pq}' (FORMAT PARQUET)")
check(run_gate(d) == "0/1 queries match",
      "early-exit round-count drift NOT caught")

# mutant 7 (round 14): one soft-EM expected count off by one MICRO — any
# forward-backward drift (summation order, a libm sneaking in, per-edge
# grid moved after the sum) lands in the last micro digit first.
S_TARGET = "q_t42_unigram_soft"
d = clone("softmicro", S_TARGET)
pq = next((d / S_TARGET).glob("*.parquet"))
con.execute(f"CREATE OR REPLACE TABLE s AS SELECT * FROM '{pq}'")
con.execute("UPDATE s SET ec_micro = ec_micro + 1 WHERE piece = "
            "(SELECT min(piece) FROM s)")
con.execute(f"COPY s TO '{pq}' (FORMAT PARQUET)")
check(run_gate(d) == "0/1 queries match",
      "one-micro soft-EM expected-count drift NOT caught")

print("gate sensitivity: pristine passes; value/row/schema/signed-zero/"
      "type-drift/rounds/soft-micro mutants all caught (7/7)")
