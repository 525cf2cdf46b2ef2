#!/usr/bin/env python3
"""Deterministic sliced twin of an sf directory for the ~sf1 gate's
oracle-side long poles (r12 verdict item 4).

The two heaviest DuckDB oracles at ~sf1 are quadratic in their input
(q123 ~80 min over documents, q163 ~25 min over embeddings) — harness
cost, not engine cost. Policy: those queries gate at ~sf1 against a
content-addressed 1/MOD slice of their input table (BOTH engines read
the same sliced dir, so the hash compare stays exact — on the slice),
while the full-input compare runs at sf0.1 where the oracle is cheap.
Oracle wall scales ~1/MOD² for the quadratic queries: MOD=4 turns the
two poles into ~5 + ~2 min and the whole ~sf1 gate fits under an hour.

Slices documents by doc_id % MOD == 0 and embeddings by
vec_id % MOD == 0 (id-addressed, so the slice is stable across runs and
across engines); every other table is symlinked unchanged. Handles both
single-file tables (driver sf dirs) and parquet dir tables (ScaleBench
work dirs).

The residue selects WHICH 1/MOD quarter: rotating it per round
(run_gate.sh --slice=k, k = round mod 4) accumulates at-scale coverage
across rounds instead of re-verifying one fixed quarter.

Usage: python3 tools/mk_slice.py <srcDir> <outDir> [mod=4] [rem=0]
Then:  tools/run_main.sh graft.Verify <outDir> <dumpDir> q123_cosine_pairs q163_modularity
       python3 tools/check.py <outDir> <dumpDir>
"""
import os
import sys

import duckdb

SLICED = {"documents": "doc_id", "embeddings": "vec_id"}
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main(src: str, out: str, mod: int, rem: int = 0) -> None:
    assert 0 <= rem < mod, f"rem {rem} out of range for mod {mod}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(src, f"{t}.parquet")
        q = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t in SLICED:
            rel = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.execute(
                f"COPY (SELECT * FROM {rel} WHERE {SLICED[t]} % {mod} = {rem})"
                f" TO '{q}' (FORMAT parquet)")
            n = con.execute(f"SELECT count(*) FROM '{q}'").fetchone()[0]
            print(f"  sliced {t}: {n} rows (1/{mod}, residue {rem})")
        else:
            if os.path.lexists(q):
                os.remove(q)
            os.symlink(os.path.abspath(p), q)
    print(f"slice dir ready: {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 4,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
