#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running oracle_sql.json on the same source tables.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp units for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


# past this row count the pandas sort+assert path is a memory hazard
# (q123 at ~sf1: 98.9M rows peaked >100 GiB resident) — compare inside
# DuckDB instead: equal row counts + empty symmetric EXCEPT ALL, which is
# exact, order-insensitive, and streams
# lowered from 5M in r15: the ~sf1 compare is one long python process, and
# every pandas materialization parks bytes in malloc arenas the OS never
# gets back — after ~160 oracles the in-process DuckDB hit a SYSTEM
# allocation failure with plenty of box RAM nominally free. The
# duckdb-side compare is exact and streams; route anything past 1M rows
# through it (the subprocess-per-query isolation in main() handles the
# arena growth — each child starts at zero RSS).
BIG_ROWS = 1_000_000


def big_compare(con, qdir: str, sql: str):
    con.execute(
        f"CREATE OR REPLACE TEMP VIEW _got AS SELECT * FROM '{qdir}/*.parquet'")
    con.execute(f"CREATE OR REPLACE TEMP VIEW _want AS ({sql})")
    # mirror the small pandas path: column ORDER is part of the contract,
    # and type drift is FATAL (DuckDB's set ops implicit-cast across
    # numeric widths, so an INT-vs-BIGINT drift would otherwise be
    # invisible to the EXCEPT ALL value compare)
    gdesc = [(r[0], r[1]) for r in con.execute("DESCRIBE _got").fetchall()]
    wdesc = [(r[0], r[1]) for r in con.execute("DESCRIBE _want").fetchall()]
    if [c for c, _ in gdesc] != [c for c, _ in wdesc]:
        return False, 0, [
            f"columns {[c for c, _ in gdesc]} != {[c for c, _ in wdesc]}"]
    if [t for _, t in gdesc] != [t for _, t in wdesc]:
        return False, 0, [f"dtype diff: got {gdesc} want {wdesc}"]
    gcols = [c for c, _ in gdesc]
    ng = con.execute("SELECT count(*) FROM _got").fetchone()[0]
    nw = con.execute("SELECT count(*) FROM _want").fetchone()[0]
    if ng != nw:
        return False, ng, [f"rows {ng} != {nw}"]
    cols = ", ".join(f'"{c}"' for c in gcols)
    diff = con.execute(
        f"SELECT count(*) FROM ("
        f"(SELECT {cols} FROM _got EXCEPT ALL SELECT {cols} FROM _want)"
        f" UNION ALL "
        f"(SELECT {cols} FROM _want EXCEPT ALL SELECT {cols} FROM _got))"
    ).fetchone()[0]
    return diff == 0, ng, ([] if diff == 0 else
                           [f"{diff} rows differ (symmetric EXCEPT ALL)"])


def fresh_con(sf_dir: str, threads: int = 0):
    """One connection per ORACLE: the r15 ~sf1 compare OOM'd inside
    DuckDB's buffer manager after ~150 oracles on a shared connection
    (accumulated buffers + two new strip-chain oracles) — per-query
    connections cap the blast radius, and an explicit memory_limit +
    temp_directory lets a heavy oracle SPILL instead of raising
    OutOfMemoryException mid-gate. View creation is O(metadata)."""
    con = duckdb.connect()
    # keep DuckDB's default-sized budget (80% of RAM) — q30's recursive-CTE
    # oracle at ~sf1 legitimately exceeds 48GB — but point spills at a real
    # temp dir so operators that CAN spill do, instead of raising
    con.execute("SET memory_limit='100GB'")
    con.execute("SET temp_directory='/tmp/duckdb_gate_spill'")
    if threads:
        con.execute(f"SET threads={threads}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dirs (ScaleBench ~sf1)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def oracle_df(sf_dir: str, con, sql: str):
    """Run one oracle, retrying at reduced parallelism on DuckDB OOM:
    per-thread pipeline state is the peak-memory multiplier for the
    list-heavy oracles (q30's MinHash lists + recursive-CTE CC at ~sf1
    cannot spill), so fewer threads = lower peak, same exact result."""
    try:
        return con.execute(sql).df(), con
    except duckdb.OutOfMemoryException:
        for threads in (8, 2):
            print(f"    (oracle OOM — retrying with threads={threads})")
            con = fresh_con(sf_dir, threads)
            try:
                return con.execute(sql).df(), con
            except duckdb.OutOfMemoryException:
                continue
        raise


def check_one(sf_dir: str, out_dir: str, name: str) -> int:
    """Compare ONE query in THIS process. Returns 0 pass / 1 fail /
    2 rows-only. Printed lines are the gate log contract."""
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    qdir = os.path.join(out_dir, name)
    con = fresh_con(sf_dir)
    n_got = con.execute(
        f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
    if name in oracles and n_got > BIG_ROWS:
        ok, n, msgs = big_compare(con, qdir, oracles[name])
        if ok:
            print(f"  ✓ {name}: {n} rows [duckdb-side compare]"
                  + (f" [{msgs}]" if msgs else ""))
            return 0
        print(f"  ✗ {name}: {msgs}")
        return 1
    if name not in oracles:
        print(f"  ~ {name}: rows-only check — {n_got} rows")
        return 2
    got_raw = con.execute(f"SELECT * FROM '{qdir}/*.parquet'").df()
    want_raw, con = oracle_df(sf_dir, con, oracles[name])
    ok = True
    msgs = []
    # column ORDER is part of the contract — check it BEFORE norm()
    # sorts columns alphabetically (round-13 advice: a drifted order
    # would otherwise pass here and fail only past BIG_ROWS at scale)
    if list(got_raw.columns) != list(want_raw.columns):
        ok = False
        msgs.append(
            f"columns {list(got_raw.columns)} != {list(want_raw.columns)}")
    got, want = norm(got_raw), norm(want_raw)
    if ok and [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
        ok = False
        msgs.append(f"dtype diff: got {list(map(str, got.dtypes))} want {list(map(str, want.dtypes))}")
    if ok and len(got) != len(want):
        ok = False
        msgs.append(f"rows {len(got)} != {len(want)}")
    if ok:
        g = got.sort_values(list(got.columns)).reset_index(drop=True)
        w = want.sort_values(list(want.columns)).reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        except AssertionError as e:
            ok = False
            msgs.append(str(e).split("\n")[0:3])
    if ok:
        print(f"  ✓ {name}: {len(got)} rows" + (f" [{msgs}]" if msgs else ""))
        return 0
    print(f"  ✗ {name}: {msgs}")
    return 1


def main(sf_dir: str, out_dir: str) -> int:
    """Drive every query's compare in a FRESH SUBPROCESS: the ~sf1 gate is
    200+ oracles in a row, and a single long-lived python parks every
    pandas/DuckDB allocation in malloc arenas the OS never reclaims — by
    oracle ~160 the in-process DuckDB died on SYSTEM allocation failures
    (could not even create thread-local state) with box RAM nominally
    free. A child per query starts at zero RSS; the ~1-2 s
    startup+view-setup overhead per query is noise against the oracle
    runtimes, and a child killed by the OS is a visible FAIL, not a
    truncated gate."""
    import subprocess
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        if not os.path.isdir(os.path.join(out_dir, name)):
            continue
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, out_dir,
             "--one", name])
        if r.returncode == 0:
            n_pass += 1
        elif r.returncode == 2:
            pass  # rows-only: neither pass nor fail (matches old behavior)
        else:
            n_fail += 1
            if r.returncode != 1:  # crashed child: surface it as a FAIL row
                print(f"  ✗ {name}: [child exited rc={r.returncode}]")
    print(f"PASS={n_pass} FAIL={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    if len(sys.argv) == 5 and sys.argv[3] == "--one":
        # a child dying on an uncaught exception exits rc=1, which the
        # parent counts as FAIL without a named '✗' line (only rc not in
        # {0,1,2} got one) — print the line here so every failure mode
        # names its query (r15 ADVICE)
        # Exception, not BaseException: a Ctrl-C (KeyboardInterrupt) or
        # sys.exit must propagate as an aborted run, not masquerade as a
        # per-query FAIL row (r16 ADVICE)
        try:
            sys.exit(check_one(sys.argv[1], sys.argv[2], sys.argv[4]))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"  ✗ {sys.argv[4]}: [exception {type(e).__name__}: {e}]")
            sys.exit(1)
    sys.exit(main(sys.argv[1], sys.argv[2]))
