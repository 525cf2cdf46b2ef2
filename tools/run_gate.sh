#!/usr/bin/env bash
# One-command oracle gate for any sf dir, applying the round-13 slice
# policy on request:
#   tools/run_gate.sh <sfDir> <workDir> [cpus] [--slice[=k]]
# Without --slice: full Verify dump + check.py compare (all queries).
# With --slice (use at ~sf1-scale and above): q123/q163 gate on a
# deterministic 1/4 id-slice — their quadratic DuckDB oracles are the
# compare's long poles (~80 + ~25 min at ~sf1), and q123's full-input
# SPARK dump is another ~19 min; both engines read the same sliced dir so
# the hash compare stays exact, on the slice. Everything else gates on
# the full input. --slice=k picks residue k (mod 4) so at-scale coverage
# ROTATES across rounds instead of re-verifying one fixed quarter
# (round-13 verdict item 4); default k=0. The chosen k is echoed for the
# artifact. See .claude/skills/verify/SKILL.md. Demonstrated round 13:
# the full ~sf1 gate in 2968 s wall.
#
# Failure modes this script refuses to swallow (round-13 advice):
#  - graft.Verify exiting non-zero (JVM crash mid-run) fails the gate;
#  - a query that never dumped (check.py would silently skip it) fails
#    the gate via the expected-PASS-count assertion;
#  - any check.py FAIL propagates through pipefail.
set -euo pipefail
SF="$1"; WORK="$2"; CPUS="${3:-12}"
SLICE=0; SLICE_K=0
for a in "${@:3}"; do
  case "$a" in
    --slice) SLICE=1 ;;
    --slice=*) SLICE=1; SLICE_K="${a#--slice=}" ;;
  esac
done
[[ "$CPUS" == --slice* ]] && CPUS=12
SLICED_QS="q123_cosine_pairs q163_modularity"
cd /root/repo
rm -rf "$WORK"; mkdir -p "$WORK"
T0=$(date +%s)

run_verify() {  # <sfDir> <dumpDir> [qname...] — fail the gate on a crash
  local log="$WORK/verify_$(basename "$2").log"
  if ! SPARK_GRAFT_CPUS=$CPUS tools/run_main.sh graft.Verify "$@" \
      >"$log" 2>&1; then
    echo "GATE FAIL: graft.Verify exited non-zero; log tail:"
    tail -20 "$log"
    exit 2
  fi
  grep -E 'verify.*failed' "$log" || true
}

run_check() {  # <sfDir> <dumpDir> <expectedPass>
  local out="$WORK/check_$(basename "$2").txt"
  # pipefail propagates check.py's non-zero rc on any FAIL row
  python3 tools/check.py "$1" "$2" | tee "$out" | tail -3
  local pass
  pass=$(grep -oE 'PASS=[0-9]+' "$out" | tail -1 | cut -d= -f2)
  if [[ "${pass:-0}" -ne "$3" ]]; then
    echo "GATE FAIL: PASS=${pass:-0}, expected $3 — a query never dumped" \
         "(check.py skips missing dump dirs; this assertion counts them)"
    exit 3
  fi
}

n_oracles() {  # <dumpDir> — oracle count from the dump's own manifest
  python3 -c "import json,sys; print(len(json.load(open(sys.argv[1]))))" \
    "$1/oracle_sql.json"
}

if [[ $SLICE == 0 ]]; then
  run_verify "$SF" "$WORK/dump"
  run_check "$SF" "$WORK/dump" "$(n_oracles "$WORK/dump")"
else
  NAMES=$(tools/run_main.sh graft.tools.PrintQueries 2>/dev/null \
    | grep -v -e '^q123_cosine_pairs$' -e '^q163_modularity$' | tr '\n' ' ')
  # shellcheck disable=SC2086
  run_verify "$SF" "$WORK/dump" $NAMES
  python3 tools/mk_slice.py "$SF" "$WORK/slice" 4 "$SLICE_K"
  # shellcheck disable=SC2086
  run_verify "$WORK/slice" "$WORK/slicedump" $SLICED_QS
  echo "== full-input compare =="
  run_check "$SF" "$WORK/dump" "$(( $(n_oracles "$WORK/dump") - 2 ))"
  echo "== sliced compare (q123/q163 on 1/4 id-slice, residue $SLICE_K) =="
  run_check "$WORK/slice" "$WORK/slicedump" 2
fi
echo "gate wall: $(( $(date +%s) - T0 )) s"
