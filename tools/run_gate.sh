#!/usr/bin/env bash
# One-command oracle gate for any sf dir, applying the round-13 slice
# policy on request:
#   tools/run_gate.sh <sfDir> <workDir> [cpus] [--slice]
# Without --slice: full Verify dump + check.py compare (all queries).
# With --slice (use at ~sf1-scale and above): q123/q163 gate on a
# deterministic 1/4 id-slice — their quadratic DuckDB oracles are the
# compare's long poles (~80 + ~25 min at ~sf1), and q123's full-input
# SPARK dump is another ~19 min; both engines read the same sliced dir so
# the hash compare stays exact, on the slice. Everything else gates on
# the full input. See .claude/skills/verify/SKILL.md. Demonstrated
# round 13: the full ~sf1 gate in 2968 s wall.
set -euo pipefail
SF="$1"; WORK="$2"; CPUS="${3:-12}"
SLICE=0
for a in "${@:3}"; do [[ "$a" == "--slice" ]] && SLICE=1; done
[[ "$CPUS" == "--slice" ]] && CPUS=12
cd /root/repo
rm -rf "$WORK"; mkdir -p "$WORK"
T0=$(date +%s)
if [[ $SLICE == 0 ]]; then
  SPARK_GRAFT_CPUS=$CPUS tools/run_main.sh graft.Verify "$SF" "$WORK/dump" \
    2>&1 | grep -E 'verify.*failed' || true
  python3 tools/check.py "$SF" "$WORK/dump" | tail -3
else
  NAMES=$(tools/run_main.sh graft.tools.PrintQueries 2>/dev/null \
    | grep -v -e '^q123_cosine_pairs$' -e '^q163_modularity$' | tr '\n' ' ')
  # shellcheck disable=SC2086
  SPARK_GRAFT_CPUS=$CPUS tools/run_main.sh graft.Verify "$SF" "$WORK/dump" \
    $NAMES 2>&1 | grep -E 'verify.*failed' || true
  python3 tools/mk_slice.py "$SF" "$WORK/slice" 4
  SPARK_GRAFT_CPUS=$CPUS tools/run_main.sh graft.Verify "$WORK/slice" \
    "$WORK/slicedump" q123_cosine_pairs q163_modularity \
    2>&1 | grep -E 'verify.*failed' || true
  echo "== full-input compare =="
  python3 tools/check.py "$SF" "$WORK/dump" | tail -3
  echo "== sliced compare (q123/q163 on 1/4 id-slice) =="
  python3 tools/check.py "$WORK/slice" "$WORK/slicedump" | tail -3
fi
echo "gate wall: $(( $(date +%s) - T0 )) s"
