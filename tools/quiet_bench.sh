#!/usr/bin/env bash
# Quiet-window bench wrapper (BASELINE.md "machine regimes" discipline,
# mechanized per the round-8 verdict):
#
#   1. time three isolated SENTINEL queries whose steady-state cost is
#      known for both machine regimes (fast ~0.38 s/query suite, slow-but-
#      quiet ~0.53 s/query suite):
#         join_inner_equi   <= ~0.71 s   tpch_q16 <= ~0.91 s
#         text_bigram_freq  <= ~0.49 s
#      If any sentinel exceeds its slow-regime ceiling by more than the
#      margin, the box is LOADED (not merely in the slow regime) — abort
#      rather than produce an artifact the next session has to litigate.
#   2. run the full suite; keep the artifact as BENCH_QUIET.json only if
#      the run self-labels quiet AND the sentinels passed.
#
# Usage: tools/quiet_bench.sh [sf_dir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.1}"
CP="$(ls /opt/spark/jars/*.jar | tr '\n' ':')target/scala-2.13/classes"
MARGIN="${QUIET_BENCH_MARGIN:-1.35}"   # x over the slow-regime ceiling

command -v java >/dev/null
[ -d target/scala-2.13/classes ] || { echo "compile first (sbt compile)"; exit 2; }

echo "== sentinel calibration (isolated JVM) =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_ONLY=join_inner_equi,tpch_q16,text_bigram_freq \
  java -cp "$CP" graft.Bench >/dev/null 2>&1
python3 - "$MARGIN" <<'EOF'
import json, sys
margin = float(sys.argv[1])
# the filtered sentinel run writes BENCH_SUBSET.json — reading
# BENCH_FULL.json here would compare STALE full-suite numbers (and a
# filtered run must never clobber the round's complete artifact)
full = json.load(open("BENCH_SUBSET.json"))
qs = full["queries"]
# r18 (ADVICE r17): auto-select the ceiling set per DETECTED regime instead
# of hardcoding the slow-regime absolutes — with only the slow ceilings, a
# box back on the fast regime would let a genuine ~2x code regression pass
# the gate silently. Regimes (BASELINE.md "Machine regimes"):
#   fast (r10c old box): quiet sentinel medians ~0.71 / 0.91 / 0.49
#   slow (r17/r18 box):  isolated quiet medians 1.59-1.91 / 1.56-1.89 / 1.24-1.61
# A run is classified FAST when every sentinel is under the fast ceiling
# x margin; otherwise the slow ceilings apply (and a sentinel over even
# those x margin means the box is loaded, not merely slow).
fast = {"join_inner_equi": 1.00, "tpch_q16": 1.02, "text_bigram_freq": 0.64}
slow = {"join_inner_equi": 1.95, "tpch_q16": 1.95, "text_bigram_freq": 1.65}
is_fast = all(qs[k] <= c * margin for k, c in fast.items())
ceilings = fast if is_fast else slow
regime = "fast" if is_fast else "slow"
bad = {k: (qs[k], c) for k, c in ceilings.items() if qs[k] > c * margin}
for k, c in ceilings.items():
    print(f"  {k}: {qs[k]:.2f}s ({regime}-regime ceiling {c:.2f}s, abort above {c*margin:.2f}s)")
if bad:
    print(f"LOADED BOX — sentinels over {regime}-regime ceiling: {bad}; aborting")
    sys.exit(3)
print(f"sentinels OK — box is in the {regime} regime and quiet")
EOF

# settle: the sentinel JVM's own load otherwise lands inside the full
# run's 5-min start loadavg window and can flip its quiet label
SETTLE="${QUIET_BENCH_SETTLE:-240}"
echo "== settling ${SETTLE}s so the sentinel JVM decays out of the 5-min loadavg =="
sleep "$SETTLE"

echo "== full suite =="
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 \
  java -cp "$CP" graft.Bench 2>/dev/null | tail -1
python3 - <<'EOF'
import json, shutil, sys
full = json.load(open("BENCH_FULL.json"))
quiet = full.get("load", {}).get("quiet", False)
total = full.get("value"); n = full.get("n_queries")
if quiet:
    shutil.copy("BENCH_FULL.json", "BENCH_QUIET.json")
    print(f"QUIET run kept: BENCH_QUIET.json ({total}s / {n} queries)")
else:
    print(f"run completed but self-labeled LOADED ({total}s / {n}); BENCH_QUIET.json NOT updated")
    sys.exit(4)
EOF
