#!/usr/bin/env bash
# One-command sf>=1 scaling-evidence sweep (VERDICT-r15 item 5).
#
# The driver's testdata stops at sf0.1; the repo's scaling claims
# (SURVEY.md §6: 204/209 hash-exact at sf1 on the hardened corpus) were
# earned with manual gen_sf.py + Verify + check.py invocations. This
# script is that evidence as ONE reproducible step:
#
#   scripts/sweep_sf.sh [scale]        # default scale 1
#
# 1. Generates the hardened sf<scale> corpus under target/sfdata/
#    (scripts/gen_sf.py — Zipfian 12k-token vocabulary, token-edit
#    near-dups, heavy-tail embeddings) unless already present; set
#    REGEN=1 to force regeneration.
# 2. Runs graft.Verify over it (every registry query dumped).
# 3. Replays the DuckDB oracle gate (scripts/check.py) and writes the
#    machine-readable standing to target/sweep_sf<scale>_standing.json.
# 4. Classifies failures: the approximate-sketch estimation-mode gates
#    (q51/q54/q55/q58/q75) are EXPECTED to drift from the exact oracle
#    beyond sf0.1 — they estimate within a configured RSE by design
#    (SURVEY §6). Any OTHER failure exits non-zero.
#
# Generation at sf1 takes a few minutes and ~2 GB; Verify ~15-25 min at
# local[32]; the oracle replay ~10 min (DuckDB temp capped by check.py).
set -euo pipefail
cd "$(dirname "$0")/.."
scale="${1:-1}"
data="target/sfdata/sf$scale"
out="target/sweep_gen_sf$scale"
standing="target/sweep_sf${scale}_standing.json"

if [ ! -f "$data/_GENERATED" ] || [ "${REGEN:-0}" = "1" ]; then
  echo "== generating hardened sf$scale corpus at $data"
  rm -rf "$data"
  python3 scripts/gen_sf.py "$data" "$scale"
  touch "$data/_GENERATED"
else
  echo "== reusing existing corpus at $data (REGEN=1 to regenerate)"
fi

echo "== Verify (full registry) at sf$scale"
rm -rf "$out"
sbt -batch "runMain graft.Verify $data $out" >"$out.verify.log" 2>&1 \
  || { echo "Verify FAILED at sf$scale — see $out.verify.log"; exit 1; }

echo "== DuckDB oracle replay"
GRAFT_CHECK_JSON="$standing" python3 scripts/check.py "$data" "$out" \
  || true  # exit handled below: sketch-mode drift is expected at sf>=1

python3 - "$standing" "$scale" <<'EOF'
import json, sys
standing_path, scale = sys.argv[1], sys.argv[2]
d = json.load(open(standing_path))
# Estimation-mode sketch gates: exact-oracle drift beyond sf0.1 is the
# documented, RSE-bounded design (SURVEY.md §6), not a defect.
EXPECTED_APPROX = {"q51_theta_segments", "q54_theta_retention",
                   "q55_rolling_actives", "q58_join_estimate",
                   "q75_mv_kll"}
bad = sorted(n for n, q in d["queries"].items()
             if q["status"] not in ("pass", "rows-only")
             and n not in EXPECTED_APPROX)
drifted = sorted(n for n, q in d["queries"].items()
                 if q["status"] not in ("pass", "rows-only")
                 and n in EXPECTED_APPROX)
d["scale"] = scale
d["expected_approx_drift"] = drifted
d["unexpected_failures"] = bad
json.dump(d, open(standing_path, "w"), indent=1, sort_keys=True)
total = len(d["queries"])
print(f"== standing sf{scale}: {d['pass']} pass / {total} total; "
      f"{len(drifted)} expected sketch-mode drift {drifted}; "
      f"{len(bad)} unexpected failures {bad}")
print(f"== standing JSON: {standing_path}")
sys.exit(1 if bad else 0)
EOF
