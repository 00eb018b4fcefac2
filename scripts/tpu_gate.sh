#!/usr/bin/env bash
# On-hardware pre-commit gate (CONTRIBUTING.md "On-TPU pre-commit
# check"): run before landing any change to transport_analysis_tpu/ops
# or the parallel kernels. Requires ONE free TPU chip (never run two
# TPU processes at once — the remote compiler serializes them).
#
#   scripts/tpu_gate.sh              # equivalence suite + bench gate
#   TPU_GATE_MIN_LAGS=2e11 scripts/tpu_gate.sh   # custom floor
#
# Exit code 0 = safe to commit.
set -euo pipefail
cd "$(dirname "$0")/.."

# Throughput floors are per-platform (scripts/gate_floors.py):
# hardware-anchored on the v5e, scaled by the bf16-COMPUTE ratio on
# other chips (the roofline proved neither gated path is
# traffic-bound — BENCH_NOTES). Env overrides still win. Deep floor
# rationale: scripts/deep_gate.py N=2^17 rung
# measured 7.5e10 lags/s on the v5e; the floor catches a >=20%
# regression or a silent dispatch regression off the deep path, the
# blind spot that let the round-2 trace-gate incident through.
read -r DEF_MIN_LAGS DEF_MIN_DEEP_LAGS DEVICE_KIND \
    <<< "$(python scripts/gate_floors.py)"
echo "detected device: ${DEVICE_KIND} (floors ${DEF_MIN_LAGS} / ${DEF_MIN_DEEP_LAGS})"
MIN_LAGS="${TPU_GATE_MIN_LAGS:-$DEF_MIN_LAGS}"   # throughput regression floor
MAX_RELERR="${TPU_GATE_MAX_RELERR:-1e-11}"  # f64 contract
MIN_DEEP_LAGS="${TPU_GATE_MIN_DEEP_LAGS:-$DEF_MIN_DEEP_LAGS}"
# Deep-rung accuracy: gated at measured-plus-margin, NOT the 1e-11
# contract (VERDICT r4 #7): the N=2^17 rung measures ~2.5-3.7e-15
# head error, and error GROWS with transform depth (7-9e-12 at
# N=2^20-2^21, BENCH_NOTES deep ladder) — a 1e-11 gate here would
# pass a regression that silently blows the contract at production
# depth. 3e-14 is ~10x the measured rung error (run-to-run pair
# noise is ~1.5x) and catches any band-budget/profile regression
# (those jump >=100x).
MAX_DEEP_RELERR="${TPU_GATE_MAX_DEEP_RELERR:-3e-14}"

echo "== on-TPU equivalence suite =="
TRANSPORT_ANALYSIS_TPU_TEST_TPU=1 python -m pytest \
    tests/test_tpu_equivalence.py -q

echo "== deep-chain rung gate (floor ${MIN_DEEP_LAGS} lags/s) =="
DEEP_OUT=$(python scripts/deep_gate.py | tail -1)
echo "$DEEP_OUT"
python - "$DEEP_OUT" "$MIN_DEEP_LAGS" "$MAX_DEEP_RELERR" << 'EOF'
import json
import sys

out, min_lags, max_relerr = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
rec = json.loads(out)
assert rec["deep"], "deep path did NOT dispatch (silent dispatch regression)"
assert rec["lags_per_s"] >= min_lags, (
    f"deep-chain regression: {rec['lags_per_s']:.3g} < {min_lags:.3g}")
assert rec["rel_err"] <= max_relerr, (
    f"deep-chain accuracy regression: {rec['rel_err']:.3g} > {max_relerr:.3g}")
# tail lags are /(N-lag)-amplified even in pure f64 (see
# tests/test_tpu_equivalence.py) — physical bound only
assert rec["rel_err_tail"] <= 2e-9, (
    f"deep-chain tail accuracy regression: {rec['rel_err_tail']:.3g} > 2e-9")
print(f"DEEP GATE OK: {rec['lags_per_s']:.3g} lags/s, "
      f"rel err {rec['rel_err']:.3g}")
EOF

echo "== bench gate (floor ${MIN_LAGS} lags/s, rel err <= ${MAX_RELERR}) =="
OUT=$(python bench.py | tail -1)
echo "$OUT"
python - "$OUT" "$MIN_LAGS" "$MAX_RELERR" << 'EOF'
import json
import re
import sys

out, min_lags, max_relerr = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
rec = json.loads(out)
value = float(rec["value"])
m = re.search(r"max_rel_err_vs_f64_host=([0-9.eE+-]+)", rec["metric"])
relerr = float(m.group(1)) if m else float("inf")
assert value == value and value > 0, "non-finite bench value"
assert value >= min_lags, f"throughput regression: {value:.3g} < {min_lags:.3g}"
assert relerr <= max_relerr, f"accuracy regression: {relerr:.3g} > {max_relerr:.3g}"
print(f"GATE OK: {value:.3g} lags/s, rel err {relerr:.3g}")
EOF
