"""Per-platform throughput floors for scripts/tpu_gate.sh.

The gate's regression floors are hardware-anchored numbers measured on
the 16 GB v5e this repo develops on (bench.py 1.13e12 lags/s at the
N=8192 engine shape; scripts/deep_gate.py 7.5e10 at the N=2^17 deep
rung — floors set ~20% under the measured values). On any other chip
those absolute numbers would either misfire (slower chip) or silently
sandbag (faster chip), so this script detects the device kind and
scales the v5e floors by the chips' COMPUTE ratio (bf16 TFLOP/s — the
VPU scales with the same clock/core factors to first order).

Why compute and not HBM bandwidth: the round-7 per-stage roofline
(benchmarks/roofline.py, BENCH_NOTES "Per-stage roofline") measured
that NO stage of either gated path reaches 25% of the v5e's 819 GB/s —
the chains are compute/VPU-bound, not traffic-bound. Scaling floors by
the HBM ratio (the pre-round-5 behavior) over-promised on bigger
chips: a v5p's bandwidth is 3.38x the v5e but its compute only 2.33x,
so bandwidth-scaled floors would spuriously FAIL the gate on exactly
the hardware the north star targets.

Prints ONE line: "<min_lags> <min_deep_lags> <device kind>".
Env overrides (TPU_GATE_MIN_LAGS / TPU_GATE_MIN_DEEP_LAGS) are applied
in tpu_gate.sh and take precedence over this table.
"""

import sys

import jax

_V5E_FLOORS = (1.0e12, 6.0e10)

# bf16-compute ratios vs the v5e anchor (197 TFLOP/s bf16):
# v4 275 TFLOP/s -> 1.4, v5p 459 -> 2.33, v6e (Trillium) 918 -> 4.66.
# Deliberately NOT the HBM-bandwidth ratios (module docstring).
_SCALE = {
    "TPU v5 lite": 1.0,
    "TPU v4": 1.4,
    "TPU v5": 2.33,
    "TPU v5p": 2.33,
    "TPU v6 lite": 4.66,
    "TPU v6e": 4.66,
}


def main() -> None:
    kind = jax.local_devices()[0].device_kind
    scale = _SCALE.get(kind)
    if scale is None:
        # unanchored chip: a permissive half-v5e floor still catches
        # order-of-magnitude dispatch regressions without misfiring
        print(
            f"# unknown device kind {kind!r}: permissive 0.5x v5e"
            " floors (add it to scripts/gate_floors.py)",
            file=sys.stderr,
        )
        scale = 0.5
    print(
        f"{_V5E_FLOORS[0] * scale:.6g} {_V5E_FLOORS[1] * scale:.6g} "
        f"{kind}"
    )


if __name__ == "__main__":
    main()
