"""Per-platform throughput floors for scripts/tpu_gate.sh.

The gate's regression floors are hardware-anchored numbers measured on
the 16 GB v5e this repo develops on (bench.py 1.13e12 lags/s at the
N=8192 engine shape; scripts/deep_gate.py 7.5e10 at the N=2^17 deep
rung — floors set ~20% under the measured values). On any other chip
those absolute numbers would either misfire (slower chip) or silently
sandbag (faster chip), so this script detects the device kind and
scales the v5e floors by the chips' HBM-bandwidth ratio — both gated
paths are traffic-bound on the v5e (BENCH_NOTES per-stage roofline),
so bandwidth is the first-order transfer factor.

Prints ONE line: "<min_lags> <min_deep_lags> <device kind>".
Env overrides (TPU_GATE_MIN_LAGS / TPU_GATE_MIN_DEEP_LAGS) are applied
in tpu_gate.sh and take precedence over this table.
"""

import sys

import jax

_V5E_FLOORS = (1.0e12, 6.0e10)

# HBM-bandwidth ratios vs the v5e anchor (819 GB/s):
# v4 1228 GB/s, v5p 2765 GB/s, v6e (Trillium) 1640 GB/s.
_SCALE = {
    "TPU v5 lite": 1.0,
    "TPU v4": 1.5,
    "TPU v5": 3.3,
    "TPU v5p": 3.3,
    "TPU v6 lite": 2.0,
    "TPU v6e": 2.0,
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
