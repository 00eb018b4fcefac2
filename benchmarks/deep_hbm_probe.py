"""Per-stage HBM peak probe for the deep autocorrelation path.

Runs ops.acf_fft at a deep shape (M > 65536) with the device's
memory_stats sampled between stages (the stages fence internally at
these sizes, so peaks are attributable). Used to calibrate
benchmarks/northstar.py::auto_chunk's memory model.

Usage: python benchmarks/deep_hbm_probe.py --frames 131072 --series 768
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401
from transport_analysis_tpu import ops  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=131072)
    ap.add_argument("--series", type=int, default=768)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    dev = jax.local_devices()[0]

    def peak_gb(reset=False):
        stats = getattr(dev, "memory_stats", lambda: None)() or {}
        return stats.get("peak_bytes_in_use", 0) / 1e9

    n, s = args.frames, args.series
    key = jax.random.PRNGKey(0)
    # generate in f32 then widen: float64 RNG is EMULATED on TPU
    # (measured 125 s for 200M f64 normals — the production feeds all
    # synthesize f32 and astype for the same reason)
    for rep in range(args.reps):
        x = jax.random.normal(
            jax.random.fold_in(key, rep), (n, s), jnp.float32
        ).astype(jnp.float64)
        np.asarray(x[:1, :1])  # hard fence (block_until_ready lies here)
        if rep == 0:
            print(f"input ({n}, {s}) f64 = {n * s * 8 / 1e9:.2f} GB; "
                  f"baseline peak {peak_gb():.2f} GB", flush=True)
        t0 = time.perf_counter()
        out = ops.acf_fft(x)
        del x
        r = np.asarray(out[:4, 0])
        del out
        wall = time.perf_counter() - t0
        print(f"rep{rep} acf_fft wall {wall:.1f} s  "
              f"peak {peak_gb():.2f} GB  out[0,0]={r[0]:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
