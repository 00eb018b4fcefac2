"""One-jit deep autocorrelation experiment at the north-star rung.

The production deep chain runs 8 eager stages (each its own jit /
pallas dispatch) to keep HBM peaks inspectable; on the tunneled
runtime each dispatch + fence costs ~10-70 ms. All banded constants
are passed as ARGUMENTS (never closed over), so the whole chain can
trace into ONE jit without the program-literal problem the module
docstring warns about. This script measures that composition against
the eager chain at the N=2^20 rung shape and checks bit-agreement.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transport_analysis_tpu.ops import deep_acf as DA
from transport_analysis_tpu.ops import pallas_fft as PF

N = 1 << 20
S = 255           # chunk=85 x d=3
M = 2 * N
INNER, OUTER = DA._split_m(M)
HALF = (S + 1) // 2
W = -(-HALF // DA._deep_wt()) * DA._deep_wt()
SUM_D = 0


# the production one-jit chain itself (DIF variant-B leg 2)
deep_chain_onejit = DA._deep_chain_onejit


def fence(x):
    np.asarray(x[:1, :1])


@jax.jit
def gen(seed):
    r = jnp.arange(N, dtype=jnp.float64)[:, None]
    c = jnp.arange(S, dtype=jnp.float64)[None, :]
    return jnp.sin(r * 1e-3 + c * (1.0 + seed * 1e-3))


def main():
    n_bands, max_group = PF._profile(jnp.float64)
    n2 = INNER // 128
    consts = PF._device_constants(n2, 1, n_bands)
    tables = DA._outer_kernel_tables(INNER, OUTER, n_bands)

    # eager chain reference + wall
    x = gen(jnp.int32(0))
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    ref = DA.raw_autocorr_deep(x, N, m=M, sum_d=SUM_D)
    del x
    fence(ref)
    print(f"eager chain (cold-ish): {time.perf_counter()-t0:.2f} s",
          flush=True)
    t0 = time.perf_counter()
    ref = DA.raw_autocorr_deep(gen(jnp.int32(1)), N, m=M, sum_d=SUM_D)
    fence(ref)
    t_eager = time.perf_counter() - t0
    ref_h = np.asarray(ref[:64, :8])
    del ref
    print(f"eager chain (warm)    : {t_eager:.2f} s", flush=True)

    # one-jit
    t0 = time.perf_counter()
    out = deep_chain_onejit(
        gen(jnp.int32(2)), consts, tables, INNER, OUTER, W, S, N,
        n_bands, max_group, SUM_D)
    fence(out)
    print(f"one-jit (compile+run) : {time.perf_counter()-t0:.2f} s",
          flush=True)
    del out
    t0 = time.perf_counter()
    out = deep_chain_onejit(
        gen(jnp.int32(1)), consts, tables, INNER, OUTER, W, S, N,
        n_bands, max_group, SUM_D)
    fence(out)
    t_one = time.perf_counter() - t0
    print(f"one-jit (warm)        : {t_one:.2f} s", flush=True)
    got_h = np.asarray(out[:64, :8])
    err = np.max(np.abs(got_h - ref_h)) / np.abs(ref_h).max()
    print(f"agreement vs eager (sample): {err:.2e}", flush=True)
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)() or {}
    print(f"peak hbm: {stats.get('peak_bytes_in_use', 0)/1e9:.2f} GB",
          flush=True)


if __name__ == "__main__":
    main()
