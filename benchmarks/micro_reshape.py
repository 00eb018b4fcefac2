"""Which reshape classes are FREE vs PHYSICAL on this TPU?

A jitted bare reshape between committed default-layout arrays is
either a no-op alias (wall ~ 0) or a physical tiled-layout copy
(wall ~ 2*bytes/BW). The deep chain's engine boundary lives and dies
by this: entry (M, B) -> (128, n2*B), exit (n2, 128*B) -> (M, B).

Classes probed (A=128, C=128, D=8192 by default; all f32):
  leading_split   (A*C, D)   -> (A, C, D)
  leading_merge   (A, C, D)  -> (A*C, D)
  trailing_split  (A, C*D)   -> (A, C, D)
  trailing_merge  (A, C, D)  -> (A, C*D)
  entry           (A*C, D)   -> (A, C*D)     [the engine entry]
  exit            (A, C*D)   -> (A*C, D)     [the engine exit]
  copy            (A*C, D)   -> same shape * 2.0  [control]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import transport_analysis_tpu  # noqa: E402,F401


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", type=int, default=128)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--d", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()
    A, C, D = args.a, args.c, args.d
    gb = A * C * D * 4 / 1e9

    cases = {
        "leading_split": ((A * C, D), (A, C, D)),
        "leading_merge": ((A, C, D), (A * C, D)),
        "trailing_split": ((A, C * D), (A, C, D)),
        "trailing_merge": ((A, C, D), (A, C * D)),
        "entry": ((A * C, D), (A, C * D)),
        "exit": ((A, C * D), (A * C, D)),
    }
    key = jax.random.PRNGKey(0)
    print(f"plane {gb:.2f} GB (A={A}, C={C}, D={D})")

    def bench(tag, fn, x):
        out = fn(x)
        np.asarray(jnp.sum(out[:1, :1] if out.ndim == 2
                           else out[:1, :1, :1]))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(x)
        np.asarray(jnp.sum(out[:1, :1] if out.ndim == 2
                           else out[:1, :1, :1]))
        wall = (time.perf_counter() - t0) / args.reps
        print(f"{tag:15s} {wall * 1e3:8.2f} ms  "
              f"({2 * gb / max(wall, 1e-9):6.1f} GB/s eff)", flush=True)

    for tag, (s1, s2) in cases.items():
        x = jax.random.uniform(key, s1, jnp.float32)
        fn = jax.jit(lambda a, s2=s2: a.reshape(s2))
        bench(tag, fn, x)
        del x

    x = jax.random.uniform(key, (A * C, D), jnp.float32)
    bench("copy", jax.jit(lambda a: a * 2.0), x)


if __name__ == "__main__":
    main()
