"""Decompose bench.py's scanned step at the headline shape.

Times partial pipelines (vacf only / einstein only / full) with the
same 8-rep lax.scan + single-readback methodology as bench.py, so the
difference isolates each component's in-scan cost.
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

import transport_analysis_tpu  # noqa: F401
from transport_analysis_tpu import ops
from transport_analysis_tpu.ops import acf as ACF
from transport_analysis_tpu.ops import einstein as EIN

N, P, D = 8192, 512, 3
REPS = 8

rng = np.random.RandomState(0)
vel = jnp.asarray(rng.normal(0, 5, (N, P, D)))
pos = jnp.asarray(np.cumsum(rng.normal(0, 5, (N, P, D)), axis=0))
masses = jnp.asarray(rng.uniform(1, 16, P))

consts, n_bands, max_group = ACF.engine_consts_for(N)


def timed(label, body_fn):
    def loop(vel, pos, masses, consts):
        def body(carry, i):
            scale = 1.0 + 1e-9 * i.astype(vel.dtype)
            return carry + body_fn(vel * scale, pos, masses,
                                   consts), None

        total, _ = jax.lax.scan(
            body, jnp.zeros((), vel.dtype), jnp.arange(REPS))
        return total

    fn = jax.jit(loop)
    float(fn(vel, pos, masses, consts))
    t0 = time.perf_counter()
    float(fn(vel, pos, masses, consts))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:32s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def vacf_body(v, p, m, consts):
    norm = (N - jnp.arange(N, dtype=v.dtype))[:, None]
    bp = ACF.raw_autocorr_sumlast_engine(
        v, consts, n_bands, max_group) / norm
    return bp.mean(axis=1)[0]


def corr_only_body(v, p, m, consts):
    return ACF.raw_autocorr_sumlast_engine(
        v, consts, n_bands, max_group)[0, 0]


def einstein_body(v, p, m, consts):
    accum = m[None, :, None] * v * p
    accum = EIN._center(accum)
    corr = ACF.raw_autocorr_sumlast_engine(
        accum, consts, n_bands, max_group)
    bp = ops.einstein_difference_fft(accum, "mean", corr=corr)
    return bp.mean(axis=1)[-1]


def einstein_extras_body(v, p, m, consts):
    # everything einstein does EXCEPT the correlation
    accum = m[None, :, None] * v * p
    accum = EIN._center(accum)
    corr = jnp.zeros((N, P), jnp.float64)
    bp = ops.einstein_difference_fft(accum, "mean", corr=corr)
    return bp.mean(axis=1)[-1]


def full_body(v, p, m, consts):
    return vacf_body(v, p, m, consts) + einstein_body(
        v, p, m, consts)


timed("corr only (engine sumlast)", corr_only_body)
timed("vacf (corr + norm + mean)", vacf_body)
timed("einstein extras (no corr)", einstein_extras_body)
timed("einstein full", einstein_body)
timed("full step (vacf + einstein)", full_body)


def make_k_corrs(k):
    def body(v, p, m, consts):
        acc = jnp.zeros((), v.dtype)
        for j in range(k):
            acc = acc + ACF.raw_autocorr_sumlast_engine(
                v * (1.0 + 1e-7 * j), consts, n_bands, max_group
            )[0, 0]
        return acc
    return body


for k in (1, 2, 3):
    timed(f"{k} corr call(s) per body", make_k_corrs(k))
