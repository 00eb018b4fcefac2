import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/transport_analysis_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import transport_analysis_tpu
from transport_analysis_tpu.ops import deep_acf as da

inner, outer, w = 16384, 128, 128
cols = w * outer
key = jax.random.PRNGKey(0)
mk = lambda i: jax.random.uniform(jax.random.fold_in(key, i),
                                  (inner, cols), jnp.float32, -1, 1)

def bench(tag, fn, *args, reps=8):
    out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1, :1]))
    print(f"{tag:22s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
          flush=True)
    return out

z = tuple(mk(i) for i in range(4))
half = inner // 2
need = (half // 512 + 1) * 512
bench("rev_half", lambda *a: da._unpack_rev_planes_half(
    *a, inner, outer, w, need), *z)

# flip-only and mirror-only pieces
@jax.jit
def fliponly(a):
    return jnp.flip(a[inner - need + 1:], axis=0)
@jax.jit
def mirroronly(a):
    return da._mirror_lanes(a[:need], w, outer)
bench("flip axis0 (half)", fliponly, z[0])
bench("lane mirror (half)", mirroronly, z[0])

# full dispatch (kernel + synth); donates -> dup first
dup = jax.jit(lambda p: tuple(a * 2.0 for a in p))
bench("dup(4 planes)", dup, z)
bench("unpack full", lambda p: da._unpack_to_pair_dif_pallas(
    *dup(p), inner=inner, outer=outer, w=w), z)
