"""Tutorial 5: trajectories bigger than RAM (out-of-core + sharding).

The reference materializes the whole (n_frames, n_atoms, 3) float64
block in host memory (reference velocityautocorr.py:150-152) — at
100k atoms × 1M frames that is ~2.4 TB. This framework streams instead:

1. pass 1 decodes the trajectory once and scatters it into per-atom-
   chunk float32 *spool* files on disk (a blocked on-disk transpose);
2. pass 2 memmaps each spool, ships it to the accelerator, runs the
   FFT correlation kernel, and accumulates the particle mean.

Host and device memory stay bounded by the chunk size regardless of
total atoms, every chunk completion checkpoints, and with a device
mesh the FFT frame axis shards across chips too.

Runnable on CPU: JAX_PLATFORMS=cpu python docs/tutorials/out_of_core_example.py
"""

import os
import tempfile

import numpy as np

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand
from transport_analysis_tpu.core.topology import Topology
from transport_analysis_tpu.io.trr import TRRReader, TRRWriter
from transport_analysis_tpu.parallel.out_of_core import (
    helfand_out_of_core,
    msd_out_of_core,
    vacf_out_of_core,
    vacf_out_of_core_sharded,
)

workdir = tempfile.mkdtemp()

# --- build a toy trajectory file (stand-in for your multi-TB TRR) ----
rng = np.random.RandomState(0)
n_frames, n_atoms = 256, 64
path = os.path.join(workdir, "big.trr")
with TRRWriter(path, n_atoms) as w:
    vel = rng.normal(0, 5, (n_atoms, 3))
    pos = rng.uniform(0, 20, (n_atoms, 3))
    for i in range(n_frames):
        vel = 0.9 * vel + rng.normal(0, 2, (n_atoms, 3))
        pos = pos + 0.002 * vel
        w.write(positions=pos, velocities=vel,
                dimensions=[20, 20, 20, 90, 90, 90], time=0.002 * i)

u = ta.Universe(Topology(n_atoms), TRRReader(path))
u.add_TopologyAttr("masses", np.full(n_atoms, 16.0))

# --- out-of-core analyses (atom_chunk bounds memory) ------------------
vacf = vacf_out_of_core(
    u, os.path.join(workdir, "spool_v"), atom_chunk=16,
    checkpoint=os.path.join(workdir, "vacf.ckpt.npz"),
)
print("VACF[0] =", vacf[0])

visc_ts, viscosity = helfand_out_of_core(
    u, os.path.join(workdir, "spool_h"), atom_chunk=16,
    linear_fit_window=(10, 100),
)
print("Helfand viscosity slope =", viscosity)

msd = msd_out_of_core(u, os.path.join(workdir, "spool_m"), atom_chunk=16)
print("MSD[10] =", msd[10])

# --- compare against the in-memory engine ------------------------------
ref = ViscosityHelfand(u.atoms, linear_fit_window=(10, 100)).run()
print("in-memory viscosity      =", ref.results.viscosity,
      "(expect ~equal)")

# --- frame-axis sharding over a device mesh ----------------------------
# On a pod slice this spreads the FFT frame axis over chips; here the
# 'mesh' is whatever devices the backend exposes.
import jax
from jax.sharding import Mesh

devices = jax.devices()
if len(devices) >= 2:
    mesh = Mesh(np.array(devices), ("frames",))
    vacf_sh = vacf_out_of_core_sharded(
        u, os.path.join(workdir, "spool_vs"), mesh, atom_chunk=16
    )
    print("sharded VACF matches:",
          bool(np.allclose(vacf_sh, vacf, rtol=1e-8)))
