"""Tutorial: scaling — sharding, streaming, ring parallelism.

Run with virtual devices to try multi-chip behavior without hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python docs/tutorials/scaling_example.py
"""

import numpy as np

import jax

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr, parallel


def main():
    print("devices:", jax.devices())

    rng = np.random.RandomState(0)
    n_atoms, n_frames = 64, 256
    u = ta.Universe.empty(n_atoms, n_frames=n_frames, velocities=True)
    for ts in u.trajectory:
        u.atoms.velocities = rng.normal(0, 5, (n_atoms, 3))

    # 1) atoms sharded over every device; XLA all-reduces the particle
    #    mean over the interconnect
    with parallel.use_mesh(parallel.analysis_mesh()):
        v_sharded = VelocityAutocorr(u.atoms).run()

    # 2) identical result, computed single-device
    v_single = VelocityAutocorr(u.atoms).run()
    print("sharded == single:",
          np.allclose(v_sharded.results.timeseries,
                      v_single.results.timeseries))

    # 3) atom-chunked streaming with checkpointing (memory-bounded)
    v_stream = VelocityAutocorr(
        u.atoms, atom_chunk=16, checkpoint="/tmp/vacf_ckpt.npz"
    ).run()
    print("streamed == single:",
          np.allclose(v_stream.results.timeseries,
                      v_single.results.timeseries))

    # 4) frame-sharded exact windowed correlation over a device ring
    if len(jax.devices()) >= 4:
        from jax.sharding import Mesh
        from transport_analysis_tpu.parallel.ring import (
            windowed_correlation_ring,
        )
        from transport_analysis_tpu import ops

        mesh = Mesh(np.array(jax.devices()[:4]), ("frames",))
        series = rng.normal(size=(64, 8, 3))
        ring = windowed_correlation_ring(series, mesh, mode="acf")
        serial = ops.acf_windowed(series)
        print("ring == serial:",
              np.allclose(np.asarray(ring), np.asarray(serial)))


if __name__ == "__main__":
    main()
