"""Generate the round-2 byte-frozen golden fixtures (DCD, Amber
NetCDF, H5MD) — run ONCE from the repo root, outputs committed:

    python tests/golden/generate_r2.py

Deterministic: fixed seed, fixed shapes. The companion assertions live
in tests/test_golden_formats.py (spec-level header checks + frozen
decoded values + writer-drift checks).
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

N_FRAMES, N_ATOMS = 3, 7
DIMS = np.array([18.0, 20.0, 22.0, 90.0, 90.0, 90.0])


def arrays():
    rng = np.random.RandomState(20260817)
    pos = rng.uniform(0.0, 18.0, (N_FRAMES, N_ATOMS, 3)).astype(
        np.float32
    )
    vel = rng.normal(0.0, 12.0, (N_FRAMES, N_ATOMS, 3)).astype(
        np.float32
    )
    return pos, vel


def main():
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(HERE))
    )
    from transport_analysis_tpu.io.dcd import DCDWriter
    from transport_analysis_tpu.io.h5md import H5MDWriter
    from transport_analysis_tpu.io.netcdf import NCDFWriter

    pos, vel = arrays()

    with DCDWriter(
        os.path.join(HERE, "golden.dcd"), n_atoms=N_ATOMS, dt=0.5
    ) as w:
        for i in range(N_FRAMES):
            w.write(positions=pos[i], dimensions=DIMS)

    with NCDFWriter(
        os.path.join(HERE, "golden.ncdf"), n_atoms=N_ATOMS,
        velocities=True,
    ) as w:
        for i in range(N_FRAMES):
            w.write(positions=pos[i], velocities=vel[i],
                    dimensions=DIMS, time=0.5 * i)

    with H5MDWriter(
        os.path.join(HERE, "golden.h5md"), n_atoms=N_ATOMS,
        velocities=True,
    ) as w:
        for i in range(N_FRAMES):
            w.write(positions=pos[i], velocities=vel[i],
                    dimensions=DIMS, time=0.5 * i)

    np.savez(
        os.path.join(HERE, "golden_arrays_r2.npz"),
        positions=pos, velocities=vel, dimensions=DIMS,
    )
    print("golden r2 fixtures written")


if __name__ == "__main__":
    main()
