"""Tutorial: the Helfand viscosity function on an analytic toy system.

Counterpart of the reference's helfand_dev_toy_system notebook: builds
the unit-acceleration step trajectory (v = t, x = t²/2, one atom of
mass 16 in a 2×2×2 box) where the viscosity function has a closed
form, and shows the engine reproducing it.
"""

import numpy as np

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand
from transport_analysis_tpu.core.transformations import set_dimensions
from transport_analysis_tpu.utils.units import constants


def build_step_universe(n_frames=501):
    t = np.arange(n_frames, dtype=np.float64)
    vel = np.stack([t, t, t], axis=1).reshape(n_frames, 1, 3)
    pos = (0.5 * t * t)[:, None, None] * np.ones(3)
    u = ta.Universe.empty(1, n_frames=n_frames, velocities=True)
    setter = set_dimensions([2, 2, 2, 90, 90, 90])
    for i, ts in enumerate(u.trajectory):
        u.atoms.velocities = vel[i]
        u.atoms.positions = pos[i].reshape(1, 3)
        setter(ts)
    u.add_TopologyAttr("masses", [16.0])
    return u


def analytic_viscosity_function(n_frames, mass=16.0, temp=300.0,
                                vol=8.0):
    """Brute-force the expected η(t)·t for A(t) = m·t·t²/2."""
    t = np.arange(n_frames, dtype=np.float64)
    a = mass * t * (0.5 * t * t)  # m·v·x per component
    k_b = constants["Boltzmann_constant"]
    out = np.zeros(n_frames)
    for lag in range(1, n_frames):
        diff = a[:-lag] - a[lag:]
        out[lag] = np.mean(diff * diff)  # mean over d is identity here
    return out / (2 * k_b * vol * temp)


def main():
    n = 501
    u = build_step_universe(n)
    vh = ViscosityHelfand(u.atoms, temp_avg=300.0).run()
    expected = analytic_viscosity_function(n)
    err = np.max(
        np.abs(vh.results.timeseries - expected)
        / np.maximum(np.abs(expected), 1.0)
    )
    print("viscosity function [1:4]:", vh.results.timeseries[1:4])
    print("analytic          [1:4]:", expected[1:4])
    print("max rel err:", err)
    vh.plot_viscosity_function()


if __name__ == "__main__":
    main()
