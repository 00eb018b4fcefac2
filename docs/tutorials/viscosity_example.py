"""Tutorial: Einstein-Helfand shear viscosity.

Counterpart of the reference's viscosity_early_demo /
helfand_dev_toy_system notebooks.
"""

import numpy as np

import transport_analysis_tpu as ta
from transport_analysis_tpu import ViscosityHelfand
from transport_analysis_tpu.data.files import ec_top, ec_traj_trr


def main():
    u = ta.Universe(ec_top, ec_traj_trr)

    vh = ViscosityHelfand(
        u.atoms, temp_avg=300.0, linear_fit_window=(10, 40)
    ).run()
    print("viscosity function [0:5]:",
          np.round(vh.results.timeseries[:5], 6))
    print("fitted viscosity slope  :", vh.results.viscosity)

    # the exact windowed path gives the same function
    vh_w = ViscosityHelfand(
        u.atoms, linear_fit_window=(10, 40), fft=False
    ).run()
    print("fft vs windowed slope diff:",
          abs(vh.results.viscosity - vh_w.results.viscosity))

    vh.plot_viscosity_function()


if __name__ == "__main__":
    main()
