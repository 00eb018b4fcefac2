"""Tutorial: velocity autocorrelation and Green-Kubo diffusivity.

Counterpart of the reference's vacf_doc_example / vacf_testing_examples
notebooks, runnable as a script. Uses the packaged EC-like dataset.
"""

import numpy as np

import transport_analysis_tpu as ta
from transport_analysis_tpu import VelocityAutocorr
from transport_analysis_tpu.data.files import ec_top, ec_traj_trr


def main():
    u = ta.Universe(ec_top, ec_traj_trr)
    print(f"{len(u.atoms)} atoms, {u.trajectory.n_frames} frames")

    # VACF of the carbonyl oxygens
    ag = u.select_atoms("name O3")
    vacf = VelocityAutocorr(ag).run()
    print("VACF(0)      :", vacf.results.timeseries[0], "(Å/ps)²")
    print("VACF(1..4)   :", np.round(vacf.results.timeseries[1:5], 3))

    # Green-Kubo self-diffusivity, both integrators
    print("D (trapezoid):", vacf.self_diffusivity_gk(), "Å²/ps")
    print("D (simpson)  :", vacf.self_diffusivity_gk_odd(), "Å²/ps")

    # windowed algorithm agrees with the FFT one
    vacf_w = VelocityAutocorr(ag, fft=False).run()
    print(
        "fft vs windowed max diff:",
        np.max(np.abs(vacf.results.timeseries - vacf_w.results.timeseries)),
    )

    # plots (Line2D contract identical to the reference)
    vacf.plot_vacf()
    vacf.plot_running_integral()

    # stage timings + throughput recorded on every run
    print("timing:", {k: round(v, 4) if isinstance(v, float) else v
                      for k, v in vacf.timing.as_dict().items()})


if __name__ == "__main__":
    main()
