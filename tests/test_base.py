"""AnalysisBase runtime contract tests: Results mapping, frames=
selection, verbose progress, engine validation."""

import numpy as np
import pytest
from numpy.testing import assert_allclose, assert_array_equal

from transport_analysis_tpu import VelocityAutocorr
from transport_analysis_tpu.models.base import AnalysisBase, Results


class TestResults:
    def test_attribute_access(self):
        r = Results()
        r.timeseries = [1, 2]
        assert r["timeseries"] == [1, 2]
        r["foo"] = 3
        assert r.foo == 3

    def test_missing_attribute(self):
        r = Results()
        with pytest.raises(AttributeError):
            r.nope

    def test_delete(self):
        r = Results()
        r.x = 1
        del r.x
        assert "x" not in r


class TestRunArguments:
    def test_frames_indices(self, u_random):
        by_slice = VelocityAutocorr(u_random.atoms).run(
            start=0, stop=12, step=3
        )
        by_frames = VelocityAutocorr(u_random.atoms).run(
            frames=[0, 3, 6, 9]
        )
        assert_array_equal(by_frames.frames, [0, 3, 6, 9])
        assert_allclose(
            by_frames.results.timeseries,
            by_slice.results.timeseries,
            rtol=1e-12,
        )

    def test_frames_bool_mask(self, u_random):
        mask = np.zeros(12, bool)
        mask[[1, 5, 7]] = True
        v = VelocityAutocorr(u_random.atoms).run(frames=mask)
        assert_array_equal(v.frames, [1, 5, 7])
        assert v.n_frames == 3

    def test_frames_with_slice_rejected(self, u_random):
        with pytest.raises(ValueError, match="cannot be combined"):
            VelocityAutocorr(u_random.atoms).run(start=1, frames=[0, 1])

    def test_bad_engine(self, u_random):
        with pytest.raises(ValueError, match="engine"):
            VelocityAutocorr(u_random.atoms, engine="bogus")

    def test_verbose_progress(self, u_random, capsys):
        VelocityAutocorr(u_random.atoms, engine="frame").run(verbose=True)
        out = capsys.readouterr().out
        assert "VelocityAutocorr: frame 12/12" in out

    def test_times_follow_selection(self, u_random):
        v = VelocityAutocorr(u_random.atoms).run(start=2, stop=10, step=2)
        assert_allclose(v.times, [2.0, 4.0, 6.0, 8.0])


class TestAnalysisBaseSubclassing:
    def test_user_subclass_single_frame(self, u_random):
        """The MDAnalysis-style extension point keeps working."""

        class MeanVelocity(AnalysisBase):
            def __init__(self, ag, **kwargs):
                super().__init__(ag.universe.trajectory, **kwargs)
                self.ag = ag

            def _prepare(self):
                self._acc = np.zeros(3)

            def _single_frame(self):
                self._acc += self.ag.velocities.mean(axis=0)

            def _conclude(self):
                self.results.mean_velocity = self._acc / self.n_frames

        m = MeanVelocity(u_random.atoms).run()
        assert m.results.mean_velocity.shape == (3,)
        direct = np.mean(
            [u_random.trajectory[i].velocities.mean(axis=0)
             for i in range(12)],
            axis=0,
        )
        assert_allclose(m.results.mean_velocity, direct, rtol=1e-6)


class TestDtypeFastMode:
    def test_f32_matches_f64_loosely(self, u_random):
        a = VelocityAutocorr(u_random.atoms).run()
        b = VelocityAutocorr(u_random.atoms, dtype=np.float32).run()
        assert b._velocities.dtype == np.float32
        assert_allclose(
            b.results.timeseries, a.results.timeseries, rtol=1e-4
        )

    def test_f32_viscosity(self, u_random):
        from transport_analysis_tpu import ViscosityHelfand

        a = ViscosityHelfand(u_random.atoms).run()
        b = ViscosityHelfand(u_random.atoms, dtype=np.float32).run()
        assert_allclose(
            b.results.timeseries, a.results.timeseries, rtol=1e-3
        )

    def test_f32_msd(self, u_random):
        from transport_analysis_tpu import EinsteinMSD

        a = EinsteinMSD(u_random.atoms).run()
        b = EinsteinMSD(u_random.atoms, dtype=np.float32).run()
        assert_allclose(
            b.results.timeseries, a.results.timeseries, rtol=1e-3,
            atol=1e-3,
        )
