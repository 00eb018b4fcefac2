"""Package-level sanity tests (counterpart of the reference's
tests/test_transport_analysis.py)."""

import sys


def test_import():
    import transport_analysis_tpu

    assert "transport_analysis_tpu" in sys.modules


def test_version():
    import transport_analysis_tpu as ta

    assert ta.__version__
    from transport_analysis_tpu._version import get_versions

    v = get_versions()
    assert v["version"] == ta.__version__


def test_exports():
    import transport_analysis_tpu as ta

    for name in (
        "Universe",
        "AtomGroup",
        "UpdatingAtomGroup",
        "NoDataError",
        "VelocityAutocorr",
        "ViscosityHelfand",
        "EinsteinMSD",
    ):
        assert hasattr(ta, name)


def test_due_shim():
    from transport_analysis_tpu.utils.due import due, Doi

    # no-op citation registration must be callable
    due.cite(Doi("10.21105/joss.00877"), description="x", path="y")

    @due.dcite(Doi("10.21105/joss.00877"), description="x", path="y")
    def fn():
        return 1

    assert fn() == 1


def test_reference_import_paths():
    """Reference-layout imports keep working for migrating users."""
    from transport_analysis_tpu.velocityautocorr import VelocityAutocorr
    from transport_analysis_tpu.viscosity import ViscosityHelfand
    from transport_analysis_tpu.due import due, Doi  # noqa: F401
    import transport_analysis_tpu as ta

    assert VelocityAutocorr is ta.VelocityAutocorr
    assert ViscosityHelfand is ta.ViscosityHelfand
