"""Frozen on-disk format fixtures for TRR and XTC.

Round-trip tests alone can't catch a *symmetric* deviation from the
real GROMACS formats (writer and reader drifting together). True
ecosystem goldens (files produced by GROMACS/MDAnalysis) are
unobtainable in this environment — no MDAnalysis install, no network,
and the reference snapshot ships no TRR blob (`.MISSING_LARGE_BLOBS`).
This file provides the two strongest available substitutes:

1. byte-frozen fixtures committed to git: any change to either codec
   that alters the on-disk bytes or the decoded values fails loudly
   instead of drifting silently;
2. spec-level header assertions decoded with raw ``struct`` — magic
   numbers, field offsets, endianness, and unit conventions taken from
   the public GROMACS trnio/xdrfile layout (TRR magic 1993, XTC magic
   1995, big-endian XDR, nm on disk vs Å in the API).
"""

import os
import struct

import numpy as np
import pytest
from numpy.testing import assert_allclose

from transport_analysis_tpu.io.trr import TRRReader
from transport_analysis_tpu.io.xtc import XTCReader

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD_TRR = os.path.join(HERE, "golden", "golden.trr")
GOLD_XTC = os.path.join(HERE, "golden", "golden.xtc")
GOLD_XTC12 = os.path.join(HERE, "golden", "golden12.xtc")
GOLD_NPZ = os.path.join(HERE, "golden", "golden_arrays.npz")
GOLD_DCD = os.path.join(HERE, "golden", "golden.dcd")
GOLD_NCDF = os.path.join(HERE, "golden", "golden.ncdf")
GOLD_H5MD = os.path.join(HERE, "golden", "golden.h5md")
GOLD_NPZ2 = os.path.join(HERE, "golden", "golden_arrays_r2.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLD_NPZ)


@pytest.fixture(scope="module")
def golden2():
    """Round-2 fixture arrays (DCD / Amber NetCDF / H5MD goldens;
    regenerate with tests/golden/generate_r2.py)."""
    return np.load(GOLD_NPZ2)


class TestGoldenTRR:
    def test_decoded_values(self, golden):
        r = TRRReader(GOLD_TRR)
        assert r.n_frames == 3
        assert r.n_atoms == 5
        for i in range(3):
            ts = r[i]
            assert_allclose(ts.positions, golden["positions"][i],
                            atol=1e-5)
            assert_allclose(ts.velocities, golden["velocities"][i],
                            atol=1e-5)
            assert_allclose(ts.dimensions, golden["dimensions"],
                            atol=1e-4)
            assert ts.time == pytest.approx(0.5 * i)

    def test_header_spec_fields(self):
        """Raw struct decode of frame 0's header against the GROMACS
        trnio layout: magic 1993, version string, section sizes,
        natoms/step, big-endian floats, nm units on disk."""
        with open(GOLD_TRR, "rb") as fh:
            buf = fh.read()
        magic, slen, _ = struct.unpack_from(">iii", buf, 0)
        assert magic == 1993
        # version string (slen includes NUL)
        off = 12
        version = buf[off:off + slen - 1]
        assert b"GMX_trn_file" in version
        off += slen - 1
        (ir_size, e_size, box_size, vir_size, pres_size, top_size,
         sym_size, x_size, v_size, f_size) = struct.unpack_from(
            ">10i", buf, off)
        assert ir_size == e_size == 0
        assert box_size == 9 * 4          # 3x3 f32 box matrix
        assert x_size == v_size == 5 * 3 * 4
        assert f_size == 0
        off += 40
        natoms, step, _nre = struct.unpack_from(">iii", buf, off)
        assert natoms == 5
        assert step == 0
        off += 12
        t, lam = struct.unpack_from(">ff", buf, off)
        assert t == 0.0 and lam == 0.0
        off += 8
        # box matrix in nm: diagonal 2.0 (20 Å)
        box = np.frombuffer(buf, ">f4", 9, off).reshape(3, 3)
        assert_allclose(np.diag(box), [2.0, 2.0, 2.0], atol=1e-6)

    def test_bytes_frozen(self, golden, tmp_path):
        """Re-encoding the golden arrays must reproduce the committed
        bytes exactly — catches any writer drift."""
        from transport_analysis_tpu.io.trr import TRRWriter

        out = tmp_path / "re.trr"
        with TRRWriter(out, n_atoms=5) as w:
            for i in range(3):
                w.write(positions=golden["positions"][i],
                        velocities=golden["velocities"][i],
                        dimensions=golden["dimensions"],
                        time=0.5 * i, step=i)
        with open(GOLD_TRR, "rb") as fh:
            want = fh.read()
        assert out.read_bytes() == want


class TestGoldenXTC:
    def test_decoded_values(self, golden):
        r = XTCReader(GOLD_XTC)
        assert r.n_frames == 3
        assert r.n_atoms == 5
        for i in range(3):
            ts = r[i]
            # XTC quantizes to 1/precision nm = 0.01 Å at 1000
            assert_allclose(ts.positions, golden["positions"][i],
                            atol=0.011)
            assert_allclose(ts.dimensions, golden["dimensions"],
                            atol=1e-4)

    def test_header_spec_fields_plain_path(self):
        """XDR layout for ≤ 9 atoms (uncompressed per xdrfile): magic
        1995, natoms, step, time, 3x3 box, lsize, then plain >f4
        coordinates in nm — NO precision field on this path."""
        with open(GOLD_XTC, "rb") as fh:
            buf = fh.read()
        magic, natoms, step = struct.unpack_from(">iii", buf, 0)
        assert magic == 1995
        assert natoms == 5
        assert step == 0
        (t,) = struct.unpack_from(">f", buf, 12)
        assert t == 0.0
        box = np.frombuffer(buf, ">f4", 9, 16).reshape(3, 3)
        assert_allclose(np.diag(box), [2.0, 2.0, 2.0], atol=1e-6)
        (lsize,) = struct.unpack_from(">i", buf, 52)
        assert lsize == 5
        golden = np.load(GOLD_NPZ)
        coords_nm = np.frombuffer(buf, ">f4", 15, 56).reshape(5, 3)
        assert_allclose(coords_nm * 10.0, golden["positions"][0],
                        atol=1e-5)

    def test_header_spec_fields_compressed_path(self, golden):
        """> 9 atoms: the compressed block carries natoms echoed,
        precision, minint/maxint bounds, smallidx, nbytes."""
        with open(GOLD_XTC12, "rb") as fh:
            buf = fh.read()
        magic, natoms, step = struct.unpack_from(">iii", buf, 0)
        assert magic == 1995
        assert natoms == 12
        (lsize,) = struct.unpack_from(">i", buf, 52)
        assert lsize == 12
        (prec,) = struct.unpack_from(">f", buf, 56)
        assert prec == 1000.0
        minint = struct.unpack_from(">3i", buf, 60)
        maxint = struct.unpack_from(">3i", buf, 72)
        assert all(mn <= mx for mn, mx in zip(minint, maxint))
        # decoded values match the source to quantization grid
        r = XTCReader(GOLD_XTC12)
        for i in range(3):
            assert_allclose(r[i].positions, golden["positions12"][i],
                            atol=0.011)

    def test_legacy_literal_stream_still_decodes(self, golden):
        """golden12.xtc was frozen from the round-1 literal-only
        encoder (every seed followed by flag=0, run never set). The
        run-length encoder landed later; this fixture pins decoder
        backward compatibility with literal streams."""
        r = XTCReader(GOLD_XTC12)
        for i in range(3):
            assert_allclose(r[i].positions, golden["positions12"][i],
                            atol=0.011)

    def test_rle_bytes_frozen(self, golden, tmp_path):
        """golden_rle.xtc freezes the run-length encoder's bitstream
        on clustered (water-like) coordinates that exercise delta
        runs, the adaptive ladder, and the seed swap."""
        from transport_analysis_tpu.io.xtc import XTCWriter

        out = tmp_path / "re_rle.xtc"
        with XTCWriter(out, n_atoms=60) as w:
            for i in range(3):
                w.write(positions=golden["positions_rle"][i],
                        dimensions=golden["dimensions"],
                        time=0.5 * i, step=i)
        gold = os.path.join(HERE, "golden", "golden_rle.xtc")
        with open(gold, "rb") as fh:
            want = fh.read()
        assert out.read_bytes() == want
        # the fixture decodes back to the source at quantization grid
        r = XTCReader(gold)
        for i in range(3):
            assert_allclose(r[i].positions, golden["positions_rle"][i],
                            atol=0.011)

    def test_rle_actually_compresses(self, golden, tmp_path):
        """Clustered coordinates must compress materially better than
        the literal encoding (12 bytes/atom quantized ≈ upper bound)."""
        gold = os.path.join(HERE, "golden", "golden_rle.xtc")
        per_frame = (os.path.getsize(gold) / 3) - 56  # header ≈ 56 B
        bits_literal = 60 * 3 * 17  # ~17 bits/component at this range
        assert per_frame < bits_literal / 8 * 0.72

    def test_bytes_frozen(self, golden, tmp_path):
        from transport_analysis_tpu.io.xtc import XTCWriter

        out = tmp_path / "re.xtc"
        with XTCWriter(out, n_atoms=5) as w:
            for i in range(3):
                w.write(positions=golden["positions"][i],
                        dimensions=golden["dimensions"],
                        time=0.5 * i, step=i)
        with open(GOLD_XTC, "rb") as fh:
            want = fh.read()
        assert out.read_bytes() == want


class TestGoldenDCD:
    """CHARMM DCD: byte-frozen fixture + raw-struct header assertions
    against the public CHARMM/NAMD dcdlib layout (Fortran records,
    'CORD' magic, icntrl block, AKMA time unit)."""

    def test_decoded_values(self, golden2):
        from transport_analysis_tpu.io.dcd import DCDReader

        r = DCDReader(GOLD_DCD)
        assert r.n_frames == 3
        assert r.n_atoms == 7
        for i in range(3):
            ts = r[i]
            assert_allclose(ts.positions, golden2["positions"][i],
                            atol=1e-6)
            assert_allclose(ts.dimensions, golden2["dimensions"],
                            atol=1e-4)
        assert not r.ts.has_velocities  # the no-velocities error path

    def test_header_spec_fields(self):
        with open(GOLD_DCD, "rb") as fh:
            buf = fh.read()
        # Fortran record 1: length 84, 'CORD', 20-int icntrl block
        (rlen,) = struct.unpack_from("<i", buf, 0)
        assert rlen == 84
        assert buf[4:8] == b"CORD"
        icntrl = struct.unpack_from("<20i", buf, 8)
        assert icntrl[0] == 3          # nset: frames (patched on close)
        assert icntrl[2] == 1          # nsavc
        assert icntrl[10] == 1         # unit-cell flag
        assert icntrl[19] == 24        # CHARMM version marker
        # CHARMM stores the timestep as AKMA float in icntrl[9]
        (delta,) = struct.unpack_from("<f", buf, 8 + 9 * 4)
        assert delta == pytest.approx(0.5 / 4.888821e-2, rel=1e-6)
        (rlen_end,) = struct.unpack_from("<i", buf, 88)
        assert rlen_end == 84
        # record 2: title; record 3: natoms
        (tlen,) = struct.unpack_from("<i", buf, 92)
        assert tlen == 84
        off = 92 + 4 + tlen + 4
        nlen, natoms, nlen_end = struct.unpack_from("<3i", buf, off)
        assert (nlen, natoms, nlen_end) == (4, 7, 4)
        off += 12
        # first frame: 48-byte unit-cell record (a, cos γ, b, cos β,
        # cos α, c as f64), then three natoms-float records (x, y, z)
        (clen,) = struct.unpack_from("<i", buf, off)
        assert clen == 48
        cell = np.frombuffer(buf, "<f8", 6, off + 4)
        assert_allclose([cell[0], cell[2], cell[5]],
                        [18.0, 20.0, 22.0])
        assert_allclose([cell[1], cell[3], cell[4]], 0.0, atol=1e-12)
        off += 4 + 48 + 4
        (xlen,) = struct.unpack_from("<i", buf, off)
        assert xlen == 7 * 4

    def test_bytes_frozen(self, golden2, tmp_path):
        from transport_analysis_tpu.io.dcd import DCDWriter

        out = tmp_path / "re.dcd"
        with DCDWriter(out, n_atoms=7, dt=0.5) as w:
            for i in range(3):
                w.write(positions=golden2["positions"][i],
                        dimensions=golden2["dimensions"])
        with open(GOLD_DCD, "rb") as fh:
            want = fh.read()
        assert out.read_bytes() == want

    def test_third_party_read(self, golden2):
        """Independent third-party cross-read of the byte-frozen DCD
        (VERDICT r2-r4 carry): when MDAnalysis is importable, its own
        libdcd-backed reader must decode our golden to the same
        coordinates. The development image ships no MD packages, so
        this lane is env-gated (skip, not fail) — any CI or user
        environment with MDAnalysis installed validates the format
        automatically; PARITY.md records the standing rationale.
        NetCDF and H5MD already cross-read via scipy/h5py."""
        mda = pytest.importorskip("MDAnalysis")
        from MDAnalysis.coordinates.DCD import DCDReader as MDADCD

        rdr = MDADCD(GOLD_DCD)
        assert rdr.n_atoms == 7
        frames = [(ts.positions.copy(), ts.dimensions.copy())
                  for ts in rdr]
        assert len(frames) == 3
        for i, (pos, dims) in enumerate(frames):
            assert_allclose(pos, golden2["positions"][i], atol=1e-5)
            assert_allclose(dims[:3], golden2["dimensions"][:3],
                            atol=1e-4)
        assert mda.__version__  # document which validator ran


class TestGoldenNCDF:
    """Amber NetCDF: byte-frozen fixture + raw-struct assertions on
    the NetCDF-3 (64-bit offset) container and the AMBER conventions
    (units, names, velocity scale_factor 20.455)."""

    def test_decoded_values(self, golden2):
        from transport_analysis_tpu.io.netcdf import (
            AMBER_VEL_SCALE, NCDFReader,
        )

        r = NCDFReader(GOLD_NCDF)
        assert r.n_frames == 3
        assert r.n_atoms == 7
        for i in range(3):
            ts = r[i]
            assert_allclose(ts.positions, golden2["positions"][i],
                            atol=1e-5)
            # on disk: Å per 1/20.455 ps; API: Å/ps
            want_v = (
                golden2["velocities"][i].astype(np.float64)
                / AMBER_VEL_SCALE
            ).astype(np.float32) * AMBER_VEL_SCALE
            assert_allclose(ts.velocities, want_v, atol=1e-4)
            assert ts.time == pytest.approx(0.5 * i)
            assert_allclose(ts.dimensions, golden2["dimensions"],
                            atol=1e-6)

    def test_container_spec_fields(self):
        with open(GOLD_NCDF, "rb") as fh:
            buf = fh.read()
        # NetCDF-3 64-bit-offset magic: 'CDF' 0x02
        assert buf[:4] == b"CDF\x02"
        # AMBER conventions are plain-text in the header block
        for token in (
            b"Conventions", b"AMBER", b"coordinates", b"velocities",
            b"cell_lengths", b"cell_angles", b"angstrom",
            b"picosecond", b"scale_factor", b"spatial", b"frame",
        ):
            assert token in buf, token
        # scale_factor attr: NC_FLOAT (type 5), one element, 20.455
        i = buf.find(b"scale_factor")
        assert i >= 0
        sf = (b"\x00\x00\x00\x05\x00\x00\x00\x01"
              + struct.pack(">f", 20.455))
        assert buf[i + 12:i + 12 + len(sf)] == sf

    def test_scipy_ecosystem_read(self, golden2):
        """scipy's netcdf module IS an independent ecosystem reader;
        it must see the AMBER layout directly (no codec of ours)."""
        from scipy.io import netcdf_file

        nc = netcdf_file(GOLD_NCDF, "r", mmap=False)
        v = nc.variables
        assert v["coordinates"].units == b"angstrom"
        assert v["time"].units == b"picosecond"
        assert v["velocities"].scale_factor == pytest.approx(20.455)
        assert v["coordinates"].shape == (3, 7, 3)
        assert_allclose(np.array(v["cell_angles"][0]), [90, 90, 90])
        nc.close()

    def test_bytes_frozen(self, golden2, tmp_path):
        from transport_analysis_tpu.io.netcdf import NCDFWriter

        out = tmp_path / "re.ncdf"
        with NCDFWriter(out, n_atoms=7, velocities=True) as w:
            for i in range(3):
                w.write(positions=golden2["positions"][i],
                        velocities=golden2["velocities"][i],
                        dimensions=golden2["dimensions"],
                        time=0.5 * i)
        with open(GOLD_NCDF, "rb") as fh:
            want = fh.read()
        assert out.read_bytes() == want


class TestGoldenH5MD:
    """H5MD: frozen fixture verified through h5py DIRECTLY (the
    ecosystem HDF5 library — our reader cannot mask writer drift),
    spec assertions on the H5MD 1.1 layout, and a structural
    writer-drift check."""

    def test_decoded_values(self, golden2):
        from transport_analysis_tpu.io.h5md import H5MDReader

        r = H5MDReader(GOLD_H5MD)
        assert r.n_frames == 3
        assert r.n_atoms == 7
        for i in range(3):
            ts = r[i]
            assert_allclose(ts.positions, golden2["positions"][i],
                            atol=1e-6)
            assert_allclose(ts.velocities, golden2["velocities"][i],
                            atol=1e-6)
            assert ts.time == pytest.approx(0.5 * i)
            assert_allclose(ts.dimensions[:3],
                            golden2["dimensions"][:3], atol=1e-9)

    def test_h5md_spec_layout(self, golden2):
        h5py = pytest.importorskip("h5py")
        with h5py.File(GOLD_H5MD, "r") as f:
            assert list(f["h5md"].attrs["version"]) == [1, 1]
            g = f["particles/trajectory"]
            pv = g["position/value"]
            assert pv.shape == (3, 7, 3)
            assert pv.dtype == np.float32
            assert pv.attrs["unit"] in ("Angstrom", b"Angstrom")
            assert g["position/time"].attrs["unit"] in ("ps", b"ps")
            vv = g["velocity/value"]
            assert vv.attrs["unit"] in (
                "Angstrom ps-1", b"Angstrom ps-1"
            )
            box = g["box"]
            assert box.attrs["dimension"] == 3
            assert_allclose(box["edges/value"][0],
                            golden2["dimensions"][:3])
            # datasets hold the source values (h5py read, not ours)
            assert_allclose(pv[1], golden2["positions"][1], atol=1e-6)
            assert_allclose(vv[2], golden2["velocities"][2],
                            atol=1e-6)
            assert list(g["position/step"][:]) == [0, 1, 2]

    def test_writer_structural_freeze(self, golden2, tmp_path):
        """Re-encoding must reproduce the frozen file's full HDF5
        structure — every dataset path, dtype, shape, attrs, and
        value, walked with h5py (bytes can shift across h5py
        versions; structure must not)."""
        h5py = pytest.importorskip("h5py")
        from transport_analysis_tpu.io.h5md import H5MDWriter

        out = tmp_path / "re.h5md"
        with H5MDWriter(out, n_atoms=7, velocities=True) as w:
            for i in range(3):
                w.write(positions=golden2["positions"][i],
                        velocities=golden2["velocities"][i],
                        dimensions=golden2["dimensions"],
                        time=0.5 * i)

        def walk(f):
            items = {}

            def visit(name, obj):
                attrs = {
                    k: (list(v) if isinstance(v, np.ndarray) else v)
                    for k, v in obj.attrs.items()
                }
                if isinstance(obj, h5py.Dataset):
                    items[name] = (
                        str(obj.dtype), obj.shape, attrs,
                        np.asarray(obj[()]).tobytes(),
                    )
                else:
                    items[name] = ("group", attrs)
            f.visititems(visit)
            return items

        with h5py.File(GOLD_H5MD, "r") as fg, h5py.File(
            out, "r"
        ) as fo:
            want, got = walk(fg), walk(fo)
        assert set(want) == set(got)
        for name in want:
            assert got[name] == want[name], name
