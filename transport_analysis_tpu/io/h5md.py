"""H5MD trajectory reader/writer (HDF5 via h5py).

H5MD is the other velocity-capable format the reference points users
at (reference viscosity.py:33-35 docstring). Layout per the H5MD spec:
``/particles/<group>/{position,velocity}/value`` with ``time`` datasets
and ``box/edges``. MDAnalysis unit conventions (Å, ps, Å/ps) are
assumed on read unless the file declares units.

Gated on h5py availability; importing this module without h5py raises
an informative ImportError.
"""

from __future__ import annotations

import numpy as np

from ..core.timestep import Timestep
from ..core.trajectory import ProtoReader

try:
    import h5py
except ImportError as _err:  # pragma: no cover
    h5py = None
    _H5PY_ERR = _err


def _require_h5py():
    if h5py is None:  # pragma: no cover
        raise ImportError(
            "h5py is required for H5MD support"
        ) from _H5PY_ERR


class H5MDReader(ProtoReader):
    format = "H5MD"

    def __init__(self, path, group: str | None = None):
        _require_h5py()
        super().__init__()
        self._file = h5py.File(str(path), "r")
        particles = self._file["particles"]
        if group is None:
            group = next(iter(particles))
        self._grp = particles[group]
        has_pos = "position" in self._grp
        has_vel = "velocity" in self._grp
        ref = self._grp["position" if has_pos else "velocity"]["value"]
        self.n_frames, self.n_atoms = ref.shape[0], ref.shape[1]
        self.ts = Timestep(
            self.n_atoms, positions=has_pos, velocities=has_vel
        )
        self._times = None
        for name in ("position", "velocity"):
            if name in self._grp and "time" in self._grp[name]:
                t = self._grp[name]["time"]
                if t.shape:  # explicit per-frame times
                    self._times = np.asarray(t, np.float64)
                break
        if self._times is not None and self.n_frames > 1:
            self.ts.dt = float(self._times[1] - self._times[0])
        self._edges = None
        box = self._grp.get("box")
        if box is not None and "edges" in box:
            edges = box["edges"]
            if isinstance(edges, h5py.Group):
                self._edges = np.asarray(edges["value"], np.float64)
            else:
                self._edges = np.asarray(edges, np.float64)
        self._read_frame(0)

    def _dims_for(self, i):
        if self._edges is None:
            return None
        e = self._edges[i] if self._edges.ndim > 1 else self._edges
        if e.ndim == 2:  # full box matrix
            from .trr import _box_matrix_to_dimensions

            return _box_matrix_to_dimensions(e)
        return np.array([e[0], e[1], e[2], 90.0, 90.0, 90.0])

    def _read_frame(self, i: int) -> Timestep:
        ts = self.ts
        ts.frame = i
        if ts.has_positions:
            ts.positions = np.asarray(
                self._grp["position"]["value"][i], np.float32
            )
        if ts.has_velocities:
            ts.velocities = np.asarray(
                self._grp["velocity"]["value"][i], np.float32
            )
        ts.time = (
            float(self._times[i]) if self._times is not None else i * ts.dt
        )
        dims = self._dims_for(i)
        if dims is not None:
            ts.dimensions = dims
        return ts

    def read_frames_batch(self, indices) -> dict:
        from ..core.timestep import box_volume

        indices = np.asarray(list(indices), dtype=np.int64)
        out = {"frames": indices}
        idx = list(map(int, indices))
        if self.ts.has_positions:
            out["positions"] = np.asarray(
                self._grp["position"]["value"][idx], np.float32
            )
        if self.ts.has_velocities:
            out["velocities"] = np.asarray(
                self._grp["velocity"]["value"][idx], np.float32
            )
        out["times"] = (
            self._times[indices]
            if self._times is not None
            else indices * self.ts.dt
        )
        out["volumes"] = np.array(
            [
                0.0 if (d := self._dims_for(i)) is None else box_volume(d)
                for i in idx
            ]
        )
        return out

    def close(self):
        self._file.close()


class H5MDWriter:
    """Write H5MD files (position/velocity + cuboid box edges)."""

    def __init__(self, path, n_atoms: int, velocities: bool = False,
                 group: str = "trajectory"):
        _require_h5py()
        self._file = h5py.File(str(path), "w")
        h5md = self._file.create_group("h5md")
        h5md.attrs["version"] = [1, 1]
        author = h5md.create_group("author")
        author.attrs["name"] = "transport_analysis_tpu"
        creator = h5md.create_group("creator")
        creator.attrs["name"] = "transport_analysis_tpu"
        creator.attrs["version"] = "0.1"
        grp = self._file.create_group(f"particles/{group}")
        self._n_atoms = n_atoms
        self._pos_v = grp.create_dataset(
            "position/value", shape=(0, n_atoms, 3),
            maxshape=(None, n_atoms, 3), dtype="f4",
        )
        self._pos_t = grp.create_dataset(
            "position/time", shape=(0,), maxshape=(None,), dtype="f8"
        )
        self._pos_s = grp.create_dataset(
            "position/step", shape=(0,), maxshape=(None,), dtype="i8"
        )
        self._vel_v = None
        if velocities:
            self._vel_v = grp.create_dataset(
                "velocity/value", shape=(0, n_atoms, 3),
                maxshape=(None, n_atoms, 3), dtype="f4",
            )
        box = grp.create_group("box")
        box.attrs["dimension"] = 3
        box.attrs["boundary"] = ["periodic"] * 3
        self._edges = box.create_dataset(
            "edges/value", shape=(0, 3), maxshape=(None, 3), dtype="f8"
        )
        self._i = 0

    def write(self, positions, velocities=None, dimensions=None,
              time: float = 0.0):
        if not isinstance(positions, (np.ndarray, list, tuple)):
            from ._frame import extract_frame

            pos, vel, _frc, dims, t = extract_frame(positions)
            positions = pos
            velocities = vel if velocities is None else velocities
            dimensions = dims if dimensions is None else dimensions
            time = t if t is not None else time
        i = self._i
        for ds in (self._pos_v, self._pos_t, self._pos_s, self._edges):
            ds.resize(i + 1, axis=0)
        self._pos_v[i] = np.asarray(positions, np.float32)
        self._pos_t[i] = time
        self._pos_s[i] = i
        if self._vel_v is not None and velocities is not None:
            self._vel_v.resize(i + 1, axis=0)
            self._vel_v[i] = np.asarray(velocities, np.float32)
        if dimensions is not None:
            self._edges[i] = np.asarray(dimensions[:3], np.float64)
        self._i += 1

    def close(self):
        self._file.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
