"""Trajectory / topology file I/O.

Format dispatch by file extension. Readers implement the ProtoReader
batch contract (core/trajectory.py); the hot binary decoders (TRR, DCD)
have a C++ fast path with a pure-Python fallback.
"""

from __future__ import annotations

import os


def _ext(path) -> str:
    return os.path.splitext(str(path))[1].lower().lstrip(".")


def load_topology(path):
    """Parse a topology file → core.topology.Topology."""
    ext = _ext(path)
    if ext == "pdb":
        from .pdb import parse_pdb_topology

        return parse_pdb_topology(path)
    if ext == "psf":
        from .psf import parse_psf_topology

        return parse_psf_topology(path)
    raise ValueError(f"unsupported topology format: .{ext}")


def open_trajectory(path, n_atoms=None):
    """Open a trajectory file → ProtoReader subclass."""
    ext = _ext(path)
    if ext == "trr":
        from .trr import TRRReader

        return TRRReader(path)
    if ext == "xtc":
        from .xtc import XTCReader

        return XTCReader(path)
    if ext == "dcd":
        from .dcd import DCDReader

        return DCDReader(path)
    if ext in ("nc", "ncdf", "netcdf"):
        from .netcdf import NCDFReader

        return NCDFReader(path)
    if ext in ("h5md", "h5", "hdf5"):
        from .h5md import H5MDReader

        return H5MDReader(path)
    if ext == "pdb":
        from .pdb import PDBReader

        return PDBReader(path)
    raise ValueError(f"unsupported trajectory format: .{ext}")
