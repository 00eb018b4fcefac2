"""Native (C++) decode fast paths, lazily compiled and ctypes-bound.

``get_trr_decoder()`` returns a batched TRR decode callable backed by
libtrrdecode.so, compiling it with g++ on first use and caching the
shared object next to the source. Falls back to ``None`` (pure-Python
decode) if no toolchain is available or
``TRANSPORT_ANALYSIS_TPU_NO_NATIVE`` is set.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "trr_decode.cpp")
_XTC_SRC = os.path.join(_HERE, "xtc_codec.cpp")

_lock = threading.Lock()
_lib = None
_lib_failed = False
_xtc_lib = None
_xtc_failed = False


def _build_dirs():
    """Candidate artifact directories: next to the source first, then
    a per-user cache (read-only site-packages installs can't write to
    the package dir)."""
    cache = os.path.join(
        os.path.expanduser(
            os.environ.get("XDG_CACHE_HOME", "~/.cache")
        ),
        "transport_analysis_tpu",
        "native",
    )
    return [_HERE, cache]


def _compile(src: str, base: str) -> str:
    """Build (or reuse) a shared object for ``src``; returns its path.

    The artifact name embeds a hash of the source, so staleness
    detection never depends on mtimes (git checkouts give source and
    binary equal mtimes, which made an mtime check silently keep a
    stale binary). A changed source simply compiles to a new name.
    Builds land next to the source when writable, else in the user
    cache dir.
    """
    with open(src, "rb") as fh:
        digest = hashlib.sha1(fh.read()).hexdigest()[:12]
    name = f"{base}-{digest}.so"
    candidates = _build_dirs()
    for d in candidates:
        so = os.path.join(d, name)
        if os.path.exists(so):
            return so
    last_err = None
    for d in candidates:
        so = os.path.join(d, name)
        tmp = so + f".tmp{os.getpid()}"
        try:
            os.makedirs(d, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src,
                 "-lpthread"],
                check=True,
                capture_output=True,
            )
            os.replace(tmp, so)  # atomic: concurrent builders race benignly
            return so
        except (OSError, subprocess.CalledProcessError) as e:
            last_err = e
            continue
    raise last_err


def load_xtc_codec():
    """ctypes handle to the XTC bitstream codec, or None."""
    global _xtc_lib, _xtc_failed
    if _xtc_lib is not None or _xtc_failed:
        return _xtc_lib
    with _lock:
        if _xtc_lib is not None or _xtc_failed:
            return _xtc_lib
        if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_NATIVE"):
            _xtc_failed = True
            return None
        try:
            lib = ctypes.CDLL(_compile(_XTC_SRC, "libxtccodec"))
            lib.xtc_decode.restype = ctypes.c_int
            lib.xtc_decode.argtypes = [
                ctypes.c_int64,                       # natoms
                ctypes.c_float,                       # precision
                np.ctypeslib.ndpointer(np.int32),     # minint
                np.ctypeslib.ndpointer(np.int32),     # maxint
                ctypes.c_int32,                       # smallidx
                ctypes.c_char_p,                      # data
                ctypes.c_int64,                       # len
                np.ctypeslib.ndpointer(np.float32),   # out
            ]
            lib.xtc_encode.restype = ctypes.c_int64
            lib.xtc_encode.argtypes = [
                np.ctypeslib.ndpointer(np.float32),   # coords
                ctypes.c_int64,                       # natoms
                ctypes.c_float,                       # precision
                np.ctypeslib.ndpointer(np.int32),     # minint out
                np.ctypeslib.ndpointer(np.int32),     # maxint out
                np.ctypeslib.ndpointer(np.int32),     # smallidx out
                np.ctypeslib.ndpointer(np.uint8),     # out
                ctypes.c_int64,                       # cap
            ]
            _xtc_lib = lib
        except Exception:
            _xtc_failed = True
    return _xtc_lib


def _load_library():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("TRANSPORT_ANALYSIS_TPU_NO_NATIVE"):
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_compile(_SRC, "libtrrdecode"))
            lib.trr_decode_batch.restype = ctypes.c_int
            lib.trr_decode_batch.argtypes = [
                ctypes.c_void_p,                    # buf (mmap base)
                np.ctypeslib.ndpointer(np.int64),   # data_offsets
                ctypes.c_int64,                     # n_frames
                ctypes.c_int64,                     # natoms
                ctypes.c_int,                       # is_double
                ctypes.c_int64,                     # box_size
                ctypes.c_int64,                     # x_size
                ctypes.c_int64,                     # v_size
                ctypes.c_void_p,                    # positions
                ctypes.c_void_p,                    # velocities
                ctypes.c_void_p,                    # volumes
                ctypes.c_int,                       # n_threads
            ]
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def get_trr_decoder():
    """Batched TRR decoder: callable(reader, indices) → batch dict,
    or None when the native library is unavailable."""
    lib = _load_library()
    if lib is None:
        return None

    def decode(reader, indices) -> dict:
        index = reader._index
        first = index[0]
        # layouts must be uniform across the selection for one native call
        for i in indices:
            info = index[int(i)]
            if (
                info.natoms != first.natoms
                or info.double != first.double
                or info.box_size != first.box_size
                or info.x_size != first.x_size
                or info.v_size != first.v_size
            ):
                return reader._read_frames_batch_py(indices)

        F = len(indices)
        offsets = np.array(
            [index[int(i)].data_offset for i in indices], np.int64
        )
        out = {"frames": np.asarray(indices, np.int64)}
        positions = velocities = None
        if first.x_size:
            positions = np.empty((F, reader.n_atoms, 3), np.float32)
            out["positions"] = positions
        if first.v_size:
            velocities = np.empty((F, reader.n_atoms, 3), np.float32)
            out["velocities"] = velocities
        volumes = np.zeros(F, np.float64)
        out["volumes"] = volumes
        out["times"] = np.array(
            [index[int(i)].time for i in indices], np.float64
        )
        from .._mmap import base_address

        n_threads = min(8, os.cpu_count() or 1)
        lib.trr_decode_batch(
            base_address(reader._buf),
            offsets,
            F,
            reader.n_atoms,
            1 if first.double else 0,
            first.box_size,
            first.x_size,
            first.v_size,
            None if positions is None else positions.ctypes.data,
            None if velocities is None else velocities.ctypes.data,
            volumes.ctypes.data,
            n_threads,
        )
        return out

    return decode
