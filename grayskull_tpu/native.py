"""ctypes bindings for the native I/O runtime (csrc/gsio.c).

The shared library is looked up next to the package, in ``csrc/``, or built on
first use with the system C compiler (cached).  Everything degrades gracefully:
``available()`` is False when no compiler/library exists and callers fall back
to the pure-Python codec in :mod:`grayskull_tpu.io`.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

__all__ = ["available", "read_pgm", "write_pgm", "read_pgm_batch", "probe_pgm"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_CSRC = os.path.join(_HERE, "..", "csrc")

_lib = None
_tried = False


def _load() -> Optional[ct.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    candidates = [
        os.path.join(_HERE, "libgsio.so"),
        os.path.join(_CSRC, "libgsio.so"),
        os.path.join(tempfile.gettempdir(), "gsio_build", "libgsio.so"),
    ]
    src = os.path.join(_CSRC, "gsio.c")
    for path in candidates:
        if os.path.exists(path) and (
            not os.path.exists(src) or os.path.getmtime(path) >= os.path.getmtime(src)
        ):
            try:
                _lib = _bind(ct.CDLL(path))
                return _lib
            except OSError:
                pass
    # build into the cache dir
    if os.path.exists(src):
        build_dir = os.path.join(tempfile.gettempdir(), "gsio_build")
        os.makedirs(build_dir, exist_ok=True)
        out = os.path.join(build_dir, "libgsio.so")
        try:
            subprocess.run(
                ["cc", "-O2", "-std=c11", "-fPIC", "-shared", "-o", out, src, "-lpthread"],
                check=True, capture_output=True,
            )
            _lib = _bind(ct.CDLL(out))
        except (subprocess.CalledProcessError, FileNotFoundError, OSError):
            _lib = None
    return _lib


_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_u32 = ct.c_uint32


def _bind(lib: ct.CDLL) -> ct.CDLL:
    lib.gsio_probe_pgm_file.argtypes = [ct.c_char_p, ct.POINTER(_u32), ct.POINTER(_u32)]
    lib.gsio_probe_pgm_file.restype = ct.c_int
    lib.gsio_read_pgm.argtypes = [ct.c_char_p, ct.POINTER(_u32), ct.POINTER(_u32), _u8p,
                                  ct.c_size_t]
    lib.gsio_read_pgm.restype = ct.c_int
    lib.gsio_write_pgm.argtypes = [ct.c_char_p, _u8p, _u32, _u32]
    lib.gsio_write_pgm.restype = ct.c_int
    lib.gsio_read_batch.argtypes = [ct.POINTER(ct.c_char_p), ct.c_int, _u32, _u32, _u8p,
                                    _i32p, ct.c_int]
    lib.gsio_read_batch.restype = ct.c_int
    return lib


def available() -> bool:
    return _load() is not None


def probe_pgm(path: str):
    """(w, h) of a PGM file without reading the payload, or None."""
    lib = _load()
    if lib is None:
        return None
    w, h = _u32(), _u32()
    if lib.gsio_probe_pgm_file(path.encode(), ct.byref(w), ct.byref(h)) != 0:
        return None
    return int(w.value), int(h.value)


def read_pgm(path: str) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    dims = probe_pgm(path)
    if dims is None:
        return None
    w, h = dims
    out = np.empty((h, w), np.uint8)
    ww, hh = _u32(), _u32()
    if lib.gsio_read_pgm(path.encode(), ct.byref(ww), ct.byref(hh), out, out.size) != 0:
        return None
    return out


def write_pgm(img: np.ndarray, path: str) -> int:
    lib = _load()
    if lib is None:
        return -1
    img = np.ascontiguousarray(img, np.uint8)
    return int(lib.gsio_write_pgm(path.encode(), img, img.shape[1], img.shape[0]))


def read_pgm_batch(paths, pad_to=None, threads: int = 8) -> np.ndarray:
    """Load PGMs into an (N, H, W) uint8 batch with the threaded C loader.

    ``pad_to=(H, W)`` zero-pads/crops each frame; without it all frames must
    share the first file's dimensions.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native gsio library unavailable")
    paths = list(paths)
    if not paths:
        return np.zeros((0, 0, 0), np.uint8)
    if pad_to is None:
        # match the pure-Python fallback (io.read_pgm_batch): inconsistent
        # frame sizes are an error, not a silent pad/crop to the first file
        dims = probe_pgm(paths[0])
        if dims is None:
            raise IOError(f"cannot read PGM: {paths[0]}")
        for p in paths[1:]:
            d = probe_pgm(p)
            if d is None:
                raise IOError(f"cannot read PGM: {p}")
            if d != dims:
                raise ValueError(
                    f"inconsistent frame sizes without pad_to: {paths[0]} is "
                    f"{dims[0]}x{dims[1]} but {p} is {d[0]}x{d[1]}"
                )
        pad_to = (dims[1], dims[0])
    ph, pw = int(pad_to[0]), int(pad_to[1])
    n = len(paths)
    out = np.zeros((n, ph, pw), np.uint8)
    status = np.zeros(n, np.int32)
    arr = (ct.c_char_p * n)(*[p.encode() for p in paths])
    ok = lib.gsio_read_batch(arr, n, ph, pw, out, status, threads)
    if ok != n:
        bad = [paths[i] for i in range(n) if status[i] != 0]
        raise IOError(f"failed to load {len(bad)} PGMs, first: {bad[0]}")
    return out
