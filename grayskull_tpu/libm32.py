"""float32 ``atan2f`` / ``sinf`` used by the ORB orientation/descriptor path.

The reference calls libm ``atan2f``/``sinf`` (grayskull.h:100-101), so its exact
bit-level output depends on WHICH libm the C code was linked against — it is not a
semantic constant of the reference.  (This sandbox's glibc 2.36 ships the newer
ARM optimized-routines float trig: not the classic fdlibm code, and not exactly
the correctly-rounded-from-f64 result either.)

Two modes:

* **fast (default)** — on-device: compute in float64 and round to float32.  This
  is the correctly-rounded float32 result except for astronomically rare double
  rounding; it differs from any particular libm by <= 1 ulp.  Pure XLA, runs on
  TPU, no host sync.
* **exact_host** — ``jax.pure_callback`` into the process's actual libm via
  ctypes.  Bit-identical to what the C reference produces *on this machine*.
  Used by the differential test-suite; costs a host round-trip, so keep it off in
  production pipelines.

Angle error of <= 1 ulp can flip an ``(int)`` truncation in the BRIEF rotation for
a handful of pattern points, so descriptor parity in fast mode is asserted
statistically (>= 99.9% of bits) while exact_host mode is asserted bit-for-bit.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import jax
import jax.numpy as jnp
import numpy as np

from .exactf32 import f32_add

__all__ = ["atan2f", "sinf", "cosf_like_reference", "use_exact_host_libm", "exact_mode"]

_EXACT_HOST = False


def exact_mode() -> bool:
    """True when bit-exact (host-libm / emulated-f32) parity mode is active."""
    return _EXACT_HOST


def use_exact_host_libm(enable: bool = True):
    """Toggle bit-exact host-libm trig (used by the parity test-suite).

    The mode is baked in at trace time, so compiled-function caches are cleared
    on toggle.
    """
    global _EXACT_HOST
    if _EXACT_HOST != bool(enable):
        _EXACT_HOST = bool(enable)
        jax.clear_caches()


_libm = None


def _get_libm():
    global _libm
    if _libm is None:
        _libm = ctypes.CDLL(ctypes.util.find_library("m") or "libm.so.6")
        _libm.atan2f.restype = ctypes.c_float
        _libm.atan2f.argtypes = [ctypes.c_float, ctypes.c_float]
        _libm.sinf.restype = ctypes.c_float
        _libm.sinf.argtypes = [ctypes.c_float]
    return _libm


def _host_atan2f(y, x):
    m = _get_libm()
    y = np.asarray(y, np.float32)
    x = np.asarray(x, np.float32)
    out = np.empty(y.shape, np.float32)
    for i, (yy, xx) in enumerate(zip(y.ravel(), x.ravel())):
        out.ravel()[i] = m.atan2f(float(yy), float(xx))
    return out


def _host_sinf(x):
    m = _get_libm()
    x = np.asarray(x, np.float32)
    out = np.empty(x.shape, np.float32)
    for i, xx in enumerate(x.ravel()):
        out.ravel()[i] = m.sinf(float(xx))
    return out


def atan2f(y, x):
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    y, x = jnp.broadcast_arrays(y, x)
    if _EXACT_HOST:
        return jax.pure_callback(
            _host_atan2f, jax.ShapeDtypeStruct(y.shape, jnp.float32), y, x,
            vmap_method="expand_dims",
        )
    with jax.enable_x64(True):
        return jnp.arctan2(y.astype(jnp.float64), x.astype(jnp.float64)).astype(jnp.float32)


def sinf(x):
    x = jnp.asarray(x, jnp.float32)
    if _EXACT_HOST:
        return jax.pure_callback(
            _host_sinf, jax.ShapeDtypeStruct(x.shape, jnp.float32), x,
            vmap_method="expand_dims",
        )
    with jax.enable_x64(True):
        return jnp.sin(x.astype(jnp.float64)).astype(jnp.float32)


def cosf_like_reference(x):
    """The reference's cosine: ``gs_sin(angle + 1.57079f)`` (grayskull.h:626) —
    note the truncated constant; this is NOT cos(angle)."""
    return sinf(f32_add(x, jnp.float32(1.57079)))
