"""float32 ``atan2f`` / ``sinf`` used by the ORB orientation/descriptor path.

The reference calls libm ``atan2f``/``sinf`` (grayskull.h:100-101), so its exact
bit-level output depends on WHICH libm the C code was linked against — it is not a
semantic constant of the reference.  (This sandbox's glibc 2.36 ships the newer
ARM optimized-routines float trig: not the classic fdlibm code, and not exactly
the correctly-rounded-from-f64 result either.)

Three modes:

* **fast (default)** — on-device: compute in float64 and round to float32.  This
  is the correctly-rounded float32 result except for astronomically rare double
  rounding; it differs from any particular libm by <= 1 ulp.  Pure XLA, runs on
  TPU, no host sync.
* **exact_host** — ``jax.pure_callback`` into the process's actual libm via
  ctypes.  Bit-identical to what the C reference produces *on this machine*.
  Used by the differential test-suite; costs a host round-trip, so keep it off in
  production pipelines.
* **freestanding** — the reference's ``GS_NO_STDLIB`` polynomial approximations
  (octant atan2 + range-reduced 5th-order sine, grayskull.h:70-88), the math the
  nostdlib WASM build actually ships.  Pure XLA (no host sync); float adds that
  C leaves unfused go through the contraction-proof emulated adder, so results
  are bit-exact vs a GS_NO_STDLIB-compiled oracle on CPU (on TPU the two
  divisions may differ by <= 1 ulp).

Angle error of <= 1 ulp can flip an ``(int)`` truncation in the BRIEF rotation for
a handful of pattern points, so descriptor parity in fast mode is asserted
statistically (>= 99.9% of bits) while exact_host/freestanding modes are asserted
bit-for-bit.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import jax
import jax.numpy as jnp
import numpy as np

from .exactf32 import f32_add, f32_sub

__all__ = [
    "atan2f", "sinf", "cosf_like_reference",
    "use_exact_host_libm", "use_freestanding", "exact_mode", "trig_mode",
]

_MODE = "fast"  # "fast" | "exact_host" | "freestanding"


def exact_mode() -> bool:
    """True when a bit-exact parity mode (emulated-f32 adds) is active."""
    return _MODE != "fast"


def trig_mode() -> str:
    return _MODE


def _set_mode(mode: str):
    global _MODE
    if _MODE != mode:
        _MODE = mode
        jax.clear_caches()  # the mode is baked in at trace time


def use_exact_host_libm(enable: bool = True):
    """Toggle bit-exact host-libm trig (used by the parity test-suite)."""
    _set_mode("exact_host" if enable else "fast")


def use_freestanding(enable: bool = True):
    """Toggle the reference's GS_NO_STDLIB polynomial trig (grayskull.h:70-88)."""
    _set_mode("freestanding" if enable else "fast")


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


def _freestanding_atan2(y, x):
    """``gs_atan2`` under GS_NO_STDLIB (grayskull.h:71-79), vectorized.

    C's ``0.785398f - 0.785398f*r`` is mul feeding sub — XLA would contract it
    into an FMA with different rounding, so the sub is the emulated adder.
    """
    c = jnp.float32(0.785398)
    c3 = np.float32(3.0) * np.float32(0.785398)  # folded in f32 like the C compiler
    abs_y = jnp.where(y >= 0.0, y, -y)
    ang_pos = f32_sub(c, c * ((x - abs_y) / (x + abs_y)))
    ang_neg = f32_sub(jnp.float32(c3), c * ((x + abs_y) / (abs_y - x)))
    angle = jnp.where(x >= 0.0, ang_pos, ang_neg)
    angle = jnp.where(y < 0.0, -angle, angle)
    half_pi = jnp.float32(1.570796)
    zero_case = jnp.where(y > 0.0, half_pi, jnp.where(y < 0.0, -half_pi, jnp.float32(0.0)))
    return jnp.where(x == 0.0, zero_case, angle)


def _freestanding_sin(x):
    """``gs_sin`` under GS_NO_STDLIB (grayskull.h:81-88), vectorized."""
    pi = jnp.float32(3.141592)
    two_pi = jnp.float32(6.283185)
    # C's while-loop range reduction, element-wise (plain subs; no mul to fuse)
    x = jax.lax.while_loop(
        lambda v: jnp.any(v > pi), lambda v: jnp.where(v > pi, v - two_pi, v), x
    )
    x = jax.lax.while_loop(
        lambda v: jnp.any(v < -pi), lambda v: jnp.where(v < -pi, v + two_pi, v), x
    )
    neg = x < 0.0
    x = jnp.where(neg, -x, x)
    x = jnp.where(x > jnp.float32(1.570796), pi - x, x)
    x2 = x * x
    t = f32_sub(jnp.float32(0.16666667), jnp.float32(0.0083333310) * x2)
    res = x * f32_sub(jnp.float32(1.0), x2 * t)
    return jnp.where(neg, -res, res)


def atan2f(y, x):
    y = jnp.asarray(y, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    y, x = jnp.broadcast_arrays(y, x)
    if _MODE == "exact_host":
        return jax.pure_callback(
            _host_atan2f, jax.ShapeDtypeStruct(y.shape, jnp.float32), y, x,
            vmap_method="expand_dims",
        )
    if _MODE == "freestanding":
        return _freestanding_atan2(y, x)
    with jax.enable_x64(True):
        return jnp.arctan2(y.astype(jnp.float64), x.astype(jnp.float64)).astype(jnp.float32)


def sinf(x):
    x = jnp.asarray(x, jnp.float32)
    if _MODE == "exact_host":
        return jax.pure_callback(
            _host_sinf, jax.ShapeDtypeStruct(x.shape, jnp.float32), x,
            vmap_method="expand_dims",
        )
    if _MODE == "freestanding":
        return _freestanding_sin(x)
    with jax.enable_x64(True):
        return jnp.sin(x.astype(jnp.float64)).astype(jnp.float32)


def cosf_like_reference(x):
    """The reference's cosine: ``gs_sin(angle + 1.57079f)`` (grayskull.h:626) —
    note the truncated constant; this is NOT cos(angle)."""
    return sinf(f32_add(x, jnp.float32(1.57079)))
