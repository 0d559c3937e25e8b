"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths execute without
TPU hardware (the environment's default backend may be a single tunneled TPU chip).
The env vars must be set before JAX initializes its backends, which happens lazily —
so this module sets them at import time, before any jax computation runs.
"""

import os

# Force 8 virtual CPU devices for mesh tests.  Appended (not overwritten) so any
# driver-provided flags survive.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The sandbox registers an experimental TPU backend as the default platform and
# pins JAX_PLATFORMS; CPU devices are still available, so route everything there
# (unit tests must not burn TPU compiles, and sharding tests need 8 devices).
# GRAYSKULL_TEST_TPU=1 keeps the TPU default so the @pytest.mark.tpu parity
# tests (Pallas kernels vs the CPU/XLA paths) actually execute:
#     GRAYSKULL_TEST_TPU=1 pytest tests/ -m tpu -q        (make test-tpu)
#
# jax_platforms must flip to cpu BEFORE any backend initializes: the first
# jax.devices() call builds EVERY selected backend, and with the tunneled
# TPU platform selected that dials the remote relay — a dead tunnel then
# hangs the whole CPU test suite on the very first device lookup.
if not os.environ.get("GRAYSKULL_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_device", jax.devices("cpu")[0])

REFERENCE_DIR = os.environ.get("GRAYSKULL_REF", "/root/reference")


def cpu_devices(n=None):
    devs = jax.devices("cpu")
    return devs if n is None else devs[:n]


@pytest.fixture(scope="session")
def ref_dir():
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not available")
    return REFERENCE_DIR


@pytest.fixture(scope="session")
def oracle():
    """Compiled C reference oracle (ctypes).  Skips if unavailable."""
    from . import oracle as oracle_mod

    orc = oracle_mod.load(REFERENCE_DIR)
    if orc is None:
        pytest.skip("C oracle unavailable (no reference checkout or no C compiler)")
    return orc


@pytest.fixture(scope="session")
def ns_oracle():
    """GS_NO_STDLIB-compiled reference oracle (polynomial trig)."""
    from . import oracle as oracle_mod

    orc = oracle_mod.load_nostdlib(REFERENCE_DIR)
    if orc is None:
        pytest.skip("nostdlib oracle unavailable")
    return orc


@pytest.fixture(scope="session")
def testdata():
    """Dict of name -> (H, W) uint8 for the reference's PGM test images.

    Falls back to ``tests/golden/testdata/`` (vendored lena/aruco plus
    deterministic synthetic stand-ins for document/receipt/grayskull at the
    real frame sizes, baked by tools/gen_goldens.py) so the content-agnostic
    tests — sharded-vs-unsharded comparisons, IO roundtrips — still run in CI
    without the reference checkout.  Oracle-differential tests skip on the
    ``oracle`` fixture regardless.
    """
    import grayskull_tpu.io as gio

    tdir = os.path.join(REFERENCE_DIR, "testdata")
    if not os.path.isdir(tdir):
        tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "golden", "testdata")
        if not os.path.isdir(tdir):
            pytest.skip("no test images (reference absent, fallback not baked)")
    out = {}
    for fn in sorted(os.listdir(tdir)):
        if fn.endswith(".pgm"):
            img = gio.read_pgm(os.path.join(tdir, fn))
            assert img is not None, fn
            out[fn[:-4]] = img
    return out


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator couples test
    # CONTENT to collection order — adding an unrelated test once shifted
    # the sequence so the batch-loader roundtrip drew a frame whose first
    # pixel is a whitespace byte, which the reference's fscanf header
    # parser (and our faithful codecs) cannot read back (see
    # test_native.test_whitespace_first_pixel_quirk)
    return np.random.default_rng(1234)


def tpu_default():
    """True when Pallas kernels will actually dispatch to a TPU: backend is
    TPU and the default device has not been pinned elsewhere (e.g. to CPU by
    this conftest).  Shared by the @pytest.mark.tpu skipifs."""
    import jax

    d = jax.config.jax_default_device
    return jax.default_backend() == "tpu" and (
        d is None or getattr(d, "platform", "tpu") == "tpu"
    )
