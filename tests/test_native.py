"""Native C I/O runtime tests (csrc/gsio.c via ctypes)."""

import os

import numpy as np
import pytest

from grayskull_tpu import io as gio
from grayskull_tpu import native


@pytest.fixture(scope="module", autouse=True)
def need_native():
    if not native.available():
        pytest.skip("native gsio library unavailable (no C compiler)")


def test_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    assert native.write_pgm(img, p) == 0
    back = native.read_pgm(p)
    np.testing.assert_array_equal(back, img)
    # and cross-check with the pure-Python codec
    np.testing.assert_array_equal(gio.read_pgm(p), img)


def test_probe(tmp_path, rng):
    img = rng.integers(0, 256, (10, 20), dtype=np.uint8)
    p = str(tmp_path / "x.pgm")
    native.write_pgm(img, p)
    assert native.probe_pgm(p) == (20, 10)
    assert native.probe_pgm(str(tmp_path / "missing.pgm")) is None


def test_reads_reference_testdata(ref_dir):
    tdir = os.path.join(ref_dir, "testdata")
    for fn in sorted(os.listdir(tdir)):
        if not fn.endswith(".pgm"):
            continue
        p = os.path.join(tdir, fn)
        a = native.read_pgm(p)
        b = gio.read_pgm(p)
        np.testing.assert_array_equal(a, b, err_msg=fn)


def test_batch_loader(tmp_path, rng):
    paths = []
    frames = []
    for i in range(20):
        img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
        p = str(tmp_path / f"f{i}.pgm")
        native.write_pgm(img, p)
        paths.append(p)
        frames.append(img)
    batch = native.read_pgm_batch(paths, threads=4)
    assert batch.shape == (20, 24, 32)
    for i in range(20):
        np.testing.assert_array_equal(batch[i], frames[i])


def test_batch_loader_padding(tmp_path, rng):
    img = rng.integers(0, 256, (8, 12), dtype=np.uint8)
    p = str(tmp_path / "a.pgm")
    native.write_pgm(img, p)
    batch = native.read_pgm_batch([p], pad_to=(16, 16))
    assert batch.shape == (1, 16, 16)
    np.testing.assert_array_equal(batch[0, :8, :12], img)
    assert batch[0, 8:, :].max() == 0 and batch[0, :, 12:].max() == 0


def test_batch_loader_error(tmp_path):
    with pytest.raises(IOError):
        native.read_pgm_batch([str(tmp_path / "nope.pgm")], pad_to=(8, 8))


def test_malformed_rejected(tmp_path):
    p = str(tmp_path / "bad.pgm")
    open(p, "wb").write(b"P5\n4 4\n65535\n" + b"\x00" * 32)
    assert native.read_pgm(p) is None
    open(p, "wb").write(b"P5\n4 4\n255\n" + b"\x00" * 3)  # short payload
    assert native.read_pgm(p) is None


def test_io_module_uses_native_batch(tmp_path, rng):
    img = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    p = str(tmp_path / "z.pgm")
    gio.write_pgm(img, p)
    batch = gio.read_pgm_batch([p, p])
    assert batch.shape == (2, 6, 6)


def test_whitespace_first_pixel_quirk(tmp_path, oracle):
    """A C quirk we reproduce faithfully: gs_read_pgm's header format
    string ``"P5\\n%u %u\\n%u\\n"`` (grayskull.h:116) ends in a whitespace
    directive, which fscanf matches GREEDILY — so an image whose FIRST
    PIXEL is a whitespace byte (0x09-0x0D, 0x20) loses that byte to the
    header and the subsequent w*h fread comes up short.  The reference
    cannot read back such a file it itself wrote; the native and Python
    codecs agree."""
    img = np.full((4, 5), 7, np.uint8)
    img[0, 0] = 0x0A  # newline-valued first pixel
    p = str(tmp_path / "ws.pgm")
    assert native.write_pgm(img, p) == 0
    assert oracle.read_pgm(p) is None       # the C reference itself fails
    assert native.read_pgm(p) is None       # native loader matches
    assert gio.read_pgm(p) is None          # python codec matches
    with pytest.raises(IOError):
        native.read_pgm_batch([p])
    # a non-whitespace first pixel round-trips everywhere
    img[0, 0] = 200
    assert native.write_pgm(img, p) == 0
    np.testing.assert_array_equal(oracle.read_pgm(p), img)
    np.testing.assert_array_equal(native.read_pgm(p), img)
    np.testing.assert_array_equal(gio.read_pgm(p), img)
