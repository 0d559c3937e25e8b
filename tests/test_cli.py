"""CLI integration tests: the reference Makefile's ``testdata`` pipeline
(/root/reference/Makefile:10-33) run through our CLI, byte-compared against the
compiled C nanomagick binary where outputs are deterministic.
"""

import os
import subprocess

import numpy as np
import pytest

from grayskull_tpu import cli
from grayskull_tpu import io as gio


@pytest.fixture(scope="module")
def c_binary(tmp_path_factory):
    ref = os.environ.get("GRAYSKULL_REF", "/root/reference")
    src = os.path.join(ref, "examples", "nanomagick", "nanomagick.c")
    if not os.path.isfile(src):
        pytest.skip("reference not available")
    out = tmp_path_factory.mktemp("bin") / "nanomagick"
    try:
        subprocess.run(
            ["cc", "-std=c99", "-O2", "-I", ref, "-o", str(out), src, "-lm"],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("cannot build C nanomagick")
    return str(out)


@pytest.fixture(scope="module")
def lena_path():
    p = os.path.join(os.environ.get("GRAYSKULL_REF", "/root/reference"), "testdata", "lena.pgm")
    if not os.path.isfile(p):
        pytest.skip("testdata not available")
    return p


def run_ours(args):
    rc = cli.main(["nanomagick"] + args)
    assert rc == 0, args


def run_c(binary, args):
    subprocess.run([binary] + args, check=True, capture_output=True)


CASES = [
    (["resize", "128", "64"], "resize.pgm"),
    (["crop", "32", "32", "64", "64"], "crop.pgm"),
    (["blur", "1"], "blur1.pgm"),
    (["blur", "9"], "blur9.pgm"),
    (["threshold", "128"], "thr.pgm"),
    (["threshold", "otsu"], "otsu.pgm"),
    (["adaptive", "15", "5"], "adaptive.pgm"),
    (["sobel"], "sobel.pgm"),
    (["morph", "erode", "2"], "erode.pgm"),
    (["morph", "dilate", "2"], "dilate.pgm"),
    (["scan"], "scan.pgm"),
]

# NOTE: ``blobs`` is exercised via the aruco Makefile chain below, not on raw
# lena — the C reference CLI has a buffer overflow in its box-drawing loop
# (nanomagick.c:163-167 writes through y == img.h when a blob's padded box
# touches the bottom edge) and crashes with heap corruption on inputs whose
# blobs reach the image border.  Our implementation clamps.


@pytest.mark.parametrize("args,outname", CASES)
def test_cli_byte_parity(c_binary, lena_path, tmp_path, args, outname):
    ours = tmp_path / ("ours_" + outname)
    ref = tmp_path / ("ref_" + outname)
    run_ours(args + [lena_path, str(ours)])
    run_c(c_binary, args + [lena_path, str(ref)])
    assert ours.read_bytes() == ref.read_bytes(), args


def test_cli_blobs_aruco_chain(c_binary, tmp_path):
    """The Makefile integration chain (Makefile:25-31): blur 3 -> sobel ->
    threshold otsu -> dilate 9 -> erode 10 -> blobs 150 on aruco.pgm."""
    ref_dir = os.environ.get("GRAYSKULL_REF", "/root/reference")
    aruco = os.path.join(ref_dir, "testdata", "aruco.pgm")
    if not os.path.isfile(aruco):
        pytest.skip("aruco.pgm not available")
    steps = [
        ["blur", "3"],
        ["sobel"],
        ["threshold", "otsu"],
        ["morph", "dilate", "9"],
        ["morph", "erode", "10"],
        ["blobs", "150"],
    ]
    cur_ours, cur_ref = aruco, aruco
    for i, step in enumerate(steps):
        nxt_ours = str(tmp_path / f"ours_{i}.pgm")
        nxt_ref = str(tmp_path / f"ref_{i}.pgm")
        run_ours(step + [cur_ours, nxt_ours])
        run_c(c_binary, step + [cur_ref, nxt_ref])
        cur_ours, cur_ref = nxt_ours, nxt_ref
    ours = gio.read_pgm(cur_ours)
    ref = gio.read_pgm(cur_ref)
    diff = np.argwhere(ours != ref)
    # The C box drawing writes through x == img.w, which wraps to column 0 of
    # the next row in its flat buffer; we clamp instead.  All divergence must be
    # exactly those wrapped 128-greys in column 0.
    for (y, x) in diff:
        assert x == 0 and ref[y, x] == 128 and ours[y, x] != 128, (y, x)
    assert len(diff) < 200


def test_cli_identify(capsys, lena_path):
    run_ours(["identify", lena_path])
    out = capsys.readouterr().out
    assert "128x128" in out and "16384" in out


def test_cli_view_runs(capsys, lena_path):
    run_ours(["view", lena_path])
    assert len(capsys.readouterr().out) > 100


@pytest.mark.parametrize("term", ["xterm-256color", "dumb"])
def test_cli_view_byte_parity(c_binary, lena_path, term):
    """Both renderer branches (nanomagick.c:17-57) byte-compared under a
    pinned TERM.  stdout is a pipe, so the C ioctl and our
    os.get_terminal_size() both fall back to the same 80-column default."""
    import sys

    env = dict(os.environ, TERM=term, JAX_PLATFORMS="cpu",
               PYTHONIOENCODING="utf-8",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env.pop("COLUMNS", None)
    ours = subprocess.run(
        [sys.executable, "-m", "grayskull_tpu.cli", "view", lena_path],
        env=env, capture_output=True, check=True, timeout=400)
    ref = subprocess.run(
        [c_binary, "view", lena_path],
        env=dict(os.environ, TERM=term), capture_output=True, check=True)
    assert ours.stdout == ref.stdout


def test_cli_faces_and_keypoints(tmp_path, lena_path):
    run_ours(["faces", "2", lena_path, str(tmp_path / "f.pgm")])
    run_ours(["keypoints", "50", "20", lena_path, str(tmp_path / "k.pgm")])
    assert gio.read_pgm(str(tmp_path / "f.pgm")) is not None
    assert gio.read_pgm(str(tmp_path / "k.pgm")) is not None


def test_cli_stdin_stdout_piping(c_binary, lena_path, tmp_path):
    """'-' reads stdin / writes stdout, chainable like the reference Makefile."""
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ours = tmp_path / "pipe_ours.pgm"
    ref = tmp_path / "pipe_ref.pgm"
    shell = (
        f"{sys.executable} -m grayskull_tpu.cli blur 3 {lena_path} - | "
        f"{sys.executable} -m grayskull_tpu.cli sobel - - | "
        f"{sys.executable} -m grayskull_tpu.cli threshold otsu - {ours}"
    )
    subprocess.run(shell, shell=True, check=True, env=env, timeout=400)
    shell_c = (
        f"{c_binary} blur 3 {lena_path} - | {c_binary} sobel - - | "
        f"{c_binary} threshold otsu - {ref}"
    )
    subprocess.run(shell_c, shell=True, check=True, timeout=60)
    assert ours.read_bytes() == ref.read_bytes()


def test_cli_errors(capsys):
    assert cli.main(["nanomagick"]) == 1
    assert cli.main(["nanomagick", "nonsense"]) == 1
    assert cli.main(["nanomagick", "blur", "1", "/does/not/exist.pgm", "/tmp/x.pgm"]) == 1
    assert cli.main(["nanomagick", "blur", "1"]) == 1  # wrong arg count
