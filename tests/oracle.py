"""ctypes bindings for the C reference oracle (built on the fly from oracle_src.c).

The oracle compiles the untouched reference header (read-only mount) behind thin
exported wrappers so differential tests can assert bit-exact parity.  Everything
returns numpy arrays.
"""

from __future__ import annotations

import ctypes as ct
import os
import subprocess
import tempfile

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_u = ct.c_uint
_i = ct.c_int
_f = ct.c_float


class Oracle:
    def __init__(self, lib):
        self._lib = lib
        L = lib
        L.o_crop.argtypes = [_u8p, _u8p, _u, _u, _u, _u, _u, _u]
        L.o_resize_nn.argtypes = [_u8p, _u, _u, _u8p, _u, _u]
        L.o_resize.argtypes = [_u8p, _u, _u, _u8p, _u, _u]
        L.o_downsample.argtypes = [_u8p, _u8p, _u, _u]
        L.o_histogram.argtypes = [_u8p, _u, _u, _u32p]
        L.o_otsu.argtypes = [_u8p, _u, _u]
        L.o_otsu.restype = _u
        L.o_threshold.argtypes = [_u8p, _u, _u, _u]
        L.o_adaptive_threshold.argtypes = [_u8p, _u8p, _u, _u, _u, _i]
        L.o_filter.argtypes = [_u8p, _u8p, _u, _u, _u8p, _u, _u, _u]
        L.o_blur.argtypes = [_u8p, _u8p, _u, _u, _u]
        L.o_erode.argtypes = [_u8p, _u8p, _u, _u]
        L.o_dilate.argtypes = [_u8p, _u8p, _u, _u]
        L.o_sobel.argtypes = [_u8p, _u8p, _u, _u]
        L.o_blobs.argtypes = [_u8p, _u, _u, _u16p, _u, _u16p, _u32p, _u32p, _u32p]
        L.o_blobs.restype = _u
        L.o_blob_corners.argtypes = [_u8p, _u, _u, _u16p, _u, _u, _u32p, _u32p, _u32p]
        L.o_perspective_correct.argtypes = [_u8p, _u, _u, _u8p, _u, _u, _u32p]
        L.o_trace_contour.argtypes = [_u8p, _u, _u, _u8p, _u, _u, _u32p]
        L.o_largest_blob_contour.argtypes = [_u8p, _u, _u, _u, _u32p]
        L.o_largest_blob_contour.restype = _i
        L.o_read_pgm.argtypes = [ct.c_char_p, np.ctypeslib.ndpointer(np.uint32), np.ctypeslib.ndpointer(np.uint32), _u8p, _u]
        L.o_read_pgm.restype = _i
        L.o_fast.argtypes = [_u8p, _u, _u, _u8p, _u, _u, _u32p, _u32p]
        L.o_fast.restype = _u
        L.o_compute_orientation.argtypes = [_u8p, _u, _u, _u, _u, _u]
        L.o_compute_orientation.restype = _f
        L.o_brief_descriptor.argtypes = [_u8p, _u, _u, _u, _u, _f, _u32p]
        L.o_orb_extract.argtypes = [_u8p, _u, _u, _u, _u, _u8p, _u32p, _u32p, _f32p, _u32p]
        L.o_orb_extract.restype = _u
        L.o_match_orb.argtypes = [_u32p, _u, _u32p, _u, _u, _f, _u32p]
        L.o_match_orb.restype = _u
        L.o_match_template.argtypes = [_u8p, _u, _u, _u8p, _u, _u, _u8p]
        L.o_find_best_match.argtypes = [_u8p, _u, _u, _u32p]
        L.o_integral.argtypes = [_u8p, _u, _u, _u32p]
        L.o_integral_sum.argtypes = [_u32p, _u, _u, _u, _u, _u]
        L.o_integral_sum.restype = _u
        L.o_lbp_window.argtypes = [_u32p, _u, _u, _i, _i, _f]
        L.o_lbp_window.restype = _u
        L.o_lbp_detect.argtypes = [_u32p, _u, _u, _u, _f, _f, _f, _i, _u32p]
        L.o_lbp_detect.restype = _u
        L.o_cascade_dims.argtypes = [_u32p]
        for name in (
            "o_cascade_features",
            "o_cascade_weak_feature_idx",
            "o_cascade_weak_left_val",
            "o_cascade_weak_right_val",
            "o_cascade_weak_subset_offset",
            "o_cascade_weak_num_subsets",
            "o_cascade_subsets",
            "o_cascade_stage_weak_start",
            "o_cascade_stage_nweaks",
            "o_cascade_stage_threshold",
        ):
            getattr(L, name).restype = ct.c_void_p
        L.o_cascade_subsets_len.restype = _u

    # --- helpers -----------------------------------------------------------
    @staticmethod
    def _prep(img):
        img = np.ascontiguousarray(img, dtype=np.uint8)
        assert img.ndim == 2
        return img, img.shape[1], img.shape[0]  # (img, w, h)

    # --- pixel ops ---------------------------------------------------------
    def crop(self, img, x, y, w, h):
        img, sw, sh = self._prep(img)
        dst = np.empty((h, w), np.uint8)
        self._lib.o_crop(dst, img, sw, sh, x, y, w, h)
        return dst

    def resize_nn(self, img, dh, dw):
        img, sw, sh = self._prep(img)
        dst = np.empty((dh, dw), np.uint8)
        self._lib.o_resize_nn(dst, dw, dh, img, sw, sh)
        return dst

    def resize(self, img, dh, dw):
        img, sw, sh = self._prep(img)
        dst = np.empty((dh, dw), np.uint8)
        self._lib.o_resize(dst, dw, dh, img, sw, sh)
        return dst

    def downsample(self, img):
        img, sw, sh = self._prep(img)
        dst = np.empty((sh // 2, sw // 2), np.uint8)
        self._lib.o_downsample(dst, img, sw, sh)
        return dst

    def histogram(self, img):
        img, w, h = self._prep(img)
        hist = np.empty(256, np.uint32)
        self._lib.o_histogram(img, w, h, hist)
        return hist

    def otsu(self, img):
        img, w, h = self._prep(img)
        return int(self._lib.o_otsu(img, w, h))

    def threshold(self, img, t):
        img, w, h = self._prep(img)
        out = img.copy()
        self._lib.o_threshold(out, w, h, int(t))
        return out

    def adaptive_threshold(self, img, radius, c):
        img, w, h = self._prep(img)
        dst = np.empty_like(img)
        self._lib.o_adaptive_threshold(dst, img, w, h, radius, c)
        return dst

    def filter(self, img, kernel, norm):
        img, w, h = self._prep(img)
        k = np.ascontiguousarray(kernel).astype(np.int8).view(np.uint8)
        dst = np.empty_like(img)
        self._lib.o_filter(dst, img, w, h, k, k.shape[1], k.shape[0], norm)
        return dst

    def blur(self, img, radius):
        img, w, h = self._prep(img)
        dst = np.empty_like(img)
        self._lib.o_blur(dst, img, w, h, radius)
        return dst

    def erode(self, img):
        img, w, h = self._prep(img)
        dst = np.empty_like(img)
        self._lib.o_erode(dst, img, w, h)
        return dst

    def dilate(self, img):
        img, w, h = self._prep(img)
        dst = np.empty_like(img)
        self._lib.o_dilate(dst, img, w, h)
        return dst

    def sobel(self, img):
        img, w, h = self._prep(img)
        dst = np.empty_like(img)
        self._lib.o_sobel(dst, img, w, h)
        return dst

    # --- blobs et al -------------------------------------------------------
    def blobs(self, img, nblobs):
        img, w, h = self._prep(img)
        labels = np.zeros((h, w), np.uint16)
        lab = np.zeros(nblobs, np.uint16)
        area = np.zeros(nblobs, np.uint32)
        box = np.zeros(nblobs * 4, np.uint32)
        cen = np.zeros(nblobs * 2, np.uint32)
        n = self._lib.o_blobs(img, w, h, labels, nblobs, lab, area, box, cen)
        return dict(
            n=int(n),
            labels=labels,
            label=lab[:n].copy(),
            area=area[:n].copy(),
            box=box.reshape(-1, 4)[:n].copy(),
            centroid=cen.reshape(-1, 2)[:n].copy(),
        )

    def blob_corners(self, img, labels, blob):
        img, w, h = self._prep(img)
        labels = np.ascontiguousarray(labels, np.uint16)
        out = np.zeros(8, np.uint32)
        box = np.ascontiguousarray(blob["box"], np.uint32)
        cen = np.ascontiguousarray(blob["centroid"], np.uint32)
        self._lib.o_blob_corners(img, w, h, labels, int(blob["label"]), int(blob["area"]), box,
                                 cen, out)
        return out.reshape(4, 2)

    def perspective_correct(self, src, corners, dh, dw):
        src, sw, sh = self._prep(src)
        c = np.ascontiguousarray(np.asarray(corners, np.uint32).reshape(-1))
        dst = np.empty((dh, dw), np.uint8)
        self._lib.o_perspective_correct(dst, dw, dh, src, sw, sh, c)
        return dst

    def trace_contour(self, img, start_x, start_y, visited=None):
        img, w, h = self._prep(img)
        if visited is None:
            visited = np.zeros((h, w), np.uint8)
        visited = np.ascontiguousarray(visited, np.uint8)
        out = np.zeros(5, np.uint32)
        self._lib.o_trace_contour(img, w, h, visited, start_x, start_y, out)
        return dict(box=tuple(int(v) for v in out[:4]), length=int(out[4]), visited=visited)

    def read_pgm(self, path):
        w = np.zeros(1, np.uint32)
        h = np.zeros(1, np.uint32)
        buf = np.zeros(1 << 22, np.uint8)
        n = self._lib.o_read_pgm(path.encode(), w, h, buf, len(buf))
        if n < 0:
            return None
        return buf[:n].reshape(int(h[0]), int(w[0])).copy()

    def largest_blob_contour(self, img, max_blobs=50):
        img, w, h = self._prep(img)
        out = np.zeros(7, np.uint32)
        ok = self._lib.o_largest_blob_contour(img, w, h, max_blobs, out)
        return dict(found=bool(ok), box=tuple(int(v) for v in out[:4]),
                    length=int(out[4]), start=(int(out[5]), int(out[6])))

    # --- features ----------------------------------------------------------
    def fast(self, img, nkps, threshold, scoremap=None):
        img, w, h = self._prep(img)
        if scoremap is None:
            scoremap = np.zeros((h, w), np.uint8)
        scoremap = np.ascontiguousarray(scoremap, np.uint8)
        xy = np.zeros(nkps * 2, np.uint32)
        resp = np.zeros(nkps, np.uint32)
        n = self._lib.o_fast(img, w, h, scoremap, nkps, threshold, xy, resp)
        return dict(n=int(n), xy=xy.reshape(-1, 2)[:n].copy(), response=resp[:n].copy(),
                    scoremap=scoremap)

    def compute_orientation(self, img, x, y, r):
        img, w, h = self._prep(img)
        return float(self._lib.o_compute_orientation(img, w, h, x, y, r))

    def brief_descriptor(self, img, x, y, angle):
        img, w, h = self._prep(img)
        desc = np.zeros(8, np.uint32)
        self._lib.o_brief_descriptor(img, w, h, x, y, np.float32(angle), desc)
        return desc

    def orb_extract(self, img, nkps, threshold):
        img, w, h = self._prep(img)
        scoremap = np.zeros((h, w), np.uint8)
        xy = np.zeros(nkps * 2, np.uint32)
        resp = np.zeros(nkps, np.uint32)
        ang = np.zeros(nkps, np.float32)
        desc = np.zeros(nkps * 8, np.uint32)
        n = self._lib.o_orb_extract(img, w, h, nkps, threshold, scoremap.reshape(-1), xy, resp,
                                    ang, desc)
        return dict(n=int(n), xy=xy.reshape(-1, 2)[:n].copy(), response=resp[:n].copy(),
                    angle=ang[:n].copy(), descriptor=desc.reshape(-1, 8)[:n].copy())

    def match_orb(self, desc1, desc2, max_matches, max_distance):
        d1 = np.ascontiguousarray(desc1, np.uint32)
        d2 = np.ascontiguousarray(desc2, np.uint32)
        out = np.zeros(max_matches * 3, np.uint32)
        n = self._lib.o_match_orb(d1.reshape(-1), len(d1), d2.reshape(-1), len(d2), max_matches,
                                  np.float32(max_distance), out)
        return out.reshape(-1, 3)[:n].copy()

    # --- template / integral / lbp -----------------------------------------
    def match_template(self, img, tmpl):
        img, iw, ih = self._prep(img)
        tmpl, tw, th = self._prep(tmpl)
        res = np.empty((ih - th + 1, iw - tw + 1), np.uint8)
        self._lib.o_match_template(img, iw, ih, tmpl, tw, th, res)
        return res

    def find_best_match(self, result):
        result, w, h = self._prep(result)
        out = np.zeros(2, np.uint32)
        self._lib.o_find_best_match(result, w, h, out)
        return int(out[0]), int(out[1])

    def integral(self, img):
        img, w, h = self._prep(img)
        ii = np.empty((h, w), np.uint32)
        self._lib.o_integral(img, w, h, ii)
        return ii

    def integral_sum(self, ii, x, y, w, h):
        ii = np.ascontiguousarray(ii, np.uint32)
        return int(self._lib.o_integral_sum(ii.reshape(-1), ii.shape[1], x, y, w, h))

    def lbp_window(self, ii, x, y, scale):
        ii = np.ascontiguousarray(ii, np.uint32)
        return int(self._lib.o_lbp_window(ii.reshape(-1), ii.shape[1], ii.shape[0], x, y,
                                          np.float32(scale)))

    def lbp_detect(self, ii, max_rects, scale_factor, min_scale, max_scale, step):
        ii = np.ascontiguousarray(ii, np.uint32)
        out = np.zeros(max_rects * 4, np.uint32)
        n = self._lib.o_lbp_detect(ii.reshape(-1), ii.shape[1], ii.shape[0], max_rects,
                                   np.float32(scale_factor), np.float32(min_scale),
                                   np.float32(max_scale), step, out)
        return out.reshape(-1, 4)[:n].copy()

    def cascade_tables(self):
        """Extract the reference frontalface cascade as numpy arrays."""
        dims = np.zeros(5, np.uint32)
        self._lib.o_cascade_dims(dims)
        ww, wh, nf, nw, ns = (int(v) for v in dims)
        nsub = int(self._lib.o_cascade_subsets_len())

        def arr(name, dtype, count):
            ptr = getattr(self._lib, name)()
            ctype = np.ctypeslib.as_ctypes_type(dtype) * count
            return np.array(ctype.from_address(ptr), dtype=dtype)

        return dict(
            window_w=ww,
            window_h=wh,
            features=arr("o_cascade_features", np.int8, nf * 4).reshape(nf, 4),
            weak_feature_idx=arr("o_cascade_weak_feature_idx", np.uint16, nw),
            weak_left_val=arr("o_cascade_weak_left_val", np.float32, nw),
            weak_right_val=arr("o_cascade_weak_right_val", np.float32, nw),
            weak_subset_offset=arr("o_cascade_weak_subset_offset", np.uint16, nw),
            weak_num_subsets=arr("o_cascade_weak_num_subsets", np.uint16, nw),
            subsets=arr("o_cascade_subsets", np.int32, nsub),
            stage_weak_start=arr("o_cascade_stage_weak_start", np.uint16, ns),
            stage_nweaks=arr("o_cascade_stage_nweaks", np.uint16, ns),
            stage_threshold=arr("o_cascade_stage_threshold", np.float32, ns),
        )


class NostdlibOracle:
    """The reference compiled with GS_NO_STDLIB (polynomial trig)."""

    def __init__(self, lib):
        self._lib = lib
        L = lib
        L.o_ns_atan2.restype = _f
        L.o_ns_atan2.argtypes = [_f, _f]
        L.o_ns_sin.restype = _f
        L.o_ns_sin.argtypes = [_f]
        L.o_ns_compute_orientation.argtypes = [_u8p, _u, _u, _u, _u, _u]
        L.o_ns_compute_orientation.restype = _f
        L.o_ns_brief_descriptor.argtypes = [_u8p, _u, _u, _u, _u, _f, _u32p]
        L.o_ns_orb_extract.argtypes = [_u8p, _u, _u, _u, _u, _u8p, _u32p, _u32p, _f32p, _u32p]
        L.o_ns_orb_extract.restype = _u

    def atan2(self, y, x):
        return np.float32(self._lib.o_ns_atan2(np.float32(y), np.float32(x)))

    def sin(self, x):
        return np.float32(self._lib.o_ns_sin(np.float32(x)))

    def compute_orientation(self, img, x, y, r):
        img = np.ascontiguousarray(img, np.uint8)
        return float(self._lib.o_ns_compute_orientation(img, img.shape[1], img.shape[0], x, y, r))

    def brief_descriptor(self, img, x, y, angle):
        img = np.ascontiguousarray(img, np.uint8)
        desc = np.zeros(8, np.uint32)
        self._lib.o_ns_brief_descriptor(img, img.shape[1], img.shape[0], x, y,
                                        np.float32(angle), desc)
        return desc

    def orb_extract(self, img, nkps, threshold):
        img = np.ascontiguousarray(img, np.uint8)
        h, w = img.shape
        scoremap = np.zeros((h, w), np.uint8)
        xy = np.zeros(nkps * 2, np.uint32)
        resp = np.zeros(nkps, np.uint32)
        ang = np.zeros(nkps, np.float32)
        desc = np.zeros(nkps * 8, np.uint32)
        n = self._lib.o_ns_orb_extract(img, w, h, nkps, threshold, scoremap.reshape(-1),
                                       xy, resp, ang, desc)
        return dict(n=int(n), xy=xy.reshape(-1, 2)[:n].copy(), response=resp[:n].copy(),
                    angle=ang[:n].copy(), descriptor=desc.reshape(-1, 8)[:n].copy())


_ns_cached = None
_ns_cache_key = None


def load_nostdlib(reference_dir):
    """Build (once) and load the GS_NO_STDLIB oracle.  Returns None if impossible."""
    global _ns_cached, _ns_cache_key
    if _ns_cache_key == reference_dir:
        return _ns_cached
    _ns_cache_key = reference_dir
    _ns_cached = None
    header = os.path.join(reference_dir, "grayskull.h")
    if not os.path.isfile(header):
        return None
    build_dir = os.path.join(tempfile.gettempdir(), "gs_oracle_build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "liboracle_nostdlib.so")
    src = os.path.join(_HERE, "oracle_nostdlib_src.c")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < max(os.path.getmtime(src), os.path.getmtime(header))):
        # no -lm: proves the freestanding build has zero libm dependence
        cmd = ["cc", "-O2", "-fPIC", "-shared", "-std=c99", "-I", reference_dir,
               "-o", so_path, src]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        _ns_cached = NostdlibOracle(ct.CDLL(so_path))
    except OSError:
        _ns_cached = None
    return _ns_cached


_cached = None
_cache_key = None


def load(reference_dir):
    """Build (once) and load the oracle shared library.  Returns None if impossible."""
    global _cached, _cache_key
    if _cache_key == reference_dir:
        return _cached
    _cache_key = reference_dir
    _cached = None
    header = os.path.join(reference_dir, "grayskull.h")
    cascade_dir = os.path.join(reference_dir, "examples", "nanomagick")
    if not os.path.isfile(header):
        return None
    build_dir = os.path.join(tempfile.gettempdir(), "gs_oracle_build")
    os.makedirs(build_dir, exist_ok=True)
    so_path = os.path.join(build_dir, "liboracle.so")
    src = os.path.join(_HERE, "oracle_src.c")
    if (not os.path.exists(so_path)
            or os.path.getmtime(so_path) < max(os.path.getmtime(src), os.path.getmtime(header))):
        cmd = [
            "cc", "-O2", "-fPIC", "-shared", "-std=c99",
            "-I", reference_dir, "-I", cascade_dir,
            "-o", so_path, src, "-lm",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        _cached = Oracle(ct.CDLL(so_path))
    except OSError:
        _cached = None
    return _cached
