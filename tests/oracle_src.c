/* Test oracle: thin exported wrappers around the C reference implementation.
 *
 * This file is OURS (the wrappers); it #includes the read-only reference header
 * from /root/reference at build time so differential tests can compare our
 * TPU ops against the ground-truth C behavior bit-for-bit.  It is built on the
 * fly by tests/oracle.py and never ships as part of the framework.
 */
#include <stdint.h>
#include <string.h>

#include "grayskull.h"
#include "frontalface.h" /* reference's OpenCV-derived LBP cascade data */

#define EXPORT __attribute__((visibility("default")))

static struct gs_image im(unsigned w, unsigned h, uint8_t *d) {
  struct gs_image i = {w, h, d};
  return i;
}

/* ----- pixel ops ----- */

EXPORT void o_crop(uint8_t *dst, const uint8_t *src, unsigned sw, unsigned sh, unsigned x,
                   unsigned y, unsigned w, unsigned h) {
  struct gs_rect r = {x, y, w, h};
  gs_crop(im(w, h, dst), im(sw, sh, (uint8_t *)src), r);
}

EXPORT void o_resize_nn(uint8_t *dst, unsigned dw, unsigned dh, const uint8_t *src, unsigned sw,
                        unsigned sh) {
  gs_resize_nn(im(dw, dh, dst), im(sw, sh, (uint8_t *)src));
}

EXPORT void o_resize(uint8_t *dst, unsigned dw, unsigned dh, const uint8_t *src, unsigned sw,
                     unsigned sh) {
  gs_resize(im(dw, dh, dst), im(sw, sh, (uint8_t *)src));
}

EXPORT void o_downsample(uint8_t *dst, const uint8_t *src, unsigned sw, unsigned sh) {
  gs_downsample(im(sw / 2, sh / 2, dst), im(sw, sh, (uint8_t *)src));
}

EXPORT void o_histogram(const uint8_t *src, unsigned w, unsigned h, unsigned *hist) {
  gs_histogram(im(w, h, (uint8_t *)src), hist);
}

EXPORT unsigned o_otsu(const uint8_t *src, unsigned w, unsigned h) {
  return gs_otsu_threshold(im(w, h, (uint8_t *)src));
}

EXPORT void o_threshold(uint8_t *data, unsigned w, unsigned h, unsigned t) {
  gs_threshold(im(w, h, data), (uint8_t)t);
}

EXPORT void o_adaptive_threshold(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h,
                                 unsigned radius, int c) {
  gs_adaptive_threshold(im(w, h, dst), im(w, h, (uint8_t *)src), radius, c);
}

EXPORT void o_filter(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h,
                     const uint8_t *kernel, unsigned kw, unsigned kh, unsigned norm) {
  gs_filter(im(w, h, dst), im(w, h, (uint8_t *)src), im(kw, kh, (uint8_t *)kernel), norm);
}

EXPORT void o_blur(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h, unsigned radius) {
  gs_blur(im(w, h, dst), im(w, h, (uint8_t *)src), radius);
}

EXPORT void o_erode(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h) {
  gs_erode(im(w, h, dst), im(w, h, (uint8_t *)src));
}

EXPORT void o_dilate(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h) {
  gs_dilate(im(w, h, dst), im(w, h, (uint8_t *)src));
}

EXPORT void o_sobel(uint8_t *dst, const uint8_t *src, unsigned w, unsigned h) {
  memset(dst, 0, (size_t)w * h); /* reference leaves borders untouched; zero like callers do */
  gs_sobel(im(w, h, dst), im(w, h, (uint8_t *)src));
}

/* ----- blobs / corners / warp / contour ----- */

EXPORT unsigned o_blobs(const uint8_t *src, unsigned w, unsigned h, uint16_t *labels,
                        unsigned nblobs, uint16_t *out_label, unsigned *out_area,
                        unsigned *out_box, unsigned *out_centroid) {
  struct gs_blob *blobs = (struct gs_blob *)calloc(nblobs, sizeof(struct gs_blob));
  unsigned n = gs_blobs(im(w, h, (uint8_t *)src), labels, blobs, nblobs);
  for (unsigned i = 0; i < n; i++) {
    out_label[i] = blobs[i].label;
    out_area[i] = blobs[i].area;
    out_box[i * 4 + 0] = blobs[i].box.x;
    out_box[i * 4 + 1] = blobs[i].box.y;
    out_box[i * 4 + 2] = blobs[i].box.w;
    out_box[i * 4 + 3] = blobs[i].box.h;
    out_centroid[i * 2 + 0] = blobs[i].centroid.x;
    out_centroid[i * 2 + 1] = blobs[i].centroid.y;
  }
  free(blobs);
  return n;
}

EXPORT void o_blob_corners(const uint8_t *src, unsigned w, unsigned h, uint16_t *labels,
                           unsigned label, unsigned area, const unsigned *box,
                           const unsigned *centroid, unsigned *out_corners /* 8 */) {
  struct gs_blob b;
  b.label = (gs_label)label;
  b.area = area;
  b.box.x = box[0], b.box.y = box[1], b.box.w = box[2], b.box.h = box[3];
  b.centroid.x = centroid[0], b.centroid.y = centroid[1];
  struct gs_point c[4];
  gs_blob_corners(im(w, h, (uint8_t *)src), labels, &b, c);
  for (int i = 0; i < 4; i++) {
    out_corners[i * 2 + 0] = c[i].x;
    out_corners[i * 2 + 1] = c[i].y;
  }
}

EXPORT void o_perspective_correct(uint8_t *dst, unsigned dw, unsigned dh, const uint8_t *src,
                                  unsigned sw, unsigned sh, const unsigned *corners /* 8 */) {
  struct gs_point c[4];
  for (int i = 0; i < 4; i++) {
    c[i].x = corners[i * 2 + 0];
    c[i].y = corners[i * 2 + 1];
  }
  gs_perspective_correct(im(dw, dh, dst), im(sw, sh, (uint8_t *)src), c);
}

EXPORT void o_trace_contour(const uint8_t *src, unsigned w, unsigned h, uint8_t *visited,
                            unsigned start_x, unsigned start_y, unsigned *out /* box4+len */) {
  struct gs_contour c;
  c.start.x = start_x;
  c.start.y = start_y;
  gs_trace_contour(im(w, h, (uint8_t *)src), im(w, h, visited), &c);
  out[0] = c.box.x, out[1] = c.box.y, out[2] = c.box.w, out[3] = c.box.h, out[4] = c.length;
}

/* ----- FAST / ORB ----- */

EXPORT unsigned o_fast(const uint8_t *src, unsigned w, unsigned h, uint8_t *scoremap,
                       unsigned nkps, unsigned threshold, unsigned *out_xy, unsigned *out_resp) {
  struct gs_keypoint *kps = (struct gs_keypoint *)calloc(nkps, sizeof(struct gs_keypoint));
  unsigned n = gs_fast(im(w, h, (uint8_t *)src), im(w, h, scoremap), kps, nkps, threshold);
  for (unsigned i = 0; i < n; i++) {
    out_xy[i * 2 + 0] = kps[i].pt.x;
    out_xy[i * 2 + 1] = kps[i].pt.y;
    out_resp[i] = kps[i].response;
  }
  free(kps);
  return n;
}

EXPORT float o_compute_orientation(const uint8_t *src, unsigned w, unsigned h, unsigned x,
                                   unsigned y, unsigned r) {
  return gs_compute_orientation(im(w, h, (uint8_t *)src), x, y, r);
}

EXPORT void o_brief_descriptor(const uint8_t *src, unsigned w, unsigned h, unsigned x, unsigned y,
                               float angle, uint32_t *out_desc /* 8 */) {
  struct gs_keypoint kp;
  kp.pt.x = x;
  kp.pt.y = y;
  kp.angle = angle;
  gs_brief_descriptor(im(w, h, (uint8_t *)src), &kp);
  for (int i = 0; i < 8; i++) out_desc[i] = kp.descriptor[i];
}

EXPORT unsigned o_orb_extract(const uint8_t *src, unsigned w, unsigned h, unsigned nkps,
                              unsigned threshold, uint8_t *scoremap_buffer, unsigned *out_xy,
                              unsigned *out_resp, float *out_angle, uint32_t *out_desc) {
  struct gs_keypoint *kps = (struct gs_keypoint *)calloc(nkps, sizeof(struct gs_keypoint));
  unsigned n =
      gs_orb_extract(im(w, h, (uint8_t *)src), kps, nkps, threshold, scoremap_buffer);
  for (unsigned i = 0; i < n; i++) {
    out_xy[i * 2 + 0] = kps[i].pt.x;
    out_xy[i * 2 + 1] = kps[i].pt.y;
    out_resp[i] = kps[i].response;
    out_angle[i] = kps[i].angle;
    for (int j = 0; j < 8; j++) out_desc[i * 8 + j] = kps[i].descriptor[j];
  }
  free(kps);
  return n;
}

EXPORT unsigned o_match_orb(const uint32_t *desc1, unsigned n1, const uint32_t *desc2, unsigned n2,
                            unsigned max_matches, float max_distance, unsigned *out /* 3*m */) {
  struct gs_keypoint *k1 = (struct gs_keypoint *)calloc(n1 ? n1 : 1, sizeof(struct gs_keypoint));
  struct gs_keypoint *k2 = (struct gs_keypoint *)calloc(n2 ? n2 : 1, sizeof(struct gs_keypoint));
  for (unsigned i = 0; i < n1; i++)
    for (int j = 0; j < 8; j++) k1[i].descriptor[j] = desc1[i * 8 + j];
  for (unsigned i = 0; i < n2; i++)
    for (int j = 0; j < 8; j++) k2[i].descriptor[j] = desc2[i * 8 + j];
  struct gs_match *m = (struct gs_match *)calloc(max_matches, sizeof(struct gs_match));
  unsigned n = gs_match_orb(k1, n1, k2, n2, m, max_matches, max_distance);
  for (unsigned i = 0; i < n; i++) {
    out[i * 3 + 0] = m[i].idx1;
    out[i * 3 + 1] = m[i].idx2;
    out[i * 3 + 2] = m[i].distance;
  }
  free(k1);
  free(k2);
  free(m);
  return n;
}

/* ----- template matching / integral ----- */

EXPORT void o_match_template(const uint8_t *img, unsigned iw, unsigned ih, const uint8_t *tmpl,
                             unsigned tw, unsigned th, uint8_t *result) {
  gs_match_template(im(iw, ih, (uint8_t *)img), im(tw, th, (uint8_t *)tmpl),
                    im(iw - tw + 1, ih - th + 1, result));
}

EXPORT void o_find_best_match(const uint8_t *result, unsigned w, unsigned h, unsigned *out_xy) {
  struct gs_point p = gs_find_best_match(im(w, h, (uint8_t *)result));
  out_xy[0] = p.x;
  out_xy[1] = p.y;
}

EXPORT void o_integral(const uint8_t *src, unsigned w, unsigned h, unsigned *ii) {
  gs_integral(im(w, h, (uint8_t *)src), ii);
}

EXPORT unsigned o_integral_sum(const unsigned *ii, unsigned iw, unsigned x, unsigned y, unsigned w,
                               unsigned h) {
  return gs_integral_sum(ii, iw, x, y, w, h);
}

/* ----- LBP cascade (uses the reference's bundled frontalface cascade) ----- */

EXPORT unsigned o_lbp_window(const unsigned *ii, unsigned iw, unsigned ih, int x, int y,
                             float scale) {
  return gs_lbp_window(&frontalface, ii, iw, ih, x, y, scale);
}

EXPORT unsigned o_lbp_detect(const unsigned *ii, unsigned iw, unsigned ih, unsigned max_rects,
                             float scale_factor, float min_scale, float max_scale, int step,
                             unsigned *out_rects /* 4*max */) {
  struct gs_rect *rects = (struct gs_rect *)calloc(max_rects, sizeof(struct gs_rect));
  unsigned n = gs_lbp_detect(&frontalface, ii, iw, ih, rects, max_rects, scale_factor, min_scale,
                             max_scale, step);
  for (unsigned i = 0; i < n; i++) {
    out_rects[i * 4 + 0] = rects[i].x;
    out_rects[i * 4 + 1] = rects[i].y;
    out_rects[i * 4 + 2] = rects[i].w;
    out_rects[i * 4 + 3] = rects[i].h;
  }
  free(rects);
  return n;
}

/* Export the cascade tables so the framework's loader can be tested against them. */
EXPORT void o_cascade_dims(unsigned *out /* 5 */) {
  out[0] = frontalface.window_w;
  out[1] = frontalface.window_h;
  out[2] = frontalface.nfeatures;
  out[3] = frontalface.nweaks;
  out[4] = frontalface.nstages;
}

EXPORT const int8_t *o_cascade_features(void) { return frontalface.features; }
EXPORT const uint16_t *o_cascade_weak_feature_idx(void) { return frontalface.weak_feature_idx; }
EXPORT const float *o_cascade_weak_left_val(void) { return frontalface.weak_left_val; }
EXPORT const float *o_cascade_weak_right_val(void) { return frontalface.weak_right_val; }
EXPORT const uint16_t *o_cascade_weak_subset_offset(void) { return frontalface.weak_subset_offset; }
EXPORT const uint16_t *o_cascade_weak_num_subsets(void) { return frontalface.weak_num_subsets; }
EXPORT const int32_t *o_cascade_subsets(void) { return frontalface.subsets; }
EXPORT const uint16_t *o_cascade_stage_weak_start(void) { return frontalface.stage_weak_start; }
EXPORT const uint16_t *o_cascade_stage_nweaks(void) { return frontalface.stage_nweaks; }
EXPORT const float *o_cascade_stage_threshold(void) { return frontalface.stage_threshold; }

/* total number of int32 subset words = sum over weaks of... the reference stores
 * offsets; the last offset + its count gives the total. */
EXPORT unsigned o_cascade_subsets_len(void) {
  unsigned n = frontalface.nweaks;
  unsigned last = frontalface.weak_subset_offset[n - 1] + frontalface.weak_num_subsets[n - 1];
  for (unsigned i = 0; i < n; i++) {
    unsigned e = frontalface.weak_subset_offset[i] + frontalface.weak_num_subsets[i];
    if (e > last) last = e;
  }
  return last;
}

/* Composition mirroring the WASM demo's largest-blob contour driver
 * (examples/wasm/grayskull.c:278-326): blobs -> largest by area (strict >,
 * first max) -> reject area < 100 -> first raster pixel of the label ->
 * gs_trace_contour with a fresh visited mask.  Returns 1 if a contour was
 * traced; out = box(4) + length + start_x + start_y. */
EXPORT int o_largest_blob_contour(const uint8_t *src, unsigned w, unsigned h, unsigned max_blobs,
                                  unsigned *out /* 7 */) {
  struct gs_image img = im(w, h, (uint8_t *)src);
  uint16_t *labels = (uint16_t *)calloc((size_t)w * h, sizeof(uint16_t));
  struct gs_blob *blobs = (struct gs_blob *)calloc(max_blobs, sizeof(struct gs_blob));
  unsigned n = gs_blobs(img, labels, blobs, max_blobs);
  if (n == 0) goto fail;
  unsigned largest = 0, area = blobs[0].area;
  for (unsigned i = 1; i < n; i++) {
    if (blobs[i].area > area) { area = blobs[i].area; largest = i; }
  }
  if (area < 100) goto fail;
  {
    struct gs_blob *b = &blobs[largest];
    int found = 0;
    struct gs_contour c;
    c.start.x = b->box.x;
    c.start.y = b->box.y;
    for (unsigned y = b->box.y; y < b->box.y + b->box.h && !found; y++) {
      for (unsigned x = b->box.x; x < b->box.x + b->box.w && !found; x++) {
        if (labels[y * w + x] == b->label) {
          c.start.x = x;
          c.start.y = y;
          found = 1;
        }
      }
    }
    if (!found) goto fail;
    uint8_t *visited = (uint8_t *)calloc((size_t)w * h, 1);
    gs_trace_contour(img, im(w, h, visited), &c);
    free(visited);
    out[0] = c.box.x, out[1] = c.box.y, out[2] = c.box.w, out[3] = c.box.h;
    out[4] = c.length, out[5] = c.start.x, out[6] = c.start.y;
    free(labels);
    free(blobs);
    return c.length > 0 ? 1 : 0;
  }
fail:
  free(labels);
  free(blobs);
  return 0;
}

/* gs_read_pgm passthrough for header-parser differential tests.  Returns
 * number of pixels (w*h) or -1; pixel data copied into out (caller-sized). */
EXPORT int o_read_pgm(const char *path, unsigned *w, unsigned *h, uint8_t *out, unsigned cap) {
  struct gs_image img = gs_read_pgm(path);
  if (!gs_valid(img)) return -1;
  *w = img.w;
  *h = img.h;
  unsigned n = img.w * img.h;
  if (n > cap) n = cap;
  for (unsigned i = 0; i < n; i++) out[i] = img.data[i];
  gs_free(img);
  return (int)(img.w * img.h);
}
