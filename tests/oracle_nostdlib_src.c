/* Freestanding-mode test oracle: the reference compiled with GS_NO_STDLIB,
 * so gs_atan2 / gs_sin are the header's polynomial approximations
 * (/root/reference/grayskull.h:70-88) instead of libm — the exact math the
 * nostdlib WASM build ships.  Exports the trig plus the ORB numeric path that
 * consumes it, for bit-exact differential tests of the framework's
 * "freestanding" trig mode.  Built on the fly by tests/oracle.py.
 */
#define GS_NO_STDLIB
#include <stdint.h>

#include "grayskull.h"

#define EXPORT __attribute__((visibility("default")))

static struct gs_image im(unsigned w, unsigned h, uint8_t *d) {
  struct gs_image i = {w, h, d};
  return i;
}

EXPORT float o_ns_atan2(float y, float x) { return gs_atan2(y, x); }

EXPORT float o_ns_sin(float x) { return gs_sin(x); }

EXPORT float o_ns_compute_orientation(const uint8_t *src, unsigned w, unsigned h, unsigned x,
                                      unsigned y, unsigned r) {
  return gs_compute_orientation(im(w, h, (uint8_t *)src), x, y, r);
}

EXPORT void o_ns_brief_descriptor(const uint8_t *src, unsigned w, unsigned h, unsigned x,
                                  unsigned y, float angle, uint32_t *desc) {
  struct gs_keypoint kp;
  kp.pt.x = x;
  kp.pt.y = y;
  kp.angle = angle;
  gs_brief_descriptor(im(w, h, (uint8_t *)src), &kp);
  for (int i = 0; i < 8; i++) desc[i] = kp.descriptor[i];
}

EXPORT unsigned o_ns_orb_extract(const uint8_t *src, unsigned w, unsigned h, unsigned nkps,
                                 unsigned threshold, uint8_t *scoremap, uint32_t *xy,
                                 uint32_t *resp, float *angle, uint32_t *desc) {
  struct gs_image img = im(w, h, (uint8_t *)src);
  static struct gs_keypoint kps[5000];
  unsigned n =
      gs_orb_extract(img, kps, nkps < 5000 ? nkps : 5000, threshold, scoremap);
  for (unsigned i = 0; i < n; i++) {
    xy[2 * i] = kps[i].pt.x;
    xy[2 * i + 1] = kps[i].pt.y;
    resp[i] = kps[i].response;
    angle[i] = kps[i].angle;
    for (int j = 0; j < 8; j++) desc[8 * i + j] = kps[i].descriptor[j];
  }
  return n;
}
