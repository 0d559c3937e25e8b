/* gsio: native I/O runtime for grayskull-tpu.
 *
 * The reference library's "runtime" is C stdio PGM parsing (grayskull.h:111-136);
 * this is its production-grade counterpart: a small C library doing header
 * parsing, zero-copy decodes into caller buffers, and a pthread-parallel batched
 * file loader that feeds uint8 NHW frame batches to the device without Python in
 * the per-file loop.  Exposed to Python via ctypes (grayskull_tpu/native.py).
 *
 * This is original code (not derived from the reference): a tolerant fscanf-style
 * P5 parser with explicit bounds checking.
 */
#define _GNU_SOURCE
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define EXPORT __attribute__((visibility("default")))

/* ---- P5 parsing ---------------------------------------------------------- */

static int is_ws(uint8_t c) {
  return c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\v' || c == '\f';
}

/* fscanf whitespace directive: zero-or-more whitespace, never fails */
static int skip_ws(const uint8_t *buf, size_t len, size_t *pos) {
  size_t p = *pos;
  int seen = 0;
  while (p < len && is_ws(buf[p])) {
    p++;
    seen = 1;
  }
  *pos = p;
  return seen;
}

static int parse_uint(const uint8_t *buf, size_t len, size_t *pos, uint32_t *out) {
  size_t p = *pos;
  if (p >= len || buf[p] < '0' || buf[p] > '9') return -1;
  uint64_t v = 0;
  while (p < len && buf[p] >= '0' && buf[p] <= '9') {
    v = v * 10 + (buf[p] - '0');
    if (v > 0xFFFFFFFFULL) return -1;
    p++;
  }
  *pos = p;
  *out = (uint32_t)v;
  return 0;
}

/* Probe header: returns 0 and sets w/h/payload offset, or -1. */
EXPORT int gsio_probe_pgm(const uint8_t *buf, size_t len, uint32_t *w, uint32_t *h,
                          size_t *payload_off) {
  if (len < 2 || buf[0] != 'P' || buf[1] != '5') return -1;
  size_t pos = 2;
  uint32_t maxval;
  skip_ws(buf, len, &pos); /* zero-or-more, like fscanf's "\n" directive */
  if (parse_uint(buf, len, &pos, w) != 0) return -1;
  if (!skip_ws(buf, len, &pos)) return -1; /* digits would merge otherwise */
  if (parse_uint(buf, len, &pos, h) != 0) return -1;
  if (!skip_ws(buf, len, &pos)) return -1;
  if (parse_uint(buf, len, &pos, &maxval) != 0) return -1;
  /* fscanf's trailing "\n" greedily consumes the whitespace run (even a
   * whitespace-valued first pixel byte -- faithful to the reference) */
  skip_ws(buf, len, &pos);
  if (maxval != 255 || *w == 0 || *h == 0) return -1;
  if (len - pos < (size_t)(*w) * (*h)) return -1;
  *payload_off = pos;
  return 0;
}

EXPORT int gsio_decode_pgm(const uint8_t *buf, size_t len, uint32_t *w, uint32_t *h,
                           uint8_t *out, size_t out_cap) {
  size_t off;
  if (gsio_probe_pgm(buf, len, w, h, &off) != 0) return -1;
  size_t need = (size_t)(*w) * (*h);
  if (need > out_cap) return -1;
  memcpy(out, buf + off, need);
  return 0;
}

/* ---- file I/O ------------------------------------------------------------ */

static uint8_t *read_file(const char *path, size_t *len) {
  FILE *f = fopen(path, "rb");
  if (!f) return NULL;
  if (fseek(f, 0, SEEK_END) != 0) {
    fclose(f);
    return NULL;
  }
  long sz = ftell(f);
  if (sz < 0) {
    fclose(f);
    return NULL;
  }
  rewind(f);
  uint8_t *buf = (uint8_t *)malloc((size_t)sz);
  if (!buf) {
    fclose(f);
    return NULL;
  }
  size_t rd = fread(buf, 1, (size_t)sz, f);
  fclose(f);
  if (rd != (size_t)sz) {
    free(buf);
    return NULL;
  }
  *len = (size_t)sz;
  return buf;
}

EXPORT int gsio_read_pgm(const char *path, uint32_t *w, uint32_t *h, uint8_t *out,
                         size_t out_cap) {
  size_t len;
  uint8_t *buf = read_file(path, &len);
  if (!buf) return -1;
  int rc = gsio_decode_pgm(buf, len, w, h, out, out_cap);
  free(buf);
  return rc;
}

EXPORT int gsio_probe_pgm_file(const char *path, uint32_t *w, uint32_t *h) {
  size_t len;
  uint8_t *buf = read_file(path, &len);
  if (!buf) return -1;
  size_t off;
  int rc = gsio_probe_pgm(buf, len, w, h, &off);
  free(buf);
  return rc;
}

EXPORT int gsio_write_pgm(const char *path, const uint8_t *data, uint32_t w, uint32_t h) {
  FILE *f = fopen(path, "wb");
  if (!f) return -1;
  if (fprintf(f, "P5\n%u %u\n255\n", w, h) < 0) {
    fclose(f);
    return -1;
  }
  size_t need = (size_t)w * h;
  size_t wr = fwrite(data, 1, need, f);
  fclose(f);
  return wr == need ? 0 : -1;
}

/* ---- threaded batch loader ----------------------------------------------- */

typedef struct {
  const char *const *paths;
  uint8_t *out;        /* (n, pad_h, pad_w) zero-initialized by caller contract */
  int32_t *status;     /* per-file 0 ok / -1 error */
  uint32_t pad_h, pad_w;
  int n;
  int next;            /* work index, guarded by lock */
  pthread_mutex_t lock;
} batch_job;

static void *batch_worker(void *arg) {
  batch_job *job = (batch_job *)arg;
  for (;;) {
    pthread_mutex_lock(&job->lock);
    int i = job->next++;
    pthread_mutex_unlock(&job->lock);
    if (i >= job->n) break;

    size_t len;
    uint8_t *buf = read_file(job->paths[i], &len);
    uint32_t w, h;
    size_t off;
    if (!buf || gsio_probe_pgm(buf, len, &w, &h, &off) != 0) {
      job->status[i] = -1;
      free(buf);
      continue;
    }
    uint8_t *dst = job->out + (size_t)i * job->pad_h * job->pad_w;
    memset(dst, 0, (size_t)job->pad_h * job->pad_w);
    uint32_t copy_h = h < job->pad_h ? h : job->pad_h;
    uint32_t copy_w = w < job->pad_w ? w : job->pad_w;
    for (uint32_t y = 0; y < copy_h; y++)
      memcpy(dst + (size_t)y * job->pad_w, buf + off + (size_t)y * w, copy_w);
    job->status[i] = 0;
    free(buf);
  }
  return NULL;
}

/* Load n PGMs into a zero-padded (n, pad_h, pad_w) uint8 batch using up to
 * ``threads`` worker threads.  Returns the number of successfully loaded files;
 * status[i] reports per-file results. */
EXPORT int gsio_read_batch(const char *const *paths, int n, uint32_t pad_h, uint32_t pad_w,
                           uint8_t *out, int32_t *status, int threads) {
  if (n <= 0) return 0;
  if (threads < 1) threads = 1;
  if (threads > n) threads = n;
  if (threads > 64) threads = 64;
  batch_job job = {paths, out, status, pad_h, pad_w, n, 0, PTHREAD_MUTEX_INITIALIZER};
  pthread_t tids[64];
  int started = 0;
  for (int t = 0; t < threads; t++) {
    if (pthread_create(&tids[t], NULL, batch_worker, &job) != 0) break;
    started++;
  }
  if (started == 0) batch_worker(&job); /* fall back to inline */
  for (int t = 0; t < started; t++) pthread_join(tids[t], NULL);
  int ok = 0;
  for (int i = 0; i < n; i++) ok += (status[i] == 0);
  return ok;
}

/* Batched writer (sequential; write bandwidth is rarely the bottleneck). */
EXPORT int gsio_write_batch(const char *const *paths, int n, const uint8_t *data, uint32_t h,
                            uint32_t w) {
  int ok = 0;
  for (int i = 0; i < n; i++)
    ok += (gsio_write_pgm(paths[i], data + (size_t)i * h * w, w, h) == 0);
  return ok;
}
