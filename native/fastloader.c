/* fastloader — native data-plane helpers for controllora_tpu.
 *
 * The reference's data plane is Python/PIL/cv2 per-sample work inside torch
 * DataLoader workers (SURVEY.md §2.1 data layer). This C extension provides the
 * TPU-host equivalents the input pipeline actually needs, without per-sample Python
 * overhead:
 *
 *   - fill50k_batch(...): rasterize a whole batch of fill50k samples (anti-aliased
 *     filled circle + ring guide, normalized to [-1, 1] float32 NHWC) in C with
 *     OpenMP-style threading (pthreads).
 *   - normalize_u8(...): uint8 HWC -> float32 [-1, 1] (the hot conversion in every
 *     dataset), multi-threaded.
 *
 * Exposed through ctypes-free CPython API; see controllora_tpu/data/fastloader.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <pthread.h>
#include <stdint.h>
#include <string.h>

/* ---------------------------------------------------------------- threading */

typedef struct {
    void (*fn)(void *, int);
    void *ctx;
    int begin, end;
} task_t;

static void *worker(void *arg) {
    task_t *t = (task_t *)arg;
    for (int i = t->begin; i < t->end; i++) t->fn(t->ctx, i);
    return NULL;
}

static void parallel_for(void (*fn)(void *, int), void *ctx, int n, int nthreads) {
    if (nthreads > n) nthreads = n > 0 ? n : 1;
    if (nthreads <= 1) {
        task_t t = {fn, ctx, 0, n};
        worker(&t);
        return;
    }
    pthread_t threads[64];
    task_t tasks[64];
    if (nthreads > 64) nthreads = 64;
    int chunk = (n + nthreads - 1) / nthreads;
    int k = 0;
    for (int i = 0; i < nthreads; i++) {
        int b = i * chunk, e = b + chunk;
        if (b >= n) break;
        if (e > n) e = n;
        tasks[i].fn = fn; tasks[i].ctx = ctx; tasks[i].begin = b; tasks[i].end = e;
        pthread_create(&threads[i], NULL, worker, &tasks[i]);
        k++;
    }
    for (int i = 0; i < k; i++) pthread_join(threads[i], NULL);
}

/* ---------------------------------------------------------------- fill50k */

typedef struct {
    float *pixels;   /* (B, R, R, 3) */
    float *guides;   /* (B, R, R, 3) */
    const float *spec; /* (B, 9): cx, cy, radius, bg_r, bg_g, bg_b, fg_r, fg_g, fg_b */
    int res;
} fill_ctx_t;

static void fill_one(void *vctx, int b) {
    fill_ctx_t *c = (fill_ctx_t *)vctx;
    const int r = c->res;
    const float *s = c->spec + b * 9;
    const float cx = s[0], cy = s[1], rad = s[2];
    float bg[3] = {s[3], s[4], s[5]};
    float fg[3] = {s[6], s[7], s[8]};
    float *px = c->pixels + (size_t)b * r * r * 3;
    float *gd = c->guides + (size_t)b * r * r * 3;
    for (int y = 0; y < r; y++) {
        for (int x = 0; x < r; x++) {
            float dx = (float)x - cx, dy = (float)y - cy;
            float d = sqrtf(dx * dx + dy * dy);
            size_t o = ((size_t)y * r + x) * 3;
            /* filled circle with 1px anti-aliased edge */
            float a = d <= rad - 0.5f ? 1.f : (d >= rad + 0.5f ? 0.f : rad + 0.5f - d);
            for (int ch = 0; ch < 3; ch++) {
                float v = fg[ch] * a + bg[ch] * (1.f - a);
                px[o + ch] = v / 127.5f - 1.f;
            }
            /* ring guide: |d - rad| <= 1.5 */
            float g = fabsf(d - rad) <= 1.5f ? 1.f : -1.f;
            gd[o] = g; gd[o + 1] = g; gd[o + 2] = g;
        }
    }
}

static PyObject *py_fill50k_batch(PyObject *self, PyObject *args) {
    Py_buffer spec, pixels, guides;
    int res, nthreads;
    if (!PyArg_ParseTuple(args, "y*y*y*ii", &spec, &pixels, &guides, &res, &nthreads))
        return NULL;
    int batch = (int)(spec.len / (9 * sizeof(float)));
    if ((size_t)pixels.len < (size_t)batch * res * res * 3 * sizeof(float) ||
        (size_t)guides.len < (size_t)batch * res * res * 3 * sizeof(float)) {
        PyErr_SetString(PyExc_ValueError, "output buffers too small");
        PyBuffer_Release(&spec); PyBuffer_Release(&pixels); PyBuffer_Release(&guides);
        return NULL;
    }
    fill_ctx_t ctx = {(float *)pixels.buf, (float *)guides.buf,
                      (const float *)spec.buf, res};
    Py_BEGIN_ALLOW_THREADS
    parallel_for(fill_one, &ctx, batch, nthreads);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&spec); PyBuffer_Release(&pixels); PyBuffer_Release(&guides);
    Py_RETURN_NONE;
}

/* ---------------------------------------------------------------- normalize */

typedef struct {
    const uint8_t *src;
    float *dst;
    size_t elems_per_item;
} norm_ctx_t;

static void norm_one(void *vctx, int i) {
    norm_ctx_t *c = (norm_ctx_t *)vctx;
    const uint8_t *s = c->src + (size_t)i * c->elems_per_item;
    float *d = c->dst + (size_t)i * c->elems_per_item;
    for (size_t j = 0; j < c->elems_per_item; j++)
        d[j] = (float)s[j] / 127.5f - 1.f;
}

static PyObject *py_normalize_u8(PyObject *self, PyObject *args) {
    Py_buffer src, dst;
    int items, nthreads;
    if (!PyArg_ParseTuple(args, "y*y*ii", &src, &dst, &items, &nthreads))
        return NULL;
    if ((size_t)dst.len != (size_t)src.len * sizeof(float)) {
        PyErr_SetString(PyExc_ValueError, "dst must be float32 of same element count");
        PyBuffer_Release(&src); PyBuffer_Release(&dst);
        return NULL;
    }
    norm_ctx_t ctx = {(const uint8_t *)src.buf, (float *)dst.buf,
                      src.len / (items > 0 ? items : 1)};
    Py_BEGIN_ALLOW_THREADS
    parallel_for(norm_one, &ctx, items, nthreads);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&src); PyBuffer_Release(&dst);
    Py_RETURN_NONE;
}

/* ---------------------------------------------------------------- module */

static PyMethodDef methods[] = {
    {"fill50k_batch", py_fill50k_batch, METH_VARARGS,
     "fill50k_batch(spec_f32, pixels_out_f32, guides_out_f32, res, nthreads)"},
    {"normalize_u8", py_normalize_u8, METH_VARARGS,
     "normalize_u8(src_u8, dst_f32, items, nthreads)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastloader", "native data-plane helpers", -1, methods,
};

PyMODINIT_FUNC PyInit__fastloader(void) { return PyModule_Create(&moduledef); }
