/* Native CABAC arithmetic decoder engine.
 *
 * Exact counterpart of vtm_tpu/decoder/cabac.py CabacDecoder (itself the
 * behavioral equivalent of DecoderLib/BinDecoder.cpp decodeBin:276,
 * decodeBinEP, decodeBinsEP, decodeBinTrm and the BinProbModel_Std dual
 * 15-bit probability counters, Contexts.h:87-153).  The context state
 * lives in the Python ContextModels' numpy arrays (int32), accessed here
 * through the buffer protocol, so Python-side copy()/init()/WPP snapshots
 * keep working unchanged.
 *
 * Built on demand by vtm_tpu/native/__init__.py; the Python engine is the
 * always-available fallback (and the tracing engine).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <structmember.h>
#include <stdint.h>

#define MASK_0 (((1 << 10) - 1) << 5)  /* 0x7FE0: 10-bit counter mask */
#define MASK_1 (((1 << 14) - 1) << 1)  /* 0x7FFE: 14-bit counter mask */

typedef struct {
    PyObject_HEAD
    PyObject *data_obj;      /* bytes keeping the buffer alive */
    const uint8_t *data;
    Py_ssize_t len;
    Py_ssize_t pos;
    uint32_t range_;
    uint32_t value;
    int bits_needed;
    PyObject *ctx_obj;       /* ContextModels */
    Py_buffer b_s0, b_s1, b_r0, b_r1;
    int bufs_held;
    int32_t *s0, *s1, *r0, *r1;
    PyObject *renorm_obj;
    Py_buffer b_renorm;
    int renorm_held;
    const int32_t *renorm;
    PyObject *trace;      /* unused by the native engine (tracing uses the
                             Python engine); kept for interface parity */
    long trace_count;
} NativeCabac;

static void release_ctx_bufs(NativeCabac *self)
{
    if (self->bufs_held) {
        PyBuffer_Release(&self->b_s0);
        PyBuffer_Release(&self->b_s1);
        PyBuffer_Release(&self->b_r0);
        PyBuffer_Release(&self->b_r1);
        self->bufs_held = 0;
    }
    Py_CLEAR(self->ctx_obj);
}

static int bind_ctx(NativeCabac *self, PyObject *ctx)
{
    PyObject *a;
    release_ctx_bufs(self);
    a = PyObject_GetAttrString(ctx, "state0");
    if (!a || PyObject_GetBuffer(a, &self->b_s0, PyBUF_WRITABLE) < 0) { Py_XDECREF(a); return -1; }
    Py_DECREF(a);
    a = PyObject_GetAttrString(ctx, "state1");
    if (!a || PyObject_GetBuffer(a, &self->b_s1, PyBUF_WRITABLE) < 0) { Py_XDECREF(a); PyBuffer_Release(&self->b_s0); return -1; }
    Py_DECREF(a);
    a = PyObject_GetAttrString(ctx, "rate0");
    if (!a || PyObject_GetBuffer(a, &self->b_r0, PyBUF_SIMPLE) < 0) { Py_XDECREF(a); PyBuffer_Release(&self->b_s0); PyBuffer_Release(&self->b_s1); return -1; }
    Py_DECREF(a);
    a = PyObject_GetAttrString(ctx, "rate1");
    if (!a || PyObject_GetBuffer(a, &self->b_r1, PyBUF_SIMPLE) < 0) { Py_XDECREF(a); PyBuffer_Release(&self->b_s0); PyBuffer_Release(&self->b_s1); PyBuffer_Release(&self->b_r0); return -1; }
    Py_DECREF(a);
    self->s0 = (int32_t *)self->b_s0.buf;
    self->s1 = (int32_t *)self->b_s1.buf;
    self->r0 = (int32_t *)self->b_r0.buf;
    self->r1 = (int32_t *)self->b_r1.buf;
    self->bufs_held = 1;
    Py_INCREF(ctx);
    self->ctx_obj = ctx;
    return 0;
}

static int nc_init(NativeCabac *self, PyObject *args, PyObject *kwds)
{
    PyObject *data, *ctx, *renorm;
    if (!PyArg_ParseTuple(args, "OOO", &data, &ctx, &renorm))
        return -1;
    Py_buffer db;
    if (PyObject_GetBuffer(data, &db, PyBUF_SIMPLE) < 0)
        return -1;
    self->data = (const uint8_t *)db.buf;
    self->len = db.len;
    Py_INCREF(data);
    self->data_obj = data;
    PyBuffer_Release(&db);  /* bytes are immutable; keep the object ref */
    self->pos = 0;
    self->range_ = 0;
    self->value = 0;
    self->bits_needed = 0;
    if (PyObject_GetBuffer(renorm, &self->b_renorm, PyBUF_SIMPLE) < 0)
        return -1;
    self->renorm = (const int32_t *)self->b_renorm.buf;
    self->renorm_held = 1;
    Py_INCREF(renorm);
    self->renorm_obj = renorm;
    if (bind_ctx(self, ctx) < 0)
        return -1;
    Py_INCREF(Py_None);
    self->trace = Py_None;
    self->trace_count = 0;
    return 0;
}

static void nc_dealloc(NativeCabac *self)
{
    release_ctx_bufs(self);
    if (self->renorm_held)
        PyBuffer_Release(&self->b_renorm);
    Py_CLEAR(self->renorm_obj);
    Py_CLEAR(self->data_obj);
    Py_CLEAR(self->trace);
    Py_TYPE(self)->tp_free((PyObject *)self);
}

static inline uint32_t read_byte(NativeCabac *self)
{
    if (self->pos < self->len)
        return self->data[self->pos++];
    self->pos++;
    return 0;
}

static PyObject *nc_start(NativeCabac *self, PyObject *noargs)
{
    self->range_ = 510;
    self->value = (read_byte(self) << 8) + read_byte(self);
    self->bits_needed = -8;
    Py_RETURN_NONE;
}

static inline int decode_bin_impl(NativeCabac *self, Py_ssize_t i)
{
    int32_t s0 = self->s0[i], s1 = self->s1[i];
    uint32_t q = (uint32_t)(s0 + s1) >> 8;
    int bin_val = q >> 7;
    uint32_t qq = (q & 0x80) ? (q ^ 0xFF) : q;
    uint32_t lps = (((qq >> 2) * (self->range_ >> 5)) >> 1) + 4;
    self->range_ -= lps;
    uint32_t sr = self->range_ << 7;
    if (self->value < sr) {
        if (self->range_ < 256) {
            self->range_ <<= 1;
            self->value <<= 1;
            if (++self->bits_needed >= 0) {
                self->value += read_byte(self);
                self->bits_needed = -8;
            }
        }
    } else {
        bin_val = 1 - bin_val;
        int num_bits = self->renorm[lps >> 3];
        self->value = (self->value - sr) << num_bits;
        self->range_ = lps << num_bits;
        self->bits_needed += num_bits;
        if (self->bits_needed >= 0) {
            self->value += read_byte(self) << self->bits_needed;
            self->bits_needed -= 8;
        }
    }
    int32_t r0 = self->r0[i], r1 = self->r1[i];
    s0 -= (s0 >> r0) & MASK_0;
    s1 -= (s1 >> r1) & MASK_1;
    if (bin_val) {
        s0 += (0x7FFF >> r0) & MASK_0;
        s1 += (0x7FFF >> r1) & MASK_1;
    }
    self->s0[i] = s0;
    self->s1[i] = s1;
    return bin_val;
}

static PyObject *nc_decode_bin(NativeCabac *self, PyObject *arg)
{
    Py_ssize_t i = PyLong_AsSsize_t(arg);
    if (i == -1 && PyErr_Occurred())
        return NULL;
    return PyLong_FromLong(decode_bin_impl(self, i));
}

static inline int decode_bin_ep_impl(NativeCabac *self)
{
    self->value += self->value;
    if (++self->bits_needed >= 0) {
        self->value += read_byte(self);
        self->bits_needed = -8;
    }
    uint32_t sr = self->range_ << 7;
    if (self->value >= sr) {
        self->value -= sr;
        return 1;
    }
    return 0;
}

static PyObject *nc_decode_bin_ep(NativeCabac *self, PyObject *noargs)
{
    return PyLong_FromLong(decode_bin_ep_impl(self));
}

static uint64_t decode_aligned_bins_ep_impl(NativeCabac *self, int num_bins)
{
    int rem = num_bins;
    uint64_t bins = 0;
    while (rem > 0) {
        int n = rem < 8 ? rem : 8;
        uint32_t mask = (1u << n) - 1;
        uint32_t nb = (self->value >> (15 - n)) & mask;
        bins = (bins << n) | nb;
        self->value = (self->value << n) & 0x7FFF;
        rem -= n;
        self->bits_needed += n;
        if (self->bits_needed >= 0) {
            self->value |= read_byte(self) << self->bits_needed;
            self->bits_needed -= 8;
        }
    }
    return bins;
}

static uint64_t decode_bins_ep_impl(NativeCabac *self, int num_bins)
{
    if (num_bins == 0)
        return 0;
    if (self->range_ == 256)
        return decode_aligned_bins_ep_impl(self, num_bins);
    int rem = num_bins;
    uint64_t bins = 0;
    while (rem > 8) {
        self->value = (self->value << 8) + (read_byte(self) << (8 + self->bits_needed));
        uint32_t sr = self->range_ << 15;
        for (int k = 0; k < 8; k++) {
            bins += bins;
            sr >>= 1;
            if (self->value >= sr) {
                bins += 1;
                self->value -= sr;
            }
        }
        rem -= 8;
    }
    self->bits_needed += rem;
    self->value <<= rem;
    if (self->bits_needed >= 0) {
        self->value += read_byte(self) << self->bits_needed;
        self->bits_needed -= 8;
    }
    uint32_t sr = self->range_ << (rem + 7);
    for (int k = 0; k < rem; k++) {
        bins += bins;
        sr >>= 1;
        if (self->value >= sr) {
            bins += 1;
            self->value -= sr;
        }
    }
    return bins;
}

static PyObject *nc_decode_bins_ep(NativeCabac *self, PyObject *arg)
{
    long n = PyLong_AsLong(arg);
    if (n == -1 && PyErr_Occurred())
        return NULL;
    return PyLong_FromUnsignedLongLong(decode_bins_ep_impl(self, (int)n));
}

static PyObject *nc_decode_rem_abs_ep(NativeCabac *self, PyObject *args)
{
    long go_rice_par, cutoff, max_log2_tr_dr;
    if (!PyArg_ParseTuple(args, "lll", &go_rice_par, &cutoff, &max_log2_tr_dr))
        return NULL;
    long prefix = 0;
    long max_prefix = 32 - max_log2_tr_dr;
    int code_word = 0;
    for (;;) {
        prefix += 1;
        code_word = decode_bin_ep_impl(self);
        if (!(code_word && prefix < max_prefix))
            break;
    }
    prefix -= 1 - code_word;
    long length = go_rice_par;
    uint64_t offset;
    if (prefix < cutoff) {
        offset = (uint64_t)prefix << go_rice_par;
    } else {
        offset = (uint64_t)((1ull << (prefix - cutoff)) + cutoff - 1) << go_rice_par;
        length += (prefix == 32 - max_log2_tr_dr) ? (max_log2_tr_dr - go_rice_par)
                                                  : (prefix - cutoff);
    }
    return PyLong_FromUnsignedLongLong(offset + decode_bins_ep_impl(self, (int)length));
}

static PyObject *nc_decode_bin_trm(NativeCabac *self, PyObject *noargs)
{
    self->range_ -= 2;
    uint32_t sr = self->range_ << 7;
    if (self->value >= sr)
        return PyLong_FromLong(1);
    if (self->range_ < 256) {
        self->range_ += self->range_;
        self->value += self->value;
        if (++self->bits_needed == 0) {
            self->value += read_byte(self);
            self->bits_needed = -8;
        }
    }
    return PyLong_FromLong(0);
}

static PyObject *nc_align(NativeCabac *self, PyObject *noargs)
{
    self->range_ = 256;
    Py_RETURN_NONE;
}

static PyObject *nc_get_ctx(NativeCabac *self, void *closure)
{
    Py_INCREF(self->ctx_obj);
    return self->ctx_obj;
}

static int nc_set_ctx(NativeCabac *self, PyObject *value, void *closure)
{
    return bind_ctx(self, value);
}

static PyMemberDef nc_members[] = {
    {"pos", T_PYSSIZET, offsetof(NativeCabac, pos), 0, "byte position"},
    {"bits_needed", T_INT, offsetof(NativeCabac, bits_needed), 0, ""},
    {"trace", T_OBJECT, offsetof(NativeCabac, trace), 0, ""},
    {"trace_count", T_LONG, offsetof(NativeCabac, trace_count), 0, ""},
    {NULL}
};

static PyGetSetDef nc_getset[] = {
    {"ctx", (getter)nc_get_ctx, (setter)nc_set_ctx, "context models", NULL},
    {NULL}
};

static PyMethodDef nc_methods[] = {
    {"start", (PyCFunction)nc_start, METH_NOARGS, ""},
    {"decode_bin", (PyCFunction)nc_decode_bin, METH_O, ""},
    {"decode_bin_ep", (PyCFunction)nc_decode_bin_ep, METH_NOARGS, ""},
    {"decode_bins_ep", (PyCFunction)nc_decode_bins_ep, METH_O, ""},
    {"decode_rem_abs_ep", (PyCFunction)nc_decode_rem_abs_ep, METH_VARARGS, ""},
    {"decode_bin_trm", (PyCFunction)nc_decode_bin_trm, METH_NOARGS, ""},
    {"align", (PyCFunction)nc_align, METH_NOARGS, ""},
    {NULL}
};

static PyTypeObject NativeCabacType = {
    PyVarObject_HEAD_INIT(NULL, 0)
    .tp_name = "_cabac_native.NativeCabac",
    .tp_basicsize = sizeof(NativeCabac),
    .tp_flags = Py_TPFLAGS_DEFAULT,
    .tp_new = PyType_GenericNew,
    .tp_init = (initproc)nc_init,
    .tp_dealloc = (destructor)nc_dealloc,
    .tp_methods = nc_methods,
    .tp_members = nc_members,
    .tp_getset = nc_getset,
};

static PyModuleDef cabac_module = {
    PyModuleDef_HEAD_INIT, "_cabac_native", NULL, -1, NULL
};

PyMODINIT_FUNC PyInit__cabac_native(void)
{
    PyObject *m;
    if (PyType_Ready(&NativeCabacType) < 0)
        return NULL;
    m = PyModule_Create(&cabac_module);
    if (!m)
        return NULL;
    Py_INCREF(&NativeCabacType);
    PyModule_AddObject(m, "NativeCabac", (PyObject *)&NativeCabacType);
    return m;
}
