/* panvc3_native — C host-side hot loops for the TPU-native engine.
 *
 * The reference implements its entire runtime in C++ (SURVEY §2); here the
 * device math lives in JAX/XLA kernels and this extension supplies the
 * native host path around them:
 *
 *  - parse_cigars:      CIGAR strings -> flat (ops, counts, n_ops) arrays
 *  - finalize_rewrite:  interleave device rewrite results with pass-through
 *                       ops and RLE-collapse (the merge step of
 *                       ops/rewrite_batch.py) + indel-run detection
 *                       (indel_runs.py semantics) in a single pass
 *  - parse_sam_fields:  split SAM text lines into field offsets
 *
 * Built with setuptools (make native); panvc3_tpu falls back to the numpy
 * implementations when the extension is absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>

/* op codes follow the BAM encoding MIDNSHP=X (panvc3_tpu.cigar) */
#define OP_M 0
#define OP_I 1
#define OP_D 2
#define OP_N 3
#define OP_S 4
#define OP_H 5
#define OP_P 6
#define OP_EQ 7
#define OP_X 8
#define CODE_NONE 15

static const int8_t op_code_table[256] = {
    ['M'] = OP_M, ['I'] = OP_I, ['D'] = OP_D, ['N'] = OP_N,
    ['S'] = OP_S, ['H'] = OP_H, ['P'] = OP_P, ['='] = OP_EQ, ['X'] = OP_X,
};
static const char op_char_table[16] = "MIDNSHP=X??????\0";

static inline int is_ref_op(int8_t op)
{
    return op == OP_M || op == OP_EQ || op == OP_X || op == OP_D || op == OP_N;
}

static inline int is_mtype_op(int8_t op)
{
    return op == OP_M || op == OP_EQ || op == OP_X;
}

/* ------------------------------------------------------------------ */
/* parse_cigars(list[bytes]) -> (ops bytes, counts bytes, n_ops bytes)
 * ops int8, counts int32, n_ops int32 — caller wraps with numpy.      */
static PyObject *parse_cigars(PyObject *self, PyObject *args)
{
    PyObject *list;
    if (!PyArg_ParseTuple(args, "O!", &PyList_Type, &list))
        return NULL;

    Py_ssize_t n = PyList_GET_SIZE(list);
    Py_ssize_t cap = 256, total = 0;
    int8_t *ops = PyMem_Malloc(cap);
    int32_t *counts = PyMem_Malloc(cap * sizeof(int32_t));
    int32_t *n_ops = PyMem_Malloc(n * sizeof(int32_t));
    if (!ops || !counts || !n_ops)
        goto oom;

    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *item = PyList_GET_ITEM(list, i);
        char *text;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(item, &text, &len) < 0)
            goto fail;
        int32_t rec_ops = 0;
        Py_ssize_t p = 0;
        if (len == 1 && text[0] == '*')
            p = len;
        while (p < len) {
            int64_t count = 0;
            if (text[p] < '0' || text[p] > '9') {
                PyErr_Format(PyExc_ValueError, "invalid CIGAR at record %zd", i);
                goto fail;
            }
            while (p < len && text[p] >= '0' && text[p] <= '9') {
                count = count * 10 + (text[p] - '0');
                ++p;
            }
            if (p >= len) {
                PyErr_Format(PyExc_ValueError, "invalid CIGAR at record %zd", i);
                goto fail;
            }
            char oc = text[p++];
            int8_t code = op_code_table[(unsigned char)oc];
            if (code == 0 && oc != 'M') {
                PyErr_Format(PyExc_ValueError, "invalid CIGAR op '%c'", oc);
                goto fail;
            }
            if (total >= cap) {
                cap *= 2;
                int8_t *no = PyMem_Realloc(ops, cap);
                int32_t *nc = PyMem_Realloc(counts, cap * sizeof(int32_t));
                if (!no || !nc) {
                    if (no) ops = no;
                    if (nc) counts = nc;
                    goto oom;
                }
                ops = no;
                counts = nc;
            }
            ops[total] = code;
            counts[total] = (int32_t)count;
            ++total;
            ++rec_ops;
        }
        n_ops[i] = rec_ops;
    }

    {
        PyObject *r = Py_BuildValue(
            "(y#y#y#)",
            (char *)ops, (Py_ssize_t)total,
            (char *)counts, (Py_ssize_t)(total * sizeof(int32_t)),
            (char *)n_ops, (Py_ssize_t)(n * sizeof(int32_t)));
        PyMem_Free(ops);
        PyMem_Free(counts);
        PyMem_Free(n_ops);
        return r;
    }

oom:
    PyErr_NoMemory();
fail:
    PyMem_Free(ops);
    PyMem_Free(counts);
    PyMem_Free(n_ops);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* finalize_rewrite(unit_op bytes(int8), unit_count bytes(int32),
 *                  rec_n_units bytes(int32), dev_d bytes(int32),
 *                  dev_code bytes(int8), dst_pos bytes(int32))
 *   -> (run_ops bytes(int8), run_lens bytes(int32),
 *       runs_per_rec bytes(int32),
 *       indel list  [ (rec, ref_start, ref_len, q_start, q_len,
 *                      cig_start, cig_end, checker_ref, checker_q) ... ] )
 *
 * Walks the flat unit stream per record, interleaving the device results
 * for reference-consuming units, RLE-collapses into per-record runs, and
 * detects I+D indel runs over the *collapsed* output with the checker
 * semantics of panvc3::indel_run_checker.                               */
static PyObject *finalize_rewrite(PyObject *self, PyObject *args)
{
    Py_buffer unit_op_b, unit_count_b, rec_n_units_b, dev_d_b, dev_code_b, dst_pos_b;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*",
                          &unit_op_b, &unit_count_b, &rec_n_units_b,
                          &dev_d_b, &dev_code_b, &dst_pos_b))
        return NULL;

    const int8_t *unit_op = unit_op_b.buf;
    const int32_t *unit_count = unit_count_b.buf;
    const int32_t *rec_n_units = rec_n_units_b.buf;
    const int32_t *dev_d = dev_d_b.buf;
    const int8_t *dev_code = dev_code_b.buf;
    const int32_t *dst_pos = dst_pos_b.buf;

    Py_ssize_t total_units = unit_op_b.len;
    Py_ssize_t n_rec = rec_n_units_b.len / sizeof(int32_t);

    Py_ssize_t cap = total_units * 2 + 16;
    int8_t *run_ops = PyMem_Malloc(cap);
    int32_t *run_lens = PyMem_Malloc(cap * sizeof(int32_t));
    int32_t *runs_per_rec = PyMem_Malloc(n_rec * sizeof(int32_t));
    PyObject *indel_list = PyList_New(0);
    if (!run_ops || !run_lens || !runs_per_rec || !indel_list) {
        PyErr_NoMemory();
        goto fail;
    }

    Py_ssize_t u = 0;      /* flat unit cursor */
    Py_ssize_t dev = 0;    /* device ref-unit cursor */
    Py_ssize_t out = 0;    /* emitted run cursor */

    for (Py_ssize_t rec = 0; rec < n_rec; ++rec) {
        Py_ssize_t rec_start = out;
        int32_t nu = rec_n_units[rec];
        int8_t cur_op = -1;
        int64_t cur_len = 0;

        #define EMIT(OP, LEN)                                            \
            do {                                                          \
                if ((LEN) > 0) {                                          \
                    if ((OP) == cur_op)                                   \
                        cur_len += (LEN);                                 \
                    else {                                                \
                        if (cur_len > 0) {                                \
                            run_ops[out] = cur_op;                        \
                            run_lens[out] = (int32_t)cur_len;             \
                            ++out;                                        \
                        }                                                 \
                        cur_op = (OP);                                    \
                        cur_len = (LEN);                                  \
                    }                                                     \
                }                                                         \
            } while (0)

        for (int32_t k = 0; k < nu; ++k, ++u) {
            int8_t op = unit_op[u];
            if (is_ref_op(op)) {
                EMIT(OP_D, dev_d[dev]);
                int8_t code = dev_code[dev];
                if (code != CODE_NONE)
                    EMIT(code, 1);
                ++dev;
            } else {
                EMIT(op, unit_count[u]);
            }
        }
        if (cur_len > 0) {
            run_ops[out] = cur_op;
            run_lens[out] = (int32_t)cur_len;
            ++out;
        }
        #undef EMIT
        runs_per_rec[rec] = (int32_t)(out - rec_start);

        /* indel-run detection over [rec_start, out) with checker
         * semantics (indel_run_checker.cc:31-121) */
        {
            int64_t ref_pos = dst_pos[rec], query_pos = 0;
            int64_t ref_loc = ref_pos, query_loc = 0;
            Py_ssize_t cig_first = 0;
            int run_type = 0;
            Py_ssize_t n_ops_rec = out - rec_start;
            for (Py_ssize_t i = 0; i < n_ops_rec; ++i) {
                int64_t ref_before = ref_pos, query_before = query_pos;
                int prev_type = run_type;
                if (run_type == 0) {
                    ref_loc = ref_pos;
                    query_loc = query_pos;
                    cig_first = i;
                }
                int8_t op = run_ops[rec_start + i];
                int32_t count = run_lens[rec_start + i];
                int report = 0;
                switch (op) {
                case OP_H: case OP_P:
                    run_type = 0;
                    report = (prev_type == 3);
                    break;
                case OP_I:
                    query_pos += count;
                    run_type |= 1;
                    break;
                case OP_D:
                    ref_pos += count;
                    run_type |= 2;
                    break;
                case OP_S:
                    query_pos += count;
                    run_type = 0;
                    report = (prev_type == 3);
                    break;
                case OP_N:
                    ref_pos += count;
                    run_type = 0;
                    report = (prev_type == 3);
                    break;
                default: /* M/=/X */
                    ref_pos += count;
                    query_pos += count;
                    run_type = 0;
                    report = (prev_type == 3);
                    break;
                }
                if (report) {
                    PyObject *t = Py_BuildValue(
                        "(nLLLLnnLL)",
                        rec,
                        (long long)ref_loc,
                        (long long)(ref_before - ref_loc),
                        (long long)query_loc,
                        (long long)(query_before - query_loc),
                        (Py_ssize_t)cig_first, (Py_ssize_t)i,
                        (long long)ref_pos, (long long)query_pos);
                    if (!t || PyList_Append(indel_list, t) < 0) {
                        Py_XDECREF(t);
                        goto fail;
                    }
                    Py_DECREF(t);
                }
            }
            if (run_type == 3) {
                PyObject *t = Py_BuildValue(
                    "(nLLLLnnLL)",
                    rec,
                    (long long)ref_loc,
                    (long long)(ref_pos - ref_loc),
                    (long long)query_loc,
                    (long long)(query_pos - query_loc),
                    (Py_ssize_t)cig_first, (Py_ssize_t)n_ops_rec,
                    (long long)ref_pos, (long long)query_pos);
                if (!t || PyList_Append(indel_list, t) < 0) {
                    Py_XDECREF(t);
                    goto fail;
                }
                Py_DECREF(t);
            }
        }
    }

    {
        PyObject *r = Py_BuildValue(
            "(y#y#y#N)",
            (char *)run_ops, (Py_ssize_t)out,
            (char *)run_lens, (Py_ssize_t)(out * sizeof(int32_t)),
            (char *)runs_per_rec, (Py_ssize_t)(n_rec * sizeof(int32_t)),
            indel_list);
        PyMem_Free(run_ops);
        PyMem_Free(run_lens);
        PyMem_Free(runs_per_rec);
        PyBuffer_Release(&unit_op_b);
        PyBuffer_Release(&unit_count_b);
        PyBuffer_Release(&rec_n_units_b);
        PyBuffer_Release(&dev_d_b);
        PyBuffer_Release(&dev_code_b);
        PyBuffer_Release(&dst_pos_b);
        return r;
    }

fail:
    PyMem_Free(run_ops);
    PyMem_Free(run_lens);
    PyMem_Free(runs_per_rec);
    Py_XDECREF(indel_list);
    PyBuffer_Release(&unit_op_b);
    PyBuffer_Release(&unit_count_b);
    PyBuffer_Release(&rec_n_units_b);
    PyBuffer_Release(&dev_d_b);
    PyBuffer_Release(&dev_code_b);
    PyBuffer_Release(&dst_pos_b);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* format_cigars(run_ops bytes(int8), run_lens bytes(int32),
 *               runs_per_rec bytes(int32)) -> list[bytes]             */
static PyObject *format_cigars(PyObject *self, PyObject *args)
{
    Py_buffer ops_b, lens_b, per_rec_b;
    if (!PyArg_ParseTuple(args, "y*y*y*", &ops_b, &lens_b, &per_rec_b))
        return NULL;
    const int8_t *ops = ops_b.buf;
    const int32_t *lens = lens_b.buf;
    const int32_t *per_rec = per_rec_b.buf;
    Py_ssize_t n_rec = per_rec_b.len / sizeof(int32_t);

    PyObject *result = PyList_New(n_rec);
    if (!result)
        goto fail;
    char buf[16 * 4096];
    Py_ssize_t k = 0;
    for (Py_ssize_t rec = 0; rec < n_rec; ++rec) {
        Py_ssize_t pos = 0;
        int32_t nr = per_rec[rec];
        if (nr == 0) {
            buf[pos++] = '*';
        }
        for (int32_t i = 0; i < nr; ++i, ++k) {
            if (pos + 16 > (Py_ssize_t)sizeof(buf)) {
                PyErr_SetString(PyExc_ValueError, "CIGAR too long");
                goto fail;
            }
            pos += snprintf(buf + pos, 16, "%d%c", lens[k], op_char_table[ops[k] & 15]);
        }
        PyObject *s = PyBytes_FromStringAndSize(buf, pos);
        if (!s)
            goto fail;
        PyList_SET_ITEM(result, rec, s);
    }
    PyBuffer_Release(&ops_b);
    PyBuffer_Release(&lens_b);
    PyBuffer_Release(&per_rec_b);
    return result;

fail:
    Py_XDECREF(result);
    PyBuffer_Release(&ops_b);
    PyBuffer_Release(&lens_b);
    PyBuffer_Release(&per_rec_b);
    return NULL;
}

/* ------------------------------------------------------------------ */
static PyMethodDef methods[] = {
    {"parse_cigars", parse_cigars, METH_VARARGS,
     "Parse a list of CIGAR byte strings into flat op/count arrays."},
    {"finalize_rewrite", finalize_rewrite, METH_VARARGS,
     "Merge device rewrite results with pass-through ops, RLE-collapse and "
     "detect indel runs."},
    {"format_cigars", format_cigars, METH_VARARGS,
     "Format flat run arrays into CIGAR byte strings."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_panvc3_native", NULL, -1, methods,
};

PyMODINIT_FUNC PyInit__panvc3_native(void)
{
    return PyModule_Create(&moduledef);
}
