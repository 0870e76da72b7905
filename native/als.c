/* alignment_statistics chunk engine.
 *
 * C implementation of the four modes of pipeline/alignment_statistics.py
 * (re-derivation of /root/reference/alignment-statistics/main.cc): the
 * shared record filter (main.cc:142-249), per-position coverage via the
 * two-set interval sweep (main.cc:252-332), per-contig counts, the MAPQ
 * histogram, and the binned extended-P² box plot (main.cc:400-466) with
 * the estimator ported operation-for-operation from the Python
 * ExtendedP2 (identical double arithmetic => identical output text).
 *
 *   als_new(mode, refmap, eq_class, has_filter, primary_only, same_ref,
 *           include_clipping, bin_width) -> capsule
 *   als_chunk(capsule, lines) -> blob
 *   als_finish(capsule) -> (blob, aux, flags_nm, ref_mm, mate_mm)
 *
 * mode: 0 coverage, 1 count-alignments, 2 mapq-histogram, 3 mapq-box-plot.
 * aux is the counts list (mode 1) or histogram list (mode 2), else None;
 * blob carries the body text for modes 0 and 3 (header lines and
 * counts/histogram formatting stay in Python).
 */

#include "panvc3_common.h"
#include <math.h>

typedef struct {
    const char *name;
    Py_ssize_t len;
    long id;
} als_refent;

static uint64_t als_fnv1a(const char *s, Py_ssize_t n)
{
    uint64_t h = 1469598103934665603ULL;
    for (Py_ssize_t i = 0; i < n; ++i) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static long als_ref_lookup(const als_refent *ents, const int32_t *hslot,
                           size_t hcap, const char *s, Py_ssize_t n)
{
    uint64_t h = als_fnv1a(s, n) & (hcap - 1);
    for (;;) {
        int32_t e = hslot[h];
        if (e < 0)
            return -2;
        if (ents[e].len == n && memcmp(ents[e].name, s, n) == 0)
            return ents[e].id;
        h = (h + 1) & (hcap - 1);
    }
}

static int als_parse_long(const char *s, const char *end, long *out)
{
    if (s >= end)
        return -1;
    int neg = 0;
    if (*s == '-') {
        neg = 1;
        ++s;
        if (s >= end)
            return -1;
    }
    long v = 0;
    while (s < end) {
        if (*s < '0' || *s > '9')
            return -1;
        v = v * 10 + (*s++ - '0');
    }
    *out = neg ? -v : v;
    return 0;
}

/* min-heap of long (only the minimum and the size are observable, so any
   heap order matches Python's heapq semantics) */
typedef struct {
    long *a;
    size_t n, cap;
} als_heap;

static int als_heap_push(als_heap *h, long v)
{
    if (h->n + 1 > h->cap) {
        size_t ncap = h->cap ? h->cap * 2 : 64;
        long *na = realloc(h->a, ncap * sizeof(long));
        if (!na)
            return -1;
        h->a = na;
        h->cap = ncap;
    }
    size_t i = h->n++;
    h->a[i] = v;
    while (i > 0) {
        size_t p = (i - 1) / 2;
        if (h->a[p] <= h->a[i])
            break;
        long t = h->a[p];
        h->a[p] = h->a[i];
        h->a[i] = t;
        i = p;
    }
    return 0;
}

static void als_heap_pop(als_heap *h)
{
    h->a[0] = h->a[--h->n];
    size_t i = 0;
    for (;;) {
        size_t l = 2 * i + 1, r = l + 1, m = i;
        if (l < h->n && h->a[l] < h->a[m])
            m = l;
        if (r < h->n && h->a[r] < h->a[m])
            m = r;
        if (m == i)
            break;
        long t = h->a[m];
        h->a[m] = h->a[i];
        h->a[i] = t;
        i = m;
    }
}

/* extended-P² estimator, ported op-for-op from ExtendedP2 (the Python
   keeps duplicate marker probabilities: m = 17 for the 5 box-plot
   quantiles, not 2k+3 distinct) */
#define ALS_P2_M 17
typedef struct {
    double m_probs[ALS_P2_M];
    double heights[ALS_P2_M];
    double actual[ALS_P2_M];
    double desired[ALS_P2_M];
    int m;
    long count;
} als_p2;

static int als_dbl_cmp(const void *a, const void *b)
{
    double x = *(const double *)a, y = *(const double *)b;
    return (x > y) - (x < y);
}

static void als_p2_init(als_p2 *acc)
{
    static const double probs[5] = {0.1, 0.25, 0.50, 0.75, 0.9};
    int k = 0;
    acc->m_probs[k++] = 0.0;
    for (int i = 0; i < 5; ++i)
        acc->m_probs[k++] = probs[i] / 2.0;
    for (int i = 0; i < 5; ++i)
        acc->m_probs[k++] = probs[i];
    for (int i = 0; i < 5; ++i)
        acc->m_probs[k++] = (1.0 + probs[i]) / 2.0;
    acc->m_probs[k++] = 1.0;
    acc->m = k;
    qsort(acc->m_probs, acc->m, sizeof(double), als_dbl_cmp);
    acc->count = 0;
}

static void als_p2_add(als_p2 *acc, double x)
{
    int m = acc->m;
    ++acc->count;
    if (acc->count <= m) {
        acc->heights[acc->count - 1] = x;
        if (acc->count == m) {
            qsort(acc->heights, m, sizeof(double), als_dbl_cmp);
            for (int i = 0; i < m; ++i)
                acc->actual[i] = (double)(i + 1);
            for (int i = 0; i < m; ++i)
                acc->desired[i] = 1.0 + (m - 1) * acc->m_probs[i];
        }
        return;
    }

    int k;
    if (x < acc->heights[0]) {
        acc->heights[0] = x;
        k = 0;
    } else if (x >= acc->heights[m - 1]) {
        acc->heights[m - 1] = x;
        k = m - 2;
    } else {
        k = 0;
        for (int i = 0; i < m - 1; ++i)
            if (acc->heights[i] <= x && x < acc->heights[i + 1]) {
                k = i;
                break;
            }
    }
    for (int i = k + 1; i < m; ++i)
        acc->actual[i] += 1.0;
    for (int i = 0; i < m; ++i)
        acc->desired[i] += acc->m_probs[i];

    for (int i = 1; i < m - 1; ++i) {
        double d = acc->desired[i] - acc->actual[i];
        if ((d >= 1.0 && acc->actual[i + 1] - acc->actual[i] > 1.0) ||
            (d <= -1.0 && acc->actual[i - 1] - acc->actual[i] < -1.0)) {
            double s = d >= 0 ? 1.0 : -1.0;
            double h = acc->heights[i], hp = acc->heights[i + 1],
                   hm = acc->heights[i - 1];
            double n = acc->actual[i], np_ = acc->actual[i + 1],
                   nm = acc->actual[i - 1];
            double new_h = h + s / (np_ - nm) *
                                   ((n - nm + s) * (hp - h) / (np_ - n) +
                                    (np_ - n - s) * (h - hm) / (n - nm));
            if (hm < new_h && new_h < hp) {
                acc->heights[i] = new_h;
            } else {
                if (s > 0)
                    acc->heights[i] = h + (hp - h) / (np_ - n);
                else
                    acc->heights[i] = h - (hm - h) / (nm - n);
            }
            acc->actual[i] += s;
        }
    }
}

static double als_p2_quantile(const als_p2 *acc, double p)
{
    if (acc->count == 0)
        return (double)NAN;
    if (acc->count < acc->m) {
        double hs[ALS_P2_M];
        memcpy(hs, acc->heights, acc->count * sizeof(double));
        qsort(hs, acc->count, sizeof(double), als_dbl_cmp);
        long idx = (long)(p * acc->count);
        if (idx < 0)
            idx = 0;
        if (idx > acc->count - 1)
            idx = acc->count - 1;
        return hs[idx];
    }
    int best = 0;
    double bd = fabs(acc->m_probs[0] - p);
    for (int i = 1; i < acc->m; ++i) {
        double d = fabs(acc->m_probs[i] - p);
        if (d < bd) {
            bd = d;
            best = i;
        }
    }
    return acc->heights[best];
}

static double als_p2_min(const als_p2 *acc)
{
    if (acc->count == 0)
        return (double)NAN;
    if (acc->count < acc->m) {
        double v = acc->heights[0];
        for (long i = 1; i < acc->count; ++i)
            if (acc->heights[i] < v)
                v = acc->heights[i];
        return v;
    }
    return acc->heights[0];
}

static double als_p2_max(const als_p2 *acc)
{
    if (acc->count == 0)
        return (double)NAN;
    if (acc->count < acc->m) {
        double v = acc->heights[0];
        for (long i = 1; i < acc->count; ++i)
            if (acc->heights[i] > v)
                v = acc->heights[i];
        return v;
    }
    return acc->heights[acc->m - 1];
}

/* C++ ostream default double formatting = Python f"{x:.6g}" = %.6g */
static int als_put_g6(pv3_strbuf *sb, double x)
{
    char tmp[40];
    int n;
    if (x != x)
        n = snprintf(tmp, sizeof tmp, "nan");
    else
        n = snprintf(tmp, sizeof tmp, "%.6g", x);
    return pv3_sb_put(sb, tmp, (size_t)n);
}

/* --- engine state -------------------------------------------------------- */

typedef struct {
    int mode; /* 0 coverage, 1 count, 2 hist, 3 box */
    int has_filter, primary_only, same_ref, include_clipping;
    long bin_width;
    Py_ssize_t n_refs;
    long *eq_class; /* -1 = not in filter */
    als_refent *ents;
    int32_t *hslot;
    size_t hcap;
    char *name_arena;
    /* stats */
    long flags_not_matched, ref_id_mismatches, mate_ref_mismatches;
    /* coverage state */
    als_heap left;
    long *right;
    size_t n_right, cap_right;
    long prev_pos;
    /* count / hist state */
    long *counts; /* n_refs (mode 1) or 256 (mode 2) */
    /* box state */
    als_p2 acc;
    long current_bin;
} als_state;

static void als_state_free(als_state *st)
{
    if (!st)
        return;
    free(st->eq_class);
    free(st->ents);
    free(st->hslot);
    free(st->name_arena);
    free(st->left.a);
    free(st->right);
    free(st->counts);
    free(st);
}

static void als_capsule_destructor(PyObject *cap)
{
    als_state_free((als_state *)PyCapsule_GetPointer(cap, "panvc3.als"));
}

PyObject *pv3_als_new(PyObject *self, PyObject *args)
{
    int mode, has_filter, primary_only, same_ref, include_clipping;
    long bin_width;
    PyObject *refmap, *eq_list;
    if (!PyArg_ParseTuple(args, "iO!O!iiiil", &mode, &PyDict_Type, &refmap,
                          &PyList_Type, &eq_list, &has_filter,
                          &primary_only, &same_ref, &include_clipping,
                          &bin_width))
        return NULL;

    als_state *st = calloc(1, sizeof(als_state));
    if (!st)
        return PyErr_NoMemory();
    st->mode = mode;
    st->has_filter = has_filter;
    st->primary_only = primary_only;
    st->same_ref = same_ref;
    st->include_clipping = include_clipping;
    st->bin_width = bin_width;
    st->n_refs = PyList_GET_SIZE(eq_list);
    st->prev_pos = 0;
    st->current_bin = 0;
    als_p2_init(&st->acc);

    st->eq_class = malloc((st->n_refs ? st->n_refs : 1) * sizeof(long));
    if (!st->eq_class)
        goto oom;
    for (Py_ssize_t i = 0; i < st->n_refs; ++i) {
        st->eq_class[i] = PyLong_AsLong(PyList_GET_ITEM(eq_list, i));
        if (st->eq_class[i] == -1 && PyErr_Occurred())
            goto fail;
    }
    if (mode == 1 || mode == 2) {
        size_t n = mode == 1 ? (size_t)st->n_refs : 256;
        st->counts = calloc(n ? n : 1, sizeof(long));
        if (!st->counts)
            goto oom;
    }

    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        st->hcap = 8;
        while (st->hcap < (size_t)n_refs * 2)
            st->hcap <<= 1;
        st->ents = malloc((n_refs ? n_refs : 1) * sizeof(als_refent));
        st->hslot = malloc(st->hcap * sizeof(int32_t));
        if (!st->ents || !st->hslot)
            goto oom;
        for (size_t i = 0; i < st->hcap; ++i)
            st->hslot[i] = -1;
        size_t arena_len = 0;
        PyObject *k, *v;
        Py_ssize_t ppos = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            if (!PyBytes_Check(k)) {
                PyErr_SetString(PyExc_TypeError, "refmap keys must be bytes");
                goto fail;
            }
            arena_len += (size_t)PyBytes_GET_SIZE(k);
        }
        st->name_arena = malloc(arena_len ? arena_len : 1);
        if (!st->name_arena)
            goto oom;
        size_t off = 0;
        Py_ssize_t ei = 0;
        ppos = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            Py_ssize_t kl = PyBytes_GET_SIZE(k);
            memcpy(st->name_arena + off, PyBytes_AS_STRING(k), kl);
            long idv = PyLong_AsLong(v);
            if (idv == -1 && PyErr_Occurred())
                goto fail;
            uint64_t h =
                als_fnv1a(st->name_arena + off, kl) & (st->hcap - 1);
            while (st->hslot[h] >= 0)
                h = (h + 1) & (st->hcap - 1);
            st->ents[ei].name = st->name_arena + off;
            st->ents[ei].len = kl;
            st->ents[ei].id = idv;
            st->hslot[h] = (int32_t)ei;
            ++ei;
            off += (size_t)kl;
        }
    }
    return PyCapsule_New(st, "panvc3.als", als_capsule_destructor);
oom:
    PyErr_NoMemory();
fail:
    als_state_free(st);
    return NULL;
}

/* drain the coverage sweep up to (exclusive) pos; pos < 0 = drain all */
static int als_cov_drain(als_state *st, long pos, pv3_strbuf *out)
{
    for (size_t i = 0; i < st->n_right; ++i)
        if (als_heap_push(&st->left, st->right[i]) < 0)
            return -1;
    st->n_right = 0;
    while (st->left.n && (pos < 0 || st->prev_pos < pos)) {
        while (st->left.n && st->left.a[0] <= st->prev_pos)
            als_heap_pop(&st->left);
        if (pv3_sb_put_long(out, st->prev_pos) < 0 ||
            pv3_sb_putc(out, '\t') < 0 ||
            pv3_sb_put_long(out, (long)st->left.n) < 0 ||
            pv3_sb_putc(out, '\n') < 0)
            return -1;
        ++st->prev_pos;
    }
    return 0;
}

static int als_box_print(als_state *st, pv3_strbuf *out)
{
    static const double qs[5] = {0.1, 0.25, 0.5, 0.75, 0.9};
    if (pv3_sb_put_long(out, st->current_bin) < 0 ||
        pv3_sb_putc(out, '\t') < 0 ||
        als_put_g6(out, als_p2_min(&st->acc)) < 0)
        return -1;
    for (int i = 0; i < 5; ++i)
        if (pv3_sb_putc(out, '\t') < 0 ||
            als_put_g6(out, als_p2_quantile(&st->acc, qs[i])) < 0)
            return -1;
    if (pv3_sb_putc(out, '\t') < 0 ||
        als_put_g6(out, als_p2_max(&st->acc)) < 0 ||
        pv3_sb_putc(out, '\t') < 0 ||
        pv3_sb_put_long(out, st->acc.count) < 0 ||
        pv3_sb_putc(out, '\n') < 0)
        return -1;
    return 0;
}

PyObject *pv3_als_chunk(PyObject *self, PyObject *args)
{
    PyObject *cap, *lines;
    if (!PyArg_ParseTuple(args, "OO!", &cap, &PyList_Type, &lines))
        return NULL;
    als_state *st = PyCapsule_GetPointer(cap, "panvc3.als");
    if (!st)
        return NULL;

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    const char **lp = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    Py_ssize_t *ll =
        PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    pv3_strbuf out = {NULL, 0, 0};
    PyThreadState *ts = NULL;
    char errmsg[160];
    int errkind = 0;

    if (!lp || !ll)
        goto oom;
    for (Py_ssize_t i = 0; i < n_lines; ++i) {
        char *p;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, i), &p, &ll[i]) <
            0)
            goto fail;
        lp[i] = p;
    }

    ts = PyEval_SaveThread();

    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        const char *line = lp[li];
        Py_ssize_t line_len = ll[li];
        while (line_len > 0 && (line[line_len - 1] == '\n' ||
                                line[line_len - 1] == '\r'))
            --line_len;

        const char *fields[11];
        Py_ssize_t flens[11];
        int n_fields = 0;
        const char *p = line, *end = line + line_len;
        while (n_fields < 11) {
            const char *tab = memchr(p, '\t', end - p);
            fields[n_fields] = p;
            flens[n_fields] = (tab ? tab : end) - p;
            ++n_fields;
            if (!tab) {
                p = end;
                break;
            }
            p = tab + 1;
        }
        if (n_fields < 11) {
            errkind = 1;
            snprintf(errmsg, sizeof errmsg, "truncated SAM record: %.100s",
                     line);
            break;
        }
        long flag, pos1, mapq;
        if (als_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            als_parse_long(fields[3], fields[3] + flens[3], &pos1) != 0 ||
            als_parse_long(fields[4], fields[4] + flens[4], &mapq) != 0) {
            errkind = 1;
            snprintf(errmsg, sizeof errmsg, "malformed SAM record: %.100s",
                     line);
            break;
        }
        long pos = pos1 - 1;

        /* shared filter (iter_filtered / main.cc:142-249) */
        if (flag & (0x4 | 0x200 | 0x400 | 0x800)) {
            ++st->flags_not_matched;
            continue;
        }
        if (st->primary_only && (flag & 0x100)) {
            ++st->flags_not_matched;
            continue;
        }
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            ref_id = als_ref_lookup(st->ents, st->hslot, st->hcap,
                                    fields[2], flens[2]);
            if (ref_id == -2) {
                errkind = 1;
                snprintf(errmsg, sizeof errmsg,
                         "unknown reference '%.100s'", fields[2]);
                break;
            }
        }
        if (st->has_filter) {
            if (ref_id < 0 || st->eq_class[ref_id] < 0) {
                ++st->ref_id_mismatches;
                continue;
            }
            if (st->same_ref) {
                long mate_ref = -1;
                if (flens[6] == 1 && fields[6][0] == '*') {
                    mate_ref = -1;
                } else if (flens[6] == 1 && fields[6][0] == '=') {
                    mate_ref = ref_id;
                } else {
                    mate_ref = als_ref_lookup(st->ents, st->hslot, st->hcap,
                                              fields[6], flens[6]);
                    if (mate_ref == -2) {
                        errkind = 1;
                        snprintf(errmsg, sizeof errmsg,
                                 "unknown mate reference '%.100s'",
                                 fields[6]);
                        break;
                    }
                }
                if (mate_ref < 0) {
                    ++st->mate_ref_mismatches;
                    continue;
                }
                if (st->eq_class[ref_id] != st->eq_class[mate_ref]) {
                    ++st->mate_ref_mismatches;
                    continue;
                }
            }
        }
        if (pos < 0) {
            ++st->flags_not_matched;
            continue;
        }

        switch (st->mode) {
        case 0: { /* coverage */
            if (st->prev_pos > pos) {
                errkind = 1;
                snprintf(errmsg, sizeof errmsg,
                         "alignments must be sorted by position");
                goto loop_done;
            }
            /* record length (calculate_record_length) */
            long ref_len = 0;
            {
                const char *c = fields[5], *cend = c + flens[5];
                if (!(flens[5] == 1 && *c == '*')) {
                    while (c < cend) {
                        long count = 0;
                        const char *d0 = c;
                        while (c < cend && *c >= '0' && *c <= '9')
                            count = count * 10 + (*c++ - '0');
                        char oc = (c < cend) ? *c : 0;
                        int8_t code = pv3_op_code_table[(unsigned char)oc];
                        if (c == d0 || c == cend ||
                            (code == 0 && oc != 'M')) {
                            errkind = 1;
                            snprintf(errmsg, sizeof errmsg,
                                     "invalid CIGAR: '%.50s'", fields[5]);
                            goto loop_done;
                        }
                        ++c;
                        if (pv3_is_ref_op(code))
                            ref_len += count;
                        else if ((code == OP_I || code == OP_S) &&
                                 st->include_clipping)
                            ref_len += count;
                    }
                }
            }
            long rec_end = pos + ref_len;
            if (st->prev_pos < pos) {
                if (als_cov_drain(st, pos, &out) < 0) {
                    errkind = 2;
                    goto loop_done;
                }
            }
            if (ref_len) {
                if (st->n_right + 1 > st->cap_right) {
                    size_t ncap = st->cap_right ? st->cap_right * 2 : 64;
                    long *nr = realloc(st->right, ncap * sizeof(long));
                    if (!nr) {
                        errkind = 2;
                        goto loop_done;
                    }
                    st->right = nr;
                    st->cap_right = ncap;
                }
                st->right[st->n_right++] = rec_end;
            }
            st->prev_pos = pos;
            break;
        }
        case 1: /* count-alignments */
            if (ref_id >= 0)
                ++st->counts[ref_id];
            break;
        case 2: /* mapq-histogram */
            if (mapq >= 0 && mapq < 256)
                ++st->counts[mapq];
            break;
        case 3: { /* mapq-box-plot */
            long b = pos / st->bin_width;
            if (b != st->current_bin) {
                if (als_box_print(st, &out) < 0) {
                    errkind = 2;
                    goto loop_done;
                }
                st->current_bin = b;
                als_p2_init(&st->acc);
            }
            if (mapq < 255)
                als_p2_add(&st->acc, (double)mapq);
            break;
        }
        }
    }
loop_done:

    PyEval_RestoreThread(ts);
    ts = NULL;

    if (errkind == 1) {
        PyErr_SetString(PyExc_ValueError, errmsg);
        goto fail;
    }
    if (errkind == 2)
        goto oom;

    {
        PyObject *res = Py_BuildValue("y#", out.buf ? out.buf : "",
                                      (Py_ssize_t)out.len);
        PyMem_Free(lp);
        PyMem_Free(ll);
        free(out.buf);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    if (ts)
        PyEval_RestoreThread(ts);
    PyMem_Free(lp);
    PyMem_Free(ll);
    free(out.buf);
    return NULL;
}

PyObject *pv3_als_finish(PyObject *self, PyObject *args)
{
    PyObject *cap;
    if (!PyArg_ParseTuple(args, "O", &cap))
        return NULL;
    als_state *st = PyCapsule_GetPointer(cap, "panvc3.als");
    if (!st)
        return NULL;

    pv3_strbuf out = {NULL, 0, 0};
    PyObject *aux = Py_None;

    if (st->mode == 0) {
        if (als_cov_drain(st, -1, &out) < 0) {
            free(out.buf);
            return PyErr_NoMemory();
        }
    } else if (st->mode == 3) {
        if (als_box_print(st, &out) < 0) {
            free(out.buf);
            return PyErr_NoMemory();
        }
    } else {
        size_t n = st->mode == 1 ? (size_t)st->n_refs : 256;
        aux = PyList_New((Py_ssize_t)n);
        if (!aux) {
            free(out.buf);
            return NULL;
        }
        for (size_t i = 0; i < n; ++i) {
            PyObject *v = PyLong_FromLong(st->counts[i]);
            if (!v) {
                Py_DECREF(aux);
                free(out.buf);
                return NULL;
            }
            PyList_SET_ITEM(aux, (Py_ssize_t)i, v);
        }
    }

    PyObject *res = Py_BuildValue(
        "(y#Olll)", out.buf ? out.buf : "", (Py_ssize_t)out.len, aux,
        st->flags_not_matched, st->ref_id_mismatches,
        st->mate_ref_mismatches);
    if (aux != Py_None)
        Py_DECREF(aux);
    free(out.buf);
    return res;
}
