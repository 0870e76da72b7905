/* Shared helpers for the panvc3 native extension translation units. */
#ifndef PANVC3_COMMON_H
#define PANVC3_COMMON_H

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <errno.h>
#include <stdint.h>
#include <stdlib.h>
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

static const int8_t pv3_op_code_table[256] = {
    ['M'] = OP_M, ['I'] = OP_I, ['D'] = OP_D, ['N'] = OP_N,
    ['S'] = OP_S, ['H'] = OP_H, ['P'] = OP_P, ['='] = OP_EQ, ['X'] = OP_X,
};
static const char pv3_op_char_table[16] = "MIDNSHP=X??????\0";

static inline int pv3_is_ref_op(int8_t op)
{
    return op == OP_M || op == OP_EQ || op == OP_X || op == OP_D || op == OP_N;
}

static inline int pv3_is_mtype_op(int8_t op)
{
    return op == OP_M || op == OP_EQ || op == OP_X;
}

static inline int pv3_is_query_op(int8_t op)
{
    return op == OP_I || op == OP_S || pv3_is_mtype_op(op);
}

/* growable byte buffer */
typedef struct {
    char *buf;
    size_t len, cap;
} pv3_strbuf;

static inline int pv3_sb_reserve(pv3_strbuf *sb, size_t extra)
{
    if (sb->len + extra <= sb->cap)
        return 0;
    size_t cap = sb->cap ? sb->cap : 256;
    while (cap < sb->len + extra)
        cap *= 2;
    char *nb = realloc(sb->buf, cap);
    if (!nb)
        return -1;
    sb->buf = nb;
    sb->cap = cap;
    return 0;
}

static inline int pv3_sb_put(pv3_strbuf *sb, const char *s, size_t n)
{
    if (pv3_sb_reserve(sb, n) < 0)
        return -1;
    memcpy(sb->buf + sb->len, s, n);
    sb->len += n;
    return 0;
}

static inline int pv3_sb_putc(pv3_strbuf *sb, char c)
{
    return pv3_sb_put(sb, &c, 1);
}

static inline int pv3_sb_put_long(pv3_strbuf *sb, long v)
{
    /* hand-rolled itoa: snprintf("%ld") costs ~10x as much and this is
       called ~10x per output record on the splice hot path */
    char tmp[24];
    char *p = tmp + sizeof tmp;
    unsigned long u = (v < 0) ? 0UL - (unsigned long)v : (unsigned long)v;
    do {
        *--p = (char)('0' + (u % 10));
        u /= 10;
    } while (u);
    if (v < 0)
        *--p = '-';
    return pv3_sb_put(sb, p, (size_t)(tmp + sizeof tmp - p));
}

/* fast path entry points (fastpath.c) */
PyObject *pv3_parse_stage_batch(PyObject *self, PyObject *args);
PyObject *pv3_scan_keep_mask(PyObject *self, PyObject *args);
PyObject *pv3_stage_realign_runs(PyObject *self, PyObject *args);
PyObject *pv3_splice_apply_format(PyObject *self, PyObject *args);
PyObject *pv3_set_slab_threads(PyObject *self, PyObject *args);
PyObject *pv3_mapq_score_groups(PyObject *self, PyObject *args);
PyObject *pv3_subset_filter_lines(PyObject *self, PyObject *args);
PyObject *pv3_rewrite_cigar_lines(PyObject *self, PyObject *args);
PyObject *pv3_finalize_reconstruct(PyObject *self, PyObject *args);
PyObject *pv3_event_geometry_batch(PyObject *self, PyObject *args);
PyObject *pv3_format_float_c(PyObject *self, PyObject *args);
PyObject *pv3_realign_runs_host(PyObject *self, PyObject *args);
PyObject *pv3_bam_to_sam_lines(PyObject *self, PyObject *args);
PyObject *pv3_sam_text_to_bam(PyObject *self, PyObject *args);
PyObject *pv3_bgzf_compress(PyObject *self, PyObject *args);
PyObject *pv3_bgzf_decompress(PyObject *self, PyObject *args);
PyObject *pv3_csr_sweep_new(PyObject *self, PyObject *args);
PyObject *pv3_csr_sweep_chunk(PyObject *self, PyObject *args);
PyObject *pv3_csr_sweep_stats(PyObject *self, PyObject *args);
PyObject *pv3_csr_parse_vcf(PyObject *self, PyObject *args);
PyObject *pv3_parse_pos_cov(PyObject *self, PyObject *args);
PyObject *pv3_format_pos_cov(PyObject *self, PyObject *args);
PyObject *pv3_als_new(PyObject *self, PyObject *args);
PyObject *pv3_als_chunk(PyObject *self, PyObject *args);
PyObject *pv3_als_finish(PyObject *self, PyObject *args);
int pv3_format_f32(double dv, char *out);

#endif /* PANVC3_COMMON_H */
