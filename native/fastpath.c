/* fastpath.c — batch-native record pipeline for project_alignments.
 *
 * The object path (io/sam.py SamRecord + pipeline apply_projection_result)
 * costs several microseconds of Python per record; at device-engine speeds
 * the host becomes the bottleneck (ROADMAP round 1: 2.6 s host vs 1.4 s
 * device per 49k reads).  This file keeps records native end to end:
 *
 *   parse_stage_batch    raw SAM lines -> filter + field arrays + staged
 *                        device inputs (padded op/count/query arrays and
 *                        the flat unit stream) + an arena of byte spans
 *   stage_realign_runs   indel-run table -> padded realignment DP inputs
 *   splice_apply_format  device results -> tag surgery (whitelist of
 *                        preserved tags, OA/XR/XP/YR/YP/XB/YB/XI, mirror of
 *                        /root/reference/project-alignments/
 *                        project_alignments.cc:735-918) + CIGAR splice +
 *                        final SAM text, one blob per batch
 *
 * Python only moves numpy arrays between these calls and the JAX kernels.
 * Byte-for-byte equality with the object path is enforced by
 * tests/test_fastpath.py.
 */

#include "panvc3_common.h"

#include <ctype.h>
#include <float.h>
#include <math.h>
#include <pthread.h>
#include <stdio.h>
#include <unistd.h>

/* seqan3 dna5 char semantics (panvc3_tpu.alphabet.DNA5_NORMALISE) */
static unsigned char dna5_table[256];

static void dna5_init(void)
{
    if (dna5_table['A'])
        return;
    memset(dna5_table, 'N', sizeof dna5_table);
    const char *keep = "ACGT";
    for (const char *c = keep; *c; ++c) {
        dna5_table[(unsigned char)*c] = (unsigned char)*c;
        dna5_table[(unsigned char)(*c + 32)] = (unsigned char)*c;
    }
    dna5_table['U'] = 'T';
    dna5_table['u'] = 'T';
}

/* error propagation out of GIL-free loops: 1 = ValueError (msg),
   2 = MemoryError, 3 = Python error already set on the thread state */
typedef struct {
    int kind;
    char msg[160];
} fp_err;

static inline int32_t next_pow2_i32(int32_t n)
{
    int32_t p = 1;
    while (p < n)
        p <<= 1;
    return p;
}

static int fp_parse_long(const char *s, const char *end, long *out)
{
    /* fast path: plain digit runs (every well-formed SAM integer field),
       short enough that overflow is impossible — strtol kept as the
       fallback so unusual spellings ("+1", leading whitespace) and
       overflow detection behave exactly as before */
    if (s < end && end - s <= 18) {
        long v = 0;
        const char *p = s;
        if (*p == '-')
            ++p;
        if (p < end) {
            const char *q = p;
            while (q < end) {
                unsigned d = (unsigned)(*q - '0');
                if (d > 9)
                    break;
                v = v * 10 + (long)d;
                ++q;
            }
            if (q == end) {
                *out = (*s == '-') ? -v : v;
                return 0;
            }
        }
    }
    char *stop;
    errno = 0;
    long v = strtol(s, &stop, 10);
    if (stop != end || s == end || errno != 0)
        return -1;
    *out = v;
    return 0;
}

/* GIL-free reference-name lookup: the refmap dict is snapshotted into an
   open-addressing FNV-1a hash at call entry (GIL held), so the parse loop
   never has to re-take the GIL on memo misses — with several batches
   parsing concurrently on pool threads the per-record GIL ping-pong
   convoyed the whole pipeline. */
typedef struct {
    const char *name; /* borrowed from the dict's bytes keys */
    Py_ssize_t len;
    long id;
} refent;

static uint64_t fnv1a(const char *s, Py_ssize_t n)
{
    uint64_t h = 1469598103934665603ULL;
    for (Py_ssize_t i = 0; i < n; ++i) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static long ref_lookup(const refent *ents, const int32_t *hslot,
                       size_t hcap, const char *s, Py_ssize_t n)
{
    uint64_t h = fnv1a(s, n) & (hcap - 1);
    while (hslot[h] >= 0) {
        const refent *e = &ents[hslot[h]];
        if (e->len == n && memcmp(e->name, s, n) == 0)
            return e->id;
        h = (h + 1) & (hcap - 1);
    }
    return -2; /* not found */
}

/* ------------------------------------------------------------------ */
/* parse_stage_batch(lines, refmap, flag_skip, primary_mask,
 *                   min_O, min_R, min_Lq) -> dict
 *
 * Replicates the reader-loop filters of run_project_alignments (order:
 * flag skip, secondary skip, missing ref, missing pos, missing seq —
 * project_alignments.cc:528-572) and the staging of
 * ops/rewrite_batch.expand_cigars in one pass over raw line bytes.
 * refmap maps bytes reference names -> input ref ids.                   */
PyObject *pv3_parse_stage_batch(PyObject *self, PyObject *args)
{
    PyObject *lines, *refmap;
    long flag_skip, primary_mask, min_O, min_R, min_Lq;
    if (!PyArg_ParseTuple(args, "O!O!lllll",
                          &PyList_Type, &lines, &PyDict_Type, &refmap,
                          &flag_skip, &primary_mask, &min_O, &min_R,
                          &min_Lq))
        return NULL;
    dna5_init();

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);

    /* per-record storage (kept records only) */
    size_t cap_rec = 0, n_rec = 0;
    int32_t *r_line = NULL;
    int32_t *r_i32 = NULL;       /* 7 columns: flag,ref,pos,mapq,mref,mpos,tlen */
    int32_t *r_nops = NULL;
    int32_t *r_refunits = NULL;
    int32_t *r_units = NULL;   /* total flat units (ref bases + other ops) */
    int32_t *r_spans = NULL;     /* 8 columns */
    size_t cap_ops = 0, n_ops_total = 0;
    int8_t *f_ops = NULL;
    int32_t *f_counts = NULL;
    pv3_strbuf arena = {NULL, 0, 0};
    const char **line_ptr = NULL;
    Py_ssize_t *line_len_a = NULL;
    PyThreadState *ts = NULL;
    fp_err err = {0, {0}};

    long c_flags = 0, c_ref_missing = 0, c_seq_missing = 0;
    long n_records = 0; /* record counter incl. skipped (global indexing) */

    /* one-entry memo for reference-name lookups */
    const char *memo_name[2] = {NULL, NULL};
    Py_ssize_t memo_len[2] = {0, 0};
    long memo_id[2] = {-1, -1};
    refent *ents = NULL;
    int32_t *hslot = NULL;
    size_t hcap = 8;

    /* prepass: borrow every line's byte pointer so the parse loop can run
       without the GIL (the list keeps the bytes objects alive) */
    line_ptr = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    line_len_a = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    if (!line_ptr || !line_len_a)
        goto oom;
    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        char *lp;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, li), &lp,
                                    &line_len_a[li]) < 0)
            goto fail;
        line_ptr[li] = lp;
    }

    /* snapshot refmap into a GIL-free hash (keys borrowed; the caller's
       dict outlives the call) */
    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        while (hcap < (size_t)n_refs * 2)
            hcap <<= 1;
        ents = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(refent));
        hslot = PyMem_Malloc(hcap * sizeof(int32_t));
        if (!ents || !hslot)
            goto oom;
        for (size_t i = 0; i < hcap; ++i)
            hslot[i] = -1;
        PyObject *k, *v;
        Py_ssize_t ppos = 0, ei = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            char *kp;
            Py_ssize_t kl;
            if (PyBytes_AsStringAndSize(k, &kp, &kl) < 0)
                goto fail;
            long idv = PyLong_AsLong(v);
            if (idv == -1 && PyErr_Occurred())
                goto fail;
            uint64_t h = fnv1a(kp, kl) & (hcap - 1);
            while (hslot[h] >= 0)
                h = (h + 1) & (hcap - 1);
            ents[ei].name = kp;
            ents[ei].len = kl;
            ents[ei].id = idv;
            hslot[h] = (int32_t)ei;
            ++ei;
        }
    }

    ts = PyEval_SaveThread();

    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        const char *line = line_ptr[li];
        Py_ssize_t line_len = line_len_a[li];
        while (line_len > 0 &&
               (line[line_len - 1] == '\n' || line[line_len - 1] == '\r'))
            --line_len;
        {
            /* the Python reader skips whitespace-only lines */
            Py_ssize_t w = 0;
            while (w < line_len &&
                   (line[w] == ' ' || line[w] == '\t' || line[w] == '\v' ||
                    line[w] == '\f'))
                ++w;
            if (w == line_len)
                continue;
        }
        long rec_no = n_records++;

        const char *fields[12];
        Py_ssize_t flens[12];
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
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg,
                     "truncated SAM record: %.100s", line);
            goto loop_err;
        }
        /* p now points at the first tag byte (or == end) */

        long flag, pos, mapq, pnext, tlen;
        if (fp_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0 ||
            fp_parse_long(fields[4], fields[4] + flens[4], &mapq) != 0 ||
            fp_parse_long(fields[7], fields[7] + flens[7], &pnext) != 0 ||
            fp_parse_long(fields[8], fields[8] + flens[8], &tlen) != 0) {
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg,
                     "malformed SAM record: %.100s", line);
            goto loop_err;
        }
        pos -= 1;
        pnext -= 1;

        /* resolve RNAME / RNEXT so unknown names error even on skips */
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            if (memo_name[0] && memo_len[0] == flens[2] &&
                memcmp(memo_name[0], fields[2], flens[2]) == 0) {
                ref_id = memo_id[0];
            } else {
                ref_id = ref_lookup(ents, hslot, hcap, fields[2], flens[2]);
                if (ref_id == -2) {
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "unknown reference '%.100s'", fields[2]);
                    goto loop_err;
                }
                /* memo points into line memory; the lines list keeps the
                   bytes objects alive for the whole call */
                memo_name[0] = fields[2];
                memo_len[0] = flens[2];
                memo_id[0] = ref_id;
            }
        }
        long mate_ref_id = -1;
        if (flens[6] == 1 && fields[6][0] == '*') {
            mate_ref_id = -1;
        } else if (flens[6] == 1 && fields[6][0] == '=') {
            mate_ref_id = ref_id;
        } else if (memo_name[1] && memo_len[1] == flens[6] &&
                   memcmp(memo_name[1], fields[6], flens[6]) == 0) {
            mate_ref_id = memo_id[1];
        } else {
            mate_ref_id =
                ref_lookup(ents, hslot, hcap, fields[6], flens[6]);
            if (mate_ref_id == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown mate reference '%.100s'", fields[6]);
                goto loop_err;
            }
            memo_name[1] = fields[6];
            memo_len[1] = flens[6];
            memo_id[1] = mate_ref_id;
        }

        /* validate tag field structure (TAG:T:...) for parse parity */
        {
            const char *tp = p;
            while (tp < end) {
                const char *tab = memchr(tp, '\t', end - tp);
                const char *fend = tab ? tab : end;
                const char *c1 = memchr(tp, ':', fend - tp);
                if (!c1 || c1 + 2 > fend || c1[2] != ':') {
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "malformed tag field: %.50s", tp);
                    goto loop_err;
                }
                tp = tab ? tab + 1 : end;
            }
        }

        /* ---- filters (reader-loop order) ---- */
        if (flag & flag_skip) {
            ++c_flags;
            continue;
        }
        if (primary_mask && (flag & primary_mask)) {
            ++c_flags;
            continue;
        }
        if (ref_id < 0) {
            ++c_ref_missing;
            continue;
        }
        if (pos < 0) {
            ++c_flags;
            continue;
        }
        if (flens[9] == 0 || (flens[9] == 1 && fields[9][0] == '*')) {
            ++c_seq_missing;
            continue;
        }

        /* ---- CIGAR parse ---- */
        int32_t rec_ops = 0;
        long rec_ref_units = 0;
        long rec_units = 0;
        long rec_qlen = 0;
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
                    if (c == d0 || c == cend || (code == 0 && oc != 'M')) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "invalid CIGAR: '%.50s'", fields[5]);
                        goto loop_err;
                    }
                    ++c;
                    if (n_ops_total + 1 > cap_ops) {
                        size_t ncap = cap_ops ? cap_ops * 2 : 1024;
                        int8_t *no_ = realloc(f_ops, ncap);
                        int32_t *nc =
                            realloc(f_counts, ncap * sizeof(int32_t));
                        if (no_) f_ops = no_;
                        if (nc) f_counts = nc;
                        if (!no_ || !nc)
                            goto loop_err;
                        cap_ops = ncap;
                    }
                    f_ops[n_ops_total] = code;
                    f_counts[n_ops_total] = (int32_t)count;
                    ++n_ops_total;
                    ++rec_ops;
                    if (pv3_is_query_op(code))
                        rec_qlen += count;
                    if (pv3_is_ref_op(code)) {
                        rec_ref_units += count;
                        rec_units += count;
                    } else {
                        rec_units += 1;
                    }
                }
            }
        }
        if (rec_ops && rec_qlen != flens[9]) {
            /* matches run_project_alignments' object-path validation */
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg,
                     "record '%.*s': CIGAR consumes %ld query bases but "
                     "SEQ has %ld",
                     (int)(flens[0] > 60 ? 60 : flens[0]), fields[0],
                     rec_qlen, (long)flens[9]);
            goto loop_err;
        }

        /* ---- record bookkeeping ---- */
        if (n_rec + 1 > cap_rec) {
            size_t ncap = cap_rec ? cap_rec * 2 : 1024;
            int32_t *a = realloc(r_line, ncap * sizeof(int32_t));
            int32_t *b = realloc(r_i32, ncap * 7 * sizeof(int32_t));
            int32_t *cc = realloc(r_nops, ncap * sizeof(int32_t));
            int32_t *d = realloc(r_refunits, ncap * sizeof(int32_t));
            int32_t *e = realloc(r_spans, ncap * 8 * sizeof(int32_t));
            int32_t *f = realloc(r_units, ncap * sizeof(int32_t));
            if (a) r_line = a;
            if (b) r_i32 = b;
            if (cc) r_nops = cc;
            if (d) r_refunits = d;
            if (e) r_spans = e;
            if (f) r_units = f;
            if (!a || !b || !cc || !d || !e || !f)
                goto loop_err;
            cap_rec = ncap;
        }
        r_line[n_rec] = (int32_t)rec_no;
        int32_t *col = r_i32 + n_rec * 7;
        col[0] = (int32_t)flag;
        col[1] = (int32_t)ref_id;
        col[2] = (int32_t)pos;
        col[3] = (int32_t)mapq;
        col[4] = (int32_t)mate_ref_id;
        col[5] = (int32_t)pnext;
        col[6] = (int32_t)tlen;
        r_nops[n_rec] = rec_ops;
        r_refunits[n_rec] = (int32_t)rec_ref_units;
        r_units[n_rec] = (int32_t)rec_units;

        int32_t *sp = r_spans + n_rec * 8;
        size_t base = arena.len;
        if (pv3_sb_put(&arena, line, (size_t)line_len) < 0)
            goto loop_err;
        sp[0] = (int32_t)(base + (fields[0] - line));
        sp[1] = (int32_t)flens[0];
        sp[2] = (int32_t)(base + (fields[9] - line));
        sp[3] = (int32_t)flens[9];
        sp[4] = (int32_t)(base + (fields[10] - line));
        sp[5] = (int32_t)flens[10];
        sp[6] = (int32_t)(base + (p - line));
        sp[7] = (int32_t)(end - p);
        ++n_rec;
        continue;
    loop_err:
        if (!err.kind)
            err.kind = 2;
        break;
    }

    PyEval_RestoreThread(ts);
    ts = NULL;
    if (err.kind == 1) {
        PyErr_SetString(PyExc_ValueError, err.msg);
        goto fail;
    }
    if (err.kind == 2)
        goto oom;
    if (err.kind == 3)
        goto fail; /* error indicator already set */

    /* ---- pass 2: padded device arrays + unit stream ---- */
    {
        int32_t max_ops = 1, max_units = 1, max_q = 1;
        long total_units = 0;
        for (size_t i = 0; i < n_rec; ++i) {
            if (r_nops[i] > max_ops)
                max_ops = r_nops[i];
            if (r_refunits[i] > max_units)
                max_units = r_refunits[i];
            if (r_spans[i * 8 + 3] > max_q)
                max_q = r_spans[i * 8 + 3];
        }
        int32_t O = next_pow2_i32(max_ops < min_O ? (int32_t)min_O : max_ops);
        int32_t R = next_pow2_i32(max_units < min_R ? (int32_t)min_R
                                                    : max_units);
        if (R < 2)
            R = 2;
        int32_t Lq = next_pow2_i32(max_q < min_Lq ? (int32_t)min_Lq : max_q);
        if (Lq < 2)
            Lq = 2;

        PyObject *ops2d = PyBytes_FromStringAndSize(NULL, n_rec * O);
        PyObject *counts2d =
            PyBytes_FromStringAndSize(NULL, n_rec * O * sizeof(int32_t));
        PyObject *query2d = PyBytes_FromStringAndSize(NULL, n_rec * Lq);
        if (!ops2d || !counts2d || !query2d) {
            Py_XDECREF(ops2d);
            Py_XDECREF(counts2d);
            Py_XDECREF(query2d);
            goto fail;
        }
        int8_t *po = (int8_t *)PyBytes_AS_STRING(ops2d);
        int32_t *pc = (int32_t *)PyBytes_AS_STRING(counts2d);
        unsigned char *pq = (unsigned char *)PyBytes_AS_STRING(query2d);

        /* the padded-array fill touches only raw buffers — drop the GIL so
           concurrent pool batches don't convoy on this per-base loop */
        Py_BEGIN_ALLOW_THREADS
        memset(po, CODE_NONE, n_rec * O);
        memset(pc, 0, n_rec * O * sizeof(int32_t));
        memset(pq, 0, n_rec * Lq);

        /* flat op cursor rebuilt sequentially */
        {
            size_t cur = 0;
            for (size_t i = 0; i < n_rec; ++i) {
                int32_t no = r_nops[i];
                for (int32_t k = 0; k < no; ++k) {
                    po[i * O + k] = f_ops[cur + k];
                    pc[i * O + k] = f_counts[cur + k];
                    if (pv3_is_ref_op(f_ops[cur + k]))
                        total_units += f_counts[cur + k];
                    else
                        total_units += 1;
                }
                cur += no;
                const unsigned char *s =
                    (const unsigned char *)arena.buf + r_spans[i * 8 + 2];
                int32_t sl = r_spans[i * 8 + 3];
                for (int32_t k = 0; k < sl; ++k)
                    pq[i * Lq + k] = dna5_table[s[k]];
            }
        }
        Py_END_ALLOW_THREADS

        PyObject *unit_op_b =
            PyBytes_FromStringAndSize(NULL, total_units);
        PyObject *unit_count_b =
            PyBytes_FromStringAndSize(NULL, total_units * sizeof(int32_t));
        PyObject *unit_rec_b =
            PyBytes_FromStringAndSize(NULL, total_units * sizeof(int32_t));
        if (!unit_op_b || !unit_count_b || !unit_rec_b) {
            Py_XDECREF(ops2d);
            Py_XDECREF(counts2d);
            Py_XDECREF(query2d);
            Py_XDECREF(unit_op_b);
            Py_XDECREF(unit_count_b);
            Py_XDECREF(unit_rec_b);
            goto fail;
        }
        int8_t *uo = (int8_t *)PyBytes_AS_STRING(unit_op_b);
        int32_t *uc = (int32_t *)PyBytes_AS_STRING(unit_count_b);
        int32_t *ur = (int32_t *)PyBytes_AS_STRING(unit_rec_b);
        Py_BEGIN_ALLOW_THREADS
        {
            size_t cur = 0, u = 0;
            for (size_t i = 0; i < n_rec; ++i) {
                int32_t no = r_nops[i];
                for (int32_t k = 0; k < no; ++k) {
                    int8_t op = f_ops[cur + k];
                    int32_t cnt = f_counts[cur + k];
                    if (pv3_is_ref_op(op)) {
                        for (int32_t j = 0; j < cnt; ++j) {
                            uo[u] = op;
                            uc[u] = 1;
                            ur[u] = (int32_t)i;
                            ++u;
                        }
                    } else {
                        uo[u] = op;
                        uc[u] = cnt;
                        ur[u] = (int32_t)i;
                        ++u;
                    }
                }
                cur += no;
            }
        }
        Py_END_ALLOW_THREADS

        PyObject *res = Py_BuildValue(
            "{s:l s:n s:l s:l s:l"
            " s:y# s:y# s:y# s:y# s:y#"
            " s:N s:N s:N"
            " s:N s:N s:N"
            " s:i s:i s:i"
            " s:y# s:y#}",
            "n_records", n_records,
            "kept", (Py_ssize_t)n_rec,
            "flags_not_matched", c_flags,
            "ref_id_missing", c_ref_missing,
            "seq_missing", c_seq_missing,
            "line_index", (char *)r_line,
            (Py_ssize_t)(n_rec * sizeof(int32_t)),
            "fields", (char *)r_i32,
            (Py_ssize_t)(n_rec * 7 * sizeof(int32_t)),
            "n_ops", (char *)r_nops,
            (Py_ssize_t)(n_rec * sizeof(int32_t)),
            "n_ref_units", (char *)r_refunits,
            (Py_ssize_t)(n_rec * sizeof(int32_t)),
            "n_units", (char *)r_units,
            (Py_ssize_t)(n_rec * sizeof(int32_t)),
            "ops", ops2d,
            "counts", counts2d,
            "query", query2d,
            "unit_op", unit_op_b,
            "unit_count", unit_count_b,
            "unit_rec", unit_rec_b,
            "O", (int)O, "R", (int)R, "Lq", (int)Lq,
            "arena", arena.buf ? arena.buf : "", (Py_ssize_t)arena.len,
            "spans", (char *)r_spans,
            (Py_ssize_t)(n_rec * 8 * sizeof(int32_t)));

        free(r_line);
        free(r_i32);
        free(r_nops);
        free(r_refunits);
        free(r_units);
        free(r_spans);
        free(f_ops);
        free(f_counts);
        PyMem_Free(line_ptr);
        PyMem_Free(line_len_a);
        free(arena.buf);
        PyMem_Free(ents);
        PyMem_Free(hslot);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    free(r_line);
    free(r_i32);
    free(r_nops);
    free(r_refunits);
    free(r_units);
    free(r_spans);
    free(f_ops);
    free(f_counts);
    PyMem_Free(line_ptr);
    PyMem_Free(line_len_a);
    free(arena.buf);
    PyMem_Free(ents);
    PyMem_Free(hslot);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* scan_keep_mask(lines, flag_skip, primary_mask) -> bytes
 *
 * Cheap pre-scan of the reader-loop filters so the batcher can form
 * batches of exactly batch_size KEPT records (the 4-record task groups of
 * the record-index tag are formed over kept records,
 * project_alignments.cc:596-615).  Returns one byte per line:
 * 2 kept, 1 record skipped by the filters, 0 whitespace-only — the 0/1
 * split lets the batcher precompute record numbering (rec_base) so the
 * parse itself can run out of order on pool workers.  Malformed or
 * unknown-reference lines pass the scan as 1 — parse_stage_batch raises
 * on them exactly like the object path's parser.                        */
PyObject *pv3_scan_keep_mask(PyObject *self, PyObject *args)
{
    PyObject *lines;
    long flag_skip, primary_mask;
    if (!PyArg_ParseTuple(args, "O!ll", &PyList_Type, &lines,
                          &flag_skip, &primary_mask))
        return NULL;

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    PyObject *mask_obj = PyBytes_FromStringAndSize(NULL, n_lines);
    if (!mask_obj)
        return NULL;
    char *mask = PyBytes_AS_STRING(mask_obj);

    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        mask[li] = 0;
        PyObject *item = PyList_GET_ITEM(lines, li);
        char *line;
        Py_ssize_t line_len;
        if (PyBytes_AsStringAndSize(item, &line, &line_len) < 0) {
            Py_DECREF(mask_obj);
            return NULL;
        }
        while (line_len > 0 &&
               (line[line_len - 1] == '\n' || line[line_len - 1] == '\r'))
            --line_len;
        {
            /* whitespace-only lines are not records (same check as the
               parse loop) */
            Py_ssize_t w = 0;
            while (w < line_len &&
                   (line[w] == ' ' || line[w] == '\t' || line[w] == '\v' ||
                    line[w] == '\f'))
                ++w;
            if (w == line_len)
                continue;
        }
        mask[li] = 1;

        const char *fields[10];
        Py_ssize_t flens[10];
        int n_fields = 0;
        const char *p = line, *end = line + line_len;
        while (n_fields < 10) {
            const char *tab = memchr(p, '\t', end - p);
            fields[n_fields] = p;
            flens[n_fields] = (tab ? tab : end) - p;
            ++n_fields;
            if (!tab)
                break;
            p = tab + 1;
        }
        if (n_fields < 10)
            continue; /* blank/truncated: parse_stage_batch handles */

        long flag, pos;
        if (fp_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0)
            continue;
        if (flag & flag_skip)
            continue;
        if (primary_mask && (flag & primary_mask))
            continue;
        if (flens[2] == 1 && fields[2][0] == '*')
            continue;
        if (pos - 1 < 0)
            continue;
        if (flens[9] == 0 || (flens[9] == 1 && fields[9][0] == '*'))
            continue;
        mask[li] = 2;
    }
    return mask_obj;
}

/* ------------------------------------------------------------------ */
/* stage_realign_runs(indel_flat i32[n*9], rec_dst_ref i32[kept],
 *                    ref_list (list, index = dst ref id -> bytes),
 *                    query u8[kept*Lq], Lq, min_R, min_Q, min_S,
 *                    arena, spans, want_quality)
 *   -> (ref u8[S*Rp], query u8[S*Qp], rl i32[S], ql i32[S], Rp, Qp, S,
 *       rq i32[S*Rp]|None, qq i32[S*Qp]|None)
 *
 * Builds the padded realignment-DP inputs (the staging loop of
 * ops/engine._dispatch_realign) with the reference slice dna5-normalised
 * (alignment_projector.cc:97-137 converts through the alphabet).  The row
 * count S is padded to a power-of-two bucket (>= min_S) with zero-length
 * rows so the realign kernel compiles a bounded set of shapes.  With
 * want_quality, reference qualities are pinned to phred42 max (41) and
 * query qualities decoded from the record's QUAL span (clamped 0..41;
 * '*' -> zeros), matching the -q staging of the object path.            */
PyObject *pv3_stage_realign_runs(PyObject *self, PyObject *args)
{
    Py_buffer indel_b, dstref_b, query_b, arena_b, spans_b;
    PyObject *ref_list;
    long lq, min_R, min_Q, min_S;
    int want_quality;
    if (!PyArg_ParseTuple(args, "y*y*O!y*lllly*y*i",
                          &indel_b, &dstref_b, &PyList_Type, &ref_list,
                          &query_b, &lq, &min_R, &min_Q, &min_S,
                          &arena_b, &spans_b, &want_quality))
        return NULL;
    dna5_init();

    const int32_t *indel = indel_b.buf;
    const int32_t *dstref = dstref_b.buf;
    const unsigned char *query = query_b.buf;
    const char *arena = arena_b.buf;
    const int32_t *spans = spans_b.buf;
    Py_ssize_t n = indel_b.len / (9 * sizeof(int32_t));

    int32_t max_r = 1, max_q = 1;
    for (Py_ssize_t i = 0; i < n; ++i) {
        if (indel[i * 9 + 2] > max_r)
            max_r = indel[i * 9 + 2];
        if (indel[i * 9 + 4] > max_q)
            max_q = indel[i * 9 + 4];
    }
    int32_t Rp = next_pow2_i32(max_r < min_R ? (int32_t)min_R : max_r);
    int32_t Qp = next_pow2_i32(max_q < min_Q ? (int32_t)min_Q : max_q);
    Py_ssize_t S = next_pow2_i32((int32_t)(n < min_S ? min_S : n));

    PyObject *ref_out = PyBytes_FromStringAndSize(NULL, S * Rp);
    PyObject *q_out = PyBytes_FromStringAndSize(NULL, S * Qp);
    PyObject *rl_out = PyBytes_FromStringAndSize(NULL, S * sizeof(int32_t));
    PyObject *ql_out = PyBytes_FromStringAndSize(NULL, S * sizeof(int32_t));
    PyObject *rq_out = NULL, *qq_out = NULL;
    int32_t *prq = NULL, *pqq = NULL;
    const unsigned char **refs = NULL;
    Py_ssize_t *reflens = NULL;
    long bad_rec = -1;
    if (!ref_out || !q_out || !rl_out || !ql_out)
        goto fail;
    {
        Py_ssize_t n_refs = PyList_GET_SIZE(ref_list);
        refs = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(char *));
        reflens = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(Py_ssize_t));
        if (!refs || !reflens) {
            PyErr_NoMemory();
            goto fail;
        }
        for (Py_ssize_t i = 0; i < n_refs; ++i) {
            char *rc_;
            if (PyBytes_AsStringAndSize(PyList_GET_ITEM(ref_list, i), &rc_,
                                        &reflens[i]) < 0)
                goto fail;
            refs[i] = (const unsigned char *)rc_;
        }
    }
    if (want_quality) {
        rq_out = PyBytes_FromStringAndSize(NULL, S * Rp * sizeof(int32_t));
        qq_out = PyBytes_FromStringAndSize(NULL, S * Qp * sizeof(int32_t));
        if (!rq_out || !qq_out)
            goto fail;
        prq = (int32_t *)PyBytes_AS_STRING(rq_out);
        pqq = (int32_t *)PyBytes_AS_STRING(qq_out);
        memset(prq, 0, S * Rp * sizeof(int32_t));
        memset(pqq, 0, S * Qp * sizeof(int32_t));
    }
    unsigned char *pr = (unsigned char *)PyBytes_AS_STRING(ref_out);
    unsigned char *pq = (unsigned char *)PyBytes_AS_STRING(q_out);
    int32_t *prl = (int32_t *)PyBytes_AS_STRING(rl_out);
    int32_t *pql = (int32_t *)PyBytes_AS_STRING(ql_out);
    memset(pr, 0, S * Rp);
    memset(pq, 0, S * Qp);
    memset(prl, 0, S * sizeof(int32_t));
    memset(pql, 0, S * sizeof(int32_t));

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < n; ++i) {
        const int32_t *row = indel + i * 9;
        int32_t rec = row[0];
        int32_t r0 = row[1], rl = row[2], q0 = row[3], qlen = row[4];
        const unsigned char *refc = refs[dstref[rec]];
        Py_ssize_t reflen = reflens[dstref[rec]];
        if (r0 < 0 || (Py_ssize_t)r0 + rl > reflen || rl > Rp ||
            qlen > Qp || (long)q0 + qlen > lq) {
            bad_rec = rec;
            break;
        }
        const unsigned char *rs = refc + r0;
        for (int32_t k = 0; k < rl; ++k)
            pr[i * Rp + k] = dna5_table[rs[k]];
        memcpy(pq + i * Qp, query + (size_t)rec * lq + q0, qlen);
        prl[i] = rl;
        pql[i] = qlen;
        if (want_quality) {
            for (int32_t k = 0; k < rl; ++k)
                prq[i * Rp + k] = 41; /* phred42 max for the reference */
            const int32_t *sp = spans + (size_t)rec * 8;
            const unsigned char *qual =
                (const unsigned char *)arena + sp[4];
            int32_t quallen = sp[5];
            if (!(quallen == 1 && qual[0] == '*')) {
                for (int32_t k = 0; k < qlen && q0 + k < quallen; ++k) {
                    int32_t v = (int32_t)qual[q0 + k] - 33;
                    if (v < 0)
                        v = 0;
                    if (v > 41)
                        v = 41;
                    pqq[i * Qp + k] = v;
                }
            }
        }
    }
    Py_END_ALLOW_THREADS
    if (bad_rec >= 0) {
        PyErr_Format(PyExc_ValueError, "realign run out of bounds (rec %ld)",
                     bad_rec);
        goto fail;
    }

    {
        PyObject *res = Py_BuildValue(
            "(NNNNiinNN)", ref_out, q_out, rl_out, ql_out, (int)Rp, (int)Qp,
            S,
            rq_out ? rq_out : Py_NewRef(Py_None),
            qq_out ? qq_out : Py_NewRef(Py_None));
        PyMem_Free(refs);
        PyMem_Free(reflens);
        PyBuffer_Release(&indel_b);
        PyBuffer_Release(&dstref_b);
        PyBuffer_Release(&query_b);
        PyBuffer_Release(&arena_b);
        PyBuffer_Release(&spans_b);
        return res;
    }

fail:
    Py_XDECREF(ref_out);
    Py_XDECREF(q_out);
    Py_XDECREF(rl_out);
    Py_XDECREF(ql_out);
    Py_XDECREF(rq_out);
    Py_XDECREF(qq_out);
    PyMem_Free(refs);
    PyMem_Free(reflens);
    PyBuffer_Release(&indel_b);
    PyBuffer_Release(&dstref_b);
    PyBuffer_Release(&query_b);
    PyBuffer_Release(&arena_b);
    PyBuffer_Release(&spans_b);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* splice + tag surgery + format (see file header) */

typedef struct {
    const char *key;
    int klen;
    char typ;
    const char *val;  /* pass-through value span (NULL for synth) */
    int vlen;
    int synth;        /* 0 pass-through; 1 OA, 2 XB, 3 YB, 4 XI,
                         5 XR, 6 XP, 7 YR, 8 YP */
} tagitem;

/* removed-tag key occurrence, recorded GIL-free and folded into the
   Python counter dict after the loop (key points into the arena) */
typedef struct {
    const char *key;
    int klen;
} remkey;

/* realigned-range row recorded GIL-free; tuples built after the loop */
typedef struct {
    long ref_pos, ref_len, q_off, q_len, task_id;
} rrow;

static int tag_key_cmp(const void *a, const void *b)
{
    const tagitem *x = a, *y = b;
    int n = x->klen < y->klen ? x->klen : y->klen;
    int c = memcmp(x->key, y->key, n);
    if (c)
        return c;
    return x->klen - y->klen;
}

static int preserved_has(const char *preserved, Py_ssize_t np,
                         const char *key, int klen)
{
    if (klen != 2)
        return 0;
    Py_ssize_t lo = 0, hi = np; /* np = number of 2-char entries */
    while (lo < hi) {
        Py_ssize_t mid = (lo + hi) / 2;
        int c = memcmp(preserved + mid * 2, key, 2);
        if (c < 0)
            lo = mid + 1;
        else if (c > 0)
            hi = mid;
        else
            return 1;
    }
    return 0;
}

/* emit pending CIGAR run, merging with previous (collapse_cigar
 * semantics: adjacent same-op merge, zero counts dropped) */
typedef struct {
    long count;
    int8_t op;
    int any;   /* a run is pending */
    int ever;  /* at least one op emitted or pending (else CIGAR is '*') */
    pv3_strbuf *sb;
} cig_emit;

static int cig_push(cig_emit *ce, int8_t op, long count)
{
    if (count == 0)
        return 0;
    ce->ever = 1;
    if (ce->any && ce->op == op) {
        ce->count += count;
        return 0;
    }
    if (ce->any) {
        if (pv3_sb_put_long(ce->sb, ce->count) < 0 ||
            pv3_sb_putc(ce->sb, pv3_op_char_table[ce->op]) < 0)
            return -1;
    }
    ce->op = op;
    ce->count = count;
    ce->any = 1;
    return 0;
}

static int cig_flush(cig_emit *ce)
{
    if (ce->any) {
        if (pv3_sb_put_long(ce->sb, ce->count) < 0 ||
            pv3_sb_putc(ce->sb, pv3_op_char_table[ce->op]) < 0)
            return -1;
        ce->any = 0;
    }
    return 0;
}

/* canonicalize an integer token: parse + reprint */
static int sb_put_canon_int(pv3_strbuf *sb, const char *s, const char *end,
                            fp_err *err)
{
    long v;
    if (fp_parse_long(s, end, &v) != 0) {
        err->kind = 1;
        snprintf(err->msg, sizeof err->msg,
                 "malformed integer tag value: %.50s", s);
        return -1;
    }
    if (pv3_sb_put_long(sb, v) < 0) {
        err->kind = 2;
        return -1;
    }
    return 0;
}

/* Format a float32 value the way io/sam.format_float does, which is
   exactly std::to_chars(float): the shortest digit string that
   round-trips float32, printed fixed unless scientific is strictly
   shorter, with the exact-integer tiebreak for zero-padded integral
   values (closest-to-value rule; golden-tested against real to_chars
   output in tests/test_property.py).  Returns the length written into
   out (cap >= 64). */
int pv3_format_f32(double dv, char *out)
{
    float f = (float)dv;
    if (isnan(f)) {
        if (signbit(f)) {
            memcpy(out, "-nan", 5);
            return 4;
        }
        memcpy(out, "nan", 4);
        return 3;
    }
    if (isinf(f)) {
        if (f < 0) {
            memcpy(out, "-inf", 5);
            return 4;
        }
        memcpy(out, "inf", 4);
        return 3;
    }
    double fd = (double)f;
    if (fd == 0.0) {
        if (signbit(f)) {
            memcpy(out, "-0", 3);
            return 2;
        }
        memcpy(out, "0", 2);
        return 1;
    }

    /* shortest digit string that round-trips under strtof: glibc %.*e is
       correctly rounded, so at each precision q try the q-digit rounding
       of the value and (for the asymmetric rounding intervals at binade
       boundaries, where the closest q-digit decimal lies just outside
       the interval) its last-digit neighbours; the first match is the
       unique shortest (golden-tested vs std::to_chars in
       tests/test_property.py) */
    static const long long pow10q[10] = {
        1LL, 10LL, 100LL, 1000LL, 10000LL, 100000LL,
        1000000LL, 10000000LL, 100000000LL, 1000000000LL,
    };
    char ebuf[48], digits[16];
    int neg = fd < 0.0, nd = 0, exp10 = 0;
    for (int q = 1; q <= 9; ++q) {
        snprintf(ebuf, sizeof ebuf, "%.*e", q - 1, fd);
        const char *c = ebuf;
        long long m = 0;
        if (*c == '-')
            ++c;
        /* accumulate digits only: the decimal separator is skipped
           whatever LC_NUMERIC made snprintf emit */
        for (; *c && *c != 'e' && *c != 'E'; ++c)
            if ('0' <= *c && *c <= '9')
                m = m * 10 + (*c - '0');
        int xe = (int)strtol(c + 1, NULL, 10);
        if (strtof(ebuf, NULL) == f) {
            nd = q;
            exp10 = xe;
            for (int i = q - 1; i >= 0; --i, m /= 10)
                digits[i] = (char)('0' + (m % 10));
            break;
        }
        for (int delta = -1; delta <= 1; delta += 2) {
            long long m2 = m + delta;
            if (m2 < pow10q[q - 1] || m2 >= pow10q[q])
                continue; /* digit-count change: covered at another q */
            char nbuf[48];
            snprintf(nbuf, sizeof nbuf, "%s%lldE%d", neg ? "-" : "", m2,
                     xe - q + 1);
            if (strtof(nbuf, NULL) == f) {
                nd = q;
                exp10 = xe;
                for (int i = q - 1; i >= 0; --i, m2 /= 10)
                    digits[i] = (char)('0' + (m2 % 10));
                break;
            }
        }
        if (nd)
            break;
    }
    if (!nd) { /* unreachable: 9 digits always round-trip float32 */
        snprintf(ebuf, sizeof ebuf, "%.8e", fd);
        const char *c = ebuf;
        if (*c == '-')
            ++c;
        for (; *c && *c != 'e' && *c != 'E'; ++c)
            if ('0' <= *c && *c <= '9')
                digits[nd++] = *c;
        exp10 = (int)strtol(c + 1, NULL, 10);
    }

    char pos_b[64], sci_b[32];
    int pos_n = 0, sci_n = 0;
    /* positional */
    if (exp10 >= 0) {
        if (nd < exp10 + 1) {
            /* zero-padding the shortest digits costs the same characters
               as the exact integer, which is closer to the value — print
               the exact integer like to_chars does */
            double af = fabs(fd);
            if (af == floor(af)) {
                pos_n = sprintf(pos_b, "%.0f", af);
            } else {
                memcpy(pos_b, digits, nd);
                pos_n = nd;
                for (int i = nd; i <= exp10; ++i)
                    pos_b[pos_n++] = '0';
            }
        } else if (nd == exp10 + 1) {
            memcpy(pos_b, digits, nd);
            pos_n = nd;
        } else {
            memcpy(pos_b, digits, exp10 + 1);
            pos_n = exp10 + 1;
            pos_b[pos_n++] = '.';
            memcpy(pos_b + pos_n, digits + exp10 + 1, nd - exp10 - 1);
            pos_n += nd - exp10 - 1;
        }
    } else {
        pos_b[pos_n++] = '0';
        pos_b[pos_n++] = '.';
        for (int i = 0; i < -exp10 - 1; ++i)
            pos_b[pos_n++] = '0';
        memcpy(pos_b + pos_n, digits, nd);
        pos_n += nd;
    }
    /* scientific (exponent always signed, >= 2 digits) */
    sci_b[sci_n++] = digits[0];
    if (nd > 1) {
        sci_b[sci_n++] = '.';
        memcpy(sci_b + sci_n, digits + 1, nd - 1);
        sci_n += nd - 1;
    }
    sci_n += sprintf(sci_b + sci_n, "e%+03d", exp10);

    char *src = pos_n <= sci_n ? pos_b : sci_b;
    int n = pos_n <= sci_n ? pos_n : sci_n;
    char *w = out;
    if (neg)
        *w++ = '-';
    memcpy(w, src, n);
    w[n] = 0;
    return n + neg;
}

/* Pure C canonical float-tag emission (no GIL needed).  The value span is
   copied out so strtod cannot scan past `end` into the next arena byte. */
static int sb_put_canon_float(pv3_strbuf *sb, const char *s, const char *end,
                              fp_err *err)
{
    char tmp[64], fbuf[64];
    size_t n = (size_t)(end - s);
    char *stop;
    if (n == 0 || n >= sizeof tmp)
        goto malformed;
    memcpy(tmp, s, n);
    tmp[n] = 0;
    errno = 0;
    double v = strtod(tmp, &stop);
    if (stop != tmp + n || errno != 0)
        goto malformed;
    {
        int fl = pv3_format_f32(v, fbuf);
        if (pv3_sb_put(sb, fbuf, (size_t)fl) < 0) {
            err->kind = 2;
            return -1;
        }
        return 0;
    }
malformed:
    err->kind = 1;
    snprintf(err->msg, sizeof err->msg, "malformed float tag value: %.50s",
             s);
    return -1;
}

/* ---- threaded splice/apply/format ----------------------------------- */

/* Read-only inputs shared by all record slabs. */
typedef struct {
    const char *arena;
    const int32_t *spans;
    const int32_t *line_index;
    const int32_t *fields;
    const int32_t *n_ops_arr;
    const int8_t *ops2d;
    const int32_t *counts2d;
    const int32_t *dst_pos;
    const int8_t *run_ops;
    const int32_t *run_lens;
    const int32_t *runs_per_rec;
    const int32_t *indel;
    const int8_t *realn_ops;
    const int32_t *realn_counts;
    const int32_t *mate_dst;
    const int32_t *ref_id_mapping;
    const char *preserved;
    Py_ssize_t n_preserved;
    Py_ssize_t kept, nruns;
    long O, steps, rec_global_base, task_id_base;
    int want_ranges;
    const char **out_nm;
    const int *out_nml;
    const char **in_nm;
    const int *in_nml;
    const char *tn[7];
    int tnl[7];
} splice_shared;

/* One contiguous record range [k0, k1) with its own output buffers; the
   slabs are concatenated in order afterwards, so the blob is byte-equal
   to the single-threaded emission. */
typedef struct {
    const splice_shared *sh;
    Py_ssize_t k0, k1;
    long run_base0;    /* sum(runs_per_rec[0:k0]) */
    Py_ssize_t icur0;  /* first indel row with rec >= k0 */
    pv3_strbuf sb;
    remkey *rem;
    size_t rem_n, rem_cap;
    rrow *rrows;
    size_t rrow_n, rrow_cap;
    long g_realn, g_len, g_cells, tasks_used;
    fp_err err;
} splice_slab;

/* The per-record loop (runs without the GIL; one thread per slab).  Body
   mirrors the reference's project_task::process output step + tag surgery
   (project_alignments.cc:670-928). */
static void *splice_slab_run(void *arg)
{
    splice_slab *sl = arg;
    const splice_shared *S = sl->sh;
    const char *arena = S->arena;
    const int32_t *spans = S->spans;
    const int32_t *line_index = S->line_index;
    const int32_t *fields = S->fields;
    const int32_t *n_ops_arr = S->n_ops_arr;
    const int8_t *ops2d = S->ops2d;
    const int32_t *counts2d = S->counts2d;
    const int32_t *dst_pos = S->dst_pos;
    const int8_t *run_ops = S->run_ops;
    const int32_t *run_lens = S->run_lens;
    const int32_t *runs_per_rec = S->runs_per_rec;
    const int32_t *indel = S->indel;
    const int8_t *realn_ops = S->realn_ops;
    const int32_t *realn_counts = S->realn_counts;
    const int32_t *mate_dst = S->mate_dst;
    const int32_t *ref_id_mapping = S->ref_id_mapping;
    const char *preserved = S->preserved;
    Py_ssize_t n_preserved = S->n_preserved;
    Py_ssize_t kept = S->kept;
    Py_ssize_t nruns = S->nruns;
    long O = S->O, steps = S->steps;
    long rec_global_base = S->rec_global_base;
    long task_id_base = S->task_id_base;
    int want_ranges = S->want_ranges;
    const char **out_nm = S->out_nm;
    const int *out_nml = S->out_nml;
    const char **in_nm = S->in_nm;
    const int *in_nml = S->in_nml;
    const char *const *tn = S->tn;
    const int *tnl = S->tnl;

    pv3_strbuf sb = {NULL, 0, 0};
    remkey *rem = NULL;
    size_t rem_n = 0, rem_cap = 0;
    rrow *rrows = NULL;
    size_t rrow_n = 0, rrow_cap = 0;
    long run_base = sl->run_base0;
    Py_ssize_t icur = sl->icur0;
    long g_realn = 0, g_len = 0, g_cells = 0;
    long tasks_used = 0;
    fp_err err = {0, {0}};

    size_t items_cap = 64;
    tagitem *items = malloc(items_cap * sizeof(tagitem));
    if (!items) {
        err.kind = 2;
        goto out;
    }

    for (Py_ssize_t k = sl->k0; k < sl->k1; ++k) {
        const int32_t *col = fields + k * 7;
        long flag = col[0], ref_id = col[1], src_pos = col[2],
             mapq = col[3], mate_ref = col[4], mate_pos = col[5],
             tlen = col[6];
        long dst_ref = ref_id_mapping[ref_id];
        const int32_t *sp = spans + k * 8;

        /* chunk (CHUNK_SIZE=4) bookkeeping: record-index tag value and
           task id (project_alignments.cc:602-605, 863-869) */
        Py_ssize_t group = k / 4;
        Py_ssize_t glast = (group + 1) * 4 - 1;
        if (glast >= kept)
            glast = kept - 1;
        Py_ssize_t gsize = glast - group * 4 + 1;
        long rec_idx_value =
            rec_global_base + line_index[glast] - (long)gsize + 1;
        long task_id = task_id_base + (long)group + 1;
        if (task_id - task_id_base > tasks_used)
            tasks_used = task_id - task_id_base;

        /* this record's indel rows */
        Py_ssize_t ir0 = icur;
        while (icur < nruns && indel[icur * 9] == k)
            ++icur;
        Py_ssize_t n_rr = icur - ir0;

        /* ---- QNAME..MAPQ ---- */
        if (pv3_sb_put(&sb, arena + sp[0], sp[1]) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, flag) < 0 || pv3_sb_putc(&sb, '\t') < 0)
            goto loop_err;
        if (pv3_sb_put(&sb, out_nm[dst_ref], out_nml[dst_ref]) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0)
            goto loop_err;
        if (pv3_sb_put_long(&sb, dst_pos[k] + 1) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, mapq) < 0 || pv3_sb_putc(&sb, '\t') < 0)
            goto loop_err;

        /* ---- CIGAR splice (ops/engine._splice + collapse_cigar) ---- */
        {
            long nr = runs_per_rec[k];
            cig_emit ce = {0, 0, 0, 0, &sb};
            if (n_rr == 0) {
                for (long r = 0; r < nr; ++r)
                    if (cig_push(&ce, run_ops[run_base + r],
                                 run_lens[run_base + r]) < 0)
                        goto loop_err;
            } else {
                long copy_from = 0;
                for (Py_ssize_t t = ir0; t < icur; ++t) {
                    const int32_t *row = indel + t * 9;
                    long cs = row[5], cend = row[6];
                    for (long r = copy_from; r < cs; ++r)
                        if (cig_push(&ce, run_ops[run_base + r],
                                     run_lens[run_base + r]) < 0)
                            goto loop_err;
                    copy_from = cend;
                    /* realigned ops: reversed RLE of the traceback row */
                    {
                        long cnt = realn_counts[t];
                        const int8_t *ro = realn_ops + (size_t)t * steps;
                        for (long j = cnt - 1; j >= 0; --j)
                            if (cig_push(&ce, ro[j], 1) < 0)
                                goto loop_err;
                    }
                    g_realn += 1;
                    {
                        long rl = row[2], ql = row[4];
                        g_len += rl > ql ? rl : ql;
                        g_cells += rl * ql;
                    }
                    if (want_ranges) {
                        if (rrow_n + 1 > rrow_cap) {
                            size_t ncap = rrow_cap ? rrow_cap * 2 : 64;
                            rrow *nr_ = realloc(rrows, ncap * sizeof(rrow));
                            if (!nr_)
                                goto loop_err;
                            rrows = nr_;
                            rrow_cap = ncap;
                        }
                        rrows[rrow_n].ref_pos = (long)row[7];
                        rrows[rrow_n].ref_len = (long)row[2];
                        rrows[rrow_n].q_off = (long)sp[0];
                        rrows[rrow_n].q_len = (long)sp[1];
                        rrows[rrow_n].task_id = task_id;
                        ++rrow_n;
                    }
                }
                for (long r = copy_from; r < nr; ++r)
                    if (cig_push(&ce, run_ops[run_base + r],
                                 run_lens[run_base + r]) < 0)
                        goto loop_err;
            }
            if (cig_flush(&ce) < 0)
                goto loop_err;
            if (!ce.ever && pv3_sb_putc(&sb, '*') < 0)
                goto loop_err;
            run_base += nr;
        }

        /* ---- RNEXT / PNEXT / TLEN / SEQ / QUAL ---- */
        long out_mate_pos;
        long dst_mate = -1;
        if (mate_ref >= 0) {
            dst_mate = ref_id_mapping[mate_ref];
            out_mate_pos = (mate_pos >= 0) ? mate_dst[k] : mate_pos;
        } else {
            out_mate_pos = -1;
        }
        if (pv3_sb_putc(&sb, '\t') < 0)
            goto loop_err;
        if (mate_ref < 0) {
            if (pv3_sb_putc(&sb, '*') < 0)
                goto loop_err;
        } else if (dst_mate == dst_ref) {
            if (pv3_sb_putc(&sb, '=') < 0)
                goto loop_err;
        } else {
            if (pv3_sb_put(&sb, out_nm[dst_mate], out_nml[dst_mate]) < 0)
                goto loop_err;
        }
        if (pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, out_mate_pos + 1) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 || pv3_sb_put_long(&sb, tlen) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put(&sb, arena + sp[2], sp[3]) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put(&sb, arena + sp[4], sp[5]) < 0)
            goto loop_err;

        /* ---- tag surgery ---- */
        size_t n_items = 0;
        const char *nm_val = NULL;
        int nm_vlen = 0;
        const char *oa_prev = NULL;
        int oa_prev_len = 0;
        {
            const char *tp = arena + sp[6];
            const char *tend = tp + sp[7];
            while (tp < tend) {
                const char *tab = memchr(tp, '\t', tend - tp);
                const char *fend = tab ? tab : tend;
                const char *c1 = memchr(tp, ':', fend - tp);
                /* structure validated at parse time */
                tagitem it;
                it.key = tp;
                it.klen = (int)(c1 - tp);
                it.typ = c1[1];
                it.val = c1 + 3;
                it.vlen = (int)(fend - (c1 + 3));
                it.synth = 0;
                /* dict semantics: later duplicate key wins */
                int replaced = 0;
                for (size_t q = 0; q < n_items; ++q) {
                    if (items[q].klen == it.klen &&
                        memcmp(items[q].key, it.key, it.klen) == 0) {
                        items[q] = it;
                        replaced = 1;
                        break;
                    }
                }
                if (!replaced) {
                    if (n_items + 1 > items_cap) {
                        items_cap *= 2;
                        tagitem *ni =
                            realloc(items, items_cap * sizeof(tagitem));
                        if (!ni)
                            goto loop_err;
                        items = ni;
                    }
                    items[n_items++] = it;
                }
                tp = tab ? tab + 1 : tend;
            }
        }
        /* NM value (read before deletion, apply_projection_result) */
        for (size_t q = 0; q < n_items; ++q)
            if (items[q].klen == 2 && items[q].key[0] == 'N' &&
                items[q].key[1] == 'M' && items[q].typ == 'i') {
                nm_val = items[q].val;
                nm_vlen = items[q].vlen;
                break;
            }
        /* remove non-preserved (count) and capture existing OA */
        {
            size_t w = 0;
            for (size_t q = 0; q < n_items; ++q) {
                if (preserved_has(preserved, n_preserved, items[q].key,
                                  items[q].klen)) {
                    if (items[q].klen == 2 && items[q].key[0] == 'O' &&
                        items[q].key[1] == 'A') {
                        oa_prev = items[q].val;
                        oa_prev_len = items[q].vlen;
                        continue; /* replaced by synthesized OA */
                    }
                    items[w++] = items[q];
                } else {
                    if (rem_n + 1 > rem_cap) {
                        size_t ncap = rem_cap ? rem_cap * 2 : 64;
                        remkey *nr_ = realloc(rem, ncap * sizeof(remkey));
                        if (!nr_)
                            goto loop_err;
                        rem = nr_;
                        rem_cap = ncap;
                    }
                    rem[rem_n].key = items[q].key;
                    rem[rem_n].klen = items[q].klen;
                    ++rem_n;
                }
            }
            n_items = w;
        }
        /* synthesized tags, in apply_projection_result order */
        {
            struct {
                const char *key;
                int klen;
                int kind;
                int cond;
            } synth[8] = {
                {"OA", 2, 1, 1},
                {tn[4], tnl[4], 2, tn[4] && n_rr > 0},          /* XB */
                {tn[5], tnl[5], 3, tn[5] && n_rr > 0},          /* YB */
                {tn[6], tnl[6], 4,
                 tn[6] && rec_idx_value <= 0x7FFFFFFFL},        /* XI */
                {tn[0], tnl[0], 5, tn[0] != NULL},              /* XR */
                {tn[1], tnl[1], 6, tn[1] != NULL},              /* XP */
                {tn[2], tnl[2], 7, tn[2] && mate_ref >= 0},     /* YR */
                {tn[3], tnl[3], 8,
                 tn[3] && mate_ref >= 0 && mate_pos >= 0},      /* YP */
            };
            for (int s = 0; s < 8; ++s) {
                if (!synth[s].cond)
                    continue;
                tagitem it;
                it.key = synth[s].key;
                it.klen = synth[s].klen;
                it.typ = 0;
                it.val = NULL;
                it.vlen = 0;
                it.synth = synth[s].kind;
                int replaced = 0;
                for (size_t q = 0; q < n_items; ++q)
                    if (items[q].klen == it.klen &&
                        memcmp(items[q].key, it.key, it.klen) == 0) {
                        items[q] = it;
                        replaced = 1;
                        break;
                    }
                if (!replaced) {
                    if (n_items + 1 > items_cap) {
                        items_cap *= 2;
                        tagitem *ni =
                            realloc(items, items_cap * sizeof(tagitem));
                        if (!ni)
                            goto loop_err;
                        items = ni;
                    }
                    items[n_items++] = it;
                }
            }
        }
        qsort(items, n_items, sizeof(tagitem), tag_key_cmp);

        for (size_t q = 0; q < n_items; ++q) {
            tagitem *it = &items[q];
            if (pv3_sb_putc(&sb, '\t') < 0 ||
                pv3_sb_put(&sb, it->key, it->klen) < 0 ||
                pv3_sb_putc(&sb, ':') < 0)
                goto loop_err;
            if (it->synth == 0) {
                if (pv3_sb_putc(&sb, it->typ) < 0 ||
                    pv3_sb_putc(&sb, ':') < 0)
                    goto loop_err;
                const char *v = it->val, *vend = it->val + it->vlen;
                switch (it->typ) {
                case 'i':
                    if (sb_put_canon_int(&sb, v, vend, &err) < 0)
                        goto loop_err;
                    break;
                case 'f':
                    if (sb_put_canon_float(&sb, v, vend, &err) < 0)
                        goto loop_err;
                    break;
                case 'A':
                case 'Z':
                case 'H':
                    if (pv3_sb_put(&sb, v, it->vlen) < 0)
                        goto loop_err;
                    break;
                case 'B': {
                    if (v >= vend) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "empty B tag value");
                        goto loop_err;
                    }
                    char sub = *v++;
                    int is_f = (sub == 'f' || sub == 'F');
                    if (pv3_sb_putc(&sb, sub) < 0)
                        goto loop_err;
                    while (v < vend) {
                        const char *comma = memchr(v, ',', vend - v);
                        const char *iend = comma ? comma : vend;
                        if (iend > v) {
                            if (pv3_sb_putc(&sb, ',') < 0)
                                goto loop_err;
                            if (is_f) {
                                if (sb_put_canon_float(&sb, v, iend,
                                                       &err) < 0)
                                    goto loop_err;
                            } else if (sb_put_canon_int(&sb, v, iend,
                                                        &err) < 0)
                                goto loop_err;
                        }
                        v = comma ? comma + 1 : vend;
                    }
                    break;
                }
                default:
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "unknown tag type '%c'", it->typ);
                    goto loop_err;
                }
                continue;
            }
            switch (it->synth) {
            case 1: { /* OA:Z: prev + RNAME,pos,strand,CIGAR,MAPQ,NM; */
                if (pv3_sb_put(&sb, "Z:", 2) < 0)
                    goto loop_err;
                if (oa_prev_len &&
                    pv3_sb_put(&sb, oa_prev, oa_prev_len) < 0)
                    goto loop_err;
                if (pv3_sb_put(&sb, in_nm[ref_id], in_nml[ref_id]) < 0 ||
                    pv3_sb_putc(&sb, ',') < 0 ||
                    pv3_sb_put_long(&sb, src_pos) < 0 ||
                    pv3_sb_putc(&sb, ',') < 0 ||
                    pv3_sb_putc(&sb, (flag & 0x10) ? '-' : '+') < 0 ||
                    pv3_sb_putc(&sb, ',') < 0)
                    goto loop_err;
                {
                    const int8_t *po = ops2d + k * O;
                    const int32_t *pc = counts2d + k * O;
                    long no = n_ops_arr[k];
                    for (long j = 0; j < no; ++j) {
                        if (pv3_sb_put_long(&sb, pc[j]) < 0 ||
                            pv3_sb_putc(&sb,
                                        pv3_op_char_table[po[j]]) < 0)
                            goto loop_err;
                    }
                }
                if (pv3_sb_putc(&sb, ',') < 0 ||
                    pv3_sb_put_long(&sb, mapq) < 0 ||
                    pv3_sb_putc(&sb, ',') < 0)
                    goto loop_err;
                if (nm_val && sb_put_canon_int(&sb, nm_val,
                                               nm_val + nm_vlen,
                                               &err) < 0)
                    goto loop_err;
                if (pv3_sb_putc(&sb, ';') < 0)
                    goto loop_err;
                break;
            }
            case 2:   /* XB: B:I query ranges (q0, q0+ql) */
            case 3: { /* YB: B:I ref ranges (checker_ref, +rl) */
                if (pv3_sb_put(&sb, "B:I", 3) < 0)
                    goto loop_err;
                for (Py_ssize_t t = ir0; t < icur; ++t) {
                    const int32_t *row = indel + t * 9;
                    long a, b;
                    if (it->synth == 2) {
                        a = row[3];
                        b = row[3] + row[4];
                    } else {
                        a = row[7];
                        b = row[7] + row[2];
                    }
                    if (pv3_sb_putc(&sb, ',') < 0 ||
                        pv3_sb_put_long(&sb, a) < 0 ||
                        pv3_sb_putc(&sb, ',') < 0 ||
                        pv3_sb_put_long(&sb, b) < 0)
                        goto loop_err;
                }
                break;
            }
            case 4: /* XI */
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, rec_idx_value) < 0)
                    goto loop_err;
                break;
            case 5: /* XR: original ref id */
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, ref_id) < 0)
                    goto loop_err;
                break;
            case 6: /* XP: original pos */
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, src_pos) < 0)
                    goto loop_err;
                break;
            case 7: /* YR: original mate ref id */
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, mate_ref) < 0)
                    goto loop_err;
                break;
            case 8: /* YP: original mate pos */
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, mate_pos) < 0)
                    goto loop_err;
                break;
            }
        }
        if (pv3_sb_putc(&sb, '\n') < 0)
            goto loop_err;
        continue;
    loop_err:
        if (!err.kind)
            err.kind = 2; /* default: allocation failure */
        break;
    }

    free(items);
out:
    sl->sb = sb;
    sl->rem = rem;
    sl->rem_n = rem_n;
    sl->rem_cap = rem_cap;
    sl->rrows = rrows;
    sl->rrow_n = rrow_n;
    sl->rrow_cap = rrow_cap;
    sl->g_realn = g_realn;
    sl->g_len = g_len;
    sl->g_cells = g_cells;
    sl->tasks_used = tasks_used;
    sl->err = err;
    return NULL;
}

#define PV3_SPLICE_MAX_THREADS 8

/* Soft cap set by the Python pipeline (set_slab_threads): when the fast
   lane runs whole batches on a thread pool, per-call slab fan-out only
   oversubscribes the cores, so it caps the internal threads instead.
   0 = no cap (auto). */
static int pv3_slab_threads_cap = 0;

PyObject *pv3_set_slab_threads(PyObject *self, PyObject *args)
{
    int n;
    if (!PyArg_ParseTuple(args, "i", &n))
        return NULL;
    pv3_slab_threads_cap = n < 0 ? 0 : n;
    Py_RETURN_NONE;
}

/* Thread count: PANVC3_SPLICE_THREADS wins outright (test hook); else
   min(4, cores, one slab per 2048 records) — below ~2048 records per
   thread the spawn overhead wins — capped by set_slab_threads. */
static int splice_thread_count(Py_ssize_t kept)
{
    const char *env = getenv("PANVC3_SPLICE_THREADS");
    long n;
    if (env && *env && (n = strtol(env, NULL, 10)) > 0)
        return n > PV3_SPLICE_MAX_THREADS ? PV3_SPLICE_MAX_THREADS
                                          : (int)n;
    long cores = sysconf(_SC_NPROCESSORS_ONLN);
    n = cores < 4 ? cores : 4;
    long by_size = (long)((kept + 2047) / 2048);
    if (n > by_size)
        n = by_size;
    if (pv3_slab_threads_cap && n > pv3_slab_threads_cap)
        n = pv3_slab_threads_cap;
    return n < 1 ? 1 : (int)n;
}

PyObject *pv3_splice_apply_format(PyObject *self, PyObject *args)
{
    Py_buffer arena_b, spans_b, line_b, fields_b, nops_b;
    Py_buffer ops_b, counts_b, dstpos_b;
    Py_buffer runops_b, runlens_b, rpr_b, indel_b;
    Py_buffer rops_b, rcnt_b, matedst_b, refmap_b;
    PyObject *out_names, *in_names, *tag_names;
    Py_buffer preserved_b;
    long O, steps, rec_global_base, task_id_base;
    int want_ranges;
    if (!PyArg_ParseTuple(
            args, "y*y*y*y*y*y*y*ly*y*y*y*y*y*y*ly*y*O!O!y*Olli",
            &arena_b, &spans_b, &line_b, &fields_b, &nops_b,
            &ops_b, &counts_b, &O,
            &dstpos_b, &runops_b, &runlens_b, &rpr_b, &indel_b,
            &rops_b, &rcnt_b, &steps, &matedst_b, &refmap_b,
            &PyList_Type, &out_names, &PyList_Type, &in_names,
            &preserved_b, &tag_names, &rec_global_base, &task_id_base,
            &want_ranges))
        return NULL;

    Py_ssize_t kept = line_b.len / sizeof(int32_t);
    Py_ssize_t nruns = indel_b.len / (9 * sizeof(int32_t));

    PyObject *removed = NULL;
    PyObject *ranges = NULL;
    const char **out_nm = NULL, **in_nm = NULL;
    int *out_nml = NULL, *in_nml = NULL;
    PyThreadState *ts = NULL;

    splice_shared sh;
    memset(&sh, 0, sizeof sh);
    sh.arena = arena_b.buf;
    sh.spans = spans_b.buf;
    sh.line_index = line_b.buf;
    sh.fields = fields_b.buf;
    sh.n_ops_arr = nops_b.buf;
    sh.ops2d = ops_b.buf;
    sh.counts2d = counts_b.buf;
    sh.dst_pos = dstpos_b.buf;
    sh.run_ops = runops_b.buf;
    sh.run_lens = runlens_b.buf;
    sh.runs_per_rec = rpr_b.buf;
    sh.indel = indel_b.buf;
    sh.realn_ops = rops_b.buf;
    sh.realn_counts = rcnt_b.buf;
    sh.mate_dst = matedst_b.buf;
    sh.ref_id_mapping = refmap_b.buf;
    sh.preserved = preserved_b.buf;
    sh.n_preserved = preserved_b.len / 2;
    sh.kept = kept;
    sh.nruns = nruns;
    sh.O = O;
    sh.steps = steps;
    sh.rec_global_base = rec_global_base;
    sh.task_id_base = task_id_base;
    sh.want_ranges = want_ranges;

    splice_slab slabs[PV3_SPLICE_MAX_THREADS];
    memset(slabs, 0, sizeof slabs);
    int nthreads = 0; /* set after arg validation */

    /* tag-name config: 7-tuple (xr, xp, yr, yp, xb, yb, xi) of str|None */
    if (!PyTuple_Check(tag_names) || PyTuple_GET_SIZE(tag_names) != 7) {
        PyErr_SetString(PyExc_ValueError, "tag_names must be a 7-tuple");
        goto cleanup_null;
    }
    for (int i = 0; i < 7; ++i) {
        PyObject *o = PyTuple_GET_ITEM(tag_names, i);
        if (o == Py_None)
            continue;
        Py_ssize_t l;
        sh.tn[i] = PyUnicode_AsUTF8AndSize(o, &l);
        if (!sh.tn[i])
            goto cleanup_null;
        sh.tnl[i] = (int)l;
    }
    /* index into tn[]: 0=XR 1=XP 2=YR 3=YP 4=XB 5=YB 6=XI */

    /* pre-extract reference-name UTF8 pointers (borrowed; the lists keep
       the str objects alive for the call) so the loops can drop the GIL */
    Py_ssize_t n_out = PyList_GET_SIZE(out_names);
    Py_ssize_t n_in = PyList_GET_SIZE(in_names);
    out_nm = PyMem_Malloc((n_out ? n_out : 1) * sizeof(char *));
    out_nml = PyMem_Malloc((n_out ? n_out : 1) * sizeof(int));
    in_nm = PyMem_Malloc((n_in ? n_in : 1) * sizeof(char *));
    in_nml = PyMem_Malloc((n_in ? n_in : 1) * sizeof(int));
    if (!out_nm || !out_nml || !in_nm || !in_nml)
        goto oom;
    for (Py_ssize_t i = 0; i < n_out; ++i) {
        Py_ssize_t l;
        out_nm[i] = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(out_names, i),
                                            &l);
        if (!out_nm[i])
            goto fail;
        out_nml[i] = (int)l;
    }
    for (Py_ssize_t i = 0; i < n_in; ++i) {
        Py_ssize_t l;
        in_nm[i] = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(in_names, i), &l);
        if (!in_nm[i])
            goto fail;
        in_nml[i] = (int)l;
    }
    sh.out_nm = out_nm;
    sh.out_nml = out_nml;
    sh.in_nm = in_nm;
    sh.in_nml = in_nml;

    nthreads = splice_thread_count(kept);

    /* everything below touches only raw buffers — run without the GIL so
       the pipeline's parse / finalize threads overlap, and fan the record
       range out over nthreads slabs (output concatenated in order) */
    ts = PyEval_SaveThread();
    {
        Py_ssize_t per = nthreads ? (kept + nthreads - 1) / nthreads : 0;
        long rb = 0;
        Py_ssize_t ic = 0;
        Py_ssize_t kprev = 0;
        for (int t = 0; t < nthreads; ++t) {
            Py_ssize_t k0 = (Py_ssize_t)t * per;
            Py_ssize_t k1 = k0 + per;
            if (k0 > kept)
                k0 = kept;
            if (k1 > kept)
                k1 = kept;
            for (Py_ssize_t k = kprev; k < k0; ++k)
                rb += sh.runs_per_rec[k];
            while (ic < nruns && sh.indel[ic * 9] < k0)
                ++ic;
            kprev = k0;
            slabs[t].sh = &sh;
            slabs[t].k0 = k0;
            slabs[t].k1 = k1;
            slabs[t].run_base0 = rb;
            slabs[t].icur0 = ic;
        }
    }
    {
        pthread_t th[PV3_SPLICE_MAX_THREADS];
        int started[PV3_SPLICE_MAX_THREADS] = {0};
        for (int t = 1; t < nthreads; ++t)
            started[t] = pthread_create(&th[t], NULL, splice_slab_run,
                                        &slabs[t]) == 0;
        splice_slab_run(&slabs[0]);
        for (int t = 1; t < nthreads; ++t) {
            if (started[t])
                pthread_join(th[t], NULL);
            else
                splice_slab_run(&slabs[t]); /* fall back inline */
        }
    }
    PyEval_RestoreThread(ts);
    ts = NULL;

    for (int t = 0; t < nthreads; ++t) {
        if (slabs[t].err.kind == 1) {
            PyErr_SetString(PyExc_ValueError, slabs[t].err.msg);
            goto fail;
        }
        if (slabs[t].err.kind) {
            PyErr_NoMemory();
            goto fail;
        }
    }

    /* fold removed-tag occurrences into the counter dict */
    removed = PyDict_New();
    if (!removed)
        goto fail;
    for (int t = 0; t < nthreads; ++t) {
        for (size_t i = 0; i < slabs[t].rem_n; ++i) {
            PyObject *key = PyUnicode_DecodeUTF8(
                slabs[t].rem[i].key, slabs[t].rem[i].klen, "strict");
            if (!key)
                goto fail;
            PyObject *cur = PyDict_GetItem(removed, key);
            long c = cur ? PyLong_AsLong(cur) : 0;
            PyObject *nv = PyLong_FromLong(c + 1);
            int rc = nv ? PyDict_SetItem(removed, key, nv) : -1;
            Py_XDECREF(nv);
            Py_DECREF(key);
            if (rc < 0)
                goto fail;
        }
    }
    if (want_ranges) {
        ranges = PyList_New(0);
        if (!ranges)
            goto fail;
        for (int t = 0; t < nthreads; ++t) {
            for (size_t i = 0; i < slabs[t].rrow_n; ++i) {
                const rrow *rr = &slabs[t].rrows[i];
                PyObject *q = PyUnicode_DecodeUTF8(
                    sh.arena + rr->q_off, rr->q_len, "strict");
                PyObject *tup = q ? Py_BuildValue(
                    "(llNl)", rr->ref_pos, rr->ref_len, q,
                    rr->task_id) : NULL;
                if (!tup || PyList_Append(ranges, tup) < 0) {
                    Py_XDECREF(tup);
                    goto fail;
                }
                Py_DECREF(tup);
            }
        }
    }

    {
        Py_ssize_t total = 0;
        long g_realn = 0, g_len = 0, g_cells = 0, tasks_used = 0;
        for (int t = 0; t < nthreads; ++t) {
            total += (Py_ssize_t)slabs[t].sb.len;
            g_realn += slabs[t].g_realn;
            g_len += slabs[t].g_len;
            g_cells += slabs[t].g_cells;
            if (slabs[t].tasks_used > tasks_used)
                tasks_used = slabs[t].tasks_used;
        }
        PyObject *blob = PyBytes_FromStringAndSize(NULL, total);
        if (!blob)
            goto fail;
        char *w = PyBytes_AS_STRING(blob);
        for (int t = 0; t < nthreads; ++t) {
            memcpy(w, slabs[t].sb.buf, slabs[t].sb.len);
            w += slabs[t].sb.len;
        }
        PyObject *res = Py_BuildValue(
            "(N N (lll) N l)", blob, removed, g_realn, g_len, g_cells,
            ranges ? ranges : Py_NewRef(Py_None), tasks_used);
        if (!res) {
            Py_DECREF(blob);
            goto fail;
        }
        for (int t = 0; t < nthreads; ++t) {
            free(slabs[t].sb.buf);
            free(slabs[t].rem);
            free(slabs[t].rrows);
        }
        PyMem_Free(out_nm);
        PyMem_Free(out_nml);
        PyMem_Free(in_nm);
        PyMem_Free(in_nml);
        PyBuffer_Release(&arena_b);
        PyBuffer_Release(&spans_b);
        PyBuffer_Release(&line_b);
        PyBuffer_Release(&fields_b);
        PyBuffer_Release(&nops_b);
        PyBuffer_Release(&ops_b);
        PyBuffer_Release(&counts_b);
        PyBuffer_Release(&dstpos_b);
        PyBuffer_Release(&runops_b);
        PyBuffer_Release(&runlens_b);
        PyBuffer_Release(&rpr_b);
        PyBuffer_Release(&indel_b);
        PyBuffer_Release(&rops_b);
        PyBuffer_Release(&rcnt_b);
        PyBuffer_Release(&matedst_b);
        PyBuffer_Release(&refmap_b);
        PyBuffer_Release(&preserved_b);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    Py_XDECREF(removed);
    Py_XDECREF(ranges);
cleanup_null:
    for (int t = 0; t < nthreads; ++t) {
        free(slabs[t].sb.buf);
        free(slabs[t].rem);
        free(slabs[t].rrows);
    }
    PyMem_Free(out_nm);
    PyMem_Free(out_nml);
    PyMem_Free(in_nm);
    PyMem_Free(in_nml);
    PyBuffer_Release(&arena_b);
    PyBuffer_Release(&spans_b);
    PyBuffer_Release(&line_b);
    PyBuffer_Release(&fields_b);
    PyBuffer_Release(&nops_b);
    PyBuffer_Release(&ops_b);
    PyBuffer_Release(&counts_b);
    PyBuffer_Release(&dstpos_b);
    PyBuffer_Release(&runops_b);
    PyBuffer_Release(&runlens_b);
    PyBuffer_Release(&rpr_b);
    PyBuffer_Release(&indel_b);
    PyBuffer_Release(&rops_b);
    PyBuffer_Release(&rcnt_b);
    PyBuffer_Release(&matedst_b);
    PyBuffer_Release(&refmap_b);
    PyBuffer_Release(&preserved_b);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* event_geometry_batch: C implementation of EventGeometry.batch
 * (ops/event_geometry.py).  Per record, the projection geometry is read
 * off the precomputed per-(src,dst)-pair difference events with binary
 * searches only: dst_pos comes from the prefix-sum identity
 * dst.rank0(src.select0(u+1)) == u - G(u) + D(u) (see project_unit in
 * ops/event_geometry.py; msa_index.hh:239-258 semantics) so no gap
 * bitvector or rank table is touched at all — resident state is
 * O(#MSA differences) per pair.
 *
 * event_geometry_batch(ref_ids y*(i32 B), pos y*(i32 B),
 *                      n_units y*(i32 B), R, K,
 *                      group (list: rid -> None | 7-tuple(
 *                          gap_start y*, gap_end y*, del_b y*, del_len y*,
 *                          gap_clen y*(n_gap+1), del_clen y*(n_del+1)
 *                          (all i64), src_nzeros int)))
 *   -> (dst_pos i32[B], gapbits u8[B*ceil(R/8)], d_vals u8[B*K],
 *       d_pos u8[B*K], d_n u8[B], use_full int, d_full i32[B*R]|b"")
 * Outputs are bit-identical to the numpy implementation (enforced by
 * tests/test_device_ops.py).                                           */

typedef struct {
    const int64_t *gap_start, *gap_end, *del_b, *del_len;
    const int64_t *gap_clen, *del_clen;
    Py_ssize_t n_gap, n_del;
    int64_t src_nzeros;
    int present;
} eg_pair;

static inline Py_ssize_t eg_searchsorted(const int64_t *a, Py_ssize_t n,
                                         int64_t v)
{
    /* left insertion point */
    Py_ssize_t lo = 0, hi = n;
    while (lo < hi) {
        Py_ssize_t mid = (lo + hi) / 2;
        if (a[mid] < v)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

static inline Py_ssize_t eg_searchsorted_right(const int64_t *a,
                                               Py_ssize_t n, int64_t v)
{
    /* right insertion point */
    Py_ssize_t lo = 0, hi = n;
    while (lo < hi) {
        Py_ssize_t mid = (lo + hi) / 2;
        if (a[mid] <= v)
            lo = mid + 1;
        else
            hi = mid;
    }
    return lo;
}

PyObject *pv3_event_geometry_batch(PyObject *self, PyObject *args)
{
    Py_buffer rid_b, pos_b, nunits_b;
    long R, K;
    PyObject *group;
    if (!PyArg_ParseTuple(args, "y*y*y*llO!", &rid_b, &pos_b, &nunits_b,
                          &R, &K, &PyList_Type, &group))
        return NULL;

    const int32_t *ref_ids = rid_b.buf;
    const int32_t *pos = pos_b.buf;
    const int32_t *n_units = nunits_b.buf;
    Py_ssize_t B = pos_b.len / sizeof(int32_t);
    Py_ssize_t n_rids = PyList_GET_SIZE(group);
    Py_ssize_t gstride = (R + 7) / 8;

    eg_pair *pairs = NULL;
    Py_buffer *views = NULL; /* 8 buffer views per present pair */
    Py_ssize_t n_views = 0;
    PyObject *dstpos_o = NULL, *gap_o = NULL, *dvals_o = NULL;
    PyObject *dpos_o = NULL, *dn_o = NULL, *dfull_o = NULL;
    int64_t *tmp_rows = NULL, *tmp_rr = NULL, *tmp_ll = NULL;
    size_t tmp_n = 0, tmp_cap = 0;
    long bad_rid = -1;
    int oom_flag = 0;

    pairs = PyMem_Calloc(n_rids ? n_rids : 1, sizeof(eg_pair));
    views = PyMem_Calloc((n_rids ? n_rids : 1) * 6, sizeof(Py_buffer));
    if (!pairs || !views) {
        PyErr_NoMemory();
        goto fail;
    }
    for (Py_ssize_t i = 0; i < n_rids; ++i) {
        PyObject *t = PyList_GET_ITEM(group, i);
        if (t == Py_None)
            continue;
        long src_nzeros;
        Py_buffer *v = views + n_views;
        if (!PyArg_ParseTuple(t, "y*y*y*y*y*y*l",
                              &v[0], &v[1], &v[2], &v[3], &v[4], &v[5],
                              &src_nzeros))
            goto fail;
        n_views += 6;
        eg_pair *pe = pairs + i;
        pe->gap_start = v[0].buf;
        pe->gap_end = v[1].buf;
        pe->del_b = v[2].buf;
        pe->del_len = v[3].buf;
        pe->gap_clen = v[4].buf;
        pe->del_clen = v[5].buf;
        pe->n_gap = v[0].len / 8;
        pe->n_del = v[2].len / 8;
        pe->src_nzeros = src_nzeros;
        pe->present = 1;
    }

    dstpos_o = PyBytes_FromStringAndSize(NULL, B * sizeof(int32_t));
    gap_o = PyBytes_FromStringAndSize(NULL, B * gstride);
    dvals_o = PyBytes_FromStringAndSize(NULL, B * K);
    dpos_o = PyBytes_FromStringAndSize(NULL, B * K);
    dn_o = PyBytes_FromStringAndSize(NULL, B);
    if (!dstpos_o || !gap_o || !dvals_o || !dpos_o || !dn_o)
        goto fail;
    int32_t *dst_pos = (int32_t *)PyBytes_AS_STRING(dstpos_o);
    uint8_t *gapbits = (uint8_t *)PyBytes_AS_STRING(gap_o);
    uint8_t *d_vals = (uint8_t *)PyBytes_AS_STRING(dvals_o);
    uint8_t *d_pos = (uint8_t *)PyBytes_AS_STRING(dpos_o);
    uint8_t *d_n = (uint8_t *)PyBytes_AS_STRING(dn_o);
    memset(gapbits, 0, B * gstride);
    memset(d_vals, 0, B * K);
    memset(d_pos, 0, B * K);
    memset(d_n, 0, B);

    int use_full = R > 255;

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t k = 0; k < B; ++k) {
        int32_t rid = ref_ids[k];
        if (rid < 0 || rid >= n_rids || !pairs[rid].present) {
            bad_rid = rid;
            break;
        }
        const eg_pair *pe = pairs + rid;
        int64_t p = pos[k];
        int64_t n = n_units[k] < R ? n_units[k] : R;

        /* dst_pos = dst.rank0(src.select0(u+1)) = u - G(u) + D(u) over
         * the event prefix sums (project_unit identity) */
        int64_t u = p;
        int64_t u_hi = pe->src_nzeros - 1;
        if (u_hi < 0)
            u_hi = 0;
        if (u < 0)
            u = 0;
        if (u > u_hi)
            u = u_hi;
        int64_t g_cov = 0;
        if (pe->n_gap) {
            Py_ssize_t j = eg_searchsorted(pe->gap_end, pe->n_gap, u);
            Py_ssize_t i2 = eg_searchsorted(pe->gap_start, pe->n_gap, u);
            g_cov = pe->gap_clen[j];
            if (i2 > j)
                g_cov += u - pe->gap_start[j];
        }
        int64_t d_cov = 0;
        if (pe->n_del)
            d_cov = pe->del_clen[eg_searchsorted_right(pe->del_b,
                                                       pe->n_del, u)];
        dst_pos[k] = (int32_t)(u - g_cov + d_cov);

        /* gap runs overlapping [p, p+n) */
        if (pe->n_gap) {
            Py_ssize_t lo = eg_searchsorted(pe->gap_end, pe->n_gap, p);
            Py_ssize_t hi = eg_searchsorted(pe->gap_start, pe->n_gap,
                                            p + n);
            uint8_t *gb = gapbits + k * gstride;
            for (Py_ssize_t e = lo; e < hi; ++e) {
                int64_t a = pe->gap_start[e] - p;
                int64_t b = pe->gap_end[e] - p;
                if (a < 0)
                    a = 0;
                if (b > n - 1)
                    b = n - 1;
                for (int64_t r = a; r <= b; ++r)
                    gb[r >> 3] |= (uint8_t)(1u << (r & 7));
            }
        }

        /* deletion boundaries in (p, p+n) */
        if (pe->n_del) {
            Py_ssize_t lo = eg_searchsorted(pe->del_b, pe->n_del, p + 1);
            Py_ssize_t hi = eg_searchsorted(pe->del_b, pe->n_del, p + n);
            Py_ssize_t cnt = hi - lo;
            if (cnt > 0) {
                if (tmp_n + (size_t)cnt > tmp_cap) {
                    size_t ncap = tmp_cap ? tmp_cap * 2 : 256;
                    while (ncap < tmp_n + (size_t)cnt)
                        ncap *= 2;
                    int64_t *nr = realloc(tmp_rows, ncap * sizeof(int64_t));
                    int64_t *nrr = realloc(tmp_rr, ncap * sizeof(int64_t));
                    int64_t *nll = realloc(tmp_ll, ncap * sizeof(int64_t));
                    if (nr) tmp_rows = nr;
                    if (nrr) tmp_rr = nrr;
                    if (nll) tmp_ll = nll;
                    if (!nr || !nrr || !nll) {
                        oom_flag = 1;
                        break;
                    }
                    tmp_cap = ncap;
                }
                for (Py_ssize_t e = lo; e < hi; ++e) {
                    tmp_rows[tmp_n] = k;
                    tmp_rr[tmp_n] = pe->del_b[e] - p;
                    tmp_ll[tmp_n] = pe->del_len[e];
                    if (pe->del_len[e] > 255)
                        use_full = 1;
                    ++tmp_n;
                }
                if (cnt > K)
                    use_full = 1;
            }
        }
    }
    Py_END_ALLOW_THREADS
    if (oom_flag) {
        PyErr_NoMemory();
        goto fail;
    }
    if (bad_rid >= 0 || (bad_rid < -1)) {
        PyErr_Format(PyExc_ValueError,
                     "record references index-less ref id %ld",
                     (long)bad_rid);
        goto fail;
    }

    if (use_full) {
        dfull_o = PyBytes_FromStringAndSize(NULL, B * R * sizeof(int32_t));
        if (!dfull_o)
            goto fail;
        int32_t *d_full = (int32_t *)PyBytes_AS_STRING(dfull_o);
        memset(d_full, 0, B * R * sizeof(int32_t));
        for (size_t i = 0; i < tmp_n; ++i)
            d_full[tmp_rows[i] * R + tmp_rr[i]] += (int32_t)tmp_ll[i];
    } else {
        dfull_o = PyBytes_FromStringAndSize("", 0);
        if (!dfull_o)
            goto fail;
        /* per-row instances are contiguous and rr-ascending */
        for (size_t i = 0; i < tmp_n;) {
            int64_t row = tmp_rows[i];
            size_t j = i;
            while (j < tmp_n && tmp_rows[j] == row)
                ++j;
            d_n[row] = (uint8_t)(j - i);
            for (size_t q = i; q < j; ++q) {
                d_vals[row * K + (q - i)] = (uint8_t)tmp_ll[q];
                d_pos[row * K + (q - i)] = (uint8_t)tmp_rr[q];
            }
            i = j;
        }
    }

    {
        PyObject *res = Py_BuildValue("(NNNNNiN)", dstpos_o, gap_o,
                                      dvals_o, dpos_o, dn_o, use_full,
                                      dfull_o);
        free(tmp_rows);
        free(tmp_rr);
        free(tmp_ll);
        for (Py_ssize_t i = 0; i < n_views; ++i)
            PyBuffer_Release(&views[i]);
        PyMem_Free(views);
        PyMem_Free(pairs);
        PyBuffer_Release(&rid_b);
        PyBuffer_Release(&pos_b);
        PyBuffer_Release(&nunits_b);
        return res;
    }

fail:
    free(tmp_rows);
    free(tmp_rr);
    free(tmp_ll);
    Py_XDECREF(dstpos_o);
    Py_XDECREF(gap_o);
    Py_XDECREF(dvals_o);
    Py_XDECREF(dpos_o);
    Py_XDECREF(dn_o);
    Py_XDECREF(dfull_o);
    if (views)
        for (Py_ssize_t i = 0; i < n_views; ++i)
            PyBuffer_Release(&views[i]);
    PyMem_Free(views);
    PyMem_Free(pairs);
    PyBuffer_Release(&rid_b);
    PyBuffer_Release(&pos_b);
    PyBuffer_Release(&nunits_b);
    return NULL;
}

/* ------------------------------------------------------------------ */
/* finalize_reconstruct: finalize_rewrite + host character comparison in
 * one pass (rewrite v3).  The device ships only gap geometry (dst_pos,
 * isgap bitmask, sparse deletion runs); the emitted op per ref unit is
 * reconstructed here by comparing the dna5-normalised query byte against
 * the raw reference byte (rewrite_cigar.hh:80-152 semantics; index
 * clamped like the device gather).  Slab-threaded over contiguous record
 * ranges like splice_apply_format (outputs concatenated in order).
 *
 * finalize_reconstruct(unit_op y*, unit_count y*, rec_n_units y*,
 *                      dst_pos y*(i32 B),
 *                      d_vals y*(u8 B*K), d_pos y*(u8 B*K), d_n y*(i32 B),
 *                      K, d_full y*(i32 B*R or empty), use_full,
 *                      gapbits y*(u8 B*ceil(R/8)), R,
 *                      query y*(u8 B*Lq), Lq,
 *                      ref_list (list: dst ref id -> bytes), dst_rids y*)
 *   -> (run_ops, run_lens, runs_per_rec, indel i32[n*9])  (same as
 *      finalize_rewrite)                                               */

typedef struct {
    const int8_t *unit_op;
    const int32_t *unit_count;
    const int32_t *rec_n_units;
    const int32_t *dst_pos;
    const uint8_t *d_vals;
    const uint8_t *d_pos;
    const uint8_t *d_n;
    const int32_t *d_full;
    const uint8_t *gapbits;
    const unsigned char *query;
    const int32_t *dst_rids;
    const unsigned char **refs;
    const Py_ssize_t *reflens;
    int32_t *runs_per_rec; /* shared output, disjoint per record */
    Py_ssize_t n_rec;
    Py_ssize_t gap_stride;
    long K, use_full, R, Lq;
    int no_span; /* PANVC3_SPAN_FAST=0: disable the bulk match-span path */
} finrec_shared;

typedef struct {
    const finrec_shared *sh;
    Py_ssize_t rec0, rec1;
    Py_ssize_t u0;       /* flat unit cursor at rec0 */
    Py_ssize_t units;    /* sum of rec_n_units over the slab */
    int8_t *run_ops;
    int32_t *run_lens;
    Py_ssize_t out;
    int32_t *indel;
    size_t indel_cap, n_indel;
    int oom;
} finrec_slab;

static void *finrec_slab_run(void *arg)
{
    finrec_slab *sl = arg;
    const finrec_shared *S = sl->sh;
    const int8_t *unit_op = S->unit_op;
    const int32_t *unit_count = S->unit_count;
    const int32_t *rec_n_units = S->rec_n_units;
    const int32_t *dst_pos = S->dst_pos;
    const uint8_t *d_vals = S->d_vals;
    const uint8_t *d_pos = S->d_pos;
    const uint8_t *d_n = S->d_n;
    const int32_t *d_full = S->d_full;
    const uint8_t *gapbits = S->gapbits;
    const unsigned char *query = S->query;
    const int32_t *dst_rids = S->dst_rids;
    long K = S->K, use_full = S->use_full, R = S->R, Lq = S->Lq;
    Py_ssize_t gap_stride = S->gap_stride;

    Py_ssize_t cap = sl->units * 2 + 16;
    int8_t *run_ops = malloc(cap);
    int32_t *run_lens = malloc(cap * sizeof(int32_t));
    int32_t *indel = NULL;
    size_t indel_cap = 0, n_indel = 0;
    Py_ssize_t out = 0;
    if (!run_ops || !run_lens) {
        free(run_ops);
        free(run_lens);
        sl->oom = 1;
        return NULL;
    }

    #define INDEL_ROW2(REC, RL, RLEN, QL, QLEN, CF, CE, CR, CQ)           \
        do {                                                              \
            if ((n_indel + 1) * 9 > indel_cap) {                          \
                size_t ncap = indel_cap ? indel_cap * 2 : 9 * 64;         \
                int32_t *ni = realloc(indel, ncap * sizeof(int32_t));     \
                if (!ni) {                                                \
                    sl->oom = 1;                                          \
                    goto loop_end;                                        \
                }                                                         \
                indel = ni;                                               \
                indel_cap = ncap;                                         \
            }                                                             \
            int32_t *row_ = indel + n_indel * 9;                          \
            row_[0] = (int32_t)(REC); row_[1] = (int32_t)(RL);            \
            row_[2] = (int32_t)(RLEN); row_[3] = (int32_t)(QL);           \
            row_[4] = (int32_t)(QLEN); row_[5] = (int32_t)(CF);           \
            row_[6] = (int32_t)(CE); row_[7] = (int32_t)(CR);             \
            row_[8] = (int32_t)(CQ);                                      \
            ++n_indel;                                                    \
        } while (0)

    Py_ssize_t u = sl->u0;

    for (Py_ssize_t rec = sl->rec0; rec < sl->rec1; ++rec) {
        Py_ssize_t rec_start = out;
        int32_t nu = rec_n_units[rec];
        int8_t cur_op = -1;
        int64_t cur_len = 0;

        const unsigned char *refc = S->refs[dst_rids[rec]];
        Py_ssize_t reflen = S->reflens[dst_rids[rec]];
        const uint8_t *gb = gapbits + (size_t)rec * gap_stride;
        const unsigned char *qrow = query + (size_t)rec * Lq;

        int64_t ref_cursor = dst_pos[rec];
        int64_t qpos = 0;
        int32_t r = 0;              /* ref-unit index */
        int32_t si = 0;             /* sparse deletion-run cursor */

        #define EMIT2(OP, LEN)                                           \
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

        for (int32_t k = 0; k < nu;) {
            int8_t op = unit_op[u];
            int32_t cnt = unit_count[u];
            /* Bulk fast path: a span of match-type units with no dst gaps,
             * no deletion events and unclamped query/ref cursors emits
             * pure =/X decided by an 8-bytes-at-a-time compare.  Typical
             * reads are long all-match spans, so this skips the per-unit
             * branch cascade for most units (byte-identical output: EMIT2
             * run-merging is the same, d=0 emits nothing, gap=0 keeps the
             * compare branch). */
            if (pv3_is_mtype_op(op) && !S->no_span) {
                int32_t lim = nu - k;
                if (use_full) {
                    const int32_t *df = d_full + (size_t)rec * R + r;
                    int32_t dl = 0;
                    while (dl < lim && df[dl] == 0)
                        ++dl;
                    lim = dl;
                } else if (si < d_n[rec]) {
                    int32_t nd = (int32_t)d_pos[(size_t)rec * K + si] - r;
                    if (nd < lim)
                        lim = nd;
                }
                /* zero-gap-bit prefix length from bit r */
                {
                    int32_t gl = 0;
                    int32_t byte = r >> 3;
                    uint8_t b0 = (uint8_t)(gb[byte] >> (r & 7));
                    if (b0 == 0) {
                        gl = 8 - (r & 7);
                        ++byte;
                        while (gl + 8 <= lim && gb[byte] == 0) {
                            gl += 8;
                            ++byte;
                        }
                        if (gl < lim) {
                            uint8_t bl = gb[byte];
                            while (gl < lim && !(bl & 1)) {
                                ++gl;
                                bl >>= 1;
                            }
                        }
                    } else {
                        uint8_t bl = b0;
                        while (gl < lim && !(bl & 1)) {
                            ++gl;
                            bl >>= 1;
                        }
                    }
                    if (gl < lim)
                        lim = gl;
                }
                if ((int64_t)lim > Lq - qpos)
                    lim = (int32_t)(Lq - qpos);
                if (ref_cursor < 0)
                    lim = 0;
                else if ((int64_t)lim > reflen - ref_cursor)
                    lim = (int32_t)(reflen - ref_cursor);
                int32_t span = 0;
                while (span < lim && pv3_is_mtype_op(unit_op[u + span]))
                    ++span;
                if (span >= 4) {
                    const unsigned char *qp = qrow + qpos;
                    const unsigned char *rp = refc + ref_cursor;
                    int32_t i = 0;
                    while (i + 8 <= span) {
                        uint64_t a, b;
                        memcpy(&a, qp + i, 8);
                        memcpy(&b, rp + i, 8);
                        if (a == b) {
                            EMIT2(OP_EQ, 8);
                            i += 8;
                        } else {
                            for (int32_t j = 0; j < 8; ++j, ++i)
                                EMIT2(qp[i] == rp[i] ? OP_EQ : OP_X, 1);
                        }
                    }
                    for (; i < span; ++i)
                        EMIT2(qp[i] == rp[i] ? OP_EQ : OP_X, 1);
                    qpos += span;
                    ref_cursor += span;
                    r += span;
                    k += span;
                    u += span;
                    continue;
                }
            }
            if (pv3_is_ref_op(op)) {
                int32_t d;
                if (use_full) {
                    d = d_full[(size_t)rec * R + r];
                } else if (si < d_n[rec] &&
                           d_pos[(size_t)rec * K + si] == (uint8_t)r) {
                    d = d_vals[(size_t)rec * K + si];
                    ++si;
                } else {
                    d = 0;
                }
                int gap = (gb[r >> 3] >> (r & 7)) & 1;
                ref_cursor += d;
                EMIT2(OP_D, d);
                if (pv3_is_mtype_op(op)) {
                    int8_t code;
                    if (gap) {
                        code = OP_I;
                    } else {
                        int64_t qi = qpos < Lq - 1 ? qpos : Lq - 1;
                        int64_t ri = ref_cursor;
                        if (ri < 0)
                            ri = 0;
                        if (ri > reflen - 1)
                            ri = reflen > 0 ? reflen - 1 : 0;
                        unsigned char qc = qrow[qi];
                        unsigned char rc = reflen ? refc[ri] : 0;
                        code = (qc == rc) ? OP_EQ : OP_X;
                    }
                    EMIT2(code, 1);
                    qpos += 1;
                } else {
                    /* D/N unit: dst gap drops it, non-gap keeps 'D' */
                    if (!gap)
                        EMIT2(OP_D, 1);
                }
                ref_cursor += gap ? 0 : 1;
                ++r;
            } else {
                if (op == OP_I || op == OP_S)
                    qpos += cnt;
                EMIT2(op, cnt);
            }
            ++k;
            ++u;
        }
        if (cur_len > 0) {
            run_ops[out] = cur_op;
            run_lens[out] = (int32_t)cur_len;
            ++out;
        }
        #undef EMIT2
        S->runs_per_rec[rec] = (int32_t)(out - rec_start);

        /* indel-run detection over [rec_start, out) (checker semantics,
         * indel_run_checker.cc:31-121) — identical to finalize_rewrite */
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
                default:
                    ref_pos += count;
                    query_pos += count;
                    run_type = 0;
                    report = (prev_type == 3);
                    break;
                }
                if (report)
                    INDEL_ROW2(rec, ref_loc, ref_before - ref_loc,
                               query_loc, query_before - query_loc,
                               cig_first, i, ref_pos, query_pos);
            }
            if (run_type == 3)
                INDEL_ROW2(rec, ref_loc, ref_pos - ref_loc,
                           query_loc, query_pos - query_loc,
                           cig_first, n_ops_rec, ref_pos, query_pos);
        }
    }
loop_end:
    #undef INDEL_ROW2
    sl->run_ops = run_ops;
    sl->run_lens = run_lens;
    sl->out = out;
    sl->indel = indel;
    sl->indel_cap = indel_cap;
    sl->n_indel = n_indel;
    return NULL;
}

PyObject *pv3_finalize_reconstruct(PyObject *self, PyObject *args)
{
    Py_buffer uop_b, ucnt_b, nunits_b, dstpos_b;
    Py_buffer dvals_b, dpos_b, dn_b, dfull_b, gap_b, query_b, dstrid_b;
    PyObject *ref_list;
    long K, use_full, R, Lq;
    if (!PyArg_ParseTuple(args, "y*y*y*y*y*y*y*ly*ly*ly*lO!y*",
                          &uop_b, &ucnt_b, &nunits_b, &dstpos_b,
                          &dvals_b, &dpos_b, &dn_b, &K,
                          &dfull_b, &use_full, &gap_b, &R,
                          &query_b, &Lq, &PyList_Type, &ref_list,
                          &dstrid_b))
        return NULL;
    dna5_init();

    const int32_t *rec_n_units = nunits_b.buf;
    Py_ssize_t n_rec = nunits_b.len / sizeof(int32_t);

    finrec_shared sh;
    memset(&sh, 0, sizeof sh);
    sh.unit_op = uop_b.buf;
    sh.unit_count = ucnt_b.buf;
    sh.rec_n_units = rec_n_units;
    sh.dst_pos = dstpos_b.buf;
    sh.d_vals = dvals_b.buf;
    sh.d_pos = dpos_b.buf;
    sh.d_n = dn_b.buf;
    sh.d_full = dfull_b.buf;
    sh.gapbits = gap_b.buf;
    sh.query = query_b.buf;
    sh.dst_rids = dstrid_b.buf;
    sh.n_rec = n_rec;
    sh.gap_stride = n_rec ? gap_b.len / n_rec : 0;
    sh.K = K;
    sh.use_full = use_full;
    sh.R = R;
    sh.Lq = Lq;
    {
        const char *e = getenv("PANVC3_SPAN_FAST");
        sh.no_span = e && e[0] == '0' && e[1] == '\0';
    }

    int32_t *runs_per_rec = malloc((n_rec ? n_rec : 1) * sizeof(int32_t));
    const unsigned char **refs = NULL;
    Py_ssize_t *reflens = NULL;
    PyThreadState *ts = NULL;
    finrec_slab slabs[PV3_SPLICE_MAX_THREADS];
    memset(slabs, 0, sizeof slabs);
    int nthreads = 0;
    if (!runs_per_rec) {
        PyErr_NoMemory();
        goto fail;
    }
    sh.runs_per_rec = runs_per_rec;

    /* pre-extract destination reference byte pointers (borrowed; the list
       keeps the bytes alive) so the record loops can drop the GIL */
    {
        Py_ssize_t n_refs = PyList_GET_SIZE(ref_list);
        refs = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(char *));
        reflens = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(Py_ssize_t));
        if (!refs || !reflens) {
            PyErr_NoMemory();
            goto fail;
        }
        for (Py_ssize_t i = 0; i < n_refs; ++i) {
            char *rc_;
            if (PyBytes_AsStringAndSize(PyList_GET_ITEM(ref_list, i), &rc_,
                                        &reflens[i]) < 0)
                goto fail;
            refs[i] = (const unsigned char *)rc_;
        }
    }
    sh.refs = refs;
    sh.reflens = reflens;

    nthreads = splice_thread_count(n_rec);

    ts = PyEval_SaveThread();
    {
        Py_ssize_t per = nthreads ? (n_rec + nthreads - 1) / nthreads : 0;
        Py_ssize_t u = 0, kprev = 0;
        for (int t = 0; t < nthreads; ++t) {
            Py_ssize_t k0 = (Py_ssize_t)t * per;
            Py_ssize_t k1 = k0 + per;
            if (k0 > n_rec)
                k0 = n_rec;
            if (k1 > n_rec)
                k1 = n_rec;
            for (Py_ssize_t k = kprev; k < k0; ++k)
                u += rec_n_units[k];
            kprev = k0;
            Py_ssize_t units = 0;
            for (Py_ssize_t k = k0; k < k1; ++k)
                units += rec_n_units[k];
            slabs[t].sh = &sh;
            slabs[t].rec0 = k0;
            slabs[t].rec1 = k1;
            slabs[t].u0 = u;
            slabs[t].units = units;
        }
    }
    {
        pthread_t th[PV3_SPLICE_MAX_THREADS];
        int started[PV3_SPLICE_MAX_THREADS] = {0};
        for (int t = 1; t < nthreads; ++t)
            started[t] = pthread_create(&th[t], NULL, finrec_slab_run,
                                        &slabs[t]) == 0;
        finrec_slab_run(&slabs[0]);
        for (int t = 1; t < nthreads; ++t) {
            if (started[t])
                pthread_join(th[t], NULL);
            else
                finrec_slab_run(&slabs[t]);
        }
    }
    PyEval_RestoreThread(ts);
    ts = NULL;

    for (int t = 0; t < nthreads; ++t)
        if (slabs[t].oom) {
            PyErr_NoMemory();
            goto fail;
        }

    {
        Py_ssize_t out_total = 0;
        size_t indel_total = 0;
        for (int t = 0; t < nthreads; ++t) {
            out_total += slabs[t].out;
            indel_total += slabs[t].n_indel;
        }
        int8_t *run_ops = malloc(out_total ? out_total : 1);
        int32_t *run_lens =
            malloc((out_total ? out_total : 1) * sizeof(int32_t));
        int32_t *indel =
            malloc((indel_total ? indel_total : 1) * 9 * sizeof(int32_t));
        if (!run_ops || !run_lens || !indel) {
            free(run_ops);
            free(run_lens);
            free(indel);
            PyErr_NoMemory();
            goto fail;
        }
        Py_ssize_t o = 0;
        size_t ir = 0;
        for (int t = 0; t < nthreads; ++t) {
            memcpy(run_ops + o, slabs[t].run_ops, slabs[t].out);
            memcpy(run_lens + o, slabs[t].run_lens,
                   slabs[t].out * sizeof(int32_t));
            o += slabs[t].out;
            memcpy(indel + ir * 9, slabs[t].indel,
                   slabs[t].n_indel * 9 * sizeof(int32_t));
            ir += slabs[t].n_indel;
        }
        PyObject *res = Py_BuildValue(
            "(y#y#y#y#)",
            (char *)run_ops, out_total,
            (char *)run_lens, (Py_ssize_t)(out_total * sizeof(int32_t)),
            (char *)runs_per_rec, (Py_ssize_t)(n_rec * sizeof(int32_t)),
            (char *)indel,
            (Py_ssize_t)(indel_total * 9 * sizeof(int32_t)));
        free(run_ops);
        free(run_lens);
        free(indel);
        for (int t = 0; t < nthreads; ++t) {
            free(slabs[t].run_ops);
            free(slabs[t].run_lens);
            free(slabs[t].indel);
        }
        free(runs_per_rec);
        PyMem_Free(refs);
        PyMem_Free(reflens);
        PyBuffer_Release(&uop_b);
        PyBuffer_Release(&ucnt_b);
        PyBuffer_Release(&nunits_b);
        PyBuffer_Release(&dstpos_b);
        PyBuffer_Release(&dvals_b);
        PyBuffer_Release(&dpos_b);
        PyBuffer_Release(&dn_b);
        PyBuffer_Release(&dfull_b);
        PyBuffer_Release(&gap_b);
        PyBuffer_Release(&query_b);
        PyBuffer_Release(&dstrid_b);
        return res;
    }

fail:
    for (int t = 0; t < nthreads; ++t) {
        free(slabs[t].run_ops);
        free(slabs[t].run_lens);
        free(slabs[t].indel);
    }
    free(runs_per_rec);
    PyMem_Free(refs);
    PyMem_Free(reflens);
    PyBuffer_Release(&uop_b);
    PyBuffer_Release(&ucnt_b);
    PyBuffer_Release(&nunits_b);
    PyBuffer_Release(&dstpos_b);
    PyBuffer_Release(&dvals_b);
    PyBuffer_Release(&dpos_b);
    PyBuffer_Release(&dn_b);
    PyBuffer_Release(&dfull_b);
    PyBuffer_Release(&gap_b);
    PyBuffer_Release(&query_b);
    PyBuffer_Release(&dstrid_b);
    return NULL;
}

/* format_float_c(v) -> str — the C float32 tag formatter, exposed for the
   differential test against io/sam.format_float (tests/test_property.py). */
PyObject *pv3_format_float_c(PyObject *self, PyObject *args)
{
    double v;
    if (!PyArg_ParseTuple(args, "d", &v))
        return NULL;
    char buf[64];
    int n = pv3_format_f32(v, buf);
    return PyUnicode_FromStringAndSize(buf, n);
}

/* ---- host realignment DP (latency path) ------------------------------ */

/* Affine-gap global alignment of one (ref, query) run, bit-identical to
   ops/realign_batch.realign_device_kernel's integer path (same float32
   recurrences, same trace encoding, same traceback tie-breaking:
   diagonal >= vertical > horizontal, gap-open >= extension).  Emits the
   per-character op codes in traceback (reverse) order, exactly like the
   device fetch that splice_apply_format consumes.

   The device DP is the throughput kernel; this is the latency path for
   small batches where the dispatch round trip dwarfs the (tiny) DP —
   the reference runs the same DP inline on the CPU (align.hh:66-112). */

#define RDP_NEG (-1e30f)
#define RDP_DIAG 0
#define RDP_VERT 1
#define RDP_HORIZ 2

static void rdp_align_one(
    const uint8_t *ref, long n,     /* ref slice, length n  (DP columns) */
    const uint8_t *query, long m,   /* query slice, length m (DP rows)  */
    float go, float ge,
    float *best_prev, float *best, float *vert, /* scratch, n+1 each */
    uint8_t *trace,                 /* scratch, (m+1)*(n+1) */
    int8_t *ops_out, int32_t *count_out,
    /* quantised Malde quality scoring (align.malde_tables): 64x64 int32
       match/mismatch tables + per-base phreds; NULL = integer scheme */
    const int32_t *mtab, const int32_t *xtab,
    const int32_t *rq, const int32_t *qq,
    float *srow)                    /* scratch, n (per-row scores) */
{
    long stride = n + 1;

    /* constant reference qualities (the production path ALWAYS pins them
       to phred42 max, stage_realign_runs): the per-cell 64x64 table
       gather collapses to two per-row scalars, making the quality inner
       loop as vectorizable as the integer one */
    int rq_const = 1;
    int32_t rq0 = 0;
    if (mtab && n > 0) {
        rq0 = rq[0];
        for (long j = 1; j < n; ++j)
            if (rq[j] != rq0) {
                rq_const = 0;
                break;
            }
    }

    /* row 0: pure horizontal-gap border (kernel best0/tr0) */
    best_prev[0] = 0.0f;
    trace[0] = RDP_DIAG;
    for (long j = 1; j <= n; ++j) {
        best_prev[j] = go + ge * (float)j;
        trace[j] = RDP_HORIZ | (j == 1 ? 8 : 0);
        vert[j] = RDP_NEG;
    }
    vert[0] = RDP_NEG;

    for (long i = 1; i <= m; ++i) {
        uint8_t qc = query[i - 1];
        uint8_t *trow = trace + i * stride;
        float border = go + ge * (float)i;

        /* per-row substitution scores (separate pass so the main loop
           vectorizes: no table gathers / double-pointer selects in it) */
        if (!mtab) {
            for (long j = 0; j < n; ++j)
                srow[j] = (qc == ref[j]) ? 0.0f : -1.0f;
        } else if (rq_const) {
            float sm = (float)mtab[rq0 * 64 + qq[i - 1]];
            float sx = (float)xtab[rq0 * 64 + qq[i - 1]];
            for (long j = 0; j < n; ++j)
                srow[j] = (qc == ref[j]) ? sm : sx;
        } else {
            int32_t qqi = qq[i - 1];
            for (long j = 0; j < n; ++j) {
                const int32_t *tab = (qc == ref[j]) ? mtab : xtab;
                srow[j] = (float)tab[rq[j] * 64 + qqi];
            }
        }

        /* vertical candidates + a = max(diag, vert) with trace bits */
        for (long j = 0; j <= n; ++j) {
            float v_open = best_prev[j] + go + ge;
            float v_ext = vert[j] + ge;
            int vopen = v_open >= v_ext;
            float v = v_open > v_ext ? v_open : v_ext;
            float a;
            uint8_t t;
            if (j == 0) {
                a = border;
                v = border;
                t = RDP_VERT;
            } else {
                float s = srow[j - 1];
                float diag = best_prev[j - 1] + s;
                if (diag >= v) {
                    a = diag;
                    t = RDP_DIAG;
                } else {
                    a = v;
                    t = RDP_VERT;
                }
            }
            vert[j] = v;
            best[j] = a;       /* a; horiz folded in below */
            trow[j] = t | (vopen ? 4 : 0);
        }

        /* horizontal run (kernel's prefix-max formulation: horiz[j] =
           max_{j'<j}(a[j'] + go - ge*j') + ge*j) + final best row */
        float runmax = RDP_NEG;
        float h_prev = RDP_NEG;
        float a_prev = best[0];
        for (long j = 1; j <= n; ++j) {
            float sh = a_prev + go - ge * (float)(j - 1);
            if (sh > runmax)
                runmax = sh;
            float horiz = runmax + ge * (float)j;
            int hopen = best[j - 1] + go >= h_prev;
            float a = best[j];
            a_prev = a;
            if (horiz > a) {
                best[j] = horiz;
                trow[j] = (trow[j] & ~3) | RDP_HORIZ;
            }
            if (hopen)
                trow[j] |= 8;
            h_prev = horiz;
        }

        /* swap best_prev <-> best */
        float *tmp = best_prev;
        best_prev = best;
        best = tmp;
    }

    /* traceback (kernel _traceback_batch semantics) */
    long i = m, j = n, k = 0;
    int state = 0;
    while (i != 0 || j != 0) {
        uint8_t cell = trace[i * stride + j];
        int tr = cell & 3;
        int vopen = (cell >> 2) & 1;
        int hopen = (cell >> 3) & 1;
        int eff = state == 0 ? tr : state;
        if (state == 0 && i == 0 && j > 0)
            eff = RDP_HORIZ;
        if (state == 0 && j == 0 && i > 0)
            eff = RDP_VERT;
        if (eff == RDP_DIAG) {
            ops_out[k++] = (query[i - 1] == ref[j - 1]) ? OP_EQ : OP_X;
            --i;
            --j;
            state = 0;
        } else if (eff == RDP_VERT) {
            ops_out[k++] = OP_I;
            --i;
            state = vopen ? 0 : 1;
        } else {
            ops_out[k++] = OP_D;
            --j;
            state = hopen ? 0 : 2;
        }
    }
    *count_out = (int32_t)k;
}

/* realign_runs_host(ref_b, q_b, rl_b, ql_b, Rp, Qp, go, ge
                     [, rq_b, qq_b, mtab_b, xtab_b])
   -> (ops bytes int8[S, Rp+Qp], counts bytes int32[S])
   Same output layout as fetching the device realign kernel.  The four
   optional buffers switch on the quantised Malde quality scheme: int32
   phreds (S*Rp / S*Qp) + the 64x64 int32 match/mismatch tables; go/ge
   arrive pre-scaled by MALDE_SCALE then. */
PyObject *pv3_realign_runs_host(PyObject *self, PyObject *args)
{
    Py_buffer ref_b, q_b, rl_b, ql_b;
    Py_buffer rq_b = {0}, qq_b = {0}, mt_b = {0}, xt_b = {0};
    long Rp, Qp;
    float go, ge;
    if (!PyArg_ParseTuple(args, "y*y*y*y*llff|y*y*y*y*",
                          &ref_b, &q_b, &rl_b, &ql_b, &Rp, &Qp, &go, &ge,
                          &rq_b, &qq_b, &mt_b, &xt_b))
        return NULL;
    int use_quality = mt_b.buf != NULL;
    if (use_quality &&
        (!rq_b.buf || !qq_b.buf || !xt_b.buf ||
         mt_b.len < 64 * 64 * (Py_ssize_t)sizeof(int32_t) ||
         xt_b.len < 64 * 64 * (Py_ssize_t)sizeof(int32_t))) {
        PyErr_SetString(PyExc_ValueError,
                        "quality scoring needs rq, qq and 64x64 tables");
        goto fail_early;
    }

    Py_ssize_t S = rl_b.len / sizeof(int32_t);
    long steps = Rp + Qp;
    const uint8_t *refs = ref_b.buf;
    const uint8_t *qs = q_b.buf;
    const int32_t *rl = rl_b.buf;
    const int32_t *ql = ql_b.buf;

    PyObject *ops_o = NULL, *cnt_o = NULL, *res = NULL;
    float *fbuf = NULL;
    uint8_t *trace = NULL;
    PyThreadState *ts;

    ops_o = PyBytes_FromStringAndSize(NULL, S * steps);
    cnt_o = PyBytes_FromStringAndSize(NULL, S * sizeof(int32_t));
    if (!ops_o || !cnt_o)
        goto fail;
    int8_t *ops = (int8_t *)PyBytes_AS_STRING(ops_o);
    int32_t *cnt = (int32_t *)PyBytes_AS_STRING(cnt_o);

    fbuf = malloc(4 * (Rp + 1) * sizeof(float));
    trace = malloc((size_t)(Qp + 1) * (Rp + 1));
    if (!fbuf || !trace)
        goto fail;

    ts = PyEval_SaveThread();
    memset(ops, 127, (size_t)S * steps); /* device kernel pads with 127 */
    for (Py_ssize_t s = 0; s < S; ++s) {
        long n = rl[s], m = ql[s];
        if (n > Rp || m > Qp || n < 0 || m < 0) {
            PyEval_RestoreThread(ts);
            PyErr_SetString(PyExc_ValueError, "run length exceeds padding");
            goto fail;
        }
        rdp_align_one(refs + s * Rp, n, qs + s * Qp, m, go, ge,
                      fbuf, fbuf + (Rp + 1), fbuf + 2 * (Rp + 1),
                      trace, ops + s * steps, cnt + s,
                      use_quality ? (const int32_t *)mt_b.buf : NULL,
                      use_quality ? (const int32_t *)xt_b.buf : NULL,
                      use_quality ? (const int32_t *)rq_b.buf + s * Rp
                                  : NULL,
                      use_quality ? (const int32_t *)qq_b.buf + s * Qp
                                  : NULL,
                      fbuf + 3 * (Rp + 1));
    }
    PyEval_RestoreThread(ts);

    res = Py_BuildValue("(NN)", ops_o, cnt_o);
    free(fbuf);
    free(trace);
    goto release;

fail:
    Py_XDECREF(ops_o);
    Py_XDECREF(cnt_o);
    free(fbuf);
    free(trace);
    res = NULL;
release:
    PyBuffer_Release(&ref_b);
    PyBuffer_Release(&q_b);
    PyBuffer_Release(&rl_b);
    PyBuffer_Release(&ql_b);
    if (rq_b.buf)
        PyBuffer_Release(&rq_b);
    if (qq_b.buf)
        PyBuffer_Release(&qq_b);
    if (mt_b.buf)
        PyBuffer_Release(&mt_b);
    if (xt_b.buf)
        PyBuffer_Release(&xt_b);
    return res;

fail_early:
    PyBuffer_Release(&ref_b);
    PyBuffer_Release(&q_b);
    PyBuffer_Release(&rl_b);
    PyBuffer_Release(&ql_b);
    if (rq_b.buf)
        PyBuffer_Release(&rq_b);
    if (qq_b.buf)
        PyBuffer_Release(&qq_b);
    if (mt_b.buf)
        PyBuffer_Release(&mt_b);
    if (xt_b.buf)
        PyBuffer_Release(&xt_b);
    return NULL;
}

/* ---- BAM <-> SAM text converters ------------------------------------- */

/* BAM nibble code -> base char ("=ACMGRSVTWYHKDBN", SAM spec 4.2.3) */
static const char pv3_bam_base16[17] = "=ACMGRSVTWYHKDBN";

/* bam_to_sam_lines(data, ref_names) -> (list[bytes], consumed)

   Decode as many complete BAM alignment records as `data` holds into SAM
   text lines (newline-terminated, tags in stream order; float tags in the
   canonical float32 form).  Returns the byte count consumed so the caller
   can re-buffer a trailing partial record.  Mirrors io/sam's
   _decode_bam_record + format_sam_record semantics. */
PyObject *pv3_bam_to_sam_lines(PyObject *self, PyObject *args)
{
    Py_buffer data_b;
    PyObject *ref_names;
    if (!PyArg_ParseTuple(args, "y*O!", &data_b, &PyList_Type, &ref_names))
        return NULL;

    const uint8_t *data = data_b.buf;
    Py_ssize_t n = data_b.len;
    Py_ssize_t n_refs = PyList_GET_SIZE(ref_names);

    PyObject *lines = PyList_New(0);
    if (!lines) {
        PyBuffer_Release(&data_b);
        return NULL;
    }
    pv3_strbuf sb = {NULL, 0, 0};
    Py_ssize_t off = 0;

    /* borrowed name pointers (list keeps them alive) */
    const char **nm = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(char *));
    Py_ssize_t *nml = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(Py_ssize_t));
    if (!nm || !nml)
        goto oom;
    for (Py_ssize_t i = 0; i < n_refs; ++i) {
        nm[i] = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(ref_names, i),
                                        &nml[i]);
        if (!nm[i])
            goto fail;
    }

    while (off + 4 <= n) {
        uint32_t size;
        memcpy(&size, data + off, 4);
        if (off + 4 + (Py_ssize_t)size > n)
            break; /* partial record: caller re-buffers */
        const uint8_t *r = data + off + 4;
        if (size < 32) {
            PyErr_SetString(PyExc_ValueError, "truncated BAM record");
            goto fail;
        }
        int32_t ref_id, pos, next_ref, next_pos, tlen, l_seq;
        uint8_t l_read_name, mapq;
        uint16_t n_cigar, flag;
        memcpy(&ref_id, r, 4);
        memcpy(&pos, r + 4, 4);
        l_read_name = r[8];
        mapq = r[9];
        /* r[10..11] = bin (unused) */
        memcpy(&n_cigar, r + 12, 2);
        memcpy(&flag, r + 14, 2);
        memcpy(&l_seq, r + 16, 4);
        memcpy(&next_ref, r + 20, 4);
        memcpy(&next_pos, r + 24, 4);
        memcpy(&tlen, r + 28, 4);

        if (l_read_name == 0 || l_seq < 0) {
            PyErr_SetString(PyExc_ValueError, "corrupt BAM record header");
            goto fail;
        }
        size_t p = 32;
        size_t nb = ((size_t)l_seq + 1) / 2;
        size_t need = p + l_read_name + 4u * n_cigar + nb + (size_t)l_seq;
        if (need > size) {
            PyErr_SetString(PyExc_ValueError, "truncated BAM record body");
            goto fail;
        }
        if ((ref_id >= 0 && ref_id >= n_refs) ||
            (next_ref >= 0 && next_ref >= n_refs)) {
            PyErr_SetString(PyExc_ValueError,
                            "BAM reference id out of range");
            goto fail;
        }

        sb.len = 0;
        /* QNAME..MAPQ */
        if (pv3_sb_put(&sb, (const char *)r + p, l_read_name - 1) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, flag) < 0 || pv3_sb_putc(&sb, '\t') < 0)
            goto oom;
        p += l_read_name;
        if (ref_id < 0) {
            if (pv3_sb_putc(&sb, '*') < 0)
                goto oom;
        } else if (pv3_sb_put(&sb, nm[ref_id], nml[ref_id]) < 0)
            goto oom;
        if (pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, (long)pos + 1) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, mapq) < 0 || pv3_sb_putc(&sb, '\t') < 0)
            goto oom;
        /* CIGAR */
        if (n_cigar == 0) {
            if (pv3_sb_putc(&sb, '*') < 0)
                goto oom;
        } else {
            for (uint16_t c = 0; c < n_cigar; ++c) {
                uint32_t v;
                memcpy(&v, r + p + 4u * c, 4);
                if (pv3_sb_put_long(&sb, v >> 4) < 0 ||
                    pv3_sb_putc(&sb, pv3_op_char_table[v & 0xF]) < 0)
                    goto oom;
            }
        }
        p += 4u * n_cigar;
        /* RNEXT / PNEXT / TLEN */
        if (pv3_sb_putc(&sb, '\t') < 0)
            goto oom;
        if (next_ref < 0) {
            if (pv3_sb_putc(&sb, '*') < 0)
                goto oom;
        } else if (next_ref == ref_id) {
            if (pv3_sb_putc(&sb, '=') < 0)
                goto oom;
        } else if (pv3_sb_put(&sb, nm[next_ref], nml[next_ref]) < 0)
            goto oom;
        if (pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, (long)next_pos + 1) < 0 ||
            pv3_sb_putc(&sb, '\t') < 0 ||
            pv3_sb_put_long(&sb, tlen) < 0 || pv3_sb_putc(&sb, '\t') < 0)
            goto oom;
        /* SEQ / QUAL */
        if (l_seq == 0) {
            if (pv3_sb_put(&sb, "*\t*", 3) < 0)
                goto oom;
            p += 0;
        } else {
            if (pv3_sb_reserve(&sb, sb.len + (size_t)l_seq * 2 + 2) < 0)
                goto oom;
            char *w = sb.buf + sb.len;
            const uint8_t *sq = r + p;
            for (int32_t i = 0; i < l_seq; ++i) {
                uint8_t byte = sq[i >> 1];
                uint8_t code = (i & 1) ? (byte & 0xF) : (byte >> 4);
                w[i] = pv3_bam_base16[code];
            }
            sb.len += l_seq;
            p += nb;
            sb.buf[sb.len++] = '\t';
            const uint8_t *ql = r + p;
            w = sb.buf + sb.len;
            if (ql[0] == 0xFF) {
                w[0] = '*';
                sb.len += 1;
            } else {
                for (int32_t i = 0; i < l_seq; ++i)
                    w[i] = (char)(ql[i] + 33);
                sb.len += l_seq;
            }
            p += l_seq;
        }
        /* tags (stream order) */
        while (p + 3 <= size) {
            char t0 = r[p], t1 = r[p + 1], typ = r[p + 2];
            p += 3;
            if (pv3_sb_putc(&sb, '\t') < 0 || pv3_sb_putc(&sb, t0) < 0 ||
                pv3_sb_putc(&sb, t1) < 0 || pv3_sb_putc(&sb, ':') < 0)
                goto oom;
            long iv = 0;
            char fbuf[64];
            switch (typ) {
            case 'A':
                if (p + 1 > size)
                    goto trunc_tag;
                if (pv3_sb_put(&sb, "A:", 2) < 0 ||
                    pv3_sb_putc(&sb, r[p]) < 0)
                    goto oom;
                p += 1;
                break;
            case 'c': case 'C': case 's': case 'S': case 'i': case 'I': {
                int w = (typ == 'c' || typ == 'C') ? 1
                        : (typ == 's' || typ == 'S') ? 2 : 4;
                if (p + w > size)
                    goto trunc_tag;
                if (typ == 'c')
                    iv = (int8_t)r[p];
                else if (typ == 'C')
                    iv = r[p];
                else if (typ == 's') {
                    int16_t v;
                    memcpy(&v, r + p, 2);
                    iv = v;
                } else if (typ == 'S') {
                    uint16_t v;
                    memcpy(&v, r + p, 2);
                    iv = v;
                } else if (typ == 'i') {
                    int32_t v;
                    memcpy(&v, r + p, 4);
                    iv = v;
                } else {
                    uint32_t v;
                    memcpy(&v, r + p, 4);
                    iv = v;
                }
                p += w;
                if (pv3_sb_put(&sb, "i:", 2) < 0 ||
                    pv3_sb_put_long(&sb, iv) < 0)
                    goto oom;
                break;
            }
            case 'f': {
                float v;
                if (p + 4 > size)
                    goto trunc_tag;
                memcpy(&v, r + p, 4);
                p += 4;
                int fl = pv3_format_f32(v, fbuf);
                if (pv3_sb_put(&sb, "f:", 2) < 0 ||
                    pv3_sb_put(&sb, fbuf, fl) < 0)
                    goto oom;
                break;
            }
            case 'Z': case 'H': {
                const uint8_t *z = memchr(r + p, 0, size - p);
                if (!z)
                    goto trunc_tag;
                if (pv3_sb_putc(&sb, typ) < 0 ||
                    pv3_sb_putc(&sb, ':') < 0 ||
                    pv3_sb_put(&sb, (const char *)r + p,
                               z - (r + p)) < 0)
                    goto oom;
                p = (z - r) + 1;
                break;
            }
            case 'B': {
                if (p + 5 > size)
                    goto trunc_tag;
                char sub = r[p];
                uint32_t cnt;
                memcpy(&cnt, r + p + 1, 4);
                p += 5;
                int w = (sub == 'c' || sub == 'C') ? 1
                        : (sub == 's' || sub == 'S') ? 2 : 4;
                if (p + (size_t)w * cnt > size)
                    goto trunc_tag;
                if (pv3_sb_put(&sb, "B:", 2) < 0 ||
                    pv3_sb_putc(&sb, sub) < 0)
                    goto oom;
                for (uint32_t j = 0; j < cnt; ++j) {
                    if (pv3_sb_putc(&sb, ',') < 0)
                        goto oom;
                    if (sub == 'f') {
                        float v;
                        memcpy(&v, r + p, 4);
                        int fl = pv3_format_f32(v, fbuf);
                        if (pv3_sb_put(&sb, fbuf, fl) < 0)
                            goto oom;
                    } else {
                        if (sub == 'c')
                            iv = (int8_t)r[p];
                        else if (sub == 'C')
                            iv = r[p];
                        else if (sub == 's') {
                            int16_t v;
                            memcpy(&v, r + p, 2);
                            iv = v;
                        } else if (sub == 'S') {
                            uint16_t v;
                            memcpy(&v, r + p, 2);
                            iv = v;
                        } else if (sub == 'i') {
                            int32_t v;
                            memcpy(&v, r + p, 4);
                            iv = v;
                        } else if (sub == 'I') {
                            uint32_t v;
                            memcpy(&v, r + p, 4);
                            iv = v;
                        } else {
                            PyErr_Format(PyExc_ValueError,
                                         "unknown BAM B subtype '%c'", sub);
                            goto fail;
                        }
                        if (pv3_sb_put_long(&sb, iv) < 0)
                            goto oom;
                    }
                    p += w;
                }
                break;
            }
            default:
                PyErr_Format(PyExc_ValueError,
                             "unknown BAM tag type '%c'", typ);
                goto fail;
            }
        }
        if (pv3_sb_putc(&sb, '\n') < 0)
            goto oom;

        PyObject *line = PyBytes_FromStringAndSize(sb.buf, sb.len);
        if (!line)
            goto fail;
        int rc = PyList_Append(lines, line);
        Py_DECREF(line);
        if (rc < 0)
            goto fail;
        off += 4 + size;
        continue;
    trunc_tag:
        PyErr_SetString(PyExc_ValueError, "truncated BAM tag data");
        goto fail;
    }

    PyMem_Free(nm);
    PyMem_Free(nml);
    free(sb.buf);
    PyBuffer_Release(&data_b);
    return Py_BuildValue("(Nn)", lines, off);

oom:
    PyErr_NoMemory();
fail:
    PyMem_Free(nm);
    PyMem_Free(nml);
    free(sb.buf);
    Py_DECREF(lines);
    PyBuffer_Release(&data_b);
    return NULL;
}

/* base char -> BAM nibble code (dna16 encode table; unknown -> N=15) */
static uint8_t pv3_bam_code_table[256];

static void pv3_bam_code_init(void)
{
    if (pv3_bam_code_table['A'])
        return;
    memset(pv3_bam_code_table, 15, sizeof pv3_bam_code_table);
    for (int i = 0; i < 16; ++i) {
        pv3_bam_code_table[(uint8_t)pv3_bam_base16[i]] = i;
        pv3_bam_code_table[(uint8_t)tolower(pv3_bam_base16[i])] = i;
    }
    pv3_bam_code_table['='] = 0;
}

/* sam_text_to_bam(blob, ref_names) -> bytes

   Convert newline-separated SAM text record lines into concatenated BAM
   alignment records (no BGZF framing — the caller compresses).  Mirrors
   io/sam._encode_bam_record: smallest-width integer tags, '*' qual ->
   0xFF fill, bin field 0. */
PyObject *pv3_sam_text_to_bam(PyObject *self, PyObject *args)
{
    Py_buffer blob_b;
    PyObject *ref_names;
    if (!PyArg_ParseTuple(args, "y*O!", &blob_b, &PyList_Type, &ref_names))
        return NULL;
    pv3_bam_code_init();

    const char *blob = blob_b.buf;
    Py_ssize_t n = blob_b.len;
    Py_ssize_t n_refs = PyList_GET_SIZE(ref_names);

    pv3_strbuf out = {NULL, 0, 0};
    const char **nm = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(char *));
    Py_ssize_t *nml = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(Py_ssize_t));
    if (!nm || !nml)
        goto oom;
    for (Py_ssize_t i = 0; i < n_refs; ++i) {
        nm[i] = PyUnicode_AsUTF8AndSize(PyList_GET_ITEM(ref_names, i),
                                        &nml[i]);
        if (!nm[i])
            goto fail;
    }
    /* 2-entry ref-name memo (records cluster by reference) */
    const char *memo_nm[2] = {NULL, NULL};
    Py_ssize_t memo_len[2] = {0, 0};
    long memo_id[2] = {-1, -1};

    const char *p = blob;
    const char *bend = blob + n;
    while (p < bend) {
        const char *nl = memchr(p, '\n', bend - p);
        const char *lend = nl ? nl : bend;
        if (lend == p) {
            p = lend + 1;
            continue;
        }
        /* split 11 mandatory fields */
        const char *f[12];
        Py_ssize_t fl[12];
        int nf = 0;
        const char *q = p;
        while (nf < 11 && q <= lend) {
            const char *tab = memchr(q, '\t', lend - q);
            const char *fe = (tab && tab < lend) ? tab : lend;
            f[nf] = q;
            fl[nf] = fe - q;
            ++nf;
            q = fe + 1;
        }
        if (nf < 11) {
            PyErr_Format(PyExc_ValueError, "truncated SAM record: %.80s", p);
            goto fail;
        }
        const char *tagp = q <= lend ? q : lend; /* first tag byte or end */

        long flag, pos1, mapq, pnext1, tlen;
        if (fp_parse_long(f[1], f[1] + fl[1], &flag) != 0 ||
            fp_parse_long(f[3], f[3] + fl[3], &pos1) != 0 ||
            fp_parse_long(f[4], f[4] + fl[4], &mapq) != 0 ||
            fp_parse_long(f[7], f[7] + fl[7], &pnext1) != 0 ||
            fp_parse_long(f[8], f[8] + fl[8], &tlen) != 0) {
            PyErr_Format(PyExc_ValueError, "malformed SAM record: %.80s", p);
            goto fail;
        }
        /* ref ids */
        long ref_id = -1, next_ref = -1;
        for (int which = 0; which < 2; ++which) {
            const char *name = which ? f[6] : f[2];
            Py_ssize_t namelen = which ? fl[6] : fl[2];
            long *dst = which ? &next_ref : &ref_id;
            if (namelen == 1 && name[0] == '*') {
                *dst = -1;
                continue;
            }
            if (which && namelen == 1 && name[0] == '=') {
                *dst = ref_id;
                continue;
            }
            long got = -1;
            for (int m = 0; m < 2; ++m)
                if (memo_nm[m] && memo_len[m] == namelen &&
                    memcmp(memo_nm[m], name, namelen) == 0) {
                    got = memo_id[m];
                    break;
                }
            if (got < 0) {
                for (Py_ssize_t i = 0; i < n_refs; ++i)
                    if (nml[i] == namelen &&
                        memcmp(nm[i], name, namelen) == 0) {
                        got = i;
                        break;
                    }
                if (got < 0) {
                    PyErr_Format(PyExc_ValueError,
                                 "unknown reference '%.80s'", name);
                    goto fail;
                }
                memo_nm[which] = name;
                memo_len[which] = namelen;
                memo_id[which] = got;
            }
            *dst = got;
        }

        /* CIGAR: count ops, then emit */
        long n_cigar = 0;
        if (!(fl[5] == 1 && f[5][0] == '*')) {
            for (Py_ssize_t i = 0; i < fl[5]; ++i)
                if (!('0' <= f[5][i] && f[5][i] <= '9'))
                    ++n_cigar;
        }
        if (n_cigar > 0xFFFF) {
            PyErr_SetString(PyExc_ValueError, "CIGAR too long for BAM");
            goto fail;
        }
        long l_seq = (fl[9] == 1 && f[9][0] == '*') ? 0 : fl[9];
        long l_read_name = fl[0] + 1;
        if (l_read_name > 255) {
            PyErr_SetString(PyExc_ValueError, "QNAME too long for BAM");
            goto fail;
        }

        /* fixed header */
        size_t rec_start = out.len;
        if (pv3_sb_reserve(&out, out.len + 36 + l_read_name +
                                    4 * n_cigar + (l_seq + 1) / 2 + l_seq) < 0)
            goto oom;
        out.len += 4; /* block_size placeholder */
        {
            uint8_t hdr[32];
            int32_t v;
            v = (int32_t)ref_id;      memcpy(hdr, &v, 4);
            v = (int32_t)(pos1 - 1);  memcpy(hdr + 4, &v, 4);
            hdr[8] = (uint8_t)l_read_name;
            hdr[9] = (uint8_t)mapq;
            hdr[10] = 0; hdr[11] = 0; /* bin = 0 (io/sam parity) */
            uint16_t u16 = (uint16_t)n_cigar; memcpy(hdr + 12, &u16, 2);
            u16 = (uint16_t)flag;             memcpy(hdr + 14, &u16, 2);
            v = (int32_t)l_seq;       memcpy(hdr + 16, &v, 4);
            v = (int32_t)next_ref;    memcpy(hdr + 20, &v, 4);
            v = (int32_t)(pnext1 - 1);memcpy(hdr + 24, &v, 4);
            v = (int32_t)tlen;        memcpy(hdr + 28, &v, 4);
            memcpy(out.buf + out.len, hdr, 32);
            out.len += 32;
        }
        memcpy(out.buf + out.len, f[0], fl[0]);
        out.len += fl[0];
        out.buf[out.len++] = 0;
        /* CIGAR packed */
        if (n_cigar) {
            const char *c = f[5];
            const char *ce = f[5] + fl[5];
            while (c < ce) {
                long cnt = 0;
                while (c < ce && '0' <= *c && *c <= '9')
                    cnt = cnt * 10 + (*c++ - '0');
                if (c >= ce) {
                    PyErr_SetString(PyExc_ValueError, "malformed CIGAR");
                    goto fail;
                }
                int code = pv3_op_code_table[(uint8_t)*c];
                if (code == 0 && *c != 'M') {
                    PyErr_SetString(PyExc_ValueError, "malformed CIGAR op");
                    goto fail;
                }
                ++c;
                uint32_t v = ((uint32_t)cnt << 4) | (uint32_t)code;
                memcpy(out.buf + out.len, &v, 4);
                out.len += 4;
            }
        }
        /* SEQ nibbles + QUAL */
        if (l_seq) {
            uint8_t *w = (uint8_t *)out.buf + out.len;
            for (long i = 0; i < l_seq; ++i) {
                uint8_t code = pv3_bam_code_table[(uint8_t)f[9][i]];
                if (i & 1)
                    w[i >> 1] |= code;
                else
                    w[i >> 1] = (uint8_t)(code << 4);
            }
            out.len += (l_seq + 1) / 2;
            w = (uint8_t *)out.buf + out.len;
            if (fl[10] == 1 && f[10][0] == '*') {
                memset(w, 0xFF, l_seq);
            } else {
                if (fl[10] != l_seq) {
                    PyErr_SetString(PyExc_ValueError,
                                    "QUAL length mismatch");
                    goto fail;
                }
                for (long i = 0; i < l_seq; ++i)
                    w[i] = (uint8_t)(f[10][i] - 33);
            }
            out.len += l_seq;
        }
        /* tags */
        while (tagp < lend) {
            const char *tab = memchr(tagp, '\t', lend - tagp);
            const char *fe = tab ? tab : lend;
            if (fe - tagp < 5 || tagp[2] != ':' || tagp[4] != ':') {
                PyErr_Format(PyExc_ValueError, "malformed tag: %.40s", tagp);
                goto fail;
            }
            char typ = tagp[3];
            const char *v = tagp + 5;
            Py_ssize_t vlen = fe - v;
            if (pv3_sb_reserve(&out, out.len + 8 + (size_t)vlen * 4) < 0)
                goto oom;
            out.buf[out.len++] = tagp[0];
            out.buf[out.len++] = tagp[1];
            switch (typ) {
            case 'A':
                if (vlen != 1)
                    goto badtag;
                out.buf[out.len++] = 'A';
                out.buf[out.len++] = v[0];
                break;
            case 'i': {
                long iv;
                if (fp_parse_long(v, v + vlen, &iv) != 0)
                    goto badtag;
                /* smallest width, unsigned preferred (io/sam parity) */
                if (0 <= iv && iv <= 0xFF) {
                    out.buf[out.len++] = 'C';
                    out.buf[out.len++] = (char)(uint8_t)iv;
                } else if (-0x80 <= iv && iv < 0x80) {
                    out.buf[out.len++] = 'c';
                    out.buf[out.len++] = (char)(int8_t)iv;
                } else if (0 <= iv && iv <= 0xFFFF) {
                    uint16_t u = (uint16_t)iv;
                    out.buf[out.len++] = 'S';
                    memcpy(out.buf + out.len, &u, 2);
                    out.len += 2;
                } else if (-0x8000 <= iv && iv < 0x8000) {
                    int16_t u = (int16_t)iv;
                    out.buf[out.len++] = 's';
                    memcpy(out.buf + out.len, &u, 2);
                    out.len += 2;
                } else if (iv < 0) {
                    int32_t u = (int32_t)iv;
                    out.buf[out.len++] = 'i';
                    memcpy(out.buf + out.len, &u, 4);
                    out.len += 4;
                } else {
                    uint32_t u = (uint32_t)iv;
                    out.buf[out.len++] = 'I';
                    memcpy(out.buf + out.len, &u, 4);
                    out.len += 4;
                }
                break;
            }
            case 'f': {
                char tmp[64];
                if (vlen == 0 || vlen >= (Py_ssize_t)sizeof tmp)
                    goto badtag;
                memcpy(tmp, v, vlen);
                tmp[vlen] = 0;
                char *stop;
                errno = 0;
                double dv = strtod(tmp, &stop);
                if (stop != tmp + vlen || errno != 0)
                    goto badtag;
                float fv = (float)dv;
                out.buf[out.len++] = 'f';
                memcpy(out.buf + out.len, &fv, 4);
                out.len += 4;
                break;
            }
            case 'Z': case 'H':
                out.buf[out.len++] = typ;
                memcpy(out.buf + out.len, v, vlen);
                out.len += vlen;
                out.buf[out.len++] = 0;
                break;
            case 'B': {
                if (vlen < 1)
                    goto badtag;
                char sub = v[0];
                int w = (sub == 'c' || sub == 'C') ? 1
                        : (sub == 's' || sub == 'S') ? 2
                        : (sub == 'i' || sub == 'I' || sub == 'f') ? 4 : 0;
                if (!w)
                    goto badtag;
                out.buf[out.len++] = 'B';
                out.buf[out.len++] = sub;
                size_t cnt_at = out.len;
                out.len += 4;
                uint32_t cnt = 0;
                const char *iv_p = v + 1;
                const char *iv_end = v + vlen;
                while (iv_p < iv_end) {
                    if (*iv_p != ',')
                        goto badtag;
                    ++iv_p;
                    const char *comma = memchr(iv_p, ',', iv_end - iv_p);
                    const char *ie = comma ? comma : iv_end;
                    if (sub == 'f') {
                        char tmp[64];
                        Py_ssize_t l = ie - iv_p;
                        if (l == 0 || l >= (Py_ssize_t)sizeof tmp)
                            goto badtag;
                        memcpy(tmp, iv_p, l);
                        tmp[l] = 0;
                        char *stop;
                        errno = 0;
                        double dv = strtod(tmp, &stop);
                        if (stop != tmp + l || errno != 0)
                            goto badtag;
                        float fv = (float)dv;
                        memcpy(out.buf + out.len, &fv, 4);
                        out.len += 4;
                    } else {
                        long iv;
                        if (fp_parse_long(iv_p, ie, &iv) != 0)
                            goto badtag;
                        if (w == 1)
                            out.buf[out.len] = (char)(uint8_t)iv;
                        else if (w == 2) {
                            uint16_t u = (uint16_t)iv;
                            memcpy(out.buf + out.len, &u, 2);
                        } else {
                            uint32_t u = (uint32_t)iv;
                            memcpy(out.buf + out.len, &u, 4);
                        }
                        out.len += w;
                    }
                    ++cnt;
                    iv_p = ie;
                }
                memcpy(out.buf + cnt_at, &cnt, 4);
                break;
            }
            default:
                goto badtag;
            }
            tagp = tab ? tab + 1 : lend;
            continue;
        badtag:
            PyErr_Format(PyExc_ValueError, "malformed tag value: %.40s",
                         tagp);
            goto fail;
        }

        /* back-patch block size */
        {
            uint32_t size = (uint32_t)(out.len - rec_start - 4);
            memcpy(out.buf + rec_start, &size, 4);
        }
        p = lend + 1;
    }

    {
        PyObject *res = PyBytes_FromStringAndSize(out.buf, out.len);
        PyMem_Free(nm);
        PyMem_Free(nml);
        free(out.buf);
        PyBuffer_Release(&blob_b);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    PyMem_Free(nm);
    PyMem_Free(nml);
    free(out.buf);
    PyBuffer_Release(&blob_b);
    return NULL;
}

/* ====================================================================== */
/* recalculate_mapq group engine                                          */
/*                                                                        */
/* mapq_score_groups(lines, refmap, ref_names, rescore, tag_names,        */
/*                   min_mm, max_mm, n_pen, gap_open, gap_ext)            */
/*   -> (blob, (total, unpaired, both_types, mate_not_found,              */
/*       no_valid_pos), warnings) | None                                  */
/*                                                                        */
/* C implementation of MapqScorer.process_alignment_group over a chunk of */
/* QNAME-grouped raw SAM lines (pipeline/recalculate_mapq.py:358-510,     */
/* mirroring the reference's mapq_scorer, recalculate-mapq/               */
/* main.cc:960-1179).  The chunk must be cut at QNAME boundaries.         */
/* Unmapped records (flag & 4) are skipped before grouping.  Emission is  */
/* the canonical format_sam_record form (sorted tags, canonical integer/  */
/* float values), byte-identical to the object path.  Returns None when a */
/* construct the C path cannot reproduce bit-identically is seen (non-'i' */
/* position tags, non-i/f AS, float XN arrays); the caller then reruns    */
/* the chunk through the Python object path.                              */

#define MQ_INVALID 4294967295LL
#define MQ_SCORE_MIN (-DBL_MAX)

typedef struct {
    int64_t a, b, c, d; /* ((r1,p1),(r2,p2)) normalised pair */
} mq_pos4;

static int mq_pos2_cmp(int64_t r1, int64_t p1, int64_t r2, int64_t p2)
{
    if (r1 != r2)
        return r1 < r2 ? -1 : 1;
    if (p1 != p2)
        return p1 < p2 ? -1 : 1;
    return 0;
}

static int mq_pos4_cmp(const mq_pos4 *x, const mq_pos4 *y)
{
    int c = mq_pos2_cmp(x->a, x->b, y->a, y->b);
    if (c)
        return c;
    return mq_pos2_cmp(x->c, x->d, y->c, y->d);
}

/* Bowtie2-v2 lookup tables (recalculate-mapq/main.cc:376-425) */
static const double mq_nu_first[30] = {
    0.0, 0.0, 0.1, 0.1, 0.1, 0.1, 0.2, 0.2, 0.2, 0.2,
    0.3, 0.3, 0.3, 0.3, 0.4, 0.4, 0.4, 0.4, 0.5, 0.5,
    0.5, 0.5, 0.6, 0.6, 0.7, 0.7, 0.8, 0.8, 0.9, 0.9,
};
static const double mq_nu_second[30] = {
    0.0, 0.67, 0.0, 0.67, 0.88, 1.0, 0.0, 0.67, 0.88, 1.0,
    0.0, 0.67, 0.88, 1.0, 0.0, 0.68, 0.84, 1.0, 0.0, 0.68,
    0.84, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0,
};
static const int mq_nu_mapq[30] = {
    2, 6, 0, 7, 12, 30, 0, 11, 17, 31,
    3, 15, 18, 32, 4, 14, 21, 34, 5, 16,
    25, 35, 22, 36, 26, 37, 27, 38, 33, 39,
};

static double mq_read_min_score(long read_length)
{
    if (!read_length)
        return 0.0;
    return -0.6 + (-0.6 * (double)read_length);
}

/* calculate_mapq (recalculate_mapq.py:99-128; the reference's clamp makes
   the unique-alignment table unreachable and we reproduce that) */
static long mq_calculate_mapq(long read_length, long other_read_length,
                              double score, double next_score_)
{
    double min_score =
        mq_read_min_score(read_length) + mq_read_min_score(other_read_length);
    double score_range = 0.0 - min_score;
    if (score_range < 1.0)
        score_range = 1.0;
    if (score < min_score)
        return 0;
    double next_score = (min_score < next_score_) ? next_score_ : min_score;
    double normalised = score - min_score;
    double nsq = normalised / score_range;
    double diff = score - next_score;
    double dnq = diff / score_range;
    if (diff != 0.0) {
        /* bisect_right(first, dnq) */
        int i = 0;
        while (i < 30 && mq_nu_first[i] <= dnq)
            ++i;
        double threshold = mq_nu_first[i - 1];
        /* bisect_right(pairs, (threshold, nsq), hi=i) */
        int j = 0;
        while (j < i && (mq_nu_first[j] < threshold ||
                         (mq_nu_first[j] == threshold &&
                          mq_nu_second[j] <= nsq)))
            ++j;
        return mq_nu_mapq[j - 1];
    }
    return nsq >= 0.67 ? 1 : 0;
}

typedef struct {
    const char *qname;
    Py_ssize_t qname_len;
    long flag, ref_id, pos, mapq, mate_ref, mate_pos, tlen;
    const char *seq;
    Py_ssize_t seq_len;
    const char *qual;
    Py_ssize_t qual_len;
    size_t ops_off;
    int32_t n_ops;
    size_t tag_off;
    int n_tags;
    /* group working data */
    double score, pairwise;
    long mate_length, new_score;
    int has_as;
    tagitem as_old;
} mq_rec;

typedef struct {
    int64_t r, p;
    double score;
    long len;
    int idx; /* stability tiebreak (Python sort is stable) */
} mq_seg;

static int mq_seg_cmp(const void *a_, const void *b_)
{
    const mq_seg *a = a_, *b = b_;
    int c = mq_pos2_cmp(a->r, a->p, b->r, b->p);
    if (c)
        return c;
    if (a->score != b->score)
        return a->score < b->score ? -1 : 1;
    return a->idx - b->idx;
}

typedef struct {
    mq_pos4 positions;
    long seq_key; /* -1 = paired (dict key None); else record idx */
    const char *seq;
    Py_ssize_t seq_len;
    double score, other_score, total, maxv;
    int has_mate;
    int list_idx; /* stability tiebreak for the sort by total */
} mq_pss;

static int mq_pss_total_cmp(const void *a_, const void *b_)
{
    const mq_pss *a = a_, *b = b_;
    if (a->total != b->total)
        return a->total < b->total ? -1 : 1;
    return a->list_idx - b->list_idx;
}

/* score an =/X CIGAR (CigarScorer._calculate_scalar,
   recalculate_mapq.py:244-300; recalculate-mapq/main.cc:183-321) */
static long mq_score_cigar(const mq_rec *r, const int8_t *ops,
                           const int32_t *counts, const unsigned char *refn,
                           Py_ssize_t refn_len, const int *mm_pen, long n_pen,
                           long gap_open, long gap_ext, fp_err *err)
{
    long score = 0;
    long qpos = 0, rpos = 0;
    int prev_gap = 0; /* prev_op in (I, D) */
    const unsigned char *q = (const unsigned char *)r->seq;
    const unsigned char *qu = (const unsigned char *)r->qual;
    int has_qual = !(r->qual_len == 1 && qu[0] == '*');
    for (int32_t k = 0; k < r->n_ops; ++k) {
        int8_t op = ops[k];
        long count = counts[k];
        switch (op) {
        case OP_H:
        case OP_P:
            break;
        case OP_N:
            rpos += count; /* does not reset the gap run (parity) */
            break;
        case OP_I:
        case OP_D:
            if (!prev_gap)
                score -= gap_open;
            score -= count * gap_ext;
            if (op == OP_I)
                qpos += count;
            else
                rpos += count;
            prev_gap = 1;
            break;
        case OP_S:
            qpos += count;
            prev_gap = 0;
            break;
        case OP_EQ:
            if (qpos + count > r->seq_len) {
                err->kind = 1;
                snprintf(err->msg, sizeof err->msg,
                         "CIGAR overruns the sequence");
                return 0;
            }
            for (long i = 0; i < count; ++i) {
                unsigned char c = q[qpos + i];
                if (c == 'N' || c == 'n')
                    score -= n_pen;
            }
            qpos += count;
            rpos += count;
            prev_gap = 0;
            break;
        case OP_X:
            if (qpos + count > r->seq_len) {
                err->kind = 1;
                snprintf(err->msg, sizeof err->msg,
                         "CIGAR overruns the sequence");
                return 0;
            }
            for (long i = 0; i < count; ++i) {
                long qp = qpos + i, rp = rpos + i;
                if (has_qual && qp >= r->qual_len) {
                    err->kind = 1;
                    snprintf(err->msg, sizeof err->msg,
                             "CIGAR overruns the sequence");
                    return 0;
                }
                long qual = has_qual ? (long)qu[qp] - 33 : 0;
                /* clamp like score_cigar (panvc3_native.c): quality chars
                   below '!' floor at 0 rather than wrapping mod 256 */
                if (qual < 0)
                    qual = 0;
                else if (qual > 255)
                    qual = 255;
                int ref_is_n = 0;
                if (refn_len) {
                    if (rp / 8 >= refn_len) {
                        err->kind = 1;
                        snprintf(err->msg, sizeof err->msg,
                                 "XN bitmask shorter than the alignment");
                        return 0;
                    }
                    ref_is_n = (refn[rp / 8] >> (rp % 8)) & 1;
                }
                unsigned char c = q[qp];
                if (c == 'N' || c == 'n' || ref_is_n)
                    score -= n_pen;
                else
                    score -= mm_pen[qual];
            }
            qpos += count;
            rpos += count;
            prev_gap = 0;
            break;
        default:
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg,
                     "unexpected CIGAR operation '%c' (rescoring requires "
                     "=/X CIGARs)",
                     pv3_op_char_table[op]);
            return 0;
        }
    }
    return score;
}

/* find a 2-char tag; returns index or -1 */
static int mq_find_tag(const tagitem *tags, int n, const char *key)
{
    for (int i = 0; i < n; ++i)
        if (tags[i].klen == 2 && tags[i].key[0] == key[0] &&
            tags[i].key[1] == key[1])
            return i;
    return -1;
}

/* _tag_position: 0 ok (out filled), 1 missing -> INVALID, -1 error,
   -2 unsupported tag type */
static int mq_tag_position(const tagitem *tags, int n, const char *ref_tag,
                           const char *pos_tag, int64_t *out_r,
                           int64_t *out_p, fp_err *err)
{
    int ri = mq_find_tag(tags, n, ref_tag);
    int pi = mq_find_tag(tags, n, pos_tag);
    if (ri < 0 || pi < 0)
        return 1;
    if (tags[ri].typ != 'i' || tags[pi].typ != 'i')
        return -2;
    long r, p;
    if (fp_parse_long(tags[ri].val, tags[ri].val + tags[ri].vlen, &r) != 0 ||
        fp_parse_long(tags[pi].val, tags[pi].val + tags[pi].vlen, &p) != 0) {
        err->kind = 1;
        snprintf(err->msg, sizeof err->msg, "malformed integer tag value");
        return -1;
    }
    if (r < 0 || p < 0) {
        err->kind = 1;
        snprintf(err->msg, sizeof err->msg,
                 "tag value out of bounds (%s/%s)", ref_tag, pos_tag);
        return -1;
    }
    *out_r = r;
    *out_p = p;
    return 0;
}

/* emit one canonical tag (the splice emission switch) */
static int mq_emit_tag(pv3_strbuf *sb, const tagitem *it, long as_new,
                       fp_err *err)
{
    if (pv3_sb_putc(sb, '\t') < 0 || pv3_sb_put(sb, it->key, it->klen) < 0 ||
        pv3_sb_putc(sb, ':') < 0)
        return -1;
    if (it->synth == 10) { /* AS:i:<new score> */
        if (pv3_sb_put(sb, "i:", 2) < 0 || pv3_sb_put_long(sb, as_new) < 0)
            return -1;
        return 0;
    }
    if (it->synth == 11) { /* YS:f:<new score as float> */
        char buf[64];
        int n = pv3_format_f32((double)as_new, buf);
        if (pv3_sb_put(sb, "f:", 2) < 0 || pv3_sb_put(sb, buf, n) < 0)
            return -1;
        return 0;
    }
    if (it->synth == 12) { /* B:C from a raw byte buffer in val/vlen */
        if (pv3_sb_put(sb, "B:C", 3) < 0)
            return -1;
        for (int i = 0; i < it->vlen; ++i)
            if (pv3_sb_putc(sb, ',') < 0 ||
                pv3_sb_put_long(sb,
                                (long)(unsigned char)it->val[i]) < 0)
                return -1;
        return 0;
    }
    if (pv3_sb_putc(sb, it->typ) < 0 || pv3_sb_putc(sb, ':') < 0)
        return -1;
    const char *v = it->val, *vend = it->val + it->vlen;
    switch (it->typ) {
    case 'i':
        return sb_put_canon_int(sb, v, vend, err);
    case 'f':
        return sb_put_canon_float(sb, v, vend, err);
    case 'A':
    case 'Z':
    case 'H':
        return pv3_sb_put(sb, v, it->vlen);
    case 'B': {
        if (v >= vend) {
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg, "empty B tag value");
            return -1;
        }
        char sub = *v++;
        int is_f = (sub == 'f' || sub == 'F');
        if (pv3_sb_putc(sb, sub) < 0)
            return -1;
        while (v < vend) {
            const char *comma = memchr(v, ',', vend - v);
            const char *iend = comma ? comma : vend;
            if (iend > v) {
                if (pv3_sb_putc(sb, ',') < 0)
                    return -1;
                if (is_f) {
                    if (sb_put_canon_float(sb, v, iend, err) < 0)
                        return -1;
                } else if (sb_put_canon_int(sb, v, iend, err) < 0)
                    return -1;
            }
            v = comma ? comma + 1 : vend;
        }
        return 0;
    }
    default:
        err->kind = 1;
        snprintf(err->msg, sizeof err->msg, "unknown tag type '%c'",
                 it->typ);
        return -1;
    }
}

typedef struct {
    int kind; /* 0 = both paired+unpaired, 1 = no valid position */
    const char *qname;
    Py_ssize_t qname_len;
} mq_warn;

PyObject *pv3_mapq_score_groups(PyObject *self, PyObject *args)
{
    PyObject *lines, *refmap, *ref_names, *tag_names;
    int rescore;
    long min_mm, max_mm, n_pen, gap_open, gap_ext;
    if (!PyArg_ParseTuple(args, "O!O!O!iO!lllll",
                          &PyList_Type, &lines, &PyDict_Type, &refmap,
                          &PyList_Type, &ref_names, &rescore,
                          &PyTuple_Type, &tag_names,
                          &min_mm, &max_mm, &n_pen, &gap_open, &gap_ext))
        return NULL;

    if (PyTuple_GET_SIZE(tag_names) != 7) {
        PyErr_SetString(PyExc_ValueError, "tag_names must have 7 entries");
        return NULL;
    }
    /* xn, xr, xp, yr, yp, xs, ys */
    const char *tn[7];
    for (int i = 0; i < 7; ++i) {
        PyObject *o = PyTuple_GET_ITEM(tag_names, i);
        if (!PyBytes_Check(o) || PyBytes_GET_SIZE(o) != 2) {
            PyErr_SetString(PyExc_ValueError,
                            "tag names must be 2-byte bytes");
            return NULL;
        }
        tn[i] = PyBytes_AS_STRING(o);
    }

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    Py_ssize_t n_refs_out = PyList_GET_SIZE(ref_names);

    /* borrowed name/line pointers */
    const char **line_ptr = NULL;
    Py_ssize_t *line_len_a = NULL;
    const char **out_nm = NULL;
    int *out_nml = NULL;
    refent *ents = NULL;
    int32_t *hslot = NULL;
    size_t hcap = 8;
    mq_rec *recs = NULL;
    size_t recs_cap = 0, n_rec = 0;
    int8_t *all_ops = NULL;
    int32_t *all_counts = NULL;
    size_t ops_cap = 0, ops_n = 0;
    tagitem *all_tags = NULL;
    size_t tags_cap = 0, tags_n = 0;
    mq_seg *segs = NULL;
    size_t segs_cap = 0;
    mq_pss *pss = NULL, *pss_sorted = NULL;
    double *totals = NULL;
    size_t pss_cap = 0;
    mq_warn *warns = NULL;
    size_t warns_cap = 0, warns_n = 0;
    int *mm_pen = NULL;
    pv3_strbuf out = {NULL, 0, 0};
    PyThreadState *ts = NULL;
    fp_err err = {0, {0}};
    int unsupported = 0;
    long st_total = 0, st_unpaired = 0, st_both = 0, st_mate_nf = 0,
         st_no_valid = 0;

    line_ptr = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    line_len_a = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    out_nm = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(char *));
    out_nml = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(int));
    mm_pen = PyMem_Malloc(256 * sizeof(int));
    if (!line_ptr || !line_len_a || !out_nm || !out_nml || !mm_pen)
        goto oom;
    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        char *lp;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, li), &lp,
                                    &line_len_a[li]) < 0)
            goto fail;
        line_ptr[li] = lp;
    }
    for (Py_ssize_t i = 0; i < n_refs_out; ++i) {
        PyObject *o = PyList_GET_ITEM(ref_names, i);
        if (PyUnicode_Check(o)) {
            Py_ssize_t n;
            const char *p = PyUnicode_AsUTF8AndSize(o, &n);
            if (!p)
                goto fail;
            out_nm[i] = p;
            out_nml[i] = (int)n;
        } else if (PyBytes_Check(o)) {
            out_nm[i] = PyBytes_AS_STRING(o);
            out_nml[i] = (int)PyBytes_GET_SIZE(o);
        } else {
            PyErr_SetString(PyExc_TypeError, "ref_names must be str/bytes");
            goto fail;
        }
    }
    /* refmap hash (keys are bytes) */
    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        while (hcap < (size_t)n_refs * 2)
            hcap <<= 1;
        ents = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(refent));
        hslot = PyMem_Malloc(hcap * sizeof(int32_t));
        if (!ents || !hslot)
            goto oom;
        for (size_t i = 0; i < hcap; ++i)
            hslot[i] = -1;
        PyObject *k, *v;
        Py_ssize_t ppos = 0, ei = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            char *kp;
            Py_ssize_t kl;
            if (PyBytes_AsStringAndSize(k, &kp, &kl) < 0)
                goto fail;
            long idv = PyLong_AsLong(v);
            if (idv == -1 && PyErr_Occurred())
                goto fail;
            uint64_t h = fnv1a(kp, kl) & (hcap - 1);
            while (hslot[h] >= 0)
                h = (h + 1) & (hcap - 1);
            ents[ei].name = kp;
            ents[ei].len = kl;
            ents[ei].id = idv;
            hslot[h] = (int32_t)ei;
            ++ei;
        }
    }
    /* quality-scaled mismatch penalties (fill_penalties, main.cc:184-188) */
    for (int i = 0; i < 256; ++i) {
        int q = i < 40 ? i : 40;
        mm_pen[i] =
            (int)((double)q / 40.0 * (double)(max_mm - min_mm) + (double)min_mm);
    }

    ts = PyEval_SaveThread();

    /* ---- pass 1: parse every kept (mapped) record ---- */
    for (Py_ssize_t li = 0; li < n_lines && !err.kind && !unsupported; ++li) {
        const char *line = line_ptr[li];
        Py_ssize_t line_len = line_len_a[li];
        while (line_len > 0 &&
               (line[line_len - 1] == '\n' || line[line_len - 1] == '\r'))
            --line_len;
        {
            Py_ssize_t w = 0;
            while (w < line_len &&
                   (line[w] == ' ' || line[w] == '\t' || line[w] == '\v' ||
                    line[w] == '\f'))
                ++w;
            if (w == line_len)
                continue;
        }
        const char *fields[12];
        Py_ssize_t flens[12];
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
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "truncated SAM record: %.100s",
                     line);
            break;
        }
        long flag, pos, mapq, pnext, tlen;
        if (fp_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0 ||
            fp_parse_long(fields[4], fields[4] + flens[4], &mapq) != 0 ||
            fp_parse_long(fields[7], fields[7] + flens[7], &pnext) != 0 ||
            fp_parse_long(fields[8], fields[8] + flens[8], &tlen) != 0) {
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "malformed SAM record: %.100s",
                     line);
            break;
        }
        if (flag & 0x4)
            continue; /* unmapped records skipped before grouping */
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            ref_id = ref_lookup(ents, hslot, hcap, fields[2], flens[2]);
            if (ref_id == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown reference '%.100s'", fields[2]);
                break;
            }
        }
        long mate_ref = -1;
        if (flens[6] == 1 && fields[6][0] == '*') {
            mate_ref = -1;
        } else if (flens[6] == 1 && fields[6][0] == '=') {
            mate_ref = ref_id;
        } else {
            mate_ref = ref_lookup(ents, hslot, hcap, fields[6], flens[6]);
            if (mate_ref == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown mate reference '%.100s'", fields[6]);
                break;
            }
        }
        /* CIGAR */
        size_t ops_off = ops_n;
        int32_t rec_ops = 0;
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
                    if (c == d0 || c == cend || (code == 0 && oc != 'M')) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "invalid CIGAR: '%.50s'", fields[5]);
                        goto parse_done;
                    }
                    ++c;
                    if (ops_n + 1 > ops_cap) {
                        size_t ncap = ops_cap ? ops_cap * 2 : 1024;
                        int8_t *no_ = realloc(all_ops, ncap);
                        int32_t *nc =
                            realloc(all_counts, ncap * sizeof(int32_t));
                        if (no_)
                            all_ops = no_;
                        if (nc)
                            all_counts = nc;
                        if (!no_ || !nc) {
                            err.kind = 2;
                            goto parse_done;
                        }
                        ops_cap = ncap;
                    }
                    all_ops[ops_n] = code;
                    all_counts[ops_n] = (int32_t)count;
                    ++ops_n;
                    ++rec_ops;
                }
            }
        }
        /* tags (dict semantics: later duplicate key wins, first slot) */
        {
            size_t tag_off = tags_n;
            int rec_tags = 0;
            const char *tp = p;
            while (tp < end) {
                const char *tab = memchr(tp, '\t', end - tp);
                const char *fend = tab ? tab : end;
                const char *c1 = memchr(tp, ':', fend - tp);
                if (!c1 || c1 + 2 > fend || c1[2] != ':') {
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "malformed tag field: %.50s", tp);
                    goto parse_done;
                }
                tagitem it;
                it.key = tp;
                it.klen = (int)(c1 - tp);
                it.typ = c1[1];
                it.val = c1 + 3;
                it.vlen = (int)(fend - (c1 + 3));
                it.synth = 0;
                int replaced = 0;
                for (int q2 = 0; q2 < rec_tags; ++q2) {
                    tagitem *ex = &all_tags[tag_off + q2];
                    if (ex->klen == it.klen &&
                        memcmp(ex->key, it.key, it.klen) == 0) {
                        *ex = it;
                        replaced = 1;
                        break;
                    }
                }
                if (!replaced) {
                    if (tags_n + 1 > tags_cap) {
                        size_t ncap = tags_cap ? tags_cap * 2 : 1024;
                        tagitem *nt = realloc(all_tags, ncap * sizeof(tagitem));
                        if (!nt) {
                            err.kind = 2;
                            goto parse_done;
                        }
                        all_tags = nt;
                        tags_cap = ncap;
                    }
                    all_tags[tags_n++] = it;
                    ++rec_tags;
                }
                tp = tab ? tab + 1 : end;
            }
            if (n_rec + 1 > recs_cap) {
                size_t ncap = recs_cap ? recs_cap * 2 : 1024;
                mq_rec *nr = realloc(recs, ncap * sizeof(mq_rec));
                if (!nr) {
                    err.kind = 2;
                    goto parse_done;
                }
                recs = nr;
                recs_cap = ncap;
            }
            mq_rec *r = &recs[n_rec++];
            memset(r, 0, sizeof *r);
            r->qname = fields[0];
            r->qname_len = flens[0];
            r->flag = flag;
            r->ref_id = ref_id;
            r->pos = pos - 1;
            r->mapq = mapq;
            r->mate_ref = mate_ref;
            r->mate_pos = pnext - 1;
            r->tlen = tlen;
            r->seq = fields[9];
            r->seq_len = flens[9];
            r->qual = fields[10];
            r->qual_len = flens[10];
            r->ops_off = ops_off;
            r->n_ops = rec_ops;
            r->tag_off = tag_off;
            r->n_tags = rec_tags;
        }
    }
parse_done:

    /* ---- pass 2: process groups ---- */
    if (!err.kind && !unsupported) {
        size_t g0 = 0;
        while (g0 < n_rec && !err.kind && !unsupported) {
            size_t g1 = g0 + 1;
            while (g1 < n_rec &&
                   recs[g1].qname_len == recs[g0].qname_len &&
                   memcmp(recs[g1].qname, recs[g0].qname,
                          recs[g0].qname_len) == 0)
                ++g1;
            size_t gn = g1 - g0;
            st_total += (long)gn;

            /* grow working arrays */
            if (gn + 1 > segs_cap) {
                size_t ncap = segs_cap ? segs_cap : 64;
                while (ncap < gn + 1)
                    ncap *= 2;
                mq_seg *ns = realloc(segs, ncap * sizeof(mq_seg));
                if (!ns) {
                    err.kind = 2;
                    break;
                }
                segs = ns;
                segs_cap = ncap;
            }
            if (gn > pss_cap) {
                size_t ncap = pss_cap ? pss_cap : 64;
                while (ncap < gn)
                    ncap *= 2;
                mq_pss *np = realloc(pss, ncap * sizeof(mq_pss));
                mq_pss *np2 = realloc(pss_sorted, ncap * sizeof(mq_pss));
                double *nt = realloc(totals, ncap * sizeof(double));
                if (np)
                    pss = np;
                if (np2)
                    pss_sorted = np2;
                if (nt)
                    totals = nt;
                if (!np || !np2 || !nt) {
                    err.kind = 2;
                    break;
                }
                pss_cap = ncap;
            }

            int seen_types = 0;
            for (size_t i = 0; i < gn && !err.kind && !unsupported; ++i) {
                mq_rec *r = &recs[g0 + i];
                int has_mate = r->mate_ref >= 0 && r->mate_pos >= 0;
                seen_types |= 1 << (has_mate ? 1 : 0);
                if (!has_mate)
                    ++st_unpaired;
                /* score */
                const tagitem *tags = all_tags + r->tag_off;
                int as_i = mq_find_tag(tags, r->n_tags, "AS");
                if (rescore) {
                    /* XN bitmask */
                    const unsigned char *refn = NULL;
                    Py_ssize_t refn_len = 0;
                    unsigned char *refn_buf = NULL;
                    int xn_i = mq_find_tag(tags, r->n_tags, tn[0]);
                    if (xn_i >= 0 && tags[xn_i].typ == 'B') {
                        const char *v = tags[xn_i].val;
                        const char *vend = v + tags[xn_i].vlen;
                        if (v < vend) {
                            char sub = *v++;
                            if (sub == 'f' || sub == 'F') {
                                unsupported = 1;
                                break;
                            }
                            /* decode items & 0xFF into a temp buffer */
                            size_t cap = 16, nn = 0;
                            refn_buf = malloc(cap);
                            if (!refn_buf) {
                                err.kind = 2;
                                break;
                            }
                            while (v < vend) {
                                const char *comma =
                                    memchr(v, ',', vend - v);
                                const char *iend = comma ? comma : vend;
                                if (iend > v) {
                                    long x;
                                    if (fp_parse_long(v, iend, &x) != 0) {
                                        err.kind = 1;
                                        snprintf(err.msg, sizeof err.msg,
                                                 "malformed B tag value");
                                        break;
                                    }
                                    if (nn + 1 > cap) {
                                        cap *= 2;
                                        unsigned char *nb =
                                            realloc(refn_buf, cap);
                                        if (!nb) {
                                            err.kind = 2;
                                            break;
                                        }
                                        refn_buf = nb;
                                    }
                                    refn_buf[nn++] =
                                        (unsigned char)(x & 0xFF);
                                }
                                v = comma ? comma + 1 : vend;
                            }
                            refn = refn_buf;
                            refn_len = (Py_ssize_t)nn;
                        }
                    }
                    if (err.kind) {
                        free(refn_buf);
                        break;
                    }
                    long ns = mq_score_cigar(
                        r, all_ops + r->ops_off, all_counts + r->ops_off,
                        refn, refn_len, mm_pen, n_pen, gap_open, gap_ext,
                        &err);
                    free(refn_buf);
                    if (err.kind)
                        break;
                    r->new_score = ns;
                    r->has_as = as_i >= 0;
                    if (as_i >= 0)
                        r->as_old = tags[as_i];
                    r->score = (double)ns;
                } else {
                    if (as_i < 0) {
                        r->score = MQ_SCORE_MIN;
                    } else if (tags[as_i].typ == 'i') {
                        long v;
                        if (fp_parse_long(tags[as_i].val,
                                          tags[as_i].val + tags[as_i].vlen,
                                          &v) != 0) {
                            err.kind = 1;
                            snprintf(err.msg, sizeof err.msg,
                                     "malformed integer tag value");
                            break;
                        }
                        r->score = (double)v;
                    } else if (tags[as_i].typ == 'f') {
                        char tmp[64];
                        int vl = tags[as_i].vlen < 63 ? tags[as_i].vlen : 63;
                        memcpy(tmp, tags[as_i].val, vl);
                        tmp[vl] = 0;
                        char *stop;
                        double dv = strtod(tmp, &stop);
                        if (stop != tmp + vl) {
                            err.kind = 1;
                            snprintf(err.msg, sizeof err.msg,
                                     "malformed float tag value");
                            break;
                        }
                        r->score = dv;
                    } else {
                        unsupported = 1;
                        break;
                    }
                }
                /* segment description keyed by ORIGINAL position */
                int64_t orr = MQ_INVALID, orp = MQ_INVALID;
                int rc = mq_tag_position(tags, r->n_tags, tn[1], tn[2],
                                         &orr, &orp, &err);
                if (rc == -1)
                    break;
                if (rc == -2) {
                    unsupported = 1;
                    break;
                }
                segs[i].r = orr;
                segs[i].p = orp;
                segs[i].score = r->score;
                segs[i].len =
                    (r->seq_len == 1 && r->seq[0] == '*') ? 0 : r->seq_len;
                segs[i].idx = (int)i;
            }
            if (err.kind || unsupported)
                break;

            if (seen_types == 0x3) {
                ++st_both;
                if (warns_n + 1 > warns_cap) {
                    size_t ncap = warns_cap ? warns_cap * 2 : 16;
                    mq_warn *nw = realloc(warns, ncap * sizeof(mq_warn));
                    if (!nw) {
                        err.kind = 2;
                        break;
                    }
                    warns = nw;
                    warns_cap = ncap;
                }
                warns[warns_n].kind = 0;
                warns[warns_n].qname = recs[g0].qname;
                warns[warns_n].qname_len = recs[g0].qname_len;
                ++warns_n;
                g0 = g1;
                continue; /* group skipped, no output */
            }

            /* sentinel + sort */
            segs[gn].r = MQ_INVALID;
            segs[gn].p = MQ_INVALID;
            segs[gn].score = 0.0;
            segs[gn].len = 0;
            segs[gn].idx = (int)gn;
            qsort(segs, gn + 1, sizeof(mq_seg), mq_seg_cmp);

            {
                int all_invalid = 1;
                for (size_t i = 0; i < gn + 1; ++i)
                    if (segs[i].r != MQ_INVALID || segs[i].p != MQ_INVALID) {
                        all_invalid = 0;
                        break;
                    }
                if (all_invalid) {
                    ++st_no_valid;
                    if (warns_n + 1 > warns_cap) {
                        size_t ncap = warns_cap ? warns_cap * 2 : 16;
                        mq_warn *nw =
                            realloc(warns, ncap * sizeof(mq_warn));
                        if (!nw) {
                            err.kind = 2;
                            break;
                        }
                        warns = nw;
                        warns_cap = ncap;
                    }
                    warns[warns_n].kind = 1;
                    warns[warns_n].qname = recs[g0].qname;
                    warns[warns_n].qname_len = recs[g0].qname_len;
                    ++warns_n;
                    /* NOTE: processing continues (parity with the Python) */
                }
            }

            /* paired segment scores */
            size_t n_pss = 0;
            for (size_t i = 0; i < gn && !err.kind; ++i) {
                mq_rec *r = &recs[g0 + i];
                int64_t pr = (r->ref_id < 0 || r->pos < 0) ? MQ_INVALID
                                                           : r->ref_id;
                int64_t pp = (r->ref_id < 0 || r->pos < 0) ? MQ_INVALID
                                                           : r->pos;
                int64_t mr = (r->mate_ref < 0 || r->mate_pos < 0)
                                 ? MQ_INVALID
                                 : r->mate_ref;
                int64_t mp = (r->mate_ref < 0 || r->mate_pos < 0)
                                 ? MQ_INVALID
                                 : r->mate_pos;
                mq_pos4 pair;
                if (mq_pos2_cmp(pr, pp, mr, mp) <= 0) {
                    pair.a = pr; pair.b = pp; pair.c = mr; pair.d = mp;
                } else {
                    pair.a = mr; pair.b = mp; pair.c = pr; pair.d = pp;
                }
                int has_mate = !(mr == MQ_INVALID && mp == MQ_INVALID);
                mq_pss e;
                e.positions = pair;
                e.seq_key = has_mate ? -1 : (long)i;
                e.seq = r->seq;
                e.seq_len = r->seq_len;
                e.score = r->score;
                e.other_score = 0.0;
                e.has_mate = 0;
                long mate_length = 0;
                if (!(pr == MQ_INVALID && pp == MQ_INVALID) && has_mate) {
                    int64_t mor = MQ_INVALID, mop = MQ_INVALID;
                    const tagitem *tags = all_tags + r->tag_off;
                    int rc = mq_tag_position(tags, r->n_tags, tn[3], tn[4],
                                             &mor, &mop, &err);
                    if (rc == -1)
                        break;
                    if (rc == -2) {
                        unsupported = 1;
                        break;
                    }
                    /* bisect_right(seg_positions, mate_orig) */
                    size_t lo = 0, hi = gn + 1;
                    while (lo < hi) {
                        size_t mid = (lo + hi) / 2;
                        if (mq_pos2_cmp(segs[mid].r, segs[mid].p, mor,
                                        mop) <= 0)
                            lo = mid + 1;
                        else
                            hi = mid;
                    }
                    if (lo == 0) {
                        ++st_mate_nf;
                    } else {
                        const mq_seg *cand = &segs[lo - 1];
                        if (cand->r == mor && cand->p == mop) {
                            e.other_score = cand->score;
                            e.has_mate = 1;
                            mate_length = cand->len;
                        } else {
                            ++st_mate_nf;
                        }
                    }
                }
                e.total = e.score + e.other_score;
                e.maxv = e.has_mate
                             ? (e.score > e.other_score ? e.score
                                                        : e.other_score)
                             : e.score;
                r->pairwise = e.total;
                r->mate_length = mate_length;
                /* add_pss: insert keeping positions sorted; dedupe among
                   paired entries (seq_key -1) at equal positions */
                {
                    size_t lo = 0, hi = n_pss;
                    while (lo < hi) {
                        size_t mid = (lo + hi) / 2;
                        if (mq_pos4_cmp(&pss[mid].positions, &e.positions) <
                            0)
                            lo = mid + 1;
                        else
                            hi = mid;
                    }
                    int done = 0;
                    size_t ins = lo;
                    while (ins < n_pss &&
                           mq_pos4_cmp(&pss[ins].positions, &e.positions) ==
                               0) {
                        if (pss[ins].seq_key == e.seq_key) {
                            if (pss[ins].total < e.total) {
                                int keep_idx = pss[ins].list_idx;
                                pss[ins] = e;
                                pss[ins].list_idx = keep_idx;
                            }
                            done = 1;
                            break;
                        }
                        ++ins;
                    }
                    if (!done) {
                        memmove(pss + ins + 1, pss + ins,
                                (n_pss - ins) * sizeof(mq_pss));
                        pss[ins] = e;
                        ++n_pss;
                    }
                }
            }
            if (err.kind || unsupported)
                break;
            for (size_t i = 0; i < n_pss; ++i)
                pss[i].list_idx = (int)i;
            memcpy(pss_sorted, pss, n_pss * sizeof(mq_pss));
            qsort(pss_sorted, n_pss, sizeof(mq_pss), mq_pss_total_cmp);
            for (size_t i = 0; i < n_pss; ++i)
                totals[i] = pss_sorted[i].total;

            /* per record: find next-best differing candidate -> MAPQ */
            for (size_t i = 0; i < gn; ++i) {
                mq_rec *r = &recs[g0 + i];
                int64_t pr = (r->ref_id < 0 || r->pos < 0) ? MQ_INVALID
                                                           : r->ref_id;
                int64_t pp = (r->ref_id < 0 || r->pos < 0) ? MQ_INVALID
                                                           : r->pos;
                int64_t mr = (r->mate_ref < 0 || r->mate_pos < 0)
                                 ? MQ_INVALID
                                 : r->mate_ref;
                int64_t mp = (r->mate_ref < 0 || r->mate_pos < 0)
                                 ? MQ_INVALID
                                 : r->mate_pos;
                mq_pos4 pair;
                if (mq_pos2_cmp(pr, pp, mr, mp) <= 0) {
                    pair.a = pr; pair.b = pp; pair.c = mr; pair.d = mp;
                } else {
                    pair.a = mr; pair.b = mp; pair.c = pr; pair.d = pp;
                }
                int has_mate = !(mr == MQ_INVALID && mp == MQ_INVALID);
                /* bisect_right(totals, pairwise) */
                size_t lo = 0, hi = n_pss;
                while (lo < hi) {
                    size_t mid = (lo + hi) / 2;
                    if (totals[mid] <= r->pairwise)
                        lo = mid + 1;
                    else
                        hi = mid;
                }
                size_t it = lo;
                int is_best = (it == n_pss);
                const char *it_seq;
                Py_ssize_t it_seq_len;
                int it_seq_key_paired;
                if (it < n_pss) {
                    it_seq = pss_sorted[it].seq;
                    it_seq_len = pss_sorted[it].seq_len;
                    it_seq_key_paired = pss_sorted[it].seq_key == -1;
                } else {
                    it_seq = r->seq;
                    it_seq_len = r->seq_len;
                    it_seq_key_paired = has_mate;
                }
                long read_len =
                    (r->seq_len == 1 && r->seq[0] == '*') ? 0 : r->seq_len;
                long mapq = -1;
                for (size_t k = it; k-- > 0;) {
                    const mq_pss *other = &pss_sorted[k];
                    int seq_eq =
                        it_seq_key_paired || other->seq_key == -1 ||
                        (it_seq_len == other->seq_len &&
                         memcmp(it_seq, other->seq, it_seq_len) == 0);
                    if (!seq_eq)
                        continue;
                    if (mq_pos4_cmp(&other->positions, &pair) == 0)
                        continue;
                    mapq = mq_calculate_mapq(
                        read_len, r->mate_length, r->pairwise,
                        has_mate ? other->total : other->maxv);
                    break;
                }
                if (mapq < 0) {
                    if (is_best)
                        mapq = mq_calculate_mapq(read_len, r->mate_length,
                                                 r->pairwise, MQ_SCORE_MIN);
                    else
                        mapq = 255; /* MAPQ_NO_NEXT_RECORD */
                }

                /* ---- emit the record ---- */
                if (pv3_sb_put(&out, r->qname, r->qname_len) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put_long(&out, r->flag) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0)
                    goto emit_err;
                if (r->ref_id >= 0) {
                    if (r->ref_id >= n_refs_out) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "reference id out of range");
                        goto group_fail;
                    }
                    if (pv3_sb_put(&out, out_nm[r->ref_id],
                                   out_nml[r->ref_id]) < 0)
                        goto emit_err;
                } else if (pv3_sb_putc(&out, '*') < 0)
                    goto emit_err;
                if (pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put_long(&out, r->pos + 1) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put_long(&out, mapq) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0)
                    goto emit_err;
                if (r->n_ops == 0) {
                    if (pv3_sb_putc(&out, '*') < 0)
                        goto emit_err;
                } else {
                    for (int32_t k2 = 0; k2 < r->n_ops; ++k2)
                        if (pv3_sb_put_long(&out,
                                            all_counts[r->ops_off + k2]) < 0 ||
                            pv3_sb_putc(&out,
                                        pv3_op_char_table
                                            [all_ops[r->ops_off + k2] & 15]) <
                                0)
                            goto emit_err;
                }
                if (pv3_sb_putc(&out, '\t') < 0)
                    goto emit_err;
                if (r->mate_ref < 0) {
                    if (pv3_sb_putc(&out, '*') < 0)
                        goto emit_err;
                } else if (r->mate_ref == r->ref_id && r->ref_id >= 0) {
                    if (pv3_sb_putc(&out, '=') < 0)
                        goto emit_err;
                } else {
                    if (r->mate_ref >= n_refs_out) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "mate reference id out of range");
                        goto group_fail;
                    }
                    if (pv3_sb_put(&out, out_nm[r->mate_ref],
                                   out_nml[r->mate_ref]) < 0)
                        goto emit_err;
                }
                if (pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put_long(&out, r->mate_pos + 1) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put_long(&out, r->tlen) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put(&out, r->seq, r->seq_len) < 0 ||
                    pv3_sb_putc(&out, '\t') < 0 ||
                    pv3_sb_put(&out, r->qual, r->qual_len) < 0)
                    goto emit_err;

                /* tags: copy + rescore surgery + sort + canonical emit */
                {
                    int nt = r->n_tags;
                    tagitem local[96];
                    tagitem *items = local;
                    tagitem *heap = NULL;
                    if (nt + 3 > 96) {
                        heap = malloc((nt + 3) * sizeof(tagitem));
                        if (!heap) {
                            err.kind = 2;
                            goto group_fail;
                        }
                        items = heap;
                    }
                    memcpy(items, all_tags + r->tag_off,
                           nt * sizeof(tagitem));
                    if (rescore) {
                        /* CigarScorer.__call__ surgery */
                        tagitem as_new;
                        memset(&as_new, 0, sizeof as_new);
                        as_new.key = "AS";
                        as_new.klen = 2;
                        as_new.synth = 10;
                        if (!r->has_as) {
                            int ai = mq_find_tag(items, nt, "AS");
                            if (ai >= 0)
                                items[ai] = as_new;
                            else
                                items[nt++] = as_new;
                        } else {
                            tagitem xs = r->as_old;
                            xs.key = tn[5];
                            xs.klen = 2;
                            int xi = mq_find_tag(items, nt, tn[5]);
                            if (xi >= 0)
                                items[xi] = xs;
                            else
                                items[nt++] = xs;
                            tagitem ys;
                            memset(&ys, 0, sizeof ys);
                            ys.key = tn[6];
                            ys.klen = 2;
                            ys.synth = 11;
                            int yi = mq_find_tag(items, nt, tn[6]);
                            if (yi >= 0)
                                items[yi] = ys;
                            else
                                items[nt++] = ys;
                            int ai = mq_find_tag(items, nt, "AS");
                            if (ai >= 0)
                                items[ai] = as_new;
                            else
                                items[nt++] = as_new;
                        }
                    }
                    qsort(items, nt, sizeof(tagitem), tag_key_cmp);
                    for (int q2 = 0; q2 < nt; ++q2) {
                        if (mq_emit_tag(&out, &items[q2], r->new_score,
                                        &err) < 0) {
                            free(heap);
                            if (!err.kind)
                                err.kind = 2;
                            goto group_fail;
                        }
                    }
                    free(heap);
                }
                if (pv3_sb_putc(&out, '\n') < 0)
                    goto emit_err;
                continue;
            emit_err:
                err.kind = 2;
                goto group_fail;
            }
            g0 = g1;
        }
    }
group_fail:

    PyEval_RestoreThread(ts);
    ts = NULL;

    if (err.kind == 1) {
        PyErr_SetString(PyExc_ValueError, err.msg);
        goto fail;
    }
    if (err.kind == 2)
        goto oom;
    if (err.kind == 3)
        goto fail;

    if (unsupported) {
        /* caller reruns the chunk through the Python object path */
        PyMem_Free(line_ptr);
        PyMem_Free(line_len_a);
        PyMem_Free(out_nm);
        PyMem_Free(out_nml);
        PyMem_Free(ents);
        PyMem_Free(hslot);
        PyMem_Free(mm_pen);
        free(recs);
        free(all_ops);
        free(all_counts);
        free(all_tags);
        free(segs);
        free(pss);
        free(pss_sorted);
        free(totals);
        free(warns);
        free(out.buf);
        Py_RETURN_NONE;
    }

    {
        PyObject *blob =
            PyBytes_FromStringAndSize(out.buf ? out.buf : "", out.len);
        PyObject *wlist = PyList_New(warns_n);
        PyObject *res = NULL;
        if (blob && wlist) {
            int ok = 1;
            for (size_t i = 0; i < warns_n; ++i) {
                const char *fmt =
                    warns[i].kind == 0
                        ? "WARNING: Read '%.*s' has both paired and unpaired "
                          "alignment records; skipping."
                        : "WARNING: Read '%.*s' has no alignments with a "
                          "valid position.";
                char msg[512];
                int n = snprintf(msg, sizeof msg, fmt,
                                 (int)warns[i].qname_len, warns[i].qname);
                PyObject *s = PyUnicode_FromStringAndSize(msg, n);
                if (!s) {
                    ok = 0;
                    break;
                }
                PyList_SET_ITEM(wlist, i, s);
            }
            if (ok)
                res = Py_BuildValue("(O(lllll)O)", blob, st_total,
                                    st_unpaired, st_both, st_mate_nf,
                                    st_no_valid, wlist);
        }
        Py_XDECREF(blob);
        Py_XDECREF(wlist);
        PyMem_Free(line_ptr);
        PyMem_Free(line_len_a);
        PyMem_Free(out_nm);
        PyMem_Free(out_nml);
        PyMem_Free(ents);
        PyMem_Free(hslot);
        PyMem_Free(mm_pen);
        free(recs);
        free(all_ops);
        free(all_counts);
        free(all_tags);
        free(segs);
        free(pss);
        free(pss_sorted);
        free(totals);
        free(warns);
        free(out.buf);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    if (ts)
        PyEval_RestoreThread(ts);
    PyMem_Free(line_ptr);
    PyMem_Free(line_len_a);
    PyMem_Free(out_nm);
    PyMem_Free(out_nml);
    PyMem_Free(ents);
    PyMem_Free(hslot);
    PyMem_Free(mm_pen);
    free(recs);
    free(all_ops);
    free(all_counts);
    free(all_tags);
    free(segs);
    free(pss);
    free(pss_sorted);
    free(totals);
    free(warns);
    free(out.buf);
    return NULL;
}

/* ====================================================================== */
/* subset_alignments engine                                               */
/*                                                                        */
/* subset_filter_lines(lines, refmap, ref_names, chr_id|None,             */
/*                     sorted_read_ids|None, best_mapq)                   */
/*   -> (blob, matches, mismatches)                                       */
/*                                                                        */
/* C implementation of run_subset_alignments' record loop                 */
/* (pipeline/subset_alignments.py:88-106; subset-alignments/              */
/* main.cc:36-195): --chr name filter, --read-id sorted binary search,    */
/* --best-mapq per-QNAME group selection (MAPQ 255 ignored when ranking,  */
/* mate matched by RNEXT/PNEXT).  Chunks must be cut at QNAME             */
/* boundaries.  Emission is the canonical format_sam_record form.        */

typedef struct {
    const char *qname;
    Py_ssize_t qname_len;
    long flag, ref_id, pos, mapq, mate_ref, mate_pos, tlen;
    const char *seq, *qual;
    Py_ssize_t seq_len, qual_len;
    size_t ops_off, tag_off;
    int32_t n_ops;
    int n_tags;
} sub_rec;

/* Emit one record canonically.  cig_ops/cig_counts/cig_n give the CIGAR to
   write (already offset to this record); extra, when non-NULL, is a tag
   upserted into the record's tag set before the sorted emission. */
static int sub_emit_record_cig(pv3_strbuf *out, const sub_rec *r,
                               const int8_t *cig_ops,
                               const int32_t *cig_counts, int32_t cig_n,
                               const tagitem *all_tags,
                               const tagitem *extra, const char **out_nm,
                               const int *out_nml, Py_ssize_t n_refs_out,
                               fp_err *err)
{
    if (pv3_sb_put(out, r->qname, r->qname_len) < 0 ||
        pv3_sb_putc(out, '\t') < 0 || pv3_sb_put_long(out, r->flag) < 0 ||
        pv3_sb_putc(out, '\t') < 0)
        goto oom;
    if (r->ref_id >= 0) {
        if (r->ref_id >= n_refs_out) {
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg, "reference id out of range");
            return -1;
        }
        if (pv3_sb_put(out, out_nm[r->ref_id], out_nml[r->ref_id]) < 0)
            goto oom;
    } else if (pv3_sb_putc(out, '*') < 0)
        goto oom;
    if (pv3_sb_putc(out, '\t') < 0 ||
        pv3_sb_put_long(out, r->pos + 1) < 0 ||
        pv3_sb_putc(out, '\t') < 0 || pv3_sb_put_long(out, r->mapq) < 0 ||
        pv3_sb_putc(out, '\t') < 0)
        goto oom;
    if (cig_n == 0) {
        if (pv3_sb_putc(out, '*') < 0)
            goto oom;
    } else {
        for (int32_t k = 0; k < cig_n; ++k)
            if (pv3_sb_put_long(out, cig_counts[k]) < 0 ||
                pv3_sb_putc(out, pv3_op_char_table[cig_ops[k] & 15]) < 0)
                goto oom;
    }
    if (pv3_sb_putc(out, '\t') < 0)
        goto oom;
    if (r->mate_ref < 0) {
        if (pv3_sb_putc(out, '*') < 0)
            goto oom;
    } else if (r->mate_ref == r->ref_id && r->ref_id >= 0) {
        if (pv3_sb_putc(out, '=') < 0)
            goto oom;
    } else {
        if (r->mate_ref >= n_refs_out) {
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg,
                     "mate reference id out of range");
            return -1;
        }
        if (pv3_sb_put(out, out_nm[r->mate_ref], out_nml[r->mate_ref]) < 0)
            goto oom;
    }
    if (pv3_sb_putc(out, '\t') < 0 ||
        pv3_sb_put_long(out, r->mate_pos + 1) < 0 ||
        pv3_sb_putc(out, '\t') < 0 || pv3_sb_put_long(out, r->tlen) < 0 ||
        pv3_sb_putc(out, '\t') < 0 ||
        pv3_sb_put(out, r->seq, r->seq_len) < 0 ||
        pv3_sb_putc(out, '\t') < 0 ||
        pv3_sb_put(out, r->qual, r->qual_len) < 0)
        goto oom;
    {
        int nt = r->n_tags;
        tagitem local[96];
        tagitem *items = local;
        tagitem *heap = NULL;
        if (nt + 1 > 96) {
            heap = malloc((nt + 1) * sizeof(tagitem));
            if (!heap)
                goto oom;
            items = heap;
        }
        memcpy(items, all_tags + r->tag_off, nt * sizeof(tagitem));
        if (extra) { /* dict upsert */
            int done = 0;
            for (int q2 = 0; q2 < nt; ++q2)
                if (items[q2].klen == extra->klen &&
                    memcmp(items[q2].key, extra->key, extra->klen) == 0) {
                    items[q2] = *extra;
                    done = 1;
                    break;
                }
            if (!done)
                items[nt++] = *extra;
        }
        qsort(items, nt, sizeof(tagitem), tag_key_cmp);
        for (int q2 = 0; q2 < nt; ++q2)
            if (mq_emit_tag(out, &items[q2], 0, err) < 0) {
                free(heap);
                if (!err->kind)
                    err->kind = 2;
                return -1;
            }
        free(heap);
    }
    if (pv3_sb_putc(out, '\n') < 0)
        goto oom;
    return 0;
oom:
    err->kind = 2;
    return -1;
}

static int sub_emit_record(pv3_strbuf *out, const sub_rec *r,
                           const int8_t *all_ops, const int32_t *all_counts,
                           const tagitem *all_tags, const char **out_nm,
                           const int *out_nml, Py_ssize_t n_refs_out,
                           fp_err *err)
{
    return sub_emit_record_cig(out, r, all_ops + r->ops_off,
                               all_counts + r->ops_off, r->n_ops, all_tags,
                               NULL, out_nm, out_nml, n_refs_out, err);
}

/* _output_best_mate (subset_alignments.py:24-37) */
static int sub_output_best_mate(pv3_strbuf *out, const sub_rec *group,
                                size_t gn, long mate_ref, long mate_pos,
                                const int8_t *all_ops,
                                const int32_t *all_counts,
                                const tagitem *all_tags, const char **out_nm,
                                const int *out_nml, Py_ssize_t n_refs_out,
                                fp_err *err)
{
    long best = 0;
    for (size_t i = 0; i < gn; ++i) {
        const sub_rec *r = &group[i];
        if (r->ref_id != mate_ref || r->pos != mate_pos)
            continue;
        if (r->mapq == 255)
            continue;
        if (r->mapq > best)
            best = r->mapq;
    }
    for (size_t i = 0; i < gn; ++i) {
        const sub_rec *r = &group[i];
        if (r->mapq == best && r->ref_id == mate_ref && r->pos == mate_pos)
            return sub_emit_record(out, r, all_ops, all_counts, all_tags,
                                   out_nm, out_nml, n_refs_out, err);
    }
    return 0;
}

/* _process_group (subset_alignments.py:40-59) */
static int sub_process_group(pv3_strbuf *out, const sub_rec *group,
                             size_t gn, const int8_t *all_ops,
                             const int32_t *all_counts,
                             const tagitem *all_tags, const char **out_nm,
                             const int *out_nml, Py_ssize_t n_refs_out,
                             fp_err *err)
{
    if (!gn)
        return 0;
    long best = 0;
    for (size_t i = 0; i < gn; ++i)
        if (group[i].mapq != 255 && group[i].mapq > best)
            best = group[i].mapq;
    for (size_t i = 0; i < gn; ++i) {
        const sub_rec *r = &group[i];
        if (r->mapq == best) {
            if (sub_emit_record(out, r, all_ops, all_counts, all_tags,
                                out_nm, out_nml, n_refs_out, err) < 0)
                return -1;
            if (r->mate_ref < 0 || r->mate_pos < 0)
                return 0;
            return sub_output_best_mate(out, group, gn, r->mate_ref,
                                        r->mate_pos, all_ops, all_counts,
                                        all_tags, out_nm, out_nml,
                                        n_refs_out, err);
        }
    }
    /* default: output the first */
    {
        const sub_rec *r = &group[0];
        if (sub_emit_record(out, r, all_ops, all_counts, all_tags, out_nm,
                            out_nml, n_refs_out, err) < 0)
            return -1;
        if (r->mate_ref >= 0 && r->mate_pos >= 0)
            return sub_output_best_mate(out, group, gn, r->mate_ref,
                                        r->mate_pos, all_ops, all_counts,
                                        all_tags, out_nm, out_nml,
                                        n_refs_out, err);
    }
    return 0;
}

/* sorted read-id binary search (subset-alignments/main.cc:191-195) */
static int sub_name_in(const char **names, const Py_ssize_t *nlens,
                       Py_ssize_t n, const char *s, Py_ssize_t sl)
{
    Py_ssize_t lo = 0, hi = n;
    while (lo < hi) {
        Py_ssize_t mid = (lo + hi) / 2;
        Py_ssize_t cl = nlens[mid] < sl ? nlens[mid] : sl;
        int c = memcmp(names[mid], s, cl);
        if (c == 0)
            c = (nlens[mid] > sl) - (nlens[mid] < sl);
        if (c < 0)
            lo = mid + 1;
        else if (c > 0)
            hi = mid;
        else
            return 1;
    }
    return 0;
}

PyObject *pv3_subset_filter_lines(PyObject *self, PyObject *args)
{
    PyObject *lines, *refmap, *ref_names, *chr_obj, *ids_obj;
    int best_mapq;
    if (!PyArg_ParseTuple(args, "O!O!O!OOi",
                          &PyList_Type, &lines, &PyDict_Type, &refmap,
                          &PyList_Type, &ref_names, &chr_obj, &ids_obj,
                          &best_mapq))
        return NULL;

    const char *chr_id = NULL;
    Py_ssize_t chr_len = 0;
    if (chr_obj != Py_None) {
        if (PyBytes_AsStringAndSize(chr_obj, (char **)&chr_id, &chr_len) < 0)
            return NULL;
    }

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    Py_ssize_t n_refs_out = PyList_GET_SIZE(ref_names);

    const char **line_ptr = NULL;
    Py_ssize_t *line_len_a = NULL;
    const char **out_nm = NULL;
    int *out_nml = NULL;
    const char **id_nm = NULL;
    Py_ssize_t *id_nl = NULL;
    Py_ssize_t n_ids = 0;
    refent *ents = NULL;
    int32_t *hslot = NULL;
    size_t hcap = 8;
    sub_rec *group = NULL;
    size_t group_cap = 0, gn = 0;
    int8_t *all_ops = NULL;
    int32_t *all_counts = NULL;
    size_t ops_cap = 0, ops_n = 0;
    tagitem *all_tags = NULL;
    size_t tags_cap = 0, tags_n = 0;
    pv3_strbuf out = {NULL, 0, 0};
    PyThreadState *ts = NULL;
    fp_err err = {0, {0}};
    long matches = 0, mismatches = 0;

    line_ptr = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    line_len_a = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    out_nm = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(char *));
    out_nml = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(int));
    if (!line_ptr || !line_len_a || !out_nm || !out_nml)
        goto oom;
    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        char *lp;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, li), &lp,
                                    &line_len_a[li]) < 0)
            goto fail;
        line_ptr[li] = lp;
    }
    for (Py_ssize_t i = 0; i < n_refs_out; ++i) {
        PyObject *o = PyList_GET_ITEM(ref_names, i);
        if (PyUnicode_Check(o)) {
            Py_ssize_t n;
            const char *p = PyUnicode_AsUTF8AndSize(o, &n);
            if (!p)
                goto fail;
            out_nm[i] = p;
            out_nml[i] = (int)n;
        } else if (PyBytes_Check(o)) {
            out_nm[i] = PyBytes_AS_STRING(o);
            out_nml[i] = (int)PyBytes_GET_SIZE(o);
        } else {
            PyErr_SetString(PyExc_TypeError, "ref_names must be str/bytes");
            goto fail;
        }
    }
    if (ids_obj != Py_None) {
        if (!PyList_Check(ids_obj)) {
            PyErr_SetString(PyExc_TypeError,
                            "read ids must be a sorted list of bytes");
            goto fail;
        }
        n_ids = PyList_GET_SIZE(ids_obj);
        id_nm = PyMem_Malloc((n_ids ? n_ids : 1) * sizeof(char *));
        id_nl = PyMem_Malloc((n_ids ? n_ids : 1) * sizeof(Py_ssize_t));
        if (!id_nm || !id_nl)
            goto oom;
        for (Py_ssize_t i = 0; i < n_ids; ++i) {
            char *p;
            if (PyBytes_AsStringAndSize(PyList_GET_ITEM(ids_obj, i), &p,
                                        &id_nl[i]) < 0)
                goto fail;
            id_nm[i] = p;
        }
    }
    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        while (hcap < (size_t)n_refs * 2)
            hcap <<= 1;
        ents = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(refent));
        hslot = PyMem_Malloc(hcap * sizeof(int32_t));
        if (!ents || !hslot)
            goto oom;
        for (size_t i = 0; i < hcap; ++i)
            hslot[i] = -1;
        PyObject *k, *v;
        Py_ssize_t ppos = 0, ei = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            char *kp;
            Py_ssize_t kl;
            if (PyBytes_AsStringAndSize(k, &kp, &kl) < 0)
                goto fail;
            long idv = PyLong_AsLong(v);
            if (idv == -1 && PyErr_Occurred())
                goto fail;
            uint64_t h = fnv1a(kp, kl) & (hcap - 1);
            while (hslot[h] >= 0)
                h = (h + 1) & (hcap - 1);
            ents[ei].name = kp;
            ents[ei].len = kl;
            ents[ei].id = idv;
            hslot[h] = (int32_t)ei;
            ++ei;
        }
    }

    ts = PyEval_SaveThread();

    for (Py_ssize_t li = 0; li < n_lines && !err.kind; ++li) {
        const char *line = line_ptr[li];
        Py_ssize_t line_len = line_len_a[li];
        while (line_len > 0 &&
               (line[line_len - 1] == '\n' || line[line_len - 1] == '\r'))
            --line_len;
        {
            Py_ssize_t w = 0;
            while (w < line_len &&
                   (line[w] == ' ' || line[w] == '\t' || line[w] == '\v' ||
                    line[w] == '\f'))
                ++w;
            if (w == line_len)
                continue;
        }
        const char *fields[12];
        Py_ssize_t flens[12];
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
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "truncated SAM record: %.100s",
                     line);
            break;
        }
        long flag, pos, mapq, pnext, tlen;
        if (fp_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0 ||
            fp_parse_long(fields[4], fields[4] + flens[4], &mapq) != 0 ||
            fp_parse_long(fields[7], fields[7] + flens[7], &pnext) != 0 ||
            fp_parse_long(fields[8], fields[8] + flens[8], &tlen) != 0) {
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "malformed SAM record: %.100s",
                     line);
            break;
        }
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            ref_id = ref_lookup(ents, hslot, hcap, fields[2], flens[2]);
            if (ref_id == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown reference '%.100s'", fields[2]);
                break;
            }
        }
        long mate_ref = -1;
        if (flens[6] == 1 && fields[6][0] == '*') {
            mate_ref = -1;
        } else if (flens[6] == 1 && fields[6][0] == '=') {
            mate_ref = ref_id;
        } else {
            mate_ref = ref_lookup(ents, hslot, hcap, fields[6], flens[6]);
            if (mate_ref == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown mate reference '%.100s'", fields[6]);
                break;
            }
        }

        /* filters (subset_alignments.py:89-95) */
        if (chr_id) {
            int ok = ref_id >= 0 && flens[2] == chr_len &&
                     memcmp(fields[2], chr_id, chr_len) == 0;
            if (!ok) {
                ++mismatches;
                continue;
            }
        }
        if (id_nm &&
            !sub_name_in(id_nm, id_nl, n_ids, fields[0], flens[0])) {
            ++mismatches;
            continue;
        }
        ++matches;

        /* parse CIGAR + tags for emission */
        size_t ops_off = ops_n;
        int32_t rec_ops = 0;
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
                    if (c == d0 || c == cend || (code == 0 && oc != 'M')) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "invalid CIGAR: '%.50s'", fields[5]);
                        goto loop_done;
                    }
                    ++c;
                    if (ops_n + 1 > ops_cap) {
                        size_t ncap = ops_cap ? ops_cap * 2 : 1024;
                        int8_t *no_ = realloc(all_ops, ncap);
                        int32_t *nc =
                            realloc(all_counts, ncap * sizeof(int32_t));
                        if (no_)
                            all_ops = no_;
                        if (nc)
                            all_counts = nc;
                        if (!no_ || !nc) {
                            err.kind = 2;
                            goto loop_done;
                        }
                        ops_cap = ncap;
                    }
                    all_ops[ops_n] = code;
                    all_counts[ops_n] = (int32_t)count;
                    ++ops_n;
                    ++rec_ops;
                }
            }
        }
        size_t tag_off = tags_n;
        int rec_tags = 0;
        {
            const char *tp = p;
            while (tp < end) {
                const char *tab = memchr(tp, '\t', end - tp);
                const char *fend = tab ? tab : end;
                const char *c1 = memchr(tp, ':', fend - tp);
                if (!c1 || c1 + 2 > fend || c1[2] != ':') {
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "malformed tag field: %.50s", tp);
                    goto loop_done;
                }
                tagitem it;
                it.key = tp;
                it.klen = (int)(c1 - tp);
                it.typ = c1[1];
                it.val = c1 + 3;
                it.vlen = (int)(fend - (c1 + 3));
                it.synth = 0;
                int replaced = 0;
                for (int q2 = 0; q2 < rec_tags; ++q2) {
                    tagitem *ex = &all_tags[tag_off + q2];
                    if (ex->klen == it.klen &&
                        memcmp(ex->key, it.key, it.klen) == 0) {
                        *ex = it;
                        replaced = 1;
                        break;
                    }
                }
                if (!replaced) {
                    if (tags_n + 1 > tags_cap) {
                        size_t ncap = tags_cap ? tags_cap * 2 : 1024;
                        tagitem *nt =
                            realloc(all_tags, ncap * sizeof(tagitem));
                        if (!nt) {
                            err.kind = 2;
                            goto loop_done;
                        }
                        all_tags = nt;
                        tags_cap = ncap;
                    }
                    all_tags[tags_n++] = it;
                    ++rec_tags;
                }
                tp = tab ? tab + 1 : end;
            }
        }

        sub_rec rec;
        memset(&rec, 0, sizeof rec);
        rec.qname = fields[0];
        rec.qname_len = flens[0];
        rec.flag = flag;
        rec.ref_id = ref_id;
        rec.pos = pos - 1;
        rec.mapq = mapq;
        rec.mate_ref = mate_ref;
        rec.mate_pos = pnext - 1;
        rec.tlen = tlen;
        rec.seq = fields[9];
        rec.seq_len = flens[9];
        rec.qual = fields[10];
        rec.qual_len = flens[10];
        rec.ops_off = ops_off;
        rec.n_ops = rec_ops;
        rec.tag_off = tag_off;
        rec.n_tags = rec_tags;

        if (!best_mapq) {
            if (sub_emit_record(&out, &rec, all_ops, all_counts, all_tags,
                                out_nm, out_nml, n_refs_out, &err) < 0)
                break;
            /* arenas can be reset per record on the streaming path */
            ops_n = ops_off;
            tags_n = tag_off;
            continue;
        }
        if (gn &&
            !(rec.qname_len == group[0].qname_len &&
              memcmp(rec.qname, group[0].qname, rec.qname_len) == 0)) {
            if (sub_process_group(&out, group, gn, all_ops, all_counts,
                                  all_tags, out_nm, out_nml, n_refs_out,
                                  &err) < 0)
                break;
            gn = 0;
            /* reset the pools; rec's spans were appended after the group's,
               so shift them down */
            memmove(all_ops, all_ops + ops_off, rec_ops);
            memmove(all_counts, all_counts + ops_off,
                    rec_ops * sizeof(int32_t));
            memmove(all_tags, all_tags + tag_off, rec_tags * sizeof(tagitem));
            rec.ops_off = 0;
            rec.tag_off = 0;
            ops_n = rec_ops;
            tags_n = rec_tags;
        }
        if (gn + 1 > group_cap) {
            size_t ncap = group_cap ? group_cap * 2 : 64;
            sub_rec *ng = realloc(group, ncap * sizeof(sub_rec));
            if (!ng) {
                err.kind = 2;
                break;
            }
            group = ng;
            group_cap = ncap;
        }
        group[gn++] = rec;
    }
loop_done:
    if (!err.kind && gn)
        sub_process_group(&out, group, gn, all_ops, all_counts, all_tags,
                          out_nm, out_nml, n_refs_out, &err);

    PyEval_RestoreThread(ts);
    ts = NULL;

    if (err.kind == 1) {
        PyErr_SetString(PyExc_ValueError, err.msg);
        goto fail;
    }
    if (err.kind == 2)
        goto oom;

    {
        PyObject *res = Py_BuildValue("(y#ll)",
                                      out.buf ? out.buf : "",
                                      (Py_ssize_t)out.len, matches,
                                      mismatches);
        PyMem_Free(line_ptr);
        PyMem_Free(line_len_a);
        PyMem_Free(out_nm);
        PyMem_Free(out_nml);
        PyMem_Free(id_nm);
        PyMem_Free(id_nl);
        PyMem_Free(ents);
        PyMem_Free(hslot);
        free(group);
        free(all_ops);
        free(all_counts);
        free(all_tags);
        free(out.buf);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    if (ts)
        PyEval_RestoreThread(ts);
    PyMem_Free(line_ptr);
    PyMem_Free(line_len_a);
    PyMem_Free(out_nm);
    PyMem_Free(out_nml);
    PyMem_Free(id_nm);
    PyMem_Free(id_nl);
    PyMem_Free(ents);
    PyMem_Free(hslot);
    free(group);
    free(all_ops);
    free(all_counts);
    free(all_tags);
    free(out.buf);
    return NULL;
}

/* ====================================================================== */
/* rewrite_cigar tool engine                                              */
/*                                                                        */
/* rewrite_cigar_lines(lines, refmap, ref_names, ref_list, mode, xn_tag)  */
/*   -> (blob, n_records) | ref_id (int: load this contig and retry)      */
/*                                                                        */
/* C implementation of run_rewrite_cigar's record loop                    */
/* (pipeline/rewrite_cigar_tool.py:120-146; rewrite-cigar/                */
/* main.cc:151-284).  mode 0 = -M (=/X -> M, cigar_buffer merging),       */
/* mode 1 = -S (M -> =/X by raw byte comparison, runs merged within each  */
/* M op only, XN bitmask of reference N positions).  ref_list is indexed  */
/* by ref id (bytes or None); a record needing an unloaded contig makes   */
/* the call return that ref id BEFORE emitting anything (pre-pass), so    */
/* the caller can load it into the bounded store and retry the chunk.     */

PyObject *pv3_rewrite_cigar_lines(PyObject *self, PyObject *args)
{
    PyObject *lines, *refmap, *ref_names, *ref_list, *xn_obj;
    int mode;
    if (!PyArg_ParseTuple(args, "O!O!O!O!iO",
                          &PyList_Type, &lines, &PyDict_Type, &refmap,
                          &PyList_Type, &ref_names, &PyList_Type, &ref_list,
                          &mode, &xn_obj))
        return NULL;
    const char *xn_tag = NULL;
    Py_ssize_t xn_tag_len = 0;
    if (xn_obj != Py_None &&
        PyBytes_AsStringAndSize(xn_obj, (char **)&xn_tag, &xn_tag_len) < 0)
        return NULL;
    if (mode == 1 && (!xn_tag || xn_tag_len != 2)) {
        PyErr_SetString(PyExc_ValueError, "xn_tag must be 2 bytes");
        return NULL;
    }

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    Py_ssize_t n_refs_out = PyList_GET_SIZE(ref_names);

    const char **line_ptr = NULL;
    Py_ssize_t *line_len_a = NULL;
    const char **out_nm = NULL;
    int *out_nml = NULL;
    const char **refs = NULL;
    Py_ssize_t *ref_lens = NULL;
    refent *ents = NULL;
    int32_t *hslot = NULL;
    size_t hcap = 8;
    int8_t *ops_sc = NULL;
    int32_t *cnt_sc = NULL;
    size_t ops_cap = 0;
    int8_t *nops_sc = NULL;
    int32_t *ncnt_sc = NULL;
    size_t nops_cap = 0;
    unsigned char *xn_sc = NULL;
    size_t xn_cap = 0;
    tagitem *tags_sc = NULL;
    size_t tags_cap = 0;
    pv3_strbuf out = {NULL, 0, 0};
    PyThreadState *ts = NULL;
    fp_err err = {0, {0}};
    long n_records = 0;
    long need_ref = -1;

    line_ptr = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    line_len_a = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    out_nm = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(char *));
    out_nml = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(int));
    refs = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(char *));
    ref_lens = PyMem_Malloc((n_refs_out ? n_refs_out : 1) * sizeof(Py_ssize_t));
    if (!line_ptr || !line_len_a || !out_nm || !out_nml || !refs || !ref_lens)
        goto oom;
    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        char *lp;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, li), &lp,
                                    &line_len_a[li]) < 0)
            goto fail;
        line_ptr[li] = lp;
    }
    for (Py_ssize_t i = 0; i < n_refs_out; ++i) {
        PyObject *o = PyList_GET_ITEM(ref_names, i);
        if (PyUnicode_Check(o)) {
            Py_ssize_t n;
            const char *p = PyUnicode_AsUTF8AndSize(o, &n);
            if (!p)
                goto fail;
            out_nm[i] = p;
            out_nml[i] = (int)n;
        } else if (PyBytes_Check(o)) {
            out_nm[i] = PyBytes_AS_STRING(o);
            out_nml[i] = (int)PyBytes_GET_SIZE(o);
        } else {
            PyErr_SetString(PyExc_TypeError, "ref_names must be str/bytes");
            goto fail;
        }
        PyObject *rb = i < PyList_GET_SIZE(ref_list)
                           ? PyList_GET_ITEM(ref_list, i)
                           : Py_None;
        if (rb == Py_None) {
            refs[i] = NULL;
            ref_lens[i] = 0;
        } else {
            char *p;
            if (PyBytes_AsStringAndSize(rb, &p, &ref_lens[i]) < 0)
                goto fail;
            refs[i] = p;
        }
    }
    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        while (hcap < (size_t)n_refs * 2)
            hcap <<= 1;
        ents = PyMem_Malloc((n_refs ? n_refs : 1) * sizeof(refent));
        hslot = PyMem_Malloc(hcap * sizeof(int32_t));
        if (!ents || !hslot)
            goto oom;
        for (size_t i = 0; i < hcap; ++i)
            hslot[i] = -1;
        PyObject *k, *v;
        Py_ssize_t ppos = 0, ei = 0;
        while (PyDict_Next(refmap, &ppos, &k, &v)) {
            char *kp;
            Py_ssize_t kl;
            if (PyBytes_AsStringAndSize(k, &kp, &kl) < 0)
                goto fail;
            long idv = PyLong_AsLong(v);
            if (idv == -1 && PyErr_Occurred())
                goto fail;
            uint64_t h = fnv1a(kp, kl) & (hcap - 1);
            while (hslot[h] >= 0)
                h = (h + 1) & (hcap - 1);
            ents[ei].name = kp;
            ents[ei].len = kl;
            ents[ei].id = idv;
            hslot[h] = (int32_t)ei;
            ++ei;
        }
    }

    ts = PyEval_SaveThread();

    /* pre-pass (mode 1): every contig a record will touch must be loaded,
       so nothing is emitted before a retry */
    if (mode == 1) {
        for (Py_ssize_t li = 0; li < n_lines; ++li) {
            const char *line = line_ptr[li];
            Py_ssize_t line_len = line_len_a[li];
            while (line_len > 0 && (line[line_len - 1] == '\n' ||
                                    line[line_len - 1] == '\r'))
                --line_len;
            const char *fields[5];
            Py_ssize_t flens[5];
            int n_fields = 0;
            const char *p = line, *end = line + line_len;
            while (n_fields < 4) {
                const char *tab = memchr(p, '\t', end - p);
                fields[n_fields] = p;
                flens[n_fields] = (tab ? tab : end) - p;
                ++n_fields;
                if (!tab)
                    break;
                p = tab + 1;
            }
            if (n_fields < 4)
                continue; /* blank/truncated: the main pass handles */
            long pos;
            if (fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0)
                continue;
            if (pos - 1 < 0)
                continue;
            if (flens[2] == 1 && fields[2][0] == '*')
                continue;
            long rid = ref_lookup(ents, hslot, hcap, fields[2], flens[2]);
            if (rid >= 0 && rid < n_refs_out && !refs[rid]) {
                need_ref = rid;
                break;
            }
        }
        if (need_ref >= 0) {
            PyEval_RestoreThread(ts);
            PyMem_Free(line_ptr);
            PyMem_Free(line_len_a);
            PyMem_Free(out_nm);
            PyMem_Free(out_nml);
            PyMem_Free(refs);
            PyMem_Free(ref_lens);
            PyMem_Free(ents);
            PyMem_Free(hslot);
            return PyLong_FromLong(need_ref);
        }
    }

    for (Py_ssize_t li = 0; li < n_lines && !err.kind; ++li) {
        const char *line = line_ptr[li];
        Py_ssize_t line_len = line_len_a[li];
        while (line_len > 0 &&
               (line[line_len - 1] == '\n' || line[line_len - 1] == '\r'))
            --line_len;
        {
            Py_ssize_t w = 0;
            while (w < line_len &&
                   (line[w] == ' ' || line[w] == '\t' || line[w] == '\v' ||
                    line[w] == '\f'))
                ++w;
            if (w == line_len)
                continue;
        }
        const char *fields[12];
        Py_ssize_t flens[12];
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
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "truncated SAM record: %.100s",
                     line);
            break;
        }
        long flag, pos, mapq, pnext, tlen;
        if (fp_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            fp_parse_long(fields[3], fields[3] + flens[3], &pos) != 0 ||
            fp_parse_long(fields[4], fields[4] + flens[4], &mapq) != 0 ||
            fp_parse_long(fields[7], fields[7] + flens[7], &pnext) != 0 ||
            fp_parse_long(fields[8], fields[8] + flens[8], &tlen) != 0) {
            err.kind = 1;
            snprintf(err.msg, sizeof err.msg, "malformed SAM record: %.100s",
                     line);
            break;
        }
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            ref_id = ref_lookup(ents, hslot, hcap, fields[2], flens[2]);
            if (ref_id == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown reference '%.100s'", fields[2]);
                break;
            }
        }
        long mate_ref = -1;
        if (flens[6] == 1 && fields[6][0] == '*') {
            mate_ref = -1;
        } else if (flens[6] == 1 && fields[6][0] == '=') {
            mate_ref = ref_id;
        } else {
            mate_ref = ref_lookup(ents, hslot, hcap, fields[6], flens[6]);
            if (mate_ref == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unknown mate reference '%.100s'", fields[6]);
                break;
            }
        }
        /* CIGAR into per-record scratch */
        int32_t rec_ops = 0;
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
                    if (c == d0 || c == cend || (code == 0 && oc != 'M')) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "invalid CIGAR: '%.50s'", fields[5]);
                        goto loop_done;
                    }
                    ++c;
                    if ((size_t)rec_ops + 1 > ops_cap) {
                        size_t ncap = ops_cap ? ops_cap * 2 : 256;
                        int8_t *no_ = realloc(ops_sc, ncap);
                        int32_t *nc =
                            realloc(cnt_sc, ncap * sizeof(int32_t));
                        if (no_)
                            ops_sc = no_;
                        if (nc)
                            cnt_sc = nc;
                        if (!no_ || !nc) {
                            err.kind = 2;
                            goto loop_done;
                        }
                        ops_cap = ncap;
                    }
                    ops_sc[rec_ops] = code;
                    cnt_sc[rec_ops] = (int32_t)count;
                    ++rec_ops;
                }
            }
        }
        /* tags into per-record scratch (dict semantics) */
        int rec_tags = 0;
        {
            const char *tp = p;
            while (tp < end) {
                const char *tab = memchr(tp, '\t', end - tp);
                const char *fend = tab ? tab : end;
                const char *c1 = memchr(tp, ':', fend - tp);
                if (!c1 || c1 + 2 > fend || c1[2] != ':') {
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "malformed tag field: %.50s", tp);
                    goto loop_done;
                }
                tagitem it;
                it.key = tp;
                it.klen = (int)(c1 - tp);
                it.typ = c1[1];
                it.val = c1 + 3;
                it.vlen = (int)(fend - (c1 + 3));
                it.synth = 0;
                int replaced = 0;
                for (int q2 = 0; q2 < rec_tags; ++q2)
                    if (tags_sc[q2].klen == it.klen &&
                        memcmp(tags_sc[q2].key, it.key, it.klen) == 0) {
                        tags_sc[q2] = it;
                        replaced = 1;
                        break;
                    }
                if (!replaced) {
                    if ((size_t)rec_tags + 1 > tags_cap) {
                        size_t ncap = tags_cap ? tags_cap * 2 : 64;
                        tagitem *nt =
                            realloc(tags_sc, ncap * sizeof(tagitem));
                        if (!nt) {
                            err.kind = 2;
                            goto loop_done;
                        }
                        tags_sc = nt;
                        tags_cap = ncap;
                    }
                    tags_sc[rec_tags++] = it;
                }
                tp = tab ? tab + 1 : end;
            }
        }

        sub_rec rec;
        memset(&rec, 0, sizeof rec);
        rec.qname = fields[0];
        rec.qname_len = flens[0];
        rec.flag = flag;
        rec.ref_id = ref_id;
        rec.pos = pos - 1;
        rec.mapq = mapq;
        rec.mate_ref = mate_ref;
        rec.mate_pos = pnext - 1;
        rec.tlen = tlen;
        rec.seq = fields[9];
        rec.seq_len = flens[9];
        rec.qual = fields[10];
        rec.qual_len = flens[10];
        rec.tag_off = 0;
        rec.n_tags = rec_tags;
        ++n_records;

        if (mode == 0) {
            /* -M: =/X -> M with cigar_buffer merging (cigar.cc:54-95) */
            int32_t n_new = 0;
            int8_t pend_op = -1;
            long pend_cnt = 0;
            for (int32_t k = 0; k <= rec_ops; ++k) {
                int8_t op;
                long cnt;
                if (k < rec_ops) {
                    op = ops_sc[k];
                    if (op == OP_EQ || op == OP_X)
                        op = OP_M;
                    cnt = cnt_sc[k];
                    if (cnt == 0)
                        continue;
                } else {
                    op = -2; /* flush */
                    cnt = 0;
                }
                if (op == pend_op) {
                    pend_cnt += cnt;
                    continue;
                }
                if (pend_op >= 0 && pend_cnt) {
                    if ((size_t)n_new + 1 > nops_cap) {
                        size_t ncap = nops_cap ? nops_cap * 2 : 256;
                        int8_t *no_ = realloc(nops_sc, ncap);
                        int32_t *nc =
                            realloc(ncnt_sc, ncap * sizeof(int32_t));
                        if (no_)
                            nops_sc = no_;
                        if (nc)
                            ncnt_sc = nc;
                        if (!no_ || !nc) {
                            err.kind = 2;
                            goto loop_done;
                        }
                        nops_cap = ncap;
                    }
                    nops_sc[n_new] = pend_op;
                    ncnt_sc[n_new] = (int32_t)pend_cnt;
                    ++n_new;
                }
                pend_op = op;
                pend_cnt = cnt;
            }
            if (sub_emit_record_cig(&out, &rec, nops_sc, ncnt_sc, n_new,
                                    tags_sc, NULL, out_nm, out_nml,
                                    n_refs_out, &err) < 0)
                break;
            continue;
        }

        /* -S */
        if (rec.pos < 0 || rec.ref_id < 0) {
            if (sub_emit_record_cig(&out, &rec, ops_sc, cnt_sc, rec_ops,
                                    tags_sc, NULL, out_nm, out_nml,
                                    n_refs_out, &err) < 0)
                break;
            continue;
        }
        {
            const unsigned char *ref =
                (const unsigned char *)refs[rec.ref_id];
            Py_ssize_t ref_len = ref_lens[rec.ref_id];
            const unsigned char *q = (const unsigned char *)rec.seq;
            long base = rec.pos;
            long qp = 0, rp = 0;
            size_t xn_len = 0;
            int32_t n_new = 0;
#define RW_PUSH(OPV, CNTV)                                                  \
    do {                                                                    \
        if ((size_t)n_new + 1 > nops_cap) {                                 \
            size_t ncap = nops_cap ? nops_cap * 2 : 256;                    \
            int8_t *no_ = realloc(nops_sc, ncap);                           \
            int32_t *nc = realloc(ncnt_sc, ncap * sizeof(int32_t));         \
            if (no_)                                                        \
                nops_sc = no_;                                              \
            if (nc)                                                         \
                ncnt_sc = nc;                                               \
            if (!no_ || !nc) {                                              \
                err.kind = 2;                                               \
                goto loop_done;                                             \
            }                                                               \
            nops_cap = ncap;                                                \
        }                                                                   \
        nops_sc[n_new] = (OPV);                                             \
        ncnt_sc[n_new] = (int32_t)(CNTV);                                   \
        ++n_new;                                                            \
    } while (0)
#define RW_FILL_XN(RP, CNT)                                                 \
    do {                                                                    \
        size_t need = ((size_t)(RP) + (size_t)(CNT) + 7) / 8;               \
        if (xn_len < need) {                                                \
            if (need > xn_cap) {                                            \
                size_t ncap = xn_cap ? xn_cap * 2 : 64;                     \
                while (ncap < need)                                         \
                    ncap *= 2;                                              \
                unsigned char *nx = realloc(xn_sc, ncap);                   \
                if (!nx) {                                                  \
                    err.kind = 2;                                           \
                    goto loop_done;                                         \
                }                                                           \
                xn_sc = nx;                                                 \
                xn_cap = ncap;                                              \
            }                                                               \
            memset(xn_sc + xn_len, 0, need - xn_len);                       \
            xn_len = need;                                                  \
        }                                                                   \
        if (base + (RP) + (CNT) > ref_len) {                                \
            err.kind = 1;                                                   \
            snprintf(err.msg, sizeof err.msg,                               \
                     "CIGAR overruns the reference");                       \
            goto loop_done;                                                 \
        }                                                                   \
        for (long i_ = 0; i_ < (CNT); ++i_)                                 \
            if (ref[base + (RP) + i_] == 'N')                               \
                xn_sc[((RP) + i_) / 8] |=                                   \
                    (unsigned char)(1u << (((RP) + i_) % 8));               \
    } while (0)

            for (int32_t k = 0; k < rec_ops; ++k) {
                int8_t op = ops_sc[k];
                long cnt = cnt_sc[k];
                switch (op) {
                case OP_H:
                case OP_P:
                    RW_PUSH(op, cnt);
                    break;
                case OP_I:
                case OP_S:
                    RW_PUSH(op, cnt);
                    qp += cnt;
                    break;
                case OP_EQ:
                case OP_X:
                    RW_PUSH(op, cnt);
                    RW_FILL_XN(rp, cnt);
                    qp += cnt;
                    rp += cnt;
                    break;
                case OP_D:
                case OP_N:
                    RW_PUSH(op, cnt);
                    RW_FILL_XN(rp, cnt);
                    rp += cnt;
                    break;
                case OP_M: {
                    RW_FILL_XN(rp, cnt);
                    if (qp >= rec.seq_len || qp + cnt > rec.seq_len) {
                        err.kind = 1;
                        snprintf(err.msg, sizeof err.msg,
                                 "CIGAR overruns SEQ");
                        goto loop_done;
                    }
                    long prev_cnt = 1;
                    int8_t prev = (q[qp] == ref[base + rp]) ? OP_EQ : OP_X;
                    for (long i = 1; i < cnt; ++i) {
                        int8_t cur = (q[qp + i] == ref[base + rp + i])
                                         ? OP_EQ
                                         : OP_X;
                        if (cur == prev) {
                            ++prev_cnt;
                        } else {
                            RW_PUSH(prev, prev_cnt);
                            prev_cnt = 1;
                            prev = cur;
                        }
                    }
                    RW_PUSH(prev, prev_cnt);
                    rp += cnt;
                    qp += cnt;
                    break;
                }
                default:
                    err.kind = 1;
                    snprintf(err.msg, sizeof err.msg,
                             "unexpected CIGAR operation '%c'",
                             pv3_op_char_table[op]);
                    goto loop_done;
                }
            }
#undef RW_PUSH
#undef RW_FILL_XN
            tagitem xn_it;
            tagitem *extra = NULL;
            if (xn_len) {
                xn_it.key = xn_tag;
                xn_it.klen = 2;
                xn_it.typ = 'B';
                xn_it.val = (const char *)xn_sc;
                xn_it.vlen = (int)xn_len;
                xn_it.synth = 12;
                extra = &xn_it;
            }
            if (sub_emit_record_cig(&out, &rec, nops_sc, ncnt_sc, n_new,
                                    tags_sc, extra, out_nm, out_nml,
                                    n_refs_out, &err) < 0)
                break;
        }
    }
loop_done:

    PyEval_RestoreThread(ts);
    ts = NULL;

    if (err.kind == 1) {
        PyErr_SetString(PyExc_ValueError, err.msg);
        goto fail;
    }
    if (err.kind == 2)
        goto oom;

    {
        PyObject *res = Py_BuildValue("(y#l)", out.buf ? out.buf : "",
                                      (Py_ssize_t)out.len, n_records);
        PyMem_Free(line_ptr);
        PyMem_Free(line_len_a);
        PyMem_Free(out_nm);
        PyMem_Free(out_nml);
        PyMem_Free(refs);
        PyMem_Free(ref_lens);
        PyMem_Free(ents);
        PyMem_Free(hslot);
        free(ops_sc);
        free(cnt_sc);
        free(nops_sc);
        free(ncnt_sc);
        free(xn_sc);
        free(tags_sc);
        free(out.buf);
        return res;
    }

oom:
    PyErr_NoMemory();
fail:
    if (ts)
        PyEval_RestoreThread(ts);
    PyMem_Free(line_ptr);
    PyMem_Free(line_len_a);
    PyMem_Free(out_nm);
    PyMem_Free(out_nml);
    PyMem_Free(refs);
    PyMem_Free(ref_lens);
    PyMem_Free(ents);
    PyMem_Free(hslot);
    free(ops_sc);
    free(cnt_sc);
    free(nops_sc);
    free(ncnt_sc);
    free(xn_sc);
    free(tags_sc);
    free(out.buf);
    return NULL;
}
