/* count_supporting_reads sweep engine.
 *
 * C implementation of the joint coordinate-sorted sweep of
 * pipeline/count_supporting_reads.py (itself a re-derivation of
 * /root/reference/count-supporting-reads/main.cc): the SAM record loop with
 * its filters and candidate set (alignment_reader::update_candidate_records,
 * main.cc:576-678), the dna11 allele walk (try_read_aligned_sequence,
 * main.cc:204-435) and the per-variant R-line emission.  VCF parsing,
 * variant validation/filters and V-line formatting stay in Python; the
 * engine receives batches of passing variants plus raw SAM line chunks and
 * keeps sweep state (candidates, counters, sortedness cursor) across calls
 * in a PyCapsule.
 *
 * Protocol (mirrors subset_filter_lines' chunk style, but stateful):
 *   csr_sweep_new(target_mask, refmap, primary_only, same_ref,
 *                 include_clipping, anchor_left) -> capsule
 *   csr_sweep_chunk(capsule, lines, var_pos, var_end, var_alt_len,
 *                   v_lines, eof) -> (blob, vars_done, lines_done, errflag)
 *   csr_sweep_stats(capsule) -> 7-tuple of counters
 *
 * A record whose position is beyond the current variant stays at the
 * stream head (lines_done excludes it) and is *fully reprocessed* on the
 * next variant, re-running every check and counter — exactly like the
 * reference's early return (main.cc:584-678) and the Python sweep.
 */

#include "panvc3_common.h"

/* --- small local copies of fastpath.c statics (separate TU) ------------- */

typedef struct {
    const char *name;
    Py_ssize_t len;
    long id;
} csr_refent;

static uint64_t csr_fnv1a(const char *s, Py_ssize_t n)
{
    uint64_t h = 1469598103934665603ULL;
    for (Py_ssize_t i = 0; i < n; ++i) {
        h ^= (unsigned char)s[i];
        h *= 1099511628211ULL;
    }
    return h;
}

static long csr_ref_lookup(const csr_refent *ents, const int32_t *hslot,
                           size_t hcap, const char *s, Py_ssize_t n)
{
    uint64_t h = csr_fnv1a(s, n) & (hcap - 1);
    for (;;) {
        int32_t e = hslot[h];
        if (e < 0)
            return -2;
        if (ents[e].len == n && memcmp(ents[e].name, s, n) == 0)
            return ents[e].id;
        h = (h + 1) & (hcap - 1);
    }
}

static int csr_parse_long(const char *s, const char *end, long *out)
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

typedef struct {
    int kind; /* 0 none, 1 ValueError, 2 oom */
    char msg[160];
} csr_err;

/* dna5 normalisation (alphabet.normalise_dna5): A/C/G/T upper or lower ->
   upper, U/u -> T, everything else -> N. */
static unsigned char csr_dna5[256];
/* dna11 rank order ACGNTacgnt~ (dna11_alphabet.hh:15-108) */
static unsigned char csr_dna11_rank[256];
static int csr_tables_ready = 0;

static void csr_tables_init(void)
{
    if (csr_tables_ready)
        return;
    memset(csr_dna5, 'N', sizeof csr_dna5);
    const char *u = "ACGT";
    for (int i = 0; i < 4; ++i) {
        csr_dna5[(unsigned char)u[i]] = (unsigned char)u[i];
        csr_dna5[(unsigned char)(u[i] + 32)] = (unsigned char)u[i];
    }
    csr_dna5['U'] = 'T';
    csr_dna5['u'] = 'T';
    memset(csr_dna11_rank, 255, sizeof csr_dna11_rank);
    const char *order = "ACGNTacgnt~";
    for (int i = 0; order[i]; ++i)
        csr_dna11_rank[(unsigned char)order[i]] = (unsigned char)i;
    csr_tables_ready = 1;
}

/* --- candidate set ------------------------------------------------------ */

typedef struct {
    long pos, ref_len, right_anchored, order;
    int32_t n_ops;
    Py_ssize_t seq_len;
    /* one allocation: [int32 counts][int8 ops][char seq] */
    int32_t *counts;
    int8_t *ops;
    char *seq;
    void *alloc;
} csr_cand;

typedef struct {
    /* config */
    int primary_only, same_ref, include_clipping, anchor_left;
    unsigned char *target; /* n_refs bytes, 1 = RNAME accepted */
    Py_ssize_t n_refs;
    csr_refent *ents;
    int32_t *hslot;
    size_t hcap;
    char *name_arena;
    /* sweep state */
    csr_cand *cands;
    size_t n_cands, cap_cands;
    long prev_pos;
    long order;
    /* statistics (AlignmentStatistics + zero_coverage) */
    long reads_processed, flags_not_matched, ref_id_mismatches,
        mate_ref_mismatches, position_mismatches, matched, zero_coverage;
} csr_state;

static void csr_state_free(csr_state *st)
{
    if (!st)
        return;
    for (size_t i = 0; i < st->n_cands; ++i)
        free(st->cands[i].alloc);
    free(st->cands);
    free(st->target);
    free(st->ents);
    free(st->hslot);
    free(st->name_arena);
    free(st);
}

static void csr_capsule_destructor(PyObject *cap)
{
    csr_state_free((csr_state *)PyCapsule_GetPointer(cap, "panvc3.csr"));
}

PyObject *pv3_csr_sweep_new(PyObject *self, PyObject *args)
{
    PyObject *mask_obj, *refmap;
    int primary_only, same_ref, include_clipping, anchor_left;
    if (!PyArg_ParseTuple(args, "SO!iiii", &mask_obj, &PyDict_Type, &refmap,
                          &primary_only, &same_ref, &include_clipping,
                          &anchor_left))
        return NULL;
    csr_tables_init();

    csr_state *st = calloc(1, sizeof(csr_state));
    if (!st)
        return PyErr_NoMemory();
    st->primary_only = primary_only;
    st->same_ref = same_ref;
    st->include_clipping = include_clipping;
    st->anchor_left = anchor_left;
    st->prev_pos = 0;

    st->n_refs = PyBytes_GET_SIZE(mask_obj);
    st->target = malloc(st->n_refs ? st->n_refs : 1);
    if (!st->target)
        goto oom;
    memcpy(st->target, PyBytes_AS_STRING(mask_obj), st->n_refs);

    {
        Py_ssize_t n_refs = PyDict_GET_SIZE(refmap);
        st->hcap = 8;
        while (st->hcap < (size_t)n_refs * 2)
            st->hcap <<= 1;
        st->ents = malloc((n_refs ? n_refs : 1) * sizeof(csr_refent));
        st->hslot = malloc(st->hcap * sizeof(int32_t));
        if (!st->ents || !st->hslot)
            goto oom;
        for (size_t i = 0; i < st->hcap; ++i)
            st->hslot[i] = -1;
        /* copy names into a state-owned arena: the capsule outlives the
           refmap dict's key objects */
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
                csr_fnv1a(st->name_arena + off, kl) & (st->hcap - 1);
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

    return PyCapsule_New(st, "panvc3.csr", csr_capsule_destructor);
oom:
    PyErr_NoMemory();
fail:
    csr_state_free(st);
    return NULL;
}

/* --- the allele walk (try_read_aligned_sequence) ------------------------ */

static int csr_can_continue(int8_t prev, int8_t op)
{
    if (prev == OP_D || prev == OP_N)
        return op == OP_D || op == OP_N;
    if (prev == OP_H || prev == OP_P)
        return op == OP_H || op == OP_P;
    return prev == op;
}

static int csr_put_lower(pv3_strbuf *sb, const char *s, long n)
{
    if (pv3_sb_reserve(sb, (size_t)n) < 0)
        return -1;
    for (long k = 0; k < n; ++k)
        sb->buf[sb->len + k] = (char)(s[k] + 32); /* ACGTN -> acgtn */
    sb->len += (size_t)n;
    return 0;
}

/* Python slice semantics for the query pieces: seq[seg_pos:seg_pos+n]
   silently truncates when a (malformed) CIGAR claims more query than SEQ
   holds — clamp the COPY length the same way (the position arithmetic
   keeps the unclamped values). */
static long csr_clamp_len(const csr_cand *c, long seg_pos, long n)
{
    if (seg_pos >= c->seq_len)
        return 0;
    long avail = c->seq_len - seg_pos;
    return n < avail ? n : avail;
}

/* Returns 1 when an allele was appended to sb, 0 when the walk fails
   (Python returns None), -1 on oom, -2 on an unexpected CIGAR op.
   last_tilde replicates `out and out[-1].endswith("~")` over the Python
   piece list: the only piece containing '~' is the "~" marker itself, and
   empty pieces reset the flag just like an appended "". */
static int csr_walk(const csr_cand *c, long var_pos, long var_ref_len,
                    long var_alt_len, int include_clipping, pv3_strbuf *sb)
{
    int32_t i = 0, n = c->n_ops;
    long seg_pos = 0, pos = c->pos;
    long op_count = 0;
    int8_t op = CODE_NONE;
    int last_tilde = 0;
    int broke = 0;

    while (i < n) {
        op_count = c->counts[i];
        op = c->ops[i];
        if (pos < var_pos) {
            if (pv3_is_mtype_op(op)) {
                long step =
                    var_pos - pos < op_count ? var_pos - pos : op_count;
                op_count -= step;
                pos += step;
                seg_pos += step;
                if (!op_count) {
                    ++i;
                    continue;
                }
            } else if (op == OP_D || op == OP_N) {
                long step =
                    var_pos - pos < op_count ? var_pos - pos : op_count;
                op_count -= step;
                pos += step;
                if (!op_count) {
                    ++i;
                    continue;
                }
            } else if (op == OP_I || op == OP_S) {
                seg_pos += op_count;
                ++i;
                continue;
            } else {
                ++i;
                continue;
            }
        }

        if (pv3_is_mtype_op(op)) {
            long step = op_count < var_ref_len ? op_count : var_ref_len;
            if (pv3_sb_put(sb, c->seq + seg_pos,
                           (size_t)csr_clamp_len(c, seg_pos, step)) < 0)
                return -1;
            last_tilde = 0;
            seg_pos += step;
            var_ref_len -= var_ref_len < step ? var_ref_len : step;
            var_alt_len -= var_alt_len < step ? var_alt_len : step;
            op_count -= step;
            if (op_count && var_ref_len == 0) {
                /* aligned nucleotides remain: no insertion here */
                var_alt_len = 0;
            }
        } else if (op == OP_I) {
            if (pv3_sb_put(sb, c->seq + seg_pos,
                           (size_t)csr_clamp_len(c, seg_pos, op_count)) < 0)
                return -1;
            last_tilde = 0;
            seg_pos += op_count;
            var_alt_len -= var_alt_len < op_count ? var_alt_len : op_count;
            op_count = 0;
        } else if (op == OP_D || op == OP_N) {
            if (var_ref_len < op_count && !last_tilde) {
                if (pv3_sb_putc(sb, '~') < 0)
                    return -1;
                last_tilde = 1;
            }
            var_ref_len -= var_ref_len < op_count ? var_ref_len : op_count;
            op_count = 0;
        } else if (op == OP_S) {
            if (include_clipping) {
                if (csr_put_lower(sb, c->seq + seg_pos,
                                  csr_clamp_len(c, seg_pos, op_count)) < 0)
                    return -1;
                last_tilde = 0;
            }
            seg_pos += op_count;
            var_alt_len -= var_alt_len < op_count ? var_alt_len : op_count;
            op_count = 0;
        } else if (op == OP_H || op == OP_P) {
            op_count = 0;
        } else {
            return -2;
        }

        if (var_ref_len == 0 && var_alt_len == 0) {
            broke = 1;
            break;
        }
        ++i;
    }
    if (!broke)
        return 0; /* the while-else: return None */

    /* trailing same-type operation continuation (main.cc:355-418) */
    if (op_count == 0 && i < n) {
        int8_t prev_op = op;
        ++i;
        while (i < n) {
            long cnt = c->counts[i];
            int8_t op2 = c->ops[i];
            if (op2 == OP_S) {
                if (include_clipping) {
                    if (csr_put_lower(sb, c->seq + seg_pos,
                                      csr_clamp_len(c, seg_pos, cnt)) < 0)
                        return -1;
                    last_tilde = 0;
                }
                seg_pos += cnt;
                ++i;
                continue;
            }
            if (!csr_can_continue(prev_op, op2))
                break;
            if (op2 == OP_I) {
                if (pv3_sb_put(sb, c->seq + seg_pos,
                               (size_t)csr_clamp_len(c, seg_pos, cnt)) < 0)
                    return -1;
                last_tilde = 0;
                seg_pos += cnt;
            } else if (op2 == OP_D || op2 == OP_N) {
                if (!last_tilde) {
                    if (pv3_sb_putc(sb, '~') < 0)
                        return -1;
                    last_tilde = 1;
                }
            } else if (op2 == OP_H || op2 == OP_P) {
                /* nothing */
            } else {
                return -2;
            }
            ++i;
        }
    }
    return 1;
}

/* --- the record sweep (AlignmentSweep.update) --------------------------- */

/* Advance the record stream for var_pos.  Returns 1 when the variant's
   candidate set is final (a beyond-position record was left pending, or
   the stream truly ended), 0 when more lines are needed, -1 on error. */
static int csr_update(csr_state *st, const char **lp, const Py_ssize_t *ll,
                      Py_ssize_t n_lines, Py_ssize_t *cur, long var_pos,
                      int eof, int32_t **ops_sc, int32_t *ops_cap,
                      csr_err *err)
{
    /* evict candidates no longer overlapping (erase-behind set) */
    {
        size_t w = 0;
        for (size_t i = 0; i < st->n_cands; ++i) {
            csr_cand *c = &st->cands[i];
            if (c->pos + c->ref_len > var_pos)
                st->cands[w++] = *c;
            else
                free(c->alloc);
        }
        st->n_cands = w;
    }

    for (;;) {
        if (*cur >= n_lines)
            return eof ? 1 : 0;
        const char *line = lp[*cur];
        Py_ssize_t line_len = ll[*cur];
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
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg,
                     "truncated SAM record: %.100s", line);
            return -1;
        }
        long flag, pos1;
        if (csr_parse_long(fields[1], fields[1] + flens[1], &flag) != 0 ||
            csr_parse_long(fields[3], fields[3] + flens[3], &pos1) != 0) {
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg,
                     "malformed SAM record: %.100s", line);
            return -1;
        }
        long pos = pos1 - 1;

        ++st->reads_processed;
        /* 0x4 unmapped | 0x200 QC fail | 0x400 dup | 0x800 suppl. */
        if (flag & (0x4 | 0x200 | 0x400 | 0x800)) {
            ++st->flags_not_matched;
            ++*cur;
            continue;
        }
        if (st->primary_only && (flag & 0x100)) {
            ++st->flags_not_matched;
            ++*cur;
            continue;
        }
        long ref_id = -1;
        if (!(flens[2] == 1 && fields[2][0] == '*')) {
            ref_id = csr_ref_lookup(st->ents, st->hslot, st->hcap, fields[2],
                                    flens[2]);
            if (ref_id == -2) {
                err->kind = 1;
                snprintf(err->msg, sizeof err->msg,
                         "unknown reference '%.100s'", fields[2]);
                return -1;
            }
        }
        if (ref_id < 0 || !st->target[ref_id]) {
            ++st->ref_id_mismatches;
            ++*cur;
            continue;
        }
        if (st->same_ref) {
            long mate_ref = -1;
            if (flens[6] == 1 && fields[6][0] == '*') {
                mate_ref = -1;
            } else if (flens[6] == 1 && fields[6][0] == '=') {
                mate_ref = ref_id;
            } else {
                mate_ref = csr_ref_lookup(st->ents, st->hslot, st->hcap,
                                          fields[6], flens[6]);
                if (mate_ref == -2) {
                    err->kind = 1;
                    snprintf(err->msg, sizeof err->msg,
                             "unknown mate reference '%.100s'", fields[6]);
                    return -1;
                }
            }
            if (mate_ref < 0 || !st->target[mate_ref]) {
                ++st->mate_ref_mismatches;
                ++*cur;
                continue;
            }
        }
        if (pos < 0) {
            ++st->flags_not_matched;
            ++*cur;
            continue;
        }
        if (st->prev_pos > pos) {
            err->kind = 1;
            snprintf(err->msg, sizeof err->msg,
                     "alignments must be sorted by position");
            return -1;
        }
        st->prev_pos = pos;

        if (pos > var_pos) {
            /* leave at the stream head; fully reprocessed next call */
            ++st->position_mismatches;
            return 1;
        }

        /* parse CIGAR; record lengths (calculate_record_lengths) */
        int32_t n_ops = 0;
        long ref_len = 0, right_anchored = 0;
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
                        err->kind = 1;
                        snprintf(err->msg, sizeof err->msg,
                                 "invalid CIGAR: '%.50s'", fields[5]);
                        return -1;
                    }
                    ++c;
                    if (n_ops + 1 > *ops_cap) {
                        int32_t ncap = *ops_cap ? *ops_cap * 2 : 256;
                        int32_t *ns =
                            realloc(*ops_sc, (size_t)ncap * 2 *
                                                 sizeof(int32_t));
                        if (!ns) {
                            err->kind = 2;
                            return -1;
                        }
                        /* layout: counts in [0,cap), op codes in
                           [cap, 2cap) — move the codes when growing */
                        memmove(ns + ncap, ns + *ops_cap,
                                (size_t)n_ops * sizeof(int32_t));
                        *ops_sc = ns;
                        *ops_cap = ncap;
                    }
                    (*ops_sc)[n_ops] = (int32_t)count;
                    (*ops_sc)[*ops_cap + n_ops] = code;
                    ++n_ops;
                    if (pv3_is_mtype_op(code)) {
                        ref_len += count;
                        right_anchored = ref_len;
                    } else if (code == OP_D || code == OP_N) {
                        ref_len += count;
                    }
                }
            }
        }
        if (pos + ref_len <= var_pos) {
            ++st->position_mismatches;
            ++*cur;
            continue;
        }

        ++st->matched;
        /* the reference's candidate container is keyed by position only
           (std::set, main.cc:479-484,677): a second record at a present
           start position is not inserted.  Positions arrive nondecreasing,
           so only the tail can collide. */
        int dup = 0;
        for (size_t k = st->n_cands; k > 0; --k) {
            if (st->cands[k - 1].pos != pos)
                break;
            dup = 1;
            break;
        }
        if (!dup) {
            if (st->n_cands + 1 > st->cap_cands) {
                size_t ncap = st->cap_cands ? st->cap_cands * 2 : 64;
                csr_cand *nc =
                    realloc(st->cands, ncap * sizeof(csr_cand));
                if (!nc) {
                    err->kind = 2;
                    return -1;
                }
                st->cands = nc;
                st->cap_cands = ncap;
            }
            csr_cand *cd = &st->cands[st->n_cands];
            Py_ssize_t seq_len = flens[9];
            size_t need = (size_t)n_ops * sizeof(int32_t) +
                          (size_t)n_ops + (size_t)seq_len;
            void *blk = malloc(need ? need : 1);
            if (!blk) {
                err->kind = 2;
                return -1;
            }
            cd->alloc = blk;
            cd->counts = (int32_t *)blk;
            cd->ops = (int8_t *)((int32_t *)blk + n_ops);
            cd->seq = (char *)(cd->ops + n_ops);
            memcpy(cd->counts, *ops_sc, (size_t)n_ops * sizeof(int32_t));
            for (int32_t k = 0; k < n_ops; ++k)
                cd->ops[k] = (int8_t)(*ops_sc)[*ops_cap + k];
            for (Py_ssize_t k = 0; k < seq_len; ++k)
                cd->seq[k] = (char)csr_dna5[(unsigned char)fields[9][k]];
            cd->seq_len = seq_len;
            cd->n_ops = n_ops;
            cd->pos = pos;
            cd->ref_len = ref_len;
            cd->right_anchored = right_anchored;
            cd->order = st->order;
            ++st->n_cands;
        }
        ++st->order;
        ++*cur;
    }
}

/* --- per-variant allele emission ---------------------------------------- */

typedef struct {
    const char *s;
    size_t len;
} csr_allele;

static int csr_allele_cmp(const void *a_, const void *b_)
{
    const csr_allele *a = a_, *b = b_;
    size_t n = a->len < b->len ? a->len : b->len;
    for (size_t i = 0; i < n; ++i) {
        int ra = csr_dna11_rank[(unsigned char)a->s[i]];
        int rb = csr_dna11_rank[(unsigned char)b->s[i]];
        if (ra != rb)
            return ra < rb ? -1 : 1;
    }
    if (a->len != b->len)
        return a->len < b->len ? -1 : 1;
    return 0;
}

PyObject *pv3_csr_sweep_chunk(PyObject *self, PyObject *args)
{
    PyObject *cap, *lines, *vpos_l, *vend_l, *valt_l, *vlines;
    int eof;
    if (!PyArg_ParseTuple(args, "OO!O!O!O!O!i", &cap, &PyList_Type, &lines,
                          &PyList_Type, &vpos_l, &PyList_Type, &vend_l,
                          &PyList_Type, &valt_l, &PyList_Type, &vlines,
                          &eof))
        return NULL;
    csr_state *st = PyCapsule_GetPointer(cap, "panvc3.csr");
    if (!st)
        return NULL;

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    Py_ssize_t n_vars = PyList_GET_SIZE(vpos_l);
    if (PyList_GET_SIZE(vend_l) != n_vars ||
        PyList_GET_SIZE(valt_l) != n_vars ||
        PyList_GET_SIZE(vlines) != n_vars) {
        PyErr_SetString(PyExc_ValueError, "variant array length mismatch");
        return NULL;
    }

    const char **lp = NULL;
    Py_ssize_t *ll = NULL;
    long *vpos = NULL, *vend = NULL, *valt = NULL;
    const char **vl = NULL;
    Py_ssize_t *vll = NULL;
    int32_t *ops_sc = NULL;
    int32_t ops_cap = 0;
    csr_allele *alleles = NULL;
    size_t alleles_cap = 0;
    size_t *aoff = NULL, *alen = NULL;
    pv3_strbuf scratch = {NULL, 0, 0};
    pv3_strbuf out = {NULL, 0, 0};
    PyThreadState *ts = NULL;
    csr_err err = {0, {0}};
    Py_ssize_t cur = 0, vi = 0;
    int errflag = 0;

    lp = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(char *));
    ll = PyMem_Malloc((n_lines ? n_lines : 1) * sizeof(Py_ssize_t));
    vpos = PyMem_Malloc((n_vars ? n_vars : 1) * sizeof(long));
    vend = PyMem_Malloc((n_vars ? n_vars : 1) * sizeof(long));
    valt = PyMem_Malloc((n_vars ? n_vars : 1) * sizeof(long));
    vl = PyMem_Malloc((n_vars ? n_vars : 1) * sizeof(char *));
    vll = PyMem_Malloc((n_vars ? n_vars : 1) * sizeof(Py_ssize_t));
    if (!lp || !ll || !vpos || !vend || !valt || !vl || !vll)
        goto oom;
    for (Py_ssize_t i = 0; i < n_lines; ++i) {
        char *p;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, i), &p, &ll[i]) <
            0)
            goto fail;
        lp[i] = p;
    }
    for (Py_ssize_t i = 0; i < n_vars; ++i) {
        vpos[i] = PyLong_AsLong(PyList_GET_ITEM(vpos_l, i));
        vend[i] = PyLong_AsLong(PyList_GET_ITEM(vend_l, i));
        valt[i] = PyLong_AsLong(PyList_GET_ITEM(valt_l, i));
        if (PyErr_Occurred())
            goto fail;
        char *p;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(vlines, i), &p,
                                    &vll[i]) < 0)
            goto fail;
        vl[i] = p;
    }

    ts = PyEval_SaveThread();

    for (; vi < n_vars; ++vi) {
        int r = csr_update(st, lp, ll, n_lines, &cur, vpos[vi], eof,
                           &ops_sc, &ops_cap, &err);
        if (r < 0)
            goto loop_done;
        if (r == 0)
            break; /* need more lines for this variant */

        if (st->n_cands == 0) {
            ++st->zero_coverage;
            continue;
        }
        if (pv3_sb_put(&out, vl[vi], (size_t)vll[vi]) < 0)
            goto oom_nogil;
        if (valt[vi] < 0) {
            /* multi-ALT: Python raises after the V line */
            errflag = 1;
            goto loop_done;
        }

        long var_ref_len = vend[vi] - vpos[vi];
        size_t n_alleles = 0;
        scratch.len = 0;
        if (alleles_cap < st->n_cands) {
            size_t ncap = st->n_cands * 2;
            csr_allele *na = realloc(alleles, ncap * sizeof(csr_allele));
            size_t *no_ = realloc(aoff, ncap * sizeof(size_t));
            size_t *nl = realloc(alen, ncap * sizeof(size_t));
            if (na)
                alleles = na;
            if (no_)
                aoff = no_;
            if (nl)
                alen = nl;
            if (!na || !no_ || !nl)
                goto oom_nogil;
            alleles_cap = ncap;
        }
        /* candidates are already sorted by (pos, order): positions are
           nondecreasing at insertion and order strictly increases */
        for (size_t k = 0; k < st->n_cands; ++k) {
            const csr_cand *c = &st->cands[k];
            int contained =
                st->anchor_left
                    ? vend[vi] <= c->pos + c->ref_len
                    : vend[vi] < c->pos + c->right_anchored;
            if (!contained)
                continue;
            size_t off0 = scratch.len;
            int w = csr_walk(c, vpos[vi], var_ref_len, valt[vi],
                             st->include_clipping, &scratch);
            if (w == -1)
                goto oom_nogil;
            if (w == -2) {
                err.kind = 1;
                snprintf(err.msg, sizeof err.msg,
                         "unexpected CIGAR operation");
                goto loop_done;
            }
            if (w == 0) {
                scratch.len = off0;
                continue;
            }
            aoff[n_alleles] = off0;
            alen[n_alleles] = scratch.len - off0;
            ++n_alleles;
        }
        /* resolve offsets after all appends (scratch may have realloc'd) */
        for (size_t k = 0; k < n_alleles; ++k) {
            alleles[k].s = scratch.buf + aoff[k];
            alleles[k].len = alen[k];
        }
        qsort(alleles, n_alleles, sizeof(csr_allele), csr_allele_cmp);
        for (size_t k = 0; k < n_alleles;) {
            size_t j = k + 1;
            while (j < n_alleles &&
                   alleles[j].len == alleles[k].len &&
                   memcmp(alleles[j].s, alleles[k].s, alleles[k].len) == 0)
                ++j;
            if (pv3_sb_put(&out, "R\t", 2) < 0 ||
                pv3_sb_put_long(&out, (long)(j - k)) < 0 ||
                pv3_sb_putc(&out, '\t') < 0)
                goto oom_nogil;
            if (alleles[k].len == 0) {
                if (pv3_sb_put(&out, "<DEL>", 5) < 0)
                    goto oom_nogil;
            } else if (pv3_sb_put(&out, alleles[k].s, alleles[k].len) < 0)
                goto oom_nogil;
            if (pv3_sb_putc(&out, '\n') < 0)
                goto oom_nogil;
            k = j;
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
        PyObject *res = Py_BuildValue(
            "(y#nni)", out.buf ? out.buf : "", (Py_ssize_t)out.len, vi, cur,
            errflag);
        PyMem_Free(lp);
        PyMem_Free(ll);
        PyMem_Free(vpos);
        PyMem_Free(vend);
        PyMem_Free(valt);
        PyMem_Free(vl);
        PyMem_Free(vll);
        free(ops_sc);
        free(alleles);
        free(aoff);
        free(alen);
        free(scratch.buf);
        free(out.buf);
        return res;
    }

oom_nogil:
    err.kind = 2;
    PyEval_RestoreThread(ts);
    ts = NULL;
oom:
    PyErr_NoMemory();
fail:
    if (ts)
        PyEval_RestoreThread(ts);
    PyMem_Free(lp);
    PyMem_Free(ll);
    PyMem_Free(vpos);
    PyMem_Free(vend);
    PyMem_Free(valt);
    PyMem_Free(vl);
    PyMem_Free(vll);
    free(ops_sc);
    free(alleles);
    free(aoff);
    free(alen);
    free(scratch.buf);
    free(out.buf);
    return NULL;
}

PyObject *pv3_csr_sweep_stats(PyObject *self, PyObject *args)
{
    PyObject *cap;
    if (!PyArg_ParseTuple(args, "O", &cap))
        return NULL;
    csr_state *st = PyCapsule_GetPointer(cap, "panvc3.csr");
    if (!st)
        return NULL;
    return Py_BuildValue("(lllllll)", st->reads_processed,
                         st->flags_not_matched, st->ref_id_mismatches,
                         st->mate_ref_mismatches, st->position_mismatches,
                         st->matched, st->zero_coverage);
}

/* --- VCF record-line batch parser ---------------------------------------
 *
 * csr_parse_vcf(lines, lineno_start, end_key, co_key, usra_key)
 *   -> (vlines, chroms, meta_bytes, n)
 *
 * Parses VCF record lines for the count_supporting_reads fast driver
 * (io/vcf.py semantics): per variant the preformatted V output line
 * ("V\tchrom\tpos\tids\talts_txt\t..." with ids ';'->',' and
 * <DEL>/<DEL:ME> ALT mapping), the chromosome, and an int64[ n ][8] row
 * [pos0, end0, alt_len, n_alts, zyg, gt_len, lineno, flags].
 * flags bit 0 = parse anomaly: the caller must re-parse that line with
 * the Python reader to reproduce its exact error/behaviour.  Blank and
 * '#' lines are skipped but still advance the line number.  Everything
 * else (sortedness, region/chr/zygosity filters, error raising) stays in
 * Python on the returned values. */

#define CSR_VMETA 8

static int csr_vcf_one(const char *line, Py_ssize_t len, long lineno,
                       const char *end_key, Py_ssize_t end_len,
                       const char *co_key, Py_ssize_t co_len,
                       const char *usra_key, Py_ssize_t usra_len,
                       pv3_strbuf *vline, int64_t *meta,
                       const char **chrom, Py_ssize_t *chrom_len)
{
    const char *f[10] = {0};
    Py_ssize_t fl[10] = {0};
    int nf = 0;
    const char *p = line, *end = line + len;
    while (nf < 10) {
        const char *tab = memchr(p, '\t', end - p);
        f[nf] = p;
        fl[nf] = (tab ? tab : end) - p;
        ++nf;
        if (!tab)
            break;
        p = tab + 1;
    }
    if (nf < 5)
        return -1;

    long pos1;
    if (csr_parse_long(f[1], f[1] + fl[1], &pos1) != 0)
        return -1;
    long pos0 = pos1 - 1;

    /* alts: raw first-ALT length; n_alts; display text with DEL mapping */
    long n_alts = 0, alt_len = -1;
    if (!(fl[4] == 1 && f[4][0] == '.')) {
        n_alts = 1;
        const char *c = f[4], *ae = f[4] + fl[4];
        const char *first_end = memchr(c, ',', ae - c);
        alt_len = (first_end ? first_end : ae) - c;
        for (const char *q = c; q < ae; ++q)
            if (*q == ',')
                ++n_alts;
    }

    /* INFO: END value, CO/USRA presence */
    long end0 = pos0 + fl[3]; /* default: pos + len(REF) */
    int reversed = 0;
    if (nf > 7 && !(fl[7] == 1 && f[7][0] == '.')) {
        const char *c = f[7], *ie = f[7] + fl[7];
        while (c < ie) {
            const char *semi = memchr(c, ';', ie - c);
            const char *te = semi ? semi : ie;
            const char *eq = memchr(c, '=', te - c);
            Py_ssize_t klen = (eq ? eq : te) - c;
            if ((klen == co_len && memcmp(c, co_key, klen) == 0) ||
                (klen == usra_len && memcmp(c, usra_key, klen) == 0))
                reversed = 1;
            if (eq && klen == end_len && memcmp(c, end_key, klen) == 0) {
                long v;
                if (csr_parse_long(eq + 1, te, &v) != 0)
                    return -1;
                end0 = v;
            }
            c = te + 1;
        }
    }

    /* GT of sample 0 */
    long zyg = 0, gt_len = 0;
    {
        if (nf < 10)
            return -1; /* no FORMAT/sample -> Python fallback */
        /* find GT index in FORMAT */
        long gi = -1, idx = 0;
        const char *c = f[8], *fe = f[8] + fl[8];
        while (c <= fe) {
            const char *colon = memchr(c, ':', fe - c);
            const char *te = colon ? colon : fe;
            if (te - c == 2 && c[0] == 'G' && c[1] == 'T') {
                gi = idx;
                break;
            }
            if (!colon)
                break;
            c = colon + 1;
            ++idx;
        }
        if (gi < 0)
            return -1; /* lacks GT -> Python raises its error */
        /* sample 0 value #gi (missing -> ".") */
        const char *sv = f[9], *se = f[9] + fl[9];
        long k = 0;
        const char *vstart = sv, *vend = se;
        int found = 0;
        while (k <= gi) {
            const char *colon = memchr(vstart, ':', se - vstart);
            vend = colon ? colon : se;
            if (k == gi) {
                found = 1;
                break;
            }
            if (!colon)
                break;
            vstart = colon + 1;
            ++k;
        }
        if (!found) {
            /* fewer sample fields than gi: Python substitutes "." */
            vstart = vend = se;
        }
        /* split on | and / */
        const char *c2 = vstart;
        const char *part = c2;
        for (;; ++c2) {
            if (c2 == vend || *c2 == '|' || *c2 == '/') {
                Py_ssize_t plen = c2 - part;
                ++gt_len;
                if (plen == 1 && part[0] == '.') {
                    /* None allele */
                } else {
                    long av;
                    if (csr_parse_long(part, part + plen, &av) != 0)
                        return -1; /* malformed int -> Python error */
                    if (av)
                        ++zyg;
                }
                if (c2 == vend)
                    break;
                part = c2 + 1;
            }
        }
        if (vstart == vend && gt_len == 1) {
            /* empty value parsed as one empty part: Python int("") raises */
            return -1;
        }
    }

    /* V line: V\tchrom\tpos\tids(;->,)\tref\talts_txt\tzyg\treversed\n */
    if (pv3_sb_put(vline, "V\t", 2) < 0 ||
        pv3_sb_put(vline, f[0], fl[0]) < 0 || pv3_sb_putc(vline, '\t') < 0 ||
        pv3_sb_put_long(vline, pos0) < 0 || pv3_sb_putc(vline, '\t') < 0)
        return -2;
    {
        /* ids */
        if (pv3_sb_reserve(vline, (size_t)fl[2] + 1) < 0)
            return -2;
        for (Py_ssize_t i = 0; i < fl[2]; ++i)
            vline->buf[vline->len + i] = f[2][i] == ';' ? ',' : f[2][i];
        vline->len += (size_t)fl[2];
    }
    if (pv3_sb_putc(vline, '\t') < 0 ||
        pv3_sb_put(vline, f[3], fl[3]) < 0 || pv3_sb_putc(vline, '\t') < 0)
        return -2;
    if (n_alts == 0) {
        /* alts == [] -> ",".join([]) == "" */
    } else {
        const char *c = f[4], *ae = f[4] + fl[4];
        int first = 1;
        while (c < ae) {
            const char *comma = memchr(c, ',', ae - c);
            const char *te = comma ? comma : ae;
            if (!first && pv3_sb_putc(vline, ',') < 0)
                return -2;
            first = 0;
            Py_ssize_t al = te - c;
            if ((al == 5 && memcmp(c, "<DEL>", 5) == 0) ||
                (al == 8 && memcmp(c, "<DEL:ME>", 8) == 0)) {
                if (pv3_sb_put(vline, "<DEL>", 5) < 0)
                    return -2;
            } else if (pv3_sb_put(vline, c, al) < 0)
                return -2;
            c = te + 1;
        }
    }
    if (pv3_sb_putc(vline, '\t') < 0 || pv3_sb_put_long(vline, zyg) < 0 ||
        pv3_sb_putc(vline, '\t') < 0 ||
        pv3_sb_put_long(vline, reversed) < 0 ||
        pv3_sb_putc(vline, '\n') < 0)
        return -2;

    meta[0] = pos0;
    meta[1] = end0;
    meta[2] = n_alts == 1 ? alt_len : -1;
    meta[3] = n_alts;
    meta[4] = zyg;
    meta[5] = gt_len;
    meta[6] = lineno;
    meta[7] = 0;
    *chrom = f[0];
    *chrom_len = fl[0];
    return 0;
}

PyObject *pv3_csr_parse_vcf(PyObject *self, PyObject *args)
{
    PyObject *lines;
    long lineno_start;
    const char *end_key, *co_key, *usra_key;
    Py_ssize_t end_len, co_len, usra_len;
    if (!PyArg_ParseTuple(args, "O!ls#s#s#", &PyList_Type, &lines,
                          &lineno_start, &end_key, &end_len, &co_key,
                          &co_len, &usra_key, &usra_len))
        return NULL;

    Py_ssize_t n_lines = PyList_GET_SIZE(lines);
    PyObject *vlines = PyList_New(0);
    PyObject *chroms = PyList_New(0);
    PyObject *meta_b = NULL, *res = NULL;
    int64_t *meta = NULL;
    Py_ssize_t n = 0, cap = n_lines ? n_lines : 1;
    pv3_strbuf vbuf = {NULL, 0, 0};
    if (!vlines || !chroms)
        goto fail;
    meta = malloc(cap * CSR_VMETA * sizeof(int64_t));
    if (!meta)
        goto oom;

    for (Py_ssize_t li = 0; li < n_lines; ++li) {
        char *lp;
        Py_ssize_t ll;
        if (PyBytes_AsStringAndSize(PyList_GET_ITEM(lines, li), &lp, &ll) <
            0)
            goto fail;
        while (ll > 0 && (lp[ll - 1] == '\n' || lp[ll - 1] == '\r'))
            --ll;
        long lineno = lineno_start + li;
        if (ll == 0 || lp[0] == '#')
            continue;
        const char *chrom = "";
        Py_ssize_t chrom_len = 0;
        vbuf.len = 0;
        int r = csr_vcf_one(lp, ll, lineno, end_key, end_len, co_key,
                            co_len, usra_key, usra_len, &vbuf, meta +
                            n * CSR_VMETA, &chrom, &chrom_len);
        if (r == -2)
            goto oom;
        PyObject *vo, *co;
        if (r == -1) {
            /* anomaly: flag for a Python re-parse of this exact line */
            int64_t *m = meta + n * CSR_VMETA;
            memset(m, 0, CSR_VMETA * sizeof(int64_t));
            m[6] = lineno;
            m[7] = 1;
            vo = PyBytes_FromStringAndSize(lp, ll);
            co = PyBytes_FromStringAndSize("", 0);
        } else {
            vo = PyBytes_FromStringAndSize(vbuf.buf, (Py_ssize_t)vbuf.len);
            co = PyBytes_FromStringAndSize(chrom, chrom_len);
        }
        if (!vo || !co) {
            Py_XDECREF(vo);
            Py_XDECREF(co);
            goto fail;
        }
        if (PyList_Append(vlines, vo) < 0 || PyList_Append(chroms, co) < 0) {
            Py_DECREF(vo);
            Py_DECREF(co);
            goto fail;
        }
        Py_DECREF(vo);
        Py_DECREF(co);
        ++n;
    }

    meta_b = PyBytes_FromStringAndSize((const char *)meta,
                                       n * CSR_VMETA * sizeof(int64_t));
    if (!meta_b)
        goto fail;
    res = Py_BuildValue("(OONn)", vlines, chroms, meta_b, n);
    Py_DECREF(vlines);
    Py_DECREF(chroms);
    free(meta);
    free(vbuf.buf);
    return res;

oom:
    PyErr_NoMemory();
fail:
    Py_XDECREF(vlines);
    Py_XDECREF(chroms);
    Py_XDECREF(meta_b);
    free(meta);
    free(vbuf.buf);
    return NULL;
}

/* --- POSITION/COVERAGE TSV codec -----------------------------------------
 * For the coverage post-processing tools (alignment-statistics scripts):
 * genome-length coverage TSVs are one line per position, so the Python
 * line loop dominates.  parse returns two int64 column arrays; format
 * emits the canonical "pos\tcov\n" rows. */

PyObject *pv3_parse_pos_cov(PyObject *self, PyObject *args)
{
    Py_buffer blob;
    if (!PyArg_ParseTuple(args, "y*", &blob))
        return NULL;
    const char *p = blob.buf, *end = p + blob.len;

    /* count rows (newlines, plus an unterminated final line) */
    Py_ssize_t n = 0;
    for (const char *c = p; c < end; ++c)
        if (*c == '\n')
            ++n;
    if (blob.len && end[-1] != '\n')
        ++n;

    PyObject *pos_o = PyBytes_FromStringAndSize(NULL, n * 8);
    PyObject *cov_o = PyBytes_FromStringAndSize(NULL, n * 8);
    if (!pos_o || !cov_o) {
        Py_XDECREF(pos_o);
        Py_XDECREF(cov_o);
        PyBuffer_Release(&blob);
        return NULL;
    }
    int64_t *pos = (int64_t *)PyBytes_AS_STRING(pos_o);
    int64_t *cov = (int64_t *)PyBytes_AS_STRING(cov_o);
    Py_ssize_t k = 0;
    int bad = 0;

    PyThreadState *ts = PyEval_SaveThread();
    while (p < end) {
        const char *nl = memchr(p, '\n', end - p);
        const char *le = nl ? nl : end;
        if (le > p) { /* skip blank lines */
            int64_t a = 0, b = 0;
            const char *c = p;
            int neg = 0;
            if (c < le && *c == '-') {
                neg = 1;
                ++c;
            }
            const char *d0 = c;
            while (c < le && *c >= '0' && *c <= '9')
                a = a * 10 + (*c++ - '0');
            if (c == d0 || c >= le || *c != '\t') {
                bad = 1;
                break;
            }
            if (neg)
                a = -a;
            ++c;
            int neg2 = 0;
            if (c < le && *c == '-') {
                neg2 = 1;
                ++c;
            }
            const char *d1 = c;
            while (c < le && *c >= '0' && *c <= '9')
                b = b * 10 + (*c++ - '0');
            if (c == d1 || c != le) {
                bad = 1;
                break;
            }
            if (neg2)
                b = -b;
            pos[k] = a;
            cov[k] = b;
            ++k;
        }
        if (!nl)
            break;
        p = nl + 1;
    }
    PyEval_RestoreThread(ts);

    if (bad) {
        Py_DECREF(pos_o);
        Py_DECREF(cov_o);
        PyErr_Format(PyExc_ValueError, "malformed POSITION/COVERAGE row");
        PyBuffer_Release(&blob);
        return NULL;
    }
    if (k != n) {
        _PyBytes_Resize(&pos_o, k * 8);
        _PyBytes_Resize(&cov_o, k * 8);
        if (!pos_o || !cov_o) {
            Py_XDECREF(pos_o);
            Py_XDECREF(cov_o);
            PyBuffer_Release(&blob);
            return NULL;
        }
    }
    PyBuffer_Release(&blob);
    return Py_BuildValue("(NNn)", pos_o, cov_o, k);
}

PyObject *pv3_format_pos_cov(PyObject *self, PyObject *args)
{
    Py_buffer pos_b, cov_b;
    if (!PyArg_ParseTuple(args, "y*y*", &pos_b, &cov_b))
        return NULL;
    Py_ssize_t n = pos_b.len / 8;
    const int64_t *pos = pos_b.buf;
    const int64_t *cov = cov_b.buf;
    pv3_strbuf out = {NULL, 0, 0};
    int oom = 0;

    PyThreadState *ts = PyEval_SaveThread();
    for (Py_ssize_t i = 0; i < n; ++i) {
        if (pv3_sb_put_long(&out, (long)pos[i]) < 0 ||
            pv3_sb_putc(&out, '\t') < 0 ||
            pv3_sb_put_long(&out, (long)cov[i]) < 0 ||
            pv3_sb_putc(&out, '\n') < 0) {
            oom = 1;
            break;
        }
    }
    PyEval_RestoreThread(ts);

    PyBuffer_Release(&pos_b);
    PyBuffer_Release(&cov_b);
    if (oom) {
        free(out.buf);
        return PyErr_NoMemory();
    }
    PyObject *res =
        Py_BuildValue("y#", out.buf ? out.buf : "", (Py_ssize_t)out.len);
    free(out.buf);
    return res;
}
