/* baseline_ref_loop.c — single-threaded re-creation of the reference's
 * project_alignments hot loop, to bound the 25k reads/s baseline estimate
 * (BASELINE.md; the reference itself cannot be built in this image: its
 * lib/ submodules are empty snapshots and no conda/pip package exists).
 *
 * Models exactly what /root/reference does per record:
 *   - rewrite_cigar (include/panvc3/rewrite_cigar.hh:40-156): ONE
 *     select0(1+src_pos) on the source gap bitvector + ONE rank0 on the
 *     destination + one bit read PER REF-CONSUMING BASE, with run-merged
 *     destination.push_back per base;
 *   - indel run detection over the rewritten ops
 *     (libpanvc3/indel_run_checker.cc:31-121): one linear pass;
 *   - align_global (include/panvc3/align.hh:59-112): affine-gap DP fill +
 *     traceback over each run (the bench's mixed workload realigns 1/3 of
 *     records with ~12x6 runs).
 *
 * Deliberately UNDERSTATES the reference's cost, so the measured rate is
 * an UPPER bound on the reference and vs_baseline claims stay
 * conservative:
 *   - select0 uses a next-zero-bit scan hinted by the previous query
 *     (the loop asks consecutive positions); sdsl's select_support_mcl
 *     does a fresh multi-access lookup per call;
 *   - rank0 is a two-level directory lookup (sdsl rank_support_v5 class);
 *   - NO SAM parse/format, tag surgery, IO or seqan3 record handling is
 *     modelled (all significant per-record costs in the real tool);
 *   - the DP uses the same O(mn) fill as align.hh but a leaner cell.
 *
 * Build & run:  gcc -O3 -march=native -o /tmp/blr tools/baseline_ref_loop.c && /tmp/blr
 * Output: one line "reads_per_s <N>" (plus a breakdown on stderr).
 */

#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* ---- xorshift rng (deterministic workload) ---------------------------- */
static uint64_t rng_state = 0x9E3779B97F4A7C15ull;
static uint64_t rng(void)
{
    uint64_t x = rng_state;
    x ^= x << 13;
    x ^= x >> 7;
    x ^= x << 17;
    return rng_state = x;
}

/* ---- gap bitvector with rank0 directory + hinted select0 -------------- */
typedef struct {
    uint64_t *words;
    int64_t n_bits;
    int64_t n_words;
    int64_t n_zeros;  /* total zeros (avoids rank0 at pos == n_bits) */
    int64_t *super;   /* cumulative ZEROS per 8-word superblock */
    uint16_t *rel;    /* zeros within superblock up to each word */
    int64_t *sel;     /* word index of every 512th zero (select samples) */
    int64_t n_sel;
} bv_t;

static void bv_build(bv_t *bv, int64_t n_bits, double gap_frac)
{
    bv->n_bits = n_bits;
    bv->n_words = (n_bits + 63) / 64;
    bv->words = calloc(bv->n_words, 8);
    for (int64_t i = 0; i < n_bits; ++i)
        if ((rng() >> 11) * (1.0 / 9007199254740992.0) < gap_frac)
            bv->words[i >> 6] |= 1ull << (i & 63);
    bv->words[0] &= ~1ull; /* first column non-gap */
    int64_t n_super = (bv->n_words + 7) / 8;
    bv->super = malloc((n_super + 1) * sizeof(int64_t));
    bv->rel = malloc(bv->n_words * sizeof(uint16_t));
    int64_t zeros = 0;
    bv->n_sel = 0;
    bv->sel = malloc((bv->n_words / 4 + 2) * sizeof(int64_t));
    for (int64_t w = 0; w < bv->n_words; ++w) {
        if ((w & 7) == 0)
            bv->super[w >> 3] = zeros;
        bv->rel[w] = (uint16_t)(zeros - bv->super[w >> 3]);
        int64_t nz = zeros + 64 - __builtin_popcountll(bv->words[w]);
        while ((bv->n_sel << 9) < nz)  /* every 512th zero starts here */
            bv->sel[bv->n_sel++] = w;
        zeros = nz;
    }
    bv->super[n_super] = zeros;
    bv->n_zeros = zeros;
}

static inline int64_t bv_rank0(const bv_t *bv, int64_t pos)
{
    /* zeros in [0, pos) */
    int64_t w = pos >> 6;
    int64_t r = bv->super[w >> 3] + bv->rel[w];
    uint64_t mask = (pos & 63) ? ((1ull << (pos & 63)) - 1) : 0;
    return r + (pos & 63) - __builtin_popcountll(bv->words[w] & mask);
}

static inline int bv_get(const bv_t *bv, int64_t pos)
{
    return (bv->words[pos >> 6] >> (pos & 63)) & 1;
}

/* select0(k): position of the k-th zero (1-based), scanning forward from a
 * caller-kept hint (cheaper than sdsl's select_support_mcl for the hot
 * loop's consecutive queries — deliberately generous to the reference). */
static inline int64_t bv_select0_hinted(const bv_t *bv, int64_t k,
                                        int64_t *hint_pos, int64_t *hint_k)
{
    int64_t pos, kk, w;
    uint64_t word;
    if (*hint_k && k >= *hint_k) {
        pos = *hint_pos + 1;
        kk = k - *hint_k;   /* additional zeros needed past hint */
        w = pos >> 6;
        word = bv->words[w] | ((pos & 63) ? ((1ull << (pos & 63)) - 1) : 0);
    } else {
        /* cold query: start at the select sample (sdsl's select support
           is O(1); this is the same ballpark for 2%-gap vectors) */
        w = bv->sel[(k - 1) >> 9];
        int64_t base = bv->super[w >> 3] + bv->rel[w];
        kk = k - base;
        word = bv->words[w];
    }
    /* scan words for the kk-th zero at/after pos */
    for (;;) {
        int z = 64 - __builtin_popcountll(word);
        if (z >= kk)
            break;
        kk -= z;
        word = bv->words[++w];
    }
    /* kk-th zero inside word */
    uint64_t inv = ~word;
    for (int i = 1; i < kk; ++i)
        inv &= inv - 1;
    int64_t res = (w << 6) + __builtin_ctzll(inv);
    *hint_pos = res;
    *hint_k = k;
    return res;
}

/* ---- run-merged destination buffer ------------------------------------ */
typedef struct {
    char op[4096];
    int32_t cnt[4096];
    int n;
} dest_t;

static inline void dest_push(dest_t *d, char op, int32_t c)
{
    if (d->n && d->op[d->n - 1] == op)
        d->cnt[d->n - 1] += c;
    else {
        d->op[d->n] = op;
        d->cnt[d->n] = c;
        d->n++;
    }
}

/* ---- affine DP (align.hh semantics, fill + traceback) ----------------- */
static float dp_best[256 * 256];
static uint8_t dp_tr[256 * 256];

static int dp_align(const char *ref, int n, const char *q, int m,
                    float go, float ge)
{
    int stride = n + 1;
    for (int j = 0; j <= n; ++j) {
        dp_best[j] = go + ge * j;
        dp_tr[j] = 2;
    }
    dp_best[0] = 0;
    for (int i = 1; i <= m; ++i) {
        float *prev = dp_best + (i - 1) % 2 * stride;
        float *cur = dp_best + i % 2 * stride;
        cur[0] = go + ge * i;
        for (int j = 1; j <= n; ++j) {
            float s = (q[i - 1] == ref[j - 1]) ? 0.0f : -1.0f;
            float diag = prev[j - 1] + s;
            float vert = prev[j] + go + ge;
            float horiz = cur[j - 1] + go + ge;
            float best = diag;
            uint8_t t = 0;
            if (vert > best) { best = vert; t = 1; }
            if (horiz > best) { best = horiz; t = 2; }
            cur[j] = best;
            dp_tr[i * stride + j] = t;
        }
    }
    /* traceback */
    int i = m, j = n, steps = 0;
    while (i || j) {
        uint8_t t = dp_tr[i * stride + j];
        if (j == 0) t = 1;
        else if (i == 0) t = 2;
        if (t == 0) { --i; --j; }
        else if (t == 1) --i;
        else --j;
        ++steps;
    }
    return steps;
}

int main(void)
{
    /* MSA pair at a genome-representative density: 2% gaps (the bench's
       synthetic MSA), columns >> cache so rank/select pay real misses */
    int64_t n_cols = 64 * 1024 * 1024;
    bv_t src, dst;
    bv_build(&src, n_cols, 0.02);
    bv_build(&dst, n_cols, 0.02);
    /* total zero count from the build (rank0 at pos == n_bits would index
       one word past the directory when n_bits is a multiple of 64) */
    int64_t src_units = src.n_zeros;

    /* query/dst sequences: random ACGT (compared per matched base) */
    int64_t seq_n = 1 << 22;
    char *dst_seq = malloc(seq_n), *q_seq = malloc(seq_n);
    for (int64_t i = 0; i < seq_n; ++i) {
        dst_seq[i] = "ACGT"[rng() & 3];
        q_seq[i] = "ACGT"[rng() & 3];
    }

    int n_reads = 200000, read_len = 100;
    dest_t dest;
    char run_ref[64], run_q[64];

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    int64_t sink = 0, dp_cells = 0;
    for (int r = 0; r < n_reads; ++r) {
        int64_t src_pos = rng() % (src_units - read_len - 8);
        int64_t hint_pos = 0, hint_k = 0;
        int64_t prev_excess = -1;
        int query_pos = 0;
        dest.n = 0;
        /* the bench mix: 1/3 pure match, 1/3 with a D, 1/3 with I+D —
           every ref-consuming base does select0 + rank0 + bit read */
        int kind = r % 3;
        for (int u = 0; u < read_len; ++u) {
            int64_t aln = bv_select0_hinted(&src, src_pos + u + 1,
                                            &hint_pos, &hint_k);
            int64_t excess = bv_rank0(&dst, aln);
            if (prev_excess >= 0 && prev_excess < excess)
                dest_push(&dest, 'D', (int32_t)(excess - prev_excess));
            if (bv_get(&dst, aln)) {
                dest_push(&dest, 'I', 1);
                prev_excess = excess;
            } else {
                char qc = q_seq[(query_pos + r) & (seq_n - 1)];
                char dc = dst_seq[excess & (seq_n - 1)];
                dest_push(&dest, qc == dc ? '=' : 'X', 1);
                prev_excess = excess + 1;
            }
            ++query_pos;
        }
        /* indel run check: linear pass over the rewritten ops */
        int has_i = 0, has_d = 0;
        for (int k = 0; k < dest.n; ++k) {
            has_i |= dest.op[k] == 'I';
            has_d |= dest.op[k] == 'D';
        }
        /* realignment of one small run (the mixed workload's 1/3) */
        if (kind == 2 && has_i && has_d) {
            int rn = 6 + (int)(rng() % 6), qm = 6 + (int)(rng() % 6);
            for (int k = 0; k < rn; ++k) run_ref[k] = "ACGT"[rng() & 3];
            for (int k = 0; k < qm; ++k) run_q[k] = "ACGT"[rng() & 3];
            sink += dp_align(run_ref, rn, run_q, qm, -6.0f, -1.0f);
            dp_cells += rn * qm;
        }
        sink += dest.n + (int)prev_excess;
    }
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    fprintf(stderr,
            "sink %lld, %d reads in %.3f s (%.2f us/record, %lld DP cells)\n",
            (long long)sink, n_reads, dt, 1e6 * dt / n_reads,
            (long long)dp_cells);
    printf("reads_per_s %.1f\n", n_reads / dt);
    return 0;
}
