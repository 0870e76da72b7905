/* Parallel BGZF (blocked gzip) codec.
 *
 * BGZF blocks are independent deflate streams (<= 65280 uncompressed
 * bytes each, samtools spec), so both directions parallelise trivially
 * over pthreads — the same design as samtools' own multi-threaded bgzf.
 * This replaces the per-block Python zlib loop in panvc3_tpu/io/bgzf.py
 * on the hot BAM paths (the reference streams BAM through seqan3's
 * single-threaded stream; /root/reference uses bgzip externally).
 *
 * bgzf_compress(data y*, level int, nthreads int) -> bytes
 *     Whole BGZF stream for `data` (64 KiB-block framing identical to
 *     BgzfWriter._flush_block), WITHOUT the EOF marker (callers append
 *     it when closing so streaming writers can call this repeatedly).
 * bgzf_decompress(data y*, nthreads int) -> bytes
 *     Concatenated payload of all blocks in `data` (a full BGZF file or
 *     any whole-block prefix of one), CRC-checked.
 */

#include <Python.h>
#include <pthread.h>
#include <stdint.h>
#include <string.h>
#include <zlib.h>

#define BGZF_BLOCK_IN 65280      /* uncompressed bytes per block */
#define BGZF_HDR 18              /* fixed header incl. BC subfield */
#define BGZF_FTR 8               /* CRC32 + ISIZE */
#define BGZF_SLOT 66560          /* per-block output slot (worst case) */

/* ---------------- compress ---------------- */

typedef struct {
    const uint8_t *in;
    Py_ssize_t in_len;
    uint8_t *slots;        /* nblocks * BGZF_SLOT */
    uint32_t *sizes;       /* per-block total output size */
    Py_ssize_t nblocks;
    int level;
    int nthreads;
    int tid;
    int error;
} bgzf_comp_job;

static void *bgzf_comp_worker(void *arg)
{
    bgzf_comp_job *job = arg;
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (deflateInit2(&zs, job->level, Z_DEFLATED, -15, 8,
                     Z_DEFAULT_STRATEGY) != Z_OK) {
        job->error = 1;
        return NULL;
    }
    for (Py_ssize_t b = job->tid; b < job->nblocks; b += job->nthreads) {
        const uint8_t *src = job->in + b * (Py_ssize_t)BGZF_BLOCK_IN;
        uint32_t n = BGZF_BLOCK_IN;
        if (b == job->nblocks - 1)
            n = (uint32_t)(job->in_len - b * (Py_ssize_t)BGZF_BLOCK_IN);
        uint8_t *out = job->slots + b * (Py_ssize_t)BGZF_SLOT;
        deflateReset(&zs);
        zs.next_in = (Bytef *)src;
        zs.avail_in = n;
        zs.next_out = out + BGZF_HDR;
        zs.avail_out = BGZF_SLOT - BGZF_HDR - BGZF_FTR;
        if (deflate(&zs, Z_FINISH) != Z_STREAM_END) {
            job->error = 1;
            break;
        }
        uint32_t clen = (uint32_t)zs.total_out;
        uint32_t bsize = clen + BGZF_HDR + BGZF_FTR;
        if (bsize - 1 > 65535) {  /* cannot happen at 65280-byte blocks */
            job->error = 1;
            break;
        }
        /* header: magic, MTIME=0, XFL=0, OS=0xff, XLEN=6, BC subfield */
        static const uint8_t hdr0[16] = {
            0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0, 0, 0xff,
            6, 0, 'B', 'C', 2, 0,
        };
        memcpy(out, hdr0, 16);
        out[10] = 6;  /* XLEN lo (hdr0[10] already 6; keep explicit) */
        uint32_t bs1 = bsize - 1;
        out[16] = (uint8_t)(bs1 & 0xff);
        out[17] = (uint8_t)(bs1 >> 8);
        uint32_t crc = crc32(0L, Z_NULL, 0);
        crc = crc32(crc, src, n);
        uint8_t *ftr = out + BGZF_HDR + clen;
        ftr[0] = (uint8_t)(crc & 0xff);
        ftr[1] = (uint8_t)((crc >> 8) & 0xff);
        ftr[2] = (uint8_t)((crc >> 16) & 0xff);
        ftr[3] = (uint8_t)((crc >> 24) & 0xff);
        ftr[4] = (uint8_t)(n & 0xff);
        ftr[5] = (uint8_t)((n >> 8) & 0xff);
        ftr[6] = (uint8_t)((n >> 16) & 0xff);
        ftr[7] = (uint8_t)((n >> 24) & 0xff);
        job->sizes[b] = bsize;
    }
    deflateEnd(&zs);
    return NULL;
}

PyObject *pv3_bgzf_compress(PyObject *self, PyObject *args)
{
    Py_buffer data;
    int level, nthreads;
    if (!PyArg_ParseTuple(args, "y*ii", &data, &level, &nthreads))
        return NULL;
    Py_ssize_t nblocks = (data.len + BGZF_BLOCK_IN - 1) / BGZF_BLOCK_IN;
    if (nblocks == 0) {
        PyBuffer_Release(&data);
        return PyBytes_FromStringAndSize("", 0);
    }
    if (nthreads < 1)
        nthreads = 1;
    if (nthreads > nblocks)
        nthreads = (int)nblocks;
    uint8_t *slots = PyMem_Malloc((size_t)nblocks * BGZF_SLOT);
    uint32_t *sizes = PyMem_Calloc(nblocks, sizeof(uint32_t));
    if (!slots || !sizes) {
        PyMem_Free(slots);
        PyMem_Free(sizes);
        PyBuffer_Release(&data);
        return PyErr_NoMemory();
    }
    bgzf_comp_job jobs[64];
    pthread_t tids[64];
    if (nthreads > 64)
        nthreads = 64;
    int error = 0;
    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < nthreads; ++t) {
        jobs[t] = (bgzf_comp_job){
            .in = data.buf, .in_len = data.len, .slots = slots,
            .sizes = sizes, .nblocks = nblocks, .level = level,
            .nthreads = nthreads, .tid = t, .error = 0,
        };
        if (t == nthreads - 1)
            bgzf_comp_worker(&jobs[t]);
        else if (pthread_create(&tids[t], NULL, bgzf_comp_worker, &jobs[t]))
            jobs[t].error = 2;
    }
    for (int t = 0; t < nthreads - 1; ++t)
        if (jobs[t].error != 2)
            pthread_join(tids[t], NULL);
    for (int t = 0; t < nthreads; ++t)
        error |= jobs[t].error;
    Py_END_ALLOW_THREADS
    PyObject *res = NULL;
    if (error) {
        PyErr_SetString(PyExc_RuntimeError, "BGZF deflate failed");
    } else {
        size_t total = 0;
        for (Py_ssize_t b = 0; b < nblocks; ++b)
            total += sizes[b];
        res = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)total);
        if (res) {
            uint8_t *dst = (uint8_t *)PyBytes_AS_STRING(res);
            for (Py_ssize_t b = 0; b < nblocks; ++b) {
                memcpy(dst, slots + b * (Py_ssize_t)BGZF_SLOT, sizes[b]);
                dst += sizes[b];
            }
        }
    }
    PyMem_Free(slots);
    PyMem_Free(sizes);
    PyBuffer_Release(&data);
    return res;
}

/* ---------------- decompress ---------------- */

typedef struct {
    Py_ssize_t cdata_off;   /* offset of the deflate payload */
    uint32_t cdata_len;
    uint32_t isize;
    Py_ssize_t out_off;
} bgzf_blk;

typedef struct {
    const uint8_t *in;
    uint8_t *out;
    const bgzf_blk *blks;
    Py_ssize_t nblocks;
    int nthreads;
    int tid;
    int error;
} bgzf_dec_job;

static void *bgzf_dec_worker(void *arg)
{
    bgzf_dec_job *job = arg;
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    if (inflateInit2(&zs, -15) != Z_OK) {
        job->error = 1;
        return NULL;
    }
    for (Py_ssize_t b = job->tid; b < job->nblocks; b += job->nthreads) {
        const bgzf_blk *blk = job->blks + b;
        inflateReset(&zs);
        zs.next_in = (Bytef *)(job->in + blk->cdata_off);
        zs.avail_in = blk->cdata_len;
        zs.next_out = job->out + blk->out_off;
        zs.avail_out = blk->isize;
        int rc = inflate(&zs, Z_FINISH);
        if (rc != Z_STREAM_END || zs.total_out != blk->isize) {
            job->error = 1;
            break;
        }
        uint32_t crc = crc32(0L, Z_NULL, 0);
        crc = crc32(crc, job->out + blk->out_off, blk->isize);
        const uint8_t *f = job->in + blk->cdata_off + blk->cdata_len;
        uint32_t want = (uint32_t)f[0] | ((uint32_t)f[1] << 8)
                      | ((uint32_t)f[2] << 16) | ((uint32_t)f[3] << 24);
        if (crc != want) {
            job->error = 1;
            break;
        }
    }
    inflateEnd(&zs);
    return NULL;
}

PyObject *pv3_bgzf_decompress(PyObject *self, PyObject *args)
{
    Py_buffer data;
    int nthreads;
    if (!PyArg_ParseTuple(args, "y*i", &data, &nthreads))
        return NULL;
    const uint8_t *in = data.buf;
    Py_ssize_t len = data.len;

    /* serial header walk: block boundaries + output offsets */
    Py_ssize_t cap = 1024, nblocks = 0;
    bgzf_blk *blks = PyMem_Malloc(cap * sizeof(bgzf_blk));
    if (!blks) {
        PyBuffer_Release(&data);
        return PyErr_NoMemory();
    }
    Py_ssize_t off = 0, out_total = 0;
    const char *err = NULL;
    while (off < len) {
        if (off + 12 > len
            || in[off] != 0x1f || in[off + 1] != 0x8b
            || in[off + 2] != 0x08 || in[off + 3] != 0x04) {
            err = "not a BGZF block";
            break;
        }
        uint32_t xlen = (uint32_t)in[off + 10] | ((uint32_t)in[off + 11] << 8);
        if (off + 12 + xlen > len) {
            err = "truncated BGZF header";
            break;
        }
        uint32_t bsize = 0;
        Py_ssize_t xo = off + 12, xend = off + 12 + xlen;
        while (xo + 4 <= xend) {
            uint8_t si1 = in[xo], si2 = in[xo + 1];
            uint32_t slen = (uint32_t)in[xo + 2] | ((uint32_t)in[xo + 3] << 8);
            if (si1 == 'B' && si2 == 'C' && slen == 2 && xo + 6 <= xend)
                bsize = ((uint32_t)in[xo + 4] | ((uint32_t)in[xo + 5] << 8)) + 1;
            xo += 4 + slen;
        }
        if (!bsize || off + bsize > len || bsize < 12 + xlen + 8) {
            err = "BGZF block without valid BC size";
            break;
        }
        const uint8_t *f = in + off + bsize - 4;
        uint32_t isize = (uint32_t)f[0] | ((uint32_t)f[1] << 8)
                       | ((uint32_t)f[2] << 16) | ((uint32_t)f[3] << 24);
        if (nblocks == cap) {
            cap *= 2;
            bgzf_blk *nb = PyMem_Realloc(blks, cap * sizeof(bgzf_blk));
            if (!nb) {
                PyMem_Free(blks);
                PyBuffer_Release(&data);
                return PyErr_NoMemory();
            }
            blks = nb;
        }
        blks[nblocks++] = (bgzf_blk){
            .cdata_off = off + 12 + xlen,
            .cdata_len = bsize - 12 - xlen - 8,
            .isize = isize,
            .out_off = out_total,
        };
        out_total += isize;
        off += bsize;
    }
    if (err) {
        PyMem_Free(blks);
        PyBuffer_Release(&data);
        PyErr_SetString(PyExc_ValueError, err);
        return NULL;
    }

    PyObject *res = PyBytes_FromStringAndSize(NULL, out_total);
    if (!res) {
        PyMem_Free(blks);
        PyBuffer_Release(&data);
        return NULL;
    }
    uint8_t *out = (uint8_t *)PyBytes_AS_STRING(res);
    if (nthreads < 1)
        nthreads = 1;
    if (nthreads > nblocks && nblocks > 0)
        nthreads = (int)nblocks;
    if (nthreads > 64)
        nthreads = 64;
    int error = 0;
    if (nblocks) {
        bgzf_dec_job jobs[64];
        pthread_t tids[64];
        Py_BEGIN_ALLOW_THREADS
        for (int t = 0; t < nthreads; ++t) {
            jobs[t] = (bgzf_dec_job){
                .in = in, .out = out, .blks = blks, .nblocks = nblocks,
                .nthreads = nthreads, .tid = t, .error = 0,
            };
            if (t == nthreads - 1)
                bgzf_dec_worker(&jobs[t]);
            else if (pthread_create(&tids[t], NULL, bgzf_dec_worker,
                                    &jobs[t]))
                jobs[t].error = 2;
        }
        for (int t = 0; t < nthreads - 1; ++t)
            if (jobs[t].error != 2)
                pthread_join(tids[t], NULL);
        for (int t = 0; t < nthreads; ++t)
            error |= jobs[t].error;
        Py_END_ALLOW_THREADS
    }
    PyMem_Free(blks);
    PyBuffer_Release(&data);
    if (error) {
        Py_DECREF(res);
        PyErr_SetString(PyExc_ValueError,
                        "BGZF inflate failed (corrupt block or CRC)");
        return NULL;
    }
    return res;
}
