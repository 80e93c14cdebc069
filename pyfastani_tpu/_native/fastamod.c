/* Native host-side runtime for pyfastani_tpu.
 *
 * The reference implements its host-bound work natively: a FASTA reader
 * (src/pyfastani/_fasta.pyx), SIMD uppercase/reverse-complement
 * (src/pyfastani/_sequtils/), and Murmur3 hashing (vendored murmur3.h).
 * This module is the equivalent for the TPU framework: everything from
 * hashing onward runs on device, so the native layer covers the
 * host-bound I/O and byte-codec paths that feed device buffers.
 *
 * Exposes:
 *   parse_fasta(path)      -> list of (id, seq) tuples, seq uppercased
 *   copy_upper(bytes)      -> bytes       (C-locale uppercase)
 *   reverse_complement(b)  -> bytes       (IUPAC-complete complement LUT,
 *                                          parity with _sequtils/complement.h)
 *   murmur3_32(data, seed) -> int         (MurmurHash3_x86_32)
 *   winnow(data, k, w, protein) -> (hashes bytes, wpos bytes)
 *       minimizer winnowing of one uppercased contig with the exact
 *       reference deque semantics (_fastani.pyx:156-309): palindromic
 *       k-mer skip, canonical min(fwd, rc) hash, tie-to-latest window
 *       minimum, consecutive-occurrence dedup including the mutable-wpos
 *       window-0 quirk.  This is the ingestion hot loop: reference
 *       sketching is host data-loading work (the TPU keeps the query-time
 *       compute), and a single C pass is orders of magnitude cheaper than
 *       round-tripping genome-length arrays through the device tunnel.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#if defined(__x86_64__) || defined(__i386__)
#include <immintrin.h>
#define FASTAMOD_X86 1
#endif

/* verbatim transcription of COMPLEMENT_LOOKUP (complement.h:5-26) */
static const unsigned char COMPLEMENT_LOOKUP[128] = {
    0x00, 0x01, 0x02, 0x03, 0x04, 0x05, 0x06, 0x07,
    0x08, 0x09, 0x0a, 0x00, 0x0c, 0x0d, 0x0e, 0x0f,
    0x10, 0x11, 0x12, 0x13, 0x14, 0x15, 0x16, 0x17,
    0x18, 0x19, 0x1a, 0x01, 0x1c, 0x1d, 0x1e, 0x1f,
    ' ',  '!',  '"',  '#',  '$',  '%',  '&',  '\'',
    '(',  ')',  '*',  '+',  ',',  '-',  '.',  '/',
    '0',  '1',  '2',  '3',  '4',  '5',  '6',  '7',
    '8',  '9',  ':',  ';',  '<',  '=',  '>',  '?',
    '@',  'T',  'V',  'G',  'H',  'E',  'F',  'C',
    'D',  'I',  'J',  'M',  'L',  'K',  'N',  'O',
    'P',  'Q',  'Y',  'S',  'A',  'U',  'B',  'W',
    'X',  'R',  'Z',  '[',  '\\', ']',  '^',  '_',
    '`',  't',  'v',  'g',  'h',  'e',  'f',  'c',
    'd',  'i',  'j',  'm',  'l',  'k',  'n',  'o',
    'p',  'q',  'y',  's',  'a',  'u',  'b',  'w',
    'x',  'r',  'z',  '{',  '|',  '}',  '~',  0x7f
};

static unsigned char UPPER_LUT[256];

static void init_luts(void) {
    for (int i = 0; i < 256; i++) {
        UPPER_LUT[i] = (i >= 'a' && i <= 'z') ? (unsigned char)(i - 32)
                                              : (unsigned char)i;
    }
}

/* --- Murmur3_x86_32 ------------------------------------------------------ */

static inline uint32_t rotl32(uint32_t x, int8_t r) {
    return (x << r) | (x >> (32 - r));
}

static uint32_t murmur3_x86_32(const uint8_t *data, Py_ssize_t len,
                               uint32_t seed) {
    const Py_ssize_t nblocks = len / 4;
    uint32_t h1 = seed;
    const uint32_t c1 = 0xcc9e2d51u;
    const uint32_t c2 = 0x1b873593u;
    for (Py_ssize_t i = 0; i < nblocks; i++) {
        uint32_t k1;
        memcpy(&k1, data + i * 4, 4);
        k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2;
        h1 ^= k1; h1 = rotl32(h1, 13); h1 = h1 * 5 + 0xe6546b64u;
    }
    const uint8_t *tail = data + nblocks * 4;
    uint32_t k1 = 0;
    switch (len & 3) {
    case 3: k1 ^= (uint32_t)tail[2] << 16; /* fallthrough */
    case 2: k1 ^= (uint32_t)tail[1] << 8;  /* fallthrough */
    case 1: k1 ^= (uint32_t)tail[0];
            k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2; h1 ^= k1;
    }
    h1 ^= (uint32_t)len;
    h1 ^= h1 >> 16; h1 *= 0x85ebca6bu; h1 ^= h1 >> 13;
    h1 *= 0xc2b2ae35u; h1 ^= h1 >> 16;
    return h1;
}

/* --- batched hash pass ----------------------------------------------------
 *
 * The ingest hot loop is two Murmur3 evaluations per base (forward +
 * reverse-complement k-mer).  Splitting the work into a position-parallel
 * HASH PASS (vectorizable, threadable) followed by a cheap serial deque
 * pass turns the reference's 2x per-position hashing (SIMD in
 * _sequtils/sequtils.cpp only for the byte codecs, scalar hashing) into
 * an 8-lane AVX2 kernel: one 16-byte load + two PSHUFBs materializes the
 * four overlapping little-endian blocks of 8 consecutive k=16 k-mers.
 */

static int HAVE_AVX2 = 0;

static void hash_pass_scalar(const uint8_t *p, Py_ssize_t n_pos, int k,
                             uint32_t *out) {
    for (Py_ssize_t i = 0; i < n_pos; i++)
        out[i] = murmur3_x86_32(p + i, k, 42u);
}

#ifdef FASTAMOD_X86
__attribute__((target("avx2"))) static void
hash16_avx2(const uint8_t *p, Py_ssize_t n_pos, uint32_t *out) {
    const __m256i C1 = _mm256_set1_epi32((int)0xcc9e2d51u);
    const __m256i C2 = _mm256_set1_epi32((int)0x1b873593u);
    const __m256i F1 = _mm256_set1_epi32((int)0x85ebca6bu);
    const __m256i F2 = _mm256_set1_epi32((int)0xc2b2ae35u);
    const __m256i E1 = _mm256_set1_epi32((int)0xe6546b64u);
    const __m256i FIVE = _mm256_set1_epi32(5);
    /* lanes 0-3: overlapping dwords at byte offsets 0..3 of the load;
     * lanes 4-7: offsets 4..7 */
    const __m128i S0 = _mm_setr_epi8(0, 1, 2, 3, 1, 2, 3, 4,
                                     2, 3, 4, 5, 3, 4, 5, 6);
    const __m128i S1 = _mm_setr_epi8(4, 5, 6, 7, 5, 6, 7, 8,
                                     6, 7, 8, 9, 7, 8, 9, 10);
    Py_ssize_t i = 0;
    /* the j=3 block loads 16 bytes at p+i+12; staying <= position
     * n_pos-13 keeps every read inside the n_pos+15 byte buffer */
    for (; i + 13 <= n_pos; i += 8) {
        __m256i h = _mm256_set1_epi32(42);
        for (int j = 0; j < 4; j++) {
            __m128i v = _mm_loadu_si128((const __m128i *)(p + i + 4 * j));
            __m256i k1 = _mm256_set_m128i(_mm_shuffle_epi8(v, S1),
                                          _mm_shuffle_epi8(v, S0));
            k1 = _mm256_mullo_epi32(k1, C1);
            k1 = _mm256_or_si256(_mm256_slli_epi32(k1, 15),
                                 _mm256_srli_epi32(k1, 17));
            k1 = _mm256_mullo_epi32(k1, C2);
            h = _mm256_xor_si256(h, k1);
            h = _mm256_or_si256(_mm256_slli_epi32(h, 13),
                                _mm256_srli_epi32(h, 19));
            h = _mm256_add_epi32(_mm256_mullo_epi32(h, FIVE), E1);
        }
        h = _mm256_xor_si256(h, _mm256_set1_epi32(16));
        h = _mm256_xor_si256(h, _mm256_srli_epi32(h, 16));
        h = _mm256_mullo_epi32(h, F1);
        h = _mm256_xor_si256(h, _mm256_srli_epi32(h, 13));
        h = _mm256_mullo_epi32(h, F2);
        h = _mm256_xor_si256(h, _mm256_srli_epi32(h, 16));
        _mm256_storeu_si256((__m256i *)(out + i), h);
    }
    for (; i < n_pos; i++)
        out[i] = murmur3_x86_32(p + i, 16, 42u);
}
#endif

static void hash_pass(const uint8_t *p, Py_ssize_t n_pos, int k,
                      uint32_t *out) {
    if (n_pos <= 0)
        return;
#ifdef FASTAMOD_X86
    if (k == 16 && HAVE_AVX2) {
        hash16_avx2(p, n_pos, out);
        return;
    }
#endif
    hash_pass_scalar(p, n_pos, k, out);
}

typedef struct {
    const uint8_t *p;
    Py_ssize_t n_pos;
    int k;
    uint32_t *out;
} hashjob_t;

static void *hash_job(void *arg) {
    hashjob_t *j = (hashjob_t *)arg;
    hash_pass(j->p, j->n_pos, j->k, j->out);
    return NULL;
}

typedef struct {
    const uint8_t *data;
    uint8_t *rc;
    Py_ssize_t n, j0, j1;
} rcjob_t;

static void *rc_job(void *arg) {
    rcjob_t *j = (rcjob_t *)arg;
    const uint8_t *data = j->data;
    uint8_t *rc = j->rc;
    Py_ssize_t n = j->n;
    for (Py_ssize_t i = j->j0; i < j->j1; i++)
        rc[i] = COMPLEMENT_LOOKUP[data[n - 1 - i] & 0x7f];
    return NULL;
}

/* --- module functions ----------------------------------------------------- */

static PyObject *py_murmur3_32(PyObject *self, PyObject *args) {
    Py_buffer buf;
    unsigned int seed = 42;
    if (!PyArg_ParseTuple(args, "y*|I", &buf, &seed))
        return NULL;
    uint32_t h = murmur3_x86_32((const uint8_t *)buf.buf, buf.len,
                                (uint32_t)seed);
    PyBuffer_Release(&buf);
    return PyLong_FromUnsignedLong((unsigned long)h);
}

static PyObject *py_copy_upper(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, buf.len);
    if (!out) { PyBuffer_Release(&buf); return NULL; }
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    const unsigned char *src = (const unsigned char *)buf.buf;
    for (Py_ssize_t i = 0; i < buf.len; i++)
        dst[i] = UPPER_LUT[src[i]];
    PyBuffer_Release(&buf);
    return out;
}

static PyObject *py_reverse_complement(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, buf.len);
    if (!out) { PyBuffer_Release(&buf); return NULL; }
    unsigned char *dst = (unsigned char *)PyBytes_AS_STRING(out);
    const unsigned char *src = (const unsigned char *)buf.buf;
    for (Py_ssize_t i = 0; i < buf.len; i++)
        dst[i] = COMPLEMENT_LOOKUP[src[buf.len - 1 - i] & 0x7f];
    PyBuffer_Release(&buf);
    return out;
}

/* --- minimizer winnowing --------------------------------------------------
 *
 * Literal-semantics reimplementation of skch::CommonFunc::addMinimizers as
 * recorded by the reference Cython port (_fastani.pyx:156-309) and the
 * test oracle (tests/oracle.py).  Works on one uppercased contig; the
 * caller supplies seqId context (dedup never crosses contigs because the
 * seqId field differs between records).
 */

typedef struct {
    uint32_t hash;
    int32_t pos; /* k-mer position */
} qent_t;
/* The reference's per-entry mutable ``wpos`` field (0 until recorded --
 * the dedup quirk) is tracked for the FRONT entry only: an occurrence's
 * reign as deque front is one contiguous window range (once popped or
 * expired it never returns), so a single (run_pos, run_wfield) pair
 * reproduces front->wfield exactly and the ring entry shrinks to 8
 * bytes with one store per push. */

#define HASH_CHUNK ((Py_ssize_t)1 << 24) /* positions hashed per chunk */

/* One winnowing segment: emits records for windows [w0, w1).
 *
 * seg0 (w0 == 0) runs the literal reference algorithm.  Later segments
 * use the provably equivalent MID-SEQUENCE RULE -- record exactly when
 * the chosen occurrence differs from the previous evaluated window's
 * choice -- which matches the reference dedup everywhere except the
 * window-0 "phantom" quirk, because (a) a deque occurrence's reign as
 * front is one contiguous window range (once popped or expired it never
 * returns), so an occurrence change always presents wfield == 0, and
 * (b) the record-vs-(last_hash, last_wpos) comparison then only
 * suppresses when last_wpos == 0, i.e. the contig-start phantom, which
 * the caller repairs serially at the segment seam (`py_winnow`).
 * Each segment warms its deque from k-mer max(0, w0 - w): any occurrence
 * alive at window w0 has position >= w0 > w0 - w, and the last evaluated
 * window before w0 whose choice could still be alive is >= w0 - w + 1,
 * so the warm-up window range [w0 - w, w0) determines the previous
 * choice exactly.
 */
typedef struct {
    const uint8_t *data;
    const uint8_t *rc;
    Py_ssize_t n, n_pos;
    int k, w, protein;
    Py_ssize_t w0, w1;
    int strand_thread; /* spawn a strand thread for the fwd hash pass */
    uint32_t *out_h;   /* capacity w1 - w0 */
    int32_t *out_p;
    Py_ssize_t count;  /* -1 on alloc failure */
    uint32_t last_hash; /* final dedup state (for the phantom stitch) */
    int32_t last_wpos;
    int have_last;
} winseg_t;

static void *winnow_seg(void *arg) {
    winseg_t *sg = (winseg_t *)arg;
    const int k = sg->k, w = sg->w, protein = sg->protein;
    const Py_ssize_t n_pos = sg->n_pos;
    Py_ssize_t i0 = sg->w0 > w ? sg->w0 - w : 0; /* first k-mer processed */
    Py_ssize_t i1 = sg->w1 + w - 1;              /* one past last k-mer */
    Py_ssize_t count = 0;

    Py_ssize_t buf_n = (i1 - i0) < HASH_CHUNK ? (i1 - i0) : HASH_CHUNK;
    uint32_t *hf = (uint32_t *)malloc(sizeof(uint32_t) * (size_t)buf_n);
    uint32_t *hb =
        protein ? NULL
                : (uint32_t *)malloc(sizeof(uint32_t) * (size_t)buf_n);
    /* deque as a ring buffer: at most w live entries; power-of-two
     * capacity so the ring index is a mask, not a division (the modulo
     * dominated the deque pass once hashing went AVX2) */
    Py_ssize_t qcap = 2;
    while (qcap < (Py_ssize_t)w + 1)
        qcap <<= 1;
    Py_ssize_t qmask = qcap - 1;
    qent_t *q = (qent_t *)malloc(sizeof(qent_t) * qcap);
    if (!q || !hf || (!protein && !hb)) {
        free(q);
        free(hf);
        free(hb);
        sg->count = -1;
        return NULL;
    }
    Py_ssize_t qh = 0, qt = 0; /* [qh, qt) modulo qcap */

    uint32_t last_hash = 0;
    int32_t last_wpos = 0;
    int have_last = 0;
    int32_t prev_choice_pos = -1; /* mid-rule: previous evaluated window's
                                     chosen k-mer position (-1 = none) */
    int32_t run_pos = -1;     /* current front occurrence */
    int32_t run_wfield = 0;   /* its mutable wpos field (see qent_t note) */
    const int seg0 = sg->w0 == 0;

    for (Py_ssize_t c0 = i0; c0 < i1; c0 += HASH_CHUNK) {
        Py_ssize_t c1 = c0 + HASH_CHUNK < i1 ? c0 + HASH_CHUNK : i1;
        Py_ssize_t cn = c1 - c0;
        /* hash pass: optionally forward strand on a worker thread (only
         * when this segment runs alone -- segment parallelism otherwise
         * already owns both cores) */
        hashjob_t jf = {sg->data + c0, cn, k, hf};
        pthread_t th;
        int threaded =
            !protein && sg->strand_thread && cn > (1 << 16) &&
            pthread_create(&th, NULL, hash_job, &jf) == 0;
        if (!threaded)
            hash_pass(sg->data + c0, cn, k, hf);
        if (!protein) {
            /* bwd hash of position i is the hash of rc at n_pos-1-i:
             * positions [c0, c1) need rc offsets [n_pos-c1, n_pos-c0),
             * computed forward and indexed reversed below */
            hash_pass(sg->rc + (n_pos - c1), cn, k, hb);
        }
        if (threaded)
            pthread_join(th, NULL);

        for (Py_ssize_t i = c0; i < c1; i++) {
            uint32_t current;
            uint32_t hfv = hf[i - c0];
            if (!protein) {
                uint32_t hbv = hb[c1 - 1 - i];
                if (hbv == hfv)
                    continue; /* palindromic k-mers skipped entirely */
                current = hfv < hbv ? hfv : hbv;
            } else {
                current = hfv;
            }
            int32_t window_id = (int32_t)i - w + 1;
            while (qh != qt && q[qh & qmask].pos <= (int32_t)i - w)
                qh++;
            while (qh != qt && q[(qt - 1) & qmask].hash >= current)
                qt--;
            q[qt & qmask].hash = current;
            q[qt & qmask].pos = (int32_t)i;
            qt++;
            if (window_id < (int32_t)i0)
                continue; /* deque not yet fully warmed */
            qent_t *front = &q[qh & qmask];
            if (window_id < sg->w0) {
                prev_choice_pos = front->pos; /* warm-up: track choice */
                continue;
            }
            if (seg0) {
                /* literal reference rule (incl. the window-0 quirk) */
                if (front->pos != run_pos) {
                    run_pos = front->pos;
                    run_wfield = 0;
                }
                if (!have_last || last_hash != front->hash ||
                    last_wpos != run_wfield) {
                    run_wfield = window_id;
                    sg->out_h[count] = front->hash;
                    sg->out_p[count] = window_id;
                    last_hash = front->hash;
                    last_wpos = window_id;
                    have_last = 1;
                    count++;
                }
            } else {
                /* mid-sequence rule: record on occurrence change */
                if (front->pos != prev_choice_pos) {
                    sg->out_h[count] = front->hash;
                    sg->out_p[count] = window_id;
                    count++;
                }
                prev_choice_pos = front->pos;
            }
        }
    }
    free(q);
    free(hf);
    free(hb);
    sg->count = count;
    sg->last_hash = last_hash;
    sg->last_wpos = last_wpos;
    sg->have_last = have_last;
    return NULL;
}

#define SEG_MIN_WINDOWS ((Py_ssize_t)1 << 20) /* threshold for 2 segments */

static PyObject *py_winnow(PyObject *self, PyObject *args) {
    Py_buffer buf;
    int k, w, protein = 0;
    if (!PyArg_ParseTuple(args, "y*ii|p", &buf, &k, &w, &protein))
        return NULL;
    Py_ssize_t n = buf.len;
    Py_ssize_t n_pos = n - k + 1;
    if (k < 1 || w < 1) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "k and w must be >= 1");
        return NULL;
    }
    Py_ssize_t P = n_pos - w + 1; /* windows */
    if (n_pos < 1 || P < 1) {
        PyBuffer_Release(&buf);
        return Py_BuildValue("(y#y#)", "", (Py_ssize_t)0, "", (Py_ssize_t)0);
    }
    const uint8_t *data = (const uint8_t *)buf.buf;
    uint32_t *oh = (uint32_t *)malloc(sizeof(uint32_t) * (size_t)P);
    int32_t *op = (int32_t *)malloc(sizeof(int32_t) * (size_t)P);
    uint8_t *rc = protein ? NULL : (uint8_t *)malloc((size_t)n);
    int nseg = (!protein && P >= SEG_MIN_WINDOWS) ? 2 : 1;
    Py_ssize_t mid = nseg == 2 ? P / 2 : P;
    uint32_t *oh1 = NULL;
    int32_t *op1 = NULL;
    if (nseg == 2) {
        oh1 = (uint32_t *)malloc(sizeof(uint32_t) * (size_t)(P - mid));
        op1 = (int32_t *)malloc(sizeof(int32_t) * (size_t)(P - mid));
    }
    if (!oh || !op || (!protein && !rc) || (nseg == 2 && (!oh1 || !op1))) {
        free(oh); free(op); free(rc); free(oh1); free(op1);
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    winseg_t sg0 = {data, rc, n, n_pos, k, w, protein,
                    0, mid, nseg == 1, oh, op, 0, 0, 0, 0};
    winseg_t sg1 = {data, rc, n, n_pos, k, w, protein,
                    mid, P, 0, oh1, op1, 0, 0, 0, 0};
    Py_ssize_t count = 0;
    int failed = 0;
    Py_BEGIN_ALLOW_THREADS
    if (!protein) {
        rcjob_t r0 = {data, rc, n, 0, n / 2};
        rcjob_t r1 = {data, rc, n, n / 2, n};
        pthread_t rth;
        if (nseg == 2 && pthread_create(&rth, NULL, rc_job, &r1) == 0) {
            rc_job(&r0);
            pthread_join(rth, NULL);
        } else {
            r0.j1 = n;
            rc_job(&r0);
        }
    }
    if (nseg == 2) {
        pthread_t th;
        if (pthread_create(&th, NULL, winnow_seg, &sg1) == 0) {
            winnow_seg(&sg0);
            pthread_join(th, NULL);
        } else {
            sg0.w1 = P;
            sg0.strand_thread = 1;
            winnow_seg(&sg0);
            sg1.count = 0;
        }
    } else {
        winnow_seg(&sg0);
    }
    if (sg0.count < 0 || sg1.count < 0) {
        failed = 1;
    } else {
        count = sg0.count;
        /* phantom stitch (see winnow_seg): while the contig-start
         * phantom is still active at the seam -- the last seg-0 record
         * was the window-0 record -- drop seg-1 records carrying the
         * phantom hash until a different hash breaks the run */
        int phantom = sg0.have_last && sg0.last_wpos == 0;
        for (Py_ssize_t i = 0; i < sg1.count; i++) {
            if (phantom) {
                if (oh1[i] == sg0.last_hash)
                    continue;
                phantom = 0;
            }
            oh[count] = oh1[i];
            op[count] = op1[i];
            count++;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    free(rc);
    free(oh1);
    free(op1);
    PyObject *ret = NULL;
    if (failed) {
        PyErr_NoMemory();
    } else {
        ret = Py_BuildValue("(y#y#)", (const char *)oh,
                            (Py_ssize_t)(count * 4), (const char *)op,
                            (Py_ssize_t)(count * 4));
    }
    free(oh);
    free(op);
    return ret;
}

#define LINE_BUFFER 2048

static PyObject *py_parse_fasta(PyObject *self, PyObject *args) {
    PyObject *path_obj;
    if (!PyArg_ParseTuple(args, "O&", PyUnicode_FSConverter, &path_obj))
        return NULL;
    const char *path = PyBytes_AS_STRING(path_obj);
    FILE *fp = fopen(path, "rb");
    if (!fp) {
        PyErr_SetFromErrnoWithFilenameObject(PyExc_OSError, path_obj);
        Py_DECREF(path_obj);
        return NULL;
    }
    Py_DECREF(path_obj);

    PyObject *records = PyList_New(0);
    if (!records) { fclose(fp); return NULL; }

    char line[LINE_BUFFER];
    size_t cap = 1 << 16;
    size_t len = 0;
    unsigned char *seq = (unsigned char *)malloc(cap);
    PyObject *cur_id = NULL;
    int ok = 1;

    if (!seq) { ok = 0; PyErr_NoMemory(); }

    while (ok && fgets(line, sizeof(line), fp)) {
        size_t n = strlen(line);
        if (line[0] == '>') {
            if (n == 0 || line[n - 1] != '\n') {
                PyErr_SetString(PyExc_BufferError,
                                "FASTA identifier too large for the line buffer");
                ok = 0;
                break;
            }
            if (cur_id) {
                PyObject *sb = PyBytes_FromStringAndSize((char *)seq, len);
                PyObject *tup = sb ? PyTuple_Pack(2, cur_id, sb) : NULL;
                Py_XDECREF(sb);
                if (!tup || PyList_Append(records, tup) < 0) {
                    Py_XDECREF(tup);
                    ok = 0;
                    break;
                }
                Py_DECREF(tup);
                Py_CLEAR(cur_id);
            }
            /* header without '>' and trailing newline */
            cur_id = PyUnicode_DecodeLatin1(line + 1, n - 2, "replace");
            if (!cur_id) { ok = 0; break; }
            len = 0;
        } else if (cur_id) {
            if (n && line[n - 1] == '\n') n--;
            if (len + n >= cap) {
                while (len + n >= cap) cap *= 2;
                unsigned char *grown = (unsigned char *)realloc(seq, cap);
                if (!grown) { PyErr_NoMemory(); ok = 0; break; }
                seq = grown;
            }
            for (size_t i = 0; i < n; i++)
                seq[len + i] = UPPER_LUT[(unsigned char)line[i]];
            len += n;
        }
    }
    if (ok && cur_id) {
        PyObject *sb = PyBytes_FromStringAndSize((char *)seq, len);
        PyObject *tup = sb ? PyTuple_Pack(2, cur_id, sb) : NULL;
        Py_XDECREF(sb);
        if (!tup || PyList_Append(records, tup) < 0) {
            Py_XDECREF(tup);
            ok = 0;
        } else {
            Py_DECREF(tup);
        }
        Py_CLEAR(cur_id);
    }
    free(seq);
    Py_XDECREF(cur_id);
    fclose(fp);
    if (!ok) { Py_DECREF(records); return NULL; }
    return records;
}

static PyMethodDef Methods[] = {
    {"parse_fasta", py_parse_fasta, METH_VARARGS,
     "parse_fasta(path) -> list of (id, uppercased seq bytes)"},
    {"copy_upper", py_copy_upper, METH_VARARGS,
     "copy_upper(bytes) -> uppercased bytes"},
    {"reverse_complement", py_reverse_complement, METH_VARARGS,
     "reverse_complement(bytes) -> IUPAC reverse complement"},
    {"murmur3_32", py_murmur3_32, METH_VARARGS,
     "murmur3_32(data, seed=42) -> uint32 hash"},
    {"winnow", py_winnow, METH_VARARGS,
     "winnow(data, k, w, protein=False) -> (hashes_u32_bytes, wpos_i32_bytes)"},
    {NULL, NULL, 0, NULL}
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native", "native host runtime", -1, Methods
};

PyMODINIT_FUNC PyInit__native(void) {
    init_luts();
#if defined(FASTAMOD_X86) && defined(__GNUC__)
    HAVE_AVX2 = __builtin_cpu_supports("avx2");
#endif
    return PyModule_Create(&moduledef);
}
