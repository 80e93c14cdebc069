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

/* ------------------------------------------------------------------ */
/* sort_u32_perm: stable permutation sort of uint32 keys.
 *
 * The index build sorts the minimizer stream by hash (CSR construction,
 * _engine_np.build_index) and again lexicographically for the
 * previous-occurrence table (l2_pallas.compute_mini_prev).  Because the
 * minimizer stream arrives position-ordered, ONE stable sort by hash
 * yields both orders -- and a threaded LSD radix sort is ~10x cheaper
 * than np.argsort(kind="stable") at the 56M-minimizer bench scale.
 *
 * 4 passes of 8-bit counting sort over (key, idx) pairs; two threads
 * split the element range, with stable cross-thread bucket offsets
 * (thread 0's members of a bucket precede thread 1's).            */

typedef struct { uint32_t key; int32_t idx; } kv_t;

#define RAD_NT 2 /* this box has 2 cores */

typedef struct {
    const kv_t *src;
    kv_t *dst;
    size_t lo, hi;
    size_t hist[256];
    size_t offs[256];
    int shift;
} radpass_t;

static void *rad_hist(void *arg) {
    radpass_t *rp = (radpass_t *)arg;
    memset(rp->hist, 0, sizeof(rp->hist));
    const int sh = rp->shift;
    for (size_t i = rp->lo; i < rp->hi; i++)
        rp->hist[(rp->src[i].key >> sh) & 0xFF]++;
    return NULL;
}

static void *rad_scat(void *arg) {
    radpass_t *rp = (radpass_t *)arg;
    const int sh = rp->shift;
    for (size_t i = rp->lo; i < rp->hi; i++) {
        const kv_t e = rp->src[i];
        rp->dst[rp->offs[(e.key >> sh) & 0xFF]++] = e;
    }
    return NULL;
}

typedef struct {
    const uint32_t *keys;
    kv_t *out;
    size_t lo, hi;
} radfill_t;

static void *rad_fill(void *arg) {
    radfill_t *rf = (radfill_t *)arg;
    for (size_t i = rf->lo; i < rf->hi; i++) {
        rf->out[i].key = rf->keys[i];
        rf->out[i].idx = (int32_t)i;
    }
    return NULL;
}

static PyObject *py_sort_u32_perm(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    if (buf.len % 4) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer length must be 4-aligned");
        return NULL;
    }
    size_t n = (size_t)buf.len / 4;
    if (n > (size_t)INT32_MAX) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "more than 2^31 keys");
        return NULL;
    }
    PyObject *res = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(n * 4));
    if (!res) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    if (n == 0) {
        PyBuffer_Release(&buf);
        return res;
    }
    const uint32_t *keys = (const uint32_t *)buf.buf;
    int32_t *perm = (int32_t *)PyBytes_AS_STRING(res);
    kv_t *a = (kv_t *)malloc(n * sizeof(kv_t));
    kv_t *b = (kv_t *)malloc(n * sizeof(kv_t));
    if (!a || !b) {
        free(a); free(b);
        PyBuffer_Release(&buf);
        Py_DECREF(res);
        return PyErr_NoMemory();
    }
    Py_BEGIN_ALLOW_THREADS
    {
        size_t cut = (n / 2) & ~(size_t)7;
        radfill_t rf[RAD_NT] = {{keys, a, 0, cut}, {keys, a, cut, n}};
        pthread_t th;
        if (n > (1 << 16) && pthread_create(&th, NULL, rad_fill, &rf[1]) == 0) {
            rad_fill(&rf[0]);
            pthread_join(th, NULL);
        } else {
            rf[0].hi = n;
            rad_fill(&rf[0]);
        }
        kv_t *src = a, *dst = b;
        for (int shift = 0; shift < 32; shift += 8) {
            radpass_t rp[RAD_NT];
            for (int t = 0; t < RAD_NT; t++) {
                rp[t].src = src;
                rp[t].dst = dst;
                rp[t].lo = t == 0 ? 0 : cut;
                rp[t].hi = t == 0 ? cut : n;
                rp[t].shift = shift;
            }
            int threaded = n > (1 << 16) &&
                pthread_create(&th, NULL, rad_hist, &rp[1]) == 0;
            if (!threaded)
                rad_hist(&rp[1]); /* memsets hist; loops 0..0 when empty */
            rad_hist(&rp[0]);
            if (threaded)
                pthread_join(th, NULL);
            /* stable global offsets: bucket-major, then thread-major */
            size_t run = 0;
            for (int d = 0; d < 256; d++)
                for (int t = 0; t < RAD_NT; t++) {
                    rp[t].offs[d] = run;
                    run += rp[t].hist[d];
                }
            threaded = threaded &&
                pthread_create(&th, NULL, rad_scat, &rp[1]) == 0;
            rad_scat(&rp[0]);
            if (threaded)
                pthread_join(th, NULL);
            else
                rad_scat(&rp[1]);
            kv_t *tmp = src; src = dst; dst = tmp;
        }
        /* after an even number of passes the result is back in `src` */
        for (size_t i = 0; i < n; i++)
            perm[i] = src[i].idx;
    }
    Py_END_ALLOW_THREADS
    free(a);
    free(b);
    PyBuffer_Release(&buf);
    return res;
}

/* take32: out[i] = values[idx[i]] for 4-byte elements, threaded.
 * The index build permutes three 4-byte arrays by the sort order; numpy
 * fancy indexing is single-threaded and allocation-bound here. */
typedef struct {
    const uint32_t *vals;
    const int32_t *idx;
    uint32_t *out;
    size_t lo, hi;
} takejob_t;

static void *take_job(void *arg) {
    takejob_t *tj = (takejob_t *)arg;
    for (size_t i = tj->lo; i < tj->hi; i++)
        tj->out[i] = tj->vals[tj->idx[i]];
    return NULL;
}

static PyObject *py_take32(PyObject *self, PyObject *args) {
    Py_buffer vals, idx;
    if (!PyArg_ParseTuple(args, "y*y*", &vals, &idx))
        return NULL;
    if (vals.len % 4 || idx.len % 4) {
        PyBuffer_Release(&vals);
        PyBuffer_Release(&idx);
        PyErr_SetString(PyExc_ValueError, "buffers must be 4-aligned");
        return NULL;
    }
    size_t n = (size_t)idx.len / 4;
    size_t nv = (size_t)vals.len / 4;
    const int32_t *ix = (const int32_t *)idx.buf;
    for (size_t i = 0; i < n; i++)
        if ((uint32_t)ix[i] >= nv) {
            PyBuffer_Release(&vals);
            PyBuffer_Release(&idx);
            PyErr_SetString(PyExc_IndexError, "take32 index out of range");
            return NULL;
        }
    PyObject *res = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(n * 4));
    if (!res) {
        PyBuffer_Release(&vals);
        PyBuffer_Release(&idx);
        return NULL;
    }
    takejob_t tj0 = {(const uint32_t *)vals.buf, ix,
                     (uint32_t *)PyBytes_AS_STRING(res), 0, n / 2};
    takejob_t tj1 = {(const uint32_t *)vals.buf, ix,
                     (uint32_t *)PyBytes_AS_STRING(res), n / 2, n};
    Py_BEGIN_ALLOW_THREADS
    {
        pthread_t th;
        if (n > (1 << 16) && pthread_create(&th, NULL, take_job, &tj1) == 0) {
            take_job(&tj0);
            pthread_join(th, NULL);
        } else {
            tj0.hi = n;
            take_job(&tj0);
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&vals);
    PyBuffer_Release(&idx);
    return res;
}

/* csr_bounds: group boundaries of an ascending u32 key array.
 * Returns (uniq_hash u32[U], row_start i32[U], row_len i32[U]) -- the
 * CSR skeleton of the posting index -- in two threaded passes.     */
typedef struct {
    const uint32_t *keys;
    size_t lo, hi;   /* element range */
    size_t count;    /* boundaries found in range */
    uint32_t *uq;    /* output slices (pass 2) */
    int32_t *rs;
} csrjob_t;

static void *csr_count(void *arg) {
    csrjob_t *cj = (csrjob_t *)arg;
    size_t c = 0;
    const uint32_t *k = cj->keys;
    for (size_t i = cj->lo; i < cj->hi; i++)
        c += (i == 0) || (k[i] != k[i - 1]);
    cj->count = c;
    return NULL;
}

static void *csr_fill(void *arg) {
    csrjob_t *cj = (csrjob_t *)arg;
    const uint32_t *k = cj->keys;
    size_t o = 0;
    for (size_t i = cj->lo; i < cj->hi; i++)
        if (i == 0 || k[i] != k[i - 1]) {
            cj->uq[o] = k[i];
            cj->rs[o] = (int32_t)i;
            o++;
        }
    return NULL;
}

static PyObject *py_csr_bounds(PyObject *self, PyObject *args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    if (buf.len % 4) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer must be 4-aligned");
        return NULL;
    }
    size_t n = (size_t)buf.len / 4;
    const uint32_t *keys = (const uint32_t *)buf.buf;
    size_t cut = n / 2;
    csrjob_t cj0 = {keys, 0, cut, 0, NULL, NULL};
    csrjob_t cj1 = {keys, cut, n, 0, NULL, NULL};
    Py_BEGIN_ALLOW_THREADS
    {
        pthread_t th;
        if (n > (1 << 16) && pthread_create(&th, NULL, csr_count, &cj1) == 0) {
            csr_count(&cj0);
            pthread_join(th, NULL);
        } else {
            cj0.hi = n;
            csr_count(&cj0);
            cj1.lo = cj1.hi = n;
            cj1.count = 0;
        }
    }
    Py_END_ALLOW_THREADS
    size_t u = cj0.count + cj1.count;
    PyObject *uq_b = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(u * 4));
    PyObject *rs_b = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(u * 4));
    PyObject *rl_b = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(u * 4));
    if (!uq_b || !rs_b || !rl_b) {
        Py_XDECREF(uq_b); Py_XDECREF(rs_b); Py_XDECREF(rl_b);
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint32_t *uq = (uint32_t *)PyBytes_AS_STRING(uq_b);
    int32_t *rs = (int32_t *)PyBytes_AS_STRING(rs_b);
    int32_t *rl = (int32_t *)PyBytes_AS_STRING(rl_b);
    cj0.uq = uq; cj0.rs = rs;
    cj1.uq = uq + cj0.count; cj1.rs = rs + cj0.count;
    Py_BEGIN_ALLOW_THREADS
    {
        pthread_t th;
        int threaded = cj1.hi > cj1.lo &&
            pthread_create(&th, NULL, csr_fill, &cj1) == 0;
        csr_fill(&cj0);
        if (threaded)
            pthread_join(th, NULL);
        else if (cj1.hi > cj1.lo)
            csr_fill(&cj1);
        for (size_t i = 0; i + 1 < u; i++)
            rl[i] = rs[i + 1] - rs[i];
        if (u)
            rl[u - 1] = (int32_t)n - rs[u - 1];
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    PyObject *res = PyTuple_Pack(3, uq_b, rs_b, rl_b);
    Py_DECREF(uq_b); Py_DECREF(rs_b); Py_DECREF(rl_b);
    return res;
}

/* hist_prefix: histogram of (keys >> shift), threaded.
 * Returns i32[nbins] counts; keys whose shifted value >= nbins are
 * dropped (caller sizes nbins to cover the range).                 */
typedef struct {
    const uint32_t *keys;
    size_t lo, hi;
    int shift;
    size_t nbins;
    int32_t *hist; /* per-thread buffer */
} histjob_t;

static void *hist_job(void *arg) {
    histjob_t *hj = (histjob_t *)arg;
    memset(hj->hist, 0, hj->nbins * sizeof(int32_t));
    for (size_t i = hj->lo; i < hj->hi; i++) {
        size_t b = hj->keys[i] >> hj->shift;
        if (b < hj->nbins)
            hj->hist[b]++;
    }
    return NULL;
}

static PyObject *py_hist_prefix(PyObject *self, PyObject *args) {
    Py_buffer buf;
    int shift, bits;
    if (!PyArg_ParseTuple(args, "y*ii", &buf, &shift, &bits))
        return NULL;
    if (buf.len % 4 || shift < 0 || shift > 31 || bits < 1 || bits > 26) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "bad arguments");
        return NULL;
    }
    size_t n = (size_t)buf.len / 4;
    size_t nbins = (size_t)1 << bits;
    PyObject *res = PyBytes_FromStringAndSize(NULL, (Py_ssize_t)(nbins * 4));
    if (!res) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    int32_t *out = (int32_t *)PyBytes_AS_STRING(res);
    int32_t *tmp = (int32_t *)malloc(nbins * sizeof(int32_t));
    if (!tmp) {
        Py_DECREF(res);
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    histjob_t h0 = {(const uint32_t *)buf.buf, 0, n / 2, shift, nbins, out};
    histjob_t h1 = {(const uint32_t *)buf.buf, n / 2, n, shift, nbins, tmp};
    Py_BEGIN_ALLOW_THREADS
    {
        pthread_t th;
        if (n > (1 << 16) && pthread_create(&th, NULL, hist_job, &h1) == 0) {
            hist_job(&h0);
            pthread_join(th, NULL);
            for (size_t b = 0; b < nbins; b++)
                out[b] += tmp[b];
        } else {
            h0.hi = n;
            hist_job(&h0);
        }
    }
    Py_END_ALLOW_THREADS
    free(tmp);
    PyBuffer_Release(&buf);
    return res;
}

/* max_window_count(sorted_i32, window): the densest half-open window
 * [v, v + window) of an ascending i32 array, via one two-pointer pass
 * (replaces a 26-round vectorized binary search at bench scale). */
static PyObject *py_max_window_count(PyObject *self, PyObject *args) {
    Py_buffer buf;
    long long window;
    if (!PyArg_ParseTuple(args, "y*L", &buf, &window))
        return NULL;
    if (buf.len % 4) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer must be 4-aligned");
        return NULL;
    }
    size_t n = (size_t)buf.len / 4;
    const int32_t *v = (const int32_t *)buf.buf;
    size_t best = 0;
    Py_BEGIN_ALLOW_THREADS
    {
        size_t j = 0;
        for (size_t i = 0; i < n; i++) {
            if (j < i)
                j = i;
            while (j < n && (long long)v[j] < (long long)v[i] + window)
                j++;
            if (j - i > best)
                best = j - i;
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    return PyLong_FromSize_t(best);
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
    {"sort_u32_perm", py_sort_u32_perm, METH_VARARGS,
     "sort_u32_perm(u32_bytes) -> i32_bytes stable sort permutation"},
    {"take32", py_take32, METH_VARARGS,
     "take32(vals_4byte_bytes, idx_i32_bytes) -> vals[idx] bytes"},
    {"csr_bounds", py_csr_bounds, METH_VARARGS,
     "csr_bounds(sorted_u32_bytes) -> (uniq u32, row_start i32, row_len i32)"},
    {"hist_prefix", py_hist_prefix, METH_VARARGS,
     "hist_prefix(u32_bytes, shift, bits) -> i32[2^bits] counts"},
    {"max_window_count", py_max_window_count, METH_VARARGS,
     "max_window_count(sorted_i32_bytes, window) -> densest-window count"},
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
