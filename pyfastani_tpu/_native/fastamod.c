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
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

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
    int32_t pos;    /* k-mer position */
    int32_t wfield; /* mutable wpos field, 0 until recorded (quirk) */
} qent_t;

static Py_ssize_t winnow_c(const uint8_t *data, Py_ssize_t n, int k, int w,
                           int protein, uint32_t *out_h, int32_t *out_p,
                           uint8_t *rc /* scratch, n bytes, may be NULL when
                                          protein */) {
    Py_ssize_t n_pos = n - k + 1;
    Py_ssize_t count = 0;
    if (!protein)
        for (Py_ssize_t j = 0; j < n; j++)
            rc[j] = COMPLEMENT_LOOKUP[data[n - 1 - j] & 0x7f];

    /* deque as a ring buffer: at most w live entries */
    Py_ssize_t qcap = (Py_ssize_t)w + 1;
    qent_t *q = (qent_t *)malloc(sizeof(qent_t) * qcap);
    if (!q) return -1;
    Py_ssize_t qh = 0, qt = 0; /* [qh, qt) modulo qcap */

    uint32_t last_hash = 0;
    int32_t last_wpos = 0;
    int have_last = 0;

    for (Py_ssize_t i = 0; i < n_pos; i++) {
        uint32_t current;
        uint32_t hf = murmur3_x86_32(data + i, k, 42u);
        if (!protein) {
            uint32_t hb = murmur3_x86_32(rc + (n_pos - 1 - i), k, 42u);
            if (hb == hf)
                continue; /* palindromic k-mers skipped entirely */
            current = hf < hb ? hf : hb;
        } else {
            current = hf;
        }
        int32_t window_id = (int32_t)i - w + 1;
        while (qh != qt && q[qh % qcap].pos <= (int32_t)i - w)
            qh++;
        while (qh != qt && q[(qt - 1) % qcap].hash >= current)
            qt--;
        q[qt % qcap].hash = current;
        q[qt % qcap].pos = (int32_t)i;
        q[qt % qcap].wfield = 0;
        qt++;
        if (window_id >= 0) {
            qent_t *front = &q[qh % qcap];
            if (!have_last || last_hash != front->hash ||
                last_wpos != front->wfield) {
                front->wfield = window_id;
                out_h[count] = front->hash;
                out_p[count] = window_id;
                last_hash = front->hash;
                last_wpos = window_id;
                have_last = 1;
                count++;
            }
        }
    }
    free(q);
    return count;
}

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
    if (n_pos < 1 || n_pos - w + 1 < 1) {
        PyBuffer_Release(&buf);
        return Py_BuildValue("(y#y#)", "", (Py_ssize_t)0, "", (Py_ssize_t)0);
    }
    uint32_t *oh = (uint32_t *)malloc(sizeof(uint32_t) * (size_t)n_pos);
    int32_t *op = (int32_t *)malloc(sizeof(int32_t) * (size_t)n_pos);
    uint8_t *rc = protein ? NULL : (uint8_t *)malloc((size_t)n);
    if (!oh || !op || (!protein && !rc)) {
        free(oh); free(op); free(rc);
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }
    Py_ssize_t count;
    Py_BEGIN_ALLOW_THREADS
    count = winnow_c((const uint8_t *)buf.buf, n, k, w, protein, oh, op, rc);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    free(rc);
    PyObject *ret = NULL;
    if (count < 0) {
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
    return PyModule_Create(&moduledef);
}
