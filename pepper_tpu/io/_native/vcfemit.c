/* CPython extension: native VCF record emission.
 *
 * Covers the hot half of the reference's VcfWriter.py:140-218 contract —
 * single-candidate site assembly, record-line formatting, QV routing,
 * positional dedup, BGZF block compression and tabix virtual-offset
 * computation — byte-exact to the pure-Python engine in
 * pepper_tpu/decode/vcf_writer.py (fuzz-asserted by
 * tests/test_decode.py::test_native_vcf_emit_matches_python).
 *
 * emit_chunk(items, (snp_q, snp_q_lc, indel_q, indel_q_lc),
 *            last_position, level)
 *   items: list; each element is one of
 *     - a 12-tuple decoded candidate (single-candidate site; the layout of
 *       decode/candidate_finder.py's deepvariant_list entries),
 *     - a 5-tuple pre-encoded record (contig, start, end, line_bytes,
 *       route) for multi-candidate sites assembled in Python,
 *     - None (a site whose assembly produced no alleles).
 *   last_position: running positional-dedup state (VcfWriter.py:149 —
 *     never reset across contigs).
 * Returns (streams, (n_pepper, n_vc_snp, n_vc_indel), new_last_position)
 *   streams: 5 x (bgzf_blob, runs); runs: [(contig, begs, ends, vstarts,
 *   vends)] with int64-little-endian bytes payloads per contig run.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <zlib.h>

#define BGZF_BLOCK 65280
#define N_FILES 5

/* route ids must match decode/vcf_writer.py ROUTE_* */
#define ROUTE_PEPPER 0
#define ROUTE_VC_SNP 1
#define ROUTE_VC_INDEL 2

static const unsigned char FILE_ROUTE_MASK[N_FILES] = {
    /* full */ 1 << ROUTE_PEPPER | 1 << ROUTE_VC_SNP | 1 << ROUTE_VC_INDEL,
    /* pepper */ 1 << ROUTE_PEPPER,
    /* vc */ 1 << ROUTE_VC_SNP | 1 << ROUTE_VC_INDEL,
    /* vc_snp */ 1 << ROUTE_VC_SNP,
    /* vc_indel */ 1 << ROUTE_VC_INDEL,
};

typedef struct {
    char *buf;
    size_t len, cap;
} Arena;

static int arena_ensure(Arena *a, size_t extra) {
    if (a->len + extra <= a->cap) return 0;
    size_t cap = a->cap ? a->cap : 1 << 16;
    while (cap < a->len + extra) cap *= 2;
    char *buf = (char *)realloc(a->buf, cap);
    if (!buf) return -1;
    a->buf = buf;
    a->cap = cap;
    return 0;
}

typedef struct {
    PyObject *contig;  /* borrowed from the item tuple */
    long long pos, end;
    size_t line_off;
    int line_len;
    int route;
} Rec;

/* %g formatting of a double — identical to Python's f"{x:g}"
 * (both are correctly-rounded 6-significant-digit shortest forms). */
static int fmt_g(double v, char *out, size_t cap) {
    return snprintf(out, cap, "%g", v);
}

/* f"{round(x, 3):g}" — Python round() is the correctly-rounded decimal at
 * 3 places (ties to even), which is exactly what "%.3f" produces; the
 * strtod round-trip yields the same double Python's round() returns. */
static int fmt_round3_g(double v, char *out, size_t cap) {
    char tmp[352];
    snprintf(tmp, sizeof tmp, "%.3f", v);
    return fmt_g(strtod(tmp, NULL), out, cap);
}

static int get_longlong(PyObject *obj, long long *out) {
    if (PyLong_Check(obj)) {
        *out = PyLong_AsLongLong(obj);
    } else {
        PyObject *num = PyNumber_Long(obj);
        if (!num) return -1;
        *out = PyLong_AsLongLong(num);
        Py_DECREF(num);
    }
    return (*out == -1 && PyErr_Occurred()) ? -1 : 0;
}

static int get_double_item(PyObject *seq, Py_ssize_t i, double *out) {
    PyObject *item = PySequence_GetItem(seq, i);
    if (!item) return -1;
    *out = PyFloat_AsDouble(item);
    Py_DECREF(item);
    return (*out == -1.0 && PyErr_Occurred()) ? -1 : 0;
}

/* Encode one single-candidate site (decode 12-tuple) into the line arena.
 * Field-for-field the fast path of vcf_writer._encode_single_candidate. */
static int encode_single(PyObject *cand, const double *cutoffs,
                         Arena *lines, Rec *rec) {
    PyObject *contig = PyTuple_GET_ITEM(cand, 0);
    Py_ssize_t contig_len, ref_len, alt_len;
    const char *contig_s = PyUnicode_AsUTF8AndSize(contig, &contig_len);
    if (!contig_s) return -1;

    long long pos, depth, support;
    if (get_longlong(PyTuple_GET_ITEM(cand, 1), &pos) < 0) return -1;
    const char *ref_s = PyUnicode_AsUTF8AndSize(PyTuple_GET_ITEM(cand, 3),
                                                &ref_len);
    if (!ref_s) return -1;
    PyObject *alts = PyTuple_GET_ITEM(cand, 4);
    PyObject *alt0 = PySequence_GetItem(alts, 0);
    if (!alt0) return -1;
    const char *alt_s = PyUnicode_AsUTF8AndSize(alt0, &alt_len);
    if (!alt_s) {
        Py_DECREF(alt0);
        return -1;
    }
    if (get_longlong(PyTuple_GET_ITEM(cand, 6), &depth) < 0) {
        Py_DECREF(alt0);
        return -1;
    }
    PyObject *supports = PyTuple_GET_ITEM(cand, 7);
    PyObject *sup0 = PySequence_GetItem(supports, 0);
    if (!sup0 || get_longlong(sup0, &support) < 0) {
        Py_XDECREF(sup0);
        Py_DECREF(alt0);
        return -1;
    }
    Py_DECREF(sup0);

    PyObject *preds = PyTuple_GET_ITEM(cand, 9);
    double p0, p1, p2;
    if (get_double_item(preds, 0, &p0) < 0 ||
        get_double_item(preds, 1, &p1) < 0 ||
        get_double_item(preds, 2, &p2) < 0) {
        Py_DECREF(alt0);
        return -1;
    }
    PyObject *non_alt = PyTuple_GET_ITEM(cand, 10);
    int in_repeat = PyObject_IsTrue(PyTuple_GET_ITEM(cand, 11));
    if (in_repeat < 0) {
        Py_DECREF(alt0);
        return -1;
    }

    int pg;
    double gt_qual;
    if (p0 >= p1 && p0 >= p2) {
        pg = 0;
        gt_qual = p1 >= p2 ? p1 : p2;
    } else if (p1 >= p2) {
        pg = 1;
        gt_qual = p1;
    } else {
        pg = 2;
        gt_qual = p2;
    }

    double one_minus = 1.0 - gt_qual;
    if (one_minus < 1e-9) one_minus = 1e-9;
    long long qual = (long long)(-10.0 * log10(one_minus));
    if (qual < 1) qual = 1;

    int is_snp = (ref_len == 1 && alt_len == 1);
    double cutoff = is_snp ? (in_repeat ? cutoffs[1] : cutoffs[0])
                           : (in_repeat ? cutoffs[3] : cutoffs[2]);
    int route;
    if (pg == 0 || (double)qual <= cutoff)
        route = is_snp ? ROUTE_VC_SNP : ROUTE_VC_INDEL;
    else
        route = ROUTE_PEPPER;

    long long maxdepth = depth > 1 ? depth : 1;
    char vaf[352];
    fmt_round3_g((double)support / (double)maxdepth, vaf, sizeof vaf);

    /* AP field: comma-joined %g of the non-alt predictions */
    char ap_stack[512];
    char *ap = ap_stack;
    size_t ap_cap = sizeof ap_stack;
    size_t ap_len = 0;
    Py_ssize_t n_ap = PySequence_Size(non_alt);
    if (n_ap < 0) {
        Py_DECREF(alt0);
        return -1;
    }
    char *ap_heap = NULL;
    if ((size_t)n_ap * 32 + 1 > ap_cap) {
        ap_cap = (size_t)n_ap * 32 + 1;
        ap_heap = (char *)malloc(ap_cap);
        if (!ap_heap) {
            Py_DECREF(alt0);
            PyErr_NoMemory();
            return -1;
        }
        ap = ap_heap;
    }
    for (Py_ssize_t i = 0; i < n_ap; i++) {
        double p;
        if (get_double_item(non_alt, i, &p) < 0) {
            free(ap_heap);
            Py_DECREF(alt0);
            return -1;
        }
        if (i) ap[ap_len++] = ',';
        ap_len += fmt_g(p, ap + ap_len, ap_cap - ap_len);
    }
    ap[ap_len] = '\0';

    static const char *GT[3] = {"0/0", "0/1", "1/1"};
    static const char *FILT[3] = {"refCall", "PASS", "PASS"};

    size_t need = (size_t)contig_len + ref_len + alt_len + ap_len + 160;
    if (arena_ensure(lines, need) < 0) {
        free(ap_heap);
        Py_DECREF(alt0);
        PyErr_NoMemory();
        return -1;
    }
    int n = snprintf(
        lines->buf + lines->len, need,
        "%s\t%lld\t.\t%s\t%s\t%lld\t%s\t.\tGT:GQ:DP:AD:VAF:AP:REP\t"
        "%s:%lld:%lld:%lld:%s:%s:%c\n",
        contig_s, pos + 1, ref_s, alt_s, qual, FILT[pg], GT[pg], qual,
        depth, support, vaf, ap, in_repeat ? '1' : '0');
    free(ap_heap);
    Py_DECREF(alt0);
    if (n < 0 || (size_t)n >= need) {
        PyErr_SetString(PyExc_RuntimeError, "vcf line overflow");
        return -1;
    }
    rec->contig = contig;
    rec->pos = pos;
    rec->end = pos + ref_len;
    rec->line_off = lines->len;
    rec->line_len = n;
    rec->route = route;
    lines->len += (size_t)n;
    return 0;
}

/* one complete BGZF block (header + raw deflate + crc/isize trailer) */
static int put_bgzf_block(z_stream *zs, const char *data, size_t n,
                          Arena *out) {
    size_t bound = deflateBound(zs, n) + 30;
    if (arena_ensure(out, bound + 26) < 0) return -1;
    unsigned char *block = (unsigned char *)(out->buf + out->len);
    deflateReset(zs);
    zs->next_in = (Bytef *)data;
    zs->avail_in = (uInt)n;
    zs->next_out = block + 18;
    zs->avail_out = (uInt)bound;
    if (deflate(zs, Z_FINISH) != Z_STREAM_END) return -1;
    size_t csize = (size_t)(zs->next_out - (block + 18));
    size_t bsize = csize + 12 + 6 + 8;
    /* gzip header with BC extra subfield */
    memcpy(block, "\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff\x06\x00"
                  "BC\x02\x00", 16);
    block[16] = (unsigned char)((bsize - 1) & 0xff);
    block[17] = (unsigned char)(((bsize - 1) >> 8) & 0xff);
    uint32_t crc = (uint32_t)crc32(0L, (const Bytef *)data, (uInt)n);
    uint32_t isize = (uint32_t)n;
    memcpy(block + 18 + csize, &crc, 4);
    memcpy(block + 22 + csize, &isize, 4);
    out->len += bsize;
    return 0;
}

static PyObject *int64_bytes(const int64_t *values, size_t n) {
    return PyBytes_FromStringAndSize((const char *)values,
                                     (Py_ssize_t)(n * 8));
}

static PyObject *emit_chunk(PyObject *self, PyObject *args) {
    PyObject *items;
    double cutoffs[4];
    long long last_position;
    int level;
    if (!PyArg_ParseTuple(args, "O(dddd)Li", &items, &cutoffs[0],
                          &cutoffs[1], &cutoffs[2], &cutoffs[3],
                          &last_position, &level))
        return NULL;
    PyObject *fast = PySequence_Fast(items, "items must be a sequence");
    if (!fast) return NULL;
    Py_ssize_t n_items = PySequence_Fast_GET_SIZE(fast);
    PyObject **item_array = PySequence_Fast_ITEMS(fast);

    Arena lines = {0};
    Rec *recs = (Rec *)malloc(sizeof(Rec) * (size_t)(n_items ? n_items : 1));
    if (!recs) {
        Py_DECREF(fast);
        return PyErr_NoMemory();
    }
    size_t n_recs = 0;
    long long counts[3] = {0, 0, 0};

    for (Py_ssize_t i = 0; i < n_items; i++) {
        PyObject *item = item_array[i];
        if (item == Py_None) continue;
        if (!PyTuple_Check(item)) {
            PyErr_SetString(PyExc_TypeError, "item must be tuple or None");
            goto fail;
        }
        Rec *rec = &recs[n_recs];
        if (PyTuple_GET_SIZE(item) == 5) {
            /* pre-encoded record from the Python general path */
            long long end;
            if (get_longlong(PyTuple_GET_ITEM(item, 1), &rec->pos) < 0 ||
                get_longlong(PyTuple_GET_ITEM(item, 2), &end) < 0)
                goto fail;
            PyObject *line = PyTuple_GET_ITEM(item, 3);
            char *line_s;
            Py_ssize_t line_n;
            if (PyBytes_AsStringAndSize(line, &line_s, &line_n) < 0)
                goto fail;
            long long route;
            if (get_longlong(PyTuple_GET_ITEM(item, 4), &route) < 0)
                goto fail;
            if (route < 0 || route > 2) {
                PyErr_Format(PyExc_ValueError,
                             "route must be in [0, 2], got %lld", route);
                goto fail;
            }
            if (rec->pos == last_position) continue;
            if (arena_ensure(&lines, (size_t)line_n) < 0) {
                PyErr_NoMemory();
                goto fail;
            }
            memcpy(lines.buf + lines.len, line_s, (size_t)line_n);
            rec->contig = PyTuple_GET_ITEM(item, 0);
            rec->end = end;
            rec->line_off = lines.len;
            rec->line_len = (int)line_n;
            rec->route = (int)route;
            lines.len += (size_t)line_n;
        } else if (PyTuple_GET_SIZE(item) == 12) {
            size_t saved = lines.len;
            if (encode_single(item, cutoffs, &lines, rec) < 0) goto fail;
            if (rec->pos == last_position) {
                lines.len = saved; /* dedup: drop the encoded line */
                continue;
            }
        } else {
            PyErr_Format(PyExc_TypeError,
                         "item must be a 12-tuple candidate or a 5-tuple "
                         "record, got a %zd-tuple",
                         PyTuple_GET_SIZE(item));
            goto fail;
        }
        last_position = rec->pos;
        counts[rec->route]++;
        n_recs++;
    }

    /* per-file streams */
    PyObject *streams = PyList_New(N_FILES);
    if (!streams) goto fail;
    size_t *sel = (size_t *)malloc(sizeof(size_t) * (n_recs ? n_recs : 1));
    int64_t *scratch = (int64_t *)malloc(8 * 4 * (n_recs ? n_recs : 1));
    Arena file_blob = {0};
    Arena cblob = {0};
    z_stream zs;
    memset(&zs, 0, sizeof zs);
    int zs_ready = deflateInit2(&zs, level, Z_DEFLATED, -15, 8,
                                Z_DEFAULT_STRATEGY) == Z_OK;
    if (!sel || !scratch || !zs_ready) {
        free(sel);
        free(scratch);
        if (zs_ready) deflateEnd(&zs);
        Py_DECREF(streams);
        PyErr_NoMemory();
        goto fail;
    }

    for (int f = 0; f < N_FILES; f++) {
        unsigned char mask = FILE_ROUTE_MASK[f];
        size_t n_sel = 0;
        file_blob.len = 0;
        int64_t *ustarts = scratch;
        for (size_t r = 0; r < n_recs; r++) {
            if (!(mask & (1u << recs[r].route))) continue;
            if (arena_ensure(&file_blob, (size_t)recs[r].line_len) < 0) {
                PyErr_NoMemory();
                goto fail_files;
            }
            ustarts[n_sel] = (int64_t)file_blob.len;
            memcpy(file_blob.buf + file_blob.len,
                   lines.buf + recs[r].line_off,
                   (size_t)recs[r].line_len);
            file_blob.len += (size_t)recs[r].line_len;
            sel[n_sel++] = r;
        }
        /* compress as independent full blocks; record block offsets */
        size_t n_blocks = (file_blob.len + BGZF_BLOCK - 1) / BGZF_BLOCK;
        int64_t *block_coff =
            (int64_t *)malloc(8 * (n_blocks + 2));
        if (!block_coff) {
            PyErr_NoMemory();
            goto fail_files;
        }
        cblob.len = 0;
        int zerr = 0;
        Py_BEGIN_ALLOW_THREADS
        for (size_t b = 0; b < n_blocks; b++) {
            block_coff[b] = (int64_t)cblob.len;
            size_t off = b * BGZF_BLOCK;
            size_t n = file_blob.len - off;
            if (n > BGZF_BLOCK) n = BGZF_BLOCK;
            if (put_bgzf_block(&zs, file_blob.buf + off, n, &cblob) < 0) {
                zerr = 1;
                break;
            }
        }
        Py_END_ALLOW_THREADS
        block_coff[n_blocks] = (int64_t)cblob.len;
        if (zerr) {
            free(block_coff);
            PyErr_SetString(PyExc_RuntimeError, "deflate failed");
            goto fail_files;
        }
        /* virtual offsets + contig runs */
        int64_t *begs = scratch + n_recs;
        int64_t *ends = scratch + 2 * (size_t)n_recs;
        int64_t *vstarts = scratch;  /* reuse: ustarts consumed in place */
        int64_t *vends = scratch + 3 * (size_t)n_recs;
        for (size_t k = 0; k < n_sel; k++) {
            int64_t us = ustarts[k];
            int64_t ue = us + recs[sel[k]].line_len;
            begs[k] = recs[sel[k]].pos;
            ends[k] = recs[sel[k]].end;
            vends[k] = (block_coff[ue / BGZF_BLOCK] << 16) |
                       (ue % BGZF_BLOCK);
            vstarts[k] = (block_coff[us / BGZF_BLOCK] << 16) |
                         (us % BGZF_BLOCK);
        }
        free(block_coff);

        PyObject *runs = PyList_New(0);
        PyObject *blob_obj =
            PyBytes_FromStringAndSize(cblob.buf, (Py_ssize_t)cblob.len);
        if (!runs || !blob_obj) {
            Py_XDECREF(runs);
            Py_XDECREF(blob_obj);
            goto fail_files;
        }
        size_t run_start = 0;
        while (run_start < n_sel) {
            PyObject *contig = recs[sel[run_start]].contig;
            size_t run_end = run_start + 1;
            while (run_end < n_sel) {
                PyObject *other = recs[sel[run_end]].contig;
                if (other != contig) {
                    int eq = PyObject_RichCompareBool(other, contig, Py_EQ);
                    if (eq < 0) {
                        Py_DECREF(runs);
                        Py_DECREF(blob_obj);
                        goto fail_files;
                    }
                    if (!eq) break;
                }
                run_end++;
            }
            size_t m = run_end - run_start;
            PyObject *b_begs = int64_bytes(begs + run_start, m);
            PyObject *b_ends = int64_bytes(ends + run_start, m);
            PyObject *b_vs = int64_bytes(vstarts + run_start, m);
            PyObject *b_ve = int64_bytes(vends + run_start, m);
            PyObject *entry = NULL;
            if (b_begs && b_ends && b_vs && b_ve)
                entry = Py_BuildValue("(OOOOO)", contig, b_begs, b_ends,
                                      b_vs, b_ve);
            Py_XDECREF(b_begs);
            Py_XDECREF(b_ends);
            Py_XDECREF(b_vs);
            Py_XDECREF(b_ve);
            if (!entry || PyList_Append(runs, entry) < 0) {
                Py_XDECREF(entry);
                Py_DECREF(runs);
                Py_DECREF(blob_obj);
                goto fail_files;
            }
            Py_DECREF(entry);
            run_start = run_end;
        }
        PyObject *stream = Py_BuildValue("(NN)", blob_obj, runs);
        if (!stream) goto fail_files;
        PyList_SET_ITEM(streams, f, stream);
    }

    deflateEnd(&zs);
    free(sel);
    free(scratch);
    free(file_blob.buf);
    free(cblob.buf);
    free(lines.buf);
    free(recs);
    Py_DECREF(fast);
    {
        PyObject *result = Py_BuildValue(
            "(O(LLL)L)", streams, counts[0], counts[1], counts[2],
            last_position);
        Py_DECREF(streams);
        return result;
    }

fail_files:
    deflateEnd(&zs);
    free(sel);
    free(scratch);
    free(file_blob.buf);
    free(cblob.buf);
    Py_DECREF(streams);
fail:
    free(lines.buf);
    free(recs);
    Py_DECREF(fast);
    return NULL;
}

static PyMethodDef methods[] = {
    {"emit_chunk", emit_chunk, METH_VARARGS,
     "encode+dedup+compress one chunk of VCF records"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_pepper_vcfemit", NULL, -1, methods,
    NULL, NULL, NULL, NULL,
};

PyMODINIT_FUNC PyInit__pepper_vcfemit(void) {
    return PyModule_Create(&module);
}
