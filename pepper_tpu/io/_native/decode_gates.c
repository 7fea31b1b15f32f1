/* _pepper_decode: the per-candidate gate/list pass of candidate decode
 * (decode/candidate_finder.py decode_predictions) executed in C.
 *
 * Semantics-exact to the Python engine (CandidateFinder.py:391-529
 * semantics): scalar argmax genotyping, allele validation, the Margin
 * SNP list, and the DeepVariant gates (per-type p-values with
 * low-complexity overrides, VAF overrides incl. the delete-VAF quirk that
 * appends the deleted sequence, and the sequential reference_allele
 * swap chain for accepted deletions).  The Python engine remains behind
 * PEPPER_PY_DECODE=1; both must produce identical output lists
 * (tests/test_decode.py fuzz).
 *
 * Interface (one call per chunk):
 *   decode_chunk(predictions, ref_codes, in_repeat, params) ->
 *       (margin_list, deepvariant_list)
 * where predictions is the list of CandidatePrediction objects,
 * ref_codes/in_repeat are uint8 buffers (ref_codes[i] == 0 marks a
 * non-ACGT reference base -> candidate skipped), and params is the tuple
 * (snp_p, insert_p, delete_p, snp_p_lc, insert_p_lc, delete_p_lc,
 *  report_snp_above_freq, report_indel_above_freq) of doubles.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdint.h>
#include <string.h>

static PyObject *attr_contig, *attr_position, *attr_depth, *attr_candidates,
    *attr_candidate_frequency, *attr_prediction_base;
static PyObject *base_strs[256]; /* 1-char strings for A/C/G/T */

static int valid_allele_char(uint8_t c) {
  switch (c) {
    case 'A': case 'C': case 'G': case 'T':
    case 'a': case 'c': case 'g': case 't':
      return 1;
    default:
      return 0;
  }
}

/* read the 3 class probabilities from prediction_base (float32/float64
 * contiguous buffer, or any sequence as fallback); returns 0 on success */
static int read_probs(PyObject *pb, double *p) {
  Py_buffer view;
  if (PyObject_GetBuffer(pb, &view, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) == 0) {
    int ok = 0;
    /* only trust the typed fast reads for true float buffers; anything
     * else (int64/int32/...) falls through to the PySequence path which
     * performs the same numeric conversion as the Python engine */
    const char *fmt = view.format;
    if (view.len >= 3 * view.itemsize && fmt != NULL) {
      if (view.itemsize == 8 && fmt[0] == 'd' && fmt[1] == '\0') {
        const double *d = (const double *)view.buf;
        p[0] = d[0]; p[1] = d[1]; p[2] = d[2];
        ok = 1;
      } else if (view.itemsize == 4 && fmt[0] == 'f' && fmt[1] == '\0') {
        const float *f = (const float *)view.buf;
        p[0] = f[0]; p[1] = f[1]; p[2] = f[2];
        ok = 1;
      }
    }
    PyBuffer_Release(&view);
    if (ok) return 0;
  } else {
    PyErr_Clear();
  }
  for (int i = 0; i < 3; i++) {
    PyObject *item = PySequence_GetItem(pb, i);
    if (!item) return -1;
    p[i] = PyFloat_AsDouble(item);
    Py_DECREF(item);
    if (p[i] == -1.0 && PyErr_Occurred()) return -1;
  }
  return 0;
}

/* build [a, b] as a fresh list */
static PyObject *genotype_list(long a, long b) {
  PyObject *list = PyList_New(2);
  if (!list) return NULL;
  PyList_SET_ITEM(list, 0, PyLong_FromLong(a));
  PyList_SET_ITEM(list, 1, PyLong_FromLong(b));
  return list;
}

static PyObject *decode_chunk(PyObject *self, PyObject *args) {
  PyObject *predictions;
  Py_buffer ref_codes, in_repeat_buf;
  double snp_p, ins_p, del_p, snp_p_lc, ins_p_lc, del_p_lc;
  double report_snp, report_indel;
  if (!PyArg_ParseTuple(args, "Oy*y*(dddddddd)", &predictions, &ref_codes,
                        &in_repeat_buf, &snp_p, &ins_p, &del_p, &snp_p_lc,
                        &ins_p_lc, &del_p_lc, &report_snp, &report_indel))
    return NULL;

  PyObject *margin_list = PyList_New(0);
  PyObject *dv_list = PyList_New(0);
  PyObject *seq = NULL;
  if (!margin_list || !dv_list) goto fail;

  seq = PySequence_Fast(predictions, "predictions must be a sequence");
  if (!seq) goto fail;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  if ((Py_ssize_t)ref_codes.len < n || (Py_ssize_t)in_repeat_buf.len < n) {
    PyErr_SetString(PyExc_ValueError, "annotation buffers shorter than "
                                      "predictions");
    goto fail;
  }
  const uint8_t *refc = (const uint8_t *)ref_codes.buf;
  const uint8_t *inrep = (const uint8_t *)in_repeat_buf.buf;

  for (Py_ssize_t i = 0; i < n; i++) {
    if (refc[i] == 0) continue; /* non-ACGT reference base */
    PyObject *cand = PySequence_Fast_GET_ITEM(seq, i);

    PyObject *contig = PyObject_GetAttr(cand, attr_contig);
    PyObject *pos_obj = PyObject_GetAttr(cand, attr_position);
    PyObject *depth_obj = PyObject_GetAttr(cand, attr_depth);
    PyObject *alleles = PyObject_GetAttr(cand, attr_candidates);
    PyObject *freqs = PyObject_GetAttr(cand, attr_candidate_frequency);
    PyObject *pb = PyObject_GetAttr(cand, attr_prediction_base);
    if (!contig || !pos_obj || !depth_obj || !alleles || !freqs || !pb) {
      Py_XDECREF(contig); Py_XDECREF(pos_obj); Py_XDECREF(depth_obj);
      Py_XDECREF(alleles); Py_XDECREF(freqs); Py_XDECREF(pb);
      goto fail;
    }

    double p[3];
    long long position = PyLong_AsLongLong(pos_obj);
    long long depth = PyLong_AsLongLong(depth_obj);
    int bad = (position == -1 || depth == -1) && PyErr_Occurred();
    if (!bad) bad = read_probs(pb, p) != 0;
    PyObject *alist = bad ? NULL
                          : PySequence_Fast(alleles, "candidates");
    PyObject *flist = (bad || !alist)
                          ? NULL
                          : PySequence_Fast(freqs, "candidate_frequency");
    if (bad || !alist || !flist) {
      Py_XDECREF(alist); Py_XDECREF(flist);
      Py_DECREF(contig); Py_DECREF(pos_obj); Py_DECREF(depth_obj);
      Py_DECREF(alleles); Py_DECREF(freqs); Py_DECREF(pb);
      goto fail;
    }

    int predicted_genotype;
    if (p[0] >= p[1] && p[0] >= p[2]) predicted_genotype = 0;
    else if (p[1] >= p[2]) predicted_genotype = 1;
    else predicted_genotype = 2;
    const double prediction_value = p[predicted_genotype];
    const double non_alt = p[1] >= p[2] ? p[1] : p[2];
    const int in_rep = inrep[i] != 0;

    Py_ssize_t n_alleles = PySequence_Fast_GET_SIZE(alist);
    if (PySequence_Fast_GET_SIZE(flist) < n_alleles)
      n_alleles = PySequence_Fast_GET_SIZE(flist);

    PyObject *m_alts = NULL, *m_supports = NULL;
    PyObject *d_alts = NULL, *d_supports = NULL, *d_nonalt = NULL;
    PyObject *reference_allele = base_strs[refc[i]];
    Py_INCREF(reference_allele);
    PyObject *non_alt_obj = PyFloat_FromDouble(non_alt);
    int err = non_alt_obj == NULL;

    for (Py_ssize_t a = 0; !err && a < n_alleles; a++) {
      PyObject *alt_str = PySequence_Fast_GET_ITEM(alist, a);
      Py_ssize_t alt_len;
      const char *alt_utf8 = PyUnicode_AsUTF8AndSize(alt_str, &alt_len);
      if (!alt_utf8) { err = 1; break; }
      if (alt_len < 1) continue;
      /* validity of the allele body (chars 1..end) */
      int valid = 1;
      for (Py_ssize_t k = 1; k < alt_len; k++)
        if (!valid_allele_char((uint8_t)alt_utf8[k])) { valid = 0; break; }
      if (!valid) continue;
      const char type_char = alt_utf8[0];
      PyObject *freq_obj = PySequence_Fast_GET_ITEM(flist, a);
      double freq = PyFloat_AsDouble(freq_obj);
      if (freq == -1.0 && PyErr_Occurred()) { err = 1; break; }

      /* ---- Margin list: SNPs when genotype != 0/0 ---- */
      if (type_char == '1' && predicted_genotype != 0) {
        if (!m_alts) {
          m_alts = PyList_New(0);
          m_supports = PyList_New(0);
          if (!m_alts || !m_supports) { err = 1; break; }
        }
        PyObject *body = PyUnicode_FromStringAndSize(alt_utf8 + 1,
                                                     alt_len - 1);
        if (!body || PyList_Append(m_alts, body) < 0 ||
            PyList_Append(m_supports, freq_obj) < 0) {
          Py_XDECREF(body);
          err = 1;
          break;
        }
        Py_DECREF(body);
      }

      /* ---- DeepVariant gates ---- */
      if (!d_nonalt) {
        d_nonalt = PyList_New(0);
        d_alts = PyList_New(0);
        d_supports = PyList_New(0);
        if (!d_nonalt || !d_alts || !d_supports) { err = 1; break; }
      }
      if (PyList_Append(d_nonalt, non_alt_obj) < 0) { err = 1; break; }
      /* depth<=0 -> VAF 0 (matches the Python engine's explicit guard) */
      const double vaf = depth > 0 ? freq / (double)depth : 0.0;
      int accept = 0, del_swap = 0;
      double thr, thr_lc, report;
      if (type_char == '1') {
        thr = snp_p; thr_lc = snp_p_lc; report = report_snp;
      } else if (type_char == '2') {
        thr = ins_p; thr_lc = ins_p_lc; report = report_indel;
      } else if (type_char == '3') {
        thr = del_p; thr_lc = del_p_lc; report = report_indel;
      } else {
        continue; /* unknown type: non_alt already appended */
      }
      if (!in_rep && non_alt >= thr) { accept = 1; del_swap = 1; }
      else if (in_rep && non_alt >= thr_lc) { accept = 1; del_swap = 1; }
      else if (0.0 < report && report <= vaf) accept = 1;
      if (!accept) continue;

      if (type_char == '3' && del_swap) {
        /* append the CURRENT reference allele; the deleted sequence
         * becomes the new reference allele */
        PyObject *body = PyUnicode_FromStringAndSize(alt_utf8 + 1,
                                                     alt_len - 1);
        if (!body || PyList_Append(d_alts, reference_allele) < 0 ||
            PyList_Append(d_supports, freq_obj) < 0) {
          Py_XDECREF(body);
          err = 1;
          break;
        }
        Py_DECREF(reference_allele);
        reference_allele = body;
      } else {
        PyObject *body = PyUnicode_FromStringAndSize(alt_utf8 + 1,
                                                     alt_len - 1);
        if (!body || PyList_Append(d_alts, body) < 0 ||
            PyList_Append(d_supports, freq_obj) < 0) {
          Py_XDECREF(body);
          err = 1;
          break;
        }
        Py_DECREF(body);
      }
    }

    if (!err && m_alts && PyList_GET_SIZE(m_alts) > 0) {
      PyObject *gt =
          predicted_genotype == 0 ? genotype_list(0, 0)
          : predicted_genotype == 1 ? genotype_list(0, 1)
                                    : genotype_list(1, 1);
      PyObject *tup = gt ? PyTuple_New(10) : NULL;
      if (!tup) { Py_XDECREF(gt); err = 1; }
      else {
        Py_INCREF(contig);
        PyTuple_SET_ITEM(tup, 0, contig);
        PyTuple_SET_ITEM(tup, 1, PyLong_FromLongLong(position));
        PyTuple_SET_ITEM(tup, 2, PyLong_FromLongLong(position + 1));
        Py_INCREF(base_strs[refc[i]]);
        PyTuple_SET_ITEM(tup, 3, base_strs[refc[i]]);
        Py_INCREF(m_alts);
        PyTuple_SET_ITEM(tup, 4, m_alts);
        PyTuple_SET_ITEM(tup, 5, gt);
        PyTuple_SET_ITEM(tup, 6, PyLong_FromLongLong(depth));
        Py_INCREF(m_supports);
        PyTuple_SET_ITEM(tup, 7, m_supports);
        PyTuple_SET_ITEM(tup, 8, PyFloat_FromDouble(prediction_value));
        Py_INCREF(pb);
        PyTuple_SET_ITEM(tup, 9, pb);
        err = PyList_Append(margin_list, tup) < 0;
        Py_DECREF(tup);
      }
    }

    if (!err && d_alts && PyList_GET_SIZE(d_alts) > 0) {
      PyObject *gt =
          predicted_genotype == 0 ? genotype_list(0, 0)
          : predicted_genotype == 1 ? genotype_list(0, 1)
                                    : genotype_list(1, 1);
      PyObject *tup = gt ? PyTuple_New(12) : NULL;
      if (!tup) { Py_XDECREF(gt); err = 1; }
      else {
        Py_ssize_t ref_len = PyUnicode_GET_LENGTH(reference_allele);
        Py_INCREF(contig);
        PyTuple_SET_ITEM(tup, 0, contig);
        PyTuple_SET_ITEM(tup, 1, PyLong_FromLongLong(position));
        PyTuple_SET_ITEM(tup, 2, PyLong_FromLongLong(position + ref_len));
        Py_INCREF(reference_allele);
        PyTuple_SET_ITEM(tup, 3, reference_allele);
        Py_INCREF(d_alts);
        PyTuple_SET_ITEM(tup, 4, d_alts);
        PyTuple_SET_ITEM(tup, 5, gt);
        PyTuple_SET_ITEM(tup, 6, PyLong_FromLongLong(depth));
        Py_INCREF(d_supports);
        PyTuple_SET_ITEM(tup, 7, d_supports);
        PyTuple_SET_ITEM(tup, 8, PyFloat_FromDouble(prediction_value));
        Py_INCREF(pb);
        PyTuple_SET_ITEM(tup, 9, pb);
        Py_INCREF(d_nonalt);
        PyTuple_SET_ITEM(tup, 10, d_nonalt);
        PyObject *rep_obj = in_rep ? Py_True : Py_False;
        Py_INCREF(rep_obj);
        PyTuple_SET_ITEM(tup, 11, rep_obj);
        err = PyList_Append(dv_list, tup) < 0;
        Py_DECREF(tup);
      }
    }

    Py_XDECREF(m_alts); Py_XDECREF(m_supports);
    Py_XDECREF(d_alts); Py_XDECREF(d_supports); Py_XDECREF(d_nonalt);
    Py_XDECREF(reference_allele);
    Py_XDECREF(non_alt_obj);
    Py_DECREF(alist); Py_DECREF(flist);
    Py_DECREF(contig); Py_DECREF(pos_obj); Py_DECREF(depth_obj);
    Py_DECREF(alleles); Py_DECREF(freqs); Py_DECREF(pb);
    if (err) goto fail;
  }

  Py_DECREF(seq);
  PyBuffer_Release(&ref_codes);
  PyBuffer_Release(&in_repeat_buf);
  PyObject *result = PyTuple_Pack(2, margin_list, dv_list);
  Py_DECREF(margin_list);
  Py_DECREF(dv_list);
  return result;

fail:
  Py_XDECREF(seq);
  Py_XDECREF(margin_list);
  Py_XDECREF(dv_list);
  PyBuffer_Release(&ref_codes);
  PyBuffer_Release(&in_repeat_buf);
  return NULL;
}

static PyMethodDef methods[] = {
    {"decode_chunk", decode_chunk, METH_VARARGS,
     "Gate/list pass of candidate decode (see module docstring)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_pepper_decode",
    "Native candidate-decode gate pass.", -1, methods};

PyMODINIT_FUNC PyInit__pepper_decode(void) {
  attr_contig = PyUnicode_InternFromString("contig");
  attr_position = PyUnicode_InternFromString("position");
  attr_depth = PyUnicode_InternFromString("depth");
  attr_candidates = PyUnicode_InternFromString("candidates");
  attr_candidate_frequency =
      PyUnicode_InternFromString("candidate_frequency");
  attr_prediction_base = PyUnicode_InternFromString("prediction_base");
  const char bases[4] = {'A', 'C', 'G', 'T'};
  for (int i = 0; i < 4; i++) {
    base_strs[(uint8_t)bases[i]] =
        PyUnicode_FromStringAndSize(&bases[i], 1);
  }
  return PyModule_Create(&moduledef);
}
