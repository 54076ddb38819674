// bwa_flow_tpu native host kernels (CPython extension).
//
// The reference keeps its host hot loops in C (banded Smith-Waterman,
// /root/reference/bwa/ksw.c); this module provides the same role for the
// TPU framework's *host-side* work: CIGAR generation (banded global
// alignment + traceback) and the scalar extension fallback. Both are
// C++ ports of this repo's own golden NumPy specifications
// (bwa_flow_tpu/ops/ksw.py) — integer-exact against them, enforced by
// tests/test_native.py.
//
// Build: python setup.py build_ext --inplace  (g++, no external deps)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <vector>

#include "ksw_impl.h"

namespace {

using bwaflow::Ext2Result;
using bwaflow::ksw_extend2;
using bwaflow::ksw_global2;

// ---------------------------------------------------------------------
// Python bindings
// ---------------------------------------------------------------------

bool get_u8(PyObject* obj, Py_buffer* view, const char* name) {
  if (PyObject_GetBuffer(obj, view, PyBUF_SIMPLE) != 0) {
    PyErr_Format(PyExc_TypeError, "%s: expected a contiguous buffer", name);
    return false;
  }
  return true;
}

PyObject* py_extend2(PyObject*, PyObject* args) {
  int qlen, tlen, m, o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop, h0;
  PyObject *qo, *to, *mo;
  if (!PyArg_ParseTuple(args, "iOiOOiiiiiiiii", &qlen, &qo, &tlen, &to,
                        &mo, &m, &o_del, &e_del, &o_ins, &e_ins, &w,
                        &end_bonus, &zdrop, &h0))
    return nullptr;
  Py_buffer qb, tb, mb;
  if (!get_u8(qo, &qb, "query")) return nullptr;
  if (!get_u8(to, &tb, "target")) { PyBuffer_Release(&qb); return nullptr; }
  if (!get_u8(mo, &mb, "mat")) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&tb);
    return nullptr;
  }
  Ext2Result r = ksw_extend2(
      qlen, (const uint8_t*)qb.buf, tlen, (const uint8_t*)tb.buf,
      (const int8_t*)mb.buf, m, o_del, e_del, o_ins, e_ins, w, end_bonus,
      zdrop, h0);
  PyBuffer_Release(&qb);
  PyBuffer_Release(&tb);
  PyBuffer_Release(&mb);
  return Py_BuildValue("(LLLLLL)", (long long)r.score, (long long)r.qle,
                       (long long)r.tle, (long long)r.gtle,
                       (long long)r.gscore, (long long)r.max_off);
}

PyObject* py_global2(PyObject*, PyObject* args) {
  int qlen, tlen, m, o_del, e_del, o_ins, e_ins, w, want_cigar = 1;
  PyObject *qo, *to, *mo;
  if (!PyArg_ParseTuple(args, "iOiOOiiiiii|p", &qlen, &qo, &tlen, &to,
                        &mo, &m, &o_del, &e_del, &o_ins, &e_ins, &w,
                        &want_cigar))
    return nullptr;
  Py_buffer qb, tb, mb;
  if (!get_u8(qo, &qb, "query")) return nullptr;
  if (!get_u8(to, &tb, "target")) { PyBuffer_Release(&qb); return nullptr; }
  if (!get_u8(mo, &mb, "mat")) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&tb);
    return nullptr;
  }
  std::vector<std::pair<int, int>> cig;
  int64_t score = ksw_global2(
      qlen, (const uint8_t*)qb.buf, tlen, (const uint8_t*)tb.buf,
      (const int8_t*)mb.buf, m, o_del, e_del, o_ins, e_ins, w,
      want_cigar != 0, &cig);
  PyBuffer_Release(&qb);
  PyBuffer_Release(&tb);
  PyBuffer_Release(&mb);
  PyObject* clist = PyList_New((Py_ssize_t)cig.size());
  for (Py_ssize_t i = 0; i < (Py_ssize_t)cig.size(); ++i)
    PyList_SET_ITEM(clist, i,
                    Py_BuildValue("(ii)", cig[i].first, cig[i].second));
  PyObject* ret = Py_BuildValue("(LN)", (long long)score, clist);
  return ret;
}

PyObject* py_align2(PyObject*, PyObject* args) {
  int qlen, tlen, m, o_del, e_del, o_ins, e_ins, xtra;
  PyObject *qo, *to, *mo;
  if (!PyArg_ParseTuple(args, "iOiOOiiiiii", &qlen, &qo, &tlen, &to, &mo,
                        &m, &o_del, &e_del, &o_ins, &e_ins, &xtra))
    return nullptr;
  Py_buffer qb, tb, mb;
  if (!get_u8(qo, &qb, "query")) return nullptr;
  if (!get_u8(to, &tb, "target")) { PyBuffer_Release(&qb); return nullptr; }
  if (!get_u8(mo, &mb, "mat")) {
    PyBuffer_Release(&qb);
    PyBuffer_Release(&tb);
    return nullptr;
  }
  bwaflow::KswResult r = bwaflow::ksw_align2(
      qlen, (const uint8_t*)qb.buf, tlen, (const uint8_t*)tb.buf,
      (const int8_t*)mb.buf, m, o_del, e_del, o_ins, e_ins, xtra);
  PyBuffer_Release(&qb);
  PyBuffer_Release(&tb);
  PyBuffer_Release(&mb);
  return Py_BuildValue("(LLLLLLL)", (long long)r.score, (long long)r.te,
                       (long long)r.qe, (long long)r.score2,
                       (long long)r.te2, (long long)r.tb,
                       (long long)r.qb);
}

PyMethodDef methods[] = {
    {"ksw_extend2", py_extend2, METH_VARARGS,
     "scalar banded extension (exact golden semantics)"},
    {"ksw_align2", py_align2, METH_VARARGS,
     "local alignment with sub-score (exact golden semantics)"},
    {"ksw_global2", py_global2, METH_VARARGS,
     "banded global alignment + CIGAR (exact golden semantics)"},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native",
                                "bwa_flow_tpu native host kernels", -1,
                                methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&moduledef); }
