/* Compatibility shim for building the reference's cpp_subsampling oracle
 * (written against the pre-1.7 numpy C API, where PyArray_* accessors took
 * PyObject*) under numpy 2.x, whose accessors are strictly-typed inline
 * functions. Force-included via `g++ -include`; wraps each accessor the
 * reference wrapper.cpp uses in a cast. The parenthesized (PyArray_X)(...)
 * form calls the real inline function, so there is no macro recursion.
 * No reference source is modified. */
#ifndef PCF_TPU_NPY_COMPAT_SHIM_H
#define PCF_TPU_NPY_COMPAT_SHIM_H
#include <Python.h>
#include <numpy/arrayobject.h>
#define PyArray_NDIM(o) (PyArray_NDIM)((PyArrayObject *)(o))
#define PyArray_DIM(o, i) (PyArray_DIM)((PyArrayObject *)(o), (i))
#define PyArray_DATA(o) (PyArray_DATA)((PyArrayObject *)(o))
#endif
