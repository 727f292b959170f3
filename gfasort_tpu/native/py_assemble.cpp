// CPython-API graph-assembly helpers.
//
// The C++ GFA parser (gfa_parser.cpp) produces struct-of-arrays buffers;
// turning those into the BidirectedGraph's Python containers (a list of
// per-node `bytes`, the GFA-insertion-order list, and the deduped edge
// set — gfasort src/graph_ops.rs:10-16) used to be the load-time
// bottleneck (~4 s of Python loops for a 1M-node graph).  These helpers
// build the containers directly with the CPython API.
//
// They are called through ctypes.PyDLL (GIL held) — never through the
// CDLL handle, which releases the GIL around calls.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>

extern "C" {

// Returns (nodes, node_order):
//   nodes      — list sized max_id+1, bytes at each live id, None elsewhere
//   node_order — list of ids in first-seen file order
// Duplicate S-lines overwrite the sequence but keep the original order slot
// (same as BidirectedGraph.add_node / src/graph_ops.rs:613-623).
PyObject* gfa_build_nodes(int64_t n_segs, const int64_t* ids,
                          const int64_t* off, const char* blob) {
    int64_t max_id = -1;
    for (int64_t i = 0; i < n_segs; i++)
        if (ids[i] > max_id) max_id = ids[i];

    PyObject* nodes = PyList_New(max_id + 1);
    if (!nodes) return NULL;
    for (int64_t i = 0; i <= max_id; i++) {
        Py_INCREF(Py_None);
        PyList_SET_ITEM(nodes, i, Py_None);
    }
    PyObject* order = PyList_New(0);
    if (!order) {
        Py_DECREF(nodes);
        return NULL;
    }
    for (int64_t i = 0; i < n_segs; i++) {
        int64_t nid = ids[i];
        if (PyList_GET_ITEM(nodes, nid) == Py_None) {
            PyObject* idobj = PyLong_FromLongLong(nid);
            if (!idobj || PyList_Append(order, idobj) < 0) {
                Py_XDECREF(idobj);
                goto fail;
            }
            Py_DECREF(idobj);
        }
        PyObject* seq = PyBytes_FromStringAndSize(blob + off[i], off[i + 1] - off[i]);
        if (!seq) goto fail;
        PyList_SetItem(nodes, nid, seq);  // steals ref, releases the old item
    }
    {
        PyObject* out = PyTuple_Pack(2, nodes, order);
        Py_DECREF(nodes);
        Py_DECREF(order);
        return out;
    }
fail:
    Py_DECREF(nodes);
    Py_DECREF(order);
    return NULL;
}

// Returns a set of (from_handle, to_handle) tuples.  The parser already
// deduped edge/complement forms (src/graph_ops.rs:626-638), so this is a
// plain container build.
PyObject* gfa_build_edges(int64_t n, const int64_t* from, const int64_t* to) {
    PyObject* s = PySet_New(NULL);
    if (!s) return NULL;
    for (int64_t i = 0; i < n; i++) {
        PyObject* t = PyTuple_New(2);
        if (!t) goto fail;
        PyObject* a = PyLong_FromLongLong(from[i]);
        PyObject* b = PyLong_FromLongLong(to[i]);
        if (!a || !b) {
            Py_XDECREF(a);
            Py_XDECREF(b);
            Py_DECREF(t);
            goto fail;
        }
        PyTuple_SET_ITEM(t, 0, a);
        PyTuple_SET_ITEM(t, 1, b);
        if (PySet_Add(s, t) < 0) {
            Py_DECREF(t);
            goto fail;
        }
        Py_DECREF(t);
    }
    return s;
fail:
    Py_DECREF(s);
    return NULL;
}

// Rewrite an edge set {(from_handle, to_handle)} through a node-id LUT
// (BidirectedGraph._remap_arrays hot path).  lut[id] is the new id, or
// -1 for "not in the mapping"; ids >= lut_len are treated as unmapped.
// drop_unmapped=0 → unmapped ids pass through (apply_node_id_mapping,
// src/graph_ops.rs:52-83); drop_unmapped=1 → edges touching an unmapped
// id are dropped (apply_ordering, src/graph_ops.rs:1983-2020).
PyObject* remap_edge_set(PyObject* edges, const int64_t* lut, int64_t lut_len,
                         int drop_unmapped) {
    PyObject* out = PySet_New(NULL);
    if (!out) return NULL;
    PyObject* it = PyObject_GetIter(edges);
    if (!it) {
        Py_DECREF(out);
        return NULL;
    }
    PyObject* item;
    while ((item = PyIter_Next(it)) != NULL) {
        int64_t h[2];
        int ok = 1, drop = 0;
        for (int k = 0; k < 2; k++) {
            PyObject* v = PyTuple_GetItem(item, k);  // borrowed
            if (!v) { ok = 0; break; }
            int64_t hv = PyLong_AsLongLong(v);
            if (hv == -1 && PyErr_Occurred()) { ok = 0; break; }
            int64_t nid = hv >> 1;
            int64_t mapped = (nid >= 0 && nid < lut_len) ? lut[nid] : -1;
            if (mapped < 0) {
                if (drop_unmapped) { drop = 1; break; }
                mapped = nid;
            }
            h[k] = (mapped << 1) | (hv & 1);
        }
        Py_DECREF(item);
        if (!ok) goto fail;
        if (drop) continue;
        {
            PyObject* t = PyTuple_New(2);
            if (!t) goto fail;
            PyObject* a = PyLong_FromLongLong(h[0]);
            PyObject* b = PyLong_FromLongLong(h[1]);
            if (!a || !b) {
                Py_XDECREF(a);
                Py_XDECREF(b);
                Py_DECREF(t);
                goto fail;
            }
            PyTuple_SET_ITEM(t, 0, a);
            PyTuple_SET_ITEM(t, 1, b);
            if (PySet_Add(out, t) < 0) {
                Py_DECREF(t);
                goto fail;
            }
            Py_DECREF(t);
        }
    }
    Py_DECREF(it);
    if (PyErr_Occurred()) {
        Py_DECREF(out);
        return NULL;
    }
    return out;
fail:
    Py_DECREF(it);
    Py_DECREF(out);
    return NULL;
}

}  // extern "C"
