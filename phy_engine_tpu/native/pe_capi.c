/* Embeddable C ABI over the TPU-native engine.
 *
 * Role parity: the reference ships a C surface (dll_api.h:14-444,
 * implemented by dll_main.cpp) so PhysicsLab / wasm hosts can drive
 * the engine without C++.  This build's engine is Python/JAX, so the
 * shim embeds CPython and forwards into phy_engine_tpu.capi — the
 * function names, argument conventions (element codes, wire quads,
 * positional property streams, prefix-sum sample layouts, 4-state u8
 * digital codes) mirror dll_api.h.
 *
 * Handles returned to C are strong PyObject references.  Every entry
 * point takes the GIL (PyGILState), so the library is usable both
 * from plain C programs (the shim initializes the interpreter) and
 * from inside an existing Python process via dlopen/ctypes (the
 * interpreter is reused).
 *
 * Build: cc -shared -fPIC pe_capi.c $(python3-config --includes
 *        --ldflags --embed) -o libphyengine_tpu.so
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdarg.h>
#include <string.h>
#include <stdlib.h>

static PyObject* g_glue = NULL;
static __thread char g_err[1024];

const char* phy_engine_last_error(void) { return g_err; }

void phy_engine_clear_error(void) { g_err[0] = 0; }

void phy_engine_string_free(char* s) { free(s); }

static void set_err_from_py(void) {
    PyObject *t = NULL, *v = NULL, *tb = NULL;
    PyErr_Fetch(&t, &v, &tb);
    if (v != NULL) {
        PyObject* s = PyObject_Str(v);
        if (s != NULL) {
            const char* c = PyUnicode_AsUTF8(s);
            if (c != NULL) {
                strncpy(g_err, c, sizeof(g_err) - 1);
                g_err[sizeof(g_err) - 1] = 0;
            }
            Py_DECREF(s);
        }
    }
    Py_XDECREF(t);
    Py_XDECREF(v);
    Py_XDECREF(tb);
    PyErr_Clear();
}

/* Initialize (or attach to) the interpreter and import the glue.
 * repo_root: directory containing the phy_engine_tpu package; NULL
 * if the package is already importable. Returns 0 on success. */
int phy_engine_init(const char* repo_root) {
    if (!Py_IsInitialized()) { Py_InitializeEx(0); }
    PyGILState_STATE g = PyGILState_Ensure();
    int rc = 0;
    if (repo_root != NULL && repo_root[0]) {
        PyObject* sys_path = PySys_GetObject("path");   /* borrowed */
        PyObject* p = PyUnicode_FromString(repo_root);
        if (sys_path && p) { PyList_Insert(sys_path, 0, p); }
        Py_XDECREF(p);
    }
    if (g_glue == NULL) {
        g_glue = PyImport_ImportModule("phy_engine_tpu.capi");
        if (g_glue == NULL) {
            set_err_from_py();
            rc = -1;
        }
    }
    PyGILState_Release(g);
    return rc;
}

/* -- small marshaling helpers -------------------------------------------- */

static PyObject* int_list(const int* a, size_t n) {
    PyObject* l = PyList_New((Py_ssize_t)n);
    for (size_t i = 0; i < n; ++i) {
        PyList_SET_ITEM(l, (Py_ssize_t)i, PyLong_FromLong(a[i]));
    }
    return l;
}

static PyObject* size_list(const size_t* a, size_t n) {
    PyObject* l = PyList_New((Py_ssize_t)n);
    for (size_t i = 0; i < n; ++i) {
        PyList_SET_ITEM(l, (Py_ssize_t)i,
                        PyLong_FromSize_t(a[i]));
    }
    return l;
}

static PyObject* dbl_list(const double* a, size_t n) {
    PyObject* l = PyList_New((Py_ssize_t)n);
    for (size_t i = 0; i < n; ++i) {
        PyList_SET_ITEM(l, (Py_ssize_t)i, PyFloat_FromDouble(a[i]));
    }
    return l;
}

static PyObject* call(const char* fn, PyObject* args) {
    /* args: new reference (tuple), consumed here */
    if (g_glue == NULL) {
        strncpy(g_err, "phy_engine_init not called", sizeof(g_err));
        Py_XDECREF(args);
        return NULL;
    }
    PyObject* f = PyObject_GetAttrString(g_glue, fn);
    if (f == NULL) { set_err_from_py(); Py_XDECREF(args); return NULL; }
    PyObject* r = PyObject_CallObject(f, args);
    Py_DECREF(f);
    Py_XDECREF(args);
    if (r == NULL) { set_err_from_py(); }
    return r;
}

/* -- circuit construction ------------------------------------------------- */

static void fill_pos(size_t comp_size, size_t** vec_pos,
                     size_t** chunk_pos) {
    /* the reference returns arena locations; component index is the
     * only coordinate here, so vec_pos[i]=i, chunk_pos[i]=0 */
    if (vec_pos != NULL) {
        *vec_pos = (size_t*)malloc(sizeof(size_t) * (comp_size + 1));
        for (size_t i = 0; i < comp_size; ++i) { (*vec_pos)[i] = i; }
    }
    if (chunk_pos != NULL) {
        *chunk_pos = (size_t*)calloc(comp_size + 1, sizeof(size_t));
    }
}

static size_t props_needed(const int* elements, size_t ele_size) {
    /* exact positional property count for the element stream, so the
     * caller's array is never over-read */
    PyObject* r = call("props_needed",
                       Py_BuildValue("(N)",
                                     int_list(elements, ele_size)));
    size_t n = 0;
    if (r != NULL) {
        n = PyLong_AsSize_t(r);
        if (PyErr_Occurred()) { set_err_from_py(); n = 0; }
        Py_DECREF(r);
    }
    return n;
}

void* create_circuit(int* elements, size_t ele_size, int* wires,
                     size_t wires_size, double* properties,
                     size_t** vec_pos, size_t** chunk_pos,
                     size_t* comp_size) {
    PyGILState_STATE g = PyGILState_Ensure();
    size_t nprop = props_needed(elements, ele_size);
    PyObject* r = call("create_circuit", Py_BuildValue(
        "(NNN)", int_list(elements, ele_size),
        int_list(wires, wires_size),
        dbl_list(properties, properties ? nprop : 0)));
    void* out = NULL;
    if (r != NULL) {
        PyObject* cc = PyObject_GetAttrString(r, "component_count");
        size_t n = cc ? (size_t)PyLong_AsSize_t(cc) : 0;
        Py_XDECREF(cc);
        if (comp_size != NULL) { *comp_size = n; }
        fill_pos(n, vec_pos, chunk_pos);
        out = (void*)r;                   /* strong reference */
    }
    PyGILState_Release(g);
    return out;
}

void* create_circuit_ex(int* elements, size_t ele_size, int* wires,
                        size_t wires_size, double* properties,
                        char const* const* texts,
                        size_t const* text_sizes, size_t text_count,
                        size_t const* element_src_index,
                        size_t const* element_top_index,
                        size_t** vec_pos, size_t** chunk_pos,
                        size_t* comp_size) {
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject* tl = PyList_New((Py_ssize_t)text_count);
    for (size_t i = 0; i < text_count; ++i) {
        PyList_SET_ITEM(tl, (Py_ssize_t)i, PyUnicode_FromStringAndSize(
            texts[i], (Py_ssize_t)text_sizes[i]));
    }
    size_t nprop = props_needed(elements, ele_size);
    PyObject* r = call("create_circuit_ex", Py_BuildValue(
        "(NNNNNN)", int_list(elements, ele_size),
        int_list(wires, wires_size),
        dbl_list(properties, properties ? nprop : 0), tl,
        size_list(element_src_index, ele_size),
        size_list(element_top_index, ele_size)));
    void* out = NULL;
    if (r != NULL) {
        PyObject* cc = PyObject_GetAttrString(r, "component_count");
        size_t n = cc ? (size_t)PyLong_AsSize_t(cc) : 0;
        Py_XDECREF(cc);
        if (comp_size != NULL) { *comp_size = n; }
        fill_pos(n, vec_pos, chunk_pos);
        out = (void*)r;
    }
    PyGILState_Release(g);
    return out;
}

void destroy_circuit(void* circuit, size_t* vec_pos,
                     size_t* chunk_pos) {
    if (circuit != NULL) {
        PyGILState_STATE g = PyGILState_Ensure();
        Py_DECREF((PyObject*)circuit);
        PyGILState_Release(g);
    }
    free(vec_pos);
    free(chunk_pos);
}

/* -- int-returning single calls ------------------------------------------ */
/* NOTE: ctypes releases the GIL around foreign calls, so the argument
 * tuple MUST be built after PyGILState_Ensure — hence variadic. */

static int call_int(const char* fn, const char* fmt, ...) {
    PyGILState_STATE g = PyGILState_Ensure();
    va_list ap;
    va_start(ap, fmt);
    PyObject* args = Py_VaBuildValue(fmt, ap);
    va_end(ap);
    PyObject* r = call(fn, args);
    int rc = -1;
    if (r != NULL) {
        rc = (int)PyLong_AsLong(r);
        if (PyErr_Occurred()) { set_err_from_py(); rc = -1; }
        Py_DECREF(r);
    }
    PyGILState_Release(g);
    return rc;
}

int circuit_set_analyze_type(void* c, unsigned at) {
    return call_int("circuit_set_analyze_type", "(OI)", (PyObject*)c, at);
}

int circuit_set_tr(void* c, double t_step, double t_stop) {
    return call_int("circuit_set_tr", "(Odd)", (PyObject*)c, t_step, t_stop);
}

int circuit_set_ac_omega(void* c, double omega) {
    return call_int("circuit_set_ac_omega", "(Od)", (PyObject*)c, omega);
}

int circuit_set_temperature(void* c, double t) {
    return call_int("circuit_set_temperature", "(Od)", (PyObject*)c, t);
}

int circuit_set_model_double_by_name(void* c, size_t vec_pos,
                                     size_t chunk_pos,
                                     char const* name,
                                     size_t name_size, double value) {
    (void)chunk_pos;
    return call_int("circuit_set_model_double_by_name", "(Ons#d)", (PyObject*)c, (Py_ssize_t)vec_pos, name,
        (Py_ssize_t)name_size, value);
}

int circuit_set_model_digital(void* c, size_t vec_pos,
                              size_t chunk_pos, size_t attribute_index,
                              unsigned char state) {
    (void)chunk_pos;
    (void)attribute_index;
    return call_int("circuit_set_model_digital", "(Onb)", (PyObject*)c, (Py_ssize_t)vec_pos, state);
}

int circuit_analyze(void* c) {
    return call_int("circuit_analyze", "(O)", (PyObject*)c);
}

int circuit_digital_clk(void* c) {
    return call_int("circuit_digital_clk", "(O)", (PyObject*)c);
}

/* -- sampling -------------------------------------------------------------- */

static int copy_size_row(PyObject* row, size_t* out, size_t cap) {
    Py_ssize_t n = PyList_Size(row);
    if ((size_t)n > cap) { n = (Py_ssize_t)cap; }
    for (Py_ssize_t i = 0; i < n; ++i) {
        out[i] = PyLong_AsSize_t(PyList_GET_ITEM(row, i));
    }
    return 0;
}

int circuit_sample_layout(void* c, size_t* vec_pos, size_t* chunk_pos,
                          size_t comp_size, size_t* voltage_ord,
                          size_t* current_ord, size_t* digital_ord) {
    (void)vec_pos;
    (void)chunk_pos;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject* r = call("circuit_sample_layout",
                       Py_BuildValue("(O)", (PyObject*)c));
    int rc = -1;
    if (r != NULL && PyList_Check(r) && PyList_Size(r) == 3) {
        copy_size_row(PyList_GET_ITEM(r, 0), voltage_ord,
                      comp_size + 1);
        copy_size_row(PyList_GET_ITEM(r, 1), current_ord,
                      comp_size + 1);
        copy_size_row(PyList_GET_ITEM(r, 2), digital_ord,
                      comp_size + 1);
        rc = 0;
    }
    Py_XDECREF(r);
    PyGILState_Release(g);
    return rc;
}

static int sample_impl(void* c, double* voltage, size_t* voltage_ord,
                       double* current, size_t* current_ord,
                       unsigned char* digital, size_t* digital_ord,
                       size_t comp_size, int four_state) {
    (void)voltage_ord;
    (void)current_ord;
    (void)digital_ord;
    (void)comp_size;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject* r = call("circuit_sample_u8",
                       Py_BuildValue("(O)", (PyObject*)c));
    int rc = -1;
    if (r != NULL && PyList_Check(r) && PyList_Size(r) == 3) {
        PyObject* vs = PyList_GET_ITEM(r, 0);
        PyObject* cs = PyList_GET_ITEM(r, 1);
        PyObject* ds = PyList_GET_ITEM(r, 2);
        for (Py_ssize_t i = 0; i < PyList_Size(vs); ++i) {
            voltage[i] = PyFloat_AsDouble(PyList_GET_ITEM(vs, i));
        }
        for (Py_ssize_t i = 0; i < PyList_Size(cs); ++i) {
            current[i] = PyFloat_AsDouble(PyList_GET_ITEM(cs, i));
        }
        for (Py_ssize_t i = 0; i < PyList_Size(ds); ++i) {
            long d = PyLong_AsLong(PyList_GET_ITEM(ds, i));
            digital[i] = four_state ? (unsigned char)(d & 3)
                                    : (unsigned char)(d == 1 ? 1 : 0);
        }
        rc = 0;
    }
    Py_XDECREF(r);
    PyGILState_Release(g);
    return rc;
}

int circuit_sample_u8(void* c, size_t* vec_pos, size_t* chunk_pos,
                      size_t comp_size, double* voltage,
                      size_t* voltage_ord, double* current,
                      size_t* current_ord, unsigned char* digital,
                      size_t* digital_ord) {
    (void)vec_pos;
    (void)chunk_pos;
    return sample_impl(c, voltage, voltage_ord, current, current_ord,
                       digital, digital_ord, comp_size, 0);
}

int circuit_sample_digital_state_u8(
    void* c, size_t* vec_pos, size_t* chunk_pos, size_t comp_size,
    double* voltage, size_t* voltage_ord, double* current,
    size_t* current_ord, unsigned char* digital, size_t* digital_ord) {
    (void)vec_pos;
    (void)chunk_pos;
    return sample_impl(c, voltage, voltage_ord, current, current_ord,
                       digital, digital_ord, comp_size, 1);
}

/* -- verilog runtime ------------------------------------------------------- */

void* verilog_runtime_create(char const* src, size_t src_size,
                             char const* top, size_t top_size,
                             char const* const* include_dirs,
                             size_t const* include_dir_sizes,
                             size_t include_dir_count) {
    (void)include_dirs;
    (void)include_dir_sizes;
    (void)include_dir_count;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject* r = call("verilog_runtime_create", Py_BuildValue(
        "(s#s#)", src, (Py_ssize_t)src_size, top ? top : "",
        (Py_ssize_t)(top ? top_size : 0)));
    PyGILState_Release(g);
    return (void*)r;
}

void verilog_runtime_destroy(void* rt) {
    if (rt != NULL) {
        PyGILState_STATE g = PyGILState_Ensure();
        Py_DECREF((PyObject*)rt);
        PyGILState_Release(g);
    }
}

int verilog_runtime_tick(void* rt) {
    return call_int("verilog_runtime_tick", "(O)", (PyObject*)rt);
}

int verilog_runtime_reset(void* rt) {
    return call_int("verilog_runtime_reset", "(O)", (PyObject*)rt);
}

size_t verilog_runtime_port_count(void* rt) {
    int n = call_int("verilog_runtime_port_count", "(O)", (PyObject*)rt);
    return n < 0 ? 0 : (size_t)n;
}

size_t verilog_runtime_signal_count(void* rt) {
    int n = call_int("verilog_runtime_signal_count", "(O)", (PyObject*)rt);
    return n < 0 ? 0 : (size_t)n;
}

static int copy_str(const char* fn, void* rt, size_t idx, char* out,
                    size_t out_size, int with_idx) {
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject* r = call(fn, with_idx
                       ? Py_BuildValue("(On)", (PyObject*)rt,
                                       (Py_ssize_t)idx)
                       : Py_BuildValue("(O)", (PyObject*)rt));
    int rc = -1;
    if (r != NULL) {
        const char* s = PyUnicode_AsUTF8(r);
        if (s != NULL && out != NULL) {
            strncpy(out, s, out_size);
            if (out_size) { out[out_size - 1] = 0; }
            rc = (int)strlen(s);
        }
        Py_DECREF(r);
    }
    PyGILState_Release(g);
    return rc;
}

int verilog_runtime_copy_port_name(void* rt, size_t i, char* out,
                                   size_t out_size) {
    return copy_str("verilog_runtime_port_name", rt, i, out,
                    out_size, 1);
}

int verilog_runtime_copy_top_module_name(void* rt, char* out,
                                         size_t out_size) {
    return copy_str("verilog_runtime_top_module_name", rt, 0, out,
                    out_size, 0);
}

unsigned char verilog_runtime_port_dir(void* rt, size_t i) {
    int d = call_int("verilog_runtime_port_dir", "(On)", (PyObject*)rt, (Py_ssize_t)i);
    return d < 0 ? 0 : (unsigned char)d;
}

unsigned char verilog_runtime_get_port_value(void* rt, size_t i) {
    /* multi-bit ports report their integer value truncated to u8; an
     * unknown value falls back to the 1-bit 4-state code (X=2) */
    int v = call_int("verilog_runtime_get_port_value", "(On)", (PyObject*)rt, (Py_ssize_t)i);
    if (v < 0) {
        phy_engine_clear_error();
        v = call_int("verilog_runtime_get_port_state", "(On)", (PyObject*)rt, (Py_ssize_t)i);
    }
    return v < 0 ? 2 : (unsigned char)v;
}

int verilog_runtime_set_port_value(void* rt, size_t i,
                                   unsigned char state) {
    return call_int("verilog_runtime_set_port_value", "(Onb)", (PyObject*)rt, (Py_ssize_t)i, state);
}
