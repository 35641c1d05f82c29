/* Native runtime kernels for newmsm_tpu (host side).
 *
 * The TPU compute path is JAX/XLA; this module provides the C++ runtime
 * pieces that stay on the host, where the reference implementation is also
 * native C++ (msm-newresampler): mesh topology construction (adjacency,
 * 2-ring candidate tables — O(N) work that dominates Python start-up at
 * ico-6/7 scale and for large cohorts) and an exact axis-aligned BVH
 * nearest-triangle search reproducing the reference octree's query
 * semantics (projective containment with boundary-distance tie-break,
 * geodesic vertex-distance fallback; octree.cpp:156-214). The BVH is the
 * golden reference the device kernel is validated against and the fallback
 * for host-only workflows.
 *
 * CPython C API only (no pybind11 in the image).
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Vec3 {
    double x, y, z;
};

static inline Vec3 sub(const Vec3& a, const Vec3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}
static inline Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static inline double dot(const Vec3& a, const Vec3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}
static inline double norm(const Vec3& a) { return std::sqrt(dot(a, a)); }
static inline Vec3 scale(const Vec3& a, double s) { return {a.x * s, a.y * s, a.z * s}; }

/* ----------------------------------------------------------------------- */
/* adjacency(faces, nverts) -> (nbr_idx, nbr_cnt, tri_idx, tri_cnt)        */
/* ----------------------------------------------------------------------- */

static PyObject* adjacency(PyObject*, PyObject* args) {
    PyArrayObject* faces_obj;
    long nverts;
    if (!PyArg_ParseTuple(args, "O!l", &PyArray_Type, &faces_obj, &nverts))
        return nullptr;

    PyArrayObject* faces = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)faces_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    if (!faces) return nullptr;
    const npy_intp t = PyArray_DIM(faces, 0);
    const int32_t* f = (const int32_t*)PyArray_DATA(faces);

    std::vector<std::vector<int32_t>> nbrs(nverts), tris(nverts);
    for (npy_intp i = 0; i < t; ++i) {
        const int32_t v[3] = {f[3 * i], f[3 * i + 1], f[3 * i + 2]};
        for (int c = 0; c < 3; ++c) {
            const int32_t u = v[c];
            tris[u].push_back((int32_t)i);
            for (int o = 0; o < 3; ++o) {
                if (o == c) continue;
                const int32_t w = v[o];
                auto& lst = nbrs[u];
                if (std::find(lst.begin(), lst.end(), w) == lst.end())
                    lst.push_back(w);
            }
        }
    }
    npy_intp maxd = 1, maxt = 1;
    for (long i = 0; i < nverts; ++i) {
        maxd = std::max(maxd, (npy_intp)nbrs[i].size());
        maxt = std::max(maxt, (npy_intp)tris[i].size());
    }
    npy_intp dims_n[2] = {nverts, maxd};
    npy_intp dims_t[2] = {nverts, maxt};
    npy_intp dims_1[1] = {nverts};
    PyArrayObject* nbr_idx = (PyArrayObject*)PyArray_SimpleNew(2, dims_n, NPY_INT32);
    PyArrayObject* tri_idx = (PyArrayObject*)PyArray_SimpleNew(2, dims_t, NPY_INT32);
    PyArrayObject* nbr_cnt = (PyArrayObject*)PyArray_SimpleNew(1, dims_1, NPY_INT32);
    PyArrayObject* tri_cnt = (PyArrayObject*)PyArray_SimpleNew(1, dims_1, NPY_INT32);
    int32_t* ni = (int32_t*)PyArray_DATA(nbr_idx);
    int32_t* ti = (int32_t*)PyArray_DATA(tri_idx);
    int32_t* nc = (int32_t*)PyArray_DATA(nbr_cnt);
    int32_t* tc = (int32_t*)PyArray_DATA(tri_cnt);
    for (long i = 0; i < nverts; ++i) {
        for (npy_intp j = 0; j < maxd; ++j)
            ni[i * maxd + j] = j < (npy_intp)nbrs[i].size() ? nbrs[i][j] : -1;
        for (npy_intp j = 0; j < maxt; ++j)
            ti[i * maxt + j] = j < (npy_intp)tris[i].size() ? tris[i][j] : -1;
        nc[i] = (int32_t)nbrs[i].size();
        tc[i] = (int32_t)tris[i].size();
    }
    Py_DECREF(faces);
    return Py_BuildValue("NNNN", nbr_idx, nbr_cnt, tri_idx, tri_cnt);
}

/* ----------------------------------------------------------------------- */
/* ring2_faces(nbr_idx, tri_idx) -> (N, C) table, padded with first entry  */
/* ----------------------------------------------------------------------- */

static PyObject* ring2_faces(PyObject*, PyObject* args) {
    PyArrayObject *nbr_obj, *tri_obj;
    if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &nbr_obj,
                          &PyArray_Type, &tri_obj))
        return nullptr;
    PyArrayObject* nbr = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)nbr_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* tri = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)tri_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    if (!nbr || !tri) return nullptr;
    const npy_intp n = PyArray_DIM(nbr, 0);
    const npy_intp md = PyArray_DIM(nbr, 1);
    const npy_intp mt = PyArray_DIM(tri, 1);
    const int32_t* nb = (const int32_t*)PyArray_DATA(nbr);
    const int32_t* tr = (const int32_t*)PyArray_DATA(tri);

    std::vector<std::vector<int32_t>> rows((size_t)n);
    std::vector<char> seen;
    for (npy_intp v = 0; v < n; ++v) {
        auto& row = rows[v];
        auto add_faces = [&](npy_intp u) {
            for (npy_intp j = 0; j < mt; ++j) {
                int32_t tf = tr[u * mt + j];
                if (tf < 0) continue;
                if (std::find(row.begin(), row.end(), tf) == row.end())
                    row.push_back(tf);
            }
        };
        add_faces(v);
        for (npy_intp j = 0; j < md; ++j) {
            int32_t u = nb[v * md + j];
            if (u >= 0) add_faces(u);
        }
    }
    npy_intp cmax = 1;
    for (auto& r : rows) cmax = std::max(cmax, (npy_intp)r.size());
    npy_intp dims[2] = {n, cmax};
    PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
    int32_t* o = (int32_t*)PyArray_DATA(out);
    for (npy_intp v = 0; v < n; ++v) {
        const auto& r = rows[v];
        for (npy_intp j = 0; j < cmax; ++j)
            o[v * cmax + j] = j < (npy_intp)r.size() ? r[j] : r[0];
    }
    Py_DECREF(nbr);
    Py_DECREF(tri);
    return (PyObject*)out;
}

/* ----------------------------------------------------------------------- */
/* bfs_ball(nbr_idx, n_coarse, depth) -> (n_coarse, C) sorted, self-padded */
/* graph-ball vertex table (the icosphere-descent candidate sets;          */
/* ops/nearest._descent_table)                                             */
/* ----------------------------------------------------------------------- */

static PyObject* bfs_ball(PyObject*, PyObject* args) {
    PyArrayObject* nbr_obj;
    long n_coarse, depth;
    if (!PyArg_ParseTuple(args, "O!ll", &PyArray_Type, &nbr_obj, &n_coarse,
                          &depth))
        return nullptr;
    PyArrayObject* nbr = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)nbr_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    if (!nbr) return nullptr;
    const npy_intp n = PyArray_DIM(nbr, 0);
    const npy_intp md = PyArray_DIM(nbr, 1);
    const int32_t* nb = (const int32_t*)PyArray_DATA(nbr);

    std::vector<std::vector<int32_t>> rows((size_t)n_coarse);
    std::vector<int32_t> frontier, next;
    std::vector<char> seen((size_t)n, 0);
    std::vector<int32_t> touched;
    for (long v = 0; v < n_coarse; ++v) {
        auto& row = rows[v];
        touched.clear();
        frontier.assign(1, (int32_t)v);
        seen[v] = 1;
        touched.push_back((int32_t)v);
        row.push_back((int32_t)v);
        for (long d = 0; d < depth; ++d) {
            next.clear();
            for (int32_t a : frontier) {
                for (npy_intp j = 0; j < md; ++j) {
                    int32_t b = nb[(npy_intp)a * md + j];
                    if (b < 0 || seen[b]) continue;
                    seen[b] = 1;
                    touched.push_back(b);
                    row.push_back(b);
                    next.push_back(b);
                }
            }
            frontier.swap(next);
        }
        std::sort(row.begin(), row.end());
        for (int32_t t : touched) seen[t] = 0;
    }
    npy_intp cmax = 1;
    for (auto& r : rows) cmax = std::max(cmax, (npy_intp)r.size());
    npy_intp dims[2] = {n_coarse, cmax};
    PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_INT32);
    int32_t* o = (int32_t*)PyArray_DATA(out);
    for (long v = 0; v < n_coarse; ++v) {
        const auto& r = rows[v];
        for (npy_intp j = 0; j < cmax; ++j)
            o[(npy_intp)v * cmax + j] = j < (npy_intp)r.size()
                                            ? r[j] : (int32_t)v;
    }
    Py_DECREF(nbr);
    return (PyObject*)out;
}

/* ----------------------------------------------------------------------- */
/* BVH nearest-triangle with reference-octree query semantics              */
/* ----------------------------------------------------------------------- */

struct BVHNode {
    double lo[3], hi[3];
    int32_t left = -1, right = -1;   // children; leaf if left < 0
    int32_t start = 0, count = 0;    // triangle range (leaf)
};

struct BVH {
    std::vector<BVHNode> nodes;
    std::vector<int32_t> tri_order;
    std::vector<Vec3> centroids;
};

static void build_bvh(BVH& bvh, const double* coords, const int32_t* faces,
                      npy_intp t) {
    bvh.tri_order.resize((size_t)t);
    bvh.centroids.resize((size_t)t);
    for (npy_intp i = 0; i < t; ++i) {
        bvh.tri_order[(size_t)i] = (int32_t)i;
        Vec3 c{0, 0, 0};
        for (int k = 0; k < 3; ++k) {
            const double* p = coords + 3 * faces[3 * i + k];
            c.x += p[0] / 3.0;
            c.y += p[1] / 3.0;
            c.z += p[2] / 3.0;
        }
        bvh.centroids[(size_t)i] = c;
    }
    struct Item { int32_t node; int32_t start, count; };
    bvh.nodes.push_back({});
    std::vector<Item> stack{{0, 0, (int32_t)t}};
    while (!stack.empty()) {
        Item it = stack.back();
        stack.pop_back();
        BVHNode& node = bvh.nodes[(size_t)it.node];
        node.start = it.start;
        node.count = it.count;
        double lo[3] = {1e30, 1e30, 1e30}, hi[3] = {-1e30, -1e30, -1e30};
        for (int32_t i = it.start; i < it.start + it.count; ++i) {
            int32_t tid = bvh.tri_order[(size_t)i];
            for (int k = 0; k < 3; ++k) {
                const double* p = coords + 3 * faces[3 * tid + k];
                for (int d = 0; d < 3; ++d) {
                    lo[d] = std::min(lo[d], p[d]);
                    hi[d] = std::max(hi[d], p[d]);
                }
            }
        }
        for (int d = 0; d < 3; ++d) { node.lo[d] = lo[d]; node.hi[d] = hi[d]; }
        if (it.count <= 8) { node.left = node.right = -1; continue; }
        int axis = 0;
        double ext = hi[0] - lo[0];
        for (int d = 1; d < 3; ++d)
            if (hi[d] - lo[d] > ext) { ext = hi[d] - lo[d]; axis = d; }
        int32_t mid = it.start + it.count / 2;
        auto cmp = [&](int32_t a, int32_t b) {
            const Vec3& ca = bvh.centroids[(size_t)a];
            const Vec3& cb = bvh.centroids[(size_t)b];
            return (axis == 0 ? ca.x : axis == 1 ? ca.y : ca.z) <
                   (axis == 0 ? cb.x : axis == 1 ? cb.y : cb.z);
        };
        std::nth_element(bvh.tri_order.begin() + it.start,
                         bvh.tri_order.begin() + mid,
                         bvh.tri_order.begin() + it.start + it.count, cmp);
        int32_t l = (int32_t)bvh.nodes.size();
        bvh.nodes.push_back({});
        bvh.nodes.push_back({});
        bvh.nodes[(size_t)it.node].left = l;
        bvh.nodes[(size_t)it.node].right = l + 1;
        stack.push_back({l, it.start, mid - it.start});
        stack.push_back({l + 1, mid, it.start + it.count - mid});
    }
}

static double box_dist2(const BVHNode& n, const Vec3& p) {
    double d2 = 0;
    const double pv[3] = {p.x, p.y, p.z};
    for (int d = 0; d < 3; ++d) {
        double v = pv[d] < n.lo[d] ? n.lo[d] - pv[d]
                 : pv[d] > n.hi[d] ? pv[d] - n.hi[d] : 0.0;
        d2 += v * v;
    }
    return d2;
}

/* reference containment test (point.cpp:36-44) + boundary distance
 * (triangle.cpp:85-122) on the ray projection (octree.cpp:143-154). */
static bool tri_project_test(const Vec3& q, const Vec3& v0, const Vec3& v1,
                             const Vec3& v2, double* boundary_dist,
                             double* point_dist) {
    Vec3 s1 = sub(v2, v0); double n1 = norm(s1); if (n1 > 0) s1 = scale(s1, 1 / n1);
    Vec3 s2 = sub(v1, v0); double n2 = norm(s2); if (n2 > 0) s2 = scale(s2, 1 / n2);
    Vec3 nn = cross(s1, s2); double nl = norm(nn); if (nl > 0) nn = scale(nn, 1 / nl);
    double denom = dot(nn, q);
    if (denom == 0.0) return false;
    double si = dot(nn, v0) / denom;
    Vec3 pp = scale(q, si);
    *point_dist = norm(sub(pp, q));

    auto same_side = [&](const Vec3& p1, const Vec3& p2, const Vec3& a,
                         const Vec3& b) {
        Vec3 ab = sub(b, a);
        return dot(cross(ab, sub(p1, a)), cross(ab, sub(p2, a))) > -1e-8;
    };
    if (!(same_side(pp, v0, v1, v2) && same_side(pp, v1, v2, v0) &&
          same_side(pp, v2, v0, v1)))
        return false;

    double dmin = 1e300;
    const Vec3* vs[3] = {&v0, &v1, &v2};
    for (int a = 0; a < 3; ++a)
        for (int b = a + 1; b < 3; ++b) {
            Vec3 u = sub(*vs[b], *vs[a]);
            if (dot(sub(pp, *vs[a]), u) > 0 && dot(sub(pp, *vs[b]), u) < 0) {
                double d = norm(cross(sub(pp, *vs[a]), sub(pp, *vs[b]))) / norm(u);
                dmin = std::min(dmin, d);
            }
        }
    for (int a = 0; a < 3; ++a) dmin = std::min(dmin, norm(sub(pp, *vs[a])));
    *boundary_dist = dmin;
    return true;
}

/* per-query walk: pass 1 contained candidates by min boundary distance
 * (octree tier 1/2), pass 2 vertex-distance fallback (octree.cpp:194-208);
 * prune by box distance against the best fallback radius */
static int32_t bvh_query(const BVH& bvh, const double* c, const int32_t* f,
                         const Vec3& q, std::vector<int32_t>& node_stack,
                         int32_t seed_tid = -1) {
    int32_t best = -1;
    double best_bd = 1e300;
    int32_t best_fb = -1;
    double best_fb_d = 1e300;
    if (seed_tid >= 0) {
        /* warm start: consecutive patch points are spatially coherent, so
         * the previous answer's vertex distance bounds the search radius */
        const int32_t* fv = f + 3 * seed_tid;
        for (int a = 0; a < 3; ++a) {
            Vec3 v{c[3 * fv[a]], c[3 * fv[a] + 1], c[3 * fv[a] + 2]};
            double d = norm(sub(q, v));
            if (d < best_fb_d) { best_fb_d = d; best_fb = seed_tid; }
        }
    }
    node_stack.clear();
    node_stack.push_back(0);
    while (!node_stack.empty()) {
        int32_t ni = node_stack.back();
        node_stack.pop_back();
        const BVHNode& node = bvh.nodes[(size_t)ni];
        double b2 = box_dist2(node, q);
        if (b2 > best_fb_d * best_fb_d) continue;
        if (node.left >= 0) {
            /* nearest child first so the fallback radius shrinks early and
             * prunes the rest of the tree (octree descends directly to the
             * containing leaf for the same reason) */
            double dl = box_dist2(bvh.nodes[(size_t)node.left], q);
            double dr = box_dist2(bvh.nodes[(size_t)node.right], q);
            if (dl <= dr) {
                node_stack.push_back(node.right);
                node_stack.push_back(node.left);
            } else {
                node_stack.push_back(node.left);
                node_stack.push_back(node.right);
            }
            continue;
        }
        for (int32_t i = node.start; i < node.start + node.count; ++i) {
            int32_t tid = bvh.tri_order[(size_t)i];
            Vec3 v0{c[3 * f[3 * tid]], c[3 * f[3 * tid] + 1], c[3 * f[3 * tid] + 2]};
            Vec3 v1{c[3 * f[3 * tid + 1]], c[3 * f[3 * tid + 1] + 1], c[3 * f[3 * tid + 1] + 2]};
            Vec3 v2{c[3 * f[3 * tid + 2]], c[3 * f[3 * tid + 2] + 1], c[3 * f[3 * tid + 2] + 2]};
            double bd, pd;
            if (tri_project_test(q, v0, v1, v2, &bd, &pd)) {
                /* octree leaf semantics: among contained candidates that
                 * are near the query (not the antipodal hit), take min
                 * boundary distance */
                if (pd < best_fb_d + 1e-9 && bd < best_bd) {
                    best_bd = bd;
                    best = tid;
                }
            }
            double dmin = std::min({norm(sub(q, v0)), norm(sub(q, v1)),
                                    norm(sub(q, v2))});
            if (dmin < best_fb_d) {
                best_fb_d = dmin;
                best_fb = tid;
            }
        }
    }
    return best >= 0 ? best : best_fb;
}

static PyObject* nearest_triangle_bvh(PyObject*, PyObject* args) {
    PyArrayObject *coords_obj, *faces_obj, *query_obj;
    if (!PyArg_ParseTuple(args, "O!O!O!", &PyArray_Type, &coords_obj,
                          &PyArray_Type, &faces_obj, &PyArray_Type, &query_obj))
        return nullptr;
    PyArrayObject* coords = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)coords_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* faces = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)faces_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* query = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)query_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    if (!coords || !faces || !query) return nullptr;

    const double* c = (const double*)PyArray_DATA(coords);
    const int32_t* f = (const int32_t*)PyArray_DATA(faces);
    const double* qd = (const double*)PyArray_DATA(query);
    const npy_intp t = PyArray_DIM(faces, 0);
    const npy_intp nq = PyArray_DIM(query, 0);

    BVH bvh;
    build_bvh(bvh, c, f, t);

    npy_intp dims[1] = {nq};
    PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, dims, NPY_INT32);
    int32_t* o = (int32_t*)PyArray_DATA(out);

    std::vector<int32_t> node_stack;
    for (npy_intp qi = 0; qi < nq; ++qi) {
        Vec3 q{qd[3 * qi], qd[3 * qi + 1], qd[3 * qi + 2]};
        o[qi] = bvh_query(bvh, c, f, q, node_stack);
    }

    Py_DECREF(coords);
    Py_DECREF(faces);
    Py_DECREF(query);
    return (PyObject*)out;
}

/* ----------------------------------------------------------------------- */
/* bench_unary — the reference's computeUnaryCost work unit                 */
/* (DiscreteCostFunction.cpp:353-383) as optimized C++/OpenMP: per          */
/* (CP k, label l): build the Rodrigues rotation CP_k -> RL_kl              */
/* (point.cpp:97-152), rotate the patch, BVH nearest-triangle per point     */
/* (the octree equivalent, octree.cpp:156-214), ray-projected barycentric   */
/* interpolation (triangle.cpp:124-143), weighted Pearson similarity        */
/* (similarities.cpp:129-158), cost = 1-(1+r)/2. Calibrates the TPU kernel  */
/* against the reference's hardware class (CPU/OpenMP, double precision).   */
/* ----------------------------------------------------------------------- */

static void rodrigues_mat(const double* a, const double* b, double R[9]) {
    /* rotation taking unit a to unit b (estimate_rotation_matrix) */
    double d = a[0] * b[0] + a[1] * b[1] + a[2] * b[2];
    double cx = a[1] * b[2] - a[2] * b[1];
    double cy = a[2] * b[0] - a[0] * b[2];
    double cz = a[0] * b[1] - a[1] * b[0];
    double cn = std::sqrt(cx * cx + cy * cy + cz * cz);
    if (cn < 1e-12) {
        for (int i = 0; i < 9; ++i) R[i] = 0.0;
        if (d > 0) { R[0] = R[4] = R[8] = 1.0; }
        else { R[0] = R[4] = R[8] = -1.0; }
        return;
    }
    double ux = cx / cn, uy = cy / cn, uz = cz / cn;
    double th = std::acos(std::max(-1.0, std::min(1.0, d)));
    double s = std::sin(th), c1 = 1.0 - std::cos(th);
    /* R = I + s*U + c1*U^2, U = skew(u) */
    R[0] = 1.0 + c1 * (ux * ux - 1.0);
    R[1] = -s * uz + c1 * ux * uy;
    R[2] = s * uy + c1 * ux * uz;
    R[3] = s * uz + c1 * ux * uy;
    R[4] = 1.0 + c1 * (uy * uy - 1.0);
    R[5] = -s * ux + c1 * uy * uz;
    R[6] = -s * uy + c1 * ux * uz;
    R[7] = s * ux + c1 * uy * uz;
    R[8] = 1.0 + c1 * (uz * uz - 1.0);
}

static PyObject* bench_unary(PyObject*, PyObject* args) {
    PyArrayObject *tc_o, *tf_o, *td_o, *cp_o, *rl_o, *sp_o, *sd_o, *mk_o;
    long reps, threads;
    if (!PyArg_ParseTuple(args, "O!O!O!O!O!O!O!O!ll",
                          &PyArray_Type, &tc_o, &PyArray_Type, &tf_o,
                          &PyArray_Type, &td_o, &PyArray_Type, &cp_o,
                          &PyArray_Type, &rl_o, &PyArray_Type, &sp_o,
                          &PyArray_Type, &sd_o, &PyArray_Type, &mk_o,
                          &reps, &threads))
        return nullptr;
    PyArrayObject* tc = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)tc_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* tf = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)tf_o, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* td = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)td_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* cp = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)cp_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* rl = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)rl_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* sp = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)sp_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* sd = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)sd_o, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* mk = (PyArrayObject*)PyArray_FROM_OTF(
        (PyObject*)mk_o, NPY_UINT8, NPY_ARRAY_IN_ARRAY);
    if (!tc || !tf || !td || !cp || !rl || !sp || !sd || !mk) return nullptr;

    const double* c = (const double*)PyArray_DATA(tc);
    const int32_t* f = (const int32_t*)PyArray_DATA(tf);
    const double* data = (const double*)PyArray_DATA(td);
    const double* cpd = (const double*)PyArray_DATA(cp);
    const double* rld = (const double*)PyArray_DATA(rl);
    const double* spd = (const double*)PyArray_DATA(sp);
    const double* sdd = (const double*)PyArray_DATA(sd);
    const uint8_t* mkd = (const uint8_t*)PyArray_DATA(mk);
    const npy_intp t = PyArray_DIM(tf, 0);
    const npy_intp K = PyArray_DIM(rl, 0);
    const npy_intp L = PyArray_DIM(rl, 1);
    const npy_intp P = PyArray_DIM(sp, 1);

    BVH bvh;
    build_bvh(bvh, c, f, t);

    npy_intp dims[2] = {K, L};
    PyArrayObject* out =
        (PyArrayObject*)PyArray_SimpleNew(2, dims, NPY_DOUBLE);
    double* o = (double*)PyArray_DATA(out);

#ifdef _OPENMP
    omp_set_num_threads((int)threads);
#endif
    double elapsed = 0.0;
    Py_BEGIN_ALLOW_THREADS
    auto t0 = std::chrono::steady_clock::now();
    for (long rep = 0; rep < reps; ++rep) {
#ifdef _OPENMP
#pragma omp parallel
#endif
        {
            std::vector<int32_t> node_stack;
#ifdef _OPENMP
#pragma omp for collapse(2) schedule(dynamic, 4)
#endif
            for (npy_intp k = 0; k < K; ++k) {
                for (npy_intp l = 0; l < L; ++l) {
                    double R[9];
                    double cpn[3] = {cpd[3 * k], cpd[3 * k + 1],
                                     cpd[3 * k + 2]};
                    double cl = std::sqrt(cpn[0] * cpn[0] + cpn[1] * cpn[1] +
                                          cpn[2] * cpn[2]);
                    for (int i = 0; i < 3; ++i) cpn[i] /= cl;
                    double tg[3] = {rld[(k * L + l) * 3],
                                    rld[(k * L + l) * 3 + 1],
                                    rld[(k * L + l) * 3 + 2]};
                    double tl = std::sqrt(tg[0] * tg[0] + tg[1] * tg[1] +
                                          tg[2] * tg[2]);
                    for (int i = 0; i < 3; ++i) tg[i] /= tl;
                    rodrigues_mat(cpn, tg, R);

                    /* weighted Pearson accumulators (weights = mask) */
                    double sw = 0, sa = 0, sb = 0, saa = 0, sbb = 0, sab = 0;
                    int32_t prev_tid = -1;
                    for (npy_intp p = 0; p < P; ++p) {
                        if (!mkd[k * P + p]) continue;
                        const double* s0 = spd + (k * P + p) * 3;
                        Vec3 q{R[0] * s0[0] + R[1] * s0[1] + R[2] * s0[2],
                               R[3] * s0[0] + R[4] * s0[1] + R[5] * s0[2],
                               R[6] * s0[0] + R[7] * s0[1] + R[8] * s0[2]};
                        int32_t tid = bvh_query(bvh, c, f, q, node_stack,
                                                prev_tid);
                        prev_tid = tid;
                        const int32_t* fv = f + 3 * tid;
                        Vec3 v0{c[3 * fv[0]], c[3 * fv[0] + 1], c[3 * fv[0] + 2]};
                        Vec3 v1{c[3 * fv[1]], c[3 * fv[1] + 1], c[3 * fv[1] + 2]};
                        Vec3 v2{c[3 * fv[2]], c[3 * fv[2] + 1], c[3 * fv[2] + 2]};
                        /* ray-projected barycentric (triangle.cpp:124-143) */
                        Vec3 e1 = sub(v2, v0), e2 = sub(v1, v0);
                        Vec3 nn = cross(e1, e2);
                        double denom = dot(nn, q);
                        double si = denom != 0.0 ? dot(nn, v0) / denom : 1.0;
                        Vec3 pp = scale(q, si);
                        double aa = 0.5 * norm(cross(sub(v1, pp), sub(v2, pp)));
                        double ab = 0.5 * norm(cross(sub(v0, pp), sub(v2, pp)));
                        double ac = 0.5 * norm(cross(sub(v0, pp), sub(v1, pp)));
                        double tot = aa + ab + ac;
                        if (tot <= 0) tot = 1.0;
                        double val = (aa * data[fv[0]] + ab * data[fv[1]] +
                                      ac * data[fv[2]]) / tot;
                        double a = sdd[k * P + p];
                        sw += 1.0; sa += a; sb += val;
                        saa += a * a; sbb += val * val; sab += a * val;
                    }
                    double r = 0.0;
                    if (sw > 0) {
                        double ma = sa / sw, mb = sb / sw;
                        double va = saa / sw - ma * ma;
                        double vb = sbb / sw - mb * mb;
                        double cv = sab / sw - ma * mb;
                        double dn = std::sqrt(std::max(va, 0.0)) *
                                    std::sqrt(std::max(vb, 0.0));
                        r = (va <= 0 || vb <= 0) ? 0.0
                                                 : cv / (dn > 0 ? dn : 1.0);
                    }
                    o[k * L + l] = 1.0 - (1.0 + r) * 0.5;
                }
            }
        }
    }
    auto t1 = std::chrono::steady_clock::now();
    elapsed = std::chrono::duration<double>(t1 - t0).count() / (double)reps;
    Py_END_ALLOW_THREADS

    Py_DECREF(tc); Py_DECREF(tf); Py_DECREF(td); Py_DECREF(cp);
    Py_DECREF(rl); Py_DECREF(sp); Py_DECREF(sd); Py_DECREF(mk);
    return Py_BuildValue("dN", elapsed, (PyObject*)out);
}

/* greedy_color(row_ptr (N+1,) int64, col (E,) int32) -> (N,) int32
 *
 * Sequential first-fit graph coloring in node order 0..N-1 — identical
 * output to the Python loop it replaces (parallel/group_fusion.py
 * build_iteration_tables), hoisted to C++ because the groupwise driver
 * recolors S*K nodes every outer iteration (~164k nodes at cgMSM scale). */
static PyObject* greedy_color(PyObject*, PyObject* args) {
    PyObject *row_obj, *col_obj;
    if (!PyArg_ParseTuple(args, "OO", &row_obj, &col_obj)) return nullptr;
    PyArrayObject* row = (PyArrayObject*)PyArray_FROM_OTF(
        row_obj, NPY_INT64, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* col = (PyArrayObject*)PyArray_FROM_OTF(
        col_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    if (!row || !col) {
        Py_XDECREF(row);
        Py_XDECREF(col);
        return nullptr;
    }
    const npy_intp n = PyArray_DIM(row, 0) - 1;
    const int64_t* rp = (const int64_t*)PyArray_DATA(row);
    const int32_t* cl = (const int32_t*)PyArray_DATA(col);

    npy_intp dims[1] = {n};
    PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, dims, NPY_INT32);
    if (!out) {
        Py_DECREF(row);
        Py_DECREF(col);
        return nullptr;
    }
    int32_t* colors = (int32_t*)PyArray_DATA(out);

    std::vector<int64_t> stamp(256, -1);  // color -> last node that used it
    for (npy_intp v = 0; v < n; ++v) {
        for (int64_t e = rp[v]; e < rp[v + 1]; ++e) {
            if (cl[e] >= v) continue;     // not yet colored (order 0..n-1)
            int32_t c = colors[cl[e]];
            if (c >= 0 && c < (int32_t)stamp.size()) stamp[c] = v;
        }
        int32_t c = 0;
        while (c < (int32_t)stamp.size() && stamp[c] == (int64_t)v) ++c;
        colors[v] = c;
    }

    Py_DECREF(row);
    Py_DECREF(col);
    return (PyObject*)out;
}

/* ----------------------------------------------------------------------- */
/* qpbo_binary: exact oracle for the fusion binary subproblems             */
/* ----------------------------------------------------------------------- */
/* Roof-duality (QPBO) solve of the binary "keep vs switch-to-alpha"
 * energy with triplet (8-combination) and pair (4-combination) tables —
 * the oracle the multi-start ICM in reg/optimise/fusion.py is measured
 * against (VERDICT round-4 item #5; the reference reduces these cubic
 * terms with ELC/HOCR and solves max-flow via FastPD, FastPD.h:157-182).
 *
 * Original implementation of the published method (Boros-Hammer roof
 * duality; Kolmogorov-Rother 2007 construction; Freedman-Drineas cubic
 * reduction), NOT a port of any existing QPBO code:
 *   1. each triplet table -> multilinear coefficients; the cubic monomial
 *      is reduced with one auxiliary variable (negative coefficient
 *      directly, positive via complementing one argument),
 *   2. the resulting general quadratic PBF is doubled over literal pairs
 *      (y_i, y_ibar) so every pairwise term is submodular on its chosen
 *      literal pair (a non-submodular term on (i,j) is submodular on
 *      (i, jbar)),
 *   3. min-cut via Dinic's algorithm; x_i is persistent (part of a global
 *      optimum) where the two copies agree, and const + maxflow is a
 *      certified lower bound on the original minimum. If every node is
 *      labeled the labeling IS a global optimum.
 *
 * Returns (labels (K,) int8 in {0,1,-1=unlabeled}, lower_bound float,
 *          n_unlabeled_including_aux int). */

struct DinicGraph {
    struct Edge { int to; double cap; int rev; };
    std::vector<std::vector<Edge>> adj;
    std::vector<int> level, iter;
    int n;
    explicit DinicGraph(int n_) : adj(n_), level(n_), iter(n_), n(n_) {}
    void add_edge(int u, int v, double cap, double rcap = 0.0) {
        if (cap <= 0.0 && rcap <= 0.0) return;
        adj[u].push_back({v, cap, (int)adj[v].size()});
        adj[v].push_back({u, rcap, (int)adj[u].size() - 1});
    }
    bool bfs(int s, int t) {
        std::fill(level.begin(), level.end(), -1);
        std::vector<int> q;
        q.push_back(s);
        level[s] = 0;
        for (size_t h = 0; h < q.size(); ++h) {
            int u = q[h];
            for (const Edge& e : adj[u])
                if (e.cap > 1e-12 && level[e.to] < 0) {
                    level[e.to] = level[u] + 1;
                    q.push_back(e.to);
                }
        }
        return level[t] >= 0;
    }
    double dfs(int u, int t, double f) {
        if (u == t) return f;
        for (int& i = iter[u]; i < (int)adj[u].size(); ++i) {
            Edge& e = adj[u][i];
            if (e.cap > 1e-12 && level[e.to] == level[u] + 1) {
                double d = dfs(e.to, t, std::min(f, e.cap));
                if (d > 0) {
                    e.cap -= d;
                    adj[e.to][e.rev].cap += d;
                    return d;
                }
            }
        }
        return 0.0;
    }
    double maxflow(int s, int t) {
        double flow = 0.0;
        while (bfs(s, t)) {
            std::fill(iter.begin(), iter.end(), 0);
            double f;
            while ((f = dfs(s, t, 1e300)) > 0) flow += f;
        }
        return flow;
    }
    /* source-side reachability in the residual graph (canonical min cut) */
    void min_cut_side(int s, std::vector<char>& in_s) {
        in_s.assign(n, 0);
        std::vector<int> q;
        q.push_back(s);
        in_s[s] = 1;
        for (size_t h = 0; h < q.size(); ++h)
            for (const Edge& e : adj[q[h]])
                if (e.cap > 1e-12 && !in_s[e.to]) {
                    in_s[e.to] = 1;
                    q.push_back(e.to);
                }
    }
};

struct QpboBuilder {
    /* literal id: 2*i for y_i, 2*i+1 for its complement copy y_ibar.
     * x_i = 1  <=>  node on SOURCE side. */
    int nvars;                    // original + auxiliary
    double const_term = 0.0;
    std::vector<double> lam;      // per-LITERAL coefficient of x (lam*x)
    std::vector<double> edge_caps;             // half-weight capacities
    std::vector<std::pair<int, int>> edge_lits;

    explicit QpboBuilder(int nv) : nvars(nv), lam(2 * (size_t)nv, 0.0) {}
    int add_aux() {
        ++nvars;
        lam.push_back(0.0);
        lam.push_back(0.0);
        return nvars - 1;
    }
    /* literal helpers: lit = 2*var + (0 normal | 1 complemented VIEW).
     * A term on the complemented view of var i is a term on (1 - x_i);
     * in the doubled graph that is a direct term on copy y_ibar. */
    void add_unary(int var, double u0, double u1) {
        /* u0 + (u1-u0) x  on y_i;  mirrored on y_ibar: u1 + (u0-u1) x */
        const_term += 0.5 * (u0 + u1);
        lam[2 * (size_t)var] += 0.5 * (u1 - u0);
        lam[2 * (size_t)var + 1] += 0.5 * (u0 - u1);
    }
    /* general pairwise table on (x_a, x_b): t[aa*2+bb]. Internally routed
     * to a submodular literal pairing, plus the mirrored copy on the
     * complement literals (the doubled energy is ½[copy + mirror]; when
     * y_ibar == 1-y_i each copy contributes ½·θ(x_a,x_b)). */
    void add_pair(int va, int vb, double t00, double t01, double t10,
                  double t11) {
        double m = t01 + t10 - t00 - t11;
        if (m >= 0.0) {
            half_sub(2 * va, 2 * vb, t00, t01, t10, t11);
            /* mirror on (y_bbar, y_abar): S(b',a') = θ(1-a', 1-b') */
            half_sub(2 * vb + 1, 2 * va + 1, t11, t01, t10, t00);
        } else {
            /* complement b: table on (y_a, y_bbar): R(a,b') = θ(a, 1-b'),
             * m' = -m > 0 */
            half_sub(2 * va, 2 * vb + 1, t01, t00, t11, t10);
            /* its mirror on (y_b, y_abar): Q(bv,a') = θ(1-a', bv) */
            half_sub(2 * vb, 2 * va + 1, t10, t00, t11, t01);
        }
    }
    /* one submodular half-weight table on literals (p, q):
     * E = A + (C-A)x_p + (D-C)x_q + M(1-x_p)x_q, M = B+C-A-D >= 0 */
    void half_sub(int p, int q, double A, double B, double C, double D) {
        const_term += 0.5 * A;
        lam[p] += 0.5 * (C - A);
        lam[q] += 0.5 * (D - C);
        double M = B + C - A - D;   // cut pays M when q in S, p in T
        edge_caps.push_back(0.5 * M);
        edge_lits.push_back({p, q});
    }
};

static PyObject* qpbo_binary(PyObject*, PyObject* args) {
    PyObject *u0_obj, *u1_obj, *tri_obj, *t8_obj, *pairs_obj, *p4_obj;
    if (!PyArg_ParseTuple(args, "OOOOOO", &u0_obj, &u1_obj, &tri_obj,
                          &t8_obj, &pairs_obj, &p4_obj))
        return nullptr;
    PyArrayObject* u0 = (PyArrayObject*)PyArray_FROM_OTF(
        u0_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* u1 = (PyArrayObject*)PyArray_FROM_OTF(
        u1_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* tri = (PyArrayObject*)PyArray_FROM_OTF(
        tri_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* t8 = (PyArrayObject*)PyArray_FROM_OTF(
        t8_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* prs = (PyArrayObject*)PyArray_FROM_OTF(
        pairs_obj, NPY_INT32, NPY_ARRAY_IN_ARRAY);
    PyArrayObject* p4 = (PyArrayObject*)PyArray_FROM_OTF(
        p4_obj, NPY_DOUBLE, NPY_ARRAY_IN_ARRAY);
    if (!u0 || !u1 || !tri || !t8 || !prs || !p4) {
        Py_XDECREF(u0); Py_XDECREF(u1); Py_XDECREF(tri);
        Py_XDECREF(t8); Py_XDECREF(prs); Py_XDECREF(p4);
        return nullptr;
    }
    const npy_intp K = PyArray_DIM(u0, 0);
    const npy_intp T = PyArray_SIZE(tri) / 3;
    const npy_intp PR = PyArray_SIZE(prs) / 2;
    const double* U0 = (const double*)PyArray_DATA(u0);
    const double* U1 = (const double*)PyArray_DATA(u1);
    const int32_t* TRI = (const int32_t*)PyArray_DATA(tri);
    const double* T8 = (const double*)PyArray_DATA(t8);
    const int32_t* PRS = (const int32_t*)PyArray_DATA(prs);
    const double* P4 = (const double*)PyArray_DATA(p4);

    QpboBuilder b((int)K);
    for (npy_intp i = 0; i < K; ++i) b.add_unary((int)i, U0[i], U1[i]);

    for (npy_intp t = 0; t < T; ++t) {
        const double* f = T8 + 8 * t;
        int v1 = TRI[3 * t], v2 = TRI[3 * t + 1], v3 = TRI[3 * t + 2];
        /* multilinear coefficients (f indexed b1*4+b2*2+b3) */
        double c0 = f[0];
        double c1 = f[4] - f[0], c2 = f[2] - f[0], c3 = f[1] - f[0];
        double c12 = f[6] - f[4] - f[2] + f[0];
        double c13 = f[5] - f[4] - f[1] + f[0];
        double c23 = f[3] - f[2] - f[1] + f[0];
        double c123 = f[7] - f[6] - f[5] - f[3] + f[4] + f[2] + f[1] - f[0];
        b.const_term += c0;
        b.add_unary(v1, 0.0, c1);
        b.add_unary(v2, 0.0, c2);
        b.add_unary(v3, 0.0, c3);
        if (c12 != 0.0) b.add_pair(v1, v2, 0, 0, 0, c12);
        if (c13 != 0.0) b.add_pair(v1, v3, 0, 0, 0, c13);
        if (c23 != 0.0) b.add_pair(v2, v3, 0, 0, 0, c23);
        if (c123 < 0.0) {
            /* c123*x1*x2*x3 = min_w c123*w*(x1+x2+x3-2) */
            int w = b.add_aux();
            b.add_unary(w, 0.0, -2.0 * c123);
            b.add_pair(w, v1, 0, 0, 0, c123);
            b.add_pair(w, v2, 0, 0, 0, c123);
            b.add_pair(w, v3, 0, 0, 0, c123);
        } else if (c123 > 0.0) {
            /* x1x2x3 = x1x2 - x1x2(1-x3); reduce -c123*x1*x2*(1-x3):
             * min_w -c123*w*(x1+x2+(1-x3)-2) */
            b.add_pair(v1, v2, 0, 0, 0, c123);
            int w = b.add_aux();
            /* -c123*w*(x1+x2-x3-1) = -c123(w*x1 + w*x2 - w*x3 - w) */
            b.add_unary(w, 0.0, c123);
            b.add_pair(w, v1, 0, 0, 0, -c123);
            b.add_pair(w, v2, 0, 0, 0, -c123);
            b.add_pair(w, v3, 0, 0, 0, c123);
        }
    }
    for (npy_intp p = 0; p < PR; ++p) {
        const double* f = P4 + 4 * p;
        b.add_pair(PRS[2 * p], PRS[2 * p + 1], f[0], f[1], f[2], f[3]);
    }

    /* build flow network: node ids = literals; +2 for s, t */
    int N = 2 * b.nvars;
    int S = N, Tk = N + 1;
    DinicGraph g(N + 2);
    for (int l = 0; l < N; ++l) {
        double c = b.lam[l];
        if (c > 0)      g.add_edge(l, Tk, c);     // pays c when x_l = 1 (S side)
        else if (c < 0) { g.add_edge(S, l, -c); b.const_term += c; }
    }
    for (size_t e = 0; e < b.edge_caps.size(); ++e) {
        if (b.edge_caps[e] > 0)
            g.add_edge(b.edge_lits[e].second, b.edge_lits[e].first,
                       b.edge_caps[e]);
    }
    double flow = g.maxflow(S, Tk);
    std::vector<char> in_s;
    g.min_cut_side(S, in_s);

    npy_intp dims[1] = {K};
    PyArrayObject* out = (PyArrayObject*)PyArray_SimpleNew(1, dims, NPY_INT8);
    int8_t* lab = (int8_t*)PyArray_DATA(out);
    long unlabeled = 0;
    for (npy_intp i = 0; i < K; ++i) {
        int yi = in_s[2 * i] ? 1 : 0;
        int ybar = in_s[2 * i + 1] ? 1 : 0;
        if (yi == 1 - ybar) lab[i] = (int8_t)yi;
        else { lab[i] = -1; ++unlabeled; }
    }
    for (int a = (int)K; a < b.nvars; ++a) {
        int yi = in_s[2 * a] ? 1 : 0;
        int ybar = in_s[2 * a + 1] ? 1 : 0;
        if (yi != 1 - ybar) ++unlabeled;
    }
    double lower_bound = b.const_term + flow;

    Py_DECREF(u0); Py_DECREF(u1); Py_DECREF(tri);
    Py_DECREF(t8); Py_DECREF(prs); Py_DECREF(p4);
    return Py_BuildValue("(Ndl)", (PyObject*)out, lower_bound, unlabeled);
}

static PyMethodDef methods[] = {
    {"adjacency", adjacency, METH_VARARGS,
     "adjacency(faces, nverts) -> (nbr_idx, nbr_cnt, tri_idx, tri_cnt)"},
    {"ring2_faces", ring2_faces, METH_VARARGS,
     "ring2_faces(nbr_idx, tri_idx) -> (N,C) candidate-face table"},
    {"bfs_ball", bfs_ball, METH_VARARGS,
     "bfs_ball(nbr_idx, n_coarse, depth) -> (n_coarse,C) graph-ball table"},
    {"nearest_triangle_bvh", nearest_triangle_bvh, METH_VARARGS,
     "nearest_triangle_bvh(coords, faces, queries) -> (Q,) triangle ids"},
    {"greedy_color", greedy_color, METH_VARARGS,
     "greedy_color(row_ptr, col) -> (N,) first-fit colors, node order"},
    {"qpbo_binary", qpbo_binary, METH_VARARGS,
     "qpbo_binary(u0, u1, triplets, t8, pairs, p4) -> (labels (K,) int8 "
     "{0,1,-1}, lower_bound, n_unlabeled) — roof-duality oracle for the "
     "fusion binary subproblems (all-labeled => global optimum)"},
    {"bench_unary", bench_unary, METH_VARARGS,
     "bench_unary(tgt_coords, tgt_faces, tgt_data, cp, rl, patch_pts, "
     "patch_data, mask, reps, threads) -> (sec_per_volume, costs (K,L))"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_geometry",
    "Native host runtime: mesh topology + exact BVH nearest-triangle",
    -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__geometry(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
