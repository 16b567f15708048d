// Native SAH AABB-tree builder.
//
// Scene-load-time fast path behind tinsel_tpu/accel/build.py (the NumPy
// reference implementation); same algorithm: full-sweep surface-area
// heuristic along the longest axis, middle-split fallback, ranged leaves of
// up to `leaf_size` items (contiguous in the output permutation), flat SoA
// output with the root at node 0. Exposed through a plain C ABI and loaded
// via ctypes (see bvh_native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC bvh_builder.cpp -o libtinselbvh.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
    float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline double area(const Vec3& lo, const Vec3& hi) {
    double ex = std::max(0.0f, hi.x - lo.x);
    double ey = std::max(0.0f, hi.y - lo.y);
    double ez = std::max(0.0f, hi.z - lo.z);
    return 2.0 * (ex * ey + ex * ez + ey * ez);
}

struct Builder {
    const Vec3* lowers;
    const Vec3* uppers;
    std::vector<Vec3> centers;
    std::vector<int64_t> indices;

    float* out_lower;
    float* out_upper;
    int32_t* out_left;
    int32_t* out_right;
    int32_t* out_leaf;
    int32_t* out_count;
    int32_t leaf_size = 1;
    int32_t used = 0;

    // reusable sweep scratch
    std::vector<double> left_area, right_area;

    int32_t alloc() { return used++; }

    void build(int32_t node, int64_t start, int64_t end) {
        // compute node bounds
        Vec3 lo = lowers[indices[start]];
        Vec3 hi = uppers[indices[start]];
        for (int64_t i = start + 1; i < end; ++i) {
            lo = vmin(lo, lowers[indices[i]]);
            hi = vmax(hi, uppers[indices[i]]);
        }
        out_lower[node * 3 + 0] = lo.x;
        out_lower[node * 3 + 1] = lo.y;
        out_lower[node * 3 + 2] = lo.z;
        out_upper[node * 3 + 0] = hi.x;
        out_upper[node * 3 + 1] = hi.y;
        out_upper[node * 3 + 2] = hi.z;

        int64_t n = end - start;
        if (n <= leaf_size) {
            out_leaf[node] = 1;
            out_left[node] = (int32_t)start;  // range start in final perm
            out_right[node] = 0;
            out_count[node] = (int32_t)n;
            return;
        }

        // longest axis
        float ex = hi.x - lo.x, ey = hi.y - lo.y, ez = hi.z - lo.z;
        int axis = (ex > ey && ex > ez) ? 0 : (ey > ez ? 1 : 2);

        const Vec3* cs = centers.data();
        std::stable_sort(indices.begin() + start, indices.begin() + end,
                         [cs, axis](int64_t a, int64_t b) {
                             const float* ca = &cs[a].x;
                             const float* cb = &cs[b].x;
                             return ca[axis] < cb[axis];
                         });

        // prefix / suffix area sweeps
        left_area.resize(n);
        right_area.resize(n);
        Vec3 l_lo = lowers[indices[start]], l_hi = uppers[indices[start]];
        for (int64_t i = 0; i < n; ++i) {
            l_lo = vmin(l_lo, lowers[indices[start + i]]);
            l_hi = vmax(l_hi, uppers[indices[start + i]]);
            left_area[i] = area(l_lo, l_hi);
        }
        Vec3 r_lo = lowers[indices[end - 1]], r_hi = uppers[indices[end - 1]];
        for (int64_t i = n - 1; i >= 0; --i) {
            r_lo = vmin(r_lo, lowers[indices[start + i]]);
            r_hi = vmax(r_hi, uppers[indices[start + i]]);
            right_area[i] = area(r_lo, r_hi);
        }

        // minimize left_area[i] * i + right_area[i] * (n - i)
        int64_t best = 0;
        double best_cost = 1e300;
        for (int64_t i = 0; i < n; ++i) {
            double cost = left_area[i] * (double)i + right_area[i] * (double)(n - i);
            if (cost < best_cost) {
                best_cost = cost;
                best = i;
            }
        }
        int64_t split = best + 1;
        if (split <= 0 || split >= n) split = n / 2;

        int32_t lchild = alloc();
        int32_t rchild = alloc();
        out_leaf[node] = 0;
        out_left[node] = lchild;
        out_right[node] = rchild;
        out_count[node] = 0;
        // recurse (depth is O(log n) in practice; SAH trees are balanced
        // enough that native stack depth is not a concern at 10M items)
        build(lchild, start, start + split);
        build(rchild, start + split, end);
    }
};

}  // namespace

extern "C" {

// Returns the number of nodes written (<= 2*n). Output arrays must have
// capacity 2*n.
int32_t tinsel_build_bvh(const float* lowers, const float* uppers, int64_t n,
                         int32_t leaf_size, float* out_lower, float* out_upper,
                         int32_t* out_left, int32_t* out_right,
                         int32_t* out_leaf, int32_t* out_count,
                         int32_t* out_perm) {
    if (n <= 0) return 0;
    Builder b;
    b.leaf_size = leaf_size < 1 ? 1 : leaf_size;
    b.out_count = out_count;
    b.lowers = reinterpret_cast<const Vec3*>(lowers);
    b.uppers = reinterpret_cast<const Vec3*>(uppers);
    b.centers.resize(n);
    for (int64_t i = 0; i < n; ++i) {
        b.centers[i] = {0.5f * (b.lowers[i].x + b.uppers[i].x),
                        0.5f * (b.lowers[i].y + b.uppers[i].y),
                        0.5f * (b.lowers[i].z + b.uppers[i].z)};
    }
    b.indices.resize(n);
    for (int64_t i = 0; i < n; ++i) b.indices[i] = i;
    b.out_lower = out_lower;
    b.out_upper = out_upper;
    b.out_left = out_left;
    b.out_right = out_right;
    b.out_leaf = out_leaf;
    int32_t root = b.alloc();
    b.build(root, 0, n);
    for (int64_t i = 0; i < n; ++i) out_perm[i] = (int32_t)b.indices[i];
    return b.used;
}
}
