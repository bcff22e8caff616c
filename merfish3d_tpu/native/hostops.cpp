// Native host-side operations for the merfish3d-tpu runtime.
//
// The reference leans on native wheels (scipy cKDTree, shapely/rtree,
// skimage) for its host-side post-processing hot loops
// (`PixelDecoder._remove_duplicates_within_tile:3755-3939`,
// `_assign_cells:3650-3710`, `calculate_F1.py:19-185`). Production tables
// carry millions of transcripts, so these run natively here:
//
//  - union_find:       path-compressed union-find over candidate pairs
//                      (within-tile duplicate clustering)
//  - points_in_polygon: batched ray-casting point-in-polygon
//                      (cell assignment)
//  - greedy_match:     distance-sorted greedy one-to-one matching
//                      (F1 scoring / bead correspondence)
//
// Exposed with plain C ABI and consumed through ctypes (no CPython API,
// no pybind11 — see merfish3d_tpu/native/__init__.py which compiles this
// file on first use and caches the shared object).

#include <algorithm>
#include <cstdint>
#include <vector>

extern "C" {

// Union-find over `n` elements with `m` candidate pairs (pairs[2*i],
// pairs[2*i+1]). Writes the root of each element into `roots` (size n).
// Roots are canonical (fully compressed) on return.
void union_find(const int64_t* pairs, int64_t m, int64_t n, int64_t* roots) {
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;

    // iterative find with path halving
    auto find = [&](int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    for (int64_t i = 0; i < m; ++i) {
        int64_t a = find(pairs[2 * i]);
        int64_t b = find(pairs[2 * i + 1]);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    }
    for (int64_t i = 0; i < n; ++i) roots[i] = find(i);
}

// Ray-casting point-in-polygon for `n` points against one polygon with
// `k` vertices (poly as y0,x0,y1,x1,...). Writes 1/0 into `inside`.
void points_in_polygon(const double* pts_yx, int64_t n, const double* poly_yx,
                       int64_t k, uint8_t* inside) {
    for (int64_t i = 0; i < n; ++i) {
        const double py = pts_yx[2 * i];
        const double px = pts_yx[2 * i + 1];
        bool in = false;
        for (int64_t a = 0, b = k - 1; a < k; b = a++) {
            const double ay = poly_yx[2 * a], ax = poly_yx[2 * a + 1];
            const double by = poly_yx[2 * b], bx = poly_yx[2 * b + 1];
            const bool crosses = (ay > py) != (by > py);
            if (crosses) {
                const double x_at =
                    (bx - ax) * (py - ay) / (by - ay + 1e-300) + ax;
                if (px < x_at) in = !in;
            }
        }
        inside[i] = in ? 1 : 0;
    }
}

// Greedy one-to-one matching: `m` candidate pairs (src index, dst index)
// with distances; pairs are processed in ascending distance order and a
// pair is accepted iff neither endpoint is taken. Writes the accepted
// pair indices into `accepted` and returns the accepted count.
int64_t greedy_match(const int64_t* pair_src, const int64_t* pair_dst,
                     const double* pair_dist, int64_t m, int64_t n_src,
                     int64_t n_dst, int64_t* accepted) {
    std::vector<int64_t> order(m);
    for (int64_t i = 0; i < m; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
        if (pair_dist[a] != pair_dist[b]) return pair_dist[a] < pair_dist[b];
        return a < b;
    });
    std::vector<uint8_t> src_used(n_src, 0), dst_used(n_dst, 0);
    int64_t count = 0;
    for (int64_t oi = 0; oi < m; ++oi) {
        const int64_t i = order[oi];
        const int64_t s = pair_src[i], d = pair_dst[i];
        if (src_used[s] || dst_used[d]) continue;
        src_used[s] = 1;
        dst_used[d] = 1;
        accepted[count++] = i;
    }
    return count;
}

}  // extern "C"
