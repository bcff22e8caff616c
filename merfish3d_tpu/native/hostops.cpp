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
#include <cstdlib>
#include <mutex>
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

// Connected components of equal-value voxels in a 3D volume.
// decoded: int32 (nz*ny*nx), background = -1. connectivity: 26 (3D) or
// 8 per z-plane when use_2d != 0 (the reference 2D mode,
// `PixelDecoder.py:2515-2541`). Writes root linear indices into labels
// (int64, -1 for background) — the same contract as the Pallas
// label_connected kernel. Single pass with union-find (path halving).
void label_components_3d(const int32_t* decoded, int64_t nz, int64_t ny,
                         int64_t nx, int32_t use_2d, int64_t* labels) {
    const int64_t n = nz * ny * nx;
    std::vector<int64_t> parent(n);
    for (int64_t i = 0; i < n; ++i) parent[i] = i;
    auto find = [&](int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    auto unite = [&](int64_t a, int64_t b) {
        a = find(a);
        b = find(b);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    };
    const int64_t sy = nx, sz = ny * nx;
    // half-neighborhood offsets (each edge visited once)
    for (int64_t z = 0; z < nz; ++z) {
        for (int64_t y = 0; y < ny; ++y) {
            const int64_t row = z * sz + y * sy;
            for (int64_t x = 0; x < nx; ++x) {
                const int64_t i = row + x;
                const int32_t v = decoded[i];
                if (v < 0) continue;
                // in-plane: left, up-left, up, up-right
                if (x > 0 && decoded[i - 1] == v) unite(i, i - 1);
                if (y > 0) {
                    if (decoded[i - sy] == v) unite(i, i - sy);
                    if (x > 0 && decoded[i - sy - 1] == v) unite(i, i - sy - 1);
                    if (x + 1 < nx && decoded[i - sy + 1] == v)
                        unite(i, i - sy + 1);
                }
                if (!use_2d && z > 0) {
                    for (int64_t dy = -1; dy <= 1; ++dy) {
                        if (y + dy < 0 || y + dy >= ny) continue;
                        for (int64_t dx = -1; dx <= 1; ++dx) {
                            if (x + dx < 0 || x + dx >= nx) continue;
                            const int64_t j = i - sz + dy * sy + dx;
                            if (decoded[j] == v) unite(i, j);
                        }
                    }
                }
            }
        }
    }
    for (int64_t i = 0; i < n; ++i)
        labels[i] = decoded[i] < 0 ? -1 : find(i);
}

// Sparse connected components: same semantics as label_components_3d but
// emitting only the foreground — `lin_out[t]` = linear index of the t-th
// foreground voxel (scan order), `root_out[t]` = the canonical component
// id of that voxel (the scan rank of the component's first voxel).
//
// Rationale: the dense variant allocates and first-touches TWO
// volume-sized arrays per call (the int64 parent vector and the int64
// labels output) — at a production 210M-voxel tile that is ~3.4 GB of
// page faults for a foreground of <1%. This variant writes only
// O(n_foreground) outputs; the voxel→rank scratch map is a process-wide
// arena written ONLY at foreground positions (background entries are
// never read: every neighbor lookup is gated on decoded[j] == v >= 0,
// and any such j precedes i in scan order, so its rank is set).
//
// Returns the foreground count, or -1 if it exceeds `n_fg_cap`, -2 on
// allocation failure, -3 if the volume exceeds int32 ranks.
static int32_t* g_rank_arena = nullptr;
static int64_t g_rank_cap = 0;
static std::mutex g_rank_mutex;

int64_t label_components_sparse(const int32_t* decoded, int64_t nz,
                                int64_t ny, int64_t nx, int32_t use_2d,
                                int64_t* lin_out, int64_t* root_out,
                                int64_t n_fg_cap) {
    const int64_t n = nz * ny * nx;
    if (n > INT32_MAX || n_fg_cap > INT32_MAX) return -3;
    std::lock_guard<std::mutex> lock(g_rank_mutex);
    if (g_rank_cap < n) {
        std::free(g_rank_arena);
        g_rank_arena = static_cast<int32_t*>(std::malloc(n * sizeof(int32_t)));
        if (!g_rank_arena) {
            g_rank_cap = 0;
            return -2;
        }
        g_rank_cap = n;
    }
    int32_t* rank = g_rank_arena;
    std::vector<int32_t> parent;
    parent.reserve(static_cast<size_t>(n_fg_cap));
    auto find = [&](int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    auto unite = [&](int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a != b) parent[std::max(a, b)] = std::min(a, b);
    };
    const int64_t sy = nx, sz = ny * nx;
    int64_t count = 0;
    for (int64_t z = 0; z < nz; ++z) {
        for (int64_t y = 0; y < ny; ++y) {
            const int64_t row = z * sz + y * sy;
            for (int64_t x = 0; x < nx; ++x) {
                const int64_t i = row + x;
                const int32_t v = decoded[i];
                if (v < 0) continue;
                if (count >= n_fg_cap) return -1;
                const int32_t r = static_cast<int32_t>(count);
                parent.push_back(r);
                rank[i] = r;
                lin_out[count] = i;
                ++count;
                if (x > 0 && decoded[i - 1] == v) unite(r, rank[i - 1]);
                if (y > 0) {
                    if (decoded[i - sy] == v) unite(r, rank[i - sy]);
                    if (x > 0 && decoded[i - sy - 1] == v)
                        unite(r, rank[i - sy - 1]);
                    if (x + 1 < nx && decoded[i - sy + 1] == v)
                        unite(r, rank[i - sy + 1]);
                }
                if (!use_2d && z > 0) {
                    for (int64_t dy = -1; dy <= 1; ++dy) {
                        if (y + dy < 0 || y + dy >= ny) continue;
                        for (int64_t dx = -1; dx <= 1; ++dx) {
                            if (x + dx < 0 || x + dx >= nx) continue;
                            const int64_t j = i - sz + dy * sy + dx;
                            if (decoded[j] == v) unite(r, rank[j]);
                        }
                    }
                }
            }
        }
    }
    for (int64_t t = 0; t < count; ++t)
        root_out[t] = find(static_cast<int32_t>(t));
    return count;
}

}  // extern "C"
