// Native BVH builder — C++ twin of models/bvh.py::build_bvh.
//
// The reference builds its BVH in C++ too (bvh.cu:16-65 in
// jayHuggie/PathTracer_CUDA_Interactive), but recursively re-sorts a copy
// of the primitive vector at every node — O(n log^2 n) with huge constants
// (56 s for the 1.09M-tri buddha, README.md:132).  This builder is the
// linear-work Morton/LBVH design: one stable sort of 63-bit Morton keys,
// then an implicit balanced tree over the sorted order, emitted directly
// in preorder skip-link layout.
//
// Bit-for-bit parity with the numpy builder is part of the contract
// (tests/test_native.py asserts identical arrays): same 21-bit Morton
// quantization in float64, same stable sort, same ceil-half split, same
// preorder/skip arithmetic, same f32 box merges.
//
// Built as a plain shared library (native/Makefile) and loaded with
// ctypes (models/native.py); the numpy path remains as fallback so the
// package works without a compiler.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline uint64_t expand_bits_21(uint64_t v) {
    v &= 0x1FFFFFull;
    v = (v | (v << 32)) & 0x1F00000000FFFFull;
    v = (v | (v << 16)) & 0x1F0000FF0000FFull;
    v = (v | (v << 8)) & 0x100F00F00F00F00Full;
    v = (v | (v << 4)) & 0x10C30C30C30C30C3ull;
    v = (v | (v << 2)) & 0x1249249249249249ull;
    return v;
}

struct Range {
    int64_t f, l, pre;
    int32_t depth;
};

}  // namespace

extern "C" int pt_build_bvh(const float* prim_min, const float* prim_max,
                            int64_t P, float* node_min, float* node_max,
                            int32_t* skip, int32_t* prim,
                            int32_t* out_depth) {
    if (P <= 0) return -1;
    const int64_t N = 2 * P - 1;

    // --- Morton codes of centroids (float64, numpy-identical) ----------
    std::vector<double> cx(P), cy(P), cz(P);
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < P; ++i) {
        const double c[3] = {
            0.5 * ((double)prim_min[3 * i + 0] + (double)prim_max[3 * i + 0]),
            0.5 * ((double)prim_min[3 * i + 1] + (double)prim_max[3 * i + 1]),
            0.5 * ((double)prim_min[3 * i + 2] + (double)prim_max[3 * i + 2])};
        cx[i] = c[0]; cy[i] = c[1]; cz[i] = c[2];
        for (int a = 0; a < 3; ++a) {
            lo[a] = std::min(lo[a], c[a]);
            hi[a] = std::max(hi[a], c[a]);
        }
    }
    double ext[3];
    for (int a = 0; a < 3; ++a) ext[a] = std::max(hi[a] - lo[a], 1e-30);

    std::vector<uint64_t> code(P);
    const double scale = (double)(1ull << 21);
    for (int64_t i = 0; i < P; ++i) {
        const double c[3] = {cx[i], cy[i], cz[i]};
        uint64_t g[3];
        for (int a = 0; a < 3; ++a) {
            double q = (c[a] - lo[a]) / ext[a];
            q = std::min(std::max(q, 0.0), 1.0);
            uint64_t gi = (uint64_t)(q * scale);
            g[a] = std::min(gi, (uint64_t)((1ull << 21) - 1));
        }
        code[i] = (expand_bits_21(g[0]) << 2) | (expand_bits_21(g[1]) << 1)
                  | expand_bits_21(g[2]);
    }

    std::vector<int64_t> order(P);
    for (int64_t i = 0; i < P; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int64_t a, int64_t b) { return code[a] < code[b]; });

    // --- implicit tree over the sorted order, preorder emission --------
    for (int64_t i = 0; i < N; ++i) prim[i] = -1;
    int32_t max_depth = 0;

    std::vector<Range> stack;
    stack.reserve(64);
    stack.push_back({0, P - 1, 0, 1});
    while (!stack.empty()) {
        const Range r = stack.back();
        stack.pop_back();
        max_depth = std::max(max_depth, r.depth);
        const int64_t subtree = 2 * (r.l - r.f + 1) - 1;
        skip[r.pre] = (int32_t)(r.pre + subtree);
        if (r.f == r.l) {
            const int64_t p = order[r.f];
            prim[r.pre] = (int32_t)p;
            std::memcpy(node_min + 3 * r.pre, prim_min + 3 * p,
                        3 * sizeof(float));
            std::memcpy(node_max + 3 * r.pre, prim_max + 3 * p,
                        3 * sizeof(float));
            continue;
        }
        const int64_t n = r.l - r.f + 1;
        const int64_t s = r.f + (n + 1) / 2 - 1;  // left gets ceil(n/2)
        const int64_t left_pre = r.pre + 1;
        const int64_t right_pre = r.pre + 2 * (s - r.f + 1);
        // push right first so left is processed first (preorder)
        stack.push_back({s + 1, r.l, right_pre, r.depth + 1});
        stack.push_back({r.f, s, left_pre, r.depth + 1});
    }

    // --- internal boxes bottom-up: preorder guarantees children have
    // HIGHER preorder indices, so a reverse sweep sees children first.
    for (int64_t i = N - 1; i >= 0; --i) {
        if (prim[i] >= 0) continue;
        const int64_t lch = i + 1;
        const int64_t rch = skip[lch];
        for (int a = 0; a < 3; ++a) {
            node_min[3 * i + a] =
                std::min(node_min[3 * lch + a], node_min[3 * rch + a]);
            node_max[3 * i + a] =
                std::max(node_max[3 * lch + a], node_max[3 * rch + a]);
        }
    }

    *out_depth = max_depth;
    return 0;
}
