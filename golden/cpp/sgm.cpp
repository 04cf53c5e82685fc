// C++ golden SGM core — the native-tier parity oracle.
//
// Mirrors golden/sgm.py (the NumPy oracle) bit-for-bit: census transform,
// Hamming cost volume, one-direction path aggregation with optional
// adaptive P2, WTA.  This plays the role the reference's C++/MEX core
// plays in its repo (SURVEY.md §2.1 "SGM path aggregation", the only
// native component there), here as an independently-implemented second
// oracle: two implementations in different languages agreeing bit-exactly
// is a far stronger correctness statement than one.
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment).
// OpenMP parallelism over scanlines mirrors the reference's likely
// OpenMP loop parallelism [SURVEY.md §2.2].

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int64_t INF = int64_t(1) << 40;

inline int64_t popcount64(uint64_t x) {
#if defined(__GNUC__) || defined(__clang__)
    return __builtin_popcountll(x);
#else
    int64_t c = 0;
    while (x) { x &= x - 1; ++c; }
    return c;
#endif
}

}  // namespace

extern "C" {

// Census transform: (H, W) uint8 -> (H, W) uint64 descriptors.
// Window (ch, cw), bit order = row-major window scan skipping center,
// bit set where neighbor < center; edge-replicated padding.
void census_u64(const uint8_t* img, int h, int w, int ch, int cw,
                uint64_t* out) {
    const int ry = ch / 2, rx = cw / 2;
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const int center = img[y * w + x];
            uint64_t desc = 0;
            int bit = 0;
            for (int dy = -ry; dy <= ry; ++dy) {
                for (int dx = -rx; dx <= rx; ++dx) {
                    if (dy == 0 && dx == 0) continue;
                    int yy = std::min(std::max(y + dy, 0), h - 1);
                    int xx = std::min(std::max(x + dx, 0), w - 1);
                    if (img[yy * w + xx] < center)
                        desc |= uint64_t(1) << bit;
                    ++bit;
                }
            }
            out[y * w + x] = desc;
        }
    }
}

// Stereo cost volume: C[y, x, d] = popcount(cenL[y,x] ^ cenR[y,x-d]),
// x - d < 0 -> invalid_cost.  Output int64 (H, W, D).
void cost_volume_stereo(const uint64_t* cen_l, const uint64_t* cen_r,
                        int h, int w, int d_max, int64_t invalid_cost,
                        int64_t* out) {
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            int64_t* row = out + (int64_t(y) * w + x) * d_max;
            const uint64_t cl = cen_l[y * w + x];
            for (int d = 0; d < d_max; ++d) {
                row[d] = (x - d >= 0)
                    ? popcount64(cl ^ cen_r[y * w + x - d])
                    : invalid_cost;
            }
        }
    }
}

namespace {

// Effective P2 per golden/sgm.py::_p2_effective.
inline int64_t p2_eff(int img_cur, int img_prev, int64_t p1, int64_t p2,
                      bool adaptive) {
    if (!adaptive) return p2;
    int64_t diff = std::max<int64_t>(std::abs(img_cur - img_prev), 1);
    return std::max<int64_t>(p1 + 1, p2 / diff);
}

// One DP step along a path: L(d) = C(d) + min(prev(d), prev(d±1)+P1,
// m+P2') − m, vectorized over d.
inline void dp_step(const int64_t* prev, const int64_t* cost, int nd,
                    int64_t p1, int64_t p2e, int64_t* out) {
    int64_t m = INF;
    for (int d = 0; d < nd; ++d) m = std::min(m, prev[d]);
    for (int d = 0; d < nd; ++d) {
        int64_t best = prev[d];
        if (d > 0) best = std::min(best, prev[d - 1] + p1);
        if (d < nd - 1) best = std::min(best, prev[d + 1] + p1);
        best = std::min(best, m + p2e);
        out[d] = cost[d] + best - m;
    }
}

}  // namespace

// One-direction aggregation, exact mirror of golden aggregate_one_path.
// cost: (H, W, D) int64; img: (H, W) uint8; out: (H, W, D) int64.
// Supports |dy|,|dx| <= 2.
void aggregate_one_path(const int64_t* cost, const uint8_t* img,
                        int h, int w, int nd, int dy, int dx,
                        int64_t p1, int64_t p2, int adaptive,
                        int64_t* out) {
    auto C = [&](int y, int x) { return cost + (int64_t(y) * w + x) * nd; };
    auto L = [&](int y, int x) { return out + (int64_t(y) * w + x) * nd; };

    if (dy == 0) {
        // horizontal: each row is an independent scanline (parallel).
        const int step = std::abs(dx);
#pragma omp parallel for schedule(static)
        for (int y = 0; y < h; ++y) {
            if (dx > 0) {
                for (int x = 0; x < w; ++x) {
                    if (x < step) { std::memcpy(L(y, x), C(y, x), nd * 8); continue; }
                    int64_t e = p2_eff(img[y * w + x], img[y * w + x - dx],
                                       p1, p2, adaptive);
                    dp_step(L(y, x - dx), C(y, x), nd, p1, e, L(y, x));
                }
            } else {
                for (int x = w - 1; x >= 0; --x) {
                    if (w - 1 - x < step) { std::memcpy(L(y, x), C(y, x), nd * 8); continue; }
                    int64_t e = p2_eff(img[y * w + x], img[y * w + x - dx],
                                       p1, p2, adaptive);
                    dp_step(L(y, x - dx), C(y, x), nd, p1, e, L(y, x));
                }
            }
        }
        return;
    }

    // dy != 0: rows sequential, columns parallel.
    const int ady = std::abs(dy);
    std::vector<int64_t> inf_row(nd, INF);
    const int y0 = dy > 0 ? 0 : h - 1;
    const int ystep = dy > 0 ? 1 : -1;
    for (int i = 0; i < h; ++i) {
        const int y = y0 + i * ystep;
        if (i < ady) {
            std::memcpy(L(y, 0), C(y, 0), int64_t(w) * nd * 8);
            continue;
        }
        const int yp = y - dy;
#pragma omp parallel for schedule(static)
        for (int x = 0; x < w; ++x) {
            const int xp = x - dx;
            if (xp < 0 || xp >= w) {
                std::memcpy(L(y, x), C(y, x), nd * 8);
                continue;
            }
            int64_t e = p2_eff(img[y * w + x], img[yp * w + xp],
                               p1, p2, adaptive);
            dp_step(L(yp, xp), C(y, x), nd, p1, e, L(y, x));
        }
    }
}

// Sum of per-direction aggregations.  dirs: flat (n_dirs, 2) int32.
void aggregate_paths(const int64_t* cost, const uint8_t* img,
                     int h, int w, int nd,
                     const int32_t* dirs, int n_dirs,
                     int64_t p1, int64_t p2, int adaptive,
                     int64_t* s_out) {
    const int64_t n = int64_t(h) * w * nd;
    std::memset(s_out, 0, n * 8);
    std::vector<int64_t> l(n);
    for (int k = 0; k < n_dirs; ++k) {
        aggregate_one_path(cost, img, h, w, nd, dirs[2 * k], dirs[2 * k + 1],
                           p1, p2, adaptive, l.data());
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) s_out[i] += l[i];
    }
}

// WTA: argmin over d (ties -> smallest d).
void wta(const int64_t* s, int h, int w, int nd, int32_t* out) {
#pragma omp parallel for schedule(static)
    for (int64_t p = 0; p < int64_t(h) * w; ++p) {
        const int64_t* row = s + p * nd;
        int best = 0;
        for (int d = 1; d < nd; ++d)
            if (row[d] < row[best]) best = d;
        out[p] = best;
    }
}


// ---------------------------------------------------------------------------
// fSGM flow primitives: warp-then-shift cost volume and 2D-label aggregation
// ---------------------------------------------------------------------------

// Warp-then-shift flow cost volume; mirrors golden/flow.py (post
// warp-reformulation).  labels l = (dv+r)*(2r+1) + (du+r).
void cost_volume_flow(const uint64_t* cen1, const uint64_t* cen2,
                      const int32_t* base_u, const int32_t* base_v,
                      int h, int w, int radius, int64_t invalid_cost,
                      int64_t* out) {
    const int ext = 2 * radius + 1;
    const int nl = ext * ext;
    std::vector<uint64_t> cen2w(int64_t(h) * w);
    std::vector<uint8_t> okw(int64_t(h) * w);
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            const int sy = y + base_v[y * w + x];
            const int sx = x + base_u[y * w + x];
            const bool ok = sy >= 0 && sy < h && sx >= 0 && sx < w;
            okw[y * w + x] = ok;
            cen2w[y * w + x] = ok ? cen2[sy * w + sx] : 0;
        }
    }
#pragma omp parallel for schedule(static)
    for (int y = 0; y < h; ++y) {
        for (int x = 0; x < w; ++x) {
            int64_t* px = out + (int64_t(y) * w + x) * nl;
            for (int dv = -radius; dv <= radius; ++dv) {
                for (int du = -radius; du <= radius; ++du) {
                    const int l = (dv + radius) * ext + (du + radius);
                    const int ty = y + dv, tx = x + du;
                    if (ty < 0 || ty >= h || tx < 0 || tx >= w ||
                        !okw[ty * w + tx]) {
                        px[l] = invalid_cost;
                    } else {
                        px[l] = popcount64(cen1[y * w + x]
                                           ^ cen2w[ty * w + tx]);
                    }
                }
            }
        }
    }
}

namespace {

// DP step over the flattened 2D label grid: P1 for 4-neighbor labels.
inline void dp_step_2d(const int64_t* prev, const int64_t* cost, int ext,
                       int64_t p1, int64_t p2e, int64_t* out) {
    const int nl = ext * ext;
    int64_t m = INF;
    for (int l = 0; l < nl; ++l) m = std::min(m, prev[l]);
    for (int v = 0; v < ext; ++v) {
        for (int u = 0; u < ext; ++u) {
            const int l = v * ext + u;
            int64_t best = prev[l];
            if (u > 0) best = std::min(best, prev[l - 1] + p1);
            if (u < ext - 1) best = std::min(best, prev[l + 1] + p1);
            if (v > 0) best = std::min(best, prev[l - ext] + p1);
            if (v < ext - 1) best = std::min(best, prev[l + ext] + p1);
            best = std::min(best, m + p2e);
            out[l] = cost[l] + best - m;
        }
    }
}

}  // namespace

// One-direction aggregation over the 2D label space (mirror of
// aggregate_one_path with the 4-neighbor label min).
void aggregate_one_path_2d(const int64_t* cost, const uint8_t* img,
                           int h, int w, int radius, int dy, int dx,
                           int64_t p1, int64_t p2, int adaptive,
                           int64_t* out) {
    const int ext = 2 * radius + 1;
    const int nl = ext * ext;
    auto C = [&](int y, int x) { return cost + (int64_t(y) * w + x) * nl; };
    auto L = [&](int y, int x) { return out + (int64_t(y) * w + x) * nl; };
    if (dy == 0) {
        const int step = std::abs(dx);
#pragma omp parallel for schedule(static)
        for (int y = 0; y < h; ++y) {
            const int x0 = dx > 0 ? 0 : w - 1;
            const int xs = dx > 0 ? 1 : -1;
            for (int i = 0; i < w; ++i) {
                const int x = x0 + i * xs;
                if (i < step) { std::memcpy(L(y, x), C(y, x), nl * 8); continue; }
                int64_t e = p2_eff(img[y * w + x], img[y * w + x - dx],
                                   p1, p2, adaptive);
                dp_step_2d(L(y, x - dx), C(y, x), ext, p1, e, L(y, x));
            }
        }
        return;
    }
    const int ady = std::abs(dy);
    const int y0 = dy > 0 ? 0 : h - 1;
    const int ystep = dy > 0 ? 1 : -1;
    for (int i = 0; i < h; ++i) {
        const int y = y0 + i * ystep;
        if (i < ady) { std::memcpy(L(y, 0), C(y, 0), int64_t(w) * nl * 8); continue; }
        const int yp = y - dy;
#pragma omp parallel for schedule(static)
        for (int x = 0; x < w; ++x) {
            const int xp = x - dx;
            if (xp < 0 || xp >= w) { std::memcpy(L(y, x), C(y, x), nl * 8); continue; }
            int64_t e = p2_eff(img[y * w + x], img[yp * w + xp],
                               p1, p2, adaptive);
            dp_step_2d(L(yp, xp), C(y, x), ext, p1, e, L(y, x));
        }
    }
}

void aggregate_paths_2d(const int64_t* cost, const uint8_t* img,
                        int h, int w, int radius,
                        const int32_t* dirs, int n_dirs,
                        int64_t p1, int64_t p2, int adaptive,
                        int64_t* s_out) {
    const int nl = (2 * radius + 1) * (2 * radius + 1);
    const int64_t n = int64_t(h) * w * nl;
    std::memset(s_out, 0, n * 8);
    std::vector<int64_t> l(n);
    for (int k = 0; k < n_dirs; ++k) {
        aggregate_one_path_2d(cost, img, h, w, radius, dirs[2 * k],
                              dirs[2 * k + 1], p1, p2, adaptive, l.data());
#pragma omp parallel for schedule(static)
        for (int64_t i = 0; i < n; ++i) s_out[i] += l[i];
    }
}

}  // extern "C"
