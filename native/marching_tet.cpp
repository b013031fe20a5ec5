// Marching-tetrahedra isosurface core (C, ctypes ABI).
//
// Native counterpart of gaussmart_tpu/mesh/marching.py::marching_tetrahedra
// (same Kuhn 6-tet cube split, same case templates, same edge
// interpolation) for the offline mesh-extraction path, where the reference
// leans on skimage's C marching cubes. ~20-50x the numpy implementation.
//
// Exported ABI:
//   int64 mt_count(const float* vol, int64 X, int64 Y, int64 Z, float level)
//       -> number of triangles the extraction will emit (for allocation)
//   int64 mt_extract(const float* vol, int64 X, int64 Y, int64 Z,
//                    float level, const double* spacing, const double* origin,
//                    double* out_verts /* [3*maxT, 3] */, int64 maxT)
//       -> number of triangles written (3 consecutive vertices each)
//
// NaN corners mark unobserved voxels: a TET touching NaN emits nothing, but
// the cube's other tets still do (parity with the numpy oracle, which drops
// non-finite triangles per tet — a cube-level skip would cut holes along
// every observed/unobserved boundary).
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

// Kuhn split: corner c = (x=c&1, y=(c>>1)&1, z=(c>>2)&1)
const int TETS[6][4] = {
    {0, 1, 3, 7}, {0, 1, 5, 7}, {0, 2, 3, 7},
    {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 4, 6, 7},
};

struct V3 { double x, y, z; };

inline V3 interp(const V3& a, const V3& b, double fa, double fb,
                 double level) {
    double denom = fb - fa;
    if (std::fabs(denom) < 1e-30) denom = 1e-30;
    double t = (level - fa) / denom;
    if (t < 0.0) t = 0.0;
    if (t > 1.0) t = 1.0;
    return {a.x + t * (b.x - a.x), a.y + t * (b.y - a.y),
            a.z + t * (b.z - a.z)};
}

inline int corner_dx(int c) { return c & 1; }
inline int corner_dy(int c) { return (c >> 1) & 1; }
inline int corner_dz(int c) { return (c >> 2) & 1; }

template <typename EmitFn>
void process(const float* vol, int64_t X, int64_t Y, int64_t Z, float level,
             const double* spacing, const double* origin, EmitFn&& emit) {
    const int64_t sy = Z;          // stride for y in flattened [X,Y,Z]
    const int64_t sx = Y * Z;
    for (int64_t x = 0; x + 1 < X; ++x) {
        for (int64_t y = 0; y + 1 < Y; ++y) {
            const float* base = vol + x * sx + y * sy;
            for (int64_t z = 0; z + 1 < Z; ++z) {
                float f[8];
                bool nan_c[8];
                bool all_nan = true, any_in = false, any_out = false;
                for (int c = 0; c < 8; ++c) {
                    f[c] = base[corner_dx(c) * sx + corner_dy(c) * sy + z
                                + corner_dz(c)];
                    nan_c[c] = std::isnan(f[c]);
                    if (nan_c[c]) continue;
                    all_nan = false;
                    if (f[c] < level) any_in = true;
                    else any_out = true;
                }
                // crossings only exist where both sides appear among the
                // FINITE corners; NaN exclusion happens per tet below
                if (all_nan || !any_in || !any_out) continue;
                for (int t = 0; t < 6; ++t) {
                    int code = 0;
                    bool bad = false;
                    double fv[4];
                    V3 pv[4];
                    for (int k = 0; k < 4; ++k) {
                        int c = TETS[t][k];
                        if (nan_c[c]) bad = true;
                        fv[k] = f[c];
                        if (fv[k] < level) code |= (1 << k);
                        pv[k] = {origin[0] + (x + corner_dx(c)) * spacing[0],
                                 origin[1] + (y + corner_dy(c)) * spacing[1],
                                 origin[2] + (z + corner_dz(c)) * spacing[2]};
                    }
                    if (bad || code == 0 || code == 15) continue;
                    int ins[4], outs[4], ni = 0, no = 0;
                    for (int k = 0; k < 4; ++k) {
                        if ((code >> k) & 1) ins[ni++] = k;
                        else outs[no++] = k;
                    }
                    if (ni == 1) {
                        int a = ins[0];
                        V3 e0 = interp(pv[a], pv[outs[0]], fv[a], fv[outs[0]], level);
                        V3 e1 = interp(pv[a], pv[outs[1]], fv[a], fv[outs[1]], level);
                        V3 e2 = interp(pv[a], pv[outs[2]], fv[a], fv[outs[2]], level);
                        emit(e0, e1, e2);
                    } else if (ni == 3) {
                        int a = outs[0];
                        V3 e0 = interp(pv[ins[0]], pv[a], fv[ins[0]], fv[a], level);
                        V3 e1 = interp(pv[ins[1]], pv[a], fv[ins[1]], fv[a], level);
                        V3 e2 = interp(pv[ins[2]], pv[a], fv[ins[2]], fv[a], level);
                        emit(e0, e1, e2);
                    } else {  // ni == 2: quad -> two triangles
                        int a = ins[0], b = ins[1], c0 = outs[0], d0 = outs[1];
                        V3 eac = interp(pv[a], pv[c0], fv[a], fv[c0], level);
                        V3 ead = interp(pv[a], pv[d0], fv[a], fv[d0], level);
                        V3 ebc = interp(pv[b], pv[c0], fv[b], fv[c0], level);
                        V3 ebd = interp(pv[b], pv[d0], fv[b], fv[d0], level);
                        emit(eac, ead, ebd);
                        emit(eac, ebd, ebc);
                    }
                }
            }
        }
    }
}

}  // namespace

extern "C" {

int64_t mt_count(const float* vol, int64_t X, int64_t Y, int64_t Z,
                 float level) {
    static const double unit[3] = {1, 1, 1};
    static const double zero[3] = {0, 0, 0};
    int64_t n = 0;
    process(vol, X, Y, Z, level, unit, zero,
            [&](const V3&, const V3&, const V3&) { ++n; });
    return n;
}

int64_t mt_extract(const float* vol, int64_t X, int64_t Y, int64_t Z,
                   float level, const double* spacing, const double* origin,
                   double* out_verts, int64_t maxT) {
    int64_t n = 0;
    process(vol, X, Y, Z, level, spacing, origin,
            [&](const V3& a, const V3& b, const V3& c) {
                if (n >= maxT) return;
                double* o = out_verts + n * 9;
                o[0] = a.x; o[1] = a.y; o[2] = a.z;
                o[3] = b.x; o[4] = b.y; o[5] = b.z;
                o[6] = c.x; o[7] = c.y; o[8] = c.z;
                ++n;
            });
    return n;
}

}  // extern "C"
