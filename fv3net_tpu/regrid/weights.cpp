// Conservative cubed-sphere -> lat-lon regridding weight generation.
//
// Native replacement for the fregrid binary the reference shells out to
// (workflows/post_process_run/fv3post/fregrid.py:15-55).  Each source
// cell is supersampled on an s x s gnomonic sub-lattice; every sample
// deposits area/s^2 into the destination lat-lon cell containing it.
// The resulting triplets form a sparse row-normalized-by-destination
// matrix applied on-device by the Python wrapper (JAX segment_sum).
//
// Exported C API (ctypes):
//   regrid_weights(corners_xyz, n_src, nlat, nlon, supersample,
//                  src_area, out_src_idx, out_dst_idx, out_w, max_out)
//     corners_xyz: [n_src, 4, 3] unit-sphere cell corners (SW,SE,NW,NE)
//     returns the number of triplets written, or -1 on overflow.

#include <cmath>
#include <cstdint>

extern "C" {

static inline void normalize(double v[3]) {
    double n = std::sqrt(v[0] * v[0] + v[1] * v[1] + v[2] * v[2]);
    v[0] /= n; v[1] /= n; v[2] /= n;
}

long long regrid_weights(
    const double* corners_xyz,  // [n_src, 4, 3]
    long long n_src,
    int nlat,
    int nlon,
    int s,
    const double* src_area,     // [n_src]
    long long* out_src_idx,
    long long* out_dst_idx,
    double* out_w,
    long long max_out
) {
    const double PI = 3.14159265358979323846;
    long long count = 0;
    const double wsub = 1.0 / (double)(s * s);
    for (long long c = 0; c < n_src; ++c) {
        const double* q = corners_xyz + c * 12;
        // corners: SW(0), SE(1), NW(2), NE(3)
        for (int j = 0; j < s; ++j) {
            double b = (j + 0.5) / s;
            for (int i = 0; i < s; ++i) {
                double a = (i + 0.5) / s;
                double p[3];
                for (int d = 0; d < 3; ++d) {
                    double bot = q[0 * 3 + d] * (1 - a) + q[1 * 3 + d] * a;
                    double top = q[2 * 3 + d] * (1 - a) + q[3 * 3 + d] * a;
                    p[d] = bot * (1 - b) + top * b;
                }
                normalize(p);
                double lon = std::atan2(p[1], p[0]);
                if (lon < 0) lon += 2 * PI;
                double lat = std::asin(p[2] < -1 ? -1 :
                                       (p[2] > 1 ? 1 : p[2]));
                int ilon = (int)(lon / (2 * PI) * nlon);
                if (ilon >= nlon) ilon = nlon - 1;
                int ilat = (int)((lat + PI / 2) / PI * nlat);
                if (ilat >= nlat) ilat = nlat - 1;
                if (count >= max_out) return -1;
                out_src_idx[count] = c;
                out_dst_idx[count] = (long long)ilat * nlon + ilon;
                out_w[count] = src_area[c] * wsub;
                ++count;
            }
        }
    }
    return count;
}

}  // extern "C"
