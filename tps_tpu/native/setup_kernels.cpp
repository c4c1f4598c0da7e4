// Native setup kernels for the tps_tpu framework.
//
// The jax/XLA side owns all device compute; this library owns the
// setup-time mesh machinery that the reference implements natively inside
// MFEM/C++ (face-table construction, quadrature-point matching, point
// location) so that large-mesh preprocessing does not bottleneck in Python
// loops.  Exposed with a plain C ABI and loaded via ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC setup_kernels.cpp -o libtps_setup.so

#include <cmath>
#include <cstdint>
#include <algorithm>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Face topology: group (element, local face) records by canonical vertex key.
//
// keys:   [n_records, nvpf]  sorted vertex ids per record (int64)
// rec_e:  [n_records]        element of each record
// rec_lf: [n_records]        local face of each record
// outputs (pre-allocated by caller, n_records capacity):
//   int_l, int_lfl, int_r, int_lfr : interior pairs  (returns n_interior)
//   bdr_e, bdr_lf                  : unmatched faces (n_boundary written
//                                    to n_bdr_out)
// ---------------------------------------------------------------------------
int64_t build_face_topology(const int64_t* keys, const int32_t* rec_e,
                            const int32_t* rec_lf, int64_t n_records,
                            int32_t nvpf, int32_t* int_l, int32_t* int_lfl,
                            int32_t* int_r, int32_t* int_lfr, int32_t* bdr_e,
                            int32_t* bdr_lf, int64_t* n_bdr_out) {
  struct KeyHash {
    size_t operator()(const std::vector<int64_t>& v) const {
      size_t h = 1469598103934665603ull;
      for (int64_t x : v) {
        h ^= static_cast<size_t>(x);
        h *= 1099511628211ull;
      }
      return h;
    }
  };
  std::unordered_map<std::vector<int64_t>, int64_t, KeyHash> first;
  first.reserve(static_cast<size_t>(n_records) * 2);

  int64_t n_int = 0, n_bdr = 0;
  std::vector<int64_t> key(nvpf);
  std::vector<int8_t> matched(n_records, 0);
  for (int64_t r = 0; r < n_records; ++r) {
    for (int32_t k = 0; k < nvpf; ++k) key[k] = keys[r * nvpf + k];
    auto it = first.find(key);
    if (it == first.end()) {
      first.emplace(key, r);
    } else {
      int64_t r0 = it->second;
      int_l[n_int] = rec_e[r0];
      int_lfl[n_int] = rec_lf[r0];
      int_r[n_int] = rec_e[r];
      int_lfr[n_int] = rec_lf[r];
      matched[r0] = matched[r] = 1;
      ++n_int;
      first.erase(it);
    }
  }
  for (int64_t r = 0; r < n_records; ++r) {
    if (!matched[r]) {
      bdr_e[n_bdr] = rec_e[r];
      bdr_lf[n_bdr] = rec_lf[r];
      ++n_bdr;
    }
  }
  *n_bdr_out = n_bdr;
  return n_int;
}

// ---------------------------------------------------------------------------
// Quadrature-point matching: for each face, find the permutation aligning
// R-side points to L-side points (xl may include a periodic shift).
// xl, xr: [nf, nqf, dim]; qperm out: [nf, nqf]; returns max matched distance.
// ---------------------------------------------------------------------------
double match_face_points(const double* xl, const double* xr, int64_t nf,
                         int32_t nqf, int32_t dim, int32_t* qperm) {
  double max_d = 0.0;
  for (int64_t f = 0; f < nf; ++f) {
    const double* L = xl + f * nqf * dim;
    const double* R = xr + f * nqf * dim;
    for (int32_t i = 0; i < nqf; ++i) {
      double best = 1e300;
      int32_t bj = 0;
      for (int32_t j = 0; j < nqf; ++j) {
        double d = 0.0;
        for (int32_t k = 0; k < dim; ++k) {
          double t = L[i * dim + k] - R[j * dim + k];
          d += t * t;
        }
        if (d < best) {
          best = d;
          bj = j;
        }
      }
      qperm[f * nqf + i] = bj;
      max_d = std::max(max_d, std::sqrt(best));
    }
  }
  return max_d;
}

// ---------------------------------------------------------------------------
// ef scatter-back tables (see dg/discretization.py build_ef_tables).
// Returns number of unassigned slots (caller decides whether that is ok).
// ---------------------------------------------------------------------------
int64_t build_ef_tables(int64_t ne, int32_t nlf, int32_t nqf, int64_t nfi,
                        int64_t nft, const int32_t* f_elem_l,
                        const int32_t* f_slot_l, const int32_t* f_elem_r,
                        const int32_t* f_slot_r, const int32_t* f_qperm_r,
                        int32_t* ef_face, int32_t* ef_qmap, double* ef_sign) {
  std::fill(ef_face, ef_face + ne * nlf, -1);
  std::fill(ef_sign, ef_sign + ne * nlf, 0.0);
  for (int64_t s = 0; s < ne * nlf * nqf; ++s) ef_qmap[s] = s % nqf;

  for (int64_t f = 0; f < nft; ++f) {
    int32_t e = f_elem_l[f], lf = f_slot_l[f];
    if (e < 0) continue;
    ef_face[e * nlf + lf] = static_cast<int32_t>(f);
    for (int32_t q = 0; q < nqf; ++q) ef_qmap[(e * nlf + lf) * nqf + q] = q;
    ef_sign[e * nlf + lf] = 1.0;
  }
  std::vector<int32_t> inv(nqf);
  for (int64_t f = 0; f < nfi; ++f) {
    int32_t e = f_elem_r[f], lf = f_slot_r[f];
    if (e < 0) continue;
    ef_face[e * nlf + lf] = static_cast<int32_t>(f);
    for (int32_t q = 0; q < nqf; ++q) inv[f_qperm_r[f * nqf + q]] = q;
    for (int32_t q = 0; q < nqf; ++q) ef_qmap[(e * nlf + lf) * nqf + q] = inv[q];
    ef_sign[e * nlf + lf] = -1.0;
  }
  int64_t unassigned = 0;
  for (int64_t s = 0; s < ne * nlf; ++s) {
    if (ef_face[s] < 0) {
      ef_face[s] = static_cast<int32_t>(nft);
      ++unassigned;
    }
  }
  return unassigned;
}

// ---------------------------------------------------------------------------
// Point location with Newton inversion of the bi/tri-linear map
// (the gslib FindPoints analog used by cross-mesh interpolation).
// verts: [ne, nverts, dim]; points: [np, dim]
// out: elem_ids [np], ref_coords [np, dim], found [np]
// ---------------------------------------------------------------------------
static void geom_shape(int dim, const double* xi, double* N, double* dN) {
  if (dim == 2) {
    double x = xi[0], y = xi[1];
    N[0] = (1 - x) * (1 - y); N[1] = x * (1 - y);
    N[2] = x * y;             N[3] = (1 - x) * y;
    // dN[v*dim + k]
    dN[0] = -(1 - y); dN[1] = -(1 - x);
    dN[2] = (1 - y);  dN[3] = -x;
    dN[4] = y;        dN[5] = x;
    dN[6] = -y;       dN[7] = (1 - x);
  } else {
    double x = xi[0], y = xi[1], z = xi[2];
    double xm = 1 - x, ym = 1 - y, zm = 1 - z;
    N[0] = xm * ym * zm; N[1] = x * ym * zm; N[2] = x * y * zm; N[3] = xm * y * zm;
    N[4] = xm * ym * z;  N[5] = x * ym * z;  N[6] = x * y * z;  N[7] = xm * y * z;
    const double d[8][3] = {
        {-ym * zm, -xm * zm, -xm * ym}, {ym * zm, -x * zm, -x * ym},
        {y * zm, x * zm, -x * y},       {-y * zm, xm * zm, -xm * y},
        {-ym * z, -xm * z, xm * ym},    {ym * z, -x * z, x * ym},
        {y * z, x * z, x * y},          {-y * z, xm * z, xm * y}};
    for (int v = 0; v < 8; ++v)
      for (int k = 0; k < 3; ++k) dN[v * 3 + k] = d[v][k];
  }
}

static bool solve_small(int n, double* A, double* b) {
  // Gaussian elimination with partial pivoting, n<=3
  for (int c = 0; c < n; ++c) {
    int p = c;
    for (int r = c + 1; r < n; ++r)
      if (std::fabs(A[r * n + c]) > std::fabs(A[p * n + c])) p = r;
    if (std::fabs(A[p * n + c]) < 1e-300) return false;
    if (p != c) {
      for (int k = 0; k < n; ++k) std::swap(A[c * n + k], A[p * n + k]);
      std::swap(b[c], b[p]);
    }
    for (int r = c + 1; r < n; ++r) {
      double m = A[r * n + c] / A[c * n + c];
      for (int k = c; k < n; ++k) A[r * n + k] -= m * A[c * n + k];
      b[r] -= m * b[c];
    }
  }
  for (int r = n - 1; r >= 0; --r) {
    for (int k = r + 1; k < n; ++k) b[r] -= A[r * n + k] * b[k];
    b[r] /= A[r * n + r];
  }
  return true;
}

int64_t locate_points(const double* verts, int64_t ne, int32_t nverts,
                      int32_t dim, const double* points, int64_t np,
                      double tol, int32_t* elem_ids, double* ref_coords,
                      uint8_t* found) {
  // element bounding boxes
  std::vector<double> lo(ne * dim), hi(ne * dim);
  for (int64_t e = 0; e < ne; ++e) {
    for (int32_t k = 0; k < dim; ++k) {
      double mn = 1e300, mx = -1e300;
      for (int32_t v = 0; v < nverts; ++v) {
        double x = verts[(e * nverts + v) * dim + k];
        mn = std::min(mn, x);
        mx = std::max(mx, x);
      }
      lo[e * dim + k] = mn - tol;
      hi[e * dim + k] = mx + tol;
    }
  }

  int64_t n_found = 0;
  double N[8], dN[24], J[9], r[3], xi[3];
  for (int64_t p = 0; p < np; ++p) {
    found[p] = 0;
    elem_ids[p] = 0;
    const double* x = points + p * dim;
    for (int64_t e = 0; e < ne && !found[p]; ++e) {
      bool in_box = true;
      for (int32_t k = 0; k < dim; ++k)
        if (x[k] < lo[e * dim + k] || x[k] > hi[e * dim + k]) {
          in_box = false;
          break;
        }
      if (!in_box) continue;
      for (int32_t k = 0; k < dim; ++k) xi[k] = 0.5;
      double res = 1e300;
      for (int it = 0; it < 30; ++it) {
        geom_shape(dim, xi, N, dN);
        res = 0.0;
        for (int32_t k = 0; k < dim; ++k) {
          r[k] = -x[k];
          for (int32_t v = 0; v < nverts; ++v)
            r[k] += N[v] * verts[(e * nverts + v) * dim + k];
          res = std::max(res, std::fabs(r[k]));
        }
        if (res < 1e-12) break;
        for (int32_t i = 0; i < dim; ++i)
          for (int32_t j = 0; j < dim; ++j) {
            double s = 0.0;
            for (int32_t v = 0; v < nverts; ++v)
              s += verts[(e * nverts + v) * dim + i] * dN[v * dim + j];
            J[i * dim + j] = s;
          }
        if (!solve_small(dim, J, r)) break;
        for (int32_t k = 0; k < dim; ++k) xi[k] -= r[k];
      }
      bool inside = res < tol;
      for (int32_t k = 0; k < dim; ++k)
        inside = inside && (xi[k] > -1e-9) && (xi[k] < 1.0 + 1e-9);
      if (inside) {
        elem_ids[p] = static_cast<int32_t>(e);
        for (int32_t k = 0; k < dim; ++k)
          ref_coords[p * dim + k] = std::min(1.0, std::max(0.0, xi[k]));
        found[p] = 1;
        ++n_found;
      }
    }
  }
  return n_found;
}

}  // extern "C"
