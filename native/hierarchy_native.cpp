// Native hierarchy builder: Morton-ordered balanced binary tree with
// moment-matched interior Gaussians.
//
// C++ counterpart of h3dgs_tpu/hierarchy/tree.py (same algorithm, same
// node layout) — the role the reference fills with its native
// GaussianHierarchyCreator executable (/root/reference/scripts/
// full_train.py:138). The Python implementation stays as the portable
// fallback; this one handles multi-million-Gaussian chunks in seconds.
//
// Exposed as a C ABI for ctypes (no pybind dependency). All arrays are
// float32/int32, row-major, caller-allocated:
//   n            input Gaussian count
//   xyz[n,3] shs[n,48] alpha[n] scaling[n,3](log) rotation[n,4](wxyz)
//   locked[n]    uint8 anchor seeds (may be null)
// outputs sized m = 2n-1 rows:
//   o_xyz[m,3] o_shs[m,48] o_alpha[m] o_scaling[m,3] o_rotation[m,4]
//   o_nodes[m,4] (parent, first_child, n_children, depth)
//   o_boxes[m,6] (min xyz, max xyz) o_anchor[m] uint8
// Returns m, or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int PARENT = 0, FIRST_CHILD = 1, N_CHILDREN = 2, DEPTH = 3;
constexpr int SH = 48;  // 16 coeffs x 3 channels

inline uint64_t expand_bits(uint64_t v) {
  v &= 0x1fffff;
  v = (v | (v << 32)) & 0x1f00000000ffffULL;
  v = (v | (v << 16)) & 0x1f0000ff0000ffULL;
  v = (v | (v << 8)) & 0x100f00f00f00f00fULL;
  v = (v | (v << 4)) & 0x10c30c30c30c30c3ULL;
  v = (v | (v << 2)) & 0x1249249249249249ULL;
  return v;
}

struct Vec3 {
  double x, y, z;
};

struct Mat3 {
  double m[3][3];
};

inline Mat3 quat_to_rotmat(const float* q4) {
  double n = std::sqrt((double)q4[0] * q4[0] + (double)q4[1] * q4[1] +
                       (double)q4[2] * q4[2] + (double)q4[3] * q4[3]);
  if (n < 1e-12) n = 1.0;
  double w = q4[0] / n, x = q4[1] / n, y = q4[2] / n, z = q4[3] / n;
  Mat3 R;
  R.m[0][0] = 1 - 2 * (y * y + z * z);
  R.m[0][1] = 2 * (x * y - w * z);
  R.m[0][2] = 2 * (x * z + w * y);
  R.m[1][0] = 2 * (x * y + w * z);
  R.m[1][1] = 1 - 2 * (x * x + z * z);
  R.m[1][2] = 2 * (y * z - w * x);
  R.m[2][0] = 2 * (x * z - w * y);
  R.m[2][1] = 2 * (y * z + w * x);
  R.m[2][2] = 1 - 2 * (x * x + y * y);
  return R;
}

// Covariance R diag(exp(2 s)) R^T.
inline Mat3 covariance(const float* scaling_log, const float* rot) {
  Mat3 R = quat_to_rotmat(rot);
  double s2[3] = {std::exp(2.0 * scaling_log[0]),
                  std::exp(2.0 * scaling_log[1]),
                  std::exp(2.0 * scaling_log[2])};
  Mat3 C;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) {
      double acc = 0;
      for (int k = 0; k < 3; k++) acc += R.m[i][k] * s2[k] * R.m[j][k];
      C.m[i][j] = acc;
    }
  return C;
}

// Jacobi eigensolver for symmetric 3x3 (A is destroyed); V columns are
// eigenvectors, w eigenvalues ascending.
inline void eigh3(Mat3 A, double w[3], Mat3& V) {
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) V.m[i][j] = (i == j) ? 1.0 : 0.0;
  for (int sweep = 0; sweep < 24; sweep++) {
    double off = std::abs(A.m[0][1]) + std::abs(A.m[0][2]) +
                 std::abs(A.m[1][2]);
    if (off < 1e-15) break;
    for (int p = 0; p < 2; p++)
      for (int q = p + 1; q < 3; q++) {
        double apq = A.m[p][q];
        if (std::abs(apq) < 1e-18) continue;
        double theta = (A.m[q][q] - A.m[p][p]) / (2 * apq);
        double t = (theta >= 0 ? 1.0 : -1.0) /
                   (std::abs(theta) + std::sqrt(theta * theta + 1));
        double c = 1 / std::sqrt(t * t + 1), s = t * c;
        for (int k = 0; k < 3; k++) {
          double akp = A.m[k][p], akq = A.m[k][q];
          A.m[k][p] = c * akp - s * akq;
          A.m[k][q] = s * akp + c * akq;
        }
        for (int k = 0; k < 3; k++) {
          double apk = A.m[p][k], aqk = A.m[q][k];
          A.m[p][k] = c * apk - s * aqk;
          A.m[q][k] = s * apk + c * aqk;
        }
        for (int k = 0; k < 3; k++) {
          double vkp = V.m[k][p], vkq = V.m[k][q];
          V.m[k][p] = c * vkp - s * vkq;
          V.m[k][q] = s * vkp + c * vkq;
        }
      }
  }
  int order[3] = {0, 1, 2};
  double diag[3] = {A.m[0][0], A.m[1][1], A.m[2][2]};
  std::sort(order, order + 3,
            [&](int a, int b) { return diag[a] < diag[b]; });
  Mat3 Vs;
  for (int j = 0; j < 3; j++) {
    w[j] = diag[order[j]];
    for (int i = 0; i < 3; i++) Vs.m[i][j] = V.m[i][order[j]];
  }
  V = Vs;
}

inline void rotmat_to_quat(const Mat3& R, float* q4) {
  double tr = R.m[0][0] + R.m[1][1] + R.m[2][2];
  double qw, qx, qy, qz;
  if (tr > 0) {
    double s = std::sqrt(tr + 1.0) * 2;
    qw = 0.25 * s;
    qx = (R.m[2][1] - R.m[1][2]) / s;
    qy = (R.m[0][2] - R.m[2][0]) / s;
    qz = (R.m[1][0] - R.m[0][1]) / s;
  } else if (R.m[0][0] > R.m[1][1] && R.m[0][0] > R.m[2][2]) {
    double s = std::sqrt(1.0 + R.m[0][0] - R.m[1][1] - R.m[2][2]) * 2;
    qw = (R.m[2][1] - R.m[1][2]) / s;
    qx = 0.25 * s;
    qy = (R.m[0][1] + R.m[1][0]) / s;
    qz = (R.m[0][2] + R.m[2][0]) / s;
  } else if (R.m[1][1] > R.m[2][2]) {
    double s = std::sqrt(1.0 + R.m[1][1] - R.m[0][0] - R.m[2][2]) * 2;
    qw = (R.m[0][2] - R.m[2][0]) / s;
    qx = (R.m[0][1] + R.m[1][0]) / s;
    qy = 0.25 * s;
    qz = (R.m[1][2] + R.m[2][1]) / s;
  } else {
    double s = std::sqrt(1.0 + R.m[2][2] - R.m[0][0] - R.m[1][1]) * 2;
    qw = (R.m[1][0] - R.m[0][1]) / s;
    qx = (R.m[0][2] + R.m[2][0]) / s;
    qy = (R.m[1][2] + R.m[2][1]) / s;
    qz = 0.25 * s;
  }
  double n = std::sqrt(qw * qw + qx * qx + qy * qy + qz * qz);
  if (n < 1e-12) {
    q4[0] = 1;
    q4[1] = q4[2] = q4[3] = 0;
    return;
  }
  q4[0] = (float)(qw / n);
  q4[1] = (float)(qx / n);
  q4[2] = (float)(qy / n);
  q4[3] = (float)(qz / n);
}

struct Outputs {
  float *xyz, *shs, *alpha, *scaling, *rotation, *boxes;
  int32_t* nodes;
  uint8_t* anchor;
};

inline void three_sigma_box(const float* xyz, const float* scaling,
                            const float* rot, float* box6) {
  Mat3 C = covariance(scaling, rot);
  for (int a = 0; a < 3; a++) {
    double half = 3.0 * std::sqrt(std::max(C.m[a][a], 1e-14));
    box6[a] = (float)(xyz[a] - half);
    box6[3 + a] = (float)(xyz[a] + half);
  }
}

// Moment-match two node rows (indices l, r in the output arrays) into row p.
inline void merge_pair(const Outputs& o, int64_t l, int64_t r, int64_t p) {
  const float* sl = o.scaling + 3 * l;
  const float* sr = o.scaling + 3 * r;
  double wl = o.alpha[l] * std::exp((double)sl[0] + sl[1] + sl[2]);
  double wr = o.alpha[r] * std::exp((double)sr[0] + sr[1] + sr[2]);
  double ws = wl + wr;
  if (ws < 1e-20) ws = 1e-20;
  double fl = wl / ws, fr = wr / ws;

  double mu[3];
  for (int a = 0; a < 3; a++)
    mu[a] = fl * o.xyz[3 * l + a] + fr * o.xyz[3 * r + a];
  for (int a = 0; a < 3; a++) o.xyz[3 * p + a] = (float)mu[a];
  for (int a = 0; a < SH; a++)
    o.shs[SH * p + a] =
        (float)(fl * o.shs[SH * l + a] + fr * o.shs[SH * r + a]);

  Mat3 Cl = covariance(sl, o.rotation + 4 * l);
  Mat3 Cr = covariance(sr, o.rotation + 4 * r);
  double dl[3], dr[3];
  for (int a = 0; a < 3; a++) {
    dl[a] = o.xyz[3 * l + a] - mu[a];
    dr[a] = o.xyz[3 * r + a] - mu[a];
  }
  Mat3 C;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      C.m[i][j] = fl * (Cl.m[i][j] + dl[i] * dl[j]) +
                  fr * (Cr.m[i][j] + dr[i] * dr[j]);

  double ev[3];
  Mat3 V;
  eigh3(C, ev, V);
  double sp[3], prod = 1.0;
  for (int a = 0; a < 3; a++) {
    sp[a] = std::sqrt(std::max(ev[a], 1e-14));
    prod *= sp[a];
    o.scaling[3 * p + a] = (float)std::log(sp[a]);
  }
  // det(V) may be -1 (reflection); flip the last column.
  double det =
      V.m[0][0] * (V.m[1][1] * V.m[2][2] - V.m[1][2] * V.m[2][1]) -
      V.m[0][1] * (V.m[1][0] * V.m[2][2] - V.m[1][2] * V.m[2][0]) +
      V.m[0][2] * (V.m[1][0] * V.m[2][1] - V.m[1][1] * V.m[2][0]);
  if (det < 0)
    for (int i = 0; i < 3; i++) V.m[i][2] = -V.m[i][2];
  rotmat_to_quat(V, o.rotation + 4 * p);
  o.alpha[p] = (float)std::min(1.0, ws / std::max(prod, 1e-20));

  three_sigma_box(o.xyz + 3 * p, o.scaling + 3 * p, o.rotation + 4 * p,
                  o.boxes + 6 * p);
  for (int a = 0; a < 3; a++) {
    o.boxes[6 * p + a] = std::min(
        o.boxes[6 * p + a], std::min(o.boxes[6 * l + a], o.boxes[6 * r + a]));
    o.boxes[6 * p + 3 + a] =
        std::max(o.boxes[6 * p + 3 + a],
                 std::max(o.boxes[6 * l + 3 + a], o.boxes[6 * r + 3 + a]));
  }
  o.anchor[p] = o.anchor[l] | o.anchor[r];
}

}  // namespace

extern "C" {

int64_t h3dgs_build_hierarchy(
    int64_t n, const float* xyz, const float* shs, const float* alpha,
    const float* scaling, const float* rotation, const uint8_t* locked,
    float* o_xyz, float* o_shs, float* o_alpha, float* o_scaling,
    float* o_rotation, int32_t* o_nodes, float* o_boxes, uint8_t* o_anchor) {
  if (n <= 0) return -1;
  const int64_t m = 2 * n - 1;
  Outputs o{o_xyz, o_shs, o_alpha, o_scaling, o_rotation, o_boxes, o_nodes,
            o_anchor};

  // --- Morton order ---
  float mn[3] = {xyz[0], xyz[1], xyz[2]}, mx[3] = {xyz[0], xyz[1], xyz[2]};
  for (int64_t i = 1; i < n; i++)
    for (int a = 0; a < 3; a++) {
      mn[a] = std::min(mn[a], xyz[3 * i + a]);
      mx[a] = std::max(mx[a], xyz[3 * i + a]);
    }
  std::vector<std::pair<uint64_t, int64_t>> codes(n);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
  for (int64_t i = 0; i < n; i++) {
    uint64_t c = 0;
    for (int a = 0; a < 3; a++) {
      double range = std::max((double)mx[a] - mn[a], 1e-12);
      double q = (xyz[3 * i + a] - mn[a]) / range * 2097151.0;
      uint64_t qi = (uint64_t)std::min(std::max(q, 0.0), 2097151.0);
      c |= expand_bits(qi) << a;
    }
    codes[i] = {c, i};
  }
  std::stable_sort(codes.begin(), codes.end(),
                   [](const auto& a, const auto& b) {
                     return a.first < b.first;
                   });

  // --- level-by-level structure over sorted-leaf ranges ---
  struct Range {
    int64_t lo, hi;
  };
  std::vector<std::vector<Range>> levels;
  levels.push_back({{0, n}});
  while (true) {
    const auto& cur = levels.back();
    std::vector<Range> next;
    next.reserve(cur.size() * 2);
    for (const auto& r : cur)
      if (r.hi - r.lo > 1) {
        int64_t mid = (r.lo + r.hi) >> 1;
        next.push_back({r.lo, mid});
        next.push_back({mid, r.hi});
      }
    if (next.empty()) break;
    levels.push_back(std::move(next));
  }
  std::vector<int64_t> offsets(levels.size() + 1, 0);
  for (size_t d = 0; d < levels.size(); d++)
    offsets[d + 1] = offsets[d] + (int64_t)levels[d].size();
  if (offsets.back() != m) return -2;

  // Nodes + leaf copies.
  for (size_t d = 0; d < levels.size(); d++) {
    int64_t n_int = 0;
    for (size_t k = 0; k < levels[d].size(); k++) {
      const Range& r = levels[d][k];
      int64_t idx = offsets[d] + (int64_t)k;
      int32_t* nd = o.nodes + 4 * idx;
      nd[DEPTH] = (int32_t)d;
      if (r.hi - r.lo > 1) {
        int64_t fc = offsets[d + 1] + 2 * n_int;
        nd[FIRST_CHILD] = (int32_t)fc;
        nd[N_CHILDREN] = 2;
        o.nodes[4 * fc + PARENT] = (int32_t)idx;
        o.nodes[4 * (fc + 1) + PARENT] = (int32_t)idx;
        n_int++;
      } else {
        nd[FIRST_CHILD] = -1;
        nd[N_CHILDREN] = 0;
        int64_t src = codes[r.lo].second;
        std::memcpy(o.xyz + 3 * idx, xyz + 3 * src, 3 * sizeof(float));
        std::memcpy(o.shs + SH * idx, shs + SH * src, SH * sizeof(float));
        o.alpha[idx] = alpha[src];
        std::memcpy(o.scaling + 3 * idx, scaling + 3 * src,
                    3 * sizeof(float));
        std::memcpy(o.rotation + 4 * idx, rotation + 4 * src,
                    4 * sizeof(float));
        three_sigma_box(o.xyz + 3 * idx, o.scaling + 3 * idx,
                        o.rotation + 4 * idx, o.boxes + 6 * idx);
        o.anchor[idx] = locked ? locked[src] : 0;
      }
    }
  }
  o.nodes[4 * 0 + PARENT] = -1;

  // Bottom-up moment matching, parallel within each level.
  for (int64_t d = (int64_t)levels.size() - 2; d >= 0; d--) {
    int64_t lo = offsets[d], hi = offsets[d + 1];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int64_t idx = lo; idx < hi; idx++) {
      const int32_t* nd = o.nodes + 4 * idx;
      if (nd[N_CHILDREN] == 2)
        merge_pair(o, nd[FIRST_CHILD], nd[FIRST_CHILD] + 1, idx);
    }
  }
  return m;
}

}  // extern "C"
