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

// Cross-chunk consolidation: the C++ counterpart of
// h3dgs_tpu/hierarchy/merge.py (same algorithm, bit-compatible outputs) —
// the role the reference fills with its native GaussianHierarchyMerger
// executable (/root/reference/scripts/full_train.py:241-264).
//
// Inputs are the K chunk hierarchies concatenated row-wise (sizes[k] node
// counts; node child/parent indices chunk-local) plus each chunk's XY
// box. Output capacity must be sum(sizes) + 1 rows; returns the actual
// node count (pruned total + global root), or a negative error code.
int64_t h3dgs_merge_hierarchies(
    int64_t k, const int64_t* sizes, const float* xyz, const float* shs,
    const float* alpha, const float* scaling, const float* rotation,
    const int32_t* nodes, const float* boxes, const uint8_t* anchor,
    const float* box_min, const float* box_max, float* o_xyz, float* o_shs,
    float* o_alpha, float* o_scaling, float* o_rotation, int32_t* o_nodes,
    float* o_boxes, uint8_t* o_anchor) {
  if (k <= 0) return -1;
  Outputs o{o_xyz, o_shs, o_alpha, o_scaling, o_rotation, o_boxes, o_nodes,
            o_anchor};

  // --- per-chunk prune to its own XY box (merge.py prune_to_box) ---
  // kept[c] lists surviving chunk-local ids in order; new_id maps local
  // id -> per-chunk compact id.
  std::vector<std::vector<int64_t>> kept(k);
  std::vector<std::vector<int64_t>> new_id(k);
  std::vector<int64_t> base(k, 0);
  {
    int64_t off = 0;
    for (int64_t c = 0; c < k; c++) {
      base[c] = off;
      off += sizes[c];
    }
  }
  for (int64_t c = 0; c < k; c++) {
    const int64_t m = sizes[c];
    const int32_t* nd = nodes + 4 * base[c];
    const float* px = xyz + 3 * base[c];
    std::vector<uint8_t> keep(m, 0);
    for (int64_t i = 0; i < m; i++) {
      // This prune (like merge.py's binary fast path) assumes creator
      // output: at most two children per node.
      if (nd[4 * i + N_CHILDREN] > 2) return -3;
      bool leaf = nd[4 * i + N_CHILDREN] == 0;
      bool owned = px[3 * i + 0] >= box_min[3 * c + 0] &&
                   px[3 * i + 0] <= box_max[3 * c + 0] &&
                   px[3 * i + 1] >= box_min[3 * c + 1] &&
                   px[3 * i + 1] <= box_max[3 * c + 1];
      keep[i] = leaf && owned;
    }
    // Bottom-up by depth (stable sort, like the numpy version).
    std::vector<int64_t> order(m);
    for (int64_t i = 0; i < m; i++) order[i] = i;
    std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
      return nd[4 * a + DEPTH] < nd[4 * b + DEPTH];
    });
    for (int64_t oi = m - 1; oi >= 0; oi--) {
      int64_t i = order[oi];
      int32_t nc = nd[4 * i + N_CHILDREN];
      if (nc <= 0) continue;
      int64_t fc = nd[4 * i + FIRST_CHILD];
      bool any = keep[fc] || (nc > 1 && keep[std::min(fc + 1, m - 1)]);
      keep[i] = keep[i] || any;
    }
    auto& kc = kept[c];
    auto& nid = new_id[c];
    nid.assign(m, -1);
    for (int64_t i = 0; i < m; i++)
      if (keep[i]) {
        nid[i] = (int64_t)kc.size();
        kc.push_back(i);
      }
    if (kc.empty()) return -2;  // chunk box owns no leaves
  }

  // --- global layout: [root, chunk roots..., remaining nodes] ---
  std::vector<int64_t> psize(k, 0), pbase(k, 0);
  int64_t total = 1;  // global root
  for (int64_t c = 0; c < k; c++) psize[c] = (int64_t)kept[c].size();
  // chunk-local root = the kept node with parent < 0 (creator layout: 0).
  std::vector<int64_t> root_local(k, 0);
  for (int64_t c = 0; c < k; c++) {
    const int32_t* nd = nodes + 4 * base[c];
    for (size_t j = 0; j < kept[c].size(); j++)
      if (nd[4 * kept[c][j] + PARENT] < 0) {
        root_local[c] = (int64_t)j;
        break;
      }
  }
  {
    int64_t off = 0;
    for (int64_t c = 0; c < k; c++) {
      pbase[c] = off;
      off += psize[c];
      total += psize[c];
    }
  }
  // pos: pruned-concat index -> output index.
  std::vector<int64_t> pos(total - 1, -1);
  {
    std::vector<uint8_t> is_root(total - 1, 0);
    for (int64_t c = 0; c < k; c++) {
      is_root[pbase[c] + root_local[c]] = 1;
      pos[pbase[c] + root_local[c]] = 1 + c;
    }
    int64_t nxt = 1 + k;
    for (int64_t i = 0; i < total - 1; i++)
      if (!is_root[i]) pos[i] = nxt++;
  }

  // --- copy rows + remap pointers ---
  for (int64_t c = 0; c < k; c++) {
    const int32_t* nd = nodes + 4 * base[c];
    for (size_t j = 0; j < kept[c].size(); j++) {
      int64_t src = base[c] + kept[c][j];
      int64_t dst = pos[pbase[c] + (int64_t)j];
      std::memcpy(o.xyz + 3 * dst, xyz + 3 * src, 3 * sizeof(float));
      std::memcpy(o.shs + SH * dst, shs + SH * src, SH * sizeof(float));
      o.alpha[dst] = alpha[src];
      std::memcpy(o.scaling + 3 * dst, scaling + 3 * src, 3 * sizeof(float));
      std::memcpy(o.rotation + 4 * dst, rotation + 4 * src,
                  4 * sizeof(float));
      std::memcpy(o.boxes + 6 * dst, boxes + 6 * src, 6 * sizeof(float));
      o.anchor[dst] = anchor ? anchor[src] : 0;

      int64_t li = kept[c][j];
      int32_t* od = o.nodes + 4 * dst;
      int64_t m = sizes[c];
      int32_t nc_old = nd[4 * li + N_CHILDREN];
      // Re-derive kept children exactly as the numpy version does.
      int32_t n_kept = 0;
      int64_t first_kept = -1;
      if (nc_old > 0) {
        int64_t fc = std::max<int64_t>(nd[4 * li + FIRST_CHILD], 0);
        int64_t second = std::min(fc + 1, m - 1);
        bool k1 = new_id[c][fc] >= 0;
        bool k2 = (nc_old > 1) && new_id[c][second] >= 0;
        n_kept = (int32_t)k1 + (int32_t)k2;
        first_kept = k1 ? fc : second;
      }
      od[N_CHILDREN] = (nc_old > 0) ? n_kept : 0;
      od[FIRST_CHILD] =
          (nc_old > 0 && n_kept > 0)
              ? (int32_t)pos[pbase[c] + new_id[c][first_kept]]
              : -1;
      int32_t par = nd[4 * li + PARENT];
      od[PARENT] = par >= 0 ? (int32_t)pos[pbase[c] + new_id[c][par]]
                            : 0 /* chunk root -> global root */;
      od[DEPTH] = nd[4 * li + DEPTH] + 1;
    }
  }

  // --- global root: pairwise fold of the chunk roots (merge.py
  // _fold_merge: rounds of (0,1),(2,3),... with an odd tail carried) ---
  {
    // Working set A of n_cur candidate rows, seeded with the chunk roots
    // (output rows 1..k).
    std::vector<float> ax(3 * k), ash(SH * k), aa(k), asc(3 * k), ar(4 * k),
        ab(6 * k);
    for (int64_t c = 0; c < k; c++) {
      int64_t src = 1 + c;
      std::memcpy(ax.data() + 3 * c, o.xyz + 3 * src, 3 * sizeof(float));
      std::memcpy(ash.data() + SH * c, o.shs + SH * src,
                  SH * sizeof(float));
      aa[c] = o.alpha[src];
      std::memcpy(asc.data() + 3 * c, o.scaling + 3 * src,
                  3 * sizeof(float));
      std::memcpy(ar.data() + 4 * c, o.rotation + 4 * src,
                  4 * sizeof(float));
      std::memcpy(ab.data() + 6 * c, o.boxes + 6 * src, 6 * sizeof(float));
    }
    int64_t n_cur = k;
    std::vector<float> bx(3 * k), bsh(SH * k), ba(k), bsc(3 * k), br(4 * k),
        bb(6 * k);
    while (n_cur > 1) {
      int64_t pairs = n_cur / 2;  // matches arange(0, k-1, 2)
      int64_t n_next = pairs + (n_cur % 2);
      // Stage reads in A..., write pairs into B via a combined buffer that
      // holds [A | one merge slot]; merge_pair needs one Outputs struct, so
      // build it over A with one extra row appended.
      std::vector<float> wx(3 * (n_cur + 1)), wsh(SH * (n_cur + 1)),
          wa(n_cur + 1), wsc(3 * (n_cur + 1)), wr(4 * (n_cur + 1)),
          wb(6 * (n_cur + 1));
      std::vector<int32_t> wn(4 * (n_cur + 1), 0);
      std::vector<uint8_t> wan(n_cur + 1, 0);
      std::memcpy(wx.data(), ax.data(), sizeof(float) * 3 * n_cur);
      std::memcpy(wsh.data(), ash.data(), sizeof(float) * SH * n_cur);
      std::memcpy(wa.data(), aa.data(), sizeof(float) * n_cur);
      std::memcpy(wsc.data(), asc.data(), sizeof(float) * 3 * n_cur);
      std::memcpy(wr.data(), ar.data(), sizeof(float) * 4 * n_cur);
      std::memcpy(wb.data(), ab.data(), sizeof(float) * 6 * n_cur);
      Outputs w{wx.data(), wsh.data(), wa.data(), wsc.data(),
                wr.data(), wb.data(), wn.data(), wan.data()};
      for (int64_t i = 0; i < pairs; i++) {
        merge_pair(w, 2 * i, 2 * i + 1, n_cur);  // scratch row
        std::memcpy(bx.data() + 3 * i, wx.data() + 3 * n_cur,
                    sizeof(float) * 3);
        std::memcpy(bsh.data() + SH * i, wsh.data() + SH * n_cur,
                    sizeof(float) * SH);
        ba[i] = wa[n_cur];
        std::memcpy(bsc.data() + 3 * i, wsc.data() + 3 * n_cur,
                    sizeof(float) * 3);
        std::memcpy(br.data() + 4 * i, wr.data() + 4 * n_cur,
                    sizeof(float) * 4);
        std::memcpy(bb.data() + 6 * i, wb.data() + 6 * n_cur,
                    sizeof(float) * 6);
      }
      if (n_cur % 2) {  // odd tail appended after merged pairs
        int64_t t = n_cur - 1;
        std::memcpy(bx.data() + 3 * pairs, ax.data() + 3 * t,
                    sizeof(float) * 3);
        std::memcpy(bsh.data() + SH * pairs, ash.data() + SH * t,
                    sizeof(float) * SH);
        ba[pairs] = aa[t];
        std::memcpy(bsc.data() + 3 * pairs, asc.data() + 3 * t,
                    sizeof(float) * 3);
        std::memcpy(br.data() + 4 * pairs, ar.data() + 4 * t,
                    sizeof(float) * 4);
        std::memcpy(bb.data() + 6 * pairs, ab.data() + 6 * t,
                    sizeof(float) * 6);
      }
      std::swap(ax, bx);
      std::swap(ash, bsh);
      std::swap(aa, ba);
      std::swap(asc, bsc);
      std::swap(ar, br);
      std::swap(ab, bb);
      n_cur = n_next;
    }
    std::memcpy(o.xyz, ax.data(), sizeof(float) * 3);
    std::memcpy(o.shs, ash.data(), sizeof(float) * SH);
    o.alpha[0] = aa[0];
    std::memcpy(o.scaling, asc.data(), sizeof(float) * 3);
    std::memcpy(o.rotation, ar.data(), sizeof(float) * 4);
  }
  o.nodes[4 * 0 + PARENT] = -1;
  o.nodes[4 * 0 + FIRST_CHILD] = 1;
  o.nodes[4 * 0 + N_CHILDREN] = (int32_t)k;
  o.nodes[4 * 0 + DEPTH] = 0;
  o.anchor[0] = 0;
  // Root box: envelope of every pruned node's box (merge.py:186-187).
  for (int a = 0; a < 3; a++) {
    float lo = o.boxes[6 * 1 + a], hi = o.boxes[6 * 1 + 3 + a];
    for (int64_t i = 2; i < total; i++) {
      lo = std::min(lo, o.boxes[6 * i + a]);
      hi = std::max(hi, o.boxes[6 * i + 3 + a]);
    }
    o.boxes[a] = lo;
    o.boxes[3 + a] = hi;
  }
  return total;
}

}  // extern "C"
