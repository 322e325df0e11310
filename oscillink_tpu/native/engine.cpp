// oscillink_tpu native engine — host-side C++ implementation of the lattice
// hot path for SMALL lattices.
//
// Why this exists (runtime architecture, not a port): the TPU path pays a
// fixed per-request transfer/sync cost (measured ~30-60 ms through tunneled
// runtimes, and ~10s of us even host-attached).  For small N the entire
// build+settle fits in L2 and runs in well under a millisecond on the host,
// so the serving layer routes small requests here and keeps the TPU for the
// large-N regime.  It also serves as an independent second implementation
// for cross-validation against the XLA path.
//
// Behavioral contract matches oscillink/core/{graph,solver}.py of the
// reference: cosine mutual-kNN (ties: sim desc, index asc), clip-at-zero,
// max-symmetrize, geometric-mean row cap, normalized-Laplacian degrees with
// the 1e-12 guards, Jacobi-preconditioned multi-RHS CG with 1e-18 epsilons
// and max-column-norm termination (>= 1 iteration always).
//
// Plain C ABI over row-major float32 buffers; bound via ctypes (no pybind11
// in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// Top-k of one similarity row (descending value, ties broken by lowest
// index — the reference's deterministic contract, graph.py:44-52), skipping
// j == self.  Threshold-skip insertion with a chunked max prefilter: once
// the running k-th value exceeds a 16-wide chunk's max, the whole chunk is
// skipped after one vectorizable max-reduce instead of 16 ordered compares.
// Replaces a std::partial_sort over the full row (~4x slower at N=1200).
void topk_row(const float* row, int32_t n, int32_t self, int32_t k,
              float* out_vals, int32_t* out_idx) {
  int32_t cnt = 0;
  float thresh = -std::numeric_limits<float>::infinity();
  auto insert = [&](int32_t j, float v) {
    int32_t p = (cnt < k) ? cnt : k - 1;
    while (p > 0 && out_vals[p - 1] < v) {
      out_vals[p] = out_vals[p - 1];
      out_idx[p] = out_idx[p - 1];
      --p;
    }
    out_vals[p] = v;
    out_idx[p] = j;
    if (cnt < k) ++cnt;
    if (cnt == k) thresh = out_vals[k - 1];
  };
  constexpr int32_t C = 16;
  int32_t j0 = 0;
  for (; j0 + C <= n; j0 += C) {
    float m = row[j0];
    for (int32_t t = 1; t < C; ++t) m = std::max(m, row[j0 + t]);
    if (m <= thresh) continue;  // self's 1.0 keeps its chunk alive; fine
    for (int32_t j = j0; j < j0 + C; ++j) {
      if (j == self) continue;
      float v = row[j];
      if (cnt == k && v <= thresh) continue;
      insert(j, v);
    }
  }
  for (int32_t j = j0; j < n; ++j) {
    if (j == self) continue;
    float v = row[j];
    if (cnt == k && v <= thresh) continue;
    insert(j, v);
  }
}

}  // namespace

extern "C" {

// Graph build from a precomputed similarity matrix S[n*n] (row-major; the
// caller computes S = Yn Yn^T with BLAS — ~10x the flops/s of the scalar
// loop for mid-size N — and this routine does selection/mutual/cap).
// Diagonal entries are ignored. Returns directed edge count.
int32_t osc_build_graph_from_sims(const float* S, int32_t n, int32_t k,
                                  float row_cap, int32_t* idx_out,
                                  float* w_out, float* sqrt_deg_out) {
  if (n <= 1 || k < 1) {
    for (int32_t i = 0; i < n; ++i) sqrt_deg_out[i] = std::sqrt(1e-12f);
    std::fill(idx_out, idx_out + (size_t)n * k, 0);
    std::fill(w_out, w_out + (size_t)n * k, 0.0f);
    return 0;
  }
  if (k > n - 1) k = n - 1;
  std::vector<float> raw_vals((size_t)n * k);
  std::vector<int32_t> raw_idx((size_t)n * k);
  for (int32_t i = 0; i < n; ++i) {
    const float* si = S + (size_t)i * n;
    float* rv = raw_vals.data() + (size_t)i * k;
    topk_row(si, n, i, k, rv, raw_idx.data() + (size_t)i * k);
    for (int32_t a = 0; a < k; ++a)
      if (rv[a] < 0.0f) rv[a] = 0.0f;
  }
  auto back_weight = [&](int32_t j, int32_t i) -> float {
    for (int32_t b = 0; b < k; ++b)
      if (raw_idx[(size_t)j * k + b] == i) return raw_vals[(size_t)j * k + b];
    return -1.0f;
  };
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t a = 0; a < k; ++a) {
      int32_t j = raw_idx[(size_t)i * k + a];
      float wij = raw_vals[(size_t)i * k + a];
      float wji = back_weight(j, i);
      idx_out[(size_t)i * k + a] = j;
      w_out[(size_t)i * k + a] =
          (wij > 0.0f && wji > 0.0f) ? std::max(wij, wji) : 0.0f;
    }
  }
  std::vector<float> scale(n);
  for (int32_t i = 0; i < n; ++i) {
    float s = 0.0f;
    for (int32_t a = 0; a < k; ++a) s += w_out[(size_t)i * k + a];
    scale[i] = std::min(1.0f, row_cap / (s + 1e-12f));
  }
  int32_t n_edges = 0;
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t a = 0; a < k; ++a) {
      float& w = w_out[(size_t)i * k + a];
      if (w > 0.0f) {
        int32_t j = idx_out[(size_t)i * k + a];
        w *= std::sqrt(scale[i] * scale[j]);
        if (w > 0.0f) ++n_edges;
      }
    }
  }
  for (int32_t i = 0; i < n; ++i) {
    float deg = 0.0f;
    for (int32_t a = 0; a < k; ++a) deg += w_out[(size_t)i * k + a];
    sqrt_deg_out[i] = std::sqrt(std::max(deg, 1e-12f));
  }
  return n_edges;
}

// Build mutual-kNN graph. Outputs: idx[n*k], w[n*k] (capped adjacency),
// sqrt_deg[n]. Returns number of directed edges (w > 0 entries).
int32_t osc_build_graph(const float* Y, int32_t n, int32_t d, int32_t k,
                        float row_cap, int32_t* idx_out, float* w_out,
                        float* sqrt_deg_out) {
  if (n <= 1 || k < 1) {
    for (int32_t i = 0; i < n; ++i) sqrt_deg_out[i] = std::sqrt(1e-12f);
    std::fill(idx_out, idx_out + (size_t)n * k, 0);
    std::fill(w_out, w_out + (size_t)n * k, 0.0f);
    return 0;
  }
  if (k > n - 1) k = n - 1;

  std::vector<float> Yn((size_t)n * d);
  for (int32_t i = 0; i < n; ++i) {
    const float* yi = Y + (size_t)i * d;
    double s = 0.0;
    for (int32_t j = 0; j < d; ++j) s += (double)yi[j] * yi[j];
    float inv = 1.0f / (float)(std::sqrt(s) + 1e-12);
    for (int32_t j = 0; j < d; ++j) Yn[(size_t)i * d + j] = yi[j] * inv;
  }

  std::vector<float> sims(n);
  std::vector<float> raw_vals((size_t)n * k);
  std::vector<int32_t> raw_idx((size_t)n * k);

  for (int32_t i = 0; i < n; ++i) {
    const float* yi = Yn.data() + (size_t)i * d;
    for (int32_t j = 0; j < n; ++j) {
      if (j == i) {
        sims[j] = -1e30f;
        continue;
      }
      const float* yj = Yn.data() + (size_t)j * d;
      float s = 0.0f;
      for (int32_t t = 0; t < d; ++t) s += yi[t] * yj[t];
      sims[j] = s;
    }
    float* rv = raw_vals.data() + (size_t)i * k;
    topk_row(sims.data(), n, i, k, rv, raw_idx.data() + (size_t)i * k);
    for (int32_t a = 0; a < k; ++a)
      if (rv[a] < 0.0f) rv[a] = 0.0f;
  }

  // mutual mask + max-symmetrize
  auto back_weight = [&](int32_t j, int32_t i) -> float {
    for (int32_t b = 0; b < k; ++b) {
      if (raw_idx[(size_t)j * k + b] == i) return raw_vals[(size_t)j * k + b];
    }
    return -1.0f;  // i not in top-k(j)
  };
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t a = 0; a < k; ++a) {
      int32_t j = raw_idx[(size_t)i * k + a];
      float wij = raw_vals[(size_t)i * k + a];
      float wji = back_weight(j, i);
      idx_out[(size_t)i * k + a] = j;
      if (wij > 0.0f && wji > 0.0f) {
        w_out[(size_t)i * k + a] = std::max(wij, wji);
      } else {
        w_out[(size_t)i * k + a] = 0.0f;
      }
    }
  }

  // geometric-mean row cap
  std::vector<float> scale(n);
  for (int32_t i = 0; i < n; ++i) {
    float s = 0.0f;
    for (int32_t a = 0; a < k; ++a) s += w_out[(size_t)i * k + a];
    s += 1e-12f;
    scale[i] = std::min(1.0f, row_cap / s);
  }
  int32_t n_edges = 0;
  for (int32_t i = 0; i < n; ++i) {
    for (int32_t a = 0; a < k; ++a) {
      float& w = w_out[(size_t)i * k + a];
      if (w > 0.0f) {
        int32_t j = idx_out[(size_t)i * k + a];
        w *= std::sqrt(scale[i] * scale[j]);
        if (w > 0.0f) ++n_edges;
      }
    }
  }

  for (int32_t i = 0; i < n; ++i) {
    float deg = 0.0f;
    for (int32_t a = 0; a < k; ++a) deg += w_out[(size_t)i * k + a];
    sqrt_deg_out[i] = std::sqrt(std::max(deg, 1e-12f));
  }
  return n_edges;
}

namespace {

// M X = lamG X + lamC L_sym X + lamQ B X (+ lamP L_path X), all k-sparse.
// L_path acts as identity on every node (zero-degree rows, SURVEY.md §2.1) —
// its matvec is X - Wp X over the chain's COO edges.
struct Operator {
  const int32_t* idx;
  const float* w;
  const float* sqrt_deg;
  int32_t n, k, d;
  float lamG, lamC, lamQ;
  const float* B;
  float dt;  // 0 => stationary operator M; else I + dt*M
  // optional chain prior (lamP <= 0 disables)
  float lamP = 0.0f;
  int32_t n_path_edges = 0;
  const int32_t* path_src = nullptr;
  const int32_t* path_dst = nullptr;
  const float* path_wn = nullptr;  // degree-normalized, self-loops pre-halved

  void apply(const float* X, float* out) const {
    for (int32_t i = 0; i < n; ++i) {
      const float* xi = X + (size_t)i * d;
      float* oi = out + (size_t)i * d;
      // lap = X[i] - sum_a wn[i,a] X[j]
      for (int32_t t = 0; t < d; ++t) oi[t] = xi[t];
      float inv_sdi = 1.0f / sqrt_deg[i];
      for (int32_t a = 0; a < k; ++a) {
        float wv = w[(size_t)i * k + a];
        if (wv <= 0.0f) continue;
        int32_t j = idx[(size_t)i * k + a];
        float wn = wv * inv_sdi / sqrt_deg[j];
        const float* xj = X + (size_t)j * d;
        for (int32_t t = 0; t < d; ++t) oi[t] -= wn * xj[t];
      }
      // M x = (lamG + lamQ B + lamP) x + lamC * lap - lamP * Wp x
      float gi = lamG + lamQ * B[i] + (lamP > 0.0f ? lamP : 0.0f);
      for (int32_t t = 0; t < d; ++t) oi[t] = gi * xi[t] + lamC * oi[t];
    }
    // subtract lamP * Wp X over chain edges (both directions)
    if (lamP > 0.0f && n_path_edges > 0) {
      for (int32_t e = 0; e < n_path_edges; ++e) {
        int32_t s = path_src[e], t2 = path_dst[e];
        float wn = lamP * path_wn[e];
        const float* xs = X + (size_t)s * d;
        const float* xt = X + (size_t)t2 * d;
        float* os = out + (size_t)s * d;
        float* ot = out + (size_t)t2 * d;
        for (int32_t t = 0; t < d; ++t) {
          os[t] -= wn * xt[t];
          ot[t] -= wn * xs[t];
        }
      }
    }
    // implicit Euler wrapping: out = X + dt * (M X)
    if (dt != 0.0f) {
      for (size_t o = 0; o < (size_t)n * d; ++o) out[o] = X[o] + dt * out[o];
    }
  }
};

// Jacobi-preconditioned multi-RHS CG (solver.py:6-37 contract)
int32_t cg(const Operator& op, const float* b, const float* x0,
           const float* M_diag, float tol, int32_t max_iters, float* x,
           float* res_out) {
  const int32_t n = op.n, d = op.d;
  const size_t sz = (size_t)n * d;
  std::vector<float> r(sz), z(sz), p(sz), Ap(sz);
  std::vector<float> rz(d), rz_new(d), denom(d), colnorm(d);

  std::memcpy(x, x0, sz * sizeof(float));
  op.apply(x, Ap.data());
  for (size_t t = 0; t < sz; ++t) r[t] = b[t] - Ap[t];
  for (int32_t i = 0; i < n; ++i) {
    float inv = 1.0f / (M_diag[i] + 1e-12f);
    for (int32_t t = 0; t < d; ++t) z[(size_t)i * d + t] = r[(size_t)i * d + t] * inv;
  }
  std::memcpy(p.data(), z.data(), sz * sizeof(float));
  std::fill(rz.begin(), rz.end(), 0.0f);
  for (int32_t i = 0; i < n; ++i)
    for (int32_t t = 0; t < d; ++t) rz[t] += r[(size_t)i * d + t] * z[(size_t)i * d + t];

  int32_t it = 0;
  float res = 1e30f;
  for (it = 1; it <= max_iters; ++it) {
    op.apply(p.data(), Ap.data());
    std::fill(denom.begin(), denom.end(), 0.0f);
    for (int32_t i = 0; i < n; ++i)
      for (int32_t t = 0; t < d; ++t)
        denom[t] += p[(size_t)i * d + t] * Ap[(size_t)i * d + t];
    for (int32_t t = 0; t < d; ++t) denom[t] += 1e-18f;

    std::fill(colnorm.begin(), colnorm.end(), 0.0f);
    for (int32_t i = 0; i < n; ++i) {
      for (int32_t t = 0; t < d; ++t) {
        float alpha = rz[t] / denom[t];
        size_t o = (size_t)i * d + t;
        x[o] += alpha * p[o];
        r[o] -= alpha * Ap[o];
        colnorm[t] += r[o] * r[o];
      }
    }
    res = 0.0f;
    for (int32_t t = 0; t < d; ++t) res = std::max(res, std::sqrt(colnorm[t]));
    if (res <= tol) break;

    for (int32_t i = 0; i < n; ++i) {
      float inv = 1.0f / (M_diag[i] + 1e-12f);
      for (int32_t t = 0; t < d; ++t)
        z[(size_t)i * d + t] = r[(size_t)i * d + t] * inv;
    }
    std::fill(rz_new.begin(), rz_new.end(), 0.0f);
    for (int32_t i = 0; i < n; ++i)
      for (int32_t t = 0; t < d; ++t)
        rz_new[t] += r[(size_t)i * d + t] * z[(size_t)i * d + t];
    for (int32_t i = 0; i < n; ++i) {
      for (int32_t t = 0; t < d; ++t) {
        float beta = rz_new[t] / (rz[t] + 1e-18f);
        size_t o = (size_t)i * d + t;
        p[o] = z[o] + beta * p[o];
      }
    }
    rz = rz_new;
  }
  if (it > max_iters) it = max_iters;
  *res_out = res;
  return it;
}

}  // namespace

// Stationary solve with an optional chain prior.
int32_t osc_solve_ustar_chain(
    const int32_t* idx, const float* w, const float* sqrt_deg, const float* Y,
    const float* psi, const float* B, int32_t n, int32_t k, int32_t d,
    float lamG, float lamC, float lamQ, float lamP, int32_t n_edges,
    const int32_t* path_src, const int32_t* path_dst, const float* path_wn,
    float tol, int32_t max_iters, float* Ustar, float* res_out) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, 0.0f,
              lamP, n_edges, path_src, path_dst, path_wn};
  std::vector<float> rhs((size_t)n * d);
  std::vector<float> M_diag(n);
  for (int32_t i = 0; i < n; ++i) {
    M_diag[i] = lamG + lamQ * B[i] + (lamP > 0.0f ? lamP : 0.0f);
    for (int32_t t = 0; t < d; ++t)
      rhs[(size_t)i * d + t] = lamG * Y[(size_t)i * d + t] + lamQ * B[i] * psi[t];
  }
  return cg(op, rhs.data(), Y, M_diag.data(), tol, max_iters, Ustar, res_out);
}

// Implicit Euler settle with an optional chain prior.
int32_t osc_settle_chain(
    const int32_t* idx, const float* w, const float* sqrt_deg, const float* U,
    const float* Y, const float* psi, const float* B, int32_t n, int32_t k,
    int32_t d, float lamG, float lamC, float lamQ, float lamP, int32_t n_edges,
    const int32_t* path_src, const int32_t* path_dst, const float* path_wn,
    float dt, float tol, int32_t max_iters, float* U_out, float* res_out) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, dt,
              lamP, n_edges, path_src, path_dst, path_wn};
  std::vector<float> rhs((size_t)n * d);
  std::vector<float> M_diag(n);
  for (int32_t i = 0; i < n; ++i) {
    M_diag[i] = 1.0f + dt * (lamG + lamQ * B[i] + (lamP > 0.0f ? lamP : 0.0f));
    for (int32_t t = 0; t < d; ++t) {
      size_t o = (size_t)i * d + t;
      rhs[o] = U[o] + dt * (lamG * Y[o] + lamQ * B[i] * psi[t]);
    }
  }
  return cg(op, rhs.data(), U, M_diag.data(), tol, max_iters, U_out, res_out);
}

// Stationary solve M U* = lamG Y + lamQ B psi^T, x0 = Y.
int32_t osc_solve_ustar(const int32_t* idx, const float* w,
                        const float* sqrt_deg, const float* Y,
                        const float* psi, const float* B, int32_t n, int32_t k,
                        int32_t d, float lamG, float lamC, float lamQ,
                        float tol, int32_t max_iters, float* Ustar,
                        float* res_out) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, 0.0f};
  std::vector<float> rhs((size_t)n * d);
  std::vector<float> M_diag(n);
  for (int32_t i = 0; i < n; ++i) {
    M_diag[i] = lamG + lamQ * B[i];
    for (int32_t t = 0; t < d; ++t)
      rhs[(size_t)i * d + t] = lamG * Y[(size_t)i * d + t] + lamQ * B[i] * psi[t];
  }
  return cg(op, rhs.data(), Y, M_diag.data(), tol, max_iters, Ustar, res_out);
}

// Implicit Euler settle (I + dt M) U+ = U + dt (lamG Y + lamQ B psi^T).
int32_t osc_settle(const int32_t* idx, const float* w, const float* sqrt_deg,
                   const float* U, const float* Y, const float* psi,
                   const float* B, int32_t n, int32_t k, int32_t d, float lamG,
                   float lamC, float lamQ, float dt, float tol,
                   int32_t max_iters, float* U_out, float* res_out) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, dt};
  std::vector<float> rhs((size_t)n * d);
  std::vector<float> M_diag(n);
  for (int32_t i = 0; i < n; ++i) {
    M_diag[i] = 1.0f + dt * (lamG + lamQ * B[i]);
    for (int32_t t = 0; t < d; ++t) {
      size_t o = (size_t)i * d + t;
      rhs[o] = U[o] + dt * (lamG * Y[o] + lamQ * B[i] * psi[t]);
    }
  }
  return cg(op, rhs.data(), U, M_diag.data(), tol, max_iters, U_out, res_out);
}

// Screened-diffusion gate solve (preprocess/diffusion.py contract;
// reference oscillink/preprocess/diffusion.py:130-163):
//   (L_sym + gamma I) h = s,   s = beta * max(0, cos(Y, psi))  (caller-built)
// Single-RHS Jacobi-CG, diag(L_sym) = 1 so M_diag = 1 + gamma, x0 = 0.
// Reuses the lattice Operator with lamG = gamma, lamC = 1, lamQ = 0:
// M x = gamma x + L_sym x exactly. Returns CG iterations.
int32_t osc_diffusion_solve(const int32_t* idx, const float* w,
                            const float* sqrt_deg, const float* s, int32_t n,
                            int32_t k, float gamma, float tol,
                            int32_t max_iters, float* h_out, float* res_out) {
  Operator op{idx, w, sqrt_deg, n, k, /*d=*/1, /*lamG=*/gamma,
              /*lamC=*/1.0f, /*lamQ=*/0.0f, /*B=*/s, /*dt=*/0.0f};
  std::vector<float> x0(n, 0.0f);
  std::vector<float> M_diag(n, 1.0f + gamma);
  return cg(op, s, x0.data(), M_diag.data(), tol, max_iters, h_out, res_out);
}

// deltaH = sum(diff * M diff), diff = U - Ustar.
float osc_deltaH(const int32_t* idx, const float* w, const float* sqrt_deg,
                 const float* U, const float* Ustar, const float* B, int32_t n,
                 int32_t k, int32_t d, float lamG, float lamC, float lamQ) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, 0.0f};
  std::vector<float> diff((size_t)n * d), term((size_t)n * d);
  for (size_t t = 0; t < (size_t)n * d; ++t) diff[t] = U[t] - Ustar[t];
  op.apply(diff.data(), term.data());
  double s = 0.0;
  for (size_t t = 0; t < (size_t)n * d; ++t) s += (double)diff[t] * term[t];
  return (float)s;
}

// deltaH with the chain prior term included.
float osc_deltaH_chain(const int32_t* idx, const float* w,
                       const float* sqrt_deg, const float* U,
                       const float* Ustar, const float* B, int32_t n,
                       int32_t k, int32_t d, float lamG, float lamC,
                       float lamQ, float lamP, int32_t n_edges,
                       const int32_t* path_src, const int32_t* path_dst,
                       const float* path_wn) {
  Operator op{idx, w, sqrt_deg, n, k, d, lamG, lamC, lamQ, B, 0.0f,
              lamP, n_edges, path_src, path_dst, path_wn};
  std::vector<float> diff((size_t)n * d), term((size_t)n * d);
  for (size_t t = 0; t < (size_t)n * d; ++t) diff[t] = U[t] - Ustar[t];
  op.apply(diff.data(), term.data());
  double s = 0.0;
  for (size_t t = 0; t < (size_t)n * d; ++t) s += (double)diff[t] * term[t];
  return (float)s;
}

// Per-node receipt components (reference receipts.py:28-60): coherence drop,
// anchor penalty, query term.
void osc_per_node(const int32_t* idx, const float* w, const float* sqrt_deg,
                  const float* Y, const float* Ustar, const float* B,
                  const float* psi, int32_t n, int32_t k, int32_t d,
                  float lamG, float lamC, float lamQ, float* coh,
                  float* anchor, float* query) {
  for (int32_t i = 0; i < n; ++i) {
    float inv_i = 1.0f / (sqrt_deg[i] + 1e-12f);
    double c = 0.0;
    for (int32_t a = 0; a < k; ++a) {
      float wv = w[(size_t)i * k + a];
      if (wv <= 0.0f) continue;
      int32_t j = idx[(size_t)i * k + a];
      float inv_j = 1.0f / (sqrt_deg[j] + 1e-12f);
      double dy2 = 0.0, du2 = 0.0;
      for (int32_t t = 0; t < d; ++t) {
        float ydiff = Y[(size_t)i * d + t] * inv_i - Y[(size_t)j * d + t] * inv_j;
        float udiff =
            Ustar[(size_t)i * d + t] * inv_i - Ustar[(size_t)j * d + t] * inv_j;
        dy2 += (double)ydiff * ydiff;
        du2 += (double)udiff * udiff;
      }
      c += 0.5 * lamC * wv * (dy2 - du2);
    }
    coh[i] = (float)c;
    double ap = 0.0, qp = 0.0;
    for (int32_t t = 0; t < d; ++t) {
      float da = Ustar[(size_t)i * d + t] - Y[(size_t)i * d + t];
      float dq = Ustar[(size_t)i * d + t] - psi[t];
      ap += (double)da * da;
      qp += (double)dq * dq;
    }
    anchor[i] = lamG * (float)ap;
    query[i] = lamQ * B[i] * (float)qp;
  }
}

// Null-point diagnostics (reference receipts.py:63-83), edge-sparse with
// dense-row z-score semantics. Returns number of flagged rows.
int32_t osc_null_points(const int32_t* idx, const float* w,
                        const float* sqrt_deg, const float* Ustar, int32_t n,
                        int32_t k, int32_t d, float lamC, float z_th,
                        int32_t* j_out, float* z_out, float* r_out,
                        uint8_t* flag_out) {
  std::vector<float> R(k);
  int32_t flagged = 0;
  for (int32_t i = 0; i < n; ++i) {
    float inv_i = 1.0f / (sqrt_deg[i] + 1e-12f);
    double s1 = 0.0, s2 = 0.0;
    float r_best = -1.0f;
    int32_t j_best = 0;
    for (int32_t a = 0; a < k; ++a) {
      float wv = w[(size_t)i * k + a];
      float r = 0.0f;
      int32_t j = idx[(size_t)i * k + a];
      if (wv > 0.0f) {
        float inv_j = 1.0f / (sqrt_deg[j] + 1e-12f);
        double d2 = 0.0;
        for (int32_t t = 0; t < d; ++t) {
          float diff =
              Ustar[(size_t)i * d + t] * inv_i - Ustar[(size_t)j * d + t] * inv_j;
          d2 += (double)diff * diff;
        }
        r = lamC * wv * (float)d2;
      }
      R[a] = r;
      s1 += r;
      s2 += (double)r * r;
      if (r > r_best) {
        r_best = r;
        j_best = j;
      }
    }
    double mu = s1 / n;
    double var = s2 / n - mu * mu;
    double sigma = std::sqrt(var > 0 ? var : 0.0) + 1e-12;
    float z_best = (float)((r_best - mu) / sigma);
    j_out[i] = j_best;
    r_out[i] = r_best > 0.0f ? r_best : 0.0f;
    z_out[i] = z_best;
    uint8_t f = (r_best > 0.0f && z_best > z_th) ? 1 : 0;
    flag_out[i] = f;
    flagged += f;
  }
  return flagged;
}

}  // extern "C"
