// Block-sparse LDL^T factorization over 6x6 pose blocks — the native
// CPU linear solver for the Ceres-class reference baseline
// (benchmarks/cpu_reference.py --native-ldl).
//
// Why this exists: the reference solves its normal equations with
// ceres::SPARSE_NORMAL_CHOLESKY (src/PoseGraphSLAM.cpp:1270), whose
// backends (CHOLMOD / Eigen SimplicialLDLT) are not installable in this
// environment (no network egress, no system headers). scipy's SuperLU is a
// general LU and understates what a Cholesky-class solver achieves. This
// implements the same algorithm class Ceres uses with its EIGEN_SPARSE
// backend — simplicial up-looking LDL^T (Davis, "Algorithm 849: LDL") —
// lifted to the problem's natural 6x6 pose-block structure, so the inner
// kernels are fixed-size dense 6x6 matmuls (auto-vectorized by -O3), and
// with the symbolic analysis + fill pattern reused across all LM
// iterations of a solve (the sparsity never changes; only the values).
//
// Input convention: UPPER block triangle in block-CSC — column k holds
// block rows i <= k ascending, diagonal block present. The block stored at
// (i, k), i < k, is the upper block A(i,k) = A(k,i)^T of the symmetric
// matrix; the diagonal block is symmetric. Fill-reducing permutation is
// applied by the caller (Python computes it once per solve).
//
// Derivation of the blocked recurrence (row k of L):
//   Yhat(i) = A(i,k) - sum_{j in pattern, j<i} L(i,j) * Yhat(j)
//   L(k,i)  = Yhat(i)^T * D(i)^-1
//   D(k)    = A(k,k) - sum_i L(k,i) * Yhat(i)
// which is the scalar up-looking algorithm with scalars replaced by 6x6
// blocks (order matters; D symmetric).
//
// C ABI, consumed via ctypes. Single-threaded (matches Ceres' default
// single-threaded simplicial path).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

using i64 = int64_t;

constexpr int B = 6;
constexpr int BB = B * B;

// y -= a * b   (all 6x6 row-major)
inline void mm_sub(double* __restrict y, const double* __restrict a,
                   const double* __restrict b) {
  for (int i = 0; i < B; ++i)
    for (int k = 0; k < B; ++k) {
      const double aik = a[i * B + k];
      for (int j = 0; j < B; ++j) y[i * B + j] -= aik * b[k * B + j];
    }
}

// out = a^T * b   (6x6)
inline void mTm(double* __restrict out, const double* __restrict a,
                const double* __restrict b) {
  for (int i = 0; i < B; ++i)
    for (int j = 0; j < B; ++j) {
      double s = 0.0;
      for (int k = 0; k < B; ++k) s += a[k * B + i] * b[k * B + j];
      out[i * B + j] = s;
    }
}

// dense 6x6 inverse via partial-pivot Gauss-Jordan
inline bool inv6(const double* a_in, double* out) {
  double a[BB];
  std::memcpy(a, a_in, sizeof(a));
  double id[BB] = {0};
  for (int i = 0; i < B; ++i) id[i * B + i] = 1.0;
  for (int c = 0; c < B; ++c) {
    int p = c;
    for (int r = c + 1; r < B; ++r)
      if (std::abs(a[r * B + c]) > std::abs(a[p * B + c])) p = r;
    if (a[p * B + c] == 0.0) return false;
    if (p != c)
      for (int j = 0; j < B; ++j) {
        std::swap(a[p * B + j], a[c * B + j]);
        std::swap(id[p * B + j], id[c * B + j]);
      }
    const double piv = 1.0 / a[c * B + c];
    for (int j = 0; j < B; ++j) {
      a[c * B + j] *= piv;
      id[c * B + j] *= piv;
    }
    for (int r = 0; r < B; ++r) {
      if (r == c) continue;
      const double f = a[r * B + c];
      if (f == 0.0) continue;
      for (int j = 0; j < B; ++j) {
        a[r * B + j] -= f * a[c * B + j];
        id[r * B + j] -= f * id[c * B + j];
      }
    }
  }
  std::memcpy(out, id, sizeof(id));
  return true;
}

struct Factor {
  i64 n = 0;
  std::vector<i64> Ap, Ai;        // input upper block pattern (CSC)
  std::vector<i64> parent;        // block elimination tree
  std::vector<i64> Lp;            // L column pointers (strictly lower)
  std::vector<i64> Li;            // L row indices
  std::vector<i64> Lnz;           // filled-so-far per column (numeric pass)
  std::vector<double> Lx;         // (nnzL, 36)
  std::vector<double> D, Dinv;    // (n, 36)
  std::vector<i64> flag, pattern;
  std::vector<double> Y;          // (n, 36) sparse block accumulator
};

}  // namespace

extern "C" {

Factor* kpg_ldl_symbolic(i64 n, const i64* Ap, const i64* Ai) {
  Factor* F = new Factor;
  F->n = n;
  F->Ap.assign(Ap, Ap + n + 1);
  F->Ai.assign(Ai, Ai + Ap[n]);
  F->parent.assign(n, -1);
  F->flag.assign(n, -1);
  F->pattern.assign(n, 0);
  std::vector<i64> counts(n, 0);

  for (i64 k = 0; k < n; ++k) {
    F->parent[k] = -1;
    F->flag[k] = k;
    for (i64 p = Ap[k]; p < Ap[k + 1]; ++p) {
      i64 i = Ai[p];
      if (i >= k) continue;
      for (; F->flag[i] != k; i = F->parent[i]) {
        if (F->parent[i] == -1) F->parent[i] = k;
        counts[i]++;
        F->flag[i] = k;
      }
    }
  }
  F->Lp.assign(n + 1, 0);
  for (i64 k = 0; k < n; ++k) F->Lp[k + 1] = F->Lp[k] + counts[k];
  F->Li.assign(F->Lp[n], 0);
  F->Lnz.assign(n, 0);
  F->Lx.assign((size_t)F->Lp[n] * BB, 0.0);
  F->D.assign((size_t)n * BB, 0.0);
  F->Dinv.assign((size_t)n * BB, 0.0);
  F->Y.assign((size_t)n * BB, 0.0);
  return F;
}

void kpg_ldl_free(Factor* F) { delete F; }
i64 kpg_ldl_nnz_blocks(const Factor* F) { return F->Lp[F->n]; }

// Numeric factorization; Ax holds (nnzA, 36) row-major blocks aligned with
// the symbolic pattern (upper blocks A(i,k) for i<k, symmetric diagonal).
// Returns 0, or -1 if a diagonal block is singular.
int kpg_ldl_numeric(Factor* F, const double* Ax) {
  const i64 n = F->n;
  const i64* Ap = F->Ap.data();
  const i64* Ai = F->Ai.data();
  std::fill(F->flag.begin(), F->flag.end(), -1);
  std::fill(F->Lnz.begin(), F->Lnz.end(), 0);

  for (i64 k = 0; k < n; ++k) {
    // ---- scatter column k of A (upper) into Y; build row-k pattern
    i64 top = n;
    F->flag[k] = k;
    double* Dk = &F->D[(size_t)k * BB];
    std::memset(Dk, 0, BB * sizeof(double));
    for (i64 p = Ap[k]; p < Ap[k + 1]; ++p) {
      i64 i = Ai[p];
      if (i > k) continue;
      if (i == k) {
        std::memcpy(Dk, &Ax[(size_t)p * BB], BB * sizeof(double));
        continue;
      }
      std::memcpy(&F->Y[(size_t)i * BB], &Ax[(size_t)p * BB],
                  BB * sizeof(double));
      i64 len = 0;
      for (; F->flag[i] != k; i = F->parent[i]) {
        F->pattern[len++] = i;
        F->flag[i] = k;
      }
      while (len > 0) F->pattern[--top] = F->pattern[--len];
    }

    // ---- blocked sparse triangular solve for row k of L
    for (; top < n; ++top) {
      const i64 i = F->pattern[top];
      double yi[BB];
      std::memcpy(yi, &F->Y[(size_t)i * BB], BB * sizeof(double));
      std::memset(&F->Y[(size_t)i * BB], 0, BB * sizeof(double));

      // propagate: Y[r] -= L(r,i) * yi for existing rows r (< k) of col i
      const i64 p2 = F->Lp[i] + F->Lnz[i];
      for (i64 p = F->Lp[i]; p < p2; ++p)
        mm_sub(&F->Y[(size_t)F->Li[p] * BB], &F->Lx[(size_t)p * BB], yi);

      // L(k,i) = yi^T * Dinv[i]  (Dinv symmetric: = (Dinv[i] * yi)^T)
      double lki[BB];
      mTm(lki, yi, &F->Dinv[(size_t)i * BB]);
      // D[k] -= L(k,i) * yi
      mm_sub(Dk, lki, yi);
      // append to column i of L
      F->Li[p2] = k;
      std::memcpy(&F->Lx[(size_t)p2 * BB], lki, BB * sizeof(double));
      F->Lnz[i]++;
    }
    if (!inv6(Dk, &F->Dinv[(size_t)k * BB])) return -1;
  }
  return 0;
}

// Solve L D L^T x = b in place; b is (n, 6).
void kpg_ldl_solve(const Factor* F, double* b) {
  const i64 n = F->n;
  // forward: b[r] -= L(r,i) * b[i]
  for (i64 i = 0; i < n; ++i) {
    const double* bi = &b[(size_t)i * B];
    for (i64 p = F->Lp[i]; p < F->Lp[i + 1]; ++p) {
      const double* L = &F->Lx[(size_t)p * BB];
      double* br = &b[(size_t)F->Li[p] * B];
      for (int r = 0; r < B; ++r) {
        double s = 0.0;
        for (int c = 0; c < B; ++c) s += L[r * B + c] * bi[c];
        br[r] -= s;
      }
    }
  }
  // diagonal: b[i] = Dinv[i] * b[i]
  for (i64 i = 0; i < n; ++i) {
    const double* Di = &F->Dinv[(size_t)i * BB];
    double* bi = &b[(size_t)i * B];
    double t[B];
    for (int r = 0; r < B; ++r) {
      double s = 0.0;
      for (int c = 0; c < B; ++c) s += Di[r * B + c] * bi[c];
      t[r] = s;
    }
    std::memcpy(bi, t, sizeof(t));
  }
  // backward: b[i] -= L(r,i)^T * b[r]
  for (i64 i = n - 1; i >= 0; --i) {
    double* bi = &b[(size_t)i * B];
    for (i64 p = F->Lp[i]; p < F->Lp[i + 1]; ++p) {
      const double* L = &F->Lx[(size_t)p * BB];
      const double* br = &b[(size_t)F->Li[p] * B];
      for (int c = 0; c < B; ++c) {
        double s = 0.0;
        for (int r = 0; r < B; ++r) s += L[r * B + c] * br[r];
        bi[c] -= s;
      }
    }
  }
}

}  // extern "C"
