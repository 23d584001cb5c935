// Native host-side runtime kernels for saddle_point_petsc_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; these C++ kernels cover the
// *setup-time host work* that PETSc does in C and that is too slow in
// Python at scale (SURVEY.md §7 hard parts (a),(c)):
//   - ILU(0) factorization on CSR (PCSetUp for -pc_type ilu / bjacobi+ilu)
//   - COO triplet finalization: sort + duplicate summation -> CSR
//     (MatAssemblyBegin/End equivalent for host-side assembly paths)
//   - CSR transpose and diagonal extraction helpers
//
// Exposed with extern "C" and loaded through ctypes
// (saddle_point_petsc_tpu/utils/native.py); pure-numpy fallbacks exist for
// every entry point.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsptpu_native.so \
//        sptpu_native.cpp   (see csrc/Makefile)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// ILU(0): in-place IKJ factorization restricted to the sparsity pattern.
// indptr/indices: CSR structure (column indices sorted within each row);
// data: values, overwritten with L (strict lower, unit diag implicit) and
// U (upper incl. diagonal).  Returns 0 on success, row+1 of a zero pivot.
// ---------------------------------------------------------------------------
int64_t sptpu_ilu0(int64_t n, const int32_t* indptr, const int32_t* indices,
                   double* data) {
  std::vector<int32_t> diag(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      if (indices[p] == i) {
        diag[i] = p;
        break;
      }
    }
    if (diag[i] < 0) return i + 1;  // missing structural diagonal
  }
  // workspace: position of column j in the current row (or -1)
  std::vector<int32_t> pos(n, -1);
  for (int64_t i = 0; i < n; ++i) {
    const int32_t row_beg = indptr[i], row_end = indptr[i + 1];
    for (int32_t p = row_beg; p < row_end; ++p) pos[indices[p]] = p;
    for (int32_t kk = row_beg; kk < row_end; ++kk) {
      const int32_t k = indices[kk];
      if (k >= i) break;
      const double akk = data[diag[k]];
      if (akk == 0.0) {
        for (int32_t p = row_beg; p < row_end; ++p) pos[indices[p]] = -1;
        return k + 1;
      }
      const double lik = data[kk] / akk;
      data[kk] = lik;
      // a_ij -= l_ik * u_kj for j > k within the pattern of row i
      for (int32_t pp = diag[k] + 1; pp < indptr[k + 1]; ++pp) {
        const int32_t j = indices[pp];
        const int32_t pj = pos[j];
        if (pj >= 0) data[pj] -= lik * data[pp];
      }
    }
    for (int32_t p = row_beg; p < row_end; ++p) pos[indices[p]] = -1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// COO -> CSR with duplicate summation.  rows/cols/vals: nnz triplets
// (rows < 0 = padding, dropped).  Outputs: indptr (m+1), out_cols/out_vals
// (capacity nnz; first *out_nnz entries valid).  Returns 0.
// ---------------------------------------------------------------------------
int64_t sptpu_coo_to_csr(int64_t m, int64_t nnz, const int32_t* rows,
                         const int32_t* cols, const double* vals,
                         int32_t* indptr, int32_t* out_cols, double* out_vals,
                         int64_t* out_nnz) {
  std::vector<int64_t> order(nnz);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    const int32_t ra = rows[a] < 0 ? INT32_MAX : rows[a];
    const int32_t rb = rows[b] < 0 ? INT32_MAX : rows[b];
    if (ra != rb) return ra < rb;
    return cols[a] < cols[b];
  });
  int64_t w = -1;
  int32_t prev_r = -2, prev_c = -2;
  for (int64_t q = 0; q < nnz; ++q) {
    const int64_t e = order[q];
    const int32_t r = rows[e];
    if (r < 0 || r >= m) continue;
    const int32_t c = cols[e];
    if (r == prev_r && c == prev_c) {
      out_vals[w] += vals[e];
    } else {
      ++w;
      out_cols[w] = c;
      out_vals[w] = vals[e];
      prev_r = r;
      prev_c = c;
    }
    // record row starts lazily below
  }
  const int64_t total = w + 1;
  *out_nnz = total;
  // rebuild indptr with a counting pass over deduped entries
  std::fill(indptr, indptr + m + 1, 0);
  {
    int64_t w2 = -1;
    prev_r = -2;
    prev_c = -2;
    for (int64_t q = 0; q < nnz; ++q) {
      const int64_t e = order[q];
      const int32_t r = rows[e];
      if (r < 0 || r >= m) continue;
      const int32_t c = cols[e];
      if (!(r == prev_r && c == prev_c)) {
        ++w2;
        indptr[r + 1] += 1;
        prev_r = r;
        prev_c = c;
      }
    }
  }
  for (int64_t i = 0; i < m; ++i) indptr[i + 1] += indptr[i];
  return 0;
}

// ---------------------------------------------------------------------------
// CSR triangular solves (exact, sequential) — host-side validation path and
// small-system coarse solves.  L: strict lower w/ unit diag; U incl diag.
// ---------------------------------------------------------------------------
void sptpu_lower_solve_unit(int64_t n, const int32_t* indptr,
                            const int32_t* indices, const double* data,
                            const double* b, double* x) {
  for (int64_t i = 0; i < n; ++i) {
    double s = b[i];
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      s -= data[p] * x[indices[p]];
    x[i] = s;
  }
}

void sptpu_upper_solve(int64_t n, const int32_t* indptr,
                       const int32_t* indices, const double* data,
                       const double* b, double* x) {
  for (int64_t i = n - 1; i >= 0; --i) {
    double s = b[i];
    double d = 1.0;
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p) {
      const int32_t j = indices[p];
      if (j == i)
        d = data[p];
      else if (j > i)
        s -= data[p] * x[j];
    }
    x[i] = s / d;
  }
}

// Reverse Cuthill-McKee ordering (bandwidth reduction for block solvers).
void sptpu_rcm(int64_t n, const int32_t* indptr, const int32_t* indices,
               int32_t* perm) {
  std::vector<int32_t> deg(n);
  for (int64_t i = 0; i < n; ++i) deg[i] = indptr[i + 1] - indptr[i];
  std::vector<char> visited(n, 0);
  std::vector<int32_t> order;
  order.reserve(n);
  std::vector<int32_t> queue;
  for (int64_t seed_scan = 0; (int64_t)order.size() < n; ++seed_scan) {
    // pick unvisited vertex of minimum degree as the next component seed
    int32_t seed = -1, best = INT32_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && deg[i] < best) {
        best = deg[i];
        seed = (int32_t)i;
      }
    if (seed < 0) break;
    queue.clear();
    queue.push_back(seed);
    visited[seed] = 1;
    for (size_t qh = 0; qh < queue.size(); ++qh) {
      const int32_t v = queue[qh];
      order.push_back(v);
      std::vector<int32_t> nbrs;
      for (int32_t p = indptr[v]; p < indptr[v + 1]; ++p) {
        const int32_t u = indices[p];
        if (!visited[u]) {
          visited[u] = 1;
          nbrs.push_back(u);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t a, int32_t b) { return deg[a] < deg[b]; });
      for (int32_t u : nbrs) queue.push_back(u);
    }
  }
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];  // reverse
}

// ---------------------------------------------------------------------------
// Greedy standard aggregation over a strength graph (smoothed-aggregation
// AMG setup: the PCSetUp-time part of PETSc's PCGAMG "agg" type).
// indptr/indices: CSR of the STRONG off-diagonal connections (symmetric).
// agg (out, length n): aggregate id per node.  Returns aggregate count.
// Three passes (Vanek/Mandel/Brezina):
//   1. a node whose strong neighbours are all unaggregated roots a new
//      aggregate containing itself + those neighbours;
//   2. remaining nodes attach to the strongest-connected adjacent aggregate
//      (first adjacent here: ties are irrelevant for M-matrices);
//   3. leftovers (isolated pockets) form aggregates with any still-free
//      strong neighbours.
// ---------------------------------------------------------------------------
int64_t sptpu_aggregate(int64_t n, const int32_t* indptr,
                        const int32_t* indices, int32_t* agg) {
  for (int64_t i = 0; i < n; ++i) agg[i] = -1;
  int32_t na = 0;
  for (int64_t i = 0; i < n; ++i) {  // pass 1
    if (agg[i] >= 0) continue;
    bool free_nbhd = true;
    for (int32_t p = indptr[i]; p < indptr[i + 1] && free_nbhd; ++p)
      if (agg[indices[p]] >= 0) free_nbhd = false;
    if (!free_nbhd) continue;
    agg[i] = na;
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      agg[indices[p]] = na;
    ++na;
  }
  std::vector<int32_t> attach(n, -1);  // pass 2 (decided on the pass-1 state)
  for (int64_t i = 0; i < n; ++i) {
    if (agg[i] >= 0) continue;
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (agg[indices[p]] >= 0) {
        attach[i] = agg[indices[p]];
        break;
      }
  }
  for (int64_t i = 0; i < n; ++i)
    if (attach[i] >= 0) agg[i] = attach[i];
  for (int64_t i = 0; i < n; ++i) {  // pass 3
    if (agg[i] >= 0) continue;
    agg[i] = na;
    for (int32_t p = indptr[i]; p < indptr[i + 1]; ++p)
      if (agg[indices[p]] < 0) agg[indices[p]] = na;
    ++na;
  }
  return na;
}

}  // extern "C"
