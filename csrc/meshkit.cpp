// meshkit — native mesh/graph preprocessing for helmholtz_x_tpu.
//
// The reference delegates all of this to DOLFINx's C++ core (mesh topology,
// dofmaps) and PETSc (matrix preallocation); here the framework owns it.
// These kernels run once per mesh at setup time but scale with the largest
// cases (177k+ cells), where the pure-numpy fallbacks become the bottleneck.
//
// Exposed via a plain C ABI (loaded with ctypes — no pybind11 in this
// environment).  Build: csrc/build.sh  ->  helmholtz_x_tpu/native/_meshkit.so
//
//   rcm(n, indptr, indices, perm)        reverse Cuthill-McKee ordering
//   coo_dedup(...)                       sort + merge duplicate COO triplets
//   facet_adjacency(...)                 facet -> adjacent cell lookup
//   bandwidth(n, indptr, indices, perm)  half bandwidth under a permutation

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <vector>

extern "C" {

// Reverse Cuthill-McKee on a symmetric CSR graph.  Starts each component
// from a minimum-degree pseudo-peripheral vertex.
void rcm(int64_t n, const int64_t* indptr, const int64_t* indices,
         int64_t* perm) {
  std::vector<int64_t> degree(n);
  for (int64_t i = 0; i < n; ++i) degree[i] = indptr[i + 1] - indptr[i];
  std::vector<char> visited(n, 0);
  std::vector<int64_t> order;
  order.reserve(n);
  std::vector<int64_t> nbrs;

  for (;;) {
    // unvisited vertex of minimum degree
    int64_t start = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && degree[i] < best) { best = degree[i]; start = i; }
    if (start < 0) break;

    std::queue<int64_t> q;
    q.push(start);
    visited[start] = 1;
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      order.push_back(u);
      nbrs.clear();
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int64_t v = indices[k];
        if (!visited[v]) { visited[v] = 1; nbrs.push_back(v); }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int64_t a, int64_t b) { return degree[a] < degree[b]; });
      for (int64_t v : nbrs) q.push(v);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
}

// Half bandwidth of the permuted matrix: max |perm_inv[row]-perm_inv[col]|.
int64_t bandwidth(int64_t nnz, const int64_t* rows, const int64_t* cols,
                  int64_t n, const int64_t* perm) {
  std::vector<int64_t> inv(n);
  for (int64_t i = 0; i < n; ++i) inv[perm[i]] = i;
  int64_t bw = 0;
  for (int64_t k = 0; k < nnz; ++k) {
    int64_t d = inv[rows[k]] - inv[cols[k]];
    if (d < 0) d = -d;
    if (d > bw) bw = d;
  }
  return bw;
}

// Sort COO triplets by (row, col) and sum duplicates.
// Returns the number of unique entries; out_* arrays must have nnz capacity.
int64_t coo_dedup(int64_t nnz, int64_t n, const int64_t* rows,
                  const int64_t* cols, const double* vre, const double* vim,
                  int64_t* out_rows, int64_t* out_cols, double* out_vre,
                  double* out_vim) {
  std::vector<int64_t> idx(nnz);
  for (int64_t i = 0; i < nnz; ++i) idx[i] = i;
  std::sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    int64_t ka = rows[a] * n + cols[a], kb = rows[b] * n + cols[b];
    return ka < kb;
  });
  int64_t m = -1;
  int64_t prev = -1;
  for (int64_t t = 0; t < nnz; ++t) {
    int64_t i = idx[t];
    int64_t key = rows[i] * n + cols[i];
    if (key != prev) {
      ++m;
      out_rows[m] = rows[i];
      out_cols[m] = cols[i];
      out_vre[m] = vre[i];
      out_vim[m] = vim[i];
      prev = key;
    } else {
      out_vre[m] += vre[i];
      out_vim[m] += vim[i];
    }
  }
  return m + 1;
}

// For each query facet (nq x fdim vertex ids, sorted), find the adjacent
// cell: build a hash of all cell faces, first-writer wins (matching the
// python dict semantics in fem/assembly.py).
void facet_adjacency(int64_t nc, int64_t nloc, const int64_t* cells,
                     int64_t nq, int64_t fdim, const int64_t* facets,
                     int64_t* out_cell) {
  // enumerate the (nloc choose fdim) local faces
  std::vector<std::vector<int>> combos;
  std::vector<int> c(fdim);
  // generate combinations of size fdim from nloc
  std::vector<int> comb(fdim);
  for (int i = 0; i < fdim; ++i) comb[i] = i;
  for (;;) {
    combos.push_back(comb);
    int i = fdim - 1;
    while (i >= 0 && comb[i] == nloc - fdim + i) --i;
    if (i < 0) break;
    ++comb[i];
    for (int j = i + 1; j < fdim; ++j) comb[j] = comb[j - 1] + 1;
  }

  auto hash_key = [](const std::vector<int64_t>& v) {
    uint64_t h = 1469598103934665603ull;
    for (int64_t x : v) {
      h ^= (uint64_t)x;
      h *= 1099511628211ull;
    }
    return h;
  };
  std::unordered_map<uint64_t, int64_t> face_map;
  face_map.reserve(nc * combos.size());
  std::vector<int64_t> key(fdim);
  for (int64_t ci = 0; ci < nc; ++ci) {
    for (auto& cb : combos) {
      for (int j = 0; j < fdim; ++j) key[j] = cells[ci * nloc + cb[j]];
      std::sort(key.begin(), key.end());
      uint64_t h = hash_key(key);
      face_map.emplace(h, ci);  // emplace keeps the first writer
    }
  }
  for (int64_t qi = 0; qi < nq; ++qi) {
    for (int j = 0; j < fdim; ++j) key[j] = facets[qi * fdim + j];
    std::sort(key.begin(), key.end());
    auto it = face_map.find(hash_key(key));
    out_cell[qi] = (it == face_map.end()) ? -1 : it->second;
  }
}

}  // extern "C"
