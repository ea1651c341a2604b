// graphslim_tpu native host ops.
//
// First-party C++ for the host-side algorithms that are inherently
// sequential and therefore poor fits for XLA (SURVEY.md §7 hard part 5) —
// the reference delegates these to third-party compiled deps
// (NetworKit C++, PyG C++ samplers; reference SURVEY.md §2.9):
//
//   * csr_from_edges       — sort+dedup+symmetrize edge lists into CSR
//                            (the loader's hot host path)
//   * greedy_matching      — weight-ordered disjoint edge matching
//                            (coarsening contraction)
//   * t_spanner            — greedy spanner with bounded Dijkstra
//                            (reference t_spanner.py via nk)
//   * connected_components — union-find
//
// Exposed through a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <functional>
#include <cstring>
#include <limits>
#include <queue>
#include <utility>
#include <vector>

extern "C" {

// Sort by (row, col), deduplicate (summing weights), return new nnz.
// rows/cols/vals are in/out buffers of length nnz.
int64_t csr_sort_dedup(int64_t* rows, int64_t* cols, double* vals,
                       int64_t nnz) {
  std::vector<int64_t> order(nnz);
  for (int64_t i = 0; i < nnz; ++i) order[i] = i;
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    if (rows[a] != rows[b]) return rows[a] < rows[b];
    return cols[a] < cols[b];
  });
  std::vector<int64_t> r(nnz), c(nnz);
  std::vector<double> v(nnz);
  for (int64_t i = 0; i < nnz; ++i) {
    r[i] = rows[order[i]];
    c[i] = cols[order[i]];
    v[i] = vals[order[i]];
  }
  int64_t out = -1;
  for (int64_t i = 0; i < nnz; ++i) {
    if (out >= 0 && rows[out] == r[i] && cols[out] == c[i]) {
      vals[out] += v[i];
    } else {
      ++out;
      rows[out] = r[i];
      cols[out] = c[i];
      vals[out] = v[i];
    }
  }
  return out + 1;
}

// Greedy disjoint matching: edges sorted by weight descending; marks
// matched pairs into out_pairs (2 entries per match). Returns #matches.
int64_t greedy_matching(const int64_t* src, const int64_t* dst,
                        const double* weight, int64_t m, int64_t n,
                        double r, int64_t* out_pairs) {
  std::vector<int64_t> order(m);
  for (int64_t i = 0; i < m; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return weight[a] > weight[b];
  });
  std::vector<char> marked(n, 0);
  int64_t budget = static_cast<int64_t>(n - (1.0 - r) * n);
  int64_t out = 0;
  for (int64_t k = 0; k < m && out < budget; ++k) {
    int64_t i = src[order[k]], j = dst[order[k]];
    if (i == j || marked[i] || marked[j]) continue;
    marked[i] = marked[j] = 1;
    out_pairs[2 * out] = i;
    out_pairs[2 * out + 1] = j;
    ++out;
  }
  return out;
}

// Greedy t-spanner: process edges lightest first; keep an edge iff the
// current spanner distance between endpoints exceeds t*w. Exact (the
// spanner graph is updated after every accepted edge, unlike the batched
// Python fallback). Returns number of kept edges; kept indices in
// out_keep.
int64_t t_spanner(const int64_t* src, const int64_t* dst,
                  const double* weight, int64_t m, int64_t n, double t,
                  int64_t* out_keep) {
  std::vector<int64_t> order(m);
  for (int64_t i = 0; i < m; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return weight[a] < weight[b];
  });
  // adjacency of the growing spanner
  std::vector<std::vector<std::pair<int64_t, double>>> adj(n);
  std::vector<double> dist(n, std::numeric_limits<double>::infinity());
  std::vector<int64_t> touched;
  int64_t kept = 0;
  using QE = std::pair<double, int64_t>;
  for (int64_t k = 0; k < m; ++k) {
    int64_t e = order[k];
    int64_t u = src[e], v = dst[e];
    double w = weight[e];
    double limit = t * w;
    // bounded Dijkstra from u
    bool reachable = false;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    dist[u] = 0.0;
    touched.push_back(u);
    pq.push({0.0, u});
    while (!pq.empty()) {
      auto [d, x] = pq.top();
      pq.pop();
      if (d > dist[x]) continue;
      if (x == v) {
        reachable = d <= limit;
        break;
      }
      if (d > limit) break;
      for (auto& [y, wy] : adj[x]) {
        double nd = d + wy;
        if (nd <= limit && nd < dist[y]) {
          if (dist[y] == std::numeric_limits<double>::infinity())
            touched.push_back(y);
          dist[y] = nd;
          pq.push({nd, y});
        }
      }
    }
    for (int64_t x : touched)
      dist[x] = std::numeric_limits<double>::infinity();
    touched.clear();
    if (!reachable) {
      adj[u].push_back({v, w});
      adj[v].push_back({u, w});
      out_keep[kept++] = e;
    }
  }
  return kept;
}

// Union-find connected components; writes component id per node.
int64_t connected_components(const int64_t* src, const int64_t* dst,
                             int64_t m, int64_t n, int64_t* out_comp) {
  std::vector<int64_t> parent(n);
  for (int64_t i = 0; i < n; ++i) parent[i] = i;
  std::vector<int64_t>* p = &parent;
  std::function<int64_t(int64_t)> find = [&](int64_t x) {
    while ((*p)[x] != x) {
      (*p)[x] = (*p)[(*p)[x]];
      x = (*p)[x];
    }
    return x;
  };
  for (int64_t e = 0; e < m; ++e) {
    int64_t a = find(src[e]), b = find(dst[e]);
    if (a != b) parent[a] = b;
  }
  std::vector<int64_t> remap(n, -1);
  int64_t next = 0;
  for (int64_t i = 0; i < n; ++i) {
    int64_t root = find(i);
    if (remap[root] < 0) remap[root] = next++;
    out_comp[i] = remap[root];
  }
  return next;
}

}  // extern "C"
