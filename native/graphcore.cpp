// graphcore — native graph-construction core for pcgnn_tpu.
//
// Replaces the host-side heavy lifting of the reference's offline prep
// (`sparse_to_adjlist`, reference src/utils.py:226-254: add self-loops,
// symmetrize, dedupe into adjacency sets) with a multi-threaded CSR
// builder.  The numpy fallback in pcgnn_tpu/graph/csr.py sorts one global
// (src*N + dst) key array — O(E log E) over 2E+N int64 keys; this builder
// uses counting + per-row sorts, O(E log dmax), with no giant key
// intermediate.  At the 10M-node / 200M-edge stress preset this is the
// difference between minutes and seconds of preprocessing.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, int num_threads,
                  const std::function<void(int64_t, int64_t)>& fn) {
  if (num_threads <= 1 || n < (int64_t)1 << 16) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + num_threads - 1) / num_threads;
  for (int t = 0; t < num_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

int clamp_threads(int num_threads) {
  int hw = (int)std::thread::hardware_concurrency();
  if (hw <= 0) hw = 1;
  if (num_threads <= 0 || num_threads > hw) num_threads = hw;
  return num_threads;
}

}  // namespace

extern "C" {

// Capacity (in int64 elements) the caller must provide for `col`.
int64_t gc_csr_capacity(int64_t num_edges, int64_t num_nodes, int symmetrize,
                        int add_self_loops) {
  return num_edges * (symmetrize ? 2 : 1) + (add_self_loops ? num_nodes : 0);
}

// Build a deduplicated CSR from a COO edge list.
//
//   src, dst   : [num_edges] int64 endpoint ids; out-of-range edges dropped.
//   symmetrize : also insert (dst, src) for every edge.
//   add_self_loops : insert (i, i) for every node.
//   indptr     : out [num_nodes + 1].
//   col        : out, capacity >= gc_csr_capacity(...); on return the first
//                `ret` entries hold the CSR column ids, sorted per row.
//
// Returns the final (deduplicated) edge count, or -1 on invalid arguments.
int64_t gc_build_csr(const int64_t* src, const int64_t* dst,
                     int64_t num_edges, int64_t num_nodes, int symmetrize,
                     int add_self_loops, int num_threads, int64_t* indptr,
                     int64_t* col) {
  if (num_nodes < 0 || num_edges < 0 || !indptr || !col) return -1;
  num_threads = clamp_threads(num_threads);

  // ---- pass 1: per-row raw counts (atomic adds; contention is negligible
  // for large N, and 2 hw threads bound the damage anyway) ---------------- //
  std::vector<int64_t> cnt(num_nodes + 1, 0);
  parallel_for(num_edges, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t e = lo; e < hi; ++e) {
      int64_t s = src[e], d = dst[e];
      if (s < 0 || s >= num_nodes || d < 0 || d >= num_nodes) continue;
      std::atomic_ref<int64_t>(cnt[s]).fetch_add(1, std::memory_order_relaxed);
      if (symmetrize)
        std::atomic_ref<int64_t>(cnt[d]).fetch_add(1,
                                                   std::memory_order_relaxed);
    }
  });
  if (add_self_loops)
    for (int64_t i = 0; i < num_nodes; ++i) ++cnt[i];

  // raw (pre-dedup) row starts
  std::vector<int64_t> start(num_nodes + 1, 0);
  for (int64_t i = 0; i < num_nodes; ++i) start[i + 1] = start[i] + cnt[i];
  int64_t raw_total = start[num_nodes];

  // ---- pass 2: scatter columns into the work buffer --------------------- //
  std::vector<int64_t> work((size_t)raw_total);
  std::vector<int64_t> cursor(start.begin(), start.end() - 1);
  parallel_for(num_edges, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t e = lo; e < hi; ++e) {
      int64_t s = src[e], d = dst[e];
      if (s < 0 || s >= num_nodes || d < 0 || d >= num_nodes) continue;
      work[std::atomic_ref<int64_t>(cursor[s]).fetch_add(
          1, std::memory_order_relaxed)] = d;
      if (symmetrize)
        work[std::atomic_ref<int64_t>(cursor[d]).fetch_add(
            1, std::memory_order_relaxed)] = s;
    }
  });
  if (add_self_loops) {
    parallel_for(num_nodes, num_threads, [&](int64_t lo, int64_t hi) {
      for (int64_t i = lo; i < hi; ++i) work[cursor[i]++] = i;
    });
  }

  // ---- pass 3: per-row sort + dedupe, record final degrees -------------- //
  std::vector<int64_t> deg(num_nodes, 0);
  parallel_for(num_nodes, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      int64_t* b = work.data() + start[r];
      int64_t* e = work.data() + start[r + 1];
      std::sort(b, e);
      deg[r] = std::unique(b, e) - b;
    }
  });

  // ---- pass 4: compact into the caller's CSR ----------------------------- //
  indptr[0] = 0;
  for (int64_t i = 0; i < num_nodes; ++i) indptr[i + 1] = indptr[i] + deg[i];
  parallel_for(num_nodes, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r)
      std::memcpy(col + indptr[r], work.data() + start[r],
                  (size_t)deg[r] * sizeof(int64_t));
  });
  return indptr[num_nodes];
}

// Expand CSR rows: row[k] = r for indptr[r] <= k < indptr[r+1].
void gc_expand_rows(const int64_t* indptr, int64_t num_nodes, int num_threads,
                    int64_t* row) {
  num_threads = clamp_threads(num_threads);
  parallel_for(num_nodes, num_threads, [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r)
      for (int64_t k = indptr[r]; k < indptr[r + 1]; ++k) row[k] = r;
  });
}

}  // extern "C"
