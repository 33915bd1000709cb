// Native host-runtime core for the TPU pose-graph framework.
//
// The reference's state store is C++ (src/NodeDataManager.{h,cpp}); this is
// its native analog for the new framework: append-only SoA buffers with
// capacity doubling, O(log N) timestamp->index matching (the reference's
// linear scan NodeDataManager.cpp:274-299 is a known hot spot), the kidnap
// interval log, and the timeline->world mapping with the reference's exact
// boundary conventions (NodeDataManager.cpp:1127-1198).
//
// Exposed as a C ABI consumed from Python via ctypes (zero-copy numpy views
// over the buffers). Thread safety: appends take a mutex; readers see a
// consistent prefix because lengths are published with release stores after
// the element is fully written (single-writer-per-array discipline, same
// contract as the reference's mutex-guarded getters).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

constexpr int64_t kMatchTolNs = 1000000;  // 1 ms, NodeDataManager.cpp:288

struct Store {
  std::mutex mu;

  // nodes
  std::vector<int64_t> ts;
  std::vector<double> q;    // (n,4) xyzw
  std::vector<double> t;    // (n,3)
  std::vector<double> cov;  // (n,36)
  std::atomic<int64_t> n{0};

  // loop edges
  std::vector<int64_t> ea, eb;
  std::vector<double> eq;  // (e,4)
  std::vector<double> et;  // (e,3)
  std::vector<double> ew;  // (e,)
  std::atomic<int64_t> e{0};

  // kidnap intervals (ns). Like the node/edge buffers these are reserved to
  // a hard capacity up front and NEVER reallocate: kpg_which_world /
  // kpg_node_worlds and the Python getters read them lock-free while the
  // ingest thread appends under the mutex, so a reallocating push_back would
  // leave readers walking freed memory. Element counts are published with
  // release stores (read with acquire) after the element is fully written —
  // the same single-writer protocol as the node/edge buffers.
  std::vector<int64_t> kidnap_starts;
  std::vector<int64_t> kidnap_ends;
  std::atomic<int64_t> nks{0};
  std::atomic<int64_t> nke{0};
  std::atomic<bool> kidnapped{false};
  static constexpr int64_t kMaxKidnaps = 65536;

  // Buffers are reserved to max_cap UP FRONT and never reallocate: Python
  // holds zero-copy numpy views into them, and a concurrent push_back that
  // reallocated would leave a reader's view dangling (use-after-free). The
  // reference solves the same problem with static 30k arrays
  // (PoseGraphSLAM.cpp:17-25); we reserve a configurable hard capacity.
  int64_t max_nodes_;
  int64_t max_edges_;

  Store(int64_t cap, int64_t max_cap) {
    cap = std::max<int64_t>(cap, 16);
    max_nodes_ = std::max<int64_t>(max_cap, cap);
    max_edges_ = max_nodes_;
    ts.reserve(max_nodes_);
    q.reserve(max_nodes_ * 4);
    t.reserve(max_nodes_ * 3);
    cov.reserve(max_nodes_ * 36);
    ea.reserve(max_edges_);
    eb.reserve(max_edges_);
    eq.reserve(max_edges_ * 4);
    et.reserve(max_edges_ * 3);
    ew.reserve(max_edges_);
    kidnap_starts.reserve(kMaxKidnaps);
    kidnap_ends.reserve(kMaxKidnaps);
  }
};

int64_t find_index(const Store* s, int64_t t_ns) {
  const int64_t n = s->n.load(std::memory_order_acquire);
  if (n == 0) return -1;
  // first index with ts >= t_ns - tol  (searchsorted left), then check
  const int64_t* base = s->ts.data();
  const int64_t* lo = std::lower_bound(base, base + n, t_ns - kMatchTolNs);
  const int64_t i = lo - base;
  if (i < n && std::llabs(base[i] - t_ns) < kMatchTolNs) return i;
  return -1;
}

}  // namespace

extern "C" {

Store* kpg_store_new(int64_t initial_capacity) {
  return new Store(initial_capacity, 65536);
}

Store* kpg_store_new_max(int64_t initial_capacity, int64_t max_capacity) {
  return new Store(initial_capacity, max_capacity);
}

void kpg_store_free(Store* s) { delete s; }

// returns node index, or -1 on non-monotonic timestamp
int64_t kpg_add_node(Store* s, int64_t t_ns, const double* quat_xyzw,
                     const double* trans, const double* cov36) {
  std::lock_guard<std::mutex> lock(s->mu);
  const int64_t n = s->n.load(std::memory_order_relaxed);
  if (n >= s->max_nodes_) return -2;   // hard capacity (views must not move)
  if (n > 0 && t_ns < s->ts[n - 1]) return -1;
  double norm = std::sqrt(quat_xyzw[0] * quat_xyzw[0] +
                          quat_xyzw[1] * quat_xyzw[1] +
                          quat_xyzw[2] * quat_xyzw[2] +
                          quat_xyzw[3] * quat_xyzw[3]);
  if (norm <= 0) norm = 1.0;
  s->ts.push_back(t_ns);
  for (int k = 0; k < 4; ++k) s->q.push_back(quat_xyzw[k] / norm);
  for (int k = 0; k < 3; ++k) s->t.push_back(trans[k]);
  if (cov36) {
    s->cov.insert(s->cov.end(), cov36, cov36 + 36);
  } else {
    for (int k = 0; k < 36; ++k) s->cov.push_back(0.0);
  }
  s->n.store(n + 1, std::memory_order_release);
  return n;
}

int64_t kpg_find_indexof_node(const Store* s, int64_t t_ns) {
  return find_index(s, t_ns);
}

// returns edge index, or -1 if either timestamp fails to match
int64_t kpg_add_loop_edge(Store* s, int64_t t_ns_a, int64_t t_ns_b,
                          const double* quat_xyzw, const double* trans,
                          double weight) {
  const int64_t ia = find_index(s, t_ns_a);
  const int64_t ib = find_index(s, t_ns_b);
  if (ia < 0 || ib < 0) return -1;
  return [&]() -> int64_t {
    std::lock_guard<std::mutex> lock(s->mu);
    const int64_t e = s->e.load(std::memory_order_relaxed);
    if (e >= s->max_edges_) return -2;
    double norm = std::sqrt(quat_xyzw[0] * quat_xyzw[0] +
                            quat_xyzw[1] * quat_xyzw[1] +
                            quat_xyzw[2] * quat_xyzw[2] +
                            quat_xyzw[3] * quat_xyzw[3]);
    if (norm <= 0) norm = 1.0;
    s->ea.push_back(ia);
    s->eb.push_back(ib);
    for (int k = 0; k < 4; ++k) s->eq.push_back(quat_xyzw[k] / norm);
    for (int k = 0; k < 3; ++k) s->et.push_back(trans[k]);
    s->ew.push_back(weight);
    s->e.store(e + 1, std::memory_order_release);
    return e;
  }();
}

// returns edge index; -1 if either node index is out of range, -2 at the
// hard edge capacity
int64_t kpg_add_loop_edge_by_index(Store* s, int64_t ia, int64_t ib,
                                   const double* quat_xyzw,
                                   const double* trans, double weight) {
  std::lock_guard<std::mutex> lock(s->mu);
  const int64_t n = s->n.load(std::memory_order_relaxed);
  if (ia < 0 || ia >= n || ib < 0 || ib >= n) return -1;
  const int64_t e = s->e.load(std::memory_order_relaxed);
  if (e >= s->max_edges_) return -2;
  double norm = std::sqrt(quat_xyzw[0] * quat_xyzw[0] +
                          quat_xyzw[1] * quat_xyzw[1] +
                          quat_xyzw[2] * quat_xyzw[2] +
                          quat_xyzw[3] * quat_xyzw[3]);
  if (norm <= 0) norm = 1.0;
  s->ea.push_back(ia);
  s->eb.push_back(ib);
  for (int k = 0; k < 4; ++k) s->eq.push_back(quat_xyzw[k] / norm);
  for (int k = 0; k < 3; ++k) s->et.push_back(trans[k]);
  s->ew.push_back(weight);
  s->e.store(e + 1, std::memory_order_release);
  return e;
}

int64_t kpg_node_len(const Store* s) {
  return s->n.load(std::memory_order_acquire);
}
int64_t kpg_edge_len(const Store* s) {
  return s->e.load(std::memory_order_acquire);
}

// buffer pointers (stable for the store's lifetime: buffers are reserved to
// the hard capacity at construction and never reallocate)
const int64_t* kpg_ts_ptr(const Store* s) { return s->ts.data(); }
const double* kpg_q_ptr(const Store* s) { return s->q.data(); }
const double* kpg_t_ptr(const Store* s) { return s->t.data(); }
const double* kpg_cov_ptr(const Store* s) { return s->cov.data(); }
const int64_t* kpg_ea_ptr(const Store* s) { return s->ea.data(); }
const int64_t* kpg_eb_ptr(const Store* s) { return s->eb.data(); }
const double* kpg_eq_ptr(const Store* s) { return s->eq.data(); }
const double* kpg_et_ptr(const Store* s) { return s->et.data(); }
const double* kpg_ew_ptr(const Store* s) { return s->ew.data(); }

// ---------------------------------------------------------------------------
// kidnap state machine (NodeDataManager.cpp:763-852)
// ---------------------------------------------------------------------------

// returns 0 on success, -1 on state-machine violation, -2 at hard capacity
int kpg_mark_kidnapped(Store* s, int64_t t_ns) {
  std::lock_guard<std::mutex> lock(s->mu);
  if (s->kidnapped.load(std::memory_order_relaxed)) return -1;
  const int64_t n = s->nks.load(std::memory_order_relaxed);
  if (n >= Store::kMaxKidnaps) return -2;
  s->kidnapped.store(true, std::memory_order_relaxed);
  s->kidnap_starts.push_back(t_ns);
  s->nks.store(n + 1, std::memory_order_release);
  return 0;
}

int kpg_mark_unkidnapped(Store* s, int64_t t_ns) {
  std::lock_guard<std::mutex> lock(s->mu);
  if (!s->kidnapped.load(std::memory_order_relaxed)) return -1;
  const int64_t n = s->nke.load(std::memory_order_relaxed);
  if (n >= Store::kMaxKidnaps) return -2;
  s->kidnapped.store(false, std::memory_order_relaxed);
  s->kidnap_ends.push_back(t_ns);
  s->nke.store(n + 1, std::memory_order_release);
  return 0;
}

int kpg_is_kidnapped(const Store* s) {
  return s->kidnapped.load(std::memory_order_acquire) ? 1 : 0;
}
int64_t kpg_n_kidnap_starts(const Store* s) {
  return s->nks.load(std::memory_order_acquire);
}
int64_t kpg_n_kidnap_ends(const Store* s) {
  return s->nke.load(std::memory_order_acquire);
}
const int64_t* kpg_kidnap_starts_ptr(const Store* s) {
  return s->kidnap_starts.data();
}
const int64_t* kpg_kidnap_ends_ptr(const Store* s) {
  return s->kidnap_ends.data();
}
// restore from checkpoint. Counts are dropped to zero (release) before the
// buffers are rewritten and re-published after, so a concurrent lock-free
// reader never sees an index beyond fully-written data. (assign() within the
// reserved capacity never reallocates, so data() stays stable.)
void kpg_set_kidnap_data(Store* s, const int64_t* starts, int64_t n_starts,
                         const int64_t* ends, int64_t n_ends, int kidnapped) {
  std::lock_guard<std::mutex> lock(s->mu);
  n_starts = std::min<int64_t>(n_starts, Store::kMaxKidnaps);
  n_ends = std::min<int64_t>(n_ends, Store::kMaxKidnaps);
  s->nks.store(0, std::memory_order_release);
  s->nke.store(0, std::memory_order_release);
  s->kidnap_starts.assign(starts, starts + n_starts);
  s->kidnap_ends.assign(ends, ends + n_ends);
  s->kidnapped.store(kidnapped != 0, std::memory_order_relaxed);
  s->nks.store(n_starts, std::memory_order_release);
  s->nke.store(n_ends, std::memory_order_release);
}

// ---------------------------------------------------------------------------
// timeline -> world mapping, exact branch structure of
// NodeDataManager.cpp:1127-1198 (negative ids = kidnap dead zones)
// ---------------------------------------------------------------------------

namespace {
int which_world_impl(const int64_t* ks, const int64_t* ke, int64_t nks,
                     int64_t nke, int64_t t) {
  if (nks == 0) return 0;
  if (nks == 1) {
    if (t < ks[0]) return 0;
    if (nke == 0) return (t >= ks[0]) ? -1 : 0;
    return (ks[0] <= t && t <= ke[0]) ? -1 : 1;
  }
  if (nks == nke) {
    int64_t prev = 0;
    for (int64_t i = 0; i < nks; ++i) {
      if (prev < t && t <= ks[i]) return (int)i;
      if (ks[i] < t && t <= ke[i]) return -(int)(i + 1);
      prev = ke[i];
    }
    return (int)nke;
  }
  int64_t prev = 0;
  for (int64_t i = 0; i < nks - 1; ++i) {
    if (prev < t && t <= ks[i]) return (int)i;
    if (ks[i] < t && t <= ke[i]) return -(int)(i + 1);
    prev = ke[i];
  }
  const int64_t i = nks - 1;
  if (ke[i - 1] < t && t <= ks[i]) return (int)i;
  return -(int)(i + 1);
}
}  // namespace

int kpg_which_world(const Store* s, int64_t t) {
  // lock-free: element counts come from the release/acquire-published
  // atomics, never from vector::size() (which could race with a writer's
  // push_back bookkeeping)
  return which_world_impl(s->kidnap_starts.data(), s->kidnap_ends.data(),
                          s->nks.load(std::memory_order_acquire),
                          s->nke.load(std::memory_order_acquire), t);
}

// bulk: world id for every node (the per-trigger O(N) hot path); snapshots
// the kidnap counts once so every node is classified against one consistent
// timeline
void kpg_node_worlds(const Store* s, int64_t* out) {
  const int64_t n = s->n.load(std::memory_order_acquire);
  const int64_t* ks = s->kidnap_starts.data();
  const int64_t* ke = s->kidnap_ends.data();
  const int64_t nks = s->nks.load(std::memory_order_acquire);
  const int64_t nke = s->nke.load(std::memory_order_acquire);
  for (int64_t i = 0; i < n; ++i)
    out[i] = which_world_impl(ks, ke, nks, nke, s->ts[i]);
}

}  // extern "C"
