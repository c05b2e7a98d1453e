// CPU HNSW baseline — a faithful stand-in for the reference engine.
//
// The reference (`/root/reference`) delegates its ANN work to the usearch
// C++ HNSW library (src/backend/hnsw.rs:112-135): connectivity (M) = 32,
// expansion_add (efConstruction) = 64, expansion_search (ef) = 64, metric
// IP, f32, sequential one-vector-at-a-time insert loop (hnsw.rs:128-131).
// This image has no Rust toolchain (cargo/rustc absent), so the reference
// binary cannot be compiled here; this file reimplements the same
// algorithm + parameters in C++ (hnswlib-style multi-layer HNSW with the
// classic select-neighbors heuristic) as the runnable CPU baseline.
// Build: g++ -O3 -std=c++17 -o hnsw_baseline hnsw_baseline.cpp
//
// Usage:
//   hnsw_baseline corpus.f32 N D queries.f32 Q K M efC efS metric out_ids.i32
// Prints one JSON line: {"build_s":..,"search_s":..,"qps":..}
// Writes Q*K int32 neighbor ids to out_ids.i32 (recall computed in Python).

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <random>
#include <string>
#include <vector>

static int DIM;
static bool METRIC_L2;

static inline float dist(const float* a, const float* b) {
  // distance = lower is better. IP -> -dot (MIPS), L2 -> squared L2.
  float acc = 0.f;
  if (METRIC_L2) {
    for (int i = 0; i < DIM; i++) {
      float d = a[i] - b[i];
      acc += d * d;
    }
    return acc;
  }
  for (int i = 0; i < DIM; i++) acc += a[i] * b[i];
  return -acc;
}

struct HNSW {
  int M, Mmax0, efC;
  double mult;  // level multiplier 1/ln(M)
  size_t n = 0;
  const float* data = nullptr;

  std::vector<int> levels;                 // level of each node
  std::vector<int> links0;                 // [n * (Mmax0+1)]: cnt, ids...
  std::vector<std::vector<int>> linksU;    // upper-level links, packed per node
  int entry = -1, max_level = -1;
  std::vector<int> visited;                // epoch-stamped visited set
  int epoch = 0;
  std::mt19937_64 rng{42};

  const float* vec(int i) const { return data + (size_t)i * DIM; }
  int* l0(int i) { return links0.data() + (size_t)i * (Mmax0 + 1); }
  // upper level l>=1 for node i: slot (l-1) blocks of (M+1)
  int* lu(int i, int l) { return linksU[i].data() + (size_t)(l - 1) * (M + 1); }

  using PQ = std::priority_queue<std::pair<float, int>>;  // max-heap on dist

  void search_layer(const float* q, int ep, float epd, int ef, int level,
                    PQ& best /*out: up-to-ef closest, max-heap*/) {
    ++epoch;
    visited[ep] = epoch;
    std::priority_queue<std::pair<float, int>,
                        std::vector<std::pair<float, int>>,
                        std::greater<>> cand;  // min-heap on dist
    cand.emplace(epd, ep);
    best.emplace(epd, ep);
    while (!cand.empty()) {
      auto [cd, c] = cand.top();
      if (cd > best.top().first && (int)best.size() >= ef) break;
      cand.pop();
      int* lk = level == 0 ? l0(c) : lu(c, level);
      int cnt = lk[0];
      for (int j = 1; j <= cnt; j++) {
        int nb = lk[j];
        if (visited[nb] == epoch) continue;
        visited[nb] = epoch;
        float d = dist(q, vec(nb));
        if ((int)best.size() < ef || d < best.top().first) {
          cand.emplace(d, nb);
          best.emplace(d, nb);
          if ((int)best.size() > ef) best.pop();
        }
      }
    }
  }

  // classic heuristic: keep a candidate only if it is closer to q than to
  // every already-kept neighbor (diversity pruning)
  void select_neighbors(const float* q, PQ& cands, int m,
                        std::vector<int>& out) {
    std::vector<std::pair<float, int>> sorted;
    sorted.reserve(cands.size());
    while (!cands.empty()) { sorted.push_back(cands.top()); cands.pop(); }
    std::sort(sorted.begin(), sorted.end());  // ascending distance
    out.clear();
    for (auto& [d, id] : sorted) {
      if ((int)out.size() >= m) break;
      bool ok = true;
      for (int kept : out)
        if (dist(vec(id), vec(kept)) < d) { ok = false; break; }
      if (ok) out.push_back(id);
    }
    // backfill with nearest skipped if underfull (hnswlib keepPruned)
    if ((int)out.size() < m)
      for (auto& [d, id] : sorted) {
        if ((int)out.size() >= m) break;
        if (std::find(out.begin(), out.end(), id) == out.end())
          out.push_back(id);
      }
  }

  void connect(int src, const std::vector<int>& nbrs, int level) {
    int cap = level == 0 ? Mmax0 : M;
    int* lk = level == 0 ? l0(src) : lu(src, level);
    lk[0] = (int)std::min(nbrs.size(), (size_t)cap);
    for (int j = 0; j < lk[0]; j++) lk[j + 1] = nbrs[j];
    for (int nb : nbrs) {
      int* nl = level == 0 ? l0(nb) : lu(nb, level);
      if (nl[0] < cap) {
        nl[++nl[0]] = src;
      } else {  // shrink: re-select among existing + src
        PQ pool;
        pool.emplace(dist(vec(src), vec(nb)), src);
        for (int j = 1; j <= nl[0]; j++)
          pool.emplace(dist(vec(nl[j]), vec(nb)), nl[j]);
        std::vector<int> sel;
        select_neighbors(vec(nb), pool, cap, sel);
        nl[0] = (int)sel.size();
        for (int j = 0; j < nl[0]; j++) nl[j + 1] = sel[j];
      }
    }
  }

  void add(int i) {
    std::uniform_real_distribution<double> unif(0.0, 1.0);
    int lvl = (int)(-std::log(unif(rng)) * mult);
    levels[i] = lvl;
    if (lvl >= 1) linksU[i].assign((size_t)lvl * (M + 1), 0);
    if (entry < 0) { entry = i; max_level = lvl; return; }

    int ep = entry;
    float epd = dist(vec(i), vec(ep));
    for (int l = max_level; l > lvl; l--) {  // greedy descent
      bool moved = true;
      while (moved) {
        moved = false;
        int* lk = l == 0 ? l0(ep) : lu(ep, l);
        for (int j = 1; j <= lk[0]; j++) {
          float d = dist(vec(i), vec(lk[j]));
          if (d < epd) { epd = d; ep = lk[j]; moved = true; }
        }
      }
    }
    for (int l = std::min(lvl, max_level); l >= 0; l--) {
      PQ best;
      search_layer(vec(i), ep, epd, efC, l, best);
      PQ pool = best;  // copy for heuristic
      std::vector<int> sel;
      select_neighbors(vec(i), pool, M, sel);
      connect(i, sel, l);
      // next layer's entry = closest found here
      while (best.size() > 1) best.pop();
      ep = best.top().second;
      epd = best.top().first;
    }
    if (lvl > max_level) { max_level = lvl; entry = i; }
  }

  void knn(const float* q, int k, int ef, int* out) {
    int ep = entry;
    float epd = dist(q, vec(ep));
    for (int l = max_level; l >= 1; l--) {
      bool moved = true;
      while (moved) {
        moved = false;
        int* lk = lu(ep, l);
        for (int j = 1; j <= lk[0]; j++) {
          float d = dist(q, vec(lk[j]));
          if (d < epd) { epd = d; ep = lk[j]; moved = true; }
        }
      }
    }
    PQ best;
    search_layer(q, ep, epd, std::max(ef, k), 0, best);
    std::vector<std::pair<float, int>> res;
    while (!best.empty()) { res.push_back(best.top()); best.pop(); }
    std::sort(res.begin(), res.end());
    for (int j = 0; j < k; j++) out[j] = j < (int)res.size() ? res[j].second : -1;
  }
};

static std::vector<float> read_f32(const char* path, size_t count) {
  FILE* f = fopen(path, "rb");
  if (!f) { fprintf(stderr, "cannot open %s\n", path); exit(1); }
  std::vector<float> v(count);
  if (fread(v.data(), 4, count, f) != count) {
    fprintf(stderr, "short read on %s\n", path); exit(1);
  }
  fclose(f);
  return v;
}

int main(int argc, char** argv) {
  if (argc != 12) {
    fprintf(stderr,
            "usage: %s corpus.f32 N D queries.f32 Q K M efC efS ip|l2 out.i32\n",
            argv[0]);
    return 2;
  }
  size_t N = strtoull(argv[2], nullptr, 10);
  DIM = atoi(argv[3]);
  size_t Q = strtoull(argv[5], nullptr, 10);
  int K = atoi(argv[6]), M = atoi(argv[7]), efC = atoi(argv[8]),
      efS = atoi(argv[9]);
  METRIC_L2 = strcmp(argv[10], "l2") == 0;

  auto corpus = read_f32(argv[1], N * DIM);
  auto queries = read_f32(argv[4], Q * DIM);

  HNSW h;
  h.M = M; h.Mmax0 = 2 * M; h.efC = efC; h.mult = 1.0 / std::log((double)M);
  h.n = N; h.data = corpus.data();
  h.levels.assign(N, 0);
  h.links0.assign(N * (size_t)(h.Mmax0 + 1), 0);
  h.linksU.resize(N);
  h.visited.assign(N, 0);

  auto t0 = std::chrono::steady_clock::now();
  for (size_t i = 0; i < N; i++) {
    h.add((int)i);  // sequential insert, as the reference does (hnsw.rs:128)
    if (i % 100000 == 99999)
      fprintf(stderr, "[build] %zu/%zu\n", i + 1, N);
  }
  auto t1 = std::chrono::steady_clock::now();
  double build_s = std::chrono::duration<double>(t1 - t0).count();

  std::vector<int> out(Q * (size_t)K);
  auto t2 = std::chrono::steady_clock::now();
  for (size_t q = 0; q < Q; q++)
    h.knn(queries.data() + q * DIM, K, efS, out.data() + q * (size_t)K);
  auto t3 = std::chrono::steady_clock::now();
  double search_s = std::chrono::duration<double>(t3 - t2).count();

  FILE* f = fopen(argv[11], "wb");
  fwrite(out.data(), 4, out.size(), f);
  fclose(f);
  printf("{\"build_s\": %.3f, \"search_s\": %.4f, \"qps\": %.1f}\n", build_s,
         search_s, Q / search_s);
  return 0;
}
