// Sort-strategy probe for the native builders: __gnu_parallel::sort vs
// parallel LSD radix (the production sort_kv_by_key in native/builder.cpp).
// Measured on the 4-vCPU build host:
//   13M entries:  gnu_parallel 1.47s (8.8 M/s) | radix16 0.256s | radix11 0.30s
//   120M entries: gnu_parallel 95.1s (1.3 M/s) | radix16 8.2s   | radix11 4.5s
// (the comparison sort collapses at spill-run sizes; 11-bit digits stay
// cache/TLB-resident where 16-bit degrades ~2x at 100M+)
// Build: g++ -O3 -march=native -fopenmp -std=c++17 scripts/sort_probe.cpp

#include <parallel/algorithm>
#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <random>
#include <thread>
#include <vector>

struct KV { uint64_t key; double val; };

static double now() {
  return std::chrono::duration<double>(
      std::chrono::steady_clock::now().time_since_epoch()).count();
}

// LSD radix sort by key, D-bit digits, parallel histogram+scatter
template <int BITS>
void radix_sort(KV* a, KV* tmp, size_t n, int W) {
  constexpr int B = 1 << BITS;
  constexpr uint64_t MASK = B - 1;
  int passes = (64 + BITS - 1) / BITS;
  // trim passes: find highest set bit across keys (rows<2^31 → ~62-bit keys)
  uint64_t ormask = 0;
  {
    std::vector<uint64_t> part(W, 0);
    std::vector<std::thread> th;
    size_t per = (n + W - 1) / W;
    for (int w = 0; w < W; ++w) th.emplace_back([&, w] {
      uint64_t m = 0;
      size_t lo = std::min(n, w * per), hi = std::min(n, lo + per);
      for (size_t i = lo; i < hi; ++i) m |= a[i].key;
      part[w] = m;
    });
    for (auto& t : th) t.join();
    for (int w = 0; w < W; ++w) ormask |= part[w];
  }
  int need = 1; while ((ormask >> need) && need < 64) ++need;
  passes = (need + BITS - 1) / BITS;
  KV* src = a; KV* dst = tmp;
  std::vector<std::vector<size_t>> hist(W, std::vector<size_t>(B));
  size_t per = (n + W - 1) / W;
  for (int p = 0; p < passes; ++p) {
    int shift = p * BITS;
    {
      std::vector<std::thread> th;
      for (int w = 0; w < W; ++w) th.emplace_back([&, w] {
        auto& h = hist[w];
        std::fill(h.begin(), h.end(), 0);
        size_t lo = std::min(n, w * per), hi = std::min(n, lo + per);
        for (size_t i = lo; i < hi; ++i) ++h[(src[i].key >> shift) & MASK];
      });
      for (auto& t : th) t.join();
    }
    // global exclusive prefix over (digit, worker)
    size_t sum = 0;
    for (int d = 0; d < B; ++d)
      for (int w = 0; w < W; ++w) {
        size_t c = hist[w][d]; hist[w][d] = sum; sum += c;
      }
    {
      std::vector<std::thread> th;
      for (int w = 0; w < W; ++w) th.emplace_back([&, w] {
        auto& h = hist[w];
        size_t lo = std::min(n, w * per), hi = std::min(n, lo + per);
        for (size_t i = lo; i < hi; ++i)
          dst[h[(src[i].key >> shift) & MASK]++] = src[i];
      });
      for (auto& t : th) t.join();
    }
    std::swap(src, dst);
  }
  if (src != a) std::memcpy(a, src, n * sizeof(KV));
}

int main(int argc, char** argv) {
  size_t n = argc > 1 ? std::atoll(argv[1]) : 13'000'000;
  int W = std::thread::hardware_concurrency();
  std::mt19937_64 rng(7);
  std::vector<KV> base(n);
  uint64_t nrows = 2'000'000;
  for (auto& kv : base) {
    uint64_t r = rng() % nrows, c = rng() % nrows;
    kv = {(r << 32) | c, 1.0};
  }
  std::vector<KV> work(n), tmp(n);

  auto run = [&](const char* name, auto fn) {
    std::memcpy(work.data(), base.data(), n * sizeof(KV));
    double t = now();
    fn();
    double dt = now() - t;
    bool ok = std::is_sorted(work.begin(), work.end(),
        [](const KV& x, const KV& y) { return x.key < y.key; });
    std::printf("%-18s %8.3fs  %6.1f M/s  %s\n", name, dt, n / dt / 1e6,
                ok ? "ok" : "NOT SORTED");
  };
  run("gnu_parallel::sort", [&] {
    __gnu_parallel::sort(work.data(), work.data() + n,
        [](const KV& x, const KV& y) { return x.key < y.key; });
  });
  run("radix16", [&] { radix_sort<16>(work.data(), tmp.data(), n, W); });
  run("radix11", [&] { radix_sort<11>(work.data(), tmp.data(), n, W); });
  run("radix8",  [&] { radix_sort<8>(work.data(), tmp.data(), n, W); });
  return 0;
}
