// scalable_e3_gnn_tpu — native host runtime: threaded point-cloud ingest.
//
// The TPU-side octree build (graph/octree.py) starts from Morton-sorted
// points; for multi-host 10M+ point pipelines the encode+sort of the *next*
// shard can run on host CPUs while the device trains on the current one.
// This translation unit provides that host path: a parallel 30-bit Morton
// encode (bit layout identical to graph/morton.py: 10 bits/axis, x highest)
// and a parallel 3-pass LSD radix sort (10-bit digits) producing the sorted
// codes plus the gather permutation.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC -o libe3loader.so loader.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int BITS = 10;  // bits per axis (matches graph/morton.py BITS)
constexpr uint32_t GRID_MAX = (1u << BITS) - 1;

inline uint32_t part1by2(uint32_t x) {
  x &= 0x3FF;
  x = (x | (x << 16)) & 0x030000FF;
  x = (x | (x << 8)) & 0x0300F00F;
  x = (x | (x << 4)) & 0x030C30C3;
  x = (x | (x << 2)) & 0x09249249;
  return x;
}

int num_threads() {
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? static_cast<int>(hc) : 4;
}

template <typename F>
void parallel_for(int64_t n, F body) {
  int nt = num_threads();
  if (n < (1 << 16) || nt <= 1) {
    body(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
    if (b >= e) break;
    ts.emplace_back([=] { body(b, e); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// points [n,3] row-major in the [lo, hi] box -> 30-bit codes [n]
void e3_morton_encode(const float* pts, int64_t n, const float* lo,
                      const float* hi, uint32_t* codes) {
  float sx = (1u << BITS) / (hi[0] - lo[0]);
  float sy = (1u << BITS) / (hi[1] - lo[1]);
  float sz = (1u << BITS) / (hi[2] - lo[2]);
  float lx = lo[0], ly = lo[1], lz = lo[2];
  parallel_for(n, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const float* p = pts + 3 * i;
      auto q = [](float v) {
        long s = static_cast<long>(v);
        if (v < 0) s = 0;
        if (s > static_cast<long>(GRID_MAX)) s = GRID_MAX;
        return static_cast<uint32_t>(s);
      };
      uint32_t x = q((p[0] - lx) * sx), y = q((p[1] - ly) * sy),
               z = q((p[2] - lz) * sz);
      codes[i] = (part1by2(x) << 2) | (part1by2(y) << 1) | part1by2(z);
    }
  });
}

// stable LSD radix sort of 30-bit codes, 3 passes of 10-bit digits.
// codes_sorted[i] = codes[order[i]]; order is the sort permutation.
void e3_morton_sort(const uint32_t* codes, int64_t n, uint32_t* codes_sorted,
                    int32_t* order) {
  constexpr int D = 1 << BITS;  // digit range
  std::vector<uint32_t> key_a(codes, codes + n), key_b(n);
  std::vector<int32_t> idx_a(n), idx_b(n);
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) idx_a[i] = static_cast<int32_t>(i);
  });

  int nt = num_threads();
  int64_t chunk = (n + nt - 1) / nt;
  std::vector<std::vector<int64_t>> hist(nt, std::vector<int64_t>(D));

  uint32_t* ksrc = key_a.data();
  uint32_t* kdst = key_b.data();
  int32_t* isrc = idx_a.data();
  int32_t* idst = idx_b.data();

  for (int pass = 0; pass < 3; ++pass) {
    int shift = pass * BITS;
    // per-thread histograms
    std::vector<std::thread> ts;
    for (int t = 0; t < nt; ++t) {
      int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
      if (b >= e) { std::fill(hist[t].begin(), hist[t].end(), 0); continue; }
      ts.emplace_back([&, t, b, e, shift] {
        auto& h = hist[t];
        std::fill(h.begin(), h.end(), 0);
        for (int64_t i = b; i < e; ++i) ++h[(ksrc[i] >> shift) & (D - 1)];
      });
    }
    for (auto& th : ts) th.join();
    // exclusive prefix over (digit, thread) in digit-major order
    int64_t sum = 0;
    for (int d = 0; d < D; ++d)
      for (int t = 0; t < nt; ++t) {
        int64_t c = hist[t][d];
        hist[t][d] = sum;
        sum += c;
      }
    // scatter (stable within each thread's range)
    ts.clear();
    for (int t = 0; t < nt; ++t) {
      int64_t b = t * chunk, e = std::min<int64_t>(n, b + chunk);
      if (b >= e) continue;
      ts.emplace_back([&, t, b, e, shift] {
        auto& h = hist[t];
        for (int64_t i = b; i < e; ++i) {
          int64_t pos = h[(ksrc[i] >> shift) & (D - 1)]++;
          kdst[pos] = ksrc[i];
          idst[pos] = isrc[i];
        }
      });
    }
    for (auto& th : ts) th.join();
    std::swap(ksrc, kdst);
    std::swap(isrc, idst);
  }
  // after 3 passes (odd), results are in key_b/idx_b == ksrc/isrc
  std::memcpy(codes_sorted, ksrc, sizeof(uint32_t) * n);
  std::memcpy(order, isrc, sizeof(int32_t) * n);
}

// fused: encode + sort + gather points into Morton order.
// pts [n,3] -> pts_sorted [n,3], codes_sorted [n], order [n]
void e3_encode_sort_points(const float* pts, int64_t n, const float* lo,
                           const float* hi, float* pts_sorted,
                           uint32_t* codes_sorted, int32_t* order) {
  std::vector<uint32_t> codes(n);
  e3_morton_encode(pts, n, lo, hi, codes.data());
  e3_morton_sort(codes.data(), n, codes_sorted, order);
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      const float* s = pts + 3 * static_cast<int64_t>(order[i]);
      float* d = pts_sorted + 3 * i;
      d[0] = s[0];
      d[1] = s[1];
      d[2] = s[2];
    }
  });
}

// gather rows: out[i, :] = src[order[i], :] (threaded, for feature arrays)
void e3_gather_rows_f32(const float* src, const int32_t* order, int64_t n,
                        int64_t width, float* out) {
  parallel_for(n, [&](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i)
      std::memcpy(out + i * width, src + static_cast<int64_t>(order[i]) * width,
                  sizeof(float) * width);
  });
}

// --- partitioner hot loops (parallel/partition.py rev tables) -------------
//
// Sender-transpose ("rev") table: for each target row t, the flat slot
// positions i where tgt[i] == t (and mask[i]).  The numpy path sorts the
// 150M-slot target array (argsort + repeat + fancy scatter, ~33 s of the
// 40 s 10M-point dense partition); this is a two-pass threaded counting
// scatter instead — order within a row is irrelevant (take_dense_rev sums).
//
// Protocol: call with rev == nullptr to get q = max per-target count
// (python allocates [n_targets, q]); call again with rev to fill.  mask may
// be null (all slots valid); slots with tgt out of [0, n_targets) are
// skipped (pad indices).

void e3_rev_count(const int32_t* tgt, const uint8_t* mask, int64_t n_slots,
                  int64_t n_targets, int32_t* counts /*[n_targets], zeroed*/) {
  int nt = num_threads();
  int64_t chunk = (n_slots + nt - 1) / nt;
  std::vector<std::vector<int32_t>> hist(nt);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n_slots, b + chunk);
    if (b >= e) { hist[t].assign(n_targets, 0); continue; }
    ts.emplace_back([&, t, b, e] {
      hist[t].assign(n_targets, 0);
      for (int64_t i = b; i < e; ++i) {
        if (mask && !mask[i]) continue;
        int64_t v = tgt[i];
        if (v >= 0 && v < n_targets) ++hist[t][v];
      }
    });
  }
  for (auto& th : ts) th.join();
  parallel_for(n_targets, [&](int64_t b, int64_t e) {
    for (int64_t v = b; v < e; ++v) {
      int32_t s = 0;
      for (int t = 0; t < nt; ++t)
        if (!hist[t].empty()) s += hist[t][v];
      counts[v] = s;
    }
  });
}

void e3_rev_fill(const int32_t* tgt, const uint8_t* mask, int64_t n_slots,
                 int64_t n_targets, int32_t q, int32_t sentinel,
                 int32_t* rev /*[n_targets, q]*/) {
  int nt = num_threads();
  int64_t chunk = (n_slots + nt - 1) / nt;
  std::vector<std::vector<int32_t>> hist(nt);
  std::vector<std::thread> ts;
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n_slots, b + chunk);
    if (b >= e) { hist[t].assign(n_targets, 0); continue; }
    ts.emplace_back([&, t, b, e] {
      hist[t].assign(n_targets, 0);
      for (int64_t i = b; i < e; ++i) {
        if (mask && !mask[i]) continue;
        int64_t v = tgt[i];
        if (v >= 0 && v < n_targets) ++hist[t][v];
      }
    });
  }
  for (auto& th : ts) th.join();
  // per-(thread, target) exclusive start columns + sentinel-pad the tail
  std::vector<int32_t> total(n_targets);
  parallel_for(n_targets, [&](int64_t b, int64_t e) {
    for (int64_t v = b; v < e; ++v) {
      int32_t run = 0;
      for (int t = 0; t < nt; ++t)
        if (!hist[t].empty()) {
          int32_t c = hist[t][v];
          hist[t][v] = run;
          run += c;
        }
      total[v] = run;
      for (int32_t c = run; c < q; ++c) rev[v * q + c] = sentinel;
    }
  });
  ts.clear();
  for (int t = 0; t < nt; ++t) {
    int64_t b = t * chunk, e = std::min<int64_t>(n_slots, b + chunk);
    if (b >= e) continue;
    ts.emplace_back([&, t, b, e] {
      auto& h = hist[t];
      for (int64_t i = b; i < e; ++i) {
        if (mask && !mask[i]) continue;
        int64_t v = tgt[i];
        if (v >= 0 && v < n_targets) {
          int32_t col = h[v]++;
          if (col < q) rev[v * q + col] = static_cast<int32_t>(i);
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

// Batched rev-table fill: all P partitions in one call (VERDICT r4 next #5
// "move the counting-scatter on-chip/off the slow path").  Two wins over
// per-partition e3_rev_fill: (a) the sentinel fill streams over the WHOLE
// [P, n_targets, q] table with std::fill (the per-target scalar tail loops
// were the dominant cost — rev_ext fills a 2.4 GB table for ~2k real
// entries), and (b) partitions scatter in parallel (one thread per
// partition, one cursor histogram each — no cross-thread prefix pass).
void e3_rev_fill_multi(const int32_t* tgt, const uint8_t* mask, int64_t P,
                       int64_t slots_per, int64_t n_targets, int32_t q,
                       int32_t sentinel, int32_t* rev /*[P, n_targets, q]*/) {
  parallel_for(P * n_targets * q, [=](int64_t b, int64_t e) {
    std::fill(rev + b, rev + e, sentinel);
  });
  int nt = num_threads();
  std::atomic<int64_t> next{0};
  std::vector<std::thread> ts;
  for (int t = 0; t < std::min<int64_t>(nt, P); ++t) {
    ts.emplace_back([&] {
      std::vector<int32_t> hist;
      for (;;) {
        int64_t p = next.fetch_add(1);
        if (p >= P) return;
        hist.assign(n_targets, 0);
        const int32_t* tp = tgt + p * slots_per;
        const uint8_t* mp = mask ? mask + p * slots_per : nullptr;
        int32_t* rp = rev + p * n_targets * q;
        for (int64_t i = 0; i < slots_per; ++i) {
          if (mp && !mp[i]) continue;
          int64_t v = tp[i];
          if (v >= 0 && v < n_targets) {
            int32_t col = hist[v]++;
            if (col < q) rp[v * q + col] = static_cast<int32_t>(i);
          }
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

// Zero-page variant: ``rev`` arrives ZERO-INITIALIZED (numpy calloc — the
// kernel maps copy-on-write zero pages, so untouched sentinel regions cost
// nothing), entries are stored as slot+1 with 0 = empty.  This removes the
// full-table sentinel fill entirely: writes collapse from ~8 GB (prefill +
// first-touch) to ~40 MB of real entries at the 10M/P=16 partition.
void e3_rev_scatter1(const int32_t* tgt, const uint8_t* mask, int64_t P,
                     int64_t slots_per, int64_t n_targets, int32_t q,
                     int32_t* rev /*[P, n_targets, q], zeroed*/) {
  int nt = num_threads();
  std::atomic<int64_t> next{0};
  std::vector<std::thread> ts;
  for (int t = 0; t < std::min<int64_t>(nt, P); ++t) {
    ts.emplace_back([&] {
      std::vector<int32_t> hist;
      for (;;) {
        int64_t p = next.fetch_add(1);
        if (p >= P) return;
        hist.assign(n_targets, 0);
        const int32_t* tp = tgt + p * slots_per;
        const uint8_t* mp = mask ? mask + p * slots_per : nullptr;
        int32_t* rp = rev + p * n_targets * q;
        for (int64_t i = 0; i < slots_per; ++i) {
          if (mp && !mp[i]) continue;
          int64_t v = tp[i];
          if (v >= 0 && v < n_targets) {
            int32_t col = hist[v]++;
            if (col < q) rp[v * q + col] = static_cast<int32_t>(i) + 1;
          }
        }
      }
    });
  }
  for (auto& th : ts) th.join();
}

// One threaded pass producing everything the dense partitioner needs per
// sender slot (r5: the equivalent numpy pipeline — SD0 where, OWNER
// minimum-div, SLOC fancy-gather, per-partition remote masks — was ~5 s of
// the real 10M/P=16 partition on this 2-core host):
//   owner[i]  = mask ? min(senders[i]/npp0, pmax) : -1
//   remote[i] = mask && owner != row_owner(row)
//   row_remote[row] |= remote over the row's K slots
void e3_sender_pass(const int32_t* senders, const uint8_t* mask,
                    int64_t n, int64_t k, int64_t npp0, int32_t pmax,
                    int8_t* owner, uint8_t* remote, uint8_t* row_remote) {
  parallel_for(n, [=](int64_t b, int64_t e) {
    for (int64_t row = b; row < e; ++row) {
      int32_t row_own =
          static_cast<int32_t>(std::min<int64_t>(row / npp0, pmax));
      uint8_t any = 0;
      const int64_t base = row * k;
      for (int64_t j = 0; j < k; ++j) {
        int64_t i = base + j;
        bool m = !mask || mask[i];
        int32_t ow = m ? static_cast<int32_t>(std::min<int64_t>(
                             senders[i] / npp0, pmax))
                       : -1;
        owner[i] = static_cast<int8_t>(ow);
        uint8_t rm = m && ow != row_own;
        remote[i] = rm;
        any |= rm;
      }
      row_remote[row] = any;
    }
  });
}

// threaded masked int32 row gather: out[i] = table[mask ? idx[i] : 0]
void e3_take_i32(const int32_t* table, const int32_t* idx,
                 const uint8_t* mask, int64_t s, int32_t* out) {
  parallel_for(s, [=](int64_t b, int64_t e) {
    for (int64_t i = b; i < e; ++i) {
      out[i] = table[(!mask || mask[i]) ? idx[i] : 0];
    }
  });
}

int e3_loader_version() { return 5; }

}  // extern "C"
