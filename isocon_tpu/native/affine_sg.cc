// Affine-gap semi-global alignment with traceback (full DP, CPU).
//
// Native fast path for the engine's align_pairs when running on the CPU
// backend: same recurrence, boundary conditions and tie preferences as
// ops/oracle.py:align_semi_global (itself pinned to the reference's
// parasail sg_trace_scan usage, SW_alignment_module.py:64-86), so results
// are bit-identical to the oracle and to the banded TPU kernels.
//
//   H[i][j] = max(H[i-1][j-1] + s(i,j), E[i][j], F[i][j])
//   E[i][j] = max(H[i][j-1] - open, E[i][j-1] - ext)   (gap in s1)
//   F[i][j] = max(H[i-1][j] - open, F[i-1][j] - ext)   (gap in s2)
//   free end gaps: H[i][0] = H[0][j] = 0; endpoint = max over last
//   row/col, ties prefer larger i then larger j.
//   traceback preference: diag > E > F; gap-open preferred at equality.
//
// Emits the engine's backward opcode stream (OP_DIAG=1 consume both,
// OP_GAPQ=2 '-' in s1 consume s2, OP_GAPT=3 consume s1 '-' in s2) so the
// host assembles alignments with the same ops_to_alignment used for the
// device kernels.
//
// Exposed C ABI (ctypes):
//   void affine_sg_batch(const uint8_t* s1s, const int64_t* s1lens,
//                        const uint8_t* s2s, const int64_t* s2lens,
//                        int64_t stride, int64_t n_pairs,
//                        const int64_t* scores,   // [n_pairs*4] ma,mi,go,ge
//                        int64_t nthreads,
//                        uint8_t* ops_out, int64_t ops_stride,
//                        int64_t* meta_out);      // [n_pairs*6]
//     meta per pair: best, end_i, end_j, stop_i, stop_j, ops_len.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int32_t NEG = -(1 << 29);
constexpr uint8_t OP_DIAG = 1;
constexpr uint8_t OP_GAPQ = 2;
constexpr uint8_t OP_GAPT = 3;
// dir byte: bits 0-1 H source (0 diag, 1 fromE, 2 fromF); bit 2 E opened
// here; bit 3 F opened here
constexpr uint8_t H_DIAG = 0;
constexpr uint8_t H_FROME = 1;
constexpr uint8_t H_FROMF = 2;

struct Work {
  const uint8_t* s1s;
  const int64_t* s1lens;
  const uint8_t* s2s;
  const int64_t* s2lens;
  int64_t stride;
  int64_t n_pairs;
  const int64_t* scores;
  uint8_t* ops_out;
  int64_t ops_stride;
  int64_t* meta_out;
};

void align_one(const Work& w, int64_t p, std::vector<int32_t>& hrow,
               std::vector<int32_t>& erow, std::vector<int32_t>& frow,
               std::vector<uint8_t>& dirs) {
  const uint8_t* s1 = w.s1s + p * w.stride;
  const uint8_t* s2 = w.s2s + p * w.stride;
  const int64_t n = w.s1lens[p];
  const int64_t m = w.s2lens[p];
  const int32_t ma = static_cast<int32_t>(w.scores[p * 4 + 0]);
  const int32_t mi = static_cast<int32_t>(w.scores[p * 4 + 1]);
  const int32_t go = static_cast<int32_t>(w.scores[p * 4 + 2]);
  const int32_t ge = static_cast<int32_t>(w.scores[p * 4 + 3]);
  int64_t* meta = w.meta_out + p * 6;
  uint8_t* ops = w.ops_out + p * w.ops_stride;

  if (n == 0 || m == 0) {
    meta[0] = 0;
    meta[1] = 0;
    meta[2] = 0;
    meta[3] = 0;
    meta[4] = 0;
    meta[5] = 0;
    return;
  }

  hrow.assign(static_cast<size_t>(m + 1), 0);
  erow.assign(static_cast<size_t>(m + 1), NEG);
  frow.assign(static_cast<size_t>(m + 1), NEG);
  dirs.resize(static_cast<size_t>(n) * m);

  // endpoint tracking: max over last row/col, larger i then larger j.
  // Seed with the trivial (n, 0) endpoint, score 0 (preferred over (0, m)
  // by larger i -- same as the oracle's candidate scan).
  int32_t best = 0;
  int64_t bi = n, bj = 0;
  auto consider = [&](int32_t v, int64_t i, int64_t j) {
    if (v > best || (v == best && (i > bi || (i == bi && j > bj)))) {
      best = v;
      bi = i;
      bj = j;
    }
  };

  for (int64_t i = 1; i <= n; ++i) {
    const uint8_t c1 = s1[i - 1];
    uint8_t* drow = &dirs[(i - 1) * m];
    int32_t hdiag = hrow[0];  // H[i-1][0] = 0
    int32_t hl = 0;           // H[i][0] = 0
    int32_t el = NEG;         // E[i][0]
    for (int64_t j = 1; j <= m; ++j) {
      const int32_t hup = hrow[j];    // H[i-1][j]
      const int32_t fup = frow[j];    // F[i-1][j]
      const int32_t e_open = hl - go;
      const int32_t e_ext = el - ge;
      const int32_t e = e_open >= e_ext ? e_open : e_ext;
      const int32_t f_open = hup - go;
      const int32_t f_ext = fup - ge;
      const int32_t f = f_open >= f_ext ? f_open : f_ext;
      const int32_t diag = hdiag + (c1 == s2[j - 1] ? ma : mi);
      int32_t h = diag;
      uint8_t hd = H_DIAG;
      if (e > h) {
        h = e;
        hd = H_FROME;
      }
      if (f > h) {
        h = f;
        hd = H_FROMF;
      }
      // re-pin ties to the oracle's preference diag > E > F
      if (h == diag) {
        hd = H_DIAG;
      } else if (h == e) {
        hd = H_FROME;
      }
      drow[j - 1] = static_cast<uint8_t>(
          hd | ((e_open >= e_ext) ? 4 : 0) | ((f_open >= f_ext) ? 8 : 0));
      hdiag = hup;
      hrow[j] = h;
      erow[j] = e;
      frow[j] = f;
      hl = h;
      el = e;
      if (j == m) consider(h, i, m);
      if (i == n) consider(h, n, j);
    }
  }

  meta[0] = best;
  meta[1] = bi;
  meta[2] = bj;

  // traceback (backward opcodes)
  int64_t i = bi, j = bj, len = 0;
  int state = 0;  // 0 = H, 1 = E, 2 = F
  while (i > 0 && j > 0) {
    const uint8_t bits = dirs[(i - 1) * m + (j - 1)];
    if (state == 0) {
      const uint8_t hd = bits & 3;
      if (hd == H_DIAG) {
        ops[len++] = OP_DIAG;
        --i;
        --j;
      } else if (hd == H_FROME) {
        state = 1;
      } else {
        state = 2;
      }
    } else if (state == 1) {
      ops[len++] = OP_GAPQ;
      if (bits & 4) state = 0;
      --j;
    } else {
      ops[len++] = OP_GAPT;
      if (bits & 8) state = 0;
      --i;
    }
  }
  meta[3] = i;
  meta[4] = j;
  meta[5] = len;
}

}  // namespace

extern "C" {

void affine_sg_batch(const uint8_t* s1s, const int64_t* s1lens,
                     const uint8_t* s2s, const int64_t* s2lens,
                     int64_t stride, int64_t n_pairs, const int64_t* scores,
                     int64_t nthreads, uint8_t* ops_out, int64_t ops_stride,
                     int64_t* meta_out) {
  Work w{s1s, s1lens, s2s, s2lens, stride, n_pairs,
         scores, ops_out, ops_stride, meta_out};
  std::memset(ops_out, 0, static_cast<size_t>(n_pairs) * ops_stride);
  if (nthreads < 1) nthreads = 1;
  nthreads = std::min<int64_t>(nthreads, n_pairs);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    std::vector<int32_t> hrow, erow, frow;
    std::vector<uint8_t> dirs;
    for (;;) {
      const int64_t p = next.fetch_add(1);
      if (p >= w.n_pairs) break;
      align_one(w, p, hrow, erow, frow, dirs);
    }
  };
  if (nthreads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nthreads);
  for (int64_t t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// per-pair-cutoff variant of myers_ed_batch (myers_ed.cc), threaded
int64_t myers_ed(const uint8_t* q, int64_t n, const uint8_t* t, int64_t m,
                 int64_t k);

void myers_ed_batch_k(const uint8_t* qs, const int64_t* qlens,
                      const uint8_t* ts, const int64_t* tlens, int64_t stride,
                      int64_t n_pairs, const int64_t* ks, int64_t nthreads,
                      int64_t* out) {
  if (nthreads < 1) nthreads = 1;
  nthreads = std::min<int64_t>(nthreads, n_pairs);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      const int64_t i = next.fetch_add(1);
      if (i >= n_pairs) break;
      out[i] =
          myers_ed(qs + i * stride, qlens[i], ts + i * stride, tlens[i], ks[i]);
    }
  };
  if (nthreads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nthreads);
  for (int64_t t = 0; t < nthreads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // extern "C"
