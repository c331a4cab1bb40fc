// Myers bit-vector edit distance (block formulation, Hyyro 2003).
//
// CPU baseline and host-side oracle for the TPU wavefront kernel: computes
// the same unit-cost global (NW) edit distance the reference obtains from
// edlib.  Written from the published recurrences, not adapted from any
// existing implementation.  Full-width blocks (no Ukkonen banding) plus a
// sound early abort when a k-cutoff is given:
//   D[n][m] >= D[n][j] - (m - j)  =>  abort once that bound exceeds k.
//
// Exposed C ABI (ctypes):
//   int64_t myers_ed(const uint8_t* q, int64_t n, const uint8_t* t,
//                    int64_t m, int64_t k);
//     returns the edit distance, or -1 if it exceeds k (k < 0 => no cutoff).
//   void myers_ed_batch(const uint8_t* qs, const int64_t* qlens,
//                       const uint8_t* ts, const int64_t* tlens,
//                       int64_t stride, int64_t n_pairs, int64_t k,
//                       int64_t* out);
//
// Sequences are byte codes (any alphabet; the python side passes the
// encode.py codes 0..7).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

using u64 = uint64_t;

struct Block {
  u64 P;  // plus-vertical deltas
  u64 M;  // minus-vertical deltas
};

// Advance one block by one text character; updates score at `score_bit`
// via *score and returns the horizontal delta leaving the block bottom
// (bit 63), for chaining into the next block.
inline int advance_block(Block& b, u64 eq, int hin, int score_bit,
                         int* score) {
  u64 Pv = b.P, Mv = b.M;
  u64 Xv = eq | Mv;
  if (hin < 0) eq |= 1ULL;
  u64 Xh = (((eq & Pv) + Pv) ^ Pv) | eq;

  u64 Ph = Mv | ~(Xh | Pv);
  u64 Mh = Pv & Xh;

  if (Ph & (1ULL << score_bit)) ++*score;
  else if (Mh & (1ULL << score_bit)) --*score;

  int hout = 0;
  if (Ph & (1ULL << 63)) hout = 1;
  else if (Mh & (1ULL << 63)) hout = -1;

  Ph <<= 1;
  Mh <<= 1;
  if (hin < 0) Mh |= 1ULL;
  else if (hin > 0) Ph |= 1ULL;

  b.P = Mh | ~(Xv | Ph);
  b.M = Ph & Xv;
  return hout;
}

}  // namespace

extern "C" {

int64_t myers_ed(const uint8_t* q, int64_t n, const uint8_t* t, int64_t m,
                 int64_t k) {
  if (n == 0) return (k < 0 || m <= k) ? m : -1;
  if (m == 0) return (k < 0 || n <= k) ? n : -1;
  if (k >= 0 && (n > m ? n - m : m - n) > k) return -1;

  const int W = 64;
  const int64_t nblocks = (n + W - 1) / W;
  std::vector<u64> peq(256 * nblocks, 0);
  for (int64_t i = 0; i < n; ++i) {
    peq[static_cast<int64_t>(q[i]) * nblocks + i / W] |= 1ULL << (i % W);
  }

  std::vector<Block> blocks(nblocks, Block{~0ULL, 0ULL});
  // scores[b] tracks the bottom row of block b (row min((b+1)W, n))
  std::vector<int> scores(nblocks);
  for (int64_t b = 0; b < nblocks; ++b) {
    scores[b] = static_cast<int>(std::min<int64_t>((b + 1) * W, n));
  }
  const int last_bit = static_cast<int>((n - 1) % W);

  for (int64_t j = 0; j < m; ++j) {
    const u64* eq = &peq[static_cast<int64_t>(t[j]) * nblocks];
    int hin = 1;  // boundary row: D[0][j] = j
    for (int64_t b = 0; b < nblocks; ++b) {
      int sb = (b == nblocks - 1) ? last_bit : 63;
      hin = advance_block(blocks[b], eq[b], hin, sb, &scores[b]);
    }
    if (k >= 0 && scores[nblocks - 1] - (m - 1 - j) > k) {
      return -1;
    }
  }
  int64_t d = scores[nblocks - 1];
  if (k >= 0 && d > k) return -1;
  return d;
}

void myers_ed_batch(const uint8_t* qs, const int64_t* qlens, const uint8_t* ts,
                    const int64_t* tlens, int64_t stride, int64_t n_pairs,
                    int64_t k, int64_t* out) {
  for (int64_t i = 0; i < n_pairs; ++i) {
    out[i] = myers_ed(qs + i * stride, qlens[i], ts + i * stride, tlens[i], k);
  }
}

}  // extern "C"
