// mevi_native: host-side data-pipeline kernels.
//
// The reference leans on third-party native code for its host hot paths
// (faiss C++, sklearn Cython k-means, 40-way multiprocess python for NQ
// answer matching — dataprocess/NQ_dpr/get_answers.py:106-180). The TPU
// rebuild moves the numeric kernels onto the chip; what remains hot on
// the host is data plumbing, implemented here:
//
//  * build_csr          — counting-sort CSR layout of RQ codes -> cluster
//                         buckets (index/csr.py's device-feeding step) for
//                         21M-doc corpora.
//  * count_lines /      — memory-light TSV scanning: line offsets for a
//    line_offsets         mmap-style random-access reader.
//  * match_answers      — multi-threaded substring matching of answer
//                         strings over passages (NQ answer sets), the
//                         KMP-over-21M-passages job.
//  * sample_cluster_negatives — in-cluster hard-negative sampling for the
//                         twin-tower co-loss (main_models.py:1813-1950,
//                         co_neg_from='clus'), batched, xorshift RNG.
//
// Plain C ABI for ctypes. Build: make (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSR build: codes (n x levels, int32) -> offsets (C+1), doc_ids (n)
// ---------------------------------------------------------------------------
int build_csr(const int32_t* codes, int64_t n, int32_t levels,
              int32_t kary, int64_t* offsets /* C+1 */,
              int32_t* doc_ids /* n */) {
  int64_t C = 1;
  for (int32_t l = 0; l < levels; ++l) C *= kary;
  std::vector<int64_t> idx(n);
  const unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  {
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (unsigned t = 0; t < nt; ++t) {
      int64_t s = t * chunk, e = std::min<int64_t>(n, s + chunk);
      if (s >= e) break;
      ts.emplace_back([&, s, e]() {
        for (int64_t i = s; i < e; ++i) {
          int64_t v = 0;
          const int32_t* row = codes + i * levels;
          for (int32_t l = 0; l < levels; ++l) v = v * kary + row[l];
          idx[i] = v;
        }
      });
    }
    for (auto& th : ts) th.join();
  }
  std::memset(offsets, 0, sizeof(int64_t) * (C + 1));
  for (int64_t i = 0; i < n; ++i) offsets[idx[i] + 1]++;
  for (int64_t c = 0; c < C; ++c) offsets[c + 1] += offsets[c];
  std::vector<int64_t> cursor(offsets, offsets + C);
  for (int64_t i = 0; i < n; ++i)
    doc_ids[cursor[idx[i]]++] = static_cast<int32_t>(i);
  return 0;
}

// ---------------------------------------------------------------------------
// TSV scanning
// ---------------------------------------------------------------------------
int64_t count_lines(const char* buf, int64_t len) {
  int64_t cnt = 0;
  for (int64_t i = 0; i < len; ++i) cnt += (buf[i] == '\n');
  if (len > 0 && buf[len - 1] != '\n') ++cnt;
  return cnt;
}

// offsets[i] = byte offset of line i's start; offsets[n] = len
int64_t line_offsets(const char* buf, int64_t len, int64_t* offsets,
                     int64_t max_lines) {
  int64_t n = 0;
  int64_t start = 0;
  for (int64_t i = 0; i < len && n < max_lines; ++i) {
    if (buf[i] == '\n') {
      offsets[n++] = start;
      start = i + 1;
    }
  }
  if (start < len && n < max_lines) offsets[n++] = start;
  offsets[n] = len;
  return n;
}

// ---------------------------------------------------------------------------
// Answer matching: for each passage, does any answer occur as a substring?
// passages/answers given as concatenated bytes + offsets. Output: for each
// (passage, query) pair where query's answers match, append to a per-thread
// buffer; here we output a bitmap (n_passages x n_queries is too big), so
// the API matches one query's answer set at a time over all passages:
// out[i] = 1 if any answer in the set occurs in passage i.
// ---------------------------------------------------------------------------
static bool contains(const char* hay, int64_t hlen, const char* needle,
                     int64_t nlen) {
  if (nlen == 0 || nlen > hlen) return false;
  // memmem-style scan (answers are short: rolling first-byte filter)
  const char first = needle[0];
  const char* end = hay + hlen - nlen;
  for (const char* p = hay; p <= end; ++p) {
    if (*p == first && std::memcmp(p, needle, nlen) == 0) return true;
  }
  return false;
}

int match_answers(const char* passages, const int64_t* p_offsets,
                  int64_t n_passages, const char* answers,
                  const int64_t* a_offsets, int64_t n_answers,
                  uint8_t* out /* n_passages */) {
  const unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  std::atomic<int64_t> next(0);
  const int64_t block = 4096;
  for (unsigned t = 0; t < nt; ++t) {
    ts.emplace_back([&]() {
      for (;;) {
        int64_t s = next.fetch_add(block);
        if (s >= n_passages) break;
        int64_t e = std::min(n_passages, s + block);
        for (int64_t i = s; i < e; ++i) {
          const char* hay = passages + p_offsets[i];
          int64_t hlen = p_offsets[i + 1] - p_offsets[i];
          uint8_t hit = 0;
          for (int64_t a = 0; a < n_answers && !hit; ++a) {
            const char* nd = answers + a_offsets[a];
            int64_t nlen = a_offsets[a + 1] - a_offsets[a];
            hit = contains(hay, hlen, nd, nlen) ? 1 : 0;
          }
          out[i] = hit;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// In-cluster hard negative sampling (batched).
// offsets/doc_ids: CSR; pos_docs: (b,) positives; cluster_of: (n,) packed
// cluster index per doc. out: (b, n_neg) negatives.
// Fallbacks mirror main_models.py:1853-1949: empty cluster -> random
// corpus docs (the hamming-1 union is handled python-side when needed).
// ---------------------------------------------------------------------------
static inline uint64_t xorshift(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

int sample_cluster_negatives(const int64_t* offsets,
                             const int32_t* doc_ids, int64_t n_docs,
                             const int64_t* cluster_of,
                             const int32_t* pos_docs, int64_t batch,
                             int32_t n_neg, uint64_t seed,
                             int32_t* out /* batch*n_neg */) {
  const unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  int64_t chunk = (batch + nt - 1) / nt;
  for (unsigned t = 0; t < nt; ++t) {
    int64_t s = t * chunk, e = std::min<int64_t>(batch, s + chunk);
    if (s >= e) break;
    ts.emplace_back([&, s, e, t]() {
      uint64_t rng = seed + 0x9e3779b97f4a7c15ULL * (t + 1);
      for (int64_t i = s; i < e; ++i) {
        int32_t pos = pos_docs[i];
        int64_t c = cluster_of[pos];
        int64_t cs = offsets[c], ce = offsets[c + 1];
        int64_t size = ce - cs;
        int32_t* row = out + i * n_neg;
        // cluster members excluding the positive
        int64_t usable = size > 0 ? size - 1 : 0;
        for (int32_t j = 0; j < n_neg; ++j) {
          int32_t cand;
          if (usable > 0) {
            do {
              cand = doc_ids[cs + (int64_t)(xorshift(&rng) % size)];
            } while (cand == pos);
          } else {
            do {
              cand = (int32_t)(xorshift(&rng) % n_docs);
            } while (cand == pos);
          }
          row[j] = cand;
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return 0;
}

}  // extern "C"
