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
// Word-boundary NQ answer matching (DPR SimpleTokenizer semantics,
// dataprocess/NQ_dpr/get_answers.py:36-141):
//   * tokens are runs of codepoints in categories L/N/M, or single
//     non-whitespace characters (whitespace = categories Z/C),
//   * tokens are lowercased; an answer matches a passage when its token
//     SEQUENCE appears contiguously in the passage's token sequence
//     ("art" does NOT hit "start").
// The Unicode category and lowercase tables are built by the Python side
// from unicodedata (exact regex \p{L}\p{N}\p{M} / \p{Z}\p{C} parity):
//   cat[cp]  : 0 = whitespace/control (skip), 1 = alnum (run),
//              2 = other (single-char token)
//   lower[cp]: simple lowercase mapping.
// Tokens are compared via 64-bit FNV-1a over lowercased codepoints.
// ---------------------------------------------------------------------------
static const uint64_t FNV_OFF = 1469598103934665603ULL;
static const uint64_t FNV_PRIME = 1099511628211ULL;

// decode one UTF-8 codepoint; returns bytes consumed (>=1)
static inline int utf8_decode(const unsigned char* p, int64_t avail,
                              uint32_t* cp) {
  unsigned char c = p[0];
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && avail >= 2) {
    *cp = ((c & 0x1F) << 6) | (p[1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && avail >= 3) {
    *cp = ((c & 0x0F) << 12) | ((p[1] & 0x3F) << 6) | (p[2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && avail >= 4) {
    *cp = ((c & 0x07) << 18) | ((p[1] & 0x3F) << 12)
        | ((p[2] & 0x3F) << 6) | (p[3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

// tokenize text into per-token FNV hashes; returns token count (which may
// exceed max_tokens — only the first max_tokens are written)
static int64_t tokenize_to_hashes(const char* text, int64_t len,
                                  const uint8_t* cat,
                                  const uint32_t* lower,
                                  uint64_t* out, int64_t max_tokens) {
  const unsigned char* p = (const unsigned char*)text;
  int64_t i = 0, nt = 0;
  uint64_t h = FNV_OFF;
  bool in_tok = false;
  while (i < len) {
    uint32_t cp;
    int adv = utf8_decode(p + i, len - i, &cp);
    i += adv;
    uint8_t k = cat[cp];
    if (k == 1) {                       // alnum: extend the run
      uint32_t lc = lower[cp];
      if (!in_tok) { h = FNV_OFF; in_tok = true; }
      h = (h ^ lc) * FNV_PRIME;
    } else {
      if (in_tok) {                     // close the run
        if (nt < max_tokens) out[nt] = h;
        ++nt;
        in_tok = false;
      }
      if (k == 2) {                     // single-char token
        uint64_t h1 = (FNV_OFF ^ lower[cp]) * FNV_PRIME;
        if (nt < max_tokens) out[nt] = h1;
        ++nt;
      }
    }
  }
  if (in_tok) {
    if (nt < max_tokens) out[nt] = h;
    ++nt;
  }
  return nt;
}

int64_t tokenize_hashes(const char* text, int64_t len, const uint8_t* cat,
                        const uint32_t* lower, uint64_t* out,
                        int64_t max_tokens) {
  return tokenize_to_hashes(text, len, cat, lower, out, max_tokens);
}

// One pass over all passages vs all queries' answer token sequences.
// Answers are concatenated hash sequences (ans_hashes / ans_offsets) with
// ans_query mapping each answer to its query. Emits (passage, query)
// pairs into out_pairs (capacity pairs); returns the total number found
// (caller re-calls with a larger buffer if > capacity).
int64_t match_answer_sets(const char* passages, const int64_t* p_offsets,
                          int64_t n_passages, const uint8_t* cat,
                          const uint32_t* lower,
                          const uint64_t* ans_hashes,
                          const int64_t* ans_offsets,
                          const int32_t* ans_query, int64_t n_answers,
                          int64_t n_queries, int32_t* out_pairs,
                          int64_t capacity) {
  // index answers by first token hash
  struct Bucket { uint64_t first; std::vector<int32_t> answers; };
  std::vector<std::pair<uint64_t, int32_t>> first_tok;
  first_tok.reserve(n_answers);
  for (int64_t a = 0; a < n_answers; ++a) {
    int64_t s = ans_offsets[a], e = ans_offsets[a + 1];
    if (e > s) first_tok.emplace_back(ans_hashes[s], (int32_t)a);
  }
  std::sort(first_tok.begin(), first_tok.end());
  std::vector<uint64_t> keys(first_tok.size());
  for (size_t i = 0; i < first_tok.size(); ++i)
    keys[i] = first_tok[i].first;

  const unsigned nt = std::max(1u, std::thread::hardware_concurrency());
  std::vector<std::thread> ts;
  std::atomic<int64_t> next(0), cursor(0);
  const int64_t block = 1024;
  const int64_t MAXTOK = 4096;
  for (unsigned t = 0; t < nt; ++t) {
    ts.emplace_back([&]() {
      std::vector<uint64_t> toks(MAXTOK);
      std::vector<int64_t> qhit_epoch(n_queries, -1);
      for (;;) {
        int64_t s = next.fetch_add(block);
        if (s >= n_passages) break;
        int64_t e = std::min(n_passages, s + block);
        for (int64_t i = s; i < e; ++i) {
          const char* text = passages + p_offsets[i];
          int64_t len = p_offsets[i + 1] - p_offsets[i];
          int64_t ntk = tokenize_to_hashes(text, len, cat, lower,
                                           toks.data(), MAXTOK);
          if (ntk > MAXTOK) ntk = MAXTOK;
          for (int64_t pos = 0; pos < ntk; ++pos) {
            // all answers whose first token == toks[pos]
            auto lo = std::lower_bound(keys.begin(), keys.end(),
                                       toks[pos]);
            for (size_t bi = lo - keys.begin();
                 bi < keys.size() && keys[bi] == toks[pos]; ++bi) {
              int32_t a = first_tok[bi].second;
              int32_t q = ans_query[a];
              if (qhit_epoch[q] == i) continue;     // query already hit
              int64_t as = ans_offsets[a], ae = ans_offsets[a + 1];
              int64_t alen = ae - as;
              if (pos + alen > ntk) continue;
              bool ok = true;
              for (int64_t j = 1; j < alen; ++j) {
                if (toks[pos + j] != ans_hashes[as + j]) {
                  ok = false;
                  break;
                }
              }
              if (!ok) continue;
              qhit_epoch[q] = i;
              int64_t slot = cursor.fetch_add(1);
              if (slot < capacity) {
                out_pairs[slot * 2] = (int32_t)i;
                out_pairs[slot * 2 + 1] = q;
              }
            }
          }
        }
      }
    });
  }
  for (auto& th : ts) th.join();
  return cursor.load();
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
