// Sparse (BM25 / impact) index builder + tokenizer, exposed as a C API for
// ctypes. TPU-native replacement for the reference's JVM index layer
// (Terrier inverted index, reference scripts/01_index.py:36-72, and
// Pyserini/Lucene impact search, src/retrievers/splade.py:75-78): the host
// side tokenizes and builds impact-ordered CSR postings; scoring runs on
// TPU as gather + segmented reduction (qpp_fusion_rag_tpu/ops/sparse.py).
//
// Build: make -C native   ->  native/libqpp_native.so
//
// BM25 weighting (computed at finalize into the postings impacts):
//   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))          [Lucene BM25 idf]
//   w(t, d) = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
// with BEIR params k1=0.9, b=0.4 (reference src/retrievers/bm25.py:20-26).
// Postings are sorted by impact desc per term so a top-P prefix read is an
// impact-ordered pruning.

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#include "porter.hpp"

namespace {

// Classic SMART/English stopword list (subset used by common IR toolkits).
const char* kStopwords[] = {
    "a", "about", "above", "after", "again", "against", "all", "am", "an",
    "and", "any", "are", "as", "at", "be", "because", "been", "before",
    "being", "below", "between", "both", "but", "by", "can", "cannot",
    "could", "did", "do", "does", "doing", "down", "during", "each", "few",
    "for", "from", "further", "had", "has", "have", "having", "he", "her",
    "here", "hers", "herself", "him", "himself", "his", "how", "i", "if",
    "in", "into", "is", "it", "its", "itself", "me", "more", "most", "my",
    "myself", "no", "nor", "not", "of", "off", "on", "once", "only", "or",
    "other", "ought", "our", "ours", "ourselves", "out", "over", "own",
    "same", "she", "should", "so", "some", "such", "than", "that", "the",
    "their", "theirs", "them", "themselves", "then", "there", "these",
    "they", "this", "those", "through", "to", "too", "under", "until", "up",
    "very", "was", "we", "were", "what", "when", "where", "which", "while",
    "who", "whom", "why", "with", "would", "you", "your", "yours",
    "yourself", "yourselves",
};

struct Posting {
  int32_t doc;
  float value;  // tf during build; impact weight after finalize
};

struct Index {
  double k1 = 0.9, b = 0.4;
  bool use_stem = true, use_stop = true;
  bool finalized = false;

  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::vector<Posting>> postings;  // term-major
  std::vector<int32_t> doc_lens;
  std::unordered_set<std::string> stopwords;
  porter::Stemmer stemmer;
  int64_t total_postings = 0;

  Index(double k1_, double b_, bool stem, bool stop)
      : k1(k1_), b(b_), use_stem(stem), use_stop(stop) {
    if (use_stop)
      for (const char* w : kStopwords) stopwords.insert(w);
  }

  // Tokenize text into stemmed terms (shared by doc + query paths).
  void tokenize(const char* text, std::vector<std::string>& out) {
    out.clear();
    std::string tok;
    for (const char* p = text;; p++) {
      char c = *p;
      if (c && std::isalnum(static_cast<unsigned char>(c))) {
        tok.push_back(std::tolower(static_cast<unsigned char>(c)));
        continue;
      }
      if (!tok.empty()) {
        if (tok.size() <= 40 && (!use_stop || !stopwords.count(tok))) {
          out.push_back(use_stem ? stemmer.stem(tok) : tok);
        }
        tok.clear();
      }
      if (!c) break;
    }
  }

  void add_doc(const char* text) {
    std::vector<std::string> terms;
    tokenize(text, terms);
    int32_t doc = static_cast<int32_t>(doc_lens.size());
    doc_lens.push_back(static_cast<int32_t>(terms.size()));
    std::unordered_map<int32_t, int32_t> tf;
    for (auto& t : terms) {
      auto it = vocab.find(t);
      int32_t id;
      if (it == vocab.end()) {
        id = static_cast<int32_t>(vocab.size());
        vocab.emplace(t, id);
        postings.emplace_back();
      } else {
        id = it->second;
      }
      tf[id]++;
    }
    for (auto& [id, cnt] : tf) {
      postings[id].push_back({doc, static_cast<float>(cnt)});
      total_postings++;
    }
  }

  // Learned-sparse (SPLADE-style) ingestion deliberately has NO C++
  // path: encoder impacts arrive as dense [N, k] arrays, and the CSR
  // assembly is a vectorized numpy sort (SpladeIndex.from_impacts,
  // retrievers/splade.py) — a per-doc string loop here would be slower.

  void finalize(bool bm25_weights) {
    if (finalized) return;
    const double N = static_cast<double>(doc_lens.size());
    double avgdl = 0;
    for (int32_t dl : doc_lens) avgdl += dl;
    avgdl = N > 0 ? avgdl / N : 1.0;
    if (avgdl <= 0) avgdl = 1.0;

    for (auto& plist : postings) {
      if (bm25_weights) {
        const double df = static_cast<double>(plist.size());
        const double idf = std::log(1.0 + (N - df + 0.5) / (df + 0.5));
        for (auto& p : plist) {
          const double tf = p.value;
          const double dl = doc_lens[p.doc];
          p.value = static_cast<float>(
              idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl)));
        }
      }
      std::sort(plist.begin(), plist.end(), [](const Posting& a, const Posting& c) {
        return a.value > c.value || (a.value == c.value && a.doc < c.doc);
      });
    }
    finalized = true;
  }
};

}  // namespace

extern "C" {

void* qpp_idx_new(double k1, double b, int use_stem, int use_stop) {
  return new Index(k1, b, use_stem != 0, use_stop != 0);
}

void qpp_idx_free(void* h) { delete static_cast<Index*>(h); }

void qpp_idx_add_doc(void* h, const char* text) {
  static_cast<Index*>(h)->add_doc(text);
}

// Batch add: `concat` holds n zero-terminated docs back to back.
void qpp_idx_add_docs(void* h, const char* concat, int n) {
  Index* idx = static_cast<Index*>(h);
  const char* p = concat;
  for (int i = 0; i < n; i++) {
    idx->add_doc(p);
    p += std::strlen(p) + 1;
  }
}

void qpp_idx_finalize(void* h, int bm25_weights) {
  static_cast<Index*>(h)->finalize(bm25_weights != 0);
}

int32_t qpp_idx_num_terms(void* h) {
  return static_cast<int32_t>(static_cast<Index*>(h)->vocab.size());
}
int32_t qpp_idx_num_docs(void* h) {
  return static_cast<int32_t>(static_cast<Index*>(h)->doc_lens.size());
}
int64_t qpp_idx_num_postings(void* h) {
  return static_cast<Index*>(h)->total_postings;
}

// Export CSR arrays. offsets has num_terms+1 entries; docs/weights have
// num_postings entries. Call after finalize.
void qpp_idx_export(void* h, int64_t* offsets, int32_t* docs, float* weights) {
  Index* idx = static_cast<Index*>(h);
  int64_t pos = 0;
  offsets[0] = 0;
  for (size_t t = 0; t < idx->postings.size(); t++) {
    for (const auto& p : idx->postings[t]) {
      docs[pos] = p.doc;
      weights[pos] = p.value;
      pos++;
    }
    offsets[t + 1] = pos;
  }
}

void qpp_idx_export_doclens(void* h, int32_t* out) {
  Index* idx = static_cast<Index*>(h);
  std::memcpy(out, idx->doc_lens.data(), idx->doc_lens.size() * sizeof(int32_t));
}

// Vocab dump: terms joined by '\n' in id order. Returns bytes written
// (excluding NUL), or required size if buf is null.
int64_t qpp_idx_vocab_dump(void* h, char* buf, int64_t bufsize) {
  Index* idx = static_cast<Index*>(h);
  std::vector<const std::string*> terms(idx->vocab.size());
  for (auto& [term, id] : idx->vocab) terms[id] = &term;
  int64_t need = 0;
  for (auto* t : terms) need += static_cast<int64_t>(t->size()) + 1;
  if (!buf) return need;
  int64_t pos = 0;
  for (auto* t : terms) {
    if (pos + static_cast<int64_t>(t->size()) + 1 > bufsize) return -1;
    std::memcpy(buf + pos, t->data(), t->size());
    pos += t->size();
    buf[pos++] = '\n';
  }
  return pos;
}

// Load vocab into a fresh index (query-time tokenization after index load).
void qpp_idx_vocab_load(void* h, const char* buf) {
  Index* idx = static_cast<Index*>(h);
  const char* p = buf;
  while (*p) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) break;
    idx->vocab.emplace(std::string(p, nl - p),
                       static_cast<int32_t>(idx->vocab.size()));
    p = nl + 1;
  }
}

// Tokenize a query -> (term_id, count) pairs for in-vocab terms.
// Returns the number of unique in-vocab terms (capped at max_terms).
int32_t qpp_idx_query_terms(void* h, const char* text, int32_t* ids,
                            float* counts, int32_t max_terms) {
  Index* idx = static_cast<Index*>(h);
  std::vector<std::string> terms;
  idx->tokenize(text, terms);
  std::unordered_map<int32_t, float> tf;
  for (auto& t : terms) {
    auto it = idx->vocab.find(t);
    if (it != idx->vocab.end()) tf[it->second] += 1.0f;
  }
  std::vector<std::pair<int32_t, float>> items(tf.begin(), tf.end());
  if (static_cast<int32_t>(items.size()) > max_terms) {
    // deterministic truncation preferring HIGH-IDF (rare) terms: hash
    // iteration order would keep an arbitrary, build-dependent subset
    std::sort(items.begin(), items.end(),
              [idx](const auto& a, const auto& b) {
                size_t dfa = idx->postings[a.first].size();
                size_t dfb = idx->postings[b.first].size();
                if (dfa != dfb) return dfa < dfb;   // rarer first
                return a.first < b.first;
              });
    items.resize(max_terms);
  }
  // stable output order (term id) regardless of map iteration order
  std::sort(items.begin(), items.end());
  int32_t n = 0;
  for (auto& [id, cnt] : items) {
    ids[n] = id;
    counts[n] = cnt;
    n++;
  }
  return n;
}

// Stem a single lowercase token with the same Porter stemmer the index
// builder uses (porter.hpp). Returns the stemmed length; `out` must hold
// at least strlen(in)+1 bytes (stemming never grows a token).
int32_t qpp_stem(const char* in, char* out) {
  static thread_local porter::Stemmer stemmer;
  std::string s = stemmer.stem(in);
  std::memcpy(out, s.c_str(), s.size() + 1);
  return static_cast<int32_t>(s.size());
}

// ---------------------------------------------------------------------------
// Terrier BitPostingIndex decoder (data.inverted.bf / data.direct.bf).
//
// The reference serves BM25 from a Terrier 5.x on-disk index built by
// PyTerrier (reference scripts/01_index.py:36-72); its posting lists are
// bit-compressed by org.terrier.compression.bit.BitOut: per entry a
// gamma-coded id gap (previous id starts at -1) followed by a unary-coded
// term frequency. Bits fill each byte MSB-first; unary is
// zeros-terminated-by-one (value = zeros + 1); gamma is unary(len) then
// len-1 explicit low bits below an implicit leading one.
//
// Decodes all `n_terms` posting lists (df[i] entries each, list i starting
// at byte_off[i]/bit_off[i]) into CSR order. Returns the number of postings
// written, or -(i+1) if list i ran past the buffer or produced an id outside
// [0, max_docid).
int64_t qpp_terrier_decode(const uint8_t* buf, int64_t buf_len,
                           const int64_t* byte_off, const uint8_t* bit_off,
                           const int32_t* dfs, int64_t n_terms,
                           int32_t max_docid,
                           int32_t* out_docids, int32_t* out_tfs) {
  const int64_t total_bits = buf_len * 8;
  int64_t w = 0;
  for (int64_t i = 0; i < n_terms; ++i) {
    int64_t pos = byte_off[i] * 8 + bit_off[i];
    bool bad = false;
    auto read_bit = [&]() -> int {
      if (pos >= total_bits) { bad = true; return 1; }
      int v = (buf[pos >> 3] >> (7 - (pos & 7))) & 1;
      ++pos;
      return v;
    };
    auto read_unary = [&]() -> int64_t {
      int64_t n = 1;
      while (!read_bit()) {
        if (bad || n > total_bits) { bad = true; return 0; }
        ++n;
      }
      return n;
    };
    auto read_gamma = [&]() -> int64_t {
      int64_t u = read_unary() - 1;
      if (bad || u > 62) { bad = true; return 0; }
      int64_t v = 1;
      for (int64_t k = 0; k < u; ++k) v = (v << 1) | read_bit();
      return v;
    };
    int64_t prev = -1;
    for (int32_t j = 0; j < dfs[i]; ++j) {
      int64_t id = prev + read_gamma();
      int64_t tf = read_unary();
      if (bad || id < 0 || id >= max_docid) return -(i + 1);
      out_docids[w] = static_cast<int32_t>(id);
      out_tfs[w] = static_cast<int32_t>(tf);
      ++w;
      prev = id;
    }
  }
  return w;
}


// ---------------------------------------------------------------------------
// Lucene90 postings decoder (.doc): PFOR blocks of 128 (token byte =
// numExceptions<<5 | bitsPerValue; ForUtil lane packing into 2b LE
// longs; patch list) + the VInt tail ((delta<<1|freq==1) + optional
// freq). The ForUtil bit layout is derived at startup by probing a
// faithful port of the Java encode with one-hot values — the packing is
// a pure bit permutation, so decode is the inverse gather (same
// technique as qpp_fusion_rag_tpu/index/lucene.py, verified against the
// committed real SPLADE segment's per-term df/ttf oracles).
namespace lucene90 {

constexpr int kBlock = 128;

inline uint64_t lane_mask(int P, int b) {
  uint64_t m = 0, lane = (b >= 64) ? ~0ULL : ((1ULL << b) - 1);
  for (int k = 0; k < 64; k += P) m |= lane << k;
  return m;
}

// faithful ForUtil.encode port (probe-only; see module comment)
inline void encode_reference(const uint64_t* values, int b, uint8_t* out) {
  int P = b <= 8 ? 8 : b <= 16 ? 16 : 32;
  int n_longs = kBlock * P / 64;
  int lanes = 64 / P;
  uint64_t longs[64];
  for (int i = 0; i < n_longs; ++i) {
    uint64_t acc = 0;
    for (int j = 0; j < lanes; ++j)
      acc |= (values[j * n_longs + i] & ((1ULL << P) - 1))
             << (64 - P * (j + 1));
    longs[i] = acc;
  }
  int nps = b * 2;
  uint64_t tmp[64] = {0};
  int idx = 0;
  int shift = P - b;
  for (int i = 0; i < nps; ++i) tmp[i] = longs[idx++] << shift;
  for (shift -= b; shift >= 0; shift -= b)
    for (int i = 0; i < nps; ++i) tmp[i] |= longs[idx++] << shift;
  int rem = (shift + b);
  uint64_t mask_rem = rem ? lane_mask(P, rem) : 0;
  int ti = 0, rbv = b;
  while (idx < n_longs) {
    if (rbv >= rem) {
      rbv -= rem;
      tmp[ti++] |= (longs[idx] >> rbv) & mask_rem;
      if (rbv == 0) { ++idx; rbv = b; }
    } else {
      uint64_t mask1 = lane_mask(P, rbv);
      uint64_t mask2 = lane_mask(P, rem - rbv);
      tmp[ti] |= (longs[idx++] & mask1) << (rem - rbv);
      rbv = b - rem + rbv;
      tmp[ti++] |= (longs[idx] >> rbv) & mask2;
    }
  }
  for (int i = 0; i < nps; ++i)
    for (int k = 0; k < 8; ++k) out[i * 8 + k] = (tmp[i] >> (8 * k)) & 0xFF;
}

// per-bits inverse permutation: stream bit -> value*64 + bit
struct ForTable {
  std::vector<int32_t> src;  // size 16*b*8, -1 for unused bits
};

inline const ForTable& for_table(int b) {
  static ForTable tables[33];
  static bool ready[33] = {false};
  if (!ready[b]) {
    ForTable t;
    t.src.assign(16 * b * 8, -1);
    uint64_t vals[kBlock] = {0};
    uint8_t buf[16 * 32];
    for (int j = 0; j < kBlock; ++j) {
      for (int bit = 0; bit < b; ++bit) {
        vals[j] = 1ULL << bit;
        encode_reference(vals, b, buf);
        vals[j] = 0;
        for (int p = 0; p < 16 * b; ++p) {
          if (buf[p]) {
            int bi = __builtin_ctz(buf[p]);
            t.src[p * 8 + bi] = j * 64 + bit;
            break;
          }
        }
      }
    }
    tables[b] = std::move(t);
    ready[b] = true;
  }
  return tables[b];
}

struct In {
  const uint8_t* b;
  int64_t pos, len;
  bool bad = false;
  uint8_t u8() {
    if (pos >= len) { bad = true; return 0; }
    return b[pos++];
  }
  uint64_t vlong() {
    uint64_t out = 0;
    int shift = 0;
    while (true) {
      uint8_t x = u8();
      out |= (uint64_t)(x & 0x7F) << shift;
      if (!(x & 0x80) || bad) return out;
      shift += 7;
    }
  }
};

inline bool pfor_block(In& in, int64_t* out) {
  uint8_t token = in.u8();
  int bits = token & 0x1F;
  int n_exc = token >> 5;
  if (bits == 0) {
    uint64_t v = in.vlong();
    for (int i = 0; i < kBlock; ++i) out[i] = (int64_t)v;
  } else {
    if (in.pos + 16 * bits > in.len) { in.bad = true; return false; }
    const ForTable& t = for_table(bits);
    const uint8_t* raw = in.b + in.pos;
    in.pos += 16 * bits;
    for (int i = 0; i < kBlock; ++i) out[i] = 0;
    for (int p = 0; p < 16 * bits; ++p) {
      uint8_t byte = raw[p];
      while (byte) {
        int bi = __builtin_ctz(byte);
        byte &= byte - 1;
        int32_t s = t.src[p * 8 + bi];
        if (s >= 0) out[s >> 6] |= 1LL << (s & 63);
      }
    }
  }
  for (int e = 0; e < n_exc; ++e) {
    uint8_t pos = in.u8();
    uint8_t patch = in.u8();
    out[pos] |= (int64_t)patch << bits;
  }
  return !in.bad;
}

}  // namespace lucene90

// Decode all terms' postings into CSR order. Per term i: doc_fps[i] < 0
// means a singleton (doc id = singles[i], freq = max(1, ttfs[i])).
// Returns postings written, or -(i+1) on a malformed/out-of-range term.
int64_t qpp_lucene_decode_postings(
    const uint8_t* doc, int64_t doc_len,
    const int64_t* doc_fps, const int32_t* dfs, const int64_t* ttfs,
    const int32_t* singles, int64_t n_terms, int32_t has_freqs,
    int32_t max_doc, int32_t* out_docs, int32_t* out_freqs) {
  int64_t w = 0;
  int64_t block[lucene90::kBlock];
  for (int64_t i = 0; i < n_terms; ++i) {
    int32_t df = dfs[i];
    if (doc_fps[i] < 0) {
      if (df != 1 || singles[i] < 0 || singles[i] >= max_doc) return -(i + 1);
      out_docs[w] = singles[i];
      out_freqs[w] = (int32_t)(ttfs[i] > 0 ? ttfs[i] : 1);
      ++w;
      continue;
    }
    lucene90::In in{doc, doc_fps[i], doc_len};
    int64_t prev = 0;  // first delta IS the first doc id
    int64_t freq_sum = 0;
    int32_t k = 0;
    int64_t start_w = w;
    for (; k + lucene90::kBlock <= df; k += lucene90::kBlock) {
      if (!lucene90::pfor_block(in, block)) return -(i + 1);
      for (int j = 0; j < lucene90::kBlock; ++j) {
        prev += block[j];
        if (prev < 0 || prev >= max_doc) return -(i + 1);
        out_docs[w + j] = (int32_t)prev;
      }
      if (has_freqs) {
        if (!lucene90::pfor_block(in, block)) return -(i + 1);
        for (int j = 0; j < lucene90::kBlock; ++j) {
          out_freqs[w + j] = (int32_t)block[j];
          freq_sum += block[j];
        }
      } else {
        for (int j = 0; j < lucene90::kBlock; ++j) out_freqs[w + j] = 1;
        freq_sum += lucene90::kBlock;
      }
      w += lucene90::kBlock;
    }
    for (; k < df; ++k) {
      if (has_freqs) {
        uint64_t code = in.vlong();
        prev += (int64_t)(code >> 1);
        int32_t f = (code & 1) ? 1 : (int32_t)in.vlong();
        out_freqs[w] = f;
        freq_sum += f;
      } else {
        prev += (int64_t)in.vlong();
        out_freqs[w] = 1;
        freq_sum += 1;
      }
      if (in.bad || prev < 0 || prev >= max_doc) return -(i + 1);
      out_docs[w] = (int32_t)prev;
      ++w;
    }
    if (in.bad) return -(i + 1);
    if (has_freqs && ttfs[i] >= 0 && freq_sum != ttfs[i]) return -(i + 1);
    // strictly increasing doc ids
    for (int64_t j = start_w + 1; j < w; ++j)
      if (out_docs[j] <= out_docs[j - 1]) return -(i + 1);
  }
  return w;
}

}  // extern "C"
