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

}  // extern "C"
