// Native byte-level BPE merge engine.
//
// The reference leans on HuggingFace's Rust "tokenizers" for its data-path
// hot loop; this framework owns the equivalent as a small C++ core bound via
// ctypes (multimodalsum_tpu/native/binding.py). Python keeps the GPT-2
// pre-tokenisation regex (the `regex` package is already C); this engine
// runs the merge loop — the actual hot part — over byte-mapped pre-tokens,
// with a per-token memo cache.
//
// Interface (C ABI):
//   bpe_create(vocab_tsv, merges_tsv) -> handle
//     vocab_tsv:  lines "token\tid"   (tokens in the byte-mapped alphabet,
//                                      which contains no tabs/newlines)
//     merges_tsv: lines "left\tright" in rank order
//   bpe_encode(handle, utf8_pretokens, n_pretokens, out, max_out) -> count
//     utf8_pretokens: '\n'-joined byte-mapped pre-tokens
//   bpe_destroy(handle)

#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

using std::string;
using std::u32string;
using std::vector;

// ---- UTF-8 <-> UTF-32 (the mapped alphabet stays within the BMP) ----------

u32string DecodeUtf8(const char* s, size_t len) {
  u32string out;
  out.reserve(len);
  size_t i = 0;
  while (i < len) {
    unsigned char c = s[i];
    char32_t cp;
    int extra;
    if (c < 0x80) {
      cp = c;
      extra = 0;
    } else if ((c >> 5) == 0x6) {
      cp = c & 0x1F;
      extra = 1;
    } else if ((c >> 4) == 0xE) {
      cp = c & 0x0F;
      extra = 2;
    } else {
      cp = c & 0x07;
      extra = 3;
    }
    ++i;
    for (int k = 0; k < extra && i < len; ++k, ++i) {
      cp = (cp << 6) | (s[i] & 0x3F);
    }
    out.push_back(cp);
  }
  return out;
}

struct U32Hash {
  size_t operator()(const u32string& s) const {
    size_t h = 1469598103934665603ull;
    for (char32_t c : s) {
      h ^= static_cast<size_t>(c);
      h *= 1099511628211ull;
    }
    return h;
  }
};

struct Engine {
  std::unordered_map<u32string, int32_t, U32Hash> vocab;
  std::unordered_map<u32string, int32_t, U32Hash> ranks;  // "left\x1fright"
  std::unordered_map<u32string, vector<int32_t>, U32Hash> cache;
  int32_t unk_id = 3;

  static u32string PairKey(const u32string& a, const u32string& b) {
    u32string k = a;
    k.push_back(0x1F);  // unit separator, not in the mapped alphabet
    k += b;
    return k;
  }

  const vector<int32_t>& Encode(const u32string& token) {
    auto it = cache.find(token);
    if (it != cache.end()) return it->second;

    vector<u32string> word;
    word.reserve(token.size());
    for (char32_t c : token) word.emplace_back(1, c);

    while (word.size() > 1) {
      int best_rank = INT32_MAX;
      size_t best_i = 0;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto r = ranks.find(PairKey(word[i], word[i + 1]));
        if (r != ranks.end() && r->second < best_rank) {
          best_rank = r->second;
          best_i = i;
        }
      }
      if (best_rank == INT32_MAX) break;
      // merge every occurrence of the best pair, left to right (GPT-2 rule)
      const u32string first = word[best_i];
      const u32string second = word[best_i + 1];
      vector<u32string> merged;
      merged.reserve(word.size());
      size_t i = 0;
      while (i < word.size()) {
        if (i + 1 < word.size() && word[i] == first && word[i + 1] == second) {
          merged.emplace_back(first + second);
          i += 2;
        } else {
          merged.push_back(word[i]);
          ++i;
        }
      }
      word.swap(merged);
    }

    vector<int32_t> ids;
    ids.reserve(word.size());
    for (const auto& piece : word) {
      auto v = vocab.find(piece);
      ids.push_back(v != vocab.end() ? v->second : unk_id);
    }
    auto ins = cache.emplace(token, std::move(ids));
    return ins.first->second;
  }
};

}  // namespace

extern "C" {

void* bpe_create(const char* vocab_tsv, const char* merges_tsv) {
  auto* e = new Engine();
  {
    std::ifstream f(vocab_tsv);
    if (!f) {
      delete e;
      return nullptr;
    }
    string line;
    while (std::getline(f, line)) {
      size_t tab = line.rfind('\t');
      if (tab == string::npos) continue;
      u32string tok = DecodeUtf8(line.data(), tab);
      e->vocab[tok] = std::stoi(line.substr(tab + 1));
    }
  }
  {
    std::ifstream f(merges_tsv);
    if (!f) {
      delete e;
      return nullptr;
    }
    string line;
    int32_t rank = 0;
    while (std::getline(f, line)) {
      size_t tab = line.find('\t');
      if (tab == string::npos) continue;
      u32string left = DecodeUtf8(line.data(), tab);
      u32string right =
          DecodeUtf8(line.data() + tab + 1, line.size() - tab - 1);
      e->ranks[Engine::PairKey(left, right)] = rank++;
    }
  }
  return e;
}

void bpe_destroy(void* h) { delete static_cast<Engine*>(h); }

void bpe_set_unk(void* h, int32_t unk_id) {
  static_cast<Engine*>(h)->unk_id = unk_id;
}

// Encode '\n'-joined byte-mapped pre-tokens; returns the number of ids
// written (or the required size if it exceeds max_out — caller retries).
int32_t bpe_encode(void* h, const char* pretokens, int32_t* out,
                   int32_t max_out) {
  auto* e = static_cast<Engine*>(h);
  int32_t count = 0;
  const char* p = pretokens;
  const char* end = p + std::strlen(pretokens);
  while (p < end) {
    const char* nl = static_cast<const char*>(std::memchr(p, '\n', end - p));
    const char* stop = nl ? nl : end;
    if (stop > p) {
      u32string tok = DecodeUtf8(p, stop - p);
      const vector<int32_t>& ids = e->Encode(tok);
      for (int32_t id : ids) {
        if (count < max_out) out[count] = id;
        ++count;
      }
    }
    p = stop + 1;
  }
  return count;
}

}  // extern "C"
