// Native BPE merge engine — the hot loop of tokenization.
//
// Rebuild of the reference's native tokenizer core (merge-heap BPE,
// src/TokenSet/Dictionary.hpp:267-340 GTokenizer_Heap; HF_Tokenizer.cpp).
// Pretokenization (Unicode regex) stays in Python (the reference uses
// vendored oniguruma for it); this engine does the O(n·m) ranked merge
// loop over pretoken byte strings, which dominates encode time.
//
// Exposed C ABI (ctypes):
//   ktok_new(...)        build from flat blobs (token bytes + merge table)
//   ktok_encode_batch()  encode many pretokens into an id buffer
//   ktok_free()
//
// Vocabulary blob layout (little endian, produced by python side):
//   n_vocab  u32
//   offsets  u32[n_vocab+1]   (byte offsets into `bytes`)
//   bytes    u8[...]          (raw token byte strings, b2u-decoded)
// Merge table: n_merges u32, then per merge: left u32, right u32, out u32
// (rank = table order).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<uint32_t, uint32_t>& p) const {
        return (static_cast<size_t>(p.first) << 32) ^ p.second;
    }
};

struct Tokenizer {
    // token id -> byte string
    std::vector<std::string> tokens;
    // byte string -> id (for initial byte mapping)
    std::unordered_map<std::string, uint32_t> token_to_id;
    // (left,right) -> (rank, merged_id)
    std::unordered_map<std::pair<uint32_t, uint32_t>,
                       std::pair<uint32_t, uint32_t>, PairHash> merges;
    // single-byte fast map
    int32_t byte_id[256];
};

}  // namespace

extern "C" {

void* ktok_new(const uint8_t* vocab_blob, const uint8_t* merge_blob) {
    auto* tk = new Tokenizer();
    const uint8_t* p = vocab_blob;
    uint32_t n_vocab;
    std::memcpy(&n_vocab, p, 4);
    p += 4;
    const uint32_t* offsets = reinterpret_cast<const uint32_t*>(p);
    p += 4 * (n_vocab + 1);
    const char* bytes = reinterpret_cast<const char*>(p);
    tk->tokens.reserve(n_vocab);
    for (uint32_t i = 0; i < n_vocab; i++) {
        tk->tokens.emplace_back(bytes + offsets[i], offsets[i + 1] - offsets[i]);
        tk->token_to_id.emplace(tk->tokens.back(), i);
    }
    for (int b = 0; b < 256; b++) {
        std::string s(1, static_cast<char>(b));
        auto it = tk->token_to_id.find(s);
        tk->byte_id[b] = it == tk->token_to_id.end() ? -1
                                                     : static_cast<int32_t>(it->second);
    }
    const uint8_t* q = merge_blob;
    uint32_t n_merges;
    std::memcpy(&n_merges, q, 4);
    q += 4;
    const uint32_t* m = reinterpret_cast<const uint32_t*>(q);
    for (uint32_t r = 0; r < n_merges; r++) {
        uint32_t left = m[3 * r], right = m[3 * r + 1], out = m[3 * r + 2];
        tk->merges.emplace(std::make_pair(left, right), std::make_pair(r, out));
    }
    return tk;
}

void ktok_free(void* h) { delete static_cast<Tokenizer*>(h); }

// Encode one pretoken (raw bytes) into ids. Returns count written.
static int encode_one(Tokenizer* tk, const uint8_t* text, int len,
                      int32_t* out, int max_out) {
    std::vector<uint32_t> parts;
    parts.reserve(len);
    for (int i = 0; i < len; i++) {
        int32_t id = tk->byte_id[text[i]];
        if (id < 0) continue;  // byte missing from vocab (shouldn't happen)
        parts.push_back(static_cast<uint32_t>(id));
    }
    // ranked merge loop: repeatedly merge the lowest-rank adjacent pair
    while (parts.size() > 1) {
        uint32_t best_rank = UINT32_MAX, best_i = 0, best_out = 0;
        for (size_t i = 0; i + 1 < parts.size(); i++) {
            auto it = tk->merges.find({parts[i], parts[i + 1]});
            if (it != tk->merges.end() && it->second.first < best_rank) {
                best_rank = it->second.first;
                best_i = static_cast<uint32_t>(i);
                best_out = it->second.second;
            }
        }
        if (best_rank == UINT32_MAX) break;
        parts[best_i] = best_out;
        parts.erase(parts.begin() + best_i + 1);
    }
    int n = 0;
    for (uint32_t id : parts) {
        if (n >= max_out) break;
        out[n++] = static_cast<int32_t>(id);
    }
    return n;
}

// Encode a batch: `text` holds concatenated pretokens, offsets[i]..offsets[i+1]
// delimit pretoken i (n_pre pretokens). Output ids are appended to `out`
// (capacity max_out); out_counts[i] = ids produced for pretoken i.
// Returns the total id count (or -1 on overflow).
int32_t ktok_encode_batch(void* h, const uint8_t* text,
                          const uint32_t* offsets, int32_t n_pre,
                          int32_t* out, int32_t max_out,
                          int32_t* out_counts) {
    auto* tk = static_cast<Tokenizer*>(h);
    int32_t total = 0;
    for (int32_t i = 0; i < n_pre; i++) {
        int n = encode_one(tk, text + offsets[i],
                           static_cast<int>(offsets[i + 1] - offsets[i]),
                           out + total, max_out - total);
        out_counts[i] = n;
        total += n;
        if (total >= max_out) return -1;
    }
    return total;
}

}  // extern "C"
