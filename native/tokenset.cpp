// Native token-shard reader + batch filler.
//
// Rebuild of the reference's native data layer (DataTokenSet shard
// streaming + SampLoader batch collation, src/TokenSet/TokenSet.cpp:225,
// DataLoader.cpp) for the shard format documented in
// koifish_tpu/data/tokenset.py (256×int32 header, uint16/uint32 payload).
// mmap-based zero-copy reads; the batch filler gathers shuffled windows
// into a caller-provided int32 buffer in one C pass (the python loop this
// replaces dominates host time at large batch).

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kHeaderInts = 256;
constexpr int32_t kMagicGpt2 = 20240520;
constexpr int32_t kMagicQwen25 = 20250520;
constexpr int32_t kMagicQwen3 = 20251218;

struct Shard {
    void* map = nullptr;
    size_t map_len = 0;
    const uint8_t* tokens = nullptr;   // past header
    int64_t count = 0;
    int bpt = 4;                       // bytes per token (2 or 4)
};

}  // namespace

extern "C" {

// Open a shard; returns handle or nullptr. count/bpt written out.
void* kts_open(const char* path, int64_t* count, int32_t* bpt) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        ::close(fd);
        return nullptr;
    }
    void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (map == MAP_FAILED) return nullptr;
    const int32_t* header = static_cast<const int32_t*>(map);
    int32_t magic = header[0];
    if (header[1] != 1 ||
        (magic != kMagicGpt2 && magic != kMagicQwen25 && magic != kMagicQwen3)) {
        munmap(map, st.st_size);
        return nullptr;
    }
    auto* s = new Shard();
    s->map = map;
    s->map_len = st.st_size;
    s->count = header[2];
    s->bpt = magic == kMagicGpt2 ? 2 : 4;
    s->tokens = static_cast<const uint8_t*>(map) + kHeaderInts * 4;
    *count = s->count;
    *bpt = s->bpt;
    return s;
}

void kts_close(void* h) {
    auto* s = static_cast<Shard*>(h);
    if (s->map) munmap(s->map, s->map_len);
    delete s;
}

// Gather `n` windows of `width` tokens into out[n, width] (int32).
// offsets[i] is the token offset of window i in this shard.
void kts_gather(void* h, const int64_t* offsets, int32_t n, int32_t width,
                int32_t* out) {
    auto* s = static_cast<Shard*>(h);
    if (s->bpt == 2) {
        const uint16_t* t = reinterpret_cast<const uint16_t*>(s->tokens);
        for (int32_t i = 0; i < n; i++) {
            const uint16_t* src = t + offsets[i];
            int32_t* dst = out + static_cast<int64_t>(i) * width;
            for (int32_t j = 0; j < width; j++) dst[j] = src[j];
        }
    } else {
        const uint32_t* t = reinterpret_cast<const uint32_t*>(s->tokens);
        for (int32_t i = 0; i < n; i++) {
            const uint32_t* src = t + offsets[i];
            int32_t* dst = out + static_cast<int64_t>(i) * width;
            for (int32_t j = 0; j < width; j++)
                dst[j] = static_cast<int32_t>(src[j]);
        }
    }
}

}  // extern "C"
