// Native safetensors mmap reader.
//
// Rebuild of the reference's native mmap loader (K_SafeTensors::MMAP,
// src/Manifold/Serialize.cpp:428-497; header walk Safetensors.hpp):
// open+mmap the file, parse the 8-byte little-endian header length and
// the JSON header (a minimal single-purpose JSON parser — the header
// grammar is {name: {"dtype": str, "shape": [ints],
// "data_offsets": [a, b], ...extras}}), and expose zero-copy pointers
// into the data region. Python binds via ctypes (koifish_tpu/native.py)
// and wraps the pointers as numpy views.

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct TensorEntry {
    std::string name;
    std::string dtype;
    std::vector<int64_t> shape;
    uint64_t begin = 0, end = 0;
};

struct StFile {
    void* map = nullptr;
    size_t map_len = 0;
    const uint8_t* data = nullptr;   // start of the tensor data region
    std::vector<TensorEntry> tensors;
};

// --- minimal JSON scanner for the safetensors header grammar ------------
struct Scanner {
    const char* p;
    const char* end;
    bool ok = true;

    void ws() {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            ++p;
    }
    bool expect(char c) {
        ws();
        if (p < end && *p == c) {
            ++p;
            return true;
        }
        ok = false;
        return false;
    }
    bool peek(char c) {
        ws();
        return p < end && *p == c;
    }
    std::string str() {
        ws();
        std::string out;
        if (p >= end || *p != '"') {
            ok = false;
            return out;
        }
        ++p;
        while (p < end && *p != '"') {
            if (*p == '\\' && p + 1 < end) {
                ++p;
                switch (*p) {
                    case 'n': out.push_back('\n'); break;
                    case 't': out.push_back('\t'); break;
                    case 'r': out.push_back('\r'); break;
                    case 'u':
                        // header names are ASCII in practice; skip 4 hex
                        if (p + 4 < end) p += 4;
                        out.push_back('?');
                        break;
                    default: out.push_back(*p);
                }
            } else {
                out.push_back(*p);
            }
            ++p;
        }
        if (p < end) ++p;   // closing quote
        return out;
    }
    int64_t integer() {
        ws();
        bool neg = false;
        if (p < end && *p == '-') {
            neg = true;
            ++p;
        }
        int64_t v = 0;
        bool any = false;
        while (p < end && *p >= '0' && *p <= '9') {
            v = v * 10 + (*p - '0');
            ++p;
            any = true;
        }
        if (!any) ok = false;
        return neg ? -v : v;
    }
    void skip_value();   // fwd decl
    void skip_object() {
        expect('{');
        if (peek('}')) { ++p; return; }
        while (ok) {
            str();
            expect(':');
            skip_value();
            ws();
            if (p < end && *p == ',') { ++p; continue; }
            expect('}');
            break;
        }
    }
    void skip_array() {
        expect('[');
        if (peek(']')) { ++p; return; }
        while (ok) {
            skip_value();
            ws();
            if (p < end && *p == ',') { ++p; continue; }
            expect(']');
            break;
        }
    }
};

void Scanner::skip_value() {
    ws();
    if (p >= end) { ok = false; return; }
    if (*p == '"') { str(); return; }
    if (*p == '{') { skip_object(); return; }
    if (*p == '[') { skip_array(); return; }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']') ++p;
}

bool parse_header(const char* js, size_t len, StFile* f) {
    Scanner s{js, js + len};
    s.expect('{');
    if (s.peek('}')) return s.ok;
    while (s.ok) {
        std::string name = s.str();
        s.expect(':');
        if (name == "__metadata__") {
            s.skip_object();
        } else {
            TensorEntry t;
            t.name = name;
            s.expect('{');
            while (s.ok) {
                std::string key = s.str();
                s.expect(':');
                if (key == "dtype") {
                    t.dtype = s.str();
                } else if (key == "shape") {
                    s.expect('[');
                    if (!s.peek(']')) {
                        while (s.ok) {
                            t.shape.push_back(s.integer());
                            s.ws();
                            if (*s.p == ',') { ++s.p; continue; }
                            break;
                        }
                    }
                    s.expect(']');
                } else if (key == "data_offsets") {
                    s.expect('[');
                    t.begin = (uint64_t)s.integer();
                    s.expect(',');
                    t.end = (uint64_t)s.integer();
                    s.expect(']');
                } else {
                    s.skip_value();   // koifish extras: szData/szGama/loAB
                }
                s.ws();
                if (*s.p == ',') { ++s.p; continue; }
                s.expect('}');
                break;
            }
            f->tensors.push_back(std::move(t));
        }
        s.ws();
        if (s.p < s.end && *s.p == ',') { ++s.p; continue; }
        s.expect('}');
        break;
    }
    return s.ok;
}

}  // namespace

extern "C" {

// Open + mmap + parse. Returns handle or nullptr.
void* kst_open(const char* path) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return nullptr;
    struct stat st;
    if (fstat(fd, &st) != 0 || (size_t)st.st_size < 8) {
        ::close(fd);
        return nullptr;
    }
    void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    ::close(fd);
    if (map == MAP_FAILED) return nullptr;
    uint64_t hlen;
    std::memcpy(&hlen, map, 8);
    if (8 + hlen > (uint64_t)st.st_size) {
        munmap(map, st.st_size);
        return nullptr;
    }
    auto* f = new StFile;
    f->map = map;
    f->map_len = st.st_size;
    f->data = (const uint8_t*)map + 8 + hlen;
    if (!parse_header((const char*)map + 8, hlen, f)) {
        munmap(map, st.st_size);
        delete f;
        return nullptr;
    }
    // validate offsets against the data region (Serialize.cpp
    // validate_data_offsets analog)
    size_t data_len = st.st_size - 8 - hlen;
    for (auto& t : f->tensors) {
        if (t.end < t.begin || t.end > data_len) {
            munmap(map, st.st_size);
            delete f;
            return nullptr;
        }
    }
    return f;
}

int32_t kst_count(void* h) {
    return (int32_t)((StFile*)h)->tensors.size();
}

// Fills name (cap bytes incl NUL), dtype (cap 16), shape (cap 8, returns
// ndim), offsets[2]. Returns ndim or -1.
int32_t kst_info(void* h, int32_t idx, char* name, int32_t name_cap,
                 char* dtype, int64_t* shape, int32_t shape_cap,
                 uint64_t* offsets) {
    auto* f = (StFile*)h;
    if (idx < 0 || idx >= (int32_t)f->tensors.size()) return -1;
    const auto& t = f->tensors[idx];
    std::snprintf(name, name_cap, "%s", t.name.c_str());
    std::snprintf(dtype, 16, "%s", t.dtype.c_str());
    int32_t nd = (int32_t)t.shape.size();
    if (nd > shape_cap) return -1;
    for (int32_t i = 0; i < nd; ++i) shape[i] = t.shape[i];
    offsets[0] = t.begin;
    offsets[1] = t.end;
    return nd;
}

const uint8_t* kst_data(void* h, int32_t idx) {
    auto* f = (StFile*)h;
    if (idx < 0 || idx >= (int32_t)f->tensors.size()) return nullptr;
    return f->data + f->tensors[idx].begin;
}

void kst_close(void* h) {
    auto* f = (StFile*)h;
    if (f->map) munmap(f->map, f->map_len);
    delete f;
}

}  // extern "C"
