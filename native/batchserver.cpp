// Prefetching batch server — native SampLoader loop.
//
// The reference's SampLoader runs in native code and stays ahead of the
// GPU (DataLoader.cpp); the rebuild's analog: a C++ producer thread that
// gathers shuffled token windows from mmap'd shards into a ring of
// batch buffers while the TPU executes the previous step. Python hands
// over the full (shard, offset) schedule — determinism (the np.rng
// permutation) stays in one place — and drains batches with kbs_next.

#include <cstdint>
#include <condition_variable>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
// from tokenset.cpp (same shared object)
void* kts_open(const char* path, int64_t* count, int32_t* bpt);
void kts_close(void* h);
void kts_gather(void* h, const int64_t* offsets, int32_t n, int32_t width,
                int32_t* out);
}

namespace {

struct Slot {
    std::vector<int32_t> buf;
    bool ready = false;
};

struct BatchServer {
    std::vector<void*> shards;
    std::vector<int32_t> sched_shard;   // [n_windows]
    std::vector<int64_t> sched_off;     // [n_windows]
    int64_t n_windows = 0;
    int32_t group = 0;                  // windows per batch (B * accum)
    int32_t width = 0;                  // tokens per window (T + 1)
    std::vector<Slot> ring;
    int64_t head = 0;                   // next batch index to produce
    int64_t tail = 0;                   // next batch index to consume
    int64_t n_batches = 0;
    std::thread producer;
    std::mutex mu;
    std::condition_variable cv_prod, cv_cons;
    bool stop = false;

    void produce() {
        const size_t depth = ring.size();
        while (true) {
            std::unique_lock<std::mutex> lk(mu);
            cv_prod.wait(lk, [&] {
                return stop || (head < n_batches && !ring[head % depth].ready);
            });
            if (stop || head >= n_batches) return;
            Slot& slot = ring[head % depth];
            int64_t b = head;
            lk.unlock();
            // fill outside the lock: one gather per window
            for (int32_t w = 0; w < group; w++) {
                int64_t wi = b * group + w;
                kts_gather(shards[sched_shard[wi]], &sched_off[wi], 1, width,
                           slot.buf.data() + static_cast<int64_t>(w) * width);
            }
            lk.lock();
            slot.ready = true;
            head++;
            cv_cons.notify_one();
        }
    }
};

}  // namespace

extern "C" {

// paths: n_paths NUL-terminated strings concatenated ('\0'-separated).
// schedule: n_windows (shard_idx, offset) pairs in final batch order.
// Returns nullptr if any shard fails to open.
void* kbs_new(const char* paths, int32_t n_paths,
              const int32_t* sched_shard, const int64_t* sched_off,
              int64_t n_windows, int32_t group, int32_t width,
              int32_t depth) {
    auto* s = new BatchServer();
    const char* p = paths;
    for (int32_t i = 0; i < n_paths; i++) {
        int64_t count;
        int32_t bpt;
        void* h = kts_open(p, &count, &bpt);
        if (!h) {
            for (void* hh : s->shards) kts_close(hh);
            delete s;
            return nullptr;
        }
        s->shards.push_back(h);
        p += std::strlen(p) + 1;
    }
    s->sched_shard.assign(sched_shard, sched_shard + n_windows);
    s->sched_off.assign(sched_off, sched_off + n_windows);
    s->n_windows = n_windows;
    s->group = group;
    s->width = width;
    s->n_batches = n_windows / group;
    if (depth < 1) depth = 2;
    s->ring.resize(depth);
    for (auto& slot : s->ring)
        slot.buf.resize(static_cast<int64_t>(group) * width);
    s->producer = std::thread([s] { s->produce(); });
    return s;
}

// Copies the next [group, width] int32 batch into out. Returns 1 on
// success, 0 when the schedule is exhausted.
int32_t kbs_next(void* h, int32_t* out) {
    auto* s = static_cast<BatchServer*>(h);
    std::unique_lock<std::mutex> lk(s->mu);
    if (s->tail >= s->n_batches) return 0;
    Slot& slot = s->ring[s->tail % s->ring.size()];
    s->cv_cons.wait(lk, [&] { return slot.ready; });
    std::memcpy(out, slot.buf.data(),
                slot.buf.size() * sizeof(int32_t));
    slot.ready = false;
    s->tail++;
    s->cv_prod.notify_one();
    return 1;
}

void kbs_free(void* h) {
    auto* s = static_cast<BatchServer*>(h);
    {
        std::lock_guard<std::mutex> lk(s->mu);
        s->stop = true;
    }
    s->cv_prod.notify_all();
    if (s->producer.joinable()) s->producer.join();
    for (void* hh : s->shards) kts_close(hh);
    delete s;
}

}  // extern "C"
