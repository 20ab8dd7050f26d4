// gfdm_host: native host-side runtime for the TPU GFDM framework.
//
// The reference implements its runtime in C++ on top of the GNU Radio
// scheduler (thread-per-block, ring buffers between blocks). Here the TPU
// does all signal processing; what remains on the host is the IO-side
// runtime, implemented natively for throughput:
//
//   - wire-format conversion: interleaved sc16 IQ (USRP-style) <-> the
//     framework's planar float32 [re-plane | im-plane] layout (the
//     counterpart of /root/reference/python/pygfdm/converter.py and the
//     VOLK conversions inside the reference blocks)
//   - a single-producer stream ring buffer that frames continuous IQ into
//     fixed-size chunk batches with a lookahead halo - the role the GR
//     scheduler's ring buffers + set_output_multiple played for the
//     reference's stream blocks
//   - payload bit (un)packing for QPSK planar symbol batches
//
// Plain C ABI; Python binds via ctypes (gfdm_tpu/native).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// format conversion
// ---------------------------------------------------------------------------

// Interleaved sc16 [I0,Q0,I1,Q1,...] -> planar float32 (re then im planes).
void gfdm_sc16_to_planar(const int16_t* in, float* re, float* im,
                         int64_t n_samples, float scale) {
    const float k = 1.0f / scale;
    for (int64_t i = 0; i < n_samples; ++i) {
        re[i] = static_cast<float>(in[2 * i]) * k;
        im[i] = static_cast<float>(in[2 * i + 1]) * k;
    }
}

// Planar float32 -> interleaved sc16 with clamping.
void gfdm_planar_to_sc16(const float* re, const float* im, int16_t* out,
                         int64_t n_samples, float scale) {
    for (int64_t i = 0; i < n_samples; ++i) {
        float vi = re[i] * scale;
        float vq = im[i] * scale;
        vi = std::min(32767.0f, std::max(-32768.0f, std::nearbyint(vi)));
        vq = std::min(32767.0f, std::max(-32768.0f, std::nearbyint(vq)));
        out[2 * i] = static_cast<int16_t>(vi);
        out[2 * i + 1] = static_cast<int16_t>(vq);
    }
}

// Interleaved complex float32 [re,im,...] -> planar float32.
void gfdm_cf32_to_planar(const float* in, float* re, float* im,
                         int64_t n_samples) {
    for (int64_t i = 0; i < n_samples; ++i) {
        re[i] = in[2 * i];
        im[i] = in[2 * i + 1];
    }
}

void gfdm_planar_to_cf32(const float* re, const float* im, float* out,
                         int64_t n_samples) {
    for (int64_t i = 0; i < n_samples; ++i) {
        out[2 * i] = re[i];
        out[2 * i + 1] = im[i];
    }
}

// ---------------------------------------------------------------------------
// payload bits <-> planar QPSK
// ---------------------------------------------------------------------------

// bits (0/1 bytes, layout (..., n, 2): I-bit then Q-bit) -> planar symbols
// with unit average energy ((1-2b)/sqrt(2)).
void gfdm_bits_to_qpsk_planar(const uint8_t* bits, float* re, float* im,
                              int64_t n_symbols) {
    const float a = 0.70710678118654752440f;
    for (int64_t i = 0; i < n_symbols; ++i) {
        re[i] = bits[2 * i] ? -a : a;
        im[i] = bits[2 * i + 1] ? -a : a;
    }
}

void gfdm_qpsk_planar_to_bits(const float* re, const float* im, uint8_t* bits,
                              int64_t n_symbols) {
    for (int64_t i = 0; i < n_symbols; ++i) {
        bits[2 * i] = re[i] < 0.0f ? 1 : 0;
        bits[2 * i + 1] = im[i] < 0.0f ? 1 : 0;
    }
}

// ---------------------------------------------------------------------------
// stream ring buffer with chunk framing
// ---------------------------------------------------------------------------
//
// Single-producer single-consumer. The producer pushes planar float IQ; the
// consumer pulls batches of (chunk_len + halo) extended chunks advancing by
// chunk_len per chunk - the exact windowing gfdm_tpu.runtime.stream uses, so
// a radio thread can feed the TPU without Python in the hot path.

struct GfdmStreamBuffer {
    std::vector<float> re, im;   // circular storage
    int64_t capacity = 0;
    std::atomic<int64_t> head{0};  // absolute write position (samples)
    std::atomic<int64_t> tail{0};  // absolute read position (chunk-aligned)
    int64_t chunk_len = 0;
    int64_t halo = 0;
    std::atomic<int64_t> dropped{0};
};

void* gfdm_stream_create(int64_t capacity, int64_t chunk_len, int64_t halo) {
    auto* b = new GfdmStreamBuffer();
    // round capacity up to a multiple of chunk_len for clean wrap handling
    b->capacity = ((capacity + chunk_len - 1) / chunk_len) * chunk_len;
    b->re.assign(static_cast<size_t>(b->capacity), 0.0f);
    b->im.assign(static_cast<size_t>(b->capacity), 0.0f);
    b->chunk_len = chunk_len;
    b->halo = halo;
    return b;
}

void gfdm_stream_destroy(void* h) { delete static_cast<GfdmStreamBuffer*>(h); }

// Push n planar samples; drops the oldest unread chunks on overflow
// (returns number of samples dropped so far in total).
int64_t gfdm_stream_push(void* h, const float* re, const float* im, int64_t n) {
    auto* b = static_cast<GfdmStreamBuffer*>(h);
    int64_t head = b->head.load(std::memory_order_relaxed);
    for (int64_t i = 0; i < n; ++i) {
        const int64_t pos = (head + i) % b->capacity;
        b->re[static_cast<size_t>(pos)] = re[i];
        b->im[static_cast<size_t>(pos)] = im[i];
    }
    head += n;
    // overflow: advance tail in whole chunks
    int64_t tail = b->tail.load(std::memory_order_relaxed);
    if (head - tail > b->capacity - b->halo) {
        const int64_t need = head - tail - (b->capacity - b->halo);
        const int64_t chunks = (need + b->chunk_len - 1) / b->chunk_len;
        b->tail.store(tail + chunks * b->chunk_len, std::memory_order_release);
        b->dropped.fetch_add(chunks * b->chunk_len, std::memory_order_relaxed);
    }
    b->head.store(head, std::memory_order_release);
    return b->dropped.load(std::memory_order_relaxed);
}

// Number of complete extended chunks ready to pull.
int64_t gfdm_stream_available_chunks(void* h) {
    auto* b = static_cast<GfdmStreamBuffer*>(h);
    const int64_t head = b->head.load(std::memory_order_acquire);
    const int64_t tail = b->tail.load(std::memory_order_relaxed);
    const int64_t avail = head - tail;
    if (avail < b->chunk_len + b->halo) return 0;
    return (avail - b->halo) / b->chunk_len;
}

// Pull up to max_chunks extended chunks into out_{re,im} with shape
// (n, 2, chunk_len + halo) planar layout (re plane then im plane per chunk).
// Returns the number of chunks written. ``base_offset_out`` (optional)
// receives the absolute sample index of the first pulled chunk.
int64_t gfdm_stream_pull(void* h, float* out, int64_t max_chunks,
                         int64_t* base_offset_out) {
    auto* b = static_cast<GfdmStreamBuffer*>(h);
    const int64_t n = std::min(max_chunks, gfdm_stream_available_chunks(h));
    if (n <= 0) return 0;
    const int64_t tail = b->tail.load(std::memory_order_relaxed);
    if (base_offset_out) *base_offset_out = tail;
    const int64_t ext = b->chunk_len + b->halo;
    for (int64_t c = 0; c < n; ++c) {
        float* dst_re = out + c * 2 * ext;
        float* dst_im = dst_re + ext;
        const int64_t start = tail + c * b->chunk_len;
        for (int64_t i = 0; i < ext; ++i) {
            const int64_t pos = (start + i) % b->capacity;
            dst_re[i] = b->re[static_cast<size_t>(pos)];
            dst_im[i] = b->im[static_cast<size_t>(pos)];
        }
    }
    b->tail.store(tail + n * b->chunk_len, std::memory_order_release);
    return n;
}

}  // extern "C"
