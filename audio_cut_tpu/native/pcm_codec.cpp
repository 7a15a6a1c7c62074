// Native PCM codec: the hot host-side encode/decode path for WAV export.
//
// Role parity: the reference leaned on libsndfile's C core through the
// soundfile package for 24-bit PCM export (reference
// src/audio_cut/audio_export.py:27-156). This standalone implementation
// covers the same hot path — float32 <-> PCM16/24 block conversion — plus
// the interleaved peak/RMS scan used by classification preflight.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// float32 [-1,1] -> packed little-endian 24-bit PCM. Returns bytes written.
long pcm24_encode(const float* in, long n, unsigned char* out) {
    for (long i = 0; i < n; ++i) {
        float x = in[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        // llrintf: round-half-even like numpy's np.round on .5 boundaries is
        // unnecessary here; nearest-int matches the exporter contract
        int32_t v = (int32_t)llrintf((double)x * 8388607.0);
        out[3 * i + 0] = (unsigned char)(v & 0xFF);
        out[3 * i + 1] = (unsigned char)((v >> 8) & 0xFF);
        out[3 * i + 2] = (unsigned char)((v >> 16) & 0xFF);
    }
    return 3 * n;
}

// packed little-endian 24-bit PCM -> float32 (scale 1/8388607)
long pcm24_decode(const unsigned char* in, long n_samples, float* out) {
    const double scale = 1.0 / 8388607.0;
    for (long i = 0; i < n_samples; ++i) {
        int32_t v = (int32_t)in[3 * i]
                  | ((int32_t)in[3 * i + 1] << 8)
                  | ((int32_t)in[3 * i + 2] << 16);
        v = (v ^ 0x800000) - 0x800000;  // sign-extend 24 -> 32
        out[i] = (float)(v * scale);
    }
    return n_samples;
}

long pcm16_encode(const float* in, long n, int16_t* out) {
    for (long i = 0; i < n; ++i) {
        float x = in[i];
        if (x > 1.0f) x = 1.0f;
        if (x < -1.0f) x = -1.0f;
        out[i] = (int16_t)llrintf((double)x * 32767.0);
    }
    return 2 * n;
}

long pcm16_decode(const int16_t* in, long n, float* out) {
    const float scale = 1.0f / 32767.0f;
    for (long i = 0; i < n; ++i) out[i] = in[i] * scale;
    return n;
}

// single-pass peak + sum-of-squares (RMS preflight for export/classify)
void peak_rms_scan(const float* in, long n, float* peak_out, double* sumsq_out) {
    float peak = 0.0f;
    double sumsq = 0.0;
    for (long i = 0; i < n; ++i) {
        float a = std::fabs(in[i]);
        if (a > peak) peak = a;
        sumsq += (double)in[i] * (double)in[i];
    }
    *peak_out = peak;
    *sumsq_out = sumsq;
}

}  // extern "C"
