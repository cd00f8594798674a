// fetode_native: host-side data-runtime kernels for the fetode_tpu
// framework (CSV parsing, sliding-window gather, per-row normalisation,
// deterministic shuffling).
//
// The reference's data path is pandas + per-item torch Dataset indexing;
// here the hot host loops (window assembly for every epoch, CSV ingest)
// are C++ with OpenMP-free portable threading kept simple (memory-bound
// loops; compilers vectorise them).  Exposed through ctypes — see
// fetode_tpu/data/native.py.

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- csv

// Parse a numeric CSV. Skips the header row; non-numeric fields become NaN.
// First call with out == nullptr to obtain (rows, cols) in shape[0..1];
// second call with a buffer of rows*cols floats fills it row-major.
// Returns 0 on success, negative on error.
int fet_parse_csv(const char* path, float* out, int64_t* shape) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    std::vector<char> buf(size + 1);
    if (std::fread(buf.data(), 1, size, f) != (size_t)size) {
        std::fclose(f);
        return -2;
    }
    std::fclose(f);
    buf[size] = '\0';

    char* p = buf.data();
    char* end = buf.data() + size;

    // skip header line
    while (p < end && *p != '\n') p++;
    if (p < end) p++;

    int64_t rows = 0, cols = 0;
    int64_t written = 0;
    while (p < end) {
        if (*p == '\n' || *p == '\r') { p++; continue; }
        int64_t c = 0;
        while (p < end && *p != '\n') {
            // field starts here
            char* field_end = p;
            while (field_end < end && *field_end != ',' && *field_end != '\n'
                   && *field_end != '\r') field_end++;
            if (out) {
                char saved = *field_end;
                *field_end = '\0';
                char* conv_end = nullptr;
                double v = std::strtod(p, &conv_end);
                bool ok = conv_end != p;
                // require full-field consumption modulo whitespace
                while (ok && conv_end < field_end) {
                    if (!std::isspace((unsigned char)*conv_end)) { ok = false; }
                    conv_end++;
                }
                out[written++] = ok ? (float)v : NAN;
                *field_end = saved;
            }
            c++;
            p = field_end;
            if (p < end && *p == ',') p++;
            if (p < end && *p == '\r') p++;
        }
        if (p < end) p++;  // consume '\n'
        if (c > cols) cols = c;
        rows++;
    }
    shape[0] = rows;
    shape[1] = cols;
    return 0;
}

// ------------------------------------------------------------- windows

// Gather m sliding windows of length ctx from X (n, f) at the given start
// indices into out (m, ctx, f).
void fet_window_gather(const float* X, int64_t n, int64_t f,
                       const int64_t* starts, int64_t m, int64_t ctx,
                       float* out) {
    const int64_t row = f * (int64_t)sizeof(float);
    for (int64_t i = 0; i < m; i++) {
        const int64_t s = starts[i];
        std::memcpy(out + i * ctx * f, X + s * f, (size_t)(ctx * row));
    }
}

// Per-row z-normalisation in place: x (n, t).
void fet_znorm_rows(float* x, int64_t n, int64_t t, float eps) {
    for (int64_t i = 0; i < n; i++) {
        float* r = x + i * t;
        double mu = 0.0;
        for (int64_t j = 0; j < t; j++) mu += r[j];
        mu /= (double)t;
        double var = 0.0;
        for (int64_t j = 0; j < t; j++) {
            double d = r[j] - mu;
            var += d * d;
        }
        float sd = (float)std::sqrt(var / (double)t) + eps;
        for (int64_t j = 0; j < t; j++) r[j] = (r[j] - (float)mu) / sd;
    }
}

// Deterministic Fisher-Yates shuffle of idx (n,) with splitmix64.
static inline uint64_t splitmix64(uint64_t* s) {
    uint64_t z = (*s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

void fet_shuffle(int64_t* idx, int64_t n, uint64_t seed) {
    uint64_t s = seed ? seed : 1;
    for (int64_t i = n - 1; i > 0; i--) {
        int64_t j = (int64_t)(splitmix64(&s) % (uint64_t)(i + 1));
        int64_t tmp = idx[i];
        idx[i] = idx[j];
        idx[j] = tmp;
    }
}

}  // extern "C"
