// Native terrain generator: fractal heightfields for uneven-terrain scenes.
//
// TPU-native replacement context: the reference's HeightField scene object
// (mocca_envs/bullet_objects.py::HeightField — SURVEY.md §2.1 C7) loads or
// generates terrain grids on the host and hands them to Bullet's
// GEOM_HEIGHTFIELD. Here the same role is host-side generation of (H, W)
// grids that terrain/scene.py samples on device; generation is pure setup
// cost but sits on the reset-population path for large batched worlds
// (thousands of envs × 256² grids), so it is implemented natively.
//
// Algorithm: diamond-square fractal relief with per-octave roughness decay,
// plus an optional smoothing pass. Deterministic in (seed) via SplitMix64 —
// the generator is part of the seeded-reset contract (behavior B9), so it
// must be reproducible across platforms (no libc rand).
//
// Exposed C ABI (ctypes):
//   void hf_generate(float* out, int n, float roughness, float amplitude,
//                    unsigned long long seed, int smooth_iters);
//   n must be (power of two) + 1; out has n*n floats, row-major.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct SplitMix64 {
    uint64_t state;
    explicit SplitMix64(uint64_t seed) : state(seed) {}
    uint64_t next() {
        uint64_t z = (state += 0x9E3779B97F4A7C15ull);
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
        return z ^ (z >> 31);
    }
    // uniform in [-1, 1)
    float uniform_pm1() {
        return static_cast<float>((next() >> 11) * (1.0 / 4503599627370496.0)) * 2.0f - 1.0f;
    }
};

inline int idx(int r, int c, int n) { return r * n + c; }

}  // namespace

extern "C" {

void hf_generate(float* out, int n, float roughness, float amplitude,
                 unsigned long long seed, int smooth_iters) {
    // n = 2^k + 1 expected; degrade gracefully otherwise (flat grid).
    if (n < 3 || ((n - 1) & (n - 2)) != 0) {
        std::memset(out, 0, sizeof(float) * static_cast<size_t>(n) * n);
        return;
    }
    SplitMix64 rng(seed);
    std::vector<float>& h = *(new std::vector<float>(static_cast<size_t>(n) * n, 0.0f));

    h[idx(0, 0, n)] = rng.uniform_pm1() * amplitude;
    h[idx(0, n - 1, n)] = rng.uniform_pm1() * amplitude;
    h[idx(n - 1, 0, n)] = rng.uniform_pm1() * amplitude;
    h[idx(n - 1, n - 1, n)] = rng.uniform_pm1() * amplitude;

    float scale = amplitude;
    for (int step = n - 1; step > 1; step /= 2) {
        int half = step / 2;
        // diamond
        for (int r = half; r < n; r += step) {
            for (int c = half; c < n; c += step) {
                float avg = 0.25f * (h[idx(r - half, c - half, n)] +
                                     h[idx(r - half, c + half, n)] +
                                     h[idx(r + half, c - half, n)] +
                                     h[idx(r + half, c + half, n)]);
                h[idx(r, c, n)] = avg + rng.uniform_pm1() * scale;
            }
        }
        // square
        for (int r = 0; r < n; r += half) {
            int cstart = ((r / half) % 2 == 0) ? half : 0;
            for (int c = cstart; c < n; c += step) {
                float sum = 0.0f;
                int cnt = 0;
                if (r >= half) { sum += h[idx(r - half, c, n)]; ++cnt; }
                if (r + half < n) { sum += h[idx(r + half, c, n)]; ++cnt; }
                if (c >= half) { sum += h[idx(r, c - half, n)]; ++cnt; }
                if (c + half < n) { sum += h[idx(r, c + half, n)]; ++cnt; }
                h[idx(r, c, n)] = sum / cnt + rng.uniform_pm1() * scale;
            }
        }
        scale *= roughness;
    }

    // optional box-blur smoothing (keeps slopes walkable)
    std::vector<float> tmp(h.size());
    for (int it = 0; it < smooth_iters; ++it) {
        for (int r = 0; r < n; ++r) {
            for (int c = 0; c < n; ++c) {
                float sum = 0.0f;
                int cnt = 0;
                for (int dr = -1; dr <= 1; ++dr) {
                    for (int dc = -1; dc <= 1; ++dc) {
                        int rr = r + dr, cc = c + dc;
                        if (rr >= 0 && rr < n && cc >= 0 && cc < n) {
                            sum += h[idx(rr, cc, n)];
                            ++cnt;
                        }
                    }
                }
                tmp[idx(r, c, n)] = sum / cnt;
            }
        }
        h.swap(tmp);
    }

    // zero-mean so the walking surface is centered on z = 0
    double mean = 0.0;
    for (float v : h) mean += v;
    mean /= h.size();
    for (size_t i = 0; i < h.size(); ++i) out[i] = h[i] - static_cast<float>(mean);
    delete &h;
}

}  // extern "C"
