// Native batched SSIM kernel.
//
// Computes the reference SSIM (11x11 gaussian window sigma 1.5, valid
// region — /root/reference/metrics/calculate_ssim.py:6-23) over a batch of
// frames with std::thread parallelism. The Python fallback loops
// scipy.correlate2d per frame per channel; this kernel is ~2 orders of
// magnitude faster on the eval sets (256 videos x 50 frames x 3 channels).
//
// Exposed via ctypes:
//   ssim_batch(img1, img2, n_frames, channels, h, w, out)
//     img*: float32 [n_frames, channels, h, w] in [0, 1]
//     out:  float64 [n_frames] per-frame SSIM (channel-averaged)

#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

constexpr int KSIZE = 11;
constexpr double SIGMA = 1.5;
constexpr double C1 = 0.01 * 0.01;
constexpr double C2 = 0.03 * 0.03;

struct Window {
    double w[KSIZE];
    Window() {
        double sum = 0.0;
        for (int i = 0; i < KSIZE; ++i) {
            double x = i - (KSIZE - 1) / 2.0;
            w[i] = std::exp(-x * x / (2.0 * SIGMA * SIGMA));
            sum += w[i];
        }
        for (int i = 0; i < KSIZE; ++i) w[i] /= sum;
    }
};
const Window kWin;

// separable valid correlation: out is (h-10, w-10)
void filter_valid(const std::vector<double>& img, int h, int w,
                  std::vector<double>& tmp, std::vector<double>& out) {
    const int wo = w - KSIZE + 1;
    const int ho = h - KSIZE + 1;
    tmp.assign(static_cast<size_t>(h) * wo, 0.0);
    for (int y = 0; y < h; ++y) {
        const double* row = &img[static_cast<size_t>(y) * w];
        double* trow = &tmp[static_cast<size_t>(y) * wo];
        for (int x = 0; x < wo; ++x) {
            double acc = 0.0;
            for (int k = 0; k < KSIZE; ++k) acc += row[x + k] * kWin.w[k];
            trow[x] = acc;
        }
    }
    out.assign(static_cast<size_t>(ho) * wo, 0.0);
    for (int y = 0; y < ho; ++y) {
        double* orow = &out[static_cast<size_t>(y) * wo];
        for (int k = 0; k < KSIZE; ++k) {
            const double* trow = &tmp[static_cast<size_t>(y + k) * wo];
            const double wk = kWin.w[k];
            for (int x = 0; x < wo; ++x) orow[x] += wk * trow[x];
        }
    }
}

double ssim_plane(const float* a, const float* b, int h, int w) {
    const size_t n = static_cast<size_t>(h) * w;
    std::vector<double> i1(n), i2(n), i1sq(n), i2sq(n), i12(n);
    for (size_t i = 0; i < n; ++i) {
        const double x = a[i], y = b[i];
        i1[i] = x; i2[i] = y; i1sq[i] = x * x; i2sq[i] = y * y; i12[i] = x * y;
    }
    std::vector<double> tmp, mu1, mu2, m11, m22, m12;
    filter_valid(i1, h, w, tmp, mu1);
    filter_valid(i2, h, w, tmp, mu2);
    filter_valid(i1sq, h, w, tmp, m11);
    filter_valid(i2sq, h, w, tmp, m22);
    filter_valid(i12, h, w, tmp, m12);

    const size_t m = mu1.size();
    double acc = 0.0;
    for (size_t i = 0; i < m; ++i) {
        const double u1 = mu1[i], u2 = mu2[i];
        const double s1 = m11[i] - u1 * u1;
        const double s2 = m22[i] - u2 * u2;
        const double s12 = m12[i] - u1 * u2;
        acc += ((2 * u1 * u2 + C1) * (2 * s12 + C2)) /
               ((u1 * u1 + u2 * u2 + C1) * (s1 + s2 + C2));
    }
    return acc / static_cast<double>(m);
}

}  // namespace

extern "C" {

void ssim_batch(const float* img1, const float* img2, int64_t n_frames,
                int64_t channels, int64_t h, int64_t w, double* out) {
    const int64_t plane = h * w;
    const unsigned n_threads =
        std::max(1u, std::min<unsigned>(std::thread::hardware_concurrency(),
                                        static_cast<unsigned>(n_frames)));
    std::vector<std::thread> threads;
    auto work = [&](int64_t start, int64_t stop) {
        for (int64_t f = start; f < stop; ++f) {
            double acc = 0.0;
            for (int64_t c = 0; c < channels; ++c) {
                const float* a = img1 + (f * channels + c) * plane;
                const float* b = img2 + (f * channels + c) * plane;
                acc += ssim_plane(a, b, static_cast<int>(h), static_cast<int>(w));
            }
            out[f] = acc / static_cast<double>(channels);
        }
    };
    const int64_t chunk = (n_frames + n_threads - 1) / n_threads;
    for (unsigned t = 0; t < n_threads; ++t) {
        const int64_t s = t * chunk;
        const int64_t e = std::min<int64_t>(n_frames, s + chunk);
        if (s >= e) break;
        threads.emplace_back(work, s, e);
    }
    for (auto& th : threads) th.join();
}

}  // extern "C"
