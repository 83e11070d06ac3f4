// Native host-side preprocessing kernels (C++17, no dependencies).
//
// The reference's dataset builders run single-threaded NumPy/SciPy per record at load time —
// its dominant host-side cost (SURVEY.md §3 hot-loop 5). These kernels implement the exact
// same numerics (polyphase resampling with a caller-supplied SciPy-designed FIR, causal
// biquad cascades in transposed direct-form II, Schmidt despiking, abs-max normalisation)
// in C++ with an OpenMP batch entry point, bound into Python via ctypes
// (wav2vec_heart_sounds_tpu/native.py). Results match the NumPy oracle to ~1e-10.
//
// Build: g++ -O3 -march=native -fPIC -shared -fopenmp fastproc.cpp -o libfastproc.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Polyphase rational resampling: out[i] = sum_k h[k] * xu[half_len + i*down - k]
// where xu is x zero-stuffed by `up` (scipy.signal.resample_poly semantics with the
// filter's group-delay centring; h must already include the `up` gain).
void resample_poly_f64(const double* x, int64_t n, int up, int down,
                       const double* h, int64_t hlen, double* out, int64_t n_out) {
    const int64_t half_len = (hlen - 1) / 2;
    for (int64_t i = 0; i < n_out; ++i) {
        const int64_t j = half_len + i * (int64_t)down;
        // need k = j - m*up in [0, hlen) with m in [0, n)
        int64_t m_lo = (j - hlen + 1 + up - 1) / up;  // ceil((j - hlen + 1) / up)
        if (j - hlen + 1 <= 0) m_lo = 0;               // guard for negative numerators
        int64_t m_hi = j / up;
        m_lo = std::max<int64_t>(m_lo, 0);
        m_hi = std::min<int64_t>(m_hi, n - 1);
        double acc = 0.0;
        for (int64_t m = m_lo; m <= m_hi; ++m) {
            const int64_t k = j - m * (int64_t)up;
            acc += h[k] * x[m];
        }
        out[i] = acc;
    }
}

// Causal cascade of normalised biquads (transposed direct-form II), in place.
// sos: n_sections rows of [b0, b1, b2, a0(=1), a1, a2].
void sosfilt_f64(const double* sos, int n_sections, double* x, int64_t n) {
    for (int s = 0; s < n_sections; ++s) {
        const double b0 = sos[6 * s + 0], b1 = sos[6 * s + 1], b2 = sos[6 * s + 2];
        const double a1 = sos[6 * s + 4], a2 = sos[6 * s + 5];
        double z0 = 0.0, z1 = 0.0;
        for (int64_t i = 0; i < n; ++i) {
            const double xi = x[i];
            const double y = b0 * xi + z0;
            z0 = b1 * xi - a1 * y + z1;
            z1 = b2 * xi - a2 * y;
            x[i] = y;
        }
    }
}

// Schmidt spike removal on 500 ms windows (win = round(fs / 2)), in place.
void despike_f64(double* x, int64_t n, int64_t win, double threshold, int max_iter) {
    if (win < 1 || n < win) return;
    const int64_t n_win = n / win;
    std::vector<double> maa(n_win);
    std::vector<double> sorted(n_win);

    for (int iter = 0; iter < max_iter; ++iter) {
        for (int64_t w = 0; w < n_win; ++w) {
            double mx = 0.0;
            const double* seg = x + w * win;
            for (int64_t i = 0; i < win; ++i) mx = std::max(mx, std::fabs(seg[i]));
            maa[w] = mx;
        }
        sorted = maa;
        std::nth_element(sorted.begin(), sorted.begin() + n_win / 2, sorted.end());
        double med = sorted[n_win / 2];
        if (n_win % 2 == 0) {
            // numpy median: mean of the two middle order statistics
            double lo = *std::max_element(sorted.begin(), sorted.begin() + n_win / 2);
            med = 0.5 * (lo + sorted[n_win / 2]);
        }
        if (med == 0.0) break;
        int64_t worst = -1;
        double worst_val = threshold * med;
        for (int64_t w = 0; w < n_win; ++w) {
            if (maa[w] > worst_val) { worst_val = maa[w]; worst = w; }
        }
        if (worst < 0) break;

        double* seg = x + worst * win;
        int64_t peak = 0;
        double peak_val = 0.0;
        for (int64_t i = 0; i < win; ++i) {
            const double a = std::fabs(seg[i]);
            if (a > peak_val) { peak_val = a; peak = i; }
        }
        // zero-crossings: |sign(x[i+1]) - sign(x[i])| > 1
        auto sgn = [](double v) { return (v > 0.0) - (v < 0.0); };
        int64_t start = 0, end = win - 1;
        for (int64_t i = peak - 1; i >= 0; --i) {
            if (std::abs(sgn(seg[i + 1]) - sgn(seg[i])) > 1) { start = i + 1; break; }
        }
        bool found_after = false;
        for (int64_t i = peak; i + 1 < win; ++i) {
            if (std::abs(sgn(seg[i + 1]) - sgn(seg[i])) > 1) { end = i; found_after = true; break; }
        }
        (void)found_after;
        for (int64_t i = start; i < end; ++i) seg[i] = 1e-4;
    }
}

// Linear interpolation over NaN runs, in place (oracle interpolate_nans semantics).
void interpolate_nans_f64(double* x, int64_t n) {
    int64_t prev_ok = -1;
    bool any_ok = false;
    for (int64_t i = 0; i < n; ++i) if (!std::isnan(x[i])) { any_ok = true; break; }
    if (!any_ok) return;
    for (int64_t i = 0; i < n; ++i) {
        if (!std::isnan(x[i])) { prev_ok = i; continue; }
        int64_t next_ok = -1;
        for (int64_t j = i + 1; j < n; ++j) if (!std::isnan(x[j])) { next_ok = j; break; }
        if (prev_ok < 0) x[i] = x[next_ok];
        else if (next_ok < 0) x[i] = x[prev_ok];
        else {
            const double t = double(i - prev_ok) / double(next_ok - prev_ok);
            x[i] = x[prev_ok] + t * (x[next_ok] - x[prev_ok]);
        }
    }
}

// Zero-mean, peak-normalise, clip to [-1, 1], in place (NaNs interpolated first).
void abs_max_normalise_f64(double* x, int64_t n) {
    interpolate_nans_f64(x, n);
    double mean = 0.0;
    for (int64_t i = 0; i < n; ++i) mean += x[i];
    mean /= double(n);
    double peak = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        x[i] -= mean;
        peak = std::max(peak, std::fabs(x[i]));
    }
    if (peak > 0.0) {
        const double inv = 1.0 / peak;
        for (int64_t i = 0; i < n; ++i) {
            double v = x[i] * inv;
            x[i] = std::min(1.0, std::max(-1.0, v));
        }
    }
}

// Full PCG/ECG chain for one record: resample -> (despike) -> LP/HP biquads -> abs-max.
// h: resampling FIR (scipy design, gain*up); sos_lp/sos_hp: one biquad each.
void preprocess_chain_f64(const double* x, int64_t n, int up, int down,
                          const double* h, int64_t hlen,
                          const double* sos_lp, const double* sos_hp,
                          int do_despike, int64_t despike_win,
                          double* out, int64_t n_out) {
    std::vector<double> clean(x, x + n);
    interpolate_nans_f64(clean.data(), n);   // oracle order: NaN-fix happens pre-resample
    std::vector<double> buf(n_out);
    if (up == down) {
        std::memcpy(buf.data(), clean.data(), sizeof(double) * std::min(n, n_out));
    } else {
        resample_poly_f64(clean.data(), n, up, down, h, hlen, buf.data(), n_out);
    }
    if (do_despike) despike_f64(buf.data(), n_out, despike_win, 3.0, 1000);
    sosfilt_f64(sos_lp, 1, buf.data(), n_out);
    sosfilt_f64(sos_hp, 1, buf.data(), n_out);
    abs_max_normalise_f64(buf.data(), n_out);
    std::memcpy(out, buf.data(), sizeof(double) * n_out);
}

// Batched variant over records of equal raw length (OpenMP across records).
void preprocess_batch_f64(const double* x, int64_t batch, int64_t n, int up, int down,
                          const double* h, int64_t hlen,
                          const double* sos_lp, const double* sos_hp,
                          int do_despike, int64_t despike_win,
                          double* out, int64_t n_out) {
#pragma omp parallel for schedule(dynamic)
    for (int64_t b = 0; b < batch; ++b) {
        preprocess_chain_f64(x + b * n, n, up, down, h, hlen, sos_lp, sos_hp,
                             do_despike, despike_win, out + b * n_out, n_out);
    }
}

}  // extern "C"
