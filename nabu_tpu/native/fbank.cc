// Native host-side fbank feature extraction for the data-prep hot loop
// (reference: nabu/scripts/data.py per-utterance loop over
// feature_computers/fbank.py). One pass: pre-emphasis -> framing ->
// (optional log energy) -> windowing -> real FFT -> power spectrum ->
// mel filterbank -> log. The window and filterbank matrix are computed
// by the Python side (features/sigproc.py) and passed in, so the
// geometry is bit-identical to the numpy oracle; the FFT and
// accumulations run in double precision.
//
// The real FFT is done as an N/2-point complex FFT over packed
// even/odd samples plus an untangling pass, with bit-reversal and
// twiddle tables precomputed once per call and reused across frames.
//
// Exposed via ctypes from nabu_tpu/native/__init__.py; the numpy path
// remains the fallback and the test oracle.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct RealFftPlan {
  int64_t n;       // real FFT size (power of two)
  int64_t half;    // n / 2 — complex FFT size
  std::vector<int64_t> bitrev;        // [half]
  std::vector<double> stage_tw;       // packed per-stage twiddles (re,im)
  std::vector<int64_t> stage_off;     // offset into stage_tw per stage
  std::vector<double> untangle;       // [half+1] e^{-2*pi*i*k/n} (re,im)

  explicit RealFftPlan(int64_t nfft) : n(nfft), half(nfft / 2) {
    bitrev.assign(static_cast<size_t>(half), 0);
    int64_t j = 0;
    for (int64_t i = 1; i < half; ++i) {
      int64_t bit = half >> 1;
      for (; j & bit; bit >>= 1) j ^= bit;
      j ^= bit;
      bitrev[static_cast<size_t>(i)] = j;
    }
    for (int64_t len = 2; len <= half; len <<= 1) {
      stage_off.push_back(static_cast<int64_t>(stage_tw.size()));
      for (int64_t k = 0; k < len / 2; ++k) {
        const double ang = -2.0 * M_PI * static_cast<double>(k) /
                           static_cast<double>(len);
        stage_tw.push_back(std::cos(ang));
        stage_tw.push_back(std::sin(ang));
      }
    }
    untangle.reserve(static_cast<size_t>(2 * (half + 1)));
    for (int64_t k = 0; k <= half; ++k) {
      const double ang = -2.0 * M_PI * static_cast<double>(k) /
                         static_cast<double>(n);
      untangle.push_back(std::cos(ang));
      untangle.push_back(std::sin(ang));
    }
  }

  // In-place complex FFT of size `half` over interleaved (re, im).
  void cfft(double* z) const {
    for (int64_t i = 1; i < half; ++i) {
      const int64_t j2 = bitrev[static_cast<size_t>(i)];
      if (i < j2) {
        std::swap(z[2 * i], z[2 * j2]);
        std::swap(z[2 * i + 1], z[2 * j2 + 1]);
      }
    }
    int stage = 0;
    for (int64_t len = 2; len <= half; len <<= 1, ++stage) {
      const double* tw = stage_tw.data() + stage_off[static_cast<size_t>(stage)];
      for (int64_t i = 0; i < half; i += len) {
        for (int64_t k = 0; k < len / 2; ++k) {
          const double wr = tw[2 * k], wi = tw[2 * k + 1];
          double* a = z + 2 * (i + k);
          double* b = z + 2 * (i + k + len / 2);
          const double tr = b[0] * wr - b[1] * wi;
          const double ti = b[0] * wi + b[1] * wr;
          b[0] = a[0] - tr;
          b[1] = a[1] - ti;
          a[0] += tr;
          a[1] += ti;
        }
      }
    }
  }

  // Power spectrum of a real frame (already windowed, length n) ->
  // pspec[n/2 + 1]. The natural layout buf[i] = x[i] doubles as the
  // packed complex input z[k] = x[2k] + i*x[2k+1].
  void power_spectrum(double* buf, double* pspec, double scale) const {
    cfft(buf);
    // untangle: X[k] = E[k] + e^{-2pi i k/n} O[k]
    //   E[k] = (Z[k] + conj(Z[half-k])) / 2
    //   O[k] = (Z[k] - conj(Z[half-k])) / (2i)
    // with Z[half] = Z[0].
    for (int64_t k = 0; k <= half; ++k) {
      const int64_t k1 = (k == half) ? 0 : k;
      const int64_t k2 = (k == 0) ? 0 : half - k;
      const double zr = buf[2 * k1], zi = buf[2 * k1 + 1];
      const double yr = buf[2 * k2], yi = -buf[2 * k2 + 1];
      const double er = 0.5 * (zr + yr), ei = 0.5 * (zi + yi);
      const double odr = 0.5 * (zi - yi), odi = -0.5 * (zr - yr);
      const double wr = untangle[2 * k], wi = untangle[2 * k + 1];
      const double xr = er + odr * wr - odi * wi;
      const double xi = ei + odr * wi + odi * wr;
      pspec[k] = (xr * xr + xi * xi) * scale;
    }
  }
};

}  // namespace

extern "C" {

// Number of frames the framing step produces (matches sigproc.framesig).
int64_t fbank_num_frames(int64_t slen, int64_t frame_len,
                         int64_t frame_step) {
  if (slen <= frame_len) return 1;
  const int64_t num = (slen - frame_len + frame_step - 1) / frame_step;
  return 1 + num;
}

// Log-mel filterbank features.
//   signal:   [slen] float32
//   win:      [frame_len] float32 window
//   fb:       [nfilt, nbins] float32 filterbank (nbins = nfft/2 + 1)
//   out:      [num_frames, nfilt + include_energy] float32 (row-major)
// Returns 0 on success, nonzero on bad arguments.
int32_t fbank_f32(const float* signal, int64_t slen, int64_t frame_len,
                  int64_t frame_step, int64_t nfft, float preemph,
                  const float* win, const float* fb, int64_t nfilt,
                  int32_t include_energy, float* out) {
  if (nfft <= 2 || (nfft & (nfft - 1)) != 0) return 1;
  if (frame_len <= 0 || frame_step <= 0 || slen <= 0) return 2;
  const int64_t nbins = nfft / 2 + 1;
  const int64_t num_frames = fbank_num_frames(slen, frame_len, frame_step);
  const int64_t dim = nfilt + (include_energy ? 1 : 0);
  const int64_t copy_len = frame_len < nfft ? frame_len : nfft;

  const RealFftPlan plan(nfft);
  std::vector<double> frame(static_cast<size_t>(frame_len));
  std::vector<double> buf(static_cast<size_t>(nfft));
  std::vector<double> pspec(static_cast<size_t>(nbins));
  const double inv_nfft = 1.0 / static_cast<double>(nfft);

  // The triangular mel filters are sparse (each spans a small bin
  // range); precompute per-filter [start, end) + dense double weights
  // so the per-frame mel stage only touches live bins.
  std::vector<int64_t> fstart(static_cast<size_t>(nfilt));
  std::vector<int64_t> fend(static_cast<size_t>(nfilt));
  std::vector<std::vector<double>> fweights(static_cast<size_t>(nfilt));
  for (int64_t j = 0; j < nfilt; ++j) {
    const float* fbrow = fb + j * nbins;
    int64_t s = 0, e = nbins;
    while (s < nbins && fbrow[s] == 0.0f) ++s;
    while (e > s && fbrow[e - 1] == 0.0f) --e;
    fstart[static_cast<size_t>(j)] = s;
    fend[static_cast<size_t>(j)] = e;
    auto& w = fweights[static_cast<size_t>(j)];
    w.resize(static_cast<size_t>(e - s));
    for (int64_t k = s; k < e; ++k)
      w[static_cast<size_t>(k - s)] = static_cast<double>(fbrow[k]);
  }

  for (int64_t t = 0; t < num_frames; ++t) {
    const int64_t start = t * frame_step;
    // pre-emphasized frame with zero tail padding:
    // y[i] = x[i] - p * x[i-1], y[0] = x[0]
    const int64_t live = std::max<int64_t>(
        0, std::min(frame_len, slen - start));
    for (int64_t i = 0; i < live; ++i) {
      const int64_t s = start + i;
      double v = static_cast<double>(signal[s]);
      if (s > 0)
        v -= static_cast<double>(preemph) *
             static_cast<double>(signal[s - 1]);
      frame[static_cast<size_t>(i)] = v;
    }
    for (int64_t i = live; i < frame_len; ++i)
      frame[static_cast<size_t>(i)] = 0.0;

    float* row = out + t * dim;
    if (include_energy) {
      double e = 0.0;
      for (int64_t i = 0; i < live; ++i)
        e += frame[static_cast<size_t>(i)] * frame[static_cast<size_t>(i)];
      row[0] = static_cast<float>(std::log(e > 1e-30 ? e : 1e-30));
    }
    // window + zero-pad to nfft (natural order == packed complex input)
    std::memset(buf.data(), 0, sizeof(double) * static_cast<size_t>(nfft));
    for (int64_t i = 0; i < copy_len; ++i)
      buf[static_cast<size_t>(i)] =
          frame[static_cast<size_t>(i)] * static_cast<double>(win[i]);
    plan.power_spectrum(buf.data(), pspec.data(), inv_nfft);

    float* feat = row + (include_energy ? 1 : 0);
    for (int64_t j = 0; j < nfilt; ++j) {
      const int64_t s = fstart[static_cast<size_t>(j)];
      const int64_t e = fend[static_cast<size_t>(j)];
      const double* w = fweights[static_cast<size_t>(j)].data();
      double acc = 0.0;
      for (int64_t k = s; k < e; ++k)
        acc += pspec[static_cast<size_t>(k)] * w[k - s];
      feat[j] = static_cast<float>(std::log(acc > 1e-30 ? acc : 1e-30));
    }
  }
  return 0;
}

}  // extern "C"
