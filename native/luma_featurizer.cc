// luma_featurizer.cc — native WAV -> MFCC featurizer for the LUMA compile
// pass.
//
// Implements the same pipeline as
// disentagled_multimodal_fusion_tpu/data/audio.py (which itself mirrors the
// reference's torchaudio path, reference dataset_luma.py:238-295):
//   PCM WAV decode -> band-limited sinc resample to 16 kHz -> mono ->
//   pad/trim 3 s -> power spectrogram (n_fft 400, hop 200, periodic Hann,
//   reflect center) -> HTK mel filterbank (40 mels, no norm) ->
//   10*log10(max(x, 1e-10)) -> orthonormal DCT-II -> first 40 coeffs ->
//   time-mean.
//
// The reference decodes + featurizes per sample per epoch inside
// __getitem__ (its I/O hot loop); this library lets the offline compile
// step chew through the whole corpus at native speed, and the exported
// mfcc_mean() is bit-compatible (to f32 round-off) with the numpy
// implementation — tested in
// tests/test_data.py::test_wav_roundtrip_and_native_parity.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)
// ABI: plain C functions over float32 buffers (ctypes-friendly).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------- resample
// Band-limited sinc interpolation over the gcd-reduced rate pair
// (torchaudio's kernel; see data/audio.py:resample for the math notes).
std::vector<float> resample(const std::vector<float>& x, int orig_freq,
                            int new_freq, int lowpass_filter_width = 6,
                            double rolloff = 0.99) {
  if (orig_freq == new_freq) return x;
  int g = 1;
  {
    int a = orig_freq, b = new_freq;
    while (b) { int t = a % b; a = b; b = t; }
    g = a;
  }
  const int orig = orig_freq / g, nu = new_freq / g;
  const double base_freq = std::min(orig, nu) * rolloff / 2.0;
  const int width =
      (int)std::ceil(lowpass_filter_width * orig / (2.0 * base_freq));
  const int K = 2 * width + orig;

  // kernels[p][k], p in [0, nu)
  std::vector<double> kernels((size_t)nu * K);
  const double scale = base_freq / (orig / 2.0);
  for (int p = 0; p < nu; ++p) {
    for (int k = 0; k < K; ++k) {
      double idx = (double)(k - width) / orig;
      double t = (idx - (double)p / nu) * 2.0 * base_freq;
      if (t < -lowpass_filter_width) t = -lowpass_filter_width;
      if (t > lowpass_filter_width) t = lowpass_filter_width;
      double w = std::cos(t * kPi / lowpass_filter_width / 2.0);
      w *= w;
      double s = (t == 0.0) ? 1.0 : std::sin(kPi * t) / (kPi * t);
      kernels[(size_t)p * K + k] = s * w * scale;
    }
  }

  const int64_t n = (int64_t)x.size();
  const int64_t target_len = (int64_t)std::ceil((double)nu * n / orig);
  std::vector<double> xp(n + 2 * width + orig, 0.0);
  for (int64_t i = 0; i < n; ++i) xp[width + i] = x[i];

  const int64_t n_strides = (int64_t)((xp.size() - K) / orig + 1);
  std::vector<float> out(target_len, 0.0f);
  for (int64_t s = 0; s < n_strides; ++s) {
    const double* seg = xp.data() + s * orig;
    for (int p = 0; p < nu; ++p) {
      int64_t pos = s * nu + p;
      if (pos >= target_len) break;
      const double* ker = kernels.data() + (size_t)p * K;
      double acc = 0.0;
      for (int k = 0; k < K; ++k) acc += seg[k] * ker[k];
      out[pos] = (float)acc;
    }
  }
  return out;
}

// ------------------------------------------------------------------- MFCC
struct MfccTables {
  int n_fft, hop, n_freqs, n_mels, n_mfcc;
  std::vector<double> window;            // periodic Hann (n_fft)
  std::vector<double> cos_t, sin_t;      // (n_freqs, n_fft) DFT tables
  std::vector<double> fb;                // (n_freqs, n_mels)
  std::vector<double> dct;               // (n_mels, n_mfcc)
};

double hz_to_mel(double f) { return 2595.0 * std::log10(1.0 + f / 700.0); }
double mel_to_hz(double m) { return 700.0 * (std::pow(10.0, m / 2595.0) - 1.0); }

MfccTables make_tables(int sample_rate, int n_mfcc, int n_mels, int n_fft,
                       int hop) {
  MfccTables t;
  t.n_fft = n_fft;
  t.hop = hop;
  t.n_freqs = n_fft / 2 + 1;
  t.n_mels = n_mels;
  t.n_mfcc = n_mfcc;

  t.window.resize(n_fft);
  for (int i = 0; i < n_fft; ++i)
    t.window[i] = 0.5 - 0.5 * std::cos(2.0 * kPi * i / n_fft);

  t.cos_t.resize((size_t)t.n_freqs * n_fft);
  t.sin_t.resize((size_t)t.n_freqs * n_fft);
  for (int f = 0; f < t.n_freqs; ++f)
    for (int i = 0; i < n_fft; ++i) {
      double a = -2.0 * kPi * f * i / n_fft;
      t.cos_t[(size_t)f * n_fft + i] = std::cos(a);
      t.sin_t[(size_t)f * n_fft + i] = std::sin(a);
    }

  // HTK mel triangles, no norm.
  t.fb.assign((size_t)t.n_freqs * n_mels, 0.0);
  std::vector<double> f_pts(n_mels + 2);
  double m_min = hz_to_mel(0.0), m_max = hz_to_mel(sample_rate / 2.0);
  for (int i = 0; i < n_mels + 2; ++i)
    f_pts[i] = mel_to_hz(m_min + (m_max - m_min) * i / (n_mels + 1));
  for (int fi = 0; fi < t.n_freqs; ++fi) {
    double freq = (double)(sample_rate / 2) * fi / (t.n_freqs - 1);
    for (int m = 0; m < n_mels; ++m) {
      double down = (freq - f_pts[m]) / (f_pts[m + 1] - f_pts[m]);
      double up = (f_pts[m + 2] - freq) / (f_pts[m + 2] - f_pts[m + 1]);
      double v = std::min(down, up);
      t.fb[(size_t)fi * n_mels + m] = v > 0.0 ? v : 0.0;
    }
  }

  t.dct.resize((size_t)n_mels * n_mfcc);
  for (int n = 0; n < n_mels; ++n)
    for (int k = 0; k < n_mfcc; ++k) {
      double v = std::cos(kPi / n_mels * (n + 0.5) * k) * std::sqrt(2.0 / n_mels);
      if (k == 0) v /= std::sqrt(2.0);
      t.dct[(size_t)n * n_mfcc + k] = v;
    }
  return t;
}

// mono (n,) -> time-mean MFCC (n_mfcc,)
void mfcc_mean_impl(const float* mono, int64_t n, const MfccTables& t,
                    float* out) {
  const int pad = t.n_fft / 2;
  const int64_t padded = n + 2 * pad;
  std::vector<double> x(padded);
  // reflect padding with repeated reflection (np.pad 'reflect' semantics:
  // odd extension with period 2*(n-1)); a single bounce reads out of
  // bounds whenever pad >= n
  const int64_t period = 2 * (n - 1);
  for (int64_t i = 0; i < padded; ++i) {
    int64_t j = i - pad;
    if (n == 1) {
      j = 0;
    } else {
      j = ((j % period) + period) % period;
      if (j >= n) j = period - j;
    }
    x[i] = mono[j];
  }
  const int64_t frames = 1 + (padded - t.n_fft) / t.hop;

  std::vector<double> acc(t.n_mfcc, 0.0);
  std::vector<double> frame(t.n_fft), mel(t.n_mels), meldb(t.n_mels);
  for (int64_t fr = 0; fr < frames; ++fr) {
    const double* seg = x.data() + fr * t.hop;
    for (int i = 0; i < t.n_fft; ++i) frame[i] = seg[i] * t.window[i];
    // power spectrum -> mel
    std::fill(mel.begin(), mel.end(), 0.0);
    for (int f = 0; f < t.n_freqs; ++f) {
      const double* ct = t.cos_t.data() + (size_t)f * t.n_fft;
      const double* st = t.sin_t.data() + (size_t)f * t.n_fft;
      double re = 0.0, im = 0.0;
      for (int i = 0; i < t.n_fft; ++i) {
        re += frame[i] * ct[i];
        im += frame[i] * st[i];
      }
      double p = re * re + im * im;
      const double* fbrow = t.fb.data() + (size_t)f * t.n_mels;
      for (int m = 0; m < t.n_mels; ++m) mel[m] += p * fbrow[m];
    }
    for (int m = 0; m < t.n_mels; ++m)
      meldb[m] = 10.0 * std::log10(mel[m] > 1e-10 ? mel[m] : 1e-10);
    for (int k = 0; k < t.n_mfcc; ++k) {
      double v = 0.0;
      for (int m = 0; m < t.n_mels; ++m) v += meldb[m] * t.dct[(size_t)m * t.n_mfcc + k];
      acc[k] += v;
    }
  }
  for (int k = 0; k < t.n_mfcc; ++k) out[k] = (float)(acc[k] / (double)frames);
}

// --------------------------------------------------------------- WAV read
bool read_wav_file(const char* path, std::vector<float>* mono_out,
                   int* rate_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  auto rd_u32 = [&](uint32_t* v) { return std::fread(v, 4, 1, f) == 1; };
  auto rd_u16 = [&](uint16_t* v) { return std::fread(v, 2, 1, f) == 1; };
  char tag[5] = {0};
  uint32_t sz;
  if (std::fread(tag, 1, 4, f) != 4 || std::strncmp(tag, "RIFF", 4) ||
      !rd_u32(&sz) || std::fread(tag, 1, 4, f) != 4 ||
      std::strncmp(tag, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> data;
  while (std::fread(tag, 1, 4, f) == 4 && rd_u32(&sz)) {
    if (!std::strncmp(tag, "fmt ", 4)) {
      uint32_t brate;
      uint16_t balign;
      rd_u16(&fmt);
      rd_u16(&channels);
      rd_u32(&rate);
      rd_u32(&brate);
      rd_u16(&balign);
      rd_u16(&bits);
      (void)brate;
      (void)balign;
      uint32_t consumed = 16;
      if (fmt == 0xFFFE && sz >= 16 + 2 + 22) {
        // WAVE_FORMAT_EXTENSIBLE: the real format tag is the first u16 of
        // the SubFormat GUID (after cbSize, validBits, channelMask)
        uint16_t cb = 0, valid_bits = 0, sub = 0;
        uint32_t mask = 0;
        rd_u16(&cb);
        rd_u16(&valid_bits);
        rd_u32(&mask);
        rd_u16(&sub);
        (void)valid_bits;
        (void)mask;
        fmt = sub;  // 1 = PCM, 3 = IEEE float
        consumed += 2 + 2 + 4 + 2;
      }
      if (sz > consumed) std::fseek(f, (long)(sz - consumed), SEEK_CUR);
      if (sz & 1) std::fseek(f, 1, SEEK_CUR);
    } else if (!std::strncmp(tag, "data", 4)) {
      data.resize(sz);
      if (std::fread(data.data(), 1, sz, f) != sz) {
        std::fclose(f);
        return false;
      }
      if (sz & 1) std::fseek(f, 1, SEEK_CUR);  // RIFF pad byte
    } else {
      std::fseek(f, sz + (sz & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  // accept PCM (1) and IEEE float (3) with byte-aligned sample widths
  if (data.empty() || channels == 0 || bits < 8 || (bits % 8) != 0 ||
      (fmt != 1 && fmt != 3)) {
    return false;
  }

  const int64_t frames = (int64_t)data.size() / (channels * (bits / 8));
  std::vector<float> mono(frames, 0.0f);
  for (int64_t i = 0; i < frames; ++i) {
    double s = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data.data() + (i * channels + c) * (bits / 8);
      double v = 0.0;
      if (fmt == 3 && bits == 32) {  // IEEE float32
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (fmt == 3 && bits == 64) {  // IEEE float64
        double dv;
        std::memcpy(&dv, p, 8);
        v = dv;
      } else if (fmt == 3) {
        return false;  // float with unexpected width
      } else if (bits == 16) {
        int16_t iv;
        std::memcpy(&iv, p, 2);
        v = iv / 32768.0;
      } else if (bits == 32) {
        int32_t iv;
        std::memcpy(&iv, p, 4);
        v = iv / 2147483648.0;
      } else if (bits == 8) {
        v = ((int)p[0] - 128) / 128.0;
      } else if (bits == 24) {
        int32_t iv = p[0] | (p[1] << 8) | (p[2] << 16);
        if (iv >= (1 << 23)) iv -= (1 << 24);
        v = iv / (double)(1 << 23);
      }
      s += v;
    }
    mono[i] = (float)(s / channels);
  }
  *mono_out = std::move(mono);
  *rate_out = (int)rate;
  return true;
}

}  // namespace

extern "C" {

// mono float32 signal -> time-mean MFCC. Returns 0 on success.
int mfcc_mean(const float* mono, int64_t n, int sample_rate, int n_mfcc,
              int n_mels, int n_fft, int hop, float* out) {
  if (n < 1) return 1;
  MfccTables t = make_tables(sample_rate, n_mfcc, n_mels, n_fft, hop);
  mfcc_mean_impl(mono, n, t, out);
  return 0;
}

// Full reference pipeline: wav path -> n_mfcc feature. Returns 0 on success.
// n_mels is fixed at 40 to match the numpy pipeline's default
// (data/audio.py::mfcc, mirroring torchaudio's melkwargs) for ANY n_mfcc.
static int featurize_wav_with_tables(const char* path, int sample_rate,
                                     double max_length_s,
                                     const MfccTables& t, float* out) {
  std::vector<float> mono;
  int rate = 0;
  if (!read_wav_file(path, &mono, &rate)) return 1;
  if (rate != sample_rate) mono = resample(mono, rate, sample_rate);
  int64_t target = (int64_t)(max_length_s * sample_rate);
  if ((int64_t)mono.size() > target) mono.resize(target);
  while ((int64_t)mono.size() < target) mono.push_back(0.0f);
  mfcc_mean_impl(mono.data(), target, t, out);
  return 0;
}

int featurize_wav(const char* path, int sample_rate, double max_length_s,
                  int n_mfcc, float* out) {
  MfccTables t = make_tables(sample_rate, n_mfcc, /*n_mels=*/40, 400, 200);
  return featurize_wav_with_tables(path, sample_rate, max_length_s, t, out);
}

// Batch version over many files (the offline compile hot path).
// paths: concatenated NUL-separated strings; n_paths entries.
// out: (n_paths, n_mfcc). Returns number of failures.
int featurize_batch(const char* paths, int n_paths, int sample_rate,
                    double max_length_s, int n_mfcc, float* out) {
  // Pre-split the path list so the corpus loop can run in parallel.
  std::vector<const char*> ptrs(n_paths);
  {
    const char* p = paths;
    for (int i = 0; i < n_paths; ++i) {
      ptrs[i] = p;
      p += std::strlen(p) + 1;
    }
  }
  // Tables depend only on (sample_rate, n_mfcc): build ONCE, share
  // read-only across the parallel corpus loop.
  const MfccTables t = make_tables(sample_rate, n_mfcc, /*n_mels=*/40, 400, 200);
  int failures = 0;
#pragma omp parallel for schedule(dynamic) reduction(+ : failures)
  for (int i = 0; i < n_paths; ++i) {
    if (featurize_wav_with_tables(ptrs[i], sample_rate, max_length_s, t,
                                  out + (size_t)i * n_mfcc) != 0) {
      ++failures;
      // NaN-fill failed rows: an unambiguous per-row failure marker (a
      // legitimate MFCC-mean row can in principle be all-zero, never NaN)
      for (int k = 0; k < n_mfcc; ++k)
        out[(size_t)i * n_mfcc + k] = std::numeric_limits<float>::quiet_NaN();
    }
  }
  return failures;
}
}
