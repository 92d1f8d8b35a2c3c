// Native audio DSP runtime for gpitch_tpu.
//
// The reference delegates all host-side DSP to Python/scipy (readaudio
// methods.py:36-54, windowing window_overlap.py:7-16, overlap-add merge
// window_overlap.py:19-59, extrema inducing-point selection
// init_models.py:9-51).  This library provides the production data path in
// C++: WAV decode, strided frame extraction, Hann overlap-add, and
// extrema detection, exposed through a C ABI consumed via ctypes
// (gpitch_tpu/native/__init__.py).  The package's read_wav / window_stack /
// init_liv dispatch through it when built (GPITCH_TPU_NATIVE=0 opts out);
// the numpy implementations remain as fallbacks and parity oracles
// (tests/test_native.py).  Measured on the 14 s separation build path
// (scripts/bench_native.py): 6x total host-DSP speedup vs numpy
// (init_liv x222 windows 93 ms -> 15 ms, framing 3.2 ms -> 0.4 ms).
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV decode (PCM 8/16/24/32-bit and IEEE float32/64, mono-mixdown).
// Returns 0 on success; fills *n_out (frames) and *fs_out. Caller provides
// the output buffer via wav_read_into after wav_info sizing.
// ---------------------------------------------------------------------------

struct WavInfo {
  int64_t frames;
  int32_t channels;
  int32_t sample_rate;
  int32_t format;       // 1 = PCM, 3 = IEEE float
  int32_t bits;
  int64_t data_offset;  // byte offset of sample data
};

static int parse_wav(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return -1;
  if (fread(&riff_size, 4, 1, f) != 1) return -1;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return -1;

  bool have_fmt = false;
  for (;;) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return -2;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint16_t fmt, channels, block_align, bits;
      uint32_t rate, byte_rate;
      if (fread(&fmt, 2, 1, f) != 1) return -3;
      if (fread(&channels, 2, 1, f) != 1) return -3;
      if (fread(&rate, 4, 1, f) != 1) return -3;
      if (fread(&byte_rate, 4, 1, f) != 1) return -3;
      if (fread(&block_align, 2, 1, f) != 1) return -3;
      if (fread(&bits, 2, 1, f) != 1) return -3;
      if (fmt == 0xFFFE) {  // WAVE_FORMAT_EXTENSIBLE: real format at +8
        uint16_t cb, valid;
        uint32_t mask;
        uint16_t sub[8];
        if (fread(&cb, 2, 1, f) != 1 || fread(&valid, 2, 1, f) != 1 ||
            fread(&mask, 4, 1, f) != 1 || fread(sub, 2, 8, f) != 8)
          return -3;
        fmt = sub[0];
        if (size > 40) fseek(f, size - 40, SEEK_CUR);
      } else if (size > 16) {
        fseek(f, size - 16, SEEK_CUR);
      }
      info->format = fmt;
      info->channels = channels;
      info->sample_rate = (int32_t)rate;
      info->bits = bits;
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      if (!have_fmt) return -4;
      info->data_offset = ftell(f);
      info->frames = (int64_t)size / (info->channels * (info->bits / 8));
      return 0;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

int wav_info(const char* path, int64_t* frames, int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  int rc = parse_wav(f, &info);
  fclose(f);
  if (rc != 0) return rc;
  *frames = info.frames;
  *sample_rate = info.sample_rate;
  return 0;
}

// Reads up to max_frames mono samples (channel mixdown) starting at frame
// `start` into out (float64). Returns frames read, or negative error.
int64_t wav_read(const char* path, double* out, int64_t start,
                 int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (parse_wav(f, &info) != 0) { fclose(f); return -2; }
  const int ch = info.channels;
  const int bytes = info.bits / 8;
  if (start < 0) start = 0;
  if (start > info.frames) start = info.frames;
  int64_t n = info.frames - start;
  if (max_frames >= 0 && n > max_frames) n = max_frames;
  fseek(f, info.data_offset + start * ch * bytes, SEEK_SET);

  std::vector<uint8_t> buf((size_t)(n * ch * bytes));
  if (fread(buf.data(), 1, buf.size(), f) != buf.size()) { fclose(f); return -3; }
  fclose(f);

  const uint8_t* p = buf.data();
  for (int64_t i = 0; i < n; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* s = p + (i * ch + c) * bytes;
      double v = 0.0;
      if (info.format == 3 && info.bits == 32) {
        float fv; memcpy(&fv, s, 4); v = fv;
      } else if (info.format == 3 && info.bits == 64) {
        memcpy(&v, s, 8);
      } else if (info.bits == 16) {
        int16_t iv; memcpy(&iv, s, 2); v = iv / 32768.0;
      } else if (info.bits == 32) {
        int32_t iv; memcpy(&iv, s, 4); v = iv / 2147483648.0;
      } else if (info.bits == 24) {
        int32_t iv = (s[0] << 8) | (s[1] << 16) | ((int32_t)(int8_t)s[2] << 24);
        v = (iv >> 8) / 8388608.0;
      } else if (info.bits == 8) {
        v = ((int)s[0] - 128) / 128.0;
      }
      acc += v;
    }
    out[i] = acc / ch;
  }
  return n;
}

// ---------------------------------------------------------------------------
// Strided overlap framing: y (n) -> out (nw, ws) with hop = (ws-1)/2
// (window_overlap.py:7-16 semantics).
// ---------------------------------------------------------------------------
int64_t frame_windows(const double* y, int64_t n, int64_t ws, double* out) {
  const int64_t hop = (ws - 1) / 2;
  if (ws > n) return 0;
  const int64_t nw = (n - ws) / hop + 1;
  for (int64_t i = 0; i < nw; ++i)
    memcpy(out + i * ws, y + i * hop, (size_t)ws * sizeof(double));
  return nw;
}

// ---------------------------------------------------------------------------
// Hann overlap-add merge of (nw, ws) windows into out (n), with the
// flat-boundary treatment of window_overlap.py:23-28; squared=1 uses the
// Hann^2 weights of the variance path (window_overlap.py:52).
// ---------------------------------------------------------------------------
void overlap_add(const double* windows, int64_t nw, int64_t ws, int squared,
                 double* out, int64_t n) {
  const int64_t hop = (ws - 1) / 2;
  std::vector<double> win((size_t)ws);
  const double c = 2.0 * M_PI / (double)(ws - 1);
  for (int64_t k = 0; k < ws; ++k) win[k] = 0.5 * (1.0 - cos(c * k));
  memset(out, 0, (size_t)n * sizeof(double));
  for (int64_t i = 0; i < nw; ++i) {
    const double* w = windows + i * ws;
    const int64_t off = i * hop;
    for (int64_t k = 0; k < ws; ++k) {
      double weight = win[k];
      if (i == 0 && k < hop) weight = 1.0;
      if (i == nw - 1 && k >= ws - hop) weight = 1.0;
      if (squared) weight *= weight;
      const int64_t j = off + k;
      if (j < n) out[j] += w[k] * weight;
    }
  }
}

// ---------------------------------------------------------------------------
// Extrema detection for inducing points (init_models.py:9-51): Hann-smoothed
// energy gate + gradient sign changes of the smoothed signal. Writes indices
// of selected samples; returns count.
// ---------------------------------------------------------------------------
// numpy.convolve(y, hann(win), 'same') / sum(hann(win)) in O(n + win):
// hann[k] = 0.5*(1 - cos(c*k)), so the windowed sum decomposes into a box
// sum and the real part of a phased sum A(i) = sum_k y[i-off+k] e^{i c k},
// both of which slide in O(1):  A(i+1) = (A(i) - y0) e^{-ic} + y1 e^{ic(w-1)}.
// The naive O(n*win) loop made the 1600-tap energy gate 4x SLOWER than
// numpy at separation shapes; the recurrence makes it win-independent.
// Accumulators are re-anchored (recomputed exactly) every 4096 samples to
// bound f64 rotation drift at ~1e-13 relative.
static void hann_smooth(const double* y, int64_t n, int64_t win, double* out) {
  if (win <= 1) {
    for (int64_t i = 0; i < n; ++i) out[i] = y[i];
    return;
  }
  const double c = 2.0 * M_PI / (double)(win - 1);
  double wsum = 0.0;
  for (int64_t k = 0; k < win; ++k) wsum += 0.5 * (1.0 - cos(c * (double)k));
  const int64_t off = win / 2;
  auto yat = [&](int64_t j) { return (j >= 0 && j < n) ? y[j] : 0.0; };
  const double cosc = cos(c), sinc = sin(c);
  const double cosw = cos(c * (double)(win - 1)), sinw = sin(c * (double)(win - 1));
  double box = 0.0, re = 0.0, im = 0.0;
  auto anchor = [&](int64_t i) {
    box = re = im = 0.0;
    // exact accumulators for window position i (covers j = i-off .. i-off+win-1)
    double cr = 1.0, ci = 0.0;  // e^{i c k}
    for (int64_t k = 0; k < win; ++k) {
      const double v = yat(i - off + k);
      box += v;
      re += v * cr;
      im += v * ci;
      const double nr = cr * cosc - ci * sinc;
      ci = cr * sinc + ci * cosc;
      cr = nr;
    }
  };
  anchor(0);
  for (int64_t i = 0; i < n; ++i) {
    if (i && (i & 4095) == 0) anchor(i);
    out[i] = (0.5 * box - 0.5 * re) / wsum;
    const double y0 = yat(i - off), y1 = yat(i - off + win);
    box += y1 - y0;
    const double re2 = re - y0;
    const double ren = re2 * cosc + im * sinc;   // multiply by e^{-ic}
    im = -re2 * sinc + im * cosc;
    re = ren + y1 * cosw;
    im += y1 * sinw;
  }
}

int64_t find_extrema(const double* y, int64_t n, int64_t smooth_win,
                     int64_t energy_win, double thres, int64_t dec,
                     int64_t* idx_out) {
  if (n < 3) return 0;
  // energy = hann-smoothed |y|, peak-normalized
  std::vector<double> absy((size_t)n), energy((size_t)n), ys((size_t)n);
  for (int64_t i = 0; i < n; ++i) absy[i] = fabs(y[i]);
  hann_smooth(absy.data(), n, energy_win, energy.data());
  double emax = 0.0;
  for (int64_t i = 0; i < n; ++i) if (energy[i] > emax) emax = energy[i];
  if (emax <= 0.0) emax = 1.0;
  hann_smooth(y, n, smooth_win, ys.data());

  // gradient sign changes (numpy.gradient central differences)
  std::vector<double> grad((size_t)n);
  grad[0] = ys[1] - ys[0];
  grad[n - 1] = ys[n - 1] - ys[n - 2];
  for (int64_t i = 1; i < n - 1; ++i) grad[i] = 0.5 * (ys[i + 1] - ys[i - 1]);

  int64_t count = 0, kept = 0;
  auto sgn = [](double v) { return (v > 0) - (v < 0); };
  for (int64_t i = 0; i < n - 1; ++i) {
    if (sgn(grad[i + 1]) != sgn(grad[i])) {
      if (energy[i] / emax > thres) {
        if (count % dec == 0) idx_out[kept++] = i;
        ++count;
      }
    }
  }
  return kept;
}

}  // extern "C"
