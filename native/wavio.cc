// Native batch WAV decoder — the host-side IO hot path.
//
// The reference decodes wavs one-by-one through torchaudio/sox inside
// DataLoader workers (audio_wav2vec2/dataset.py:39, audio_mel/dataset.py:146).
// Here a thread pool decodes a whole batch of PCM WAV files straight into a
// preallocated [n, max_samples] float32 buffer that feeds the device
// pipeline (zero-copy from Python's side via ctypes).
//
// Supports the format the prep pipeline produces (scripts/mp4towav.py:
// mono 16 kHz PCM16) plus PCM8/24/32 and float32, with channel averaging.
// Returns per-file true lengths; errors are reported per file (code < 0 in
// the lengths slot) so one corrupt clip never fails the batch.
//
// Build: make -C native   (g++ -O3 -shared -fPIC -pthread)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrRate = -3;

struct WavInfo {
  uint16_t format = 0;      // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;
  uint32_t data_bytes = 0;
};

bool read_header(FILE* f, WavInfo* info) {
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) != 0) return false;
  if (fread(&riff_size, 4, 1, f) != 1) return false;
  if (fread(wave, 1, 4, f) != 4 || memcmp(wave, "WAVE", 4) != 0) return false;

  // walk chunks: need fmt then data
  bool have_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) return false;
    if (memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t take = size < sizeof(buf) ? size : (uint32_t)sizeof(buf);
      if (fread(buf, 1, take, f) != take) return false;
      if (size > take) fseek(f, size - take, SEEK_CUR);
      memcpy(&info->format, buf + 0, 2);
      memcpy(&info->channels, buf + 2, 2);
      memcpy(&info->sample_rate, buf + 4, 4);
      memcpy(&info->bits, buf + 14, 2);
      if (info->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&info->format, buf + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(id, "data", 4) == 0) {
      info->data_offset = ftell(f);
      info->data_bytes = size;
      return have_fmt;
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
  }
}

// decode one file into out[0:max_samples]; returns true sample count or error
int decode_one(const char* path, float* out, int max_samples, int expect_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  WavInfo info;
  if (!read_header(f, &info) || info.channels == 0 || info.bits == 0) {
    fclose(f);
    return kErrFormat;
  }
  if (expect_rate > 0 && (int)info.sample_rate != expect_rate) {
    fclose(f);
    return kErrRate;
  }

  const int bytes_per = info.bits / 8;
  const uint32_t frame_bytes = (uint32_t)bytes_per * info.channels;
  uint32_t n_frames = frame_bytes ? info.data_bytes / frame_bytes : 0;
  if ((int)n_frames > max_samples) n_frames = max_samples;

  std::vector<uint8_t> raw((size_t)n_frames * frame_bytes);
  fseek(f, info.data_offset, SEEK_SET);
  size_t got = fread(raw.data(), 1, raw.size(), f);
  fclose(f);
  n_frames = (uint32_t)(got / frame_bytes);

  const int ch = info.channels;
  const float inv_ch = 1.0f / ch;
  for (uint32_t i = 0; i < n_frames; ++i) {
    float acc = 0.0f;
    const uint8_t* p = raw.data() + (size_t)i * frame_bytes;
    for (int c = 0; c < ch; ++c, p += bytes_per) {
      float v;
      if (info.format == 3 && info.bits == 32) {
        memcpy(&v, p, 4);
      } else if (info.bits == 16) {
        int16_t s;
        memcpy(&s, p, 2);
        v = s / 32768.0f;
      } else if (info.bits == 32) {
        int32_t s;
        memcpy(&s, p, 4);
        v = s / 2147483648.0f;
      } else if (info.bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (s >> 8) / 8388608.0f;
      } else if (info.bits == 8) {
        v = ((int)p[0] - 128) / 128.0f;
      } else {
        return kErrFormat;
      }
      acc += v;
    }
    out[i] = acc * inv_ch;
  }
  // zero-pad the tail
  for (uint32_t i = n_frames; i < (uint32_t)max_samples; ++i) out[i] = 0.0f;
  return (int)n_frames;
}

}  // namespace

extern "C" {

// Decode n files in parallel. out: [n, max_samples] float32 (caller-owned),
// lengths: [n] int32 true sample counts (or negative error codes).
// Returns the number of successfully decoded files.
int decode_wav_batch(const char** paths, int n, float* out, int max_samples,
                     int* lengths, int expect_rate, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 1;
  if (n_threads > n) n_threads = n;

  std::atomic<int> next(0), ok(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int r = decode_one(paths[i], out + (size_t)i * max_samples, max_samples, expect_rate);
      lengths[i] = r;
      if (r >= 0) ok.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
