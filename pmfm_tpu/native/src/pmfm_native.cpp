// PMFM-TPU native runtime: WAV codec, CSV logger, monotonic timers.
//
// TPU-native counterpart of the reference's C++ runtime infrastructure:
// AudioFile.h/.cpp + libsndfile read path (main.cpp:307-365) for audio I/O,
// CSV_Logger.hpp for benchmark records, Benchmarker.hpp's chrono timers.
// The JAX compute path never touches this code; it serves the host runtime
// (CLI, benchmarking, dataset IO). Exposed as a C ABI consumed via ctypes
// (pmfm_tpu/native/runtime.py).

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Timers (Benchmarker.hpp:33-77 analog)
// ---------------------------------------------------------------------------
double pmfm_monotonic_ms() {
  auto now = std::chrono::steady_clock::now().time_since_epoch();
  return std::chrono::duration<double, std::milli>(now).count();
}

// ---------------------------------------------------------------------------
// WAV codec
// ---------------------------------------------------------------------------
namespace {

struct WavFmt {
  uint16_t format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

bool read_all(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

}  // namespace

// Read a WAV file into a malloc'd mono float32 buffer (channel-averaged).
// Returns 0 on success; caller frees with pmfm_free.
int pmfm_wav_read(const char* path, float** out, int64_t* out_len,
                  int32_t* out_sample_rate) {
  std::vector<uint8_t> d;
  if (!read_all(path, d) || d.size() < 44) return 1;
  if (std::memcmp(d.data(), "RIFF", 4) != 0 ||
      std::memcmp(d.data() + 8, "WAVE", 4) != 0)
    return 2;
  WavFmt fmt;
  const uint8_t* payload = nullptr;
  uint32_t payload_size = 0;
  size_t pos = 12;
  while (pos + 8 <= d.size()) {
    uint32_t size;
    std::memcpy(&size, d.data() + pos + 4, 4);
    const uint8_t* body = d.data() + pos + 8;
    if (pos + 8 + size > d.size()) size = static_cast<uint32_t>(d.size() - pos - 8);
    if (std::memcmp(d.data() + pos, "fmt ", 4) == 0 && size >= 16) {
      std::memcpy(&fmt.format, body, 2);
      std::memcpy(&fmt.channels, body + 2, 2);
      std::memcpy(&fmt.sample_rate, body + 4, 4);
      std::memcpy(&fmt.bits, body + 14, 2);
      if (fmt.format == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format is the first two bytes
        // of the SubFormat GUID at fmt-body offset 24
        if (size >= 26) {
          std::memcpy(&fmt.format, body + 24, 2);
        } else {
          fmt.format = 1;  // malformed extensible header: assume PCM
        }
      }
    } else if (std::memcmp(d.data() + pos, "data", 4) == 0) {
      payload = body;
      payload_size = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!payload || fmt.channels == 0) return 3;

  std::vector<float> mono;
  const uint32_t ch = fmt.channels;
  if (fmt.format == 3 && fmt.bits == 32) {
    size_t n = payload_size / 4;
    mono.reserve(n / ch);
    const float* s = reinterpret_cast<const float*>(payload);
    for (size_t i = 0; i + ch <= n; i += ch) {
      double acc = 0;
      for (uint32_t c = 0; c < ch; ++c) acc += s[i + c];
      mono.push_back(static_cast<float>(acc / ch));
    }
  } else if (fmt.format == 1 && fmt.bits == 16) {
    size_t n = payload_size / 2;
    const int16_t* s = reinterpret_cast<const int16_t*>(payload);
    for (size_t i = 0; i + ch <= n; i += ch) {
      double acc = 0;
      for (uint32_t c = 0; c < ch; ++c) acc += s[i + c] / 32768.0;
      mono.push_back(static_cast<float>(acc / ch));
    }
  } else if (fmt.format == 1 && fmt.bits == 24) {
    size_t n = payload_size / 3;
    for (size_t i = 0; i + ch <= n; i += ch) {
      double acc = 0;
      for (uint32_t c = 0; c < ch; ++c) {
        const uint8_t* b = payload + 3 * (i + c);
        int32_t v = b[0] | (b[1] << 8) | (b[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        acc += v / static_cast<double>(1 << 23);
      }
      mono.push_back(static_cast<float>(acc / ch));
    }
  } else if (fmt.format == 1 && fmt.bits == 32) {
    size_t n = payload_size / 4;
    const int32_t* s = reinterpret_cast<const int32_t*>(payload);
    for (size_t i = 0; i + ch <= n; i += ch) {
      double acc = 0;
      for (uint32_t c = 0; c < ch; ++c) acc += s[i + c] / 2147483648.0;
      mono.push_back(static_cast<float>(acc / ch));
    }
  } else {
    return 4;  // unsupported encoding
  }

  float* buf = static_cast<float*>(std::malloc(mono.size() * sizeof(float)));
  if (!buf) return 5;
  std::memcpy(buf, mono.data(), mono.size() * sizeof(float));
  *out = buf;
  *out_len = static_cast<int64_t>(mono.size());
  *out_sample_rate = static_cast<int32_t>(fmt.sample_rate);
  return 0;
}

void pmfm_free(void* p) { std::free(p); }

// Write mono float32 audio as PCM 16/24/32 (bit_depth) or float32
// (bit_depth == 0). Returns 0 on success.
int pmfm_wav_write(const char* path, const float* audio, int64_t len,
                   int32_t sample_rate, int32_t bit_depth) {
  uint16_t fmt_code, bits;
  std::vector<uint8_t> payload;
  auto clampf = [](double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  };
  if (bit_depth == 0) {
    fmt_code = 3;
    bits = 32;
    payload.resize(len * 4);
    std::memcpy(payload.data(), audio, len * 4);
  } else if (bit_depth == 16) {
    fmt_code = 1;
    bits = 16;
    payload.resize(len * 2);
    int16_t* p = reinterpret_cast<int16_t*>(payload.data());
    for (int64_t i = 0; i < len; ++i)
      p[i] = static_cast<int16_t>(
          clampf(std::lround(audio[i] * 32767.0), -32768.0, 32767.0));
  } else if (bit_depth == 24) {
    fmt_code = 1;
    bits = 24;
    payload.resize(len * 3);
    const double scale = (1 << 23) - 1;
    for (int64_t i = 0; i < len; ++i) {
      int32_t v = static_cast<int32_t>(
          clampf(std::lround(audio[i] * scale), -(1 << 23), (1 << 23) - 1));
      payload[3 * i + 0] = v & 0xFF;
      payload[3 * i + 1] = (v >> 8) & 0xFF;
      payload[3 * i + 2] = (v >> 16) & 0xFF;
    }
  } else if (bit_depth == 32) {
    fmt_code = 1;
    bits = 32;
    payload.resize(len * 4);
    int32_t* p = reinterpret_cast<int32_t*>(payload.data());
    for (int64_t i = 0; i < len; ++i)
      p[i] = static_cast<int32_t>(
          clampf(audio[i] * 2147483647.0, -2147483648.0, 2147483647.0));
  } else {
    return 4;
  }

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;
  uint16_t block_align = bits / 8;
  uint32_t byte_rate = sample_rate * block_align;
  uint32_t data_size = static_cast<uint32_t>(payload.size());
  uint32_t riff_size = 36 + data_size;
  uint32_t fmt_size = 16;
  std::fwrite("RIFF", 1, 4, f);
  std::fwrite(&riff_size, 4, 1, f);
  std::fwrite("WAVE", 1, 4, f);
  std::fwrite("fmt ", 1, 4, f);
  std::fwrite(&fmt_size, 4, 1, f);
  std::fwrite(&fmt_code, 2, 1, f);
  uint16_t channels = 1;
  std::fwrite(&channels, 2, 1, f);
  std::fwrite(&sample_rate, 4, 1, f);
  std::fwrite(&byte_rate, 4, 1, f);
  std::fwrite(&block_align, 2, 1, f);
  std::fwrite(&bits, 2, 1, f);
  std::fwrite("data", 1, 4, f);
  std::fwrite(&data_size, 4, 1, f);
  std::fwrite(payload.data(), 1, payload.size(), f);
  std::fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// CSV logger (CSV_Logger.hpp:13-38 analog)
// ---------------------------------------------------------------------------
void* pmfm_csv_open(const char* path, const char* header_line) {
  FILE* f = std::fopen(path, "w");
  if (!f) return nullptr;
  std::fputs(header_line, f);
  std::fputc('\n', f);
  std::fflush(f);
  return f;
}

int pmfm_csv_add_record(void* handle, const char* line) {
  FILE* f = static_cast<FILE*>(handle);
  if (!f) return 1;
  std::fputs(line, f);
  std::fputc('\n', f);
  std::fflush(f);
  return 0;
}

void pmfm_csv_close(void* handle) {
  if (handle) std::fclose(static_cast<FILE*>(handle));
}

}  // extern "C"
