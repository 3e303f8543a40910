// Native WAV decoder for birdnet_tpu.
//
// The reference uses the `hound` Rust crate for WAV reading
// (reference: src/bin/birdnet-analyze.rs:653-704). This is the C++ native
// equivalent: RIFF parse + validation + 16-bit-PCM → float32 conversion,
// exposed through a C ABI consumed via ctypes (birdnet_tpu/utils/audio_io.py,
// which also carries a pure-numpy fallback when this library isn't built).
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <memory>
#include <new>

extern "C" {

// Error codes (mirrored in audio_io.py)
enum WavError {
  WAV_OK = 0,
  WAV_ERR_OPEN = 1,        // cannot open file
  WAV_ERR_NOT_RIFF = 2,    // not a RIFF/WAVE file
  WAV_ERR_NO_FMT = 3,      // missing fmt chunk
  WAV_ERR_NO_DATA = 4,     // missing data chunk
  WAV_ERR_TRUNCATED = 5,   // data shorter than declared
  WAV_ERR_NOT_PCM = 6,     // not integer PCM (e.g. float format)
  WAV_ERR_NOT_MONO = 7,    // more than one channel
  WAV_ERR_NOT_16BIT = 8,   // bits per sample != 16
};

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int32_t bits_per_sample;
  int32_t format;       // 1 = PCM int, 3 = IEEE float
  int64_t n_samples;    // per channel
  int64_t data_offset;  // byte offset of sample data
};

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Parse the header; fills info. Does not validate mono/16-bit (the caller
// decides which formats to accept so error messages stay precise).
int wav_info(const char* path, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return WAV_ERR_OPEN;
  std::unique_ptr<FILE, int (*)(FILE*)> guard(f, fclose);

  uint8_t hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) != 0 ||
      memcmp(hdr + 8, "WAVE", 4) != 0) {
    return WAV_ERR_NOT_RIFF;
  }

  bool have_fmt = false;
  info->format = 0;
  for (;;) {
    uint8_t chdr[8];
    if (fread(chdr, 1, 8, f) != 8) break;
    uint32_t size = rd_u32(chdr + 4);
    if (memcmp(chdr, "fmt ", 4) == 0) {
      uint8_t fmt[40];
      if (size < 16 || fread(fmt, 1, 16, f) != 16) return WAV_ERR_NO_FMT;
      info->format = rd_u16(fmt + 0);
      info->channels = rd_u16(fmt + 2);
      info->sample_rate = (int32_t)rd_u32(fmt + 4);
      info->bits_per_sample = rd_u16(fmt + 14);
      uint32_t extra = size - 16;
      // WAVE_FORMAT_EXTENSIBLE: the real format is the first 2 bytes of the
      // SubFormat GUID (offset 24 within the fmt body).
      if (info->format == 0xFFFE && extra >= 24) {
        if (fread(fmt + 16, 1, 24, f) != 24) return WAV_ERR_NO_FMT;
        info->format = rd_u16(fmt + 24 + 0 /* GUID data1 low */);
        extra -= 24;
      }
      if (extra > 0 && fseek(f, extra + (size & 1), SEEK_CUR) != 0)
        return WAV_ERR_NO_FMT;
      if (extra == 0 && (size & 1) && fseek(f, 1, SEEK_CUR) != 0)
        return WAV_ERR_NO_FMT;
      have_fmt = true;
    } else if (memcmp(chdr, "data", 4) == 0) {
      if (!have_fmt) return WAV_ERR_NO_FMT;
      long off = ftell(f);
      if (off < 0) return WAV_ERR_NO_DATA;
      int bytes_per_frame = info->channels * (info->bits_per_sample / 8);
      if (bytes_per_frame <= 0) return WAV_ERR_NO_FMT;
      // Validate the declared chunk size against the bytes actually
      // present BEFORE reporting n_samples: the caller allocates
      // n_samples up front, so a corrupt header declaring ~4 GB must not
      // drive a giant allocation — and a short file is rejected here with
      // the same error the read path would eventually produce.
      if (fseek(f, 0, SEEK_END) != 0) return WAV_ERR_NO_DATA;
      long fend = ftell(f);
      if (fend < 0) return WAV_ERR_NO_DATA;
      if ((uint64_t)size > (uint64_t)(fend - off)) return WAV_ERR_TRUNCATED;
      info->data_offset = off;
      info->n_samples = (int64_t)size / bytes_per_frame;
      return WAV_OK;
    } else {
      if (fseek(f, size + (size & 1), SEEK_CUR) != 0) break;
    }
  }
  return have_fmt ? WAV_ERR_NO_DATA : WAV_ERR_NO_FMT;
}

// Read mono 16-bit PCM samples as float32 in [-1, 1) (i16 / 32768).
// `out` must hold info.n_samples floats.
int wav_read_f32(const char* path, float* out, int64_t n) {
  WavInfo info;
  int rc = wav_info(path, &info);
  if (rc != WAV_OK) return rc;
  if (info.format != 1) return WAV_ERR_NOT_PCM;
  if (info.channels != 1) return WAV_ERR_NOT_MONO;
  if (info.bits_per_sample != 16) return WAV_ERR_NOT_16BIT;
  if (n > info.n_samples) n = info.n_samples;

  FILE* f = fopen(path, "rb");
  if (!f) return WAV_ERR_OPEN;
  std::unique_ptr<FILE, int (*)(FILE*)> guard(f, fclose);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) return WAV_ERR_TRUNCATED;

  constexpr int64_t CHUNK = 1 << 16;
  int16_t buf[CHUNK];
  const float scale = 1.0f / 32768.0f;
  int64_t done = 0;
  while (done < n) {
    int64_t want = n - done < CHUNK ? n - done : CHUNK;
    size_t got = fread(buf, sizeof(int16_t), (size_t)want, f);
    if (got == 0) return WAV_ERR_TRUNCATED;
    for (size_t i = 0; i < got; ++i) out[done + (int64_t)i] = buf[i] * scale;
    done += (int64_t)got;
  }
  return WAV_OK;
}

// Read mono 16-bit PCM samples raw (no float conversion) — callers can ship
// int16 straight to the accelerator and scale on-device (half the transfer
// bytes of float32).
int wav_read_i16(const char* path, int16_t* out, int64_t n) {
  WavInfo info;
  int rc = wav_info(path, &info);
  if (rc != WAV_OK) return rc;
  if (info.format != 1) return WAV_ERR_NOT_PCM;
  if (info.channels != 1) return WAV_ERR_NOT_MONO;
  if (info.bits_per_sample != 16) return WAV_ERR_NOT_16BIT;
  if (n > info.n_samples) n = info.n_samples;

  FILE* f = fopen(path, "rb");
  if (!f) return WAV_ERR_OPEN;
  std::unique_ptr<FILE, int (*)(FILE*)> guard(f, fclose);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) return WAV_ERR_TRUNCATED;
  size_t got = fread(out, sizeof(int16_t), (size_t)n, f);
  return got == (size_t)n ? WAV_OK : WAV_ERR_TRUNCATED;
}

// Read 16-bit PCM frames of any channel count, downmixed to mono float32
// (mean of channels). `out` must hold info.n_samples floats.
int wav_read_f32_downmix(const char* path, float* out, int64_t n) {
  WavInfo info;
  int rc = wav_info(path, &info);
  if (rc != WAV_OK) return rc;
  if (info.format != 1) return WAV_ERR_NOT_PCM;
  if (info.bits_per_sample != 16) return WAV_ERR_NOT_16BIT;
  if (n > info.n_samples) n = info.n_samples;
  int ch = info.channels;
  if (ch <= 0 || ch > 64) return WAV_ERR_NO_FMT;  // sane channel bound

  FILE* f = fopen(path, "rb");
  if (!f) return WAV_ERR_OPEN;
  std::unique_ptr<FILE, int (*)(FILE*)> guard(f, fclose);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0) return WAV_ERR_TRUNCATED;

  constexpr int64_t FRAMES = 1 << 14;
  std::unique_ptr<int16_t[]> buf(new (std::nothrow) int16_t[FRAMES * ch]);
  if (!buf) return WAV_ERR_NO_FMT;
  const float scale = 1.0f / (32768.0f * ch);
  int64_t done = 0;
  while (done < n) {
    int64_t want = n - done < FRAMES ? n - done : FRAMES;
    size_t got = fread(buf.get(), sizeof(int16_t) * ch, (size_t)want, f);
    if (got == 0) return WAV_ERR_TRUNCATED;
    for (size_t i = 0; i < got; ++i) {
      int32_t acc = 0;
      for (int c = 0; c < ch; ++c) acc += buf[i * ch + c];
      out[done + (int64_t)i] = acc * scale;
    }
    done += (int64_t)got;
  }
  return WAV_OK;
}

}  // extern "C"
