// Native WAV decode + batched prefetch reader for the data pipeline.
//
// The reference's data layer leans on libsndfile via the soundfile package
// (src/datas/avspeech_dataset.py:137,192); this is the framework's native
// equivalent: a dependency-free RIFF/WAVE decoder (PCM16/PCM24/PCM32/
// float32) exposed through a C ABI for ctypes, releasing the GIL so a
// Python thread pool gets true parallel disk decode when feeding the TPU.
//
// Build: make -C native    (produces libwavio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Returns number of samples written to out (mono-mixed), or a negative
// error code: -1 open failed, -2 not RIFF/WAVE, -3 unsupported format,
// -4 malformed file.
// If out == nullptr, returns the total sample count (frames) only.
long wav_read_f32(const char* path, float* out, long max_len,
                  int* sample_rate_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char riff[4], wave[4];
  uint32_t riff_size;
  if (std::fread(riff, 1, 4, f) != 4 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(wave, 1, 4, f) != 4 ||
      std::memcmp(riff, "RIFF", 4) != 0 || std::memcmp(wave, "WAVE", 4) != 0) {
    std::fclose(f);
    return -2;
  }

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  long n_out = -4;

  char chunk_id[4];
  uint32_t chunk_size;
  while (std::fread(chunk_id, 1, 4, f) == 4 &&
         std::fread(&chunk_size, 4, 1, f) == 1) {
    if (std::memcmp(chunk_id, "fmt ", 4) == 0) {
      uint8_t buf[16];
      if (chunk_size < 16 || std::fread(buf, 1, 16, f) != 16) break;
      std::memcpy(&fmt, buf + 0, 2);
      std::memcpy(&channels, buf + 2, 2);
      std::memcpy(&rate, buf + 4, 4);
      std::memcpy(&bits, buf + 14, 2);
      if (chunk_size > 16) std::fseek(f, chunk_size - 16, SEEK_CUR);
      if (fmt == 0xFFFE) fmt = 1;  // extensible: assume PCM subformat
    } else if (std::memcmp(chunk_id, "data", 4) == 0) {
      if (channels == 0 || bits == 0) break;
      const int bytes_per = bits / 8;
      const long frames = chunk_size / (bytes_per * channels);
      if (sample_rate_out) *sample_rate_out = (int)rate;
      if (!out) {
        n_out = frames;
        break;
      }
      const long n = frames < max_len ? frames : max_len;
      const long nvals = n * channels;
      // stream-decode in blocks; mono-mix channels
      const long BLOCK = 4096;
      long done_vals = 0;
      long frame_i = 0;
      uint8_t raw[4096 * 4];
      float acc = 0.0f;
      int ch_i = 0;
      bool ok = true;
      while (done_vals < nvals && ok) {
        long want = nvals - done_vals;
        if (want > BLOCK) want = BLOCK;
        if (std::fread(raw, bytes_per, want, f) != (size_t)want) {
          ok = false;
          break;
        }
        for (long i = 0; i < want; i++) {
          float v;
          const uint8_t* p = raw + i * bytes_per;
          if (fmt == 3 && bits == 32) {  // IEEE float
            std::memcpy(&v, p, 4);
          } else if (fmt == 1 && bits == 16) {
            int16_t s;
            std::memcpy(&s, p, 2);
            v = (float)s / 32768.0f;
          } else if (fmt == 1 && bits == 32) {
            int32_t s;
            std::memcpy(&s, p, 4);
            v = (float)s / 2147483648.0f;
          } else if (fmt == 1 && bits == 24) {
            int32_t s = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                  (uint32_t)p[2] << 24) >> 8;
            v = (float)s / 8388608.0f;
          } else {
            std::fclose(f);
            return -3;
          }
          acc += v;
          if (++ch_i == channels) {
            out[frame_i++] = acc / (float)channels;
            acc = 0.0f;
            ch_i = 0;
          }
        }
        done_vals += want;
      }
      n_out = ok ? frame_i : -4;
      break;
    } else {
      std::fseek(f, (long)chunk_size + (chunk_size & 1), SEEK_CUR);
    }
  }
  std::fclose(f);
  return n_out;
}

// Batched read: decodes `n` files into a contiguous (n, seg_len) float32
// buffer (zero-padded / truncated to seg_len each). Returns count decoded
// successfully; failures leave zeros.
long wav_read_batch_f32(const char** paths, long n, float* out,
                        long seg_len) {
  long ok = 0;
  for (long i = 0; i < n; i++) {
    std::memset(out + i * seg_len, 0, seg_len * sizeof(float));
    int sr;
    long got = wav_read_f32(paths[i], out + i * seg_len, seg_len, &sr);
    if (got > 0) ok++;
  }
  return ok;
}

}  // extern "C"
