// Fast TIFF strip decoders (LZW + PackBits) — host-side ingest acceleration.
//
// Native counterpart of the pure-Python decoders in
// cell_image_analysis_tpu/io/tiff.py (the framework's tifffile replacement;
// reference call sites CAE_improved_modeltrain.py:42, improved_detection.py:51
// use tifffile's C extensions for the same job).  Loaded via ctypes; the
// Python implementations remain the reference/fallback.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// TIFF-variant LZW (MSB-first codes, early change).  Returns bytes written,
// or -1 on malformed input.
long lzw_decode(const uint8_t* src, long src_len, uint8_t* dst, long dst_cap) {
  constexpr int kClear = 256, kEoi = 257;
  // table entries: (prev_code, suffix_byte, length); first 256 are literals
  std::vector<int32_t> prev(4096), length(4096);
  std::vector<uint8_t> suffix(4096);
  int table_size = 258;
  auto reset = [&]() { table_size = 258; };
  for (int i = 0; i < 256; ++i) {
    prev[i] = -1;
    suffix[i] = static_cast<uint8_t>(i);
    length[i] = 1;
  }
  reset();

  auto emit = [&](int code, long pos) -> long {  // write entry backwards
    const long len = length[code];
    if (pos + len > dst_cap) return -1;
    long p = pos + len - 1;
    int c = code;
    while (c >= 0) {
      dst[p--] = suffix[c];
      c = prev[c];
    }
    return pos + len;
  };

  uint64_t bitbuf = 0;
  int bitcnt = 0, width = 9;
  int prev_code = -1;
  long out = 0, in = 0;
  while (out < dst_cap) {
    while (bitcnt < width) {
      if (in >= src_len) return out;
      bitbuf = (bitbuf << 8) | src[in++];
      bitcnt += 8;
    }
    const int code = static_cast<int>((bitbuf >> (bitcnt - width)) & ((1u << width) - 1));
    bitcnt -= width;
    if (code == kClear) {
      reset();
      width = 9;
      prev_code = -1;
      continue;
    }
    if (code == kEoi) break;
    if (prev_code < 0) {
      if (code >= 256) return -1;
      out = emit(code, out);
      if (out < 0) return -1;
      prev_code = code;
    } else {
      int entry_code;
      if (code < table_size) {
        entry_code = code;
      } else if (code == table_size) {
        entry_code = -2;  // the "KwK" case
      } else {
        return -1;
      }
      // add new table entry: prev_code + first_byte(entry)
      int first_src = entry_code == -2 ? prev_code : code;
      int c = first_src;
      while (prev[c] >= 0) c = prev[c];
      const uint8_t first_byte = suffix[c];
      if (table_size < 4096) {
        prev[table_size] = prev_code;
        suffix[table_size] = first_byte;
        length[table_size] = length[prev_code] + 1;
        ++table_size;
      }
      const int to_emit = entry_code == -2 ? table_size - 1 : code;
      out = emit(to_emit, out);
      if (out < 0) return -1;
      prev_code = to_emit;
    }
    if (table_size >= (1 << width) - 1 && width < 12) ++width;
  }
  return out;
}

// PackBits.  Returns bytes written.
long packbits_decode(const uint8_t* src, long src_len, uint8_t* dst, long dst_cap) {
  long in = 0, out = 0;
  while (in < src_len && out < dst_cap) {
    const uint8_t n = src[in++];
    if (n < 128) {
      const long cnt = n + 1;
      if (in + cnt > src_len || out + cnt > dst_cap) {
        const long c = std::min<long>(std::min<long>(cnt, src_len - in), dst_cap - out);
        std::memcpy(dst + out, src + in, c);
        return out + c;
      }
      std::memcpy(dst + out, src + in, cnt);
      in += cnt;
      out += cnt;
    } else if (n > 128) {
      const long cnt = 257 - n;
      if (in >= src_len) return out;
      const uint8_t v = src[in++];
      const long c = std::min<long>(cnt, dst_cap - out);
      std::memset(dst + out, v, c);
      out += c;
    }  // n == 128: no-op
  }
  return out;
}

}  // extern "C"
