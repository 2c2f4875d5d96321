// mmnn_native: C++ data-path runtime for mmnn_sts_tpu.
//
// Plays the role the reference delegated to third-party native wheels
// (SimpleITK/GDCM C++ decode + resampling, nibabel's NIfTI parsing —
// SURVEY.md §2.9): a self-contained NIfTI-1 decoder (gzip inflate via zlib,
// endianness + dtype conversion, scl scaling) plus the fused host-side
// preprocessing kernel (mask multiply -> zero-plane crop/fill -> trilinear
// resize to the model grid) and a std::thread cohort loader that decodes and
// preprocesses many patients in parallel (Python-side loops hold the GIL;
// this path does not).
//
// Exposed as a plain C ABI consumed via ctypes (mmnn_sts_tpu/data/native.py).
// Build: make -C native   (produces libmmnn_native.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

constexpr int kHeaderSize = 348;

struct NiftiInfo {
  int64_t shape[7];
  int ndim = 0;
  int datatype = 0;
  float scl_slope = 0.f;
  float scl_inter = 0.f;
  int64_t vox_offset = 0;
  bool swap = false;  // byteswap needed
};

// ---------------------------------------------------------------------------
// IO: read whole file, inflating if gzip.
// ---------------------------------------------------------------------------

bool ReadFileRaw(const char* path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(size));
  size_t got = size ? std::fread(out->data(), 1, size, f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(size);
}

bool GunzipAll(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit2(&zs, 16 + MAX_WBITS) != Z_OK) return false;
  zs.next_in = const_cast<Bytef*>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  out->clear();
  out->reserve(in.size() * 4);
  std::vector<uint8_t> buf(1 << 20);
  int ret = Z_OK;
  do {
    zs.next_out = buf.data();
    zs.avail_out = static_cast<uInt>(buf.size());
    ret = inflate(&zs, Z_NO_FLUSH);
    if (ret != Z_OK && ret != Z_STREAM_END) {
      inflateEnd(&zs);
      return false;
    }
    out->insert(out->end(), buf.data(), buf.data() + (buf.size() - zs.avail_out));
  } while (ret != Z_STREAM_END && zs.avail_in > 0);
  inflateEnd(&zs);
  return ret == Z_STREAM_END;
}

bool ReadMaybeGz(const char* path, std::vector<uint8_t>* out) {
  std::vector<uint8_t> raw;
  if (!ReadFileRaw(path, &raw)) return false;
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    return GunzipAll(raw, out);
  }
  *out = std::move(raw);
  return true;
}

// ---------------------------------------------------------------------------
// NIfTI-1 header parse + voxel decode
// ---------------------------------------------------------------------------

template <typename T>
T SwapVal(T v) {
  union {
    T value;
    uint8_t bytes[sizeof(T)];
  } src, dst;
  src.value = v;
  for (size_t i = 0; i < sizeof(T); ++i) dst.bytes[i] = src.bytes[sizeof(T) - 1 - i];
  return dst.value;
}

template <typename T>
T ReadField(const uint8_t* base, size_t offset, bool swap) {
  T v;
  std::memcpy(&v, base + offset, sizeof(T));
  return swap ? SwapVal(v) : v;
}

bool ParseHeader(const std::vector<uint8_t>& blob, NiftiInfo* info) {
  if (blob.size() < kHeaderSize) return false;
  int32_t sizeof_hdr;
  std::memcpy(&sizeof_hdr, blob.data(), 4);
  bool swap = false;
  if (sizeof_hdr != kHeaderSize) {
    sizeof_hdr = SwapVal(sizeof_hdr);
    if (sizeof_hdr != kHeaderSize) return false;
    swap = true;
  }
  const char* magic = reinterpret_cast<const char*>(blob.data() + 344);
  if (std::strncmp(magic, "n+1", 3) != 0 && std::strncmp(magic, "ni1", 3) != 0)
    return false;

  info->swap = swap;
  int16_t ndim = ReadField<int16_t>(blob.data(), 40, swap);
  if (ndim < 1 || ndim > 7) return false;
  info->ndim = ndim;
  for (int i = 0; i < ndim; ++i) {
    info->shape[i] = ReadField<int16_t>(blob.data(), 40 + 2 * (i + 1), swap);
    if (info->shape[i] <= 0) return false;  // corrupt header
  }
  info->datatype = ReadField<int16_t>(blob.data(), 70, swap);
  float vox_offset = ReadField<float>(blob.data(), 108, swap);
  // Guard the float->int64 conversion: a corrupt/hostile header can carry
  // NaN or a value beyond int64 range, where the cast is UB (x86 cvttsd2si
  // yields INT64_MIN, which made `avail` in DecodeVoxels hugely positive
  // and defeated its bounds check -> wild out-of-bounds read). Any offset
  // past the actual blob is equally invalid.
  if (!(vox_offset >= 0.0f) ||
      vox_offset > static_cast<float>(blob.size()))
    return false;
  info->vox_offset = vox_offset > 0 ? static_cast<int64_t>(vox_offset)
                                    : kHeaderSize + 4;
  if (info->vox_offset > static_cast<int64_t>(blob.size())) return false;
  info->scl_slope = ReadField<float>(blob.data(), 112, swap);
  info->scl_inter = ReadField<float>(blob.data(), 116, swap);
  return true;
}

template <typename T>
void ConvertVoxels(const uint8_t* src, float* dst, int64_t n, bool swap,
                   float slope, float inter) {
  const T* typed = reinterpret_cast<const T*>(src);
  bool scale = slope != 0.f && slope != 1.f;
  bool shift = inter != 0.f;
  for (int64_t i = 0; i < n; ++i) {
    T v = typed[i];
    if (swap) v = SwapVal(v);
    float f = static_cast<float>(v);
    if (scale) f = f * slope + inter;
    else if (shift && slope == 1.f) f = f + inter;
    dst[i] = f;
  }
}

bool DecodeVoxels(const std::vector<uint8_t>& blob, const NiftiInfo& info,
                  float* out, int64_t n) {
  const uint8_t* src = blob.data() + info.vox_offset;
  int64_t avail = static_cast<int64_t>(blob.size()) - info.vox_offset;
  auto need = [&](int64_t elt) { return n * elt <= avail; };
  switch (info.datatype) {
    case 2:  // uint8
      if (!need(1)) return false;
      ConvertVoxels<uint8_t>(src, out, n, false, info.scl_slope, info.scl_inter);
      return true;
    case 256:  // int8
      if (!need(1)) return false;
      ConvertVoxels<int8_t>(src, out, n, false, info.scl_slope, info.scl_inter);
      return true;
    case 4:  // int16
      if (!need(2)) return false;
      ConvertVoxels<int16_t>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    case 512:  // uint16
      if (!need(2)) return false;
      ConvertVoxels<uint16_t>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    case 8:  // int32
      if (!need(4)) return false;
      ConvertVoxels<int32_t>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    case 768:  // uint32
      if (!need(4)) return false;
      ConvertVoxels<uint32_t>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    case 16:  // float32
      if (!need(4)) return false;
      ConvertVoxels<float>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    case 64:  // float64
      if (!need(8)) return false;
      ConvertVoxels<double>(src, out, n, info.swap, info.scl_slope, info.scl_inter);
      return true;
    default:
      return false;
  }
}

// ---------------------------------------------------------------------------
// Preprocessing: mask multiply + zero-plane crop/fill + trilinear resize.
// Volumes are Fortran-ordered (axis 0 fastest), matching NIfTI on-disk
// layout; indices (i, j, k) address offset i + ni * (j + nj * k).
// ---------------------------------------------------------------------------

struct Volume {
  std::vector<float> data;
  int64_t n0 = 0, n1 = 0, n2 = 0;
  float& at(int64_t i, int64_t j, int64_t k) {
    return data[i + n0 * (j + n1 * k)];
  }
  float at(int64_t i, int64_t j, int64_t k) const {
    return data[i + n0 * (j + n1 * k)];
  }
};

// zero_mode: 0 = crop all-zero planes, 1 = fill with max/2, 2 = none
void MaskAndHandleZeros(Volume* img, const Volume& mask, int zero_mode) {
  int64_t n = static_cast<int64_t>(img->data.size());
  float maxv = 0.f;
  for (int64_t i = 0; i < n; ++i) {
    img->data[i] *= mask.data[i];
    maxv = std::max(maxv, img->data[i]);
  }
  if (zero_mode == 2) return;

  std::vector<uint8_t> z0(img->n0, 1), z1(img->n1, 1), z2(img->n2, 1);
  for (int64_t k = 0; k < img->n2; ++k)
    for (int64_t j = 0; j < img->n1; ++j)
      for (int64_t i = 0; i < img->n0; ++i)
        if (img->at(i, j, k) != 0.f) {
          z0[i] = 0;
          z1[j] = 0;
          z2[k] = 0;
        }

  if (zero_mode == 1) {
    float fill = maxv / 2.f;
    for (int64_t k = 0; k < img->n2; ++k)
      for (int64_t j = 0; j < img->n1; ++j)
        for (int64_t i = 0; i < img->n0; ++i)
          if (z0[i] || z1[j] || z2[k]) img->at(i, j, k) = fill;
    return;
  }

  // crop
  std::vector<int64_t> keep0, keep1, keep2;
  for (int64_t i = 0; i < img->n0; ++i)
    if (!z0[i]) keep0.push_back(i);
  for (int64_t j = 0; j < img->n1; ++j)
    if (!z1[j]) keep1.push_back(j);
  for (int64_t k = 0; k < img->n2; ++k)
    if (!z2[k]) keep2.push_back(k);
  if (keep0.empty() || keep1.empty() || keep2.empty()) {
    img->data.assign(1, 0.f);
    img->n0 = img->n1 = img->n2 = 1;
    return;
  }
  Volume out;
  out.n0 = keep0.size();
  out.n1 = keep1.size();
  out.n2 = keep2.size();
  out.data.resize(out.n0 * out.n1 * out.n2);
  for (int64_t k = 0; k < out.n2; ++k)
    for (int64_t j = 0; j < out.n1; ++j)
      for (int64_t i = 0; i < out.n0; ++i)
        out.at(i, j, k) = img->at(keep0[i], keep1[j], keep2[k]);
  *img = std::move(out);
}

// Trilinear resize with half-pixel centers (align_corners=false), matching
// data/images.py resize_volume / jax.image.resize(method="linear").
void ResizeTrilinear(const Volume& in, Volume* out, int64_t m0, int64_t m1,
                     int64_t m2) {
  if (in.n0 == m0 && in.n1 == m1 && in.n2 == m2) {
    // identity: the sampling grid hits every source voxel exactly
    // (half-pixel centers with scale 1 give frac 0, and the clamped last
    // tap reduces to the last voxel), so copying is bit-identical to the
    // general path — and matches data/images.py resize_volume, which
    // skips identity axes. Cohort builds at source==target resolution
    // were paying the full 8-tap loop for nothing.
    *out = in;
    return;
  }
  out->n0 = m0;
  out->n1 = m1;
  out->n2 = m2;
  out->data.resize(m0 * m1 * m2);

  auto coords = [](int64_t old_n, int64_t new_n, std::vector<int64_t>* lo,
                   std::vector<float>* w) {
    lo->resize(new_n);
    w->resize(new_n);
    double scale = static_cast<double>(old_n) / new_n;
    for (int64_t t = 0; t < new_n; ++t) {
      double c = (t + 0.5) * scale - 0.5;
      double fl = std::floor(c);
      int64_t l = static_cast<int64_t>(fl);
      float frac = static_cast<float>(c - fl);
      if (l < 0) {
        l = 0;
        frac = 0.f;
      }
      if (l >= old_n - 1) {
        l = std::max<int64_t>(old_n - 2, 0);
        frac = old_n > 1 ? 1.f : 0.f;
      }
      (*lo)[t] = l;
      (*w)[t] = frac;
    }
  };

  std::vector<int64_t> l0, l1, l2;
  std::vector<float> w0, w1, w2;
  coords(in.n0, m0, &l0, &w0);
  coords(in.n1, m1, &l1, &w1);
  coords(in.n2, m2, &l2, &w2);
  int64_t h0 = in.n0 > 1 ? 1 : 0, h1 = in.n1 > 1 ? 1 : 0, h2 = in.n2 > 1 ? 1 : 0;

  for (int64_t k = 0; k < m2; ++k) {
    int64_t kk = l2[k];
    float fk = w2[k];
    for (int64_t j = 0; j < m1; ++j) {
      int64_t jj = l1[j];
      float fj = w1[j];
      for (int64_t i = 0; i < m0; ++i) {
        int64_t ii = l0[i];
        float fi = w0[i];
        float c000 = in.at(ii, jj, kk);
        float c100 = in.at(ii + h0, jj, kk);
        float c010 = in.at(ii, jj + h1, kk);
        float c110 = in.at(ii + h0, jj + h1, kk);
        float c001 = in.at(ii, jj, kk + h2);
        float c101 = in.at(ii + h0, jj, kk + h2);
        float c011 = in.at(ii, jj + h1, kk + h2);
        float c111 = in.at(ii + h0, jj + h1, kk + h2);
        float c00 = c000 + fi * (c100 - c000);
        float c10 = c010 + fi * (c110 - c010);
        float c01 = c001 + fi * (c101 - c001);
        float c11 = c011 + fi * (c111 - c011);
        float c0 = c00 + fj * (c10 - c00);
        float c1 = c01 + fj * (c11 - c01);
        out->at(i, j, k) = c0 + fk * (c1 - c0);
      }
    }
  }
}

bool LoadVolume(const char* path, Volume* vol) {
  std::vector<uint8_t> blob;
  if (!ReadMaybeGz(path, &blob)) return false;
  NiftiInfo info;
  if (!ParseHeader(blob, &info)) return false;
  if (info.ndim < 3) return false;
  int64_t n = 1;
  for (int i = 0; i < info.ndim; ++i) n *= info.shape[i];
  vol->n0 = info.shape[0];
  vol->n1 = info.shape[1];
  vol->n2 = info.shape[2];
  // Collapse trailing singleton dims (4D-with-1 volumes appear in DICOM
  // conversions; reference squeezes them, s3utils.py:244-265).
  int64_t n3 = n / (vol->n0 * vol->n1 * vol->n2);
  if (n3 != 1) return false;
  vol->data.resize(n);
  return DecodeVoxels(blob, info, vol->data.data(), n);
}

// ---------------------------------------------------------------------------
// JPEG Lossless (ITU-T T.81 process 14, SOF3) — fast path for compressed
// DICOM transfer syntaxes 1.2.840.10008.1.2.4.57/.70. Mirror of the python
// oracle in mmnn_sts_tpu/data/jpeg_lossless.py (tested against it); written
// from the public T.81 spec, no GDCM/libjpeg code.
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* buf;
  int64_t len;
  int64_t pos;
  uint64_t cur = 0;
  int nbits = 0;

  void Fill() {
    while (nbits <= 48) {
      uint8_t b = 0;
      if (pos < len) {
        b = buf[pos];
        if (b == 0xFF) {
          uint8_t nxt = (pos + 1 < len) ? buf[pos + 1] : 0;
          if (nxt == 0x00) {
            pos += 2;  // stuffed literal 0xFF
          } else {
            b = 0;  // marker: stop consuming, pad with zeros
          }
        } else {
          pos += 1;
        }
      }
      cur = (cur << 8) | b;
      nbits += 8;
    }
  }

  inline uint32_t Read(int n) {
    if (n == 0) return 0;
    if (nbits < n) Fill();
    nbits -= n;
    uint32_t v = static_cast<uint32_t>((cur >> nbits) & ((1ull << n) - 1));
    cur &= (1ull << nbits) - 1;
    return v;
  }

  bool Restart() {  // skip to just past the next RST marker
    cur = 0;
    nbits = 0;
    while (pos + 1 < len) {
      if (buf[pos] == 0xFF && buf[pos + 1] >= 0xD0 && buf[pos + 1] <= 0xD7) {
        pos += 2;
        return true;
      }
      pos += 1;
    }
    return false;
  }
};

struct HuffTable {
  int maxcode[17];
  int mincode[17];
  int valptr[17];
  uint8_t symbols[256];
  int nsym = 0;

  void Build(const uint8_t* counts, const uint8_t* syms, int n) {
    nsym = n;
    std::memcpy(symbols, syms, n);
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      int c = counts[l - 1];
      if (c) {
        valptr[l] = k;
        mincode[l] = code;
        code += c;
        k += c;
        maxcode[l] = code - 1;
      } else {
        maxcode[l] = -1;
        mincode[l] = 0;
        valptr[l] = 0;
      }
      code <<= 1;
    }
  }

  inline int Decode(BitReader* br) const {
    int code = 0;
    for (int l = 1; l <= 16; ++l) {
      code = (code << 1) | static_cast<int>(br->Read(1));
      if (maxcode[l] >= code && code >= mincode[l])
        return symbols[valptr[l] + code - mincode[l]];
    }
    return -1;
  }
};

inline int32_t JpegExtend(uint32_t v, int t) {
  if (t == 0) return 0;
  if (t == 16) return 32768;
  if (v < (1u << (t - 1))) return static_cast<int32_t>(v) - (1 << t) + 1;
  return static_cast<int32_t>(v);
}

// Decodes one single-component SOF3 stream. Returns 0 on success; fills
// rows/cols; writes up to out_capacity uint16 samples into out.
int DecodeJpegLossless(const uint8_t* buf, int64_t len, uint16_t* out,
                       int64_t out_capacity, int* rows_out, int* cols_out) {
  if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return 10;  // no SOI
  int64_t pos = 2;
  int precision = 0, rows = 0, cols = 0, ncomp = 0;
  int predictor = 1, point_transform = 0, restart_interval = 0;
  HuffTable tables[4];
  int comp_table = 0;

  while (pos + 4 <= len) {
    if (buf[pos] != 0xFF) return 11;
    uint8_t marker = buf[pos + 1];
    pos += 2;
    if (marker == 0xD9) break;                       // EOI
    if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) continue;
    int seg_len = (buf[pos] << 8) | buf[pos + 1];
    // Truncated stream: every segment read below stays inside the buffer
    // (siblings DecodeJpegLs/DecodeJ2k carry the same check; dropping it
    // here was a heap over-read on fuzzed/truncated DICOM fragments).
    if (seg_len < 2 || pos + seg_len > len) return 16;
    const uint8_t* seg = buf + pos + 2;
    int n = seg_len - 2;
    if (marker == 0xC3) {  // SOF3
      if (n < 6) return 16;
      precision = seg[0];
      rows = (seg[1] << 8) | seg[2];
      cols = (seg[3] << 8) | seg[4];
      ncomp = seg[5];
      if (ncomp != 1) return 12;  // python fallback handles multi-component
    } else if (marker == 0xC4) {  // DHT
      int off = 0;
      while (off < n) {
        if (off + 17 > n) return 16;
        int th = seg[off] & 0x0F;
        int nsym = 0;
        for (int i = 0; i < 16; ++i) nsym += seg[off + 1 + i];
        if (th > 3 || nsym > 256 || off + 17 + nsym > n) return 13;
        tables[th].Build(seg + off + 1, seg + off + 17, nsym);
        off += 17 + nsym;
      }
    } else if (marker == 0xDD) {  // DRI
      if (n < 2) return 16;
      restart_interval = (seg[0] << 8) | seg[1];
    } else if (marker == 0xDA) {  // SOS
      if (n < 1) return 16;
      int ns = seg[0];
      if (ns != 1) return 12;
      if (n < 4 + 2 * ns) return 16;
      comp_table = seg[2] >> 4;
      predictor = seg[1 + 2 * ns];
      point_transform = seg[3 + 2 * ns] & 0x0F;
      pos += seg_len;
      // --- entropy-coded scan ---
      if (static_cast<int64_t>(rows) * cols > out_capacity) return 14;
      if (rows <= 0 || cols <= 0) return 15;
      BitReader br{buf, len, pos};
      const HuffTable& ht = tables[comp_table];
      int defaultp = 1 << (precision - point_transform - 1);
      int mcu = 0;
      int seg_r = 0, seg_c = 0;
      for (int r = 0; r < rows; ++r) {
        uint16_t* row = out + static_cast<int64_t>(r) * cols;
        const uint16_t* prev = row - cols;
        for (int c = 0; c < cols; ++c) {
          if (restart_interval && mcu == restart_interval) {
            if (!br.Restart()) return 16;
            mcu = 0;
            seg_r = r;
            seg_c = c;
          }
          int t = ht.Decode(&br);
          if (t < 0) return 17;
          // category 16 appends NO magnitude bits (T.81 H.1.2.2)
          int32_t diff = JpegExtend((t > 0 && t < 16) ? br.Read(t) : 0, t);
          int32_t px;
          if (r == seg_r && c == seg_c) {
            px = defaultp;
          } else if (r == seg_r) {
            px = row[c - 1];
          } else if (c == 0) {
            px = prev[0];
          } else {
            int32_t ra = row[c - 1], rb = prev[c], rc = prev[c - 1];
            switch (predictor) {
              case 1: px = ra; break;
              case 2: px = rb; break;
              case 3: px = rc; break;
              case 4: px = ra + rb - rc; break;
              case 5: px = ra + ((rb - rc) >> 1); break;
              case 6: px = rb + ((ra - rc) >> 1); break;
              case 7: px = (ra + rb) >> 1; break;
              default: return 18;
            }
          }
          row[c] = static_cast<uint16_t>((px + diff) & 0xFFFF);
          ++mcu;
        }
      }
      if (point_transform) {
        int64_t total = static_cast<int64_t>(rows) * cols;
        for (int64_t i = 0; i < total; ++i)
          out[i] = static_cast<uint16_t>(out[i] << point_transform);
      }
      *rows_out = rows;
      *cols_out = cols;
      return 0;
    }
    pos += seg_len;
  }
  return 19;  // no SOS
}

// ---------------------------------------------------------------------------
// JPEG-LS (ITU-T T.87 / ISO 14495-1, LOCO-I) — fast path for compressed DICOM
// transfer syntaxes 1.2.840.10008.1.2.4.80/.81. Mirror of the python oracle
// in mmnn_sts_tpu/data/jpeg_ls.py (tested against it); written from the
// public T.87 spec, no CharLS/GDCM code. Any nonzero return sends the caller
// to the python path, which owns the precise error messages.
// ---------------------------------------------------------------------------

// T.87 A.2.1 run-length code order
constexpr int kJlsJ[32] = {0, 0, 0, 0, 1, 1, 1,  1,  2,  2,  2,  2,  3,  3,  3, 3,
                           4, 4, 5, 5, 6, 6, 7,  7,  8,  9,  10, 11, 12, 13, 14, 15};

struct JlsBitReader {
  const uint8_t* buf;
  int64_t len;
  int64_t pos;
  uint64_t cur = 0;
  int nbits = 0;
  bool prev_ff = false;

  void Fill() {
    // Marker-proof stuffing (T.87 A.1): a byte following 0xFF carries only
    // 7 data bits; if its MSB is set it is a real marker -> pad with zeros.
    while (nbits <= 40) {
      if (pos >= len) {
        cur <<= 8;
        nbits += 8;
        continue;
      }
      uint8_t b = buf[pos];
      if (prev_ff) {
        if (b & 0x80) {  // real marker: stop consuming
          cur <<= 8;
          nbits += 8;
          continue;
        }
        pos += 1;
        prev_ff = false;
        cur = (cur << 7) | b;
        nbits += 7;
      } else {
        pos += 1;
        prev_ff = (b == 0xFF);
        cur = (cur << 8) | b;
        nbits += 8;
      }
    }
  }

  inline int ReadBit() {
    if (nbits < 1) Fill();
    nbits -= 1;
    return static_cast<int>((cur >> nbits) & 1);
  }

  inline uint32_t ReadBits(int n) {
    uint32_t v = 0;
    while (n > 0) {
      if (nbits < 1) Fill();
      int take = n < nbits ? n : nbits;
      nbits -= take;
      v = (v << take) |
          static_cast<uint32_t>((cur >> nbits) & ((1ull << take) - 1));
      n -= take;
    }
    return v;
  }

  inline int Unary(bool* ok) {
    int u = 0;
    while (ReadBit() == 0) {
      if (++u > (1 << 20)) {  // runaway unary: corrupt stream
        *ok = false;
        return 0;
      }
    }
    return u;
  }
};

struct JlsParams {
  int near, maxval, range, qbpp, bpp, limit, reset, t1, t2, t3;
};

inline int JlsBitLength(int v) {
  int n = 0;
  while (v > 0) {
    ++n;
    v >>= 1;
  }
  return n;
}

// Derived coding parameters (T.87 A.2.1 / C.2.4.1.1); LSE values of 0 mean
// "use the default", matching jpeg_ls._Params.
void JlsInitParams(JlsParams* p, int precision, int near, int maxval_in,
                   int t1_in, int t2_in, int t3_in, int reset_in) {
  p->near = near;
  p->maxval = maxval_in > 0 ? maxval_in : (1 << precision) - 1;
  p->range = (p->maxval + 2 * near) / (2 * near + 1) + 1;
  p->qbpp = std::max(1, JlsBitLength(p->range - 1));
  p->bpp = std::max(2, JlsBitLength(p->maxval));
  p->limit = 2 * (p->bpp + std::max(8, p->bpp));
  p->reset = reset_in > 0 ? reset_in : 64;
  int mv = p->maxval, nn = near, d1, d2, d3;
  if (mv >= 128) {
    int factor = (std::min(mv, 4095) + 128) / 256;
    d1 = factor * (3 - 2) + 2 + 3 * nn;
    d2 = factor * (7 - 3) + 3 + 5 * nn;
    d3 = factor * (21 - 4) + 4 + 7 * nn;
  } else {
    int factor = 256 / (mv + 1);
    d1 = std::max(2, 3 / factor + 3 * nn);
    d2 = std::max(3, 7 / factor + 5 * nn);
    d3 = std::max(4, 21 / factor + 7 * nn);
  }
  p->t1 = t1_in > 0 ? t1_in : std::max(nn + 1, std::min(d1, mv));
  p->t2 = t2_in > 0 ? t2_in : std::max(p->t1, std::min(d2, mv));
  p->t3 = t3_in > 0 ? t3_in : std::max(p->t2, std::min(d3, mv));
}

// Adaptive context state: 365 regular + 2 run-interruption contexts. int64
// because a preset RESET up to 65535 lets A/B exceed 32 bits.
struct JlsState {
  int64_t A[367], B[365], N[367], Nn[2];
  int32_t C[365];
  int run_index = 0;

  void Init(const JlsParams& p) {
    int64_t init_a = std::max<int64_t>(2, (p.range + 32) / 64);
    for (int i = 0; i < 367; ++i) {
      A[i] = init_a;
      N[i] = 1;
    }
    for (int i = 0; i < 365; ++i) {
      B[i] = 0;
      C[i] = 0;
    }
    Nn[0] = Nn[1] = 0;
  }
};

// T.87 A.3.3 gradient quantization to [-4, 4].
inline int JlsQuantize(int d, const JlsParams& p) {
  if (d <= -p.t3) return -4;
  if (d <= -p.t2) return -3;
  if (d <= -p.t1) return -2;
  if (d < -p.near) return -1;
  if (d <= p.near) return 0;
  if (d < p.t1) return 1;
  if (d < p.t2) return 2;
  if (d < p.t3) return 3;
  return 4;
}

// Median edge-detecting predictor (A.4.2).
inline int JlsPredict(int ra, int rb, int rc) {
  int mx = std::max(ra, rb), mn = std::min(ra, rb);
  if (rc >= mx) return mn;
  if (rc <= mn) return mx;
  return ra + rb - rc;
}

inline int JlsGolombK(int64_t n, int64_t a) {
  int k = 0;
  while ((n << k) < a) ++k;
  return k;
}

// A.6: variable update + bias computation after a regular-mode sample.
// (>> on negative int64 is an arithmetic shift, matching python's halving.)
inline void JlsUpdateRegular(JlsState* st, const JlsParams& p, int q,
                             int errval) {
  st->B[q] += static_cast<int64_t>(errval) * (2 * p.near + 1);
  st->A[q] += std::abs(errval);
  if (st->N[q] == p.reset) {
    st->A[q] >>= 1;
    st->B[q] >>= 1;
    st->N[q] >>= 1;
  }
  st->N[q] += 1;
  if (st->B[q] <= -st->N[q]) {
    st->B[q] += st->N[q];
    if (st->C[q] > -128) st->C[q] -= 1;
    if (st->B[q] <= -st->N[q]) st->B[q] = -st->N[q] + 1;
  } else if (st->B[q] > 0) {
    st->B[q] -= st->N[q];
    if (st->C[q] < 127) st->C[q] += 1;
    if (st->B[q] > 0) st->B[q] = 0;
  }
}

// A.7.2.2: Golomb parameter for a run-interruption sample.
inline int JlsRiK(const JlsState& st, int ritype) {
  int q = 365 + ritype;
  int64_t temp = st.A[q] + (ritype ? (st.N[q] >> 1) : 0);
  return JlsGolombK(st.N[q], temp);
}

// A.7.2.4: run-interruption state update (+ run index decrement).
inline void JlsRiUpdate(JlsState* st, const JlsParams& p, int ritype,
                        int errval, int emerrval) {
  int q = 365 + ritype;
  if (errval < 0) st->Nn[ritype] += 1;
  st->A[q] += (emerrval + 1 - ritype) >> 1;
  if (st->N[q] == p.reset) {
    st->A[q] >>= 1;
    st->N[q] >>= 1;
    st->Nn[ritype] >>= 1;
  }
  st->N[q] += 1;
  if (st->run_index > 0) st->run_index -= 1;
}

// A.4.5 / A.7.2.1 reconstruction wrap + clamp to [0, MAXVAL].
inline int JlsClamp(int rx, const JlsParams& p) {
  int span = p.range * (2 * p.near + 1);
  if (rx < -p.near) {
    rx += span;
  } else if (rx > p.maxval + p.near) {
    rx -= span;
  }
  return std::min(std::max(rx, 0), p.maxval);
}

inline int JlsGolombDecode(JlsBitReader* r, int k, int limit, int qbpp,
                           bool* ok) {
  int u = r->Unary(ok);
  if (!*ok) return 0;
  if (u < limit - qbpp - 1) return (u << k) | static_cast<int>(r->ReadBits(k));
  return static_cast<int>(r->ReadBits(qbpp)) + 1;
}

// Run mode (A.7): fill with RUNval, then decode the interruption sample.
// Returns the new column; sets *ok=false on a corrupt stream.
int JlsDecodeRun(JlsBitReader* r, JlsState* st, const JlsParams& p,
                 int32_t* cur, const int32_t* prev, int col, int cols,
                 bool* ok) {
  int runval = cur[col];
  int avail = cols - col;
  while (r->ReadBit() == 1) {
    int seg = 1 << kJlsJ[st->run_index];
    int cnt = std::min(seg, avail);
    for (int i = 0; i < cnt; ++i) cur[col + 1 + i] = runval;
    col += cnt;
    avail -= cnt;
    if (cnt == seg && st->run_index < 31) st->run_index += 1;
    if (avail == 0) return col;  // run reached end of line: no interruption
  }
  if (kJlsJ[st->run_index] > 0) {
    int rem = static_cast<int>(r->ReadBits(kJlsJ[st->run_index]));
    if (rem >= avail) {  // remainder overruns the line: corrupt
      *ok = false;
      return col;
    }
    for (int i = 0; i < rem; ++i) cur[col + 1 + i] = runval;
    col += rem;
    avail -= rem;
  }
  if (avail <= 0) {
    *ok = false;
    return col;
  }

  // run-interruption sample (A.7.2)
  int ra = cur[col], rb = prev[col + 1];
  int ritype = (std::abs(ra - rb) <= p.near) ? 1 : 0;
  int px = ritype ? ra : rb;
  int sign = (!ritype && ra > rb) ? -1 : 1;
  int q = 365 + ritype;
  int k = JlsRiK(*st, ritype);
  int emerr =
      JlsGolombDecode(r, k, p.limit - kJlsJ[st->run_index] - 1, p.qbpp, ok);
  if (!*ok) return col;
  int temp = emerr + ritype;
  int mapbit = temp & 1;
  int errvalabs = (temp + mapbit) / 2;
  int cond = (k != 0 || 2 * st->Nn[ritype] >= st->N[q]) ? 1 : 0;
  int errval = (cond == mapbit) ? -errvalabs : errvalabs;
  JlsRiUpdate(st, p, ritype, errval, emerr);
  int rx = px + sign * errval * (2 * p.near + 1);
  cur[col + 1] = JlsClamp(rx, p);
  return col + 1;
}

// Decodes one single-component ILV-0 JPEG-LS stream. Returns 0 on success;
// fills rows/cols; writes up to out_capacity uint16 samples into out.
int DecodeJpegLs(const uint8_t* buf, int64_t len, uint16_t* out,
                 int64_t out_capacity, int* rows_out, int* cols_out) {
  if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return 30;  // no SOI
  int64_t pos = 2;
  int precision = -1, rows = 0, cols = 0;
  int lse_maxval = 0, lse_t1 = 0, lse_t2 = 0, lse_t3 = 0, lse_reset = 0;
  int near = 0;
  bool have_sos = false;
  while (pos + 4 <= len) {
    if (buf[pos] != 0xFF) return 31;
    uint8_t code = buf[pos + 1];
    int seglen = (buf[pos + 2] << 8) | buf[pos + 3];
    if (pos + 2 + seglen > len) return 32;  // truncated segment
    const uint8_t* seg = buf + pos + 4;
    int n = seglen - 2;
    if (code == 0xDA) {  // SOS
      if (precision < 0) return 33;  // SOS before SOF55
      if (n < 6) return 34;
      int ns = seg[0];
      if (ns != 1) return 35;  // multi-component scan
      near = seg[1 + 2 * ns];
      if (seg[2 + 2 * ns] != 0) return 36;  // ILV != 0
      pos += 2 + seglen;
      have_sos = true;
      break;
    }
    if (code == 0xF7) {  // SOF55 frame header
      if (n < 6) return 34;
      precision = seg[0];
      rows = (seg[1] << 8) | seg[2];
      cols = (seg[3] << 8) | seg[4];
      if (seg[5] != 1) return 35;  // multi-component frame
      if (rows == 0) return 37;    // DNL deferred height
    } else if (code == 0xF8) {  // LSE preset parameters
      if (n >= 1 && seg[0] == 1) {
        if (n < 11) return 34;
        lse_maxval = (seg[1] << 8) | seg[2];
        lse_t1 = (seg[3] << 8) | seg[4];
        lse_t2 = (seg[5] << 8) | seg[6];
        lse_t3 = (seg[7] << 8) | seg[8];
        lse_reset = (seg[9] << 8) | seg[10];
      }  // other LSE ids (mapping tables, extensions) are skippable
    } else if (code == 0xDD) {  // DRI
      if (n >= 2 && (((seg[0] << 8) | seg[1]) != 0)) return 38;  // restarts
    } else if (code == 0xFE || (code >= 0xE0 && code <= 0xEF)) {
      // COM / APPn: skip
    } else {
      return 39;  // unexpected marker
    }
    pos += 2 + seglen;
  }
  if (!have_sos) return 40;
  if (static_cast<int64_t>(rows) * cols > out_capacity) return 41;
  if (rows <= 0 || cols <= 0) return 42;

  JlsParams p;
  JlsInitParams(&p, precision, near, lse_maxval, lse_t1, lse_t2, lse_t3,
                lse_reset);
  JlsState st;
  st.Init(p);
  JlsBitReader r{buf, len, pos};
  std::vector<int32_t> prev(cols + 2, 0), cur(cols + 2, 0);
  bool ok = true;
  for (int row = 0; row < rows; ++row) {
    std::fill(cur.begin(), cur.end(), 0);
    cur[0] = prev[1];  // Ra of col 0 = Rb
    prev[cols + 1] = prev[cols];  // Rd of last col = its Rb
    int col = 0;
    while (col < cols) {
      int ra = cur[col], rb = prev[col + 1];
      int rc = prev[col], rd = prev[col + 2];
      int q1 = JlsQuantize(rd - rb, p);
      int q2 = JlsQuantize(rb - rc, p);
      int q3 = JlsQuantize(rc - ra, p);
      if (q1 == 0 && q2 == 0 && q3 == 0) {
        col = JlsDecodeRun(&r, &st, p, cur.data(), prev.data(), col, cols,
                           &ok);
        if (!ok) return 43;
        continue;
      }
      int q = q1 * 81 + q2 * 9 + q3;
      int sign = 1;
      if (q < 0) {
        sign = -1;
        q = -q;
      }
      int px = JlsPredict(ra, rb, rc) + sign * st.C[q];
      px = std::min(std::max(px, 0), p.maxval);
      int k = JlsGolombK(st.N[q], st.A[q]);
      int merr = JlsGolombDecode(&r, k, p.limit, p.qbpp, &ok);
      if (!ok) return 43;
      int errval;
      if (p.near == 0 && k == 0 && 2 * st.B[q] <= -st.N[q]) {
        errval = (merr & 1) ? (merr - 1) / 2 : -(merr / 2) - 1;
      } else {
        errval = (merr & 1) ? -((merr + 1) / 2) : merr / 2;
      }
      JlsUpdateRegular(&st, p, q, errval);
      int rx = px + sign * errval * (2 * p.near + 1);
      cur[col + 1] = JlsClamp(rx, p);
      col += 1;
    }
    uint16_t* orow = out + static_cast<int64_t>(row) * cols;
    for (int c = 0; c < cols; ++c) orow[c] = static_cast<uint16_t>(cur[c + 1]);
    std::swap(prev, cur);
  }
  *rows_out = rows;
  *cols_out = cols;
  return 0;
}

// ---------------------------------------------------------------------------
// JPEG 2000 Part 1 (ITU-T T.800) decode — fast path for compressed DICOM
// transfer syntaxes 1.2.840.10008.1.2.4.90/.91. Mirror of the python
// oracle in mmnn_sts_tpu/data/jpeg2000.py (tested against it); written from
// the public T.800 spec, no OpenJPEG/Kakadu/GDCM code. Same scope as the
// python decoder (single component/tile; reversible 5/3 AND irreversible
// 9/7 with scalar quantization + midpoint reconstruction; default
// precincts, code-block style 0); nonzero return sends the caller to python.
// ---------------------------------------------------------------------------

// (Qe, NMPS, NLPS, SWITCH) — T.800 Table C.2
struct MqState { uint16_t qe; uint8_t nmps, nlps, sw; };
constexpr MqState kMqTable[47] = {
    {0x5601, 1, 1, 1},   {0x3401, 2, 6, 0},   {0x1801, 3, 9, 0},
    {0x0AC1, 4, 12, 0},  {0x0521, 5, 29, 0},  {0x0221, 38, 33, 0},
    {0x5601, 7, 6, 1},   {0x5401, 8, 14, 0},  {0x4801, 9, 14, 0},
    {0x3801, 10, 14, 0}, {0x3001, 11, 17, 0}, {0x2401, 12, 18, 0},
    {0x1C01, 13, 20, 0}, {0x1601, 29, 21, 0}, {0x5601, 15, 14, 1},
    {0x5401, 16, 14, 0}, {0x5101, 17, 15, 0}, {0x4801, 18, 16, 0},
    {0x3801, 19, 17, 0}, {0x3401, 20, 18, 0}, {0x3001, 21, 19, 0},
    {0x2801, 22, 19, 0}, {0x2401, 23, 20, 0}, {0x2201, 24, 21, 0},
    {0x1C01, 25, 22, 0}, {0x1801, 26, 23, 0}, {0x1601, 27, 24, 0},
    {0x1401, 28, 25, 0}, {0x1201, 29, 26, 0}, {0x1101, 30, 27, 0},
    {0x0AC1, 31, 28, 0}, {0x09C1, 32, 29, 0}, {0x08A1, 33, 30, 0},
    {0x0521, 34, 31, 0}, {0x0441, 35, 32, 0}, {0x02A1, 36, 33, 0},
    {0x0221, 37, 34, 0}, {0x0141, 38, 35, 0}, {0x0111, 39, 36, 0},
    {0x0085, 40, 37, 0}, {0x0049, 41, 38, 0}, {0x0025, 42, 39, 0},
    {0x0015, 43, 40, 0}, {0x0009, 44, 41, 0}, {0x0005, 45, 42, 0},
    {0x0001, 45, 43, 0}, {0x5601, 46, 46, 0},
};
constexpr int kCtxRl = 17, kCtxUni = 18;

struct MqDec {
  const uint8_t* buf;
  int64_t len;
  int64_t bp = 0;
  uint32_t c = 0, a = 0;
  int ct = 0;
  uint8_t idx[19];
  uint8_t mps[19];

  void Init(const uint8_t* b, int64_t n) {
    buf = b;
    len = n;
    bp = 0;
    std::memset(idx, 0, sizeof(idx));
    std::memset(mps, 0, sizeof(mps));
    idx[0] = 4;       // all-zero-neighbor significance context (Table D.7)
    idx[kCtxRl] = 3;
    idx[kCtxUni] = 46;
    c = (n ? buf[0] : 0xFF) << 16;
    ByteIn();
    c <<= 7;
    ct -= 7;
    a = 0x8000;
  }

  void ByteIn() {
    uint8_t b = bp < len ? buf[bp] : 0xFF;
    if (b == 0xFF) {
      uint8_t b1 = bp + 1 < len ? buf[bp + 1] : 0xFF;
      if (b1 > 0x8F) {
        c += 0xFF00;
        ct = 8;
      } else {
        bp += 1;
        c += b1 << 9;
        ct = 7;
      }
    } else {
      bp += 1;
      uint8_t b1 = bp < len ? buf[bp] : 0xFF;
      c += b1 << 8;
      ct = 8;
    }
  }

  int Decode(int cx) {
    const MqState& st = kMqTable[idx[cx]];
    uint32_t qe = st.qe;
    int d;
    a -= qe;
    if (((c >> 16) & 0xFFFF) < qe) {
      if (a < qe) {  // LPS exchange (C.3.4)
        d = mps[cx];
        idx[cx] = st.nmps;
      } else {
        d = 1 - mps[cx];
        if (st.sw) mps[cx] = 1 - mps[cx];
        idx[cx] = st.nlps;
      }
      a = qe;
    } else {
      c -= qe << 16;
      if (a & 0x8000) return mps[cx];
      if (a < qe) {  // MPS exchange (C.3.3)
        d = 1 - mps[cx];
        if (st.sw) mps[cx] = 1 - mps[cx];
        idx[cx] = st.nlps;
      } else {
        d = mps[cx];
        idx[cx] = st.nmps;
      }
    }
    do {  // RENORMD
      if (ct == 0) ByteIn();
      a = (a << 1) & 0xFFFF;
      c <<= 1;
      ct -= 1;
    } while (!(a & 0x8000));
    return d;
  }
};

// Packet-header bit reader with 0xFF stuffing (B.10.1).
struct J2kHdrReader {
  const uint8_t* buf;
  int64_t len, pos;
  uint8_t cur = 0, prev = 0;
  int ct = 0;
  bool bad = false;

  int ReadBit() {
    if (ct == 0) {
      if (pos >= len) {
        bad = true;
        return 0;
      }
      cur = buf[pos++];
      ct = prev == 0xFF ? 7 : 8;
      prev = cur;
    }
    ct -= 1;
    return (cur >> ct) & 1;
  }

  uint32_t ReadBits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | ReadBit();
    return v;
  }

  void Align() {
    ct = 0;
    if (prev == 0xFF) {
      if (pos >= len) {
        bad = true;
        return;
      }
      pos += 1;  // consume the stuffed pad byte
    }
    prev = 0;
  }
};

// Tag tree (B.10.2), decoder side.
struct J2kTagTree {
  struct Lvl { int w, h; std::vector<int32_t> value, low; };
  std::vector<Lvl> lv;

  void Init(int w, int h) {
    lv.clear();
    for (;;) {
      Lvl l;
      l.w = w;
      l.h = h;
      l.value.assign((size_t)w * h, INT32_MAX);
      l.low.assign((size_t)w * h, 0);
      lv.push_back(std::move(l));
      if (w == 1 && h == 1) break;
      w = (w + 1) / 2;
      h = (h + 1) / 2;
    }
  }

  bool Decode(J2kHdrReader* r, int x, int y, int threshold) {
    int low = 0, v = INT32_MAX;
    for (int lev = (int)lv.size() - 1; lev >= 0; --lev) {
      Lvl& L = lv[lev];
      size_t i = (size_t)(y >> lev) * L.w + (x >> lev);
      if (low > L.low[i]) L.low[i] = low;
      else low = L.low[i];
      v = L.value[i];
      while (low < threshold && low < v) {
        if (r->ReadBit()) {
          v = low;
          L.value[i] = low;
        } else {
          ++low;
        }
      }
      L.low[i] = low;
    }
    return v < threshold;
  }

  int32_t Leaf(int x, int y) const { return lv[0].value[(size_t)y * lv[0].w + x]; }
};

// Significance-coding context (Table D.1); band: 0=LL/LH table, 1=HL, 2=HH.
inline int J2kSigCtx(const uint8_t* sig, int stride, int x, int y, int band) {
  const uint8_t* p = sig + (size_t)y * stride + x;
  int h = p[-1] + p[1];
  int v = p[-stride] + p[stride];
  int d = p[-stride - 1] + p[-stride + 1] + p[stride - 1] + p[stride + 1];
  if (band == 1) std::swap(h, v);
  if (band != 2) {
    if (h == 2) return 8;
    if (h == 1) return v >= 1 ? 7 : (d >= 1 ? 6 : 5);
    if (v == 2) return 4;
    if (v == 1) return 3;
    return d >= 2 ? 2 : (d == 1 ? 1 : 0);
  }
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) return hv >= 1 ? 7 : 6;
  if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
  return hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
}

// Sign-coding context + xor bit (Tables D.2/D.3); sgn holds +1/-1/0.
inline void J2kSignCtx(const int8_t* sgn, int stride, int x, int y,
                       int* ctx, int* xorbit) {
  const int8_t* p = sgn + (size_t)y * stride + x;
  int h = p[-1] + p[1];
  int v = p[-stride] + p[stride];
  h = h > 1 ? 1 : (h < -1 ? -1 : h);
  v = v > 1 ? 1 : (v < -1 ? -1 : v);
  if (h == 1) {
    *ctx = v == 1 ? 13 : (v == 0 ? 12 : 11);
    *xorbit = 0;
  } else if (h == 0) {
    if (v == 1) { *ctx = 10; *xorbit = 0; }
    else if (v == 0) { *ctx = 9; *xorbit = 0; }
    else { *ctx = 10; *xorbit = 1; }
  } else {
    *ctx = v == 1 ? 11 : (v == 0 ? 12 : 13);
    *xorbit = 1;
  }
}

// T1 decode of one code block (Annex D): w x h coefficients, band table id,
// starting bitplane msb, `numpasses` coding passes. out: signed coeffs.
// `lastp` (optional): per-coefficient bitplane of the last decoded
// magnitude bit — the remaining uncertainty interval is 2^lastp wide,
// which drives midpoint reconstruction of quantized (9/7) streams.
// Mirrors the python oracle's tracking (mmnn_sts_tpu/data/jpeg2000.py).
int J2kT1Decode(const uint8_t* data, int64_t dlen, int w, int h, int band,
                int msb, int numpasses, int32_t* out,
                int32_t* lastp = nullptr) {
  if (msb < 0 || msb > 30) return 61;
  int stride = w + 2;
  std::vector<uint8_t> sigv((size_t)stride * (h + 2), 0);
  std::vector<int8_t> sgnv((size_t)stride * (h + 2), 0);
  std::vector<uint8_t> refv((size_t)w * h, 0);
  std::vector<uint8_t> visv((size_t)w * h, 0);
  std::vector<int32_t> mag((size_t)w * h, 0);
  std::vector<uint8_t> sbit((size_t)w * h, 0);
  uint8_t* sig = sigv.data();
  int8_t* sgn = sgnv.data();
  MqDec mq;
  mq.Init(data, dlen);

  auto code_sign = [&](int x, int y) {
    int ctx, xorbit;
    J2kSignCtx(sgn, stride, x + 1, y + 1, &ctx, &xorbit);
    int s = mq.Decode(ctx) ^ xorbit;
    sbit[(size_t)y * w + x] = (uint8_t)s;
    sig[(size_t)(y + 1) * stride + x + 1] = 1;
    sgn[(size_t)(y + 1) * stride + x + 1] = s ? -1 : 1;
  };

  auto pass_spp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ymax = std::min(y0 + 4, h);
      for (int x = 0; x < w; ++x) {
        for (int y = y0; y < ymax; ++y) {
          if (sig[(size_t)(y + 1) * stride + x + 1]) continue;
          int ctx = J2kSigCtx(sig, stride, x + 1, y + 1, band);
          if (ctx == 0) continue;
          visv[(size_t)y * w + x] = 1;
          if (mq.Decode(ctx)) {
            mag[(size_t)y * w + x] |= 1 << p;
            code_sign(x, y);
            if (lastp) lastp[(size_t)y * w + x] = p;
          }
        }
      }
    }
  };

  auto pass_mrp = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      int ymax = std::min(y0 + 4, h);
      for (int x = 0; x < w; ++x) {
        for (int y = y0; y < ymax; ++y) {
          size_t i = (size_t)y * w + x;
          if (!sig[(size_t)(y + 1) * stride + x + 1] || visv[i]) continue;
          int ctx;
          if (refv[i]) {
            ctx = 16;
          } else {
            const uint8_t* q = sig + (size_t)(y + 1) * stride + x + 1;
            int nb = q[-stride - 1] + q[-stride] + q[-stride + 1] + q[-1] +
                     q[1] + q[stride - 1] + q[stride] + q[stride + 1];
            ctx = nb ? 15 : 14;
          }
          if (mq.Decode(ctx)) mag[i] |= 1 << p;
          else mag[i] &= ~(1 << p);
          refv[i] = 1;
          if (lastp) lastp[i] = p;
        }
      }
    }
  };

  auto pass_cleanup = [&](int p) {
    for (int y0 = 0; y0 < h; y0 += 4) {
      bool full = y0 + 4 <= h;
      int ymax = full ? y0 + 4 : h;
      for (int x = 0; x < w; ++x) {
        int start = y0;
        if (full) {
          bool rl = true;
          for (int dy = 0; dy < 4 && rl; ++dy) {
            int y = y0 + dy;
            if (sig[(size_t)(y + 1) * stride + x + 1] ||
                visv[(size_t)y * w + x] ||
                J2kSigCtx(sig, stride, x + 1, y + 1, band) != 0)
              rl = false;
          }
          if (rl) {
            if (!mq.Decode(kCtxRl)) continue;
            int r = (mq.Decode(kCtxUni) << 1) | mq.Decode(kCtxUni);
            int y = y0 + r;
            mag[(size_t)y * w + x] |= 1 << p;
            code_sign(x, y);
            if (lastp) lastp[(size_t)y * w + x] = p;
            start = y + 1;
          }
        }
        for (int y = start; y < ymax; ++y) {
          size_t i = (size_t)y * w + x;
          if (sig[(size_t)(y + 1) * stride + x + 1] || visv[i]) continue;
          int ctx = J2kSigCtx(sig, stride, x + 1, y + 1, band);
          if (mq.Decode(ctx)) {
            mag[i] |= 1 << p;
            code_sign(x, y);
            if (lastp) lastp[i] = p;
          }
        }
      }
    }
  };

  int passno = 0, p = msb;
  while (passno < numpasses) {
    if (passno == 0) {
      pass_cleanup(p);
      passno += 1;
    } else {
      pass_spp(p);
      if (++passno >= numpasses) break;
      pass_mrp(p);
      if (++passno >= numpasses) break;
      pass_cleanup(p);
      passno += 1;
    }
    std::fill(visv.begin(), visv.end(), 0);
    if (--p < 0) break;
  }
  for (size_t i = 0; i < (size_t)w * h; ++i)
    out[i] = sbit[i] ? -mag[i] : mag[i];
  return 0;
}

// Reversible 5/3 inverse DWT, 1D synthesis along a strided signal.
// s: ne low samples, d: no high samples, out interleaved (n = ne + no).
void J2kIdwtRow(const int32_t* s, const int32_t* d, int ne, int no,
                int32_t* out) {
  int n = ne + no;
  if (n == 1) {
    out[0] = s[0];
    return;
  }
  std::vector<int32_t> xe(ne);
  for (int k = 0; k < ne; ++k) {
    int32_t dm1 = d[k - 1 < 0 ? 0 : (k - 1 >= no ? no - 1 : k - 1)];
    int32_t dk = d[k >= no ? no - 1 : k];
    xe[k] = s[k] - ((dm1 + dk + 2) >> 2);
  }
  for (int k = 0; k < no; ++k) {
    int32_t xr = xe[k + 1 >= ne ? ne - 1 : k + 1];
    out[2 * k + 1] = d[k] + ((xe[k] + xr) >> 1);
  }
  for (int k = 0; k < ne; ++k) out[2 * k] = xe[k];
}

// Irreversible 9/7 inverse DWT (T.800 Annex F, Table F.4), 1D synthesis in
// double precision. Same even-start / clamped-neighbor extension as the
// 5/3 above; lowpass was scaled by 1/K at analysis and highpass by K, so
// synthesis undoes that before un-lifting. Mirror of _dwt97_merge_1d in
// mmnn_sts_tpu/data/jpeg2000.py (the tested convention).
void J2kIdwtRow97(const double* s, const double* d, int ne, int no,
                  double* out) {
  constexpr double kA = -1.586134342059924;  // lifting steps (Table F.4)
  constexpr double kB = -0.052980118572961;
  constexpr double kG = 0.882911075530934;
  constexpr double kD = 0.443506852043971;
  constexpr double kK = 1.230174104914001;
  int n = ne + no;
  if (n == 1) {
    out[0] = s[0];
    return;
  }
  std::vector<double> e(ne), o(no);
  for (int k = 0; k < ne; ++k) e[k] = s[k] * kK;
  for (int k = 0; k < no; ++k) o[k] = d[k] * (1.0 / kK);
  // even sample k's odd neighbors: o[clamp(k-1)], o[clamp(k)]
  auto even_step = [&](double c) {
    for (int k = 0; k < ne; ++k) {
      double l = o[k - 1 < 0 ? 0 : (k - 1 >= no ? no - 1 : k - 1)];
      double r = o[k >= no ? no - 1 : k];
      e[k] -= c * (l + r);
    }
  };
  // odd sample k's even neighbors: e[k], e[clamp(k+1)]
  auto odd_step = [&](double c) {
    for (int k = 0; k < no; ++k)
      o[k] -= c * (e[k] + e[k + 1 >= ne ? ne - 1 : k + 1]);
  };
  even_step(kD);
  odd_step(kG);
  even_step(kB);
  odd_step(kA);
  for (int k = 0; k < ne; ++k) out[2 * k] = e[k];
  for (int k = 0; k < no; ++k) out[2 * k + 1] = o[k];
}

struct J2kBand {
  int w = 0, h = 0, band = 0;  // band: 0 LL/LH-table, 1 HL, 2 HH
  int gain = 0;
  std::vector<int32_t> coeffs;
};

struct J2kBlockState {
  int x0, y0, w, h;
  bool included = false;
  int zbp = 0, lblock = 3, numpasses = 0;
  std::vector<uint8_t> data;
};

// Decodes a lossless single-component J2K codestream. Returns 0 on success.
int DecodeJ2k(const uint8_t* buf, int64_t len, int32_t* out,
              int64_t out_capacity, int* rows_out, int* cols_out) {
  // Optional JP2 container: find the jp2c box.
  static const uint8_t kJp2Sig[12] = {0, 0, 0, 0x0C, 'j', 'P', ' ', ' ',
                                      0x0D, 0x0A, 0x87, 0x0A};
  if (len >= 12 && std::memcmp(buf, kJp2Sig, 12) == 0) {
    int64_t pos = 0;
    bool found = false;
    while (pos + 8 <= len) {
      uint64_t ln = ((uint64_t)buf[pos] << 24) | (buf[pos + 1] << 16) |
                    (buf[pos + 2] << 8) | buf[pos + 3];
      const uint8_t* ty = buf + pos + 4;
      int64_t payload = pos + 8;
      if (ln == 1) {
        if (pos + 16 > len) return 70;
        ln = 0;
        for (int i = 0; i < 8; ++i) ln = (ln << 8) | buf[pos + 8 + i];
        payload = pos + 16;
      }
      if (ln == 0) ln = len - pos;
      if (std::memcmp(ty, "jp2c", 4) == 0) {
        buf += payload;
        len = pos + (int64_t)ln - payload;
        found = true;
        break;
      }
      pos += (int64_t)ln;
    }
    if (!found) return 70;
  }

  auto u16 = [&](int64_t i) -> int { return (buf[i] << 8) | buf[i + 1]; };
  auto u32 = [&](int64_t i) -> uint32_t {
    return ((uint32_t)buf[i] << 24) | (buf[i + 1] << 16) | (buf[i + 2] << 8) |
           buf[i + 3];
  };
  if (len < 4 || u16(0) != 0xFF4F) return 71;  // SOC
  int64_t pos = 2;
  int W = 0, H = 0, depth = 0, levels = -1, xcb = 0, ycb = 0, layers = 1;
  int prog = 0, guard = 0, qstyle = 0;
  bool is_signed = false, use_sop = false, use_eph = false;
  bool reversible = true;
  std::vector<std::pair<int, int>> quant;  // (exponent, mantissa) per band
  bool have_siz = false, have_cod = false, have_qcd = false;

  while (true) {
    if (pos + 4 > len) return 72;
    int marker = u16(pos);
    if (marker == 0xFF90) break;  // SOT
    int seglen = u16(pos + 2);
    if (pos + 2 + seglen > len) return 72;
    const uint8_t* body = buf + pos + 4;
    int n = seglen - 2;
    if (marker == 0xFF51) {  // SIZ
      if (n < 38) return 72;
      W = (int)((body[2] << 24) | (body[3] << 16) | (body[4] << 8) | body[5]);
      H = (int)((body[6] << 24) | (body[7] << 16) | (body[8] << 8) | body[9]);
      uint32_t xo = u32(pos + 4 + 10), yo = u32(pos + 4 + 14);
      uint32_t xt = u32(pos + 4 + 18), yt = u32(pos + 4 + 22);
      uint32_t xto = u32(pos + 4 + 26), yto = u32(pos + 4 + 30);
      int ncomp = (body[34] << 8) | body[35];
      if (ncomp != 1) return 73;
      if (xo || yo || xto || yto) return 73;
      if ((int)xt < W || (int)yt < H) return 73;
      depth = (body[36] & 0x7F) + 1;
      is_signed = (body[36] & 0x80) != 0;
      if (body[37] != 1 || body[38] != 1) return 73;
      have_siz = true;
    } else if (marker == 0xFF52) {  // COD
      if (n < 10) return 72;
      int scod = body[0];
      use_sop = scod & 2;
      use_eph = scod & 4;
      prog = body[1];
      layers = (body[2] << 8) | body[3];
      if (body[4] != 0) return 73;  // MCT
      levels = body[5];
      xcb = (body[6] & 0x0F) + 2;
      ycb = (body[7] & 0x0F) + 2;
      if (body[8] != 0) return 73;  // code-block style
      if (body[9] == 1) reversible = true;
      else if (body[9] == 0) reversible = false;  // irreversible 9/7
      else return 73;
      if (scod & 1) {               // explicit precincts: whole-res only
        if (n < 10 + levels + 1) return 72;
        for (int r = 0; r <= levels; ++r) {
          int ppx = body[10 + r] & 0x0F, ppy = body[10 + r] >> 4;
          int rw = (W + (1 << (levels - r)) - 1) >> (levels - r);
          int rh = (H + (1 << (levels - r)) - 1) >> (levels - r);
          if ((1 << ppx) < rw || (1 << ppy) < rh) return 73;
        }
      }
      have_cod = true;
    } else if (marker == 0xFF5C) {  // QCD
      if (n < 2) return 72;
      int sqcd = body[0];
      qstyle = sqcd & 0x1F;
      guard = sqcd >> 5;
      quant.clear();
      if (qstyle == 0) {  // no quantization: one exponent byte per band
        for (int i = 1; i < n; ++i) quant.emplace_back(body[i] >> 3, 0);
      } else if (qstyle == 1 || qstyle == 2) {  // scalar derived/expounded
        if ((n - 1) % 2) return 72;
        for (int i = 1; i + 1 < n; i += 2) {
          int word = (body[i] << 8) | body[i + 1];
          quant.emplace_back(word >> 11, word & 0x7FF);
        }
        if (quant.empty()) return 72;
      } else {
        return 74;  // unknown style: python owns the error message
      }
      have_qcd = true;
    } else if (marker == 0xFF53 || marker == 0xFF5D || marker == 0xFF5F ||
               marker == 0xFF5E || marker == 0xFF60) {
      return 73;  // COC/QCC/POC/RGN/PPM
    } else if (marker == 0xFF64 || marker == 0xFF63 || marker == 0xFF55 ||
               marker == 0xFF57) {
      // COM/CRG/TLM/PLM: skip
    } else {
      return 72;
    }
    pos += 2 + seglen;
  }
  if (!have_siz || !have_cod || !have_qcd || levels < 0) return 72;
  // T.800 pairs 5/3 with no-quantization and 9/7 with scalar (E.1); a
  // mismatched stream falls back to python's precise error.
  if (reversible != (qstyle == 0)) return 74;
  if ((int64_t)W * H > out_capacity) return 75;
  if (W <= 0 || H <= 0 || levels > 32) return 72;

  // Collect tile-part data (tile 0 only).
  std::vector<uint8_t> tile;
  while (pos + 4 <= len && u16(pos) == 0xFF90) {
    // Full SOT header is 12 bytes (marker + Lsot=10); the u16/u32 reads
    // below must stay inside the buffer on truncated streams.
    if (pos + 12 > len) return 72;
    if (u16(pos + 2) != 10) return 72;
    int isot = u16(pos + 4);
    uint32_t psot = u32(pos + 6);
    if (isot != 0) return 73;
    int64_t end = psot ? pos + (int64_t)psot : len - 2;
    if (end > len) return 72;
    int64_t p = pos + 12;
    while (p + 4 <= len && u16(p) != 0xFF93) {  // until SOD
      int m = u16(p);
      if (m == 0xFF64 || m == 0xFF58) p += 2 + u16(p + 2);  // COM/PLT
      else return 73;
    }
    if (p + 2 > len) return 72;
    // A corrupt Psot < the tile-part header size would hand vector::insert
    // a reversed range (UB / giant allocation) — reject instead.
    if (end < p + 2) return 72;
    tile.insert(tile.end(), buf + p + 2, buf + end);
    pos = end;
  }
  if (tile.empty()) return 72;

  // Geometry: dims[j] = size of LL_j.
  std::vector<std::pair<int, int>> dims(levels + 1);
  dims[0] = {W, H};
  for (int j = 1; j <= levels; ++j)
    dims[j] = {(dims[j - 1].first + 1) / 2, (dims[j - 1].second + 1) / 2};

  int cbw = 1 << xcb, cbh = 1 << ycb;
  std::vector<std::vector<J2kBand>> bands(levels + 1);
  std::vector<std::vector<std::vector<J2kBlockState>>> blocks(levels + 1);
  std::vector<std::vector<J2kTagTree>> incl(levels + 1), zbt(levels + 1);
  std::vector<std::vector<std::pair<int, int>>> grid(levels + 1);
  for (int r = 0; r <= levels; ++r) {
    std::vector<J2kBand> row;
    if (r == 0) {
      J2kBand b;
      b.w = dims[levels].first;
      b.h = dims[levels].second;
      b.band = 0;
      b.gain = 0;
      row.push_back(b);
    } else {
      int lvl = levels - r + 1;
      int pw = dims[lvl - 1].first, ph = dims[lvl - 1].second;
      int lw = (pw + 1) / 2, lh = (ph + 1) / 2;
      J2kBand hl, lh_, hh;
      hl.w = pw - lw; hl.h = lh; hl.band = 1; hl.gain = 1;
      lh_.w = lw; lh_.h = ph - lh; lh_.band = 0; lh_.gain = 1;
      hh.w = pw - lw; hh.h = ph - lh; hh.band = 2; hh.gain = 2;
      row.push_back(hl);
      row.push_back(lh_);
      row.push_back(hh);
    }
    bands[r] = row;
    blocks[r].resize(row.size());
    incl[r].resize(row.size());
    zbt[r].resize(row.size());
    grid[r].resize(row.size());
    for (size_t bi = 0; bi < row.size(); ++bi) {
      J2kBand& b = bands[r][bi];
      b.coeffs.assign((size_t)b.w * b.h, 0);
      int nbx = b.w ? (b.w + cbw - 1) / cbw : 0;
      int nby = b.h ? (b.h + cbh - 1) / cbh : 0;
      grid[r][bi] = {nbx, nby};
      if (nbx && nby) {
        incl[r][bi].Init(nbx, nby);
        zbt[r][bi].Init(nbx, nby);
        for (int by = 0; by < nby; ++by)
          for (int bx = 0; bx < nbx; ++bx) {
            J2kBlockState s{bx * cbw, by * cbh,
                            std::min(cbw, b.w - bx * cbw),
                            std::min(cbh, b.h - by * cbh)};
            blocks[r][bi].push_back(s);
          }
      }
    }
  }

  // Parse packets. Single component + precinct: every progression order is
  // a nesting of layers and resolutions.
  const uint8_t* tb = tile.data();
  int64_t tlen = (int64_t)tile.size(), tp = 0;
  struct Contribution { J2kBlockState* blk; int length; };
  auto parse_packet = [&](int layer, int r) -> int {
    if (use_sop && tp + 2 <= tlen && tb[tp] == 0xFF && tb[tp + 1] == 0x91)
      tp += 6;
    J2kHdrReader hr{tb, tlen, tp};
    std::vector<Contribution> contrib;
    if (hr.ReadBit()) {
      for (size_t bi = 0; bi < bands[r].size(); ++bi) {
        int nbx = grid[r][bi].first, nby = grid[r][bi].second;
        if (!nbx || !nby) continue;
        for (int by = 0; by < nby; ++by)
          for (int bx = 0; bx < nbx; ++bx) {
            J2kBlockState& blk = blocks[r][bi][(size_t)by * nbx + bx];
            int inc;
            if (blk.included) inc = hr.ReadBit();
            else inc = incl[r][bi].Decode(&hr, bx, by, layer + 1) ? 1 : 0;
            if (!inc) continue;
            if (!blk.included) {
              int t = 1;
              while (!zbt[r][bi].Decode(&hr, bx, by, t)) {
                if (++t > 1 << 20) return 76;
              }
              blk.zbp = zbt[r][bi].Leaf(bx, by);
              blk.lblock = 3;
              blk.included = true;
            }
            int np;
            if (!hr.ReadBit()) np = 1;
            else if (!hr.ReadBit()) np = 2;
            else {
              int t = hr.ReadBits(2);
              if (t != 3) np = 3 + t;
              else {
                t = hr.ReadBits(5);
                if (t != 31) np = 6 + t;
                else np = 37 + hr.ReadBits(7);
              }
            }
            while (hr.ReadBit()) blk.lblock += 1;
            int nbits = blk.lblock;
            for (int v = np; v > 1; v >>= 1) nbits += 1;
            int length = (int)hr.ReadBits(nbits);
            if (hr.bad) return 76;
            blk.numpasses += np;
            contrib.push_back({&blk, length});
          }
      }
    }
    hr.Align();
    if (hr.bad) return 76;
    tp = hr.pos;
    if (use_eph) {
      if (tp + 2 > tlen || tb[tp] != 0xFF || tb[tp + 1] != 0x92) return 76;
      tp += 2;
    }
    for (auto& cn : contrib) {
      if (tp + cn.length > tlen) return 76;
      cn.blk->data.insert(cn.blk->data.end(), tb + tp, tb + tp + cn.length);
      tp += cn.length;
    }
    return 0;
  };

  if (prog == 0) {  // LRCP
    for (int l = 0; l < layers; ++l)
      for (int r = 0; r <= levels; ++r)
        if (int rc = parse_packet(l, r)) return rc;
  } else {
    for (int r = 0; r <= levels; ++r)
      for (int l = 0; l < layers; ++l)
        if (int rc = parse_packet(l, r)) return rc;
  }

  // (eps, mu) for resolution r, band bi. Scalar-derived streams (E-5)
  // list one pair covering the N_L-level LL; a band produced at
  // decomposition level `lev` uses eps = eps0 - N_L + lev.
  auto band_quant = [&](int r, size_t bi, int* eps, int* mu) -> bool {
    if (qstyle == 1) {
      int lev = r == 0 ? levels : levels - r + 1;
      *eps = quant[0].first - levels + lev;
      *mu = quant[0].second;
      return true;
    }
    if (quant.size() == 1) {  // degenerate single entry: replicate
      *eps = quant[0].first;
      *mu = quant[0].second;
      return true;
    }
    size_t idx = r == 0 ? 0 : 3 * (r - 1) + 1 + bi;
    if (idx >= quant.size()) return false;
    *eps = quant[idx].first;
    *mu = quant[idx].second;
    return true;
  };

  // T1 decode all blocks into subband coefficient planes. Irreversible
  // streams dequantize into float planes with midpoint reconstruction:
  // |q| is known down to bitplane lastp, so add half that interval.
  std::vector<std::vector<std::vector<double>>> fco;
  if (!reversible) fco.resize(levels + 1);
  for (int r = 0; r <= levels; ++r) {
    if (!reversible) fco[r].resize(bands[r].size());
    for (size_t bi = 0; bi < bands[r].size(); ++bi) {
      J2kBand& b = bands[r][bi];
      int eps, mu;
      if (!band_quant(r, bi, &eps, &mu)) return 72;
      int mb = guard + eps - 1;
      double delta = 0.0;
      std::vector<double>* plane = nullptr;
      if (!reversible) {
        // Delta_b = 2^(R_b - eps) * (1 + mu/2^11), R_b = depth + gain
        delta = std::ldexp(1.0 + mu / 2048.0, depth + b.gain - eps);
        fco[r][bi].assign((size_t)b.w * b.h, 0.0);
        plane = &fco[r][bi];
      }
      std::vector<int32_t> lastp;
      for (auto& blk : blocks[r][bi]) {
        if (!blk.included || blk.numpasses == 0) continue;
        std::vector<int32_t> cf((size_t)blk.w * blk.h);
        int rc;
        if (reversible) {
          rc = J2kT1Decode(blk.data.data(), (int64_t)blk.data.size(),
                           blk.w, blk.h, b.band, mb - 1 - blk.zbp,
                           blk.numpasses, cf.data());
        } else {
          lastp.assign((size_t)blk.w * blk.h, 0);
          rc = J2kT1Decode(blk.data.data(), (int64_t)blk.data.size(),
                           blk.w, blk.h, b.band, mb - 1 - blk.zbp,
                           blk.numpasses, cf.data(), lastp.data());
        }
        if (rc) return rc;
        if (reversible) {
          for (int y = 0; y < blk.h; ++y)
            std::memcpy(&b.coeffs[(size_t)(blk.y0 + y) * b.w + blk.x0],
                        &cf[(size_t)y * blk.w], sizeof(int32_t) * blk.w);
        } else {
          for (int y = 0; y < blk.h; ++y)
            for (int x = 0; x < blk.w; ++x) {
              int32_t c = cf[(size_t)y * blk.w + x];
              double m = c < 0 ? -(double)c : (double)c;
              if (m > 0)
                m += std::ldexp(0.5, (int)lastp[(size_t)y * blk.w + x]);
              (*plane)[(size_t)(blk.y0 + y) * b.w + blk.x0 + x] =
                  (c < 0 ? -m : m) * delta;
            }
        }
      }
    }
  }

  // Inverse DWT: synthesis HOR then VER per level (F.3.4).
  std::vector<int32_t> ll;
  int lw = bands[0][0].w, lhh = bands[0][0].h;
  if (reversible) {
    ll = std::move(bands[0][0].coeffs);
    std::vector<int32_t> col_s, col_d, col_o;
    for (int r = 1; r <= levels; ++r) {
      J2kBand& HL = bands[r][0];
      J2kBand& LH = bands[r][1];
      J2kBand& HH = bands[r][2];
      int pw = lw + HL.w, ph = lhh + LH.h;
      std::vector<int32_t> lo_y((size_t)pw * lhh), hi_y((size_t)pw * LH.h);
      // horizontal merges
      for (int y = 0; y < lhh; ++y)
        J2kIdwtRow(&ll[(size_t)y * lw], HL.w ? &HL.coeffs[(size_t)y * HL.w]
                                             : nullptr,
                   lw, HL.w, &lo_y[(size_t)y * pw]);
      for (int y = 0; y < LH.h; ++y)
        J2kIdwtRow(&LH.coeffs[(size_t)y * LH.w],
                   HH.w ? &HH.coeffs[(size_t)y * HH.w] : nullptr, LH.w, HH.w,
                   &hi_y[(size_t)y * pw]);
      // vertical merges per column
      std::vector<int32_t> nxt((size_t)pw * ph);
      col_s.resize(lhh);
      col_d.resize(LH.h);
      col_o.resize(ph);
      for (int x = 0; x < pw; ++x) {
        for (int y = 0; y < lhh; ++y) col_s[y] = lo_y[(size_t)y * pw + x];
        for (int y = 0; y < LH.h; ++y) col_d[y] = hi_y[(size_t)y * pw + x];
        J2kIdwtRow(col_s.data(), col_d.data(), lhh, LH.h, col_o.data());
        for (int y = 0; y < ph; ++y) nxt[(size_t)y * pw + x] = col_o[y];
      }
      ll = std::move(nxt);
      lw = pw;
      lhh = ph;
    }
  } else {
    std::vector<double> fll = std::move(fco[0][0]);
    std::vector<double> col_s, col_d, col_o;
    for (int r = 1; r <= levels; ++r) {
      J2kBand& HL = bands[r][0];
      J2kBand& LH = bands[r][1];
      J2kBand& HH = bands[r][2];
      std::vector<double>& hlc = fco[r][0];
      std::vector<double>& lhc = fco[r][1];
      std::vector<double>& hhc = fco[r][2];
      int pw = lw + HL.w, ph = lhh + LH.h;
      std::vector<double> lo_y((size_t)pw * lhh), hi_y((size_t)pw * LH.h);
      for (int y = 0; y < lhh; ++y)
        J2kIdwtRow97(&fll[(size_t)y * lw],
                     HL.w ? &hlc[(size_t)y * HL.w] : nullptr, lw, HL.w,
                     &lo_y[(size_t)y * pw]);
      for (int y = 0; y < LH.h; ++y)
        J2kIdwtRow97(&lhc[(size_t)y * LH.w],
                     HH.w ? &hhc[(size_t)y * HH.w] : nullptr, LH.w, HH.w,
                     &hi_y[(size_t)y * pw]);
      std::vector<double> nxt((size_t)pw * ph);
      col_s.resize(lhh);
      col_d.resize(LH.h);
      col_o.resize(ph);
      for (int x = 0; x < pw; ++x) {
        for (int y = 0; y < lhh; ++y) col_s[y] = lo_y[(size_t)y * pw + x];
        for (int y = 0; y < LH.h; ++y) col_d[y] = hi_y[(size_t)y * pw + x];
        J2kIdwtRow97(col_s.data(), col_d.data(), lhh, LH.h, col_o.data());
        for (int y = 0; y < ph; ++y) nxt[(size_t)y * pw + x] = col_o[y];
      }
      fll = std::move(nxt);
      lw = pw;
      lhh = ph;
    }
    // round-half-even, matching np.rint in the python oracle
    ll.resize(fll.size());
    for (size_t i = 0; i < fll.size(); ++i)
      ll[i] = (int32_t)std::nearbyint(fll[i]);
  }
  if (lw != W || lhh != H) return 72;

  // DC level shift + clamp (E.1.1).
  int32_t lo, hi;
  if (is_signed) {
    lo = -(1 << (depth - 1));
    hi = (1 << (depth - 1)) - 1;
  } else {
    int32_t shift = 1 << (depth - 1);
    for (size_t i = 0; i < (size_t)W * H; ++i) ll[i] += shift;
    lo = 0;
    hi = (1 << depth) - 1;
  }
  for (size_t i = 0; i < (size_t)W * H; ++i)
    out[i] = std::min(std::max(ll[i], lo), hi);
  *rows_out = H;
  *cols_out = W;
  return 0;
}

}  // namespace

extern "C" {

// JPEG 2000 Part 1 decode of one single-component codestream (raw or
// JP2-wrapped; reversible or irreversible). Returns 0 on success; any
// nonzero means "use the python decoder" (which owns the error messages).
int mmnn_j2k_decode(const uint8_t* buf, int64_t len, int32_t* out,
                    int64_t out_capacity, int* rows, int* cols) {
  return DecodeJ2k(buf, len, out, out_capacity, rows, cols);
}

// JPEG-LS (T.87) decode of one single-component ILV-0 frame. Returns 0 on
// success; any nonzero means "use the python decoder" (which also owns the
// error messages for malformed streams).
int mmnn_jpeg_ls_decode(const uint8_t* buf, int64_t len, uint16_t* out,
                        int64_t out_capacity, int* rows, int* cols) {
  return DecodeJpegLs(buf, len, out, out_capacity, rows, cols);
}

// JPEG Lossless (SOF3) decode of one single-component frame.
// Returns 0 on success; rows/cols report the decoded shape.
int mmnn_jpeg_lossless_decode(const uint8_t* buf, int64_t len, uint16_t* out,
                              int64_t out_capacity, int* rows, int* cols) {
  return DecodeJpegLossless(buf, len, out, out_capacity, rows, cols);
}

// Query dims of a NIfTI file. Returns 0 on success.
int mmnn_nifti_dims(const char* path, int64_t* dims /*len>=7*/, int* ndim) {
  std::vector<uint8_t> blob;
  if (!ReadMaybeGz(path, &blob)) return 1;
  NiftiInfo info;
  if (!ParseHeader(blob, &info)) return 2;
  *ndim = info.ndim;
  for (int i = 0; i < info.ndim; ++i) dims[i] = info.shape[i];
  return 0;
}

// Decode a NIfTI file into `out` (caller-allocated, fortran-ordered float32
// of the size reported by mmnn_nifti_dims). Returns 0 on success.
int mmnn_nifti_read(const char* path, float* out, int64_t n) {
  std::vector<uint8_t> blob;
  if (!ReadMaybeGz(path, &blob)) return 1;
  NiftiInfo info;
  if (!ParseHeader(blob, &info)) return 2;
  int64_t total = 1;
  for (int i = 0; i < info.ndim; ++i) total *= info.shape[i];
  if (total != n) return 3;
  return DecodeVoxels(blob, info, out, n) ? 0 : 4;
}

// Full per-patient preprocess: decode image+mask, mask-multiply,
// crop(0)/fill(1)/none(2) zero planes, trilinear-resize to (m0, m1, m2).
// out: fortran-ordered m0*m1*m2 float32. Returns 0 on success.
int mmnn_preprocess_patient(const char* image_path, const char* mask_path,
                            int zero_mode, int64_t m0, int64_t m1, int64_t m2,
                            float* out) {
  Volume img, mask;
  if (!LoadVolume(image_path, &img)) return 1;
  if (!LoadVolume(mask_path, &mask)) return 2;
  if (img.data.size() != mask.data.size()) return 3;
  MaskAndHandleZeros(&img, mask, zero_mode);
  Volume resized;
  ResizeTrilinear(img, &resized, m0, m1, m2);
  std::memcpy(out, resized.data.data(), sizeof(float) * m0 * m1 * m2);
  return 0;
}

// Parallel cohort preprocess: n patients, two modality path arrays, output
// (n, m0*m1*m2*2) float32 fortran-per-volume, channel-last interleave is done
// Python-side. `errors` gets per-patient status. num_threads<=0 -> hw count.
void mmnn_preprocess_cohort(const char** image_paths, const char** mask_paths,
                            int64_t n, int zero_mode, int64_t m0, int64_t m1,
                            int64_t m2, int num_threads, float* out,
                            int* errors) {
  int64_t vol_elems = m0 * m1 * m2;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int workers = num_threads > 0 ? num_threads : std::max(1, hw);
  workers = static_cast<int>(std::min<int64_t>(workers, n));
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n) break;
      errors[i] = mmnn_preprocess_patient(image_paths[i], mask_paths[i],
                                          zero_mode, m0, m1, m2,
                                          out + i * vol_elems);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
