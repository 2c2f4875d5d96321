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
  for (int i = 0; i < ndim; ++i)
    info->shape[i] = ReadField<int16_t>(blob.data(), 40 + 2 * (i + 1), swap);
  info->datatype = ReadField<int16_t>(blob.data(), 70, swap);
  float vox_offset = ReadField<float>(blob.data(), 108, swap);
  info->vox_offset = vox_offset > 0 ? static_cast<int64_t>(vox_offset)
                                    : kHeaderSize + 4;
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
    const uint8_t* seg = buf + pos + 2;
    int n = seg_len - 2;
    if (marker == 0xC3) {  // SOF3
      precision = seg[0];
      rows = (seg[1] << 8) | seg[2];
      cols = (seg[3] << 8) | seg[4];
      ncomp = seg[5];
      if (ncomp != 1) return 12;  // python fallback handles multi-component
    } else if (marker == 0xC4) {  // DHT
      int off = 0;
      while (off < n) {
        int th = seg[off] & 0x0F;
        int nsym = 0;
        for (int i = 0; i < 16; ++i) nsym += seg[off + 1 + i];
        if (th > 3 || nsym > 256) return 13;
        tables[th].Build(seg + off + 1, seg + off + 17, nsym);
        off += 17 + nsym;
      }
    } else if (marker == 0xDD) {  // DRI
      restart_interval = (seg[0] << 8) | seg[1];
    } else if (marker == 0xDA) {  // SOS
      int ns = seg[0];
      if (ns != 1) return 12;
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

}  // namespace

extern "C" {

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
