// diffcodec_io: native IO / bitstream kernels for the DiffCodec-TPU runtime.
//
// The reference's only native code is its CUDA softsplat kernel (the TPU
// equivalent lives in Pallas/XLA); the *runtime* around the compute path —
// flow file IO and sparse-flow bitstream packing, which sit on the codec's
// per-frame hot path — is implemented here in C++ and exposed via ctypes
// (diffcodec_tpu/utils/native.py), with pure-Python fallbacks kept in
// diffcodec_tpu/codec/bits.py and utils/flo_io.py.
//
// Formats are bit-identical with the Python implementations:
//   .flo     Middlebury: f32 magic 202021.25, i32 w, i32 h, f32 data[h*w*2]
//   SFL1     sparse-flow bitstream (see codec/bits.py header comment)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <vector>

extern "C" {

static const float kFloMagic = 202021.25f;

// ---------------------------------------------------------------------------
// .flo IO
// ---------------------------------------------------------------------------

// Returns 0 on success. On success *out_h/*out_w are set; data must hold
// h*w*2 floats (call with data=nullptr first to query the size).
int flo_read(const char* path, float* data, int32_t* out_h, int32_t* out_w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  float magic = 0.f;
  int32_t w = 0, h = 0;
  if (fread(&magic, 4, 1, f) != 1 || magic != kFloMagic ||
      fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1 ||
      w <= 0 || h <= 0) {
    fclose(f);
    return -2;
  }
  *out_h = h;
  *out_w = w;
  if (data != nullptr) {
    size_t n = (size_t)h * w * 2;
    if (fread(data, 4, n, f) != n) {
      fclose(f);
      return -3;
    }
  }
  fclose(f);
  return 0;
}

int flo_write(const char* path, const float* data, int32_t h, int32_t w) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  int ok = fwrite(&kFloMagic, 4, 1, f) == 1 &&
           fwrite(&w, 4, 1, f) == 1 && fwrite(&h, 4, 1, f) == 1 &&
           fwrite(data, 4, (size_t)h * w * 2, f) == (size_t)h * w * 2;
  fclose(f);
  return ok ? 0 : -2;
}

// ---------------------------------------------------------------------------
// SFL1 sparse-flow bitstream (bit-identical with codec/bits.py)
// ---------------------------------------------------------------------------

// Encode sparse flow given point lists. Returns the number of bytes written
// (query with out=nullptr). Layout: 'SFL1' u16 H W count, f32 su sv,
// count*(u16 y,x), count*(i8 qu,qv).
int64_t sfl_encode(const float* flow_u, const float* flow_v,
                   const uint16_t* ys, const uint16_t* xs, int32_t count,
                   int32_t h, int32_t w, uint8_t* out) {
  int64_t total = 18 + (int64_t)count * 6;
  if (out == nullptr) return total;
  double max_u = 0.0, max_v = 0.0;
  for (int32_t i = 0; i < count; ++i) {
    double u = std::fabs((double)flow_u[i]);
    double v = std::fabs((double)flow_v[i]);
    if (u > max_u) max_u = u;
    if (v > max_v) max_v = v;
  }
  float su = (float)((max_u > 1e-12 ? max_u : 1e-12) / 127.0);
  float sv = (float)((max_v > 1e-12 ? max_v : 1e-12) / 127.0);
  uint8_t* p = out;
  memcpy(p, "SFL1", 4); p += 4;
  uint16_t h16 = (uint16_t)h, w16 = (uint16_t)w, c16 = (uint16_t)count;
  memcpy(p, &h16, 2); p += 2;
  memcpy(p, &w16, 2); p += 2;
  memcpy(p, &c16, 2); p += 2;
  memcpy(p, &su, 4); p += 4;
  memcpy(p, &sv, 4); p += 4;
  for (int32_t i = 0; i < count; ++i) {
    memcpy(p, &ys[i], 2); p += 2;
    memcpy(p, &xs[i], 2); p += 2;
  }
  for (int32_t i = 0; i < count; ++i) {
    double qu = std::nearbyint((double)flow_u[i] / su);
    double qv = std::nearbyint((double)flow_v[i] / sv);
    qu = qu > 127 ? 127 : (qu < -127 ? -127 : qu);
    qv = qv > 127 ? 127 : (qv < -127 ? -127 : qv);
    int8_t q[2] = {(int8_t)qu, (int8_t)qv};
    memcpy(p, q, 2); p += 2;
  }
  return total;
}

// Decode into a dense [h, w, 2] float field + [h, w] mask. Returns count,
// or negative on error. Query h/w via sfl_peek.
int sfl_peek(const uint8_t* data, int64_t len, int32_t* h, int32_t* w,
             int32_t* count) {
  if (len < 18 || memcmp(data, "SFL1", 4) != 0) return -1;
  uint16_t h16, w16, c16;
  memcpy(&h16, data + 4, 2);
  memcpy(&w16, data + 6, 2);
  memcpy(&c16, data + 8, 2);
  *h = h16; *w = w16; *count = c16;
  if (len < 18 + (int64_t)c16 * 6) return -2;
  return 0;
}

int32_t sfl_decode(const uint8_t* data, int64_t len, float* dense,
                   int32_t* mask) {
  int32_t h, w, count;
  if (sfl_peek(data, len, &h, &w, &count) != 0) return -1;
  float su, sv;
  memcpy(&su, data + 10, 4);
  memcpy(&sv, data + 14, 4);
  memset(dense, 0, (size_t)h * w * 2 * sizeof(float));
  memset(mask, 0, (size_t)h * w * sizeof(int32_t));
  const uint8_t* coords = data + 18;
  const int8_t* q = (const int8_t*)(data + 18 + (int64_t)count * 4);
  for (int32_t i = 0; i < count; ++i) {
    uint16_t y, x;
    memcpy(&y, coords + i * 4, 2);
    memcpy(&x, coords + i * 4 + 2, 2);
    if (y >= h || x >= w) continue;
    size_t off = ((size_t)y * w + x) * 2;
    dense[off] = (float)q[i * 2] * su;
    dense[off + 1] = (float)q[i * 2 + 1] * sv;
    mask[(size_t)y * w + x] = 1;
  }
  return count;
}

// ---------------------------------------------------------------------------
// Batched .flo loader with adaptive-average-pool downsample (the data
// loader's per-sample hot path, dataset.py:43-59 semantics).
// ---------------------------------------------------------------------------

int flo_read_pooled(const char* path, float* out, int32_t target_h,
                    int32_t target_w) {
  int32_t h = 0, w = 0;
  if (flo_read(path, nullptr, &h, &w) != 0) return -1;
  std::vector<float> buf((size_t)h * w * 2);
  if (flo_read(path, buf.data(), &h, &w) != 0) return -2;
  for (int32_t i = 0; i < target_h; ++i) {
    int32_t y0 = (int32_t)((int64_t)i * h / target_h);
    int32_t y1 = (int32_t)(((int64_t)(i + 1) * h + target_h - 1) / target_h);
    for (int32_t j = 0; j < target_w; ++j) {
      int32_t x0 = (int32_t)((int64_t)j * w / target_w);
      int32_t x1 = (int32_t)(((int64_t)(j + 1) * w + target_w - 1) /
                             target_w);
      double acc0 = 0.0, acc1 = 0.0;
      int64_t n = 0;
      for (int32_t y = y0; y < y1; ++y) {
        for (int32_t x = x0; x < x1; ++x) {
          size_t off = ((size_t)y * w + x) * 2;
          acc0 += buf[off];
          acc1 += buf[off + 1];
          ++n;
        }
      }
      size_t oo = ((size_t)i * target_w + j) * 2;
      out[oo] = (float)(acc0 / n);
      out[oo + 1] = (float)(acc1 / n);
    }
  }
  return 0;
}

}  // extern "C"
