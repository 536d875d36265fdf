// Native runtime components: fast PLY decode + host LSD radix sort.
//
// The reference's IO and CPU-sort layers are native (Rust ply-rs parser,
// rayon parallel sort — src/io/ply.rs, src/sort/rayon.rs); these are their
// C++ equivalents for the TPU framework's host side, exposed through a C ABI
// consumed via ctypes (bevy_gaussian_splatting_tpu/native/__init__.py).
//
//  - ply3d_parse: single-pass binary-little-endian PLY vertex decode with the
//    reference's activation pipeline (sigmoid opacity ply.rs:40-42, mean+-4
//    clamped exp scale ply.rs:105-116, quaternion normalize ply.rs:118-124,
//    f_rest channel remap ply.rs:56-66 incl. the /16 reference quirk,
//    pad-to-32 ply.rs:127-129). Multi-threaded over row ranges.
//  - radix_sort_pairs_u32: 8-bit LSD radix sort of (key, value) pairs —
//    the host analogue of the GPU sort (src/sort/radix.wgsl), used by the
//    SortMode::STD/RAYON host paths for million-key clouds where numpy's
//    comparison argsort is the bottleneck.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

struct Ply3dHeaderInfo {
  int64_t vertex_count;
  int64_t row_stride;      // bytes per vertex row
  int64_t header_bytes;    // offset of binary payload
  int32_t ok;              // 1 on success
};

// property offsets within a row, -1 when absent
struct Ply3dOffsets {
  int32_t x, y, z, visibility;
  int32_t f_dc[3];
  int32_t f_rest[45];
  int32_t n_rest;
  int32_t scale[3];
  int32_t opacity;
  int32_t rot[4];
};

}  // extern "C"

namespace {

constexpr float kMaxSizeVariance = 4.0f;  // src/io/ply.rs:21
constexpr int kShCoeffCount = 48;
constexpr int kShPerChannel = 16;

int type_size(const std::string& t) {
  if (t == "float" || t == "float32" || t == "int" || t == "int32" ||
      t == "uint" || t == "uint32")
    return 4;
  if (t == "double" || t == "float64") return 8;
  if (t == "short" || t == "ushort" || t == "int16" || t == "uint16") return 2;
  if (t == "char" || t == "uchar" || t == "int8" || t == "uint8") return 1;
  return -1;
}

struct Prop {
  std::string name;
  int size;
  int offset;
};

bool parse_header(const uint8_t* data, size_t len, Ply3dHeaderInfo* info,
                  std::vector<Prop>* props) {
  const char* p = reinterpret_cast<const char*>(data);
  const char* end = p + len;
  auto read_line = [&]() -> std::string {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) return std::string();
    std::string line(p, nl - p);
    p = nl + 1;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    return line;
  };

  if (read_line() != "ply") return false;
  bool in_vertex = false;
  int64_t count = 0;
  int offset = 0;
  bool little = false;
  while (p < end) {
    std::string line = read_line();
    if (line.rfind("format ", 0) == 0) {
      little = line.find("binary_little_endian") != std::string::npos;
    } else if (line.rfind("element ", 0) == 0) {
      in_vertex = line.rfind("element vertex ", 0) == 0;
      if (in_vertex) count = atoll(line.c_str() + 15);
    } else if (line.rfind("property ", 0) == 0 && in_vertex) {
      // property <type> <name>
      size_t sp1 = line.find(' ', 9);
      if (sp1 == std::string::npos) return false;
      std::string type = line.substr(9, sp1 - 9);
      std::string name = line.substr(sp1 + 1);
      int sz = type_size(type);
      if (sz < 0) return false;  // list property etc.
      props->push_back({name, sz, offset});
      offset += sz;
    } else if (line == "end_header") {
      info->vertex_count = count;
      info->row_stride = offset;
      info->header_bytes = p - reinterpret_cast<const char*>(data);
      info->ok = little && count > 0 ? 1 : 0;
      return info->ok == 1;
    }
  }
  return false;
}

inline float load_f32(const uint8_t* row, int off) {
  float v;
  memcpy(&v, row + off, sizeof(float));
  return v;
}

}  // namespace

extern "C" {

// Returns vertex count (padded to the reference's 32 rule) or -1 on error.
// Caller allocates: pv [padded, 4], sh [padded, 48], rot [padded, 4],
// so [padded, 4] float32, zero-initialized.
int64_t ply3d_parse(const uint8_t* data, int64_t len, float* pv, float* sh,
                    float* rot, float* so, int32_t strict_reference,
                    int32_t n_threads) {
  Ply3dHeaderInfo info{};
  std::vector<Prop> props;
  if (!parse_header(data, static_cast<size_t>(len), &info, &props)) return -1;

  Ply3dOffsets off;
  memset(&off, -1, sizeof(off));
  off.n_rest = 0;
  for (const auto& pr : props) {
    if (pr.size != 4) continue;  // gaussian PLYs are all-float rows
    const std::string& n = pr.name;
    if (n == "x") off.x = pr.offset;
    else if (n == "y") off.y = pr.offset;
    else if (n == "z") off.z = pr.offset;
    else if (n == "visibility") off.visibility = pr.offset;
    else if (n == "opacity") off.opacity = pr.offset;
    else if (n.rfind("f_dc_", 0) == 0) {
      int i = atoi(n.c_str() + 5);
      if (i >= 0 && i < 3) off.f_dc[i] = pr.offset;
    } else if (n.rfind("f_rest_", 0) == 0) {
      int i = atoi(n.c_str() + 7);
      if (i >= 0 && i < 45) {
        off.f_rest[i] = pr.offset;
        if (i + 1 > off.n_rest) off.n_rest = i + 1;
      }
    } else if (n.rfind("scale_", 0) == 0) {
      int i = atoi(n.c_str() + 6);
      if (i >= 0 && i < 3) off.scale[i] = pr.offset;
    } else if (n.rfind("rot_", 0) == 0) {
      int i = atoi(n.c_str() + 4);
      if (i >= 0 && i < 4) off.rot[i] = pr.offset;
    }
  }
  // required set (ply.rs:81-85)
  if (off.x < 0 || off.y < 0 || off.z < 0 || off.f_dc[0] < 0 ||
      off.f_dc[1] < 0 || off.f_dc[2] < 0 || off.scale[0] < 0 ||
      off.scale[1] < 0 || off.opacity < 0 || off.rot[0] < 0 ||
      off.rot[1] < 0 || off.rot[2] < 0 || off.rot[3] < 0)
    return -2;

  const int64_t n = info.vertex_count;
  if (info.header_bytes + n * info.row_stride > len) return -3;
  const uint8_t* base = data + info.header_bytes;
  const int64_t stride = info.row_stride;

  // precompute f_rest -> interleaved slot map (ply.rs:56-66)
  int rest_slot[45];
  for (int i = 0; i < 45; ++i) {
    int channel = strict_reference ? i / kShPerChannel : i / (kShPerChannel - 1);
    int coefficient = (i % (kShPerChannel - 1)) + 1;
    int idx = coefficient * 3 + channel;
    rest_slot[i] = idx < kShCoeffCount ? idx : -1;
  }

  int nt = n_threads > 0 ? n_threads : 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      const uint8_t* row = base + r * stride;
      float* pvr = pv + r * 4;
      float* shr = sh + r * kShCoeffCount;
      float* rotr = rot + r * 4;
      float* sor = so + r * 4;

      pvr[0] = load_f32(row, off.x);
      pvr[1] = load_f32(row, off.y);
      pvr[2] = load_f32(row, off.z);
      pvr[3] = off.visibility >= 0 ? load_f32(row, off.visibility) : 1.0f;

      shr[0] = load_f32(row, off.f_dc[0]);
      shr[1] = load_f32(row, off.f_dc[1]);
      shr[2] = load_f32(row, off.f_dc[2]);
      for (int i = 0; i < off.n_rest; ++i) {
        if (off.f_rest[i] >= 0 && rest_slot[i] >= 0)
          shr[rest_slot[i]] = load_f32(row, off.f_rest[i]);
      }

      float q0 = load_f32(row, off.rot[0]), q1 = load_f32(row, off.rot[1]);
      float q2 = load_f32(row, off.rot[2]), q3 = load_f32(row, off.rot[3]);
      float norm = std::sqrt(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3);
      rotr[0] = q0 / norm;
      rotr[1] = q1 / norm;
      rotr[2] = q2 / norm;
      rotr[3] = q3 / norm;

      float s0 = load_f32(row, off.scale[0]);
      float s1 = load_f32(row, off.scale[1]);
      float s2 = off.scale[2] >= 0 ? load_f32(row, off.scale[2]) : s1;
      float mean = (s0 + s1 + s2) / 3.0f;
      auto act = [&](float v) {
        v = std::min(std::max(v, mean - kMaxSizeVariance), mean + kMaxSizeVariance);
        return std::exp(v);
      };
      sor[0] = act(s0);
      sor[1] = act(s1);
      sor[2] = act(s2);
      sor[3] = 1.0f / (1.0f + std::exp(-load_f32(row, off.opacity)));
    }
  };

  if (nt <= 1 || n < 4096) {
    worker(0, n);
  } else {
    std::vector<std::thread> threads;
    int64_t step = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
      int64_t lo = t * step, hi = std::min(n, lo + step);
      if (lo < hi) threads.emplace_back(worker, lo, hi);
    }
    for (auto& th : threads) th.join();
  }

  int64_t pad = 32 - (n % 32);  // reference always appends (ply.rs:127-128)
  return n + pad;
}

// Peek at vertex count + padded count without decoding.
int64_t ply3d_count(const uint8_t* data, int64_t len) {
  Ply3dHeaderInfo info{};
  std::vector<Prop> props;
  if (!parse_header(data, static_cast<size_t>(len), &info, &props)) return -1;
  return info.vertex_count + (32 - info.vertex_count % 32);
}

// 8-bit LSD radix sort of u32 keys with u32 payload, ascending, stable.
void radix_sort_pairs_u32(uint32_t* keys, uint32_t* vals, int64_t n) {
  std::vector<uint32_t> kbuf(n), vbuf(n);
  uint32_t* ks[2] = {keys, kbuf.data()};
  uint32_t* vs[2] = {vals, vbuf.data()};
  for (int pass = 0; pass < 4; ++pass) {
    int src = pass & 1, dst = src ^ 1;
    size_t hist[257] = {0};
    int shift = pass * 8;
    for (int64_t i = 0; i < n; ++i) ++hist[((ks[src][i] >> shift) & 0xFF) + 1];
    for (int d = 0; d < 256; ++d) hist[d + 1] += hist[d];
    for (int64_t i = 0; i < n; ++i) {
      size_t pos = hist[(ks[src][i] >> shift) & 0xFF]++;
      ks[dst][pos] = ks[src][i];
      vs[dst][pos] = vs[src][i];
    }
  }
  // 4 passes => result lands back in the caller's buffers (parity invariant,
  // tests/radix.rs:65-79)
}

}  // extern "C"
