// Fast COLMAP points3D.bin parsing.
//
// The Python struct-level parser (reference: scene/colmap_loader.py:125-155;
// gsjax/data/colmap.py) walks millions of variable-length records one
// struct.unpack at a time — minutes on big scenes. This native reader fills
// caller-allocated arrays in one pass.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

template <typename T>
inline T read_le(const uint8_t*& p) {
  T v;
  std::memcpy(&v, p, sizeof(T));
  p += sizeof(T);
  return v;
}

}  // namespace

// Returns the number of points in the file header, or -1 on I/O error.
extern "C" int64_t gsjax_points3d_count(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint64_t num = 0;
  size_t got = std::fread(&num, sizeof(num), 1, f);
  std::fclose(f);
  return got == 1 ? (int64_t)num : -1;
}

// Fills xyz [num,3] f64, rgb [num,3] u8, err [num] f64. Returns number of
// records parsed (== num on success), or -1 on I/O / truncation error.
extern "C" int64_t gsjax_read_points3d(const char* path, int64_t num,
                                       double* xyz, uint8_t* rgb,
                                       double* err) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)size);
  if (std::fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  const uint8_t* p = buf.data();
  const uint8_t* end = p + size;
  if (p + 8 > end) return -1;
  uint64_t file_num = read_le<uint64_t>(p);
  if ((int64_t)file_num != num) return -1;

  for (int64_t i = 0; i < num; ++i) {
    // id(u64) x y z (f64) r g b (u8) error(f64) track_len(u64) track(2*u32 each)
    if (p + 8 + 24 + 3 + 8 + 8 > end) return -1;
    p += 8;  // point id
    xyz[3 * i] = read_le<double>(p);
    xyz[3 * i + 1] = read_le<double>(p);
    xyz[3 * i + 2] = read_le<double>(p);
    rgb[3 * i] = *p++;
    rgb[3 * i + 1] = *p++;
    rgb[3 * i + 2] = *p++;
    err[i] = read_le<double>(p);
    uint64_t track_len = read_le<uint64_t>(p);
    if (p + 8 * track_len > end) return -1;
    p += 8 * track_len;
  }
  return num;
}
