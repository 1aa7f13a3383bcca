// Native ingest library for rtnr_tpu (C ABI, loaded via ctypes).
//
// Scope: the host-side IO paths that the reference implements natively —
// PLY parsing (reference vendors tinyply, src/RTRenderer/include/tinyply.h;
// this is an independent minimal reader for LiDAR vertex clouds) and the
// ``.oct`` binary voxel-grid cache (format defined by reference
// Octreegrid.h:53-114: int nx,ny,nz,numBlocks then per block
// {int key; size_t n; float pos[3n]; uchar col[3n]; float bbMin[3];
// float bbMax[3]}). Reading/writing the identical layout means caches
// produced by the reference renderer load here unchanged.
//
// API style: two-phase (count/probe, then fill caller-allocated numpy
// buffers) so no allocator crosses the ABI.
//
// Build: cpp/build.sh -> rtnr_tpu/data/_rtnr_ingest.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct PlyProp {
  std::string name;
  int size = 0;      // bytes
  char kind = 0;     // 'f' float, 'i' int, 'u' uint
};

struct PlyHeader {
  long n_vertex = -1;
  bool binary_le = false;
  bool ascii = false;
  long data_offset = 0;      // byte offset of first element payload
  std::vector<PlyProp> props;  // vertex properties, in order
  long pre_vertex_elems = 0;  // unsupported: elements before vertex
};

int prop_size(const std::string& t, char* kind) {
  if (t == "char" || t == "int8") { *kind = 'i'; return 1; }
  if (t == "uchar" || t == "uint8") { *kind = 'u'; return 1; }
  if (t == "short" || t == "int16") { *kind = 'i'; return 2; }
  if (t == "ushort" || t == "uint16") { *kind = 'u'; return 2; }
  if (t == "int" || t == "int32") { *kind = 'i'; return 4; }
  if (t == "uint" || t == "uint32") { *kind = 'u'; return 4; }
  if (t == "float" || t == "float32") { *kind = 'f'; return 4; }
  if (t == "double" || t == "float64") { *kind = 'f'; return 8; }
  *kind = 0;
  return 0;
}

bool parse_header(FILE* f, PlyHeader* h) {
  char line[4096];
  if (!fgets(line, sizeof line, f)) return false;
  if (strncmp(line, "ply", 3) != 0) return false;
  std::string cur_elem;
  bool saw_vertex = false;
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    while (!s.empty() && (s.back() == '\n' || s.back() == '\r')) s.pop_back();
    if (s.rfind("comment", 0) == 0 || s.rfind("obj_info", 0) == 0) continue;
    if (s.rfind("format", 0) == 0) {
      h->binary_le = s.find("binary_little_endian") != std::string::npos;
      h->ascii = s.find("ascii") != std::string::npos;
      if (!h->binary_le && !h->ascii) return false;  // big-endian unsupported
    } else if (s.rfind("element", 0) == 0) {
      char name[256];
      long cnt;
      if (sscanf(s.c_str(), "element %255s %ld", name, &cnt) != 2) return false;
      cur_elem = name;
      if (cur_elem == "vertex") {
        h->n_vertex = cnt;
        saw_vertex = true;
      } else if (!saw_vertex && cnt > 0) {
        h->pre_vertex_elems += 1;  // we only handle vertex-first files natively
      }
    } else if (s.rfind("property", 0) == 0 && cur_elem == "vertex") {
      char t1[64], t2[64], nm[256];
      if (sscanf(s.c_str(), "property %63s %63s %255s", t1, t2, nm) >= 2) {
        if (strcmp(t1, "list") == 0) return false;  // list on vertex: bail
        PlyProp p;
        p.name = (sscanf(s.c_str(), "property %63s %255s", t1, nm) == 2) ? nm : "";
        p.size = prop_size(t1, &p.kind);
        if (p.size == 0) return false;
        h->props.push_back(p);
      }
    } else if (s == "end_header") {
      h->data_offset = ftell(f);
      return h->n_vertex >= 0 && h->pre_vertex_elems == 0;
    }
  }
  return false;
}

}  // namespace

extern "C" {

// Probe a PLY file. Returns 0 on success (native fast path available),
// nonzero if the caller should fall back to the python reader.
// out[0]=n_vertices, out[1]=has_color (0/1).
int ply_probe(const char* path, long long* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  PlyHeader h;
  bool ok = parse_header(f, &h);
  fclose(f);
  if (!ok || !h.binary_le) return 2;  // ascii -> python fallback
  bool x = false, y = false, z = false, r = false, g = false, b = false;
  for (auto& p : h.props) {
    if (p.name == "x") x = true;
    if (p.name == "y") y = true;
    if (p.name == "z") z = true;
    if (p.name == "red") r = true;
    if (p.name == "green") g = true;
    if (p.name == "blue") b = true;
  }
  if (!(x && y && z)) return 3;
  out[0] = h.n_vertex;
  out[1] = (r && g && b) ? 1 : 0;
  return 0;
}

// Read a binary-LE PLY into caller buffers: pts (n*3 f32), cols (n*3 u8,
// may be null if probe said no color). Chunked stride walk; converts any
// scalar property types to f32/u8.
int ply_read(const char* path, float* pts, unsigned char* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  PlyHeader h;
  if (!parse_header(f, &h) || !h.binary_le) {
    fclose(f);
    return 2;
  }
  long stride = 0;
  long off_x = -1, off_y = -1, off_z = -1, off_r = -1, off_g = -1, off_b = -1;
  int sz_x = 0, sz_r = 0;
  char kx = 0, kr = 0;
  for (auto& p : h.props) {
    if (p.name == "x") { off_x = stride; sz_x = p.size; kx = p.kind; }
    if (p.name == "y") off_y = stride;
    if (p.name == "z") off_z = stride;
    if (p.name == "red") { off_r = stride; sz_r = p.size; kr = p.kind; }
    if (p.name == "green") off_g = stride;
    if (p.name == "blue") off_b = stride;
    stride += p.size;
  }
  if (off_x < 0 || off_y < 0 || off_z < 0) {
    fclose(f);
    return 3;
  }
  fseek(f, h.data_offset, SEEK_SET);
  const long CHUNK = 1 << 16;
  std::vector<unsigned char> buf(CHUNK * stride);
  long done = 0;
  auto read_f = [&](const unsigned char* row, long off, int size, char kind) -> float {
    if (kind == 'f' && size == 4) { float v; memcpy(&v, row + off, 4); return v; }
    if (kind == 'f' && size == 8) { double v; memcpy(&v, row + off, 8); return (float)v; }
    if (kind == 'i' && size == 4) { int32_t v; memcpy(&v, row + off, 4); return (float)v; }
    if (kind == 'i' && size == 2) { int16_t v; memcpy(&v, row + off, 2); return (float)v; }
    return 0.0f;
  };
  auto read_u8 = [&](const unsigned char* row, long off, int size, char kind) -> unsigned char {
    if (size == 1) return row[off];
    if (size == 2) { uint16_t v; memcpy(&v, row + off, 2); return (unsigned char)(v >> 8); }
    if (kind == 'f' && size == 4) { float v; memcpy(&v, row + off, 4); return (unsigned char)v; }
    return 0;
  };
  while (done < h.n_vertex) {
    long want = h.n_vertex - done < CHUNK ? h.n_vertex - done : CHUNK;
    long got = (long)fread(buf.data(), stride, want, f);
    if (got <= 0) break;
    for (long i = 0; i < got; ++i) {
      const unsigned char* row = buf.data() + i * stride;
      long j = done + i;
      pts[j * 3 + 0] = read_f(row, off_x, sz_x, kx);
      pts[j * 3 + 1] = read_f(row, off_y, sz_x, kx);
      pts[j * 3 + 2] = read_f(row, off_z, sz_x, kx);
      if (cols && off_r >= 0) {
        cols[j * 3 + 0] = read_u8(row, off_r, sz_r, kr);
        cols[j * 3 + 1] = read_u8(row, off_g, sz_r, kr);
        cols[j * 3 + 2] = read_u8(row, off_b, sz_r, kr);
      }
    }
    done += got;
  }
  fclose(f);
  return done == h.n_vertex ? 0 : 4;
}

// ---------------------------------------------------------------------------
// .oct cache (reference Octreegrid.h:53-114 binary layout, bit-compatible)
// ---------------------------------------------------------------------------

// Probe: out[0]=total points, out[1]=n_blocks, out[2..4]=nx,ny,nz.
int oct_probe(const char* path, long long* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int32_t nx, ny, nz, nblocks;
  if (fread(&nx, 4, 1, f) != 1 || fread(&ny, 4, 1, f) != 1 ||
      fread(&nz, 4, 1, f) != 1 || fread(&nblocks, 4, 1, f) != 1) {
    fclose(f);
    return 2;
  }
  long long total = 0;
  for (int i = 0; i < nblocks; ++i) {
    int32_t key;
    uint64_t n;
    if (fread(&key, 4, 1, f) != 1 || fread(&n, 8, 1, f) != 1) { fclose(f); return 3; }
    if (fseek(f, (long)(n * 3 * 4 + n * 3 + 24), SEEK_CUR) != 0) { fclose(f); return 4; }
    total += (long long)n;
  }
  fclose(f);
  out[0] = total;
  out[1] = nblocks;
  out[2] = nx;
  out[3] = ny;
  out[4] = nz;
  return 0;
}

// Fill pts (n*3 f32), cols (n*3 u8), keys (n i32) in block file order.
int oct_read(const char* path, float* pts, unsigned char* cols, int* keys) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  int32_t nx, ny, nz, nblocks;
  if (fread(&nx, 4, 1, f) != 1 || fread(&ny, 4, 1, f) != 1 ||
      fread(&nz, 4, 1, f) != 1 || fread(&nblocks, 4, 1, f) != 1) {
    fclose(f);
    return 2;
  }
  long long at = 0;
  for (int i = 0; i < nblocks; ++i) {
    int32_t key;
    uint64_t n;
    float bb[6];
    if (fread(&key, 4, 1, f) != 1 || fread(&n, 8, 1, f) != 1) { fclose(f); return 3; }
    if (fread(pts + at * 3, 4, n * 3, f) != n * 3) { fclose(f); return 4; }
    if (fread(cols + at * 3, 1, n * 3, f) != n * 3) { fclose(f); return 5; }
    if (fread(bb, 4, 6, f) != 6) { fclose(f); return 6; }
    for (uint64_t j = 0; j < n; ++j) keys[at + (long long)j] = key;
    at += (long long)n;
  }
  fclose(f);
  return 0;
}

// Write blocks (pre-grouped, block-sorted): keys/counts per block,
// flat block-ordered pts/cols, bb = n_blocks*6 floats (min,max).
int oct_write(const char* path, int nx, int ny, int nz, int n_blocks,
              const int* keys, const long long* counts, const float* pts,
              const unsigned char* cols, const float* bb) {
  FILE* f = fopen(path, "wb");
  if (!f) return 1;
  int32_t hdr[4] = {nx, ny, nz, n_blocks};
  fwrite(hdr, 4, 4, f);
  long long at = 0;
  for (int i = 0; i < n_blocks; ++i) {
    int32_t key = keys[i];
    uint64_t n = (uint64_t)counts[i];
    fwrite(&key, 4, 1, f);
    fwrite(&n, 8, 1, f);
    fwrite(pts + at * 3, 4, n * 3, f);
    fwrite(cols + at * 3, 1, n * 3, f);
    fwrite(bb + i * 6, 4, 6, f);
    at += (long long)n;
  }
  fclose(f);
  return 0;
}

}  // extern "C"
