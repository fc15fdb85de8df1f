// Native PLY mesh parser (ascii + binary_little_endian).
//
// The C++ counterpart of parallelraytracing_tpu/core/mesh.py and the
// replacement for the reference's tinyply dependency
// (/root/reference/src/core/mesh.cpp:23-184): reads vertex x/y/z with
// optional nx/ny/nz and u/v (or s/t), and triangulates face index lists of
// any count type (uint8/16/32, int8/16/32 — covering the reference's
// UINT32/UINT16/INT32 handling, mesh.cpp:129-146).  Exposed through a C
// ABI (handle + counts + fill) consumed via ctypes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Prop {
  std::string name;
  int type_size = 0;       // scalar size; 0 for list
  bool is_float = false;
  bool is_list = false;
  int count_size = 0;      // list count type size
  int value_size = 0;      // list value type size
  bool value_signed = false;
};

struct Element {
  std::string name;
  int64_t count = 0;
  std::vector<Prop> props;
};

struct Mesh {
  std::vector<float> verts;    // (V,3)
  std::vector<float> normals;  // (V,3) or empty
  std::vector<float> uvs;      // (V,2) or empty
  std::vector<uint32_t> idx;   // triangulated
};

int type_size(const std::string& t, bool* is_float, bool* is_signed) {
  if (t.empty()) { *is_float = false; *is_signed = false; return 0; }
  *is_float = (t == "float" || t == "float32" || t == "double" || t == "float64");
  *is_signed = (t[0] == 'i' || t == "char" || t == "short" || t == "int");
  if (t == "char" || t == "int8" || t == "uchar" || t == "uint8") return 1;
  if (t == "short" || t == "int16" || t == "ushort" || t == "uint16") return 2;
  if (t == "int" || t == "int32" || t == "uint" || t == "uint32"
      || t == "float" || t == "float32") return 4;
  if (t == "double" || t == "float64") return 8;
  return 0;
}

double read_scalar(const uint8_t* p, int size, bool is_float, bool is_signed) {
  if (is_float) {
    if (size == 4) { float f; std::memcpy(&f, p, 4); return f; }
    double d; std::memcpy(&d, p, 8); return d;
  }
  uint64_t v = 0;
  std::memcpy(&v, p, size);
  if (is_signed) {
    switch (size) {
      case 1: return static_cast<int8_t>(v);
      case 2: return static_cast<int16_t>(v);
      case 4: return static_cast<int32_t>(v);
    }
  }
  return static_cast<double>(v);
}

}  // namespace

extern "C" {

void* prt_ply_load(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(size);
  if (std::fread(data.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  // ---- header
  const char* end_tag = "end_header";
  std::string head;
  size_t body_off = 0;
  {
    std::string all(reinterpret_cast<char*>(data.data()),
                    std::min<size_t>(data.size(), 65536));
    size_t pos = all.find(end_tag);
    if (pos == std::string::npos) return nullptr;
    size_t nl = all.find('\n', pos);
    if (nl == std::string::npos) return nullptr;
    head = all.substr(0, nl);
    body_off = nl + 1;
  }

  bool ascii = false, binary_le = false;
  std::vector<Element> elements;
  {
    std::istringstream hs(head);
    std::string line;
    while (std::getline(hs, line)) {
      if (!line.empty() && line.back() == '\r') line.pop_back();
      std::istringstream ls(line);
      std::string tok;
      ls >> tok;
      if (tok == "format") {
        std::string fmt; ls >> fmt;
        ascii = (fmt == "ascii");
        binary_le = (fmt == "binary_little_endian");
      } else if (tok == "element") {
        Element e;
        ls >> e.name >> e.count;
        elements.push_back(e);
      } else if (tok == "property" && !elements.empty()) {
        std::string t; ls >> t;
        Prop p;
        if (t == "list") {
          std::string ct, vt;
          ls >> ct >> vt >> p.name;
          bool cf, cs, vf, vs;
          p.is_list = true;
          p.count_size = type_size(ct, &cf, &cs);
          p.value_size = type_size(vt, &vf, &vs);
          p.value_signed = vs;
        } else {
          bool s;
          p.type_size = type_size(t, &p.is_float, &s);
          ls >> p.name;
        }
        elements.back().props.push_back(p);
      }
    }
  }
  if (!ascii && !binary_le) return nullptr;

  // Reject absurd element counts up front: every row consumes at least one
  // byte (binary) or one token (ascii), so counts beyond the file size are
  // malformed and would otherwise drive huge reserve() calls.
  for (const auto& el : elements) {
    if (el.count < 0 || el.count > static_cast<int64_t>(data.size()))
      return nullptr;
  }

  auto* mesh = new Mesh();
  auto fail = [mesh]() -> void* { delete mesh; return nullptr; };
  std::vector<std::string> toks;
  size_t tok_pos = 0;
  if (ascii) {
    const char* s = reinterpret_cast<char*>(data.data()) + body_off;
    const char* e = reinterpret_cast<char*>(data.data()) + data.size();
    while (s < e) {
      while (s < e && std::isspace(static_cast<unsigned char>(*s))) ++s;
      const char* t0 = s;
      while (s < e && !std::isspace(static_cast<unsigned char>(*s))) ++s;
      if (s > t0) toks.emplace_back(t0, s - t0);
    }
  }

  size_t off = body_off;
  for (const auto& el : elements) {
    const bool is_vertex = el.name == "vertex";
    const bool is_face = el.name == "face";
    int xi = -1, yi = -1, zi = -1, nxi = -1, nyi = -1, nzi = -1,
        ui = -1, vi = -1;
    for (size_t p = 0; p < el.props.size(); ++p) {
      const auto& name = el.props[p].name;
      if (name == "x") xi = p; else if (name == "y") yi = p;
      else if (name == "z") zi = p;
      else if (name == "nx") nxi = p; else if (name == "ny") nyi = p;
      else if (name == "nz") nzi = p;
      else if (name == "u" || name == "s") ui = p;
      else if (name == "v" || name == "t") vi = p;
    }
    if (is_vertex) {
      mesh->verts.reserve(el.count * 3);
      if (nxi >= 0) mesh->normals.reserve(el.count * 3);
      if (ui >= 0) mesh->uvs.reserve(el.count * 2);
    }

    // A vertex element must carry all of x/y/z; emitting positions from a
    // partial set would index row[-1].
    if (is_vertex && (xi < 0 || yi < 0 || zi < 0)) return fail();

    // Every read below is bounds-checked: list counts and scalar sizes come
    // straight from the (untrusted) file, so a truncated or malicious .ply
    // must fail cleanly instead of over-reading the heap.
    const int64_t kMaxListLen = 1 << 20;
    auto bin_ok = [&](int64_t n) {
      return n >= 0 && off + static_cast<uint64_t>(n) <= data.size();
    };

    std::vector<double> row(el.props.size());
    std::vector<double> list_vals;
    for (int64_t i = 0; i < el.count; ++i) {
      list_vals.clear();
      for (size_t p = 0; p < el.props.size(); ++p) {
        const Prop& pr = el.props[p];
        if (!pr.is_list) {
          if (ascii) {
            if (tok_pos >= toks.size()) return fail();
            row[p] = std::strtod(toks[tok_pos++].c_str(), nullptr);
          } else {
            if (pr.type_size <= 0 || !bin_ok(pr.type_size)) return fail();
            row[p] = read_scalar(data.data() + off, pr.type_size,
                                 pr.is_float, false);
            off += pr.type_size;
          }
        } else {
          int64_t cnt;
          if (ascii) {
            if (tok_pos >= toks.size()) return fail();
            cnt = std::strtoll(toks[tok_pos++].c_str(), nullptr, 10);
            if (cnt < 0 || cnt > kMaxListLen ||
                tok_pos + static_cast<uint64_t>(cnt) > toks.size())
              return fail();
            for (int64_t k = 0; k < cnt; ++k)
              list_vals.push_back(
                  std::strtod(toks[tok_pos++].c_str(), nullptr));
          } else {
            if (pr.count_size <= 0 || pr.value_size <= 0 ||
                !bin_ok(pr.count_size))
              return fail();
            cnt = static_cast<int64_t>(read_scalar(
                data.data() + off, pr.count_size, false, false));
            off += pr.count_size;
            if (cnt > kMaxListLen || !bin_ok(cnt * pr.value_size))
              return fail();
            for (int64_t k = 0; k < cnt; ++k) {
              list_vals.push_back(read_scalar(data.data() + off,
                                              pr.value_size, false,
                                              pr.value_signed));
              off += pr.value_size;
            }
          }
        }
      }
      if (is_vertex && xi >= 0) {
        mesh->verts.push_back(static_cast<float>(row[xi]));
        mesh->verts.push_back(static_cast<float>(row[yi]));
        mesh->verts.push_back(static_cast<float>(row[zi]));
        if (nxi >= 0) {
          mesh->normals.push_back(static_cast<float>(row[nxi]));
          mesh->normals.push_back(static_cast<float>(row[nyi]));
          mesh->normals.push_back(static_cast<float>(row[nzi]));
        }
        if (ui >= 0 && vi >= 0) {
          mesh->uvs.push_back(static_cast<float>(row[ui]));
          mesh->uvs.push_back(static_cast<float>(row[vi]));
        }
      } else if (is_face && !list_vals.empty()) {
        // fan-triangulate
        for (size_t k = 1; k + 1 < list_vals.size(); ++k) {
          mesh->idx.push_back(static_cast<uint32_t>(list_vals[0]));
          mesh->idx.push_back(static_cast<uint32_t>(list_vals[k]));
          mesh->idx.push_back(static_cast<uint32_t>(list_vals[k + 1]));
        }
      }
    }
  }
  // Face indices must address real vertices (negative values wrapped to
  // huge uint32 above; either way they would over-read the vertex arrays).
  const uint64_t nvert = mesh->verts.size() / 3;
  for (uint32_t ix : mesh->idx) {
    if (ix >= nvert) return fail();
  }
  return mesh;
}

void prt_ply_counts(void* h, int64_t* nvert, int64_t* nidx,
                    int32_t* has_normals, int32_t* has_uv) {
  auto* m = static_cast<Mesh*>(h);
  *nvert = static_cast<int64_t>(m->verts.size() / 3);
  *nidx = static_cast<int64_t>(m->idx.size());
  *has_normals = m->normals.empty() ? 0 : 1;
  *has_uv = m->uvs.empty() ? 0 : 1;
}

void prt_ply_fill(void* h, float* verts, float* normals, float* uvs,
                  uint32_t* indices) {
  auto* m = static_cast<Mesh*>(h);
  std::memcpy(verts, m->verts.data(), m->verts.size() * sizeof(float));
  if (normals && !m->normals.empty())
    std::memcpy(normals, m->normals.data(),
                m->normals.size() * sizeof(float));
  if (uvs && !m->uvs.empty())
    std::memcpy(uvs, m->uvs.data(), m->uvs.size() * sizeof(float));
  std::memcpy(indices, m->idx.data(), m->idx.size() * sizeof(uint32_t));
}

void prt_ply_free(void* h) {
  delete static_cast<Mesh*>(h);
}

}  // extern "C"
