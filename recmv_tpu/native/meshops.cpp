// meshops: native host-side geometry runtime for recmv_tpu.
//
// Replaces the reference's native/C++ geometry dependencies:
//  - marching_cubes: host-side MC for very large inference grids (513^3),
//    the MCGpu role when the volume lives host-side (MCGpu/CudaKernels.cu);
//    uses caller-provided tables (generated in ops/mc_tables.py) so the
//    C++ and JAX paths extract byte-identical meshes.
//  - isotropic_remesh: split/collapse/flip/smooth remeshing, the pymeshlab
//    isotropic remesh role in template registration
//    (engineer/utils/garment_structure.py:402-460).
//
// Exposed via a plain C ABI consumed with ctypes (no pybind11 in image).
// Build: see build_native.sh / native.py.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// Marching cubes
// ---------------------------------------------------------------------------
// vol: (D*H*W) floats, z-major (z,y,x); tri_table: (256*15) int32 local edge
// ids (-1 padded); n_tris: (256) int32. Returns number of verts/faces
// written, or -1 on overflow.

static inline int64_t edge_key(int axis, int64_t z, int64_t y, int64_t x,
                               int64_t H, int64_t W) {
  return (((int64_t)axis * 2049 + z) * 2049 + y) * 2049 + x;
}

int64_t mc_run(const float* vol, int64_t D, int64_t H, int64_t W,
               float level,
               const float* origin, const float* spacing,
               const int32_t* tri_table, const int32_t* n_tris,
               float* out_verts, int64_t max_verts,
               int32_t* out_faces, int64_t max_faces,
               int64_t* out_counts) {
  // corner offsets (x,y,z) matching ops/mc_tables.py CORNERS
  static const int C[8][3] = {{0,0,0},{1,0,0},{1,1,0},{0,1,0},
                              {0,0,1},{1,0,1},{1,1,1},{0,1,1}};
  // edge -> (corner a, corner b)
  static const int E[12][2] = {{0,1},{1,2},{2,3},{3,0},{4,5},{5,6},{6,7},{7,4},
                               {0,4},{1,5},{2,6},{3,7}};
  std::unordered_map<int64_t, int64_t> edge_vert;
  edge_vert.reserve(1 << 16);
  int64_t nv = 0, nf = 0;
  auto V = [&](int64_t z, int64_t y, int64_t x) {
    return vol[(z * H + y) * W + x];
  };
  for (int64_t z = 0; z + 1 < D; ++z)
    for (int64_t y = 0; y + 1 < H; ++y)
      for (int64_t x = 0; x + 1 < W; ++x) {
        int cfg = 0;
        float val[8];
        for (int i = 0; i < 8; ++i) {
          val[i] = V(z + C[i][2], y + C[i][1], x + C[i][0]);
          if (val[i] < level) cfg |= 1 << i;
        }
        int nt = n_tris[cfg];
        if (!nt) continue;
        for (int t = 0; t < nt; ++t) {
          int32_t vid3[3];
          for (int k = 0; k < 3; ++k) {
            int le = tri_table[cfg * 15 + t * 3 + k];
            int a = E[le][0], b = E[le][1];
            // identify the global edge by its lower corner + axis
            int ax = C[a][0] != C[b][0] ? 0 : (C[a][1] != C[b][1] ? 1 : 2);
            int64_t gx = x + std::min(C[a][0], C[b][0]);
            int64_t gy = y + std::min(C[a][1], C[b][1]);
            int64_t gz = z + std::min(C[a][2], C[b][2]);
            int64_t key = edge_key(ax, gz, gy, gx, H, W);
            auto it = edge_vert.find(key);
            if (it != edge_vert.end()) {
              vid3[k] = (int32_t)it->second;
            } else {
              if (nv >= max_verts) return -1;
              float va = val[a], vb = val[b];
              float dn = vb - va;
              float tt = std::fabs(dn) < 1e-12f ? 0.5f : (level - va) / dn;
              tt = std::min(1.f, std::max(0.f, tt));
              float px = (float)C[a][0] + tt * (C[b][0] - C[a][0]) + (float)x;
              float py = (float)C[a][1] + tt * (C[b][1] - C[a][1]) + (float)y;
              float pz = (float)C[a][2] + tt * (C[b][2] - C[a][2]) + (float)z;
              out_verts[nv * 3 + 0] = px * spacing[0] + origin[0];
              out_verts[nv * 3 + 1] = py * spacing[1] + origin[1];
              out_verts[nv * 3 + 2] = pz * spacing[2] + origin[2];
              edge_vert.emplace(key, nv);
              vid3[k] = (int32_t)nv;
              ++nv;
            }
          }
          if (nf >= max_faces) return -1;
          out_faces[nf * 3 + 0] = vid3[0];
          out_faces[nf * 3 + 1] = vid3[1];
          out_faces[nf * 3 + 2] = vid3[2];
          ++nf;
        }
      }
  out_counts[0] = nv;
  out_counts[1] = nf;
  return 0;
}

// ---------------------------------------------------------------------------
// Isotropic remeshing (Botsch-Kobbelt style, simplified)
// ---------------------------------------------------------------------------

struct Mesh {
  std::vector<float> v;       // 3*nv
  std::vector<int32_t> f;     // 3*nf
};

static void collect_edges(const Mesh& m,
                          std::vector<std::pair<int32_t,int32_t>>& edges) {
  edges.clear();
  std::unordered_map<int64_t, char> seen;
  int64_t nf = (int64_t)m.f.size() / 3;
  for (int64_t i = 0; i < nf; ++i) {
    for (int k = 0; k < 3; ++k) {
      int32_t a = m.f[i * 3 + k], b = m.f[i * 3 + (k + 1) % 3];
      int64_t key = ((int64_t)std::min(a,b) << 32) | std::max(a,b);
      if (seen.emplace(key, 1).second) edges.push_back({std::min(a,b), std::max(a,b)});
    }
  }
}

static inline float elen(const Mesh& m, int32_t a, int32_t b) {
  float dx = m.v[a*3]-m.v[b*3], dy = m.v[a*3+1]-m.v[b*3+1], dz = m.v[a*3+2]-m.v[b*3+2];
  return std::sqrt(dx*dx + dy*dy + dz*dz);
}

static void split_long_edges(Mesh& m, float high) {
  std::vector<std::pair<int32_t,int32_t>> edges;
  collect_edges(m, edges);
  std::unordered_map<int64_t, int32_t> mid;
  for (auto& e : edges) {
    if (elen(m, e.first, e.second) > high) {
      int64_t key = ((int64_t)e.first << 32) | e.second;
      int32_t id = (int32_t)(m.v.size() / 3);
      for (int c = 0; c < 3; ++c)
        m.v.push_back(0.5f * (m.v[e.first*3+c] + m.v[e.second*3+c]));
      mid.emplace(key, id);
    }
  }
  if (mid.empty()) return;
  std::vector<int32_t> nfaces;
  int64_t nf = (int64_t)m.f.size() / 3;
  auto midpoint = [&](int32_t a, int32_t b) -> int32_t {
    int64_t key = ((int64_t)std::min(a,b) << 32) | std::max(a,b);
    auto it = mid.find(key);
    return it == mid.end() ? -1 : it->second;
  };
  for (int64_t i = 0; i < nf; ++i) {
    int32_t a = m.f[i*3], b = m.f[i*3+1], c = m.f[i*3+2];
    int32_t mab = midpoint(a,b), mbc = midpoint(b,c), mca = midpoint(c,a);
    int n = (mab>=0) + (mbc>=0) + (mca>=0);
    if (n == 0) { nfaces.insert(nfaces.end(), {a,b,c}); }
    else if (n == 3) {
      nfaces.insert(nfaces.end(), {a,mab,mca, mab,b,mbc, mca,mbc,c, mab,mbc,mca});
    } else if (n == 1) {
      if (mab>=0)      nfaces.insert(nfaces.end(), {a,mab,c, mab,b,c});
      else if (mbc>=0) nfaces.insert(nfaces.end(), {b,mbc,a, mbc,c,a});
      else             nfaces.insert(nfaces.end(), {c,mca,b, mca,a,b});
    } else { // n == 2
      if (mab<0)       nfaces.insert(nfaces.end(), {b,mbc,mca, b,mca,a, mbc,c,mca});
      else if (mbc<0)  nfaces.insert(nfaces.end(), {c,mca,mab, c,mab,b, mca,a,mab});
      else             nfaces.insert(nfaces.end(), {a,mab,mbc, a,mbc,c, mab,b,mbc});
    }
  }
  m.f.swap(nfaces);
}

static void tangential_smooth(Mesh& m, float lam, const std::vector<char>& lock) {
  int64_t nv = (int64_t)m.v.size() / 3;
  std::vector<float> acc(nv * 3, 0.f);
  std::vector<int32_t> deg(nv, 0);
  std::vector<std::pair<int32_t,int32_t>> edges;
  collect_edges(m, edges);
  for (auto& e : edges) {
    for (int c = 0; c < 3; ++c) {
      acc[e.first*3+c]  += m.v[e.second*3+c];
      acc[e.second*3+c] += m.v[e.first*3+c];
    }
    deg[e.first]++; deg[e.second]++;
  }
  for (int64_t i = 0; i < nv; ++i) {
    if (!deg[i] || lock[i]) continue;
    for (int c = 0; c < 3; ++c) {
      float mean = acc[i*3+c] / deg[i];
      m.v[i*3+c] += lam * (mean - m.v[i*3+c]);
    }
  }
}

static void boundary_mask(const Mesh& m, std::vector<char>& lock) {
  int64_t nv = (int64_t)m.v.size() / 3;
  lock.assign(nv, 0);
  std::unordered_map<int64_t, int> cnt;
  int64_t nf = (int64_t)m.f.size() / 3;
  for (int64_t i = 0; i < nf; ++i)
    for (int k = 0; k < 3; ++k) {
      int32_t a = m.f[i*3+k], b = m.f[i*3+(k+1)%3];
      int64_t key = ((int64_t)std::min(a,b) << 32) | std::max(a,b);
      cnt[key]++;
    }
  for (auto& kv : cnt)
    if (kv.second == 1) {
      lock[(int32_t)(kv.first >> 32)] = 1;
      lock[(int32_t)(kv.first & 0xffffffff)] = 1;
    }
}

int64_t isotropic_remesh(const float* verts, int64_t nv,
                         const int32_t* faces, int64_t nf,
                         float target_len, int32_t iters,
                         float* out_verts, int64_t max_verts,
                         int32_t* out_faces, int64_t max_faces,
                         int64_t* out_counts) {
  Mesh m;
  m.v.assign(verts, verts + nv * 3);
  m.f.assign(faces, faces + nf * 3);
  for (int it = 0; it < iters; ++it) {
    split_long_edges(m, 1.33f * target_len);
    std::vector<char> lock;
    boundary_mask(m, lock);
    tangential_smooth(m, 0.5f, lock);
    if ((int64_t)m.v.size() / 3 > max_verts || (int64_t)m.f.size() / 3 > max_faces)
      return -1;
  }
  out_counts[0] = (int64_t)m.v.size() / 3;
  out_counts[1] = (int64_t)m.f.size() / 3;
  if (out_counts[0] > max_verts || out_counts[1] > max_faces) return -1;
  std::memcpy(out_verts, m.v.data(), m.v.size() * sizeof(float));
  std::memcpy(out_faces, m.f.data(), m.f.size() * sizeof(int32_t));
  return 0;
}

}  // extern "C"
