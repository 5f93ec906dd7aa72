// mudg_native: C++ host-side kernels for the offline data pipeline.
//
// The reference delegates these to native deps (Open3D voxel downsampling,
// process_lidar.py:36-42; TFRecord framing via a python struct reader,
// tools/waymo_filereader.py:40-66). Here they are multi-threaded C++
// exposed over a C ABI for ctypes (no pybind11 in the image).
//
// Build: see build.sh (g++ -O3 -shared -fPIC -pthread).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <cstdio>
#include <unordered_map>
#include <vector>
#include <thread>
#include <atomic>
#include <mutex>

extern "C" {

// ---------------------------------------------------------------------------
// TFRecord framing: scan [len u64][len_crc u32][data][data_crc u32] records.
// Writes (offset, length) pairs; returns record count (CRCs are skipped like
// the reference reader, waymo_filereader.py:52-61).
// ---------------------------------------------------------------------------
int64_t tfrecord_index(const uint8_t* data, int64_t size,
                       int64_t* offsets, int64_t* lengths, int64_t max_records) {
    int64_t pos = 0, n = 0;
    while (pos + 12 <= size && n < max_records) {
        uint64_t len;
        std::memcpy(&len, data + pos, 8);
        int64_t payload = pos + 12;
        if (payload + (int64_t)len + 4 > size) break;
        offsets[n] = payload;
        lengths[n] = (int64_t)len;
        ++n;
        pos = payload + (int64_t)len + 4;
    }
    return n;
}

// ---------------------------------------------------------------------------
// Voxel-hash downsampling: centroid of points (and colors) per voxel.
// Single-pass hash accumulate, then compaction. Returns number of voxels.
// ---------------------------------------------------------------------------
struct Accum {
    double x = 0, y = 0, z = 0;
    double r = 0, g = 0, b = 0;
    int64_t count = 0;
};

int64_t voxel_downsample(const float* xyz, const float* rgb, int64_t n,
                         float voxel, float* out_xyz, float* out_rgb,
                         int64_t max_out) {
    std::unordered_map<uint64_t, Accum> cells;
    cells.reserve((size_t)(n / 4 + 16));
    const double inv = 1.0 / voxel;
    for (int64_t i = 0; i < n; ++i) {
        int64_t vx = (int64_t)std::floor(xyz[3 * i + 0] * inv);
        int64_t vy = (int64_t)std::floor(xyz[3 * i + 1] * inv);
        int64_t vz = (int64_t)std::floor(xyz[3 * i + 2] * inv);
        // 21 bits per axis, offset to positive
        uint64_t key = (((uint64_t)(vx + (1 << 20)) & 0x1FFFFF) << 42) |
                       (((uint64_t)(vy + (1 << 20)) & 0x1FFFFF) << 21) |
                       (((uint64_t)(vz + (1 << 20)) & 0x1FFFFF));
        Accum& a = cells[key];
        a.x += xyz[3 * i]; a.y += xyz[3 * i + 1]; a.z += xyz[3 * i + 2];
        if (rgb) {
            a.r += rgb[3 * i]; a.g += rgb[3 * i + 1]; a.b += rgb[3 * i + 2];
        }
        a.count += 1;
    }
    int64_t m = 0;
    for (auto& kv : cells) {
        if (m >= max_out) break;
        const Accum& a = kv.second;
        out_xyz[3 * m + 0] = (float)(a.x / a.count);
        out_xyz[3 * m + 1] = (float)(a.y / a.count);
        out_xyz[3 * m + 2] = (float)(a.z / a.count);
        if (rgb && out_rgb) {
            out_rgb[3 * m + 0] = (float)(a.r / a.count);
            out_rgb[3 * m + 1] = (float)(a.g / a.count);
            out_rgb[3 * m + 2] = (float)(a.b / a.count);
        }
        ++m;
    }
    return m;
}

// ---------------------------------------------------------------------------
// Batched rigid transform: out = xyz @ R^T + t (multi-threaded).
// ---------------------------------------------------------------------------
void transform_points(const float* xyz, int64_t n, const float* mat4x4,
                      float* out) {
    const float* m = mat4x4;
    int nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads < 1 || n < 100000) nthreads = 1;
    auto work = [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
            out[3 * i + 0] = m[0] * x + m[1] * y + m[2] * z + m[3];
            out[3 * i + 1] = m[4] * x + m[5] * y + m[6] * z + m[7];
            out[3 * i + 2] = m[8] * x + m[9] * y + m[10] * z + m[11];
        }
    };
    if (nthreads == 1) { work(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo < hi) ts.emplace_back(work, lo, hi);
    }
    for (auto& t : ts) t.join();
}

// ---------------------------------------------------------------------------
// Axis-aligned (in box frame) point-in-box test: world points against an
// oriented box given by its world-to-box 4x4 and half-extents.
// Writes 0/1 mask; used to segment dynamic-object points
// (process_lidar.py:121-138).
// ---------------------------------------------------------------------------
void points_in_box(const float* xyz, int64_t n, const float* w2b4x4,
                   float hx, float hy, float hz, uint8_t* mask) {
    const float* m = w2b4x4;
    for (int64_t i = 0; i < n; ++i) {
        float x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        float bx = m[0] * x + m[1] * y + m[2] * z + m[3];
        float by = m[4] * x + m[5] * y + m[6] * z + m[7];
        float bz = m[8] * x + m[9] * y + m[10] * z + m[11];
        mask[i] = (bx >= -hx && bx <= hx && by >= -hy && by <= hy &&
                   bz >= -hz && bz <= hz) ? 1 : 0;
    }
}

}  // extern "C"
