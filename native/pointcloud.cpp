// loner_tpu native runtime: point-cloud front-end ops.
//
// The reference gets its host-side point-cloud performance from Open3D's C++
// (uniform/voxel downsampling, cloud assembly for ICP: src/common/frame.py
// build_point_cloud, cfg tracker.icp.downsample) and does box filtering of
// dynamic objects in rosbag preparation (rosbag_utils/adjust_bags.py).
// This library is the TPU-framework equivalent: the scan front-end that runs
// per sweep at sensor rate on the host, feeding fixed-size arrays to the
// device. Exposed through ctypes (loner_tpu/runtime/native.py) with a numpy
// fallback.
//
// Build: make -C native   (produces libloner_native.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <unordered_map>
#include <vector>

extern "C" {

// Uniform-stride downsample of the first `keep_fraction` of a time-sorted
// scan into exactly n_out points (padding the tail with zeros + valid=0).
// points: (n, 3) float32, timestamps: (n,) float32. Outputs preallocated.
void extract_cloud(const float* points, const float* timestamps,
                   const uint8_t* valid, int64_t n, float keep_fraction,
                   int64_t n_out, float* out_points, uint8_t* out_valid) {
    // time window: [tmin, tmin + keep_fraction * (tmax - tmin)]
    float tmin = INFINITY, tmax = -INFINITY;
    for (int64_t i = 0; i < n; ++i) {
        if (valid[i]) {
            if (timestamps[i] < tmin) tmin = timestamps[i];
            if (timestamps[i] > tmax) tmax = timestamps[i];
        }
    }
    float tcut = tmin + keep_fraction * (tmax - tmin);

    std::vector<int64_t> idx;
    idx.reserve(n);
    for (int64_t i = 0; i < n; ++i)
        if (valid[i] && timestamps[i] <= tcut) idx.push_back(i);

    int64_t m = (int64_t)idx.size();
    if (m <= n_out) {
        for (int64_t j = 0; j < m; ++j) {
            std::memcpy(out_points + 3 * j, points + 3 * idx[j], 3 * sizeof(float));
            out_valid[j] = 1;
        }
        for (int64_t j = m; j < n_out; ++j) {
            out_points[3 * j] = out_points[3 * j + 1] = out_points[3 * j + 2] = 0.f;
            out_valid[j] = 0;
        }
    } else {
        // uniform stride over the kept set
        double step = (double)(m - 1) / (double)(n_out - 1);
        for (int64_t j = 0; j < n_out; ++j) {
            int64_t src = idx[(int64_t)std::llround(j * step)];
            std::memcpy(out_points + 3 * j, points + 3 * src, 3 * sizeof(float));
            out_valid[j] = 1;
        }
    }
}

// Voxel-grid downsample: average of points per voxel. Returns the number of
// output points written (<= max_out).
int64_t voxel_downsample(const float* points, int64_t n, float voxel_size,
                         float* out_points, int64_t max_out) {
    struct Acc { double x = 0, y = 0, z = 0; int64_t c = 0; };
    std::unordered_map<uint64_t, Acc> cells;
    cells.reserve((size_t)n);
    const double inv = 1.0 / voxel_size;
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = (int64_t)std::floor(points[3 * i] * inv);
        int64_t cy = (int64_t)std::floor(points[3 * i + 1] * inv);
        int64_t cz = (int64_t)std::floor(points[3 * i + 2] * inv);
        uint64_t key = ((uint64_t)(cx & 0x1FFFFF) << 42) |
                       ((uint64_t)(cy & 0x1FFFFF) << 21) |
                       (uint64_t)(cz & 0x1FFFFF);
        Acc& a = cells[key];
        a.x += points[3 * i];
        a.y += points[3 * i + 1];
        a.z += points[3 * i + 2];
        a.c += 1;
    }
    int64_t j = 0;
    for (auto& kv : cells) {
        if (j >= max_out) break;
        out_points[3 * j] = (float)(kv.second.x / kv.second.c);
        out_points[3 * j + 1] = (float)(kv.second.y / kv.second.c);
        out_points[3 * j + 2] = (float)(kv.second.z / kv.second.c);
        ++j;
    }
    return j;
}

// Axis-aligned box filter in the sensor frame: invalidates points inside
// the box (the harvester-removal filter, rosbag_utils/README:36-44 — box
// size (sx, sy, sz) centered at (cx, cy, cz)). In-place on valid mask.
void box_filter(const float* points, uint8_t* valid, int64_t n,
                float cx, float cy, float cz, float sx, float sy, float sz) {
    const float hx = sx * 0.5f, hy = sy * 0.5f, hz = sz * 0.5f;
    for (int64_t i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        float x = points[3 * i] - cx;
        float y = points[3 * i + 1] - cy;
        float z = points[3 * i + 2] - cz;
        if (std::fabs(x) <= hx && std::fabs(y) <= hy && std::fabs(z) <= hz)
            valid[i] = 0;
    }
}

// Range filter: invalidate points with range outside [min_range, max_range].
void range_filter(const float* distances, uint8_t* valid, int64_t n,
                  float min_range, float max_range) {
    for (int64_t i = 0; i < n; ++i)
        if (valid[i] && (distances[i] < min_range || distances[i] > max_range))
            valid[i] = 0;
}

// Spherical-projection occupancy image for sky segmentation
// (tracker sky extraction): marks (n_el, n_az) cells hit by valid returns.
void spherical_occupancy(const float* dirs, const uint8_t* valid, int64_t n,
                         int32_t n_az, int32_t n_el,
                         float el_lo, float el_hi, uint8_t* out_img) {
    std::memset(out_img, 0, (size_t)n_az * n_el);
    const float two_pi = 6.283185307179586f;
    for (int64_t i = 0; i < n; ++i) {
        if (!valid[i]) continue;
        float x = dirs[3 * i], y = dirs[3 * i + 1], z = dirs[3 * i + 2];
        float az = std::atan2(y, x);                       // [-pi, pi]
        float el = std::asin(std::fmax(-1.f, std::fmin(1.f, z)));
        if (el < el_lo || el > el_hi) continue;
        int32_t col = (int32_t)((az + 3.14159265f) / two_pi * n_az) % n_az;
        if (col < 0) col += n_az;
        int32_t row = (int32_t)((el_hi - el) / (el_hi - el_lo) * n_el);
        if (row < 0) row = 0;
        if (row >= n_el) row = n_el - 1;
        out_img[(int64_t)row * n_az + col] = 1;
    }
}

}  // extern "C"
