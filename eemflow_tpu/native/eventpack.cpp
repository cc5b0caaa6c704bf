// Fused event decoder + packer — the native host-side input runtime.
//
// The reference feeds its GPU from torch DataLoader worker processes whose
// hot loop is pure Python/numpy event munging (npz columns → float64
// stack → scale → relative-time → voxelize; loader/loader_utils.py:26-42 +
// :352-397).  The TPU rebuild moves voxelization on device; what remains
// on the (single-core) host is decode+pad — this translation-unit fuses
// it into one pass with no intermediate arrays:
//
//   npz columns (t int64[ns], x int16, y int16, p int8 0/1)
//     → float32 [bucket, 4] rows (t_rel in µs-by-default, x, y, p ±1),
//       zero-padded, truncation counted.
//
// Numerics mirror the Python path exactly (events/io.py
// read_compressed_events + events/sequence.py EventSequence +
// events/voxel.py pad_events): t is scaled to seconds in double, then by
// ts_mult, then made relative to the first (sorted) timestamp, then cast
// to float32.  Returns 0 on success, 1 if the input is not time-sorted
// (caller falls back to the numpy path, which sorts).
//
// Built with plain g++ -O3 -shared; bound via ctypes (no pybind11 in this
// image).

#include <cstdint>
#include <cstring>

extern "C" {

// t int64 nanoseconds (HREM npz layout)
int decode_pack_i64(const long long* t_ns, const short* x, const short* y,
                    const signed char* p, long long n, long long bucket,
                    double ts_mult, float* out, long long* n_valid,
                    long long* n_dropped) {
    for (long long i = 1; i < n; ++i)
        if (t_ns[i] < t_ns[i - 1]) return 1;  // unsorted → caller falls back

    const long long m = n < bucket ? n : bucket;
    double t0 = 0.0;
    if (n > 0) {
        t0 = static_cast<double>(t_ns[0]) * 1e-9;  // ns → s (reader)
        t0 *= ts_mult;                             // s → caller units
    }
    for (long long i = 0; i < m; ++i) {
        double v = static_cast<double>(t_ns[i]) * 1e-9;
        v *= ts_mult;
        float* row = out + 4 * i;
        row[0] = static_cast<float>(v - t0);
        row[1] = static_cast<float>(x[i]);
        row[2] = static_cast<float>(y[i]);
        row[3] = static_cast<float>(2 * static_cast<int>(p[i]) - 1);
    }
    if (m < bucket)
        std::memset(out + 4 * m, 0, sizeof(float) * 4 * (bucket - m));
    *n_valid = m;
    *n_dropped = n - m;
    return 0;
}

// generic float64 columns (MVSEC per-frame h5 tables: ts in s, p already ±1
// or 0/1 — map_zero_polarity selects the 0/1 → ±1 mapping)
int decode_pack_f64(const double* ts, const double* x, const double* y,
                    const double* p, long long n, long long bucket,
                    double ts_mult, int map_zero_polarity, float* out,
                    long long* n_valid, long long* n_dropped) {
    for (long long i = 1; i < n; ++i)
        if (ts[i] < ts[i - 1]) return 1;

    const long long m = n < bucket ? n : bucket;
    const double t0 = (n > 0) ? ts[0] * ts_mult : 0.0;
    for (long long i = 0; i < m; ++i) {
        float* row = out + 4 * i;
        row[0] = static_cast<float>(ts[i] * ts_mult - t0);
        row[1] = static_cast<float>(x[i]);
        row[2] = static_cast<float>(y[i]);
        double pol = p[i];
        if (map_zero_polarity && pol == 0.0) pol = -1.0;
        row[3] = static_cast<float>(pol);
    }
    if (m < bucket)
        std::memset(out + 4 * m, 0, sizeof(float) * 4 * (bucket - m));
    *n_valid = m;
    *n_dropped = n - m;
    return 0;
}

}  // extern "C"
