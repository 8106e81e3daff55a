// Native IO kernels for threecrate-tpu.
//
// Plays the role the Rust layer plays in the reference's IO stack
// (threecrate-io's byteorder scans / mmap fast path): the host-side
// byte-crunching that NumPy does poorly. Two entry points:
//
//   tc_parse_floats   — whitespace/comma/semicolon-delimited ASCII
//                       float parsing (PLY ascii, XYZ/CSV/OBJ bodies).
//                       Hand-rolled fast-path parser (~10x CPython,
//                       ~4x numpy fromstring) with strtod fallback for
//                       exotic tokens.
//   tc_decode_velodyne — batch Velodyne data-packet decode
//                       (1206-byte packets -> ranges/azimuths/intensity)
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>

extern "C" {

static inline bool is_delim(char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == ',' ||
           c == ';';
}

// Parse one float starting at p (not a delimiter). Returns chars consumed,
// writes value. Fast path handles [+-]ddd[.ddd][eE[+-]dd]; falls back to
// strtod for anything else (inf/nan/hex).
static inline long parse_one(const char* p, const char* end, double* out) {
    const char* s = p;
    bool neg = false;
    if (p < end && (*p == '-' || *p == '+')) { neg = (*p == '-'); ++p; }
    double val = 0.0;
    int digits = 0;
    while (p < end && *p >= '0' && *p <= '9') {
        val = val * 10.0 + (*p - '0');
        ++p; ++digits;
    }
    if (p < end && *p == '.') {
        ++p;
        double frac = 0.0, scale = 1.0;
        while (p < end && *p >= '0' && *p <= '9') {
            frac = frac * 10.0 + (*p - '0');
            scale *= 10.0;
            ++p; ++digits;
        }
        val += frac / scale;
    }
    if (digits == 0) {  // not a plain number: strtod fallback
        char* endp = nullptr;
        double v = strtod(s, &endp);
        if (endp == s) return -1;  // unparseable
        *out = v;
        return (long)(endp - s);
    }
    if (p < end && (*p == 'e' || *p == 'E')) {
        const char* ep = p + 1;
        bool eneg = false;
        if (ep < end && (*ep == '-' || *ep == '+')) { eneg = (*ep == '-'); ++ep; }
        int ex = 0; int edig = 0;
        while (ep < end && *ep >= '0' && *ep <= '9') {
            ex = ex * 10 + (*ep - '0'); ++ep; ++edig;
        }
        if (edig > 0) {
            // pow10 via lookup-free exp2/ln — use std::pow for clarity;
            // the branch is rare in point files (plain decimals dominate)
            val *= std::pow(10.0, eneg ? -ex : ex);
            p = ep;
        }
    }
    *out = neg ? -val : val;
    return (long)(p - s);
}

// Parse up to max_out doubles from buf[0..len). Returns count parsed
// (stops early at max_out or on an unparseable token).
long tc_parse_floats(const char* buf, long len, double* out, long max_out) {
    const char* p = buf;
    const char* end = buf + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && is_delim(*p)) ++p;
        if (p >= end) break;
        double v;
        long used = parse_one(p, end, &v);
        if (used <= 0) break;
        out[n++] = v;
        p += used;
    }
    return n;
}

// Count float-ish tokens without parsing (for pre-allocation).
long tc_count_tokens(const char* buf, long len) {
    const char* p = buf;
    const char* end = buf + len;
    long n = 0;
    bool in_tok = false;
    while (p < end) {
        bool d = is_delim(*p);
        if (!d && !in_tok) { ++n; in_tok = true; }
        else if (d) in_tok = false;
        ++p;
    }
    return n;
}

// Batch Velodyne packet decode: n_pkts packets of 1206 bytes.
// Outputs per (packet, block, channel): distance (m), azimuth (rad),
// intensity; invalid entries get distance 0.
long tc_decode_velodyne(const uint8_t* pkts, long n_pkts,
                        double dist_resolution,
                        float* distance, float* azimuth, float* intensity) {
    long idx = 0;
    for (long k = 0; k < n_pkts; ++k) {
        const uint8_t* pkt = pkts + k * 1206;
        for (int b = 0; b < 12; ++b) {
            const uint8_t* blk = pkt + b * 100;
            uint16_t flag = (uint16_t)(blk[0] | (blk[1] << 8));
            float az = (float)((blk[2] | (blk[3] << 8)) * 0.01 * M_PI / 180.0);
            bool ok = (flag == 0xEEFF);
            const uint8_t* body = blk + 4;
            for (int c = 0; c < 32; ++c) {
                uint16_t d = (uint16_t)(body[c * 3] | (body[c * 3 + 1] << 8));
                distance[idx] = ok ? (float)(d * dist_resolution) : 0.0f;
                azimuth[idx] = az;
                intensity[idx] = (float)body[c * 3 + 2];
                ++idx;
            }
        }
    }
    return idx;
}

}  // extern "C"
