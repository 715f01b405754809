// Native data-loader kernels for the TPU framework's host IO path.
//
// The reference links liblzf for its compressed dumps (third_party/liblzf-3.6)
// and PCL for PCD parsing; here the host-side hot loops -- LZF decompression
// of binary_compressed PCDs and whitespace-float parsing of ascii PCD/PLY
// bodies -- are implemented natively and exposed via ctypes
// (utils/native.py).  Python falls back to pure-numpy implementations when
// the shared object is unavailable.
//
// Build: g++ -O3 -shared -fPIC pcd_native.cpp -o libpcd_native.so

#include <cstddef>
#include <cstdint>
#include <cstdlib>
#include <cstring>

extern "C" {

// LZF decompression (format per Marc Lehmann's liblzf: literal runs < 32,
// back-references otherwise).  Returns bytes written, or 0 on error.
size_t pcd_lzf_decompress(const uint8_t *in, size_t in_len,
                          uint8_t *out, size_t out_len) {
    size_t ip = 0, op = 0;
    while (ip < in_len) {
        unsigned ctrl = in[ip++];
        if (ctrl < 32) {  // literal run of ctrl+1 bytes
            size_t run = ctrl + 1;
            if (ip + run > in_len || op + run > out_len) return 0;
            std::memcpy(out + op, in + ip, run);
            ip += run;
            op += run;
        } else {  // back reference
            size_t len = ctrl >> 5;
            if (len == 7) {
                if (ip >= in_len) return 0;
                len += in[ip++];
            }
            len += 2;
            if (ip >= in_len) return 0;
            size_t ref = op - ((ctrl & 0x1f) << 8) - in[ip++] - 1;
            if (ref >= op || op + len > out_len) return 0;  // ref underflow wraps
            // overlapping copy: must run forward byte-by-byte
            for (size_t i = 0; i < len; i++) out[op + i] = out[ref + i];
            op += len;
        }
    }
    return op;
}

// Parse up to `max_out` whitespace-separated floats from text.
// Returns the number parsed.
size_t pcd_parse_floats(const char *text, size_t len, float *out,
                        size_t max_out) {
    size_t count = 0;
    const char *p = text;
    const char *end = text + len;
    while (p < end && count < max_out) {
        // skip whitespace
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' ||
                           *p == '\r')) p++;
        if (p >= end) break;
        char *next = nullptr;
        float v = strtof(p, &next);
        if (next == p) {  // unparsable token: skip it
            while (p < end && !(*p == ' ' || *p == '\n' || *p == '\t' ||
                                *p == '\r')) p++;
            continue;
        }
        out[count++] = v;
        p = next;
    }
    return count;
}

// LZF compression (Marc Lehmann's format, matching pcd_lzf_decompress):
// greedy hash-table matcher emitting literal runs and back-references.
// Returns compressed size, or 0 when the output does not fit (caller keeps
// the data uncompressed).  The reference links liblzf for its CGF dumps
// (third_party/liblzf-3.6, features/features_cgf.cpp write path).
size_t pcd_lzf_compress(const uint8_t *in, size_t in_len,
                        uint8_t *out, size_t out_len) {
    if (in_len == 0) return 0;
    const size_t HSIZE = 1 << 14;
    static thread_local const uint8_t *htab[1 << 14];
    for (size_t i = 0; i < HSIZE; i++) htab[i] = nullptr;

    size_t ip = 0, op = 0;
    size_t lit_start = 0;

    auto flush_literals = [&](size_t end) -> bool {
        size_t pos = lit_start;
        while (pos < end) {
            size_t run = end - pos;
            if (run > 32) run = 32;
            if (op + 1 + run > out_len) return false;
            out[op++] = (uint8_t)(run - 1);
            std::memcpy(out + op, in + pos, run);
            op += run;
            pos += run;
        }
        return true;
    };

    while (ip + 2 < in_len) {
        uint32_t h = ((in[ip] << 16) | (in[ip + 1] << 8) | in[ip + 2]);
        h = ((h * 2654435761u) >> 18) & (HSIZE - 1);
        const uint8_t *ref = htab[h];
        htab[h] = in + ip;
        size_t off = (ref && ref >= in) ? (size_t)(in + ip - ref) : 0;
        if (ref && off > 0 && off <= 8192 &&
            ref[0] == in[ip] && ref[1] == in[ip + 1] && ref[2] == in[ip + 2]) {
            // match: extend
            size_t maxlen = in_len - ip;
            if (maxlen > 264) maxlen = 264;
            size_t len = 3;
            while (len < maxlen && ref[len] == in[ip + len]) len++;
            if (!flush_literals(ip)) return 0;
            size_t enc = len - 2;
            size_t dist = off - 1;
            if (enc < 7) {
                if (op + 2 > out_len) return 0;
                out[op++] = (uint8_t)((enc << 5) | (dist >> 8));
                out[op++] = (uint8_t)(dist & 0xff);
            } else {
                if (op + 3 > out_len) return 0;
                out[op++] = (uint8_t)((7 << 5) | (dist >> 8));
                out[op++] = (uint8_t)(enc - 7);
                out[op++] = (uint8_t)(dist & 0xff);
            }
            ip += len;
            lit_start = ip;
        } else {
            ip++;
        }
    }
    if (!flush_literals(in_len)) return 0;
    return op;
}

}  // extern "C"
