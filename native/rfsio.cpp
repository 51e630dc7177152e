// librfsio: native IO runtime for monorfs_tpu.
//
// TPU-native counterpart of the reference's native data tooling
// (reference: video2oni/video2oni.cpp -- the C++ data-conversion pipeline,
// and the hot file parsing in mono-rfs-lib/Util/FileParser.cs). The Python
// layer calls through ctypes; everything here is plain C ABI.
//
//  * png_decode: PNG (8/16-bit gray / RGB / RGBA) -> dense row-major buffer,
//    using zlib inflate + vectorizable unfilter loops. Replaces the
//    pure-Python fallback decoder (frontend/dataset.py) for dataset
//    conversion at production speed.
//  * parse_doubles: whitespace-separated double parsing for the recording
//    text formats (trajectory.out / odometry.out / measurements.out).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <vector>
#include <zlib.h>

extern "C" {

// ---------------------------------------------------------------------------
// PNG decoding

struct PngInfo {
    uint32_t width;
    uint32_t height;
    uint32_t channels;
    uint32_t bitdepth;
};

static uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
           (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Parse header and IDAT; returns 0 on success.
static int png_parse(const uint8_t* data, size_t len, PngInfo* info,
                     std::vector<uint8_t>& idat) {
    static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (len < 8 || memcmp(data, magic, 8) != 0) return -1;
    size_t pos = 8;
    bool have_ihdr = false;
    while (pos + 12 <= len) {
        uint32_t chunk_len = be32(data + pos);
        const uint8_t* type = data + pos + 4;
        const uint8_t* chunk = data + pos + 8;
        if (pos + 12 + chunk_len > len) return -2;
        if (memcmp(type, "IHDR", 4) == 0) {
            info->width = be32(chunk);
            info->height = be32(chunk + 4);
            info->bitdepth = chunk[8];
            uint8_t color = chunk[9];
            if (chunk[12] != 0) return -3;  // interlace unsupported
            switch (color) {
                case 0: info->channels = 1; break;
                case 2: info->channels = 3; break;
                case 4: info->channels = 2; break;
                case 6: info->channels = 4; break;
                default: return -4;  // palette unsupported
            }
            have_ihdr = true;
        } else if (memcmp(type, "IDAT", 4) == 0) {
            idat.insert(idat.end(), chunk, chunk + chunk_len);
        } else if (memcmp(type, "IEND", 4) == 0) {
            break;
        }
        pos += 12 + chunk_len;
    }
    return have_ihdr ? 0 : -5;
}

int png_info(const uint8_t* data, size_t len, uint32_t* width,
             uint32_t* height, uint32_t* channels, uint32_t* bitdepth) {
    PngInfo info;
    std::vector<uint8_t> idat;
    int rc = png_parse(data, len, &info, idat);
    if (rc != 0) return rc;
    *width = info.width;
    *height = info.height;
    *channels = info.channels;
    *bitdepth = info.bitdepth;
    return 0;
}

// Decode into out (row-major, uint16 per sample regardless of bit depth).
int png_decode(const uint8_t* data, size_t len, uint16_t* out) {
    PngInfo info;
    std::vector<uint8_t> idat;
    int rc = png_parse(data, len, &info, idat);
    if (rc != 0) return rc;

    const uint32_t bpp = info.channels * info.bitdepth / 8;  // bytes/pixel
    const size_t stride = size_t(info.width) * bpp;
    std::vector<uint8_t> raw(info.height * (stride + 1));
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
        return -6;

    std::vector<uint8_t> prev(stride, 0);
    std::vector<uint8_t> cur(stride);
    size_t pos = 0;
    for (uint32_t row = 0; row < info.height; ++row) {
        uint8_t ft = raw[pos++];
        const uint8_t* line = raw.data() + pos;
        pos += stride;
        switch (ft) {
            case 0:
                memcpy(cur.data(), line, stride);
                break;
            case 1:  // sub
                for (size_t i = 0; i < stride; ++i)
                    cur[i] = line[i] + (i >= bpp ? cur[i - bpp] : 0);
                break;
            case 2:  // up
                for (size_t i = 0; i < stride; ++i)
                    cur[i] = line[i] + prev[i];
                break;
            case 3:  // average
                for (size_t i = 0; i < stride; ++i) {
                    int left = i >= bpp ? cur[i - bpp] : 0;
                    cur[i] = line[i] + uint8_t((left + prev[i]) >> 1);
                }
                break;
            case 4: {  // paeth
                for (size_t i = 0; i < stride; ++i) {
                    int a = i >= bpp ? cur[i - bpp] : 0;
                    int b = prev[i];
                    int c = i >= bpp ? prev[i - bpp] : 0;
                    int p = a + b - c;
                    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
                    int pred = (pa <= pb && pa <= pc) ? a : (pb <= pc ? b : c);
                    cur[i] = line[i] + uint8_t(pred);
                }
                break;
            }
            default:
                return -7;
        }
        // emit samples as uint16
        const size_t samples = size_t(info.width) * info.channels;
        uint16_t* orow = out + size_t(row) * samples;
        if (info.bitdepth == 16) {
            for (size_t s = 0; s < samples; ++s)
                orow[s] = (uint16_t(cur[2 * s]) << 8) | cur[2 * s + 1];
        } else {
            for (size_t s = 0; s < samples; ++s) orow[s] = cur[s];
        }
        std::swap(prev, cur);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// fast text parsing for recording formats

// Parse up to max_out whitespace-separated doubles from text[0:len].
// Returns the number parsed.
size_t parse_doubles(const char* text, size_t len, double* out,
                     size_t max_out) {
    size_t n = 0;
    const char* p = text;
    const char* end = text + len;
    while (p < end && n < max_out) {
        char* next = nullptr;
        double v = strtod(p, &next);
        if (next == p) {
            ++p;
            continue;
        }
        out[n++] = v;
        p = next;
    }
    return n;
}

}  // extern "C"
