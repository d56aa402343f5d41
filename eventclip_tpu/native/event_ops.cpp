// Native host half of the event data path.
//
// The reference delegates its per-item host work to torch's C++ DataLoader
// machinery (reference datasets/event2img.py runs inside worker processes);
// the TPU rebuild keeps items in threads (data/loader.py PrefetchLoader), so
// the per-item transform must release the GIL and touch each event once.
// This translation unit fuses the whole per-item stream pipeline —
// center_events -> tflip -> shift(+drop) -> hflip (data/host_ops.py, the
// behavioral contracts of reference datasets/utils.py:4-57) — into a single
// pass, and packs selected windows straight to the int16 wire layout
// (host_ops.gather_event_windows) without numpy temporaries.
//
// Bit parity with the numpy path is a hard contract (tests/test_native.py):
// every elementwise op below is float32 in the same order numpy applies it,
// so outputs are bit-identical, and the RNG draws stay in Python
// (data/host_ops.py draw_augment) so generator streams cannot diverge.
//
// Build: scripts/build_native.py (plain g++ -O3 -shared; no deps).

#include <cstdint>

extern "C" {

// Fused center/augment over an [n, 4] float32 (x, y, t, p) stream.
//
//   do_center: t -= t.min(); x/y -= floor32((max+min+1-extent)/2)
//              (reference datasets/utils.py:38-57 arithmetic)
//   do_tflip:  reverse order, t' = t_last - t, p' = -p   (utils.py:26-35)
//   do_shift:  x += dx, y += dy, drop out-of-frame       (utils.py:4-15)
//   do_hflip:  x = W-1-x                                 (utils.py:18-23)
//
// Writes surviving events to out[m, 4] (may alias nothing; out != ev) and
// returns m. n == 0 returns 0 immediately.
int64_t ec_transform(const float* ev, int64_t n, int H, int W,
                     int do_center, int do_tflip, int do_shift,
                     int dx, int dy, int do_hflip, float* out) {
    if (n <= 0) return 0;

    float sx = 0.0f, sy = 0.0f, tmin = 0.0f;
    if (do_center) {
        float xmin = ev[0], xmax = ev[0];
        float ymin = ev[1], ymax = ev[1];
        tmin = ev[2];
        for (int64_t i = 1; i < n; ++i) {
            const float x = ev[4 * i], y = ev[4 * i + 1], t = ev[4 * i + 2];
            if (x < xmin) xmin = x;
            if (x > xmax) xmax = x;
            if (y < ymin) ymin = y;
            if (y > ymax) ymax = y;
            if (t < tmin) tmin = t;
        }
        // numpy: ((max + min + 1.) - extent) // 2. — all float32 under
        // NEP 50 (python scalars are weak); // = floor(a / b)
        auto floordiv2 = [](float a) {
            float q = a / 2.0f;
            float f = (float)(int64_t)q;
            if (f > q) f -= 1.0f;  // floor for negatives
            return f;
        };
        sx = floordiv2((xmax + xmin + 1.0f) - (float)W);
        sy = floordiv2((ymax + ymin + 1.0f) - (float)H);
    }

    // tflip base: last event's (centered) timestamp, float32 op order
    // matching numpy (center writes t-tmin, tflip reads it back)
    const float tlast = ev[4 * (n - 1) + 2] - tmin;

    const float fdx = (float)dx, fdy = (float)dy;
    const float w1 = (float)(W - 1);
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t j = do_tflip ? (n - 1 - i) : i;
        float x = ev[4 * j] - sx;
        float y = ev[4 * j + 1] - sy;
        float t = ev[4 * j + 2] - tmin;
        float p = ev[4 * j + 3];
        if (do_tflip) {
            t = tlast - t;
            p = -p;
        }
        if (do_shift) {
            x += fdx;
            y += fdy;
            if (!(x >= 0.0f && x < (float)W && y >= 0.0f && y < (float)H))
                continue;
        }
        if (do_hflip) x = w1 - x;
        out[4 * m] = x;
        out[4 * m + 1] = y;
        out[4 * m + 2] = t;
        out[4 * m + 3] = p;
        ++m;
    }
    return m;
}

// Gather window spans of an [n, 4] float32 stream into the packed int16
// wire layout [k, window, 3] (x, y, p; timestamps dropped — the on-device
// rasterizer never reads them, host_ops.gather_event_windows). `out` must
// be zero-initialised by the caller (short windows keep p == 0 padding).
// Casts are C truncation, matching numpy .astype(int16) on integral values.
void ec_pack_spans(const float* ev, const int64_t* spans, int64_t k,
                   int64_t window, int16_t* out) {
    for (int64_t s = 0; s < k; ++s) {
        const int64_t a = spans[2 * s], b = spans[2 * s + 1];
        int16_t* row = out + s * window * 3;
        for (int64_t i = a; i < b; ++i) {
            row[0] = (int16_t)ev[4 * i];
            row[1] = (int16_t)ev[4 * i + 1];
            row[2] = (int16_t)ev[4 * i + 3];
            row += 3;
        }
    }
}

// Same gather in the unpacked float32 [k, window, 4] layout (the
// keep-timestamps path used for visualization / packed=False).
void ec_pack_spans_f32(const float* ev, const int64_t* spans, int64_t k,
                       int64_t window, float* out) {
    for (int64_t s = 0; s < k; ++s) {
        const int64_t a = spans[2 * s], b = spans[2 * s + 1];
        float* row = out + s * window * 4;
        for (int64_t i = a; i < b; ++i) {
            row[0] = ev[4 * i];
            row[1] = ev[4 * i + 1];
            row[2] = ev[4 * i + 2];
            row[3] = ev[4 * i + 3];
            row += 4;
        }
    }
}

}  // extern "C"
