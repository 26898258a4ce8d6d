// Native host planner: the serial entropy hot loop in C++ (SURVEY.md §7 M4).
//
// Python's per-block planner costs ~0.45 s per 640×480 frame — far below the
// device core's throughput, so the production pipeline uses this translation
// unit via ctypes (`hvqm4_tpu/native/__init__.py`). It implements exactly the
// same frame→plan resolution as `hvqm4_tpu/planner.py` (docs/FORMAT.md §3–§7)
// and is differential-tested against it (tests/test_native.py).
//
// Thread-safety: no global mutable state; every call works on caller-provided
// buffers, so Python can fan out streams across threads with the GIL released
// (ctypes releases it around foreign calls).
//
// Error handling: longjmp-free — deep reads return via C++ exceptions caught
// at the boundary; the entry point returns 0 on success or writes a message
// into err_buf and returns nonzero (the per-stream poisoning contract of
// SURVEY.md §5).

#include <array>
#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace {

struct Error : std::runtime_error {
    using std::runtime_error::runtime_error;
};

// ---------------- bit reader (MSB-first) ----------------

struct BitReader {
    const uint8_t* d = nullptr;
    size_t nbits = 0, pos = 0;

    void init(const uint8_t* data, size_t n) {
        d = data;
        nbits = 8 * n;
        pos = 0;
    }
    inline unsigned bit() {
        if (pos >= nbits) throw Error("bit stream exhausted");
        unsigned v = (d[pos >> 3] >> (7 - (pos & 7))) & 1u;
        pos++;
        return v;
    }
    inline uint32_t bits(int n) {
        uint32_t v = 0;
        for (int i = 0; i < n; i++) v = (v << 1) | bit();
        return v;
    }
    inline int32_t sbits(int n) {
        uint32_t v = bits(n);
        if (v >= (1u << (n - 1))) return (int32_t)v - (1 << n);
        return (int32_t)v;
    }
};

// ---------------- Huffman ----------------

struct Huff {
    // nodes: child pair; leaves encoded as -(sym+1)
    std::vector<std::array<int, 2>> nodes;
    int root = 0;
    bool present = false;
    BitReader br;

    int read_tree(int depth) {
        if (depth > 64) throw Error("huffman tree too deep");
        if (br.bit()) {
            int idx = (int)nodes.size();
            nodes.push_back({0, 0});
            int c0 = read_tree(depth + 1);
            int c1 = read_tree(depth + 1);
            nodes[idx] = {c0, c1};
            return idx;
        }
        return -((int)br.bits(8) + 1);
    }
    void init(const uint8_t* d, size_t n) {
        nodes.clear();
        present = n > 0;
        br.init(d, n);
        root = present ? read_tree(0) : 0;
    }
    inline int symbol() {
        if (!present) throw Error("symbol from empty huffman stream");
        int node = root;
        while (node >= 0) node = nodes[node][br.bit()];
        return -node - 1;
    }
    inline int32_t delta() {
        int s = symbol();
        if (s == 255) return br.sbits(16);
        return s - 127;
    }
};

// ---------------- output plan layout (matches plans.PlanePlan) ----------------

struct PlaneOut {
    uint8_t* cls;      // bh*bw
    uint8_t* mode;     // bh*bw
    uint8_t* dc;       // bh*bw
    uint8_t* raw;      // bh*bw*16
    uint8_t* bnx;      // bh*bw*4
    uint8_t* bny;
    uint8_t* bsx;
    uint8_t* bsy;
    int16_t* boff;     // bh*bw*4
    int16_t* bscale;   // bh*bw*4
    int16_t* mv;       // bh*bw*2
    int16_t* mv2;      // bh*bw*2
    uint8_t* refsel;   // bh*bw
};

struct FrameOut {
    uint32_t display_id;
    uint32_t dc_shift;
    uint32_t nest_x, nest_y;
    uint8_t* nest;  // nest_h*nest_w (filled for I frames)
};

struct MBInfo {
    uint8_t type, refsel;
    int32_t mvx, mvy, mv2x, mv2y;
};

constexpr int MB_COPY = 0, MB_INTRA = 1, MB_INTER = 2;

struct Planner {
    int width, height, h_samp, v_samp;
    int pw[3], ph[3], bw[3], bh[3], mh, mw, nest_h, nest_w;
    int ftype;  // 0=I 1=P 2=B
    Huff bn, dch, mvh;
    BitReader aux, mbt;
    int bn_zero_run = 0;
    std::vector<MBInfo> mbs;

    inline int basisnum() {
        if (bn_zero_run) {
            bn_zero_run--;
            return 0;
        }
        int s = bn.symbol();
        if (s == 7) {
            bn_zero_run = (int)bn.br.bits(8);
            return 0;
        }
        if (s > 7) throw Error("basisnum symbol out of range");
        return s;
    }

    inline void basis(PlaneOut& p, size_t bi, int k) {
        uint32_t v = aux.bits(32);
        p.bnx[bi * 4 + k] = (v >> 25) & 0x7F;
        p.bny[bi * 4 + k] = (v >> 18) & 0x7F;
        p.bsx[bi * 4 + k] = (uint8_t)(((v >> 17) & 1) + 1);
        p.bsy[bi * 4 + k] = (uint8_t)(((v >> 16) & 1) + 1);
        p.boff[bi * 4 + k] = (int16_t)((v >> 8) & 0xFF);
        int sc = (int)(v & 0xFF);
        p.bscale[bi * 4 + k] = (int16_t)(sc >= 128 ? sc - 256 : sc);
    }

    void mb_layer() {
        mbs.assign((size_t)mh * mw, MBInfo{});
        int32_t px = 0, py = 0;
        for (auto& mb : mbs) {
            unsigned t = mbt.bits(2);
            if (t == 3) throw Error("mbtype 3 invalid");
            mb.type = (uint8_t)t;
            if (t == MB_COPY) {
                mb.refsel = (ftype == 1) ? 1 : 0;
            } else if (t == MB_INTER) {
                if (ftype == 2) {
                    unsigned rs = mbt.bits(2);
                    if (rs == 3) throw Error("refsel 3 invalid");
                    mb.refsel = (uint8_t)rs;
                } else {
                    mb.refsel = 1;
                }
                px += mvh.delta();
                py += mvh.delta();
                mb.mvx = px;
                mb.mvy = py;
                if (ftype == 2 && mb.refsel == 2) {
                    px += mvh.delta();
                    py += mvh.delta();
                    mb.mv2x = px;
                    mb.mv2y = py;
                }
            }
        }
    }

    void plane(int pi, int dc_shift, PlaneOut& p) {
        const int W = bw[pi], H = bh[pi];
        const bool chroma_mb = (pi > 0 && h_samp == 2);
        const int shift_idx = chroma_mb ? 0 : 1;
        const int mv_shift = chroma_mb ? 1 : 0;
        for (int by = 0; by < H; by++) {
            for (int bx = 0; bx < W; bx++) {
                const size_t bi = (size_t)by * W + bx;
                bool intra = true;
                const MBInfo* mb = nullptr;
                if (ftype != 0) {
                    mb = &mbs[(size_t)(by >> shift_idx) * mw + (bx >> shift_idx)];
                    intra = (mb->type == MB_INTRA);
                }
                if (intra) {
                    int mode = basisnum();
                    if (mode == 5) throw Error("intra basisnum 5 invalid");
                    p.cls[bi] = 0;
                    p.mode[bi] = (uint8_t)mode;
                    if (mode == 6) {
                        for (int i = 0; i < 16; i++)
                            p.raw[bi * 16 + i] = (uint8_t)aux.bits(8);
                        p.dc[bi] = 128;
                    } else {
                        int pred = bx > 0   ? p.dc[bi - 1]
                                   : by > 0 ? p.dc[bi - W]
                                            : 128;
                        int32_t v = dch.delta();
                        p.dc[bi] =
                            (uint8_t)((uint32_t)(pred + v * (1 << dc_shift)) & 0xFF);
                        for (int k = 0; k < mode; k++) basis(p, bi, k);
                    }
                } else {
                    p.cls[bi] = 1;
                    p.dc[bi] = 128;
                    p.refsel[bi] = mb->refsel;
                    if (mb->type == MB_INTER) {
                        p.mv[bi * 2 + 0] = (int16_t)(mb->mvx >> mv_shift);
                        p.mv[bi * 2 + 1] = (int16_t)(mb->mvy >> mv_shift);
                        p.mv2[bi * 2 + 0] = (int16_t)(mb->mv2x >> mv_shift);
                        p.mv2[bi * 2 + 1] = (int16_t)(mb->mv2y >> mv_shift);
                        int k = basisnum();
                        if (k > 4) throw Error("inter residual count invalid");
                        p.mode[bi] = (uint8_t)k;
                        for (int i = 0; i < k; i++) basis(p, bi, i);
                    } else {
                        // lowered copy: inter, mv 0, no residual. MVs are
                        // written explicitly so output buffers may be reused
                        // across frames without carrying stale vectors.
                        p.mode[bi] = 0;
                        p.mv[bi * 2 + 0] = p.mv[bi * 2 + 1] = 0;
                        p.mv2[bi * 2 + 0] = p.mv2[bi * 2 + 1] = 0;
                    }
                }
            }
        }
    }
};

uint32_t rd32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | p[3];
}
uint16_t rd16(const uint8_t* p) { return (uint16_t)((p[0] << 8) | p[1]); }

}  // namespace

extern "C" int hvqm4_plan_frame(const uint8_t* payload, size_t n, int ftype,
                                int width, int height, int h_samp, int v_samp,
                                PlaneOut* planes /* [3] */, FrameOut* fout,
                                char* err_buf, size_t err_len) {
    try {
        Planner pl;
        pl.width = width;
        pl.height = height;
        pl.h_samp = h_samp;
        pl.v_samp = v_samp;
        pl.ftype = ftype;
        for (int p = 0; p < 3; p++) {
            pl.pw[p] = p ? width / h_samp : width;
            pl.ph[p] = p ? height / v_samp : height;
            pl.bw[p] = pl.pw[p] / 4;
            pl.bh[p] = pl.ph[p] / 4;
        }
        pl.mh = height / 8;
        pl.mw = width / 8;
        pl.nest_h = width >= height ? 38 : 70;
        pl.nest_w = width >= height ? 70 : 38;

        constexpr size_t FRAME_HDR = 12 + 4 * 6;
        if (n < FRAME_HDR) throw Error("payload shorter than frame header");
        fout->display_id = rd32(payload);
        fout->nest_x = rd16(payload + 4);
        fout->nest_y = rd16(payload + 6);
        fout->dc_shift = payload[8];
        if (fout->dc_shift > 7) throw Error("dc_shift out of range");
        const uint8_t* sp[6];
        size_t sn[6], off = FRAME_HDR;
        for (int i = 0; i < 6; i++) {
            sn[i] = rd32(payload + 12 + 4 * i);
            if (off + sn[i] > n) throw Error("stream overruns payload");
            sp[i] = payload + off;
            off += sn[i];
        }
        if (off != n) throw Error("trailing bytes after streams");

        pl.bn.init(sp[0], sn[0]);
        pl.dch.init(sp[1], sn[1]);
        pl.aux.init(sp[2], sn[2]);
        pl.mbt.init(sp[3], sn[3]);
        pl.mvh.init(sp[4], sn[4]);

        if (ftype != 0) pl.mb_layer();
        for (int pi = 0; pi < 3; pi++)
            pl.plane(pi, (int)fout->dc_shift, planes[pi]);

        if (ftype == 0) {  // nest from luma DC grid (FORMAT.md §6.1)
            const int BW = pl.bw[0], BH = pl.bh[0];
            for (int y = 0; y < pl.nest_h; y++) {
                int ry = (int)((fout->nest_y + y) % BH);
                for (int x = 0; x < pl.nest_w; x++) {
                    int rx = (int)((fout->nest_x + x) % BW);
                    fout->nest[y * pl.nest_w + x] =
                        planes[0].dc[(size_t)ry * BW + rx];
                }
            }
        }
        return 0;
    } catch (const std::exception& e) {
        std::strncpy(err_buf, e.what(), err_len - 1);
        err_buf[err_len - 1] = 0;
        return 1;
    }
}
