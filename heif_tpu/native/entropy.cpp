// Native entropy decoder: CABAC + full I-slice syntax -> SyntaxTensors.
//
// Bit-exact twin of the validated Python oracle (heif_tpu/cabac/engine.py +
// syntax.py); same dense context layout, same output contract. Reentrant,
// no globals mutated, no allocation beyond caller buffers — safe to run one
// tile per thread (the Python wrapper fans tiles across a thread pool with
// the GIL released by ctypes).
//
// Build: make -C heif_tpu/native   ->  libheif_entropy.so

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Spec constant tables (H.265 Tables 9-45/9-46; init values Tables 9-5..9-31)
// ---------------------------------------------------------------------------

const uint8_t kTransIdxMps[64] = {
    1,  2,  3,  4,  5,  6,  7,  8,  9,  10, 11, 12, 13, 14, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 62, 63};

const uint8_t kTransIdxLps[64] = {
    0,  0,  1,  2,  2,  4,  4,  5,  6,  7,  8,  9,  9,  11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63};

// Fused (pStateIdx<<1 | valMps) transition tables: one context byte, one
// load + one store per bin instead of two of each.
struct FusedTables {
  uint8_t next_mps[128];
  uint8_t next_lps[128];
  FusedTables() {
    for (int s = 0; s < 128; s++) {
      int p = s >> 1, mps = s & 1;
      next_mps[s] = (uint8_t)((kTransIdxMps[p] << 1) | mps);
      int mps_l = p == 0 ? mps ^ 1 : mps;
      next_lps[s] = (uint8_t)((kTransIdxLps[p] << 1) | mps_l);
    }
  }
};
const FusedTables kFused;

const uint8_t kRangeTabLps[64][4] = {
    {128, 176, 208, 240}, {128, 167, 197, 227}, {128, 158, 187, 216},
    {123, 150, 178, 205}, {116, 142, 169, 195}, {111, 135, 160, 185},
    {105, 128, 152, 175}, {100, 122, 144, 166}, {95, 116, 137, 158},
    {90, 110, 130, 150},  {85, 104, 123, 142},  {81, 99, 117, 135},
    {77, 94, 111, 128},   {73, 89, 105, 122},   {69, 85, 100, 116},
    {66, 80, 95, 110},    {62, 76, 90, 104},    {59, 72, 86, 99},
    {56, 69, 81, 94},     {53, 65, 77, 89},     {51, 62, 73, 85},
    {48, 59, 69, 80},     {46, 56, 66, 76},     {43, 53, 63, 72},
    {41, 50, 59, 69},     {39, 48, 56, 65},     {37, 45, 54, 62},
    {35, 43, 51, 59},     {33, 41, 48, 56},     {32, 39, 46, 53},
    {30, 37, 43, 50},     {29, 35, 41, 48},     {27, 33, 39, 45},
    {26, 31, 37, 43},     {24, 30, 35, 41},     {23, 28, 33, 39},
    {22, 27, 32, 37},     {21, 26, 30, 35},     {20, 24, 29, 33},
    {19, 23, 27, 31},     {18, 22, 26, 30},     {17, 21, 25, 28},
    {16, 20, 23, 27},     {15, 19, 22, 25},     {14, 18, 21, 24},
    {14, 17, 20, 23},     {13, 16, 19, 22},     {12, 15, 18, 21},
    {12, 14, 17, 20},     {11, 14, 16, 19},     {11, 13, 15, 18},
    {10, 12, 15, 17},     {10, 12, 14, 16},     {9, 11, 13, 15},
    {9, 11, 12, 14},      {8, 10, 12, 14},      {8, 9, 11, 13},
    {7, 9, 11, 12},       {7, 9, 10, 12},       {7, 8, 10, 11},
    {6, 8, 9, 11},        {6, 7, 9, 10},        {6, 7, 8, 9},
    {2, 2, 2, 2}};

// Dense context slot layout — MUST match heif_tpu/cabac/engine.py.
enum CtxOffset {
  CTX_SAO_MERGE = 0,
  CTX_SAO_TYPE = 1,
  CTX_SPLIT_CU = 2,             // 3
  CTX_CU_TRANSQUANT_BYPASS = 5, // 1
  CTX_PART_MODE = 6,
  CTX_PREV_INTRA = 7,
  CTX_CHROMA_MODE = 8,
  CTX_SPLIT_TRANSFORM = 9,   // 3
  CTX_CBF_LUMA = 12,         // 2
  CTX_CBF_CHROMA = 14,       // 4
  CTX_CU_QP_DELTA = 18,      // 2
  CTX_TSKIP_LUMA = 20,
  CTX_TSKIP_CHROMA = 21,
  CTX_LAST_X = 22,  // 18
  CTX_LAST_Y = 40,  // 18
  CTX_CSBF = 58,    // 4
  CTX_SIG = 62,     // 44
  CTX_G1 = 106,     // 24
  CTX_G2 = 130,     // 6
  N_CTX = 136,
};

const uint8_t kInitValues[N_CTX] = {
    // sao_merge, sao_type
    153, 200,
    // split_cu
    139, 141, 157,
    // cu_transquant_bypass, part_mode, prev_intra, chroma_mode
    154, 184, 184, 63,
    // split_transform
    153, 138, 138,
    // cbf_luma
    111, 141,
    // cbf_chroma
    94, 138, 182, 154,
    // cu_qp_delta
    154, 154,
    // transform_skip luma, chroma
    139, 139,
    // last_x
    110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79,
    108, 123, 63,
    // last_y
    110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79,
    108, 123, 63,
    // csbf
    91, 171, 134, 141,
    // sig (42 + 2 TS)
    111, 111, 125, 110, 110, 94, 124, 108, 124, 107, 125, 141, 179, 153, 125,
    107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153, 125, 140, 139, 182,
    182, 152, 136, 152, 136, 153, 136, 139, 111, 136, 139, 111, 111, 111,
    // g1
    140, 92, 137, 138, 140, 152, 138, 139, 153, 74, 149, 92, 139, 107, 122,
    152, 140, 179, 166, 182, 140, 227, 122, 197,
    // g2
    138, 153, 136, 167, 152, 152};

const uint8_t kSigCtx4x4[16] = {0, 1, 4, 5, 2, 3, 4, 5, 6, 6, 8, 8, 7, 7, 8, 8};

// §9.3.4.2.5 sig_coeff_flag position patterns by csbf-neighbor state
// (prev = right|below<<1), indexed [prev][yp*4+xp]. The neighbor state is
// constant within a 4x4 subblock, so the per-coefficient context reduces
// to one table lookup plus a per-subblock base.
const uint8_t kSigCtxPat[4][16] = {
    // prev 0: (x+y)==0 -> 2, x+y<3 -> 1, else 0
    {2, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0},
    // prev 1: y==0 -> 2, y==1 -> 1, else 0
    {2, 2, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0},
    // prev 2: x==0 -> 2, x==1 -> 1, else 0
    {2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0, 2, 1, 0, 0},
    // prev 3: always 2
    {2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2},
};

const int kChromaQpTable[14] = {29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37};

inline int clip3(int lo, int hi, int v) { return v < lo ? lo : (v > hi ? hi : v); }

// Qp'Cb/Cr from QpY (§8.6.1, Table 8-10, ChromaArrayType==1).
// bd_offset_c = QpBdOffsetC = 6*(bit_depth_c-8); twin of
// cabac/syntax.py chroma_qp_from_luma.
int chroma_qp_from_luma(int qp_y, int offset, int bd_offset_c) {
  int q = clip3(-bd_offset_c, 57, qp_y + offset);
  int qpc;
  if (q < 30) qpc = q;
  else if (q <= 43) qpc = kChromaQpTable[q - 30];
  else qpc = q - 6;
  return qpc + bd_offset_c;
}

// ---------------------------------------------------------------------------
// Scan orders (§6.5.2-6.5.4), built once per size on the stack.
// ---------------------------------------------------------------------------

struct Scan {
  uint8_t x[1024];
  uint8_t y[1024];
  int16_t pos[32][32];  // [y][x] -> scan index
};

void build_scan(Scan& s, int blk, int scan_idx) {
  int i = 0;
  if (scan_idx == 0) {
    int x = 0, y = 0;
    while (i < blk * blk) {
      while (y >= 0) {
        if (x < blk && y < blk) {
          s.x[i] = (uint8_t)x;
          s.y[i] = (uint8_t)y;
          i++;
        }
        y--;
        x++;
      }
      y = x;
      x = 0;
    }
  } else if (scan_idx == 1) {
    for (int yy = 0; yy < blk; yy++)
      for (int xx = 0; xx < blk; xx++) {
        s.x[i] = (uint8_t)xx;
        s.y[i] = (uint8_t)yy;
        i++;
      }
  } else {
    for (int xx = 0; xx < blk; xx++)
      for (int yy = 0; yy < blk; yy++) {
        s.x[i] = (uint8_t)xx;
        s.y[i] = (uint8_t)yy;
        i++;
      }
  }
  for (int k = 0; k < blk * blk; k++) s.pos[s.y[k]][s.x[k]] = (int16_t)k;
}

int intra_scan_idx(int log2_size, int mode, int c_idx) {
  if (log2_size == 2 || (log2_size == 3 && c_idx == 0)) {
    if (mode >= 6 && mode <= 14) return 2;
    if (mode >= 22 && mode <= 30) return 1;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Parameters / outputs (ABI shared with heif_tpu/native/__init__.py)
// ---------------------------------------------------------------------------

struct TileParams {
  int32_t width, height;
  int32_t ctb_log2, min_cb_log2, min_tb_log2, max_tb_log2;
  int32_t max_hier_depth_intra;
  int32_t slice_qp;
  int32_t sign_hiding;            // pps sign_data_hiding && !bypass handled inside
  int32_t cu_qp_delta_enabled;
  int32_t diff_cu_qp_delta_depth;
  int32_t cb_qp_offset, cr_qp_offset;  // pps+slice combined
  int32_t transform_skip_enabled;
  int32_t transquant_bypass_enabled;
  int32_t wpp;                    // entropy_coding_sync
  int32_t sao_luma, sao_chroma;
  int32_t amp_enabled;            // unused for intra, kept for parity
  int32_t pcm_enabled;
  int32_t pcm_log2_min, pcm_log2_max;
  int32_t pcm_bd_luma, pcm_bd_chroma;
  int32_t bit_depth;              // luma bit depth (8 or 10)
  int32_t bit_depth_c;            // chroma bit depth
  int32_t chroma_format;          // chroma_format_idc: 0 (mono) or 1 (4:2:0)
};

struct TileOutput {
  int32_t* coeff_y;    // [H*W]
  int32_t* coeff_cb;   // [(H/2)*(W/2)]
  int32_t* coeff_cr;
  int32_t* tu_table;   // [max_tu * 11]
  int32_t* tu_count;   // [1]
  int32_t max_tu;
  int8_t* intra_mode_y;  // [H/4 * W/4]
  int8_t* intra_mode_c;
  int8_t* qp_map;
  uint8_t* bypass_map;
  uint8_t* pcm_map;
  uint8_t* vert_edges;
  uint8_t* horiz_edges;
  int16_t* sao;          // [ctbs_y*ctbs_x*3*6]
  uint16_t* pcm_y;       // [H*W] (may be null if !pcm_enabled)
  uint16_t* pcm_cb;
  uint16_t* pcm_cr;
};

// TU table columns (match cabac/types.py)
enum { TU_COMP, TU_X, TU_Y, TU_LOG2, TU_CBF, TU_PRED, TU_QP, TU_SKIP,
       TU_BYPASS, TU_SCAN, TU_PCM, TU_FIELDS };

// ---------------------------------------------------------------------------
// CABAC engine
// ---------------------------------------------------------------------------

// CABAC engine with a left-aligned 64-bit bit cache. Bit-exact twin of
// cabac/engine.py, restructured for host throughput:
//   - bits are pulled from the stream a byte at a time into `cache`
//     (top `ncache` bits valid), zero-filled past `bit_end` — matching
//     the Python twin's "reads past the substream end yield 0" rule
//     (substream boundaries are byte-aligned, so whole bytes never
//     straddle bit_end);
//   - runs of bypass bins collapse into ONE 64-bit division:
//     concatenated bypass bins == floor((offset·2^n + nextbits)/range),
//     new offset == the remainder (per-step invariant offset < range);
//   - renormalization is a single clz-derived shift, not a loop.
// `bit_pos` stays the true consumed-bit position (PCM alignment and the
// WPP substream jumps depend on it); seek() moves it and drops the cache.
struct Engine {
  const uint8_t* data;
  int64_t bit_pos;
  int64_t bit_end;
  uint64_t cache = 0;  // next unconsumed bits, MSB-aligned
  int ncache = 0;      // valid bit count in cache
  uint32_t range;
  uint32_t offset;
  // context state packed as (pStateIdx << 1) | valMps
  uint8_t state[N_CTX];

  inline void seek(int64_t pos, int64_t end) {
    bit_pos = pos;
    bit_end = end;
    cache = 0;
    ncache = 0;
  }

  inline void refill() {
    int64_t fp = bit_pos + ncache;  // next unfetched bit
    if (fp & 7) {                   // align (only right after seek)
      int n = 8 - (int)(fp & 7);
      uint64_t b = fp < bit_end ? (data[fp >> 3] & (0xFFu >> (fp & 7))) : 0;
      cache |= b << (64 - ncache - n);
      ncache += n;
      fp += n;
    }
    while (ncache <= 56) {
      uint64_t b = fp < bit_end ? data[fp >> 3] : 0;
      cache |= b << (56 - ncache);
      ncache += 8;
      fp += 8;
    }
  }

  // n in [0, 57] (the double shift keeps n==0 defined)
  inline uint32_t read_bits(int n) {
    if (ncache < n) refill();
    uint64_t v = (cache >> 1) >> (63 - n);
    cache <<= n;
    ncache -= n;
    bit_pos += n;
    return (uint32_t)v;
  }

  inline uint64_t peek_bits(int n) {
    if (ncache < n) refill();
    return cache >> (64 - n);
  }

  inline void consume(int n) {
    cache <<= n;
    ncache -= n;
    bit_pos += n;
  }

  bool start() {
    cache = 0;
    ncache = 0;
    range = 510;
    uint32_t off = read_bits(9);
    if (off >= 510) return false;
    offset = off;
    return true;
  }

  void init_contexts(int qp) {
    int q = clip3(0, 51, qp);
    for (int i = 0; i < N_CTX; i++) {
      int init = kInitValues[i];
      int m = (init >> 4) * 5 - 45;
      int n = ((init & 15) << 3) - 16;
      int pre = clip3(1, 126, ((m * q) >> 4) + n);
      if (pre > 63)
        state[i] = (uint8_t)(((pre - 64) << 1) | 1);
      else
        state[i] = (uint8_t)((63 - pre) << 1);
    }
  }

  inline int decode_bin(int ctx) {
    // branch-free formulation: the MPS/LPS decision is the entropy
    // itself (inherently unpredictable), so both outcomes are computed
    // and selected with cmovs; the unified renorm shift covers the LPS
    // (1..7), MPS-with-renorm (1) and MPS-no-renorm (0) cases
    uint32_t s = state[ctx];
    uint32_t lps = kRangeTabLps[s >> 1][(range >> 6) & 3];
    uint32_t rmps = range - lps;
    uint32_t is_lps = offset >= rmps;
    int bin = (int)((s & 1) ^ is_lps);
    offset -= is_lps ? rmps : 0;
    range = is_lps ? lps : rmps;
    state[ctx] = is_lps ? kFused.next_lps[s] : kFused.next_mps[s];
    int sh = __builtin_clz(range) - 23;  // range in [2,509] -> [-1,7]
    sh = sh < 0 ? 0 : sh;
    range <<= sh;
    offset = (offset << sh) | read_bits(sh);
    return bin;
  }

  inline int decode_bypass() {
    offset = (offset << 1) | read_bits(1);
    uint32_t b = offset >= range;
    offset -= b ? range : 0;
    return (int)b;
  }

  // n consecutive bypass bins as one division (n <= 47)
  inline uint32_t decode_bypass_bits(int n) {
    if (n == 0) return 0;
    uint64_t v = ((uint64_t)offset << n) | read_bits(n);
    offset = (uint32_t)(v % range);
    return (uint32_t)(v / range);
  }

  // Unary run of bypass bins: returns the count of 1-bins (<= max_ones),
  // consuming count+1 bins when a 0-terminator is seen, exactly max_ones
  // bins otherwise (TR-bypass semantics).
  inline int decode_bypass_unary(int max_ones) {
    int total = 0;
    while (total < max_ones) {
      int k = max_ones - total + 1;  // remaining ones + terminator
      if (k > 24) k = 24;
      uint64_t v = ((uint64_t)offset << k) | peek_bits(k);
      uint32_t q = (uint32_t)(v / range);
      uint32_t inv = (uint32_t)(~q) & ((1u << k) - 1);
      if (inv == 0) {  // k solid 1-bins
        int take = k;
        if (total + take > max_ones) take = max_ones - total;
        uint64_t vt = v >> (k - take);
        offset = (uint32_t)(vt % range);
        consume(take);
        total += take;
        continue;
      }
      int zpos = 31 - __builtin_clz(inv);  // highest 0-bin (LSB index)
      int ones = k - 1 - zpos;
      if (total + ones >= max_ones) {  // cap reached before the 0-bin
        int take = max_ones - total;
        uint64_t vt = v >> (k - take);
        offset = (uint32_t)(vt % range);
        consume(take);
        return max_ones;
      }
      int used = ones + 1;  // run + terminating 0
      uint64_t vt = v >> (k - used);
      offset = (uint32_t)(vt % range);
      consume(used);
      return total + ones;
    }
    return max_ones;
  }

  inline int decode_terminate() {
    range -= 2;
    if (offset >= range) return 1;
    if (range < 256) {
      int s = __builtin_clz(range) - 23;
      range <<= s;
      offset = (offset << s) | read_bits(s);
    }
    return 0;
  }

  inline int decode_tr_bypass(int cmax) { return decode_bypass_unary(cmax); }

  bool bypass_overflow = false;  // set on corrupt EGk prefixes

  inline uint32_t decode_egk_bypass(int k) {
    int prefix = decode_bypass_unary(32);
    if (prefix > 31) {  // corrupt stream: fail loudly, like the twin
      bypass_overflow = true;
      return 0;
    }
    uint32_t value = prefix + k ? decode_bypass_bits(prefix + k) : 0;
    return (((1u << prefix) - 1) << k) + value;
  }
};

// ---------------------------------------------------------------------------
// Tile decoder
// ---------------------------------------------------------------------------

struct Decoder {
  const TileParams* P;
  TileOutput* O;
  Engine eng;
  const uint8_t* rbsp;
  int64_t rbsp_len = 0;    // validated bound for substream byte ranges
  const int32_t* sub_off;  // [n_sub*2] byte ranges
  int n_sub;

  // tiles (§6.5.1): CTB boundaries of tile columns/rows; n_tcols == 0
  // means tiles_enabled_flag=0 (plain raster scan). Mirrors the Python
  // twin (cabac/syntax.py) which is the spec reference for this path.
  const int32_t* tile_col_bd = nullptr;  // [n_tcols+1]
  const int32_t* tile_row_bd = nullptr;  // [n_trows+1]
  int n_tcols = 0, n_trows = 0;
  std::vector<int16_t> ctb_tid;    // per-CTB tile id (raster indexed)
  std::vector<int32_t> scan_addr;  // tile-scan order -> raster CTB addr

  int W, H, ctb, ctb_log2, ctbs_x, ctbs_y, g4w, g4h;
  int log2_min_qg;
  int qp_bd_y, qp_bd_c;  // QpBdOffsetY/C = 6*(bit_depth-8), §7.4.3.2.1
  bool has_chroma;       // chroma_format_idc == 1 (4:2:0); 0 = monochrome

  // WPP snapshot
  uint8_t snap_state[N_CTX];
  bool have_snap = false;

  // QP state
  int last_cu_qp, cu_qp_delta_val, qg_x, qg_y, qg_log2, qg_pred;
  bool is_cu_qp_delta_coded, qg_open;

  // per-CU state
  bool cu_bypass, intra_split;
  int cu_chroma_mode, max_trafo_depth;

  // scans
  Scan scans[3][4];  // [scanIdx][log2-2] coefficient(4x4) uses scans[s][0]
  Scan sb_scans[3][4];

  bool error = false;

  inline int32_t* coeff_plane(int c) {
    return c == 0 ? O->coeff_y : (c == 1 ? O->coeff_cb : O->coeff_cr);
  }
  inline int plane_w(int c) { return c == 0 ? W : W >> 1; }

  void init() {
    W = P->width;
    H = P->height;
    qp_bd_y = 6 * (P->bit_depth - 8);
    qp_bd_c = 6 * (P->bit_depth_c - 8);
    has_chroma = P->chroma_format == 1;
    ctb_log2 = P->ctb_log2;
    ctb = 1 << ctb_log2;
    ctbs_x = (W + ctb - 1) >> ctb_log2;
    ctbs_y = (H + ctb - 1) >> ctb_log2;
    g4w = W >> 2;
    g4h = H >> 2;
    log2_min_qg = ctb_log2 - P->diff_cu_qp_delta_depth;
    last_cu_qp = P->slice_qp;
    cu_qp_delta_val = 0;
    is_cu_qp_delta_coded = false;
    qg_open = false;
    qg_pred = P->slice_qp;
    for (int s = 0; s < 3; s++)
      for (int l = 0; l < 4; l++) {
        build_scan(scans[s][l], 4, s);         // in-subblock scan is 4x4
        build_scan(sb_scans[s][l], 1 << l, s); // subblock grid 1,2,4,8
      }
    ct_depth_buf.assign((size_t)g4h * g4w, 0);
    // default intra modes = DC (1)
    memset(O->intra_mode_y, 1, (size_t)g4h * g4w);
    memset(O->intra_mode_c, 1, (size_t)g4h * g4w);
    ctb_tid.clear();
    scan_addr.clear();
    if (n_tcols > 0) {
      ctb_tid.resize((size_t)ctbs_x * ctbs_y);
      for (int y = 0; y < ctbs_y; y++) {
        int tr = 0;
        while (tr + 1 < n_trows && y >= tile_row_bd[tr + 1]) tr++;
        for (int x = 0; x < ctbs_x; x++) {
          int tc = 0;
          while (tc + 1 < n_tcols && x >= tile_col_bd[tc + 1]) tc++;
          ctb_tid[(size_t)y * ctbs_x + x] = (int16_t)(tr * n_tcols + tc);
        }
      }
      scan_addr.reserve((size_t)ctbs_x * ctbs_y);
      for (int tr = 0; tr < n_trows; tr++)
        for (int tc = 0; tc < n_tcols; tc++)
          for (int y = tile_row_bd[tr]; y < tile_row_bd[tr + 1]; y++)
            for (int x = tile_col_bd[tc]; x < tile_col_bd[tc + 1]; x++)
              scan_addr.push_back(y * ctbs_x + x);
    }
  }

  // §6.4.1 availability: luma positions in different tiles are mutually
  // unavailable for prediction and context derivation
  inline bool same_tile(int x0, int y0, int x1, int y1) const {
    if (ctb_tid.empty()) return true;
    return ctb_tid[(size_t)(y0 >> ctb_log2) * ctbs_x + (x0 >> ctb_log2)] ==
           ctb_tid[(size_t)(y1 >> ctb_log2) * ctbs_x + (x1 >> ctb_log2)];
  }

  // ---- maps ----
  inline int8_t& im_y(int x4, int y4) { return O->intra_mode_y[y4 * g4w + x4]; }
  inline int8_t& im_c(int x4, int y4) { return O->intra_mode_c[y4 * g4w + x4]; }
  inline int8_t& qpm(int x4, int y4) { return O->qp_map[y4 * g4w + x4]; }
  inline uint8_t& bypm(int x4, int y4) { return O->bypass_map[y4 * g4w + x4]; }
  inline uint8_t& pcmm(int x4, int y4) { return O->pcm_map[y4 * g4w + x4]; }

  // sized g4w*g4h in init(): pictures wider than 512 (e.g. the sample's
  // 2016x1512 auxiliary hvc1 item) overflowed the old fixed 128*128 buffer
  std::vector<int8_t> ct_depth_buf;
  inline int8_t& ctd(int x4, int y4) { return ct_depth_buf[y4 * g4w + x4]; }

  // ------------------------------------------------------------------
  // returns 0 ok, 1 stream desync, 2 unsupported chroma format
  int decode() {
    if (P->chroma_format != 0 && P->chroma_format != 1) return 2;
    init();
    int n_ctb = ctbs_x * ctbs_y;
    bool tiles = n_tcols > 0;
    if (tiles && P->wpp) return 1;  // tiles+WPP unsupported (loud)
    if (tiles && n_sub < n_tcols * n_trows) return 1;
    // WPP indexes sub_off by CTB row; tiles validated above. Malformed
    // slice headers (too few entry points) must fail loudly, and every
    // byte range must stay inside the rbsp buffer (corrupt entry-point
    // offsets would otherwise drive the bit reader out of bounds).
    if (!tiles && P->wpp && ctbs_y > 1 && n_sub < ctbs_y) return 1;
    if (n_sub < 1) return 1;
    for (int i = 0; i < n_sub; i++) {
      int64_t s0 = sub_off[2 * i], s1 = sub_off[2 * i + 1];
      if (s0 < 0 || s1 < s0 || s1 > rbsp_len) return 1;
    }
    eng.data = rbsp;
    eng.seek((int64_t)sub_off[0] * 8, (int64_t)sub_off[1] * 8);
    if (!eng.start()) return 1;
    eng.init_contexts(P->slice_qp);
    int cur_tile = 0;
    for (int addr = 0; addr < n_ctb; addr++) {
      int raddr = tiles ? scan_addr[addr] : addr;
      int x = raddr % ctbs_x;
      int y = raddr / ctbs_x;
      if (tiles) {
        int t = ctb_tid[raddr];
        if (t != cur_tile) {
          // new tile: jump to its substream, spec re-init contexts (no
          // inheritance across tiles, §9.3.1), reset qPY_PREV, close QG
          cur_tile = t;
          eng.seek((int64_t)sub_off[2 * t] * 8,
                   (int64_t)sub_off[2 * t + 1] * 8);
          if (!eng.start()) return 1;
          eng.init_contexts(P->slice_qp);
          finalize_qg();
          last_cu_qp = P->slice_qp;
        }
      } else if (P->wpp && x == 0 && y > 0) {
        eng.seek((int64_t)sub_off[2 * y] * 8, (int64_t)sub_off[2 * y + 1] * 8);
        if (!eng.start()) return 1;
        if (ctbs_x > 1 && have_snap) {
          memcpy(eng.state, snap_state, N_CTX);
        } else {
          eng.init_contexts(P->slice_qp);
        }
        finalize_qg();
        last_cu_qp = P->slice_qp;
      }
      decode_ctu(x, y);
      if (error) return 1;
      if (!tiles && P->wpp && x == 1) {
        memcpy(snap_state, eng.state, N_CTX);
        have_snap = true;
      }
      int end_flag = eng.decode_terminate();
      bool last = addr == n_ctb - 1;
      if (end_flag != (last ? 1 : 0)) return 1;
      if (!last) {
        // end_of_subset_one_bit + byte alignment at tile / WPP-row ends
        bool at_subset_end =
            (tiles && ctb_tid[scan_addr[addr + 1]] != cur_tile) ||
            (!tiles && P->wpp && x == ctbs_x - 1);
        if (at_subset_end && eng.decode_terminate() != 1) return 1;
      }
    }
    finalize_qg();
    return error ? 1 : 0;
  }

  // ---- QP handling ----
  int predict_qp() {
    int xq = qg_x, yq = qg_y;
    int prev = last_cu_qp;
    int mask = ~(ctb - 1);
    int qa = prev, qb = prev;
    if (xq > 0 && ((xq - 1) & mask) == (xq & mask))
      qa = qpm((xq - 1) >> 2, yq >> 2);
    if (yq > 0 && ((yq - 1) & mask) == (yq & mask))
      qb = qpm(xq >> 2, (yq - 1) >> 2);
    return (qa + qb + 1) >> 1;
  }

  void finalize_qg() {
    if (!qg_open) return;
    int qp = current_qp_y();
    int size = 1 << qg_log2;
    int w4 = (size < W - qg_x ? size : W - qg_x) >> 2;
    int h4 = (size < H - qg_y ? size : H - qg_y) >> 2;
    for (int j = 0; j < h4; j++)
      for (int i = 0; i < w4; i++) qpm((qg_x >> 2) + i, (qg_y >> 2) + j) = (int8_t)qp;
    last_cu_qp = qp;
    qg_open = false;
  }

  // QpY per §8.6.1: wraps in [-QpBdOffsetY, 51]
  inline int current_qp_y() {
    return ((qg_pred + cu_qp_delta_val + 52 + 2 * qp_bd_y) % (52 + qp_bd_y)) -
           qp_bd_y;
  }

  // ---- CTU ----
  void decode_ctu(int rx, int ry) {
    if (P->sao_luma || P->sao_chroma) decode_sao(rx, ry);
    decode_cqt(rx << ctb_log2, ry << ctb_log2, ctb_log2, 0);
  }

  void decode_sao(int rx, int ry) {
    int16_t* sp = O->sao + ((ry * ctbs_x + rx) * 3) * 6;
    int merge_left = 0, merge_up = 0;
    // merge candidates must lie in the same tile (§7.3.8.3
    // leftCtbInTile / upCtbInTile)
    int lx = rx << ctb_log2, ly = ry << ctb_log2;
    if (rx > 0 && same_tile(lx - 1, ly, lx, ly))
      merge_left = eng.decode_bin(CTX_SAO_MERGE);
    if (!merge_left && ry > 0 && same_tile(lx, ly - 1, lx, ly))
      merge_up = eng.decode_bin(CTX_SAO_MERGE);
    if (merge_left) {
      memcpy(sp, O->sao + ((ry * ctbs_x + rx - 1) * 3) * 6, 3 * 6 * sizeof(int16_t));
      return;
    }
    if (merge_up) {
      memcpy(sp, O->sao + (((ry - 1) * ctbs_x + rx) * 3) * 6, 3 * 6 * sizeof(int16_t));
      return;
    }
    int n_comp = has_chroma ? 3 : 1;
    for (int c = 0; c < n_comp; c++) {
      // cMax per component bit depth (§7.3.8.3)
      int bd = c == 0 ? P->bit_depth : P->bit_depth_c;
      int cmax = (1 << ((bd < 10 ? bd : 10) - 5)) - 1;
      int16_t* p = sp + c * 6;
      if (c == 0 && !P->sao_luma) continue;
      if (c > 0 && !P->sao_chroma) continue;
      if (c == 2) {
        p[0] = sp[1 * 6 + 0];
      } else {
        int t = 0;
        if (eng.decode_bin(CTX_SAO_TYPE)) t = 1 + eng.decode_bypass();
        p[0] = (int16_t)t;
      }
      if (p[0] == 0) continue;
      int offs[4];
      for (int i = 0; i < 4; i++) offs[i] = eng.decode_tr_bypass(cmax);
      if (p[0] == 1) {  // band
        for (int i = 0; i < 4; i++)
          if (offs[i] && eng.decode_bypass()) offs[i] = -offs[i];
        p[1] = (int16_t)eng.decode_bypass_bits(5);
      } else {  // edge
        if (c <= 1)
          p[1] = (int16_t)eng.decode_bypass_bits(2);
        else
          p[1] = sp[1 * 6 + 1];
        offs[2] = -offs[2];
        offs[3] = -offs[3];
      }
      for (int i = 0; i < 4; i++) p[2 + i] = (int16_t)offs[i];
    }
  }

  // ---- coding quadtree ----
  void decode_cqt(int x0, int y0, int log2_size, int depth) {
    if (error) return;
    bool is_qg = P->cu_qp_delta_enabled ? (log2_size >= log2_min_qg) : (depth == 0);
    if (is_qg) {
      if (qg_open) {
        int qs = 1 << qg_log2;
        bool nested = qg_x <= x0 && x0 < qg_x + qs && qg_y <= y0 && y0 < qg_y + qs;
        if (!nested) finalize_qg();
      }
      is_cu_qp_delta_coded = false;
      cu_qp_delta_val = 0;
      qg_x = x0;
      qg_y = y0;
      qg_log2 = log2_size;
      qg_pred = predict_qp();
      qg_open = true;
    }
    bool right_in = x0 + (1 << log2_size) <= W;
    bool bottom_in = y0 + (1 << log2_size) <= H;
    int split;
    if (right_in && bottom_in && log2_size > P->min_cb_log2) {
      // split_cu_flag ctx from neighbor depths (§9.3.4.2.2; availability
      // per §6.4.1 excludes other tiles)
      int inc = 0;
      int g4x = x0 >> 2, g4y = y0 >> 2;
      if (x0 > 0 && same_tile(x0 - 1, y0, x0, y0) &&
          ctd(g4x - 1, g4y) > depth)
        inc++;
      if (y0 > 0 && same_tile(x0, y0 - 1, x0, y0) &&
          ctd(g4x, g4y - 1) > depth)
        inc++;
      split = eng.decode_bin(CTX_SPLIT_CU + inc);
    } else {
      split = log2_size > P->min_cb_log2 ? 1 : 0;
    }
    if (split) {
      int half = 1 << (log2_size - 1);
      int x1 = x0 + half, y1 = y0 + half;
      decode_cqt(x0, y0, log2_size - 1, depth + 1);
      if (x1 < W) decode_cqt(x1, y0, log2_size - 1, depth + 1);
      if (y1 < H) decode_cqt(x0, y1, log2_size - 1, depth + 1);
      if (x1 < W && y1 < H) decode_cqt(x1, y1, log2_size - 1, depth + 1);
    } else {
      int s4 = 1 << (log2_size - 2);
      int g4x = x0 >> 2, g4y = y0 >> 2;
      for (int j = 0; j < s4; j++)
        for (int i = 0; i < s4; i++) ctd(g4x + i, g4y + j) = (int8_t)depth;
      decode_cu(x0, y0, log2_size);
    }
  }

  // ---- intra mode derivation ----
  int neighbor_luma_mode(int x, int y, int cur_x, int cur_y) {
    if (x < 0 || y < 0) return 1;
    if (y < ((cur_y >> ctb_log2) << ctb_log2)) return 1;
    if (!same_tile(x, y, cur_x, cur_y)) return 1;  // §6.4.1
    if (pcmm(x >> 2, y >> 2)) return 1;
    return im_y(x >> 2, y >> 2);
  }

  int derive_intra_mode(int px, int py, int mpm_idx, int rem) {
    int a = neighbor_luma_mode(px - 1, py, px, py);
    int b = neighbor_luma_mode(px, py - 1, px, py);
    int cands[3];
    if (a == b) {
      if (a < 2) {
        cands[0] = 0; cands[1] = 1; cands[2] = 26;
      } else {
        cands[0] = a;
        cands[1] = 2 + ((a + 29) % 32);
        cands[2] = 2 + ((a - 2 + 1) % 32);
      }
    } else {
      cands[0] = a;
      cands[1] = b;
      int fills[3] = {0, 1, 26};
      for (int f = 0; f < 3; f++) {
        if (fills[f] != a && fills[f] != b) {
          cands[2] = fills[f];
          break;
        }
      }
    }
    if (mpm_idx >= 0) return cands[mpm_idx];
    // sort ascending
    int s0 = cands[0], s1 = cands[1], s2 = cands[2], t;
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    if (s1 > s2) { t = s1; s1 = s2; s2 = t; }
    if (s0 > s1) { t = s0; s0 = s1; s1 = t; }
    int mode = rem;
    if (mode >= s0) mode++;
    if (mode >= s1) mode++;
    if (mode >= s2) mode++;
    return mode;
  }

  static int derive_chroma_mode(int idx, int luma) {
    if (idx == 4) return luma;
    static const int base[4] = {0, 26, 10, 1};
    return luma == base[idx] ? 34 : base[idx];
  }

  // ---- coding unit ----
  void decode_cu(int x0, int y0, int log2_size) {
    cu_bypass = false;
    int size = 1 << log2_size;
    int s4 = size >> 2;
    int g4x = x0 >> 2, g4y = y0 >> 2;

    if (P->transquant_bypass_enabled)
      cu_bypass = eng.decode_bin(CTX_CU_TRANSQUANT_BYPASS);

    bool part_nxn = false;
    if (log2_size == P->min_cb_log2)
      if (!eng.decode_bin(CTX_PART_MODE)) part_nxn = true;
    intra_split = part_nxn;

    bool pcm_flag = false;
    if (P->pcm_enabled && !part_nxn && log2_size >= P->pcm_log2_min &&
        log2_size <= P->pcm_log2_max)
      pcm_flag = eng.decode_terminate();
    if (pcm_flag) {
      decode_pcm(x0, y0, log2_size);
      return;
    }

    int n_pu = part_nxn ? 4 : 1;
    int pb = part_nxn ? size >> 1 : size;
    int prev_flags[4];
    for (int i = 0; i < n_pu; i++) prev_flags[i] = eng.decode_bin(CTX_PREV_INTRA);
    for (int i = 0; i < n_pu; i++) {
      int px = x0 + (i & 1) * pb;
      int py = y0 + (i >> 1) * pb;
      int mode;
      if (prev_flags[i]) {
        mode = derive_intra_mode(px, py, eng.decode_tr_bypass(2), -1);
      } else {
        mode = derive_intra_mode(px, py, -1, (int)eng.decode_bypass_bits(5));
      }
      int p4 = pb >> 2;
      for (int j = 0; j < p4; j++)
        for (int k = 0; k < p4; k++)
          im_y((px >> 2) + k, (py >> 2) + j) = (int8_t)mode;
    }

    if (has_chroma) {
      // intra_chroma_pred_mode absent when ChromaArrayType==0 (§7.3.8.5)
      int chroma_idx = eng.decode_bin(CTX_CHROMA_MODE)
                           ? (int)eng.decode_bypass_bits(2)
                           : 4;
      int luma0 = im_y(g4x, g4y);
      cu_chroma_mode = derive_chroma_mode(chroma_idx, luma0);
    } else {
      cu_chroma_mode = 1;
    }
    for (int j = 0; j < s4; j++)
      for (int i = 0; i < s4; i++) {
        im_c(g4x + i, g4y + j) = (int8_t)cu_chroma_mode;
        bypm(g4x + i, g4y + j) = cu_bypass ? 1 : 0;
      }

    max_trafo_depth = P->max_hier_depth_intra + (part_nxn ? 1 : 0);
    transform_tree(x0, y0, x0, y0, log2_size, 0, 0, true, true);

    // CU boundary edges
    for (int j = 0; j < s4; j++) O->vert_edges[(g4y + j) * g4w + g4x] = 1;
    for (int i = 0; i < s4; i++) O->horiz_edges[g4y * g4w + g4x + i] = 1;
  }

  void decode_pcm(int x0, int y0, int log2_size) {
    int size = 1 << log2_size;
    int g4x = x0 >> 2, g4y = y0 >> 2, s4 = size >> 2;
    for (int j = 0; j < s4; j++)
      for (int i = 0; i < s4; i++) {
        pcmm(g4x + i, g4y + j) = 1;
        im_y(g4x + i, g4y + j) = 1;
      }
    for (int j = 0; j < s4; j++) O->vert_edges[(g4y + j) * g4w + g4x] = 1;
    for (int i = 0; i < s4; i++) O->horiz_edges[g4y * g4w + g4x + i] = 1;
    // at terminate==1 the consumed bit count equals the encoder's full
    // arithmetic payload (the 9-bit lookahead covers the flush tail), so
    // byte alignment starts from bit_pos itself (see cabac/syntax.py)
    int64_t pos = (eng.bit_pos + 7) & ~7LL;
    auto read_bits = [&](int n) {
      uint32_t v = 0;
      for (int k = 0; k < n; k++) {
        v = (v << 1) | ((rbsp[pos >> 3] >> (7 - (pos & 7))) & 1);
        pos++;
      }
      return v;
    };
    int bd_l = P->pcm_bd_luma, bd_c = P->pcm_bd_chroma;
    if (O->pcm_y) {
      for (int j = 0; j < size; j++)
        for (int i = 0; i < size; i++)
          O->pcm_y[(y0 + j) * W + x0 + i] =
              (uint16_t)(read_bits(bd_l) << (P->bit_depth - bd_l));
      if (has_chroma) {
        int half = size >> 1;
        uint16_t* cp[2] = {O->pcm_cb, O->pcm_cr};
        for (int c = 0; c < 2; c++)
          for (int j = 0; j < half; j++)
            for (int i = 0; i < half; i++)
              cp[c][((y0 >> 1) + j) * (W >> 1) + (x0 >> 1) + i] =
                  (uint16_t)(read_bits(bd_c) << (P->bit_depth_c - bd_c));
      }
    }
    eng.seek(pos, eng.bit_end);
    if (!eng.start()) error = true;
    int n_comp = has_chroma ? 3 : 1;
    for (int c = 0; c < n_comp; c++) {
      int lg = c == 0 ? log2_size : log2_size - 1;
      emit_tu(c, c == 0 ? x0 : x0 >> 1, c == 0 ? y0 : y0 >> 1, lg, 0, 0, 0, 0,
              0, 1);
    }
  }

  // ---- transform tree ----
  void transform_tree(int x0, int y0, int xb, int yb, int log2_size, int depth,
                      int blk_idx, bool pcb, bool pcr) {
    if (error) return;
    bool split;
    if (log2_size <= P->max_tb_log2 && log2_size > P->min_tb_log2 &&
        depth < max_trafo_depth && !(intra_split && depth == 0)) {
      split = eng.decode_bin(CTX_SPLIT_TRANSFORM + (5 - log2_size));
    } else {
      split = log2_size > P->max_tb_log2 || (intra_split && depth == 0);
    }
    bool cbf_cb = pcb, cbf_cr = pcr;
    if (log2_size > 2 && has_chroma) {
      cbf_cb = (depth == 0 || pcb) ? eng.decode_bin(CTX_CBF_CHROMA + depth) : false;
      cbf_cr = (depth == 0 || pcr) ? eng.decode_bin(CTX_CBF_CHROMA + depth) : false;
    } else if (!has_chroma) {
      cbf_cb = cbf_cr = false;
    }
    if (split) {
      int half = 1 << (log2_size - 1);
      transform_tree(x0, y0, x0, y0, log2_size - 1, depth + 1, 0, cbf_cb, cbf_cr);
      transform_tree(x0 + half, y0, x0, y0, log2_size - 1, depth + 1, 1, cbf_cb, cbf_cr);
      transform_tree(x0, y0 + half, x0, y0, log2_size - 1, depth + 1, 2, cbf_cb, cbf_cr);
      transform_tree(x0 + half, y0 + half, x0, y0, log2_size - 1, depth + 1, 3,
                     cbf_cb, cbf_cr);
      return;
    }
    bool cbf_luma = eng.decode_bin(CTX_CBF_LUMA + (depth == 0 ? 1 : 0));
    transform_unit(x0, y0, xb, yb, log2_size, depth, blk_idx, cbf_luma, cbf_cb,
                   cbf_cr);
  }

  void emit_tu(int comp, int x, int y, int lg, int cbf, int mode, int qp,
               int skip, int scan, int pcm) {
    int n = *O->tu_count;
    if (n >= O->max_tu) {
      error = true;
      return;
    }
    int32_t* row = O->tu_table + n * TU_FIELDS;
    row[TU_COMP] = comp;
    row[TU_X] = x;
    row[TU_Y] = y;
    row[TU_LOG2] = lg;
    row[TU_CBF] = cbf;
    row[TU_PRED] = mode;
    row[TU_QP] = qp;
    row[TU_SKIP] = skip;
    row[TU_BYPASS] = cu_bypass ? 1 : 0;
    row[TU_SCAN] = scan;
    row[TU_PCM] = pcm;
    *O->tu_count = n + 1;
    if (comp == 0 && !pcm) {
      int g4x = x >> 2, g4y = y >> 2, s4 = 1 << (lg - 2);
      for (int j = 0; j < s4; j++) O->vert_edges[(g4y + j) * g4w + g4x] = 1;
      for (int i = 0; i < s4; i++) O->horiz_edges[g4y * g4w + g4x + i] = 1;
    }
  }

  void decode_cu_qp_delta() {
    is_cu_qp_delta_coded = true;
    if (!eng.decode_bin(CTX_CU_QP_DELTA)) return;
    int prefix = 1;
    while (prefix < 5 && eng.decode_bin(CTX_CU_QP_DELTA + 1)) prefix++;
    int val = prefix == 5 ? prefix + (int)eng.decode_egk_bypass(0) : prefix;
    if (eng.bypass_overflow) {
      error = true;
      return;
    }
    if (val > 0 && eng.decode_bypass()) val = -val;
    cu_qp_delta_val = val;
  }

  void transform_unit(int x0, int y0, int xb, int yb, int log2_size, int depth,
                      int blk_idx, bool cbf_luma, bool cbf_cb, bool cbf_cr) {
    bool chroma_here = log2_size > 2;
    bool last_of_quad = log2_size == 2 && blk_idx == 3;
    bool any_cbf = cbf_luma || cbf_cb || cbf_cr;
    if (any_cbf && P->cu_qp_delta_enabled && !is_cu_qp_delta_coded)
      decode_cu_qp_delta();

    int qp_y = current_qp_y();
    int qp_prime_y = qp_y + qp_bd_y;  // Qp'Y (§8.6.1), the dequant QP
    int mode_y = im_y(x0 >> 2, y0 >> 2);
    int skip_y = 0;
    if (cbf_luma && P->transform_skip_enabled && !cu_bypass && log2_size == 2)
      skip_y = eng.decode_bin(CTX_TSKIP_LUMA);
    int scan_y = intra_scan_idx(log2_size, mode_y, 0);
    emit_tu(0, x0, y0, log2_size, cbf_luma, mode_y, qp_prime_y, skip_y, scan_y, 0);
    if (cbf_luma) residual_coding(x0, y0, log2_size, 0, scan_y);

    if (has_chroma && (chroma_here || last_of_quad)) {
      int xc = (chroma_here ? x0 : xb) >> 1;
      int yc = (chroma_here ? y0 : yb) >> 1;
      int lg_c = log2_size > 2 ? log2_size - 1 : 2;
      int mode_c = cu_chroma_mode;
      int qcb = chroma_qp_from_luma(qp_y, P->cb_qp_offset, qp_bd_c);
      int qcr = chroma_qp_from_luma(qp_y, P->cr_qp_offset, qp_bd_c);
      int scan_c = intra_scan_idx(lg_c, mode_c, 1);
      const bool cbfs[2] = {cbf_cb, cbf_cr};
      const int qps[2] = {qcb, qcr};
      for (int ci = 0; ci < 2; ci++) {
        int comp = ci + 1;
        int skip_c = 0;
        if (cbfs[ci] && P->transform_skip_enabled && !cu_bypass && lg_c == 2)
          skip_c = eng.decode_bin(CTX_TSKIP_CHROMA);
        emit_tu(comp, xc, yc, lg_c, cbfs[ci], mode_c, qps[ci], skip_c, scan_c, 0);
        if (cbfs[ci]) residual_coding(xc, yc, lg_c, comp, scan_c);
      }
    }
  }

  // ---- residual coding ----

  void residual_coding(int x0, int y0, int log2_size, int c_idx, int scan_idx) {
    int size = 1 << log2_size;
    int cmax = (log2_size << 1) - 1;
    int ctx_off, ctx_shift;
    if (c_idx == 0) {
      ctx_off = 3 * (log2_size - 2) + ((log2_size - 1) >> 2);
      ctx_shift = (log2_size + 1) >> 2;
    } else {
      ctx_off = 15;
      ctx_shift = log2_size - 2;
    }
    auto last_prefix = [&](int base) {
      int k = 0;
      while (k < cmax && eng.decode_bin(base + ctx_off + (k >> ctx_shift))) k++;
      return k;
    };
    int px = last_prefix(CTX_LAST_X);
    int py = last_prefix(CTX_LAST_Y);
    auto last_value = [&](int prefix) {
      if (prefix <= 3) return prefix;
      int n = (prefix >> 1) - 1;
      int suffix = (int)eng.decode_bypass_bits(n);
      return ((2 + (prefix & 1)) << n) + suffix;
    };
    int last_x = last_value(px);
    int last_y = last_value(py);
    if (scan_idx == 2) {
      int t = last_x;
      last_x = last_y;
      last_y = t;
    }

    int sb_size = size >> 2;
    int sb_log2 = log2_size - 2;
    const Scan& cs = scans[scan_idx][0];
    const Scan& ss = sb_scans[scan_idx][sb_log2];

    int last_sb = ss.pos[last_y >> 2][last_x >> 2];
    int last_pos = cs.pos[last_y & 3][last_x & 3];

    uint8_t csbf[64];
    memset(csbf, 0, (size_t)sb_size * sb_size);
    int32_t* plane = coeff_plane(c_idx);
    int pw = plane_w(c_idx);
    bool sign_hiding = P->sign_hiding && !cu_bypass;
    int prev_g1_ctx = -1;  // -1 = none yet in this TB

    for (int i = last_sb; i >= 0; i--) {
      int xs = ss.x[i], ys = ss.y[i];
      int infer_dc = 0;
      int sb_coded;
      if (i < last_sb && i > 0) {
        int ctx = 0;
        if (xs + 1 < sb_size && csbf[ys * sb_size + xs + 1]) ctx = 1;
        if (ys + 1 < sb_size && csbf[(ys + 1) * sb_size + xs]) ctx = 1;
        sb_coded = eng.decode_bin(CTX_CSBF + ctx + (c_idx ? 2 : 0));
        csbf[ys * sb_size + xs] = (uint8_t)sb_coded;
        infer_dc = 1;
      } else {
        csbf[ys * sb_size + xs] = 1;
        sb_coded = 1;
      }
      if (!sb_coded) continue;

      // per-subblock sig context base (§9.3.4.2.5): the csbf-neighbor
      // pattern and the (c_idx, size, scan, subblock) offset are constant
      // across the 16 positions, so the per-coefficient ctx is one table
      // lookup. DC (xc+yc==0) overrides to sc=0.
      int sig_base = CTX_SIG + (c_idx ? 27 : 0);
      const uint8_t* pat = nullptr;
      int base_add = 0;
      bool dc_sb = xs == 0 && ys == 0;
      if (log2_size == 2) {
        pat = kSigCtx4x4;
      } else {
        int prev = 0;
        if (xs + 1 < sb_size && csbf[ys * sb_size + xs + 1]) prev |= 1;
        if (ys + 1 < sb_size && csbf[(ys + 1) * sb_size + xs]) prev |= 2;
        pat = kSigCtxPat[prev];
        if (c_idx == 0) {
          base_add = (xs + ys > 0 ? 3 : 0) +
                     (log2_size == 3 ? (scan_idx == 0 ? 9 : 15) : 21);
        } else {
          base_add = log2_size == 3 ? 9 : 12;
        }
      }

      uint8_t sig[16] = {0};
      int start_n = i == last_sb ? last_pos - 1 : 15;
      if (i == last_sb) sig[last_pos] = 1;
      for (int n = start_n; n >= 0; n--) {
        if (n > 0 || !infer_dc) {
          int xp = cs.x[n], yp = cs.y[n];
          int ctx;
          if (log2_size == 2) {
            ctx = sig_base + pat[(yp << 2) + xp];
          } else if (dc_sb && xp + yp == 0) {
            ctx = sig_base;  // DC coefficient
          } else {
            ctx = sig_base + base_add + pat[(yp << 2) + xp];
          }
          int b = eng.decode_bin(ctx);
          sig[n] = (uint8_t)b;
          if (b) infer_dc = 0;
        } else {
          sig[n] = 1;
        }
      }

      int sig_pos[16], n_sig = 0;
      for (int n = 15; n >= 0; n--)
        if (sig[n]) sig_pos[n_sig++] = n;
      if (!n_sig) continue;

      int ctx_set = (i == 0 || c_idx > 0) ? 0 : 2;
      if (prev_g1_ctx == 0) ctx_set++;
      int greater1_ctx = 1;
      int g1[16];
      for (int k = 0; k < 16; k++) g1[k] = -1;  // -1 = not decoded
      int last_g1_pos = -1;
      int n_g1 = 0;
      for (int k = 0; k < n_sig; k++) {
        int n = sig_pos[k];
        if (n_g1 < 8) {
          int inc = ctx_set * 4 + (greater1_ctx < 3 ? greater1_ctx : 3) +
                    (c_idx ? 16 : 0);
          int b = eng.decode_bin(CTX_G1 + inc);
          g1[n] = b;
          n_g1++;
          if (b) {
            if (last_g1_pos == -1) last_g1_pos = n;
            greater1_ctx = 0;
          } else if (greater1_ctx > 0) {
            greater1_ctx++;
          }
        }
      }
      prev_g1_ctx = greater1_ctx;

      int g2_flag = 0;
      if (last_g1_pos >= 0)
        g2_flag = eng.decode_bin(CTX_G2 + ctx_set + (c_idx ? 4 : 0));

      int first_sig = sig_pos[n_sig - 1];
      int last_sig = sig_pos[0];
      bool hidden = sign_hiding && (last_sig - first_sig) > 3;
      // signs are consecutive bypass bins (scan order, hidden sign is the
      // LAST of the iteration) -> one multi-bit bypass read
      int signs[16] = {0};
      bool has_sign[16] = {false};
      int nbits = n_sig - (hidden ? 1 : 0);
      uint32_t sign_bits = eng.decode_bypass_bits(nbits);
      for (int k = 0; k < nbits; k++) {
        int n = sig_pos[k];
        signs[n] = (sign_bits >> (nbits - 1 - k)) & 1;
        has_sign[n] = true;
      }

      int rice = 0;
      int64_t sum_abs = 0;
      int levels[16];
      for (int k = 0; k < n_sig; k++) {
        int n = sig_pos[k];
        int base = 1, limit = 1;
        if (g1[n] >= 0) {
          base += g1[n];
          limit = 2;
          if (g1[n] && n == last_g1_pos) {
            base += g2_flag;
            limit = 3;
          }
        }
        int level = base;
        if (base == limit) {
          // prefix > 31 cannot occur on conformant streams (levels
          // are 16-bit); larger values would overflow the shift below,
          // so both twins reject them as desync
          int prefix = eng.decode_bypass_unary(32);
          if (prefix > 31) {
            error = true;
            return;
          }
          int rem;
          if (prefix < 3) {
            rem = (prefix << rice) + (rice ? (int)eng.decode_bypass_bits(rice) : 0);
          } else {
            int nbits = prefix - 3 + rice;
            int64_t suffix = (int64_t)eng.decode_bypass_bits(nbits);
            rem = (int)((((1ll << (prefix - 3)) + 2) << rice) + suffix);
          }
          level = base + rem;
          if (level > (3 << rice) && rice < 4) rice++;
        }
        levels[n] = level;
        sum_abs += level;
      }

      for (int k = 0; k < n_sig; k++) {
        int n = sig_pos[k];
        int xp = cs.x[n], yp = cs.y[n];
        int xc = x0 + (xs << 2) + xp;
        int yc = y0 + (ys << 2) + yp;
        int level = levels[n];
        if (has_sign[n]) {
          if (signs[n]) level = -level;
        } else if (sum_abs & 1) {
          level = -level;
        }
        plane[yc * pw + xc] = level;
      }
    }
  }
};

}  // namespace

extern "C" {

// returns 0 ok, 1 stream desync, 2 unsupported chroma format
int heif_entropy_decode_tile(const uint8_t* rbsp, int32_t rbsp_len,
                             const int32_t* substream_offsets,
                             int32_t n_substreams, const TileParams* params,
                             TileOutput* out) {
  Decoder d;
  d.P = params;
  d.O = out;
  d.rbsp = rbsp;
  d.rbsp_len = rbsp_len;
  d.sub_off = substream_offsets;
  d.n_sub = n_substreams;
  *out->tu_count = 0;
  return d.decode();
}

// tiles_enabled_flag=1 variant: tile_col_bd/[n_tile_cols+1] and
// tile_row_bd/[n_tile_rows+1] are the CTB boundaries of §6.5.1 (PPS
// tile geometry); substream i is tile i's byte range. Same returns.
int heif_entropy_decode_tile_tiled(
    const uint8_t* rbsp, int32_t rbsp_len,
    const int32_t* substream_offsets, int32_t n_substreams,
    const TileParams* params, const int32_t* tile_col_bd,
    int32_t n_tile_cols, const int32_t* tile_row_bd, int32_t n_tile_rows,
    TileOutput* out) {
  Decoder d;
  d.P = params;
  d.O = out;
  d.rbsp = rbsp;
  d.rbsp_len = rbsp_len;
  d.sub_off = substream_offsets;
  d.n_sub = n_substreams;
  d.tile_col_bd = tile_col_bd;
  d.tile_row_bd = tile_row_bd;
  d.n_tcols = n_tile_cols;
  d.n_trows = n_tile_rows;
  *out->tu_count = 0;
  return d.decode();
}

// ---------------------------------------------------------------------------
// Native per-tile packing: tu_table + coeff planes -> device-ready class
// blocks and scan-field arrays (the host pack is on the decode critical
// path on 2-core tunneled hosts; doing the block gathers here keeps them
// at memcpy speed, GIL-free, inside the per-tile worker threads).
// Layout contract mirrors heif_tpu/ops/batch.py pack_batch / CLASSES.
// ---------------------------------------------------------------------------

namespace {
// CLASSES order: (comp, log2) -> class index 0..9; -1 = not a class
inline int class_index(int comp, int log2) {
  if (log2 < 2) return -1;
  if (comp == 0) return log2 <= 5 ? log2 - 2 : -1;
  if (log2 > 4) return -1;  // chroma max 16 in 4:2:0
  return 4 + (comp - 1) * 3 + (log2 - 2);
}

// intra ref-smoothing threshold by log2 (8.4.4.2.3); size 4 never filters
inline int filter_flag(int size, int mode, int log2) {
  if (mode == 1 || size == 4) return 0;
  if (mode == 0) return 1;
  int d26 = mode > 26 ? mode - 26 : 26 - mode;
  int d10 = mode > 10 ? mode - 10 : 10 - mode;
  int min_dist = d26 < d10 ? d26 : d10;
  static const int thres[6] = {99, 99, 99, 7, 1, 0};
  return min_dist > thres[log2];
}
}  // namespace

int heif_pack_counts(const int32_t* tu, int32_t n_tu, int32_t* cls_counts,
                     int32_t* scan_counts) {
  for (int i = 0; i < 10; i++) cls_counts[i] = 0;
  for (int c = 0; c < 3; c++) scan_counts[c] = 0;
  for (int32_t i = 0; i < n_tu; i++) {
    const int32_t* row = tu + i * TU_FIELDS;
    scan_counts[row[TU_COMP]]++;
    if (row[TU_CBF] && !row[TU_PCM]) {
      int ci = class_index(row[TU_COMP], row[TU_LOG2]);
      if (ci >= 0) cls_counts[ci]++;
    }
  }
  return 0;
}

int heif_pack_tile(const int32_t* tu, int32_t n_tu,
                   const int32_t* const* coeff_planes,  // [3]
                   int32_t W, int32_t H, int32_t pad,
                   int16_t* const* cls_coeffs,   // [10] -> [k*s*s]
                   int32_t* const* cls_meta,     // [10] -> [4*k]: qp,skip,bypass,org rows
                   int32_t* const* scan_fields,  // [3] -> [6*m]: x,y,size,mode,filter,pcm rows
                   const int32_t* cls_counts,    // [10] (from heif_pack_counts)
                   const int32_t* scan_counts) { // [3]
  (void)H;
  int32_t ci_pos[10] = {0};
  int32_t sc_pos[3] = {0};
  for (int32_t i = 0; i < n_tu; i++) {
    const int32_t* row = tu + i * TU_FIELDS;
    int comp = row[TU_COMP];
    int log2 = row[TU_LOG2];
    int size = 1 << log2;
    int x = row[TU_X], y = row[TU_Y];
    // scan fields
    {
      int32_t m = scan_counts[comp];
      int32_t p = sc_pos[comp]++;
      int32_t* f = scan_fields[comp];
      f[0 * m + p] = x;
      f[1 * m + p] = y;
      f[2 * m + p] = size;
      f[3 * m + p] = row[TU_PRED];
      f[4 * m + p] = comp == 0 ? filter_flag(size, row[TU_PRED], log2) : 0;
      f[5 * m + p] = row[TU_PCM];
    }
    if (!row[TU_CBF] || row[TU_PCM]) continue;
    int ci = class_index(comp, log2);
    if (ci < 0) continue;
    int32_t k = cls_counts[ci];
    int32_t p = ci_pos[ci]++;
    int32_t* meta = cls_meta[ci];
    int cw = comp == 0 ? W : W >> 1;
    meta[0 * k + p] = row[TU_QP];
    meta[1 * k + p] = row[TU_SKIP] != 0;
    meta[2 * k + p] = row[TU_BYPASS] != 0;
    meta[3 * k + p] = y * (cw + pad) + x;  // local org; caller adds tile term
    const int32_t* plane = coeff_planes[comp];
    int16_t* dst = cls_coeffs[ci] + (size_t)p * size * size;
    for (int r = 0; r < size; r++) {
      const int32_t* src = plane + (size_t)(y + r) * cw + x;
      for (int cc = 0; cc < size; cc++) dst[r * size + cc] = (int16_t)src[cc];
    }
  }
  return 0;
}

int heif_entropy_abi_version() { return 4; }

}  // extern "C"
