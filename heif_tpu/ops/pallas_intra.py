"""Pallas TPU kernels for the sequential intra-prediction stage.

Design (v2). One grid program walks the TU worklists of TWO tiles in
lockstep ("chains"); each chain keeps its reconstruction plane (and a
transposed copy, so left reference columns become row reads) in VMEM for
the whole walk. The two chains are data-independent, so the per-step
vector/matrix ops of chain B fill the latency stalls of chain A's serial
dependency chain (measured ~1.4x over one chain per program). The chroma
kernel runs FOUR chains per program: Cb and Cr share TU geometry and
intra mode (HEVC signals one intra_chroma_pred_mode per PU), so one
worklist pass predicts both planes of both tiles.

Per-step costs that the v1 kernel paid and v3 does not:
- prediction used one dense [32x32x256] f32 multiply-reduce per TU
  (~256 vregs) regardless of TU size; v2 branched per size class, with
  the 4x4 weights (77% of TUs in the sample) resident in VMEM and an
  async HBM fetch only for the rare 8/16/32 classes; v3 additionally
  moves the matvec onto the MXU as s row dots (refb bf16 x W[r]^T),
  which kills both the (s, s, 256) f32 stack temporaries (1 MB at s=32)
  and the VPU cross-lane reduction.
- every step DMA'd a 512 KB weight slab from HBM (~18 GB per 12-tile
  chunk); v2+ moves 8 KB / 128 KB / 512 KB only when the TU size needs it.

Memory plan (v3): residual planes live in HBM (pl.ANY) and are DMA'd
into VMEM scratch once per program; the worklist tensors (meta/src)
stream through fixed WIN_S-step VMEM windows, so VMEM use is INDEPENDENT
of the worklist length (which varies per image chunk — slab-residency
blew the 16 MB scoped budget at long worklists). Outputs are written
back by one DMA at the end. Two luma chains (planes, transposes,
windows, shared weight buffers) total ~8 MB of VMEM.

Mosaic alignment strategy: every VMEM access uses starts aligned to
(8, 128); arbitrary TU positions are reached by loading an aligned
superset window and shifting with one-hot matmuls (dy in 0..7 sublanes,
dx in 0..127 lanes).

The XLA lax.scan formulation in ops.jax_recon is the portable reference;
bit-exact equivalence is tested in interpret mode and against libde265 on
real TPU. PCM tiles fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heif_tpu.ops import jax_recon as J
from heif_tpu.ops import pack as P

MAX_S = P.MAX_TU
REF_LEN = P.REF_LEN
N_REF = 2 * REF_LEN  # 130
PAD = J.PAD
SPAD = J.SPAD

# meta columns
M_TX, M_TY, M_SIZE, M_LOG2, M_MODE, M_FILT, M_WIDX, M_ACTIVE = range(8)

WIN = 192  # lane window for strip extraction (covers off<=127 + 65)
RMW_R = 40  # row window for block RMW (dy<=7 + 32)
RMW_C = 160  # lane window for block RMW (dx<=127 + 32)


def _round_up(x, m):
    return -(-x // m) * m


def geometry_ok(h: int, w: int) -> bool:
    """True when the aligned-superset windows of the intra kernels stay
    inside the padded plane allocations for an (h, w) component plane.

    Every VMEM access here loads an (8, WIN) / (RMW_R, RMW_C) superset
    anchored at (r//8*8, c//128*128); on small planes those windows run
    past the allocation (e.g. WIN=192 over a 32-wide chroma plane's
    wp=128), which Mosaic does not bounds-check — decodes of small
    pictures through the Pallas path were silently wrong on real TPU
    (caught by the device-gen entropy path validation, round 5). The
    XLA scan path covers rejected geometries.
    """
    hp = _round_up(1 + h + SPAD, 8)
    wp = _round_up(1 + w + SPAD, 128)
    hpT = hp if hp % 128 == 0 else _round_up(hp, 128)
    # TU origins satisfy 0 <= t < dim - 3 (min TU size 4); strips anchor
    # at the origin, RMWs at origin + 1
    rmax_s, cmax_s = h - 4, w - 4
    rmax_m, cmax_m = h - 3, w - 3

    def fits(r, c, rows, cols, H, W):
        return (r // 8) * 8 + rows <= H and (c // 128) * 128 + cols <= W

    return (
        # plane (hp, wp): top strips + block RMW/load
        fits(rmax_s, cmax_s, 8, WIN, hp, wp)
        and fits(rmax_m, cmax_m, RMW_R, RMW_C, hp, wp)
        # transposed plane (wp, hpT): left strips + transposed RMW
        and fits(cmax_s, rmax_s, 8, WIN, wp, hpT)
        and fits(cmax_m, rmax_m, RMW_R, RMW_C, wp, hpT)
    )


N_REF_PAD = 256  # lane-aligned padded ref-vector length


def _meta_windows(meta):
    """[n, s, 8] -> [n, s/WIN_S, WIN_S, 128] window-blocked, lane-padded.

    The DMA engine requires the minormost (lane) dim to be a multiple of
    128; meta is built on device (ops.batch._meta_from_xs), so the pad
    costs HBM bytes only, never host-link transfer."""
    n, s, _ = meta.shape
    meta = jnp.pad(meta, ((0, 0), (0, 0), (0, 128 - 8)))
    return meta.reshape(n, s // WIN_S, WIN_S, 128)


def _src_windows(src):
    """[n, s, 256] -> [n, s/WIN_S, WIN_S, 256]."""
    n, s, _ = src.shape
    return src.reshape(n, s // WIN_S, WIN_S, N_REF_PAD)


def _weights_bf16() -> np.ndarray:
    # weights <= 64 and references <= 255 are exact in bf16; the MXU
    # accumulates in f32, so the matvec is integer-exact
    import ml_dtypes

    w = J._PRED_W_NP.astype(np.float32).reshape(
        35 * 4, MAX_S, MAX_S, N_REF
    )
    out = np.zeros(
        (35 * 4, MAX_S, MAX_S, N_REF_PAD), ml_dtypes.bfloat16
    )
    out[:, :, :, :N_REF] = w  # [widx, row, col, ref] (lane dim = ref, 256)
    return out


_W_NP = None
_W4_NP = None


def _get_weights():
    # numpy, not jnp: a np constant lowers instantly, while a device array
    # captured in a trace costs a tunnel D2H fetch at lowering time
    global _W_NP
    if _W_NP is None:
        _W_NP = _weights_bf16()
    return _W_NP


def _get_w4():
    """VMEM-resident 4x4 weight table: [mode, 4, 4, 256] bf16 (~280 KB)."""
    global _W4_NP, _W_NP
    if _W4_NP is None:
        if _W_NP is None:
            _W_NP = _weights_bf16()
        _W4_NP = np.ascontiguousarray(
            _W_NP.reshape(35, 4, MAX_S, MAX_S, N_REF_PAD)[:, 0, :4, :4, :]
        )
    return _W4_NP


def _f32(x):
    return x.astype(jnp.float32)


# --------------------------------------------------------------------------
# shared step helpers (closed over nothing; pure shape-static ops)
# --------------------------------------------------------------------------


def _strip_from(buf, r, c):
    """buf[r, c : c + 65] via aligned superset load (one row)."""
    r_al = (r // 8) * 8
    c_al = (c // 128) * 128
    win = buf[pl.ds(r_al, 8), pl.ds(c_al, WIN)]  # (8, WIN)
    rsel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r - r_al
    row = jnp.where(rsel, win, 0).sum(axis=0, keepdims=True)  # (1, WIN)
    off = c - c_al
    lane = jax.lax.broadcasted_iota(jnp.int32, (WIN, REF_LEN), 0)
    tgt = jax.lax.broadcasted_iota(jnp.int32, (WIN, REF_LEN), 1)
    sel = (lane == tgt + off).astype(jnp.float32)
    return jnp.dot(
        _f32(row), sel, preferred_element_type=jnp.float32
    ).astype(jnp.int32)  # (1, 65)


def _rmw_store(buf, r, c, blk, size):
    """buf[r:r+size, c:c+size] = blk[:size,:size] via aligned RMW."""
    r_al = (r // 8) * 8
    c_al = (c // 128) * 128
    dy = r - r_al
    dx = c - c_al
    region = buf[pl.ds(r_al, RMW_R), pl.ds(c_al, RMW_C)]
    sr = (
        jax.lax.broadcasted_iota(jnp.int32, (RMW_R, MAX_S), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (RMW_R, MAX_S), 1) + dy
    ).astype(jnp.float32)
    sc = (
        jax.lax.broadcasted_iota(jnp.int32, (MAX_S, RMW_C), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (MAX_S, RMW_C), 0) + dx
    ).astype(jnp.float32)
    placed = jnp.dot(
        jnp.dot(sr, _f32(blk), preferred_element_type=jnp.float32),
        sc,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    ir = jax.lax.broadcasted_iota(jnp.int32, (RMW_R, RMW_C), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (RMW_R, RMW_C), 1)
    m = (ir >= dy) & (ir < dy + size) & (ic >= dx) & (ic < dx + size)
    buf[pl.ds(r_al, RMW_R), pl.ds(c_al, RMW_C)] = jnp.where(m, placed, region)


def _block_load(buf, r, c):
    """buf[r:r+32, c:c+32] via aligned superset load."""
    r_al = (r // 8) * 8
    c_al = (c // 128) * 128
    dy = r - r_al
    dx = c - c_al
    region = buf[pl.ds(r_al, RMW_R), pl.ds(c_al, RMW_C)]
    sre = (
        jax.lax.broadcasted_iota(jnp.int32, (MAX_S, RMW_R), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (MAX_S, RMW_R), 0) + dy
    ).astype(jnp.float32)
    sce = (
        jax.lax.broadcasted_iota(jnp.int32, (RMW_C, MAX_S), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (RMW_C, MAX_S), 1) + dx
    ).astype(jnp.float32)
    return jnp.dot(
        jnp.dot(sre, _f32(region), preferred_element_type=jnp.float32),
        sce,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _row_from(arr_ref, i, width, dtype=jnp.int32):
    """arr_ref[i, :width] via sublane-aligned superset load + row select."""
    i_al = (i // 8) * 8
    win = arr_ref[pl.ds(i_al, 8), :].astype(dtype)  # (8, lanes)
    ssel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == i - i_al
    row = jnp.where(ssel, win, 0).sum(axis=0, keepdims=True)
    return row[:, :width]  # (1, width)


def _substitute(local, src_row, oh):
    """Apply the availability/substitution map: refs[j] = local[src[j]]."""
    refs = jnp.dot(
        _f32(local), oh, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    return jnp.where(src_row >= N_REF, 128, refs)


def _mxu_rows(refb, row_fn, s: int):
    """Prediction block via s MXU row dots: row r = refb · W[r]^T.

    refb: (1, N_REF_PAD) bf16 reference vector; row_fn(r) -> (s, N_REF_PAD)
    bf16 weight slice for output row r. Returns (s, s) f32, integer-exact
    (|w| <= 64 and refs <= 255 are exact in bf16; each product is formed
    in full precision and accumulated in f32; |sum| < 2^24). Replaces the
    old broadcast-multiply + 256-lane reduction, which both materialized
    an (s, s, 256) f32 temporary on the kernel stack (1 MB at s=32 — a
    major part of the round-2 scoped-VMEM blowup) and serialized on the
    VPU's cross-lane adds.
    """
    rows = [
        jax.lax.dot_general(
            refb, row_fn(r), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for r in range(s)
    ]
    return jnp.concatenate(rows, axis=0)  # (s, s)


def _pred_by_size(size, widx, refb, w_hbm, w4_ref, wbuf8, wbuf16, wbuf32,
                  pred_buf, bias_ref, shift_ref, sem, max_size: int):
    """Per-size-class prediction matvec into pred_buf (32x32 scratch).

    4x4 weights come from the VMEM-resident table; 8/16/32 are DMA'd from
    HBM only when that class occurs. pred_buf content outside
    [0:size, 0:size] is stale/garbage — callers mask by size.
    """
    bias = bias_ref[widx]
    shift = shift_ref[widx]
    mode = widx // 4

    @pl.when(size == 4)
    def _():
        acc = _mxu_rows(refb, lambda r: w4_ref[mode, r], 4)
        pred_buf[0:4, :] = jnp.pad(
            (acc.astype(jnp.int32) + bias) >> shift, ((0, 0), (0, MAX_S - 4))
        )

    @pl.when(size == 8)
    def _():
        cp = pltpu.make_async_copy(
            w_hbm.at[widx, pl.ds(0, 8), pl.ds(0, 8)], wbuf8, sem
        )
        cp.start()
        cp.wait()
        acc = _mxu_rows(refb, lambda r: wbuf8[r], 8)
        pred_buf[0:8, :] = jnp.pad(
            (acc.astype(jnp.int32) + bias) >> shift, ((0, 0), (0, MAX_S - 8))
        )

    @pl.when(size == 16)
    def _():
        cp = pltpu.make_async_copy(
            w_hbm.at[widx, pl.ds(0, 16), pl.ds(0, 16)], wbuf16, sem
        )
        cp.start()
        cp.wait()
        acc = _mxu_rows(refb, lambda r: wbuf16[r], 16)
        pred_buf[0:16, :] = jnp.pad(
            (acc.astype(jnp.int32) + bias) >> shift, ((0, 0), (0, MAX_S - 16))
        )

    if max_size >= 32:
        @pl.when(size == 32)
        def _():
            cp = pltpu.make_async_copy(w_hbm.at[widx], wbuf32, sem)
            cp.start()
            cp.wait()
            acc = _mxu_rows(refb, lambda r: wbuf32[r], 32)
            pred_buf[...] = (acc.astype(jnp.int32) + bias) >> shift


def _filter_refs_kernel(left, top, size, filt, strong_smoothing: bool,
                        iota65):
    """§8.4.4.2.3 luma reference smoothing, branchless on (1, 65) strips."""
    n2 = 2 * size
    corner = left[0, 0]
    bi = jnp.bool_(False)
    if strong_smoothing:
        thr = 8
        bi = (
            (size == 32)
            & (jnp.abs(corner + top[0, 64] - 2 * top[0, 32]) < thr)
            & (jnp.abs(corner + left[0, 64] - 2 * left[0, 32]) < thr)
        )
    l_m1 = jnp.concatenate([left[:, :1], left[:, :-1]], axis=1)
    l_p1 = jnp.concatenate([left[:, 1:], left[:, -1:]], axis=1)
    t_m1 = jnp.concatenate([top[:, :1], top[:, :-1]], axis=1)
    t_p1 = jnp.concatenate([top[:, 1:], top[:, -1:]], axis=1)
    lf = (l_m1 + 2 * left + l_p1 + 2) >> 2
    tf = (t_m1 + 2 * top + t_p1 + 2) >> 2
    corner_f = (left[0, 1] + 2 * corner + top[0, 1] + 2) >> 2
    lf = jnp.where(iota65 == 0, corner_f, lf)
    tf = jnp.where(iota65 == 0, corner_f, tf)
    lf = jnp.where(iota65 >= n2, left, lf)
    tf = jnp.where(iota65 >= n2, top, tf)
    tb = jnp.where(
        (iota65 >= 1) & (iota65 <= 63),
        ((63 - (iota65 - 1)) * corner + iota65 * top[0, 64] + 32) >> 6,
        top,
    )
    lb = jnp.where(
        (iota65 >= 1) & (iota65 <= 63),
        ((63 - (iota65 - 1)) * corner + iota65 * left[0, 64] + 32) >> 6,
        left,
    )
    tb = jnp.where(iota65 == 0, corner, tb)
    lb = jnp.where(iota65 == 0, corner, lb)
    use = filt > 0
    left = jnp.where(use, jnp.where(bi, lb, lf), left)
    top = jnp.where(use, jnp.where(bi, tb, tf), top)
    return left, top


def _luma_fixups(pred, left, top, size, log2, mode, iota65, rr32, cc32):
    """DC boundary smoothing + mode 10/26 edge compensation (luma only)."""
    msk = (iota65 >= 1) & (iota65 <= size)
    dc = (jnp.sum(jnp.where(msk, left + top, 0)) + size) >> (log2 + 1)
    dc_smooth = (size < 32) & (mode == 1)
    top_row_f = (top[:, 1 : MAX_S + 1] + 3 * dc + 2) >> 2
    left_col_f = (left[:, 1 : MAX_S + 1] + 3 * dc + 2) >> 2
    corner_v = (left[0, 1] + 2 * dc + top[0, 1] + 2) >> 2
    pred = jnp.where(dc_smooth & (rr32 == 0), top_row_f, pred)
    pred = jnp.where(
        dc_smooth & (cc32 == 0) & (rr32 > 0),
        left_col_f.reshape(MAX_S, 1),
        pred,
    )
    pred = jnp.where(dc_smooth & (rr32 == 0) & (cc32 == 0), corner_v, pred)
    v_edge = (size < 32) & (mode == 26)
    h_edge = (size < 32) & (mode == 10)
    delta_v = jnp.clip(
        top[0, 1] + ((left[:, 1 : MAX_S + 1] - left[0, 0]) >> 1), 0, 255
    )
    delta_h = jnp.clip(
        left[0, 1] + ((top[:, 1 : MAX_S + 1] - top[0, 0]) >> 1), 0, 255
    )
    pred = jnp.where(v_edge & (cc32 == 0), delta_v.reshape(MAX_S, 1), pred)
    pred = jnp.where(h_edge & (rr32 == 0), delta_h, pred)
    return pred


# --------------------------------------------------------------------------
# luma kernel: 2 tiles per program, residuals preloaded into the planes
# --------------------------------------------------------------------------
#
# The reconstruction plane doubles as the residual buffer: the wrapper
# shifts the residual plane to the +1 origin and the kernel DMAs it (and
# its transpose) straight into the VMEM plane scratch. Each TU reads its
# residual block from the plane right before overwriting that region with
# reconstructed samples — TU regions are disjoint, and reference strips
# only ever *select* positions the z-order availability analysis marked
# decoded, so residual values at not-yet-decoded positions are never
# consumed. This removes the separate residual VMEM slabs (~2.8 MB for a
# luma pair) that previously pushed the kernel over the 16 MB VMEM budget.


WIN_S = 512  # worklist window length (steps DMA'd into VMEM at a time)


def _kernel_luma(counts_ref, bias_ref, shift_ref, meta_hbm, src_hbm,
                 res_hbm, resT_hbm, w_hbm, w4_ref, out_ref,
                 plane_a, planeT_a, plane_b, planeT_b,
                 vsrc_a, vsrc_b, vmeta_a, vmeta_b,
                 wbuf8, wbuf16, wbuf32, pred_a, pred_b,
                 sem_in, sem_w, sem_win, sem_out,
                 *, n_steps: int, strong_smoothing: bool):
    pid = pl.program_id(0)
    ta = 2 * pid
    tb = 2 * pid + 1

    # residual-preloaded planes into VMEM; worklists stream in WIN_S-step
    # windows inside the walk, so VMEM use is independent of the worklist
    # length (which varies per image chunk and blew the scoped budget
    # when slab-resident).
    cps = [
        pltpu.make_async_copy(res_hbm.at[ta], plane_a, sem_in),
        pltpu.make_async_copy(resT_hbm.at[ta], planeT_a, sem_in),
        pltpu.make_async_copy(res_hbm.at[tb], plane_b, sem_in),
        pltpu.make_async_copy(resT_hbm.at[tb], planeT_b, sem_in),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    iota65 = jax.lax.broadcasted_iota(jnp.int32, (1, REF_LEN), 1)
    rr32 = jax.lax.broadcasted_iota(jnp.int32, (MAX_S, MAX_S), 0)
    cc32 = jax.lax.broadcasted_iota(jnp.int32, (MAX_S, MAX_S), 1)
    pad0 = jnp.zeros((1, N_REF_PAD - N_REF), jnp.int32)
    bi_nref = jax.lax.broadcasted_iota(jnp.int32, (N_REF, N_REF), 0)

    def load_window(widx):
        # both worklists are window-blocked 4D on the host side, so one
        # integer index selects a window — no dynamic-offset alignment
        # proof needed for the DMA engine
        wcps = [
            pltpu.make_async_copy(src_hbm.at[ta, widx], vsrc_a, sem_win),
            pltpu.make_async_copy(src_hbm.at[tb, widx], vsrc_b, sem_win),
            pltpu.make_async_copy(meta_hbm.at[ta, widx], vmeta_a, sem_win),
            pltpu.make_async_copy(meta_hbm.at[tb, widx], vmeta_b, sem_win),
        ]
        for cp in wcps:
            cp.start()
        for cp in wcps:
            cp.wait()

    def chain(slot, j, plane, planeT, vsrc, vmeta, wb8, wb16, wb32, predb,
              sem):
        tx = vmeta[j, M_TX]
        ty = vmeta[j, M_TY]
        size = vmeta[j, M_SIZE]
        log2 = vmeta[j, M_LOG2]
        mode = vmeta[j, M_MODE]
        filt = vmeta[j, M_FILT]
        widx = vmeta[j, M_WIDX]
        active = vmeta[j, M_ACTIVE]

        top = _strip_from(plane, ty, tx)
        left = _strip_from(planeT, tx, ty)
        local = jnp.concatenate([left, top], axis=1)  # (1, 130)
        src_row = _row_from(vsrc, j, N_REF)
        oh = (bi_nref == jnp.broadcast_to(src_row, (N_REF, N_REF))).astype(
            jnp.float32
        )
        refs = _substitute(local, src_row, oh)
        left, top = refs[:, :REF_LEN], refs[:, REF_LEN:]
        left, top = _filter_refs_kernel(
            left, top, size, filt, strong_smoothing, iota65
        )
        refb = jnp.concatenate([left, top, pad0], axis=1).astype(
            jnp.bfloat16
        )
        _pred_by_size(size, widx, refb, w_hbm, w4_ref, wb8, wb16, wb32,
                      predb, bias_ref, shift_ref, sem, max_size=32)
        pred = _luma_fixups(
            predb[...], left, top, size, log2, mode, iota65, rr32, cc32
        )
        # residual still lives in the plane at this TU's (+1) region
        res = _block_load(plane, ty + 1, tx + 1)
        new = jnp.clip(pred + res, 0, 255)
        eff = jnp.where(active > 0, size, 0)
        _rmw_store(plane, ty + 1, tx + 1, new, eff)
        _rmw_store(planeT, tx + 1, ty + 1, new.T, eff)

    def body(i, _):
        @pl.when(i % WIN_S == 0)
        def _():
            load_window(i // WIN_S)

        j = i % WIN_S
        # the weight-fetch buffers are SHARED between the chains: they are
        # touched only in the rare 8/16/32 size classes (77% of TUs are
        # 4x4, served from the VMEM-resident w4 table), each chain waits
        # for its own DMA before reading, and the body runs the chains
        # sequentially — so sharing costs a serialization only when both
        # chains hit a large TU on the same step, and saves 672 KB of VMEM
        # (the round-2 kernel was 108 KB over the 16 MB scoped limit).
        chain(0, j, plane_a, planeT_a, vsrc_a, vmeta_a, wbuf8, wbuf16,
              wbuf32, pred_a, sem_w)
        chain(1, j, plane_b, planeT_b, vsrc_b, vmeta_b, wbuf8, wbuf16,
              wbuf32, pred_b, sem_w)
        return 0

    trip = jnp.minimum(
        jnp.maximum(counts_ref[ta, 0], counts_ref[tb, 0]), n_steps
    )
    lax.fori_loop(0, trip, body, 0)

    # write the +1-origin reconstructed planes back over the residual input
    oa = pltpu.make_async_copy(plane_a, out_ref.at[ta], sem_out)
    oa.start()
    ob = pltpu.make_async_copy(plane_b, out_ref.at[tb], sem_out)
    ob.start()
    oa.wait()
    ob.wait()


def _shift_res(res, n, hp, wp, hpT):
    """Pad + shift residual planes to the +1 plane origin, and transpose.

    res: [n, rh, rw] (rh/rw = h+PAD lane-padded). Returns (res_shift
    [n, hp, wp], resT [n, wp, hpT]) with res[y, x] at [1+y, 1+x].
    """
    rh = min(res.shape[1], hp - 1)
    rw = min(res.shape[2], wp - 1)
    res_shift = jnp.zeros((n, hp, wp), res.dtype)
    res_shift = res_shift.at[:, 1 : 1 + rh, 1 : 1 + rw].set(
        res[:, :rh, :rw]
    )
    resT = jnp.swapaxes(res_shift, 1, 2)  # (n, wp, hp)
    if hpT != hp:
        resT = jnp.pad(resT, ((0, 0), (0, 0), (0, hpT - hp)))
    return res_shift, resT


def intra_scan_pallas(
    res, meta, src, h: int, w: int, is_luma: bool = True,
    strong_smoothing: bool = False, interpret: bool = False, counts=None,
):
    """Run the luma intra walk for all tiles (2 tiles per grid program).

    res: [N, hr, wr] int32 residual planes; meta: [N, S, 8] int32 per-step
    scalars; src: [N, S, 2, 65] uint8 local reference-source indices.
    counts: optional [N] int32 real TU count per tile (loop bound).
    Returns [N, h, w] int32 reconstructed planes.
    """
    assert is_luma, "chroma goes through intra_scan_pallas_chroma2"
    n, s_steps = meta.shape[0], meta.shape[1]
    if counts is None:
        counts = jnp.full((n,), s_steps, jnp.int32)
    counts = counts.astype(jnp.int32).reshape(n, 1)
    # lane-pad the src table: HBM->VMEM window DMA needs 128-aligned lanes
    src = jnp.pad(
        src.reshape(n, s_steps, N_REF),
        ((0, 0), (0, 0), (0, N_REF_PAD - N_REF)),
    )
    # step-pad worklists to whole windows (kernel streams WIN_S at a time)
    s_pad = _round_up(s_steps, WIN_S)
    if s_pad != s_steps:
        meta = jnp.pad(meta, ((0, 0), (0, s_pad - s_steps), (0, 0)))
        src = jnp.pad(src, ((0, 0), (0, s_pad - s_steps), (0, 0)))
    s_steps = s_pad
    hp = _round_up(1 + h + SPAD, 8)
    wp = _round_up(1 + w + SPAD, 128)
    hpT = hp if hp % 128 == 0 else _round_up(hp, 128)
    if n % 2:
        res = jnp.pad(res, ((0, 1), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, 1), (0, 0), (0, 0)))
        src = jnp.pad(src, ((0, 1), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, 1), (0, 0)))
    npad = res.shape[0]
    res_shift, resT = _shift_res(res, npad, hp, wp, hpT)
    wtab = _get_weights()
    w4 = _get_w4()
    bias = np.ascontiguousarray(J._PRED_B_NP.reshape(-1))
    shift = np.ascontiguousarray(J._PRED_SH_NP.reshape(-1))
    kernel = partial(
        _kernel_luma, n_steps=s_steps, strong_smoothing=strong_smoothing
    )
    out = pl.pallas_call(
        kernel,
        grid=(npad // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts [n,1]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shift
            pl.BlockSpec(memory_space=pltpu.ANY),  # meta (window DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # src (window DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # res_shift (-> plane)
            pl.BlockSpec(memory_space=pltpu.ANY),  # resT (-> planeT)
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w4 table
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((npad, hp, wp), jnp.int32),
        input_output_aliases={5: 0},
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),   # plane_a
            pltpu.VMEM((wp, hpT), jnp.int32),  # planeT_a
            pltpu.VMEM((hp, wp), jnp.int32),   # plane_b
            pltpu.VMEM((wp, hpT), jnp.int32),  # planeT_b
            pltpu.VMEM((WIN_S, N_REF_PAD), jnp.uint8),  # vsrc_a
            pltpu.VMEM((WIN_S, N_REF_PAD), jnp.uint8),  # vsrc_b
            pltpu.VMEM((WIN_S, 128), jnp.int32),  # vmeta_a
            pltpu.VMEM((WIN_S, 128), jnp.int32),  # vmeta_b
            pltpu.VMEM((8, 8, N_REF_PAD), jnp.bfloat16),    # wbuf8 (shared)
            pltpu.VMEM((16, 16, N_REF_PAD), jnp.bfloat16),  # wbuf16 (shared)
            pltpu.VMEM((MAX_S, MAX_S, N_REF_PAD), jnp.bfloat16),  # wbuf32
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_a
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_b
            pltpu.SemaphoreType.DMA,  # sem_in
            pltpu.SemaphoreType.DMA,  # sem_w (shared weight fetches)
            pltpu.SemaphoreType.DMA,  # sem_win (worklist windows)
            pltpu.SemaphoreType.DMA,  # sem_out
        ],
        interpret=interpret,
    )(counts, bias, shift, _meta_windows(meta), _src_windows(src),
      res_shift, resT, wtab, w4)
    return out[:n, 1 : 1 + h, 1 : 1 + w]


# --------------------------------------------------------------------------
# chroma kernel: 2 tiles x (Cb, Cr) = 4 chains per program
# --------------------------------------------------------------------------


def _kernel_chroma(counts_ref, bias_ref, shift_ref, meta_hbm, src_hbm,
                   rcb_hbm, rcbT_hbm, rcr_hbm, rcrT_hbm, w_hbm, w4_ref,
                   outcb_ref, outcr_ref,
                   plane_ba, planeT_ba, plane_ra, planeT_ra,
                   plane_bb, planeT_bb, plane_rb, planeT_rb,
                   vsrc_a, vsrc_b, vmeta_a, vmeta_b, wbuf8, wbuf16,
                   pred_ba, pred_ra, pred_bb, pred_rb,
                   sem_in, sem_w, sem_win, sem_out, *, n_steps: int):
    pid = pl.program_id(0)
    ta = 2 * pid
    tb = 2 * pid + 1

    cps = [
        pltpu.make_async_copy(rcb_hbm.at[ta], plane_ba, sem_in),
        pltpu.make_async_copy(rcbT_hbm.at[ta], planeT_ba, sem_in),
        pltpu.make_async_copy(rcr_hbm.at[ta], plane_ra, sem_in),
        pltpu.make_async_copy(rcrT_hbm.at[ta], planeT_ra, sem_in),
        pltpu.make_async_copy(rcb_hbm.at[tb], plane_bb, sem_in),
        pltpu.make_async_copy(rcbT_hbm.at[tb], planeT_bb, sem_in),
        pltpu.make_async_copy(rcr_hbm.at[tb], plane_rb, sem_in),
        pltpu.make_async_copy(rcrT_hbm.at[tb], planeT_rb, sem_in),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    pad0 = jnp.zeros((1, N_REF_PAD - N_REF), jnp.int32)
    bi_nref = jax.lax.broadcasted_iota(jnp.int32, (N_REF, N_REF), 0)

    def load_window(widx):
        # both worklists are window-blocked 4D on the host side, so one
        # integer index selects a window — no dynamic-offset alignment
        # proof needed for the DMA engine
        wcps = [
            pltpu.make_async_copy(src_hbm.at[ta, widx], vsrc_a, sem_win),
            pltpu.make_async_copy(src_hbm.at[tb, widx], vsrc_b, sem_win),
            pltpu.make_async_copy(meta_hbm.at[ta, widx], vmeta_a, sem_win),
            pltpu.make_async_copy(meta_hbm.at[tb, widx], vmeta_b, sem_win),
        ]
        for cp in wcps:
            cp.start()
        for cp in wcps:
            cp.wait()

    def tile_pair(slot, j, plane_b_, planeT_b_, plane_r_, planeT_r_,
                  vsrc, vmeta, wb8, wb16, predb, predr, sem):
        """One step for one tile's Cb+Cr chains (shared worklist/mode)."""
        tx = vmeta[j, M_TX]
        ty = vmeta[j, M_TY]
        size = vmeta[j, M_SIZE]
        widx = vmeta[j, M_WIDX]
        active = vmeta[j, M_ACTIVE]

        top_b = _strip_from(plane_b_, ty, tx)
        left_b = _strip_from(planeT_b_, tx, ty)
        top_r = _strip_from(plane_r_, ty, tx)
        left_r = _strip_from(planeT_r_, tx, ty)
        src_row = _row_from(vsrc, j, N_REF)
        oh = (bi_nref == jnp.broadcast_to(src_row, (N_REF, N_REF))).astype(
            jnp.float32
        )
        refs_b = _substitute(
            jnp.concatenate([left_b, top_b], axis=1), src_row, oh
        )
        refs_r = _substitute(
            jnp.concatenate([left_r, top_r], axis=1), src_row, oh
        )
        refb_b = jnp.concatenate([refs_b, pad0], axis=1).astype(
            jnp.bfloat16
        )
        refb_r = jnp.concatenate([refs_r, pad0], axis=1).astype(
            jnp.bfloat16
        )
        # one weight fetch serves both chroma chains (same mode/size)
        _pred_by_size(size, widx, refb_b, w_hbm, w4_ref, wb8, wb16, None,
                      predb, bias_ref, shift_ref, sem, max_size=16)
        bias = bias_ref[widx]
        shift = shift_ref[widx]
        mode = widx // 4

        @pl.when(size == 4)
        def _():
            acc = _mxu_rows(refb_r, lambda r: w4_ref[mode, r], 4)
            predr[0:4, :] = jnp.pad(
                (acc.astype(jnp.int32) + bias) >> shift,
                ((0, 0), (0, MAX_S - 4)),
            )

        @pl.when(size == 8)
        def _():
            acc = _mxu_rows(refb_r, lambda r: wb8[r], 8)
            predr[0:8, :] = jnp.pad(
                (acc.astype(jnp.int32) + bias) >> shift,
                ((0, 0), (0, MAX_S - 8)),
            )

        @pl.when(size == 16)
        def _():
            acc = _mxu_rows(refb_r, lambda r: wb16[r], 16)
            predr[0:16, :] = jnp.pad(
                (acc.astype(jnp.int32) + bias) >> shift,
                ((0, 0), (0, MAX_S - 16)),
            )

        res_b = _block_load(plane_b_, ty + 1, tx + 1)
        res_r = _block_load(plane_r_, ty + 1, tx + 1)
        new_b = jnp.clip(predb[...] + res_b, 0, 255)
        new_r = jnp.clip(predr[...] + res_r, 0, 255)
        eff = jnp.where(active > 0, size, 0)
        _rmw_store(plane_b_, ty + 1, tx + 1, new_b, eff)
        _rmw_store(planeT_b_, tx + 1, ty + 1, new_b.T, eff)
        _rmw_store(plane_r_, ty + 1, tx + 1, new_r, eff)
        _rmw_store(planeT_r_, tx + 1, ty + 1, new_r.T, eff)

    def body(i, _):
        @pl.when(i % WIN_S == 0)
        def _():
            load_window(i // WIN_S)

        j = i % WIN_S
        tile_pair(0, j, plane_ba, planeT_ba, plane_ra, planeT_ra,
                  vsrc_a, vmeta_a, wbuf8, wbuf16, pred_ba, pred_ra, sem_w)
        tile_pair(1, j, plane_bb, planeT_bb, plane_rb, planeT_rb,
                  vsrc_b, vmeta_b, wbuf8, wbuf16, pred_bb, pred_rb, sem_w)
        return 0

    trip = jnp.minimum(
        jnp.maximum(counts_ref[ta, 0], counts_ref[tb, 0]), n_steps
    )
    lax.fori_loop(0, trip, body, 0)

    for plane, out, t in ((plane_ba, outcb_ref, ta), (plane_ra, outcr_ref, ta),
                          (plane_bb, outcb_ref, tb), (plane_rb, outcr_ref, tb)):
        cp = pltpu.make_async_copy(plane, out.at[t], sem_out)
        cp.start()
        cp.wait()


def intra_scan_pallas_chroma2(
    res_cb, res_cr, meta, src, h: int, w: int,
    interpret: bool = False, counts=None,
):
    """Merged Cb+Cr intra walk over all tiles (2 tiles per program).

    res_cb/res_cr: [N, hr, wr] int32 chroma residual planes; meta/src as in
    intra_scan_pallas (identical for both chroma components — HEVC shares
    chroma intra mode and TU geometry). Returns (cb, cr) [N, h, w] planes.
    """
    n, s_steps = meta.shape[0], meta.shape[1]
    if counts is None:
        counts = jnp.full((n,), s_steps, jnp.int32)
    counts = counts.astype(jnp.int32).reshape(n, 1)
    # lane-pad the src table: HBM->VMEM window DMA needs 128-aligned lanes
    src = jnp.pad(
        src.reshape(n, s_steps, N_REF),
        ((0, 0), (0, 0), (0, N_REF_PAD - N_REF)),
    )
    s_pad = _round_up(s_steps, WIN_S)
    if s_pad != s_steps:
        meta = jnp.pad(meta, ((0, 0), (0, s_pad - s_steps), (0, 0)))
        src = jnp.pad(src, ((0, 0), (0, s_pad - s_steps), (0, 0)))
    s_steps = s_pad
    hp = _round_up(1 + h + SPAD, 8)
    wp = _round_up(1 + w + SPAD, 128)
    hpT = hp if hp % 128 == 0 else _round_up(hp, 128)
    if n % 2:
        res_cb = jnp.pad(res_cb, ((0, 1), (0, 0), (0, 0)))
        res_cr = jnp.pad(res_cr, ((0, 1), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, 1), (0, 0), (0, 0)))
        src = jnp.pad(src, ((0, 1), (0, 0), (0, 0)))
        counts = jnp.pad(counts, ((0, 1), (0, 0)))
    npad = res_cb.shape[0]
    rcb, rcbT = _shift_res(res_cb, npad, hp, wp, hpT)
    rcr, rcrT = _shift_res(res_cr, npad, hp, wp, hpT)
    wtab = _get_weights()
    w4 = _get_w4()
    bias = np.ascontiguousarray(J._PRED_B_NP.reshape(-1))
    shift = np.ascontiguousarray(J._PRED_SH_NP.reshape(-1))
    kernel = partial(_kernel_chroma, n_steps=s_steps)
    plane_vmem = [
        pltpu.VMEM((hp, wp), jnp.int32),
        pltpu.VMEM((wp, hpT), jnp.int32),
    ] * 4
    out = pl.pallas_call(
        kernel,
        grid=(npad // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.SMEM),  # shift
            pl.BlockSpec(memory_space=pltpu.ANY),  # meta (window DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # src (window DMA)
            pl.BlockSpec(memory_space=pltpu.ANY),  # res_cb
            pl.BlockSpec(memory_space=pltpu.ANY),  # res_cbT
            pl.BlockSpec(memory_space=pltpu.ANY),  # res_cr
            pl.BlockSpec(memory_space=pltpu.ANY),  # res_crT
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w4
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((npad, hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((npad, hp, wp), jnp.int32),
        ),
        input_output_aliases={5: 0, 7: 1},
        scratch_shapes=plane_vmem + [
            pltpu.VMEM((WIN_S, N_REF_PAD), jnp.uint8),  # vsrc_a
            pltpu.VMEM((WIN_S, N_REF_PAD), jnp.uint8),  # vsrc_b
            pltpu.VMEM((WIN_S, 128), jnp.int32),  # vmeta_a
            pltpu.VMEM((WIN_S, 128), jnp.int32),  # vmeta_b
            pltpu.VMEM((8, 8, N_REF_PAD), jnp.bfloat16),    # wbuf8 (shared)
            pltpu.VMEM((16, 16, N_REF_PAD), jnp.bfloat16),  # wbuf16 (shared)
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_ba
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_ra
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_bb
            pltpu.VMEM((MAX_S, MAX_S), jnp.int32),  # pred_rb
            pltpu.SemaphoreType.DMA,  # sem_in
            pltpu.SemaphoreType.DMA,  # sem_w
            pltpu.SemaphoreType.DMA,  # sem_win
            pltpu.SemaphoreType.DMA,  # sem_out
        ],
        interpret=interpret,
    )(counts, bias, shift, _meta_windows(meta), _src_windows(src),
      rcb, rcbT, rcr, rcrT, wtab, w4)
    return out[0][:n, 1 : 1 + h, 1 : 1 + w], out[1][:n, 1 : 1 + h, 1 : 1 + w]


def build_meta(xs_fields) -> np.ndarray:
    """Assemble the [N, S, 8] meta array from packed per-step fields."""
    x, y, size, mode, filt, pcm = xs_fields[:6]
    n, s_steps = x.shape
    meta = np.zeros((n, s_steps, 8), dtype=np.int32)
    meta[:, :, M_TX] = x
    meta[:, :, M_TY] = y
    meta[:, :, M_SIZE] = size
    log2 = np.zeros_like(size)
    for lg, sz in ((2, 4), (3, 8), (4, 16), (5, 32)):
        log2[size == sz] = lg
    meta[:, :, M_LOG2] = log2
    meta[:, :, M_MODE] = mode
    meta[:, :, M_FILT] = filt
    meta[:, :, M_WIDX] = mode * 4 + np.maximum(log2 - 2, 0)
    meta[:, :, M_ACTIVE] = (size > 0).astype(np.int32)
    return meta
