"""Pallas TPU kernel for the sequential intra-prediction stage.

One program per tile; the reconstruction plane (and a transposed copy, so
left reference columns become row reads) lives in VMEM for the whole TU
walk. Each step: aligned superset loads + one-hot shift contractions fetch
the two reference strips, substitution/smoothing run as 2-D vector ops,
prediction is a single [1024x130] matvec against the per-(mode,size)
linear weight slice (DMA'd from HBM), and the block store is an aligned
read-modify-write. No HBM round trips, no XLA loop overhead, no gathers.

Mosaic alignment strategy: every VMEM access uses starts aligned to
(8, 128); arbitrary TU positions are reached by loading an aligned
superset window and shifting with one-hot matmuls (dy in 0..7 sublanes,
dx in 0..127 lanes).

The XLA lax.scan formulation in ops.jax_recon is the portable reference;
bit-exact equivalence is tested in interpret mode. PCM tiles fall back to
the XLA path.
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


N_REF_PAD = 256  # lane-aligned padded ref-vector length


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


def _get_weights():
    # cache the host array only: caching a jnp array would capture a tracer
    # when first called inside a jit trace
    global _W_NP
    if _W_NP is None:
        _W_NP = _weights_bf16()
    return jnp.asarray(_W_NP)


def _f32(x):
    return x.astype(jnp.float32)


def _kernel(count_ref, meta_ref, src_ref, res_ref, w_hbm, bias_ref,
            shift_ref, out_ref, plane, planeT, wbuf, sem, *, n_steps: int,
            is_luma: bool, strong_smoothing: bool, hp: int, wp: int):
    plane[...] = jnp.zeros_like(plane)
    planeT[...] = jnp.zeros_like(planeT)

    iota65 = jax.lax.broadcasted_iota(jnp.int32, (1, REF_LEN), 1)
    rr32 = jax.lax.broadcasted_iota(jnp.int32, (MAX_S, MAX_S), 0)
    cc32 = jax.lax.broadcasted_iota(jnp.int32, (MAX_S, MAX_S), 1)

    def strip_from(buf, r, c):
        """buf[r, c : c + 65] via aligned superset load (one row)."""
        r_al = (r // 8) * 8
        c_al = (c // 128) * 128
        win = buf[pl.ds(r_al, 8), pl.ds(c_al, WIN)]  # (8, WIN)
        rsel = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == r - r_al
        )
        row = jnp.where(rsel, win, 0).sum(axis=0, keepdims=True)  # (1, WIN)
        off = c - c_al
        # lane extract: strip[i] = row[off + i]
        lane = jax.lax.broadcasted_iota(jnp.int32, (WIN, REF_LEN), 0)
        tgt = jax.lax.broadcasted_iota(jnp.int32, (WIN, REF_LEN), 1)
        sel = (lane == tgt + off).astype(jnp.float32)
        return jnp.dot(
            _f32(row), sel, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (1, 65)

    def rmw_store(buf, r, c, blk, size):
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
        buf[pl.ds(r_al, RMW_R), pl.ds(c_al, RMW_C)] = jnp.where(
            m, placed, region
        )

    def block_load(buf, r, c):
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

    def body(i, _):
        tx = meta_ref[0, i, M_TX]
        ty = meta_ref[0, i, M_TY]
        size = meta_ref[0, i, M_SIZE]
        log2 = meta_ref[0, i, M_LOG2]
        mode = meta_ref[0, i, M_MODE]
        filt = meta_ref[0, i, M_FILT]
        widx = meta_ref[0, i, M_WIDX]

        cp = pltpu.make_async_copy(w_hbm.at[widx], wbuf, sem)
        cp.start()

        # strips from +1-origin planes: top = plane[ty, tx:tx+65],
        # left = planeT[tx, ty:ty+65]
        top = strip_from(plane, ty, tx)
        left = strip_from(planeT, tx, ty)
        local = jnp.concatenate([left, top], axis=1)  # (1, 130)

        # sublane-aligned superset load + row select (dynamic i)
        i_al = (i // 8) * 8
        swin = src_ref[0, pl.ds(i_al, 8), :].astype(jnp.int32)  # (8, 130)
        ssel = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == i - i_al
        src_row = jnp.where(ssel, swin, 0).sum(axis=0, keepdims=True)
        # (1, 130): [left refs | top refs]; 255 = unavailable
        bi = jax.lax.broadcasted_iota(jnp.int32, (N_REF, N_REF), 0)
        oh = (bi == jnp.broadcast_to(src_row, (N_REF, N_REF))).astype(
            jnp.float32
        )  # oh[k, j] = (src_row[j] == k)
        refs = jnp.dot(
            _f32(local), oh, preferred_element_type=jnp.float32
        ).astype(jnp.int32)  # (1, 130)
        refs = jnp.where(src_row >= N_REF, 128, refs)
        left = refs[:, :REF_LEN]
        top = refs[:, REF_LEN:]

        if is_luma:
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

        refvec = jnp.concatenate(
            [left, top, jnp.zeros((1, N_REF_PAD - N_REF), jnp.int32)], axis=1
        )  # (1, 256), zero-padded to the lane-aligned weight width

        cp.wait()
        # weighted-matrix sum producing the (32, 32) block directly:
        # pred[r, c] = sum_k refvec[k] * W[widx][r, k, c]. Expressed as an
        # elementwise multiply + sublane reduction (Mosaic cannot reshape
        # (1,1024)->(32,32) or batch a zero-non-contracting-dim matmul).
        refb = _f32(refvec).reshape(1, 1, N_REF_PAD)
        acc = jnp.sum(refb * wbuf[...].astype(jnp.float32), axis=-1)
        # exact: weights<=64, refs<=255 -> products/sums < 2^24 in f32
        pred = (acc.astype(jnp.int32) + bias_ref[widx]) >> shift_ref[widx]

        # nonlinear fixups
        msk = (iota65 >= 1) & (iota65 <= size)
        dc = (jnp.sum(jnp.where(msk, left + top, 0)) + size) >> (log2 + 1)
        if is_luma:
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
            pred = jnp.where(
                dc_smooth & (rr32 == 0) & (cc32 == 0), corner_v, pred
            )
            v_edge = (size < 32) & (mode == 26)
            h_edge = (size < 32) & (mode == 10)
            delta_v = jnp.clip(
                top[0, 1] + ((left[:, 1 : MAX_S + 1] - left[0, 0]) >> 1),
                0, 255,
            )
            delta_h = jnp.clip(
                left[0, 1] + ((top[:, 1 : MAX_S + 1] - top[0, 0]) >> 1),
                0, 255,
            )
            pred = jnp.where(
                v_edge & (cc32 == 0), delta_v.reshape(MAX_S, 1), pred
            )
            pred = jnp.where(h_edge & (rr32 == 0), delta_h, pred)

        res = block_load(res_ref.at[0], ty, tx)
        new = jnp.clip(pred + res, 0, 255)
        active = meta_ref[0, i, M_ACTIVE]
        eff = jnp.where(active > 0, size, 0)
        rmw_store(plane, ty + 1, tx + 1, new, eff)
        rmw_store(planeT, tx + 1, ty + 1, new.T, eff)
        return 0

    # per-tile dynamic trip count: real TUs only (padding rows are no-ops
    # anyway, but most tiles have far fewer TUs than the padded max)
    tile = pl.program_id(0)
    lax.fori_loop(0, jnp.minimum(count_ref[tile, 0], n_steps), body, 0)
    # out block is residual-sized (and aliased with the res input buffer);
    # rows 0..rh-1 of the +1-origin plane cover the picture (1..h)
    out_ref[...] = plane[pl.ds(0, out_ref.shape[1]), :].reshape(out_ref.shape)


def intra_scan_pallas(
    res, meta, src, h: int, w: int, is_luma: bool, strong_smoothing: bool,
    interpret: bool = False, counts=None,
):
    """Run the intra walk for one component over all tiles.

    res: [N, hr, wr] int32 residual planes with hr % 8 == 0 and
    wr >= round_up(w - 4, 128) + RMW_C - 128 (544 for 512-wide tiles).
    meta: [N, S, 8] int32 per-step scalars; src: [N, S, 2, 65] uint8.
    counts: optional [N] int32 real TU count per tile (loop bound).
    Returns [N, h, w] int32 reconstructed planes.
    """
    n, s_steps = meta.shape[0], meta.shape[1]
    if counts is None:
        counts = jnp.full((n,), s_steps, jnp.int32)
    counts = counts.astype(jnp.int32).reshape(n, 1)
    src = src.reshape(n, s_steps, N_REF)  # flatten (2,65) -> 130 lanes
    hp = _round_up(1 + h + SPAD, 8)
    wp = _round_up(1 + w + SPAD, 128)
    # lane-align the residual planes (Mosaic sub-ref slicing needs it)
    rh = _round_up(res.shape[1], 8)
    rw = _round_up(res.shape[2], 128)
    if (rh, rw) != res.shape[1:]:
        res = jnp.pad(
            res, ((0, 0), (0, rh - res.shape[1]), (0, rw - res.shape[2]))
        )
    wtab = _get_weights()
    bias = jnp.asarray(J._PRED_B_NP.reshape(-1))
    shift = jnp.asarray(J._PRED_SH_NP.reshape(-1))
    kernel = partial(
        _kernel,
        n_steps=s_steps,
        is_luma=is_luma,
        strong_smoothing=strong_smoothing,
        hp=hp,
        wp=wp,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((n, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, s_steps, 8), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, s_steps, N_REF),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rh, rw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # weights stay in HBM
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rh, rw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, rh, rw), jnp.int32),
        input_output_aliases={3: 0},
        scratch_shapes=[
            pltpu.VMEM((hp, wp), jnp.int32),   # plane
            pltpu.VMEM((wp, hp if hp % 128 == 0 else _round_up(hp, 128)),
                       jnp.int32),             # planeT (lanes = rows)
            pltpu.VMEM((MAX_S, MAX_S, N_REF_PAD), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(counts, meta, src, res, wtab, bias, shift)
    return out[:, 1 : 1 + h, 1 : 1 + w]


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
