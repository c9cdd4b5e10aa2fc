"""Batched multi-tile reconstruction: one jitted program for N tiles.

Layout strategy (TPU-first):
- transform classes are flattened ACROSS tiles: each (component, size)
  class becomes one dense [Ntotal, s, s] batch -> two int32 matmuls,
  scattered into per-tile residual planes by precomputed flat indices.
- the three component scans are vmapped over the tile axis: each scan
  step processes all N tiles' k-th TU simultaneously (VPU-wide).
- deblock/SAO vectorized passes are vmapped over tiles.

All shapes are static given (n_tiles, per-component scan lengths,
per-class totals); jit caches per shape signature.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from heif_tpu.ops import jax_recon as J
from heif_tpu.ops import pack as P

PAD = J.PAD

# fixed class list: (comp, size)
CLASSES = [
    (0, 4), (0, 8), (0, 16), (0, 32),
    (1, 4), (1, 8), (1, 16),
    (2, 4), (2, 8), (2, 16),
]


@dataclass
class BatchPlan:
    n: int
    width: int
    height: int
    # per class: dict keyed by (comp,size)
    tc_coeffs: dict
    tc_qp: dict
    tc_dst: dict
    tc_skip: dict
    tc_bypass: dict
    # per-BLOCK flat scatter origin into [N*(h+PAD)*(w+PAD)]; the device
    # expands to per-sample indices (origin + iy*stride + ix) — shipping
    # one int32 per block instead of size^2 keeps the host->device
    # transfer (the tunnel bottleneck) ~20x smaller for this tensor
    tc_org: dict
    scaling: dict
    # scans: per comp tuple of [N, S, ...] arrays
    xs: list
    counts: list  # per comp [N] int32 real TU counts (scan trip bounds)
    pcm: list  # per comp [N, h+PAD, w+PAD] int32 (or None)
    # loop filter meta, stacked [N, ...]
    qp_map: np.ndarray
    nf_map: np.ndarray
    vert_edges: np.ndarray
    horiz_edges: np.ndarray
    sao: np.ndarray
    ctb_log2: int
    deblock_disabled: bool
    sao_luma: bool
    sao_chroma: bool
    beta_off: int
    tc_off: int
    cb_qp_off: int
    cr_qp_off: int
    strong_smoothing: bool
    bit_depth_y: int = 8
    bit_depth_c: int = 8


def pack_batch(
    syntaxes, sps, pps, slices, n_steps=None, class_caps=None
) -> BatchPlan:
    """Pack N tiles (same SPS/PPS geometry) into one BatchPlan.

    n_steps / class_caps: optional shared shape overrides so several
    chunks of one image compile to identical programs (see
    reconstruct_pipelined). class_caps maps (comp, size) -> padded block
    count; padding rows are all-zero (zero coeffs scatter zero residual
    at flat index 0, a no-op).
    """
    from heif_tpu.utils.hostmem import tune_allocator

    tune_allocator()
    # shared per-component scan lengths
    counts = np.stack(
        [np.bincount(st.tu_table[:, 0], minlength=3) for st in syntaxes]
    )
    if n_steps is None:
        n_steps = [max(1, -(-int(s) // 64) * 64) for s in counts.max(axis=0)]

    from concurrent.futures import ThreadPoolExecutor

    import os

    with ThreadPoolExecutor(
        max_workers=min(len(syntaxes), os.cpu_count() or 4)
    ) as ex:
        plans = list(
            ex.map(
                lambda a: P.pack_tile(
                    a[0], sps, pps, a[1].header, n_steps, with_src=False
                ),
                zip(syntaxes, slices),
            )
        )
    n = len(plans)
    H, W = plans[0].height, plans[0].width
    Hc, Wc = H // 2, W // 2

    tc_coeffs, tc_qp, tc_dst, tc_skip, tc_bypass, tc_org = (
        {}, {}, {}, {}, {}, {},
    )
    for comp, size in CLASSES:
        blocks, qps, dsts, skips, byps, orgs = [], [], [], [], [], []
        h = H if comp == 0 else Hc
        w = W if comp == 0 else Wc
        stride = (h + PAD) * (w + PAD)
        for ti, plan in enumerate(plans):
            for tc in plan.tclasses:
                if tc.comp == comp and tc.size == size:
                    blocks.append(tc.coeffs)
                    qps.append(tc.qp)
                    dsts.append(tc.dst)
                    skips.append(tc.skip)
                    byps.append(tc.bypass)
                    oy = tc.pos[:, 0].astype(np.int32)
                    ox = tc.pos[:, 1].astype(np.int32)
                    orgs.append(
                        np.int32(ti * stride) + oy * np.int32(w + PAD) + ox
                    )
        cap = None if class_caps is None else class_caps.get((comp, size), 0)
        if blocks or cap:
            k = (comp, size)
            tc_coeffs[k] = (
                np.concatenate(blocks)
                if blocks
                else np.zeros((0, size, size), np.int16)
            )
            tc_qp[k] = np.concatenate(qps) if qps else np.zeros(0, np.int32)
            tc_dst[k] = np.concatenate(dsts) if dsts else np.zeros(0, bool)
            tc_skip[k] = np.concatenate(skips) if skips else np.zeros(0, bool)
            tc_bypass[k] = np.concatenate(byps) if byps else np.zeros(0, bool)
            tc_org[k] = (
                np.concatenate(orgs) if orgs else np.zeros(0, np.int32)
            )
            if cap is not None:
                have = tc_coeffs[k].shape[0]
                assert have <= cap, f"class {k}: {have} > cap {cap}"
                padn = cap - have
                if padn:
                    tc_coeffs[k] = np.concatenate(
                        [tc_coeffs[k], np.zeros((padn, size, size), np.int16)]
                    )
                    tc_qp[k] = np.concatenate([tc_qp[k], np.zeros(padn, np.int32)])
                    tc_dst[k] = np.concatenate([tc_dst[k], np.zeros(padn, bool)])
                    tc_skip[k] = np.concatenate([tc_skip[k], np.zeros(padn, bool)])
                    tc_bypass[k] = np.concatenate(
                        [tc_bypass[k], np.zeros(padn, bool)]
                    )
                    # -1 routes cap-padding blocks to the dummy scatter slot
                    tc_org[k] = np.concatenate(
                        [tc_org[k], np.full(padn, -1, np.int32)]
                    )

    xs = []
    counts = []
    for c in range(3):
        fields = []
        for name in ("x", "y", "size", "mode", "filter_flag", "pcm"):
            fields.append(np.stack([getattr(p.comp_plans[c], name) for p in plans]))
        xs.append(tuple(fields))
        counts.append(
            np.asarray([p.comp_plans[c].n_real for p in plans], np.int32)
        )

    pcm = []
    any_pcm = any(p.pcm_planes and p.pcm_planes[0].any() for p in plans)
    for c in range(3):
        h = H if c == 0 else Hc
        w = W if c == 0 else Wc
        if any_pcm:
            arr = np.zeros((n, h + PAD, w + PAD), dtype=np.int32)
            for i, p in enumerate(plans):
                arr[i, :h, :w] = p.pcm_planes[c]
            pcm.append(arr)
        else:
            pcm.append(None)

    p0 = plans[0]
    return BatchPlan(
        n=n,
        width=W,
        height=H,
        tc_coeffs=tc_coeffs,
        tc_qp=tc_qp,
        tc_dst=tc_dst,
        tc_skip=tc_skip,
        tc_bypass=tc_bypass,
        tc_org=tc_org,
        scaling=p0.scaling,
        xs=xs,
        counts=counts,
        pcm=pcm,
        qp_map=np.stack([p.qp_map for p in plans]),
        nf_map=np.stack([p.nf_map for p in plans]),
        vert_edges=np.stack([p.vert_edges for p in plans]),
        horiz_edges=np.stack([p.horiz_edges for p in plans]),
        sao=np.stack([p.sao for p in plans]).astype(np.int32),
        ctb_log2=sps.ctb_log2_size_y,
        deblock_disabled=p0.deblock_disabled,
        sao_luma=p0.sao_luma,
        sao_chroma=p0.sao_chroma,
        beta_off=p0.beta_off,
        tc_off=p0.tc_off,
        cb_qp_off=p0.cb_qp_off,
        cr_qp_off=p0.cr_qp_off,
        strong_smoothing=bool(sps.strong_intra_smoothing_enabled_flag),
        bit_depth_y=sps.bit_depth_y,
        bit_depth_c=sps.bit_depth_c,
    )


# --------------------------------------------------------------------------
# jitted core
# --------------------------------------------------------------------------


def _meta_from_xs(xs_c):
    """[N, S, 8] pallas meta tensor from the packed per-step fields."""
    x, y, size, mode, filt, _pcm = xs_c[:6]
    log2 = (
        (size == 4) * 2 + (size == 8) * 3 + (size == 16) * 4 + (size == 32) * 5
    )
    widx = mode * 4 + jnp.maximum(log2 - 2, 0)
    active = (size > 0).astype(jnp.int32)
    return jnp.stack(
        [x, y, size, log2, mode, filt, widx, active], axis=-1
    ).astype(jnp.int32)


def _core(
    tc_arrays,  # dict (comp,size) -> (coeffs, qp, dst, skip, bypass, org)
    scaling,  # dict (size, comp) -> matrix
    xs,  # list of 3 tuples of [N, S, ...]
    counts,  # tuple of 3 [N] int32 real TU counts
    pcm,  # list of 3 ([N,h+PAD,w+PAD] or None)
    qp_map, nf_map, vert_edges, horiz_edges, sao,
    *,
    n, H, W, ctb_log2, deblock_disabled, sao_luma, sao_chroma,
    beta_off, tc_off, cb_qp_off, cr_qp_off, strong_smoothing, use_pallas,
    bd_y=8, bd_c=8,
):
    Hc, Wc = H // 2, W // 2
    dims = [(H, W), (Hc, Wc), (Hc, Wc)]

    # ---- stage 1: residuals ----
    # TUs are size-aligned (HEVC quadtree), so each (comp, size) class maps
    # onto a dense [n*gh*gw, size*size] slot grid: a row-scatter of whole
    # blocks (XLA lowers unique-row set() ~10x faster than the element-wise
    # scatter-add it replaces), then depth-to-space. Classes never overlap,
    # so the per-class planes just add.
    res_dense = [jnp.zeros((n, h, w), jnp.int32) for h, w in dims]
    for (comp, size), (coeffs, qp, dst, skip, bypass, org) in tc_arrays.items():
        r = J.residual_class(
            coeffs, qp, dst, skip, bypass, scaling[(size, comp)], size,
            bd_y if comp == 0 else bd_c,
        )
        h, w = dims[comp]
        gh, gw = h // size, w // size
        # recover (tile, oy, ox) from the wire-format flat origin
        stride = (h + PAD) * (w + PAD)
        ti = org // stride
        rem = org % stride
        oy = rem // (w + PAD)
        ox = rem % (w + PAD)
        slot = ti * (gh * gw) + (oy // size) * gw + (ox // size)
        # cap-padding rows (org < 0) land on a dummy trailing slot
        slot = jnp.where(org < 0, n * gh * gw, slot)
        grid = jnp.zeros((n * gh * gw + 1, size * size), jnp.int32)
        grid = grid.at[slot].set(r.reshape(-1, size * size))
        plane = (
            grid[: n * gh * gw]
            .reshape(n, gh, gw, size, size)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, h, w)
        )
        res_dense[comp] = res_dense[comp] + plane
    res = [
        jnp.pad(res_dense[c], ((0, 0), (0, PAD), (0, PAD))) for c in range(3)
    ]

    # ---- stage 2: intra scans ----
    # reference-source tables computed on device (ships ~50 B of scalars
    # per TU over the host link instead of the 130-byte uint8 table).
    # Cb and Cr share TU geometry and intra mode (HEVC signals one
    # intra_chroma_pred_mode per PU), so one chroma src table serves both.
    srcs = [
        J.ref_sources_device(
            xs[c][0], xs[c][1], xs[c][2],
            comp=c, W=W, H=H, ctb_log2=ctb_log2,
        )
        for c in range(2)
    ]
    planes = []
    if use_pallas:
        # one VMEM-resident Pallas program per tile (see ops.pallas_intra);
        # PCM tiles take the XLA path instead (pallas kernel skips PCM)
        from heif_tpu.ops import pallas_intra as PI

        planes.append(
            PI.intra_scan_pallas(
                res[0],
                _meta_from_xs(xs[0]),
                srcs[0],
                H,
                W,
                is_luma=True,
                strong_smoothing=strong_smoothing,
                counts=counts[0],
            )
        )
        cb, cr = PI.intra_scan_pallas_chroma2(
            res[1],
            res[2],
            _meta_from_xs(xs[1]),
            srcs[1],
            Hc,
            Wc,
            counts=counts[1],
        )
        planes.extend([cb, cr])
    else:
        srcs.append(srcs[1])  # Cr reuses the Cb table
        for c in range(3):
            h, w = dims[c]
            pcm_c = (
                pcm[c]
                if pcm[c] is not None
                else jnp.zeros((n, h + PAD, w + PAD), jnp.int32)
            )
            plane0 = jnp.zeros((n, 1 + h + J.SPAD, 1 + w + J.SPAD), jnp.int32)
            scan_fn = partial(
                J.intra_scan_component,
                is_luma=(c == 0),
                strong_smoothing=strong_smoothing,
                bd=bd_y if c == 0 else bd_c,
            )
            plane = jax.vmap(scan_fn)(plane0, res[c], pcm_c, xs[c] + (srcs[c],))
            planes.append(plane[:, 1 : 1 + h, 1 : 1 + w])

    # ---- stage 3: deblock ----
    if not deblock_disabled:
        ne = W // 8 - 1
        cols = 2 * jnp.arange(ne) + 2
        lv = jax.vmap(
            partial(
                J._deblock_luma_pass, beta_off=beta_off, tc_off=tc_off,
                bd=bd_y,
            )
        )
        y = lv(
            planes[0],
            vert_edges[:, :, cols],
            qp_map[:, :, cols - 1],
            qp_map[:, :, cols],
            nf_map[:, :, cols - 1],
            nf_map[:, :, cols],
        )
        qT = jnp.swapaxes(qp_map, 1, 2)
        nT = jnp.swapaxes(nf_map, 1, 2)
        hT = jnp.swapaxes(horiz_edges, 1, 2)
        y = jnp.swapaxes(
            lv(
                jnp.swapaxes(y, 1, 2),
                hT[:, :, cols],
                qT[:, :, cols - 1],
                qT[:, :, cols],
                nT[:, :, cols - 1],
                nT[:, :, cols],
            ),
            1, 2,
        )
        planes[0] = y

        nec = Wc // 8 - 1
        ccols = 4 * jnp.arange(nec) + 4
        cv = jax.vmap(
            partial(J._deblock_chroma_pass, tc_off=tc_off, bd=bd_c)
        )
        for ci, c_off in ((1, cb_qp_off), (2, cr_qp_off)):
            qp_avg = (qp_map[:, :, ccols - 1] + qp_map[:, :, ccols] + 1) >> 1
            qpc = J._onehot_take(J._CHROMA_QP_LUT, jnp.clip(qp_avg + c_off, 0, 57), 58)
            p = cv(
                planes[ci],
                vert_edges[:, :, ccols],
                qpc,
                nf_map[:, :, ccols - 1],
                nf_map[:, :, ccols],
            )
            qp_avgT = (qT[:, :, ccols - 1] + qT[:, :, ccols] + 1) >> 1
            qpcT = J._onehot_take(J._CHROMA_QP_LUT, jnp.clip(qp_avgT + c_off, 0, 57), 58)
            p = jnp.swapaxes(
                cv(
                    jnp.swapaxes(p, 1, 2),
                    hT[:, :, ccols],
                    qpcT,
                    nT[:, :, ccols - 1],
                    nT[:, :, ccols],
                ),
                1, 2,
            )
            planes[ci] = p

    # ---- stage 4: SAO ----
    if sao_luma or sao_chroma:
        out = []
        for c in range(3):
            sv = jax.vmap(
                partial(J.sao_component, bd=bd_y if c == 0 else bd_c)
            )
            enabled = sao_luma if c == 0 else sao_chroma
            if not enabled:
                out.append(planes[c])
                continue
            sub = 1 if c == 0 else 2
            cs = (1 << ctb_log2) // sub
            h, w = dims[c]

            def rep(a):
                return jnp.repeat(jnp.repeat(a, cs, 1), cs, 2)[:, :h, :w]

            stype = rep(sao[:, :, :, c, 0])
            sclass = rep(sao[:, :, :, c, 1])
            offs = jnp.stack(
                [rep(sao[:, :, :, c, 2 + i]) for i in range(4)], axis=-1
            )
            nf_pix = jnp.repeat(jnp.repeat(nf_map, 4 // sub, 1), 4 // sub, 2)[
                :, :h, :w
            ]
            out.append(sv(planes[c], stype, sclass, offs, nf_pix))
        planes = out

    out_dt = jnp.uint8 if max(bd_y, bd_c) <= 8 else jnp.uint16
    return [p.astype(out_dt) for p in planes]


_core_jit = jax.jit(
    _core,
    static_argnames=(
        "n", "H", "W", "ctb_log2", "deblock_disabled", "sao_luma", "sao_chroma",
        "beta_off", "tc_off", "cb_qp_off", "cr_qp_off", "strong_smoothing",
        "use_pallas", "bd_y", "bd_c",
    ),
)


# set to True after the first Pallas compile/launch failure in this
# process: later chunks go straight to the XLA path instead of re-paying
# the (minutes-long on tunneled hosts) failing compile every time.
_pallas_broken = False


def _pallas_ok(bp: BatchPlan) -> bool:
    """Pallas intra path: real TPU only, no PCM tiles (XLA path covers
    those), standard tile geometry."""
    import os

    if _pallas_broken:
        return False
    if os.environ.get("HEIF_TPU_NO_PALLAS"):
        return False
    if bp.bit_depth_y != 8 or bp.bit_depth_c != 8:
        # the pallas kernels carry samples through bf16 weights dots,
        # which is integer-exact only for 8-bit references
        return False
    if any(p is not None for p in bp.pcm):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dispatch_core(bp: BatchPlan):
    """Launch the jitted core asynchronously; returns device plane arrays.

    If the Pallas intra path fails to compile or launch (e.g. a VMEM
    budget regression on a new libtpu), fall back to the pure-XLA scan
    path automatically instead of aborting the decode.
    """
    global _pallas_broken

    tc_arrays = {
        k: (
            jnp.asarray(bp.tc_coeffs[k]),
            jnp.asarray(bp.tc_qp[k]),
            jnp.asarray(bp.tc_dst[k]),
            jnp.asarray(bp.tc_skip[k]),
            jnp.asarray(bp.tc_bypass[k]),
            jnp.asarray(bp.tc_org[k]),
        )
        for k in bp.tc_coeffs
    }
    scaling = {k: jnp.asarray(v) for k, v in bp.scaling.items()}
    xs = [tuple(jnp.asarray(a) for a in t) for t in bp.xs]
    counts = tuple(jnp.asarray(c) for c in bp.counts)
    pcm = [None if p is None else jnp.asarray(p) for p in bp.pcm]

    def run(use_pallas: bool):
        return _core_jit(
            tc_arrays, scaling, xs, counts, pcm,
            jnp.asarray(bp.qp_map), jnp.asarray(bp.nf_map),
            jnp.asarray(bp.vert_edges), jnp.asarray(bp.horiz_edges),
            jnp.asarray(bp.sao),
            n=bp.n, H=bp.height, W=bp.width, ctb_log2=bp.ctb_log2,
            deblock_disabled=bp.deblock_disabled,
            sao_luma=bp.sao_luma, sao_chroma=bp.sao_chroma,
            beta_off=bp.beta_off, tc_off=bp.tc_off,
            cb_qp_off=bp.cb_qp_off, cr_qp_off=bp.cr_qp_off,
            strong_smoothing=bp.strong_smoothing,
            use_pallas=use_pallas,
            bd_y=bp.bit_depth_y, bd_c=bp.bit_depth_c,
        )

    use_pallas = _pallas_ok(bp)
    if not use_pallas:
        return run(False)
    # the tunneled AOT compile service occasionally 500s transiently, so
    # retry the pallas compile once before writing the path off
    last = None
    for attempt in range(2):
        try:
            return run(True)
        except Exception as e:  # jit compiles synchronously on first call
            last = e
    _pallas_broken = True
    import sys

    import os

    limit = 20000 if os.environ.get("HEIF_TPU_DEBUG") else 300
    print(
        "heif_tpu: pallas intra path failed twice "
        f"({type(last).__name__}: {str(last)[:limit]}); "
        "falling back to the XLA scan path for this process",
        file=sys.stderr,
    )
    return run(False)


def _chunk_shapes(syntaxes, chunk: int):
    """Shared (n_steps, class_caps) over all chunks of a tile list, so
    every chunk hits the same compiled program."""
    n = len(syntaxes)
    n_chunks = -(-n // chunk)
    steps = np.zeros((n_chunks, 3), np.int64)
    caps: dict = {}
    per_chunk: list[dict] = [dict() for _ in range(n_chunks)]
    for i, st in enumerate(syntaxes):
        ci = i // chunk
        from heif_tpu.cabac import types as T

        tt = st.tu_table
        cnt = np.bincount(tt[:, T.TU_COMP], minlength=3)
        steps[ci] = np.maximum(steps[ci], cnt)
        live = (tt[:, T.TU_CBF] != 0) & (tt[:, T.TU_PCM] == 0)
        key = tt[live, T.TU_COMP] * 8 + tt[live, T.TU_LOG2]
        kc = np.bincount(key, minlength=48)
        d = per_chunk[ci]
        for comp in range(3):
            for log2 in range(2, 6):
                c = int(kc[comp * 8 + log2])
                if c:
                    k = (comp, 1 << log2)
                    d[k] = d.get(k, 0) + c
    n_steps = [max(1, -(-int(s) // 64) * 64) for s in steps.max(axis=0)]
    for d in per_chunk:
        for k, v in d.items():
            caps[k] = max(caps.get(k, 0), v)
    # round caps up to limit distinct compiled shapes across images
    caps = {k: -(-v // 256) * 256 for k, v in caps.items()}
    return n_steps, caps


def reconstruct_pipelined(
    syntaxes, sps, pps, slices, chunk: int = 12
) -> list:
    """Chunked decode pipeline: host packing of chunk k+1 overlaps device
    compute of chunk k, and device->host plane readback (the slowest link
    on tunneled TPU hosts) overlaps both. All chunks share one compiled
    program shape. Returns [Y, Cb, Cr] stacked numpy planes."""
    n = len(syntaxes)
    if n <= chunk:
        bp = pack_batch(syntaxes, sps, pps, slices)
        return [np.asarray(p) for p in _dispatch_core(bp)]
    pad = (-n) % chunk
    if pad:
        syntaxes = list(syntaxes) + [syntaxes[-1]] * pad
        slices = list(slices) + [slices[-1]] * pad
    n_steps, caps = _chunk_shapes(syntaxes, chunk)
    outs = []
    for lo in range(0, len(syntaxes), chunk):
        bp = pack_batch(
            syntaxes[lo : lo + chunk],
            sps, pps,
            slices[lo : lo + chunk],
            n_steps=n_steps,
            class_caps=caps,
        )
        planes = _dispatch_core(bp)  # async dispatch
        for p in planes:
            p.copy_to_host_async()
        outs.append(planes)
    full = [
        np.concatenate([np.asarray(o[c]) for o in outs], axis=0)[:n]
        for c in range(3)
    ]
    return full


# sticky per-geometry shape cache: grown monotonically so every chunk of
# every image with the same tile geometry converges on ONE compiled program
# (warmup absorbs the growth recompiles; steady state is a single shape).
# Bounded: oldest geometry evicted past _STICKY_MAX distinct keys, and
# reset_shape_cache() drops everything (e.g. after one outlier image has
# inflated the caps for a long-running service).
_sticky_shapes: dict = {}
_STICKY_MAX = 32


def reset_shape_cache() -> None:
    """Drop all sticky batch shapes (next decode re-derives minimal caps)."""
    _sticky_shapes.clear()


def _merge_sticky(key, n_steps, caps):
    prev = _sticky_shapes.get(key)
    if prev is not None:
        pn, pc = prev
        n_steps = [max(a, b) for a, b in zip(n_steps, pn)]
        merged = dict(pc)
        for k, v in caps.items():
            merged[k] = max(merged.get(k, 0), v)
        caps = merged
    elif len(_sticky_shapes) >= _STICKY_MAX:
        _sticky_shapes.pop(next(iter(_sticky_shapes)))
    _sticky_shapes[key] = (n_steps, dict(caps))
    return n_steps, caps


def decode_reconstruct_overlapped(
    sps, pps, slices, entropy_fn=None, chunk: int = 8, readback: bool = True
) -> list:
    """Full tile decode with host entropy overlapped against device compute.

    Entropy (C++ CABAC, threaded) for chunk k+1 runs on a background
    thread while chunk k is packed and dispatched to the TPU; plane
    readback is async and overlaps everything after the first chunk. On
    tunneled TPU hosts the device->host link (~25 MB/s) dominates, so the
    critical path is first-chunk-latency + total plane readback — chunk=8
    starts the readback stream early without multiplying compiled shapes.
    Returns [Y, Cb, Cr] stacked numpy planes for all N tiles; with
    readback=False, returns the per-chunk device arrays instead
    (list of [y, cb, cr] jax arrays — the decode-to-device serving path).
    """
    from concurrent.futures import ThreadPoolExecutor

    from heif_tpu import native

    if entropy_fn is None:
        if native.available():
            entropy_fn = lambda ps: native.decode_tiles_parallel(sps, pps, ps)
        else:
            from heif_tpu.cabac.syntax import TileSyntaxDecoder

            entropy_fn = lambda ps: [
                TileSyntaxDecoder(sps, pps, p).decode() for p in ps
            ]
    n = len(slices)
    chunks = [slices[lo : lo + chunk] for lo in range(0, n, chunk)]
    key = (
        sps.pic_width_in_luma_samples,
        sps.pic_height_in_luma_samples,
        sps.ctb_log2_size_y,
        sps.chroma_format_idc,
        sps.bit_depth_luma_minus8,
        sps.bit_depth_chroma_minus8,
        min(chunk, n),
    )
    outs = []
    # NOTE: true overlap requires the native (GIL-releasing) entropy path;
    # with the pure-Python fallback the executor serializes behind the GIL.
    ex = ThreadPoolExecutor(max_workers=1)
    try:
        futs = [ex.submit(entropy_fn, c) for c in chunks]
        cold = key not in _sticky_shapes and len(chunks) > 1
        if cold:
            # first sight of this geometry: batch shapes drift chunk to
            # chunk as TU counts grow, and every drift is a fresh multi-
            # minute AOT compile on tunneled hosts. Wait for ALL entropy
            # results and derive ONE shape for the whole image up front
            # (forfeits entropy/device overlap for this image only; the
            # sticky cache restores overlap from the next decode on).
            all_syn = []
            for fut in futs:
                got = list(fut.result())
                if len(got) < chunk:  # same padding the loop below applies
                    got += [got[-1]] * (chunk - len(got))
                all_syn.extend(got)
            n_steps, caps = _chunk_shapes(all_syn, chunk)
            _merge_sticky(key, n_steps, caps)
        for fi, fut in enumerate(futs):
            syn = list(fut.result())
            sl_chunk = list(chunks[fi])
            if len(syn) < chunk and len(chunks) > 1:
                padn = chunk - len(syn)
                syn += [syn[-1]] * padn
                sl_chunk += [sl_chunk[-1]] * padn
            n_steps, caps = _chunk_shapes(syn, len(syn))
            n_steps, caps = _merge_sticky(key, n_steps, caps)
            bp = pack_batch(
                syn, sps, pps, sl_chunk, n_steps=n_steps, class_caps=caps
            )
            planes = _dispatch_core(bp)
            if readback:
                for p in planes:
                    p.copy_to_host_async()
            outs.append(planes)
    finally:
        ex.shutdown(wait=False, cancel_futures=True)
    if not readback:
        return outs
    return [
        np.concatenate([np.asarray(o[c]) for o in outs], axis=0)[:n]
        for c in range(3)
    ]


def reconstruct_batch(bp: BatchPlan) -> list:
    """Run the jitted batched pipeline; returns [N, H, W]-style planes as
    a list [Y, Cb, Cr] of numpy arrays."""
    tc_arrays = {
        k: (
            jnp.asarray(bp.tc_coeffs[k]),
            jnp.asarray(bp.tc_qp[k]),
            jnp.asarray(bp.tc_dst[k]),
            jnp.asarray(bp.tc_skip[k]),
            jnp.asarray(bp.tc_bypass[k]),
            jnp.asarray(bp.tc_org[k]),
        )
        for k in bp.tc_coeffs
    }
    scaling = {k: jnp.asarray(v) for k, v in bp.scaling.items()}
    xs = [tuple(jnp.asarray(a) for a in t) for t in bp.xs]
    counts = tuple(jnp.asarray(c) for c in bp.counts)
    pcm = [None if p is None else jnp.asarray(p) for p in bp.pcm]
    planes = _core_jit(
        tc_arrays,
        scaling,
        xs,
        counts,
        pcm,
        jnp.asarray(bp.qp_map),
        jnp.asarray(bp.nf_map),
        jnp.asarray(bp.vert_edges),
        jnp.asarray(bp.horiz_edges),
        jnp.asarray(bp.sao),
        n=bp.n,
        H=bp.height,
        W=bp.width,
        ctb_log2=bp.ctb_log2,
        deblock_disabled=bp.deblock_disabled,
        sao_luma=bp.sao_luma,
        sao_chroma=bp.sao_chroma,
        beta_off=bp.beta_off,
        tc_off=bp.tc_off,
        cb_qp_off=bp.cb_qp_off,
        cr_qp_off=bp.cr_qp_off,
        strong_smoothing=bp.strong_smoothing,
        use_pallas=_pallas_ok(bp),
        bd_y=bp.bit_depth_y, bd_c=bp.bit_depth_c,
    )
    return [np.asarray(p) for p in planes]
