"""Stage-level device timing: transfer vs residual vs intra vs deblock vs sao."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from heif_tpu.container.reader import HeifReader, parse_grid_config
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
from heif_tpu.ops import batch as B
from heif_tpu.ops import jax_recon as J

data = open("tests/assets/halfmoonbay.heic", "rb").read()
r = HeifReader(data)
heif = r.read()
rec = heif.hevc_configuration_record()
sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
primary = heif.primary_item_id()
tile_ids = heif.item_ids_referencing(primary, "dimg")
slices = [
    sl.parse_slice_header(sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps)
    for t in tile_ids
]
syntaxes = native.decode_tiles_parallel(sps, pps, slices)

chunk = 12
n_steps, caps = B._chunk_shapes(syntaxes, chunk)
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)

# stage inputs on device once
tc_arrays = {
    k: tuple(jnp.asarray(a) for a in (bp.tc_coeffs[k], bp.tc_qp[k], bp.tc_dst[k],
                                       bp.tc_skip[k], bp.tc_bypass[k], bp.tc_org[k]))
    for k in bp.tc_coeffs
}
scaling = {k: jnp.asarray(v) for k, v in bp.scaling.items()}
xs = [tuple(jnp.asarray(a) for a in t) for t in bp.xs]
counts = tuple(jnp.asarray(c) for c in bp.counts)
pcm = [None if p is None else jnp.asarray(p) for p in bp.pcm]
rest = [jnp.asarray(a) for a in (bp.qp_map, bp.nf_map, bp.vert_edges, bp.horiz_edges, bp.sao)]
jax.block_until_ready(rest)
static = dict(n=bp.n, H=bp.height, W=bp.width, ctb_log2=bp.ctb_log2,
              deblock_disabled=bp.deblock_disabled, sao_luma=bp.sao_luma,
              sao_chroma=bp.sao_chroma, beta_off=bp.beta_off, tc_off=bp.tc_off,
              cb_qp_off=bp.cb_qp_off, cr_qp_off=bp.cr_qp_off,
              strong_smoothing=bp.strong_smoothing)

def timeit(label, f, *a, n=5):
    o = f(*a); jax.block_until_ready(o)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter(); o = f(*a); jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms")
    return o

# full core, device-resident inputs
full = jax.jit(partial(B._core, **static, use_pallas=True),
               static_argnames=())
timeit("full core (pallas)", lambda: full(tc_arrays, scaling, xs, counts, pcm, *rest))
full_x = jax.jit(partial(B._core, **static, use_pallas=False))
timeit("full core (xla)", lambda: full_x(tc_arrays, scaling, xs, counts, pcm, *rest))

# stage 1 only: residuals
def stage1(tc_arrays, scaling):
    n, H, W = bp.n, bp.height, bp.width
    Hc, Wc = H//2, W//2
    dims = [(H, W), (Hc, Wc), (Hc, Wc)]
    res_flat = [jnp.zeros((n*(h+J.PAD)*(w+J.PAD),), jnp.int32) for h, w in dims]
    for (comp, size), (coeffs, qp, dst, skip, bypass, org) in tc_arrays.items():
        rr = J.residual_class(coeffs, qp, dst, skip, bypass, scaling[(size, comp)], size)
        h, w = dims[comp]
        iy = jnp.arange(size, dtype=jnp.int32)[None, :, None]
        ix = jnp.arange(size, dtype=jnp.int32)[None, None, :]
        flat = (org[:, None, None] + iy*(w+J.PAD) + ix).reshape(-1)
        res_flat[comp] = res_flat[comp].at[flat].add(rr.reshape(-1))
    return [res_flat[c].reshape(n, dims[c][0]+J.PAD, dims[c][1]+J.PAD) for c in range(3)]

s1 = jax.jit(stage1)
res = timeit("stage1 residuals", lambda: s1(tc_arrays, scaling))

# stage 2 pallas intra
from heif_tpu.ops import pallas_intra as PI
def stage2(res, xs, counts):
    n, H, W = bp.n, bp.height, bp.width
    dims = [(H, W), (H//2, W//2), (H//2, W//2)]
    srcs = [J.ref_sources_device(xs[c][0], xs[c][1], xs[c][2], comp=c, W=W, H=H,
                                  ctb_log2=bp.ctb_log2) for c in range(3)]
    planes = []
    for c in range(3):
        h, w = dims[c]
        planes.append(PI.intra_scan_pallas(res[c], B._meta_from_xs(xs[c]), srcs[c],
                       h, w, is_luma=(c==0), strong_smoothing=bp.strong_smoothing,
                       counts=counts[c]))
    return planes
s2 = jax.jit(stage2)
planes = timeit("stage2 intra (pallas)", lambda: s2(res, xs, counts))
print("scan steps per comp:", [int(x[0].shape[1]) for x in bp.xs], "n tiles:", bp.n)

# stage 3+4: deblock + sao given planes
def stage34(planes, rest):
    qp_map, nf_map, vert_edges, horiz_edges, sao = rest
    n, H, W = bp.n, bp.height, bp.width
    Hc, Wc = H//2, W//2
    ne = W//8 - 1
    cols = 2*jnp.arange(ne) + 2
    lv = jax.vmap(partial(J._deblock_luma_pass, beta_off=bp.beta_off, tc_off=bp.tc_off))
    y = lv(planes[0], vert_edges[:, :, cols], qp_map[:, :, cols-1], qp_map[:, :, cols],
           nf_map[:, :, cols-1], nf_map[:, :, cols])
    qT = jnp.swapaxes(qp_map, 1, 2); nT = jnp.swapaxes(nf_map, 1, 2)
    hT = jnp.swapaxes(horiz_edges, 1, 2)
    y = jnp.swapaxes(lv(jnp.swapaxes(y, 1, 2), hT[:, :, cols], qT[:, :, cols-1],
                        qT[:, :, cols], nT[:, :, cols-1], nT[:, :, cols]), 1, 2)
    return y

s34 = jax.jit(stage34)
timeit("stage3 deblock luma", lambda: s34(planes, rest))

def stage4(planes, sao, nf_map):
    sv = jax.vmap(J.sao_component)
    out = []
    n, H, W = bp.n, bp.height, bp.width
    dims = [(H, W), (H//2, W//2), (H//2, W//2)]
    for c in range(3):
        sub = 1 if c == 0 else 2
        cs = 32//sub
        h, w = dims[c]
        def rep(a):
            return jnp.repeat(jnp.repeat(a, cs, 1), cs, 2)[:, :h, :w]
        stype = rep(sao[:, :, :, c, 0]); sclass = rep(sao[:, :, :, c, 1])
        offs = jnp.stack([rep(sao[:, :, :, c, 2+i]) for i in range(4)], axis=-1)
        nf_pix = jnp.repeat(jnp.repeat(nf_map, 4//sub, 1), 4//sub, 2)[:, :h, :w]
        out.append(sv(planes[c], stype, sclass, offs, nf_pix))
    return out
s4 = jax.jit(lambda p: stage4(p, rest[4], rest[1]))
timeit("stage4 sao", lambda: s4(planes))
