import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from heif_tpu.container.reader import HeifReader, parse_grid_config
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
from heif_tpu.ops import batch as B
from heif_tpu.ops import jax_recon as J

data = open("tests/assets/halfmoonbay.heic", "rb").read()
r = HeifReader(data); heif = r.read()
rec = heif.hevc_configuration_record()
sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
primary = heif.primary_item_id()
tile_ids = heif.item_ids_referencing(primary, "dimg")
t0=time.perf_counter()
from heif_tpu.hevc import slice as sl2
slices = [sl.parse_slice_header(sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps) for t in tile_ids]
syntaxes = native.decode_tiles_parallel(sps, pps, slices)
t1=time.perf_counter(); print(f"entropy {t1-t0:.3f}s")

chunk=12
n_steps, caps = B._chunk_shapes(syntaxes, chunk)
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)
t2=time.perf_counter(); print(f"pack(12) {t2-t1:.3f}s")

# stage-by-stage jit on TPU
tc_arrays = {k: tuple(jnp.asarray(v) for v in (bp.tc_coeffs[k], bp.tc_qp[k], bp.tc_dst[k], bp.tc_skip[k], bp.tc_bypass[k], bp.tc_flat[k])) for k in bp.tc_coeffs}
scaling = {k: jnp.asarray(v) for k, v in bp.scaling.items()}
xs = [tuple(jnp.asarray(a) for a in t) for t in bp.xs]
counts = tuple(jnp.asarray(c) for c in bp.counts)
H, W, n = bp.height, bp.width, bp.n
Hc, Wc = H//2, W//2
dims = [(H,W),(Hc,Wc),(Hc,Wc)]
PAD = J.PAD

@jax.jit
def stage1(tc_arrays, scaling):
    res_flat = [jnp.zeros((n*(h+PAD)*(w+PAD),), jnp.int32) for h,w in dims]
    for (comp,size),(coeffs,qp,dst,skip,bypass,flat) in tc_arrays.items():
        rr = J.residual_class(coeffs,qp,dst,skip,bypass,scaling[(size,comp)],size)
        res_flat[comp] = res_flat[comp].at[flat].add(rr.reshape(-1))
    return [res_flat[c].reshape(n,dims[c][0]+PAD,dims[c][1]+PAD) for c in range(3)]

res = stage1(tc_arrays, scaling); jax.block_until_ready(res)
t0=time.perf_counter()
for _ in range(3):
    res = stage1(tc_arrays, scaling); jax.block_until_ready(res)
print(f"stage1 residual {(time.perf_counter()-t0)/3:.3f}s per chunk of {chunk}")

from heif_tpu.ops import pallas_intra as PI
@jax.jit
def stage2(res, xs, counts):
    planes=[]
    for c in range(3):
        h,w = dims[c]
        plane = PI.intra_scan_pallas(res[c], B._meta_from_xs(xs[c]), xs[c][6], h, w,
            is_luma=(c==0), strong_smoothing=bp.strong_smoothing, counts=counts[c])
        planes.append(plane)
    return planes
planes = stage2(res, xs, counts); jax.block_until_ready(planes)
t0=time.perf_counter()
for _ in range(3):
    planes = stage2(res, xs, counts); jax.block_until_ready(planes)
print(f"stage2 intra(pallas) {(time.perf_counter()-t0)/3:.3f}s per chunk of {chunk}")

qp_map=jnp.asarray(bp.qp_map); nf_map=jnp.asarray(bp.nf_map)
vert=jnp.asarray(bp.vert_edges); horiz=jnp.asarray(bp.horiz_edges); sao=jnp.asarray(bp.sao)

@jax.jit
def stage34(planes, vert, horiz, qp_map, nf_map, sao):
    ne = W//8-1
    cols = 2*jnp.arange(ne)+2
    lv = jax.vmap(partial(J._deblock_luma_pass, beta_off=bp.beta_off, tc_off=bp.tc_off))
    y = lv(planes[0], vert[:,:,cols], qp_map[:,:,cols-1], qp_map[:,:,cols], nf_map[:,:,cols-1], nf_map[:,:,cols])
    qT=jnp.swapaxes(qp_map,1,2); nT=jnp.swapaxes(nf_map,1,2); hT=jnp.swapaxes(horiz,1,2)
    y = jnp.swapaxes(lv(jnp.swapaxes(y,1,2), hT[:,:,cols], qT[:,:,cols-1], qT[:,:,cols], nT[:,:,cols-1], nT[:,:,cols]),1,2)
    out=[y]
    nec=Wc//8-1; ccols=4*jnp.arange(nec)+4
    cv = jax.vmap(partial(J._deblock_chroma_pass, tc_off=bp.tc_off))
    for ci,c_off in ((1,bp.cb_qp_off),(2,bp.cr_qp_off)):
        qp_avg=(qp_map[:,:,ccols-1]+qp_map[:,:,ccols]+1)>>1
        qpc=J._onehot_take(J._CHROMA_QP_LUT, jnp.clip(qp_avg+c_off,0,57),58)
        p=cv(planes[ci], vert[:,:,ccols], qpc, nf_map[:,:,ccols-1], nf_map[:,:,ccols])
        qp_avgT=(qT[:,:,ccols-1]+qT[:,:,ccols]+1)>>1
        qpcT=J._onehot_take(J._CHROMA_QP_LUT, jnp.clip(qp_avgT+c_off,0,57),58)
        p=jnp.swapaxes(cv(jnp.swapaxes(p,1,2), hT[:,:,ccols], qpcT, nT[:,:,ccols-1], nT[:,:,ccols]),1,2)
        out.append(p)
    sv = jax.vmap(J.sao_component)
    res2=[]
    for c in range(3):
        sub = 1 if c==0 else 2
        cs = 32//sub
        h,w = dims[c]
        def rep(a): return jnp.repeat(jnp.repeat(a,cs,1),cs,2)[:,:h,:w]
        stype=rep(sao[:,:,:,c,0]); sclass=rep(sao[:,:,:,c,1])
        offs=jnp.stack([rep(sao[:,:,:,c,2+i]) for i in range(4)],axis=-1)
        nf_pix=jnp.repeat(jnp.repeat(nf_map,4//sub,1),4//sub,2)[:,:h,:w]
        res2.append(sv(out[c], stype, sclass, offs, nf_pix))
    return [p.astype(jnp.uint8) for p in res2]

o = stage34(planes, vert, horiz, qp_map, nf_map, sao); jax.block_until_ready(o)
t0=time.perf_counter()
for _ in range(3):
    o = stage34(planes, vert, horiz, qp_map, nf_map, sao); jax.block_until_ready(o)
print(f"stage3+4 deblock+sao {(time.perf_counter()-t0)/3:.3f}s per chunk of {chunk}")
