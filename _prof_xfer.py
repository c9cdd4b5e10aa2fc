import time, numpy as np, jax, jax.numpy as jnp
from heif_tpu.container.reader import HeifReader
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
from heif_tpu.ops import batch as B

data = open("tests/assets/halfmoonbay.heic", "rb").read()
r = HeifReader(data); heif = r.read()
rec = heif.hevc_configuration_record()
sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
primary = heif.primary_item_id()
tile_ids = heif.item_ids_referencing(primary, "dimg")
slices = [sl.parse_slice_header(sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps) for t in tile_ids]
syntaxes = native.decode_tiles_parallel(sps, pps, slices)
chunk=12
n_steps, caps = B._chunk_shapes(syntaxes, chunk)
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)

def nbytes(bp):
    tot = 0
    for k in bp.tc_coeffs:
        for a in (bp.tc_coeffs[k], bp.tc_qp[k], bp.tc_dst[k], bp.tc_skip[k], bp.tc_bypass[k], bp.tc_flat[k]):
            tot += a.nbytes
    for t in bp.xs:
        for a in t: tot += a.nbytes
    for a in (bp.qp_map, bp.nf_map, bp.vert_edges, bp.horiz_edges, bp.sao): tot += a.nbytes
    return tot
print(f"input bytes/chunk: {nbytes(bp)/1e6:.1f} MB; n_steps={n_steps}")

# time transfer only
out = B._dispatch_core(bp); jax.block_until_ready(out)  # compile warm
for _ in range(2):
    t0=time.perf_counter()
    arrs = []
    for k in bp.tc_coeffs:
        arrs += [jnp.asarray(bp.tc_coeffs[k]), jnp.asarray(bp.tc_flat[k])]
    for t in bp.xs: arrs += [jnp.asarray(a) for a in t]
    jax.block_until_ready(arrs)
    t1=time.perf_counter()
    out = B._dispatch_core(bp); jax.block_until_ready(out)
    t2=time.perf_counter()
    outh = [np.asarray(o) for o in out]
    t3=time.perf_counter()
    print(f"xfer {t1-t0:.3f} dispatch+compute {t2-t1:.3f} readback {t3-t2:.3f}")
# output size
print(f"output bytes/chunk: {sum(np.asarray(o).nbytes for o in out)/1e6:.1f} MB")
