import time, numpy as np
from heif_tpu.container.reader import HeifReader
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
from heif_tpu.ops import batch as B
from heif_tpu.ops import pack as P

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

# manual re-run of pack_batch internals with timers
from heif_tpu.utils.hostmem import tune_allocator
syn = syntaxes[:chunk]; sls = slices[:chunk]
for trial in range(2):
    t0=time.perf_counter()
    tune_allocator()
    t1=time.perf_counter()
    plans = [P.pack_tile(s, sps, pps, sh.header, n_steps) for s, sh in zip(syn, sls)]
    t2=time.perf_counter()
    n = len(plans); H, W = plans[0].height, plans[0].width
    PAD = B.PAD
    Hc, Wc = H//2, W//2
    tacc = 0.0
    for comp, size in B.CLASSES:
        blocks, qps, dsts, skips, byps, flats = [],[],[],[],[],[]
        h = H if comp==0 else Hc; w = W if comp==0 else Wc
        stride = (h+PAD)*(w+PAD)
        for ti, plan in enumerate(plans):
            for tc in plan.tclasses:
                if tc.comp==comp and tc.size==size:
                    blocks.append(tc.coeffs); qps.append(tc.qp); dsts.append(tc.dst)
                    skips.append(tc.skip); byps.append(tc.bypass)
                    oy = tc.pos[:,0].astype(np.int32)[:,None,None]
                    ox = tc.pos[:,1].astype(np.int32)[:,None,None]
                    iy = np.arange(size,dtype=np.int32)[None,:,None]
                    ix = np.arange(size,dtype=np.int32)[None,None,:]
                    flats.append(np.int32(ti*stride)+(oy+iy)*np.int32(w+PAD)+(ox+ix))
    t3=time.perf_counter()
    xs=[]
    for c in range(3):
        fields=[]
        for name in ("x","y","size","mode","filter_flag","pcm","src"):
            fields.append(np.stack([getattr(p.comp_plans[c], name) for p in plans]))
        xs.append(tuple(fields))
    t4=time.perf_counter()
    stk = [np.stack([p.qp_map for p in plans]), np.stack([p.nf_map for p in plans]),
           np.stack([p.vert_edges for p in plans]), np.stack([p.horiz_edges for p in plans]),
           np.stack([p.sao for p in plans]).astype(np.int32)]
    t5=time.perf_counter()
    print(f"tune {t1-t0:.3f} packtiles {t2-t1:.3f} classes {t3-t2:.3f} xs_stack {t4-t3:.3f} meta_stack {t5-t4:.3f}")
t0=time.perf_counter()
bp = B.pack_batch(syn, sps, pps, sls, n_steps=n_steps, class_caps=caps)
print(f"full pack_batch again {time.perf_counter()-t0:.3f}s")
