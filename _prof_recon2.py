"""Profile the recon stage split: pack vs device compute vs readback."""
import time
import numpy as np

from heif_tpu.container.reader import HeifReader, parse_grid_config
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
from heif_tpu.ops import batch as B

data = open("tests/assets/halfmoonbay.heic", "rb").read()
r = HeifReader(data)
heif = r.read()
rec = heif.hevc_configuration_record()
sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
primary = heif.primary_item_id()
grid = parse_grid_config(r.get_item_data(primary))
tile_ids = heif.item_ids_referencing(primary, "dimg")
slices = [
    sl.parse_slice_header(sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps)
    for t in tile_ids
]
syntaxes = native.decode_tiles_parallel(sps, pps, slices)

import jax

chunk = 12
n_steps, caps = B._chunk_shapes(syntaxes, chunk)

# warm up compile
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)
planes = B._dispatch_core(bp)
jax.block_until_ready(planes)

for trial in range(3):
    t0 = time.perf_counter()
    bps = []
    for lo in range(0, len(syntaxes), chunk):
        bps.append(B.pack_batch(syntaxes[lo:lo+chunk], sps, pps, slices[lo:lo+chunk],
                                n_steps=n_steps, class_caps=caps))
    t1 = time.perf_counter()
    outs = []
    for bp in bps:
        outs.append(B._dispatch_core(bp))
    for o in outs:
        jax.block_until_ready(o)
    t2 = time.perf_counter()
    res = [[np.asarray(p) for p in o] for o in outs]
    t3 = time.perf_counter()
    print(f"pack {t1-t0:.3f}s  device {t2-t1:.3f}s  readback {t3-t2:.3f}s  total {t3-t0:.3f}s")

# also time a single chunk device-only repeatedly
bp = bps[0]
arrs = None
for trial in range(3):
    t0 = time.perf_counter()
    o = B._dispatch_core(bp)
    jax.block_until_ready(o)
    print(f"single-chunk dispatch+compute {time.perf_counter()-t0:.3f}s")
