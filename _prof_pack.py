import time, cProfile, pstats, numpy as np
from heif_tpu.container.reader import HeifReader, parse_grid_config
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
# warm
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)
t0=time.perf_counter()
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)
print(f"pack_batch warm {time.perf_counter()-t0:.3f}s")
pr = cProfile.Profile()
pr.enable()
bp = B.pack_batch(syntaxes[:chunk], sps, pps, slices[:chunk], n_steps=n_steps, class_caps=caps)
pr.disable()
pstats.Stats(pr).sort_stats('cumulative').print_stats(25)
