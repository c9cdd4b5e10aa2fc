import time, cProfile, pstats, numpy as np
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
# warm
P.pack_tile(syntaxes[0], sps, pps, slices[0].header, n_steps)
t0=time.perf_counter()
for i in range(12):
    P.pack_tile(syntaxes[i], sps, pps, slices[i].header, n_steps)
print(f"pack_tile x12 serial {time.perf_counter()-t0:.3f}s")
pr = cProfile.Profile(); pr.enable()
for i in range(12):
    P.pack_tile(syntaxes[i], sps, pps, slices[i].header, n_steps)
pr.disable()
pstats.Stats(pr).sort_stats('tottime').print_stats(18)
