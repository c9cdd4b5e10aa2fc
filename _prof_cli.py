import time
t00=time.perf_counter()
from heif_tpu import HeicDecoder
from heif_tpu.models import decoder as D
import numpy as np
data = open('tests/assets/halfmoonbay.heic','rb').read()

# monkeypatch-free: time the stages manually, mirroring HeicDecoder.decode
from heif_tpu.container.reader import HeifReader, parse_grid_config
from heif_tpu.container import grammar as g
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu import native
t0=time.perf_counter(); print(f"imports {t0-t00:.2f}s")
reader = HeifReader(data); heif = reader.read()
info = HeicDecoder.probe(data)
rec = heif.hevc_configuration_record(info.tile_ids[0])
sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
t1=time.perf_counter(); print(f"container+params {t1-t0:.2f}s")
slices=[]
for tid in info.tile_ids:
    nals = sl.split_length_prefixed_nals(reader.get_item_data(tid), rec.length_size_minus_one+1)
    slices.append(sl.parse_slice_header(nals[0], sps, pps))
syntaxes = native.decode_tiles_parallel(sps, pps, slices)
t2=time.perf_counter(); print(f"entropy {t2-t1:.2f}s")
from heif_tpu.ops.jax_recon import reconstruct_tiles_batched
tiles = reconstruct_tiles_batched(syntaxes, sps, pps, slices)
t3=time.perf_counter(); print(f"recon {t3-t2:.2f}s")
grid = parse_grid_config(reader.get_item_data(info.primary_item_id))
planes = HeicDecoder._stitch(tiles, grid, sps, True, info.rotation)
t4=time.perf_counter(); print(f"stitch {t4-t3:.2f}s")
