from heif_tpu.parallel.pipeline import (
    make_mesh,
    pack_uniform,
    reconstruct_sharded,
    decode_grid_sharded,
)

__all__ = [
    "make_mesh",
    "pack_uniform",
    "reconstruct_sharded",
    "decode_grid_sharded",
]
