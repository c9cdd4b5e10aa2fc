"""heif_tpu — a TPU-native HEIF/HEVC still-image decode engine.

A from-scratch JAX/XLA/Pallas + C++-host framework with the capabilities of the
reference decoder (friendlymatthew/heif): ISOBMFF container parsing, HEVC
parameter-set / slice-header / CABAC entropy decoding — plus the pixel
reconstruction stack the reference leaves unimplemented (coding quadtree,
residual decode, inverse transforms, intra prediction, deblocking, SAO),
executed on TPU and sharded over device meshes.

Layering (host → device):
  container/  ISOBMFF box tree, item table, grid layout        (host)
  hevc/       NAL, RBSP bit reader, VPS/SPS/PPS, slice header  (host)
  cabac/      arithmetic engine, context models, syntax decode (host oracle)
  native/     C++ fast path for the entropy layers             (host, ctypes)
  ops/        dequant, IDCT/IDST, intra pred, deblock, SAO     (TPU: JAX/Pallas)
  parallel/   tile sharding over jax.sharding.Mesh             (TPU)
  models/     assembled decode pipelines (grid / single image) (orchestration)

Public API mirrors the reference crate's re-exports (src/lib.rs:10-11):
`HeifReader` for container access, `HeicDecoder` for the full pipeline.
"""

from heif_tpu.utils.hostmem import tune_allocator as _tune_allocator

_tune_allocator()  # see utils/hostmem.py: fault-expensive microVM hosts

from heif_tpu.container.reader import HeifReader
from heif_tpu.models.decoder import HeicDecoder

__all__ = ["HeifReader", "HeicDecoder"]
__version__ = "0.1.0"
