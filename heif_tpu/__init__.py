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


def _enable_jit_cache() -> None:
    """Persistent XLA compilation cache: decode programs compile in
    minutes on tunneled TPU hosts but are identical across processes, so
    cache them on disk (first CLI run pays, every later one is warm).
    Opt out with HEIF_TPU_NO_JIT_CACHE=1."""
    import os

    if os.environ.get("HEIF_TPU_NO_JIT_CACHE"):
        return
    try:
        import jax

        cache = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "heif_tpu", "xla"
            ),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # jax absent or too old for these flags
        pass


_enable_jit_cache()

from heif_tpu.container.reader import HeifReader
from heif_tpu.models.decoder import HeicDecoder

__all__ = ["HeifReader", "HeicDecoder"]
__version__ = "0.1.0"
