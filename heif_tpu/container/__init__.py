from heif_tpu.container.reader import HeifReader
from heif_tpu.container import grammar

__all__ = ["HeifReader", "grammar"]
