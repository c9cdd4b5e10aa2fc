"""Per-tile fault isolation: a corrupt tile decodes as gray while the rest
of the grid survives (SURVEY.md §5 failure-detection row — the reference
aborts on any error via anyhow bubbling to unwrap, src/main.rs:6)."""

import numpy as np
import pytest

from heif_tpu.container.reader import HeifReader
from heif_tpu.models.decoder import HeicDecoder
from heif_tpu.utils.profiling import DecodeStats


def _corrupt_tile(data: bytes, tile_index: int) -> bytes:
    """Smash the NAL length prefix of one grid tile's payload."""
    r = HeifReader(data)
    heif = r.read()
    primary = heif.primary_item_id()
    tile_ids = heif.item_ids_referencing(primary, "dimg")
    payload = r.get_item_data(tile_ids[tile_index])
    off = data.find(payload)
    assert off > 0, "tile payload not found contiguously"
    buf = bytearray(data)
    buf[off : off + 4] = b"\xff\xff\xff\xff"  # absurd NAL length
    return bytes(buf)


def test_corrupt_tile_isolated(halfmoonbay_bytes):
    bad = _corrupt_tile(halfmoonbay_bytes, 5)
    stats = DecodeStats()
    planes = HeicDecoder.decode(
        bad, backend="jax", apply_rotation=False,
        isolate_tile_errors=True, stats=stats,
    )
    assert stats.tile_errors == 1
    assert 5 in stats.errors
    # tile 5 (row 0, col 5) is gray
    y = planes["Y"]
    assert (y[0:512, 5 * 512 : 6 * 512] == 128).all()
    # a neighboring tile decoded normally (matches the clean decode)
    clean = HeicDecoder.decode(
        halfmoonbay_bytes, backend="jax", apply_rotation=False
    )
    assert np.array_equal(
        y[0:512, 4 * 512 : 5 * 512], clean["Y"][0:512, 4 * 512 : 5 * 512]
    )


def test_corrupt_tile_raises_without_isolation(halfmoonbay_bytes):
    bad = _corrupt_tile(halfmoonbay_bytes, 5)
    with pytest.raises(Exception):
        HeicDecoder.decode(bad, backend="jax", apply_rotation=False)
