"""HeicDecoder — the top-level decode pipeline orchestrator.

Parity target: reference src/heic/decoder.rs:12-131 (container parse →
hvcC → VPS/SPS/PPS → grid dispatch → per-tile slice decode), extended with
the full reconstruction stack the reference stubs out, executed on TPU.

This module is filled in as the stack comes up; at minimum it exposes the
metadata pipeline (config 0 of BASELINE.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from heif_tpu.container import grammar as g
from heif_tpu.container.reader import HeifReader, parse_grid_config


@dataclass
class ImageInfo:
    """Resolved metadata for the primary picture (config 0 deliverable)."""

    ispe_width: int
    ispe_height: int
    display_width: int  # after irot
    display_height: int
    rotation: int  # irot angle, multiples of 90 deg CCW
    luma_bit_depth: int
    chroma_bit_depth: int
    chroma_format_idc: int
    grid: Optional[g.GridConfig]
    tile_ids: list[int]
    primary_item_id: int
    thumbnail_count: int


class HeicDecoder:
    """End-to-end HEIC decode: container → entropy → TPU reconstruction."""

    @staticmethod
    def probe(data: bytes) -> ImageInfo:
        """Parse container metadata only (no entropy/pixel work).

        Mirrors what the reference can do today plus grid-config resolution
        (which requires idat support, reference's todo! at
        src/heif/reader.rs:42).
        """
        reader = HeifReader(data)
        heif = reader.read()
        primary = heif.primary_item_id()
        info = heif.item_info_by_item_id(primary)
        if info is None:
            raise ValueError(f"primary item {primary} missing from iinf")

        props = heif.meta.item_properties
        ispe = props.property_of_type(primary, g.ImageSpatialExtentsProperty)
        if ispe is None:
            raise ValueError("primary item has no ispe property")
        irot = props.property_of_type(primary, g.ImageRotationProperty)
        angle = irot.angle if irot else 0
        if angle in (1, 3):
            disp_w, disp_h = ispe.height, ispe.width
        else:
            disp_w, disp_h = ispe.width, ispe.height

        grid = None
        tile_ids: list[int] = []
        if info.item_type == g.ItemType.GRID:
            grid = parse_grid_config(reader.get_item_data(primary))
            tile_ids = heif.item_ids_referencing(primary, "dimg")

        hvcc = heif.hevc_configuration_record(
            tile_ids[0] if tile_ids else primary
        )
        if hvcc is None:
            raise ValueError("no hvcC record found")

        thumbs = heif.items_referring_to(primary, "thmb")

        return ImageInfo(
            ispe_width=ispe.width,
            ispe_height=ispe.height,
            display_width=disp_w,
            display_height=disp_h,
            rotation=angle,
            luma_bit_depth=hvcc.bit_depth_luma_minus8 + 8,
            chroma_bit_depth=hvcc.bit_depth_chroma_minus8 + 8,
            chroma_format_idc=hvcc.chroma_format_idc,
            grid=grid,
            tile_ids=tile_ids,
            primary_item_id=primary,
            thumbnail_count=len(thumbs),
        )
