"""Container-layer tests: ISOBMFF parse of the real fixture plus synthetic
box streams.

The fixture facts asserted here are independently established: (a) the same
values the reference's libheif differential test checks
(tests/libheif_comparison.rs:102-111 — ispe dims, rotation-adjusted display
dims, bit depths, primary flag, thumbnail count), and (b) cv2(ffmpeg)
decode of extracted tile bitstreams, which doubles as a check that item
payload extraction returns valid HEVC data.
"""

import struct

import pytest

from heif_tpu.container import grammar as g
from heif_tpu.container.reader import BoxParseError, HeifReader, parse_grid_config
from heif_tpu.models.decoder import HeicDecoder


@pytest.fixture(scope="module")
def parsed(halfmoonbay_bytes):
    r = HeifReader(halfmoonbay_bytes)
    return r, r.read()


class TestFixtureMetadata:
    """Mirrors the reference's libheif cross-check on halfmoonbay.heic."""

    def test_brands(self, parsed):
        _, heif = parsed
        assert heif.file_type.major_brand == "heic"
        assert "mif1" in heif.file_type.compatible_brands

    def test_primary_is_grid(self, parsed):
        _, heif = parsed
        pid = heif.primary_item_id()
        assert pid == 49
        info = heif.item_info_by_item_id(pid)
        assert info is not None and info.item_type == g.ItemType.GRID

    def test_grid_config_via_idat(self, parsed):
        # grid config ships via construction_method 1 (idat) — the
        # reference todo!()s this path (src/heif/reader.rs:42)
        reader, heif = parsed
        loc = heif.meta.item_locations.locations[49]
        assert loc.construction_method == 1
        grid = parse_grid_config(reader.get_item_data(49))
        assert (grid.rows, grid.columns) == (6, 8)
        assert (grid.output_width, grid.output_height) == (4032, 3024)

    def test_tile_references(self, parsed):
        _, heif = parsed
        tiles = heif.item_ids_referencing(49, "dimg")
        assert tiles == list(range(1, 49))
        for tid in tiles:
            info = heif.item_info_by_item_id(tid)
            assert info.item_type == g.ItemType.HVC1

    def test_ispe_and_rotation(self, parsed):
        _, heif = parsed
        props = heif.meta.item_properties
        ispe = props.property_of_type(49, g.ImageSpatialExtentsProperty)
        assert (ispe.width, ispe.height) == (4032, 3024)
        irot = props.property_of_type(49, g.ImageRotationProperty)
        assert irot.angle == 3
        # every tile is 512x512
        tispe = props.property_of_type(1, g.ImageSpatialExtentsProperty)
        assert (tispe.width, tispe.height) == (512, 512)

    def test_hvcc_record(self, parsed):
        _, heif = parsed
        rec = heif.hevc_configuration_record()
        assert rec.configuration_version == 1
        assert rec.chroma_format_idc == 1  # 4:2:0
        assert rec.bit_depth_luma_minus8 == 0
        assert rec.bit_depth_chroma_minus8 == 0
        assert rec.length_size_minus_one == 3  # 4-byte NAL length prefixes
        # exactly one VPS(32), SPS(33), PPS(34) — reference asserts the same
        # (src/heic/decoder.rs:20)
        types = sorted(a.nal_unit_type for a in rec.nal_arrays)
        assert types == [32, 33, 34]
        for a in rec.nal_arrays:
            assert len(a.nal_units) == 1

    def test_pixi(self, parsed):
        _, heif = parsed
        pixi = heif.meta.item_properties.property_of_type(
            49, g.PixelInformationProperty
        )
        assert pixi.bits_per_channel == [8, 8, 8]

    def test_thumbnail_count(self, parsed):
        _, heif = parsed
        assert heif.items_referring_to(49, "thmb") == []

    def test_aux_image(self, parsed):
        _, heif = parsed
        # one auxiliary hvc1 (2016x1512) references the primary via auxl
        aux = heif.items_referring_to(49, "auxl")
        assert len(aux) == 1
        ispe = heif.meta.item_properties.property_of_type(
            aux[0], g.ImageSpatialExtentsProperty
        )
        assert (ispe.width, ispe.height) == (2016, 1512)

    def test_probe(self, halfmoonbay_bytes):
        info = HeicDecoder.probe(halfmoonbay_bytes)
        assert (info.ispe_width, info.ispe_height) == (4032, 3024)
        # irot 3 → display dims swapped (reference
        # tests/libheif_comparison.rs:69-74)
        assert (info.display_width, info.display_height) == (3024, 4032)
        assert info.luma_bit_depth == 8 and info.chroma_bit_depth == 8
        assert len(info.tile_ids) == 48
        assert info.thumbnail_count == 0


class TestItemExtraction:
    def test_tile_payloads_are_single_nal(self, parsed):
        reader, heif = parsed
        rec = heif.hevc_configuration_record()
        ls = rec.length_size_minus_one + 1
        for tid in range(1, 49):
            payload = reader.get_item_data(tid)
            ln = int.from_bytes(payload[:ls], "big")
            # single NAL per item (reference enforces this,
            # src/heic/decoder.rs:152-157)
            assert ls + ln == len(payload)
            nal_type = (payload[ls] >> 1) & 0x3F
            assert nal_type == 20  # IDR_N_LP

    def test_unknown_item_raises(self, parsed):
        reader, _ = parsed
        with pytest.raises(BoxParseError):
            reader.get_item_data(9999)


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


class TestSyntheticBoxes:
    def test_largesize_header(self):
        payload = b"heic" + struct.pack(">I", 0) + b"mif1"
        inner = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(payload)) + payload
        hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"pict" + b"\0" * 12 + b"\0")
        meta = _full_box(b"meta", 0, 0, hdlr)
        heif = HeifReader(inner + meta).read()
        assert heif.file_type.major_brand == "heic"

    def test_size_accounting_enforced(self):
        # ftyp declaring more payload than present must raise
        bad = struct.pack(">I", 24) + b"ftyp" + b"heic" + struct.pack(">I", 0)
        with pytest.raises(BoxParseError):
            HeifReader(bad).read()

    def test_unknown_boxes_skipped(self):
        ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0))
        junk = _box(b"zzzz", b"\xde\xad\xbe\xef")
        hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"pict" + b"\0" * 12 + b"\0")
        meta = _full_box(b"meta", 0, 0, junk + hdlr)
        heif = HeifReader(ftyp + junk + meta).read()
        assert heif.meta.handler.handler_type == "pict"

    def test_non_pict_handler_rejected(self):
        ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0))
        hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"vide" + b"\0" * 12 + b"\0")
        meta = _full_box(b"meta", 0, 0, hdlr)
        with pytest.raises(BoxParseError):
            HeifReader(ftyp + meta).read()

    def test_grid_payload_16bit(self):
        cfg = parse_grid_config(bytes([0, 0, 5, 7]) + struct.pack(">HH", 4032, 3024))
        assert (cfg.rows, cfg.columns, cfg.output_width, cfg.output_height) == (
            6, 8, 4032, 3024,
        )

    def test_grid_payload_32bit(self):
        cfg = parse_grid_config(bytes([0, 1, 0, 1]) + struct.pack(">II", 70000, 500))
        assert (cfg.rows, cfg.columns) == (1, 2)
        assert (cfg.output_width, cfg.output_height) == (70000, 500)

    def test_multi_extent_concat(self):
        # iloc with two extents must concatenate (reference todo! at
        # src/heif/reader.rs:47)
        ftyp = _box(b"ftyp", b"heic" + struct.pack(">I", 0))
        hdlr = _full_box(b"hdlr", 0, 0, struct.pack(">I", 0) + b"pict" + b"\0" * 12 + b"\0")
        idat = _box(b"idat", b"ABCDEFGH")
        # iloc v1: offset_size=1, length_size=1, base_offset_size=0, index_size=0
        iloc_payload = (
            bytes([0x11, 0x00])
            + struct.pack(">H", 1)  # item count
            + struct.pack(">H", 7)  # item id
            + struct.pack(">H", 1)  # construction_method=1 (idat)
            + struct.pack(">H", 0)  # dref index
            + struct.pack(">H", 2)  # extent count
            + bytes([0, 4])  # extent 0: offset 0 len 4
            + bytes([4, 4])  # extent 1: offset 4 len 4
        )
        iloc = _full_box(b"iloc", 1, 0, iloc_payload)
        meta = _full_box(b"meta", 0, 0, hdlr + idat + iloc)
        r = HeifReader(ftyp + meta)
        r.read()
        assert r.get_item_data(7) == b"ABCDEFGH"


class TestIccParser:
    """ICC header/tag-table parsing (completes the reference's dead
    color module, src/color/reader.rs:11-135)."""

    @staticmethod
    def _synthetic_profile() -> bytes:
        import struct

        desc_text = b"sRGB test profile\x00"
        desc_payload = (
            b"desc" + b"\x00" * 4 + struct.pack(">I", len(desc_text))
            + desc_text
        )
        n_tags = 1
        tag_table = struct.pack(">I", n_tags)
        tag_off = 132 + 12 * n_tags
        tag_table += struct.pack(">4sII", b"desc", tag_off, len(desc_payload))
        hdr = bytearray(128)
        total = tag_off + len(desc_payload)
        struct.pack_into(">I", hdr, 0, total)
        hdr[4:8] = b"ADBE"
        hdr[8:12] = bytes([4, 0x30, 0, 0])  # version 4.3.0
        hdr[12:16] = b"mntr"
        hdr[16:20] = b"RGB "
        hdr[20:24] = b"XYZ "
        struct.pack_into(">6H", hdr, 24, 2024, 6, 1, 12, 0, 0)
        hdr[36:40] = b"acsp"
        hdr[40:44] = b"APPL"
        struct.pack_into(">I", hdr, 64, 1)  # rendering intent
        hdr[80:84] = b"test"
        return bytes(hdr) + tag_table + desc_payload

    def test_parse_header_and_tags(self):
        from heif_tpu.container.icc import parse_icc_header

        prof = parse_icc_header(self._synthetic_profile())
        assert prof.profile_class == "display"
        assert prof.color_space == "RGB"
        assert prof.pcs == "XYZ"
        assert prof.version == "4.3.0"
        assert prof.platform == "Apple"
        assert prof.rendering_intent == 1
        assert prof.creation[:3] == (2024, 6, 1)
        assert [t.signature for t in prof.tags] == ["desc"]
        assert prof.description == "sRGB test profile"

    def test_rejects_garbage(self):
        import pytest

        from heif_tpu.container.icc import parse_icc_header

        with pytest.raises(ValueError):
            parse_icc_header(b"\x00" * 100)
        bad = bytearray(self._synthetic_profile())
        bad[36:40] = b"nope"
        with pytest.raises(ValueError):
            parse_icc_header(bytes(bad))

    def test_probe_fixture_display_p3(self, halfmoonbay_bytes):
        # the fixture's tiles carry a real Display P3 ICC profile
        from heif_tpu.models.decoder import HeicDecoder

        info = HeicDecoder.probe(halfmoonbay_bytes)
        p = info.icc
        assert p is not None
        assert p.description == "Display P3"
        assert p.profile_class == "display"
        assert p.color_space == "RGB" and p.pcs == "XYZ"
        assert p.platform == "Apple"
        assert {t.signature for t in p.tags} >= {
            "desc", "wtpt", "rXYZ", "gXYZ", "bXYZ", "rTRC",
        }
