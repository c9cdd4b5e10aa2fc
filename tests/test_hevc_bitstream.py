"""HEVC bitstream-layer tests: RBSP bit reading, Exp-Golomb spec vectors,
emulation prevention, parameter sets and slice headers on the real fixture.

Spec-table vectors mirror the reference's unit tests
(src/hevc/rbsp_reader.rs:143-303) — both implementations must pass the same
H.265 Table 9-2/9-3 patterns.
"""

import numpy as np
import pytest

from heif_tpu.container.reader import HeifReader
from heif_tpu.hevc import grammar as g
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import (
    BitReader,
    insert_emulation_prevention,
    remove_emulation_prevention,
    remove_emulation_prevention_np,
)


def _bits(s: str) -> bytes:
    s = s.replace(" ", "")
    s = s + "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


class TestExpGolomb:
    """H.265 Table 9-2 (ue) and Table 9-3 (se) literal bit patterns."""

    @pytest.mark.parametrize(
        "pattern,value",
        [
            ("1", 0),
            ("010", 1),
            ("011", 2),
            ("00100", 3),
            ("00101", 4),
            ("00110", 5),
            ("00111", 6),
            ("0001000", 7),
            ("0001001", 8),
            ("000010000", 15),
            ("000010001", 16),
        ],
    )
    def test_ue(self, pattern, value):
        assert BitReader(_bits(pattern)).read_ue() == value

    @pytest.mark.parametrize(
        "pattern,value",
        [
            ("1", 0),
            ("010", 1),
            ("011", -1),
            ("00100", 2),
            ("00101", -2),
            ("00110", 3),
            ("00111", -3),
        ],
    )
    def test_se(self, pattern, value):
        assert BitReader(_bits(pattern)).read_se() == value

    def test_ue_sequence(self):
        r = BitReader(_bits("1 010 011 00100"))
        assert [r.read_ue() for _ in range(4)] == [0, 1, 2, 3]

    def test_corrupt_ue_prefix(self):
        with pytest.raises((ValueError, EOFError)):
            BitReader(b"\x00\x00\x00\x00\x00").read_ue()


class TestBitReader:
    def test_msb_first(self):
        r = BitReader(b"\xa5")  # 1010 0101
        assert [r.read_bit() for _ in range(8)] == [1, 0, 1, 0, 0, 1, 0, 1]

    def test_read_bits(self):
        r = BitReader(b"\xde\xad")
        assert r.read_bits(4) == 0xD
        assert r.read_bits(8) == 0xEA
        assert r.read_bits(4) == 0xD

    def test_byte_alignment_strict(self):
        r = BitReader(_bits("0 1000000 0"))
        r.read_bit()
        r.byte_alignment()
        assert r.is_byte_aligned() and r.byte_pos == 1

    def test_alignment_rejects_bad_padding(self):
        r = BitReader(_bits("0 1000001"))
        r.read_bit()
        with pytest.raises(ValueError):
            r.byte_alignment()


class TestEmulationPrevention:
    """Cases mirroring the reference's 10-case suite
    (src/hevc/rbsp_reader.rs:186-303)."""

    CASES = [
        (b"", b""),
        (b"\x01\x02\x03", b"\x01\x02\x03"),
        (b"\x00\x00\x03\x00", b"\x00\x00\x00"),
        (b"\x00\x00\x03\x01", b"\x00\x00\x01"),
        (b"\x00\x00\x03\x02", b"\x00\x00\x02"),
        (b"\x00\x00\x03\x03", b"\x00\x00\x03"),
        # 0x03 followed by > 0x03 is NOT emulation prevention
        (b"\x00\x00\x03\x04", b"\x00\x00\x03\x04"),
        # pattern at end of data
        (b"\xab\x00\x00\x03", b"\xab\x00\x00"),
        # lone zeros untouched
        (b"\x00\x03\x00\x03", b"\x00\x03\x00\x03"),
        # consecutive patterns
        (b"\x00\x00\x03\x00\x00\x03\x01", b"\x00\x00\x00\x00\x01"),
        # overlapping: removal re-creates 00 00 before an 03 — the second
        # 03 WAS escaped in the original only if encoder inserted it; raw
        # semantics: scan left-to-right on the emulated stream
        (b"\x00\x00\x03\x03\x00\x00\x03\x00", b"\x00\x00\x03\x00\x00\x00"),
    ]

    @pytest.mark.parametrize("emulated,clean", CASES)
    def test_remove(self, emulated, clean):
        assert remove_emulation_prevention(emulated) == clean

    @pytest.mark.parametrize("emulated,clean", CASES)
    def test_remove_np(self, emulated, clean):
        got = remove_emulation_prevention_np(
            np.frombuffer(emulated, dtype=np.uint8)
        )
        assert got.tobytes() == clean

    def test_roundtrip_random(self):
        rng = np.random.default_rng(7)
        for _ in range(50):
            # biased toward zeros to exercise patterns
            raw = rng.choice(
                [0, 0, 0, 1, 2, 3, 255], size=rng.integers(0, 64)
            ).astype(np.uint8).tobytes()
            emulated = insert_emulation_prevention(raw)
            assert remove_emulation_prevention(emulated) == raw
            got = remove_emulation_prevention_np(
                np.frombuffer(emulated, dtype=np.uint8)
            )
            assert got.tobytes() == raw

    def test_real_sps_roundtrip(self, halfmoonbay_bytes):
        r = HeifReader(halfmoonbay_bytes)
        rec = r.read().hevc_configuration_record()
        for t in (32, 33, 34):
            nal = rec.nal_units_of_type(t)[0]
            rbsp = remove_emulation_prevention(nal[2:])
            assert insert_emulation_prevention(rbsp) == nal[2:]


@pytest.fixture(scope="module")
def fixture_ps(halfmoonbay_bytes):
    r = HeifReader(halfmoonbay_bytes)
    heif = r.read()
    rec = heif.hevc_configuration_record()
    vps = params.parse_vps(remove_emulation_prevention(rec.nal_units_of_type(32)[0][2:]))
    sps = params.parse_sps(remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:]))
    pps = params.parse_pps(remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:]))
    return r, heif, rec, vps, sps, pps


class TestParameterSets:
    def test_sps_fixture_facts(self, fixture_ps):
        _, _, _, _, sps, _ = fixture_ps
        assert sps.pic_width_in_luma_samples == 512
        assert sps.pic_height_in_luma_samples == 512
        assert sps.chroma_format_idc == 1
        assert sps.bit_depth_y == 8 and sps.bit_depth_c == 8
        assert sps.ctb_size_y == 32
        assert sps.pic_width_in_ctbs_y == 16 and sps.pic_height_in_ctbs_y == 16
        assert sps.min_cb_log2_size_y == 3
        assert sps.min_tb_log2_size_y == 2 and sps.max_tb_log2_size_y == 5
        assert sps.sample_adaptive_offset_enabled_flag
        assert sps.scaling_list_enabled_flag
        assert not sps.sps_scaling_list_data_present_flag  # default matrices
        assert not sps.amp_enabled_flag and not sps.pcm_enabled_flag
        assert sps.vui is not None and sps.vui.video_full_range_flag

    def test_pps_fixture_facts(self, fixture_ps):
        _, _, _, _, _, pps = fixture_ps
        assert pps.init_qp_minus26 == -11
        assert pps.entropy_coding_sync_enabled_flag  # WPP
        assert not pps.tiles_enabled_flag
        assert pps.cu_qp_delta_enabled_flag
        assert not pps.sign_data_hiding_enabled_flag
        assert not pps.transform_skip_enabled_flag
        assert pps.pps_cb_qp_offset == 2 and pps.pps_cr_qp_offset == 2

    def test_vps_profile(self, fixture_ps):
        _, _, _, vps, _, _ = fixture_ps
        # Main Still Picture profile
        assert vps.profile_tier_level.general_profile_idc == 3

    def test_default_scaling_lists(self):
        d = params.make_default_scaling_lists()
        assert d.scaling_list[0][0] == [16] * 16
        lst = d.scaling_list[1][0]  # 8x8 intra, diagonal order
        assert len(lst) == 64
        assert lst[0] == 16
        # diagonal scan of the symmetric default matrix: last entry is the
        # bottom-right corner 115 (intra) / 91 (inter)
        assert lst[-1] == 115
        assert d.scaling_list[1][3][-1] == 91
        # 32x32 inferred matrices copy 0/3
        assert d.scaling_list[3][1] == d.scaling_list[3][0]
        assert d.dc == [[16] * 6, [16] * 6]

    def test_diag_scan_order(self):
        scan4 = params.diag_scan_order(4)
        assert scan4[:6] == [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]
        assert len(scan4) == 16 and scan4[-1] == (3, 3)


class TestSliceHeader:
    def test_tile1_header(self, fixture_ps):
        r, heif, rec, _, sps, pps = fixture_ps
        payload = r.get_item_data(1)
        nals = sl.split_length_prefixed_nals(payload, rec.length_size_minus_one + 1)
        assert len(nals) == 1
        ps = sl.parse_slice_header(nals[0], sps, pps)
        h = ps.header
        assert ps.nal_type == g.NalUnitType.IDR_N_LP
        assert h.slice_type == g.SliceType.I
        assert h.slice_qp_y(pps) == 15
        assert h.slice_sao_luma_flag and h.slice_sao_chroma_flag
        assert h.num_entry_point_offsets == 15  # WPP: 16 CTB rows
        ranges = ps.substream_ranges()
        assert len(ranges) == 16
        assert ranges[0][0] == h.data_byte_offset
        assert ranges[-1][1] == len(ps.rbsp)
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert b == c and b > a

    def test_all_tiles_parse(self, fixture_ps):
        r, heif, rec, _, sps, pps = fixture_ps
        for tid in range(1, 49):
            nals = sl.split_length_prefixed_nals(
                r.get_item_data(tid), rec.length_size_minus_one + 1
            )
            ps = sl.parse_slice_header(nals[0], sps, pps)
            assert ps.nal_type == g.NalUnitType.IDR_N_LP
            assert len(ps.substream_ranges()) == 16


class TestTilesGuard:
    def test_tiles_plus_wpp_rejected_loudly(self, fixture_ps):
        """The Python twin DECODES tiles_enabled_flag=1 pictures (see
        tests/test_fixture_matrix.py tiles cases — beyond the reference,
        which only parses the geometry). The unsupported combination —
        tiles together with entropy_coding_sync — must still fail with a
        clear error rather than desync, as must the native front end
        (which routes tiles to the Python twin at the decoder level).
        """
        import dataclasses

        r, heif, rec, _, sps, pps = fixture_ps
        nals = sl.split_length_prefixed_nals(
            r.get_item_data(1), rec.length_size_minus_one + 1
        )
        ps = sl.parse_slice_header(nals[0], sps, pps)
        from heif_tpu.cabac.syntax import TileSyntaxDecoder

        pps_both = dataclasses.replace(
            pps,
            tiles_enabled_flag=True,
            num_tile_columns_minus1=1,
            num_tile_rows_minus1=0,
            entropy_coding_sync_enabled_flag=True,
        )
        with pytest.raises(NotImplementedError, match="tiles"):
            TileSyntaxDecoder(sps, pps_both, ps)

        from heif_tpu import native

        if native.available():
            # the native engine now decodes tiles (tile-scan order +
            # §6.4.1 availability; bit-exact vs the Python twin, see
            # test_fixture_matrix tiles cases) — but the tiles+WPP
            # combination stays a loud NotImplementedError there too
            with pytest.raises(NotImplementedError, match="tiles"):
                native.decode_tile_native(sps, pps_both, ps)
            # and a tiles PPS lying about a non-tiled stream must fail
            # loudly (desync detection), never return garbage
            pps_tiled = dataclasses.replace(
                pps_both, entropy_coding_sync_enabled_flag=False
            )
            with pytest.raises(ValueError, match="desync"):
                native.decode_tile_native(sps, pps_tiled, ps)


class TestOracles:
    def test_de265_tile_decode(self, fixture_ps):
        from heif_tpu.utils import oracle

        r, heif, rec, _, _, _ = fixture_ps
        ps_nals = [rec.nal_units_of_type(t)[0] for t in (32, 33, 34)]
        planes = oracle.decode_tile_nals(ps_nals, [r.get_item_data(1)[4:]])
        assert planes[0].shape == (512, 512)
        assert planes[1].shape == (256, 256)
        assert planes[2].shape == (256, 256)

    def test_heif_full_decode_dims(self, halfmoonbay_bytes):
        from heif_tpu.utils import oracle

        planes = oracle.decode_heic(halfmoonbay_bytes, ignore_transformations=True)
        assert planes["Y"].shape == (3024, 4032)
        assert planes["Cb"].shape == (1512, 2016)

    def test_tile_vs_full_consistency(self, fixture_ps, halfmoonbay_bytes):
        """Tile(0,0) decoded standalone must equal the top-left 512x512 of
        the full libheif decode (tiles are independent pictures)."""
        from heif_tpu.utils import oracle

        r, heif, rec, _, _, _ = fixture_ps
        ps_nals = [rec.nal_units_of_type(t)[0] for t in (32, 33, 34)]
        tile = oracle.decode_tile_nals(ps_nals, [r.get_item_data(1)[4:]])
        full = oracle.decode_heic(halfmoonbay_bytes, ignore_transformations=True)
        assert (tile[0] == full["Y"][:512, :512]).all()
        assert (tile[1] == full["Cb"][:256, :256]).all()
        assert (tile[2] == full["Cr"][:256, :256]).all()
