"""Device-side residual request generator (ops.pallas_cabac_gen).

Validates the round-5 circularity break: the device engine receives only
the ENVELOPE tape (non-residual bins + per-TU markers) plus raw
substream bytes, derives every residual-coding request itself, and must
reproduce (a) the host decoder's coefficient planes exactly and (b) the
final CABAC context state exactly — on encoded x265 fixtures, in
interpret mode (CPU; the real-TPU run is covered by
tools/bench_device_entropy.py --gen).
"""

import numpy as np
import pytest

from heif_tpu.models.decoder import HeicDecoder  # noqa: F401 (jax init)
from heif_tpu.cabac.envelope import build_envelope_tape, envelope_trace
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu.utils import x265enc


def _have_x265():
    try:
        return x265enc.available()
    except Exception:
        return False


def _parse(stream):
    sps = pps = vcl = None
    for nal in sl.split_annexb_nals(stream):
        k = (nal[0] >> 1) & 0x3F
        if k == 33:
            sps = params.parse_sps(remove_emulation_prevention(nal[2:]))
        elif k == 34:
            pps = params.parse_pps(remove_emulation_prevention(nal[2:]))
        elif k <= 31 and vcl is None:
            vcl = nal
    return sps, pps, sl.parse_slice_header(vcl, sps, pps)


def _roundtrip_gen(h, w, qp, options, seed=3, sparse=False):
    from heif_tpu.ops import pallas_cabac_gen as G

    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (h, w)).astype(np.uint8)
    cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    cr = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
    # smooth content so intra prediction leaves structured residuals
    y = (y // 3 + np.linspace(0, 160, w, dtype=np.int32)[None, :]).astype(
        np.uint8
    )
    if sparse:
        # near-flat picture with one textured corner: few bins (the
        # interpret-mode engine pays ~10ms/step on CPU) but every
        # residual phase still fires
        flat = np.full((h, w), 128, np.uint8)
        flat += np.linspace(0, 24, w, dtype=np.uint8)[None, :]
        flat[: h // 4, : w // 4] = y[: h // 4, : w // 4]
        y = flat
        cb = np.full_like(cb, 96)
        cr = np.full_like(cr, 160)
        cr[: h // 8, : w // 8] = rng.integers(0, 256, (h // 8, w // 8))
    stream = x265enc.encode_i_frame(y, cb, cr, qp=qp, options=options)
    sps, pps, ps = _parse(stream)
    tr = envelope_trace(sps, pps, ps)

    rbsp = ps.rbsp if isinstance(ps.rbsp, bytes) else bytes(ps.rbsp)
    entries = []
    seg_spans = []
    for si, seg in enumerate(tr.segments):
        tape, n_steps = build_envelope_tape(tr, si)
        entries.append((rbsp, seg, tape, n_steps))
        seg_spans.append(
            sorted(
                (sp for sp in tr.spans if sp.seg == si),
                key=lambda sp: sp.b0,
            )
        )

    events, state = G.run_gen_batch(entries, blk=64, interpret=True)

    # device-emitted coefficients, scattered by pure bookkeeping
    planes = [np.zeros_like(p) for p in tr.syntax.coeffs]
    for lane, spans in enumerate(seg_spans):
        G.scatter_events(events[:, lane], spans, planes)
    for c in range(3):
        assert np.array_equal(planes[c], tr.syntax.coeffs[c]), (
            f"coeff plane {c}: "
            f"{np.count_nonzero(planes[c] != tr.syntax.coeffs[c])} diffs"
        )
    # final context state must match the host engine exactly
    for lane, seg in enumerate(tr.segments):
        got_p = (state[:, lane] & 63).astype(np.uint8)
        got_m = ((state[:, lane] >> 6) & 1).astype(np.uint8)
        assert np.array_equal(got_p, seg.p_final), f"lane {lane} pState"
        assert np.array_equal(got_m, seg.mps_final), f"lane {lane} MPS"
    n_res = sum(sp.b1 - sp.b0 for sp in tr.spans)
    n_all = sum(s.n_bins for s in tr.segments)
    return n_res, n_all


@pytest.mark.skipif(not _have_x265(), reason="libx265 unavailable")
class TestResidualGenerator:
    def test_base(self):
        # interpret-mode steps cost ~10ms each on CPU; a 32x32 CTU-16
        # sparse stream (~500 bins, 8 TUs) keeps the fast tier snappy
        # while every phase still fires (last prefix/suffix, csbf, sig,
        # g1/g2, signs, remaining)
        n_res, n_all = _roundtrip_gen(
            32, 32, 30, {"wpp": "0", "ctu": "16"}, sparse=True
        )
        assert n_res > 0.3 * n_all

    @pytest.mark.slow
    def test_dense_random(self):
        n_res, n_all = _roundtrip_gen(64, 64, 35, {"wpp": "0"})
        assert n_res > 0.3 * n_all

    @pytest.mark.slow
    def test_main10(self):
        """Main-10 through the generator: residual_coding() is
        bit-depth-independent in HEVC v1, so 10-bit streams must
        round-trip the device state machine unchanged."""
        if not x265enc.available(10):
            pytest.skip("libx265 lacks a 10-bit encoder")
        from heif_tpu.ops import pallas_cabac_gen as G  # noqa: F401

        rng = np.random.default_rng(17)
        y = rng.integers(0, 1024, (64, 64)).astype(np.uint16)
        cb = rng.integers(0, 1024, (32, 32)).astype(np.uint16)
        cr = rng.integers(0, 1024, (32, 32)).astype(np.uint16)
        stream = x265enc.encode_i_frame(
            y, cb, cr, qp=30, bit_depth=10, options={"wpp": "0"}
        )
        sps, pps, ps = _parse(stream)
        tr = envelope_trace(sps, pps, ps)
        rbsp = bytes(ps.rbsp)
        entries, seg_spans = [], []
        for si, seg in enumerate(tr.segments):
            tape, n_steps = build_envelope_tape(tr, si)
            entries.append((rbsp, seg, tape, n_steps))
            seg_spans.append(sorted(
                (sp for sp in tr.spans if sp.seg == si),
                key=lambda sp: sp.b0,
            ))
        events, state = G.run_gen_batch(entries, blk=64, interpret=True)
        planes = [np.zeros_like(p) for p in tr.syntax.coeffs]
        for lane, spans in enumerate(seg_spans):
            G.scatter_events(events[:, lane], spans, planes)
        for c in range(3):
            assert np.array_equal(planes[c], tr.syntax.coeffs[c]), c

    @pytest.mark.slow
    def test_decode_path_device_gen_wpp(self):
        """decode_hevc(entropy="device-gen") on a WPP stream: the
        decoder routes through gen_image's lane batching across
        multiple substream segments."""
        from heif_tpu.utils import oracle

        rng = np.random.default_rng(23)
        y = rng.integers(0, 256, (160, 64)).astype(np.uint8)
        y = (y // 3 + np.linspace(0, 120, 64, dtype=np.int32)[None, :]
             ).astype(np.uint8)
        cb = rng.integers(0, 256, (80, 32)).astype(np.uint8)
        cr = rng.integers(0, 256, (80, 32)).astype(np.uint8)
        stream = x265enc.encode_i_frame(
            y, cb, cr, qp=32, options={"ctu": "16"}
        )
        # the stream must actually carry WPP substreams
        sps, pps, ps = _parse(stream)
        assert pps.entropy_coding_sync_enabled_flag
        assert len(ps.substream_ranges()) > 1
        want = oracle.decode_hevc_annexb(stream)
        got = HeicDecoder.decode_hevc(
            stream, backend="ref", entropy="device-gen"
        )
        for c, k in enumerate(("Y", "Cb", "Cr")):
            assert np.array_equal(got[k], want[c]), k

    def test_decode_path_device_gen_entropy(self):
        """The generator as a DECODE PATH: decode_hevc(entropy=
        "device-gen") reconstructs from device-emitted coefficients and
        must be bit-exact vs libde265 (the host's own residual results
        are discarded before reconstruction)."""
        from heif_tpu.utils import oracle

        rng = np.random.default_rng(9)
        y = np.full((32, 32), 120, np.uint8)
        y[:16, :16] = rng.integers(0, 256, (16, 16))
        cb = np.full((16, 16), 90, np.uint8)
        cr = np.full((16, 16), 150, np.uint8)
        stream = x265enc.encode_i_frame(
            y, cb, cr, qp=28, options={"wpp": "0", "ctu": "16"}
        )
        want = oracle.decode_hevc_annexb(stream)
        got = HeicDecoder.decode_hevc(
            stream, backend="ref", entropy="device-gen"
        )
        for c, k in enumerate(("Y", "Cb", "Cr")):
            assert np.array_equal(got[k], want[c]), k

    @pytest.mark.slow
    def test_qp_low_dense_coeffs(self):
        _roundtrip_gen(64, 64, 12, {"wpp": "0"})

    @pytest.mark.slow
    def test_qp_high_sparse(self):
        _roundtrip_gen(64, 64, 45, {"wpp": "0"})

    @pytest.mark.slow
    def test_signhide_off(self):
        _roundtrip_gen(64, 64, 26, {"wpp": "0", "signhide": "0"})

    @pytest.mark.slow
    def test_wpp_multi_segment(self):
        _roundtrip_gen(64, 96, 28, {})

    @pytest.mark.slow
    def test_ctu16_scan_modes(self):
        # small CTUs force 4x4/8x8 TUs where mode-dependent horizontal /
        # vertical scans (and their last-position swap) engage
        _roundtrip_gen(64, 64, 24, {"ctu": "16", "wpp": "0"})
