"""Pallas intra-prediction kernel vs the XLA/numpy reference (interpret
mode on CPU; the same kernel compiles for real TPUs via Mosaic)."""

import numpy as np
import pytest

from heif_tpu.container.reader import HeifReader
from heif_tpu.hevc import params
from heif_tpu.hevc import slice as sl
from heif_tpu.hevc.rbsp import remove_emulation_prevention
from heif_tpu.cabac.syntax import TileSyntaxDecoder
from heif_tpu.ops import ref_recon as R


@pytest.mark.parametrize("comp", [0])
def test_pallas_intra_interpret_bit_exact(halfmoonbay_bytes, comp):
    import jax.numpy as jnp

    from heif_tpu.ops import jax_recon as J
    from heif_tpu.ops import pallas_intra as PI
    from heif_tpu.ops.batch import pack_batch

    r = HeifReader(halfmoonbay_bytes)
    heif = r.read()
    rec = heif.hevc_configuration_record()
    sps = params.parse_sps(
        remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:])
    )
    pps = params.parse_pps(
        remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:])
    )
    slices = [
        sl.parse_slice_header(
            sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps
        )
        for t in (1, 38)
    ]
    sts = [TileSyntaxDecoder(sps, pps, ps).decode() for ps in slices]
    bp = pack_batch(sts, sps, pps, slices)
    n = bp.n
    h = bp.height if comp == 0 else bp.height // 2
    w = bp.width if comp == 0 else bp.width // 2
    res_np = np.zeros((n, h + J.PAD, w + J.PAD), np.int32)
    refs = []
    for i, st in enumerate(sts):
        rp = R.residual_planes(st, sps)
        res_np[i, :h, :w] = rp[comp]
        refs.append(R.intra_reconstruct(st, rp, sps)[comp])
    meta = PI.build_meta(bp.xs[comp])
    src = J.ref_sources_device(
        jnp.asarray(bp.xs[comp][0]),
        jnp.asarray(bp.xs[comp][1]),
        jnp.asarray(bp.xs[comp][2]),
        comp=comp, W=bp.width, H=bp.height, ctb_log2=sps.ctb_log2_size_y,
    )
    out = np.asarray(
        PI.intra_scan_pallas(
            jnp.asarray(res_np),
            jnp.asarray(meta),
            src,
            h, w, comp == 0, False,
            interpret=True,
        )
    )
    for i in range(n):
        assert (out[i] == refs[i]).all(), f"tile {i} comp {comp} differs"


def test_pallas_chroma2_interpret_bit_exact(halfmoonbay_bytes):
    """Merged Cb+Cr kernel vs the scalar reference, both chroma planes."""
    import jax.numpy as jnp

    from heif_tpu.ops import jax_recon as J
    from heif_tpu.ops import pallas_intra as PI
    from heif_tpu.ops.batch import pack_batch

    r = HeifReader(halfmoonbay_bytes)
    heif = r.read()
    rec = heif.hevc_configuration_record()
    sps = params.parse_sps(
        remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:])
    )
    pps = params.parse_pps(
        remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:])
    )
    slices = [
        sl.parse_slice_header(
            sl.split_length_prefixed_nals(r.get_item_data(t), 4)[0], sps, pps
        )
        for t in (1, 38)
    ]
    sts = [TileSyntaxDecoder(sps, pps, ps).decode() for ps in slices]
    bp = pack_batch(sts, sps, pps, slices)
    n = bp.n
    h, w = bp.height // 2, bp.width // 2
    res_np = [np.zeros((n, h + J.PAD, w + J.PAD), np.int32) for _ in range(2)]
    refs = []
    for i, st in enumerate(sts):
        rp = R.residual_planes(st, sps)
        res_np[0][i, :h, :w] = rp[1]
        res_np[1][i, :h, :w] = rp[2]
        rec_planes = R.intra_reconstruct(st, rp, sps)
        refs.append((rec_planes[1], rec_planes[2]))
    meta = PI.build_meta(bp.xs[1])
    src = J.ref_sources_device(
        jnp.asarray(bp.xs[1][0]),
        jnp.asarray(bp.xs[1][1]),
        jnp.asarray(bp.xs[1][2]),
        comp=1, W=bp.width, H=bp.height, ctb_log2=sps.ctb_log2_size_y,
    )
    cb, cr = PI.intra_scan_pallas_chroma2(
        jnp.asarray(res_np[0]),
        jnp.asarray(res_np[1]),
        jnp.asarray(meta),
        src,
        h, w,
        interpret=True,
    )
    cb, cr = np.asarray(cb), np.asarray(cr)
    for i in range(n):
        assert (cb[i] == refs[i][0]).all(), f"tile {i} Cb differs"
        assert (cr[i] == refs[i][1]).all(), f"tile {i} Cr differs"


def test_geometry_gate():
    """Small planes whose aligned VMEM windows overrun the padded
    allocation must be rejected (they silently decoded WRONG on real
    TPU — caught by the device-gen entropy validation, round 5); the
    production geometries must stay on the Pallas path."""
    from heif_tpu.ops.pallas_intra import geometry_ok

    # flagship tile luma/chroma, aux item mono luma/dummy chroma
    for h, w in ((512, 512), (256, 256), (1512, 2016), (756, 1008)):
        assert geometry_ok(h, w), (h, w)
    # small fixtures: chroma (and some luma) windows overrun
    for h, w in ((32, 32), (48, 80), (96, 160)):
        assert not geometry_ok(h, w), (h, w)

    # the batch gate requires BOTH the luma and the half-size chroma
    # geometry, so a 64x64 picture (chroma 32x32) takes the XLA path
    assert geometry_ok(64, 64) and not geometry_ok(32, 32)
