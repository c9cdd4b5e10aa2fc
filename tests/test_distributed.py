"""Multi-host scaffolding: distributed init fallback + sharded burst decode
with scaling-efficiency accounting (BASELINE.md config 4, on the virtual
8-device CPU mesh per SURVEY.md §4's test-without-hardware strategy)."""

import numpy as np
import pytest

from heif_tpu.parallel import distributed as D


def test_init_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert D.init_distributed() is False


def test_burst_result_math():
    r = D.BurstResult(images=2, tiles=96, megapixels=24.4, wall_s=2.0,
                      n_devices=8)
    assert r.mp_per_s == pytest.approx(12.2)
    assert r.mp_per_s_per_chip == pytest.approx(1.525)
    assert r.scaling_efficiency(1.525) == pytest.approx(1.0)
    d = r.as_dict()
    assert d["n_devices"] == 8 and d["images"] == 2


@pytest.mark.slow
def test_burst_sharded_bit_exact_and_scaling(halfmoonbay_bytes):
    """2-image burst over the 8-device mesh: bit-exact + efficiency vs
    a 1-device mesh run of the same work."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from heif_tpu.utils import oracle

    imgs = [halfmoonbay_bytes, halfmoonbay_bytes]
    outs, res = D.decode_burst_sharded(imgs, mesh=D.make_global_mesh(8))
    assert res.images == 2 and res.tiles == 96
    assert res.n_devices == 8
    ref = oracle.decode_heic_via_de265(halfmoonbay_bytes)
    for out in outs:
        assert np.array_equal(out["Y"], ref["Y"])
        assert np.array_equal(out["Cb"], ref["Cb"])
        assert np.array_equal(out["Cr"], ref["Cr"])
    # scaling efficiency vs a single-device mesh on one image
    _, res1 = D.decode_burst_sharded(
        [halfmoonbay_bytes], mesh=D.make_global_mesh(1)
    )
    eff = res.scaling_efficiency(res1.mp_per_s_per_chip)
    assert eff > 0.1  # virtual CPU devices share cores; just sanity-bound
