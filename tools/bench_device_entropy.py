"""Aggregate device-entropy throughput over every (tile, WPP-row) CABAC
stream of a HEIC image — the SURVEY.md §7 step-6 measurement.

Traces all streams with the Python oracle engine, replays them on the
Pallas TPU engine in length-sorted 128-lane batches, verifies
bit-exactness (bins + final context state), and reports honest wall
throughput (fresh inputs per rep, checksum-forced execution; see
ops/pallas_cabac.py docstring for why both matter on tunneled runtimes).

Usage: python tools/bench_device_entropy.py [image.heic] [--gen]

--gen runs the residual request GENERATOR engine instead of tape replay
(ops.pallas_cabac_gen): the device receives only the envelope tape and
derives every residual-coding request itself, validated by coefficient
and final-context equality. Prints one JSON line either way.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/heif_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from heif_tpu.cabac.syntax import TileSyntaxDecoder
    from heif_tpu.cabac.trace import trace_tile
    from heif_tpu.container.reader import HeifReader
    from heif_tpu.hevc import params
    from heif_tpu.hevc import slice as sl
    from heif_tpu.hevc.rbsp import remove_emulation_prevention
    from heif_tpu.ops import pallas_cabac as PC

    args = [a for a in sys.argv[1:] if a != "--gen"]
    gen_mode = "--gen" in sys.argv[1:]
    path = args[0] if args else "tests/assets/halfmoonbay.heic"
    data = open(path, "rb").read()
    r = HeifReader(data)
    heif = r.read()
    rec = heif.hevc_configuration_record()
    sps = params.parse_sps(
        remove_emulation_prevention(rec.nal_units_of_type(33)[0][2:])
    )
    pps = params.parse_pps(
        remove_emulation_prevention(rec.nal_units_of_type(34)[0][2:])
    )
    tids = heif.item_ids_referencing(heif.primary_item_id(), "dimg")

    if gen_mode:
        return run_gen(r, heif, sps, pps, tids)

    t0 = time.perf_counter()
    entries = []
    for tid in tids:
        parsed = sl.parse_slice_header(
            sl.split_length_prefixed_nals(r.get_item_data(tid), 4)[0],
            sps, pps,
        )
        rbsp = bytes(TileSyntaxDecoder(sps, pps, parsed).rbsp)
        for seg in trace_tile(sps, pps, parsed):
            entries.append((rbsp, seg))
    total_bins = sum(s.n_bins for _, s in entries)
    print(
        f"# traced {len(tids)} tiles -> {len(entries)} streams, "
        f"{total_bins / 1e6:.2f}M bins in {time.perf_counter() - t0:.1f}s",
        file=sys.stderr,
    )

    # bit-exactness across ALL streams (interpret=False, real device)
    out = PC.replay_image(entries)
    for (rb, s), (bins, p_fin, mps_fin) in zip(entries, out):
        assert np.array_equal(bins, s.bins), "bin mismatch"
        assert np.array_equal(p_fin, s.p_final), "ctx p mismatch"
        assert np.array_equal(mps_fin, s.mps_final), "ctx mps mismatch"
    print("# all streams bit-exact incl. final ctx state", file=sys.stderr)

    real, padded, wall = PC.bench_device_entropy(entries)
    print(
        json.dumps(
            {
                "metric": "device_entropy_throughput",
                "value": round(real, 1),
                "unit": "Mbins/s",
                "padded_mbins_s": round(padded, 1),
                "streams": len(entries),
                "total_bins": total_bins,
                "wall_ms": round(wall * 1e3, 1),
            }
        )
    )


def run_gen(r, heif, sps, pps, tids):
    """Generator-engine path: envelope tapes only; the device derives
    residual requests itself and emits coefficients as events."""
    import numpy as np

    from heif_tpu.cabac.envelope import build_envelope_tape, envelope_trace
    from heif_tpu.hevc import slice as sl
    from heif_tpu.ops import pallas_cabac_gen as G

    t0 = time.perf_counter()
    entries = []       # (rbsp, seg, tape, n_steps, spans)
    tile_of = []       # entry -> tile ordinal
    goldens = []       # per tile: host coeff planes
    for ti, tid in enumerate(tids):
        parsed = sl.parse_slice_header(
            sl.split_length_prefixed_nals(r.get_item_data(tid), 4)[0],
            sps, pps,
        )
        tr = envelope_trace(sps, pps, parsed)
        rbsp = bytes(parsed.rbsp)
        goldens.append(tr.syntax.coeffs)
        for si, seg in enumerate(tr.segments):
            tape, n_steps = build_envelope_tape(tr, si)
            spans = sorted(
                (sp for sp in tr.spans if sp.seg == si),
                key=lambda sp: sp.b0,
            )
            entries.append((rbsp, seg, tape, n_steps, spans))
            tile_of.append(ti)
    total_bins = sum(s.n_bins for _, s, _, _, _ in entries)
    env_entries = sum(t.size for _, _, t, _, _ in entries)
    print(
        f"# {len(entries)} streams, {total_bins / 1e6:.2f}M bins total; "
        f"envelope tape {env_entries / 1e6:.2f}M entries "
        f"(device generates the remaining "
        f"{(total_bins - env_entries) / 1e6:.2f}M+ residual requests) "
        f"[prep {time.perf_counter() - t0:.1f}s]",
        file=sys.stderr,
    )

    # full validation on the real device: coefficients + final ctx state
    out = G.gen_image(entries)
    planes = [
        [np.zeros_like(p) for p in g] for g in goldens
    ]
    for ei, (evc, p_fin, mps_fin) in enumerate(out):
        _, s, _, _, spans = entries[ei]
        G.scatter_events(evc, spans, planes[tile_of[ei]])
        assert np.array_equal(p_fin, s.p_final), f"stream {ei}: ctx p"
        assert np.array_equal(mps_fin, s.mps_final), f"stream {ei}: ctx mps"
    for ti, g in enumerate(goldens):
        for c in range(3):
            assert np.array_equal(planes[ti][c], g[c]), (
                f"tile {ti} plane {c}: "
                f"{np.count_nonzero(planes[ti][c] != g[c])} diffs"
            )
    print(
        "# all streams: coefficients + final ctx state match the host "
        "decoder exactly",
        file=sys.stderr,
    )

    mbins, steps_s, wall = G.bench_gen_image(entries)
    print(
        json.dumps(
            {
                "metric": "device_entropy_generated_throughput",
                "value": round(mbins, 2),
                "unit": "Mbins/s",
                "steps_per_s": round(steps_s),
                "streams": len(entries),
                "total_bins": total_bins,
                "envelope_entries": env_entries,
                "wall_ms": round(wall * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
