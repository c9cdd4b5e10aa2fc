"""CLI surface tests (probe + decode to .npz on the ref backend).

Parity target: reference src/main.rs decodes one file from the CLI; ours
adds probe/verify/bench subcommands (SURVEY.md §2.1 row 2).
"""

import json
import os

import numpy as np

from heif_tpu.cli import main

ASSET = os.path.join(os.path.dirname(__file__), "assets", "halfmoonbay.heic")


def test_probe(capsys):
    rc = main(["probe", ASSET])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ispe"] == [4032, 3024]
    assert out["display"] == [3024, 4032]
    assert out["rotation_ccw_deg"] == 270
    assert out["grid"]["rows"] == 6
    assert out["grid"]["columns"] == 8
    assert out["grid"]["tiles"] == 48
    assert out["luma_bit_depth"] == 8


def test_decode_npz(tmp_path):
    out = str(tmp_path / "out.npz")
    rc = main(["decode", ASSET, "-o", out, "--backend", "jax"])
    assert rc == 0
    z = np.load(out)
    # irot=3 applied: display orientation 3024x4032
    assert z["Y"].shape == (4032, 3024)
    assert z["Cb"].shape == (2016, 1512)
    assert z["Y"].dtype == np.uint8
