"""Synthetic tiny tiles for compile checks and multi-chip dryruns.

Builds a consistent (sps, pps, header, SyntaxTensors) without any
bitstream: a WxH picture tiled with 8x8 intra TUs carrying random small
coefficients. Used by __graft_entry__ so the driver can compile-check and
dry-run the full pipeline on tiny shapes.
"""

from __future__ import annotations

import numpy as np

from heif_tpu.cabac import types as T
from heif_tpu.hevc import grammar as g


def synthetic_sps_pps(size: int = 64):
    sps = g.SequenceParameterSet()
    sps.pic_width_in_luma_samples = size
    sps.pic_height_in_luma_samples = size
    sps.chroma_format_idc = 1
    sps.log2_min_luma_coding_block_size_minus3 = 0   # min CB 8
    sps.log2_diff_max_min_luma_coding_block_size = 2  # CTB 32
    sps.log2_min_luma_transform_block_size_minus2 = 0  # min TB 4
    sps.log2_diff_max_min_luma_transform_block_size = 3  # max TB 32
    sps.sample_adaptive_offset_enabled_flag = True
    sps.scaling_list_enabled_flag = False
    pps = g.PictureParameterSet()
    sh = g.SliceSegmentHeader()
    sh.slice_sao_luma_flag = True
    sh.slice_sao_chroma_flag = True
    return sps, pps, sh


def synthetic_tile(size: int = 64, seed: int = 0) -> T.SyntaxTensors:
    """SyntaxTensors for a size x size picture of 8x8 DC-mode TUs."""
    rng = np.random.default_rng(seed)
    st = T.SyntaxTensors(width=size, height=size, chroma_format_idc=1)
    h = w = size
    hc = wc = size // 2
    st.coeffs = [
        np.zeros((h, w), np.int32),
        np.zeros((hc, wc), np.int32),
        np.zeros((hc, wc), np.int32),
    ]
    rows = []
    qp = 30
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            row = [0] * T.TU_FIELDS
            row[T.TU_COMP] = 0
            row[T.TU_X] = x
            row[T.TU_Y] = y
            row[T.TU_LOG2] = 3
            row[T.TU_CBF] = 1
            row[T.TU_PRED_MODE] = int(rng.integers(0, 35))
            row[T.TU_QP] = qp
            rows.append(row)
            st.coeffs[0][y : y + 2, x : x + 2] = rng.integers(
                -40, 40, (2, 2)
            )
    from heif_tpu.cabac.syntax import chroma_qp_from_luma

    for c in (1, 2):
        for y in range(0, hc, 4):
            for x in range(0, wc, 4):
                row = [0] * T.TU_FIELDS
                row[T.TU_COMP] = c
                row[T.TU_X] = x
                row[T.TU_Y] = y
                row[T.TU_LOG2] = 2
                row[T.TU_CBF] = 1
                row[T.TU_PRED_MODE] = 1
                row[T.TU_QP] = chroma_qp_from_luma(qp, 0)
                rows.append(row)
                st.coeffs[c][y : y + 2, x : x + 2] = rng.integers(-20, 20, (2, 2))
    st.tu_table = np.asarray(rows, dtype=np.int32)
    g4 = size // 4
    st.intra_mode_y = np.full((g4, g4), 1, np.int8)
    st.intra_mode_c = np.full((g4, g4), 1, np.int8)
    st.qp_y = np.full((g4, g4), qp, np.int8)
    st.bypass_map = np.zeros((g4, g4), bool)
    st.pcm_map = np.zeros((g4, g4), bool)
    ve = np.zeros((g4, g4), bool)
    he = np.zeros((g4, g4), bool)
    ve[:, ::2] = True
    he[::2, :] = True
    st.vert_edges = ve
    st.horiz_edges = he
    ctbs = -(-size // 32)
    st.sao = np.zeros((ctbs, ctbs, 3, T.SAO_FIELDS), np.int16)
    st.sao[:, :, 0, T.SAO_TYPE] = 2  # edge SAO, class 0, zero offsets
    st.pcm_planes = [
        np.zeros((h, w), np.uint16),
        np.zeros((hc, wc), np.uint16),
        np.zeros((hc, wc), np.uint16),
    ]
    return st


class _FakeParsed:
    """Minimal stand-in for ParsedSlice (pack only reads .header)."""

    def __init__(self, header):
        self.header = header
