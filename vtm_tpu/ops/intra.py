"""Intra prediction sample ops — exact integer reference implementations.

Behavioral contract from CommonLib/IntraPrediction.cpp: reference-sample
fill/pad (xFillReferenceSamples:~860), [1 2 1] reference smoothing
(xFilterReferenceSamples), planar (xPredIntraPlanar:294), DC (xGetPredValDc
:153), angular with wide-angle remap, 4-tap cubic(DCT-IF)/smoothing
interpolation and PDPC (xPredIntraAng:459, predIntraAng:217), and the MDIS
filter decisions (initPredIntraParams:356).

Reference layout here: `top[0]` is the top-left corner sample, `top[1..]`
the above row; `left[0]` the same corner, `left[1..]` the left column —
matching the reference's refBufUnfiltered rows at stride predStride.
"""

from __future__ import annotations

import numpy as np

from vtm_tpu.common import rom

PLANAR_IDX, DC_IDX, HOR_IDX, VER_IDX, DIA_IDX, VDIA_IDX = 0, 1, 18, 50, 34, 66
NUM_LUMA_MODE = 67

ANG_TABLE = [0, 1, 2, 3, 4, 6, 8, 10, 12, 14, 16, 18, 20, 23, 26, 29, 32, 35,
             39, 45, 51, 57, 64, 73, 86, 102, 128, 171, 256, 341, 512, 1024]
INV_ANG_TABLE = [0, 16384, 8192, 5461, 4096, 2731, 2048, 1638, 1365, 1170,
                 1024, 910, 819, 712, 630, 565, 512, 468, 420, 364, 321, 287,
                 256, 224, 191, 161, 128, 96, 64, 48, 32, 16]
INTRA_FILTER_THRESH = [24, 24, 24, 14, 2, 0, 0, 0]  # m_aucIntraFilter per log2 size

_CHROMA_FILTER = rom.chroma_filter().astype(np.int64)  # (32, 4) DCT-IF


def floor_log2(x: int) -> int:
    return x.bit_length() - 1


def modified_wide_angle(width: int, height: int, pred_mode: int) -> int:
    if DC_IDX < pred_mode <= VDIA_IDX:
        mode_shift = [0, 6, 10, 12, 14, 15]
        delta = abs(floor_log2(width) - floor_log2(height))
        if width > height and pred_mode < 2 + mode_shift[delta]:
            pred_mode += VDIA_IDX - 1
        elif height > width and pred_mode > VDIA_IDX - mode_shift[delta]:
            pred_mode -= VDIA_IDX - 1
    return pred_mode


class IntraParams:
    """m_ipaParam equivalent (initPredIntraParams)."""

    def __init__(self, dir_mode: int, pu_w: int, pu_h: int, cu_w: int, cu_h: int,
                 is_luma: bool, multi_ref_idx: int, use_isp: bool, bdpcm: bool):
        blk_w, blk_h = (cu_w, cu_h) if use_isp and is_luma else (pu_w, pu_h)
        pred_mode = modified_wide_angle(blk_w, blk_h, dir_mode)
        self.pred_mode = pred_mode
        self.is_mode_ver = pred_mode >= DIA_IDX
        self.multi_ref_idx = multi_ref_idx if is_luma else 0
        self.ref_filter_flag = False
        self.interpolation_flag = False
        self.apply_pdpc = (pu_w >= 4 and pu_h >= 4) and self.multi_ref_idx == 0
        self.intra_pred_angle = 0
        self.inv_angle = 0
        self.angular_scale = 0
        angle_mode = (pred_mode - VER_IDX) if self.is_mode_ver else -(pred_mode - HOR_IDX)
        abs_ang = 0
        if DC_IDX < dir_mode < NUM_LUMA_MODE:
            abs_mode = abs(angle_mode)
            sign = -1 if angle_mode < 0 else 1
            abs_ang = ANG_TABLE[abs_mode]
            self.inv_angle = INV_ANG_TABLE[abs_mode]
            self.intra_pred_angle = sign * abs_ang
            if angle_mode < 0:
                self.apply_pdpc = False
            elif angle_mode > 0:
                side = pu_h if self.is_mode_ver else pu_w
                self.angular_scale = min(
                    2, floor_log2(side) - (floor_log2(3 * self.inv_angle - 2) - 8)
                )
                self.apply_pdpc = self.apply_pdpc and self.angular_scale >= 0
        # MDIS / reference filter decision
        if (not is_luma) or use_isp or self.multi_ref_idx or dir_mode == DC_IDX:
            pass
        elif bdpcm:
            self.ref_filter_flag = False
        elif dir_mode == PLANAR_IDX:
            self.ref_filter_flag = pu_w * pu_h > 32
        else:
            diff = min(abs(pred_mode - HOR_IDX), abs(pred_mode - VER_IDX))
            log2_size = (floor_log2(pu_w) + floor_log2(pu_h)) >> 1
            if diff > INTRA_FILTER_THRESH[log2_size]:
                is_integer = abs_ang in (0, 32, 64, 512, 1024) or (abs_ang & 31) == 0
                # isIntegerSlope: (absAng & 0x1F) == 0
                is_integer = (abs_ang & 0x1F) == 0
                self.ref_filter_flag = is_integer
                self.interpolation_flag = not is_integer


def filter_reference_samples(top: np.ndarray, left: np.ndarray,
                             pred_size: int, pred_hsize: int, mrl: int):
    """[1 2 1]/4 smoothing (xFilterReferenceSamples). Arrays modified copy."""
    ps = pred_size + mrl
    phs = pred_hsize + mrl
    ft = top.copy()
    fl = left.copy()
    top_left = (int(top[0]) + int(top[1]) + int(left[0]) + int(left[1]) + 2) >> 2
    ft[0] = top_left
    for i in range(1, ps):
        ft[i] = (int(top[i - 1]) + 2 * int(top[i]) + int(top[i + 1]) + 2) >> 2
    ft[ps] = top[ps]
    fl[0] = top_left
    for i in range(1, phs):
        fl[i] = (int(left[i - 1]) + 2 * int(left[i]) + int(left[i + 1]) + 2) >> 2
    fl[phs] = left[phs]
    return ft, fl


def pred_planar(top: np.ndarray, left: np.ndarray, w: int, h: int) -> np.ndarray:
    log2w, log2h = floor_log2(w), floor_log2(h)
    top_row = top[1 : w + 2].astype(np.int64)  # w+1 entries
    left_col = left[1 : h + 2].astype(np.int64)
    bottom_left = left_col[h]
    top_right = top_row[w]
    t = top_row[:w]
    l = left_col[:h]
    bottom_row = bottom_left - t  # (w,)
    right_col = top_right - l  # (h,)
    top_scaled = t << log2h
    left_scaled = l << log2w
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    hor = left_scaled[:, None] + (x + 1) * right_col[:, None]
    ver = top_scaled[None, :] + (y + 1) * bottom_row[None, :]
    offset = 1 << (log2w + log2h)
    final_shift = 1 + log2w + log2h
    return ((hor << log2h) + (ver << log2w) + offset) >> final_shift


def pred_dc(top: np.ndarray, left: np.ndarray, w: int, h: int, mrl: int) -> int:
    denom = (w << 1) if w == h else max(w, h)
    shift = floor_log2(denom)
    off = denom >> 1
    s = 0
    if w >= h:
        s += int(np.sum(top[mrl + 1 : mrl + 1 + w].astype(np.int64)))
    if w <= h:
        s += int(np.sum(left[mrl + 1 : mrl + 1 + h].astype(np.int64)))
    return (s + off) >> shift


def pred_angular(
    top: np.ndarray,
    left: np.ndarray,
    w: int,
    h: int,
    p: IntraParams,
    is_luma: bool,
    bit_depth: int,
) -> np.ndarray:
    """xPredIntraAng — returns (h, w) int array (no PDPC; applied by caller
    for angular modes inside, matching reference placement)."""
    mrl = p.multi_ref_idx
    angle = p.intra_pred_angle
    inv_angle = p.inv_angle
    is_ver = p.is_mode_ver
    # build refMain / refSide as python lists indexed from negative offsets
    # use dict-free approach: offset arrays
    if angle < 0:
        # refAbove[x + height] = top[x] for x in 0..w+1+mrl
        ref_above = np.zeros(1400, dtype=np.int64)
        ref_left = np.zeros_like(ref_above)
        for x in range(w + 2 + mrl):
            ref_above[x + h] = top[x]
        for y in range(h + 2 + mrl):
            ref_left[y + w] = left[y]
        if is_ver:
            ref_main_base = h
            ref_main = ref_above
            ref_side = ref_left
            side_off = w
        else:
            ref_main_base = w
            ref_main = ref_left
            ref_side = ref_above
            side_off = h
        size_side = h if is_ver else w
        for k in range(-size_side, 0):
            idx = min((-k * inv_angle + 256) >> 9, size_side)
            ref_main[ref_main_base + k] = ref_side[side_off + idx]
    else:
        top_ref_len = w * 2
        left_ref_len = h * 2
        ref_above = np.zeros(1400, dtype=np.int64)
        ref_left = np.zeros_like(ref_above)
        for x in range(top_ref_len + mrl + 1):
            ref_above[x] = top[x]
        for y in range(left_ref_len + mrl + 1):
            ref_left[y] = left[y]
        ref_main = ref_above if is_ver else ref_left
        ref_side = ref_left if is_ver else ref_above
        ref_main_base = 0
        log2_ratio = floor_log2(w) - floor_log2(h)
        s = max(0, log2_ratio if is_ver else -log2_ratio)
        max_index = (mrl << s) + 2
        ref_length = top_ref_len if is_ver else left_ref_len
        val = ref_main[ref_length + mrl]
        for z in range(1, max_index + 1):
            ref_main[ref_length + mrl + z] = val
    # swap w/h for horizontal modes
    dw, dh = (w, h) if is_ver else (h, w)
    dst = np.zeros((dh, dw), dtype=np.int64)
    rm = ref_main_base + mrl  # compensate line offset
    rs_base = (w if angle < 0 and is_ver else (h if angle < 0 else 0)) + mrl
    ref_side_arr = ref_side
    maxv = (1 << bit_depth) - 1
    if angle == 0:
        for y in range(dh):
            dst[y, :] = ref_main[rm + 1 : rm + 1 + dw]
        if p.apply_pdpc:
            scale = (floor_log2(dw) + floor_log2(dh) - 2) >> 2
            top_left_s = ref_main[rm]
            for y in range(dh):
                left_s = ref_side_arr[rs_base + 1 + y]
                for x in range(min(3 << scale, dw)):
                    wl = 32 >> ((2 * x) >> scale)
                    val = dst[y, x] + ((wl * (left_s - top_left_s) + 32) >> 6)
                    dst[y, x] = max(0, min(maxv, val))
    else:
        delta_pos = angle * (1 + mrl)
        abs_ang_int = (abs(angle) & 0x1F) == 0
        for y in range(dh):
            delta_int = delta_pos >> 5
            delta_fract = delta_pos & 31
            if not abs_ang_int:
                if is_luma:
                    use_cubic = not p.interpolation_flag
                    if use_cubic:
                        f = _CHROMA_FILTER[delta_fract]
                    else:
                        f = np.array(
                            [16 - (delta_fract >> 1), 32 - (delta_fract >> 1),
                             16 + (delta_fract >> 1), delta_fract >> 1],
                            dtype=np.int64,
                        )
                    base = rm + delta_int
                    p0 = ref_main[base : base + dw]
                    p1 = ref_main[base + 1 : base + 1 + dw]
                    p2 = ref_main[base + 2 : base + 2 + dw]
                    p3 = ref_main[base + 3 : base + 3 + dw]
                    val = (f[0] * p0 + f[1] * p1 + f[2] * p2 + f[3] * p3 + 32) >> 6
                    dst[y, :] = np.clip(val, 0, maxv)
                else:
                    base = rm + delta_int + 1
                    p0 = ref_main[base : base + dw]
                    p1 = ref_main[base + 1 : base + 1 + dw]
                    dst[y, :] = p0 + ((delta_fract * (p1 - p0) + 16) >> 5)
            else:
                base = rm + delta_int + 1
                dst[y, :] = ref_main[base : base + dw]
            if p.apply_pdpc:
                scale = p.angular_scale
                inv_angle_sum = 256
                for x in range(min(3 << scale, dw)):
                    inv_angle_sum += inv_angle
                    wl = 32 >> ((2 * x) >> scale)
                    left_s = ref_side_arr[rs_base + y + (inv_angle_sum >> 9) + 1]
                    dst[y, x] = dst[y, x] + ((wl * (left_s - dst[y, x]) + 32) >> 6)
            delta_pos += angle
    if not is_ver:
        dst = dst.T
    return dst


def pdpc_planar_dc(pred: np.ndarray, top: np.ndarray, left: np.ndarray) -> np.ndarray:
    """PDPC for planar/DC (predIntraAng tail)."""
    h, w = pred.shape
    scale = (floor_log2(w) - 2 + floor_log2(h) - 2 + 2) >> 2
    out = pred.astype(np.int64).copy()
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    wt = 32 >> np.minimum(31, (y << 1) >> scale)
    wl = 32 >> np.minimum(31, (x << 1) >> scale)
    left_col = left[1 : h + 1].astype(np.int64)[:, None]
    top_row = top[1 : w + 1].astype(np.int64)[None, :]
    out = out + ((wl * (left_col - out) + wt * (top_row - out) + 32) >> 6)
    return out


def pred_bdpcm(top: np.ndarray, left: np.ndarray, w: int, h: int, dir_mode: int,
               bit_depth: int) -> np.ndarray:
    """xPredIntraBDPCM: 1=horizontal (copy left), 2=vertical (copy top)."""
    if dir_mode == 1:
        return np.tile(left[1 : h + 1].astype(np.int64)[:, None], (1, w))
    return np.tile(top[1 : w + 1].astype(np.int64)[None, :], (h, 1))
