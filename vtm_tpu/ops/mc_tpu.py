"""TPU-batched motion compensation (JAX/XLA).

TPU-first redesign of the MC interpolation (InterpolationFilter.cpp): instead
of per-block FIR calls, every inter block of a frame is decomposed into
uniform 4x4 luma (2x2 chroma) subblocks.  Each subblock carries an integer
reference offset and a fractional phase; the whole frame's subblocks are
gathered into one (N, S, S) window tensor and filtered with two batched
einsum passes over per-phase tap matrices — large, static-shape matmuls that
XLA tiles onto the MXU/VPU.  Bit-exact vs the scalar path (the FIR of a W×H
block is separable per output sample, so tiling into 4x4s with the same taps
is lossless).

Filter-set selection (regular / lumaFilter4x4 / alt-hpel) is encoded per
subblock as an index into a stacked coefficient bank, preserving the
reference's block-size-dependent dispatch (InterpolationFilter.cpp:749).
"""

from __future__ import annotations

import numpy as np

from vtm_tpu.common import rom
from vtm_tpu.ops import mc as MC

SUB = 4  # luma subblock edge
_TAPS_L = 8
_TAPS_C = 4

# filter banks: [set * phase, tap]
_LUMA_BANK = np.concatenate([
    rom.get("lumaFilter"),                            # set 0: regular (16)
    rom.get("lumaFilter4x4"),                         # set 1: 4x4/affine (16)
    np.tile(rom.get("lumaAltHpelIFilter"), (16, 1)),  # set 2: alt hpel (16)
]).astype(np.int32)
_CHROMA_BANK = rom.get("chromaFilter").astype(np.int32)  # (32, 4)


def _phase_matrices(bank: np.ndarray, out_len: int) -> np.ndarray:
    """(nfilters, out_len, out_len+taps-1) sliding-FIR matrices."""
    taps = bank.shape[-1]
    win = out_len + taps - 1
    m = np.zeros((bank.shape[0], out_len, win), dtype=np.int32)
    for i in range(bank.shape[0]):
        for o in range(out_len):
            m[i, o, o : o + taps] = bank[i]
    return m


_LUMA_M = _phase_matrices(_LUMA_BANK, SUB)      # (48, 4, 11)
_CHROMA_M = _phase_matrices(_CHROMA_BANK, 2)    # (32, 2, 5)


def gather_windows(plane: np.ndarray, x0: np.ndarray, y0: np.ndarray,
                   win: int) -> np.ndarray:
    """Clamped (border-replicating) window gather → (N, win, win).

    The clamp replicates picture borders exactly like the reference's
    extendPicBorder margins.  x0/y0 address the top-left of the filter
    support (output position − (taps/2 − 1))."""
    ph, pw = plane.shape
    ys = np.clip(y0[:, None] + np.arange(win)[None, :], 0, ph - 1)
    xs = np.clip(x0[:, None] + np.arange(win)[None, :], 0, pw - 1)
    return plane[ys[:, :, None], xs[:, None, :]]


def make_mc_kernel(bd: int = 10, luma: bool = True, uni: bool = True):
    """Jitted fn(windows, sel_h, sel_v, mode) → (N, S, S) predictions.

    windows: (N, WIN, WIN) int32 reference windows (support starts at [0,0])
    sel_h/sel_v: (N,) int32 filter-matrix index (set*16 + phase)
    mode: (N,) int32 — 0: integer position, 1: hor-only, 2: ver-only, 3: 2-D
    uni=True → final clipped samples; uni=False → 14-bit bi intermediates.
    All shift/offset variants follow InterpolationFilter::filter[Copy]
    (InterpolationFilter.cpp:397-660) exactly.
    """
    import jax
    import jax.numpy as jnp

    sub = SUB if luma else 2
    taps = _TAPS_L if luma else _TAPS_C
    win = sub + taps - 1
    half = (taps >> 1) - 1
    hr = max(2, MC.IF_INTERNAL_PREC - bd)
    offs = MC.IF_INTERNAL_OFFS
    maxv = (1 << bd) - 1

    bank = jnp.asarray(_LUMA_BANK if luma else _CHROMA_BANK)  # (F, taps)

    def kernel(windows, sel_h, sel_v, mode):
        w = windows.astype(jnp.int32)
        ch = bank[sel_h]  # (N, taps)
        cv = bank[sel_v]
        s1 = 6 - hr
        o1 = -offs << s1

        def fir_cols(x):
            # horizontal FIR: x (N, R, win) → (N, R, sub)
            acc = ch[:, 0][:, None, None] * x[:, :, 0:sub]
            for k in range(1, taps):
                acc = acc + ch[:, k][:, None, None] * x[:, :, k : k + sub]
            return acc

        def fir_rows(x):
            # vertical FIR: x (N, win, C) → (N, sub, C)
            acc = cv[:, 0][:, None, None] * x[:, 0:sub, :]
            for k in range(1, taps):
                acc = acc + cv[:, k][:, None, None] * x[:, k : k + sub, :]
            return acc

        hor_full = (fir_cols(w) + o1) >> s1              # (N, win, sub)
        ctr_rows = w[:, half : half + sub, :]             # (N, sub, win)
        ctr_cols = w[:, :, half : half + sub]             # (N, win, sub)
        center = w[:, half : half + sub, half : half + sub]
        if uni:
            copy = center
            hor1 = jnp.clip((fir_cols(ctr_rows) + 32) >> 6, 0, maxv)
            ver1 = jnp.clip((fir_rows(ctr_cols) + 32) >> 6, 0, maxv)
            s2 = 6 + hr
            o2 = (1 << (s2 - 1)) + (offs << 6)
            two = jnp.clip((fir_rows(hor_full) + o2) >> s2, 0, maxv)
        else:
            copy = (center << hr) - offs
            hor1 = hor_full[:, half : half + sub, :]
            ver1 = (fir_rows(ctr_cols) + o1) >> s1
            two = fir_rows(hor_full) >> 6
        out = jnp.where(
            (mode == 0)[:, None, None], copy,
            jnp.where(
                (mode == 1)[:, None, None], hor1,
                jnp.where((mode == 2)[:, None, None], ver1, two),
            ),
        )
        return out

    return jax.jit(kernel)


# ---------------------------------------------------------------------------
# frame-level driver: decompose a picture's inter CUs into subblock batches

def build_luma_jobs(dcs, cu_list):
    """Collect per-4x4-subblock MC jobs for uni-predicted luma.

    Returns (x0, y0, sel, mode, dst_x, dst_y) arrays; callers gather
    windows per reference picture and run the kernel once per frame."""
    from vtm_tpu.decoder import motion as M

    xs, ys, sel_h, sel_v, modes, dxs, dys = [], [], [], [], [], [], []
    for cu in cu_list:
        if cu.pred_mode != 0 or cu.interdir != 1:  # MODE_INTER uni-L0 only
            continue
        b = cu.blocks[0]
        mv = M.clip_mv_in_pic(cu.mv[0], b.x, b.y, dcs)
        fx, fy = mv[0] & 15, mv[1] & 15
        use_4x4 = b.w == 4 and b.h == 4
        alt = cu.imv == M.IMV_HPEL

        def fsel(frac):
            # per-pass dispatch precedence (InterpolationFilter.cpp:749):
            # alt-hpel (frac 8) > 4x4 filter > regular
            if alt and frac == 8:
                return 2 * 16 + frac
            if use_4x4:
                return 1 * 16 + frac
            return frac

        mode = (1 if fx else 0) | (2 if fy else 0)
        for yy in range(0, b.h, SUB):
            for xx in range(0, b.w, SUB):
                xs.append(b.x + xx + (mv[0] >> 4) - 3)
                ys.append(b.y + yy + (mv[1] >> 4) - 3)
                sel_h.append(fsel(fx))
                sel_v.append(fsel(fy))
                modes.append(mode)
                dxs.append(b.x + xx)
                dys.append(b.y + yy)
    return (np.array(xs), np.array(ys), np.array(sel_h), np.array(sel_v),
            np.array(modes), np.array(dxs), np.array(dys))
