"""TPU-batched MC kernel vs the scalar-exact reference path."""

import numpy as np
import pytest

from vtm_tpu.ops import mc as MC
from vtm_tpu.ops import mc_tpu as MT


@pytest.mark.parametrize("uni", [True, False])
@pytest.mark.parametrize("bd", [8, 10])
def test_batched_luma_subblock_mc_exact(uni, bd):
    rng = np.random.default_rng(7)
    plane = rng.integers(0, (1 << bd) - 1, size=(96, 128)).astype(np.int32)
    n = 64
    x0 = rng.integers(-6, 120, size=n)
    y0 = rng.integers(-6, 90, size=n)
    fx = rng.integers(0, 16, size=n)
    fy = rng.integers(0, 16, size=n)
    fset = rng.integers(0, 3, size=n)
    mode = (fx != 0).astype(int) | ((fy != 0).astype(int) << 1)
    kern = MT.make_mc_kernel(bd=bd, luma=True, uni=uni)
    win = MT.gather_windows(plane, x0 - 3, y0 - 3, MT.SUB + 7)
    # per-pass dispatch: alt-hpel only at frac 8, else the set's filter
    sel_h = np.where((fset == 2) & (fx == 8), 32 + fx,
                     np.where(fset == 1, 16 + fx, fx))
    sel_v = np.where((fset == 2) & (fy == 8), 32 + fy,
                     np.where(fset == 1, 16 + fy, fy))
    out = np.asarray(kern(win, sel_h, sel_v, mode))
    for i in range(n):
        use_alt = fset[i] == 2
        # scalar path: trick mc_block into the wanted filter set by size
        if fset[i] == 1:
            ref = MC.mc_block(plane, int(x0[i]), int(y0[i]), 4, 4,
                              int(fx[i]), int(fy[i]), True, bd,
                              rnd_res=uni, use_alt_hpel=False)
        else:
            # embed the 4x4 as the corner of an 8x8 call with regular filter
            ref8 = MC.mc_block(plane, int(x0[i]), int(y0[i]), 8, 8,
                               int(fx[i]), int(fy[i]), True, bd,
                               rnd_res=uni, use_alt_hpel=bool(use_alt))
            ref = ref8[:4, :4]
        assert np.array_equal(out[i], ref), f"job {i} mismatch"


def test_frame_luma_jobs_match_scalar_mc():
    """Batch the uni-L0 luma MC of a real decoded P stream through the TPU
    kernel and compare with the scalar per-CU path."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata", "ld_min_small208_qp32.bit",
    )
    if not os.path.exists(path):
        pytest.skip("golden streams not generated")
    from vtm_tpu.decoder.declib import Decoder
    from vtm_tpu.decoder import inter_cu as IC

    dec = Decoder()
    pics = dec.decode_stream(open(path, "rb").read())
    pics.sort(key=lambda p: p.poc)
    pic = pics[1]  # first P picture
    dcs = pic.dcs
    dcs.sh = pic.slices[0]
    bd = dcs.sps.bit_depth
    cus = [c for c in dcs.cus if c.pred_mode == 0 and c.interdir == 1
           and not c.affine and getattr(c, "_sbtmvp", None) is None]
    assert cus, "no uni inter CUs in stream"
    from vtm_tpu.ops import mc_tpu as MT

    x0, y0, sel_h, sel_v, mode, dx, dy = MT.build_luma_jobs(dcs, cus)
    ref_plane = dcs.sh.ref_pics[0][0].planes[0]
    win = MT.gather_windows(ref_plane, x0, y0, MT.SUB + 7)
    kern = MT.make_mc_kernel(bd=bd, luma=True, uni=True)
    out = np.asarray(kern(win, sel_h, sel_v, mode))
    # scatter into a plane and compare against scalar MC per CU
    got = np.zeros_like(ref_plane)
    for i in range(len(dx)):
        got[dy[i] : dy[i] + 4, dx[i] : dx[i] + 4] = out[i]
    for cu in cus:
        b = cu.blocks[0]
        pred = IC._mc_one_list(
            type("R", (), {"bit_depth": bd})(), dcs, cu, 0, rnd_res=True
        )[0]
        assert np.array_equal(got[b.y : b.y1, b.x : b.x1], pred), (
            f"CU ({b.x},{b.y},{b.w}x{b.h}) kernel/scalar mismatch"
        )
