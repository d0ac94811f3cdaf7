"""DMVR bilateral MV refinement + BDOF optical-flow refinement.

Behavioral equivalent of InterPrediction.cpp xProcessDMVR:1997,
xPrefetch:1664, xPad:1710, xinitMC:1949, xBIPMVRefine:1820,
xDMVRCost:1919, xSubPelErrorSrfc:1766, xFinalPaddedMCForDMVR:1845,
applyBiOptFlow:1233 and the Buffer.cpp BDOF cores (gradFilterCore:130,
calcBIOSumsCore:173, addBIOAvgCore:88).
"""

from __future__ import annotations

import numpy as np

from vtm_tpu.decoder import motion as M
from vtm_tpu.ops import mc as MC

DMVR_ITER = 2  # DMVR_NUM_ITERATION
DMVR_SUBCU = 16
BIO_EXT = 1
_SEARCH_OFFSETS = [(dx, dy) for dy in range(-2, 3) for dx in range(-2, 3)]


# ---------------------------------------------------------------------------
# helpers

def _gather(plane, x0, y0, w, h):
    ph, pw = plane.shape
    if 0 <= x0 and 0 <= y0 and x0 + w <= pw and y0 + h <= ph:
        return plane[y0 : y0 + h, x0 : x0 + w].astype(np.int64)
    ys = np.clip(np.arange(y0, y0 + h), 0, ph - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, pw - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def _pad2(a, pad):
    return np.pad(a, pad, mode="edge")


def _floor_log2(v: int) -> int:
    return v.bit_length() - 1


def _div_for_maxq7(n: int, d: int) -> int:
    sign = 0
    if n < 0:
        sign = 1
        n = -n
    q = 0
    d = d << 3
    if n >= d:
        n -= d
        q += 1
    q <<= 1
    d >>= 1
    if n >= d:
        n -= d
        q += 1
    q <<= 1
    if n >= (d >> 1):
        q += 1
    return -q if sign else q


def _subpel_error_srfc(sad):
    """xSubPelErrorSrfc; sad = [center, left, top, right, bottom]."""
    delta = [0, 0]
    num = (sad[1] - sad[3]) << 4
    den = sad[1] + sad[3] - (sad[0] << 1)
    if den != 0:
        if sad[1] != sad[0] and sad[3] != sad[0]:
            delta[0] = _div_for_maxq7(num, den)
        else:
            delta[0] = -8 if sad[1] == sad[0] else 8
    num = (sad[2] - sad[4]) << 4
    den = sad[2] + sad[4] - (sad[0] << 1)
    if den != 0:
        if sad[2] != sad[0] and sad[4] != sad[0]:
            delta[1] = _div_for_maxq7(num, den)
        else:
            delta[1] = -8 if sad[2] == sad[0] else 8
    return delta


def _bilinear_grid(pre, frac_x, frac_y, w, h, bd):
    """DMVR search-grid generation: 2-tap bilinear at 10-bit precision
    (xinitMC → xPredInterBlk with bilinearMC; InterpolationFilter biMCForDMVR
    paths).  `pre` is the padded prefetch buffer; output (h, w) from its
    (1, 1) origin."""
    coeffs = MC._BILINEAR  # (16, 2), 4-bit precision
    src = pre[1 : 1 + h + 1, 1 : 1 + w + 1]  # support for 2-tap both dirs
    prec_bilinear = 10
    if frac_x == 0 and frac_y == 0:
        return (src[:h, :w] << (prec_bilinear - bd)).astype(np.int64)
    if frac_y == 0:
        c = coeffs[frac_x]
        shift = 4 - (prec_bilinear - bd)
        off = 1 << (shift - 1)
        return (int(c[0]) * src[:h, :w] + int(c[1]) * src[:h, 1 : w + 1] + off) >> shift
    if frac_x == 0:
        c = coeffs[frac_y]
        shift = 4 - (prec_bilinear - bd)
        off = 1 << (shift - 1)
        return (int(c[0]) * src[:h, :w] + int(c[1]) * src[1 : h + 1, :w] + off) >> shift
    ch = coeffs[frac_x]
    shift1 = 4 - (prec_bilinear - bd)
    off1 = 1 << (shift1 - 1)
    tmp = (int(ch[0]) * src[:, :w] + int(ch[1]) * src[:, 1 : w + 1] + off1) >> shift1
    cv = coeffs[frac_y]
    return (int(cv[0]) * tmp[:h, :] + int(cv[1]) * tmp[1 : h + 1, :] + 8) >> 4


def _sad_even_rows(a, b):
    return int(np.abs(a[::2] - b[::2]).sum())


# ---------------------------------------------------------------------------
def _mc_ext_bio(plane, x0, y0, w, h, frac_x, frac_y, bd, use_alt_hpel):
    """Luma MC for BDOF: returns (h+2, w+2) — centre w×h is the 14-bit MC
    result, the 1-sample ring is nearest-integer reference samples shifted
    to the intermediate domain (xPredInterBlk bioApplied tail)."""
    center = MC.mc_block(plane, x0, y0, w, h, frac_x, frac_y, True, bd,
                         rnd_res=False, use_alt_hpel=use_alt_hpel)
    shift = max(2, MC.IF_INTERNAL_PREC - bd)
    x_off = 1 if frac_x < 8 else 0
    y_off = 1 if frac_y < 8 else 0
    ring_src = _gather(plane, x0 - x_off, y0 - y_off, w + 2, h + 2)
    ring = (ring_src << shift) - MC.IF_INTERNAL_OFFS
    out = np.empty((h + 2, w + 2), dtype=np.int64)
    out[:] = ring
    out[1 : h + 1, 1 : w + 1] = center
    return out


def bdof_blend(p0e, p1e, w, h, bd):
    """applyBiOptFlow core on extended predictions (h+2, w+2)."""
    shift1 = 6
    # gradients over the extended grid (inner w×h from the int-ring source)
    g = []
    for pe in (p0e, p1e):
        gx = np.zeros((h + 2, w + 2), dtype=np.int64)
        gy = np.zeros((h + 2, w + 2), dtype=np.int64)
        gx[1 : h + 1, 1 : w + 1] = (pe[1 : h + 1, 2 : w + 2] >> shift1) - (
            pe[1 : h + 1, 0:w] >> shift1
        )
        gy[1 : h + 1, 1 : w + 1] = (pe[2 : h + 2, 1 : w + 1] >> shift1) - (
            pe[0:h, 1 : w + 1] >> shift1
        )
        # pad ring by replication (gradFilterCore PAD)
        gx[1 : h + 1, 0] = gx[1 : h + 1, 1]
        gx[1 : h + 1, w + 1] = gx[1 : h + 1, w]
        gy[1 : h + 1, 0] = gy[1 : h + 1, 1]
        gy[1 : h + 1, w + 1] = gy[1 : h + 1, w]
        gx[0] = gx[1]
        gx[h + 1] = gx[h]
        gy[0] = gy[1]
        gy[h + 1] = gy[h]
        g.append((gx, gy))
    (gx0, gy0), (gx1, gy1) = g
    # re-pad the prediction ring from the MC block edges (applyBiOptFlow)
    for pe in (p0e, p1e):
        pe[1 : h + 1, 0] = pe[1 : h + 1, 1]
        pe[1 : h + 1, w + 1] = pe[1 : h + 1, w]
        pe[0, :] = pe[1, :]
        pe[h + 1, :] = pe[h, :]

    shift_num = MC.IF_INTERNAL_PREC + 1 - bd
    offset = (1 << (shift_num - 1)) + 2 * MC.IF_INTERNAL_OFFS
    limit = 15
    maxv = (1 << bd) - 1
    # vectorized over all 4x4 subblocks: 6x6 window sums at stride 4
    from numpy.lib.stride_tricks import sliding_window_view as swv

    tmp_gx = (gx0 + gx1) >> 1
    tmp_gy = (gy0 + gy1) >> 1
    tmp_di = (p1e >> 4) - (p0e >> 4)
    sgx = np.sign(tmp_gx)
    sgy = np.sign(tmp_gy)

    def wsum(a):
        return swv(a, (6, 6))[::4, ::4].sum(axis=(2, 3))

    sum_abs_gx = wsum(np.abs(tmp_gx))
    sum_abs_gy = wsum(np.abs(tmp_gy))
    sum_dix = wsum(sgx * tmp_di)
    sum_diy = wsum(sgy * tmp_di)
    sum_sign = wsum(sgy * tmp_gx)
    # floor_log2 via frexp (values are exact in float64 range)
    lg_gx = np.frexp(np.maximum(sum_abs_gx, 1).astype(np.float64))[1] - 1
    lg_gy = np.frexp(np.maximum(sum_abs_gy, 1).astype(np.float64))[1] - 1
    tmpx = np.where(sum_abs_gx == 0, 0, (sum_dix << 2) >> lg_gx)
    tmpx = np.clip(tmpx, -limit, limit)
    mains = sum_sign >> 12
    secs = sum_sign & 4095
    tmp_data = (((tmpx * mains) << 12) + tmpx * secs) >> 1
    tmpy = np.where(sum_abs_gy == 0, 0, ((sum_diy << 2) - tmp_data) >> lg_gy)
    tmpy = np.clip(tmpy, -limit, limit)
    # blend inner 4x4s (extended coords +1): broadcast per-subblock tmpx/y
    tx = np.repeat(np.repeat(tmpx, 4, axis=0), 4, axis=1)
    ty = np.repeat(np.repeat(tmpy, 4, axis=0), 4, axis=1)
    inner = slice(1, h + 1), slice(1, w + 1)
    b = tx * (gx0[inner] - gx1[inner]) + ty * (gy0[inner] - gy1[inner])
    val = (p0e[inner] + p1e[inner] + b + offset) >> shift_num
    return np.clip(val, 0, maxv)


MAX_BDOF_REGION = 16


def bdof_motion_compensation(recon, dcs, cu):
    """Standalone BDOF bi-prediction; PUs larger than 16x16 are processed
    per 16x16 subblock (InterPrediction::xSubPuBio:352), each with its own
    MV clipping and integer-sample ring."""
    sh = dcs.sh
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    b = cu.blocks[0]
    use_alt_hpel = cu.imv == M.IMV_HPEL
    dx = min(MAX_BDOF_REGION, b.w)
    dy = min(MAX_BDOF_REGION, b.h)
    preds = [np.zeros((b.h >> (fmt.scale_y if c else 0),
                       b.w >> (fmt.scale_x if c else 0)), dtype=np.int64)
             for c in range(fmt.num_components)]
    for y in range(b.y, b.y + b.h, dy):
        for x in range(b.x, b.x + b.w, dx):
            exts = []
            chroma = [[], []]
            for lst in range(2):
                ref_pic = sh.ref_pics[lst][cu.ref_idx[lst]]
                mv = M.clip_mv_in_pic(cu.mv[lst], x, y, dcs)
                exts.append(
                    _mc_ext_bio(ref_pic.planes[0], x + (mv[0] >> 4),
                                y + (mv[1] >> 4), dx, dy, mv[0] & 15,
                                mv[1] & 15, bd, use_alt_hpel)
                )
                for comp in range(1, fmt.num_components):
                    scx, scy = fmt.scale_x, fmt.scale_y
                    fx = mv[0] & ((1 << (4 + scx)) - 1)
                    fy = mv[1] & ((1 << (4 + scy)) - 1)
                    chroma[lst].append(
                        MC.mc_block(
                            ref_pic.planes[comp],
                            (x >> scx) + (mv[0] >> (4 + scx)),
                            (y >> scy) + (mv[1] >> (4 + scy)),
                            dx >> scx, dy >> scy, fx, fy, False, bd,
                            rnd_res=False, scale_x=scx, scale_y=scy,
                        )
                    )
            ly, lx = y - b.y, x - b.x
            preds[0][ly : ly + dy, lx : lx + dx] = bdof_blend(
                exts[0], exts[1], dx, dy, bd
            )
            for ci in range(fmt.num_components - 1):
                scx, scy = fmt.scale_x, fmt.scale_y
                preds[1 + ci][ly >> scy : (ly + dy) >> scy,
                              lx >> scx : (lx + dx) >> scx] = MC.bi_average(
                    chroma[0][ci], chroma[1][ci], bd
                )
    return preds


# ---------------------------------------------------------------------------
# batched (device) paths — slice-level orchestration over the kernels in
# ops/refine_kernel.py and ops/mc_kernel.py; bit-exact twins of the scalar
# entry points below.

def _bucket(n: int) -> int:
    b = 64
    while b < n:
        b <<= 1
    return b


def _pad_stack(arrs, nb):
    out = np.zeros((nb,) + arrs[0].shape, dtype=arrs[0].dtype)
    out[: len(arrs)] = np.stack(arrs)
    return out


def _pad_vec(vals, nb, dtype=np.int32):
    out = np.zeros(nb, dtype=dtype)
    out[: len(vals)] = vals
    return out


def dmvr_batch(recon, dcs, jobs):
    """Batched xProcessDMVR over all DMVR CUs of a slice.

    jobs: list of (cu, bio_applied).  Returns {id(cu): preds}; also sets
    cu._dmvr_mvd for the motion-field writeback."""
    import jax.numpy as jnp

    from vtm_tpu.ops import refine_kernel as RK
    from vtm_tpu.ops.mc_kernel import McBatch

    sh = dcs.sh
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    ncomp = fmt.num_components
    out_preds = {}
    groups = {}
    for cu, bio in jobs:
        b = cu.blocks[0]
        dx = min(b.w, DMVR_SUBCU)
        dy = min(b.h, DMVR_SUBCU)
        preds = [np.zeros((b.h >> (fmt.scale_y if c else 0),
                           b.w >> (fmt.scale_x if c else 0)), dtype=np.int64)
                 for c in range(ncomp)]
        out_preds[id(cu)] = preds
        mvd_sub = {}
        cu._dmvr_mvd = (mvd_sub, dx, dy)
        ref_planes = [sh.ref_pics[0][cu.ref_idx[0]].planes,
                      sh.ref_pics[1][cu.ref_idx[1]].planes]
        for sy, y in enumerate(range(b.y, b.y + b.h, dy)):
            for sx, x in enumerate(range(b.x, b.x + b.w, dx)):
                rec = {
                    "cu": cu, "bio": bio, "x": x, "y": y, "sy": sy, "sx": sx,
                    "preds": preds, "mvd_sub": mvd_sub,
                    "ref_planes": ref_planes, "merge": [cu.mv[0], cu.mv[1]],
                }
                pres, fracs = [], []
                for lst in range(2):
                    mm = rec["merge"][lst]
                    cmv = M.clip_mv_in_pic((mm[0] - (3 << 4), mm[1] - (3 << 4)),
                                           x, y, dcs)
                    fx = x + (cmv[0] >> 4)
                    fy = y + (cmv[1] >> 4)
                    pres.append(_gather(ref_planes[lst][0], fx, fy,
                                        dx + 7, dy + 7).astype(np.int32))
                    mv_cl = M.clip_mv_in_pic(mm, x, y, dcs)
                    fracs.append((mv_cl[0] & 15, mv_cl[1] & 15))
                rec["pre"] = pres
                rec["fr"] = fracs
                groups.setdefault((dx, dy), []).append(rec)

    from vtm_tpu.ops import mc as MCops

    for (dx, dy), recs in groups.items():
        n = len(recs)
        nb = _bucket(n)
        tx, ty, mcost = RK.dmvr_search(
            jnp.asarray(_pad_stack([r["pre"][0] for r in recs], nb)),
            jnp.asarray(_pad_stack([r["pre"][1] for r in recs], nb)),
            jnp.asarray(_pad_vec([r["fr"][0][0] for r in recs], nb)),
            jnp.asarray(_pad_vec([r["fr"][0][1] for r in recs], nb)),
            jnp.asarray(_pad_vec([r["fr"][1][0] for r in recs], nb)),
            jnp.asarray(_pad_vec([r["fr"][1][1] for r in recs], nb)),
            bd=bd, dx=dx, dy=dy)
        tx = np.asarray(tx)[:n]
        ty = np.asarray(ty)[:n]
        mcost = np.asarray(mcost)[:n]
        bio_thres = 2 * dx * dy

        # ---- phase B: final padded MC ----
        batch_buf = McBatch(bd)     # planes = per-job padded prefetch buffers
        batch_pln = McBatch(bd)     # planes = reference planes (unmoved chroma)
        for i, rec in enumerate(recs):
            mvd = (int(tx[i]), int(ty[i]))
            rec["mvd"] = mvd
            rec["mvd_sub"][(rec["sy"], rec["sx"])] = mvd
            rec["bio_sub"] = False if int(mcost[i]) < bio_thres else rec["bio"]
            moved = mvd != (0, 0)
            merge = rec["merge"]
            x, y = rec["x"], rec["y"]
            sub_mv = [
                (merge[0][0] + mvd[0], merge[0][1] + mvd[1]),
                (merge[1][0] - mvd[0], merge[1][1] - mvd[1]),
            ]
            rec["h"] = [[None] * ncomp, [None] * ncomp]
            rec["ext_info"] = [None, None]
            rec["pad_luma"] = [None, None]
            for lst in range(2):
                cmv = sub_mv[lst]
                cmv_cl = M.clip_mv_in_pic(cmv, x, y, dcs)
                for comp in range(ncomp):
                    scx = fmt.scale_x if comp else 0
                    scy = fmt.scale_y if comp else 0
                    w_c, h_c = dx >> scx, dy >> scy
                    frac_x = cmv_cl[0] & ((1 << (4 + scx)) - 1)
                    frac_y = cmv_cl[1] & ((1 << (4 + scy)) - 1)
                    if moved or comp == 0:
                        # NOTE: the reference pads the prefetch buffer by
                        # DMVR_ITER and reads with clamping; reads of the
                        # edge-padded buffer equal clamped reads of the
                        # unpadded buffer (clip(r-pad, 0, size-1)), so the
                        # pad is folded into the kernel's index clamp.
                        if comp == 0:
                            padded = rec["pre"][lst]
                            rec["pad_luma"][lst] = padded
                            half = 3
                        else:
                            ccmv = M.clip_mv_in_pic(
                                (merge[lst][0] - (1 << (4 + scx)),
                                 merge[lst][1] - (1 << (4 + scy))), x, y, dcs)
                            cfx = (x >> scx) + (ccmv[0] >> (4 + scx))
                            cfy = (y >> scy) + (ccmv[1] >> (4 + scy))
                            padded = _gather(rec["ref_planes"][lst][comp], cfx,
                                             cfy, w_c + 3, h_c + 3).astype(np.int32)
                            half = 1
                        d_int_x = (cmv[0] >> (4 + scx)) - (merge[lst][0] >> (4 + scx))
                        d_int_y = (cmv[1] >> (4 + scy)) - (merge[lst][1] >> (4 + scy))
                        lx0 = half + d_int_x
                        ly0 = half + d_int_y
                        if comp == 0:
                            cf_h = MCops.luma_coeffs(frac_x, w_c, h_c if frac_y == 0
                                                     else h_c + 7, False, True)
                            cf_v = MCops.luma_coeffs(frac_y, w_c, h_c, False, False)
                            x_off = 1 if frac_x < 8 else 0
                            y_off = 1 if frac_y < 8 else 0
                            rec["ext_info"][lst] = (lx0 - x_off, ly0 - y_off)
                        else:
                            cf_h = MCops._CHROMA[frac_x << (1 - scx)]
                            cf_v = MCops._CHROMA[frac_y << (1 - scy)]
                        rec["h"][lst][comp] = batch_buf.add_block(
                            padded, lx0, ly0, w_c, h_c, cf_h, cf_v,
                            frac_y != 0, False, comp == 0)
                    else:
                        cb_x = (x >> scx) + (cmv_cl[0] >> (4 + scx))
                        cb_y = (y >> scy) + (cmv_cl[1] >> (4 + scy))
                        cf_h = MCops._CHROMA[frac_x << (1 - scx)]
                        cf_v = MCops._CHROMA[frac_y << (1 - scy)]
                        rec["h"][lst][comp] = (batch_pln.add_block(
                            rec["ref_planes"][lst][comp], cb_x, cb_y, w_c, h_c,
                            cf_h, cf_v, frac_y != 0, False, False), True)
        from vtm_tpu.ops.mc_kernel import execute_many

        execute_many([batch_buf, batch_pln])

        # ---- assemble: BDOF blend (batched) or bi-average ----
        bio_recs = [r for r in recs if r["bio_sub"]]
        bio_out = None
        if bio_recs:
            exts = []
            for r in bio_recs:
                pair = []
                for lst in range(2):
                    center = batch_buf.block_result(r["h"][lst][0])
                    ox, oy = r["ext_info"][lst]
                    shift = max(2, MC.IF_INTERNAL_PREC - bd)
                    ring_src = _gather(r["pad_luma"][lst], ox, oy, dx + 2, dy + 2)
                    ext = ((ring_src << shift) - MC.IF_INTERNAL_OFFS).astype(np.int32)
                    ext[1 : dy + 1, 1 : dx + 1] = center
                    pair.append(ext)
                exts.append(pair)
            nbb = _bucket(len(bio_recs))
            import jax.numpy as jnp2

            res = RK.bdof_blend_batch(
                jnp2.asarray(_pad_stack([p[0] for p in exts], nbb)),
                jnp2.asarray(_pad_stack([p[1] for p in exts], nbb)),
                bd=bd, w=dx, h=dy)
            bio_out = np.asarray(res)[: len(bio_recs)]
        bio_i = 0
        for r in recs:
            b = r["cu"].blocks[0]
            ys0 = r["y"] - b.y
            xs0 = r["x"] - b.x
            if r["bio_sub"]:
                blended = bio_out[bio_i].astype(np.int64)
                bio_i += 1
            else:
                l0 = batch_buf.block_result(r["h"][0][0])
                l1 = batch_buf.block_result(r["h"][1][0])
                blended = MC.bi_average(l0, l1, bd)
            r["preds"][0][ys0 : ys0 + dy, xs0 : xs0 + dx] = blended
            for comp in range(1, ncomp):
                scx, scy = fmt.scale_x, fmt.scale_y
                ps = []
                for lst in range(2):
                    h = r["h"][lst][comp]
                    if isinstance(h, tuple) and len(h) == 2 and h[1] is True:
                        ps.append(batch_pln.block_result(h[0]))
                    else:
                        ps.append(batch_buf.block_result(h))
                r["preds"][comp][ys0 >> scy : (ys0 + dy) >> scy,
                                 xs0 >> scx : (xs0 + dx) >> scx] = MC.bi_average(
                    ps[0], ps[1], bd)
    return out_preds


def bdof_batch(recon, dcs, cus):
    """Batched standalone BDOF bi-prediction (xSubPuBio regions)."""
    import jax.numpy as jnp

    from vtm_tpu.ops import refine_kernel as RK
    from vtm_tpu.ops import mc as MCops
    from vtm_tpu.ops.mc_kernel import McBatch

    sh = dcs.sh
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    ncomp = fmt.num_components
    out_preds = {}
    groups = {}
    batch = McBatch(bd)
    for cu in cus:
        b = cu.blocks[0]
        use_alt_hpel = cu.imv == M.IMV_HPEL
        dx = min(MAX_BDOF_REGION, b.w)
        dy = min(MAX_BDOF_REGION, b.h)
        preds = [np.zeros((b.h >> (fmt.scale_y if c else 0),
                           b.w >> (fmt.scale_x if c else 0)), dtype=np.int64)
                 for c in range(ncomp)]
        out_preds[id(cu)] = preds
        for y in range(b.y, b.y + b.h, dy):
            for x in range(b.x, b.x + b.w, dx):
                rec = {"cu": cu, "x": x, "y": y, "preds": preds,
                       "h": [[None] * ncomp, [None] * ncomp],
                       "ring": [None, None]}
                for lst in range(2):
                    ref_pic = sh.ref_pics[lst][cu.ref_idx[lst]]
                    dev = getattr(ref_pic, "device_planes", None)
                    dplanes = dev if dev is not None else ref_pic.planes
                    mv = M.clip_mv_in_pic(cu.mv[lst], x, y, dcs)
                    fx, fy = mv[0] & 15, mv[1] & 15
                    x0 = x + (mv[0] >> 4)
                    y0 = y + (mv[1] >> 4)
                    cf_h = MCops.luma_coeffs(fx, dx, dy if fy == 0 else dy + 7,
                                             use_alt_hpel, True)
                    cf_v = MCops.luma_coeffs(fy, dx, dy, use_alt_hpel, False)
                    rec["h"][lst][0] = batch.add_block(
                        dplanes[0], x0, y0, dx, dy, cf_h, cf_v,
                        fy != 0, False, True)
                    x_off = 1 if fx < 8 else 0
                    y_off = 1 if fy < 8 else 0
                    shift = max(2, MC.IF_INTERNAL_PREC - bd)
                    ring_src = _gather(ref_pic.planes[0], x0 - x_off, y0 - y_off,
                                       dx + 2, dy + 2)
                    rec["ring"][lst] = ((ring_src << shift)
                                        - MC.IF_INTERNAL_OFFS).astype(np.int32)
                    for comp in range(1, ncomp):
                        scx, scy = fmt.scale_x, fmt.scale_y
                        cfx = mv[0] & ((1 << (4 + scx)) - 1)
                        cfy = mv[1] & ((1 << (4 + scy)) - 1)
                        rec["h"][lst][comp] = batch.add_block(
                            dplanes[comp],
                            (x >> scx) + (mv[0] >> (4 + scx)),
                            (y >> scy) + (mv[1] >> (4 + scy)),
                            dx >> scx, dy >> scy,
                            MCops._CHROMA[cfx << (1 - scx)],
                            MCops._CHROMA[cfy << (1 - scy)],
                            cfy != 0, False, False)
                groups.setdefault((dx, dy), []).append(rec)
    batch.execute()
    for (dx, dy), recs in groups.items():
        exts = []
        for r in recs:
            pair = []
            for lst in range(2):
                ext = r["ring"][lst]
                ext[1 : dy + 1, 1 : dx + 1] = batch.block_result(r["h"][lst][0])
                pair.append(ext)
            exts.append(pair)
        nbb = _bucket(len(recs))
        res = RK.bdof_blend_batch(
            jnp.asarray(_pad_stack([p[0] for p in exts], nbb)),
            jnp.asarray(_pad_stack([p[1] for p in exts], nbb)),
            bd=bd, w=dx, h=dy)
        res = np.asarray(res)
        for i, r in enumerate(recs):
            b = r["cu"].blocks[0]
            ly, lx = r["y"] - b.y, r["x"] - b.x
            r["preds"][0][ly : ly + dy, lx : lx + dx] = res[i].astype(np.int64)
            for comp in range(1, ncomp):
                scx, scy = fmt.scale_x, fmt.scale_y
                p0 = batch.block_result(r["h"][0][comp])
                p1 = batch.block_result(r["h"][1][comp])
                r["preds"][comp][ly >> scy : (ly + dy) >> scy,
                                 lx >> scx : (lx + dx) >> scx] = MC.bi_average(
                    p0, p1, bd)
    return out_preds


# ---------------------------------------------------------------------------
def dmvr_motion_compensation(recon, dcs, cu, bio_applied: bool):
    """xProcessDMVR: per-16x16-subPU bilateral refinement + final MC.

    Returns ([Y, Cb, Cr] predictions for the CU, refined per-4x4 motion for
    the motion field)."""
    sh = dcs.sh
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    b = cu.blocks[0]
    dx = min(b.w, DMVR_SUBCU)
    dy = min(b.h, DMVR_SUBCU)
    merge_mv = [cu.mv[0], cu.mv[1]]
    ref_planes = [sh.ref_pics[0][cu.ref_idx[0]].planes,
                  sh.ref_pics[1][cu.ref_idx[1]].planes]
    preds = [np.zeros((b.h >> (fmt.scale_y if c else 0),
                       b.w >> (fmt.scale_x if c else 0)), dtype=np.int64)
             for c in range(fmt.num_components)]
    mvd_sub = {}  # (sy, sx) -> refined mvd (internal precision)
    bio_thres = 2 * dx * dy

    for sy, y in enumerate(range(b.y, b.y + b.h, dy)):
        for sx, x in enumerate(range(b.x, b.x + b.w, dx)):
            # -- luma prefetch per list (xPrefetch forLuma) --
            pre = []
            fetch_base = []
            for lst in range(2):
                cmv = (merge_mv[lst][0] - (3 << 4), merge_mv[lst][1] - (3 << 4))
                cmv = M.clip_mv_in_pic(cmv, x, y, dcs)
                fx = x + (cmv[0] >> 4)
                fy = y + (cmv[1] >> 4)
                fetch_base.append((fx, fy))
                pre.append(_gather(ref_planes[lst][0], fx, fy, dx + 7, dy + 7))
            # -- bilinear grids (dx+4)x(dy+4) (xinitMC) --
            grids = []
            for lst in range(2):
                mv_cl = M.clip_mv_in_pic(merge_mv[lst], x, y, dcs)
                grids.append(
                    _bilinear_grid(pre[lst], mv_cl[0] & 15, mv_cl[1] & 15,
                                   dx + 4, dy + 4, bd)
                )
            # -- integer search (xBIPMVRefine) --
            sads = {}

            def cost_at(dmx, dmy):
                a = grids[0][2 + dmy : 2 + dmy + dy, 2 + dmx : 2 + dmx + dx]
                c = grids[1][2 - dmy : 2 - dmy + dy, 2 - dmx : 2 - dmx + dx]
                return _sad_even_rows(a, c)

            min_cost = cost_at(0, 0)
            min_cost -= min_cost >> 2
            not_zero = True
            delta = (0, 0)
            if min_cost < dx * dy:
                not_zero = False
            else:
                sads[(0, 0)] = min_cost
                for off in _SEARCH_OFFSETS:
                    if off not in sads:
                        sads[off] = cost_at(off[0], off[1])
                    if sads[off] < min_cost:
                        min_cost = sads[off]
                        delta = off
            total = [delta[0] << 4, delta[1] << 4]
            # -- sub-pel surface (xDMVRSubPixelErrorSurface) --
            if (not_zero and abs(total[0]) != (2 << 4) and abs(total[1]) != (2 << 4)):
                cx, cy = delta
                sbuf = [
                    sads[(cx, cy)],
                    sads.get((cx - 1, cy), 1 << 62),
                    sads.get((cx, cy - 1), 1 << 62),
                    sads.get((cx + 1, cy), 1 << 62),
                    sads.get((cx, cy + 1), 1 << 62),
                ]
                sp = _subpel_error_srfc(sbuf)
                total[0] += sp[0]
                total[1] += sp[1]
            mvd = (total[0], total[1])
            mvd_sub[(sy, sx)] = mvd
            bio_sub = False if min_cost < bio_thres else bio_applied
            block_moved = mvd != (0, 0)

            # -- final padded MC (xFinalPaddedMCForDMVR) --
            sub_mv = [
                (merge_mv[0][0] + mvd[0], merge_mv[0][1] + mvd[1]),
                (merge_mv[1][0] - mvd[0], merge_mv[1][1] - mvd[1]),
            ]
            sub_ext = [None, None]
            for lst in range(2):
                cmv = sub_mv[lst]
                cmv_cl = M.clip_mv_in_pic(cmv, x, y, dcs)
                for comp in range(fmt.num_components):
                    scx = fmt.scale_x if comp else 0
                    scy = fmt.scale_y if comp else 0
                    w_c, h_c = dx >> scx, dy >> scy
                    frac_x = cmv_cl[0] & ((1 << (4 + scx)) - 1)
                    frac_y = cmv_cl[1] & ((1 << (4 + scy)) - 1)
                    if block_moved or comp == 0:
                        if comp == 0:
                            buf = pre[lst]
                            pad = DMVR_ITER
                            fb = fetch_base[lst]
                        else:
                            # chroma prefetch (xPrefetch !forLuma)
                            half = 1  # (NTAPS_CHROMA>>1)-1
                            ccmv = M.clip_mv_in_pic(
                                (merge_mv[lst][0] - (half << (4 + scx)),
                                 merge_mv[lst][1] - (half << (4 + scy))),
                                x, y, dcs)
                            cfx = (x >> scx) + (ccmv[0] >> (4 + scx))
                            cfy = (y >> scy) + (ccmv[1] >> (4 + scy))
                            buf = _gather(ref_planes[lst][comp], cfx, cfy,
                                          w_c + 3, h_c + 3)
                            pad = DMVR_ITER >> scy
                            fb = (cfx, cfy)
                        padded = _pad2(buf, pad)
                        d_int_x = (cmv[0] >> (4 + scx)) - (merge_mv[lst][0] >> (4 + scx))
                        d_int_y = (cmv[1] >> (4 + scy)) - (merge_mv[lst][1] >> (4 + scy))
                        # local block-start inside padded buffer
                        half = 3 if comp == 0 else 1
                        lx0 = pad + half + d_int_x
                        ly0 = pad + half + d_int_y
                        res = MC.mc_block(
                            padded, lx0, ly0, w_c, h_c, frac_x, frac_y,
                            comp == 0, bd, rnd_res=False,
                            use_alt_hpel=False, scale_x=scx, scale_y=scy,
                        )
                        if comp == 0 and bio_sub:
                            # extended BIO version from the padded buffer
                            shift = max(2, MC.IF_INTERNAL_PREC - bd)
                            x_off = 1 if frac_x < 8 else 0
                            y_off = 1 if frac_y < 8 else 0
                            ring_src = _gather(padded, lx0 - x_off, ly0 - y_off,
                                               w_c + 2, h_c + 2)
                            ext = (ring_src << shift) - MC.IF_INTERNAL_OFFS
                            ext[1 : h_c + 1, 1 : w_c + 1] = res
                            sub_ext[lst] = ext
                    else:
                        # chroma without refetch: direct reference MC
                        cb_x = (x >> scx) + (cmv_cl[0] >> (4 + scx))
                        cb_y = (y >> scy) + (cmv_cl[1] >> (4 + scy))
                        res = MC.mc_block(
                            ref_planes[lst][comp], cb_x, cb_y, w_c, h_c,
                            frac_x, frac_y, False, bd, rnd_res=False,
                            scale_x=scx, scale_y=scy,
                        )
                    if lst == 0:
                        if comp == 0:
                            luma0 = res
                        elif comp == 1:
                            cb0 = res
                        else:
                            cr0 = res
                    else:
                        ys0 = (y - b.y) >> scy
                        xs0 = (x - b.x) >> scx
                        if comp == 0:
                            if bio_sub:
                                blended = bdof_blend(sub_ext[0], sub_ext[1], dx, dy, bd)
                            else:
                                blended = MC.bi_average(luma0, res, bd)
                            preds[0][ys0 : ys0 + h_c, xs0 : xs0 + w_c] = blended
                        else:
                            other = cb0 if comp == 1 else cr0
                            preds[comp][ys0 : ys0 + h_c, xs0 : xs0 + w_c] = (
                                MC.bi_average(other, res, bd)
                            )
    return preds, mvd_sub, dx, dy
