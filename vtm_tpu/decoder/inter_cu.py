"""Inter CU reconstruction: MV finalization + motion compensation + residual.

Behavioral equivalent of DecCu::xDeriveCUMV (DecCu.cpp:826),
DecCu::xReconInter:639, xDecodeInterTexture:798 and
InterPrediction::motionCompensation:1437 / xPredInterUni:445 /
xPredInterBi:515 / xPredInterBlk:660 / xWeightedAverage:1354.
"""

from __future__ import annotations

import numpy as np

from vtm_tpu.decoder import cs as D
from vtm_tpu.decoder import motion as M
from vtm_tpu.ops import mc as MC

MV_FRAC = 4  # luma fractional bits of the internal MV


def derive_cu_mv(dcs, cu) -> None:
    """DecCu::xDeriveCUMV."""
    if cu.merge_flag:
        if cu.mmvd_flag or cu.mmvd_skip:
            raise NotImplementedError("MMVD merge")
        if cu.geo_flag:
            raise NotImplementedError("GEO merge")
        if cu.affine:
            raise NotImplementedError("affine merge")
        mrg = M.get_inter_merge_candidates(dcs, cu, cu.merge_idx)
        M.set_merge_info(dcs, cu, mrg, cu.merge_idx)
        M.span_motion_info(dcs, cu)
        return
    if cu.affine:
        raise NotImplementedError("affine AMVP")
    for lst in range(2):
        if (dcs.sh.num_ref_idx[lst] > 0) and (cu.interdir & (1 << lst)):
            cands = M.fill_mvp_cand(dcs, cu, lst, cu.ref_idx[lst])
            mvd = M.change_trans_prec_amvr_2_internal(cu.mvd[lst], cu.imv)
            mv = (cands[cu.mvp_idx[lst]][0] + mvd[0],
                  cands[cu.mvp_idx[lst]][1] + mvd[1])
            cu.mv[lst] = M.mv_clip_periodic(mv)
    M.span_motion_info(dcs, cu)


def _mc_one_list(recon, dcs, cu, lst: int, rnd_res: bool):
    """xPredInterUni → per-component prediction arrays [Y, Cb, Cr]."""
    sh = dcs.sh
    ref_pic = sh.ref_pics[lst][cu.ref_idx[lst]]
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    b = cu.blocks[0]
    mv = M.clip_mv_in_pic(cu.mv[lst], b.x, b.y, dcs)
    use_alt_hpel = cu.imv == M.IMV_HPEL
    preds = []
    for comp in range(fmt.num_components):
        cb = cu.blocks[comp]
        sx = fmt.scale_x if comp else 0
        sy = fmt.scale_y if comp else 0
        shift_h = MV_FRAC + sx
        shift_v = MV_FRAC + sy
        frac_x = mv[0] & ((1 << shift_h) - 1)
        frac_y = mv[1] & ((1 << shift_v) - 1)
        x0 = cb.x + (mv[0] >> shift_h)
        y0 = cb.y + (mv[1] >> shift_v)
        preds.append(
            MC.mc_block(
                ref_pic.planes[comp], x0, y0, cb.w, cb.h, frac_x, frac_y,
                comp == 0, bd, rnd_res, use_alt_hpel, sx, sy,
            )
        )
    return preds


def motion_compensation(recon, dcs, cu):
    """InterPrediction::motionCompensation → [Y, Cb, Cr] final samples."""
    if cu.ciip_flag:
        raise NotImplementedError("CIIP")
    bd = recon.bit_depth
    fmt = dcs.chroma_format
    if cu.interdir == 3:
        if dcs.sps.dmvr and not dcs.ph.dis_dmvr:
            if _dmvr_condition(dcs, cu):
                raise NotImplementedError("DMVR")
        if dcs.sps.bdof and not dcs.ph.dis_bdof:
            if _bdof_condition(dcs, cu):
                raise NotImplementedError("BDOF")
        p0 = _mc_one_list(recon, dcs, cu, 0, rnd_res=False)
        p1 = _mc_one_list(recon, dcs, cu, 1, rnd_res=False)
        out = []
        for comp in range(fmt.num_components):
            if cu.bcw_idx != M.BCW_DEFAULT:
                w1 = _BCW_WEIGHTS[cu.bcw_idx]
                out.append(MC.bcw_average(p0[comp], p1[comp], bd, 8 - w1, w1))
            else:
                out.append(MC.bi_average(p0[comp], p1[comp], bd))
        return out
    lst = 0 if cu.interdir == 1 else 1
    return _mc_one_list(recon, dcs, cu, lst, rnd_res=True)


_BCW_WEIGHTS = [-2, 3, 4, 5, 10]  # g_BcwWeights (CommonDef)


def _dmvr_condition(dcs, cu) -> bool:
    """PU::checkDMVRCondition (UnitTools.cpp:1330)."""
    sh = dcs.sh
    b = cu.blocks[0]
    if not (cu.merge_flag and cu.regular_merge_flag):
        return False
    if cu.mmvd_flag or cu.mmvd_skip or cu.ciip_flag or cu.affine:
        return False
    if cu.interdir != 3 or cu.bcw_idx != M.BCW_DEFAULT:
        return False
    poc = sh.poc
    poc0 = sh.ref_pocs[0][cu.ref_idx[0]]
    poc1 = sh.ref_pocs[1][cu.ref_idx[1]]
    if (poc - poc0) != (poc1 - poc):
        return False
    if sh.ref_longterm[0][cu.ref_idx[0]] or sh.ref_longterm[1][cu.ref_idx[1]]:
        return False
    if sh.wp_present(cu.ref_idx):
        return False
    return b.h >= 8 and b.w >= 8 and (b.w * b.h) >= 128


def _bdof_condition(dcs, cu) -> bool:
    """BDOF applicability inside xPredInterBi (InterPrediction.cpp:526)."""
    sh = dcs.sh
    b = cu.blocks[0]
    if cu.affine or cu.smvd_mode or cu.ciip_flag:
        return False
    if cu.bcw_idx != M.BCW_DEFAULT and dcs.sps.bcw:
        return False
    if sh.wp_present(cu.ref_idx):
        return False
    # isBiPredFromDifferentDirEqDistPoc
    poc = sh.poc
    poc0 = sh.ref_pocs[0][cu.ref_idx[0]]
    poc1 = sh.ref_pocs[1][cu.ref_idx[1]]
    if sh.ref_longterm[0][cu.ref_idx[0]] or sh.ref_longterm[1][cu.ref_idx[1]]:
        return False
    if (poc - poc0) != (poc1 - poc):
        return False
    return b.h >= 8 and b.w >= 8 and (b.h * b.w) >= 128


def recon_inter_cu(recon, cu) -> None:
    """DecCu::xReconInter + xDecodeInterTexture."""
    dcs = recon.cs
    if cu.geo_flag:
        raise NotImplementedError("GEO recon")
    preds = motion_compensation(recon, dcs, cu)
    bd = recon.bit_depth
    maxv = (1 << bd) - 1
    lmcs = getattr(dcs, "lmcs_model", None)
    lmcs_on = lmcs is not None and dcs.sh.lmcs_enabled
    fmt = dcs.chroma_format
    if not cu.root_cbf:
        for comp in range(fmt.num_components):
            b = cu.blocks[comp]
            p = preds[comp]
            if comp == 0 and lmcs_on and not cu.ciip_flag:
                p = lmcs.fwd_lut[np.clip(p, 0, maxv)]
            recon.planes[comp][b.y : b.y1, b.x : b.x1] = np.clip(p, 0, maxv).astype(
                np.int32
            )
            recon.set_decomp(comp, b)
            if comp == 0:
                dcs.qp_map_l[b.y >> 2 : b.y1 >> 2, b.x >> 2 : b.x1 >> 2] = cu.qp
        return
    if cu.color_transform:
        raise NotImplementedError("ACT inter")
    # forward-map the luma prediction into the LMCS domain before adding resi
    for comp in range(fmt.num_components):
        for tu in cu.tus:
            b = tu.blocks[comp]
            if b is None:
                continue
            resi = recon.inv_transform(tu, comp)
            resi = recon._maybe_scale_chroma_resi(tu, comp, resi)
            cb = cu.blocks[comp]
            p = preds[comp][b.y - cb.y : b.y1 - cb.y, b.x - cb.x : b.x1 - cb.x]
            if comp == 0 and lmcs_on and not cu.ciip_flag:
                p = lmcs.fwd_lut[np.clip(p, 0, maxv)]
            rec = np.clip(p + resi, 0, maxv).astype(np.int32)
            recon.planes[comp][b.y : b.y1, b.x : b.x1] = rec
            recon.set_decomp(comp, b)
            if comp == 0:
                dcs.qp_map_l[b.y >> 2 : b.y1 >> 2, b.x >> 2 : b.x1 >> 2] = cu.qp
