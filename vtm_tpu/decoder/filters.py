"""In-loop filter chain for the decoder (DecLib::executeLoopFilters:596).

Order: LMCS inverse luma mapping → deblocking → SAO → ALF / CC-ALF.
Sample math lives in vtm_tpu.ops; this module sequences the stages using
the per-picture state captured during slice decode.
"""

from __future__ import annotations

import numpy as np


def apply_loop_filters(dec, pic) -> None:
    if not hasattr(pic, "dcs"):
        return
    dcs = pic.dcs
    # 1. LMCS inverse mapping on luma
    lmcs = getattr(pic, "lmcs_model", None)
    if lmcs is not None and any(sl.lmcs_enabled for sl in pic.slices):
        pic.planes[0] = lmcs.inv_lut[pic.planes[0]]
        dcs.planes = pic.planes
        pic.recon.planes = pic.planes
    # 2. deblocking
    from vtm_tpu.ops import deblock as DB

    if any(not sl.deblocking_disable for sl in pic.slices):
        DB.deblock_picture(dcs, pic)
    # 3. SAO
    if dcs.sps.sao and any(sl.sao_enabled[0] or sl.sao_enabled[1] for sl in pic.slices):
        from vtm_tpu.ops import sao as SAO

        SAO.sao_picture(dcs, pic)
    # 4. ALF / CC-ALF
    if dcs.sps.alf and any(sl.alf_enabled[0] or sl.alf_enabled[1] or sl.alf_enabled[2]
                           for sl in pic.slices):
        from vtm_tpu.ops import alf as ALF

        ALF.alf_picture(dcs, pic)
