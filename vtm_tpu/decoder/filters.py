"""In-loop filter chain for the decoder (DecLib::executeLoopFilters:596).

Order: LMCS inverse mapping → deblocking → SAO → ALF/CC-ALF.  Each stage is
implemented in vtm_tpu.ops and enabled as the corresponding decode features
land; with all tools disabled this is a no-op.
"""

from __future__ import annotations


def apply_loop_filters(dec, pic) -> None:
    # Filters operate in-place on pic.planes.  Stages are gated on the
    # slice/PH flags captured during slice decode; reconstruction-time data
    # (TU/CU maps) they need is stored on the picture by dec_slice.
    ctx = getattr(pic, "filter_ctx", None)
    if ctx is None:
        return
    ctx.run_all(pic)
