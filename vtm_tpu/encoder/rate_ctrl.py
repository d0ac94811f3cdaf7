"""λ-domain rate control (EncoderLib/RateCtrl.cpp equivalent).

R-λ model (JCTVC-K0103, the reference's EncRCSeq/EncRCPic hierarchy,
RateCtrl.h:99-246): per-picture target bits from the sequence budget with
a smoothing window, λ = α·bpp^β, QP = 4.2005·ln λ + 13.7122, and α/β
LMS updates from the actual bits after each picture
(EncRCPic::updateAfterPicture, RateCtrl.cpp).
"""

from __future__ import annotations

import math


ALPHA_INTRA, BETA_INTRA = 6.7542, 1.7860  # intra model (RateCtrl.cpp:58)
ALPHA_MIN, ALPHA_MAX = 0.05, 500.0
BETA_MIN, BETA_MAX = -3.0, -0.1
LAMBDA_EPS = 0.1


class RateControl:
    """Picture-level rate control; slice-QP granularity."""

    def __init__(self, target_bps: float, fps: float, width: int, height: int,
                 smooth_window: int = 16, base_qp: int = 32):
        self.pixels = width * height
        self.bits_per_pic = target_bps / fps
        self.window = smooth_window
        self.buffer = 0.0  # bits owed (positive = under budget so far)
        # inter R-λ model (RateCtrl.cpp:53 g_RCAlpha/g_RCBeta defaults)
        self.alpha = 3.2003
        self.beta = -1.367
        self.base_qp = base_qp
        self.last_lambda = None

    # -- per-picture ----------------------------------------------------
    def picture_target(self) -> float:
        """Target bits for the next picture with budget smoothing
        (EncRCPic::xEstPicTargetBits)."""
        t = self.bits_per_pic + self.buffer / self.window
        return max(100.0, t)

    def picture_lambda_qp(self, is_intra: bool = False):
        """(lambda, qp) for the next picture (estimatePicLambda,
        RateCtrl.cpp:239)."""
        target = self.picture_target()
        bpp = target / self.pixels
        if is_intra:
            # intra pictures spend more bits; scale target up
            bpp *= 4.0
        lam = self.alpha * (bpp ** self.beta)
        lam = max(LAMBDA_EPS, min(10000.0, lam))
        if self.last_lambda is not None:
            # clip λ swing 2^±1 per picture (RateCtrl.cpp lambda clip)
            lam = max(self.last_lambda * 0.5, min(self.last_lambda * 2.0, lam))
        qp = int(round(4.2005 * math.log(lam) + 13.7122))
        qp = max(1, min(51, qp))
        return lam, qp

    def update_after_picture(self, actual_bits: int, lam_used: float,
                             is_intra: bool = False) -> None:
        """α/β LMS update + budget bookkeeping
        (EncRCPic::updateAfterPicture / xUpdateSequenceModel)."""
        self.buffer += self.bits_per_pic - actual_bits
        self.last_lambda = lam_used
        if is_intra:
            return  # keep the inter model clean; intra uses scaled target
        bpp = max(actual_bits / self.pixels, 1e-6)
        lambda_comp = self.alpha * (bpp ** self.beta)
        lambda_comp = max(LAMBDA_EPS, lambda_comp)
        delta = math.log(lam_used) - math.log(lambda_comp)
        self.alpha += 0.10 * delta * self.alpha
        self.beta += 0.05 * delta * math.log(bpp)
        self.alpha = max(ALPHA_MIN, min(ALPHA_MAX, self.alpha))
        self.beta = max(BETA_MIN, min(BETA_MAX, self.beta))
