"""Bitrate-targeting lambda-modifier guesser.

Behavioral equivalent of the reference BitrateTargeting utility
(App/utils/BitrateTargeting/GuessLambdaModifiers.cpp): given a target
bitrate per temporal layer and the (lambda-modifier, bitrate) points of
previous encode trials, propose the next set of lambda modifiers —
log-domain interpolation between the last two points when the slope is
usable, a multiplicative step otherwise, with intra/inter dampening so
successive guesses converge instead of oscillating.

  python tools/bitrate_targeting.py --targets 1200,800,600 \
      --points "1.0:1500;0.8:1100" "1.0:900" "1.0:700"
"""

from __future__ import annotations

import argparse
import math


def _increment(initial_adjustment: float, target: float, lam: float,
               rate: float) -> float:
    """Single-point step: scale the modifier by the rate miss, bounded by
    the initial-adjustment parameter."""
    ratio = rate / target if target > 0 else 1.0
    step = min(max(ratio, 1.0 / initial_adjustment), initial_adjustment)
    return lam * step


def _interpolate(target: float, p1: tuple, p2: tuple) -> float:
    """Log-log interpolation through two (modifier, bitrate) points."""
    l1, r1 = p1
    l2, r2 = p2
    a = (math.log(l1) - math.log(l2)) / (math.log(r1) - math.log(r2))
    return math.exp(math.log(l1) + a * (math.log(target) - math.log(r1)))


def guess_lambda_modifier(target: float, points: list,
                          initial_adjustment: float = 2.0,
                          inter_dampening: float = 1.0) -> float:
    """points: [(lambda_modifier, bitrate), ...] oldest first."""
    assert points and 0.0 < inter_dampening <= 1.0
    if len(points) == 1 \
            or abs(math.log(points[-1][0]) - math.log(points[-2][0])) < 1e-12 \
            or abs(math.log(points[-1][1]) - math.log(points[-2][1])) < 1e-12:
        lam, rate = points[-1]
        prelim = _increment(initial_adjustment, target, lam, rate)
    else:
        prelim = _interpolate(target, points[-1], points[-2])
    prev = points[-1][0]
    # intra dampening: log-compress the step relative to the last guess
    delta = math.log(1.0 + abs(prelim - prev) / prev)
    step = prev * (math.expm1(delta) if prelim >= prev else -math.expm1(delta))
    damped = prev + step * inter_dampening
    return max(damped, 1e-6)


def guess_lambda_modifiers(targets: list, histories: list,
                           initial_adjustment: float = 2.0) -> list:
    """Per-layer guesses; inter-dampening shrinks with the aggregate miss
    across layers so one layer's big move doesn't destabilize the rest."""
    misses = []
    for t, pts in zip(targets, histories):
        if pts:
            misses.append(abs(pts[-1][1] - t) / t)
    total = sum(misses) or 1e-9
    out = []
    for t, pts in zip(targets, histories):
        m = abs(pts[-1][1] - t) / t
        inter = min(1.0, max(m / total, 1e-3))
        out.append(guess_lambda_modifier(t, pts, initial_adjustment, inter))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--targets", required=True,
                    help="comma-separated bitrate targets per layer")
    ap.add_argument("--points", nargs="+", required=True,
                    help="per layer: 'lm:rate;lm:rate;...' oldest first")
    ap.add_argument("--initial-adjustment", type=float, default=2.0)
    a = ap.parse_args(argv)
    targets = [float(x) for x in a.targets.split(",")]
    hist = [[tuple(float(v) for v in p.split(":"))
             for p in layer.split(";")] for layer in a.points]
    res = guess_lambda_modifiers(targets, hist, a.initial_adjustment)
    print(" ".join(f"{x:.6f}" for x in res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
