"""Transform-eligibility probe over a realistic-dimensions corpus.

Backs the "Transform eligibility" numbers in PERF.md: for each of the
coefficient-domain transforms (runtime/coeftx.py), what fraction of a
weighted synthetic upload mix can skip the pixel path entirely? Three
rule sets are compared:

* strict  — jpegtran "perfect transform" rules only (every component
            extent block-aligned; what `IMAGEPROCESSOR_COEF_RS=0` gives)
* rs-half — round-5 first cut: `_rs` limited to dim % 16 == 8 axes
            (luma aligned, chroma half-block shift) — 1080-class only
* rs-sel  — second cut: any axis where the fold is an exact
            per-component sample SELECTION (dim a multiple of every
            component's subsample factor) — adds 1366-class even dims
* rs-full — the shipped gate: rs-sel plus the subsample-area two-tap
            chroma mirror for odd dims (runtime/coeftx._shift_mirror
            frac=r/f) — every dim expressible

Corpus: 17 weighted (width, height) shapes spanning camera, phone,
screen and web sizes (composition stated inline — no egress in this
environment, so the mix is synthetic but each dim class is a real
device resolution), crossed with the watermark corpus's 70/15/15
4:2:0 / 4:2:2 / 4:4:4 subsampling mix (PERF.md "Eligibility").

Run: python tools/txeligibility.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from imageprocessor_tpu.domain import OperationType  # noqa: E402
from imageprocessor_tpu.models.plan import NormalizedOp  # noqa: E402
from imageprocessor_tpu.runtime import coeftx  # noqa: E402

# (w, h, weight) — weights sum to 100
CORPUS = [
    # cameras / phones (photo uploads dominate an image service)
    (4032, 3024, 14),   # 12 MP 4:3 (iPhone class)
    (4000, 3000, 10),   # 12 MP 4:3 (Android class)
    (6000, 4000, 6),    # 24 MP 3:2 (DSLR/mirrorless)
    (5184, 3456, 4),    # 18 MP 3:2
    (4608, 3456, 4),    # 16 MP 4:3
    (3024, 4032, 8),    # portrait 12 MP
    (1080, 1920, 6),    # portrait FHD phone export
    (1440, 1920, 3),    # portrait 4:3 phone export
    # screens / screenshots
    (1920, 1080, 12),   # FHD
    (3840, 2160, 4),    # UHD
    (2560, 1440, 3),    # QHD
    (1366, 768, 5),     # budget-laptop screen (w % 8 == 6)
    (1280, 720, 3),     # HD
    # web / thumbnails / odd resizes
    (800, 600, 6),
    (640, 480, 5),
    (683, 384, 4),      # half of 1366x768 (odd width)
    (333, 500, 3),      # odd CMS resize
]
SAMPLINGS = [
    ([(2, 2), (1, 1), (1, 1)], 70),   # 4:2:0
    ([(2, 1), (1, 1), (1, 1)], 15),   # 4:2:2
    ([(1, 1), (1, 1), (1, 1)], 15),   # 4:4:4
]
OPS = {
    "flip_h": NormalizedOp(type=OperationType.FLIP,
                           direction="horizontal"),
    "flip_v": NormalizedOp(type=OperationType.FLIP,
                           direction="vertical"),
    "rot90": NormalizedOp(type=OperationType.ROTATE, angle=90.0),
    "rot180": NormalizedOp(type=OperationType.ROTATE, angle=180.0),
    "rot270": NormalizedOp(type=OperationType.ROTATE, angle=270.0),
}


def _eligible(op, size, sampling, rules):
    if rules == "strict":
        os.environ["IMAGEPROCESSOR_COEF_RS"] = "0"
        try:
            return coeftx.eligible_prims(op, size, sampling) is not None
        finally:
            os.environ.pop("IMAGEPROCESSOR_COEF_RS", None)
    prims = coeftx.eligible_prims(op, size, sampling)
    if prims is None:
        return False
    w, h = size
    for p in prims:
        if not isinstance(p, str) or not p.endswith("_rs"):
            continue
        dim = w if p.startswith("flip_h") else h
        if rules == "rs-half" and dim % 16 != 8:
            return False
        if rules == "rs-sel":
            fs = coeftx._axis_factors(sampling, 1 if p.startswith("flip_h")
                                      else 0)
            if any(dim % f for f in fs):
                return False
    return True


def main():
    total = sum(wt for *_xy, wt in CORPUS) * sum(w for _s, w in SAMPLINGS)
    print(f"{'op':8s} {'strict':>8s} {'rs-half':>8s} {'rs-sel':>8s}"
          f" {'rs-full':>8s}")
    for name, op in OPS.items():
        row = []
        for rules in ("strict", "rs-half", "rs-sel", "rs-full"):
            hit = 0
            for w, h, wt in CORPUS:
                for sampling, swt in SAMPLINGS:
                    if _eligible(op, (w, h), sampling, rules):
                        hit += wt * swt
            row.append(100.0 * hit / total)
        print(f"{name:8s}" + "".join(f" {v:7.1f}%" for v in row))


if __name__ == "__main__":
    main()
