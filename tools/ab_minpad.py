"""A/B driver for the round-5 minimal-pad flash grids.

AB_LEGACY=1 restores the round-4 pickers (pad-to-1024/4096 fallback when no
exact-fit divisor exists) by monkeypatching before the model is built, then
runs bench.py unchanged. Use with FRN_BENCH_GEOMETRY=ddd17 to A/B the
non-divisible token counts (stage-1 5,655 / stage-2 1,452); DSEC shapes are
exact-fit in both pickers and unaffected.

  FRN_BENCH_GEOMETRY=ddd17 python tools/ab_minpad.py              # minimal-pad
  AB_LEGACY=1 FRN_BENCH_GEOMETRY=ddd17 python tools/ab_minpad.py  # round-4 grid
"""

import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("AB_LEGACY") == "1":
    import frn_tpu.ops.flash_attention as fa

    def _legacy_fwd(n):
        if n >= 16384:
            for blk in (4096, 3840, 3200, 2560, 2400, 1920):
                if n % blk == 0:
                    return blk, blk, 120
            return 4096, 4096, 120
        for blk in (1200, 1024, 960, 800, 640):
            if n % blk == 0:
                return blk, blk, 0
        return 1024, 1024, 0

    def _legacy_bwd(n):
        if n >= 16384:
            for blk in (1920, 2400, 1600):
                if n % blk == 0:
                    return blk, blk, 96
            return 1024, 1024, 0
        for blk in (960, 1024, 800, 1200):
            if n % blk == 0:
                return blk, blk, 0
        return 1024, 1024, 0

    fa._pick_fwd_blocks = _legacy_fwd
    fa._pick_bwd_blocks = _legacy_bwd
    print("[ab_minpad] LEGACY round-4 pickers active", file=sys.stderr)
else:
    print("[ab_minpad] round-5 minimal-pad pickers active", file=sys.stderr)

runpy.run_path(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "bench.py"),
    run_name="__main__",
)
