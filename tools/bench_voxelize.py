"""Host voxelization throughput: native C++ vs numpy bincount vs reference loop.

The reference rasterizes events with an interpreted Python loop
(dsec_data.py:380-381) — the input-pipeline hot spot its training throughput dies
on. Prints events/second for each path.
"""

import time

import numpy as np

from frn_tpu.ops.voxelize import voxelize_events_np
from frn_tpu.utils.native import get_lib, native_voxelize

N = 2_000_000
H, W, C = 480, 640, 5


def reference_loop(x, y, t, p):
    voxel = np.zeros((C, H, W), np.float32)
    tn = (t - t[0]) / (t[-1] - t[0] + 1e-6)
    tb = np.clip((tn * (C - 1)).astype(np.int64), 0, C - 1)
    pol = (p > 0).astype(np.float32) * 2 - 1
    for ci, xi, yi, pi in zip(tb, x, y, pol):
        voxel[ci, yi, xi] += pi
    return voxel


def main():
    rng = np.random.default_rng(0)
    x = rng.integers(0, W, N).astype(np.int64)
    y = rng.integers(0, H, N).astype(np.int64)
    t = np.sort(rng.integers(0, 1_000_000, N)).astype(np.int64)
    p = rng.integers(0, 2, N).astype(np.int8)

    # reference python loop on a subset (too slow for the full stream)
    sub = 100_000
    t0 = time.perf_counter()
    reference_loop(x[:sub], y[:sub], t[:sub], p[:sub])
    ref_rate = sub / (time.perf_counter() - t0)
    print(f"reference python loop : {ref_rate/1e6:8.2f} M events/s")

    import os

    os.environ["FRN_DISABLE_NATIVE"] = "1"
    import frn_tpu.utils.native as nat

    nat._lib, nat._tried = None, False
    t0 = time.perf_counter()
    a = voxelize_events_np(x, y, t, p, C, H, W)
    np_rate = N / (time.perf_counter() - t0)
    print(f"numpy bincount        : {np_rate/1e6:8.2f} M events/s ({np_rate/ref_rate:.0f}x ref)")
    del os.environ["FRN_DISABLE_NATIVE"]
    nat._lib, nat._tried = None, False

    if get_lib() is not None:
        t0 = time.perf_counter()
        b = voxelize_events_np(x, y, t, p, C, H, W)
        nat_rate = N / (time.perf_counter() - t0)
        print(f"native C++ scatter    : {nat_rate/1e6:8.2f} M events/s ({nat_rate/ref_rate:.0f}x ref)")
        np.testing.assert_allclose(a, b, atol=1e-4)
        print("paths agree")


if __name__ == "__main__":
    main()
