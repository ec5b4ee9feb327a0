"""DSEC h5 event-stream reading.

Re-implements the used subset of the reference's event IO (dsec_utils.py:80-120 and
the external dsec-det lib's directory semantics, which are not in the reference tree
— rebuilt from observable behavior): chunked h5 files with datasets events/{x,y,t,p},
a scalar t_offset, and an ms_to_idx lookup table mapping relative milliseconds to the
first event index at-or-after that millisecond.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None


class H5EventReader:
    """Random-access window reads over a DSEC event h5 file.

    Timestamps given to `window` are absolute microseconds (same clock as image
    timestamps); internally offset by t_offset and resolved through ms_to_idx.

    File handles are THREAD-LOCAL: h5py serializes all access through a global
    lock per File object, so loader worker threads sharing one handle collapse to
    sequential IO. One handle per (reader, thread) restores parallel reads.
    """

    def __init__(self, path: str):
        if h5py is None:
            raise ImportError("h5py is required for event reading")
        self.path = path
        import threading

        self._local = threading.local()
        self._t_offset: Optional[int] = None

    @property
    def file(self):
        f = getattr(self._local, "file", None)
        if f is None:
            f = h5py.File(self.path, "r")
            self._local.file = f
        return f

    def close(self):
        f = getattr(self._local, "file", None)
        if f is not None:
            f.close()
            self._local.file = None

    @property
    def t_offset(self) -> int:
        if self._t_offset is None:
            self._t_offset = int(self.file["t_offset"][()])
        return self._t_offset

    def _ms_index(self, t_abs_us: int) -> int:
        ms_to_idx = self.file["ms_to_idx"]
        ms = int((t_abs_us - self.t_offset) / 1e3)
        ms = max(0, min(ms, len(ms_to_idx) - 1))
        return int(ms_to_idx[ms])

    def window(self, t0_us: int, t1_us: int) -> Dict[str, np.ndarray]:
        """Events with t in ~[t0_us, t1_us) (ms_to_idx granularity), absolute us.

        Returns dict x (int), y (int), t (int64 absolute us), p (raw polarity).
        """
        i0 = self._ms_index(t0_us)
        i1 = self._ms_index(t1_us)
        i0, i1 = sorted((max(i0, 0), max(i1, 0)))
        ev = self.file["events"]
        out = {k: np.asarray(ev[k][i0:i1]) for k in "xytp"}
        out["t"] = out["t"].astype(np.int64) + self.t_offset
        return out


def write_event_h5(
    path: str,
    x: np.ndarray,
    y: np.ndarray,
    t_abs_us: np.ndarray,
    p: np.ndarray,
    t_offset: Optional[int] = None,
) -> None:
    """Write a DSEC-format event h5 file (used by tests/fixtures and tools)."""
    if h5py is None:
        raise ImportError("h5py is required")
    order = np.argsort(t_abs_us, kind="stable")
    x, y, t_abs_us, p = x[order], y[order], t_abs_us[order], p[order]
    if t_offset is None:
        t_offset = int(t_abs_us[0]) if len(t_abs_us) else 0
    t_rel = t_abs_us.astype(np.int64) - t_offset
    num_ms = int(t_rel[-1] / 1e3) + 2 if len(t_rel) else 1
    # ms_to_idx[m] = first index with t_rel >= m*1000
    ms_to_idx = np.searchsorted(t_rel, np.arange(num_ms, dtype=np.int64) * 1000, side="left")

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g.create_dataset("x", data=x.astype(np.uint16))
        g.create_dataset("y", data=y.astype(np.uint16))
        g.create_dataset("t", data=t_rel)
        g.create_dataset("p", data=p.astype(np.uint8))
        f.create_dataset("t_offset", data=np.int64(t_offset))
        f.create_dataset("ms_to_idx", data=ms_to_idx.astype(np.int64))
