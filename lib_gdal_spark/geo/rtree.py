"""Packed STR-tree over polygon envelopes, built once and broadcast.

Modeled on the reference's packed Hilbert R-tree
(/root/reference/ogr/ogrsf_frmts/flatgeobuf/packedrtree.h:120,
packedrtree.cpp) — a static, bottom-up-bulk-loaded tree over bounding boxes.
We sort leaves by Morton order of bbox centers (same locality intent as the
Hilbert sort; deterministic and dependency-free), pack fixed-fanout nodes
bottom-up into flat NumPy arrays, and query iteratively.

The tree is tiny (admin polygon sets are 10s..100,000s of boxes) and lives in
a Spark broadcast variable: each executor builds batch candidate lists without
shuffling the big side — the distributed analog of the reference's
prepared-geometry nested loop (ogrlayer.cpp:5325-5380).
"""

from __future__ import annotations

import numpy as np

from .cells import _spread_np

FANOUT = 16


class PackedRTree:
    """Static bbox tree; query(box) -> leaf item indices."""

    def __init__(self, boxes: np.ndarray):
        """boxes: (n, 4) float64 [xmin, ymin, xmax, ymax]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = len(boxes)
        if n == 0:
            self.levels = []
            self.order = np.empty(0, dtype=np.int64)
            return
        cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
        cy = (boxes[:, 1] + boxes[:, 3]) / 2.0
        # quantize centers to 16-bit grid, sort by Morton code
        def q(v):
            lo, hi = v.min(), v.max()
            span = hi - lo if hi > lo else 1.0
            return ((v - lo) / span * 65535.0).astype(np.uint64)

        code = _spread_np(q(cx)) | (_spread_np(q(cy)) << np.uint64(1))
        self.order = np.argsort(code, kind="stable").astype(np.int64)
        level = boxes[self.order]
        self.levels = [level]  # levels[0] = leaves (sorted), last = root group
        while len(level) > FANOUT:
            m = (len(level) + FANOUT - 1) // FANOUT
            nxt = np.empty((m, 4), dtype=np.float64)
            for i in range(m):
                chunk = level[i * FANOUT : (i + 1) * FANOUT]
                nxt[i, 0] = chunk[:, 0].min()
                nxt[i, 1] = chunk[:, 1].min()
                nxt[i, 2] = chunk[:, 2].max()
                nxt[i, 3] = chunk[:, 3].max()
            self.levels.append(nxt)
            level = nxt

    def query(self, xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
        """Item indices (into the original boxes array) whose bbox intersects."""
        if not self.levels:
            return np.empty(0, dtype=np.int64)
        top = len(self.levels) - 1
        cand = np.arange(len(self.levels[top]), dtype=np.int64)
        for li in range(top, -1, -1):
            b = self.levels[li][cand]
            hit = ~((b[:, 2] < xmin) | (xmax < b[:, 0]) | (b[:, 3] < ymin) | (ymax < b[:, 1]))
            cand = cand[hit]
            if li == 0:
                return np.sort(self.order[cand])
            # expand surviving nodes to their children one level down
            cand = (cand[:, None] * FANOUT + np.arange(FANOUT, dtype=np.int64)).ravel()
            cand = cand[cand < len(self.levels[li - 1])]
        return np.empty(0, dtype=np.int64)
