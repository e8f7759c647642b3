"""STR-packed R-tree over polygon bounding boxes (pure NumPy).

Sort-Tile-Recursive packing (Leutenegger et al., 1997 — public algorithm):
leaves are built by sorting rectangles by x-center into vertical slices,
then by y-center within each slice. Two levels (node -> leaf) are enough
for broadcast-scale polygon sets (the north_rule's "broadcast R-tree-packed
polygon sets"); queries are vectorized over point batches.
"""

from __future__ import annotations

import numpy as np

_LEAF = 16  # rectangles per leaf


class STRtree:
    def __init__(self, min_x, min_y, max_x, max_y):
        n = len(min_x)
        self.min_x = np.asarray(min_x, dtype=np.int64)
        self.min_y = np.asarray(min_y, dtype=np.int64)
        self.max_x = np.asarray(max_x, dtype=np.int64)
        self.max_y = np.asarray(max_y, dtype=np.int64)
        order = np.argsort((self.min_x + self.max_x) * 0.5, kind="stable")
        n_slices = max(1, int(np.ceil(np.sqrt(n / _LEAF))))
        slice_sz = max(1, int(np.ceil(n / n_slices)))  # n=0: empty tree, no crash
        leaves = []
        for s in range(0, n, slice_sz):
            sl = order[s : s + slice_sz]
            sl = sl[np.argsort((self.min_y[sl] + self.max_y[sl]) * 0.5, kind="stable")]
            for t in range(0, len(sl), _LEAF):
                leaves.append(sl[t : t + _LEAF])
        self.leaves = leaves
        self.leaf_min_x = np.array([self.min_x[ix].min() for ix in leaves])
        self.leaf_min_y = np.array([self.min_y[ix].min() for ix in leaves])
        self.leaf_max_x = np.array([self.max_x[ix].max() for ix in leaves])
        self.leaf_max_y = np.array([self.max_y[ix].max() for ix in leaves])

    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Vectorized: -> (point_idx, rect_idx) candidate pairs where the
        point lies inside the rectangle's bbox."""
        out_p: list[np.ndarray] = []
        out_r: list[np.ndarray] = []
        for li, members in enumerate(self.leaves):
            m = (
                (px >= self.leaf_min_x[li])
                & (px <= self.leaf_max_x[li])
                & (py >= self.leaf_min_y[li])
                & (py <= self.leaf_max_y[li])
            )
            if not m.any():
                continue
            pidx = np.nonzero(m)[0]
            sub_x, sub_y = px[pidx], py[pidx]
            for r in members:
                mm = (
                    (sub_x >= self.min_x[r])
                    & (sub_x <= self.max_x[r])
                    & (sub_y >= self.min_y[r])
                    & (sub_y <= self.max_y[r])
                )
                if mm.any():
                    out_p.append(pidx[mm])
                    out_r.append(np.full(int(mm.sum()), r, dtype=np.int64))
        if not out_p:
            e = np.empty(0, dtype=np.int64)
            return e, e
        return np.concatenate(out_p), np.concatenate(out_r)
