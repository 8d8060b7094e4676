"""StreamingHistogram — Ben-Haim & Tom-Tov fixed-bucket mergeable
quantile sketch (reference: ``raster/.../histogram/
StreamingHistogram.scala``, default 80 buckets; SURVEY.md §2.Z3).

A mergeable monoid: per-tile partial sketches combine associatively,
so the Spark operator is a two-phase aggregation (map-side partials ->
merge) exactly like the reference's ``aggregate``. Spark's own
``percentile_approx`` plays the same role for plain columns; this
sketch exists for tile payloads (values live inside binary arrays, so
the sketch is built in numpy inside the pandas UDF).
"""

from __future__ import annotations

import numpy as np

__all__ = ["StreamingHistogram"]


class StreamingHistogram:
    def __init__(self, size: int = 80):
        self.size = size
        self.centers: list[float] = []
        self.counts: list[float] = []

    # ------------------------------------------------------------ build
    def update(self, values: np.ndarray) -> "StreamingHistogram":
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        # bulk path: exact histogram of the batch, then merge buckets
        uniq, cnt = np.unique(v, return_counts=True)
        self.centers.extend(uniq.tolist())
        self.counts.extend(cnt.astype(float).tolist())
        self._compress()
        return self

    def merge(self, other: "StreamingHistogram") -> "StreamingHistogram":
        out = StreamingHistogram(max(self.size, other.size))
        out.centers = self.centers + other.centers
        out.counts = self.counts + other.counts
        out._compress()
        return out

    def _compress(self) -> None:
        if not self.centers:
            return
        order = np.argsort(self.centers, kind="stable")
        c = np.asarray(self.centers, dtype=np.float64)[order]
        n = np.asarray(self.counts, dtype=np.float64)[order]
        # coalesce exact duplicates
        same = np.concatenate([[False], np.isclose(np.diff(c), 0.0)])
        if same.any():
            keep_idx = np.where(~same)[0]
            agg = np.add.reduceat(n, keep_idx)
            c, n = c[keep_idx], agg
        c, n = c.tolist(), n.tolist()
        while len(c) > self.size:
            gaps = np.diff(np.asarray(c))
            i = int(np.argmin(gaps))
            tot = n[i] + n[i + 1]
            c[i] = (c[i] * n[i] + c[i + 1] * n[i + 1]) / tot
            n[i] = tot
            del c[i + 1], n[i + 1]
        self.centers, self.counts = c, n

    # ------------------------------------------------------------ query
    @property
    def total(self) -> float:
        return float(sum(self.counts))

    def mean(self) -> float:
        c = np.asarray(self.centers)
        n = np.asarray(self.counts)
        return float((c * n).sum() / n.sum())

    def quantile(self, q: float) -> float:
        """Interpolated quantile per the BHTT sum/uniform procedure."""
        c = np.asarray(self.centers, dtype=np.float64)
        n = np.asarray(self.counts, dtype=np.float64)
        if c.size == 0:
            return float("nan")
        if c.size == 1:
            return float(c[0])
        target = q * n.sum()
        # cumulative count up to each center (half of own bucket)
        cum = np.cumsum(n) - n / 2.0
        if target <= cum[0]:
            return float(c[0])
        if target >= cum[-1]:
            return float(c[-1])
        i = int(np.searchsorted(cum, target) - 1)
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(c[i] + frac * (c[i + 1] - c[i]))

    def quantile_breaks(self, n_breaks: int) -> list[float]:
        """classBreaks (Z4): n-quantile boundaries."""
        return [self.quantile((i + 1) / n_breaks) for i in range(n_breaks)]

    def mode(self) -> float:
        return float(self.centers[int(np.argmax(self.counts))])

    # ----------------------------------------------------------- serde
    def to_arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return (
            np.asarray(self.centers, dtype=np.float64),
            np.asarray(self.counts, dtype=np.float64),
        )

    @classmethod
    def from_arrays(cls, centers, counts, size: int = 80) -> "StreamingHistogram":
        h = cls(size)
        h.centers = list(map(float, centers))
        h.counts = list(map(float, counts))
        h._compress()
        return h
