"""Retrieval-quality metrics — the reference's TREC-style judgment
harness (``lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/QualityStats.java:25-171``) so ranking changes (similarity
swaps, scorer rewrites) are regression-testable by MAP / P@N / MRR /
recall over a judged query set, not just rank-identity oracles.

Semantics mirrored from QualityStats.java:

- ``add_result(rank, is_relevant)`` consumes ranks 1,2,3,... in order;
- average precision = sum of precision at each RELEVANT rank divided
  by ``max_good_points`` (the judged relevant count, not the retrieved
  count) — ``QualityStats.getAvp:121-123``;
- MRR counts only a first relevant hit within the TOP 5
  (``QualityStats.addResult:86-88``);
- ``precision_at(n)`` beyond the retrieved depth extrapolates as
  ``numPoints * pAt[numPoints] / n`` (``getPrecisionAt:112-116``);
- recall = found relevant / judged relevant.

``average(stats)`` is the QueryDriver aggregation: arithmetic mean per
metric over queries (MAP = mean AveP, ``trec/QueryDriver.java``)."""

from __future__ import annotations

from dataclasses import dataclass, field

MAX_POINTS = 20  # QualityStats.MAX_POINTS


@dataclass
class QualityStats:
    max_good_points: float
    num_points: int = 0
    num_good_points: int = 0
    p_relevant_sum: float = 0.0
    mrr: float = 0.0
    _first_found: bool = False
    _p_at: list = field(default_factory=lambda: [0.0] * (MAX_POINTS + 1))

    def add_result(self, rank: int, is_relevant: bool) -> None:
        if rank != self.num_points + 1:
            raise ValueError(f"rank {rank} illegal after "
                             f"{self.num_points} points")
        if is_relevant:
            self.num_good_points += 1
            if not self._first_found and rank <= 5:
                self.mrr = 1.0 / rank
            self._first_found = True
        self.num_points = rank
        p = self.num_good_points / self.num_points
        if is_relevant:
            self.p_relevant_sum += p
        if rank <= MAX_POINTS:
            self._p_at[rank] = p

    @property
    def avp(self) -> float:
        if self.max_good_points == 0:
            return 0.0
        return self.p_relevant_sum / self.max_good_points

    @property
    def recall(self) -> float:
        if self.max_good_points <= 0:
            return (self.num_good_points / self.num_points
                    if self.num_points else 0.0)
        return self.num_good_points / self.max_good_points

    def precision_at(self, n: int) -> float:
        if n < 1 or n > MAX_POINTS:
            raise ValueError(f"n={n} must be in [1, {MAX_POINTS}]")
        if n > self.num_points:
            if self.num_points == 0:
                return 0.0
            return (self.num_points * self._p_at[self.num_points]) / n
        return self._p_at[n]


def judge_run(ranked_ids: list, relevant: set,
              max_good: int | None = None) -> QualityStats:
    """Score one query's ranked result list against its judged
    relevant set (the QualityBenchmark.analyzeQueryResults loop)."""
    st = QualityStats(float(max_good if max_good is not None
                            else len(relevant)))
    for i, doc in enumerate(ranked_ids, start=1):
        st.add_result(i, doc in relevant)
    return st


def average(stats: list[QualityStats],
            p_at: tuple[int, ...] = (1, 5, 10)) -> dict:
    """QueryDriver-style aggregate over queries: MAP (mean AveP), MRR,
    mean P@N, mean recall."""
    n = max(len(stats), 1)
    out = {
        "n_queries": len(stats),
        "map": round(sum(s.avp for s in stats) / n, 4),
        "mrr": round(sum(s.mrr for s in stats) / n, 4),
        "recall": round(sum(s.recall for s in stats) / n, 4),
    }
    for k in p_at:
        out[f"p_at_{k}"] = round(
            sum(s.precision_at(k) for s in stats) / n, 4)
    return out
