"""Brute-force pure-Python BM25 oracle (the role of Lucene's ``CheckHits``
brute-force cross-check, ``lucene/test-framework/.../CheckHits.java:58``).

Defines the engine's golden semantics:

- **doc_id** = rank of ``(repo, path, commit)`` in lexicographic order
  (dense, deterministic — replaces Lucene's insertion-order docIDs; the
  Spark builder reproduces exactly this order via range repartition +
  sortWithinPartitions + partition offsets).
- **collection stats** are whole-index: ``docCount`` counts docs with at
  least one emitted token (docs whose analysis emits nothing have no
  postings and no norm — ``IndexingChain.java:1162``),
  ``sumTotalTermFreq`` = all emitted tokens
  (``IndexSearcher.java:1110-1123``).
- **scores**: exact float32 BM25 with SmallFloat-quantized norms
  (:mod:`lucene_1_spark.functions.bm25`), per-term float32 scores summed
  in double (``DisjunctionSumScorer.java:39-45``).
- **top-k**: sort by (-score, doc_id) — lower doc_id wins ties
  (``HitQueue.java:78-84``; cross-partition merge ``TopDocs.java:71-117``).

Query syntax (FIXTURES.md §2): whitespace-separated clauses; ``+term`` =
MUST, ``-term`` = MUST_NOT, bare = SHOULD. Query text is analyzed with
the SAME analyzer as indexing (``demo/SearchFiles.java:109-120``).
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass

import numpy as np
import pandas as pd

from lucene_1_spark.analysis import get_analyzer
from lucene_1_spark.functions import bm25
from lucene_1_spark.functions.smallfloat import int_to_byte4


@dataclass
class OracleIndex:
    doc_keys: list[str]            # doc_id -> "repo/path@commit"
    postings: dict[str, dict[int, int]]   # term -> {doc_id: freq}
    norm_bytes: np.ndarray         # uint8 per doc
    doc_count: int                 # docs with >=1 emitted token
    sum_total_term_freq: int
    n_docs: int
    k1: float = 1.2
    b: float = 0.75
    positions: dict[str, dict[int, list[int]]] | None = None  # term->doc->pos


def doc_key(repo: str, path: str, commit: str) -> str:
    return f"{repo}/{path}@{commit}"


def build_oracle_index(corpus: pd.DataFrame, analyzer: str = "standard",
                       k1: float = 1.2, b: float = 0.75) -> OracleIndex:
    an = get_analyzer(analyzer)
    df = corpus.sort_values(["repo", "path", "commit"], kind="mergesort").reset_index(drop=True)
    postings: dict[str, dict[int, int]] = {}
    positions: dict[str, dict[int, list[int]]] = {}
    lengths = np.zeros(len(df), dtype=np.int64)
    keys = []
    for did, row in enumerate(df.itertuples(index=False)):
        keys.append(doc_key(row.repo, row.path, row.commit))
        twp = an.tokens_with_positions(row.content)
        lengths[did] = len(twp)
        for term, freq in Counter(t for t, _ in twp).items():
            postings.setdefault(term, {})[did] = freq
        for term, pos in twp:
            positions.setdefault(term, {}).setdefault(did, []).append(pos)
    norm_bytes = int_to_byte4(lengths)
    doc_count = int((lengths > 0).sum())
    return OracleIndex(
        doc_keys=keys, postings=postings, norm_bytes=norm_bytes,
        doc_count=doc_count, sum_total_term_freq=int(lengths.sum()),
        n_docs=len(df), k1=k1, b=b, positions=positions,
    )


def parse_query(query: str, analyzer: str = "standard"):
    """-> (must_terms, should_terms, must_not_terms); each a list."""
    an = get_analyzer(analyzer)
    must, should, must_not = [], [], []
    for clause in query.split():
        occur = "should"
        if clause.startswith("+"):
            occur, clause = "must", clause[1:]
        elif clause.startswith("-"):
            occur, clause = "must_not", clause[1:]
        for term in an.tokens(clause):
            {"must": must, "should": should, "must_not": must_not}[occur].append(term)
    return must, should, must_not


def search_oracle_phrase(idx: OracleIndex, terms: list[str], k: int = 10,
                         boost: float = 1.0) -> list[tuple[int, str, float]]:
    """Exact-phrase brute force: weight = boost * sum(idf) (float32 sum
    in double then cast, PhraseWeight/idfExplain), freq = count of
    phrase start positions, same BM25 tf curve."""
    avgdl = bm25.avg_field_length(idx.sum_total_term_freq, idx.doc_count)
    cache = bm25.norm_inverse_cache(avgdl, np.float32(idx.k1), np.float32(idx.b))
    pos = idx.positions or {}
    if any(t not in pos for t in terms):
        return []
    acc = 0.0
    for t in terms:
        acc += float(bm25.idf(len(idx.postings[t]), idx.doc_count))
    weight = np.float32(np.float32(boost) * np.float32(acc))
    cands = set(pos[terms[0]])
    for t in terms[1:]:
        cands &= set(pos[t])
    out = []
    for did in cands:
        starts = np.asarray(pos[terms[0]][did], dtype=np.int64)
        for i, t in enumerate(terms[1:], start=1):
            nxt = np.asarray(pos[t][did], dtype=np.int64)
            starts = starts[np.isin(starts + i, nxt)]
            if len(starts) == 0:
                break
        pf = len(starts)
        if pf == 0:
            continue
        s = bm25.score_term(np.array([pf]), idx.norm_bytes[did:did + 1],
                            weight, cache)
        out.append((did, idx.doc_keys[did], float(s[0])))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def search_oracle_multiphrase(idx: OracleIndex, slots, k: int = 10,
                              boost: float = 1.0, slop: int = 0,
                              offsets=None) -> list[tuple[int, str, float]]:
    """MultiPhraseQuery brute force (``MultiPhraseQuery.java:53-120``):
    per-slot positional UNION of member terms, then the engine's
    documented exact/sloppy semantics — written as plain per-doc loops
    (an independent second implementation of the vectorized kernel).
    Member terms with docFreq 0 are skipped; a slot with no present
    member never matches.  Weight = boost * f32-accumulated sum of
    member idfs."""
    avgdl = bm25.avg_field_length(idx.sum_total_term_freq, idx.doc_count)
    cache = bm25.norm_inverse_cache(avgdl, np.float32(idx.k1),
                                    np.float32(idx.b))
    pos = idx.positions or {}
    slots = tuple(tuple(t for t in s if t in pos) for s in slots)
    if not slots or any(not s for s in slots):
        return []
    n = len(slots)
    offs = tuple(offsets) if offsets is not None else tuple(range(n))
    deltas = [o - offs[0] for o in offs]
    acc = 0.0
    for s in slots:
        for t in s:
            acc += float(bm25.idf(len(idx.postings[t]), idx.doc_count))
    weight = np.float32(np.float32(boost) * np.float32(acc))
    repeated = {s for s in slots if slots.count(s) > 1}

    def slot_positions(did, s):
        u = set()
        for t in s:
            u.update(pos[t].get(did, []))
        return sorted(u)

    cands = set()
    for did in pos[slots[0][0]] if len(slots[0]) == 1 else {
            d for t in slots[0] for d in pos[t]}:
        if all(slot_positions(did, s) for s in slots):
            cands.add(did)
    out = []
    for did in cands:
        P = [slot_positions(did, s) for s in slots]
        pf = 0.0
        if slop == 0:
            for p in P[0]:
                if all((p + deltas[i]) in P[i] for i in range(1, n)):
                    pf += 1.0
        elif n == 2 and not repeated:
            for p0 in P[0]:
                for p1 in P[1]:
                    e = p1 - (p0 + deltas[1])
                    if abs(e) <= slop:
                        pf += 1.0 / (1.0 + abs(e))
        else:
            for p in P[0]:
                disp, ok = 0.0, True
                prev = {slots[0]: p} if slots[0] in repeated else {}
                for i in range(1, n):
                    sk, target = slots[i], p + deltas[i]
                    window = [x for x in P[i]
                              if abs(x - target) <= slop]
                    if sk not in repeated:
                        if not window:
                            ok = False
                            break
                        disp += min(abs(x - target) for x in window)
                        continue
                    lb = target - slop if sk not in prev else prev[sk] + 1
                    feas = [x for x in P[i]
                            if lb <= x <= target + slop]
                    if not feas:
                        ok = False
                        break
                    pick = feas[0]
                    disp += abs(pick - target)
                    prev[sk] = pick
                if ok:
                    pf += 1.0 / (1.0 + disp)
        if pf <= 0:
            continue
        s = bm25.score_term(np.array([pf]), idx.norm_bytes[did:did + 1],
                            weight, cache)
        out.append((did, idx.doc_keys[did], float(s[0])))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def search_oracle(idx: OracleIndex, query: str, k: int = 10,
                  analyzer: str = "standard") -> list[tuple[int, str, float]]:
    """Top-k as [(doc_id, doc_key, score_float32)] in rank order."""
    q = query.strip()
    if q.startswith('"') and q.endswith('"'):
        an = get_analyzer(analyzer)
        return search_oracle_phrase(idx, an.tokens(q[1:-1]), k)
    must, should, must_not = parse_query(query, analyzer)
    avgdl = bm25.avg_field_length(idx.sum_total_term_freq, idx.doc_count)
    cache = bm25.norm_inverse_cache(avgdl, np.float32(idx.k1), np.float32(idx.b))

    def plist(t): return idx.postings.get(t, {})

    # candidate docs
    present_must = [t for t in must]
    if present_must:
        # a MUST term missing from the corpus => no hits at all
        sets = [set(plist(t)) for t in present_must]
        cands = set.intersection(*sets) if sets else set()
    else:
        cands = set()
        for t in should:
            cands |= set(plist(t))
    for t in must_not:
        cands -= set(plist(t))
    if not cands:
        return []

    scoring_terms = [t for t in (must + should) if plist(t)]
    out = []
    for did in cands:
        acc = 0.0  # double accumulator, like DisjunctionSumScorer
        for t in scoring_terms:
            freq = plist(t).get(did)
            if freq is None:
                continue
            w = bm25.term_weight(len(plist(t)), idx.doc_count)
            s = bm25.score_term(np.array([freq]), idx.norm_bytes[did:did + 1], w, cache)
            acc += float(s[0])
        out.append((did, idx.doc_keys[did], float(np.float32(acc))))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]
