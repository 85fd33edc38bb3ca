"""Generate the large scaling-evidence corpus IN PARALLEL with Spark
(the driver-side corpus_mod.generate loop is fine for <=200k docs but
not for millions).  Deterministic per partition: RandomState(seed + pid).

Usage: python tools/gen_scaling_corpus.py [n_docs] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def gen_chunk(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    from lucene_1_spark import corpus as c
    words = np.array(c.vocab())
    cdf = np.cumsum(c.zipf_probs(len(words)))
    for pdf in pdf_iter:
        ids = pdf["id"].to_numpy()
        rng = np.random.RandomState(42 + int(ids[0]) % 100003)
        n = len(ids)
        doc_len = rng.randint(5, 401, size=n)
        tok_idx = np.clip(np.searchsorted(
            cdf, rng.random_sample(int(doc_len.sum())), side="right"),
            0, len(words) - 1)
        toks = words[tok_idx]
        offsets = np.concatenate([[0], np.cumsum(doc_len)])
        rows = []
        for j, i in enumerate(ids):
            i = int(i)
            repo = f"repo-{i % 7}"
            ext = c.EXTS[i % len(c.EXTS)]
            path = f"src/{c.DIRS[i % len(c.DIRS)]}/f{i:x}_{i}.{ext}"
            commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
            content = " ".join(toks[offsets[j]:offsets[j + 1]])
            rows.append((repo, path, commit, c.LANGS[ext], content))
        yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang",
                                          "content"])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        tempfile.gettempdir(), f"l1s_bench_corpus_{n}")
    from lucene_1_spark.session import get_spark
    spark = get_spark("gen-corpus", cores=16, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    (spark.range(0, n, 1, 64)
     .mapInPandas(gen_chunk, "repo string, path string, commit string, "
                             "lang string, content string")
     .write.mode("overwrite").parquet(out))
    print(out)


if __name__ == "__main__":
    main()
