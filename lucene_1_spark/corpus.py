"""Deterministic synthetic source-code corpus (FIXTURES.md §1, seed=42).

Plays the role of the reference's benchmark content sources
(``lucene/benchmark/.../feeds/ReutersContentSource.java:44`` etc.) but
fixed-seed so top-k goldens are stable.  Input-hint shape:
``(repo, path, commit, lang, content)``.

Zipf(alpha=1.2) identifiers over a 500-word vocab plus ~30 real
keywords: hot terms exercise skew salting and long posting lists, rare
terms exercise idf spread.  Generation is vectorized numpy — 200k docs
in a few seconds.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 500
KEYWORDS = [
    "def", "class", "return", "import", "public", "static", "void", "fn",
    "let", "mut", "const", "if", "else", "for", "while", "match", "struct",
    "impl", "trait", "interface", "extends", "private", "final", "new",
    "self", "this", "true", "false", "none", "null",
]
EXTS = ["py", "java", "rs", "md"]
LANGS = {"py": "python", "java": "java", "rs": "rust", "md": "markdown"}
DIRS = ["core", "util", "io", "net", "test"]


def vocab() -> list[str]:
    return [f"tok{k}" for k in range(VOCAB_SIZE)] + KEYWORDS


def zipf_probs(n: int, alpha: float = 1.2) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-alpha)
    return p / p.sum()


def generate(n_docs: int, seed: int = SEED) -> pd.DataFrame:
    """The base corpus (no edge docs) as a pandas frame."""
    rng = np.random.RandomState(seed)
    words = np.array(vocab())
    probs = zipf_probs(len(words))
    cdf = np.cumsum(probs)

    doc_len = rng.randint(5, 401, size=n_docs)
    total = int(doc_len.sum())
    # one draw for every token in the corpus
    tok_idx = np.searchsorted(cdf, rng.random_sample(total), side="right")
    tok_idx = np.clip(tok_idx, 0, len(words) - 1)
    toks = words[tok_idx]
    offsets = np.concatenate([[0], np.cumsum(doc_len)])

    ext_idx = rng.randint(0, len(EXTS), size=n_docs)
    dir_idx = rng.randint(0, len(DIRS), size=n_docs)
    line_break = rng.randint(4, 13, size=n_docs)  # tokens per line

    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        repo = f"repo-{i % 7}"
        ext = EXTS[ext_idx[i]]
        path = f"src/{DIRS[dir_idx[i]]}/{'f' + format(i, 'x')}_{i}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
        dtoks = toks[offsets[i]:offsets[i + 1]]
        lb = line_break[i]
        lines = [" ".join(dtoks[j:j + lb]) for j in range(0, len(dtoks), lb)]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(LANGS[ext])
        contents.append("\n".join(lines))
    return pd.DataFrame({
        "repo": repos, "path": paths, "commit": commits,
        "lang": langs, "content": contents,
    })


def edge_docs() -> pd.DataFrame:
    """FIXTURES.md §1.1 — the semantics-pinning edge cases E1..E9."""
    rows = []

    def add(name: str, content: str, repo: str = "repo-edge"):
        path = f"edge/{name}.txt"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()[:12]
        rows.append((repo, path, commit, "text", content))

    add("E1_empty", "")
    add("E2_freq_saturation", " ".join(["tok3"] * 300))
    add("E3_long_token", "x" * 300)
    add("E4_case_folding", "Foo FOO foo fOO")
    add("E5_uax29", "a1b2 3.14 foo_bar foo-bar x+y")
    # E6/E7: identical content, different repos => land in different
    # partitions; score tie must break toward the lower doc_id.
    add("E6_tie_a", "tie tok5 tok5 breaker", repo="repo-0")
    add("E7_tie_b", "tie tok5 tok5 breaker", repo="repo-6")
    for n in (1, 39, 40, 41, 255, 256):
        add(f"E8_len_{n}", " ".join(["tok9"] * n))
    # E9: hot term spanning many 128-doc blocks
    for j in range(80):
        add(f"E9_hot_{j:02d}", " ".join(["tok0"] * 125), repo=f"repo-{j % 7}")
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def t_small() -> pd.DataFrame:
    return pd.concat([generate(200), edge_docs()], ignore_index=True)


def t_med() -> pd.DataFrame:
    return pd.concat([generate(20_000), edge_docs()], ignore_index=True)


def bench_corpus(n_docs: int = 200_000) -> pd.DataFrame:
    return generate(n_docs)


def write_corpus_parquet(spark, n_docs: int, path: str,
                         n_partitions: int = 64) -> str:
    """Generate a corpus IN PARALLEL with Spark and write it as parquet
    (the driver-side :func:`generate` loop is fine to ~200k docs; this
    scales to millions).  Deterministic per partition:
    RandomState(42 + first_id % 100003)."""
    from typing import Iterator

    def gen_chunk(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        words = np.array(vocab())
        cdf = np.cumsum(zipf_probs(len(words)))
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(SEED + int(ids[0]) % 100003)
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
                ext = EXTS[i % len(EXTS)]
                path_ = f"src/{DIRS[i % len(DIRS)]}/f{i:x}_{i}.{ext}"
                commit = hashlib.sha1(f"{repo}/{path_}".encode()).hexdigest()[:12]
                rows.append((repo, path_, commit, LANGS[ext],
                             " ".join(toks[offsets[j]:offsets[j + 1]])))
            yield pd.DataFrame(rows, columns=["repo", "path", "commit",
                                              "lang", "content"])

    (spark.range(0, n_docs, 1, n_partitions)
     .mapInPandas(gen_chunk, "repo string, path string, commit string, "
                             "lang string, content string")
     .write.mode("overwrite").parquet(path))
    return path


# ---------------------------------------------------------------------------
# reference query set (FIXTURES.md §2): 30 fixed queries
# ---------------------------------------------------------------------------

def reference_queries() -> list[tuple[int, str, str]]:
    """(query_id, query, type). AND queries use '+t1 +t2' syntax; mixed
    use '+must should'; plain terms are SHOULD (Lucene default OR)."""
    q = []
    i = 0
    # 10 single-term: hot / mid / rare / keywords / absent
    for t in ["tok0", "tok1", "tok7", "tok42", "tok123", "tok321",
              "tok499", "def", "return", "tok17"]:
        q.append((i, t, "term")); i += 1
    # 10 OR of 2-4 terms
    for t in ["tok0 tok499", "tok1 tok2", "tok5 tok55 tok155",
              "def class return", "tok3 tok33 tok333 tok133",
              "import tok10", "tok21 tok210", "fn let mut",
              "tok4 tok44 tok444", "tok8 tok88 tok188 tok288"]:
        q.append((i, t, "or")); i += 1
    # 6 AND of 2-3 terms
    for t in ["+tok0 +tok1", "+tok2 +tok5", "+def +return",
              "+tok1 +tok3 +tok7", "+tok10 +tok20", "+tok0 +tok9 +tok12"]:
        q.append((i, t, "and")); i += 1
    # 2 mixed must/should
    for t in ["+tok1 tok250", "+tok0 tok2 tok7"]:
        q.append((i, t, "mixed")); i += 1
    # 2 with an absent term
    for t in ["zzz_absent tok5", "+tok1 qqq_missing"]:
        q.append((i, t, "partial-miss")); i += 1
    return q
