"""Driver-contract smoke: entry() runs, every queries() entry has the
right shape, and a fast subset matches its DuckDB oracle at sf0.001
(the full suite is exercised by tools/check_contract.py)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders"]:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        return f"{v:.9g}" if isinstance(v, float) and not math.isnan(v) else str(v)

    return sorted(tuple(cell(r[i]) for i in idx) for r in rows)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "score", "rank"} <= set(df.columns)


def test_every_query_has_shape():
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(osql) <= set(qs)
    # only the explicitly-approximate/stubbed/non-SQL ops lack an oracle
    assert set(qs) - set(osql) == {"sim_ann_topk", "sim_ivf_ann_topk",
                                   "sim_hnsw_topk", "sim_hnsw_quant_topk",
                                   "mm_image_features", "mm_audio_features",
                                   "ft_highlight"}


@pytest.mark.parametrize("name", [
    "ft_term_topk", "ft_and_topk", "ft_facet_lang",
    "dedup_exact_groups", "sim_cosine_topk", "text_fingerprint",
])
def test_subset_matches_oracle(spark, con, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF)
    scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = con.execute(osql[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows)
    assert sorted(scols) == sorted(ocols)
    assert _norm(scols, srows) == _norm(ocols, orows)
