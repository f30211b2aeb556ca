"""Driver-contract emulation: every queries() entry runs at sf0.01; entries
with an oracle must match DuckDB row-for-row (order-insensitive, like the
driver's value-hash compare)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"


def _to_df(obj) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings", "events", "lineitem", "orders", "customer"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e


def test_entry_smoke(contract):
    out = _to_df(contract.entry())
    assert len(out) >= 0
    assert list(out.columns) == ["doc_id", "url", "score"]


def test_all_queries_have_unique_names(contract):
    qs = contract.queries()
    assert len(qs) >= 20
    for name in contract.oracle_sql():
        assert name in qs, f"oracle {name} has no query"


@pytest.mark.parametrize(
    "name",
    [
        "token_count",
        "term_df",
        "top_terms",
        "quality",
        "fingerprint",
        "skip_filter",
        "extract_roundtrip",
        "postings_pairs",
        "exact_dedup",
        "search_and",
        "bm25_topk",
        "ngram_jaccard",
        "ann_cosine_topk",
        "embedding_neardup",
        "wand_or_topk",
        "search_phrase",
        "lang_id",
        "minhash_pairs",
        "simhash",
        "simhash_neardup",
        "batch_bm25",
        "token_count_bpe",
        "url_dedup",
        "tumbling_window",
        "window_users",
        "sessionize",
        "asof_join",
        "range_join",
        "repetition",
        "decontaminate",
        "hash_sample",
        "clean_corpus",
        "dup_ngram_stats",
        "unigram_lm",
        "quantile_bucket",
        "pii_redact",
        "stratified_sample",
        "segment_revenue",
        "pricing_summary",
        "json_field_stats",
    ],
)
def test_query_matches_oracle(contract, con, name):
    got = _normalize(_to_df(contract.queries()[name](SF)))
    want = _normalize(con.sql(contract.oracle_sql()[name]).df())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert sorted(got.columns) == sorted(want.columns), name
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.to_numpy(dtype=float), w.to_numpy(dtype=float), atol=1e-9, err_msg=f"{name}.{col}"
            )
        else:
            assert g.astype(str).tolist() == w.astype(str).tolist(), f"{name}.{col}"


@pytest.mark.parametrize(
    "name",
    [
        "winnow_fp",
        "embedding_neardup_lsh",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "media_features",
        "semdedup",
    ],
)
def test_rows_only_queries_run(contract, name):
    out = _to_df(contract.queries()[name](SF))
    assert len(out) >= 0


def test_embedding_neardup_empty_pairs_keeps_schema(contract):
    """Zero-pair corpora (e.g. sf0.001) must still yield the (vec_a, vec_b)
    schema — Ray's aggregate drops it on empty results (regression)."""
    out = _to_df(contract.queries()["embedding_neardup"]("/root/testdata/sf0.001"))
    assert list(out.columns) == ["vec_a", "vec_b"]
    assert str(out["vec_a"].dtype) == "int64" or out["vec_a"].dtype.name.startswith(
        "Int64"
    ) or len(out) > 0
