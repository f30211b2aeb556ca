"""SegmentSearcher (lazy, on-disk) must equal the eager Searcher and the
LocalEngine oracle on every conformance corpus."""

import pytest

import ray.data as rd

from search_engine_ray.local_engine import LocalEngine
from search_engine_ray.pipelines.build import build_index
from search_engine_ray.pipelines.serving import SegmentSearcher
from search_engine_ray.sources.fixtures import CORPORA, pages_table
from tests.test_build_ray import QUERIES


@pytest.mark.parametrize("name", list(CORPORA))
def test_segment_searcher_matches_oracle(name, ray_session, tmp_path):
    docs, config = CORPORA[name]
    out = str(tmp_path / name)
    build_index(
        rd.from_arrow(pages_table(docs)), out, config, doc_id_mode="replay", resume=False
    )
    seg = SegmentSearcher(out, config)
    local = LocalEngine(config)
    for title, text, url, rank in docs:
        local.add(title, text, url, rank)
    for q in QUERIES[name]:
        got = [(r.url, r.introduction) for r in seg.search(q)]
        want = [(r.url, r.introduction) for r in local.search(q)]
        assert got == want, f"{name}: {q!r}"


def test_bm25_modes(ray_session, tmp_path):
    docs, config = CORPORA["planets"]
    out = str(tmp_path / "modes")
    build_index(
        rd.from_arrow(pages_table(docs)), out, config, doc_id_mode="replay", resume=False
    )
    seg = SegmentSearcher(out, config)
    both = seg.search_bm25("gas giant", k=5, mode="and")
    assert {r.url.rsplit("/", 1)[-1] for r in both} == {"Jupiter", "Saturn"}
    disj = seg.search_bm25("sixth brightest", k=5, mode="or")
    assert len(disj) == 2  # OR reaches both docs even though AND would be empty
    assert seg.search_bm25("sixth brightest", k=5, mode="and") == []
    # phrase gate applies in BM25 mode too
    assert seg.search_bm25('"planet sixth"', k=5, mode="and") == []
    hits = seg.search_bm25('"sixth planet"', k=5, mode="and")
    assert [r.url.rsplit("/", 1)[-1] for r in hits] == ["Saturn"]


def test_min_window_span_units():
    import math

    from search_engine_ray.functions.intersect import min_window_span

    assert min_window_span([]) == math.inf
    assert min_window_span([[1, 5], []]) == math.inf
    assert min_window_span([[3, 9]]) == 0.0
    assert min_window_span([[0, 10], [4]]) == 4  # any order: 4-0
    assert min_window_span([[10], [4]]) == 6  # reversed order counts too
    # classic 3-list sweep: best cover is (9, 10, 11)
    assert min_window_span([[1, 9], [4, 10, 20], [11]]) == 2
    assert min_window_span([[5], [5], [5]]) == 0.0


def test_search_near_matches_sql(ray_session, tmp_path):
    """Proximity (slop) search must equal the positions-join SQL on the
    real documents table, and nest between phrase and AND semantics."""
    import duckdb
    import pyarrow as pa

    from search_engine_ray.config import EngineConfig

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "near_idx")

    def to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
                "html": pa.array(
                    [
                        f"<html><head><title></title></head><body>{t}</body></html>".encode()
                        for t in texts
                    ],
                    pa.binary(),
                ),
                "rank": pa.array(ids, pa.int64()),
            }
        )

    docs = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    build_index(
        docs.map_batches(to_pages, batch_format="pyarrow"),
        out, EngineConfig(), doc_id_mode="rank", resume=False,
    )
    seg = SegmentSearcher(out, EngineConfig())
    got = seg.search_near("table scan", slop=4, max_count=100)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(
        """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        pos AS (SELECT doc_id, i AS p, ts[i] AS term
                FROM t, unnest(range(1, len(ts) + 1)) AS u(i)),
        a AS (SELECT doc_id, p FROM pos WHERE term = 'table'),
        b AS (SELECT doc_id, p FROM pos WHERE term = 'scan')
        SELECT doc_id FROM (
          SELECT DISTINCT a.doc_id FROM a JOIN b USING (doc_id)
          WHERE abs(a.p - b.p) <= 4)
        ORDER BY doc_id LIMIT 100
        """
    ).df()
    assert got == want["doc_id"].tolist()

    # semantics nest: phrase ("table scan" adjacent in order) ⊆ near ⊆ AND.
    # The compat search's intersect caps candidates at 100 (reference
    # semantics), so compare within its covered doc_id range only.
    phrase_ids = sorted(r.doc_id for r in seg.search('"table scan"', max_count=10**6))
    and_ids = sorted(r.doc_id for r in seg.search("table scan", max_count=10**6))
    near_all = seg.search_near("table scan", slop=4, max_count=10**6)
    assert set(phrase_ids) <= set(near_all)
    hi = max(and_ids)
    assert {d for d in near_all if d <= hi} <= set(and_ids)
    # slop=1 over two terms == adjacent in EITHER order, so still ⊇ phrase
    near1 = seg.search_near("table scan", slop=1, max_count=10**6)
    assert set(phrase_ids) <= set(near1) <= set(near_all)
    # unknown term -> empty
    assert seg.search_near("table zzznotaword", slop=4) == []


def test_batch_search_matches_single(ray_session, tmp_path):
    """The actor-pool batch-serving pipeline must return exactly the
    single-searcher results for every query."""
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import (
        SegmentSearcher,
        batch_search_bm25_ds,
    )
    from search_engine_ray.sources.synth import synth_zipf_table

    config = EngineConfig()
    out = str(tmp_path / "batchidx")
    build_index(
        rd.from_arrow(synth_zipf_table(300, n_tokens=25, vocab=200)),
        out, config, doc_id_mode="rank", resume=False,
    )
    queries = ["w0 w1", "w2 w3", "w1 w5", "w0 w2 w4"]
    qds = rd.from_items(
        [{"query_id": i, "query": q} for i, q in enumerate(queries)]
    )
    got = (
        batch_search_bm25_ds(qds, out, config, k=10, mode="and", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    s = SegmentSearcher(out, config)
    want = []
    for i, q in enumerate(queries):
        for r in s.search_bm25(q, k=10, mode="and"):
            want.append((i, r.doc_id, round(r.score, 6)))
    assert list(map(tuple, got[["query_id", "doc_id", "score"]].values)) == want


def test_cli_pipeline_writes_parquet(ray_session, tmp_path):
    """`pipeline NAME --out DIR` runs a queries() entry and writes
    partitioned parquet (the resumable batch-output path)."""
    import pyarrow.parquet as pq

    from search_engine_ray.cli import main

    out = str(tmp_path / "q")
    rc = main(
        ["pipeline", "token_count", "--sf-dir", "/root/testdata/sf0.001",
         "--out", out]
    )
    assert rc == 0
    t = pq.read_table(out)
    assert t.num_rows == 500
    assert set(t.column_names) == {"doc_id", "n_tokens"}
    rc = main(["pipeline", "not_a_pipeline", "--out", out])
    assert rc == 2


def test_cli_pipeline_resume_marker(ray_session, tmp_path, capsys):
    """A finished `pipeline --out DIR` run leaves a _DONE marker; re-running
    with the same identity skips, --force recomputes (clean directory),
    and a different identity recomputes instead of serving stale rows."""
    import json

    import pyarrow.parquet as pq

    from search_engine_ray.cli import main

    out = str(tmp_path / "q")
    argv = ["pipeline", "token_count", "--sf-dir", "/root/testdata/sf0.001",
            "--out", out]
    assert main(argv) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["rows"] == 500 and "skipped" not in first

    assert main(argv) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["skipped"] is True and second["rows"] == 500

    assert main(argv + ["--force"]) == 0
    forced = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "skipped" not in forced and forced["rows"] == 500
    # no double-counted part files, marker ignored by the parquet reader
    assert pq.read_table(out).num_rows == 500

    # different query into the same dir: identity mismatch -> recompute
    assert main(["pipeline", "term_df", "--sf-dir", "/root/testdata/sf0.001",
                 "--out", out]) == 0
    other = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "skipped" not in other and other["pipeline"] == "term_df"


def test_cli_pipeline_marker_preset_identity(ray_session, tmp_path, capsys):
    """A crawl-preset marker must NOT satisfy a --preset exact run of the
    same requested name (different resolved pipeline)."""
    import json

    from search_engine_ray.cli import main

    out = str(tmp_path / "q2")
    base = ["pipeline", "ngram_containment", "--sf-dir",
            "/root/testdata/sf0.001", "--out", out]
    assert main(base) == 0  # crawl preset -> crawl_containment
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["pipeline"] == "crawl_containment"

    assert main(base + ["--preset", "exact"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["pipeline"] == "ngram_containment" and "skipped" not in rec

    assert main(base + ["--preset", "exact"]) == 0  # now it may skip
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["skipped"] is True and rec["pipeline"] == "ngram_containment"


def test_rrf_fuse_semantics(ray_session):
    """RRF fusion: doc in both lists beats single-list docs at similar
    ranks; absent docs contribute 0; tie-break on doc_id; ranks 1-based."""
    import ray.data as rd

    from search_engine_ray.pipelines.query import rrf_fuse_ds

    a = rd.from_items([{"doc_id": d, "rank": i + 1} for i, d in enumerate([7, 3, 9])])
    b = rd.from_items([{"doc_id": d, "rank": i + 1} for i, d in enumerate([3, 5, 7])])
    out = rrf_fuse_ds([a, b], k=60, topk=10).to_pandas()
    assert out["fused_rank"].tolist() == list(range(1, len(out) + 1))
    scores = dict(zip(out["doc_id"], out["rrf"]))
    # doc 3: 1/62 + 1/61; doc 7: 1/61 + 1/63; doc 9: 1/63; doc 5: 1/62
    assert abs(scores[3] - round(1 / 62 + 1 / 61, 6)) < 1e-9
    assert abs(scores[7] - round(1 / 61 + 1 / 63, 6)) < 1e-9
    assert abs(scores[9] - round(1 / 63, 6)) < 1e-9
    assert out["doc_id"].tolist()[0] == 3  # highest fused score
    assert set(out["doc_id"]) == {3, 5, 7, 9}
    # tie-break: two docs with mirrored single-list ranks tie on score
    c = rd.from_items([{"doc_id": 11, "rank": 1}, {"doc_id": 4, "rank": 2}])
    d = rd.from_items([{"doc_id": 4, "rank": 1}, {"doc_id": 11, "rank": 2}])
    out2 = rrf_fuse_ds([c, d], k=60, topk=10).to_pandas()
    assert out2["doc_id"].tolist() == [4, 11]  # equal rrf -> doc_id asc


def test_bm25_ndcg_properties(ray_session):
    """NDCG@10 eval harness invariants at sf0.001: 10 ranked rows,
    cumulative DCG non-decreasing, 0 < ndcg10 <= 1, grades capped at 5."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    df = entry.queries()["bm25_ndcg"]("/root/testdata/sf0.001")
    assert df["rank"].tolist() == list(range(1, 11))
    assert (df["dcg_cum"].diff().fillna(df["dcg_cum"].iloc[0]) >= 0).all()
    assert df["rel"].between(0, 5).all()
    nd = df["ndcg10"].iloc[0]
    assert (df["ndcg10"] == nd).all() and 0 < nd <= 1
