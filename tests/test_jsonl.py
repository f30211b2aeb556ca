"""JSONL/NDJSON source (sources/jsonl.py): parse, envelope, rank and
build-equivalence semantics."""

import gzip
import os

import pyarrow as pa
import pytest

import ray.data as rd


def test_parse_jsonl_plain_and_gzip(tmp_path):
    from search_engine_ray.sources.jsonl import parse_jsonl, write_jsonl

    rows = [
        {"url": "http://a", "title": "T", "text": "hello world"},
        {"text": "no url or title"},
        {"url": "http://c", "text": ""},
    ]
    p = str(tmp_path / "x.jsonl")
    write_jsonl(p, rows, compress=False)
    with open(p, "rb") as f:
        t = parse_jsonl(f.read())
    assert t.column("text").to_pylist() == ["hello world", "no url or title", ""]
    assert t.column("url").to_pylist() == ["http://a", None, "http://c"]
    assert t.column("title").to_pylist() == ["T", None, None]

    pg = str(tmp_path / "x.jsonl.gz")
    write_jsonl(pg, rows, compress=True)
    with open(pg, "rb") as f:
        raw = f.read()
    assert raw[:2] == b"\x1f\x8b"
    tg = parse_jsonl(raw)
    assert tg.equals(t)


def test_parse_jsonl_custom_fields_and_empty():
    from search_engine_ray.sources.jsonl import parse_jsonl

    t = parse_jsonl(
        b'{"content": "abc", "id": "d1"}\n',
        text_field="content",
        url_field="id",
        title_field=None,
    )
    assert t.column("text").to_pylist() == ["abc"]
    assert t.column("url").to_pylist() == ["d1"]
    assert t.column("title").to_pylist() == [None]
    assert parse_jsonl(b"").num_rows == 0
    assert parse_jsonl(b"\n\n").num_rows == 0


def test_jsonl_pages_envelope_rank_and_url_synthesis(ray_session, tmp_path):
    from search_engine_ray.sources.jsonl import jsonl_pages, write_jsonl

    a = str(tmp_path / "a.jsonl")
    b = str(tmp_path / "b.jsonl.gz")
    write_jsonl(a, [{"url": "http://a0", "title": "TA", "text": "alpha"}])
    write_jsonl(b, [{"text": "beta"}, {"url": "http://b1", "text": "gamma"}],
                compress=True)
    out = jsonl_pages([a, b], rank_stride=100).to_pandas().sort_values("rank")
    # file order is sorted canon paths: a.jsonl -> 0, b.jsonl.gz -> 1
    assert out["rank"].tolist() == [0, 100, 101]
    assert out["url"].tolist() == ["http://a0", "jsonl://1/0", "http://b1"]
    assert out["html"].iloc[0] == (
        b"<html><head><title>TA</title></head><body>alpha</body></html>"
    )
    assert out["html"].iloc[1] == (
        b"<html><head><title></title></head><body>beta</body></html>"
    )


def test_jsonl_pages_duplicate_files_refused(ray_session, tmp_path):
    from search_engine_ray.sources.jsonl import jsonl_pages, write_jsonl

    p = str(tmp_path / "d.jsonl")
    write_jsonl(p, [{"text": "x"}])
    with pytest.raises(ValueError, match="duplicate"):
        jsonl_pages([p, p])


def test_jsonl_build_serves_identically_to_parquet(ray_session, tmp_path):
    """The e2e contract the jsonl_index_search oracle pins: JSONL
    round-trip of the documents table builds an index that answers the
    conjunctive query identically to the direct parquet build."""
    import pyarrow.parquet as pq

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.jsonl import jsonl_pages, write_jsonl

    sf = "/root/testdata/sf0.001"
    tbl = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    tbl = tbl.sort_by("doc_id")
    rows = [
        {"url": f"doc://{i}", "text": t}
        for i, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
    ]
    p = str(tmp_path / "docs.jsonl.gz")
    write_jsonl(p, rows, compress=True)
    out = str(tmp_path / "idx")
    config = EngineConfig()
    build_index(jsonl_pages([p]), out, config, doc_id_mode="rank", resume=False)
    got = sorted(
        r.doc_id
        for r in SegmentSearcher(out, config).search("table query", max_count=100)
    )

    import duckdb

    want = [
        r[0]
        for r in duckdb.connect()
        .execute(
            f"""
            SELECT doc_id FROM (
              SELECT doc_id FROM (
                SELECT DISTINCT doc_id, term FROM (
                  SELECT doc_id,
                         unnest(list_filter(string_split(text, ' '),
                                            x -> x <> '')) AS term
                  FROM read_parquet('{sf}/documents.parquet'))
                WHERE term IN ('table', 'query'))
              GROUP BY doc_id HAVING count(*) = 2
              ORDER BY doc_id LIMIT 100)
            """
        )
        .fetchall()
    ]
    assert got == want and len(got) > 0
