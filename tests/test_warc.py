"""WARC/WET crawl-archive source: parse → pages schema → full build →
search (the crawl-native analogue of the wiki-XML ingestion test)."""

import gzip

import pytest

import ray.data as rd

HTML_A = b"<html><head><title>Anarchism</title></head><body>Anarchism is a political philosophy and movement</body></html>"
HTML_B = b"<html><head><title>Albedo</title></head><body>Albedo is the fraction of sunlight reflected</body></html>"
WET_TEXT = b"Python is a programming language with philosophy of readability"


def _records_a():
    return [
        {
            "type": "warcinfo",
            "url": "",
            "payload": b"software: test\r\n",
        },
        {
            "type": "response",
            "url": "https://example.com/anarchism",
            "date": "2024-03-01T12:00:00Z",
            "payload": HTML_A,
        },
        {
            "type": "request",  # must be skipped
            "url": "https://example.com/anarchism",
            "payload": b"GET /anarchism HTTP/1.1\r\n",
        },
        {
            "type": "response",
            "url": "https://example.com/albedo",
            "date": "2024-03-01T12:00:01Z",
            # payload that CONTAINS a fake record marker: boundaries must
            # come from Content-Length, not payload scanning
            "payload": HTML_B + b"\r\nWARC/1.0\r\nnot a record",
        },
    ]


def _records_b():
    return [
        {
            "type": "conversion",  # WET-style plain text
            "url": "https://example.com/python",
            "date": "2024-03-02T00:00:00Z",
            "payload": WET_TEXT,
        },
    ]


@pytest.fixture()
def warc_files(tmp_path):
    from search_engine_ray.sources.warc import write_warc

    a = tmp_path / "seg1.warc"
    b = tmp_path / "seg2.warc.gz"
    write_warc(str(a), _records_a())
    write_warc(str(b), _records_b(), compress=True)
    return [str(a), str(b)]


def test_parse_warc_plain_and_gzip(tmp_path):
    from search_engine_ray.sources.warc import parse_warc, write_warc

    a = tmp_path / "x.warc"
    write_warc(str(a), _records_a())
    recs = parse_warc(a.read_bytes())
    assert [r["url"] for r in recs] == [
        "https://example.com/anarchism",
        "https://example.com/albedo",
    ]
    # HTTP envelope stripped; payload containing 'WARC/1.0' intact
    assert recs[0]["html"] == HTML_A
    assert recs[1]["html"] == HTML_B + b"\r\nWARC/1.0\r\nnot a record"
    assert recs[0]["warc_ts"] == "2024-03-01T12:00:00Z"
    # multi-member gzip round-trips
    assert parse_warc(gzip.compress(a.read_bytes()))[0]["html"] == HTML_A


def test_warc_pages_schema(ray_session, warc_files):
    from search_engine_ray.sources.warc import warc_pages

    t = warc_pages(warc_files).to_pandas().sort_values("rank").reset_index(drop=True)
    assert list(t.columns) == ["url", "warc_ts", "html", "rank"]
    assert len(t) == 3
    assert str(t["warc_ts"].dtype).startswith("datetime64")
    assert t["warc_ts"].notna().all()
    # conversion text got the html envelope; response html untouched
    assert t.loc[2, "html"].startswith(b"<html><head><title></title>")
    assert WET_TEXT in t.loc[2, "html"]
    assert t.loc[0, "html"] == HTML_A
    # ranks unique, stride-spaced across files
    assert t["rank"].is_unique


def test_warc_to_index_end_to_end(ray_session, tmp_path, warc_files):
    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.warc import warc_pages
    from search_engine_ray.state.segments import SegmentReader

    pages = warc_pages(warc_files)
    config = EngineConfig()
    out = str(tmp_path / "warcidx")
    res = build_index(
        pages, out, config, doc_id_mode="rank", skip_filter=True, resume=False
    )
    # the albedo record's payload carries trailing junk after </html>
    # (the boundary fixture) -> it fails the strict envelope and is
    # dropped per-record, the reference's ingestion-skip semantics
    assert res.n_docs == 2
    reader = SegmentReader(out)
    titles = {d.title for d in reader.fetch_docs(list(reader.all_doc_ids())).values()}
    assert titles == {"Anarchism", ""}  # WET page has no title
    s = SegmentSearcher(out, config)
    hits = s.search_bm25("philosophy", k=10, mode="or")
    assert len(hits) == 2  # Anarchism + Python pages


def test_cli_build_warc_autodetect(ray_session, tmp_path, warc_files, capsys):
    """`build --input seg1.warc` autodetects the warc format end-to-end."""
    import json

    from search_engine_ray.cli import main

    out = str(tmp_path / "cliidx")
    rc = main(["build", "--input", warc_files[0], "--out", out, "--skip-filter"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_docs"] == 1  # albedo dropped (junk), seg1 has anarchism only


def test_warc_roundtrip_hypothesis(tmp_path):
    """write_warc -> parse_warc is lossless for arbitrary payload bytes —
    including payloads containing record markers, CRLF runs, and gzip
    magic — because boundaries come from Content-Length alone."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_ray.sources.warc import parse_warc, write_warc

    payloads = st.binary(min_size=0, max_size=2048)
    evil = st.sampled_from(
        [b"WARC/1.0\r\n", b"\r\n\r\n", b"\x1f\x8b", b"Content-Length: 0\r\n"]
    )
    payload = st.one_of(payloads, st.tuples(evil, payloads).map(lambda t: t[0] + t[1]))

    @settings(max_examples=50, deadline=None)
    @given(st.lists(payload, min_size=1, max_size=8), st.booleans())
    def run(ps, compress):
        recs = [
            {
                "type": "conversion",  # raw payload, no HTTP envelope
                "url": f"https://h.example/{i}",
                "date": "2024-01-01T00:00:00Z",
                "payload": p,
            }
            for i, p in enumerate(ps)
        ]
        f = tmp_path / "h.warc"
        write_warc(str(f), recs, compress=compress)
        got = parse_warc(f.read_bytes())
        assert [r["html"] for r in got] == ps
        assert [r["url"] for r in got] == [r["url"] for r in recs]

    run()


def test_http_body_chunked_and_gzip():
    """Real Common Crawl response records use chunked framing and gzip
    content encoding; both must decode to the page HTML."""
    import gzip as _gzip

    from search_engine_ray.sources.warc import _http_body

    html = b"<html><head><title>X</title></head><body>hello crawl</body></html>"
    # chunked: two chunks + terminator
    c1, c2 = html[:10], html[10:]
    chunked = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        + hex(len(c1))[2:].encode() + b"\r\n" + c1 + b"\r\n"
        + hex(len(c2))[2:].encode() + b"\r\n" + c2 + b"\r\n"
        + b"0\r\n\r\n"
    )
    assert _http_body(chunked) == html
    gzipped = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n" + _gzip.compress(html)
    )
    assert _http_body(gzipped) == html
    both = (
        b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
    )
    gz = _gzip.compress(html)
    both += hex(len(gz))[2:].encode() + b"\r\n" + gz + b"\r\n0\r\n\r\n"
    assert _http_body(both) == html
    # corrupt gzip falls back to the undecoded body, never raises
    bad = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\nnot gzip"
    assert _http_body(bad) == b"not gzip"


def test_response_bodies_never_wrapped(ray_session, tmp_path):
    """The html envelope wrap is gated on record TYPE: a BOM-prefixed or
    non-HTML response body passes through untouched (then dropped by the
    strict extract), never converted into a fake page."""
    from search_engine_ray.sources.warc import warc_pages, write_warc

    bom_html = b"\xef\xbb\xbf<html><head><title>B</title></head><body>b</body></html>"
    f = tmp_path / "bom.warc"
    write_warc(
        str(f),
        [
            {
                "type": "response",
                "url": "https://e.x/bom",
                "date": "2024-01-01T00:00:00Z",
                "payload": bom_html,
            },
            {
                "type": "response",
                "url": "https://e.x/json",
                "date": "2024-01-01T00:00:00Z",
                "payload": b'{"not": "html"}',
            },
        ],
    )
    t = warc_pages([str(f)]).to_pandas().sort_values("rank").reset_index(drop=True)
    assert t.loc[0, "html"] == bom_html  # untouched, no double envelope
    assert t.loc[1, "html"] == b'{"not": "html"}'


def test_warc_pages_nonnormalized_paths(ray_session, tmp_path):
    """Input paths that Ray normalizes before returning ('./sub/../x',
    'file://' scheme) must still map to their stride base — a mismatch
    must raise, never silently collide every file's ranks at base 0."""
    from search_engine_ray.sources.warc import canon_path, warc_pages, write_warc

    (tmp_path / "sub").mkdir()
    files = []
    for name in ("s1.warc", "s2.warc"):
        f = tmp_path / name
        write_warc(
            str(f),
            [
                {
                    "type": "conversion",
                    "url": f"https://e.x/{name}",
                    "date": "2024-01-01T00:00:00Z",
                    "payload": b"text " + name.encode(),
                }
            ],
        )
        # non-normalized spelling of the same file: <dir>/sub/../<name>
        files.append(str(tmp_path / "sub" / ".." / name))
    t = warc_pages(files).to_pandas()
    assert len(t) == 2 and t["rank"].is_unique
    assert set(t["rank"]) == {0, 10_000_000}  # stride-spaced, not both 0
    # scheme-stripping covers the URI form Ray hands back on some FSes
    assert canon_path("file:///a/b/../c.warc") == "/a/c.warc"


def test_duplicate_file_spellings_rejected(tmp_path):
    """Two spellings of one file would share a stride base (dup doc_ids);
    both sources refuse instead."""
    import pytest as _pytest

    from search_engine_ray.sources.warc import warc_pages, write_warc
    from search_engine_ray.sources.wiki_xml import wiki_abstract_pages

    f = tmp_path / "a.warc"
    write_warc(str(f), [])
    (tmp_path / "sub").mkdir()
    alias = str(tmp_path / "sub" / ".." / "a.warc")
    with _pytest.raises(ValueError, match="duplicate files"):
        warc_pages([str(f), alias])
    x = tmp_path / "a.xml"
    x.write_bytes(b"<feed></feed>")
    with _pytest.raises(ValueError, match="duplicate files"):
        wiki_abstract_pages([str(x), str(tmp_path / "sub" / ".." / "a.xml")])
