"""Wiki-abstract XML source (reference demo's input format, demo.ts:16-60):
parse -> pages schema -> full build with demo preset -> search."""

import pyarrow as pa
import pytest

import ray.data as rd

XML_A = b"""<feed>
<doc>
<title>Wikipedia: Anarchism</title>
<url>https://en.wikipedia.org/wiki/Anarchism</url>
<abstract>Anarchism is a political philosophy and movement</abstract>
</doc>
<doc>
<title>Wikipedia: Albedo</title>
<url>https://en.wikipedia.org/wiki/Albedo</url>
<abstract>Albedo is the fraction of sunlight &amp; radiation reflected</abstract>
</doc>
<doc>
<title>Wikipedia: Broken</title>
<url>https://en.wikipedia.org/wiki/Broken</url>
<abstract>has a pipe | so the skip filter drops it</abstract>
</doc>
<doc>
<title>Wikipedia: NoUrl</title>
<abstract>no url at all</abstract>
</doc>
</feed>
"""

XML_B = b"""<feed>
<doc>
<title>Wikipedia: Python</title>
<url>https://en.wikipedia.org/wiki/Python</url>
<abstract>Python is a programming language with philosophy of readability</abstract>
</doc>
</feed>
"""


@pytest.fixture()
def xml_files(tmp_path):
    a = tmp_path / "abstract1.xml"
    b = tmp_path / "abstract2.xml"
    a.write_bytes(XML_A)
    b.write_bytes(XML_B)
    return [str(a), str(b)]


def test_parse_abstract_xml():
    from search_engine_ray.sources.wiki_xml import parse_abstract_xml

    docs = parse_abstract_xml(XML_A)
    assert len(docs) == 3  # no-url doc dropped
    assert docs[0]["title"] == "Wikipedia: Anarchism"
    assert docs[1]["abstract"] == "Albedo is the fraction of sunlight & radiation reflected"


def test_xml_to_index_end_to_end(ray_session, tmp_path, xml_files):
    from search_engine_ray.config import DEMO_TITLE_STRIP_PREFIX, EngineConfig
    from search_engine_ray.pipelines.build import build_index
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.wiki_xml import wiki_abstract_pages
    from search_engine_ray.state.segments import SegmentReader

    pages = wiki_abstract_pages(xml_files)
    config = EngineConfig(title_strip_prefix=DEMO_TITLE_STRIP_PREFIX)
    out = str(tmp_path / "xmlidx")
    res = build_index(
        pages, out, config, doc_id_mode="rank", skip_filter=True, resume=False
    )
    assert res.n_docs == 3  # pipe-doc skipped, no-url dropped at parse
    reader = SegmentReader(out)
    titles = {d.title for d in reader.fetch_docs(list(reader.all_doc_ids())).values()}
    assert titles == {"Anarchism", "Albedo", "Python"}  # M6 strip applied
    s = SegmentSearcher(out, config)
    hits = s.search_bm25("philosophy", k=10, mode="or")
    assert {r.doc_id for r in hits} and len(hits) == 2  # Anarchism + Python
    # ranks unique across shards (stride spacing)
    ids = sorted(reader.all_doc_ids())
    assert len(ids) == len(set(ids)) == 3
