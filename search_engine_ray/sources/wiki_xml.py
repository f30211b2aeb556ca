"""Wiki-abstract XML dump source — the reference demo's ACTUAL input
(demo.ts:16-60 parses enwiki-latest-abstract.xml with a streaming XML
parser): ``<feed><doc><title/><url/><abstract/></doc>...</feed>``.

Ray-native shape: FILES are the parallel unit (``read_binary_files`` ->
per-file ``<doc>`` extraction with compiled regexes over the whole file
string — C-speed, no per-row Python). The real dumps ship pre-split
(enwiki-latest-abstract1.xml ... abstract27.xml), which is exactly the
sharding this reader wants; a single monolithic dump should be split
first.

Output matches the input_hint pages schema (url, html, rank): title and
abstract are re-wrapped in the standard html envelope so the build's
tested extract path (and its skip rules / M6 title strip) applies
unchanged. rank = file_index * rank_stride + in-file sequence — unique and
reproducible given a fixed file list, mirroring the demo's insertion
counter at shard granularity.
"""

from __future__ import annotations

import html
import re

import pyarrow as pa

import ray.data as rd

_DOC_RE = re.compile(rb"<doc>(.*?)</doc>", re.DOTALL)
_FIELD_RES = {
    "title": re.compile(rb"<title>(.*?)</title>", re.DOTALL),
    "url": re.compile(rb"<url>(.*?)</url>", re.DOTALL),
    "abstract": re.compile(rb"<abstract>(.*?)</abstract>", re.DOTALL),
}


def _unescape(raw: bytes) -> str:
    # XML predefined entities (+ numeric refs); the reference's sax parser
    # decodes these before handing the node over
    return html.unescape(raw.decode("utf-8", errors="replace"))


def parse_abstract_xml(data: bytes) -> list[dict]:
    """All <doc> elements of one dump file -> [{title, url, abstract}].
    Docs missing a url are dropped (unaddressable); missing title/abstract
    become '' (the skip filter handles empty abstracts, demo.ts:118-123)."""
    out = []
    for m in _DOC_RE.finditer(data):
        body = m.group(1)
        fields = {}
        for name, rx in _FIELD_RES.items():
            fm = rx.search(body)
            fields[name] = _unescape(fm.group(1)) if fm else ""
        if not fields["url"]:
            continue
        out.append(fields)
    return out


def wiki_abstract_pages(
    file_paths: list[str], rank_stride: int = 10_000_000
) -> rd.Dataset:
    """pages-schema Dataset (url, html, rank) from wiki-abstract XML files.

    ``rank_stride`` spaces each file's rank range so ranks stay unique
    across shards without any coordination (no shard holds more docs than
    the stride)."""
    from search_engine_ray.sources.warc import canon_path

    order = {c: i for i, c in enumerate(sorted(canon_path(p) for p in file_paths))}
    if len(order) != len(file_paths):
        # two spellings of one file would share a stride base -> dup doc_ids
        raise ValueError("file_paths contains duplicate files (after canon)")

    def extract_file(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        htmls: list[bytes] = []
        ranks: list[int] = []
        for path, data in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            fidx = order.get(canon_path(path))
            if fidx is None:
                # a silent 0 would collide doc_ids across files — refuse
                raise ValueError(
                    f"read path {path!r} matches no input file (canon mismatch)"
                )
            base = fidx * rank_stride
            for i, d in enumerate(parse_abstract_xml(data)):
                urls.append(d["url"])
                htmls.append(
                    (
                        f"<html><head><title>{d['title']}</title></head>"
                        f"<body>{d['abstract']}</body></html>"
                    ).encode("utf-8")
                )
                ranks.append(base + i)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "html": pa.array(htmls, pa.binary()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )

    return rd.read_binary_files(file_paths, include_paths=True).map_batches(
        extract_file, batch_format="pyarrow", batch_size=1
    )
