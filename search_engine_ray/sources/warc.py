"""WARC / WET crawl-archive source — ingestion for the Common-Crawl-shaped
pages table the engine's input_hint pins (url, warc_ts, html, rank).

The reference ingests a wiki-abstract XML dump (demo.ts:16-60); a real
web corpus arrives as WARC archives (ISO 28500 — response records hold an
HTTP response whose body is the page HTML) or the derived WET text files
(conversion records hold extracted plain text). This module maps both to
the same pages schema the build consumes, so `warc_pages(files) →
build_index(...)` is a complete crawl-to-index path.

Ray-native shape mirrors ``wiki_xml``: FILES are the parallel unit
(Common Crawl ships ~1 GB segment files, pre-split exactly the way a
``read_binary_files`` fan-out wants); each file is parsed with one
C-speed bytes scan (find/slice on Content-Length boundaries — no per-line
Python, no regex backtracking). Gzip (including the multi-member
per-record gzipping Common Crawl uses) is detected by magic bytes and
decompressed whole-file.

Records without a WARC-Target-URI and record types other than
response/conversion (request, metadata, warcinfo, ...) are skipped.
``rank = file_index * rank_stride + in-file sequence`` — unique and
reproducible given a fixed file list, same contract as
``wiki_abstract_pages``.
"""

from __future__ import annotations

import gzip
import os
import zlib

import numpy as np
import pyarrow as pa

import ray.data as rd

_CRLF2 = b"\r\n\r\n"


def canon_path(p: str) -> str:
    """Canonical form for matching caller file paths against the paths Ray
    returns from ``read_binary_files(include_paths=True)`` — Ray strips
    the scheme ('file:///x/a' comes back as '/x/a') and normalizes."""
    if "://" in p[:16]:
        p = p.split("://", 1)[1]
    return os.path.normpath(p)


def _parse_headers(block: bytes) -> dict[bytes, bytes]:
    headers: dict[bytes, bytes] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode Transfer-Encoding: chunked framing (hex size line + CRLF per
    chunk, 0-size terminator). Malformed framing returns what decoded so
    far plus the remainder — never raises."""
    out: list[bytes] = []
    pos = 0
    while pos < len(body):
        eol = body.find(b"\r\n", pos)
        if eol == -1:
            out.append(body[pos:])
            break
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            out.append(body[pos:])
            break
        if size == 0:
            break
        out.append(body[eol + 2 : eol + 2 + size])
        pos = eol + 2 + size + 2  # skip chunk payload + trailing CRLF
    return b"".join(out)


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload — Transfer-Encoding: chunked is
    de-framed and Content-Encoding: gzip/deflate decompressed (Common
    Crawl response records store the raw wire bytes, which use both).
    Raw payload when there is no HTTP envelope (some writers store bare
    content in response records). Decode failures fall back to the
    undecoded body rather than raising (the strict-envelope extract
    downstream drops undecodable pages per-record)."""
    if payload[:5] not in (b"HTTP/", b"http/"):
        return payload
    sep = payload.find(_CRLF2)
    if sep == -1:
        return payload
    headers = _parse_headers(payload[:sep])
    body = payload[sep + 4 :]
    if b"chunked" in headers.get(b"transfer-encoding", b"").lower():
        body = _dechunk(body)
    enc = headers.get(b"content-encoding", b"").lower()
    try:
        if enc in (b"gzip", b"x-gzip"):
            body = gzip.decompress(body)
        elif enc == b"deflate":
            try:
                body = zlib.decompress(body)
            except zlib.error:  # raw deflate (no zlib wrapper) also occurs
                body = zlib.decompress(body, -zlib.MAX_WBITS)
    except Exception:  # noqa: BLE001 — keep the undecoded body
        pass
    return body


def parse_warc(data: bytes) -> list[dict]:
    """All response/conversion records of one WARC/WET file →
    [{url, warc_ts, html}] (html = HTTP body for response records, the
    plain-text payload for conversion records). One linear scan; record
    boundaries come from Content-Length, never from searching the payload
    (payloads may contain anything, including 'WARC/1.0')."""
    if data[:2] == b"\x1f\x8b":  # gzip magic; handles multi-member streams
        data = gzip.decompress(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start == -1:
            break
        hdr_end = data.find(_CRLF2, start)
        if hdr_end == -1:
            break
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            # malformed record: resync at the next record marker
            pos = start + 5
            continue
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rtype = headers.get(b"warc-type", b"")
        url = headers.get(b"warc-target-uri", b"")
        if not url or rtype not in (b"response", b"conversion"):
            continue
        body = _http_body(payload) if rtype == b"response" else payload
        out.append(
            {
                "url": url.decode("utf-8", errors="replace"),
                "warc_ts": headers.get(b"warc-date", b"").decode("ascii", "replace"),
                "html": body,
                "is_conversion": rtype == b"conversion",
            }
        )
    return out


def warc_pages(
    file_paths: list[str],
    rank_stride: int = 10_000_000,
    wrap_conversion: bool = True,
) -> rd.Dataset:
    """pages-schema Dataset (url, warc_ts, html, rank) from WARC/WET files.

    ``wrap_conversion``: WET conversion payloads are plain text with no
    markup; wrapping them in the standard html envelope routes them
    through the build's tested extract path (byte-identical text
    round-trip) instead of needing a parallel text branch. The wrap is
    gated on the RECORD TYPE (conversion), never content sniffing —
    response-record bodies pass through untouched whatever they contain
    (BOM-prefixed HTML, JSON, plain text); non-envelope bodies are then
    dropped per-record by the strict extract, the ingestion-skip
    semantics.

    Memory: each task holds ONE file decompressed (~4 GB for a standard
    1 GB Common Crawl segment), so peak worker heap = read concurrency ×
    decompressed size. Ship crawl archives at the standard ~1 GB shard
    size; on small-memory workers cap the read stage's concurrency rather
    than re-splitting files.
    """
    order = {c: i for i, c in enumerate(sorted(canon_path(p) for p in file_paths))}
    if len(order) != len(file_paths):
        # two spellings of one file would share a stride base -> dup doc_ids
        raise ValueError("file_paths contains duplicate files (after canon)")

    def extract_file(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list = []
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
            for i, rec in enumerate(parse_warc(data)):
                body = rec["html"]
                if wrap_conversion and rec["is_conversion"]:
                    body = (
                        b"<html><head><title></title></head><body>"
                        + body
                        + b"</body></html>"
                    )
                urls.append(rec["url"])
                ts.append(rec["warc_ts"] or None)
                htmls.append(body)
                ranks.append(base + i)
        # ISO-8601 Zulu (the WARC-Date mandated form); numpy deprecated
        # tz-suffix parsing, so the 'Z' is stripped (WARC-Date is always
        # UTC). Unparseable/absent dates become null, never an error.
        def _np_ts(t):
            try:
                return np.datetime64(t.rstrip("Z") if t else "NaT", "us")
            except ValueError:
                return np.datetime64("NaT", "us")

        ts_arr = pa.array(np.array([_np_ts(t) for t in ts], dtype="datetime64[us]"))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts_arr,
                "html": pa.array(htmls, pa.binary()),
                "rank": pa.array(ranks, pa.int64()),
            }
        )

    return rd.read_binary_files(file_paths, include_paths=True).map_batches(
        extract_file, batch_format="pyarrow", batch_size=1
    )


def write_warc(path: str, records: list[dict], compress: bool = False) -> None:
    """Minimal WARC writer (test fixture / round-trip oracle): records are
    dicts with type ('response'|'conversion'|'request'|...), url, date,
    and payload bytes; response payloads get an HTTP/1.1 200 envelope."""
    chunks: list[bytes] = []
    for rec in records:
        payload = rec["payload"]
        if rec["type"] == "response":
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
            )
        hdr = (
            b"WARC/1.0\r\n"
            + b"WARC-Type: " + rec["type"].encode() + b"\r\n"
            + (
                b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n"
                if rec.get("url")
                else b""
            )
            + b"WARC-Date: " + rec.get("date", "2024-01-01T00:00:00Z").encode() + b"\r\n"
            + b"Content-Length: " + str(len(payload)).encode() + b"\r\n"
            + b"\r\n"  # blank line terminates the header block
        )
        chunks.append(hdr + payload + _CRLF2)
    blob = b"".join(chunks)
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
