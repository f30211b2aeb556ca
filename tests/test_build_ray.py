"""Ray Data build pipeline == sequential LocalEngine oracle, on every
conformance corpus, plus determinism across parallelism levels and
resume-from-manifest behavior (FIXTURES §5, SURVEY §5)."""

import os

import pytest

import ray.data as rd

from search_engine_ray.local_engine import LocalEngine
from search_engine_ray.pipelines.build import build_index, make_searcher
from search_engine_ray.sources.fixtures import CORPORA, pages_table

QUERIES = {
    "planets": [
        "brightest",
        "giant",
        "Solar",
        "ancient civilizations",
        "planet sixth",
        '"planet sixth"',
        '"after Jupiter"',
        '"from the Sun" Moon',
        'moon "from the Sun"',
        'fifth "from the sun"',
        '"moon and venus"',
    ],
    "carl_friedrich": ['"carl friedrich"', "friedrich", "german"],
    "carl_friedrich_binary": ['"carl friedrich"'],
    "haber": ["process", "haber", "haber process"],
    "star": ["star", "trek", "star trek"],
}


def _local(name):
    docs, config = CORPORA[name]
    eng = LocalEngine(config)
    for title, text, url, rank in docs:
        eng.add(title, text, url, rank)
    return eng


@pytest.mark.parametrize("name", list(CORPORA))
def test_ray_build_matches_local(name, ray_session, tmp_path):
    docs, config = CORPORA[name]
    pages = rd.from_arrow(pages_table(docs))
    out = str(tmp_path / name)
    res = build_index(pages, out, config, doc_id_mode="replay", resume=False)
    assert res.n_docs == len(docs)

    searcher = make_searcher(out, config)
    local = _local(name)
    for q in QUERIES[name]:
        got = searcher.search(q)
        want = local.search(q)
        assert [(r.url, r.introduction, r.title, r.doc_id) for r in got] == [
            (r.url, r.introduction, r.title, r.doc_id) for r in want
        ], f"query {q!r} on {name}"


def test_parallelism_invariance(ray_session, tmp_path):
    """Same results at different block counts (parallelism levels)."""
    docs, config = CORPORA["carl_friedrich"]
    results = []
    for blocks in (1, 7):
        pages = rd.from_arrow(pages_table(docs)).repartition(blocks)
        out = str(tmp_path / f"b{blocks}")
        build_index(pages, out, config, doc_id_mode="replay", resume=False)
        s = make_searcher(out, config)
        results.append([(r.url, r.introduction) for r in s.search('"carl friedrich"')])
    assert results[0] == results[1]
    assert len(results[0]) == 6


def test_salted_build_identical(ray_session, tmp_path):
    """Head-term salting must not change any query result."""
    from dataclasses import replace

    docs, config = CORPORA["planets"]
    salted = replace(config, salt_shift=0), replace(config, salt_shift=1, salt_df_threshold=1)
    outs = []
    for i, cfg in enumerate(salted):
        pages = rd.from_arrow(pages_table(docs))
        out = str(tmp_path / f"s{i}")
        build_index(pages, out, cfg, doc_id_mode="replay", resume=False)
        s = make_searcher(out, cfg)
        outs.append(
            {q: [(r.url, r.introduction) for r in s.search(q)] for q in QUERIES["planets"]}
        )
    assert outs[0] == outs[1]


def test_resume_skips_completed_stages(ray_session, tmp_path):
    docs, config = CORPORA["star"]
    pages = rd.from_arrow(pages_table(docs))
    out = str(tmp_path / "resume")
    build_index(pages, out, config, doc_id_mode="replay", fingerprint="fp1")
    # marker file: a re-run that skips stages must not rewrite docs/
    marker = os.path.join(out, "docs", "MARKER")
    open(marker, "w").close()
    build_index(pages, out, config, doc_id_mode="replay", fingerprint="fp1")
    assert os.path.exists(marker)
    # changed fingerprint -> rebuild
    build_index(pages, out, config, doc_id_mode="replay", fingerprint="fp2")
    assert not os.path.exists(marker)


def test_rank_mode_unique_ranks(ray_session, tmp_path):
    """Scale path: doc_id = rank (unique by construction)."""
    docs, config = CORPORA["carl_friedrich"]  # ranks 1..16, unique
    pages = rd.from_arrow(pages_table(docs))
    out = str(tmp_path / "rankmode")
    build_index(pages, out, config, doc_id_mode="rank", resume=False)
    s = make_searcher(out, config)
    r = s.search('"carl friedrich"')
    # replay of unique non-colliding ranks assigns doc_id = rank, so results
    # must equal the replay-mode/LocalEngine output
    want = _local("carl_friedrich").search('"carl friedrich"')
    assert [(x.url, x.introduction) for x in r] == [
        (x.url, x.introduction) for x in want
    ]


def test_segment_reader_lazy_lookup(ray_session, tmp_path):
    from search_engine_ray.state.segments import SegmentReader

    docs, config = CORPORA["planets"]
    pages = rd.from_arrow(pages_table(docs))
    out = str(tmp_path / "lazy")
    build_index(pages, out, config, doc_id_mode="replay", resume=False)
    reader = SegmentReader(out)
    post = reader.lookup(["giant", "jupiter", "nosuchterm"])
    assert set(post) == {"giant", "jupiter"}
    assert post["giant"]["doc_ids"].tolist() == [0, 1]
    fetched = reader.fetch_docs([0])
    assert fetched[0].title == "Jupiter"
    assert "planet" in [w.lower() for w in fetched[0].words]


def test_build_url_dedup(ray_session, tmp_path):
    """A corpus with duplicate urls builds with demo's skip policy
    (demo.ts:129-131): one row per url survives, winner = min
    (warc_ts, add_order, rank); results match a LocalEngine fed only the
    winners (the reference engine throws on a duplicate add,
    engine.ts:56-58, so its driver must skip)."""
    import pyarrow as pa

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.state.segments import SegmentReader

    docs, config = CORPORA["planets"]
    tbl = pages_table(docs)
    # duplicate the first row with a LATER warc_ts and add_order: loser
    dup = tbl.slice(0, 1)
    dup = dup.set_column(
        dup.schema.get_field_index("warc_ts"),
        "warc_ts",
        pa.array([dup.column("warc_ts")[0].as_py().replace(year=2030)], pa.timestamp("us")),
    )
    dup = dup.set_column(
        dup.schema.get_field_index("add_order"), "add_order",
        pa.array([100], pa.int64()),
    )
    dup = dup.set_column(
        dup.schema.get_field_index("rank"), "rank", pa.array([7], pa.int64())
    )
    with_dups = pa.concat_tables([tbl, dup])
    out = str(tmp_path / "urldedup")
    res = build_index(
        rd.from_arrow(with_dups), out, config, doc_id_mode="replay", resume=False
    )
    assert res.n_docs == len(docs)
    reader = SegmentReader(out)
    import json, os
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert m["skipped_duplicate_urls"] == 1
    s = make_searcher(out, config)
    local = _local("planets")
    for q in QUERIES["planets"]:
        got = [(r.url, r.introduction) for r in s.search(q)]
        want = [(r.url, r.introduction) for r in local.search(q)]
        assert got == want, q


def test_skip_counters_in_manifest(ray_session, tmp_path):
    """A5/M8: dropped rows are counted per stage and recorded in both
    manifests; the demo preset's title prefix strip applies in the build."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import DEMO_TITLE_STRIP_PREFIX, EngineConfig
    from search_engine_ray.sources.fixtures import wrap_html
    from search_engine_ray.state.segments import SegmentReader

    rows = {
        "url": pa.array(["u1", "u2", "u3", "u4"], pa.string()),
        "html": pa.array(
            [
                wrap_html("Wikipedia: Alpha", "alpha text body"),
                b"<not html at all>",
                wrap_html("Beta", "bad|pipe text"),
                wrap_html("Gamma", "gamma text body"),
            ],
            pa.binary(),
        ),
        "rank": pa.array([1, 2, 3, 4], pa.int64()),
    }
    out = str(tmp_path / "counted")
    config = EngineConfig(title_strip_prefix=DEMO_TITLE_STRIP_PREFIX)
    build_index(
        rd.from_arrow(pa.table(rows)), out, config,
        doc_id_mode="rank", skip_filter=True, resume=False,
    )
    with open(f"{out}/manifest.json") as f:
        manifest = json.load(f)
    assert manifest["skipped"] == {
        "extract_unparseable": 1,
        "skip_filter": 1,
        "duplicate_urls": 0,
    }
    assert manifest["n_docs"] == 2
    reader = SegmentReader(out)
    titles = {d.title for d in reader.fetch_docs([1, 4]).values()}
    assert titles == {"Alpha", "Gamma"}


def test_fused_build_matches_two_stage(ray_session, tmp_path):
    """fuse=True must produce search-identical results to the two-stage
    build, with manifests carrying exact stats and skip counters."""
    import json

    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.synth import synth_zipf_table

    config = EngineConfig(salt_shift=8, salt_df_threshold=50)
    table = synth_zipf_table(800, n_tokens=30, vocab=400)
    out_a = str(tmp_path / "two_stage")
    out_b = str(tmp_path / "fused")
    ra = build_index(rd.from_arrow(table), out_a, config, doc_id_mode="rank", resume=False)
    rb = build_index(
        rd.from_arrow(table), out_b, config, doc_id_mode="rank", resume=False, fuse=True
    )
    assert rb.n_docs == ra.n_docs == 800
    assert abs(rb.avgdl - ra.avgdl) < 1e-9
    sa, sb = SegmentSearcher(out_a, config), SegmentSearcher(out_b, config)
    for q, mode in [("w0 w1", "or"), ("w1 w2", "and"), ("w0 w3 w7", "or")]:
        got = [(r.doc_id, round(r.score, 9)) for r in sb.search_bm25(q, k=10, mode=mode)]
        want = [(r.doc_id, round(r.score, 9)) for r in sa.search_bm25(q, k=10, mode=mode)]
        assert got == want, (q, mode)
    got = [r.doc_id for r in sb.search("w0 w1")]
    want = [r.doc_id for r in sa.search("w0 w1")]
    assert got == want
    with open(f"{out_b}/manifest.json") as f:
        m = json.load(f)
    assert m["fused"] is True and m["n_docs"] == 800


def test_fused_build_empty_after_filters(ray_session, tmp_path):
    """Fused build where every row is filtered out must still produce a
    valid (empty) index with exact zero stats and full skip accounting."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.state.segments import SegmentReader

    rows = {
        "url": pa.array(["u1", "u2"], pa.string()),
        "html": pa.array([b"<garbage>", b"<also garbage>"], pa.binary()),
        "rank": pa.array([1, 2], pa.int64()),
    }
    out = str(tmp_path / "fused_empty")
    res = build_index(
        rd.from_arrow(pa.table(rows)), out, EngineConfig(),
        doc_id_mode="rank", resume=False, fuse=True,
    )
    assert res.n_docs == 0
    reader = SegmentReader(out)
    assert reader.manifest["n_docs"] == 0
    assert reader.manifest["skipped"]["extract_unparseable"] == 2
    assert reader.lookup(["anything"]) == {}


def test_url_dedup_ds_public(ray_session):
    """url_dedup_ds (the public D2 operator): one survivor per url, winner
    = min add_order, non-duplicated rows untouched."""
    import pyarrow as pa

    from search_engine_ray.pipelines.build import url_dedup_ds

    tbl = pa.table(
        {
            "url": pa.array(["a", "b", "a", "c", "b", "a"], pa.string()),
            "add_order": pa.array([5, 1, 2, 9, 4, 8], pa.int64()),
        }
    )
    kept = url_dedup_ds(rd.from_arrow(tbl)).take_all()
    got = sorted((r["url"], r["add_order"]) for r in kept)
    assert got == [("a", 2), ("b", 1), ("c", 9)]


def test_fused_build_output_names_content_derived(ray_session, tmp_path):
    """Retry-idempotence rests on content-derived file names (stem = min
    doc_id of the batch — no uuids/timestamps), so a retried emit task,
    which re-receives the SAME input bundle, overwrites its own partial
    output instead of duplicating postings. Global batching (how blocks
    bundle into tasks) is NOT deterministic across runs, so what must
    hold is: every file name is purely content-derived and self-
    describing (stem == min doc_id inside the file), and the union of
    docs is identical across independent builds."""
    import os
    import re

    import pyarrow.parquet as _pq
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.sources.synth import synth_zipf_table

    config = EngineConfig(salt_shift=0)
    table = synth_zipf_table(600, n_tokens=25, vocab=300)

    coverages = []
    for tag in ("a", "b"):
        out = str(tmp_path / tag)
        build_index(
            rd.from_arrow(table), out, config,
            doc_id_mode="rank", resume=False, fuse=True,
        )
        docs_dir = os.path.join(out, "docs")
        ids = []
        for name in sorted(os.listdir(docs_dir)):
            m = re.fullmatch(r"part-b(\d{14})\.parquet", name)
            assert m, f"non-content-derived docs file name: {name}"
            t = _pq.read_table(os.path.join(docs_dir, name), columns=["doc_id"])
            file_ids = t.column("doc_id").to_pylist()
            assert min(file_ids) == int(m.group(1)), name
            ids.extend(file_ids)
        coverages.append(sorted(ids))
    assert coverages[0] == coverages[1]
    assert len(coverages[0]) == 600


def test_url_dedup_distributed_winner_resolution(ray_session):
    """Heavy duplication (every url duplicated 1-8x, multi-column winner
    key): results match a pandas groupby lexicographic-min reference, the
    skip count is exact, and — the r2 VERDICT contract — no row data is
    materialized on the driver (the winner resolution is a tree-reduce of
    numpy partials; statically, _dedup_duplicate_urls contains no
    take_all)."""
    import inspect

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from search_engine_ray.pipelines import build as build_mod
    from search_engine_ray.pipelines.build import _dedup_duplicate_urls

    src = inspect.getsource(build_mod._dedup_duplicate_urls)
    # the only take_all left collects candidate dup HASHES (uint64 rows,
    # the same data later broadcast) — never url/key row data
    assert src.count("take_all") == 1
    assert "dup_hash_rows" in src.split("take_all")[0].rsplit("\n", 5)[-1] or (
        "dup_hash_rows" in src[: src.index("take_all")]
    )
    assert "by_url" not in src  # the r2 driver-side dict is gone

    rng = np.random.default_rng(11)
    n_urls = 400
    reps = rng.integers(1, 9, size=n_urls)
    urls = np.repeat([f"https://ex.com/p{i}" for i in range(n_urls)], reps)
    n = len(urls)
    perm = rng.permutation(n)
    df = pd.DataFrame(
        {
            "url": urls[perm],
            "warc_ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10, size=n), unit="D"),
            "add_order": np.arange(n, dtype=np.int64)[perm],
            "rank": rng.integers(1, 100, size=n).astype(np.int64),
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False).set_column(
        1, "warc_ts", pa.Table.from_pandas(df, preserve_index=False)
        .column("warc_ts").cast(pa.timestamp("us"))
    )
    kept_ds, n_skipped = _dedup_duplicate_urls(
        rd.from_arrow(tbl).repartition(7)
    )
    got = (
        kept_ds.to_pandas()
        .sort_values(["url", "add_order"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["url", "warc_ts", "add_order", "rank"])
        .groupby("url", as_index=False)
        .first()
        .sort_values(["url", "add_order"])
        .reset_index(drop=True)
    )
    assert n_skipped == n - n_urls
    assert len(got) == n_urls
    pd.testing.assert_frame_equal(
        got[["url", "add_order", "rank"]], want[["url", "add_order", "rank"]]
    )


def test_skip_consecutive_dup_urls(ray_session):
    """demo.ts:129-131 parity: only ADJACENT (by add order) duplicate urls
    are skipped; non-adjacent repeats pass through."""
    import pyarrow as pa

    from search_engine_ray.pipelines.build import skip_consecutive_dup_urls_ds

    urls = ["a", "a", "b", "a", "c", "c", "c", "d"]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "add_order": pa.array(range(8), pa.int64()),
            "rank": pa.array(range(8), pa.int64()),
        }
    )
    kept = (
        skip_consecutive_dup_urls_ds(rd.from_arrow(t).repartition(3))
        .to_pandas()
        .sort_values("add_order")
    )
    assert kept["add_order"].tolist() == [0, 2, 3, 4, 7]
    assert kept["url"].tolist() == ["a", "b", "a", "c", "d"]
    # no-dup corpus passes through unchanged
    t2 = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(6)], pa.string()),
            "add_order": pa.array(range(6), pa.int64()),
        }
    )
    kept2 = skip_consecutive_dup_urls_ds(rd.from_arrow(t2)).to_pandas()
    assert sorted(kept2["add_order"].tolist()) == list(range(6))


def test_winner_reduce_associative_hypothesis():
    """_winner_reduce is the single combiner used by both per-batch
    partials and the tree-reduce merge — verify (split → reduce → merge)
    equals (reduce whole) on randomized inputs, any split point."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_ray.pipelines.build import _winner_reduce

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 7),   # h1 (small range -> many collisions)
                st.integers(0, 3),   # h2
                st.integers(-5, 5),  # k0
                st.integers(-5, 5),  # k1
            ),
            min_size=1,
            max_size=40,
        ),
        st.integers(1, 39),
    )
    def check(rows, split):
        split = min(split, len(rows) - 1) or 1
        def arrs(rs):
            a = np.array(rs, dtype=np.int64).reshape(len(rs), 4)
            return (
                a[:, 0].astype(np.uint64),
                a[:, 1].astype(np.uint64),
                np.ones(len(rs), np.int64),
                [a[:, 2], a[:, 3]],
            )

        def as_sets(res):
            h1, h2, cnt, ks = res
            return {
                (int(a), int(b)): (int(c), int(k0), int(k1))
                for a, b, c, k0, k1 in zip(h1, h2, cnt, ks[0], ks[1])
            }

        whole = as_sets(_winner_reduce(*arrs(rows)))
        l = _winner_reduce(*arrs(rows[:split])) if rows[:split] else None
        r = _winner_reduce(*arrs(rows[split:])) if rows[split:] else None
        parts = [p for p in (l, r) if p is not None]
        h1 = np.concatenate([p[0] for p in parts])
        h2 = np.concatenate([p[1] for p in parts])
        cnt = np.concatenate([p[2] for p in parts])
        ks = [np.concatenate([p[3][i] for p in parts]) for i in range(2)]
        merged = as_sets(_winner_reduce(h1, h2, cnt, ks))
        assert merged == whole

    check()


def test_fused_emit_retry_overwrites_not_duplicates(ray_session, tmp_path):
    """Retry idempotence of the map-side shuffle write: building the SAME
    corpus into the same out_dir twice (resume=False — simulates every
    emit task re-running) leaves identical docs and bucket contents, not
    duplicated postings; search results are identical."""
    import ray.data as rd

    from search_engine_ray.config import EngineConfig
    from search_engine_ray.pipelines.serving import SegmentSearcher
    from search_engine_ray.sources.synth import synth_zipf_table

    config = EngineConfig()
    table = synth_zipf_table(120, n_tokens=20, vocab=150)
    out = str(tmp_path / "retry")
    r1 = build_index(rd.from_arrow(table), out, config, doc_id_mode="rank",
                     resume=False, fuse=True)
    s1 = [(r.doc_id, round(r.score, 9))
          for r in SegmentSearcher(out, config).search_bm25("w0 w1", k=20, mode="or")]
    r2 = build_index(rd.from_arrow(table), out, config, doc_id_mode="rank",
                     resume=False, fuse=True)
    s2 = [(r.doc_id, round(r.score, 9))
          for r in SegmentSearcher(out, config).search_bm25("w0 w1", k=20, mode="or")]
    assert r1.n_docs == r2.n_docs == 120
    assert s1 == s2


def test_url_dedup_disk_shuffle_scratch_under_out_dir(
    ray_session, tmp_path, monkeypatch
):
    """Crawl-scale url dedup (disk bucket shuffle fallback): same winners
    as the tree-reduce path, and the shuffle scratch lands under the
    build's out_dir (node-shared storage) — not node-local /tmp — when
    SE_RAY_SHUFFLE_BASE is unset. Forced by shrinking the tree-reduce
    row cap to 0."""
    import os

    import pyarrow as pa
    import ray.data as rd

    import search_engine_ray.pipelines.build as build_mod
    from search_engine_ray.pipelines.build import _dedup_duplicate_urls

    monkeypatch.delenv("SE_RAY_SHUFFLE_BASE", raising=False)

    urls = [f"http://e/{i % 7}" for i in range(40)]  # every url duplicated
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "title": pa.array([f"t{i}" for i in range(40)], pa.string()),
                "rank": pa.array(list(range(40)), pa.int64()),
            }
        )
    )
    want = sorted(
        {u: min(i for i, x in enumerate(urls) if x == u) for u in urls}.values()
    )

    kept_tree, n_skip_tree = _dedup_duplicate_urls(pages)
    assert sorted(r["rank"] for r in kept_tree.take_all()) == want
    assert n_skip_tree == 40 - 7

    scratch_root = str(tmp_path / "outidx")
    os.makedirs(scratch_root, exist_ok=True)
    seen_dirs: list[str] = []
    real_rmtree = build_mod.fsio.rmtree

    def spy_rmtree(path: str) -> None:
        seen_dirs.append(path)
        real_rmtree(path)

    monkeypatch.setattr(build_mod, "_URL_DEDUP_TREE_MAX_ROWS", 0)
    monkeypatch.setattr(build_mod.fsio, "rmtree", spy_rmtree)
    kept_disk, n_skip_disk = _dedup_duplicate_urls(
        pages, scratch_base=build_mod.fsio.join(scratch_root, "url_dedup_shuffle")
    )
    assert sorted(r["rank"] for r in kept_disk.take_all()) == want
    assert n_skip_disk == n_skip_tree
    shuffle_paths = [p for p in seen_dirs if "url_dedup_shuffle" in p]
    assert shuffle_paths and all(p.startswith(scratch_root) for p in shuffle_paths)


def test_url_dedup_multinode_without_shared_scratch_raises(
    ray_session, monkeypatch
):
    """On a multi-node cluster the /tmp disk-shuffle last resort would
    silently MISS duplicates (each node sees only its own bucket files) —
    the fallback must refuse instead when neither scratch_base nor
    SE_RAY_SHUFFLE_BASE provides node-shared storage."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    import search_engine_ray.pipelines.build as build_mod
    from search_engine_ray.pipelines.build import _dedup_duplicate_urls

    monkeypatch.delenv("SE_RAY_SHUFFLE_BASE", raising=False)
    monkeypatch.setattr(build_mod, "_URL_DEDUP_TREE_MAX_ROWS", 0)
    monkeypatch.setattr(
        build_mod.ray, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["http://e/0", "http://e/0"], pa.string()),
                "title": pa.array(["a", "b"], pa.string()),
                "rank": pa.array([0, 1], pa.int64()),
            }
        )
    )
    with pytest.raises(RuntimeError, match="node-shared scratch"):
        _dedup_duplicate_urls(pages)
