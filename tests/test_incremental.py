"""Incremental generations: base build + add_generation must be exactly
equivalent to a single build over the union (postings, WAND top-k, compat
search), plus duplicate-url policies."""

import numpy as np
import pytest

import ray.data as rd

from search_engine_ray.config import EngineConfig
from search_engine_ray.pipelines.build import add_generation, build_index
from search_engine_ray.pipelines.serving import SegmentSearcher
from search_engine_ray.sources.synth import HOT_TERM, synth_zipf_table
from search_engine_ray.state.segments import SegmentReader, generation_dirs


@pytest.fixture(scope="module")
def split_vs_full(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("incr")
    config = EngineConfig(block_size=32, salt_shift=8, salt_df_threshold=100)
    table = synth_zipf_table(1200, n_tokens=50, vocab=1500)
    full_out = str(base / "full")
    build_index(rd.from_arrow(table), full_out, config, doc_id_mode="rank", resume=False)

    incr_out = str(base / "incr")
    build_index(
        rd.from_arrow(table.slice(0, 700)), incr_out, config,
        doc_id_mode="rank", resume=False,
    )
    add_generation(incr_out, rd.from_arrow(table.slice(700)), config)
    return full_out, incr_out, config


def test_generation_layout(split_vs_full):
    full_out, incr_out, _ = split_vs_full
    assert len(generation_dirs(full_out)) == 1
    gens = generation_dirs(incr_out)
    assert len(gens) == 2
    assert gens[1].endswith("gen-0001")


def test_merged_stats_match(split_vs_full):
    full_out, incr_out, _ = split_vs_full
    rf, ri = SegmentReader(full_out), SegmentReader(incr_out)
    assert ri.manifest["n_docs"] == rf.manifest["n_docs"] == 1200
    assert abs(ri.manifest["avgdl"] - rf.manifest["avgdl"]) < 1e-9


def test_postings_identical(split_vs_full):
    full_out, incr_out, _ = split_vs_full
    rf, ri = SegmentReader(full_out), SegmentReader(incr_out)
    terms = [HOT_TERM, "w0", "w1", "w10", "w100", "w900"]
    pf, pi = rf.lookup(terms), ri.lookup(terms)
    assert set(pf) == set(pi)
    for t in pf:
        assert pf[t]["doc_ids"].tolist() == pi[t]["doc_ids"].tolist(), t
        assert pf[t]["tfs"].tolist() == pi[t]["tfs"].tolist(), t
        assert pf[t]["dls"].tolist() == pi[t]["dls"].tolist(), t
        # merged block metadata must dominate true scores (validity, not
        # equality — block partitioning may differ across paths)
        assert (np.diff(pi[t]["block_last"]) > 0).all() or len(pi[t]["block_last"]) <= 1


def test_search_identical(split_vs_full):
    full_out, incr_out, config = split_vs_full
    sf, si = SegmentSearcher(full_out, config), SegmentSearcher(incr_out, config)
    for q, mode in [
        (f"{HOT_TERM} w3", "or"),
        ("w0 w1", "and"),
        ("w10 w17 w44", "or"),
    ]:
        got = [(r.doc_id, round(r.score, 9)) for r in si.search_bm25(q, k=10, mode=mode)]
        want = [(r.doc_id, round(r.score, 9)) for r in sf.search_bm25(q, k=10, mode=mode)]
        assert got == want, (q, mode)
    for q in ["w0 w1", '"w0 w1"']:
        got = [(r.doc_id, r.introduction) for r in si.search(q)]
        want = [(r.doc_id, r.introduction) for r in sf.search(q)]
        assert got == want, q


def test_fetch_docs_across_generations(split_vs_full):
    _, incr_out, _ = split_vs_full
    ri = SegmentReader(incr_out)
    # pick one doc id from each half via urls
    docs = ri.fetch_docs(list(ri.all_doc_ids())[:5])
    assert len(docs) == 5


def test_duplicate_url_policies(ray_session, tmp_path):
    config = EngineConfig()
    table = synth_zipf_table(50, n_tokens=20, vocab=100)
    out = str(tmp_path / "dup")
    build_index(rd.from_arrow(table), out, config, doc_id_mode="rank", resume=False)
    # overlapping slice: urls 25..49 already indexed
    overlap = synth_zipf_table(75, n_tokens=20, vocab=100).slice(25)
    with pytest.raises(Exception, match="already in index"):
        add_generation(out, rd.from_arrow(overlap), config, on_duplicate="error")
    # skip mode: only the 25 new urls (50..74) are added
    res = add_generation(out, rd.from_arrow(overlap), config, on_duplicate="skip")
    assert res.n_docs == 25
    reader = SegmentReader(out)
    assert reader.manifest["n_docs"] == 75


def test_add_generation_requires_base(ray_session, tmp_path):
    with pytest.raises(ValueError, match="no existing index"):
        add_generation(
            str(tmp_path / "nope"),
            rd.from_arrow(synth_zipf_table(5, n_tokens=5, vocab=10)),
            EngineConfig(),
        )


def test_cross_generation_doc_id_uniqueness(ray_session, tmp_path):
    """Rank mode with colliding rank ranges must still produce globally
    unique doc_ids (rebase policy), and all added docs must be fetchable."""
    config = EngineConfig()
    table = synth_zipf_table(50, n_tokens=20, vocab=100)
    out = str(tmp_path / "uniq")
    build_index(rd.from_arrow(table), out, config, doc_id_mode="rank", resume=False)
    overlap = synth_zipf_table(75, n_tokens=20, vocab=100).slice(25)
    add_generation(out, rd.from_arrow(overlap), config, on_duplicate="skip")
    reader = SegmentReader(out)
    ids = []
    for sub in reader._subs:
        import pyarrow.parquet as pq
        t = pq.read_table(sub._docs_files, columns=["doc_id"])
        ids.extend(t.column("doc_id").to_pylist())
    assert len(ids) == 75
    assert len(set(ids)) == 75, "doc_ids must be globally unique across generations"
    # every doc fetchable under its unique id
    docs = reader.fetch_docs(ids)
    assert len(docs) == 75


def test_id_collision_error_policy(ray_session, tmp_path):
    config = EngineConfig()
    table = synth_zipf_table(40, n_tokens=20, vocab=100)
    out = str(tmp_path / "collide")
    build_index(rd.from_arrow(table), out, config, doc_id_mode="rank", resume=False)
    fresh = synth_zipf_table(80, n_tokens=20, vocab=100).slice(40)
    with pytest.raises(ValueError, match="overlaps existing doc_ids"):
        add_generation(
            out, rd.from_arrow(fresh), config,
            on_duplicate="skip", on_id_collision="error",
        )


def test_compaction_equivalence(split_vs_full, tmp_path):
    """compact() must fold all generations into ONE whose postings and
    search results are identical to the single-shot full build."""
    import shutil

    from search_engine_ray.pipelines.build import compact

    full_out, incr_out, config = split_vs_full
    cp = str(tmp_path / "compacted")
    shutil.copytree(incr_out, cp)
    res = compact(cp, config)
    assert res.n_docs == 1200
    assert len(generation_dirs(cp)) == 1
    rc = SegmentReader(cp)
    assert len(rc._subs) == 1, "post-compaction reader must see one sub-index"
    rf = SegmentReader(full_out)
    terms = [HOT_TERM, "w0", "w1", "w10", "w100", "w900"]
    pf, pc_ = rf.lookup(terms), rc.lookup(terms)
    assert set(pf) == set(pc_)
    for t in pf:
        assert pf[t]["doc_ids"].tolist() == pc_[t]["doc_ids"].tolist(), t
        assert pf[t]["tfs"].tolist() == pc_[t]["tfs"].tolist(), t
        assert pf[t]["dls"].tolist() == pc_[t]["dls"].tolist(), t
        assert (np.diff(pc_[t]["doc_ids"]) > 0).all()
    sf, sc = SegmentSearcher(full_out, config), SegmentSearcher(cp, config)
    for q, mode in [(f"{HOT_TERM} w3", "or"), ("w0 w1", "and"), ("w10 w17 w44", "or")]:
        got = [(r.doc_id, round(r.score, 9)) for r in sc.search_bm25(q, k=10, mode=mode)]
        want = [(r.doc_id, round(r.score, 9)) for r in sf.search_bm25(q, k=10, mode=mode)]
        assert got == want, (q, mode)
    for q in ["w0 w1", '"w0 w1"']:
        got = [(r.doc_id, r.introduction) for r in sc.search(q)]
        want = [(r.doc_id, r.introduction) for r in sf.search(q)]
        assert got == want, q
    # compacting an already-single-generation index is a no-op
    res2 = compact(cp, config)
    assert res2.timings.get("compact") == 0.0
    assert res2.n_docs == 1200


def test_compaction_multi_generation(ray_session, tmp_path):
    """Three generations, unsalted config: compaction merges doc stores and
    postings; every doc stays fetchable."""
    import shutil

    from search_engine_ray.pipelines.build import compact

    config = EngineConfig()
    table = synth_zipf_table(120, n_tokens=20, vocab=200)
    out = str(tmp_path / "multi")
    build_index(rd.from_arrow(table.slice(0, 40)), out, config, doc_id_mode="rank", resume=False)
    add_generation(out, rd.from_arrow(table.slice(40, 40)), config)
    add_generation(out, rd.from_arrow(table.slice(80)), config)
    assert len(generation_dirs(out)) == 3
    pre = SegmentSearcher(out, config)
    pre_res = [(r.doc_id, round(r.score, 9)) for r in pre.search_bm25("w0 w1", k=10, mode="or")]
    res = compact(out, config)
    assert res.n_docs == 120
    assert len(generation_dirs(out)) == 1
    reader = SegmentReader(out)
    assert reader.manifest["n_docs"] == 120
    docs = reader.fetch_docs(list(reader.all_doc_ids()))
    assert len(docs) == 120
    post = SegmentSearcher(out, config)
    post_res = [(r.doc_id, round(r.score, 9)) for r in post.search_bm25("w0 w1", k=10, mode="or")]
    assert post_res == pre_res


def test_build_sharded_resumable(ray_session, tmp_path):
    """Shard-resumable fused build: per-shard generations + compaction,
    search-equivalent to the single full build; a re-run after partial
    completion skips finished shards; a re-run after success is a no-op."""
    from search_engine_ray.pipelines.build import build_sharded

    config = EngineConfig()
    table = synth_zipf_table(150, n_tokens=20, vocab=200)
    shards = [
        ("s0", rd.from_arrow(table.slice(0, 50))),
        ("s1", rd.from_arrow(table.slice(50, 50))),
        ("s2", rd.from_arrow(table.slice(100))),
    ]
    full_out = str(tmp_path / "full")
    build_index(rd.from_arrow(table), full_out, config, doc_id_mode="rank", resume=False)

    out = str(tmp_path / "sharded")
    res = build_sharded(shards, out, config)
    assert res.n_docs == 150
    assert len(generation_dirs(out)) == 1  # compacted
    sf, ss = SegmentSearcher(full_out, config), SegmentSearcher(out, config)
    for q, mode in [("w0 w1", "or"), ("w1 w2", "and")]:
        got = [(r.doc_id, round(r.score, 9)) for r in ss.search_bm25(q, k=10, mode=mode)]
        want = [(r.doc_id, round(r.score, 9)) for r in sf.search_bm25(q, k=10, mode=mode)]
        assert got == want, (q, mode)
    # full re-run after success: no work, same answer
    res2 = build_sharded(shards, out, config)
    assert res2.timings.get("sharded") == 0.0
    assert res2.n_docs == 150


def test_compaction_mixed_salt_configs(ray_session, tmp_path):
    """Generations that disagree about a term's hotness (one salted, one
    not) must re-salt uniformly at compaction — the ascending-run invariant
    is checked by the merge itself (raises on violation)."""
    import shutil as _sh

    from search_engine_ray.pipelines.build import compact

    salted = EngineConfig(block_size=32, salt_shift=6, salt_df_threshold=10)
    unsalted = EngineConfig(block_size=32, salt_shift=0)
    table = synth_zipf_table(400, n_tokens=30, vocab=100)
    out = str(tmp_path / "mixed")
    # gen 0 salted (low threshold -> hot terms salted), gen 1 UNSALTED
    build_index(rd.from_arrow(table.slice(0, 200)), out, salted, doc_id_mode="rank", resume=False)
    add_generation(out, rd.from_arrow(table.slice(200)), unsalted)
    pre = SegmentSearcher(out, salted)
    pre_res = [(r.doc_id, round(r.score, 9)) for r in pre.search_bm25(f"{HOT_TERM} w1", k=10, mode="or")]
    res = compact(out, salted)  # compaction config decides re-salting
    assert res.n_docs == 400
    post = SegmentSearcher(out, salted)
    post_res = [(r.doc_id, round(r.score, 9)) for r in post.search_bm25(f"{HOT_TERM} w1", k=10, mode="or")]
    assert post_res == pre_res


def test_interleaved_rank_generations_unique_and_compact_equivalent(
    ray_session, tmp_path
):
    """The r2-VERDICT adversarial case: generation ranks that INTERLEAVE
    (disjoint even/odd — must pass through untouched, no rebase) and a
    third generation whose ranks COLLIDE outright (must rebase). After all
    three: doc_ids globally unique, every doc fetchable, and compaction
    preserves search results exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.pipelines.build import compact
    from search_engine_ray.pipelines.serving import SegmentSearcher

    config = EngineConfig()

    def with_ranks(table: pa.Table, ranks: np.ndarray) -> pa.Table:
        i = table.schema.get_field_index("rank")
        return table.set_column(i, "rank", pa.array(ranks, pa.int64()))

    base = synth_zipf_table(150, n_tokens=20, vocab=100, seed=3)
    # distinct urls per generation (url dup-skip must not interfere)
    def with_urls(table: pa.Table, tag: str) -> pa.Table:
        i = table.schema.get_field_index("url")
        urls = [f"https://ex.test/{tag}/{j}" for j in range(table.num_rows)]
        return table.set_column(i, "url", pa.array(urls, pa.string()))

    g_even = with_urls(with_ranks(base.slice(0, 50), np.arange(0, 100, 2)), "a")
    g_odd = with_urls(with_ranks(base.slice(50, 50), np.arange(1, 100, 2)), "b")
    g_coll = with_urls(with_ranks(base.slice(100, 50), np.arange(0, 50)), "c")

    out = str(tmp_path / "interleave")
    build_index(rd.from_arrow(g_even), out, config, doc_id_mode="rank", resume=False)
    add_generation(out, rd.from_arrow(g_odd), config, on_duplicate="skip")
    reader = SegmentReader(out)
    ids = []
    for sub in reader._subs:
        ids.extend(
            pq.read_table(sub._docs_files, columns=["doc_id"])
            .column("doc_id").to_pylist()
        )
    # interleaved-but-disjoint: NO rebase — original even/odd ids survive
    assert sorted(ids) == list(range(100))

    add_generation(out, rd.from_arrow(g_coll), config, on_duplicate="skip")
    reader = SegmentReader(out)
    ids = []
    for sub in reader._subs:
        ids.extend(
            pq.read_table(sub._docs_files, columns=["doc_id"])
            .column("doc_id").to_pylist()
        )
    assert len(ids) == 150
    assert len(set(ids)) == 150, "colliding generation must rebase"
    assert reader.fetch_docs(ids) and len(reader.fetch_docs(ids)) == 150

    s_pre = SegmentSearcher(out, config)
    pre = [
        (r.doc_id, round(r.score, 9))
        for r in s_pre.search_bm25("w0 w1 w2", k=30, mode="or")
    ]
    res = compact(out, config)
    assert res.n_docs == 150
    s_post = SegmentSearcher(out, config)
    post = [
        (r.doc_id, round(r.score, 9))
        for r in s_post.search_bm25("w0 w1 w2", k=30, mode="or")
    ]
    assert pre == post


def test_cli_lifecycle_build_add_compact_stats_bm25(ray_session, tmp_path, capsys):
    """The reference lifecycle (engine.ts:43-99 repeated adds + query)
    driven entirely through the CLI entry point: build -> add -> compact
    -> stats -> bm25."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from search_engine_ray.cli import main

    def pages_file(path, rows):
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([r[0] for r in rows], pa.string()),
                    "html": pa.array(
                        [
                            f"<html><head><title>{r[1]}</title></head>"
                            f"<body>{r[2]}</body></html>".encode()
                            for r in rows
                        ],
                        pa.binary(),
                    ),
                    "rank": pa.array(range(len(rows)), pa.int64()),
                }
            ),
            str(path),
        )

    p1 = tmp_path / "p1.parquet"
    p2 = tmp_path / "p2.parquet"
    pages_file(p1, [("http://a", "A", "alpha philosophy tokens"),
                    ("http://b", "B", "beta different words")])
    pages_file(p2, [("http://c", "C", "gamma philosophy appended"),
                    ("http://a", "DUP", "already indexed url")])
    idx = str(tmp_path / "idx")

    assert main(["build", "--input", str(p1), "--out", idx]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["n_docs"] == 2

    assert main(["add", "--index", idx, "--input", str(p2)]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_docs_added"] == 1  # duplicate url skipped

    assert main(["compact", "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_docs"] == 3

    assert main(["stats", "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["generations"] and rec["total_bytes"] > 0

    assert main(["bm25", "--index", idx, "--query", "philosophy", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert "http://a" in out and "http://c" in out and "http://b" not in out

    # delete -> stats shows the pending tombstone -> query excludes the doc
    assert main(["delete", "--index", idx, "--url", "http://a"]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_deleted"] == 1

    assert main(["stats", "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_tombstones"] == 1 and rec["tombstone_bytes"] > 0

    assert main(["bm25", "--index", idx, "--query", "philosophy", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert "http://c" in out and "http://a" not in out

    # compact applies the tombstone physically and clears it
    assert main(["compact", "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_docs"] == 2

    assert main(["stats", "--index", idx]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["n_tombstones"] == 0


def test_compact_tiered_merges_smallest_generations(ray_session, tmp_path):
    """Five generations, max 3: the two smallest gen-* merge into ONE new
    generation; root and the big generation stay byte-untouched; search
    results are unchanged."""
    import os

    from search_engine_ray.pipelines.build import compact_tiered
    from search_engine_ray.state.segments import read_manifest

    config = EngineConfig()
    table = synth_zipf_table(200, n_tokens=20, vocab=300)
    out = str(tmp_path / "tiered")
    # root 80 docs, gen-0001 large (60), gens 2-4 small (20 each)
    build_index(rd.from_arrow(table.slice(0, 80)), out, config, doc_id_mode="rank", resume=False)
    add_generation(out, rd.from_arrow(table.slice(80, 60)), config)
    for s in (140, 160, 180):
        add_generation(out, rd.from_arrow(table.slice(s, 20)), config)
    assert len(generation_dirs(out)) == 5
    big_mtime = os.path.getmtime(os.path.join(out, "gen-0001", "manifest.json"))
    pre = SegmentSearcher(out, config)
    pre_res = [
        (r.doc_id, round(r.score, 9))
        for r in pre.search_bm25("w0 w1", k=10, mode="or")
    ]
    res = compact_tiered(out, config, max_generations=3)
    gens = generation_dirs(out)
    assert len(gens) == 3  # root, gen-0001, merged gen-0005
    names = sorted(os.path.basename(g) for g in gens if "gen-" in g)
    assert names == ["gen-0001", "gen-0005"]
    assert res.n_docs == 60  # docs in the merged generation only
    m = read_manifest(os.path.join(out, "gen-0005", "manifest.json"))
    assert m["complete"] and sorted(m["compacted_from"]) == [
        "gen-0002",
        "gen-0003",
        "gen-0004",
    ]
    # untouched base generation
    assert os.path.getmtime(os.path.join(out, "gen-0001", "manifest.json")) == big_mtime
    reader = SegmentReader(out)
    assert reader.manifest["n_docs"] == 200
    assert len(reader.fetch_docs(list(reader.all_doc_ids()))) == 200
    post = SegmentSearcher(out, config)
    post_res = [
        (r.doc_id, round(r.score, 9))
        for r in post.search_bm25("w0 w1", k=10, mode="or")
    ]
    assert post_res == pre_res


def test_compact_tiered_noop_under_cap(ray_session, tmp_path):
    from search_engine_ray.pipelines.build import compact_tiered

    config = EngineConfig()
    table = synth_zipf_table(60, n_tokens=15, vocab=100)
    out = str(tmp_path / "noop")
    build_index(rd.from_arrow(table.slice(0, 30)), out, config, doc_id_mode="rank", resume=False)
    add_generation(out, rd.from_arrow(table.slice(30)), config)
    res = compact_tiered(out, config, max_generations=4)
    assert len(generation_dirs(out)) == 2
    assert res.n_docs == 60  # no-op reports current totals
    assert res.timings == {"compact_tiered": 0.0}


def test_compact_tiered_then_full_compact_equivalent(ray_session, tmp_path):
    """tiered + full compact == full compact directly (bit-level postings
    equivalence via search results and doc counts)."""
    from search_engine_ray.pipelines.build import compact, compact_tiered

    config = EngineConfig()
    table = synth_zipf_table(150, n_tokens=20, vocab=250)
    splits = [(0, 50), (50, 40), (90, 30), (120, 30)]

    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        build_index(
            rd.from_arrow(table.slice(*splits[0])), out, config,
            doc_id_mode="rank", resume=False,
        )
        for s, ln in splits[1:]:
            add_generation(out, rd.from_arrow(table.slice(s, ln)), config)
        outs.append(out)
    a, b = outs
    compact_tiered(a, config, max_generations=2)
    compact(a, config)
    compact(b, config)
    sa, sb = SegmentSearcher(a, config), SegmentSearcher(b, config)
    for q in ("w0 w1", "w5", "w10 w20 w2"):
        ra = [(r.doc_id, round(r.score, 9)) for r in sa.search_bm25(q, k=10, mode="or")]
        rb = [(r.doc_id, round(r.score, 9)) for r in sb.search_bm25(q, k=10, mode="or")]
        assert ra == rb, q
