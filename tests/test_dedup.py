"""Dedup pipelines: exact (oracle=duckdb), MinHash-LSH vs exact Jaccard,
SimHash banding, embedding near-dup — on corpora with PLANTED duplicates."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


def _docs_with_dups(ray_session):
    """sf0.001 documents + planted near/exact duplicates with high doc_ids."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_pylist()
    extra_texts = [
        texts[0],  # exact dup of doc 0
        texts[1],  # exact dup of doc 1
        texts[2].rsplit(" ", 1)[0],  # near dup of doc 2 (one token dropped)
    ]
    extra_ids = [10_000, 10_001, 10_002]
    tbl = pa.table(
        {
            "doc_id": pa.array(ids + extra_ids, pa.int64()),
            "text": pa.array(texts + extra_texts, pa.string()),
        }
    )
    return tbl


@pytest.fixture(scope="module")
def dup_docs(ray_session):
    return _docs_with_dups(ray_session)


def test_exact_dedup(dup_docs):
    from search_engine_ray.pipelines.dedup import exact_dedup_ds

    got = (
        exact_dedup_ds(rd.from_arrow(dup_docs))
        .to_pandas()
        .sort_values("fp")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("d", dup_docs)
    want = con.sql(
        "SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id FROM d GROUP BY fp ORDER BY fp"
    ).df()
    assert got["fp"].tolist() == want["fp"].tolist()
    assert got["keep_doc_id"].tolist() == want["keep_doc_id"].tolist()
    # the two exact dups must NOT be winners
    assert 10_000 not in set(got["keep_doc_id"])
    assert 10_001 not in set(got["keep_doc_id"])


def test_ngram_jaccard_finds_planted_pairs(dup_docs):
    from search_engine_ray.pipelines.dedup import ngram_jaccard_pairs_ds

    got = ngram_jaccard_pairs_ds(
        rd.from_arrow(dup_docs), k=3, threshold=0.8
    ).to_pandas()
    pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert (0, 10_000) in pairs
    assert (1, 10_001) in pairs
    assert (2, 10_002) in pairs  # near dup: trailing-token shingles differ only
    exact = got.set_index(["doc_a", "doc_b"])["jaccard"]
    assert exact[(0, 10_000)] == 1.0
    assert 0.8 <= exact[(2, 10_002)] < 1.0


def test_minhash_lsh_matches_exact_jaccard(dup_docs):
    from search_engine_ray.pipelines.dedup import (
        minhash_lsh_pairs_ds,
        ngram_jaccard_pairs_ds,
    )

    got = minhash_lsh_pairs_ds(
        rd.from_arrow(dup_docs), num_perm=128, bands=32, k=3, threshold=0.8
    ).to_pandas()
    want = ngram_jaccard_pairs_ds(rd.from_arrow(dup_docs), k=3, threshold=0.8).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    want_pairs = set(zip(want["doc_a"], want["doc_b"]))
    # verification step makes LSH output a SUBSET of the exact pairs; with
    # 32x4 banding at jaccard>=0.8 recall should be total on this corpus
    assert got_pairs == want_pairs
    # verified jaccard values are exact -> identical
    g = got.set_index(["doc_a", "doc_b"])["jaccard"].sort_index()
    w = want.set_index(["doc_a", "doc_b"])["jaccard"].sort_index()
    assert (g == w).all()


def test_minhash_join_fallback_matches_broadcast(dup_docs, monkeypatch):
    """The two verification strategies (broadcast small-side vs distributed
    hash join) must be bit-identical; force the join path by zeroing the
    broadcast caps and compare against the default (broadcast) output."""
    from search_engine_ray.pipelines import dedup

    got_bcast = dedup.minhash_lsh_pairs_ds(
        rd.from_arrow(dup_docs), num_perm=128, bands=32, k=3, threshold=0.8
    ).to_pandas()
    monkeypatch.setattr(dedup, "_BROADCAST_VERIFY_PAIRS", 0)
    got_join = dedup.minhash_lsh_pairs_ds(
        rd.from_arrow(dup_docs), num_perm=128, bands=32, k=3, threshold=0.8
    ).to_pandas()
    key = ["doc_a", "doc_b"]
    b = got_bcast.sort_values(key).reset_index(drop=True)
    j = got_join.sort_values(key).reset_index(drop=True)
    assert b.equals(j) and len(b) > 0


def test_minhash_doc_cap_fallback(dup_docs, monkeypatch):
    """When the pair count is under the cap but the DISTINCT-DOC side is
    over it, _broadcast_verify_pairs must return None and the join path
    must still produce the right pairs."""
    from search_engine_ray.pipelines import dedup

    monkeypatch.setattr(dedup, "_BROADCAST_VERIFY_DOCS", 1)
    got = dedup.minhash_lsh_pairs_ds(
        rd.from_arrow(dup_docs), num_perm=128, bands=32, k=3, threshold=0.8
    ).to_pandas()
    assert (0, 10_000) in set(zip(got["doc_a"], got["doc_b"]))


def test_simhash_neardups(dup_docs):
    from search_engine_ray.pipelines.dedup import simhash_ds, simhash_neardup_pairs_ds

    sigs = simhash_ds(rd.from_arrow(dup_docs)).to_pandas().set_index("doc_id")["simhash"]
    # exact dups -> identical signatures
    assert sigs[0] == sigs[10_000]
    assert sigs[1] == sigs[10_001]
    pairs = simhash_neardup_pairs_ds(rd.from_arrow(dup_docs), max_hamming=3).to_pandas()
    pset = set(zip(pairs["doc_a"], pairs["doc_b"]))
    assert (0, 10_000) in pset
    assert (1, 10_001) in pset
    assert pairs.set_index(["doc_a", "doc_b"])["hamming"][(0, 10_000)] == 0


def test_embedding_neardup(ray_session):
    from search_engine_ray.pipelines.dedup import embedding_neardup_pairs_ds

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    # plant a near-identical vector of vec 0
    v0 = np.array(t.column("embedding")[0].as_py())
    near = (v0 + 1e-4).tolist()
    t2 = pa.table(
        {
            "vec_id": pa.array(t.column("vec_id").to_pylist() + [99_999], pa.int64()),
            "embedding": pa.array(
                t.column("embedding").to_pylist() + [near], pa.list_(pa.float32())
            ),
        }
    )
    got = embedding_neardup_pairs_ds(rd.from_arrow(t2), threshold=0.999).to_pandas()
    assert (0, 99_999) in set(zip(got["vec_a"], got["vec_b"]))


def test_ngram_jaccard_max_group_drops_hot_shingles(dup_docs):
    """A max_group cap of 1 drops every shingle bucket with >1 doc -> no
    pairs survive; the exact default (None) keeps them."""
    from search_engine_ray.pipelines.dedup import ngram_jaccard_pairs_ds

    capped = ngram_jaccard_pairs_ds(
        rd.from_arrow(dup_docs), k=3, threshold=0.8, max_group=1
    ).to_pandas()
    assert len(capped) == 0


def test_embedding_neardup_multiblock(ray_session):
    """Block cross-product must find pairs that straddle block boundaries:
    force many small blocks and check against the single-block result."""
    from search_engine_ray.pipelines.dedup import embedding_neardup_pairs_ds

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    v0 = np.array(t.column("embedding")[0].as_py())
    near = (v0 + 1e-4).tolist()
    t2 = pa.table(
        {
            "vec_id": pa.array(t.column("vec_id").to_pylist() + [99_999], pa.int64()),
            "embedding": pa.array(
                t.column("embedding").to_pylist() + [near], pa.list_(pa.float32())
            ),
        }
    )
    one = embedding_neardup_pairs_ds(rd.from_arrow(t2), threshold=0.9).to_pandas()
    many = embedding_neardup_pairs_ds(
        rd.from_arrow(t2), threshold=0.9, target_block_rows=8
    ).to_pandas()
    key = ["vec_a", "vec_b"]
    assert sorted(map(tuple, one[key].values)) == sorted(map(tuple, many[key].values))
    assert (0, 99_999) in set(zip(many["vec_a"], many["vec_b"]))


def test_embedding_neardup_lsh_recall(ray_session):
    """LSH-bucketed near-dup (the scale path) must recover the high-cosine
    pairs the exact block cross-product finds at threshold 0.95+."""
    from search_engine_ray.pipelines.dedup import (
        embedding_neardup_lsh_pairs_ds,
        embedding_neardup_pairs_ds,
    )

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    base = t.column("embedding").to_pylist()
    ids = t.column("vec_id").to_pylist()
    rng = np.random.default_rng(3)
    extra, extra_ids = [], []
    for i in range(10):  # plant 10 near dups of the first 10 vectors
        v = np.array(base[i], dtype=np.float64)
        extra.append((v + rng.normal(0, 1e-3, v.shape)).tolist())
        extra_ids.append(50_000 + i)
    t2 = pa.table(
        {
            "vec_id": pa.array(ids + extra_ids, pa.int64()),
            "embedding": pa.array(base + extra, pa.list_(pa.float32())),
        }
    )
    exact = embedding_neardup_pairs_ds(rd.from_arrow(t2), threshold=0.95).to_pandas()
    approx = embedding_neardup_lsh_pairs_ds(
        rd.from_arrow(t2), threshold=0.95, n_bits=8, n_tables=8
    ).to_pandas()
    exact_pairs = set(zip(exact["vec_a"], exact["vec_b"]))
    approx_pairs = set(zip(approx["vec_a"], approx["vec_b"]))
    assert approx_pairs <= exact_pairs  # within-bucket cosine is exact
    # multi-table recall on planted near-identical pairs should be total
    planted = {(i, 50_000 + i) for i in range(10)} & exact_pairs
    assert planted and planted <= approx_pairs


def test_shingle_hashes_batch_matches_per_doc():
    """shingle_hashes_batch == shingle_hashes per doc (incl. short/empty
    docs), each doc slice ascending-sorted and distinct."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.functions.textstats import (
        minhash_params,
        minhash_signatures_flat,
        minhash_signature,
        shingle_hashes,
        shingle_hashes_batch,
        token_lists,
    )

    texts = pa.array(
        [
            "the quick brown fox jumps over the lazy dog",
            "",
            "one",
            "two words",
            "the quick brown fox jumps over the lazy dog again",
            "a a a a a a",
        ]
    )
    toks = token_lists(texts)
    flat, starts = shingle_hashes_batch(toks, 3)
    assert len(starts) == len(texts) + 1
    for i in range(len(texts)):
        words = [w.lower() for w in toks[i].as_py()]
        ref = np.sort(shingle_hashes(words, 3))
        got = flat[starts[i] : starts[i + 1]]
        assert got.tolist() == ref.tolist(), i
        assert (np.diff(got.astype(np.int64)) > 0).all()  # sorted distinct

    # flat signatures == per-doc signatures on the same shingle sets
    a, b = minhash_params(16)
    sigs = minhash_signatures_flat(flat, starts, a, b)
    for i in range(len(texts)):
        per = minhash_signature(flat[starts[i] : starts[i + 1]], a, b)
        assert sigs[i].tolist() == per.tolist(), i


def test_dup_ngram_stats_matches_duckdb(ray_session):
    import duckdb

    from search_engine_ray.pipelines.dedup import dup_ngram_stats_ds
    from search_engine_ray.pipelines.text import read_documents

    sf = "/root/testdata/sf0.001"
    got = (
        dup_ngram_stats_ds(read_documents(sf))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(
        """
        WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(ts)-1),
                                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
               FROM t),
        df AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
        SELECT sh.doc_id, count(*)::BIGINT AS n_shingles,
               sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_shingles
        FROM sh JOIN df ON sh.s = df.s GROUP BY sh.doc_id ORDER BY sh.doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["n_shingles"].tolist() == want["n_shingles"].tolist()
    assert got["n_dup_shingles"].tolist() == want["n_dup_shingles"].tolist()


def test_semdedup_matches_numpy_reference(ray_session):
    """semdedup_ds vs a pure-numpy reference of the same rule (cluster by
    nearest centroid, drop iff a lower-vec_id cluster-mate has cosine >=
    threshold)."""
    import numpy as np
    import ray.data as rd

    from search_engine_ray.pipelines.dedup import semdedup_ds
    from search_engine_ray.pipelines.similarity import read_embeddings, train_ivf_centroids

    SF = "/root/testdata/sf0.001"
    emb = read_embeddings(SF)
    cent = train_ivf_centroids(emb, n_centroids=8, seed=7)
    got = (
        semdedup_ds(emb, threshold=0.8, centroids=cent)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    m = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    lid = np.argmax(m @ cent.T, axis=1)
    keep = {}
    for c in np.unique(lid):
        sel = np.flatnonzero(lid == c)
        sel = sel[np.argsort(ids[sel])]
        sub = m[sel]
        sims = sub @ sub.T
        drop = (np.tril(sims, -1) >= 0.8).any(axis=1)
        for i, d in zip(ids[sel], drop):
            keep[int(i)] = not bool(d)

    assert got["vec_id"].tolist() == sorted(keep)
    assert got["keep"].tolist() == [keep[i] for i in sorted(keep)]
    # rule sanity: at least everything kept in singleton clusters
    assert got["keep"].any()


def test_dedup_spans_semantics(ray_session):
    """Duplicated trigram spans are cut; short docs pass through; a doc can
    be fully consumed; within-doc repetition counts toward min_count."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.dedup import dedup_spans_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["a b c d e", "x a b c y", "short one", "a b c a b c"],
                    pa.string(),
                ),
            }
        )
    )
    out = (
        dedup_spans_ds(docs, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["clean_text"].tolist() == ["d e", "x y", "short one", ""]
    assert out["n_removed"].tolist() == [3, 3, 0, 6]


def test_dedup_spans_matches_duckdb(ray_session):
    import duckdb

    from search_engine_ray.pipelines.dedup import dedup_spans_ds
    from search_engine_ray.pipelines.text import read_documents

    got = (
        dedup_spans_ds(read_documents(SF), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.sql(
        """
        WITH tok AS (SELECT doc_id,
                            list_filter(string_split(text,' '), x -> x <> '') AS ts
                     FROM documents),
        grams AS (SELECT doc_id, i, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS sh
                  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - 1)) AS i
                        FROM tok WHERE len(ts) >= 3)),
        cnt AS (SELECT sh, count(*) AS c FROM grams GROUP BY sh),
        cover AS (SELECT DISTINCT doc_id, g.i + j.j AS p
                  FROM grams g JOIN cnt USING (sh)
                  CROSS JOIN (SELECT unnest([0,1,2]) AS j) j
                  WHERE cnt.c >= 2),
        toks_pos AS (SELECT doc_id, i AS p, ts[i] AS tokn
                     FROM (SELECT doc_id, ts, unnest(range(1, len(ts)+1)) AS i
                           FROM tok)),
        kept AS (SELECT tp.doc_id, tp.p, tp.tokn FROM toks_pos tp
                 ANTI JOIN cover cv ON tp.doc_id = cv.doc_id AND tp.p = cv.p),
        rebuilt AS (SELECT doc_id,
                           array_to_string(list(tokn ORDER BY p), ' ') AS clean_text,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id)
        SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
               len(t.ts) - coalesce(r.n_kept, 0) AS n_removed
        FROM tok t LEFT JOIN rebuilt r USING (doc_id) ORDER BY doc_id
        """
    ).df()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    assert got["n_removed"].tolist() == want["n_removed"].tolist()


def test_ngram_containment_catches_subset_docs(ray_session):
    """A doc embedded verbatim inside a larger doc has containment 1.0 but
    Jaccard well under 0.8 — the asymmetric measure catches what the
    symmetric one misses."""
    from search_engine_ray.pipelines.dedup import (
        ngram_containment_pairs_ds,
        ngram_jaccard_pairs_ds,
    )

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(40))
    d = rd.from_items(
        [
            {"doc_id": 1, "text": quote},
            {"doc_id": 2, "text": filler + " " + quote},
            {"doc_id": 3, "text": "unrelated tokens only here"},
        ]
    )
    got = ngram_containment_pairs_ds(d, k=3, threshold=0.9).to_pandas()
    pairs = dict(zip(zip(got["doc_a"], got["doc_b"]), got["containment"]))
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs

    jac_ds = ngram_jaccard_pairs_ds(d, k=3, threshold=0.8)
    assert jac_ds.count() == 0  # symmetric Jaccard misses the subset pair


def test_cluster_representatives_keep_longest(ray_session):
    """The survivor is the LONGEST doc in the cluster even when it has the
    highest doc_id — min-id keep would pick the truncated copy."""
    from search_engine_ray.pipelines.dedup import cluster_representatives_ds

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = rd.from_items(
        [
            {"doc_id": 1, "text": base},                       # truncated copy
            {"doc_id": 2, "text": base + " lambda mu"},        # the full doc
            {"doc_id": 9, "text": "totally different tokens everywhere"},
        ]
    )
    edges = rd.from_items([{"u": 1, "v": 2}])
    got = (
        cluster_representatives_ds(d, edges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 2]
    assert got["cluster_id"].tolist() == [1, 1]
    assert got["is_kept"].tolist() == [0, 1]  # longest wins, not min-id
    assert got["n_tokens"].tolist() == [10, 12]


def test_cluster_representatives_join_fallback_matches_broadcast(
    ray_session, monkeypatch
):
    """Forcing the distributed-join path (broadcast bound = 0) must be
    bit-identical to the broadcast fast path."""
    from search_engine_ray.pipelines import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = rd.from_items(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": base + " lambda mu"},
            {"doc_id": 5, "text": "x1 x2 x3 x4 x5 x6"},
            {"doc_id": 7, "text": "x1 x2 x3 x4 x5 x6 x7 x8"},
        ]
    )
    edges = rd.from_items([{"u": 1, "v": 2}, {"u": 5, "v": 7}])
    bcast = (
        dedup.cluster_representatives_ds(d, edges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    monkeypatch.setattr(dedup, "_BROADCAST_CC_ROWS", 0)
    join = (
        dedup.cluster_representatives_ds(d, edges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bcast.equals(join) and len(bcast) == 4
    assert bcast.set_index("doc_id")["is_kept"].to_dict() == {1: 0, 2: 1, 5: 0, 7: 1}


def test_zero_pair_queries_keep_schema(ray_session, tmp_path, monkeypatch):
    """Aggregate-terminated near-dup queries (Ray loses even schema() on
    zero-row aggregate output) must return typed empty frames on a corpus
    with no duplicates — the _schema_safe fallback path."""
    import pyarrow.parquet as pq
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    sf = tmp_path / "sf"
    sf.mkdir()
    # unique docs (no near-dups), orthogonal embeddings (no cos >= 0.5)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    ["aa bb cc dd ee ff", "gg hh ii jj kk ll"], pa.string()
                ),
            }
        ),
        str(sf / "documents.parquet"),
    )
    eye = np.eye(2, 8, dtype=np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], pa.int64()),
                "embedding": pa.array(eye.tolist(), pa.list_(pa.float32())),
            }
        ),
        str(sf / "embeddings.parquet"),
    )
    sim = E.q_simhash_neardup(str(sf))
    assert list(sim.columns) == ["doc_a", "doc_b", "hamming"] and len(sim) == 0
    lsh = E.q_embedding_neardup_lsh(str(sf))
    assert list(lsh.columns) == ["vec_a", "vec_b"] and len(lsh) == 0
    # regression: sentinel-only candidate set -> every shingle-set block is
    # 0-row; the broadcast-verify concat must tolerate the all-empty case
    mh = E.q_minhash_pairs(str(sf))
    assert len(mh) == 0


def test_chunk_dedup_planted(ray_session):
    """A chunk duplicated across docs is reported once with the
    lexicographic-min keeper; unique chunks emit nothing."""
    import ray.data as rd

    from search_engine_ray.pipelines.dedup import chunk_dedup_ds

    shared = " ".join(f"s{i}" for i in range(4))
    rows = [
        {"doc_id": 5, "text": shared + " tailA tailB tailC tailD"},
        {"doc_id": 2, "text": shared + " other words here now"},
        {"doc_id": 9, "text": "totally different text body here"},
    ]
    out = (
        chunk_dedup_ds(rd.from_items(rows), chunk_tokens=4, stride=4)
        .to_pandas()
        .sort_values("fp")
        .reset_index(drop=True)
    )
    # exactly one duplicated chunk group: the shared 4-token prefix
    assert len(out) == 1
    assert out.loc[0, "n_copies"] == 2
    assert out.loc[0, "keep_doc_id"] == 2 and out.loc[0, "keep_chunk_id"] == 0


def test_dup_rate_by_source_counts(ray_session):
    import ray.data as rd

    from search_engine_ray.pipelines.dedup import dup_rate_by_source_ds

    rows = [
        {"doc_id": 0, "text": "aa bb", "source": "x"},
        {"doc_id": 1, "text": "aa bb", "source": "y"},  # dup of 0
        {"doc_id": 2, "text": "aa bb", "source": "y"},  # dup of 0
        {"doc_id": 3, "text": "cc dd", "source": "y"},  # unique
        {"doc_id": 4, "text": "ee ff", "source": "x"},  # unique
    ]
    out = (
        dup_rate_by_source_ds(rd.from_items(rows))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    assert out.to_dict("records") == [
        {"source": "x", "n_docs": 2, "n_dups": 0},
        {"source": "y", "n_docs": 3, "n_dups": 2},
    ]


def test_cdc_dedup_offset_independent(ray_session):
    """A shared passage at DIFFERENT offsets dedups under CDC chunking
    (content-anchored boundaries) — the fixed-window variant only matches
    aligned copies."""
    import ray.data as rd

    from search_engine_ray.pipelines.dedup import chunk_dedup_ds

    shared = " ".join(f"s{i}" for i in range(24))
    rows = [
        {"doc_id": 0, "text": shared + " " + " ".join(f"a{i}" for i in range(10))},
        {"doc_id": 1, "text": "one extra prefix " + shared},  # offset 3
    ]
    out = chunk_dedup_ds(
        rd.from_items(rows), method="cdc", cdc_k=2, cdc_modulus=4
    ).to_pandas()
    # at least one interior shared chunk is detected across the two docs
    assert (out["n_copies"] >= 2).all()
    assert len(out) >= 1
