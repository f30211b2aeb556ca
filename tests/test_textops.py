"""Training-data text ops vs plain-Python/duckdb expectations at sf0.001."""

import duckdb
import numpy as np
import pytest

import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(ray_session):
    from search_engine_ray.pipelines.text import read_documents

    return read_documents(SF)


def _sql(q):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    return con.sql(q).df()


def test_token_count(docs):
    from search_engine_ray.pipelines.text import token_count_ds

    got = token_count_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _sql(
        """
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS n_tokens
        FROM documents ORDER BY doc_id
        """
    )
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_term_df(docs):
    from search_engine_ray.pipelines.text import term_df_ds

    got = term_df_ds(docs).to_pandas().sort_values("term").reset_index(drop=True)
    want = _sql(
        """
        SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM (
          SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
          FROM documents)
        WHERE length(term) >= 2 GROUP BY term ORDER BY term
        """
    )
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].tolist() == want["df"].tolist()


def test_top_terms(docs):
    from search_engine_ray.pipelines.text import top_terms_ds

    got = top_terms_ds(docs, k=10).to_pandas()
    want = _sql(
        """
        SELECT term, count(*)::BIGINT AS n FROM (
          SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS term
          FROM documents)
        WHERE length(term) >= 2 GROUP BY term ORDER BY n DESC, term LIMIT 10
        """
    )
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_fingerprint(docs):
    from search_engine_ray.pipelines.text import fingerprint_ds

    got = fingerprint_ds(docs).to_pandas().sort_values("doc_id")
    want = _sql("SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id")
    assert got["fp"].tolist() == want["fp"].tolist()


def test_quality(docs):
    from search_engine_ray.pipelines.text import quality_ds

    got = quality_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _sql(
        """
        WITH toks AS (
          SELECT doc_id, length(text)::BIGINT AS n_chars,
                 list_filter(string_split(text,' '), x -> x <> '') AS ts
          FROM documents)
        SELECT doc_id, n_chars, len(ts)::BIGINT AS n_tokens,
               coalesce(list_sum(list_transform(ts, x -> length(x))), 0)::BIGINT AS sum_token_len,
               len(list_filter(ts, x -> length(x) < 2))::BIGINT AS n_short
        FROM toks ORDER BY doc_id
        """
    )
    for col in ["n_chars", "n_tokens", "sum_token_len", "n_short"]:
        assert got[col].tolist() == want[col].tolist(), col


def test_lang_id_runs(docs):
    from search_engine_ray.pipelines.text import lang_id_ds

    got = lang_id_ds(docs).to_pandas()
    assert len(got) == docs.count()
    assert set(got["lang_pred"]).issubset({"en", "de", "fr", "es", "und"})


def test_extract_roundtrip(docs):
    from search_engine_ray.pipelines.text import extract_roundtrip_ds

    got = extract_roundtrip_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _sql("SELECT doc_id, 'doc ' || doc_id AS title, text FROM documents ORDER BY doc_id")
    assert got["text"].tolist() == want["text"].tolist()
    assert got["title"].tolist() == want["title"].tolist()


def test_repetition_matches_sql(docs):
    from search_engine_ray.pipelines.text import repetition_ds

    got = repetition_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _sql(
        """
        WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        b AS (SELECT doc_id,
                     unnest(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])) AS bg
              FROM t),
        c AS (SELECT doc_id, bg, count(*) AS cnt FROM b GROUP BY doc_id, bg),
        agg AS (SELECT doc_id, sum(cnt)::BIGINT AS n_bigrams, count(*)::BIGINT AS distinct_bigrams,
                       max(cnt)::BIGINT AS top_bigram_count
                FROM c GROUP BY doc_id)
        SELECT t.doc_id, coalesce(agg.n_bigrams,0)::BIGINT AS n_bigrams,
               coalesce(agg.distinct_bigrams,0)::BIGINT AS distinct_bigrams,
               coalesce(agg.top_bigram_count,0)::BIGINT AS top_bigram_count
        FROM t LEFT JOIN agg USING (doc_id) ORDER BY doc_id
        """
    )
    for c in ("n_bigrams", "distinct_bigrams", "top_bigram_count"):
        assert got[c].tolist() == want[c].tolist(), c


def test_repetition_degenerate_doc():
    """A doc that is one token repeated: top bigram covers everything."""
    import pyarrow as pa

    from search_engine_ray.functions.textstats import repetition_metrics

    m = repetition_metrics(pa.array(["spam spam spam spam spam", "a", ""]))
    assert m["n_bigrams"].tolist() == [4, 0, 0]
    assert m["distinct_bigrams"].tolist() == [1, 0, 0]
    assert m["top_bigram_count"].tolist() == [4, 0, 0]


def test_decontaminate_matches_sql(docs):
    from search_engine_ray.pipelines.text import decontaminate_ds

    got = decontaminate_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _sql(
        """
        WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        sh AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(range(1, len(ts)-1),
                                            i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s
               FROM t),
        ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
        g AS (SELECT sh.doc_id, count(*)::BIGINT AS n_shingles, count(ev.s)::BIGINT AS n_contaminated
              FROM sh LEFT JOIN ev ON sh.s = ev.s GROUP BY sh.doc_id)
        SELECT t.doc_id, coalesce(g.n_shingles,0)::BIGINT AS n_shingles,
               coalesce(g.n_contaminated,0)::BIGINT AS n_contaminated
        FROM t LEFT JOIN g USING (doc_id) ORDER BY doc_id
        """
    )
    assert got["n_shingles"].tolist() == want["n_shingles"].tolist()
    assert got["n_contaminated"].tolist() == want["n_contaminated"].tolist()
    # eval docs are fully self-contaminated
    ev = got[got.doc_id % 97 == 0]
    assert (ev.n_contaminated == ev.n_shingles).all()


def test_hash_sample_deterministic(docs):
    import hashlib

    from search_engine_ray.pipelines.text import hash_sample_ds

    a = sorted(hash_sample_ds(docs).to_pandas()["doc_id"].tolist())
    b = sorted(hash_sample_ds(docs).to_pandas()["doc_id"].tolist())
    assert a == b and len(a) > 0
    for d in a[:20]:
        assert hashlib.md5(str(d).encode()).hexdigest()[0] in ("0", "1", "2")
    # unsampled ids really hash elsewhere
    sampled = set(a)
    for d in range(50):
        if d not in sampled:
            assert hashlib.md5(str(d).encode()).hexdigest()[0] not in ("0", "1", "2")


def test_clean_corpus_invariants(ray_session):
    """clean_corpus = lang/quality/repetition/decontamination/sample/dedup
    composition; invariants checked against its own building blocks."""
    import hashlib

    from search_engine_ray.pipelines.text import (
        clean_corpus_ds,
        decontaminate_ds,
        read_documents,
    )

    docs = read_documents(SF, columns=["doc_id", "text", "lang"])
    got = clean_corpus_ds(docs).to_pandas()
    assert len(got) > 0
    assert got["doc_id"].is_unique
    assert (got["n_tokens"] >= 20).all() and (got["n_tokens"] <= 1000).all()
    kept = set(got["doc_id"].tolist())
    # every kept doc passed the sample gate
    for d in kept:
        assert hashlib.md5(str(d).encode()).hexdigest()[0] < "8"
    # and is uncontaminated
    dec = decontaminate_ds(read_documents(SF)).to_pandas()
    bad = set(dec[dec.n_contaminated > 0]["doc_id"].tolist())
    assert not (kept & bad)


def test_unigram_lm_matches_sql(docs):
    from search_engine_ray.pipelines.text import unigram_lm_ds

    got = (
        unigram_lm_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _sql(
        """
        WITH tok AS (SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ts
             FROM documents),
        flat AS (SELECT doc_id, unnest(ts) AS term FROM tok),
        cnt AS (SELECT term, count(*) AS n FROM flat GROUP BY term),
        tot AS (SELECT sum(n)::DOUBLE AS s FROM cnt),
        bits AS (
          SELECT f.doc_id, -log2(v.n::DOUBLE / tot.s) AS b
          FROM flat f JOIN cnt v USING (term) CROSS JOIN tot)
        SELECT doc_id, round(avg(b), 6) AS lm_bits
        FROM bits GROUP BY doc_id ORDER BY doc_id
        """
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["lm_bits"], want["lm_bits"], atol=1e-6)


def test_unigram_lm_vocab_cap_oov_floor(ray_session):
    from search_engine_ray.pipelines.text import unigram_lm_ds

    # corpus: 'aa' x3, 'bb' x2, 'cc' x1 -> total 6. vocab_size=2 keeps
    # {aa, bb}; 'cc' scores at the 1/6 OOV floor.
    import pyarrow as pa

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["aa aa aa", "bb bb", "cc"], pa.string()),
            }
        )
    )
    got = (
        unigram_lm_ds(docs, vocab_size=2)
        .to_pandas()
        .sort_values("doc_id")["lm_bits"]
        .tolist()
    )
    assert got[0] == round(-np.log2(3 / 6), 6)
    assert got[1] == round(-np.log2(2 / 6), 6)
    assert got[2] == round(-np.log2(1 / 6), 6)  # OOV floor = 1/total


def test_quantile_bucket_matches_ntile(docs):
    from search_engine_ray.pipelines.text import quantile_bucket_ds

    got = (
        quantile_bucket_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _sql(
        """
        SELECT doc_id,
               ntile(3) OVER (ORDER BY n_tokens, doc_id)::BIGINT AS bucket
        FROM (SELECT doc_id,
                len(list_filter(string_split(text,' '), x -> x <> ''))::BIGINT
                  AS n_tokens
              FROM documents)
        ORDER BY doc_id
        """
    )
    assert got["bucket"].tolist() == want["bucket"].tolist()


def test_quantile_bucket_all_ties(ray_session):
    """Every doc has the same n_tokens — the boundary falls INSIDE one value
    group, so the doc_id tie-break carries the whole ntile assignment."""
    import pyarrow as pa

    from search_engine_ray.pipelines.text import quantile_bucket_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(7)), pa.int64()),
                "text": pa.array(["x y"] * 7, pa.string()),
            }
        )
    )
    got = (
        quantile_bucket_ds(docs, n_buckets=3)
        .to_pandas()
        .sort_values("doc_id")["bucket"]
        .tolist()
    )
    # ntile(3) over 7 rows: sizes 3,2,2
    assert got == [1, 1, 1, 2, 2, 3, 3]


def test_pii_redact_vectors(ray_session):
    import pyarrow as pa

    from search_engine_ray.pipelines.text import pii_redact_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "mail me at Bob.Smith+x@sub.example.org today",
                        "server 192.168.0.1 then 10.0.0.255 end",
                        "no pii here at all",
                        "pair a@b.co 1.2.3.4",
                    ],
                    pa.string(),
                ),
            }
        )
    )
    got = pii_redact_ds(docs).to_pandas().sort_values("doc_id")
    assert got["clean_text"].tolist() == [
        "mail me at <EMAIL> today",
        "server <IP> then <IP> end",
        "no pii here at all",
        "pair <EMAIL> <IP>",
    ]
    assert got["n_redacted"].tolist() == [1, 2, 0, 2]


def test_stratified_sample_matches_sql_and_parallelism(docs):
    from search_engine_ray.pipelines.text import read_documents, stratified_sample_ds

    want = _sql(
        """
        SELECT lang, doc_id FROM documents
        QUALIFY row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) <= 4
        ORDER BY lang, doc_id
        """
    )
    full = read_documents(SF, columns=["doc_id", "text", "lang"])
    for blocks in (1, 7):
        got = (
            stratified_sample_ds(
                full.repartition(blocks), per_group=4, group_col="lang"
            )
            .to_pandas()
            .sort_values(["lang", "doc_id"])
            .reset_index(drop=True)
        )
        assert got["lang"].tolist() == want["lang"].tolist(), blocks
        assert got["doc_id"].tolist() == want["doc_id"].tolist(), blocks


def test_quantile_bucket_skew_refinement(ray_session, monkeypatch):
    """Force the doc_id-histogram refinement path (boundary value group
    larger than the refine threshold) and check it returns the same exact
    ntile assignment as the direct path."""
    import pyarrow as pa

    from search_engine_ray.pipelines.text import quantile_bucket_ds

    # 97 docs, ALL the same n_tokens -> every boundary falls inside one
    # huge value group; doc_ids shuffled across blocks
    ids = [(i * 37) % 97 for i in range(97)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(["x y z"] * 97, pa.string()),
            }
        )
    ).repartition(5)
    want = (
        quantile_bucket_ds(docs, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")["bucket"]
        .tolist()
    )
    monkeypatch.setenv("SE_RAY_QUANTILE_REFINE_ABOVE", "8")
    got = (
        quantile_bucket_ds(docs, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")["bucket"]
        .tolist()
    )
    assert got == want
    # ntile(4) over 97 rows: sizes 25,24,24,24 in doc_id order (all ties)
    assert got == [1] * 25 + [2] * 24 + [3] * 24 + [4] * 24


def test_tfidf_topk(docs):
    from search_engine_ray.pipelines.text import tfidf_topk_ds

    got = (
        tfidf_topk_ds(docs, k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = _sql(
        """
        WITH tok AS (SELECT doc_id,
                            list_filter(string_split(text,' '), x -> x <> '') AS ts
                     FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM (
                 SELECT doc_id, unnest(ts) AS term FROM tok)
               WHERE length(term) >= 2 GROUP BY doc_id, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (SELECT doc_id, tf.term, tf.tf * ln(n.n / df.df) AS s
                   FROM tf JOIN df USING (term) CROSS JOIN n),
        ranked AS (SELECT doc_id, term, s,
                          row_number() OVER (PARTITION BY doc_id
                                             ORDER BY s DESC, term) AS rank
                   FROM scored)
        SELECT doc_id, term, s AS tfidf, rank::BIGINT AS rank
        FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
        """
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["rank"].tolist() == want["rank"].tolist()
    np.testing.assert_allclose(got["tfidf"], want["tfidf"], atol=1e-6)


def test_tfidf_topk_tiny_corpus(ray_session):
    # df==N terms score 0 and lose to rarer terms; ties break by term asc
    import pyarrow as pa

    from search_engine_ray.pipelines.text import tfidf_topk_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["aa bb bb cc", "aa dd"], pa.string()),
            }
        )
    )
    got = (
        tfidf_topk_ds(docs, k=2)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # doc 1: bb tf=2 rare -> top; cc rare -> second (aa scores 0)
    # doc 2: dd rare -> top; aa 0 -> second
    assert got[got.doc_id == 1]["term"].tolist() == ["bb", "cc"]
    assert got[got.doc_id == 2]["term"].tolist() == ["dd", "aa"]


def test_cooccur_pmi(docs):
    from search_engine_ray.pipelines.text import cooccur_pmi_ds

    got = (
        cooccur_pmi_ds(docs, vocab_size=1000, min_count=2, k=15)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = _sql(
        """
        WITH tok AS (SELECT doc_id,
                            list_filter(string_split(text,' '), x -> x <> '') AS ts
                     FROM documents),
        dt AS (SELECT DISTINCT doc_id, term FROM (
                 SELECT doc_id, unnest(ts) AS term FROM tok)
               WHERE length(term) >= 2),
        df AS (SELECT term, count(*) AS c FROM dt GROUP BY term),
        pairs AS (SELECT a.term AS term_a, b.term AS term_b, count(*) AS n_ab
                  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
                  GROUP BY a.term, b.term),
        n AS (SELECT count(*) AS n FROM documents)
        SELECT term_a, term_b, n_ab,
               round(ln(n.n * n_ab / (ca.c * cb.c)), 6) AS pmi
        FROM pairs JOIN df ca ON term_a = ca.term JOIN df cb ON term_b = cb.term
        CROSS JOIN n WHERE n_ab >= 2
        ORDER BY pmi DESC, term_a, term_b LIMIT 15
        """
    )
    assert got["term_a"].tolist() == want["term_a"].tolist()
    assert got["term_b"].tolist() == want["term_b"].tolist()
    assert got["n_ab"].tolist() == want["n_ab"].tolist()
    np.testing.assert_allclose(got["pmi"], want["pmi"], atol=1e-6)


def test_cooccur_pmi_vocab_cap(ray_session):
    # vocab_size=1 keeps only the most frequent term -> no pairs at all
    import pyarrow as pa

    from search_engine_ray.pipelines.text import cooccur_pmi_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["aa bb", "aa bb", "aa cc"], pa.string()),
            }
        )
    )
    got = cooccur_pmi_ds(docs, vocab_size=1, min_count=1, k=5).to_pandas()
    assert len(got) == 0
    # full vocab: (aa,bb) co-occurs twice; PMI = ln(3*2/(3*2)) = 0
    got = cooccur_pmi_ds(docs, vocab_size=10, min_count=2, k=5).to_pandas()
    assert got[["term_a", "term_b"]].values.tolist() == [["aa", "bb"]]
    assert got["pmi"].iloc[0] == 0.0


def test_bloom_decontaminate_zero_false_negatives(docs):
    """Every doc the exact operator flags is Bloom-flagged (no false
    negatives by construction); false positives stay rare at 128 KB."""
    from search_engine_ray.pipelines.text import (
        bloom_decontaminate_ds,
        decontaminate_ds,
    )

    exact = (
        decontaminate_ds(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloom = (
        bloom_decontaminate_ds(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert exact["doc_id"].tolist() == bloom["doc_id"].tolist()
    assert exact["n_shingles"].tolist() == bloom["n_shingles"].tolist()
    # no false negatives: bloom flag count >= exact contamination count
    assert (bloom["n_flagged"] >= exact["n_contaminated"]).all()
    # bounded false positives: extra flags are a small fraction of shingles
    extra = (bloom["n_flagged"] - exact["n_contaminated"]).sum()
    assert extra <= max(0.01 * exact["n_shingles"].sum(), 5), extra


def test_pack_sequences_prefix_scan(docs):
    """Distributed prefix scan == single-process cumsum, on many blocks."""
    from search_engine_ray.pipelines.text import pack_sequences_ds, read_documents

    many_blocks = read_documents(SF).repartition(13)
    got = (
        pack_sequences_ds(many_blocks, budget_tokens=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = got["n_tokens"].to_numpy()
    cum = np.concatenate(([0], np.cumsum(n)[:-1]))
    assert got["bin_id"].tolist() == (cum // 512).tolist()
    assert got["bin_offset"].tolist() == (cum % 512).tolist()
    # bins are dense 0..max
    assert set(got["bin_id"]) == set(range(got["bin_id"].max() + 1))


def test_weighted_sample_rate_tracks_weight(docs):
    """Keep-rate approximates mean(min(1, n/scale)); scale=1 keeps all
    non-empty docs; determinism across runs."""
    from search_engine_ray.pipelines.text import weighted_sample_ds

    a = weighted_sample_ds(docs, scale=150).to_pandas().sort_values("doc_id")
    b = weighted_sample_ds(docs, scale=150).to_pandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    want = _sql(
        """SELECT avg(least(1.0, len(list_filter(string_split(text,' '),
           x -> x <> '')) / 150.0)) AS w FROM documents"""
    )["w"].iloc[0]
    n_docs = _sql("SELECT count(*) AS n FROM documents")["n"].iloc[0]
    rate = len(a) / n_docs
    assert abs(rate - want) < 0.1, (rate, want)
    full = weighted_sample_ds(docs, scale=1).to_pandas()
    assert len(full) == n_docs  # every doc has >= 1 token at sf0.001


def test_spell_suggest_edit_classes(ray_session):
    """Deletion, insertion and substitution misspellings all resolve; df
    ranks; distance-2 and unknown terms yield nothing."""
    import pyarrow as pa

    from search_engine_ray.pipelines.text import spell_suggest_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "table chair table",
                        "table stable",
                        "cable fable",
                        "chair",
                    ],
                    pa.string(),
                ),
            }
        )
    ).repartition(2)
    got = (
        spell_suggest_ds(docs, ["tble", "tablee", "tadle", "tbl", "zzz"], k=3)
        .to_pandas()
        .sort_values(["query_term", "rank"])
    )
    by_q = {q: g["suggestion"].tolist() for q, g in got.groupby("query_term")}
    assert by_q["tble"] == ["table"]  # deletion
    assert by_q["tablee"] == ["table"]  # insertion ('stable' is distance 2)
    assert by_q["tadle"][0] == "table"  # substitution
    assert "tbl" not in by_q  # distance 2 from everything
    assert "zzz" not in by_q


def test_autocomplete(docs):
    from search_engine_ray.pipelines.text import autocomplete_ds

    got = (
        autocomplete_ds(docs, ["ta", "zz"], k=3)
        .to_pandas()
        .sort_values(["prefix", "rank"])
    )
    want = _sql(
        """
        WITH dt AS (SELECT term, count(DISTINCT doc_id) AS df FROM (
              SELECT doc_id, unnest(list_filter(string_split(text,' '),
                                                x -> x <> '')) AS term
              FROM documents)
            WHERE length(term) >= 2 GROUP BY term)
        SELECT term, df FROM dt WHERE starts_with(term, 'ta')
        ORDER BY df DESC, term LIMIT 3
        """
    )
    ta = got[got.prefix == "ta"]
    assert ta["term"].tolist() == want["term"].tolist()
    assert ta["df"].tolist() == want["df"].tolist()
    assert (got.prefix != "zz").all()


def test_domain_mix_rates_and_determinism(ray_session):
    """Per-source keep rates hit their targets (md5-uniform), unlisted
    sources drop entirely, and membership is identical across runs and
    partitionings."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import domain_mix_ds

    n = 4000
    rng = np.random.default_rng(3)
    src = rng.choice(["a", "b", "c"], size=n)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(src, pa.string()),
        }
    )
    rates = {"a": 1.0, "b": 0.5}
    out1 = domain_mix_ds(rd.from_arrow(t), rates).to_pandas()
    out2 = domain_mix_ds(rd.from_arrow(t).repartition(7), rates).to_pandas()
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    by = out1.groupby("source").size()
    n_a, n_b = int((src == "a").sum()), int((src == "b").sum())
    assert by.get("a", 0) == n_a                      # rate 1.0: all kept
    assert abs(by.get("b", 0) / n_b - 0.5) < 0.05     # rate 0.5 +- noise
    assert "c" not in by.index                        # unlisted: dropped


def test_model_score_matches_numpy_reference(ray_session):
    """HashedLogisticScorer == a per-doc python/numpy reference (same
    polynomial hash, hashing-trick buckets, sigmoid), and ray.put weights
    give identical scores to the seeded stand-in they came from."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from search_engine_ray.pipelines.text import model_score_ds
    from search_engine_ray.stages.postings import _hash_utf8_array

    texts = ["the quick brown fox", "lorem ipsum dolor", "a b c d e f", ""]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    dim = 1 << 12
    got = (
        model_score_ds(docs, dim=dim, weights=7, concurrency=2, batch_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    rng = np.random.default_rng(7)
    w = rng.standard_normal(dim) / np.sqrt(dim)
    want = []
    for t in texts:
        toks = [x for x in t.split(" ") if x]
        z = 0.0
        if toks:
            h = _hash_utf8_array(pa.array(toks, pa.string()))
            z = float(w[(h % np.uint64(dim)).astype(np.int64)].sum())
        want.append(1.0 / (1.0 + np.exp(-z)))
    assert np.allclose(got["score"].to_numpy(), want)
    # real-model path: the same weights via ray.put give identical scores
    got2 = (
        model_score_ds(docs, dim=dim, weights=ray.put(w), concurrency=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert np.allclose(got2["score"].to_numpy(), got["score"].to_numpy())


def test_url_normalize_cases(ray_session):
    """Canonicalization rules: fragment strip, scheme+authority lowercase
    (path/query case preserved), default-port strip (scheme-aware),
    trailing-slash-run strip, schemeless passthrough."""
    import pyarrow as pa

    from search_engine_ray.pipelines.text import normalize_urls

    got = normalize_urls(
        pa.array(
            [
                "HTTP://WWW.Example.COM:80/Path/One/#Frag",
                "https://Host.org:443/a/b///",
                "https://Host.org:8443/Keep/Port",
                "ftp://X.Y/z/",
                "no-scheme-here#frag",
                "http://case.COM/QUERY?x=Y#z",
            ]
        )
    ).to_pylist()
    assert got == [
        "http://www.example.com/Path/One",
        "https://host.org/a/b",
        "https://host.org:8443/Keep/Port",
        "ftp://x.y/z",
        "no-scheme-here",
        "http://case.com/QUERY?x=Y",
    ]


def test_md5_fingerprints_arrow_matches_list_path():
    """The Arrow-buffer md5 (memoryview slices, no per-row Python string)
    must be byte-identical to the hashlib-over-pylist reference on plain,
    sliced, chunked, unicode, empty-string, and null-bearing arrays."""
    import hashlib

    import pyarrow as pa

    from search_engine_ray.functions.textstats import (
        md5_fingerprints,
        md5_fingerprints_arrow,
    )

    texts = ["hello world", "", "éüñ — dash", "a" * 5000, "tab\tnl\n"]
    arr = pa.array(texts, pa.string())
    assert md5_fingerprints_arrow(arr) == md5_fingerprints(texts)
    # non-zero offset slice
    assert md5_fingerprints_arrow(arr.slice(1, 3)) == md5_fingerprints(texts[1:4])
    # chunked
    ch = pa.chunked_array([texts[:2], texts[2:]])
    assert md5_fingerprints_arrow(ch) == md5_fingerprints(texts)
    # large_string
    assert md5_fingerprints_arrow(arr.cast(pa.large_string())) == md5_fingerprints(
        texts
    )
    # empty
    assert md5_fingerprints_arrow(pa.array([], pa.string())) == []
    # nulls fall back to the list path with "" for null
    withnull = pa.array(["x", None, "y"], pa.string())
    assert md5_fingerprints_arrow(withnull) == [
        hashlib.md5(s.encode()).hexdigest() for s in ("x", "", "y")
    ]


def test_hash_utf8_array_tab_basics():
    """Tabulation second hash: deterministic, offset/chunk-safe, distinct
    from the polynomial h1 (independence smoke), and permutation-sensitive
    (the classic polynomial-collision shapes don't collide here)."""
    import numpy as np
    import pyarrow as pa

    from search_engine_ray.stages.postings import (
        _hash_utf8_array,
        _hash_utf8_array_tab,
    )

    vals = ["", "a", "ab", "ba", "abc", "acb", "http://x/1", "http://x/2"]
    arr = pa.array(vals, pa.string())
    h = _hash_utf8_array_tab(arr)
    assert len(set(h.tolist())) == len(vals)  # all distinct here
    # determinism + slice/chunk correctness
    assert (_hash_utf8_array_tab(arr) == h).all()
    assert (_hash_utf8_array_tab(arr.slice(2, 3)) == h[2:5]).all()
    ch = pa.chunked_array([vals[:3], vals[3:]])
    assert (_hash_utf8_array_tab(ch) == h).all()
    assert (
        _hash_utf8_array_tab(arr.cast(pa.large_string())) == h
    ).all()
    # not correlated with the polynomial hash
    h1 = _hash_utf8_array(arr)
    assert (h != h1).any()
    assert _hash_utf8_array_tab(pa.array([], pa.string())).shape == (0,)
    assert h.dtype == np.uint64


def test_hash_sample_fast_method(ray_session):
    """method='fast' (splitmix64 threshold): deterministic across runs,
    subset rate near len(prefixes)/16, disjoint code path from md5."""
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import hash_sample_ds

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4000), pa.int64())})
    )
    a = sorted(r["doc_id"] for r in hash_sample_ds(docs, method="fast").take_all())
    b = sorted(r["doc_id"] for r in hash_sample_ds(docs, method="fast").take_all())
    assert a == b
    rate = len(a) / 4000
    assert 0.14 < rate < 0.24  # target 3/16 = 0.1875


def test_md5_id_u32_matches_hashlib():
    """md5_id_u32 == int(md5(str(id)).hexdigest()[:8], 16) per id — the
    invariant every md5-membership sampler's SQL oracle rests on — across
    zero/negative/large ids, and the hex-order == numeric-order identity
    the threshold compares rely on."""
    import hashlib

    import numpy as np

    from search_engine_ray.functions.textstats import md5_id_u32

    rng = np.random.default_rng(7)
    ids = np.concatenate(
        [
            np.array([0, 1, -1, -(2**62), 2**62], dtype=np.int64),
            rng.integers(-(2**62), 2**62, size=5000),
        ]
    )
    got = md5_id_u32(ids)
    exp = np.array(
        [int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) for i in ids],
        dtype=np.uint32,
    )
    assert got.dtype == np.uint32 and (got == exp).all()
    assert md5_id_u32(np.zeros(0, np.int64)).shape == (0,)
    # fixed-width lowercase hex orders numerically (the compare rewrite)
    for t in (0, 1, 0x7FFFFFFF, 0x80000000, 2**32 - 1):
        for i in ids[:50]:
            hexcmp = hashlib.md5(str(int(i)).encode()).hexdigest()[:8] < f"{t:08x}"
            assert hexcmp == (int(md5_id_u32(np.array([i]))[0]) < t)


def test_weighted_sample_fast_method(ray_session):
    """weighted_sample method='fast': deterministic across runs and
    partitionings, keep rate tracks w = min(1, n_tokens/scale), scale=1
    keeps everything (w==1 for any non-empty doc)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import weighted_sample_ds

    n = 4000
    rng = np.random.default_rng(11)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 20))) for _ in range(n)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = weighted_sample_ds(rd.from_arrow(t), scale=20, method="fast").to_pandas()
    b = (
        weighted_sample_ds(rd.from_arrow(t).repartition(7), scale=20, method="fast")
        .to_pandas()
    )
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # mean weight = mean(n_tokens)/20 ~ 0.5; fast membership should track it
    exp_rate = min(1.0, np.mean([len(s.split()) for s in texts]) / 20.0)
    assert abs(len(a) / n - exp_rate) < 0.05
    full = weighted_sample_ds(rd.from_arrow(t), scale=1, method="fast").to_pandas()
    assert len(full) == n


def test_domain_mix_fast_method(ray_session):
    """domain_mix method='fast': rate-1.0 sources keep everything, unlisted
    drop entirely, 0.5 lands near half, membership identical across
    partitionings."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from search_engine_ray.pipelines.text import domain_mix_ds

    n = 4000
    rng = np.random.default_rng(13)
    src = rng.choice(["a", "b", "c"], size=n)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(src, pa.string()),
        }
    )
    rates = {"a": 1.0, "b": 0.5}
    out1 = domain_mix_ds(rd.from_arrow(t), rates, method="fast").to_pandas()
    out2 = (
        domain_mix_ds(rd.from_arrow(t).repartition(7), rates, method="fast")
        .to_pandas()
    )
    assert sorted(out1["doc_id"]) == sorted(out2["doc_id"])
    by = out1.groupby("source").size()
    n_a, n_b = int((src == "a").sum()), int((src == "b").sum())
    assert by.get("a", 0) == n_a
    assert abs(by.get("b", 0) / n_b - 0.5) < 0.05
    assert "c" not in by.index


def test_lang_top_terms(docs, ray_session):
    from search_engine_ray.pipelines.text import lang_top_terms_ds

    d = rd.read_parquet(f"{SF}/documents.parquet", columns=["text", "lang"])
    got = lang_top_terms_ds(d, k=5).to_pandas().reset_index(drop=True)
    want = _sql(
        """
        WITH c AS (
          SELECT lang, term, count(*)::BIGINT AS n FROM (
            SELECT lang, unnest(list_filter(string_split(text,' '), x -> x <> ''))
              AS term FROM documents)
          WHERE length(term) >= 2 GROUP BY lang, term),
        r AS (SELECT lang, term, n,
                     row_number() OVER (PARTITION BY lang ORDER BY n DESC, term)
                       AS rk FROM c)
        SELECT lang, term, n FROM r WHERE rk <= 5 ORDER BY lang, n DESC, term
        """
    )
    assert got["lang"].tolist() == want["lang"].tolist()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_lang_top_terms_k_larger_than_vocab(ray_session):
    """k beyond a language's vocabulary returns all its terms, no padding."""
    from search_engine_ray.pipelines.text import lang_top_terms_ds

    d = rd.from_items(
        [
            {"text": "aa bb aa", "lang": "en"},
            {"text": "cc", "lang": "fr"},
        ]
    )
    got = lang_top_terms_ds(d, k=10).to_pandas()
    assert got[got["lang"] == "en"]["term"].tolist() == ["aa", "bb"]
    assert got[got["lang"] == "fr"]["term"].tolist() == ["cc"]


def test_vocab_stats(docs, ray_session):
    from search_engine_ray.pipelines.text import vocab_stats_ds

    d = rd.read_parquet(f"{SF}/documents.parquet", columns=["text", "lang"])
    got = vocab_stats_ds(d).to_pandas().reset_index(drop=True)
    want = _sql(
        """
        WITH c AS (
          SELECT lang, term, count(*)::BIGINT AS n FROM (
            SELECT lang, unnest(list_filter(string_split(text,' '), x -> x <> ''))
              AS term FROM documents)
          WHERE length(term) >= 2 GROUP BY lang, term)
        SELECT lang, sum(n)::BIGINT AS n_tokens, count(*)::BIGINT AS vocab,
               sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
        FROM c GROUP BY lang ORDER BY lang
        """
    )
    for col in ("lang", "n_tokens", "vocab", "hapax"):
        assert got[col].tolist() == want[col].tolist(), col


def test_lang_ops_null_lang(ray_session):
    """Null lang groups under the 'und' sentinel instead of crashing
    np.unique's sort on a None key."""
    from search_engine_ray.pipelines.text import lang_top_terms_ds, vocab_stats_ds

    d = rd.from_items(
        [
            {"text": "aa bb aa", "lang": "en"},
            {"text": "cc dd cc", "lang": None},
        ]
    )
    tt = lang_top_terms_ds(d, k=5).to_pandas()
    assert set(tt["lang"]) == {"en", "und"}
    vs = vocab_stats_ds(d).to_pandas()
    assert vs.set_index("lang").loc["und", "vocab"] == 2


def test_shard_export_segmented_scan(ray_session, tmp_path):
    """Segmented prefix scan == single-process per-shard rank, on many
    blocks (shards split across block boundaries); hive-partitioned write."""
    import hashlib

    import pandas as pd

    from search_engine_ray.pipelines.text import read_documents, shard_export_ds

    many_blocks = read_documents(SF, columns=["doc_id"]).repartition(11)
    out_dir = str(tmp_path / "shards")
    got = (
        shard_export_ds(many_blocks, n_shards=8, out_dir=out_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ids = got["doc_id"].to_numpy()
    h = np.array(
        [int(hashlib.md5(str(int(i)).encode()).hexdigest()[:8], 16) for i in ids],
        dtype=np.int64,
    )
    assert got["shard"].tolist() == (h % 8).tolist()
    # per-shard: positions are exactly 0..count-1 in (h, doc_id) order
    ref = pd.DataFrame({"doc_id": ids, "h": h, "shard": h % 8})
    ref = ref.sort_values(["shard", "h", "doc_id"]).reset_index(drop=True)
    ref["pos"] = ref.groupby("shard").cumcount()
    merged = got.merge(ref[["doc_id", "pos"]], on="doc_id", suffixes=("", "_ref"))
    assert merged["pos"].tolist() == merged["pos_ref"].tolist()
    # the hive-partitioned layout landed: one shard=K dir per non-empty shard
    import os

    parts = sorted(d for d in os.listdir(out_dir) if d.startswith("shard="))
    assert parts == [f"shard={k}" for k in sorted(got["shard"].unique())]
    back = rd.read_parquet(out_dir).to_pandas()
    assert len(back) == len(got)


def test_shard_export_property(ray_session):
    """Property: for random id sets / shard counts / block counts, every
    shard's positions are a dense 0..count-1 permutation ordered by
    (md5-u32, doc_id), and assignment is block-count invariant."""
    import hashlib

    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_ray.pipelines.text import shard_export_ds

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10**12),
            min_size=1,
            max_size=120,
            unique=True,
        ),
        st.sampled_from([1, 2, 7]),
        st.sampled_from([1, 5]),
    )
    def check(ids, n_shards, n_blocks):
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        ).repartition(n_blocks)
        got = (
            shard_export_ds(ds, n_shards=n_shards)
            .to_pandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
        )
        assert len(got) == len(ids)
        h = {
            i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) for i in ids
        }
        for sh, g in got.groupby("shard"):
            assert g["pos"].tolist() == list(range(len(g)))
            keys = [(h[i], i) for i in g["doc_id"]]
            assert keys == sorted(keys)
            assert all(h[i] % n_shards == sh for i in g["doc_id"])

    check()


def test_pack_sequences_sparse_blocks(ray_session):
    """Regression: 1 doc across many partitions — sort+materialize emits
    schema-less empty blocks that the per-block tasks must tolerate."""
    import pyarrow as pa

    from search_engine_ray.pipelines.text import pack_sequences_ds

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array(["one two three"])})
    ).repartition(6)
    got = pack_sequences_ds(ds, budget_tokens=8).to_pandas()
    assert got["doc_id"].tolist() == [7]
    assert got["bin_id"].tolist() == [0] and got["bin_offset"].tolist() == [0]


def test_normalize_text_matches_sql(docs):
    from search_engine_ray.pipelines.text import normalize_text_ds

    got = (
        normalize_text_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _sql(
        "SELECT doc_id, trim(regexp_replace(lower(nfc_normalize(text)),"
        " '\\s+', ' ', 'g')) AS text FROM documents ORDER BY doc_id"
    )
    assert got["text"].tolist() == want["text"].tolist()


def test_normalize_text_unicode_cases(ray_session):
    import unicodedata as ud

    import duckdb
    import pyarrow as pa

    from search_engine_ray.pipelines.text import normalize_text_ds

    nfc = lambda s: ud.normalize("NFC", s)
    nfd = lambda s: ud.normalize("NFD", s)
    cases = [
        (nfd("Caf\u00e9  DU  Monde"), nfc("caf\u00e9 du monde")),  # NFD->NFC
        ("  \tTabs\nand\r\nnewlines  ", "tabs and newlines"),
        (nfc("\u00c9COLE"), nfc("\u00e9cole")),  # composed stays composed
        ("no\u00a0break", "no\u00a0break"),  # NBSP is NOT \\s (RE2 ASCII)
        ("", ""),
        ("   ", ""),
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(cases)), pa.int64()),
            "text": pa.array([c[0] for c in cases], pa.string()),
        }
    )
    got = normalize_text_ds(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert got["text"].tolist() == [c[1] for c in cases]
    # parity with DuckDB on the same unicode inputs
    con = duckdb.connect()
    con.register("u", t)
    want = con.sql(
        "SELECT trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))"
        " AS text FROM u ORDER BY doc_id"
    ).df()
    assert got["text"].tolist() == want["text"].tolist()


def test_dsir_weights_matches_sql(docs):
    # DSIR (Xie et al. 2023): md5-bucketed unigram+bigram importance
    # weights, bit-identical to the DuckDB oracle (same bucket map, same
    # float64 log-prob sums, 6-dp rounding)
    from search_engine_ray.pipelines.text import dsir_weights_ds

    got = (
        dsir_weights_ds(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _sql(
        """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        uni AS (SELECT doc_id, unnest(ts) AS g FROM t),
        bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
               FROM t, unnest(range(1, len(ts))) AS u(i)),
        g AS (SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM bi),
        gb AS (SELECT doc_id,
                      (('0x' || substr(md5(g),1,8))::BIGINT % 4096) AS b FROM g),
        cnt AS (SELECT b, count(*)::DOUBLE AS cs,
                       sum(CASE WHEN doc_id % 97 < 3 THEN 1 ELSE 0 END)::DOUBLE AS ct
                FROM gb GROUP BY b),
        tot AS (SELECT sum(cs) AS ts_, sum(ct) AS tt_ FROM cnt),
        lp AS (SELECT b, ln((ct + 0.5)/(tt_ + 0.5*4096))
                        - ln((cs + 0.5)/(ts_ + 0.5*4096)) AS d
               FROM cnt, tot),
        w AS (SELECT gb.doc_id, sum(lp.d) AS logw
              FROM gb JOIN lp USING (b) GROUP BY gb.doc_id)
        SELECT dd.doc_id, round(coalesce(w.logw, 0.0), 6) AS logw
        FROM documents dd LEFT JOIN w ON dd.doc_id = w.doc_id
        ORDER BY dd.doc_id
        """
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["logw"].tolist() == want["logw"].tolist()
    # target docs should on average score higher than non-target docs
    is_t = got["doc_id"] % 97 < 3
    assert got.loc[is_t, "logw"].mean() > got.loc[~is_t, "logw"].mean()


def test_dsir_weights_fast_variant(docs):
    # crawl-scale variant: vectorized 64-bit hash buckets — different
    # member buckets, same shape/statistics (target mean above source)
    from search_engine_ray.pipelines.text import dsir_weights_ds

    got = dsir_weights_ds(docs, variant="fast").to_pandas()
    assert len(got) == 500 and set(got.columns) == {"doc_id", "logw"}
    is_t = got["doc_id"] % 97 < 3
    assert got.loc[is_t, "logw"].mean() > got.loc[~is_t, "logw"].mean()


def test_dsir_weights_degenerate_docs(ray_session):
    # empty and single-token docs: no bigrams / no grams at all
    import pyarrow as pa

    from search_engine_ray.pipelines.text import dsir_weights_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array(["", "solo", "two words"], pa.string()),
            }
        )
    )
    got = dsir_weights_ds(docs).to_pandas().sort_values("doc_id")
    assert got["doc_id"].tolist() == [0, 1, 2]
    assert got["logw"].iloc[0] == 0.0  # no grams -> weight 0


_DSIR_W_SQL = """
WITH t AS (SELECT doc_id,
                  list_filter(string_split(text,' '), x -> x <> '') AS ts
           FROM documents),
uni AS (SELECT doc_id, unnest(ts) AS g FROM t),
bi AS (SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
       FROM t, unnest(range(1, len(ts))) AS u(i)),
g AS (SELECT doc_id, g FROM uni UNION ALL SELECT doc_id, g FROM bi),
gb AS (SELECT doc_id,
              (('0x' || substr(md5(g),1,8))::BIGINT % 4096) AS b FROM g),
cnt AS (SELECT b, count(*)::DOUBLE AS cs,
               sum(CASE WHEN doc_id % 97 < 3 THEN 1 ELSE 0 END)::DOUBLE AS ct
        FROM gb GROUP BY b),
tot AS (SELECT sum(cs) AS ts_, sum(ct) AS tt_ FROM cnt),
lp AS (SELECT b, ln((ct + 0.5)/(tt_ + 0.5*4096))
                - ln((cs + 0.5)/(ts_ + 0.5*4096)) AS d
       FROM cnt, tot),
w AS (SELECT gb.doc_id, sum(lp.d) AS logw
      FROM gb JOIN lp USING (b) GROUP BY gb.doc_id)
SELECT dd.doc_id, round(coalesce(w.logw, 0.0), 6) AS logw
FROM documents dd LEFT JOIN w ON dd.doc_id = w.doc_id
"""


def test_dsir_resample_matches_sql(docs):
    # Gumbel top-k selection over the DSIR weights: deterministic md5
    # uniform per doc, key = logw - ln(-ln(u)), top-k by key desc. Row
    # ORDER and all three columns must match the SQL oracle.
    from search_engine_ray.pipelines.text import dsir_resample_ds

    got = dsir_resample_ds(docs, k=25).to_pandas()
    want = _sql(
        f"""
        WITH wt AS ({_DSIR_W_SQL}),
        keyed AS (SELECT doc_id, logw,
                         logw - ln(-ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                                         % 1000000) + 0.5) / 1000000.0)) AS key
                  FROM wt)
        SELECT doc_id, logw, round(key, 6) AS key
        FROM keyed ORDER BY key DESC, doc_id LIMIT 25
        """
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["logw"].tolist() == want["logw"].tolist()
    assert got["key"].tolist() == want["key"].tolist()


def test_dsir_resample_temperature_and_k(docs):
    # T -> 0 makes selection approach pure argmax of logw; k > n returns
    # every doc exactly once (sampling WITHOUT replacement)
    from search_engine_ray.pipelines.text import dsir_resample_ds

    cold = dsir_resample_ds(docs, k=10, temperature=1e-9).to_pandas()
    w = _sql(f"SELECT * FROM ({_DSIR_W_SQL}) ORDER BY logw DESC, doc_id LIMIT 10")
    assert cold["doc_id"].tolist() == w["doc_id"].tolist()

    allrows = dsir_resample_ds(docs, k=10**6).to_pandas()
    assert len(allrows) == 500
    assert allrows["doc_id"].is_unique
    # output ordered by key descending
    assert (allrows["key"].to_numpy()[:-1] >= allrows["key"].to_numpy()[1:]).all()


def test_dsir_resample_fast_variant(docs):
    # crawl-scale variant: splitmix64 uniforms, no per-row hashlib
    from search_engine_ray.pipelines.text import dsir_resample_ds

    got = dsir_resample_ds(docs, k=50, variant="fast").to_pandas()
    assert len(got) == 50 and got["doc_id"].is_unique
    assert (got["key"].to_numpy()[:-1] >= got["key"].to_numpy()[1:]).all()


def test_bigram_lm_matches_sql(docs):
    # order-1 LM: add-alpha conditional bigram bits, uncapped model at
    # this SF equals the SQL model exactly (6-dp rounding)
    from search_engine_ray.pipelines.text import bigram_lm_ds

    got = (
        bigram_lm_ds(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = _sql(
        """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        bg AS (SELECT doc_id, ts[i] AS w1, ts[i] || ' ' || ts[i+1] AS g
               FROM t, unnest(range(1, len(ts))) AS u(i)),
        c12 AS (SELECT g, count(*)::DOUBLE AS c FROM bg GROUP BY g),
        c1 AS (SELECT w1, count(*)::DOUBLE AS c FROM bg GROUP BY w1),
        v AS (SELECT count(DISTINCT x)::DOUBLE AS v
              FROM (SELECT unnest(ts) AS x FROM t)),
        s AS (SELECT bg.doc_id, -log2((c12.c + 0.1) / (c1.c + 0.1 * v.v)) AS bits
              FROM bg JOIN c12 USING (g) JOIN c1 USING (w1) CROSS JOIN v)
        SELECT doc_id, round(avg(bits), 6) AS lm2_bits
        FROM s GROUP BY doc_id ORDER BY doc_id
        """
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["lm2_bits"].tolist() == want["lm2_bits"].tolist()


def test_bigram_lm_degenerate_and_caps(ray_session):
    import pyarrow as pa

    from search_engine_ray.pipelines.text import bigram_lm_ds

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["", "solo", "a b a b a b", "q r s t"], pa.string()
                ),
            }
        )
    )
    got = bigram_lm_ds(docs).to_pandas().sort_values("doc_id")
    # <2-token docs emit nothing (no bigram positions)
    assert got["doc_id"].tolist() == [2, 3]
    # the repeated-bigram doc is less surprising than the all-unique one
    assert got["lm2_bits"].iloc[0] < got["lm2_bits"].iloc[1]
    assert np.isfinite(got["lm2_bits"]).all()
    # pruned model (tiny caps): still defined/finite for every doc — the
    # capped-out mass backs off to the smoothing floor, KenLM-style
    pruned = bigram_lm_ds(docs, bigram_cap=1, context_cap=1).to_pandas()
    assert pruned["doc_id"].tolist() and np.isfinite(pruned["lm2_bits"]).all()


def test_token_drift_matches_sql(docs):
    # slice-drift monitor: integer cross-product ranking key, smoothed
    # KL contributions — row-for-row vs the SQL oracle
    from search_engine_ray.pipelines.text import token_drift_ds

    got = token_drift_ds(docs, k=15).to_pandas()
    want = _sql(
        """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        f AS (SELECT doc_id, unnest(ts) AS term FROM t),
        c AS (SELECT term,
                     sum(CASE WHEN doc_id % 97 < 3 THEN 1 ELSE 0 END)::BIGINT AS nt,
                     sum(CASE WHEN doc_id % 97 < 3 THEN 0 ELSE 1 END)::BIGINT AS ns
              FROM f GROUP BY term),
        tot AS (SELECT sum(nt) AS tt, sum(ns) AS ss, count(*) AS v FROM c),
        top AS (SELECT term, nt, ns, tt, ss, v, abs(nt*ss - ns*tt) AS key
                FROM c, tot ORDER BY key DESC, term LIMIT 15)
        SELECT term, nt AS n_target, ns AS n_source,
               round(((nt + 0.5)/(tt + 0.5*v)) *
                     log2(((nt + 0.5)/(tt + 0.5*v)) / ((ns + 0.5)/(ss + 0.5*v))), 6)
               AS kl_bits
        FROM top ORDER BY key DESC, term
        """
    )
    assert got["term"].tolist() == want["term"].tolist()
    assert got["n_target"].tolist() == want["n_target"].tolist()
    assert got["n_source"].tolist() == want["n_source"].tolist()
    assert got["kl_bits"].tolist() == want["kl_bits"].tolist()


def test_token_drift_detects_planted_shift(ray_session):
    # a term that exists ONLY in the target slice must rank first
    import pyarrow as pa

    from search_engine_ray.pipelines.text import token_drift_ds

    rows = []
    for d in range(200):
        base = "alpha beta gamma delta"
        if d % 97 < 3:
            base += " plutonium plutonium plutonium"
        rows.append({"doc_id": d, "text": base})
    docs = rd.from_items(rows)
    got = token_drift_ds(docs, k=3).to_pandas()
    assert got["term"].iloc[0] == "plutonium"
    # 9 target docs (0-2, 97-99, 194-196) x 3 occurrences
    assert got["n_source"].iloc[0] == 0 and got["n_target"].iloc[0] == 27
    assert got["kl_bits"].iloc[0] > 0  # over-represented in target


def test_blocklist_filter(docs):
    from search_engine_ray.pipelines.text import blocklist_filter_ds

    got = (
        blocklist_filter_ds(docs, ("table", "scan", "query"), max_ratio=0.1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _sql(
        """
        WITH t AS (SELECT doc_id,
                          list_filter(string_split(text,' '), x -> x <> '') AS ts
                   FROM documents),
        m AS (SELECT doc_id, len(ts)::BIGINT AS n_tokens,
                     len(list_filter(ts, x -> lower(x) IN ('table','scan','query')))::BIGINT
                     AS n_blocked
              FROM t)
        SELECT doc_id, n_blocked,
               round(CASE WHEN n_tokens > 0 THEN n_blocked / n_tokens ELSE 0.0 END, 6)
               AS blocked_ratio,
               CASE WHEN (CASE WHEN n_tokens > 0 THEN n_blocked / n_tokens
                          ELSE 0.0 END) <= 0.1 THEN 1 ELSE 0 END::BIGINT AS keep
        FROM m ORDER BY doc_id
        """
    )
    assert got["n_blocked"].tolist() == want["n_blocked"].tolist()
    assert got["blocked_ratio"].tolist() == want["blocked_ratio"].tolist()
    assert got["keep"].tolist() == want["keep"].tolist()
    # C4 semantics: max_ratio=0 drops any doc with a single hit
    strict = blocklist_filter_ds(docs, ("table",), max_ratio=0.0).to_pandas()
    assert ((strict["keep"] == 1) == (strict["n_blocked"] == 0)).all()
    # empty-doc edge: ratio 0, kept
    e = blocklist_filter_ds(
        rd.from_items([{"doc_id": 0, "text": ""}]), ("x",)
    ).to_pandas()
    assert e["blocked_ratio"].tolist() == [0.0] and e["keep"].tolist() == [1]


def test_source_topk_matches_sql(ray_session):
    from search_engine_ray.pipelines.text import read_documents, source_topk_ds

    docs = read_documents(SF, columns=["doc_id", "text", "source", "n_chars"])
    got = source_topk_ds(docs, k=5).to_pandas().reset_index(drop=True)
    want = _sql(
        """
        SELECT source, doc_id, n_chars, rk FROM (
          SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars DESC, doc_id)::BIGINT AS rk
          FROM documents)
        WHERE rk <= 5 ORDER BY source, rk
        """
    )
    assert got.equals(want.reset_index(drop=True))
    # every source capped at exactly min(5, docs-in-source)
    per_src = _sql("SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source")
    caps = dict(zip(per_src["source"], per_src["n"].clip(upper=5)))
    counts = got.groupby("source")["doc_id"].count()
    assert {s: int(n) for s, n in counts.items()} == {s: int(n) for s, n in caps.items()}


def test_source_topk_tie_and_small_groups(ray_session):
    # ties on n_chars break by doc_id ASC; groups smaller than k emit all
    rows = [
        {"doc_id": 3, "text": "x", "source": "a", "n_chars": 10},
        {"doc_id": 1, "text": "x", "source": "a", "n_chars": 10},
        {"doc_id": 2, "text": "x", "source": "a", "n_chars": 20},
        {"doc_id": 9, "text": "x", "source": "b", "n_chars": 5},
    ]
    from search_engine_ray.pipelines.text import source_topk_ds

    got = source_topk_ds(rd.from_items(rows), k=2).to_pandas()
    assert got[got["source"] == "a"]["doc_id"].tolist() == [2, 1]
    assert got[got["source"] == "b"]["doc_id"].tolist() == [9]
    assert got["rk"].tolist() == [1, 2, 1]


def test_vocab_coverage_matches_sql(docs):
    from search_engine_ray.pipelines.text import vocab_coverage_ds

    got = vocab_coverage_ds(docs).to_pandas().reset_index(drop=True)
    want = _sql(
        """
        WITH f AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
                   AS term FROM documents),
        c AS (SELECT term, count(*)::BIGINT AS n FROM f GROUP BY term),
        tot AS (SELECT sum(n)::BIGINT AS s FROM c),
        o AS (SELECT term, n,
                (sum(n) OVER (ORDER BY n DESC, term) - n)::BIGINT AS cum_prev,
                sum(n) OVER (ORDER BY n DESC, term)::BIGINT AS cum
              FROM c),
        th AS (SELECT unnest([50, 90, 99]) AS pct)
        SELECT th.pct::BIGINT AS pct, count(o.term)::BIGINT AS n_terms,
               coalesce(max(o.cum), 0)::BIGINT AS covered_tokens,
               any_value(tot.s) AS total_tokens
        FROM th CROSS JOIN tot LEFT JOIN o ON o.cum_prev * 100 < tot.s * th.pct
        GROUP BY th.pct ORDER BY th.pct
        """
    )
    assert got.equals(want.reset_index(drop=True))
    # monotonicity invariants
    assert got["n_terms"].is_monotonic_increasing
    assert got["covered_tokens"].is_monotonic_increasing
    assert (got["covered_tokens"] * 100 >= got["total_tokens"] * got["pct"]).all()


def test_vocab_coverage_many_blocks(ray_session):
    # force many sorted blocks so the distributed prefix scan crosses
    # block boundaries; exact single-process reference
    import collections

    rows = [{"doc_id": i, "text": f"w{i % 37} w{i % 11} common"} for i in range(500)]
    ds = rd.from_items(rows).repartition(17)
    from search_engine_ray.pipelines.text import vocab_coverage_ds

    got = vocab_coverage_ds(ds, pcts=(10, 60, 100)).to_pandas()
    cnt = collections.Counter()
    for r in rows:
        cnt.update(r["text"].split())
    total = sum(cnt.values())
    order = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for _, row in got.iterrows():
        cum = 0
        n_terms = 0
        for _, n in order:
            if cum * 100 >= total * row["pct"]:
                break
            cum += n
            n_terms += 1
        assert row["n_terms"] == n_terms and row["covered_tokens"] == cum
        assert row["total_tokens"] == total


def test_leakage_safe_split_matches_sql(ray_session):
    from search_engine_ray.pipelines.text import leakage_safe_split_ds, read_documents

    docs = read_documents(SF, columns=["doc_id", "text", "source"])
    got = (
        leakage_safe_split_ds(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _sql(
        """
        WITH s AS (
          SELECT doc_id, source,
                 (('0x' || substr(md5(source), 1, 8))::BIGINT % 100)::BIGINT AS bucket
          FROM documents)
        SELECT doc_id, source, bucket,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        FROM s ORDER BY doc_id
        """
    )
    assert got.equals(want.reset_index(drop=True))
    # the leakage-safety property itself: one split per source
    assert (got.groupby("source")["split"].nunique() == 1).all()


def test_split_leakage_histogram(ray_session):
    from search_engine_ray.pipelines.text import read_documents, split_leakage_ds

    docs = read_documents(SF, columns=["doc_id", "text", "source"])
    got = split_leakage_ds(docs).to_pandas().reset_index(drop=True)
    want = _sql(
        """
        WITH s AS (
          SELECT md5(text) AS fp,
                 (('0x' || substr(md5(source), 1, 8))::BIGINT % 100) AS b
          FROM documents),
        p AS (SELECT DISTINCT fp,
                     CASE WHEN b < 80 THEN 0 WHEN b < 90 THEN 1 ELSE 2 END AS split
              FROM s),
        g AS (SELECT fp, count(*)::BIGINT AS n_splits FROM p GROUP BY fp)
        SELECT n_splits, count(*)::BIGINT AS n_fps FROM g
        GROUP BY n_splits ORDER BY n_splits
        """
    )
    assert got.equals(want.reset_index(drop=True))
    # fingerprint conservation: histogram sums to distinct text count
    n_fp = _sql("SELECT count(DISTINCT md5(text))::BIGINT AS n FROM documents")["n"][0]
    assert got["n_fps"].sum() == n_fp


def test_split_leakage_by_doc_leaks_planted_dups(ray_session):
    # two sources share identical text; a doc-granular split CAN leak it,
    # the source-keyed split cannot leak within-source dups
    from search_engine_ray.pipelines.text import split_leakage_ds

    rows = []
    for d in range(60):
        # identical text repeated across two different sources
        rows.append({"doc_id": d, "text": "the shared boilerplate page", "source": f"s{d % 2}"})
    ds = rd.from_items(rows)
    keyed = split_leakage_ds(ds).to_pandas()
    # one fingerprint; lands in as many splits as the 2 sources' buckets
    assert keyed["n_fps"].sum() == 1
    by_doc = split_leakage_ds(ds, by_doc=True).to_pandas()
    # doc-granular split scatters 60 copies across buckets -> multi-split
    assert by_doc.loc[by_doc["n_splits"] > 1, "n_fps"].sum() == 1


def test_pii_cards_luhn(ray_session):
    from search_engine_ray.pipelines.text import pii_cards_ds

    valid1 = "4532 0151 1283 0366"       # Luhn-valid 16-digit (Visa test shape)
    valid2 = "79927398713"                # classic Luhn example, 11 digits: TOO SHORT -> not a card
    valid3 = "4532-0151-1283-0366"
    invalid = "4532 0151 1283 0367"       # checksum off by one
    rows = [
        {"doc_id": 0, "text": f"pay with {valid1} now"},
        {"doc_id": 1, "text": f"ref {invalid} is an order id"},
        {"doc_id": 2, "text": f"both {valid3} and {invalid} appear"},
        {"doc_id": 3, "text": f"short {valid2} run"},
        {"doc_id": 4, "text": "no digits at all"},
        {"doc_id": 5, "text": ""},
    ]
    got = (
        pii_cards_ds(rd.from_items(rows))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_cards"].tolist() == [1, 0, 1, 0, 0, 0]
    assert got["clean_text"][0] == "pay with <CARD> now"
    assert got["clean_text"][1] == rows[1]["text"]  # invalid untouched
    assert got["clean_text"][2] == f"both <CARD> and {invalid} appear"
    assert got["n_candidates"].tolist()[:3] == [1, 1, 2]
    # rows with no candidates take the vectorized fast path untouched
    assert got["clean_text"][4] == "no digits at all" and got["clean_text"][5] == ""


def test_luhn_reference_vectors():
    from search_engine_ray.pipelines.text import _luhn_valid

    import numpy as np

    # classic vectors: 79927398713 valid (but <13 digits -> masked),
    # 4532015112830366 valid, off-by-one invalid, amex-length 15 valid
    got = _luhn_valid(
        ["79927398713", "4532015112830366", "4532015112830367", "371449635398431"]
    )
    assert got.tolist() == [False, True, False, True]
    assert _luhn_valid([]).tolist() == []


def test_chunk_docs_edges(ray_session):
    """Chunk rule edges: short doc (one chunk), exact-boundary lengths,
    overlap content, empty doc (no chunks)."""
    from search_engine_ray.pipelines.text import chunk_docs_ds

    def words(n, p="w"):
        return " ".join(f"{p}{i}" for i in range(n))

    rows = [
        {"doc_id": 0, "text": words(3)},        # L < chunk -> 1 chunk
        {"doc_id": 1, "text": words(4)},        # L == chunk -> 1 chunk
        {"doc_id": 2, "text": words(5)},        # L = chunk+1 -> 2 chunks
        {"doc_id": 3, "text": words(6)},        # L = chunk+stride -> 2 chunks
        {"doc_id": 4, "text": words(7)},        # -> 3 chunks (tail len 3)
        {"doc_id": 5, "text": ""},              # empty -> no rows
    ]
    out = (
        chunk_docs_ds(rd.from_items(rows), chunk_tokens=4, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    per_doc = out.groupby("doc_id").size().to_dict()
    assert per_doc == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3}
    d2 = out[out.doc_id == 2]
    assert d2["chunk_text"].tolist() == ["w0 w1 w2 w3", "w2 w3 w4"]
    assert d2["start_tok"].tolist() == [0, 2]
    assert d2["n_tokens"].tolist() == [4, 3]
    d4 = out[out.doc_id == 4]
    assert d4["chunk_text"].tolist() == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6"
    ]
    # every doc's final chunk reaches its last token
    for i, n in [(0, 3), (1, 4), (2, 5), (3, 6), (4, 7)]:
        last = out[out.doc_id == i].iloc[-1]
        assert last["start_tok"] + last["n_tokens"] == n


def test_chunk_docs_matches_sql(docs):
    from search_engine_ray.pipelines.text import chunk_docs_ds

    got = (
        chunk_docs_ds(docs, chunk_tokens=32, stride=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    want = _sql(
        """
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts,
         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS L
  FROM documents
), c AS (
  SELECT doc_id, L, ts,
         unnest(range(0, CASE WHEN L = 0 THEN 0 WHEN L <= 32 THEN 1
                              ELSE CAST(ceil((L - 32) / 16.0) AS BIGINT) + 1 END)) AS chunk_id
  FROM t)
SELECT doc_id, chunk_id, chunk_id * 16 AS start_tok,
       LEAST(32, L - chunk_id * 16) AS n_tokens,
       array_to_string(ts[chunk_id * 16 + 1 : chunk_id * 16 + LEAST(32, L - chunk_id * 16)], ' ') AS chunk_text
FROM c ORDER BY doc_id, chunk_id
        """
    )
    assert got["chunk_text"].tolist() == want["chunk_text"].tolist()
    assert got["n_tokens"].tolist() == want["n_tokens"].tolist()


def test_sparse_knn_matches_sql(docs):
    from search_engine_ray.pipelines.text import sparse_knn_ds

    for cap, having in [(None, ""), (100, "HAVING count(*) <= 100")]:
        got = (
            sparse_knn_ds(docs, k=3, max_df=cap)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        want = _sql(
            f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS term FROM documents)
  WHERE length(term) >= 2 GROUP BY doc_id, term),
df AS (SELECT term FROM tf GROUP BY term {having}),
p AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS nbr_id, sum(a.tf * b.tf)::BIGINT AS dot
  FROM tf a JOIN tf b USING (term) JOIN df USING (term)
  WHERE a.doc_id <> b.doc_id GROUP BY a.doc_id, b.doc_id),
r AS (SELECT doc_id, nbr_id, dot,
             row_number() OVER (PARTITION BY doc_id ORDER BY dot DESC, nbr_id) AS rank
      FROM p)
SELECT doc_id, nbr_id, dot, rank FROM r WHERE rank <= 3 ORDER BY doc_id, rank
            """
        )
        assert got["nbr_id"].tolist() == want["nbr_id"].tolist(), cap
        assert got["dot"].tolist() == want["dot"].tolist(), cap


def test_sparse_knn_df_cap_drops_hot_terms(ray_session):
    """A term above the df cap contributes nothing; rare terms still pair."""
    from search_engine_ray.pipelines.text import sparse_knn_ds

    rows = [
        {"doc_id": 0, "text": "hot rare1 rare1"},
        {"doc_id": 1, "text": "hot rare1"},
        {"doc_id": 2, "text": "hot other"},
        {"doc_id": 3, "text": "hot other"},
    ]
    out = (
        sparse_knn_ds(rd.from_items(rows), k=2, max_df=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # 'hot' (df=4 > 3) is dropped everywhere: 0-1 pair only via rare1
    # (dot = 2*1), 2-3 only via other (dot = 1)
    pairs = {
        (r.doc_id, r.nbr_id): r.dot for r in out.itertuples()
    }
    assert pairs == {(0, 1): 2, (1, 0): 2, (2, 3): 1, (3, 2): 1}


def test_facet_counts(ray_session):
    from search_engine_ray.pipelines.text import facet_counts_ds

    rows = [
        {"text": "Table query plan", "source": "a", "lang": "en"},
        {"text": "table only here", "source": "a", "lang": "en"},
        {"text": "query table cost", "source": "b", "lang": "de"},
        {"text": "nothing relevant", "source": "b", "lang": "de"},
    ]
    out = (
        facet_counts_ds(rd.from_items(rows), ["table", "query"])
        .to_pandas()
        .sort_values(["source", "lang"])
        .reset_index(drop=True)
    )
    # case-insensitive conjunctive match: rows 0 and 2
    assert out.to_dict("records") == [
        {"source": "a", "lang": "en", "n_docs": 1},
        {"source": "b", "lang": "de", "n_docs": 1},
    ]
    none = facet_counts_ds(rd.from_items(rows), ["absent"]).to_pandas()
    assert len(none) == 0


def _bpe_reference(word_freqs, n_merges):
    """Plain-Python BPE (Sennrich et al.) over a word-frequency dict with
    (count DESC, pair ASC) tie-break — the pinning reference."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = vocab[w]
            for x, y in zip(s[:-1], s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), n = best
        merges.append((a, b, n))
        for w in vocab:
            s, out, j = vocab[w], [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            vocab[w] = out
    return merges


def test_bpe_train_matches_reference(ray_session):
    from search_engine_ray.pipelines.text import bpe_train_ds

    rows = [
        {"text": "lower lower lowest low low low"},
        {"text": "newer newest new new wider wide wide"},
        {"text": "lower newest low wide wider lowest"},
    ]
    got = (
        bpe_train_ds(rd.from_items(rows), n_merges=8)
        .to_pandas()
        .sort_values("merge_rank")
        .reset_index(drop=True)
    )
    # reference over the same word-frequency table (lowercased whitespace
    # tokens, same as the pipeline's tokenizer on this clean input)
    freqs = {}
    for r in rows:
        for w in r["text"].split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _bpe_reference(freqs, 8)
    assert [
        (r["left"], r["right"], r["freq"]) for _, r in got.iterrows()
    ] == want
    assert got["merge_rank"].tolist() == list(range(1, len(want) + 1))


def test_bpe_train_sf(docs):
    """Corpus-scale smoke at sf0.001: deterministic reruns, sane merges."""
    from search_engine_ray.pipelines.text import bpe_train_ds

    a = bpe_train_ds(docs, n_merges=5).to_pandas()
    b = bpe_train_ds(docs, n_merges=5).to_pandas()
    assert a.equals(b)
    assert len(a) == 5
    assert (a["freq"] >= 2).all()
    # each merged symbol is the concatenation of its halves' characters
    assert ((a["left"] + a["right"]).str.len() > 1).all()


def test_cdc_chunks_edit_robustness(ray_session):
    """The CDC property fixed windows lack: a head insertion leaves the
    tail chunks' TEXTS unchanged (boundaries are content-anchored)."""
    from search_engine_ray.pipelines.text import cdc_chunk_docs_ds

    base = " ".join(f"tok{i}" for i in range(60))
    edited = "inserted words here " + base
    out = (
        cdc_chunk_docs_ds(
            rd.from_items(
                [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": edited}]
            ),
            k=2,
            modulus=4,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    a = out[out.doc_id == 0]["chunk_text"].tolist()
    b = out[out.doc_id == 1]["chunk_text"].tolist()
    # chunks partition the tokens
    assert " ".join(a) == base and " ".join(b) == edited
    # every chunk of the original whose content starts after the edit
    # window reappears verbatim in the edited doc's chunk set
    shared = set(a) & set(b)
    assert len(shared) >= len(a) - 2, (a, b)


def test_cdc_chunks_partition_and_expected_len(docs):
    from search_engine_ray.pipelines.text import cdc_chunk_docs_ds, token_count_ds

    out = cdc_chunk_docs_ds(docs, k=2, modulus=8).to_pandas()
    ntok = token_count_ds(docs).to_pandas()
    # chunks partition every doc's tokens exactly
    got = out.groupby("doc_id")["n_tokens"].sum().sort_index()
    want = ntok.set_index("doc_id")["n_tokens"].sort_index()
    assert got.tolist() == want.tolist()
    # mean chunk length is in the ballpark of the modulus (geometric-ish)
    assert 4 <= out["n_tokens"].mean() <= 16


def test_md5_prefix64_arrow_matches_hashlib():
    """The buffer-walk 64-bit md5 prefix equals the hexdigest expression
    the SQL oracles pin (and >>4 equals the 15-hex / 60-bit form)."""
    import hashlib

    import pyarrow as pa

    from search_engine_ray.functions.textstats import md5_prefix64_arrow

    strs = ["", "a", "hello world", "tok1 tok2", "x" * 1000]
    got = md5_prefix64_arrow(pa.array(strs))
    want = [int(hashlib.md5(s.encode()).hexdigest()[:16], 16) for s in strs]
    assert got.tolist() == want
    want15 = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in strs]
    assert (got >> np.uint64(4)).tolist() == want15
    # sliced arrays walk the right buffer window
    sl = pa.array(strs).slice(2, 2)
    assert md5_prefix64_arrow(sl).tolist() == want[2:4]


def test_cdc_fast_vs_md5_boundary_stats(docs):
    """hash_method='fast' (vectorized polynomial, the scale default) and
    'md5' (oracle conformance) must produce chunkings with the SAME
    boundary statistics — both are uniform hashes over the same grams —
    even though the individual cut positions differ."""
    from search_engine_ray.pipelines.text import cdc_chunk_docs_ds, token_count_ds

    fast = cdc_chunk_docs_ds(docs, k=2, modulus=8).to_pandas()
    md5v = cdc_chunk_docs_ds(docs, k=2, modulus=8, hash_method="md5").to_pandas()
    ntok = token_count_ds(docs).to_pandas().set_index("doc_id")["n_tokens"]
    # both chunkings PARTITION every doc's tokens exactly
    for df in (fast, md5v):
        got = df.groupby("doc_id")["n_tokens"].sum().sort_index()
        assert got.tolist() == ntok.sort_index().tolist()
        # mean chunk length tracks the modulus (geometric boundary rule)
        assert 4 <= df["n_tokens"].mean() <= 16
    # cut densities agree within sampling noise (same expected 1/modulus)
    assert abs(len(fast) - len(md5v)) <= 0.2 * max(len(fast), len(md5v))


def test_cdc_fast_edit_robustness(ray_session):
    """The content-anchored property holds for the fast hash too."""
    from search_engine_ray.pipelines.text import cdc_chunk_docs_ds

    base = " ".join(f"tok{i}" for i in range(60))
    edited = "inserted words here " + base
    out = (
        cdc_chunk_docs_ds(
            rd.from_items(
                [{"doc_id": 0, "text": base}, {"doc_id": 1, "text": edited}]
            ),
            k=2,
            modulus=4,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
    )
    a = out[out.doc_id == 0]["chunk_text"].tolist()
    b = out[out.doc_id == 1]["chunk_text"].tolist()
    assert " ".join(a) == base and " ".join(b) == edited
    assert len(set(a) & set(b)) >= len(a) - 2, (a, b)
