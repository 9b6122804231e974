"""Skew stress for the dedup joins: a corpus with one pathologically
hot shingle / band bucket must stay bounded.

The 100 TB failure mode: an inverted-index self-join on a shingle
shared by m documents emits O(m^2) pairs — one stopword-heavy n-gram
at m=10^6 is 10^12 pairs from a single key. The engine's defenses,
asserted here on a deliberately skewed fixture:

- n-gram Jaccard: shingles with df > DF_CAP are dropped from the
  representation (index AND sizes), capping any shingle's pair
  contribution at DF_CAP^2 while true near-dups (built from rare
  shingles) still surface.
- MinHash/LSH band join: per bucket, the BAND_BUCKET_CAP smallest
  doc_ids pair all-ways (the dense core) and every member BEYOND the
  cap emits one star edge to the bucket representative (the bucket's
  min doc_id) — CAP^2/2 + (m - CAP) pairs total, linear in m, with NO
  member orphaned: connected-components recovery sees the whole
  megacluster as one component (a cap that simply drops beyond-cap
  members silently returns megacluster duplicates as singletons).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.dedup import DF_CAP, _shingle_hashes

load_all()

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _write_documents(spark, path: str, texts: list[str]) -> None:
    rows = [(i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(f"{path}/documents.parquet")


@pytest.fixture(scope="module")
def skewed_dir(spark, tmp_path_factory):
    """2000 docs all sharing ONE hot trigram (df=2000 >> DF_CAP) plus
    per-doc unique filler; docs 2000/2001 are true near-dups built from
    rare shingles only."""
    d = str(tmp_path_factory.mktemp("skewed_docs"))
    hot = "common header boilerplate"
    texts = [
        f"{hot} unique{i}a unique{i}b unique{i}c unique{i}d" for i in range(2000)
    ]
    near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts.append(near)  # doc 2000
    texts.append(near + " lam")  # doc 2001: jaccard 8/9 with doc 2000
    _write_documents(spark, d, texts)
    return d


def test_fixture_is_genuinely_skewed(spark, skewed_dir):
    from etl_pipeline_project_auraverse_spark.session import load_table

    raw_df = (
        _shingle_hashes(load_table(spark, skewed_dir, "documents"))
        .groupBy("h")
        .count()
    )
    assert raw_df.agg(F.max("count")).collect()[0][0] == 2000


def test_df_cap_bounds_hot_shingle_join(spark, skewed_dir):
    """After the DF cap, NO indexed shingle may exceed DF_CAP docs —
    the invariant that bounds every shingle's pair fan-out at DF_CAP^2
    regardless of corpus skew."""
    from etl_pipeline_project_auraverse_spark.session import load_table

    raw = _shingle_hashes(load_table(spark, skewed_dir, "documents"))
    dfs = raw.groupBy("h").agg(F.count("*").alias("df"))
    hot = dfs.filter(F.col("df") > DF_CAP)
    capped = raw.join(F.broadcast(hot.select("h")), "h", "left_anti")
    max_df = (
        capped.groupBy("h").agg(F.count("*").alias("df")).agg(F.max("df")).collect()
    )[0][0]
    assert max_df is not None and max_df <= DF_CAP


def test_jaccard_on_skewed_corpus_finds_only_true_dups(spark, skewed_dir):
    """The full query on the skewed corpus: the hot shingle generates
    ZERO pairs (it's dropped, not joined), while the rare-shingle
    near-dup pair still surfaces with its exact capped-space jaccard."""
    rows = QUERIES["q_dedup_ngram_jaccard"](spark, skewed_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert set(pairs) == {(2000, 2001)}, sorted(pairs)[:10]
    assert pairs[(2000, 2001)] == round(8 / 9, 6)


def test_hot_band_bucket_pair_output_is_linear_and_connected(spark, tmp_path):
    """300 byte-identical docs form one hot band bucket (same key in
    all 4 bands). Candidate generation must emit the dense core —
    CAP*(CAP-1)/2 pairs among the BAND_BUCKET_CAP smallest doc_ids —
    plus exactly one star edge per beyond-cap member to the bucket
    representative: CAP^2/2 + (m - CAP) total, linear in m instead of
    the m^2/2 blow-up, with EVERY member present (no silent recall
    collapse) and the whole megacluster one connected component."""
    from etl_pipeline_project_auraverse_spark.queries.dedup import BAND_BUCKET_CAP

    m = 300
    text = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [text] * m + [
        f"filler{i}x filler{i}y filler{i}z filler{i}w" for i in range(200)
    ]
    d = str(tmp_path)
    _write_documents(spark, d, texts)
    rows = QUERIES["q_dedup_minhash_lsh"](spark, d).collect()
    cap = BAND_BUCKET_CAP
    assert len(rows) == cap * (cap - 1) // 2 + (m - cap), len(rows)
    assert all(r["jaccard"] == 1.0 and r["n_matching_minhashes"] == 8 for r in rows)
    # NO member orphaned: all m duplicates appear in at least one pair
    members = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert members == set(range(m)), (len(members), sorted(members)[:5])
    # linearity: every beyond-cap member rides ONE star edge to the
    # bucket representative (min doc_id = 0), never a pairwise fan-out
    star = [r for r in rows if r["doc_b"] >= cap]
    assert len(star) == m - cap
    assert all(r["doc_a"] == 0 for r in star)
    # the megacluster stays CONNECTED — cluster recovery through
    # connected components sees ONE component covering all m docs
    parent = list(range(m))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        parent[find(r["doc_a"])] = find(r["doc_b"])
    assert len({find(i) for i in range(m)}) == 1
    # the runtime defense for residual hot-key probe work
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_incremental_dedup_new_side_never_capped(spark, tmp_path):
    """A megacluster whose duplicates span the new/old batch split:
    every NEW-batch duplicate must still get is_dup=TRUE even when the
    bucket overflows BAND_BUCKET_CAP — only the OLD-corpus index side
    is capped, so new docs always probe (the r11 symmetric cap evicted
    new docs from their own buckets and silently returned FALSE)."""
    from etl_pipeline_project_auraverse_spark.queries.dedup import (
        BAND_BUCKET_CAP,
        INC_NEW_MOD,
        INC_NEW_REM,
    )

    m = 300  # >> CAP; doc_ids 0..299, so 60 land in the new batch
    text = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [text] * m
    d = str(tmp_path)
    _write_documents(spark, d, texts)
    rows = {r["new_id"]: r for r in QUERIES["q_dedup_incremental_minhash"](spark, d).collect()}
    new_ids = [i for i in range(m) if i % INC_NEW_MOD == INC_NEW_REM]
    assert len(new_ids) > BAND_BUCKET_CAP / INC_NEW_MOD  # bucket genuinely hot
    assert set(rows) == set(new_ids)
    # EVERY new duplicate is caught, including ids far beyond the cap
    assert all(rows[i]["is_dup"] for i in new_ids), [
        i for i in new_ids if not rows[i]["is_dup"]
    ][:5]
    assert all(rows[i]["best_jaccard"] == 1.0 for i in new_ids)
    # the candidate fan-out per new doc is bounded by the old-index cap
    assert all(rows[i]["n_candidates"] <= BAND_BUCKET_CAP for i in new_ids)


def test_reservoir_skew_prefilter_bounds_window_input(spark, tmp_path):
    """Per-lang reservoir under extreme language skew: the salted local
    top-K pre-filter must hand the global rank window at most
    K * SALTS rows per language — regardless of how dominant one
    language is — while producing exactly the naive single-window
    answer."""
    from pyspark.sql.window import Window as W

    from etl_pipeline_project_auraverse_spark.functions.text import h28
    from etl_pipeline_project_auraverse_spark.queries.curation import (
        RESERVOIR_K,
        RESERVOIR_SALTS,
        reservoir_candidates,
    )
    from etl_pipeline_project_auraverse_spark.session import load_table

    # 5000 'en' docs vs a handful of others — the web's real shape
    rows = [(i, f"text {i}", "en", "synthetic", 10) for i in range(5000)]
    rows += [(5000 + i, f"rare {i}", lang, "synthetic", 8)
             for i, lang in enumerate(["de", "de", "fr", "es", "ja"])]
    d = str(tmp_path)
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(4).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    docs = load_table(spark, d, "documents")

    cand_per_lang = {
        r["lang"]: r["n"]
        for r in reservoir_candidates(docs, RESERVOIR_K)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert cand_per_lang["en"] <= RESERVOIR_K * RESERVOIR_SALTS
    assert all(n <= RESERVOIR_K * RESERVOIR_SALTS for n in cand_per_lang.values())

    got = [
        (r["lang"], r["doc_id"], r["rk"])
        for r in QUERIES["q_sample_reservoir_per_lang"](spark, d).collect()
    ]
    h = h28(F.col("doc_id").cast("string"))
    naive_w = W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    naive = [
        (r["lang"], r["doc_id"], r["rk"])
        for r in docs.select(
            "lang", "doc_id", F.row_number().over(naive_w).cast("long").alias("rk")
        )
        .filter(F.col("rk") <= RESERVOIR_K)
        .orderBy("lang", "rk")
        .collect()
    ]
    assert got == naive
    assert len({lang for lang, _, _ in got}) == 5  # every lang represented


def test_crossmodal_span_cap_bounds_hot_span_join(spark, tmp_path):
    """A span shared by every document must NOT enter the cross-modal
    pair join: the SPAN_DF_CAP filter drops it from candidate
    generation (the same bounded-fan-out rule as the Jaccard DF cap),
    so the hot corpus yields zero pairs while a genuinely duplicated
    rare span still pairs its two documents."""
    from etl_pipeline_project_auraverse_spark.queries.sequences import (
        SPAN_DF_CAP,
        SPAN_W,
    )

    d = str(tmp_path / "span_docs")
    # every doc opens with the same 4-word span (df = 300 >> cap);
    # docs 300/301 also share a RARE 8-word tail (2 spans, df = 2)
    hot = "one two three four"
    rare = "red green blue cyan pink gold teal grey jade ruby onyx opal"
    texts = [f"{hot} filler{i}a filler{i}b filler{i}c filler{i}d" for i in range(300)]
    texts.append(f"{hot} {rare}")  # doc 300
    texts.append(f"{hot} {rare}")  # doc 301
    _write_documents(spark, d, texts)
    # vec ids must cover the doc ids for the embedding join
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 10) for j in range(64)], "x") for i in range(302)],
        "vec_id long, embedding array<double>, label string",
    )
    emb.coalesce(2).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    pairs = QUERIES["q_crossmodal_dedup_conflict"](spark, d).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(300, 301)}
    (row,) = pairs
    # identical embeddings -> cosine 1.0 -> no conflict flagged
    assert row["n_shared_spans"] >= 2
    assert row["conflict"] is False
    assert SPAN_DF_CAP < 300  # the fixture genuinely exceeds the cap
