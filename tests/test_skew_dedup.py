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
- MinHash/LSH band join: band buckets are capped at BAND_BUCKET_CAP
  members (the smallest doc_ids — deterministic, mirrored in the
  oracle), so a megacluster bucket contributes at most CAP^2/2 pairs
  instead of m^2/2. Pair COVERAGE beyond the cap is the
  connected-components pass's job — 64 members of a megacluster keep
  it connected; clustering needs connectivity, not every pair.
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


def test_hot_band_bucket_pair_output_is_capped(spark, tmp_path):
    """300 byte-identical docs form one hot band bucket (same key in
    all 4 bands). The bucket cap must bound the pair output at
    CAP*(CAP-1)/2 — the BAND_BUCKET_CAP smallest doc_ids, a
    deterministic choice the oracle mirrors — instead of the m^2/2
    blow-up, and every emitted pair is still a true duplicate."""
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
    assert len(rows) == cap * (cap - 1) // 2, len(rows)
    assert all(r["jaccard"] == 1.0 and r["n_matching_minhashes"] == 8 for r in rows)
    # deterministic survivor set: the cap keeps the smallest doc_ids
    members = {r["doc_a"] for r in rows} | {r["doc_b"] for r in rows}
    assert members == set(range(cap)), sorted(members)[:70]
    # the capped megacluster core stays CONNECTED — cluster recovery
    # through connected components still sees one component
    parent = list(range(cap))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        parent[find(r["doc_a"])] = find(r["doc_b"])
    assert len({find(i) for i in range(cap)}) == 1
    # the runtime defense for residual hot-key probe work
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


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
