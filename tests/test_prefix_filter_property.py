"""Property: the prefix-filter similarity join is COMPLETE — for any
corpus, every pair with Jaccard >= the threshold over the engine's
3-gram shingle space appears in its output (checked against a pure-
Python brute force on the same shingle definition)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.dedup import PF_J

load_all()

WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]
DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _shingles(text: str) -> set[str]:
    w = text.split()
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _brute_pairs(texts: list[str]) -> set[tuple[int, int]]:
    sh = [_shingles(t) for t in texts]
    out = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter and inter / (len(sh[a]) + len(sh[b]) - inter) >= PF_J:
                out.add((a, b))
    return out


docs_st = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=3, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=docs_st)
def _check(spark, tmp_root, texts):
    d = f"{tmp_root}/{uuid.uuid4().hex}"
    rows = [(i, t, "en", "syn", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in QUERIES["q_dedup_prefix_filter_jaccard"](spark, d).collect()
    }
    want = _brute_pairs(texts)
    assert got == want, (texts, got, want)


def test_prefix_filter_complete_on_random_corpora(spark, tmp_path_factory):
    tmp_root = str(tmp_path_factory.mktemp("pf_prop"))
    _check(spark, tmp_root)
