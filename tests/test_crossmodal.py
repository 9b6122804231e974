"""Cross-modal query semantics: the behaviors the oracle hash attests
indirectly, pinned directly — the decode path really runs (and is
flip-sensitive), image-dup clusters follow the synthesis contract, and
the alignment scores are genuine cosines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
from etl_pipeline_project_auraverse_spark.queries.crossmodal import (
    IMG_MOD,
    N_IMG_CLASSES,
    _decoded_gray,
)

load_all()


def test_bmp_roundtrip_is_flip_corrected():
    """The synthesis contract addresses pixels TOP-DOWN while BMP
    stores rows bottom-up; the decode must hand back top-down rows.
    Pinned at the unit level so an audit-query mismatch can be
    attributed."""
    from etl_pipeline_project_auraverse_spark.operators.multimodal import (
        synth_bmp_bytes,
    )

    d, w0, h0 = 9, 8, 6
    w, h, gray = _decoded_gray(synth_bmp_bytes(d, w0, h0))
    assert (w, h) == (w0, h0)
    for y in (0, h0 - 1):
        for x in (0, w0 - 1):
            assert gray[y, x] == (d * 31 + (y * w0 + x) * 7) % 256, (y, x)


def test_caption_audit_top_bottom_sums_differ(spark, sf_dir):
    """An un-flipped decode would swap top_sum/bottom_sum; assert they
    differ on enough rows for the swap to be detectable at all."""
    rows = QUERIES["q_image_caption_audit"](spark, sf_dir).collect()
    assert rows, "sampled image docs must exist"
    assert all(r["doc_id"] % IMG_MOD == 0 for r in rows)
    differing = sum(1 for r in rows if r["top_sum"] != r["bottom_sum"])
    assert differing > len(rows) // 2


def test_image_dup_clusters_follow_contract(spark, sf_dir):
    """Cluster census must equal the closed-form classes: one cluster
    per doc_id % N_IMG_CLASSES residue among image docs, sizes summing
    to the image-doc count, representative = smallest member."""
    from etl_pipeline_project_auraverse_spark.session import load_table

    rows = QUERIES["q_image_dup_caption_diversity"](spark, sf_dir).collect()
    img_ids = [
        r["doc_id"]
        for r in load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % IMG_MOD) == 0)
        .select("doc_id")
        .collect()
    ]
    by_cls: dict[int, list[int]] = {}
    for i in img_ids:
        by_cls.setdefault(i % N_IMG_CLASSES, []).append(i)
    assert len(rows) == len(by_cls)
    got = {r["rep_doc"]: r["n_docs"] for r in rows}
    want = {min(v): len(v) for v in by_cls.values()}
    assert got == want
    for r in rows:
        assert 1 <= r["n_distinct_captions"] <= r["n_docs"]
        assert r["n_dup_caption_rows"] == r["n_docs"] - r["n_distinct_captions"]


def test_alignment_scores_are_cosines(spark, sf_dir):
    rows = QUERIES["q_clip_stripe_alignment"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r["min_alignment"] <= r["avg_alignment"] <= r["max_alignment"] <= 1.0
        assert r["n_docs"] >= 1
