"""The deterministic MP4 synthesizer must round-trip through the real
box parser to exactly the closed-form parameters its SQL oracle
recomputes — this is the contract that makes ``q_mp4_video_metadata``
oracle-checkable."""

from __future__ import annotations

from etl_pipeline_project_auraverse_spark.operators.mp4_meta import (
    parse_mp4,
    sample_times,
)
from etl_pipeline_project_auraverse_spark.operators.mp4_synth import (
    doc_video_params,
    synth_doc_mp4,
    synthesize_mp4_column,
)


def test_roundtrip_matches_closed_form():
    for doc_id in (0, 1, 7, 42, 419, 4998):
        p = doc_video_params(doc_id)
        meta = parse_mp4(synth_doc_mp4(doc_id))
        assert meta["major_brand"] == "isom"
        vide = next(t for t in meta["tracks"] if t["handler"] == "vide")
        soun = next(t for t in meta["tracks"] if t["handler"] == "soun")
        n = p["n1"] + p["n2"]
        assert vide["width"] == p["width"]
        assert vide["height"] == p["height"]
        assert vide["codec"] == "avc1"
        assert vide["n_samples"] == n
        assert vide["stts"] == [
            (p["n1"], p["delta1"]),
            (p["n2"], p["delta2"]),
        ]
        assert vide["sizes"] == [
            p["size_base"] + i * p["size_step"] for i in range(n)
        ]
        # uniform-stsz form decodes to a constant size list
        assert soun["codec"] == "mp4a"
        assert soun["sizes"] == [128] * 32


def test_sample_times_exact_three_decimals():
    # timescale 1000 + 5-tick deltas => every time is an exact
    # 3-decimal double, so Python round-to-6dp is the identity and the
    # oracle's integer/1000.0 reproduces it bit-for-bit
    p = doc_video_params(42)
    meta = parse_mp4(synth_doc_mp4(42))
    vide = next(t for t in meta["tracks"] if t["handler"] == "vide")
    times = sample_times(vide["stts"], vide["timescale"])
    t = 0
    for i, got in enumerate(times):
        assert got == t / 1000.0
        t += p["delta1"] if i < p["n1"] else p["delta2"]


def test_synthesize_mp4_column(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    rows = synthesize_mp4_column(df).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert bytes(r["content"]) == synth_doc_mp4(r["doc_id"])
