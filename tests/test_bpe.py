"""Distributed BPE training vs an independent pure-Python reference
implementation of the Sennrich algorithm (same tie-break rules)."""

from __future__ import annotations

from collections import Counter

from etl_pipeline_project_auraverse_spark.operators.bpe import (
    END_TOKEN,
    bpe_token_stats,
    encode_words,
    train_bpe,
)


def _reference_bpe(texts: list[str], num_merges: int, min_pair_freq: int = 2):
    """Textbook dict-based BPE: word-freq table, weighted pair counts,
    argmax with (count desc, pair lexicographic asc) tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                vocab[w] += 1
    symbols = {w: list(w) + [END_TOKEN] for w in vocab}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for w, freq in vocab.items():
            s = symbols[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += freq
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), n = best
        if n < min_pair_freq:
            break
        merges.append((left, right, n))
        joined = left + right
        for w in symbols:
            s = symbols[w]
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            symbols[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new new new",
    "wide wider widest wide",
    "low newer low lower newest wide",
]


def test_merges_match_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    got = train_bpe(docs, num_merges=12)
    want = _reference_bpe(TEXTS, num_merges=12)
    assert got == want
    assert len(got) == 12


def test_batched_rounds_fewer_than_merges(spark):
    """The whole point of batching: N merges must cost far fewer than N
    distributed rounds, with byte-identical output to sequential BPE."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    stats: dict = {}
    got = train_bpe(docs, num_merges=20, stats=stats, driver_vocab_cap=0)
    assert got == _reference_bpe(TEXTS, num_merges=20)
    assert stats["rounds"] < len(got), (stats, len(got))


def test_batched_matches_reference_on_random_corpora(spark):
    """Differential fuzz over small random corpora: conflict-stops,
    self-pairs (aa), tie-breaks, and adjacency-bound truncation must all
    collapse to exactly the sequential merge sequence."""
    import random

    # "ab" is the adversarial alphabet: constant symbol conflicts and
    # self-pairs (aa/bb) exercise the batch-stop rules hardest
    for seed, alphabet in [(0, "abc"), (1, "abc"), (2, "abc"), (3, "ab"), (4, "ab")]:
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(8)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = train_bpe(docs, num_merges=10, driver_vocab_cap=0)
        want = _reference_bpe(texts, num_merges=10)
        assert got == want, (seed, alphabet, got, want)


def _zipf_corpus(seed=7, nvocab=400, ndocs=60):
    """Natural-shaped corpus: syllable-built vocabulary with Zipf
    (Pareto) word frequencies — the distribution BPE actually trains
    on, unlike the adversarial tiny-alphabet fixtures."""
    import random

    rng = random.Random(seed)
    syll = ["ta", "re", "in", "on", "an", "er", "es", "te", "al", "st", "ar",
            "nt", "or", "le", "se", "ed", "de", "co", "ro", "li", "ra", "ri",
            "io", "en", "ti", "at", "he", "th"]
    vocab, seen = [], set()
    while len(vocab) < nvocab:
        w = "".join(rng.choice(syll) for _ in range(rng.randint(1, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return [
        " ".join(vocab[min(int(rng.paretovariate(1.1)), nvocab - 1)]
                 for _ in range(rng.randint(30, 120)))
        for _ in range(ndocs)
    ]


def test_zipf_batch_factor_at_least_4x(spark):
    """The cascade must commit >= 4 merges per distributed round on
    natural-shaped text (the VERDICT r4 scale criterion), while staying
    byte-identical to sequential BPE."""
    texts = _zipf_corpus()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    stats: dict = {}
    got = train_bpe(docs, num_merges=100, stats=stats, driver_vocab_cap=0)
    assert got == _reference_bpe(texts, num_merges=100)
    assert len(got) == 100
    assert stats["rounds"] <= len(got) / 4, stats


def test_joined_token_collision_matches_reference(spark):
    """An accepted merge's JOINED string can equal a symbol that is
    already live in the vocab via a different merge path (abc+d and
    ab+cd both yield 'abcd'): the earlier merge then re-creates
    adjacencies of that existing symbol and inflates later candidates'
    counts. _select_batch must treat the joined string as used, or the
    batch diverges from sequential on count ties."""
    texts = [
        # family 1: drives a+b→ab, ab+c→abc, abc+d→abcd (symbol 'abcd')
        "abc abc abc abc abcd abcd abcd",
        "ab ab ab ab ab ab",
        # family 2: keeps 'ab cd' adjacency alive so ('ab','cd') — whose
        # joined string is also 'abcd' — stays a candidate, with 'x'
        # following so ('abcd','x') pairs exist on both merge paths
        "abcdx abcdx abcdx abcdx",
        "cd cd cd cd cdx cdx",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = train_bpe(docs, num_merges=15, driver_vocab_cap=0)
    want = _reference_bpe(texts, num_merges=15)
    assert got == want, (got, want)


def test_single_symbol_alphabet_fuzz(spark):
    """Alphabet 'a': every merge's joined string ('aa', 'aaa', 'aaaa',
    ...) collides with other live symbols and candidates constantly —
    the hardest stress for the joined-string-is-used rule."""
    import random

    for seed in (11, 12, 13):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "a" * rng.randint(1, 9) for _ in range(rng.randint(4, 14))
            )
            for _ in range(10)
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = train_bpe(docs, num_merges=12, driver_vocab_cap=0)
        want = _reference_bpe(texts, num_merges=12)
        assert got == want, (seed, got, want)


def test_encode_applies_merges_in_order(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = train_bpe(docs, num_merges=8)
    [enc] = encode_words(["lowest"], merges)
    # every merge output must reconstruct the word
    assert "".join(enc).replace(END_TOKEN, "") == "lowest"
    assert len(enc) < len("lowest") + 1  # something actually merged


def test_token_stats_distributed(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    merges = train_bpe(docs, num_merges=8)
    rows = {r["doc_id"]: r for r in bpe_token_stats(docs, merges).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for i, t in enumerate(TEXTS):
        words = t.split()
        assert rows[i]["n_words"] == len(words)
        # BPE tokens: fewer than character count, at least one per word
        n_chars = sum(len(w) + 1 for w in words)
        assert len(words) <= rows[i]["n_bpe_tokens"] < n_chars


def test_convergence_stops_below_min_freq(spark):
    docs = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    # every pair occurs once -> below min_pair_freq=2 -> no merges
    assert train_bpe(docs, num_merges=5) == []


def test_train_bpe_frees_all_checkpoints(spark):
    """Iterative training must hold at most one vocab checkpoint at a
    time and free everything on return — otherwise a long training run
    accumulates one materialized vocab copy per merge round."""
    from etl_pipeline_project_auraverse_spark.cache import persistent_rdd_ids

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    before = persistent_rdd_ids(spark)
    train_bpe(docs, num_merges=6, driver_vocab_cap=0)  # distributed rounds
    assert persistent_rdd_ids(spark) - before == set()
    train_bpe(docs, num_merges=6)  # local fast path frees its checkpoint too
    assert persistent_rdd_ids(spark) - before == set()


def test_fixed_merge_replace_chain_equals_greedy_encode():
    """The SQL-expressible chained-replace tokenizer (sentinel-wrapped
    symbols, one replace per merge) must equal greedy left-to-right
    merge application for the frozen merge table."""
    import random

    from etl_pipeline_project_auraverse_spark.queries.curation import (
        BPE_FIXED_MERGES,
        _S,
    )

    def replace_chain_tokens(word: str) -> int:
        s = "".join(_S + c + _S for c in word) + _S + END_TOKEN + _S
        for l, r in BPE_FIXED_MERGES:
            s = s.replace(_S + l + _S + _S + r + _S, _S + l + r + _S)
        return s.count(_S) // 2

    rng = random.Random(0)
    words = ["lower", "newest", "now", "ower", "strow", "erer", "ee", "snow"]
    words += [
        "".join(rng.choice("eronwst</>aei") for _ in range(rng.randint(1, 10)))
        for _ in range(3000)
    ]
    enc = encode_words(words, [(l, r, 0) for l, r in BPE_FIXED_MERGES])
    for w, e in zip(words, enc):
        assert replace_chain_tokens(w) == len(e), (w, e)


def test_fixed_merge_query_matches_trained_tokenizer(spark, sf_dir):
    """q_bpe_apply_fixed_merges (pure Column expressions) must produce
    the same counts as the mapInPandas tokenizer applying the same
    frozen merges."""
    from etl_pipeline_project_auraverse_spark.queries import QUERIES, load_all
    from etl_pipeline_project_auraverse_spark.queries.curation import BPE_FIXED_MERGES
    from etl_pipeline_project_auraverse_spark.session import load_table

    load_all()
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in QUERIES["q_bpe_apply_fixed_merges"](spark, sf_dir).collect()
    }
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    want = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_stats(
            docs, [(l, r, 0) for l, r in BPE_FIXED_MERGES]
        ).collect()
    }
    assert got == want


def test_over_cap_fallback_stays_byte_identical(spark, monkeypatch):
    """When the triple/quad collect would exceed the driver budget,
    the round falls back to the prefix rule — output must STILL be
    byte-identical to sequential, just in more rounds."""
    from etl_pipeline_project_auraverse_spark.operators import bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "MAX_STATS_ROWS", 1)
    texts = _zipf_corpus(seed=3, nvocab=80, ndocs=12)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    stats: dict = {}
    got = bpe_mod.train_bpe(docs, num_merges=12, stats=stats, driver_vocab_cap=0)
    assert got == _reference_bpe(texts, num_merges=12)
    assert len(got) == 12


def test_tiny_window_relevance_filtering_stays_identical(spark):
    """With a tiny candidate window most triples/quads fall OUTSIDE the
    window-relevance collect filter — the cascade must still be
    byte-identical (the floor rule stops it before any unseen stat
    could matter)."""
    for seed, cand in ((21, 4), (22, 6), (23, 8)):
        texts = _zipf_corpus(seed=seed, nvocab=120, ndocs=16)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        got = train_bpe(docs, num_merges=15, batch_candidates=cand, driver_vocab_cap=0)
        want = _reference_bpe(texts, num_merges=15)
        assert got == want, (seed, cand)


def test_local_and_distributed_paths_identical(spark):
    """The driver-local fast path (vocab fits DRIVER_VOCAB_CAP) and the
    distributed cascade must return the SAME merge list — both claim
    byte-identity to sequential BPE, so they must agree with each other
    on every corpus shape, and stats["rounds"] == 0 marks which ran."""
    for seed in (31, 32):
        texts = _zipf_corpus(seed=seed, nvocab=150, ndocs=20)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        st_local: dict = {}
        st_dist: dict = {}
        local = train_bpe(docs, num_merges=20, stats=st_local)
        dist = train_bpe(docs, num_merges=20, stats=st_dist, driver_vocab_cap=0)
        assert local == dist, seed
        assert st_local["rounds"] == 0
        assert st_dist["rounds"] >= 1
