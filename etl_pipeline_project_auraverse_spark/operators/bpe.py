"""Distributed BPE (byte-pair-encoding) tokenizer training.

The classic Sennrich BPE algorithm, restructured for Spark the way
production tokenizer trainers actually scale: ONE distributed pass
compresses the corpus to a (word, freq) vocabulary table — the corpus
may be 100 TB, but the distinct-word table is orders of magnitude
smaller and is the only thing the merge loop ever touches. Each merge
round is then:

1. pair counting: explode each vocab word's adjacent symbol pairs
   weighted by word frequency → groupBy(pair).sum — one shuffle whose
   input is the vocab table, not the corpus;
2. argmax with deterministic tie-break (highest total frequency, then
   lexicographically smallest pair) — a 1-row collect;
3. merge application: a vectorized Arrow-batched function rewrites
   each word's symbol array (greedy left-to-right, the reference
   semantics) — map-side, no shuffle;
4. ``localCheckpoint`` — same lineage-truncation lesson as
   ``components.py``: without it round N's plan embeds all prior
   rounds and Catalyst analysis time explodes.

Per-round cost is O(vocab), independent of corpus size. The symbol
merge itself is inherently sequential within a word (overlaps:
``aaaa`` + merge ``aa`` → ``aa aa``, not three pairs), which is why
step 3 is a Python-side array rewrite rather than a Column expression
— documented hot-path exception, bounded by vocab size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_TOKEN = "</w>"  # word-final marker, as in the original algorithm


def _merge_word(symbols: list[str], left: str, right: str, joined: str) -> list[str]:
    """Greedy left-to-right single-pair merge (reference semantics)."""
    out: list[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(joined)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_vocabulary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols): the corpus compressed to its distinct
    words — the only distributed-scan step of BPE training."""
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = words.groupBy("word").agg(F.count("*").alias("freq"))
    # character split via sequence+substr keeps it in codegen
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, 1),
    )
    return vocab.select(
        "word", "freq", F.concat(chars, F.array(F.lit(END_TOKEN))).alias("symbols")
    )


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 50,
    min_pair_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``num_merges`` merges; returns
    ``[(left, right, pair_freq), ...]`` in merge order."""
    from etl_pipeline_project_auraverse_spark.cache import (
        local_checkpoint_tracked,
        unpersist_rdd_ids,
    )

    spark = docs.sparkSession
    vocab, live_ids = local_checkpoint_tracked(word_vocabulary(docs, text_col))
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(num_merges):
            # guard: a fully-merged word has ONE symbol; sequence(0, -1)
            # would DESCEND (yielding index -1 → null), so emit no pairs
            pair_structs = F.when(
                F.size("symbols") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("symbols") - 2),
                    lambda i: F.struct(
                        F.get("symbols", i).alias("l"),
                        F.get("symbols", i + 1).alias("r"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
            pairs = vocab.select("freq", F.explode(pair_structs).alias("p"))
            top = (
                pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), "l", "r")
                .limit(1)
                .collect()
            )
            if not top or top[0]["n"] < min_pair_freq:
                break
            left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
            merges.append((left, right, n))
            joined = left + right

            def apply_merge(
                batches: Iterator[pd.DataFrame], _l=left, _r=right, _j=joined
            ) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    pdf = pdf.copy()
                    pdf["symbols"] = [
                        _merge_word(list(s), _l, _r, _j) for s in pdf["symbols"]
                    ]
                    yield pdf

            # checkpoint the merged vocab (eager), THEN free the
            # superseded round's blocks — training holds exactly one
            # vocab copy in the block manager at any time
            vocab, new_ids = local_checkpoint_tracked(
                vocab.mapInPandas(
                    apply_merge,
                    schema="word string, freq long, symbols array<string>",
                )
            )
            unpersist_rdd_ids(spark, live_ids)
            live_ids = new_ids
    finally:
        # merges are plain Python — nothing distributed survives
        unpersist_rdd_ids(spark, live_ids)
    return merges


def encode_words(words: list[str], merges: list[tuple[str, str, int]]) -> list[list[str]]:
    """Apply learned merges to new words (driver-side helper; the
    distributed encode is the same function inside mapInPandas)."""
    out = []
    for w in words:
        symbols = list(w) + [END_TOKEN]
        for left, right, _ in merges:
            symbols = _merge_word(symbols, left, right, left + right)
        out.append(symbols)
    return out


def bpe_token_stats(docs: DataFrame, merges: list[tuple[str, str, int]],
                    text_col: str = "text") -> DataFrame:
    """Per-document token counts under the learned BPE — the REAL
    version of the length-based token estimate in queries/text.py.
    Merges ride to executors as a broadcast-sized closure constant."""
    mg = list(merges)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                words = [w for w in str(text).lower().strip().split() if w]
                toks = encode_words(words, mg)
                n_tokens = sum(len(t) for t in toks)
                rows.append((int(doc_id), len(words), n_tokens))
            yield pd.DataFrame(rows, columns=["doc_id", "n_words", "n_bpe_tokens"])

    return docs.select("doc_id", text_col).mapInPandas(
        run, schema="doc_id long, n_words long, n_bpe_tokens long"
    )
