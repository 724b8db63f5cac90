"""BPE tokenizer training + encoding over a document corpus.

The standard industrial shape (e.g. the classic Sennrich et al. 2016
recipe, as implemented by mainstream tokenizer libraries):

1. ONE distributed pass builds the word-frequency table — the only
   corpus-size-dependent stage (explode + hash agg, map-side partials).
2. The merge loop runs LOCALLY over that table: BPE statistics are a
   function of (word, freq) pairs only, and the distinct-word relation
   is vocab-bounded — millions of rows at 100 TB, not billions — so
   iterating on the driver is the correct plan, not a compromise
   (same bounded-state argument as `kmeans_fit`'s k-row driver state).
3. Encoding applies the learned merges corpus-wide as an Arrow-batched
   pandas stage (a declared Python stage, like the multimodal codecs:
   per-word memoized, batch-at-a-time, never row-at-a-time pickling).

No DuckDB oracle — iterative training, like `kmeans_fit`; the laws
(determinism, first-merge = top pair, lossless round-trip, token count
monotone in merges) are pinned in tests/test_retrieval.py.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F

EOW = "▁"  # end-of-word sentinel appended to each word


def word_freqs(docs: DataFrame) -> DataFrame:
    """The distributed stage: (word, freq) over the corpus."""
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(words: dict[tuple[str, ...], int]) -> Counter:
    c: Counter = Counter()
    for syms, freq in words.items():
        for a, b in zip(syms, syms[1:]):
            c[(a, b)] += freq
    return c


def bpe_fit(docs: DataFrame, n_merges: int = 16) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges from the corpus word-frequency table.

    Deterministic: the best pair is chosen by (count DESC, pair ASC) so
    ties never depend on hash order. Returns merges in rank order.
    """
    rows = word_freqs(docs).collect()  # vocab-bounded by construction
    words: dict[tuple[str, ...], int] = {}
    for r in rows:
        words[tuple(r.word) + (EOW,)] = (
            words.get(tuple(r.word) + (EOW,), 0) + r.freq
        )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts = _pair_counts(words)
        if not counts:
            break
        # deterministic choice: highest count, ties to the
        # lexicographically smallest pair (never hash order)
        top = max(counts.values())
        pair = min(p for p, c in counts.items() if c == top)
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words: dict[tuple[str, ...], int] = {}
        for syms, freq in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + freq
        words = new_words
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize the corpus with learned merges: (doc_id, n_words,
    n_tokens, tokens) via an Arrow-batched pandas stage with a per-word
    memo (real corpora repeat words heavily — the memo turns per-token
    work into per-distinct-word work within each batch)."""
    ranks = {p: i for i, p in enumerate(merges)}
    schema = "doc_id long, n_words long, n_tokens long, tokens array<string>"

    def batches(it):
        for pdf in it:
            memo: dict[str, list[str]] = {}
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks: list[str] = []
                wordlist = text.split(" ")
                for w in wordlist:
                    if w not in memo:
                        memo[w] = _encode_word(w, ranks)
                    toks.extend(memo[w])
                out.append(
                    {
                        "doc_id": doc_id,
                        "n_words": len(wordlist),
                        "n_tokens": len(toks),
                        "tokens": toks,
                    }
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "n_words", "n_tokens", "tokens"]
            )

    return docs.select("doc_id", "text").mapInPandas(batches, schema=schema)
