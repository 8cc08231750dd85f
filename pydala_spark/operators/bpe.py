"""Byte-pair encoding: train a merge table on a bounded corpus sample,
encode/count tokens distributed (north-star extension — BASELINE.json's
"token counting (whitespace + a BPE-ish regex)" made real: an actual
learned subword vocabulary, so token budgets and packing reflect what a
trained tokenizer would produce instead of whitespace word counts).

Design mirrors the ANN codebooks (operators/ann.py): TRAINING is a
driver-side loop over a bounded deterministic sample (BPE merge
learning is inherently sequential — each merge depends on the previous
— so "distributed training" would be vocab_size chained Spark jobs;
the standard practice, like k-means codebooks, is sample-train /
broadcast-apply). APPLICATION is Arrow-batched pandas UDFs with the
merge table shipped by closure — one scan, no shuffle, linear at any
corpus size.

Determinism: the sample is hash-ordered (md5 of the text — no RNG),
and merge ties break lexicographically, so the same corpus + params
always learn the same vocabulary. The merge table round-trips through
a JSON sidecar like the ANN codebooks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: end-of-word marker appended to each pre-token (the classic
#: Sennrich et al. 2016 convention) so merges cannot cross word
#: boundaries and decoding stays unambiguous.
EOW = "</w>"


def _pretokenize(text: str) -> list[str]:
    """Whitespace pre-tokenization, lowercased — the same unit
    :func:`~pydala_spark.operators.textstats.tokens` counts, so BPE
    token counts are comparable with the whitespace baseline."""
    return text.lower().split()


def _word_freqs(texts: list[str]) -> dict[tuple[str, ...], int]:
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in _pretokenize(t):
            key = tuple(w) + (EOW,)
            freqs[key] = freqs.get(key, 0) + 1
    return freqs


def _apply_merge(
    word: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(word):
        if i + 1 < len(word) and (word[i], word[i + 1]) == pair:
            out.append(word[i] + word[i + 1])
            i += 2
        else:
            out.append(word[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    sample_size: int = 10_000,
    min_pair_freq: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded, deterministic,
    hash-ordered sample of the corpus. Returns the ordered merge list
    (the entire model — apply with :func:`bpe_tokens` /
    :func:`bpe_token_count`, persist with :func:`save_bpe`).

    The sample is the ``sample_size`` docs with the smallest
    ``md5(text)`` — order-free, engine-portable determinism (no RNG, no
    zipWithIndex): re-running on the same corpus learns the identical
    vocabulary, and the sort pushes down as a TakeOrdered, so no full
    collect. Merges stop early when the best pair's frequency drops
    below ``min_pair_freq`` (merging hapax pairs memorizes the sample).
    """
    rows = (
        df.select(F.col(text_col).alias("t"))
        .where(F.col("t").isNotNull())
        .orderBy(F.md5("t"), "t")
        .limit(sample_size)
        .collect()
    )
    freqs = _word_freqs([r["t"] for r in rows])
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        # max by (count, lexicographic) — deterministic tie-break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        pair = best[0]
        merges.append(pair)
        freqs = {
            _apply_merge(word, pair): n for word, n in freqs.items()
        }
    return merges


def _encoder(merges: list[tuple[str, str]]):
    """Worker-side encode closure (nested per the shipping rule — the
    merge RANKS are rebuilt inside so workers never import this
    package). Applies merges in rank order per word, the standard
    greedy BPE apply."""
    # ranks built ONCE here (a plain dict riding the closure — still no
    # package references), not per document inside encode_text (round-6
    # review: an O(n_merges) dict rebuild per row in the hot path)
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def encode_text(text):
        if text is None:
            return None
        out = []
        eow = "</w>"
        for w in text.lower().split():
            word = list(w) + [eow]
            while len(word) > 1:
                best_rank, best_i = None, None
                for i in range(len(word) - 1):
                    r = ranks.get((word[i], word[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                word[best_i:best_i + 2] = [word[best_i] + word[best_i + 1]]
            out.extend(word)
        return out

    return encode_text


def bpe_tokens(col: str | Column, merges: list[tuple[str, str]]) -> Column:
    """Array of BPE subword tokens (Arrow-batched pandas UDF; the merge
    table rides the closure — no join, no shuffle)."""
    from pyspark.sql import types as T

    enc = _encoder(merges)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _run(s):
        return s.map(enc)

    return _run(F.col(col) if isinstance(col, str) else col)


def bpe_token_count(
    col: str | Column, merges: list[tuple[str, str]]
) -> Column:
    """BPE token count per row — drop-in for
    :func:`~pydala_spark.operators.textstats.token_count` wherever a
    learned-vocabulary budget is wanted (shard packing, mixture
    recipes). NULL text counts NULL, like the whitespace counter."""
    from pyspark.sql import types as T

    enc = _encoder(merges)

    @F.pandas_udf(T.LongType())
    def _run(s):
        return s.map(lambda t: None if t is None else len(enc(t)))

    return _run(F.col(col) if isinstance(col, str) else col)


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist the merge table as a JSON sidecar (ANN-codebook
    convention: any session can load and encode without retraining)."""
    import json

    from pydala_spark.utils.pathops import PathOps

    PathOps(spark, path).write_text(
        path, json.dumps({"merges": [list(m) for m in merges]})
    )


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    import json

    from pydala_spark.utils.pathops import PathOps

    return [
        (a, b)
        for a, b in json.loads(PathOps(spark, path).read_text(path))["merges"]
    ]
