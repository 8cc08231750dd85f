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
    return _train_merges(
        _word_freqs([r["t"] for r in rows]), n_merges, min_pair_freq
    )


def _rev_key(s: str) -> bytes:
    """Order-inverting byte key: complemented UTF-8 plus a 0xFF
    sentinel, so ``_rev_key(a) < _rev_key(b)  ⇔  a > b`` — including
    the prefix case ("ab" vs "abc", where the sentinel outranks any
    complemented byte). Lets the merge heap break count ties toward the
    lexicographically GREATEST pair (the same tie-break as
    ``max(counts.items(), key=lambda kv: (kv[1], kv[0]))``) while heap
    comparisons stay C-speed bytes compares — a Python ``__lt__``
    adapter here was 40% of training time."""
    return bytes(255 - b for b in s.encode("utf-8")) + b"\xff"


def _train_merges(
    freqs: dict[tuple[str, ...], int],
    n_merges: int,
    min_pair_freq: int,
) -> list[tuple[str, str]]:
    """The merge-learning loop, INCREMENTAL (round 8): the old spelling
    recounted every pair over the whole sample per merge —
    O(n_merges × sample chars), ~20 min for n_merges=2000 on a 3k-doc
    sample. Now pair counts update only for the words that actually
    contain the merged pair (a pair→words index), and the
    best-pair-by-(count, lexicographic) selection is a lazy max-heap:
    increments push one fresh entry per touched pair per merge,
    decrements push nothing (a stale-high entry pops early and
    reinserts at its true count), and pops discard entries whose
    recorded count no longer matches. Merge sequence is byte-identical
    to the full recount (same counts, same tie-break — pinned by the
    equality fuzz in tests), so saved sidecars stay valid."""
    import heapq

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set] = {}
    heap: list = []

    rev_cache: dict[str, bytes] = {}

    def entry(p: tuple[str, str], c: int):
        a = rev_cache.get(p[0])
        if a is None:
            a = rev_cache[p[0]] = _rev_key(p[0])
        b = rev_cache.get(p[1])
        if b is None:
            b = rev_cache[p[1]] = _rev_key(p[1])
        return (-c, a, b, p)

    for word, n in freqs.items():
        for p in zip(word, word[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            where.setdefault(p, set()).add(word)
    for p, c in pair_counts.items():
        heapq.heappush(heap, entry(p, c))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, _, _, pair = heapq.heappop(heap)
        c = pair_counts.get(pair)
        if c is None:
            continue  # pair eliminated since the push
        if c != -negc:
            # lazy update: decrements never push (they dominate the
            # update volume); a stale-HIGH entry pops early and
            # reinserts at its true count, so every live pair always
            # keeps an entry >= its truth and extract-max still holds
            heapq.heappush(heap, entry(pair, c))
            continue
        if c < min_pair_freq:
            break
        merges.append(pair)
        bumped: set = set()
        for word in where.pop(pair, set()):
            n = freqs.pop(word, None)
            if n is None:
                continue
            for p in zip(word, word[1:]):
                c2 = pair_counts.get(p, 0) - n
                if c2 <= 0:
                    pair_counts.pop(p, None)
                else:
                    pair_counts[p] = c2  # no push: lazy decrease
                s = where.get(p)
                if s is not None:
                    s.discard(word)
            new = _apply_merge(word, pair)
            freqs[new] = freqs.get(new, 0) + n
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                bumped.add(p)  # one push per pair AFTER the sweep
                where.setdefault(p, set()).add(new)
        for p in bumped:
            c2 = pair_counts.get(p)
            if c2 is not None:
                heapq.heappush(heap, entry(p, c2))
    return merges


def _encoder(merges: list[tuple[str, str]]):
    """Worker-side encode closure (nested per the shipping rule — the
    merge RANKS are rebuilt inside so workers never import this
    package). Applies merges in rank order per word — token-identical
    to the naive lowest-rank-leftmost rescan (pinned by the equality
    fuzz), but round 8 makes it practical at real vocab sizes:

    - **rank heap + linked list** per word: the old rescan was
      O(len²) rank probes per word; the heap pops the lowest-rank
      (then leftmost — same tie-break) candidate and only the two
      pairs adjacent to a merge get re-probed, O(len·log len);
    - **word memo** (Zipf skew: a few thousand distinct words cover
      most tokens): each UDF worker process caches ``word → tokens``
      across rows AND Arrow batches, cleared if it ever reaches
      ~256k entries so executor memory stays bounded.
    """
    # ranks built ONCE here (a plain dict riding the closure — still no
    # package references), not per document inside encode_text (round-6
    # review: an O(n_merges) dict rebuild per row in the hot path)
    import heapq

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    cache: dict = {}
    eow = "</w>"

    def encode_word(w):
        word = list(w) + [eow]
        n = len(word)
        if n == 1:
            return word
        nxt = list(range(1, n + 1))
        prv = list(range(-1, n - 1))
        alive = [True] * n
        heap = []
        for i in range(n - 1):
            r = ranks.get((word[i], word[i + 1]))
            if r is not None:
                heap.append((r, i))
        heapq.heapify(heap)
        while heap:
            r, i = heapq.heappop(heap)
            if not alive[i]:
                continue
            j = nxt[i]
            if j >= n or not alive[j]:
                continue
            if ranks.get((word[i], word[j])) != r:
                continue  # stale: one side already merged into
            word[i] = word[i] + word[j]
            alive[j] = False
            k = nxt[j]
            nxt[i] = k
            if k < n:
                prv[k] = i
            p = prv[i]
            if p >= 0:
                rp = ranks.get((word[p], word[i]))
                if rp is not None:
                    heapq.heappush(heap, (rp, p))
            if k < n:
                rk = ranks.get((word[i], word[k]))
                if rk is not None:
                    heapq.heappush(heap, (rk, i))
        return [t for t, a in zip(word, alive) if a]

    def encode_text(text):
        if text is None:
            return None
        out = []
        for w in text.lower().split():
            toks = cache.get(w)
            if toks is None:
                if len(cache) >= 262_144:
                    cache.clear()
                toks = encode_word(w)
                cache[w] = toks
            out.extend(toks)
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
