"""Train and pin the unigram language-model fixture for the CCNet-style
perplexity filter (Wenzek et al. 2020: score documents under a trained
LM, keep the head/middle of the perplexity distribution).

Unigram log-probs are stored as MILLINAT integers (round(1000 * ln p))
so distributed sums are exact (long addition is order-independent;
double summation is not), which is what lets the ``ppl`` oracle family
hash-match across engines. Top-``VOCAB`` tokens by frequency under the
default Unicode tokenizer; everything else scores ``unk``.

Usage: python tools/train_lm_fixture.py [sf_dir]
"""

from __future__ import annotations

import json
import math
import posixpath
import re
import sys
from collections import Counter

import pyarrow.parquet as pq

VOCAB = 512
FIXTURE = posixpath.join(
    posixpath.dirname(posixpath.dirname(posixpath.abspath(__file__))),
    "pydala_spark", "queries", "fixtures", "unigram_lm_millinats.json",
)

# the operator's default tokenizer, mirrored offline (textstats.
# word_regex_tokens: folded lower + \p{L}\p{N}' runs). Python's re has
# no \p classes; [^\W_] on a lowered string matches letters/digits
# across scripts equivalently for this corpus.
_TOKEN = re.compile(r"[^\W_]+(?:'[^\W_]+)*", re.UNICODE)


def tokenize(text: str) -> list[str]:
    return _TOKEN.findall(text.translate(str.maketrans("Σİ", "σi")).lower())


MIN_BIGRAM = 5
BACKOFF_MILLINATS = -693  # ln(0.5): simple stupid-backoff penalty


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    t = pq.read_table(posixpath.join(sf_dir, "documents.parquet"))
    counts: Counter[str] = Counter()
    pair_counts: Counter[tuple[str, str]] = Counter()
    for text in t["text"].to_pylist():
        if text:
            toks = tokenize(text)
            counts.update(toks)
            pair_counts.update(zip(toks, toks[1:]))
    total = sum(counts.values())
    top = counts.most_common(VOCAB)
    vocab = {
        tok: round(1000.0 * math.log(c / total)) for tok, c in top
    }
    # unk: one order of magnitude under the rarest in-vocab token
    unk = min(vocab.values()) - 2303  # -ln(10) in millinats
    # bigrams (round 5): conditional log-probs for pairs seen at least
    # MIN_BIGRAM times and whose both sides are in-vocab; everything
    # else backs off to unigram(cur) + BACKOFF_MILLINATS (stupid
    # backoff — the scalable KenLM-lite rule). Keys are 'prev cur'
    # (space-joined: the tokenizer class cannot produce a space)
    bigrams = {
        f"{a} {b}": round(1000.0 * math.log(n / counts[a]))
        for (a, b), n in pair_counts.items()
        if n >= MIN_BIGRAM and a in vocab and b in vocab
    }
    with open(FIXTURE, "w") as f:
        json.dump({"total_tokens": total, "unk_millinats": unk,
                   "backoff_millinats": BACKOFF_MILLINATS,
                   "vocab": vocab, "bigrams": bigrams}, f)
    print(f"wrote {FIXTURE}: {len(vocab)} tokens, {len(bigrams)} bigrams, "
          f"unk={unk}")


if __name__ == "__main__":
    main()
