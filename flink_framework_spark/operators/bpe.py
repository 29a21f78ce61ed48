"""Byte-pair-encoding vocabulary training + distributed tokenization.

The tokenizer stage of an LLM data pipeline, Spark-shaped:

- **Training samples; it never scans the corpus.** BPE merge learning
  (Sennrich et al. 2016 — public algorithm) is a sequential greedy
  loop, so it runs driver-side over a BOUNDED deterministic sample
  (id-ordered ``train_cap`` docs — the same discipline as the IVF /
  langid / logreg trainers). This matches practice: production
  tokenizers train on a fixed sample, not the full 100 TB.
- **Application is embarrassingly parallel.** The learned merge table
  broadcasts with the serialized UDF (O(n_merges), tiny) and each
  document tokenizes independently in an Arrow-batched pandas UDF —
  one narrow pass, no shuffle. Greedy lowest-rank-first merging (the
  GPT-2 scheme) is deterministic, so outputs are golden-snapshot
  safe.

Word segmentation is whitespace (the fixtures are pre-clean);
end-of-word is marked with ``</w>`` so merges cannot cross word
boundaries — the classic formulation.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

EOW = "</w>"


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def bpe_train(
    df: DataFrame,
    text_col: str,
    order_col: str,
    n_merges: int = 60,
    train_cap: int = 4096,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from a bounded id-ordered sample.

    Returns ``[(left, right, pair_count), ...]`` in merge order. Ties
    on pair count break lexicographically (smallest pair wins) so the
    result is independent of dict iteration order.
    """
    sample = (
        df.orderBy(order_col).limit(train_cap).select(text_col).collect()
    )
    word_freq: Counter[str] = Counter()
    for r in sample:
        text = (r[0] or "").strip().lower()
        if text:
            word_freq.update(text.split(" "))
    vocab: dict[tuple[str, ...], int] = {}
    for w, n in word_freq.items():
        if w:
            vocab[_word_symbols(w)] = vocab.get(_word_symbols(w), 0) + n

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(_word_symbols(word))
    while len(syms) >= 2:
        best_rank = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_rank is None:
            break
        a, b = best_pair
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokenize(
    text: Column, merges: list[tuple[str, str, int]]
) -> Column:
    """Tokenize a text column with the learned merges — Arrow-batched
    pandas UDF (the merge loop is genuinely imperative), rank table
    captured by value. Returns array<string>."""
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").strip().lower().split(" "):
                if w:
                    toks.extend(_encode_word(w, ranks))
            out.append(toks)
        return pd.Series(out)

    return _tok(text)
