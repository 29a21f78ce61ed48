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

    # Incremental pair maintenance (r11, guide §1.2 step 2 — per-task
    # work): the naive loop recounted EVERY pair of EVERY vocab word
    # per merge, O(n_merges * corpus vocab); with 60 merges over the
    # sf0.1 sample that recount was ~2 s of pure driver Python and
    # >95% of it touched words the merge cannot change. Keep a live
    # pair->count table plus an inverted pair->words index; each merge
    # then rewrites only the words that actually CONTAIN the merged
    # pair, subtracting their old pair counts and adding the new ones.
    # Counts stay exact at every step (same numbers the recount
    # produced), so the (-count, pair) tie-broken argmin — and hence
    # the merge table — is bit-identical; zero-count entries are
    # purged so the "no pairs left" stop condition matches too.
    # Equivalence is pinned by tests/test_bpe.py::test_train_matches_recount.
    pairs: Counter[tuple[str, str]] = Counter()
    where: dict[tuple[str, str], set[tuple[str, ...]]] = {}
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] += n
            where.setdefault(p, set()).add(syms)

    def _retract(syms: tuple[str, ...], n: int) -> None:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            left = pairs[p] - n
            if left <= 0:
                del pairs[p]
            else:
                pairs[p] = left
            ws = where.get(p)
            if ws is not None:
                ws.discard(syms)
                if not ws:
                    del where[p]

    def _insert(syms: tuple[str, ...], n: int) -> None:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pairs[p] += n
            where.setdefault(p, set()).add(syms)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not pairs:
            break
        (a, b) = min(pairs, key=lambda p: (-pairs[p], p))
        cnt = pairs[(a, b)]
        merges.append((a, b, cnt))
        merged = a + b
        touched = list(where.get((a, b), ()))
        for syms in touched:
            n = vocab.pop(syms)
            _retract(syms, n)
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
            prev = vocab.get(key)
            if prev is None:
                vocab[key] = n
                _insert(key, n)
            else:
                # same rewritten form already present: bump the shared
                # count (pair counts scale linearly in n, so insert
                # covers the delta)
                vocab[key] = prev + n
                _insert(key, n)
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
    # greedy encoding is a pure function of the word, and natural
    # text repeats words heavily (Zipf) — memoize in the closure (r11,
    # guide §4.5 heavyweight-state discipline: the dict deserializes
    # empty with the UDF and then lives for the task, amortizing
    # across every batch the task sees)
    memo: dict[str, list[str]] = {}

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").strip().lower().split(" "):
                if w:
                    enc = memo.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        memo[w] = enc
                    toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return _tok(text)
