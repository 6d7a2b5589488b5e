"""BPE training/application (functions/bpe.py) — pinned by the
published toy example, a naive-reference differential (recount pairs
from scratch each iteration, validating the incremental update), and
encode/apply parity."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from rsmetacheck_ray.functions.bpe import (
    EOW,
    apply_bpe,
    corpus_word_counts,
    encode_word,
    learn_merges,
    train_bpe,
)


def _naive_learn(word_counts, num_merges):
    """Reference implementation: full pair recount every iteration."""
    words = {}
    for w, n in word_counts:
        if w:
            words[tuple(list(w[:-1]) + [w[-1] + EOW])] = (
                words.get(tuple(list(w[:-1]) + [w[-1] + EOW]), 0) + n
            )
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, n in words.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += n
        if not pairs:
            break
        best = min(
            (p for p, c in pairs.items() if c == max(pairs.values()))
        )
        merges.append(best)
        a, b = best
        new_words = {}
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def test_classic_example_first_merges():
    merges = learn_merges(SENNRICH, 4)
    # (e,s)=9 ties (s,t</w>)=9 -> lexicographically smallest first;
    # then the merged (es,t</w>)=9; then (l,o)=7
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)
    assert merges[2] == ("l", "o")


def test_incremental_matches_naive_recount():
    rng = np.random.default_rng(7)
    vocab = ["".join(chr(97 + c) for c in rng.integers(0, 5, rng.integers(1, 7))) for _ in range(60)]
    wc = [(w, int(n)) for w, n in Counter(vocab).items()]
    assert learn_merges(wc, 30) == _naive_learn(wc, 30)


def test_encode_word_uses_rank_order():
    merges = learn_merges(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # "lowest" was never seen whole, but its pieces were
    toks = encode_word("lowest", ranks)
    assert "".join(toks) == "lowest" + EOW
    assert toks[-1] == "est" + EOW  # the learned suffix unit survives
    assert encode_word("", ranks) == []


def test_corpus_word_counts_and_cap(ray_session):
    texts = ["b b b c", "a a b", "c a"]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    wc = corpus_word_counts(ds, max_vocab_words=2)
    # b=4, a=3, c=2 -> top-2, (count DESC, word ASC) order
    assert wc == [("b", 4), ("a", 3)]


def test_apply_bpe_counts_match_encode(ray_session):
    texts = ["low lower lowest", "newest widest", ""]
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(3), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    merges = learn_merges(SENNRICH, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    out = (
        apply_bpe(ds, merges)
        .to_pandas()
        .sort_values("doc_id")["n_bpe_tokens"]
        .tolist()
    )
    exp = [
        sum(len(encode_word(w, ranks)) for w in t.split()) for t in texts
    ]
    assert out == exp


def test_train_bpe_end_to_end(ray_session):
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(SENNRICH)), pa.int64()),
                "text": pa.array(
                    [" ".join([w] * n) for w, n in SENNRICH], pa.string()
                ),
            }
        )
    )
    df = train_bpe(ds, num_merges=3).to_pandas()
    assert df["merged"].tolist() == ["es", "est" + EOW, "lo"]
    assert df["rank"].tolist() == [0, 1, 2]
