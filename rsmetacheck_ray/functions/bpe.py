"""BPE tokenizer training and application — the learn-the-tokenizer
step of a pretraining pipeline (Sennrich et al. 2016 byte-pair
encoding, the algorithm behind GPT-2/RoBERTa-class vocabularies).

Real BPE trainers (sentencepiece, HF tokenizers) do NOT iterate over
the raw corpus: they iterate over the WORD-FREQUENCY TABLE, which Zipf
keeps tiny relative to the corpus. The distributed part of training is
therefore exactly one corpus pass:

 1. **word counts** (corpus-scale, distributed): the ``top_tokens``
    partial-combine discipline — per-batch Arrow ``group_by`` over the
    batch's unique vocabulary, a keyed shuffle of partials only, and a
    per-block top-k prune bounding the driver table to
    ``max_vocab_words`` rows under the total (count DESC, word ASC)
    order (pruning the long tail is standard practice and the knob is
    explicit).
 2. **merge loop** (driver, bounded): greedy pair merging over the
    symbolized word table — pair scores are weighted by word count,
    ties break on the lexicographically smallest (left, right) pair so
    training is bitwise deterministic. O(num_merges × vocab) with an
    incremental pair-count update touching only words that contain the
    merged pair.

``apply_bpe`` runs the learned merges over a corpus as a broadcast
stage (cached tasks): per batch the text splits once (canonical
``\\S+``), the batch's UNIQUE words are encoded once each through a
per-worker memo (Zipf ⇒ unique ≪ tokens), and per-document BPE token
counts come from one ``bincount``.

Not SQL-expressible (iterative greedy state); pinned instead by a
brute-force reference implementation, the published toy example, and
determinism tests (tests/test_bpe.py).

The end-of-word marker ``</w>`` follows the original paper: merges
never cross word boundaries, and a word-final symbol is distinct from
the same symbol mid-word.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd

EOW = "</w>"

DEFAULT_MERGES = 200
DEFAULT_MAX_VOCAB = 50_000


def corpus_word_counts(
    ds: rd.Dataset, text_col: str = "text", max_vocab_words: int = DEFAULT_MAX_VOCAB
) -> list[tuple[str, int]]:
    """(word, count) rows, top ``max_vocab_words`` by (count DESC,
    word ASC) — the bounded frequency table BPE trains on. One
    partial-combined corpus pass; only per-batch-unique words shuffle."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from .tokenize import split_ws_tokens

    def partial(b: pa.Table) -> pa.Table:
        flat = split_ws_tokens(b.column(text_col)).flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        g = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")]
        )
        return pa.table(
            {
                "word": g.column("word"),
                "n": pc.cast(g.column("word_count"), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def block_topk(b: pa.Table) -> pa.Table:
        if b.num_rows <= max_vocab_words:
            return b
        idx = pc.sort_indices(
            b, sort_keys=[("n", "descending"), ("word", "ascending")]
        )
        return b.take(idx.slice(0, max_vocab_words))

    # HARD bound before anything reaches the driver: per-block prune,
    # then a distributed sort+limit (the top_tokens discipline) — the
    # driver list is <= max_vocab_words rows however large the corpus
    # vocabulary is (a per-batch prune alone never fires at default
    # block sizes and would materialize the full distinct vocabulary).
    bounded = (
        counts.map_batches(block_topk, batch_format="pyarrow")
        .sort(["n", "word"], descending=[True, False])
        .limit(max_vocab_words)
    )
    rows: list[tuple[str, int]] = []
    for b in bounded.iter_batches(batch_format="pyarrow"):
        rows.extend(zip(b.column("word").to_pylist(), b.column("n").to_pylist()))
    rows.sort(key=lambda wn: (-wn[1], wn[0]))
    return rows


def learn_merges(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE merge list from a word-frequency table — the
    reference algorithm, deterministic: highest total pair count wins,
    ties break on the lexicographically smallest (left, right)."""
    # symbolized words: tuple of symbols, last carries the EOW marker
    words: list[list[str]] = []
    counts: list[int] = []
    for w, n in word_counts:
        if not w:
            continue
        syms = list(w[:-1]) + [w[-1] + EOW]
        words.append(syms)
        counts.append(int(n))

    # pair -> total count, and pair -> set of word indices containing it
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(wi: int, sign: int) -> None:
        syms, n = words[wi], counts[wi]
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + sign * n
            if sign > 0:
                pair_words.setdefault((a, b), set()).add(wi)

    for wi in range(len(words)):
        add_word_pairs(wi, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # deterministic argmax: max total count, ties -> smallest pair
        best, best_c = None, 0
        for pair, c in pair_counts.items():
            if c > best_c or (c == best_c and c > 0 and (best is None or pair < best)):
                best, best_c = pair, c
        if best is None:
            break
        merges.append(best)
        a, b = best
        merged = a + b
        # rewrite only the words that contain the pair
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            add_word_pairs(wi, -1)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
            add_word_pairs(wi, +1)
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word (lowest-rank pair first — the
    standard BPE encode order)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def train_bpe(
    ds: rd.Dataset,
    num_merges: int = DEFAULT_MERGES,
    text_col: str = "text",
    max_vocab_words: int = DEFAULT_MAX_VOCAB,
) -> rd.Dataset:
    """Learn a BPE merge table from a corpus → Dataset of
    (rank, left, right, merged) rows in merge order."""
    wc = corpus_word_counts(ds, text_col, max_vocab_words)
    merges = learn_merges(wc, num_merges)
    return rd.from_arrow(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int64()),
                "left": pa.array([a for a, _ in merges], pa.string()),
                "right": pa.array([b for _, b in merges], pa.string()),
                "merged": pa.array([a + b for a, b in merges], pa.string()),
            }
        )
    )


class _BPEApply:
    """Broadcast apply stage (cached tasks): merge ranks fetched once
    per worker; per batch the UNIQUE words encode once each through a
    memo, then one bincount yields per-document BPE token counts."""

    def __init__(self, merges_ref, id_col: str, text_col: str):
        merges = ray.get(merges_ref)
        self.ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        self.memo: dict[str, int] = {}
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .tokenize import tokens_with_doc_index

        ids = pc.cast(batch.column(self.id_col), pa.int64())
        n = batch.num_rows
        doc_idx, denc = tokens_with_doc_index(batch.column(self.text_col))
        if denc is None:
            return pa.table(
                {
                    self.id_col: ids,
                    "n_bpe_tokens": pa.array([0] * n, pa.int64()),
                }
            )
        per_word = np.empty(len(denc.dictionary), dtype=np.int64)
        for i, w in enumerate(denc.dictionary.to_pylist()):
            c = self.memo.get(w)
            if c is None:
                c = len(encode_word(w, self.ranks))
                self.memo[w] = c
            per_word[i] = c
        tok_per_inst = per_word[denc.indices.to_numpy(zero_copy_only=False)]
        out = np.bincount(doc_idx, weights=tok_per_inst, minlength=n)
        return pa.table(
            {
                self.id_col: ids,
                "n_bpe_tokens": pa.array(out.astype(np.int64), pa.int64()),
            }
        )


def apply_bpe(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(doc_id, n_bpe_tokens) for every document under the learned
    merge table (the token-budget accounting pass)."""
    from .taskcache import cached_stage

    merges_ref = ray.put(list(merges))
    return ds.map_batches(
        cached_stage(_BPEApply, merges_ref, id_col, text_col),
        batch_format="pyarrow",
    )
