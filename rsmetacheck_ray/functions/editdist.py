"""Edit-distance-1 similarity join machinery: FastSS deletion
neighborhoods (Bocek et al. 2007, "Fast Similarity Search in Large
Dictionaries").

Two strings are within Levenshtein distance 1 **iff** their key sets
``{s} ∪ deletions₁(s)`` intersect:

- ``dist 0``: the strings themselves collide;
- one substitution: deleting the substituted position from both sides
  yields the same string;
- one insertion/deletion: the shorter string IS a deletion variant of
  the longer one.

So the join is a hash-bucket shuffle on deletion-variant keys — the
same banding discipline as MinHash-LSH (``dedup.py``) but *lossless*
for k = 1 — followed by an exact in-bucket verification. Everything
here is vectorized over padded byte matrices: variant keys come from
prefix/suffix polynomial hashes (O(n·L) numpy column ops, never a
Python loop over rows), and the ≤1 check reduces to a Hamming count
(equal lengths) or a first-mismatch shifted-suffix compare (Δlen = 1).

The reference repo has no fuzzy matching at all (its nearest analog is
the exact-string duplicate scan in ``utils/pitfall_utils.py:21-37``);
this operator exists for the near-dup axis of the large-scale brief.

Distances are over BYTES. On ASCII keys (this lake's part names) that
equals the SQL ``levenshtein``'s per-character distance; multi-byte
UTF-8 text would count a substituted character as up to 4 edits.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Polynomial rolling-hash base/seed (FNV-1a constants). 64-bit wrap
# arithmetic throughout; equal variant strings ⇒ equal keys (no false
# negatives), and random collisions are verified away in-bucket.
_B = np.uint64(0x100000001B3)
_SEED = np.uint64(0xCBF29CE484222325)


def byte_matrix(arr: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint64 matrix of byte values + 1 (0 = padding) and the
    per-row byte lengths, built from an Arrow string array with one
    vectorized scatter (no per-row Python)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], off_dtype)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    lens = offs[1:] - offs[:-1]
    L = int(lens.max()) if n else 0
    M = np.zeros((n, max(L, 1)), np.uint64)
    if n and L:
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        row = np.repeat(np.arange(n, dtype=np.int64), lens)
        col = np.arange(offs[0], offs[-1], dtype=np.int64) - np.repeat(
            offs[:-1], lens
        )
        M[row, col] = data[offs[0] : offs[-1]].astype(np.uint64) + np.uint64(1)
    return M, lens


def deletion_keys(M: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """FastSS key set per row: the full-string hash plus one hash per
    single-deletion variant. Returns flattened ``(row_idx, key)``
    arrays of ``Σ (len_i + 1)`` entries.

    A deletion variant's key equals the key the variant string would
    hash to directly: with H(s) = seed·Bᵐ + Σ s[i]·B^{m-1-i}, deleting
    position d gives H(pre[0:d])·B^{len-1-d} + Σ_{i>d} s[i]·B^{len-1-i}
    — the suffix weights are already those of the shifted positions.
    """
    n, L = M.shape
    if n == 0:
        return np.array([], np.int64), np.array([], np.uint64)
    P = np.ones(L + 1, np.uint64)
    with np.errstate(over="ignore"):  # uint64 wrap is the hash design
        for k in range(1, L + 1):
            P[k] = P[k - 1] * _B
    pre = np.zeros((n, L + 1), np.uint64)
    pre[:, 0] = _SEED
    for d in range(L):
        pre[:, d + 1] = pre[:, d] * _B + M[:, d]
    # suf[:, j] = Σ_{i≥j, i<len} s[i]·B^{len-1-i} (variant-shifted weights)
    suf = np.zeros((n, L + 1), np.uint64)
    for d in range(L - 1, -1, -1):
        w = P[np.clip(lens - 1 - d, 0, None)]
        suf[:, d] = np.where(d < lens, M[:, d] * w + suf[:, d + 1], np.uint64(0))
    rows = [np.arange(n, dtype=np.int64)]
    keys = [pre[np.arange(n), lens]]  # identity key
    for d in range(L):
        valid = np.nonzero(lens > d)[0]
        if not len(valid):
            break
        keys.append(pre[valid, d] * P[lens[valid] - 1 - d] + suf[valid, d + 1])
        rows.append(valid)
    return np.concatenate(rows), np.concatenate(keys)


def within_edit1(
    M: np.ndarray, lens: np.ndarray, ia: np.ndarray, ib: np.ndarray
) -> np.ndarray:
    """Exact ``levenshtein ≤ 1`` verdict for candidate row pairs
    (ia, ib) over a shared byte matrix — vectorized across pairs.

    Equal lengths: distance ≤ 1 ⟺ Hamming ≤ 1 (one substitution).
    Δlen = 1: ⟺ the shorter is a deletion of the longer, checked as
    prefix-equal up to the first mismatch then shifted-suffix equal.
    Δlen ≥ 2 (possible only via hash collisions): False.
    """
    npairs = len(ia)
    res = np.zeros(npairs, bool)
    if not npairs:
        return res
    la, lb = lens[ia], lens[ib]
    dl = np.abs(la - lb)
    A, Bm = M[ia], M[ib]
    same = dl == 0
    if same.any():
        mism = (A[same] != Bm[same]).sum(axis=1)
        res[np.nonzero(same)[0][mism <= 1]] = True
    sel = dl == 1
    if sel.any():
        a_longer = (la >= lb)[:, None]
        X = np.where(a_longer, A, Bm)[sel]
        Y = np.where(a_longer, Bm, A)[sel]
        m = np.maximum(la, lb)[sel]  # longer length; shorter = m - 1
        L = M.shape[1]
        neq = X != Y
        # first mismatch always exists ≤ m-1: at col m-1, X holds a
        # real byte (+1 ≥ 1) while Y holds padding 0
        f = neq.argmax(axis=1)
        k = np.arange(L, dtype=np.int64)[None, :]
        idx_x = f[:, None] + 1 + k
        idx_y = f[:, None] + k
        validc = idx_x < m[:, None]
        np.clip(idx_x, 0, L - 1, out=idx_x)
        np.clip(idx_y, 0, L - 1, out=idx_y)
        eq = np.take_along_axis(X, idx_x, 1) == np.take_along_axis(Y, idx_y, 1)
        res[sel] = (eq | ~validc).all(axis=1)
    return res


def levenshtein_ref(a: str, b: str) -> int:
    """Plain O(len·len) reference implementation (tests only)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
