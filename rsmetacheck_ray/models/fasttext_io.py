"""From-scratch reader/writer for the public fastText binary model
format (``.bin``, FASTTEXT_FILEFORMAT v12) — the real-model tier for
the language-ID actor stage.

Why this exists: the gate's default langid is the deterministic
marker-density scorer (oracle-checked, no model file). On a real
cluster the same actor-pool stage would load a multi-hundred-MB
fastText lid model once per actor in ``__init__``. This module makes
that path REAL without network access: it implements the published
fastText on-disk layout (magic/version, args block, dictionary,
dense float32 input/output matrices — the layout of fastText's
``FastText::saveModel`` / ``Args::save`` / ``Dictionary::save`` /
``DenseMatrix::save``) plus the supervised scoring rule (mean of
input rows over word ids + hashed char-ngram bucket ids → output
matrix → argmax label, FNV-1a signed-char hashing exactly as
``Dictionary::hash``). ``write_fasttext_model`` generates a valid
file of arbitrary size so the per-actor load-once behavior is
testable in-sandbox; if the real ``fasttext`` lib is installed the
caller can load the same file with it instead (import-gated in
``stages/langid.py``).

No reference parity: the reference has no model stages at all; this
is SURVEY §2.4's "heavy model tier" escape hatch made concrete.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np

FASTTEXT_MAGIC = 793712314
FASTTEXT_VERSION = 12

# args block field order (Args::save): 12 int32s then one double
_ARGS_INTS = (
    "dim", "ws", "epoch", "min_count", "neg", "word_ngrams",
    "loss", "model", "bucket", "minn", "maxn", "lr_update_rate",
)


def ft_hash(s: str) -> int:
    """fastText Dictionary::hash — FNV-1a over SIGNED chars, uint32."""
    h = 2166136261
    for b in s.encode("utf-8"):
        if b >= 128:
            b -= 256  # int8_t cast, then sign-extended into uint32
        h = (h ^ (b & 0xFFFFFFFF)) & 0xFFFFFFFF
        h = (h * 16777619) & 0xFFFFFFFF
    return h


def char_ngrams(word: str, minn: int, maxn: int) -> list[str]:
    """Subword ngrams of ``<word>`` (with boundary brackets), lengths
    minn..maxn, excluding the full bracketed word itself — matching
    Dictionary::computeSubwords."""
    w = f"<{word}>"
    out = []
    n = len(w)
    for i in range(n):
        for ln in range(minn, maxn + 1):
            if i + ln > n:
                break
            ng = w[i : i + ln]
            if ng == w:
                continue
            out.append(ng)
    return out


@dataclass
class FastTextModel:
    dim: int
    bucket: int
    minn: int
    maxn: int
    words: list[str]          # vocab words, dictionary order
    labels: list[str]         # raw labels, e.g. "__label__en"
    input: np.ndarray         # (nwords + bucket, dim) float32
    output: np.ndarray        # (nlabels, dim) float32
    word_index: dict[str, int] | None = None

    def __post_init__(self):
        if self.word_index is None:
            self.word_index = {w: i for i, w in enumerate(self.words)}

    @property
    def nwords(self) -> int:
        return len(self.words)

    def token_ids(self, token: str) -> list[int]:
        """Input-matrix row ids for one token: the vocab row (if any)
        plus hashed subword bucket rows — the supervised predict path
        for in-vocab and OOV tokens alike."""
        ids = []
        wi = self.word_index.get(token)
        if wi is not None:
            ids.append(wi)
        if self.maxn > 0:
            for ng in char_ngrams(token, self.minn, self.maxn):
                ids.append(self.nwords + ft_hash(ng) % self.bucket)
        return ids

    def predict(self, tokens: list[str]) -> tuple[int, float]:
        """(label index, softmax confidence) for one document's
        tokens — hidden = mean of input rows, scores = output @ hidden
        (FastText::predict with k=1)."""
        ids: list[int] = []
        for t in tokens:
            ids.extend(self.token_ids(t))
        if not ids:
            return -1, 0.0
        hidden = self.input[np.asarray(ids, np.int64)].mean(
            axis=0, dtype=np.float64
        )
        scores = self.output.astype(np.float64) @ hidden
        k = int(scores.argmax())
        e = np.exp(scores - scores[k])
        return k, float(1.0 / e.sum())


def write_fasttext_model(
    path: str,
    words: list[str],
    labels: list[str],
    input_mat: np.ndarray,
    output_mat: np.ndarray,
    bucket: int,
    minn: int = 0,
    maxn: int = 0,
) -> None:
    """Serialize a supervised model in the fastText v12 binary layout.
    ``input_mat`` must be (len(words) + bucket, dim) float32."""
    dim = input_mat.shape[1]
    assert input_mat.shape[0] == len(words) + bucket
    assert output_mat.shape == (len(labels), dim)
    with open(path, "wb") as fh:
        fh.write(struct.pack("<ii", FASTTEXT_MAGIC, FASTTEXT_VERSION))
        args = {
            "dim": dim, "ws": 5, "epoch": 5, "min_count": 1, "neg": 5,
            "word_ngrams": 1, "loss": 3, "model": 3,  # softmax, sup
            "bucket": bucket, "minn": minn, "maxn": maxn,
            "lr_update_rate": 100,
        }
        fh.write(struct.pack("<" + "i" * 12, *(args[k] for k in _ARGS_INTS)))
        fh.write(struct.pack("<d", 1e-4))  # t (sampling threshold)
        # dictionary: words then labels, types 0/1, counts arbitrary
        size = len(words) + len(labels)
        fh.write(struct.pack("<iii", size, len(words), len(labels)))
        fh.write(struct.pack("<qq", size * 10, 0))  # ntokens, pruneidx
        for w in words:
            fh.write(w.encode("utf-8") + b"\x00")
            fh.write(struct.pack("<qb", 10, 0))
        for lb in labels:
            fh.write(lb.encode("utf-8") + b"\x00")
            fh.write(struct.pack("<qb", 10, 1))
        fh.write(struct.pack("<?", False))  # quant_input
        fh.write(struct.pack("<qq", *input_mat.shape))
        fh.write(np.ascontiguousarray(input_mat, np.float32).tobytes())
        fh.write(struct.pack("<?", False))  # qout
        fh.write(struct.pack("<qq", *output_mat.shape))
        fh.write(np.ascontiguousarray(output_mat, np.float32).tobytes())


def load_fasttext_model(path: str) -> FastTextModel:
    """Parse a v12 non-quantized supervised ``.bin``. The input matrix
    — the multi-hundred-MB part — is read into process memory (the
    per-actor state blob the actor-pool contract exists for). Appends
    this process's pid to ``$RSMC_MODEL_LOAD_LOG`` when set, so tests
    can assert load-once-per-actor."""
    with open(path, "rb") as fh:
        magic, version = struct.unpack("<ii", fh.read(8))
        if magic != FASTTEXT_MAGIC:
            raise ValueError(f"not a fastText model: magic {magic}")
        if version > FASTTEXT_VERSION:
            raise ValueError(f"unsupported fastText version {version}")
        ints = struct.unpack("<" + "i" * 12, fh.read(48))
        args = dict(zip(_ARGS_INTS, ints))
        struct.unpack("<d", fh.read(8))  # t
        size, nwords, nlabels = struct.unpack("<iii", fh.read(12))
        struct.unpack("<qq", fh.read(16))  # ntokens, pruneidx_size
        words: list[str] = []
        labels: list[str] = []
        for _ in range(size):
            raw = bytearray()
            while True:
                c = fh.read(1)
                if c == b"\x00" or not c:
                    break
                raw.extend(c)
            _count, etype = struct.unpack("<qb", fh.read(9))
            (labels if etype == 1 else words).append(raw.decode("utf-8"))
        (quant,) = struct.unpack("<?", fh.read(1))
        if quant:
            raise ValueError("quantized input matrices not supported")
        m, n = struct.unpack("<qq", fh.read(16))
        inp = np.fromfile(fh, dtype=np.float32, count=m * n).reshape(m, n)
        (qout,) = struct.unpack("<?", fh.read(1))
        if qout:
            raise ValueError("quantized output matrices not supported")
        mo, no = struct.unpack("<qq", fh.read(16))
        out = np.fromfile(fh, dtype=np.float32, count=mo * no).reshape(mo, no)
    log = os.environ.get("RSMC_MODEL_LOAD_LOG")
    if log is None and os.path.exists(path + ".loadlog.enable"):
        # env vars do not reach already-spawned Ray workers; a sibling
        # marker file lets tests enable per-process load logging
        log = path + ".loadlog"
    if log:
        with open(log, "a") as lf:
            lf.write(f"{os.getpid()}\n")
    assert len(words) == nwords and len(labels) == nlabels
    return FastTextModel(
        dim=args["dim"], bucket=args["bucket"], minn=args["minn"],
        maxn=args["maxn"], words=words, labels=labels,
        input=inp, output=out,
    )


def build_langid_model(
    path: str,
    dim_pad: int = 40,
    bucket: int = 2_000_000,
    noise: float = 1e-6,
    seed: int = 7,
) -> str:
    """Generate a deterministic supervised lid model over the gate's
    marker vocabulary, sized like a real lid model (~300 MB at the
    defaults): label axes are one-hot dims, each marker word's input
    row is the one-hot of its language, bucket rows are near-zero
    noise — so predictions reproduce marker-density argmax while the
    file exercises the full real-model load path."""
    from ..functions.vocab import MARKERS

    langs = sorted(MARKERS)
    words = sorted({w for ws in MARKERS.values() for w in ws}) + ["</s>"]
    labels = [f"__label__{lg}" for lg in langs]
    dim = max(dim_pad, len(langs))
    rng = np.random.default_rng(seed)
    inp = (noise * rng.standard_normal(
        (len(words) + bucket, dim)
    )).astype(np.float32)
    for k, lg in enumerate(langs):
        for w in MARKERS[lg]:
            row = words.index(w)
            inp[row] = 0.0
            inp[row, k] = 1.0
    out = np.zeros((len(labels), dim), dtype=np.float32)
    for k in range(len(labels)):
        out[k, k] = 1.0
    write_fasttext_model(path, words, labels, inp, out, bucket=bucket)
    return path
