"""Zero-copy access to Arrow variable-width buffers — the ONE place
that knows string/binary offsets are int32 but large_string /
large_binary offsets are int64. Every reader that touches
``arr.buffers()`` directly goes through here; two of the three
original inline copies of this logic hardcoded int32 and silently
produced garbage negative lengths on large types."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LARGE = (pa.types.is_large_string, pa.types.is_large_binary)


def varwidth_offsets(arr: pa.Array) -> np.ndarray:
    """Offsets of a (large_)string/(large_)binary array as int64,
    sliced to the array's own window (len(arr)+1 entries)."""
    width = np.int64 if any(f(arr.type) for f in _LARGE) else np.int32
    return np.frombuffer(arr.buffers()[1], dtype=width)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)


def varwidth_bytes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data, offsets): the array's value bytes as one uint8 view
    (values sit back-to-back per the offsets layout, starting at 0)
    plus the rebased int64 offsets."""
    offs = varwidth_offsets(arr)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offs[0] : offs[-1]
    ]
    return data, offs - offs[0]
