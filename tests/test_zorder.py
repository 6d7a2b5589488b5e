"""Z-order (Morton) layout key: the magic-mask bit spread equals a
per-bit reference, the composed zkey interleaves exactly (user bit i →
zkey bit 2i, cents bit i → zkey bit 2i+1), and the query's top-k is
deterministic under ties."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsmetacheck_ray.pipelines.queries import _spread16_np, q_events_zorder


def _spread_ref(x: int) -> int:
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def test_spread_matches_bitwise_reference():
    rng = np.random.default_rng(9)
    xs = np.concatenate(
        [
            np.array([0, 1, 2, 3, 0xFFFF, 0x8000, 0x5555, 0xAAAA]),
            rng.integers(0, 1 << 16, size=500),
        ]
    ).astype(np.int64)
    got = _spread16_np(xs)
    for x, g in zip(xs.tolist(), got.tolist()):
        assert g == _spread_ref(x), x
    # masking: only the low 16 bits participate
    assert _spread16_np(np.array([0x12345], np.int64))[0] == _spread_ref(
        0x2345
    )


def test_zorder_interleave_and_topk(ray_session, tmp_path):
    # events with tiny user/cents values: zkey can be computed by hand
    rows = [
        # (event_id, user, value) -> zkey = spread(u) | spread(c)<<1
        (0, 3, 0.01),  # spread(3)=5, spread(1)<<1=2 -> 7
        (1, 0, 0.00),  # 0
        (2, 1, 0.01),  # 1 | 2 = 3
        (3, 0, 0.01),  # 2
        (4, 1, 0.00),  # 1
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([0] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array(["x"] * len(rows), pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))
    got = q_events_zorder(str(tmp_path), k=3).take_all()
    assert got == [
        {"event_id": 1, "zkey": 0},
        {"event_id": 4, "zkey": 1},
        {"event_id": 3, "zkey": 2},
    ]
