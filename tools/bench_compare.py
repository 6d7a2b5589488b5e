"""Compare two bench runs with window-factor normalization.

The sandbox host swings ~1.8x window-to-window on unchanged code
(BASELINE.md), so a raw per-query ratio is meaningless. This tool
computes each query's new/old ratio, takes the MEDIAN ratio as the
window factor, and flags only queries whose ratio exceeds
``--threshold`` x that median — i.e. queries that got slower relative
to everything else, which is what an actual regression looks like.

Accepts either the driver's BENCH_r{N}.json wrapper (with a captured
stdout ``tail``) or a raw ``bench.py`` stdout file / JSON line.

    PYTHONPATH=/root/repo python tools/bench_compare.py OLD NEW
    python tools/bench_compare.py BENCH_r03.json /tmp/bench_now.json
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def _queries_from_text(text: str) -> dict[str, float] | None:
    """Best queries dict found in any JSON line of ``text``."""
    best: dict[str, float] | None = None
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        q = obj.get("queries")
        if isinstance(q, dict) and q and (best is None or len(q) > len(best)):
            best = {k: float(v) for k, v in q.items()}
    return best


_META_KEYS = frozenset(
    "metric value unit docs docs_per_sec warmup_sec html_docs "
    "html_gate_sec html_docs_per_sec warc_gate_sec warc_docs_per_sec "
    "runs_per_measurement sf num_cpus n rc cpus queries_n "
    "queries_median_sec queries_max_sec".split()
)


def _salvage_fragments(text: str) -> dict[str, float]:
    """Pull per-query timings out of a TRUNCATED stdout capture (the
    driver keeps only a ~2 KB tail, which can cut the result line
    mid-JSON). Accepts both the medians form (``"name": 0.42``) and
    the spread form (``"name": [0.4, 0.5]`` — the min is used)."""
    import re

    out: dict[str, float] = {}
    for m in re.finditer(r'"([a-z][a-z0-9_]*)":\s*([0-9.]+)[,}\s]', text):
        k, v = m.group(1), float(m.group(2))
        if k not in _META_KEYS:
            out[k] = v
    for m in re.finditer(
        r'"([a-z][a-z0-9_]*)":\s*\[([0-9.]+),\s*([0-9.]+)\]', text
    ):
        k = m.group(1)
        if k not in _META_KEYS and k not in out:
            out[k] = float(m.group(2))
    return out


def load_queries(path: str) -> dict[str, float]:
    text = open(path).read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        obj = None
    if isinstance(obj, dict):
        # raw bench result line
        if isinstance(obj.get("queries"), dict) and obj["queries"]:
            return {k: float(v) for k, v in obj["queries"].items()}
        # driver wrapper: look in parsed, then in the captured tail
        parsed = obj.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict) \
                and parsed["queries"]:
            return {k: float(v) for k, v in parsed["queries"].items()}
        tail = obj.get("tail")
        if isinstance(tail, str):
            q = _queries_from_text(tail) or _salvage_fragments(tail)
            if q:
                return q
        raise SystemExit(f"{path}: no per-query timings found")
    q = _queries_from_text(text) or _salvage_fragments(text)
    if not q:
        raise SystemExit(f"{path}: no per-query timings found")
    return q


def compare(
    old: dict[str, float], new: dict[str, float], threshold: float
) -> dict:
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two runs")
    ratios = {k: new[k] / old[k] if old[k] > 0 else float("inf")
              for k in common}
    window = statistics.median(ratios.values())
    flagged = sorted(
        (
            {
                "query": k,
                "old_sec": old[k],
                "new_sec": new[k],
                "ratio": round(ratios[k], 3),
                "normalized": round(ratios[k] / window, 3),
            }
            for k in common
            if ratios[k] > threshold * window
            # sub-100ms pairs are pure scheduling jitter
            and max(old[k], new[k]) >= 0.1
        ),
        key=lambda r: -r["normalized"],
    )
    return {
        "n_common": len(common),
        "n_old_only": len(set(old) - set(new)),
        "n_new_only": len(set(new) - set(old)),
        "window_factor": round(window, 3),
        "threshold": threshold,
        "regressions": flagged,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--threshold", type=float, default=2.0,
        help="flag queries slower than THRESHOLD x the median ratio",
    )
    args = ap.parse_args()
    report = compare(
        load_queries(args.old), load_queries(args.new), args.threshold
    )
    print(json.dumps(report, indent=2))
    return 1 if report["regressions"] else 0


if __name__ == "__main__":
    sys.exit(main())
