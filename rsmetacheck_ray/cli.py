"""CLI driver — the analog of the reference's argument router
(``cli.py:8-74``: input selection, output paths, threshold knobs),
recast as a Ray Data job entry point.

Usage::

    python -m rsmetacheck_ray.cli gate --input <pages_parquet_dir> \
        --out <out_dir> [--partitions N] [--num-cpus N] [--fresh]
    python -m rsmetacheck_ray.cli metrics --out <out_dir>

On a real cluster the same module runs unchanged via
``ray job submit -- python -m rsmetacheck_ray.cli gate ...`` — the
driver only builds Dataset pipelines; Ray places the work.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rsmetacheck-ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gate", help="run the quality gate over pages parquet")
    g.add_argument("--input", required=True, help="pages parquet file/dir")
    g.add_argument("--out", required=True, help="output run directory")
    g.add_argument("--partitions", type=int, default=None,
                   help="resume-partition count (default: byte-sized auto)")
    g.add_argument("--num-cpus", type=int, default=None)
    g.add_argument("--fresh", action="store_true",
                   help="ignore an existing resume manifest")
    g.add_argument("--write-dropped-text", action="store_true")

    m = sub.add_parser("metrics", help="recompute metrics from a run dir")
    m.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False}
        if args.cmd == "gate" and args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)

    if args.cmd == "gate":
        import os
        import shutil

        if args.fresh and os.path.exists(args.out):
            shutil.rmtree(args.out)
        from .pipelines.quality_gate import run_gate

        metrics = run_gate(args.input, args.out, n_partitions=args.partitions)
        print(json.dumps(metrics, indent=2, sort_keys=True))
    elif args.cmd == "metrics":
        import os

        from .pipelines.quality_gate import compute_metrics

        metrics = compute_metrics(os.path.join(args.out, "docs"))
        print(json.dumps(metrics, indent=2, sort_keys=True))

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
