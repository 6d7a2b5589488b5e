"""The flagship pipeline — the Ray-Data recast of the reference's
``detect_all_pitfalls`` lifecycle (``detect_pitfalls_main.py:313-409``,
see SURVEY §3 "New-engine lifecycle"):

    read_parquet → extract (stateless map_batches, drops the wide html
    column) → langid actor pool → perplexity actor pool → fused rule
    catalog + scrub (stateless) → partitioned parquet + lineage +
    metrics manifest.

Scale design:
 - zero-copy Arrow batches end-to-end (``batch_format="pyarrow"``);
 - the binary ``html`` payload never travels past the first stage;
 - actor pools sized by config, models loaded once per actor;
 - NO full materialization anywhere: each partition streams from read
   to write with backpressure;
 - resume-by-partition: the input fragment list is split into K
   partitions, each written atomically to its own directory and
   recorded in a JSONL manifest (``state/manifest.py``); a re-run
   skips completed partitions on the driver, before any Dataset exists;
 - ONE streaming pass per partition: every row (kept and dropped) is
   written with its tiny decision columns; dropped rows carry NULL
   text so the write volume is dominated by kept text. The kept
   dataset is the predicate view ``keep == true``; lineage/metrics
   aggregate the pruned decision columns (never the text).
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..config import DEFAULT_CONFIG, GateConfig
from ..stages.extract import extract_stage
from ..stages.langid import LangIdScorer
from ..stages.perplexity import PerplexityScorer
from ..stages.rules import RULE_CODES, rule_stage_fn
from ..state.manifest import Manifest

# columns carried into the gated output (decision columns are tiny;
# scrubbed_text dominates and is nulled for dropped rows)
_DECISION_COLS = ["url", "warc_ts", "lang", "detected_lang", "langid_conf",
                  "bits_per_char", "n_tokens", "n_chars", "keep",
                  "rule_errors"]


class _RuleStage:
    """Pickle-friendly wrapper binding the frozen config to the fused
    rule stage (a plain function → stateless Ray tasks)."""

    def __init__(self, cfg: GateConfig, write_dropped_text: bool):
        self.cfg = cfg
        self.write_dropped_text = write_dropped_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = rule_stage_fn(batch, self.cfg)
        keep = out.column("keep")
        scrubbed = out.column("scrubbed_text")
        if not self.write_dropped_text:
            scrubbed = pc.if_else(keep, scrubbed, pa.scalar(None, pa.string()))
        cols = _DECISION_COLS + [f"hit_{c}" for c in RULE_CODES]
        if "doc_id" in out.column_names:  # carried key for oracle joins
            cols = ["doc_id"] + cols
        result = out.select(cols)
        return result.append_column("scrubbed_text", scrubbed)


def build_gate(
    ds: rd.Dataset, cfg: GateConfig = DEFAULT_CONFIG, write_dropped_text: bool = False
) -> rd.Dataset:
    """Assemble the lazy gate pipeline over a pages Dataset.

    Returns a Dataset of ALL rows with decision columns + scrubbed
    text (null for dropped rows unless ``write_dropped_text``).
    """
    ds = ds.map_batches(extract_stage, batch_format="pyarrow", zero_copy_batch=True)
    # Autoscaling actor pools (1..N): a fixed pool sized at the CPU
    # count starves the task-pool read/write stages (the guide's
    # "pool that reserves every CPU" pitfall); min=1 lets the
    # streaming executor balance stages under backpressure.
    ds = ds.map_batches(
        LangIdScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, cfg.langid_actors),
    )
    ds = ds.map_batches(
        PerplexityScorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=(1, cfg.perplexity_actors),
    )
    ds = ds.map_batches(
        _RuleStage(cfg, write_dropped_text), batch_format="pyarrow", zero_copy_batch=True
    )
    return ds


def kept_view(out_docs_dir: str) -> rd.Dataset:
    """The kept-documents dataset: a filtered, column-pruned read of
    the gated output (row-group predicate pushdown on ``keep``)."""
    return rd.read_parquet(
        out_docs_dir,
        columns=["url", "warc_ts", "detected_lang", "scrubbed_text"],
        filter=(pc.field("keep") == True),  # noqa: E712
    )


def _partition_fragments(paths: list[str], n_partitions: int) -> list[list[str]]:
    paths = sorted(paths)
    n_partitions = max(1, min(n_partitions, len(paths)))
    out: list[list[str]] = [[] for _ in range(n_partitions)]
    for i, p in enumerate(paths):
        out[i % n_partitions].append(p)
    return [g for g in out if g]


def list_parquet_fragments(input_path: str | Iterable[str]) -> list[str]:
    if isinstance(input_path, (list, tuple)):
        return sorted(str(p) for p in input_path)
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".parquet")
        )
    return [str(input_path)]


def auto_partitions(fragments: list[str], target_bytes: int = 256 << 20) -> int:
    """Resume-partition count sized by input bytes, not fragment count:
    each partition should be big enough to amortize actor-pool spin-up
    (~1 s for the perplexity LM) — at 100 TB this yields ~400k
    partitions of 256 MB; on a 5 MB bench input it yields 1."""
    total = sum(os.path.getsize(f) for f in fragments if os.path.exists(f))
    return max(1, min(len(fragments), total // target_bytes + (1 if total % target_bytes else 0)))


def run_gate(
    input_path: str | list[str],
    out_dir: str,
    cfg: GateConfig = DEFAULT_CONFIG,
    n_partitions: int | None = None,
) -> dict:
    """Execute the gate over all input fragments with resume.

    Layout::

        out_dir/docs/partition=K/*.parquet   (atomic per partition)
        out_dir/manifest.jsonl               (completed partitions)
        out_dir/metrics.json                 (global summary)

    Returns the metrics dict (the analog of the reference's global
    summary JSON, ``detect_pitfalls_main.py:396-409``).
    """
    fragments = list_parquet_fragments(input_path)
    if not fragments:
        metrics = {"total_documents": 0, "kept": 0, "dropped": 0,
                   "keep_rate": 0.0, "rules": {}}
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
            json.dump(metrics, fh, indent=2, sort_keys=True)
        return metrics
    if n_partitions is None:
        n_partitions = auto_partitions(fragments)
    parts = _partition_fragments(fragments, n_partitions)
    manifest = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    done = manifest.completed()

    docs_root = os.path.join(out_dir, "docs")
    os.makedirs(docs_root, exist_ok=True)

    for pid, frag_group in enumerate(parts):
        if pid in done:
            continue
        final_dir = os.path.join(docs_root, f"partition={pid}")
        tmp_dir = os.path.join(docs_root, f".tmp-partition={pid}")
        if os.path.exists(tmp_dir):  # torn previous attempt
            import shutil

            shutil.rmtree(tmp_dir)
        if os.path.exists(final_dir):  # completed write, torn manifest append
            import shutil

            shutil.rmtree(final_dir)
        ds = rd.read_parquet(frag_group)
        gated = build_gate(ds, cfg)
        gated.write_parquet(tmp_dir)
        os.rename(tmp_dir, final_dir)
        manifest.mark_done(pid, frag_group, {})

    metrics = compute_metrics(docs_root)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2, sort_keys=True)
    return metrics


def compute_metrics(docs_root: str) -> dict:
    """Global summary over the gated output — per-rule counts,
    percentages and per-language histograms (recasts
    ``detect_pitfalls_main.py:346-351,385-394``).

    Reads ONLY the tiny decision columns (column-pruned parquet read),
    pre-aggregates per batch inside map_batches, then merges the
    per-batch partials on the driver — no all-to-all shuffle for a
    fixed-size (n_rules × n_langs) aggregate.
    """
    hit_cols = [f"hit_{c}" for c in RULE_CODES]
    ds = rd.read_parquet(docs_root, columns=["detected_lang", "keep"] + hit_cols)

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch.column("detected_lang")
        rows = {"rule": [], "lang": [], "hits": []}
        uniq = pc.unique(langs).to_pylist()
        for code in RULE_CODES:
            col = batch.column(f"hit_{code}")
            for lg in uniq:
                m = pc.and_kleene(pc.equal(langs, lg), col)
                n = pc.sum(m).as_py() or 0
                if n:
                    rows["rule"].append(code)
                    rows["lang"].append(lg)
                    rows["hits"].append(n)
        rows["rule"].append("__total__")
        rows["lang"].append("__all__")
        rows["hits"].append(len(batch))
        rows["rule"].append("__kept__")
        rows["lang"].append("__all__")
        rows["hits"].append(pc.sum(batch.column("keep")).as_py() or 0)
        return pa.table(
            {
                "rule": pa.array(rows["rule"], pa.string()),
                "lang": pa.array(rows["lang"], pa.string()),
                "hits": pa.array(rows["hits"], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = partials.groupby(["rule", "lang"]).aggregate(Sum("hits", alias_name="hits"))
    tbl = agg.to_pandas()  # tiny: ≤ n_rules × n_langs rows

    total = int(tbl.loc[tbl["rule"] == "__total__", "hits"].sum())
    kept = int(tbl.loc[tbl["rule"] == "__kept__", "hits"].sum())
    rules: dict[str, dict] = {}
    for code in RULE_CODES:
        sub = tbl[tbl["rule"] == code]
        count = int(sub["hits"].sum())
        rules[code] = {
            "count": count,
            "percentage": round(100.0 * count / total, 2) if total else 0.0,
            "languages": {
                str(r["lang"]): int(r["hits"]) for _, r in sub.iterrows()
            },
        }
    return {
        "total_documents": total,
        "kept": kept,
        "dropped": total - kept,
        "keep_rate": round(kept / total, 4) if total else 0.0,
        "rules": rules,
    }
