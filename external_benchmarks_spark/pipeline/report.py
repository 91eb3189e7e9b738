"""Analysis/report pipeline — parity with the reference's
``generate_benchmark_reports.py`` (the third capability surface,
SURVEY.md §0.3).

Every statistic aggregates IN SPARK; only tiny aggregate rows reach the
driver, where markdown/JSON render (the reference materializes whole
datasets on one machine for the 10k path, :65-87 — here the same report
works at any scale). PNG plots render through pipeline/plots.py — a
dependency-free rasterizer over the stdlib PNG writer
(multimodal/codecs.py), covering the reference's figure set
(generate_benchmark_reports.py:312-550) without matplotlib; matplotlib
output can be swapped in where available.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from external_benchmarks_spark.functions.vector import l2_norm
from external_benchmarks_spark.operators import stats as S


def file_size_mb(path: str) -> float:
    """File/dataset size probe (reference get_file_size_mb, :61-63) —
    sums parts when the path is a directory-style parquet dataset."""
    if os.path.isfile(path):
        total = os.path.getsize(path)
    else:
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _dirs, files in os.walk(path)
            for f in files
        )
    return round(total / (1024 * 1024), 2)


def dataset_report(
    df: DataFrame,
    numeric_cols: list[str],
    cat_cols: list[str],
    text_cols: list[str] = (),
    emb_col: str | None = None,
    path: str | None = None,
) -> dict:
    """Full stats dict mirroring the reference's fast path
    (duckdb_fast_stats, :119-219) + embedding geometry (:243-274)."""
    report: dict = {
        "total_records": df.count(),
        "n_columns": len(df.columns),
        "schema": {f.name: f.dataType.simpleString() for f in df.schema.fields},
    }
    if path is not None:
        report["file_size_mb"] = file_size_mb(path)
    nulls = S.null_profile(df).collect()[0].asDict()
    report["null_counts"] = {c: nulls[f"{c}_nulls"] for c in df.columns}

    report["numeric"] = {}
    for c in numeric_cols:
        r = S.numeric_summary(df, c).collect()[0]
        report["numeric"][c] = {
            "count": r["cnt"], "mean": r["avg_val"], "min": r["min_val"],
            "max": r["max_val"], "std": r["stddev_val"], "nulls": r["null_cnt"],
        }

    report["categorical"] = {}
    for c in cat_cols:
        top = S.group_share_topn(df, c, 10).collect()
        uniq = S.distinct_count(df, c).collect()[0]["distinct_cnt"]
        report["categorical"][c] = {
            "unique": uniq,
            "top": [{"value": r[c], "count": r["cnt"], "pct": r["pct"]} for r in top],
        }

    report["text_lengths"] = {}
    for c in text_cols:
        r = S.text_length_stats(df, c).collect()[0]
        report["text_lengths"][c] = {
            "avg": r["avg_len"], "min": r["min_len"], "max": r["max_len"],
        }

    # Histogram series for the figure sink (reference plt.hist, :287-301):
    # one extra aggregate per numeric column, 25 bins, reduced in Spark.
    report["histograms"] = {}
    for c in numeric_cols:
        s = report["numeric"][c]
        if s["min"] is None or s["max"] is None or s["min"] == s["max"]:
            continue
        lo, hi = float(s["min"]), float(s["max"])
        rows = S.histogram(df, c, lo, hi, bins=25).collect()
        counts = [0] * 25
        for r in rows:
            counts[int(r["bucket"])] = int(r["cnt"])
        report["histograms"][c] = {"min": lo, "max": hi, "counts": counts}

    if emb_col and emb_col in df.columns:
        geo = df.agg(
            F.round(F.avg(F.size(emb_col)), 2).alias("dim"),
            F.round(F.avg(l2_norm(emb_col)), 6).alias("mean_norm"),
            F.round(F.stddev_samp(l2_norm(emb_col)), 6).alias("std_norm"),
        ).collect()[0]
        report["embedding"] = {
            "avg_dim": geo["dim"], "mean_l2_norm": geo["mean_norm"],
            "std_l2_norm": geo["std_norm"],
        }
    return report


def consistency_check(
    reports: dict[str, dict], numeric_tolerance: float = 0.05
) -> dict:
    """Cross-scale distribution-consistency validation — the reference's QA
    strategy (reports/summary_report.md:42-46; :731-740): numeric means
    must agree within tolerance across scale variants."""
    out: dict = {"consistent": True, "violations": []}
    names = sorted(reports)
    if len(names) < 2:
        return out
    base = reports[names[0]]
    for other_name in names[1:]:
        other = reports[other_name]
        for col, stats in base.get("numeric", {}).items():
            o = other.get("numeric", {}).get(col)
            if not o or stats["mean"] in (None, 0) or o["mean"] is None:
                continue
            drift = abs(o["mean"] - stats["mean"]) / abs(stats["mean"])
            if drift > numeric_tolerance:
                out["consistent"] = False
                out["violations"].append(
                    {"column": col, "scales": [names[0], other_name], "drift": round(drift, 4)}
                )
    return out


def render_markdown(report: dict, title: str) -> str:
    """Markdown rendering mirroring generate_fast_markdown_report (:668-745)."""
    lines = [f"# {title}", "", f"- Total records: {report['total_records']:,}",
             f"- Columns: {report['n_columns']}", "", "## Schema", ""]
    for name, typ in report["schema"].items():
        lines.append(f"- `{name}`: {typ} ({report['null_counts'][name]} nulls)")
    if report.get("numeric"):
        lines += ["", "## Numeric columns", ""]
        for c, s in report["numeric"].items():
            lines.append(
                f"- `{c}`: mean={s['mean']} std={s['std']} min={s['min']} max={s['max']}"
            )
    if report.get("categorical"):
        lines += ["", "## Categorical columns", ""]
        for c, s in report["categorical"].items():
            lines.append(f"- `{c}`: {s['unique']} distinct; top: "
                         + ", ".join(f"{t['value']} ({t['pct']}%)" for t in s["top"][:5]))
    if report.get("text_lengths"):
        lines += ["", "## Text lengths", ""]
        for c, s in report["text_lengths"].items():
            lines.append(f"- `{c}`: avg={s['avg']} min={s['min']} max={s['max']}")
    if report.get("embedding"):
        e = report["embedding"]
        lines += ["", "## Embedding geometry", "",
                  f"- dim={e['avg_dim']} mean_norm={e['mean_l2_norm']} std_norm={e['std_l2_norm']}"]
    return "\n".join(lines) + "\n"


def write_report(
    report: dict, out_dir: str, name: str, figures: bool = True
) -> list[str]:
    """JSON + markdown + (by default) PNG figures. Returns written paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [os.path.join(out_dir, f"{name}.json"), os.path.join(out_dir, f"{name}.md")]
    with open(paths[0], "w") as f:
        json.dump(report, f, indent=2, default=str)
    with open(paths[1], "w") as f:
        f.write(render_markdown(report, name))
    if figures:
        from external_benchmarks_spark.pipeline.plots import render_report_figures

        paths += render_report_figures(report, out_dir, name)
    return paths
