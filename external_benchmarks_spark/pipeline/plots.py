"""PNG figure sink — parity with the reference's matplotlib plots
(reference scripts/generate_benchmark_reports.py:312-550: null-count
bars, categorical top-10 bars, numeric histograms, text-length and
embedding-norm distributions) WITHOUT the matplotlib dependency: charts
rasterize onto a numpy RGB canvas and encode through the pure-stdlib PNG
writer (multimodal/codecs.py).

Scale note: everything plotted is an already-reduced aggregate (top-10
lists, 25-bin histograms, per-column null counts) — the figures render
driver-side from tiny stats dicts; no dataset rows are ever collected.
"""

from __future__ import annotations

import os

import numpy as np

from external_benchmarks_spark.multimodal.codecs import encode_png

BG = (255, 255, 255)
FG = (40, 40, 40)
BAR = (66, 120, 200)
GRID = (220, 220, 220)

# 3x5 bitmap glyphs for axis value labels (digits + sign/point/exponent).
_GLYPHS = {
    "0": ["111", "101", "101", "101", "111"],
    "1": ["010", "110", "010", "010", "111"],
    "2": ["111", "001", "111", "100", "111"],
    "3": ["111", "001", "111", "001", "111"],
    "4": ["101", "101", "111", "001", "001"],
    "5": ["111", "100", "111", "001", "111"],
    "6": ["111", "100", "111", "101", "111"],
    "7": ["111", "001", "010", "010", "010"],
    "8": ["111", "101", "111", "101", "111"],
    "9": ["111", "101", "111", "001", "111"],
    ".": ["000", "000", "000", "000", "010"],
    "-": ["000", "000", "111", "000", "000"],
    "+": ["000", "010", "111", "010", "000"],
    "e": ["000", "111", "110", "100", "111"],
    "%": ["101", "001", "010", "100", "101"],
    " ": ["000", "000", "000", "000", "000"],
}


def _blank(w: int, h: int) -> np.ndarray:
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:] = BG
    return img


def _rect(img: np.ndarray, x0: int, y0: int, x1: int, y1: int, color) -> None:
    h, w = img.shape[:2]
    x0, x1 = max(0, min(x0, x1)), min(w, max(x0, x1))
    y0, y1 = max(0, min(y0, y1)), min(h, max(y0, y1))
    img[y0:y1, x0:x1] = color


def _text(img: np.ndarray, x: int, y: int, s: str, color=FG, scale: int = 1) -> None:
    cx = x
    for ch in s:
        g = _GLYPHS.get(ch)
        if g is None:
            cx += 4 * scale
            continue
        for r, row in enumerate(g):
            for c, bit in enumerate(row):
                if bit == "1":
                    _rect(
                        img,
                        cx + c * scale,
                        y + r * scale,
                        cx + (c + 1) * scale,
                        y + (r + 1) * scale,
                        color,
                    )
        cx += 4 * scale


def _fmt(v: float) -> str:
    s = f"{v:.4g}"
    return s.replace("E", "e")


def bar_chart(
    values: list[float], width: int = 640, height: int = 360
) -> np.ndarray:
    """Vertical bar chart of a reduced series (e.g. top-10 counts).
    Y-axis min/max labels, light gridlines, uniform bar width."""
    img = _blank(width, height)
    ml, mr, mt, mb = 48, 12, 12, 24
    px0, py0, px1, py1 = ml, mt, width - mr, height - mb
    vmax = max([v for v in values if v is not None] + [0.0]) or 1.0
    for gy in range(5):
        y = py0 + (py1 - py0) * gy // 4
        _rect(img, px0, y, px1, y + 1, GRID)
        _text(img, 4, y - 2, _fmt(vmax * (1 - gy / 4)))
    n = max(len(values), 1)
    span = (px1 - px0) / n
    for i, v in enumerate(values):
        if v is None:
            continue
        bh = int((py1 - py0) * (v / vmax))
        x0 = int(px0 + i * span + span * 0.15)
        x1 = int(px0 + (i + 1) * span - span * 0.15)
        _rect(img, x0, py1 - bh, max(x1, x0 + 1), py1, BAR)
    _rect(img, px0, py1, px1, py1 + 1, FG)
    _rect(img, px0, py0, px0 + 1, py1, FG)
    return img


def histogram_chart(
    counts: list[int], lo: float, hi: float, width: int = 640, height: int = 360
) -> np.ndarray:
    """Histogram: contiguous bars plus x-range labels."""
    img = bar_chart([float(c) for c in counts], width, height)
    _text(img, 48, height - 16, _fmt(lo))
    s = _fmt(hi)
    _text(img, width - 12 - 4 * len(s), height - 16, s)
    return img


def pie_chart(
    values: list[float], width: int = 420, height: int = 420
) -> np.ndarray:
    """Pie chart of a reduced share series — the reference's category-
    distribution pie (generate_benchmark_reports.py figure set) without
    matplotlib. Segments rasterize by per-pixel angle test over a
    vectorized grid; colors cycle the 8-color palette in input order.
    Input is an already-reduced top-N list (plus an optional 'other'
    bucket), never raw rows."""
    img = _blank(width, height)
    total = sum(v for v in values if v) or 1.0
    cx, cy = width / 2.0, height / 2.0
    radius = min(width, height) * 0.42
    yy, xx = np.mgrid[0:height, 0:width]
    dx, dy = xx - cx, yy - cy
    inside = dx * dx + dy * dy <= radius * radius
    # angle in [0, 1) clockwise from 12 o'clock, matplotlib-pie-like
    ang = (np.arctan2(dx, -dy) / (2 * np.pi)) % 1.0
    acc = 0.0
    for i, v in enumerate(values):
        if not v:
            continue
        frac = v / total
        seg = inside & (ang >= acc) & (ang < acc + frac)
        img[seg] = _PALETTE[i % len(_PALETTE)]
        acc += frac
    return img


def _diverging_color(v: float) -> tuple[int, int, int]:
    """Blue (-1) -> white (0) -> red (+1), the standard correlation map."""
    v = max(-1.0, min(1.0, v))
    if v >= 0:
        t = v
        return (255, int(255 - 175 * t), int(255 - 195 * t))
    t = -v
    return (int(255 - 189 * t), int(255 - 135 * t), int(255 - 55 * t))


def heatmap_chart(
    matrix: "list[list[float | None]]", width: int = 480, height: int = 480
) -> np.ndarray:
    """Correlation-matrix heatmap (reference's corr figure,
    generate_benchmark_reports.py:276-550 family): one colored cell per
    pair on the diverging blue-white-red map, value printed in-cell,
    grid separators. Input is the k x k already-reduced matrix from
    dataset_report(corr_cols=...) — k is column count, not row count."""
    img = _blank(width, height)
    n = len(matrix)
    if n == 0:
        return img
    m = 16
    cw = (width - 2 * m) / n
    ch = (height - 2 * m) / n
    for r in range(n):
        for c in range(n):
            v = matrix[r][c]
            x0, y0 = int(m + c * cw), int(m + r * ch)
            x1, y1 = int(m + (c + 1) * cw), int(m + (r + 1) * ch)
            color = BG if v is None else _diverging_color(float(v))
            _rect(img, x0, y0, x1, y1, color)
            _rect(img, x0, y0, x1, y0 + 1, GRID)
            _rect(img, x0, y0, x0 + 1, y1, GRID)
            if v is not None:
                s = _fmt(round(float(v), 2))
                _text(img, x0 + 3, (y0 + y1) // 2 - 3, s)
    _rect(img, m, int(m + n * ch), int(m + n * cw) + 1, int(m + n * ch) + 1, FG)
    _rect(img, int(m + n * cw), m, int(m + n * cw) + 1, int(m + n * ch), FG)
    return img


def save_png(img: np.ndarray, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(encode_png(img))
    return path


def render_report_figures(report: dict, out_dir: str, name: str) -> list[str]:
    """Render the reference's full figure set from an already-computed
    stats dict (pipeline/report.dataset_report) — all five families:
    null-count bars, per-categorical top-10 bars (+ pie share charts),
    per-numeric histograms, and the correlation-matrix heatmap when the
    report carries one (dataset_report(corr_cols=...)). Returns written
    paths."""
    written: list[str] = []
    nulls = report.get("null_counts") or {}
    if nulls:
        img = bar_chart([float(v) for v in nulls.values()])
        written.append(save_png(img, os.path.join(out_dir, f"{name}_nulls.png")))
    for col, s in (report.get("categorical") or {}).items():
        top = s.get("top", [])
        vals = [float(t["count"]) for t in top]
        if vals:
            img = bar_chart(vals)
            written.append(
                save_png(img, os.path.join(out_dir, f"{name}_cat_{col}.png"))
            )
            # pie of the top-N shares + an 'other' slice for the rest
            pcts = [float(t["pct"]) for t in top]
            other = max(0.0, 100.0 - sum(pcts))
            img = pie_chart(pcts + ([other] if other > 0.05 else []))
            written.append(
                save_png(img, os.path.join(out_dir, f"{name}_pie_{col}.png"))
            )
    for col, s in (report.get("histograms") or {}).items():
        img = histogram_chart(s["counts"], s["min"], s["max"])
        written.append(
            save_png(img, os.path.join(out_dir, f"{name}_hist_{col}.png"))
        )
    corr = report.get("correlation")
    if corr and corr.get("matrix"):
        img = heatmap_chart(corr["matrix"])
        written.append(
            save_png(img, os.path.join(out_dir, f"{name}_corr.png"))
        )
    return written


_PALETTE = [
    (66, 120, 200),
    (220, 95, 60),
    (60, 170, 110),
    (150, 90, 200),
    (200, 170, 50),
    (70, 180, 200),
    (200, 90, 150),
    (120, 120, 120),
]


def scatter_chart(
    xs: list[float],
    ys: list[float],
    labels: list[int] | None = None,
    width: int = 640,
    height: int = 480,
) -> np.ndarray:
    """2-D scatter — the reference's PCA/t-SNE/UMAP report figure
    (reference scripts/generate_benchmark_reports.py:449-478) without
    matplotlib: points rasterize as 3x3 squares colored by label
    (8-color palette, cycling), with min/max axis labels and light
    gridlines. Input is an already-bounded projection sample (the
    projection operators cap at max_rows), so this renders driver-side
    from a few thousand floats."""
    img = _blank(width, height)
    ml, mr, mt, mb = 48, 12, 12, 24
    px0, py0, px1, py1 = ml, mt, width - mr, height - mb
    if not xs:
        return img
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    xspan = (xhi - xlo) or 1.0
    yspan = (yhi - ylo) or 1.0
    for g in range(5):
        y = py0 + (py1 - py0) * g // 4
        _rect(img, px0, y, px1, y + 1, GRID)
        _text(img, 4, y - 2, _fmt(yhi - yspan * g / 4))
        x = px0 + (px1 - px0) * g // 4
        _rect(img, x, py0, x + 1, py1, GRID)
    for i, (x, y) in enumerate(zip(xs, ys)):
        color = _PALETTE[(labels[i] if labels else 0) % len(_PALETTE)]
        cx = px0 + int((px1 - px0 - 1) * (x - xlo) / xspan)
        cy = py1 - int((py1 - py0 - 1) * (y - ylo) / yspan)
        _rect(
            img,
            max(px0, cx - 1),
            max(py0, cy - 1),
            min(px1, cx + 2),
            min(py1, cy + 2),
            color,
        )
    _rect(img, px0, py1, px1, py1 + 1, FG)
    _rect(img, px0, py0, px0 + 1, py1, FG)
    _text(img, px0, height - 16, _fmt(xlo))
    s = _fmt(xhi)
    _text(img, width - mr - 4 * len(s), height - 16, s)
    return img


def projection_figure(
    df,
    vec_col: str,
    out_path: str,
    label_df=None,
    key_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """Render a projection DataFrame (key, [x, y]) — the output of
    pca_project / tsne_project / spectral_project / umap_project — as a
    scatter PNG, optionally colored by a label join. The projection is
    already a bounded sample, so the collect here is the same few
    thousand rows the reference hands matplotlib."""
    proj = df
    if label_df is not None:
        proj = proj.join(label_df.select(key_col, label_col), key_col, "left")
    rows = proj.collect()
    xs = [float(r[vec_col][0]) for r in rows]
    ys = [float(r[vec_col][1]) for r in rows]
    labels = None
    if label_df is not None:
        labels = [int(r[label_col]) if r[label_col] is not None else 0 for r in rows]
    return save_png(scatter_chart(xs, ys, labels), out_path)
