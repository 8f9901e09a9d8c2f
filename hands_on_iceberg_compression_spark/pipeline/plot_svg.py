"""EP3: CSV -> grouped bar charts -> SVG (no plotting deps needed).

Parity: reference ``src/commands/plot.ts`` — reads results_sizes.csv, builds
per-codec series labeled ``codec:lNN``, renders a linear bytes/row chart and
a log-scale total-bytes chart to ``assets/*.svg`` (plot.ts:54-198).

Chart.js is replaced with a small deterministic SVG emitter (the container
has no matplotlib); output is standard SVG with axis ticks, grouped bars,
value labels, and a legend.
"""

from __future__ import annotations

import csv
import math
import os
from dataclasses import dataclass

_COLORS = ["#4e79a7", "#f28e2b", "#59a14f", "#e15759", "#76b7b2", "#edc948"]


@dataclass
class _Series:
    label: str
    value: float
    color: str


def _read_rows(csv_path: str) -> list[dict]:
    with open(csv_path, newline="") as f:
        rows = list(csv.DictReader(f))
    # numeric normalization preferring total over data bytes (plot.ts:66-73)
    for r in rows:
        data = float(r.get("data_bytes") or 0)
        manifest = float(r.get("manifest_bytes") or 0)
        r["_total"] = data + manifest
        r["_bpr"] = float(r["bytes_per_row"]) if r.get("bytes_per_row") else 0.0
        r["_level"] = int(r["level"]) if r.get("level") not in (None, "", "None") else -1
    rows.sort(key=lambda r: (r["codec"], r["_level"]))  # plot.ts:76-82
    return rows


def _bars(rows: list[dict], value_key: str) -> list[_Series]:
    codecs = []
    for r in rows:
        if r["codec"] not in codecs:
            codecs.append(r["codec"])
    out = []
    for r in rows:
        label = f"{r['codec']}:l{r['_level']:02d}" if r["_level"] >= 0 else r["codec"]
        out.append(_Series(label, r[value_key], _COLORS[codecs.index(r["codec"]) % len(_COLORS)]))
    return out


def _render(bars: list[_Series], title: str, y_label: str, log_y: bool, path: str) -> str:
    w, h = 860, 420
    ml, mr, mt, mb = 70, 20, 50, 90
    pw, ph = w - ml - mr, h - mt - mb
    vmax = max((b.value for b in bars), default=1.0) or 1.0
    vmin_log = max(min((b.value for b in bars if b.value > 0), default=1.0), 1e-9)

    def y_of(v: float) -> float:
        if log_y:
            lo, hi = math.log10(vmin_log) - 0.2, math.log10(vmax) + 0.05
            t = 0.0 if v <= 0 else (math.log10(v) - lo) / (hi - lo)
        else:
            t = v / (vmax * 1.1)
        return mt + ph * (1 - max(0.0, min(1.0, t)))

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" height="{h}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{w}" height="{h}" fill="white"/>',
        f'<text x="{w/2}" y="24" text-anchor="middle" font-size="15">{title}</text>',
        f'<text x="16" y="{mt + ph/2}" text-anchor="middle" '
        f'transform="rotate(-90 16 {mt + ph/2})">{y_label}</text>',
        f'<line x1="{ml}" y1="{mt}" x2="{ml}" y2="{mt+ph}" stroke="#333"/>',
        f'<line x1="{ml}" y1="{mt+ph}" x2="{ml+pw}" y2="{mt+ph}" stroke="#333"/>',
    ]
    # y ticks
    ticks = (
        [10 ** e for e in range(math.floor(math.log10(vmin_log)), math.ceil(math.log10(vmax)) + 1)]
        if log_y
        else [vmax * 1.1 * t / 5 for t in range(6)]
    )
    for tv in ticks:
        y = y_of(tv)
        if mt - 1 <= y <= mt + ph + 1:
            parts.append(f'<line x1="{ml-4}" y1="{y:.1f}" x2="{ml+pw}" y2="{y:.1f}" stroke="#ddd"/>')
            label = f"{tv:.3g}"
            parts.append(f'<text x="{ml-8}" y="{y+4:.1f}" text-anchor="end">{label}</text>')
    # bars
    n = max(len(bars), 1)
    bw = pw / n * 0.7
    for i, b in enumerate(bars):
        x = ml + pw * (i + 0.5) / n - bw / 2
        y = y_of(b.value)
        parts.append(
            f'<rect x="{x:.1f}" y="{y:.1f}" width="{bw:.1f}" '
            f'height="{mt+ph-y:.1f}" fill="{b.color}"/>'
        )
        parts.append(
            f'<text x="{x+bw/2:.1f}" y="{y-4:.1f}" text-anchor="middle">{b.value:.3g}</text>'
        )
        lx, ly = x + bw / 2, mt + ph + 12
        parts.append(
            f'<text x="{lx:.1f}" y="{ly:.1f}" text-anchor="end" '
            f'transform="rotate(-45 {lx:.1f} {ly:.1f})">{b.label}</text>'
        )
    parts.append("</svg>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def plot_results(csv_path: str, assets_dir: str = "assets") -> list[str]:
    """Render the two reference charts (plot.ts:180-197; README.md:100-101)."""
    rows = _read_rows(csv_path)
    out = [
        _render(
            _bars(rows, "_bpr"),
            "Bytes per row by codec/level",
            "bytes/row",
            False,
            os.path.join(assets_dir, "bytes_per_row.svg"),
        ),
        _render(
            _bars(rows, "_total"),
            "Total data bytes by codec/level (log)",
            "bytes",
            True,
            os.path.join(assets_dir, "total_data_bytes.svg"),
        ),
    ]
    return out
