"""M3 metrics visualization: render pipeline counters as a self-contained
HTML flow diagram (SURVEY.md §2.6 M3).

The reference served Flume's HTTP monitoring counters into a d3 Sankey
(/root/reference/sankey.html:45-79). This renderer consumes the same-shaped
``metrics.json`` that ``plans/pipeline.index_webpages`` emits
(SOURCE.* / CHANNEL.* / SINK.* counter groups) and produces a single static
HTML file with an inline-SVG stage-flow band — no external JS/CSS, so it
works from any artifact store a cluster job can write to.

Rendering rules (dataviz method): two flow categories only — accepted events
(blue) and dropped events (highlight) — validated as a palette for light
surface; every band carries a direct label (identity is never color-alone)
and the raw counters are repeated as an HTML table below the figure.
"""

from __future__ import annotations

import html
import json
from typing import Any

# validated two-hue palette on the light chart surface (#fcfcfb):
# CVD ΔE 23.3 worst-pair, normal-vision ΔE 32.3 — direct labels everywhere
_ACCEPT = "#2a78d6"
_DROP = "#ec835a"
_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_MUTED = "#898781"
_BORDER = "#e1e0d9"


def _stage(metrics: dict[str, Any], prefix: str) -> tuple[str, dict[str, Any]]:
    for name, counters in sorted(metrics.items()):
        if name.startswith(prefix):
            return name, counters
    return prefix, {}


def render_metrics_html(metrics: dict[str, Any], title: str = "pipeline metrics") -> str:
    """metrics.json dict -> standalone HTML (inline SVG flow + counter table)."""
    src_name, src = _stage(metrics, "SOURCE.")
    ch_name, ch = _stage(metrics, "CHANNEL.")
    sink_name, sink = _stage(metrics, "SINK.")
    received = int(src.get("EventReceivedCount", 0))
    accepted = int(src.get("EventAcceptedCount", received))
    dropped = int(src.get("DedupDroppedCount", max(received - accepted, 0)))
    taken = int(ch.get("EventTakeSuccessCount", accepted))
    drained = int(sink.get("EventDrainSuccessCount", taken))

    h_max = 220.0
    scale = h_max / max(received, 1)

    def band(x0: float, x1: float, y0: float, n: int, color: str, label: str) -> str:
        h = max(n * scale, 1.5) if n else 0.0
        if not n:
            return ""
        lab = html.escape(f"{label}: {n:,}")
        return (
            f'<polygon points="{x0},{y0} {x1},{y0} {x1},{y0 + h} {x0},{y0 + h}" '
            f'fill="{color}" opacity="0.82"><title>{lab}</title></polygon>'
            f'<text x="{(x0 + x1) / 2}" y="{y0 + h / 2 + 4}" text-anchor="middle" '
            f'font-size="12" fill="{_INK}">{lab}</text>'
        )

    def node(x: float, y0: float, n: int, name: str) -> str:
        h = max(n * scale, 2.0)
        return (
            f'<rect x="{x}" y="{y0}" width="12" height="{h}" fill="{_INK}" rx="2">'
            f"<title>{html.escape(name)}: {n:,}</title></rect>"
            f'<text x="{x + 6}" y="{y0 - 8}" text-anchor="middle" font-size="12" '
            f'fill="{_MUTED}">{html.escape(name)}</text>'
        )

    top = 36.0
    svg = [
        f'<svg viewBox="0 0 760 {top + h_max + 70}" font-family="system-ui,sans-serif" '
        f'style="background:{_SURFACE};max-width:760px">',
        node(40, top, received, src_name),
        node(374, top, taken, ch_name),
        node(708, top, drained, sink_name),
        # accepted flow: SOURCE -> CHANNEL -> SINK (2px gap above the drop band)
        band(52, 374, top, accepted, _ACCEPT, "accepted"),
        band(386, 708, top, drained, _ACCEPT, "indexed"),
        # dropped flow exits below the accepted band
        band(52, 374, top + accepted * scale + 2, dropped, _DROP, "dedup dropped"),
        "</svg>",
    ]

    rows = []
    for name, counters in sorted(metrics.items()):
        for k, v in sorted(counters.items()):
            rows.append(
                f"<tr><td>{html.escape(name)}</td><td>{html.escape(str(k))}</td>"
                f'<td style="text-align:right">{html.escape(str(v))}</td></tr>'
            )
    table = (
        f'<table style="border-collapse:collapse;font:13px system-ui,sans-serif">'
        f"<thead><tr><th>stage</th><th>counter</th><th>value</th></tr></thead>"
        f'<tbody>{"".join(rows)}</tbody></table>'
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title>"
        f"<style>body{{background:{_SURFACE};color:{_INK};margin:24px}}"
        f"td,th{{border:1px solid {_BORDER};padding:3px 10px}}</style></head>"
        f"<body><h2 style='font:16px system-ui,sans-serif'>{html.escape(title)}</h2>"
        f'{"".join(svg)}{table}</body></html>'
    )


def render_metrics_file(metrics_json_path: str, html_path: str) -> str:
    """Render a metrics.json file (as written by ``index_webpages(...,
    metrics_path=...)``) to a standalone HTML file; returns the path."""
    with open(metrics_json_path) as fh:
        metrics = json.load(fh)
    out = render_metrics_html(metrics, title=metrics_json_path)
    with open(html_path, "w") as fh:
        fh.write(out)
    return html_path
