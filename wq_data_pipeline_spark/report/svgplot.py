"""Minimal deterministic SVG plot kit — the no-matplotlib backend for
the S7 figure sinks (reference plotting basics,
scripts/ufz_water_qc_pipeline.py:292-389).

Only what those figures need: line series with NaN gap breaks, point
markers, bar histograms, vertical span bands, a 1-column heatmap, log
y-scale, time/linear axes with tick labels, title/axis labels, legend,
and a corner annotation. Pure stdlib, byte-deterministic output.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from datetime import datetime, timezone

# reference palette (COLOR_RAW/COLOR_BLUE/COLOR_ORANGE at
# scripts/ufz_water_qc_pipeline.py:40-43)
COLOR_RAW = "#666666"
COLOR_BLUE = "#1f77b4"
COLOR_ORANGE = "#ff7f0e"
COLOR_GREY = "#999999"


def _fin(v) -> bool:
    return v is not None and not (isinstance(v, float) and math.isnan(v))


def _nice_ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """~n round tick positions covering [lo, hi]."""
    if not (_fin(lo) and _fin(hi)) or hi <= lo:
        return [lo] if _fin(lo) else []
    span = hi - lo
    raw = span / max(1, n)
    mag = 10 ** math.floor(math.log10(raw))
    for m in (1, 2, 2.5, 5, 10):
        if raw <= m * mag:
            step = m * mag
            break
    first = math.ceil(lo / step) * step
    ticks = []
    t = first
    while t <= hi + 1e-12 * span:
        ticks.append(round(t, 10))
        t += step
    return ticks


def _fmt_num(v: float) -> str:
    if v == 0:
        return "0"
    a = abs(v)
    if a >= 1e5 or a < 1e-3:
        return f"{v:.1e}"
    if a >= 100:
        return f"{v:.0f}"
    if a >= 1:
        return f"{v:.4g}"
    return f"{v:.3g}"


def _fmt_ts(us: float, span_us: float) -> str:
    dt = datetime.fromtimestamp(us / 1e6, tz=timezone.utc)
    if span_us > 90 * 86400e6:
        return dt.strftime("%Y-%m")
    if span_us > 3 * 86400e6:
        return dt.strftime("%m-%d")
    return dt.strftime("%d %H:%M")


def _esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


@dataclass
class Figure:
    """One panel (or a vertical stack via ``subplot``)."""

    width: int = 960
    height: int = 320
    title: str = ""
    xlabel: str = ""
    ylabel: str = ""
    log_y: bool = False
    time_x: bool = True
    _elems: list[str] = field(default_factory=list)
    _legend: list[tuple[str, str, str]] = field(default_factory=list)  # label,color,kind
    _xs: list[float] = field(default_factory=list)
    _ys: list[float] = field(default_factory=list)
    _annot: str = ""
    # margins: left, right, top, bottom
    _m: tuple[int, int, int, int] = (64, 16, 28, 42)

    # ---- data layers (record now, project at save time) ----
    def line(self, xs, ys, color=COLOR_BLUE, lw=1.0, label=None):
        self._elems.append(("line", list(xs), list(ys), color, lw))
        self._track(xs, ys)
        if label:
            self._legend.append((label, color, "line"))

    def markers(self, xs, ys, color=COLOR_ORANGE, size=2.0, label=None, shape="dot"):
        self._elems.append(("markers", list(xs), list(ys), color, size, shape))
        self._track(xs, ys)
        if label:
            self._legend.append((label, color, "dot"))

    def bars(self, centers, heights, width, color=COLOR_BLUE):
        self._elems.append(("bars", list(centers), list(heights), width, color))
        self._track(centers, heights)
        self._track([c - width / 2 for c in centers] + [c + width / 2 for c in centers], [0.0])

    def spans(self, intervals, color=COLOR_ORANGE, alpha=0.2):
        """Vertical bands [(x0, x1), ...] (reference axvspan)."""
        self._elems.append(("spans", list(intervals), color, alpha))
        for x0, x1 in intervals:
            self._track([x0, x1], [])

    def annotate(self, text: str):
        self._annot = text

    def _track(self, xs, ys):
        self._xs.extend(x for x in xs if _fin(x))
        self._ys.extend(y for y in ys if _fin(y) and (not self.log_y or y > 0))

    # ---- projection ----
    def _ranges(self):
        xs, ys = self._xs or [0.0, 1.0], self._ys or [0.0, 1.0]
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        if x1 <= x0:
            x1 = x0 + 1.0
        if self.log_y:
            y0 = math.log10(max(y0, 1e-12))
            y1 = math.log10(max(y1, 1e-11))
        if y1 <= y0:
            y1 = y0 + 1.0
        pad = 0.04 * (y1 - y0)
        return x0, x1, y0 - pad, y1 + pad

    def _proj(self):
        ml, mr, mt, mb = self._m
        x0, x1, y0, y1 = self._ranges()
        iw, ih = self.width - ml - mr, self.height - mt - mb

        def px(x):
            return ml + (x - x0) / (x1 - x0) * iw

        def py(y):
            if self.log_y:
                y = math.log10(max(y, 1e-12))
            return mt + ih - (y - y0) / (y1 - y0) * ih

        return px, py, (x0, x1, y0, y1)

    def _polylines(self, xs, ys, px, py):
        """Paths broken at NaN/None (reference break_on_gaps analog)."""
        segs, cur = [], []
        for x, y in zip(xs, ys):
            if _fin(x) and _fin(y) and (not self.log_y or y > 0):
                cur.append(f"{px(x):.2f},{py(y):.2f}")
            elif cur:
                segs.append(cur)
                cur = []
        if cur:
            segs.append(cur)
        return [s for s in segs if len(s) >= 1]

    def to_svg(self) -> str:
        ml, mr, mt, mb = self._m
        px, py, (x0, x1, y0, y1) = self._proj()
        W, H, ih = self.width, self.height, self.height - mt - mb
        out = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
            f'viewBox="0 0 {W} {H}" font-family="sans-serif" font-size="11">',
            f'<rect width="{W}" height="{H}" fill="white"/>',
        ]
        # axes frame
        out.append(
            f'<rect x="{ml}" y="{mt}" width="{W - ml - mr}" height="{ih}" '
            'fill="none" stroke="#333" stroke-width="0.8"/>'
        )
        # y ticks
        if self.log_y:
            yt = [10 ** e for e in range(math.floor(y0), math.ceil(y1) + 1)]
        else:
            yt = _nice_ticks(y0, y1)
        for t in yt:
            yy = py(t)
            if mt - 1 <= yy <= mt + ih + 1:
                out.append(
                    f'<line x1="{ml - 4}" y1="{yy:.1f}" x2="{ml}" y2="{yy:.1f}" stroke="#333" stroke-width="0.8"/>'
                )
                out.append(
                    f'<text x="{ml - 7}" y="{yy + 3.5:.1f}" text-anchor="end">{_esc(_fmt_num(t))}</text>'
                )
        # x ticks
        for t in _nice_ticks(x0, x1, 6):
            xx = px(t)
            lab = _fmt_ts(t, x1 - x0) if self.time_x else _fmt_num(t)
            out.append(
                f'<line x1="{xx:.1f}" y1="{mt + ih}" x2="{xx:.1f}" y2="{mt + ih + 4}" stroke="#333" stroke-width="0.8"/>'
            )
            out.append(
                f'<text x="{xx:.1f}" y="{mt + ih + 16}" text-anchor="middle">{_esc(lab)}</text>'
            )
        # layers
        for e in self._elems:
            if e[0] == "spans":
                _, ivs, color, alpha = e
                for a, b in ivs:
                    xa, xb = px(a), px(max(b, a))
                    out.append(
                        f'<rect x="{xa:.2f}" y="{mt}" width="{max(xb - xa, 1.0):.2f}" '
                        f'height="{ih}" fill="{color}" fill-opacity="{alpha}"/>'
                    )
            elif e[0] == "bars":
                _, cs, hs, bw, color = e
                wpx = max(1.0, px(x0 + bw) - px(x0))
                for c, h in zip(cs, hs):
                    if not (_fin(c) and _fin(h)):
                        continue
                    ytop, ybase = py(max(h, 0)), py(max(0.0, y0))
                    out.append(
                        f'<rect x="{px(c) - wpx / 2:.2f}" y="{ytop:.2f}" width="{wpx:.2f}" '
                        f'height="{max(ybase - ytop, 0):.2f}" fill="{color}"/>'
                    )
            elif e[0] == "line":
                _, xs, ys, color, lw = e
                for seg in self._polylines(xs, ys, px, py):
                    if len(seg) == 1:
                        out.append(
                            f'<circle cx="{seg[0].split(",")[0]}" cy="{seg[0].split(",")[1]}" r="{lw:.1f}" fill="{color}"/>'
                        )
                    else:
                        out.append(
                            f'<polyline points="{" ".join(seg)}" fill="none" '
                            f'stroke="{color}" stroke-width="{lw}"/>'
                        )
            elif e[0] == "markers":
                _, xs, ys, color, size, shape = e
                for x, y in zip(xs, ys):
                    if _fin(x) and _fin(y) and (not self.log_y or y > 0):
                        if shape == "x":
                            cx, cy, r = px(x), py(y), size
                            out.append(
                                f'<path d="M{cx - r:.1f} {cy - r:.1f}L{cx + r:.1f} {cy + r:.1f}'
                                f'M{cx - r:.1f} {cy + r:.1f}L{cx + r:.1f} {cy - r:.1f}" '
                                f'stroke="{color}" stroke-width="0.7"/>'
                            )
                        else:
                            out.append(
                                f'<circle cx="{px(x):.2f}" cy="{py(y):.2f}" r="{size:.1f}" fill="{color}"/>'
                            )
        # decorations
        if self.title:
            out.append(
                f'<text x="{W / 2:.0f}" y="{mt - 10}" text-anchor="middle" font-size="13">{_esc(self.title)}</text>'
            )
        if self.ylabel:
            out.append(
                f'<text x="14" y="{mt + ih / 2:.0f}" text-anchor="middle" '
                f'transform="rotate(-90 14 {mt + ih / 2:.0f})">{_esc(self.ylabel)}</text>'
            )
        if self.xlabel:
            out.append(
                f'<text x="{W / 2:.0f}" y="{H - 8}" text-anchor="middle">{_esc(self.xlabel)}</text>'
            )
        if self._legend:
            lx = ml + 8
            for lab, color, kind in self._legend:
                out.append(
                    f'<rect x="{lx}" y="{mt + 5}" width="10" height="10" fill="{color}"/>'
                    if kind != "line"
                    else f'<line x1="{lx}" y1="{mt + 10}" x2="{lx + 12}" y2="{mt + 10}" stroke="{color}" stroke-width="2"/>'
                )
                out.append(f'<text x="{lx + 16}" y="{mt + 14}">{_esc(lab)}</text>')
                lx += 16 + 7 * len(lab) + 14
        if self._annot:
            out.append(
                f'<text x="{ml + 4}" y="{mt + ih - 5}" font-size="10">{_esc(self._annot)}</text>'
            )
        out.append("</svg>")
        return "\n".join(out)


def heatmap_svg(
    row_labels: list[str],
    values: list[float],
    title: str,
    col_label: str,
    vmin: float = 0.0,
    vmax: float = 100.0,
) -> str:
    """1-column heatmap (reference plot_heatmap_coverage,
    scripts/ufz_water_qc_pipeline.py:358-368) with a viridis-ish ramp."""

    def ramp(t: float) -> str:
        t = min(1.0, max(0.0, t))
        stops = [(68, 1, 84), (59, 82, 139), (33, 145, 140), (94, 201, 98), (253, 231, 37)]
        i = min(int(t * (len(stops) - 1)), len(stops) - 2)
        f = t * (len(stops) - 1) - i
        rgb = [round(a + (b - a) * f) for a, b in zip(stops[i], stops[i + 1])]
        return f"rgb({rgb[0]},{rgb[1]},{rgb[2]})"

    W, H, ml, mt, cw = 320, 60 + 44 * len(row_labels), 90, 40, 110
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" font-family="sans-serif" font-size="11">',
        f'<rect width="{W}" height="{H}" fill="white"/>',
        f'<text x="{W / 2:.0f}" y="20" text-anchor="middle" font-size="12">{_esc(title)}</text>',
    ]
    for i, (lab, v) in enumerate(zip(row_labels, values)):
        y = mt + i * 44
        t = (v - vmin) / (vmax - vmin) if vmax > vmin else 0.0
        out.append(f'<rect x="{ml}" y="{y}" width="{cw}" height="40" fill="{ramp(t)}"/>')
        out.append(f'<text x="{ml - 6}" y="{y + 24}" text-anchor="end">{_esc(lab)}</text>')
        tcol = "white" if t < 0.6 else "black"
        out.append(
            f'<text x="{ml + cw / 2:.0f}" y="{y + 24}" text-anchor="middle" fill="{tcol}">{v:.1f}</text>'
        )
    out.append(
        f'<text x="{ml + cw / 2:.0f}" y="{mt + len(row_labels) * 44 + 16}" text-anchor="middle">{_esc(col_label)}</text>'
    )
    out.append("</svg>")
    return "\n".join(out)


def stack_svgs(panels: list[str]) -> str:
    """Stack full SVG documents vertically (the 2-row gaussian figure)."""
    import re

    dims = []
    for p in panels:
        m = re.search(r'width="(\d+)" height="(\d+)"', p)
        dims.append((int(m.group(1)), int(m.group(2))))
    W = max(w for w, _ in dims)
    H = sum(h for _, h in dims)
    out = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}">']
    y = 0
    for p, (_, h) in zip(panels, dims):
        inner = p[p.index(">") + 1 : p.rindex("</svg>")]
        out.append(f'<g transform="translate(0 {y})">{inner}</g>')
        y += h
    out.append("</svg>")
    return "\n".join(out)
