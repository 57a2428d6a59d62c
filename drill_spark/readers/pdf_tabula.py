"""Table extraction over positioned PDF text — the tabula model.

The reference extracts tables with tabula (contrib/format-pdf
PdfUtils.java): detection per Nurminen's published method
("Algorithmic extraction of data in tables in PDF documents", Aalto
University 2013 — text-edge alignment + ruling lines), then either
the *basic* algorithm (column boundaries from horizontally-overlapping
text regions across lines) or the *spreadsheet* algorithm (cell grid
from ruling-line intersections). This module reimplements those
published methods over pdf_text's element/ruling output; behavior is
validated against the reference plugin's own test PDFs
(TestPdfFormat.java row/column expectations).
"""

from __future__ import annotations

from drill_spark.readers.pdf_text import Ruling, TextEl

# ------------------------------------------------------------- chunks


class Chunk:
    """A merged run of glyphs (tabula's TextChunk)."""

    __slots__ = ("x", "top", "right", "bottom", "parts")

    def __init__(self, el: TextEl):
        self.x = el.x
        self.top = el.top
        self.right = el.x + el.width
        self.bottom = el.top + el.height
        self.parts = [el]

    def add(self, el: TextEl):
        self.parts.append(el)
        self.x = min(self.x, el.x)
        self.top = min(self.top, el.top)
        self.right = max(self.right, el.x + el.width)
        self.bottom = max(self.bottom, el.top + el.height)

    @property
    def text(self) -> str:
        return "".join(p.text for p in self.parts)

    @property
    def height(self) -> float:
        return self.bottom - self.top

    @property
    def mid(self) -> float:
        return (self.x + self.right) / 2

    def vert_overlap_ratio(self, other) -> float:
        ov = min(self.bottom, other.bottom) - max(self.top, other.top)
        h = min(self.height, other.bottom - other.top)
        return ov / h if h > 0 else 0.0

    def __repr__(self):
        return f"<chunk {self.text!r} x={self.x:.1f} top={self.top:.1f}>"


def merge_words(els: list[TextEl], split_factor: float = 2.0) -> list[Chunk]:
    """Merge glyph elements into word-run chunks, PDF content order.

    A gap wider than ``split_factor``× the font's space width starts a
    new chunk; the gap is measured from the last NON-space glyph, so a
    run of literal space glyphs wide enough to be a column gutter also
    splits (text-layout PDFs separate columns with space runs). Small
    gaps merge, recording a space (tabula's TextChunk behavior)."""
    chunks: list[Chunk] = []
    cur: Chunk | None = None
    prev: TextEl | None = None  # last NON-space element
    n_spaces = 0
    for el in els:
        if el.text == " " or el.text == "\xa0":
            n_spaces += 1
            continue
        if cur is None or prev is None:
            cur = Chunk(el)
            chunks.append(cur)
            prev = el
            n_spaces = 0
            continue
        prev_right = prev.x + prev.width
        same_line = (
            min(cur.bottom, el.top + el.height) - max(cur.top, el.top)
        ) > 0.5 * min(cur.height, el.height)
        gap = el.x - prev_right
        sw = max(el.space_w, 1.0)
        if not same_line or gap > split_factor * sw or gap < -3.0 * sw:
            cur = Chunk(el)
            chunks.append(cur)
        else:
            if (n_spaces > 0 or gap > 0.45 * sw):
                sp = TextEl(prev_right, el.top, max(gap, 0.1), el.height, " ",
                            el.space_w, el.font_size)
                cur.add(sp)
            cur.add(el)
        prev = el
        n_spaces = 0
    out = [c for c in chunks if c.text.strip()]
    return out


class Line:
    __slots__ = ("chunks", "top", "bottom")

    def __init__(self, c: Chunk):
        self.chunks = [c]
        self.top = c.top
        self.bottom = c.bottom

    def add(self, c: Chunk):
        self.chunks.append(c)
        self.top = min(self.top, c.top)
        self.bottom = max(self.bottom, c.bottom)

    @property
    def x(self):
        return min(c.x for c in self.chunks)

    @property
    def right(self):
        return max(c.right for c in self.chunks)


def group_lines(chunks: list[Chunk]) -> list[Line]:
    """Group chunks into visual lines by vertical overlap."""
    lines: list[Line] = []
    for c in sorted(chunks, key=lambda c: (c.top, c.x)):
        placed = None
        for ln in lines:
            ov = min(ln.bottom, c.bottom) - max(ln.top, c.top)
            if ov > 0.5 * min(ln.bottom - ln.top, c.height):
                placed = ln
                break
        if placed is None:
            lines.append(Line(c))
        else:
            placed.add(c)
    lines.sort(key=lambda ln: ln.top)
    for ln in lines:
        ln.chunks.sort(key=lambda c: c.x)
    return lines


# ----------------------------------------------------- basic algorithm


def basic_extract(chunks: list[Chunk], region=None) -> list[list[str]]:
    """Tabula's BasicExtractionAlgorithm: column boundaries from
    horizontally-overlapping text regions accumulated across lines;
    each chunk lands in the first column whose right edge is at or
    beyond the chunk's left edge."""
    if region is not None:
        x0, top, x1, bottom = region
        chunks = [
            c for c in chunks
            if c.mid >= x0 and c.mid <= x1 and (c.top + c.bottom) / 2 >= top
            and (c.top + c.bottom) / 2 <= bottom
        ]
    if not chunks:
        return []
    lines = group_lines(chunks)

    regions: list[list[float]] = []  # [x, right]
    for ln_i, ln in enumerate(lines):
        pending = list(ln.chunks)
        if ln_i == 0:
            for c in pending:
                regions.append([c.x, c.right])
            continue
        for reg in regions:
            took = [c for c in pending if c.x <= reg[1] and c.right >= reg[0]]
            for c in took:
                reg[0] = min(reg[0], c.x)
                reg[1] = max(reg[1], c.right)
                pending.remove(c)
        for c in pending:
            regions.append([c.x, c.right])
    columns = sorted(r[1] for r in regions)

    rows: list[list[str]] = []
    for ln in lines:
        row = [""] * (len(columns) + 1)
        for c in ln.chunks:
            j = len(columns)
            for k, colr in enumerate(columns):
                if c.x <= colr:
                    j = k
                    break
            row[j] = (row[j] + " " + c.text).strip() if row[j] else c.text.strip()
        rows.append(row)
    # drop fully-empty trailing column
    while rows and all(not r[-1] for r in rows):
        rows = [r[:-1] for r in rows]
    return rows


# ------------------------------------------------ spreadsheet algorithm


def _snap_rulings(rulings: list[Ruling], tol: float = 2.0):
    """Cluster nearly-collinear rulings (agglomerative on the fixed
    coordinate) and join touching segments along each clustered line."""

    def join(segs: list[tuple], gap: float = 2.0) -> list[tuple]:
        segs = sorted(segs)
        out: list[tuple] = []
        for s in segs:
            if out and s[0] <= out[-1][1] + gap:
                out[-1] = (out[-1][0], max(out[-1][1], s[1]))
            else:
                out.append(s)
        return out

    def cluster(items: list[tuple]) -> list[tuple]:
        items.sort()
        groups: list[tuple[list, list]] = []
        for coord, seg in items:
            if groups and coord - groups[-1][0][-1] <= tol:
                groups[-1][0].append(coord)
                groups[-1][1].append(seg)
            else:
                groups.append(([coord], [seg]))
        out = []
        for coords, segs in groups:
            c = sum(coords) / len(coords)
            for seg in join(segs):
                out.append((c, seg))
        return out

    horiz = [(r.y1, (min(r.x1, r.x2), max(r.x1, r.x2))) for r in rulings if r.horizontal]
    vert = [(r.x1, (min(r.y1, r.y2), max(r.y1, r.y2))) for r in rulings if r.vertical]
    return cluster(horiz), cluster(vert)


def find_cells(rulings: list[Ruling], min_len: float = 8.0):
    """Minimal cell rectangles from ruling intersections (the published
    spreadsheet/lattice method): a cell needs all four corners present
    AND all four edges continuously covered by a single ruling segment."""
    hl, vl = _snap_rulings(rulings)
    hl = [(y, s) for y, s in hl if s[1] - s[0] >= min_len]
    vl = [(x, s) for x, s in vl if s[1] - s[0] >= min_len]
    eps = 2.0

    hy = sorted({y for y, _ in hl})
    vx = sorted({x for x, _ in vl})
    h_by_y: dict[float, list[tuple]] = {}
    for y, s in hl:
        h_by_y.setdefault(y, []).append(s)
    v_by_x: dict[float, list[tuple]] = {}
    for x, s in vl:
        v_by_x.setdefault(x, []).append(s)

    def h_covers(y, lo, hi) -> bool:
        return any(s[0] - eps <= lo and hi <= s[1] + eps for s in h_by_y.get(y, ()))

    def v_covers(x, lo, hi) -> bool:
        return any(s[0] - eps <= lo and hi <= s[1] + eps for s in v_by_x.get(x, ()))

    cells = []
    for yi_t, y_top in enumerate(hy):
        for xi_l, x_left in enumerate(vx):
            # corner present?
            if not (h_covers(y_top, x_left, x_left) and v_covers(x_left, y_top, y_top)):
                continue
            found = False
            for y_bot in hy[yi_t + 1:]:
                if found:
                    break
                if not v_covers(x_left, y_top, y_bot):
                    break  # left edge broken — no taller cell possible
                for x_right in vx[xi_l + 1:]:
                    if not h_covers(y_top, x_left, x_right):
                        break  # top edge broken — no wider cell possible
                    if (
                        h_covers(y_bot, x_left, x_right)
                        and v_covers(x_right, y_top, y_bot)
                    ):
                        cells.append((x_left, y_top, x_right, y_bot))
                        found = True
                        break
    return cells


def spreadsheet_extract(chunks: list[Chunk], rulings: list[Ruling],
                        region=None) -> list[list[str]]:
    """Tabula's SpreadsheetExtractionAlgorithm: build the cell grid
    from ruling intersections, pour text chunks into cells, emit rows
    sorted by the grid."""
    if region is not None:
        x0, top, x1, bottom = region
        pad = 3.0
        rulings = [
            r for r in rulings
            if min(r.x1, r.x2) >= x0 - pad and max(r.x1, r.x2) <= x1 + pad
            and min(r.y1, r.y2) >= top - pad and max(r.y1, r.y2) <= bottom + pad
        ]
        chunks = [
            c for c in chunks
            if x0 <= c.mid <= x1 and top <= (c.top + c.bottom) / 2 <= bottom
        ]
    cells = find_cells(rulings)
    if not cells:
        return []
    # assign chunks to cells by midpoint
    filled: dict[tuple, list[Chunk]] = {}
    for c in chunks:
        mx, my = c.mid, (c.top + c.bottom) / 2
        for cell in cells:
            if cell[0] <= mx <= cell[2] and cell[1] <= my <= cell[3]:
                filled.setdefault(cell, []).append(c)
                break
    # rows = distinct top edges, columns = distinct left edges
    row_tops = sorted({round(c[1], 1) for c in cells})
    col_lefts = sorted({round(c[0], 1) for c in cells})
    ri = {v: i for i, v in enumerate(row_tops)}
    ci = {v: i for i, v in enumerate(col_lefts)}
    grid: dict[tuple[int, int], str] = {}
    for cell in cells:
        parts = filled.get(cell, [])
        lines = group_lines(parts)
        text = " ".join(
            " ".join(c.text.strip() for c in ln.chunks) for ln in lines
        ).strip()
        grid[(ri[round(cell[1], 1)], ci[round(cell[0], 1)])] = text
    nrows = len(row_tops)
    ncols = len(col_lefts)
    return [[grid.get((r, c), "") for c in range(ncols)] for r in range(nrows)]


# ------------------------------------------------------- detection


def detect_tables(chunks: list[Chunk], rulings: list[Ruling],
                  page_w: float, page_h: float,
                  min_edge_lines: int = 4) -> list[tuple]:
    """Nurminen-style table-region detection: cluster text-alignment
    edges (left/mid/right x positions shared by >= ``min_edge_lines``
    lines); a vertical span where at least two alignment edges coexist
    is a candidate table; ruling-line cell groups are candidates too.
    Returns regions as (x0, top, x1, bottom), top-to-bottom."""
    lines = group_lines(chunks)
    if not lines:
        return []

    # --- ruling-derived regions (lattice tables) ---
    regions: list[list[float]] = []
    cells = find_cells(rulings)
    if len(cells) >= 4:
        # group adjacent cells into areas
        areas: list[list[float]] = []
        for (x0, y0, x1, y1) in cells:
            placed = False
            for a in areas:
                if not (x1 < a[0] - 4 or x0 > a[2] + 4 or y1 < a[1] - 4 or y0 > a[3] + 4):
                    a[0] = min(a[0], x0)
                    a[1] = min(a[1], y0)
                    a[2] = max(a[2], x1)
                    a[3] = max(a[3], y1)
                    placed = True
                    break
            if not placed:
                areas.append([x0, y0, x1, y1])
        # merge transitively
        changed = True
        while changed:
            changed = False
            for i in range(len(areas)):
                for j in range(i + 1, len(areas)):
                    a, b = areas[i], areas[j]
                    if not (b[2] < a[0] - 4 or b[0] > a[2] + 4 or b[3] < a[1] - 4 or b[1] > a[3] + 4):
                        a[0] = min(a[0], b[0])
                        a[1] = min(a[1], b[1])
                        a[2] = max(a[2], b[2])
                        a[3] = max(a[3], b[3])
                        del areas[j]
                        changed = True
                        break
                if changed:
                    break
        for a in areas:
            n_cells = sum(1 for c in cells if a[0] - 1 <= c[0] and c[2] <= a[2] + 1
                          and a[1] - 1 <= c[1] and c[3] <= a[3] + 1)
            if n_cells >= 4:
                regions.append(a)

    # --- text-edge regions ---
    tol = 2.0

    def edges_of(key) -> list[tuple[float, float, float]]:
        """(x, top, bottom) for x-positions aligned across many lines."""
        buckets: dict[int, list[Chunk]] = {}
        for ln in lines:
            for c in ln.chunks:
                buckets.setdefault(int(key(c) / tol), []).append(c)
        out = []
        for b, cs in buckets.items():
            # count distinct lines; require vertical continuity
            tops = sorted(c.top for c in cs)
            if len(tops) < min_edge_lines:
                continue
            # split into continuous runs (gap <= 3 line heights)
            avg_h = sum(c.height for c in cs) / len(cs)
            run: list[float] = []
            for t in tops:
                if run and t - run[-1] > 4.5 * avg_h:
                    if len(run) >= min_edge_lines:
                        out.append((b * tol, run[0], run[-1] + avg_h))
                    run = []
                run.append(t)
            if len(run) >= min_edge_lines:
                out.append((b * tol, run[0], run[-1] + avg_h))
        return out

    all_edges = (edges_of(lambda c: c.x)
                 + edges_of(lambda c: c.mid)
                 + edges_of(lambda c: c.right))

    # a line is "tabular" if >= 2 edges cross it and it has >= 2 chunks
    cand: list[tuple[int, Line]] = []
    for i, ln in enumerate(lines):
        mid_y = (ln.top + ln.bottom) / 2
        n_edges = sum(1 for (_x, t, b) in all_edges if t - 2 <= mid_y <= b + 2)
        if n_edges >= 2 and len(ln.chunks) >= 2:
            cand.append((i, ln))

    # group consecutive candidate lines into regions
    text_regions: list[list[float]] = []
    prev_i = None
    for i, ln in enumerate(lines):
        if not any(ci == i for ci, _ in cand):
            continue
        if (
            text_regions
            and prev_i is not None
            and i - prev_i <= 2
            and ln.top - text_regions[-1][3] < 3.0 * (ln.bottom - ln.top)
        ):
            r = text_regions[-1]
            r[0] = min(r[0], ln.x)
            r[1] = min(r[1], ln.top)
            r[2] = max(r[2], ln.right)
            r[3] = max(r[3], ln.bottom)
        else:
            text_regions.append([ln.x, ln.top, ln.right, ln.bottom])
        prev_i = i
    # keep text regions with >= 3 lines of content
    kept = []
    for r in text_regions:
        n_lines = sum(1 for ln in lines if r[1] - 2 <= ln.top and ln.bottom <= r[3] + 2)
        if n_lines >= 3:
            kept.append(r)

    # merge ruling regions with overlapping text regions (ruling wins)
    final: list[list[float]] = list(regions)
    for tr in kept:
        merged = False
        for fr in final:
            if not (tr[2] < fr[0] or tr[0] > fr[2] or tr[3] < fr[1] or tr[1] > fr[3]):
                merged = True
                break
        if not merged:
            final.append(tr)
    final.sort(key=lambda r: r[1])
    return [tuple(r) for r in final]
