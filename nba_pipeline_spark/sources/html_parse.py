"""Recorded-HTML parsing for edge ingest (SURVEY §2.1 S1/S2).

The reference scrapes basketball-reference.com with
``pd.io.html.read_html`` (playerInfo.py:8, games.py:23,36,
boxScores.py:43, playByplay.py:107) and BeautifulSoup anchor walks
(coaches.py:15-19). This module is the sandbox-faithful equivalent:
a dependency-free (stdlib ``html.parser``) extraction of <table> grids
and <a> anchors from recorded page bytes, so the six pipeline
recompositions can run end-to-end from HTML → rows → lake without
network or bs4/lxml. Production swaps the page source for a requests
fetch; the parse contract is identical.

Quirks matched to the reference's inputs:

- duplicate header names are deduplicated pandas-style (PTS, PTS.1) —
  the same mangle ``read_html`` applies, which games.py relies on for
  the two score columns (P7 duplicate-name disambiguation);
- multi-row headers (box scores' two-level 'Basic Box Score Stats'
  over-header, boxScores.py:47-51): the LAST all-<th> row before data
  wins — flattening equivalent to the reference's droplevel;
- section-header rows inside <tbody> (the schedule's 'Playoffs'
  divider, games.py:50) surface as short data rows padded with None,
  exactly the shape the downstream filter expects;
- cell text is the concatenation of descendant text (anchors inside
  cells — team/player links — contribute their text), entity-decoded,
  whitespace-collapsed.
"""

from __future__ import annotations

from html.parser import HTMLParser

_VOID = {"br", "hr", "img", "input", "meta", "link"}


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[dict] = []
        self._rows: list[tuple[bool, list[str | None]]] | None = None
        self._cells: list[tuple[bool, str]] | None = None
        self._cell: list[str] | None = None
        self._cell_is_th = False
        self.anchors: list[tuple[str, str]] = []
        self._anchor_href: str | None = None
        self._anchor_text: list[str] | None = None

    # -- table structure -------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._rows = []
        elif tag == "tr" and self._rows is not None:
            self._cells = []
        elif tag in ("td", "th") and self._cells is not None:
            self._cell, self._cell_is_th = [], tag == "th"
        elif tag == "a":
            href = dict(attrs).get("href")
            if href is not None:
                self._anchor_href, self._anchor_text = href, []
        elif tag == "br" and self._cell is not None:
            self._cell.append(" ")

    def handle_endtag(self, tag: str) -> None:
        if tag in ("td", "th") and self._cell is not None and self._cells is not None:
            text = " ".join("".join(self._cell).split())
            self._cells.append((self._cell_is_th, text))
            self._cell = None
        elif tag == "tr" and self._cells is not None and self._rows is not None:
            if self._cells:
                all_th = all(is_th for is_th, _ in self._cells)
                self._rows.append((all_th, [t for _, t in self._cells]))
            self._cells = None
        elif tag == "table" and self._rows is not None:
            self._finish_table()
        elif tag == "a" and self._anchor_href is not None:
            self.anchors.append(
                (self._anchor_href, " ".join("".join(self._anchor_text or []).split()))
            )
            self._anchor_href = self._anchor_text = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)
        if self._anchor_text is not None:
            self._anchor_text.append(data)

    def _finish_table(self) -> None:
        rows = self._rows or []
        self._rows = None
        header: list[str] | None = None
        data: list[list[str | None]] = []
        for all_th, cells in rows:
            if all_th and not data:
                header = [c or "" for c in cells]  # last header row wins
            else:
                data.append(list(cells))
        if header is not None:
            header = _dedupe(header)
            width = len(header)
            data = [
                (r + [None] * (width - len(r)))[:width] if len(r) != width else r
                for r in data
            ]
        self.tables.append({"header": header, "rows": data})


def _dedupe(names: list[str]) -> list[str]:
    """pandas read_html-style duplicate-column mangle: X, X.1, X.2 ..."""
    seen: dict[str, int] = {}
    out = []
    for n in names:
        k = seen.get(n, 0)
        out.append(n if k == 0 else f"{n}.{k}")
        seen[n] = k + 1
    return out


def parse_tables(html: str | bytes) -> list[dict]:
    """All <table> grids in the page, document order. Each is a dict
    ``{"header": [name, ...] | None, "rows": [[cell|None, ...], ...]}``
    with rows padded/truncated to the header width."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    p = _TableParser()
    p.feed(html)
    p.close()
    return p.tables


def parse_anchors(html: str | bytes) -> list[tuple[str, str]]:
    """All (href, text) anchors, document order — the coaches.py:15-19
    link walk. Order-preserving; dedup is the caller's policy (the
    reference dedups hrefs keeping first occurrence)."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    p = _TableParser()
    p.feed(html)
    p.close()
    return p.anchors


def table_to_records(
    table: dict, columns: dict[str, str] | list[str] | None = None
) -> list[list[str | None]]:
    """Project a parsed table's rows to an ordered cell list.

    ``columns`` maps HEADER NAME -> output position order: a dict
    {header_name: out_name} keeps dict order as output order; a list of
    header names selects those. Header names absent from the table give
    None cells (the schedule pages' sometimes-missing 'Start (ET)' /
    'Unnamed' columns, games.py:34-44). With ``columns=None`` rows pass
    through in raw cell order."""
    if columns is None:
        return table["rows"]
    header = table["header"] or []
    wanted = list(columns.keys()) if isinstance(columns, dict) else list(columns)
    idx = [header.index(w) if w in header else None for w in wanted]
    return [
        [None if i is None or i >= len(r) else r[i] for i in idx]
        for r in table["rows"]
    ]
