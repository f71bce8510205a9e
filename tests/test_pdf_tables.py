"""PDF table extraction: positioned-grid goldens, grid-break rules,
empty cells, CJK cells, and the degradation contract."""

from __future__ import annotations

from openccnet_spark.sources.pdf import extract_pdf_tables
from openccnet_spark.sources.pdf_synth import (
    build_pdf_positioned,
    build_pdf_positioned_pages,
)


def _grid(x0, y0, rows, dx=120, dy=20):
    """Positioned items for a rows x cols text grid starting at (x0, y0)."""
    items = []
    for ri, row in enumerate(rows):
        for ci, cell in enumerate(row):
            if cell is not None:
                items.append((x0 + ci * dx, y0 - ri * dy, cell))
    return items


def test_golden_three_by_three_with_prose(spark):
    rows = [["name", "count", "ratio"],
            ["alpha", "12", "0.5"],
            ["beta", "7", "0.3"]]
    items = (
        [(72, 740, "Report preamble paragraph text")]
        + _grid(72, 700, rows)
        + [(72, 600, "Closing prose after the table")]
    )
    pages = extract_pdf_tables(build_pdf_positioned(items))
    assert len(pages) == 1
    assert pages[0] == [rows]


def test_missing_cell_renders_empty(spark):
    rows = [["h1", "h2", "h3"], ["a", None, "c"], ["d", "e", "f"]]
    # the None-cell row still matches the grid: x_tol catches the two
    # remaining runs against columns 1 and 3
    pages = extract_pdf_tables(build_pdf_positioned(_grid(72, 700, rows)))
    assert len(pages[0]) == 1
    got = pages[0][0]
    assert got[0] == ["h1", "h2", "h3"]
    assert got[1] == ["a", "", "c"]
    assert got[2] == ["d", "e", "f"]


def test_single_gridded_row_is_not_a_table(spark):
    items = _grid(72, 700, [["only", "one", "row"]]) + [(72, 650, "prose line")]
    assert extract_pdf_tables(build_pdf_positioned(items)) == [[]]


def test_incompatible_grids_split_into_two_tables(spark):
    t1 = [["a", "b"], ["c", "d"]]
    t2 = [["x", "y"], ["z", "w"]]
    items = _grid(72, 700, t1) + _grid(220, 640, t2)  # shifted left edges
    pages = extract_pdf_tables(build_pdf_positioned(items))
    assert pages[0] == [t1, t2]


def test_cjk_cells_and_multipage(spark):
    p1 = _grid(72, 700, [["项目", "数量"], ["软件", "三"]])
    p2 = [(72, 700, "no tables here")]
    pages = extract_pdf_tables(build_pdf_positioned_pages([p1, p2]))
    assert pages[0] == [[["项目", "数量"], ["软件", "三"]]]
    assert pages[1] == []


def test_garbage_degrades_to_empty(spark):
    assert extract_pdf_tables(b"%PDF-1.4 garbage") == []


def test_cli_tables_flag(tmp_path):
    from openccnet_spark.cli import main

    rows = [["k", "v"], ["size", "42"]]
    pdf = tmp_path / "doc.pdf"
    pdf.write_bytes(build_pdf_positioned(_grid(72, 700, rows)))
    out = tmp_path / "doc.txt"
    rc = main(["pdf", "-i", str(pdf), "-o", str(out), "--extract", "--tables"])
    assert rc == 0
    tsv = (tmp_path / "doc.txt.tables.tsv").read_text()
    assert tsv == "=== [Page 1] ===\nk\tv\nsize\t42\n\n"
