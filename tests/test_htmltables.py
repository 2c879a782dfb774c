"""Unit tests for htmltables: <table> markup -> cell rows.

Oracle parity value-checks the fixture grid at both SFs; these pin the
library surface on pages the fixture can't reach: empty cells, carried
columns, thead/tbody exclusion from the cell pattern, the documented
nested-table truncation, and no-table documents producing zero rows.
"""

import pandas as pd

from ocr_application_spark.operators.htmltables import extract_html_tables


def _cells(spark, html, **extra):
    data = {"html_text": [html]}
    for k, v in extra.items():
        data[k] = [v]
    df = spark.createDataFrame(pd.DataFrame(data))
    return (
        extract_html_tables(df)
        .orderBy("table_idx", "row_idx", "col_idx")
        .collect()
    )


def test_grid_coordinates_and_header_flags(spark):
    rows = _cells(
        spark,
        "<table><tr><th>a</th><th>b</th></tr><tr><td>1</td><td>2</td></tr></table>",
    )
    got = [(r.table_idx, r.row_idx, r.col_idx, r.cell_text, r.is_header) for r in rows]
    assert got == [
        (0, 0, 0, "a", True),
        (0, 0, 1, "b", True),
        (0, 1, 0, "1", False),
        (0, 1, 1, "2", False),
    ]


def test_no_table_yields_zero_rows(spark):
    assert _cells(spark, "<p>just prose</p>") == []


def test_empty_cell_is_empty_string(spark):
    rows = _cells(spark, "<table><tr><td></td><td>x</td></tr></table>")
    assert [r.cell_text for r in rows] == ["", "x"]


def test_thead_tbody_are_not_cells(spark):
    rows = _cells(
        spark,
        "<table><thead><tr><th>h</th></tr></thead>"
        "<tbody><tr><td>v</td></tr></tbody></table>",
    )
    got = [(r.row_idx, r.cell_text, r.is_header) for r in rows]
    assert got == [(0, "h", True), (1, "v", False)]


def test_inner_markup_stripped_and_whitespace_collapsed(spark):
    rows = _cells(
        spark,
        "<table><tr><td>  <b>bold</b>\n  and <i>italic</i>\ttext </td></tr></table>",
    )
    assert rows[0].cell_text == "bold and italic text"


def test_carried_columns_survive_the_explode(spark):
    rows = _cells(spark, "<table><tr><td>x</td></tr></table>", url="https://e.com/p")
    assert rows[0].url == "https://e.com/p"


def test_two_tables_get_distinct_indices(spark):
    rows = _cells(
        spark,
        "<table><tr><td>a</td></tr></table><table><tr><td>b</td></tr></table>",
    )
    assert [(r.table_idx, r.cell_text) for r in rows] == [(0, "a"), (1, "b")]


def test_nested_table_truncates_at_inner_close_documented(spark):
    # documented regex-extraction limit: the outer table's non-greedy
    # match ends at the INNER </table>, so the outer cell sees the inner
    # cell's content and the trailing outer fragment is not re-scanned
    rows = _cells(
        spark,
        "<table><tr><td><table><tr><td>inner</td></tr></table></td></tr>"
        "<tr><td>after</td></tr></table>",
    )
    assert len(rows) == 1 and rows[0].cell_text == "inner"


def test_uppercase_and_attributed_tags(spark):
    rows = _cells(
        spark,
        '<TABLE CLASS="z"><TR><TD ALIGN=LEFT>V</TD><TH scope="col">H</TH></TR></TABLE>',
    )
    got = [(r.cell_text, r.is_header) for r in rows]
    assert got == [("V", False), ("H", True)]
