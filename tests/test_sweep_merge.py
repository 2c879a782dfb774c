"""W5 sorted sweep merge: fold semantics (utils.py:25-45 analog)."""

from ocr_application_spark.operators.sweep_merge import merge_sweep


def test_merges_heavy_overlap():
    # two boxes with IoU > 0.5 collapse to their union
    assert merge_sweep([(0, 0, 10, 10), (1, 0, 11, 10)]) == [(0.0, 0.0, 11.0, 10.0)]


def test_keeps_disjoint():
    boxes = [(0, 0, 10, 10), (100, 0, 110, 10)]
    assert merge_sweep(boxes) == [(0.0, 0.0, 10.0, 10.0), (100.0, 0.0, 110.0, 10.0)]


def test_iou_boundary_is_strict():
    # IoU exactly 0.5 must NOT merge (reference uses >)
    a, b = (0.0, 0.0, 2.0, 1.0), (1.0, 0.0, 3.0, 1.0)  # inter 1, union 3 -> 1/3
    assert len(merge_sweep([a, b])) == 2


def test_chain_merging_is_sequential():
    # c overlaps the MERGED union of a+b even though it barely overlaps b
    a, b, c = (0, 0, 10, 10), (0.5, 0, 10.5, 10), (1.0, 0, 11.0, 10)
    merged = merge_sweep([a, b, c])
    assert merged == [(0.0, 0.0, 11.0, 10.0)]


def test_order_canonical():
    # input order must not matter: fold is over sorted boxes
    boxes = [(5, 0, 15, 10), (0, 0, 10, 10), (100, 100, 120, 120)]
    assert merge_sweep(boxes) == merge_sweep(sorted(boxes)) == merge_sweep(boxes[::-1])
