"""SVG bucket-figure sink (genie_spark/plots.py) — parse the emitted XML
back and check the geometry against the data: bar heights proportional
to values on each axis's own scale, marker positions on the line figure,
error-bar extents, labels, and the render_bucket_plots file contract.
Pure-Python (no Spark): rendering is driver-side presentation."""

import math
import os
import xml.etree.ElementTree as ET

import pytest

from genie_spark.plots import (
    MT,
    PH,
    bucket_label,
    render_bucket_plots,
    svg_twinx_bucket_bar,
    svg_twinx_bucket_line,
)

NS = {"s": "http://www.w3.org/2000/svg"}


def _parse(svg: str):
    return ET.fromstring(svg)


def _by_class(root, cls):
    return [
        e for e in root.iter()
        if e.get("class") == cls
    ]


def test_bucket_labels_match_reference_scheme():
    # plot_helpers.py:124-129 — bucket 0 = "None", k>0 = 2^(k-1)
    assert bucket_label(0) == "None"
    assert bucket_label(1) == "2^0"
    assert bucket_label(5) == "2^4"


def test_bar_heights_proportional_on_both_axes():
    left = {0: 0.25, 1: 0.5, 2: 1.0}
    right = {0: 10, 1: 40, 2: 20}
    root = _parse(svg_twinx_bucket_bar(left, right, "f1"))
    lbars = _by_class(root, "bar-left")
    rbars = _by_class(root, "bar-right")
    assert len(lbars) == len(rbars) == 3

    # left axis is [0,1]: height = PH * value
    for bar in lbars:
        v = float(bar.get("data-value"))
        assert math.isclose(float(bar.get("height")), PH * v, abs_tol=0.11)
        # bar sits on the x axis
        assert math.isclose(
            float(bar.get("y")) + float(bar.get("height")), MT + PH,
            abs_tol=0.2,
        )
    # right axis auto-scales to a nice max (>= data max); heights stay
    # proportional to each other
    h40 = float(rbars[1].get("height"))
    h10 = float(rbars[0].get("height"))
    h20 = float(rbars[2].get("height"))
    assert math.isclose(h40 / h10, 4.0, rel_tol=0.02)
    assert math.isclose(h40 / h20, 2.0, rel_tol=0.02)


def test_bar_error_bars_extend_std_on_left_scale():
    left = {1: (0.5, 0.1)}
    root = _parse(svg_twinx_bucket_bar(left, {1: 5}, "f1"))
    errs = _by_class(root, "errbar")
    assert len(errs) == 1
    y1, y2 = float(errs[0].get("y1")), float(errs[0].get("y2"))
    # total extent = 2 * std * PH (left scale is [0,1])
    assert math.isclose(abs(y2 - y1), 2 * 0.1 * PH, rel_tol=0.02)
    assert len(_by_class(root, "errcap")) == 2


def test_line_markers_positioned_on_left_scale():
    series = {0: 0.0, 1: 0.5, 2: 1.0}
    root = _parse(
        svg_twinx_bucket_line([series], {0: 1, 1: 2, 2: 3}, "recall")
    )
    markers = _by_class(root, "marker")
    assert len(markers) == 3
    for mk in markers:
        v = float(mk.get("data-value"))
        assert math.isclose(
            float(mk.get("cy")), MT + PH - PH * v, abs_tol=0.11
        )
    assert len(_by_class(root, "series")) == 1
    # polyline passes through every marker
    pts = _by_class(root, "series")[0].get("points").split()
    assert len(pts) == 3


def test_line_respects_bar_bucket_ids_subset():
    # the reference driver passes bucket_ids[1:] (drops "None")
    series = {0: 0.9, 1: 0.5, 2: 0.7}
    root = _parse(
        svg_twinx_bucket_line(
            [series], {1: 2, 2: 3}, "f1", bucket_ids=[1, 2]
        )
    )
    assert len(_by_class(root, "marker")) == 2
    texts = [t.text for t in root.iter(f"{{{NS['s']}}}text")]
    assert "None" not in texts and "2^0" in texts and "2^1" in texts


def test_values_clamp_to_axis_limits():
    root = _parse(svg_twinx_bucket_bar({1: 1.7}, {1: 1}, "f1"))
    bar = _by_class(root, "bar-left")[0]
    assert float(bar.get("height")) <= PH + 0.01


def test_render_bucket_plots_writes_reference_figures(tmp_path):
    bucket_obj = {
        "precision": {"0": 0.8, "3": 0.9},
        "recall": {"0": 0.7, "3": 0.6},
        "f1": {"0": 0.746, "3": 0.72},
        "val_relations_per_bucket": {"0": 4, "3": 11},
        "val_triples_per_bucket": {"0": 40, "3": 300},
    }
    out = render_bucket_plots(bucket_obj, str(tmp_path))
    assert sorted(out) == ["f1", "precision", "recall"]
    for metric, paths in out.items():
        assert [os.path.basename(p) for p in paths] == [
            f"bucket_{metric}_bar.svg", f"bucket_{metric}_line.svg"
        ]
        for p in paths:
            root = _parse(open(p, encoding="utf-8").read())
            assert root.tag == f"{{{NS['s']}}}svg"
    # string bucket keys (the JSON round-trip shape) must resolve
    root = _parse(open(out["precision"][0], encoding="utf-8").read())
    vals = sorted(
        float(b.get("data-value")) for b in _by_class(root, "bar-left")
    )
    assert vals == [0.8, 0.9]


def test_render_skips_absent_metrics(tmp_path):
    out = render_bucket_plots(
        {"f1": {"1": 0.5}, "val_relations_per_bucket": {"1": 2}},
        str(tmp_path),
        metrics=("precision", "f1"),
    )
    assert sorted(out) == ["f1"]


@pytest.mark.parametrize("kind", ["bar", "line"])
def test_empty_distribution_still_renders(kind):
    if kind == "bar":
        svg = svg_twinx_bucket_bar({1: 0.5}, {}, "f1")
    else:
        svg = svg_twinx_bucket_line([{1: 0.5}], {}, "f1")
    _parse(svg)  # well-formed XML
