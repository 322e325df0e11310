"""Lattice debug report (utils/debug_report.py) — the reference roadmap's
planned `oscillink-debug` visualizer: one self-contained HTML file with
settle-dynamics traces, receipt-component bars, null-point z bars, the
alignment distribution, and table views."""

import json
import re
import xml.etree.ElementTree as ET

import numpy as np
import pytest

import oscillink_tpu as ot
from oscillink_tpu.utils.debug_report import generate_debug_report


@pytest.fixture(scope="module")
def report_and_lattice():
    rng = np.random.default_rng(0)
    centers = 3.0 * rng.standard_normal((6, 32)).astype(np.float32)
    Y = (
        centers[rng.integers(0, 6, size=120)]
        + 0.4 * rng.standard_normal((120, 32))
    ).astype(np.float32)
    psi = (centers[0] / np.linalg.norm(centers[0])).astype(np.float32)
    lat = ot.Oscillink(Y, kneighbors=6)
    lat.set_query(psi)
    html_doc = generate_debug_report(lat, settle_steps=4)
    return html_doc, lat


def _svgs(html_doc):
    return re.findall(r"<svg[^>]*>.*?</svg>", html_doc, flags=re.DOTALL)


def test_report_structure(report_and_lattice):
    html_doc, lat = report_and_lattice
    assert html_doc.startswith("<!DOCTYPE html>")
    svgs = _svgs(html_doc)
    assert len(svgs) == 5  # 2 traces, 2 bar charts, 1 histogram
    assert html_doc.count("<table") == 3  # bundle, settle trace, null points
    # the KPI row carries the receipt headline numbers
    rec = lat.receipt()
    assert f"{lat.N} x {lat.D}" in html_doc
    assert str(rec["meta"]["state_sig"]) in html_doc
    # single-file: no external fetches
    assert "http://" not in html_doc and "https://" not in html_doc
    assert "<script src" not in html_doc


def test_svgs_are_wellformed_and_in_bounds(report_and_lattice):
    html_doc, _ = report_and_lattice
    for svg in _svgs(html_doc):
        # valid XML after unescaping the single-quoted JSON attrs
        root = ET.fromstring(svg)
        vb = [float(x) for x in root.attrib["viewBox"].split()]
        w, h = vb[2], vb[3]
        for el in root.iter():
            tag = el.tag.split("}")[-1]
            if tag in ("circle",):
                assert 0 <= float(el.attrib["cx"]) <= w
                assert 0 <= float(el.attrib["cy"]) <= h
            if tag in ("rect",):
                assert float(el.attrib.get("width", 0)) >= 0
            if tag == "text":
                assert -1 <= float(el.attrib["x"]) <= w + 1
                assert 0 <= float(el.attrib["y"]) <= h


def test_tooltips_are_valid_json(report_and_lattice):
    html_doc, _ = report_and_lattice
    tips = re.findall(r"data-tip='([^']+)'", html_doc)
    assert tips, "per-mark tooltips must be present"
    for t in tips:
        rows = json.loads(t)
        assert all(len(r) == 2 for r in rows)
    lines = re.findall(r"data-line='([^']+)'", html_doc)
    assert len(lines) == 2  # the two trace charts carry crosshair data
    for ln in lines:
        pts = json.loads(ln)
        assert all(len(p) == 4 for p in pts)


def test_tooltip_js_uses_textcontent_not_innerhtml(report_and_lattice):
    html_doc, _ = report_and_lattice
    assert "innerHTML" not in html_doc
    assert "textContent" in html_doc


def test_report_writes_file(tmp_path):
    rng = np.random.default_rng(1)
    Y = rng.standard_normal((40, 16)).astype(np.float32)
    psi = (Y[:5].mean(0) / (np.linalg.norm(Y[:5].mean(0)) + 1e-12)).astype(
        np.float32
    )
    lat = ot.Oscillink(Y, kneighbors=4)
    lat.set_query(psi)
    out = tmp_path / "r.html"
    doc = generate_debug_report(lat, str(out), settle_steps=2, top_nodes=5)
    assert out.read_text() == doc
    # dynamics env flag restored
    import os

    assert os.environ.get("OSCILLINK_RECEIPT_DYNAMICS") is None


def test_cli_settle_debug_report(tmp_path):
    from oscillink_tpu.cli import main

    yp = tmp_path / "Y.npy"
    np.save(yp, np.random.default_rng(2).standard_normal((40, 12)).astype(np.float32))
    out = tmp_path / "report.html"
    rc = main(["settle", str(yp), "--kneighbors", "4",
               "--debug-report", str(out)])
    assert rc == 0
    doc = out.read_text()
    assert doc.startswith("<!DOCTYPE html>") and "<svg" in doc
