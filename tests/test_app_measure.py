"""Measure-tool logic of the gradio demo (reference moge/scripts/app.py:200-228).

The gradio UI is optional; the click/measure math is plain numpy and tested
here without it.
"""

import numpy as np

from moge_tpu.scripts.app import measure_click, reset_measure


def _fake_results():
    h, w = 40, 60
    image = np.full((h, w, 3), 128, np.uint8)
    depth = np.fromfunction(lambda y, x: 1.0 + 0.1 * y, (h, w), dtype=np.float64)
    points = np.zeros((h, w, 3), np.float64)
    points[..., 0] = np.arange(w)[None, :] * 0.01
    points[..., 1] = np.arange(h)[:, None] * 0.01
    points[..., 2] = depth
    return {"image": image, "depth": depth, "points": points}


def test_first_click_reports_depth_only():
    results = _fake_results()
    image, pts, text = measure_click(results, [], (10, 20))
    assert pts == [(10, 20)]
    assert "P1 depth: 3.00m" in text
    assert "Distance" not in text
    # the click is drawn on a copy, not the stored image
    assert not np.array_equal(image, results["image"])
    assert np.all(results["image"] == 128)


def test_second_click_reports_distance_and_resets():
    results = _fake_results()
    _, pts, _ = measure_click(results, [], (10, 20))
    image, pts, text = measure_click(results, pts, (30, 20))
    assert pts == []  # round resets after two points
    a = results["points"][20, 10]
    b = results["points"][20, 30]
    expected = float(np.linalg.norm(a - b))
    assert f"Distance: {expected:.2f}m" in text
    assert "P1 depth" in text and "P2 depth" in text


def test_relative_units_for_nonmetric_model():
    results = _fake_results()
    _, pts, _ = measure_click(results, [], (0, 0), metric=False)
    _, _, text = measure_click(results, pts, (5, 0), metric=False)
    assert "m**" not in text
    assert "(relative)" in text


def test_measure_before_inference_and_reset():
    image, pts, text = measure_click(None, [], (1, 1))
    assert image is None and pts == [] and "Run inference first" in text
    assert reset_measure(None) == (None, [], "")
    results = _fake_results()
    image, pts, text = reset_measure(results)
    assert image is results["image"] and pts == [] and text == ""
