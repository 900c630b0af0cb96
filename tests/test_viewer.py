"""Trace viewer: replay fidelity + self-contained page generation.

The analog of the reference's TraceVisualizer smoke coverage: a recorded
trace replays tick-by-tick through the oracle, and the emitted HTML
carries the full frame data (gui/TraceVisualizer.java:22-103).
"""

import json
import os
import re

import pytest

from microrts_tpu.interop.trace import load_trace
from microrts_tpu.viewer import frames_from_trace, viewer_html

TRACE = "/root/reference/data/traces/itsNotSafe/" \
        "LightRush_AStarPathFinding_/trace_0.zip"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TRACE), reason="golden traces not mounted")


def test_frames_replay_every_tick():
    trace = load_trace(TRACE)
    data = frames_from_trace(trace, max_ticks=50)
    assert data["w"] > 0 and data["h"] > 0
    assert len(data["frames"]) == 50
    times = [f["t"] for f in data["frames"]]
    assert times == list(range(times[0], times[0] + 50)), \
        "viewer must have one frame per tick, not per trace entry"
    assert all(len(f["units"]) > 0 for f in data["frames"])


def test_viewer_html_is_self_contained():
    trace = load_trace(TRACE)
    html = viewer_html(trace, max_ticks=20)
    assert html.startswith("<!DOCTYPE html>")
    assert "http://" not in html and "https://" not in html, \
        "page must work offline with zero external fetches"
    m = re.search(r"const D = (\{.*?\});\n", html, re.S)
    d = json.loads(m.group(1))
    assert len(d["frames"]) == 20
    assert d["types"][0] == "Resource"
