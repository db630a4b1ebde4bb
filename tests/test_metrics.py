"""Metrics registry tests."""

import io
import json

from optical_flow_tpu.utils.metrics import Metrics


def test_counters_gauges_histograms():
    sink = io.StringIO()
    m = Metrics(sink=sink)
    m.count("frames")
    m.count("frames", 2)
    m.gauge("fps", 123.4)
    m.observe_ms("step", 3.0)
    m.observe_ms("step", 30.0)
    with m.timer("host"):
        pass
    m.emit()
    snap = json.loads(sink.getvalue())
    assert snap["counters"]["frames"] == 3
    assert snap["gauges"]["fps"] == 123.4
    assert snap["histograms"]["step"]["count"] == 2
    assert snap["histograms"]["host"]["count"] == 1
    # bucket placement: 3ms -> bucket <=5, 30ms -> bucket <=50
    h = snap["histograms"]["step"]
    assert h["counts"][h["buckets_ms"].index(5)] == 1
    assert h["counts"][h["buckets_ms"].index(50)] == 1
