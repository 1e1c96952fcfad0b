"""StageTimer utility tests."""
import json
import time

from nellie_tpu.utils.profiling import StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.span("a"):
        time.sleep(0.01)
    with t.span("b"):
        pass
    assert t.spans["a"] >= 0.01
    assert t.total >= t.spans["a"]
    data = json.loads(t.to_json())
    assert set(data) == {"a", "b", "total"}
    assert "a:" in t.report()
