"""Adaptive retry ladder tests (the reference's failure-recovery subsystem)."""
import types

import pytest

from nellie_tpu.utils import adaptive_run


class FakeOOM(Exception):
    def __repr__(self):
        return "XlaRuntimeError: RESOURCE_EXHAUSTED: out of memory allocating"


def _fake_im_info():
    return types.SimpleNamespace(shape=(2, 8, 16, 16), axes="TZYX", no_t=False)


def test_ladder_escalates_on_oom():
    attempts = []

    def attempt(dev, low):
        attempts.append((dev, low))
        if len(attempts) < 2:
            raise FakeOOM()
        return "ok"

    result = adaptive_run.run_with_ladder("Test", "auto", False, _fake_im_info(), attempt)
    assert result == "ok"
    assert len(attempts) == 2
    # second attempt must be a lower setting than the first
    assert attempts[0] != attempts[1]


def test_ladder_reraises_non_oom():
    def attempt(dev, low):
        raise ValueError("real bug")

    with pytest.raises(ValueError, match="real bug"):
        adaptive_run.run_with_ladder("Test", "cpu", False, _fake_im_info(), attempt)


def test_ladder_exhausts_and_raises_last():
    def attempt(dev, low):
        raise FakeOOM()

    with pytest.raises(FakeOOM):
        adaptive_run.run_with_ladder("Test", "cpu", False, _fake_im_info(), attempt)


def test_is_oom_error():
    assert adaptive_run.is_oom_error(FakeOOM())
    assert adaptive_run.is_oom_error(MemoryError())
    assert not adaptive_run.is_oom_error(ValueError("nope"))


def test_mode_candidates_order():
    assert list(adaptive_run.mode_candidates(["accel", "cpu"], False)) == [
        ("accel", False), ("accel", True), ("cpu", False), ("cpu", True)]
    assert list(adaptive_run.mode_candidates(["cpu"], True)) == [("cpu", True)]
