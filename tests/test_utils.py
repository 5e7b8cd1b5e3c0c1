"""Observability smoke tests."""

import logging

import numpy as np

from sangnom_tpu import Clip, sangnom2
from sangnom_tpu.utils import get_logger, log_dispatch, stage_scope


def test_dispatch_logging_emits_structured_line(caplog):
    lg = get_logger()
    lg.setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="sangnom_tpu"):
        log_dispatch(fmt="GRAY8", backend="x", order=1)
    assert any("fmt=GRAY8" in r.message and "order=1" in r.message
               for r in caplog.records)


def test_dispatch_log_fires_on_filter_call(caplog):
    clip = Clip.from_numpy([np.zeros((1, 8, 16), np.uint8)], "GRAY8")
    get_logger().setLevel(logging.INFO)
    with caplog.at_level(logging.INFO, logger="sangnom_tpu"):
        sangnom2(clip, order=2, aa=7)  # fresh param combo forces a retrace
    assert any("aa=7" in r.message for r in caplog.records)


def test_stage_scope_usable():
    with stage_scope("unit-test"):
        pass
