"""Utility-layer tests: EMA, metric logging, profiling timer."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.utils import ema_init, ema_update
from lavie_tpu.utils.logging import MetricLogger, create_logger
from lavie_tpu.utils.profiling import device_timer


class TestEMA:
    def test_decay_math(self):
        p = {"w": jnp.zeros((3,))}
        ema = ema_init(p)
        new = {"w": jnp.ones((3,))}
        ema = ema_update(ema, new, decay=0.9)
        np.testing.assert_allclose(np.asarray(ema["w"]), 0.1, rtol=1e-6)
        ema = ema_update(ema, new, decay=0.9)
        np.testing.assert_allclose(np.asarray(ema["w"]), 0.19, rtol=1e-6)


class TestMetricLogger:
    def test_jsonl_stream(self, tmp_path):
        ml = MetricLogger(str(tmp_path))
        ml.log(1, {"loss": jnp.float32(0.5), "name": "x"})
        ml.log(2, {"loss": 0.25})
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
        assert lines[0]["name"] == "x"
        assert lines[1]["loss"] == 0.25


class TestLogger:
    def test_no_duplicate_handlers(self, tmp_path):
        lg1 = create_logger(str(tmp_path))
        lg2 = create_logger(str(tmp_path))
        assert lg1 is lg2
        assert not lg2.propagate
        assert len(lg2.handlers) == 2  # stream + file, not accumulated


class TestDeviceTimer:
    def test_records(self):
        res = {}
        with device_timer("op", res):
            _ = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        assert "op" in res and res["op"] >= 0
