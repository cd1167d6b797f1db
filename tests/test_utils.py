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


class TestTensorboard:
    def test_writer_roundtrip(self, tmp_path):
        from lavie_tpu.utils.logging import create_tensorboard, write_tensorboard

        w = create_tensorboard(str(tmp_path / "tb"))
        # no-op path must not raise even with writer=None
        write_tensorboard(None, 0, {"loss": 1.0})
        if w is not None:  # tensorboard available in this image
            write_tensorboard(w, 1, {"loss": 0.5, "bad": "skip-me"})
            w.flush()
            import os

            files = os.listdir(tmp_path / "tb")
            assert any("tfevents" in f for f in files)


class TestCounters:
    def test_count_params(self):
        from lavie_tpu.utils.profiling import count_params

        params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
        assert count_params(params) == 17

    def test_attention_flops(self):
        from lavie_tpu.utils.profiling import count_flops_attention

        # 2 matmuls x 2 flops/MAC x b h q k d
        assert count_flops_attention(2, 4, 8, 16, 32) == 2 * 2 * 2 * 4 * 8 * 16 * 32

    def test_compiled_flops(self):
        from lavie_tpu.utils.profiling import compiled_flops

        fl = compiled_flops(lambda a, b: a @ b, jnp.ones((64, 32)), jnp.ones((32, 16)))
        import math

        assert math.isnan(fl) or fl >= 2 * 64 * 32 * 16 * 0.5
