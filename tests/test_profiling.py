import time

from llmseg_tpu.utils.profiling import StepTimer, trace


def test_step_timer():
    t = StepTimer()
    time.sleep(0.01)
    t.mark("data")
    time.sleep(0.02)
    t.mark("step")
    time.sleep(0.01)
    t.mark("data")
    avg = t.averages()
    assert avg["data"] > 0 and avg["step"] > 0
    assert abs(avg["data"] - 0.01) < 0.01


def test_trace_disabled_noop(tmp_path):
    with trace(str(tmp_path), enabled=False):
        pass


def test_trace_enabled(tmp_path):
    with trace(str(tmp_path / "prof"), enabled=True):
        import jax.numpy as jnp

        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # a trace directory should exist with content
    import os

    assert any(os.scandir(str(tmp_path / "prof")))
