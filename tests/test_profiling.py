"""device_trace writes an xplane trace; no-op when dir is None."""

from happypose_tpu.utils.profiling import annotate, device_trace


def test_noop_without_dir():
    with device_trace(None):
        pass  # must not raise or write anything


def test_trace_written(tmp_path):
    import jax.numpy as jnp

    with device_trace(tmp_path / "tr"):
        with annotate("tiny-op"):
            jnp.ones(8).sum().block_until_ready()
    files = list((tmp_path / "tr").rglob("*.xplane.pb"))
    assert files, "no xplane trace written"
