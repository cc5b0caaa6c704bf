"""Pallas kernel tests (interpreter mode on the CPU mesh; the same kernels
are exercised compiled on real TPU by tools/tpu_smoke.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_local_correlation_pallas_interpret(monkeypatch):
    from jax.experimental import pallas as pl

    import eemflow_tpu.ops.pallas.local_corr as lc

    # route pallas_call through the interpreter on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(lc.pl, "pallas_call", interp_call)

    from eemflow_tpu.models.eemflow import INDEX_53
    from eemflow_tpu.ops.correlation import local_correlation

    rng = np.random.default_rng(0)
    B, H, W, C = 1, 20, 24, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)

    got = lc.local_correlation_pallas(x, y, 4, INDEX_53)
    ref = local_correlation(x, y, 4, INDEX_53)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
