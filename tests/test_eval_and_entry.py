"""Eval metrics/runner tests + multichip dryrun on the virtual CPU mesh."""

import numpy as np
import pytest

from eemflow_tpu.eval.metrics import flow_error


def test_flow_error_dense_and_sparse():
    H, W = 12, 10
    gt = np.zeros((H, W, 2), np.float32)
    gt[..., 0] = 2.0  # nonzero everywhere → all pixels valid
    pred = gt.copy()
    pred[0, 0, 0] = 5.0  # one 3px error
    aee, p1, p3, n, ee_sum, aee_gt, _ = flow_error(gt, pred)
    assert n == H * W
    np.testing.assert_allclose(aee, 3.0 / (H * W), rtol=1e-5)
    np.testing.assert_allclose(p1, (H * W - 1) / (H * W + 1e-5), rtol=1e-5)
    np.testing.assert_allclose(aee_gt, 2.0, rtol=1e-5)

    # sparse: only one event pixel, which has the error
    ev = np.zeros((H, W), np.float32)
    ev[0, 0] = 3
    aee_s, p1_s, p3_s, n_s, *_ = flow_error(gt, pred, event_img=ev, evaluation_type="sparse")
    assert n_s == 1
    np.testing.assert_allclose(aee_s, 3.0, rtol=1e-5)
    assert p1_s < 1e-4
    # KITTI 3px: EE=3 is not < 3, and 0.1*||gt||=0.2 → outlier
    assert p3_s < 1e-4

    # is_car: crop rows >= 190 — here max_row=190 > H so unchanged
    aee_c, *_ = flow_error(gt, pred, is_car=True)
    np.testing.assert_allclose(aee_c, aee, rtol=1e-6)


def test_flow_error_invalid_gt_masked():
    gt = np.zeros((8, 8, 2), np.float32)  # all-zero GT → no valid pixels
    pred = np.ones_like(gt)
    aee, p1, p3, n, *_ = flow_error(gt, pred)
    assert n == 0 and aee == 0.0


def test_tester_on_stub_dataset():
    import jax.numpy as jnp
    import flax.linen as nn

    class ZeroModel(nn.Module):
        @nn.compact
        def __call__(self, e1, e2, train=False):
            s = self.param("s", nn.initializers.zeros, (1,))
            return (e1, e2), [jnp.zeros(e1.shape[:3] + (2,)) + s]

    class StubDS:
        evaluation_type = "dense"

        def __init__(self):
            self.seqs = {"a": 3, "b": 2}
            self.n = 3

        def change_test_sequence(self, s):
            self.n = self.seqs[s]

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            gt = np.full((16, 16, 2), 2.0, np.float32)
            return {
                "event_volume_old": np.zeros((16, 16, 5), np.float32),
                "event_volume_new": np.zeros((16, 16, 5), np.float32),
                "flow": gt,
                "event_valid": np.ones((16, 16, 1), np.float32),
            }

    from eemflow_tpu.eval.runner import Tester

    model = ZeroModel()
    import jax

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 5)),
        jnp.zeros((1, 16, 16, 5)),
    )
    t = Tester(model, variables)
    res = t.test_multi_sequence(StubDS(), ["a", "b"])
    # zero prediction vs constant-2 flow → AEE = ||(2,2)|| = 2√2
    np.testing.assert_allclose(res["a"]["AEE"], 2 * np.sqrt(2), rtol=1e-5)
    np.testing.assert_allclose(res["mean"]["AEE"], 2 * np.sqrt(2), rtol=1e-5)
    assert res["a"]["n_samples"] == 3 and res["b"]["n_samples"] == 2



def test_batched_eval_matches_per_sample():
    """batch_size>1 eval (one fused forward per chunk) must produce the
    SAME per-sample metrics as the serialized per-sample protocol."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, e1, e2, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(jnp.concatenate([e1, e2], -1))
            flow = nn.Conv(2, (3, 3), padding="SAME")(nn.relu(x))
            return (e1, e2), [flow]

    class DS:
        evaluation_type = "dense"
        rng = np.random.default_rng(0)
        data = None

        def __len__(self):
            return 5

        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            return {
                "event_volume_old": rng.standard_normal((16, 16, 5)).astype(np.float32),
                "event_volume_new": rng.standard_normal((16, 16, 5)).astype(np.float32),
                "flow": rng.standard_normal((16, 16, 2)).astype(np.float32),
                "event_valid": np.ones((16, 16, 1), np.float32),
            }

    from eemflow_tpu.eval.runner import Tester

    model = TinyModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 5)), jnp.zeros((1, 16, 16, 5))
    )
    t = Tester(model, variables)
    ref = t.test_sequence(DS())
    got = t.test_sequence(DS(), batch_size=2)  # 2+2+1: exercises the tail
    np.testing.assert_allclose(got["AEE"], ref["AEE"], rtol=1e-6)
    np.testing.assert_allclose(got["pct1_outlier"], ref["pct1_outlier"], rtol=1e-6)
    assert got["n_samples"] == ref["n_samples"] == 5


@pytest.mark.zoo  # ~15 min on the 1-core VM — the multi-minute tier; the
# driver also runs dryrun_multichip directly every round (MULTICHIP_rNN)
def test_dryrun_multichip_8():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_inspect_utils():
    """count_parameters / check_tensor / FLOPs util (reference
    utils_luo/tools.py:2685-2743)."""
    import io

    import jax
    import jax.numpy as jnp

    from eemflow_tpu.models.eemflow import EEMFlow
    from eemflow_tpu.utils.inspect import (
        check_tensor,
        compute_model_flops,
        count_parameters,
        im_norm,
    )

    m = EEMFlow()
    x = jnp.zeros((1, 32, 32, 5))
    v = m.init(jax.random.PRNGKey(0), x, x)
    n = count_parameters(v)
    assert n > 1e4
    buf = io.StringIO()
    s = check_tensor(np.arange(6.0).reshape(2, 3), "t", print_in_txt=buf)
    assert "max:5.00" in s and "sum:15.00" in s
    out = im_norm(np.asarray([[0.0, 2.0]]))
    assert out.dtype == np.uint8 and out.max() == 255
    flops = compute_model_flops(lambda a, b: m.apply(v, a, b)[1][-1], x, x)
    assert flops["gflops"] > 0


def test_research_modes_warp_loss_and_multi_key(tmp_path):
    """inference_warp_loss (probe-point FWL, reference test_mvsec.py:753)
    and test_multi_key (key-map density CSV, test_mvsec.py:854)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    class ZeroModel(nn.Module):
        @nn.compact
        def __call__(self, e1, e2, train=False):
            s = self.param("s", nn.initializers.zeros, (1,))
            return (e1, e2), [jnp.zeros(e1.shape[:3] + (2,)) + s]

    class DS:
        evaluation_type = "dense"

        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {
                "event_volume_old": np.ones((16, 16, 5), np.float32),
                "event_volume_new": np.ones((16, 16, 5), np.float32),
                "flow": np.full((16, 16, 2), 3.0, np.float32),
                "event_valid": np.ones((16, 16, 1), np.float32),
            }

    from eemflow_tpu.eval.runner import ResearchTester

    model = ZeroModel()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 5)), jnp.zeros((1, 16, 16, 5))
    )
    t = ResearchTester(model, variables, save_path=str(tmp_path))
    # zero prediction vs constant (3,3) GT at every probe point → FWL = 3√2
    fwl = t.inference_warp_loss(DS(), stride=1)
    np.testing.assert_allclose(fwl, 3 * np.sqrt(2), rtol=1e-6)

    mean_aee, rows = t.test_multi_key(DS(), stride=1)
    np.testing.assert_allclose(mean_aee, 3 * np.sqrt(2), rtol=1e-5)
    assert len(rows) == 2 and rows[0][1] == 1.0  # input density (all ones)
    assert (tmp_path / "key_density.csv").exists()


def test_stablehlo_export_roundtrip():
    """Serving export (`tools/export_model.py` path): jax.export of the eval
    forward serializes and deserializes to an identical function."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from eemflow_tpu.models.registry import get_eval_model

    model = get_eval_model("eemflow")
    spec = jax.ShapeDtypeStruct((1, 32, 32, 5), jnp.float32)
    zeros = jnp.zeros(spec.shape, spec.dtype)
    variables = model.init(jax.random.PRNGKey(0), zeros, zeros)

    def infer(e1, e2):
        return model.apply(variables, e1, e2)[1][-1].astype(jnp.float32)

    exported = jexport.export(jax.jit(infer))(spec, spec)
    rt = jexport.deserialize(exported.serialize())
    rng = np.random.default_rng(0)
    e1 = jnp.asarray(rng.standard_normal(spec.shape), jnp.float32)
    e2 = jnp.asarray(rng.standard_normal(spec.shape), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rt.call(e1, e2)), np.asarray(infer(e1, e2)), atol=1e-5
    )
