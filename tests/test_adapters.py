"""Per-family trainer/tester adapter tests: every input/loss family trains
a few steps (finite loss, nonzero grads) and evaluates through the Tester —
the functional equivalent of the reference's 7 trainer + 6 tester
subclasses (``train_mvsec.py:352-1258``, ``test_mvsec.py:1395-2039``).
Also: bf16 mixed-precision step (fp32 master params) and fwd drift bounds."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eemflow_tpu.train.adapters import FAMILIES, MODEL_FAMILY, get_family
from eemflow_tpu.train.optim import make_optimizer

# every family test jit-compiles a full train step — zoo tier
pytestmark = pytest.mark.zoo
from eemflow_tpu.train.trainer import (
    cast_floating,
    create_train_state,
    make_train_step,
)

RNG = np.random.default_rng(5)


def _f32(shape, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, jnp.float32)


def _flow_batch(B, H, W):
    return {
        "flow": jnp.ones((B, H, W, 2), jnp.float32),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }


def _segs(B, S, N, H, W):
    return jnp.asarray(
        np.stack(
            [
                RNG.uniform(0, W, (B, S, N)),
                RNG.uniform(0, H, (B, S, N)),
                np.sort(RNG.uniform(0, 1, (B, S, N)), axis=-1),
                RNG.choice([-1.0, 1.0], (B, S, N)),
            ],
            axis=-1,
        ),
        jnp.float32,
    )


def _grad_norm(grads):
    return float(
        jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2)
                for g in jax.tree_util.tree_leaves(grads))
        )
    )


def _run_family(model, family, batch, steps=3):
    tx = make_optimizer(lr=1e-4, num_steps=100)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx,
                               family=family)
    p0 = jax.tree_util.tree_map(lambda x: x, state.params)
    step = make_train_step(model, tx, family=family, donate=False)
    for _ in range(steps):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), (family, loss)
    # params moved → gradients were nonzero
    delta = _grad_norm(
        jax.tree_util.tree_map(lambda a, b: a - b, state.params, p0)
    )
    assert delta > 0, family
    return state, metrics


def test_two_volume_family():
    from eemflow_tpu.models.eemflow import EEMFlow

    B, H, W = 2, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    _run_family(EEMFlow(), "two_volume", batch)


def test_single_volume_family_spike():
    from eemflow_tpu.models.spike import SpikeFlowNetS

    B, H, W, T = 1, 32, 32, 3
    batch = {"event_volume": _f32((B, H, W, 4, T)), **_flow_batch(B, H, W)}
    _run_family(SpikeFlowNetS(), "single_volume", batch)


def test_single_volume_family_steflow():
    from eemflow_tpu.models.spike import STEFlowNet

    B, H, W, T = 1, 32, 32, 2
    batch = {"event_volume": _f32((B, H, W, 2, T)), **_flow_batch(B, H, W)}
    _run_family(STEFlowNet(num_iterative=1), "single_volume", batch, steps=2)


def test_seg_events_family():
    from eemflow_tpu.models.gma_rnn import RAFTGMA_RNN

    B, H, W = 1, 32, 32
    batch = {"event_raw": _segs(B, 2, 32, H, W), **_flow_batch(B, H, W)}
    _run_family(RAFTGMA_RNN(iters=1, image_size=(H, W)), "seg_events", batch,
                steps=2)


def test_event_image_family():
    from eemflow_tpu.models.dceiflow import DCEIFlow

    B, H, W = 1, 64, 64
    batch = {
        "event_volume": jnp.asarray(RNG.random((B, H, W, 10)), jnp.float32),
        "image1": jnp.asarray(RNG.random((B, H, W, 3)) * 255, jnp.float32),
        **_flow_batch(B, H, W),
    }
    _run_family(DCEIFlow(iters=2), "event_image", batch, steps=2)


def test_dense_sparse_family():
    from eemflow_tpu.models.unite import UNetERAFT

    B, H, W = 1, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        "d_event_volume_old": _f32((B, H, W, 5)),
        "d_event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    state, metrics = _run_family(UNetERAFT(iters=2), "dense_sparse", batch,
                                 steps=2)
    assert "reg_loss" in metrics and np.isfinite(float(metrics["reg_loss"]))


def test_dense_ctx_family():
    from eemflow_tpu.models.unite import UNetDenseCTX

    B, H, W = 1, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        "d_event_volume_old": _f32((B, H, W, 5)),
        "d_event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    _run_family(UNetDenseCTX(iters=2), "dense_ctx", batch, steps=2)


def test_mimounet_family():
    from eemflow_tpu.models.unite import MIMOUNetERAFT

    B, H, W = 1, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        "d_event_volume_old": _f32((B, H, W, 5)),
        "d_event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    state, metrics = _run_family(MIMOUNetERAFT(iters=2), "mimounet", batch,
                                 steps=2)
    assert "reg_loss" in metrics


def test_gmflownet_family():
    from eemflow_tpu.models.gmflownet import GMFlowNetModel

    B, H, W = 1, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    state, metrics = _run_family(
        GMFlowNetModel(iters=2, depth=1), "gmflownet", batch, steps=2
    )
    assert "match_loss" in metrics and np.isfinite(float(metrics["match_loss"]))


def test_tester_families_eval():
    """Tester.run_sample serves the non-two-volume families (reference
    TestSteRaft/TestDCEI input contracts)."""
    from eemflow_tpu.eval.runner import Tester
    from eemflow_tpu.models.dceiflow import DCEIFlow
    from eemflow_tpu.models.spike import SpikeFlowNetS

    H, W = 32, 32
    m = SpikeFlowNetS()
    ev = _f32((1, H, W, 4, 2))
    v = m.init(jax.random.PRNGKey(0), ev)
    t = Tester(m, v, family="single_volume")
    flow = t.run_sample({"event_volume": np.asarray(ev[0])})
    assert flow.shape == (H, W, 2)

    H, W = 64, 64
    m2 = DCEIFlow(iters=2)
    ev2 = jnp.asarray(RNG.random((1, H, W, 10)), jnp.float32)
    img = jnp.asarray(RNG.random((1, H, W, 3)) * 255, jnp.float32)
    v2 = m2.init(jax.random.PRNGKey(0), ev2, img)
    t2 = Tester(m2, v2, family="event_image")
    flow2 = t2.run_sample(
        {"event_volume": np.asarray(ev2[0]), "image1": np.asarray(img[0])}
    )
    assert flow2.shape == (H, W, 2)


@pytest.mark.smoke
def test_every_registry_flow_model_has_a_family():
    """Every trainable flow model in the registry maps to a family."""
    from eemflow_tpu.models.registry import MODEL_REGISTRY, _populate

    _populate()
    non_flow = {"unet", "unet_l", "unet_little", "mimo_unet", "event_transformer"}
    for name in MODEL_REGISTRY:
        if name in non_flow:
            continue
        assert get_family(name) is not None, name


def test_mixed_precision_train_step():
    """bf16 step: finite loss, master params stay fp32, loss decreases."""
    from eemflow_tpu.models.eemflow import EEMFlow

    B, H, W = 2, 64, 64
    batch = {
        "event_volume_old": _f32((B, H, W, 5)),
        "event_volume_new": _f32((B, H, W, 5)),
        **_flow_batch(B, H, W),
    }
    model = EEMFlow()
    tx = make_optimizer(lr=1e-3, num_steps=50)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(model, tx, mixed_precision=True, donate=False)
    state, m0 = step(state, batch)
    for _ in range(5):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


@pytest.mark.parametrize("model_name", ["eemflow", "eraft"])
def test_bf16_forward_drift_bounded(model_name):
    """bf16 forward EPE-vs-fp32 drift stays small relative to flow scale
    (the mixed-precision parity bound, VERDICT #3)."""
    from eemflow_tpu.models import get_model

    kwargs = {"iters": 4} if model_name == "eraft" else {}
    model = get_model(model_name, **kwargs)
    x1 = _f32((1, 64, 64, 5))
    x2 = _f32((1, 64, 64, 5))
    v = model.init(jax.random.PRNGKey(1), x1, x2)

    flow32 = np.asarray(model.apply(v, x1, x2)[1][-1], np.float32)
    v16 = cast_floating(v, jnp.bfloat16)
    flow16 = np.asarray(
        model.apply(
            v16, x1.astype(jnp.bfloat16), x2.astype(jnp.bfloat16)
        )[1][-1],
        np.float32,
    )
    drift = np.sqrt(((flow32 - flow16) ** 2).sum(-1)).mean()
    scale = np.sqrt((flow32**2).sum(-1)).mean() + 1e-3
    assert drift < 0.1 * scale + 0.05, (drift, scale)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


@pytest.mark.parametrize(
    "model_name,kwargs",
    [
        ("eemflow_plus", {}),
        ("eraft", {"iters": 2}),
        ("gma", {"iters": 2}),
        ("gmflow", {}),
        ("skflow", {"iters": 2}),
        ("kpaflow", {"iters": 2, "sc_enc": 4, "sc_dec": 4}),
        ("irrpwc", {}),
        ("irrpwc_occ", {}),
        ("raft", {"iters": 2}),
        ("flowformer", {"encoder_depth": 1, "decoder_depth": 2}),
        ("unite_denoise_raft", {"iters": 2}),
    ],
)
def test_remaining_zoo_trains(model_name, kwargs):
    """Every remaining two-volume registry model completes train steps with
    finite loss and moving params (VERDICT #2 'each registry model trains')."""
    from eemflow_tpu.models import get_model

    B, H, W = 1, 64, 64
    scale = 255.0 if model_name == "raft" else 1.0
    batch = {
        "event_volume_old": jnp.asarray(RNG.random((B, H, W, 3 if model_name == "raft" else 5)) * scale, jnp.float32),
        "event_volume_new": jnp.asarray(RNG.random((B, H, W, 3 if model_name == "raft" else 5)) * scale, jnp.float32),
        **_flow_batch(B, H, W),
    }
    _run_family(get_model(model_name, **kwargs), get_family(model_name), batch,
                steps=2)
