"""Multi-chip numerical correctness on the virtual 8-device CPU mesh
(SURVEY §4): the DP×spatial-sharded train step must produce the SAME loss
and parameter updates as the single-device step — "runs" ≠ "right".

Covers: EEMFlow (conv family, device-voxelize production path), ERAFT
(lax.scan family with the carried corr pyramid), a sharded eval forward,
and a non-divisible spatial split (H=65 over 2 'spatial' shards exercises
GSPMD's uneven-partition padding against the halo exchange)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eemflow_tpu.data.device_input import make_device_preprocess
from eemflow_tpu.events.voxel import pad_events
from eemflow_tpu.parallel.mesh import make_mesh
from eemflow_tpu.train.optim import make_optimizer
from eemflow_tpu.train.trainer import create_train_state, make_train_step


def _event_batch(B, H, W, n_events=800, n_pad=1024, seed=0):
    rng = np.random.default_rng(seed)
    evs, ns = [], []
    for _ in range(B):
        ev = np.empty((n_events, 4), np.float32)
        ev[:, 0] = np.linspace(0.0, 0.04, n_events)
        ev[:, 1] = rng.integers(0, W, n_events)
        ev[:, 2] = rng.integers(0, H, n_events)
        ev[:, 3] = rng.choice([-1.0, 1.0], n_events)
        p, k, _ = pad_events(ev, n_pad)
        evs.append(p)
        ns.append(k)
    return {
        "events_old": jnp.asarray(np.stack(evs)),
        "events_new": jnp.asarray(np.stack(evs[::-1])),
        "n_old": jnp.asarray(np.asarray(ns, np.int32)),
        "n_new": jnp.asarray(np.asarray(ns, np.int32)),
        "flip_h": jnp.asarray(np.arange(B) % 2 == 0),
        "flip_v": jnp.zeros((B,), bool),
        "flow": jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32),
        "valid": jnp.ones((B, H, W), jnp.float32),
    }


def _shard(batch, mesh, spatial=True):
    dense = NamedSharding(mesh, P("data", "spatial") if spatial else P("data"))
    data = NamedSharding(mesh, P("data"))
    return {
        k: jax.device_put(v, dense if v.ndim >= 3 else data)
        for k, v in batch.items()
    }


def _run_step(model, batch, H, W, mesh=None, spatial=True, constrain=False):
    tx = make_optimizer(lr=1e-4, wdecay=5e-5, num_steps=100)
    preprocess = make_device_preprocess(5, H, W)
    if constrain:
        # device_put rejects uneven partitions; the spatial split happens
        # inside the jitted step (parallel.mesh.spatial_constraint)
        from eemflow_tpu.parallel.mesh import spatial_constraint

        _pre, _cons = preprocess, spatial_constraint(mesh, H)

        def preprocess(b):  # noqa: F811
            return _cons(_pre(b))

        spatial = False
    step = make_train_step(model, tx, preprocess=preprocess, donate=False)
    if mesh is None:
        state = create_train_state(
            model, jax.random.PRNGKey(0), batch, tx, preprocess=preprocess
        )
        state, metrics = step(state, batch)
        return state, metrics
    with mesh:
        state = create_train_state(
            model, jax.random.PRNGKey(0), batch, tx, preprocess=preprocess
        )
        state = jax.device_put(state, NamedSharding(mesh, P()))
        sbatch = _shard(batch, mesh, spatial=spatial)
        state, metrics = step(state, sbatch)
        jax.block_until_ready(metrics["loss"])
    return state, metrics


def _assert_state_close(s_ref, s_shard, atol):
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    got_leaves = jax.tree_util.tree_leaves(s_shard.params)
    assert len(ref_leaves) == len(got_leaves)
    worst = 0.0
    for r, g in zip(ref_leaves, got_leaves):
        worst = max(worst, float(jnp.max(jnp.abs(r - g))))
    assert worst < atol, f"max param deviation {worst} >= {atol}"


@pytest.mark.zoo
def test_eemflow_sharded_step_matches_single_device():
    from eemflow_tpu.models.eemflow import EEMFlow

    B, H, W = 4, 64, 64
    model = EEMFlow()
    batch = _event_batch(B, H, W)
    s_ref, m_ref = _run_step(model, batch, H, W, mesh=None)
    mesh = make_mesh(n_data=4, n_spatial=2)
    s_sh, m_sh = _run_step(model, batch, H, W, mesh=mesh)
    # identical math; only the psum/reduction order differs (fp32)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    _assert_state_close(s_ref, s_sh, atol=1e-5)


@pytest.mark.zoo
def test_eraft_sharded_scan_step_matches_single_device():
    """The lax.scan family: the carried corr pyramid and GRU state must
    survive batch+spatial sharding (the corr volume's [B*h*w, h, w] layout
    reshuffles the sharded axes every iteration)."""
    from eemflow_tpu.models.eraft import ERAFT

    B, H, W = 4, 64, 64
    model = ERAFT(n_first_channels=5, iters=2)
    batch = _event_batch(B, H, W, seed=1)
    s_ref, m_ref = _run_step(model, batch, H, W, mesh=None)
    mesh = make_mesh(n_data=4, n_spatial=2)
    s_sh, m_sh = _run_step(model, batch, H, W, mesh=mesh)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    _assert_state_close(s_ref, s_sh, atol=1e-5)


@pytest.mark.zoo
def test_sharded_step_non_divisible_spatial():
    """H=65 does not divide the 2-way 'spatial' axis: GSPMD pads the
    uneven partition; the result must still equal the single-device step."""
    from eemflow_tpu.models.eemflow import EEMFlow

    B, H, W = 4, 65, 64
    model = EEMFlow()
    batch = _event_batch(B, H, W, seed=2)
    s_ref, m_ref = _run_step(model, batch, H, W, mesh=None)
    mesh = make_mesh(n_data=4, n_spatial=2)
    s_sh, m_sh = _run_step(model, batch, H, W, mesh=mesh, constrain=True)
    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    _assert_state_close(s_ref, s_sh, atol=1e-5)


@pytest.mark.zoo
def test_eemflow_plus_sharded_eval_matches_single_device():
    """EEMFlow+ coarse-to-fine forward under DP×spatial sharding: the
    per-level SGU/backwarp gathers sample across the spatial shard
    boundary (unlike EEMFlow's local ops), so GSPMD must insert halo/
    gather collectives — the result must equal the single-device
    forward."""
    from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

    B, H, W = 4, 64, 64
    model = EEMFlowPlus()
    rng = np.random.default_rng(9)
    ev1 = jnp.asarray(rng.standard_normal((B, H, W, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((B, H, W, 5)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ev1, ev2)

    @jax.jit
    def fwd(v, a, b):
        _, flows = model.apply(v, a, b)
        return flows[-1]

    ref = np.asarray(fwd(variables, ev1, ev2))
    mesh = make_mesh(n_data=4, n_spatial=2)
    with mesh:
        sh = NamedSharding(mesh, P("data", "spatial"))
        v_sh = jax.device_put(variables, NamedSharding(mesh, P()))
        got = np.asarray(
            fwd(v_sh, jax.device_put(ev1, sh), jax.device_put(ev2, sh))
        )
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.zoo
def test_sharded_eval_forward_matches_single_device():
    """Batched sharded eval forward (the serving layout: batch over 'data',
    H over 'spatial') equals the unsharded forward."""
    from eemflow_tpu.models.eemflow import EEMFlow

    B, H, W = 8, 64, 64
    model = EEMFlow()
    rng = np.random.default_rng(3)
    ev1 = jnp.asarray(rng.standard_normal((B, H, W, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((B, H, W, 5)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), ev1, ev2)

    @jax.jit
    def fwd(v, a, b):
        _, flows = model.apply(v, a, b)
        return flows[-1]

    ref = np.asarray(fwd(variables, ev1, ev2))

    mesh = make_mesh(n_data=4, n_spatial=2)
    with mesh:
        sh = NamedSharding(mesh, P("data", "spatial"))
        v_sh = jax.device_put(variables, NamedSharding(mesh, P()))
        got = np.asarray(
            fwd(v_sh, jax.device_put(ev1, sh), jax.device_put(ev2, sh))
        )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_tester_sharded_eval_matches_unsharded():
    """Tester(mesh=...) — the eval CLIs' --shard_eval surface — places
    batched forwards data-sharded across the mesh and must reproduce the
    unsharded per-sample metrics exactly (incl. the non-divisible tail
    chunk, which stays unsharded)."""
    import flax.linen as nn

    from eemflow_tpu.eval.runner import Tester

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, e1, e2, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(
                jnp.concatenate([e1, e2], -1)
            )
            flow = nn.Conv(2, (3, 3), padding="SAME")(nn.relu(x))
            return (e1, e2), [flow]

    class DS:
        evaluation_type = "dense"

        def __len__(self):
            return 9  # 4+4+1: two sharded chunks + unsharded tail

        def __getitem__(self, i):
            rng = np.random.default_rng(200 + i)
            return {
                "event_volume_old":
                    rng.standard_normal((16, 16, 5)).astype(np.float32),
                "event_volume_new":
                    rng.standard_normal((16, 16, 5)).astype(np.float32),
                "flow": rng.standard_normal((16, 16, 2)).astype(np.float32),
                "event_valid": np.ones((16, 16, 1), np.float32),
            }

    model = TinyModel()
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 5)), jnp.zeros((1, 16, 16, 5)),
    )
    ref = Tester(model, variables).test_sequence(DS(), batch_size=4)
    mesh = make_mesh(n_data=4, n_spatial=2)
    got = Tester(model, variables, mesh=mesh).test_sequence(
        DS(), batch_size=4
    )
    np.testing.assert_allclose(got["AEE"], ref["AEE"], rtol=1e-6)
    np.testing.assert_allclose(
        got["pct3_outlier"], ref["pct3_outlier"], rtol=1e-6
    )
    assert got["n_samples"] == ref["n_samples"] == 9


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
