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



def test_voxel_scatter_pallas_matches_xla():
    """Pallas per-bin scatter kernel (interpret mode) is bit-exact vs the
    XLA scatter voxelizer, incl. OOB coords, zero polarity, padded tails."""
    from eemflow_tpu.events.voxel import events_to_voxel_grid, pad_events
    from eemflow_tpu.ops.pallas.voxel_scatter import voxel_scatter_pallas

    rng = np.random.default_rng(3)
    H, W, bins = 24, 32, 5
    evs, ns = [], []
    for b in range(3):
        n = 400 + 100 * b
        ev = np.empty((n, 4), np.float32)
        ev[:, 0] = np.sort(rng.uniform(0, 0.04, n))
        ev[:, 1] = rng.integers(-1, W + 1, n)  # includes out-of-frame
        ev[:, 2] = rng.integers(0, H, n)
        ev[:, 3] = rng.choice([0.0, 1.0], n)
        p_, k_, _ = pad_events(ev, 1024)
        evs.append(p_)
        ns.append(k_)
    evs_j = jnp.asarray(np.stack(evs))
    ns_j = jnp.asarray(np.asarray(ns, np.int32))

    got = voxel_scatter_pallas(evs_j, ns_j, bins, H, W, interpret=True)
    ref = jax.vmap(
        lambda e, n: events_to_voxel_grid(e, n, bins, H, W, normalize=False)
    )(evs_j, ns_j)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def _eemflow_fast_vs_ref(monkeypatch, impl, groups=5, interpret=False):
    """Build EEMFlow twice on the same params — standard path vs fused
    coarse head — and return (ref, got) final flows."""
    if interpret:
        from jax.experimental import pallas as pl

        import eemflow_tpu.ops.pallas.coarse_head as ch

        orig = pl.pallas_call

        def interp_call(*args, **kwargs):
            kwargs["interpret"] = True
            return orig(*args, **kwargs)

        monkeypatch.setattr(ch.pl, "pallas_call", interp_call)

    from eemflow_tpu.models.eemflow import EEMFlow

    rng = np.random.default_rng(7)
    ev1 = jnp.asarray(rng.standard_normal((2, 128, 192, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((2, 128, 192, 5)), jnp.float32)
    m = EEMFlow(groups=groups)
    params = m.init(jax.random.PRNGKey(0), ev1, ev2)
    _, [ref] = m.apply(params, ev1, ev2)
    mf = EEMFlow(groups=groups, fast_head=True, fast_head_impl=impl)
    _, [got] = mf.apply(params, ev1, ev2)
    return np.asarray(ref), np.asarray(got)


def test_eemflow_coarse_head_xla_twin(monkeypatch):
    """The fused-math jnp twin (im2col matmuls, dense-ified grouped convs,
    shuffle folded into weight perms) matches the standard path to fp
    noise — validates the weight packing independently of Pallas."""
    ref, got = _eemflow_fast_vs_ref(monkeypatch, impl="xla")
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_eemflow_coarse_head_xla_twin_groups1(monkeypatch):
    """groups=1 decoder variant (no shuffle/grouped path in the packer)."""
    ref, got = _eemflow_fast_vs_ref(monkeypatch, impl="xla", groups=1)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_eemflow_coarse_head_pallas_interpret(monkeypatch):
    """The fused Pallas kernel (interpret mode) matches the standard
    EEMFlow forward end-to-end on the same params."""
    ref, got = _eemflow_fast_vs_ref(monkeypatch, impl="pallas",
                                    interpret=True)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def _interp_fused_convs(monkeypatch):
    from jax.experimental import pallas as pl

    import eemflow_tpu.ops.pallas.fused_convs as fc

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fc.pl, "pallas_call", interp_call)


def test_fused_convs_pool_matches_reference(monkeypatch):
    """fused_convs_pool (interpret mode) == chain of pad-1 3×3 convs +
    LeakyReLU + non-overlapping avg pool, incl. the boundary re-zeroing
    between convs (zero-pad semantics must not leak bias+relu)."""
    _interp_fused_convs(monkeypatch)
    import flax.linen as nn

    from eemflow_tpu.models.layers import leaky_relu01
    from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool
    from eemflow_tpu.ops.pooling import avg_pool2d

    rng = np.random.default_rng(11)
    B, H, W, C, pool = 2, 48, 64, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    ks = [
        jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
        for _ in range(2)
    ]
    bs = [
        jnp.asarray(rng.standard_normal((C,)) * 0.5, jnp.float32)
        for _ in range(2)
    ]

    ref = x
    for k, b in zip(ks, bs):
        ref = leaky_relu01(
            jax.lax.conv_general_dilated(
                ref, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + b
        )
    ref_pool = avg_pool2d(ref, pool)

    for variant in ("im2col", "taps"):
        full, pooled = fused_convs_pool(x, ks, bs, pool=pool,
                                        variant=variant)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(pooled), np.asarray(ref_pool), atol=1e-5
        )


def test_eemflow_fast_pyramid_interpret(monkeypatch):
    """EEMFlow(fast_pyramid=True) (interpret mode) matches the standard
    forward; bf16 compute stays within serving tolerance."""
    _interp_fused_convs(monkeypatch)
    from eemflow_tpu.models.eemflow import EEMFlow

    rng = np.random.default_rng(5)
    ev1 = jnp.asarray(rng.standard_normal((1, 128, 192, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 128, 192, 5)), jnp.float32)
    m = EEMFlow()
    params = m.init(jax.random.PRNGKey(0), ev1, ev2)
    _, [ref] = m.apply(params, ev1, ev2)
    _, [got] = EEMFlow(fast_pyramid=True).apply(params, ev1, ev2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    _, [gotb] = EEMFlow(
        fast_pyramid=True, fast_pyramid_dtype="bf16"
    ).apply(params, ev1, ev2)
    d = np.abs(np.asarray(gotb) - np.asarray(ref)).max()
    assert d < 0.05, f"bf16 fast pyramid drifted {d}"


def test_fused_convs_dense_concat_chain(monkeypatch):
    """concat=True chain (interpret mode) == the reference
    FlowEstimatorDense pattern: each conv's output is prepended to its
    input before the next conv; final conv linear, consuming the full
    buffer."""
    _interp_fused_convs(monkeypatch)
    from eemflow_tpu.models.layers import leaky_relu01
    from eemflow_tpu.ops.pallas.fused_convs import fused_convs_pool

    rng = np.random.default_rng(3)
    B, H, W, C = 1, 24, 40, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    fch = (8, 8, 4)
    cins = []
    ks, bs = [], []
    cin = C
    for f in fch:
        cins.append(cin)
        ks.append(jnp.asarray(
            rng.standard_normal((3, 3, cin, f)) * 0.3, jnp.float32))
        bs.append(jnp.asarray(rng.standard_normal((f,)) * 0.3, jnp.float32))
        cin += f
    ks.append(jnp.asarray(
        rng.standard_normal((3, 3, cin, 3)) * 0.3, jnp.float32))
    bs.append(jnp.asarray(rng.standard_normal((3,)) * 0.3, jnp.float32))

    conv = lambda v, k, b: jax.lax.conv_general_dilated(
        v, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    ref = x
    for k, b in zip(ks[:-1], bs[:-1]):
        ref = jnp.concatenate([leaky_relu01(conv(ref, k, b)), ref], axis=-1)
    ref = conv(ref, ks[-1], bs[-1])

    for variant in ("im2col", "taps"):
        got, _ = fused_convs_pool(
            x, ks, bs, pool=None, tile_rows=8, variant=variant,
            relus=(True,) * 3 + (False,), concat=(True,) * 3 + (False,),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-4
        )


def test_eemflow_both_fast_modes_interpret(monkeypatch):
    """fast_head + fast_pyramid COMPOSED (the --fast umbrella / bench
    serving configuration) matches the standard forward — the head
    consumes the fused pyramid's pooled grids."""
    _interp_fused_convs(monkeypatch)
    from jax.experimental import pallas as pl

    import eemflow_tpu.ops.pallas.coarse_head as ch

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ch.pl, "pallas_call", interp_call)
    from eemflow_tpu.models.eemflow import EEMFlow

    rng = np.random.default_rng(21)
    ev1 = jnp.asarray(rng.standard_normal((1, 128, 192, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 128, 192, 5)), jnp.float32)
    m = EEMFlow()
    params = m.init(jax.random.PRNGKey(0), ev1, ev2)
    _, [ref] = m.apply(params, ev1, ev2)
    _, [got] = EEMFlow(fast_head=True, fast_pyramid=True).apply(
        params, ev1, ev2
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_eemflow_plus_fast_modes_interpret(monkeypatch):
    """EEMFlowPlus(fast_pyramid/fast_decoders) (interpret mode) matches the
    standard coarse-to-fine forward on the same params; the fused decoder
    chain covers both the banded path (levels with H ≥ 7) and the
    short-grid fallback (coarsest levels), plus the shuffle-fold packing
    for groups=3."""
    _interp_fused_convs(monkeypatch)
    from eemflow_tpu.models.eemflow_plus import EEMFlowPlus

    rng = np.random.default_rng(13)
    ev1 = jnp.asarray(rng.standard_normal((1, 128, 192, 15)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 128, 192, 15)), jnp.float32)
    m = EEMFlowPlus()
    params = m.init(jax.random.PRNGKey(0), ev1, ev2)
    _, refs = m.apply(params, ev1, ev2)
    _, gots = EEMFlowPlus(
        fast_pyramid=True, fast_decoders=True, fast_sgu=True
    ).apply(params, ev1, ev2)
    assert len(gots) == len(refs)
    # f32 tolerance: the tap-accumulation variant (now used at every level —
    # Mosaic cannot lower the im2col X9 concat on v5e) reorders the 9-tap
    # dot summation; the ~1e-6 per-level noise is amplified to ~2e-4 by the
    # coarse-to-fine warp feedback at random-init flow magnitudes (10-17 px)
    for ref, got in zip(refs, gots):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-3
        )
    _, gotsb = EEMFlowPlus(
        fast_pyramid=True, fast_decoders=True, fast_sgu=True,
        fast_dtype="bf16"
    ).apply(params, ev1, ev2)
    # bf16 serving tolerance: mean drift relative to mean flow magnitude.
    # Max-drift is dominated by isolated warp-sample boundary crossings in
    # the coarse-to-fine feedback (random-init weights produce 10-17 px
    # flows — far rougher than any trained checkpoint); the mean is the
    # stable criterion.  Measured here: ~1.5% (pyramid ~0.5% + decoders
    # ~1.1%).
    d = np.abs(np.asarray(gotsb[-1]) - np.asarray(refs[-1])).mean()
    mag = np.abs(np.asarray(refs[-1])).mean()
    assert d / mag < 0.03, f"bf16 fast EEMFlow+ drifted {d} ({d / mag:.1%})"


def test_fused_update_block_matches_module():
    """The two banded update-block kernels (interpret mode on CPU) match
    BasicUpdateBlock exactly: motion encoder (two-branch 1×1/3×3/7×7 chain
    + flow concat) and SepConvGRU (both gate stages) + FlowHead, incl. the
    zero-pad re-masking that keeps σ(0)=½ gate values from leaking in at
    the image boundary."""
    import flax.linen as nn

    from eemflow_tpu.models.raft_core import BasicUpdateBlock
    from eemflow_tpu.ops.pallas.update_block import make_fused_update

    B, H, W = 1, 24, 30
    rng = np.random.default_rng(23)
    net = jnp.asarray(
        np.tanh(rng.standard_normal((B, H, W, 128))), jnp.float32
    )
    inp = jnp.asarray(
        np.maximum(rng.standard_normal((B, H, W, 128)), 0), jnp.float32
    )
    corr = jnp.asarray(rng.standard_normal((B, H, W, 324)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)), jnp.float32)

    mdl = BasicUpdateBlock()
    variables = mdl.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    net_ref, _, delta_ref = mdl.apply(variables, net, inp, corr, flow)

    fused = make_fused_update(variables["params"])
    net_got, delta_got = fused(net, inp, corr, flow)
    np.testing.assert_allclose(
        np.asarray(net_got), np.asarray(net_ref), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(delta_got), np.asarray(delta_ref), atol=2e-5
    )


def test_eraft_fused_update_matches_standard():
    """ERAFT(fused_update=True) — the fused-update serving mode — matches
    the standard eval forward (upsample_all=False) on the same params to
    fp noise; the mask head runs once on the final net in both."""
    from eemflow_tpu.models.eraft import ERAFT

    rng = np.random.default_rng(31)
    ev1 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    ev2 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    m = ERAFT(iters=3, upsample_all=False)
    variables = m.init(jax.random.PRNGKey(0), ev1, ev2)
    _, [ref] = m.apply(variables, ev1, ev2)
    mf = ERAFT(iters=3, upsample_all=False, fused_update=True)
    _, [got] = mf.apply(variables, ev1, ev2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
