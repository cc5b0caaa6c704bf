"""Golden tests: core ops vs torch-CPU reference semantics.

torch here is only the *oracle* (grid_sample / interpolate / avg_pool /
unfold); no torch is used in the framework itself.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from eemflow_tpu.ops import (
    InputPadder,
    avg_pool2d,
    bilinear_sampler,
    backwarp,
    backwarp_masked,
    build_corr_pyramid,
    convex_upsample_flow,
    local_correlation,
    lookup_corr_pyramid,
    resize_bilinear,
    upflow8,
    upsample2d_flow_as,
)
from eemflow_tpu.ops.warp import warp_align_corners

RNG = np.random.default_rng(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x_nhwc, (0, 3, 1, 2))))


def to_nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_input_padder_chairs_replicate():
    x = RNG.standard_normal((2, 37, 53, 5)).astype(np.float32)
    p = InputPadder((37, 53), mode="chairs", eval_pad_rate=64)
    out = p.pad(jnp.asarray(x))[0]
    # torch oracle: F.pad(l, r, t, b) replicate
    l, r, t, b = p._pad
    ref = TF.pad(nchw(x), (l, r, t, b), mode="replicate")
    np.testing.assert_allclose(np.asarray(out), to_nhwc(ref), rtol=0, atol=0)
    # unpad inverts
    np.testing.assert_array_equal(np.asarray(p.unpad(out)), x)


def test_avg_pool2d():
    x = RNG.standard_normal((2, 64, 96, 7)).astype(np.float32)
    for k in (2, 8, 16, 32):
        got = avg_pool2d(jnp.asarray(x), k)
        ref = TF.avg_pool2d(nchw(x), k, stride=k)
        np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_resize_bilinear_both_modes():
    x = RNG.standard_normal((2, 15, 23, 3)).astype(np.float32)
    for size in [(30, 46), (45, 92), (8, 11), (64, 64)]:
        for ac in (False, True):
            got = resize_bilinear(jnp.asarray(x), size, align_corners=ac)
            ref = TF.interpolate(nchw(x), size=size, mode="bilinear", align_corners=ac)
            np.testing.assert_allclose(
                np.asarray(got), to_nhwc(ref), atol=2e-5,
                err_msg=f"size={size} ac={ac}",
            )


def test_upflow8():
    x = RNG.standard_normal((1, 9, 13, 2)).astype(np.float32)
    got = upflow8(jnp.asarray(x))
    ref = 8 * TF.interpolate(nchw(x), size=(72, 104), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=2e-5)


def test_upsample2d_flow_as_rate():
    x = RNG.standard_normal((2, 10, 14, 2)).astype(np.float32)
    got = upsample2d_flow_as(jnp.asarray(x), (40, 56), if_rate=True)
    ref = TF.interpolate(nchw(x), size=(40, 56), mode="bilinear", align_corners=True)
    ref = ref * torch.tensor([56 / 14, 40 / 10]).view(1, 2, 1, 1)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=2e-4)


def _torch_grid_sample_pix(img_nhwc, px, py, align_corners):
    """Oracle: normalize pixel coords via 2x/(W-1)-1 then grid_sample."""
    img = nchw(img_nhwc)
    H, W = img.shape[-2:]
    gx = 2 * torch.from_numpy(px) / max(W - 1, 1) - 1
    gy = 2 * torch.from_numpy(py) / max(H - 1, 1) - 1
    grid = torch.stack([gx, gy], dim=-1)
    return TF.grid_sample(img, grid, align_corners=align_corners)


def test_bilinear_sampler_matches_grid_sample_ac_true():
    img = RNG.standard_normal((3, 12, 17, 4)).astype(np.float32)
    px = (RNG.uniform(-3, 19, (3, 7, 9))).astype(np.float32)
    py = (RNG.uniform(-3, 14, (3, 7, 9))).astype(np.float32)
    coords = jnp.stack([jnp.asarray(px), jnp.asarray(py)], axis=-1)
    got = bilinear_sampler(jnp.asarray(img), coords)
    ref = _torch_grid_sample_pix(img, px, py, align_corners=True)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_backwarp_matches_torch_warp():
    x = RNG.standard_normal((2, 11, 13, 3)).astype(np.float32)
    flow = (RNG.uniform(-4, 4, (2, 11, 13, 2))).astype(np.float32)
    got = backwarp(jnp.asarray(x), jnp.asarray(flow))
    # oracle replicating tensor_tools.torch_warp: ac=False grid_sample
    H, W = 11, 13
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = (gx[None] + flow[..., 0]).astype(np.float32)
    py = (gy[None] + flow[..., 1]).astype(np.float32)
    ref = _torch_grid_sample_pix(x, px, py, align_corners=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)


def test_backwarp_masked():
    x = RNG.standard_normal((1, 9, 10, 2)).astype(np.float32)
    flow = (RNG.uniform(-5, 5, (1, 9, 10, 2))).astype(np.float32)
    got = backwarp_masked(jnp.asarray(x), jnp.asarray(flow))
    H, W = 9, 10
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = (gx[None] + flow[..., 0]).astype(np.float32)
    py = (gy[None] + flow[..., 1]).astype(np.float32)
    ref = _torch_grid_sample_pix(x, px, py, align_corners=False)
    ones = _torch_grid_sample_pix(np.ones((1, 9, 10, 1), np.float32), px, py, False)
    ref = ref * (ones >= 1.0).float()
    # The reference thresholds a bilinear interpolation of ones at exactly
    # 1.0; torch occasionally rounds interior sums to 0.99999994 and spuriously
    # masks interior samples.  Our analytic mask is the exact semantics —
    # compare only where torch's ones-value is not fp-borderline.
    ones_np = to_nhwc(ones)[..., 0]
    stable = np.abs(ones_np - 1.0) > 1e-5
    stable |= ones_np == 1.0
    got_np = np.asarray(got)
    ref_np = to_nhwc(ref)
    np.testing.assert_allclose(got_np[stable], ref_np[stable], atol=1e-5)


def test_warp_align_corners():
    x = RNG.standard_normal((1, 9, 10, 2)).astype(np.float32)
    flow = (RNG.uniform(-5, 5, (1, 9, 10, 2))).astype(np.float32)
    got = warp_align_corners(jnp.asarray(x), jnp.asarray(flow))
    H, W = 9, 10
    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = (gx[None] + flow[..., 0]).astype(np.float32)
    py = (gy[None] + flow[..., 1]).astype(np.float32)
    ref = _torch_grid_sample_pix(x, px, py, align_corners=True)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(ref), atol=1e-5)


def _local_corr_oracle(x, y, md):
    """Naive numpy local correlation, dy-major channel order, /C."""
    B, H, W, C = x.shape
    k = 2 * md + 1
    ypad = np.pad(y, ((0, 0), (md, md), (md, md), (0, 0)))
    out = np.zeros((B, H, W, k * k), np.float32)
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sh = ypad[:, md + dy : md + dy + H, md + dx : md + dx + W, :]
            out[..., (dy + md) * k + (dx + md)] = (x * sh).sum(-1) / C
    return out


def test_local_correlation_full_and_sparse():
    x = RNG.standard_normal((2, 10, 12, 16)).astype(np.float32)
    y = RNG.standard_normal((2, 10, 12, 16)).astype(np.float32)
    ref = _local_corr_oracle(x, y, 4)
    got = local_correlation(jnp.asarray(x), jnp.asarray(y), 4)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
    # sparse channel subset — the EEMFlow 49-channel index
    idx = [1, 3, 5, 7, 9, 40, 41, 79, 80]
    got_s = local_correlation(jnp.asarray(x), jnp.asarray(y), 4, indices=idx)
    np.testing.assert_allclose(np.asarray(got_s), ref[..., idx], atol=1e-5)


def test_corr_pyramid_and_lookup():
    """Full CorrBlock parity vs a torch oracle implementing reference
    model/corr.py semantics (matmul/√C, avg-pool pyramid, window lookup with
    the x-major offset quirk)."""
    B, H, W, C = 2, 8, 12, 16
    r, levels = 4, 3
    f1 = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = RNG.standard_normal((B, H, W, C)).astype(np.float32)
    coords = RNG.uniform(0, 8, (B, H, W, 2)).astype(np.float32)

    pyr = build_corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=levels)
    got = lookup_corr_pyramid(pyr, jnp.asarray(coords), radius=r)

    # torch oracle
    t1 = nchw(f1).reshape(B, C, H * W)
    t2 = nchw(f2).reshape(B, C, H * W)
    corr = torch.matmul(t1.transpose(1, 2), t2).view(B, H, W, 1, H, W)
    corr = corr / np.sqrt(C)
    corr = corr.reshape(B * H * W, 1, H, W)
    out_pyr = []
    tc = torch.from_numpy(coords).view(B * H * W, 1, 1, 2)
    for i in range(levels):
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
        centroid = tc / 2**i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        Hl, Wl = corr.shape[-2:]
        gx = 2 * coords_lvl[..., 0] / max(Wl - 1, 1) - 1
        gy = 2 * coords_lvl[..., 1] / max(Hl - 1, 1) - 1
        sampled = TF.grid_sample(
            corr, torch.stack([gx, gy], dim=-1), align_corners=True
        )
        out_pyr.append(sampled.view(B, H, W, -1))
        corr = TF.avg_pool2d(corr, 2, stride=2)
    ref = torch.cat(out_pyr, dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_convex_upsample():
    B, h, w = 2, 6, 7
    flow = RNG.standard_normal((B, h, w, 2)).astype(np.float32)
    mask = RNG.standard_normal((B, h, w, 9 * 64)).astype(np.float32)
    got = convex_upsample_flow(jnp.asarray(flow), jnp.asarray(mask))

    # torch oracle replicating eraft.upsample_flow semantics
    tflow = nchw(flow)
    tmask = nchw(mask).view(B, 1, 9, 8, 8, h, w)
    tmask = torch.softmax(tmask, dim=2)
    up_flow = TF.unfold(8 * tflow, [3, 3], padding=1)
    up_flow = up_flow.view(B, 2, 9, 1, 1, h, w)
    up = torch.sum(tmask * up_flow, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3).reshape(B, 2, 8 * h, 8 * w)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(up), atol=5e-5)


def test_forward_interpolate_matches_torch():
    """Forward-splat warm-start op vs a direct port of the reference
    ``forward_interpolate_pytorch`` (``utils/image_utils.py:53``)."""
    import torch

    from eemflow_tpu.ops.warp import forward_interpolate

    def grid_sample_values(inp, height, width):
        ceil = torch.stack([torch.ceil(inp[0]), torch.ceil(inp[1]), inp[2]])
        floor = torch.stack([torch.floor(inp[0]), torch.floor(inp[1]), inp[2]])
        z = inp[2].clone()
        values_ipl = torch.zeros(height * width)
        weights_acc = torch.zeros(height * width)
        for x_vals in [floor[0], ceil[0]]:
            for y_vals in [floor[1], ceil[1]]:
                in_b = (x_vals < width) & (x_vals >= 0) & (y_vals < height) & (y_vals >= 0)
                weights = (1 - (inp[0] - x_vals).abs()) * (1 - (inp[1] - y_vals).abs())
                idx = (x_vals + width * y_vals).long()
                values_ipl.put_(idx[in_b], (z * weights)[in_b], accumulate=True)
                weights_acc.put_(idx[in_b], weights[in_b], accumulate=True)
        valid = (weights_acc > 0).reshape(height, width)
        vals = (values_ipl / (weights_acc + 1e-15)).reshape(height, width)
        return vals, valid

    rng = np.random.default_rng(7)
    B, H, W = 2, 9, 11
    flow = rng.standard_normal((B, H, W, 2)).astype(np.float32) * 3.0

    import jax

    got, got_valid = jax.jit(forward_interpolate)(jnp.asarray(flow))
    got = np.asarray(got)

    tflow = torch.from_numpy(flow.transpose(0, 3, 1, 2))
    dx, dy = tflow[:, 0], tflow[:, 1]
    y0, x0 = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    for b in range(B):
        x1 = (x0 + dx[b]).flatten()
        y1 = (y0 + dy[b]).flatten()
        ref_u, valid = grid_sample_values(
            torch.stack([x1, y1, dx[b].flatten()]), H, W)
        ref_v, _ = grid_sample_values(
            torch.stack([x1, y1, dy[b].flatten()]), H, W)
        np.testing.assert_allclose(got[b, ..., 0], ref_u.numpy(), atol=1e-4)
        np.testing.assert_allclose(got[b, ..., 1], ref_v.numpy(), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_valid)[b], valid.numpy())


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_corr_pyramid_fast_mode_close():
    """Serving-mode corr (bf16 operands, fp32 accumulation) tracks the
    parity-mode pyramid to bf16 input precision (~1e-2 relative)."""
    import jax.numpy as jnp
    import numpy as np

    from eemflow_tpu.ops.corr_block import build_corr_pyramid

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((2, 16, 24, 64)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((2, 16, 24, 64)), jnp.float32)
    exact = build_corr_pyramid(f1, f2, 4, fast=False)
    fast = build_corr_pyramid(f1, f2, 4, fast=True)
    for e, f in zip(exact, fast):
        # fp32 MXU accumulation, volumes STORED bf16 (halves lookup HBM)
        assert f.dtype == jnp.bfloat16
        err = np.max(np.abs(np.asarray(e) - np.asarray(f, np.float32)))
        scale = np.max(np.abs(np.asarray(e)))
        assert err / scale < 2e-2, err / scale

    # the dtype-adaptive lookup on the bf16 pyramid tracks the parity path
    from eemflow_tpu.ops.corr_block import lookup_corr_pyramid

    coords = jnp.asarray(rng.uniform(0, 12, (2, 16, 24, 2)), jnp.float32)
    ref = np.asarray(lookup_corr_pyramid(exact, coords, radius=4))
    got = np.asarray(lookup_corr_pyramid(fast, coords, radius=4))
    assert got.dtype == np.float32
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-6)
    assert err < 3e-2, err


def test_lookup_corr_stacked_matches_per_level():
    """The single-einsum-pair stacked lookup (all levels zero-padded to the
    level-0 extent) must reproduce the per-level lookup: padded corr cells
    only meet zero tap weights, so the contraction is exact up to addition
    order (extra fp32 zero addends)."""
    from eemflow_tpu.ops.corr_block import (
        build_corr_pyramid,
        lookup_corr_pyramid,
        lookup_corr_pyramid_stacked,
    )

    rng = np.random.default_rng(7)
    B, H, W, C = 2, 16, 24, 32
    f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    coords = jnp.asarray(rng.uniform(0, 12, (B, H, W, 2)), jnp.float32)
    pyr = build_corr_pyramid(f1, f2, num_levels=4)
    ref = np.asarray(lookup_corr_pyramid(pyr, coords, radius=4))
    got = np.asarray(lookup_corr_pyramid_stacked(pyr, coords, radius=4))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_eraft_stacked_lookup_close():
    """ERAFT with stacked_lookup=True produces the same flow (tolerance:
    summation-association noise through 12 GRU iterations)."""
    import jax

    from eemflow_tpu.models.eraft import ERAFT

    rng = np.random.default_rng(3)
    v1 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    base = ERAFT(iters=4)
    variables = base.init(jax.random.PRNGKey(0), v1, v2)
    _, flows_ref = base.apply(variables, v1, v2)
    _, flows_stk = ERAFT(iters=4, stacked_lookup=True).apply(variables, v1, v2)
    np.testing.assert_allclose(
        np.asarray(flows_stk[-1]), np.asarray(flows_ref[-1]), atol=5e-4
    )


def test_eraft_corr_fast_close():
    """Serving mode (bf16-stored corr volumes + bf16 tap lookup) tracks the
    parity forward: ≤1 px max / ≤0.2 px mean flow delta through 6 GRU
    iterations on random init whose flow scale is ~56 px (<1% relative).
    docs/PERF.md round 3: this mode is 26.6 vs 17.0 fps @512×960."""
    import jax

    from eemflow_tpu.models.eraft import ERAFT

    rng = np.random.default_rng(3)
    v1 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, 64, 96, 5)), jnp.float32)
    base = ERAFT(iters=6)
    variables = base.init(jax.random.PRNGKey(0), v1, v2)
    _, flows_ref = base.apply(variables, v1, v2)
    _, flows_fast = ERAFT(iters=6, corr_fast=True).apply(variables, v1, v2)
    d = np.abs(np.asarray(flows_fast[-1]) - np.asarray(flows_ref[-1]))
    assert d.max() < 1.0 and d.mean() < 0.2, (d.max(), d.mean())


def test_gmflownet_corr_fast_close():
    """gmflownet serving mode (bf16-stored corr pyramid, shared
    ops/corr_block fast path; the match-init softmaxes stay fp32) tracks
    the parity forward — same tolerance criterion as the ERAFT mode.
    Wires VERDICT r4 item 5: every RAFT-lineage zoo model exposes
    corr_fast (reference corr build: model/GMflownet/gmflownet_model.py:37
    + model/corr.py:12-60)."""
    import jax

    from eemflow_tpu.models.gmflownet import GMFlowNetModel

    rng = np.random.default_rng(7)
    v1 = jnp.asarray(rng.standard_normal((1, 48, 64, 5)), jnp.float32)
    v2 = jnp.asarray(rng.standard_normal((1, 48, 64, 5)), jnp.float32)
    base = GMFlowNetModel(iters=4, depth=2)
    variables = base.init(jax.random.PRNGKey(0), v1, v2)
    _, flows_ref = base.apply(variables, v1, v2)
    _, flows_fast = GMFlowNetModel(iters=4, depth=2, corr_fast=True).apply(
        variables, v1, v2
    )
    d = np.abs(np.asarray(flows_fast[-1]) - np.asarray(flows_ref[-1]))
    assert d.max() < 1.0 and d.mean() < 0.2, (d.max(), d.mean())
