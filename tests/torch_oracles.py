"""Torch oracle models (test-only).

Independent PyTorch implementations of the reference architectures'
semantics, used to validate (a) the flax models and (b) the torch→flax
checkpoint converter: random-init the oracle, convert its state_dict, and
assert the JAX forward matches.  This is the same code path a released
reference checkpoint would take.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from eemflow_tpu.models.eemflow import INDEX_53


def torch_local_correlation(x, y, md=4):
    """Shift-based local correlation, dy-major channel order, /C."""
    B, C, H, W = x.shape
    k = 2 * md + 1
    ypad = F.pad(y, (md, md, md, md))
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            sh = ypad[:, :, md + dy : md + dy + H, md + dx : md + dx + W]
            outs.append((x * sh).sum(1) / C)
    return torch.stack(outs, dim=1)


def convrelu(cin, cout, k=3, s=1, p=1, groups=1):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, p, groups=groups), nn.LeakyReLU(0.1)
    )


class OracleDecoder(nn.Module):
    def __init__(self, cin, groups, mid=100):
        super().__init__()
        self.groups = groups
        self.conv1 = convrelu(cin, mid)
        self.conv2 = convrelu(mid, mid, groups=groups)
        self.conv3 = convrelu(mid, mid, groups=groups)
        self.conv4 = convrelu(mid, mid, groups=groups)
        self.conv5 = convrelu(mid, 64)
        self.conv6 = convrelu(64, 32)
        self.conv7 = nn.Conv2d(32, 2, 3, 1, 1)

    @staticmethod
    def shuffle(x, g):
        b, c, h, w = x.shape
        return x.view(b, g, c // g, h, w).transpose(1, 2).reshape(b, c, h, w)

    def forward(self, x):
        g = self.groups
        x = self.conv1(x)
        x = self.shuffle(self.conv2(x), g)
        x = self.shuffle(self.conv3(x), g)
        x = self.shuffle(self.conv4(x), g)
        return self.conv7(self.conv6(self.conv5(x)))


class OracleEEMFlow(nn.Module):
    def __init__(self, groups=5, n_first_channels=5, indices=INDEX_53):
        super().__init__()
        self.pconv1_1 = convrelu(n_first_channels, 16, s=2)
        self.pconv1_2 = convrelu(16, 16)
        self.pconv2_1 = convrelu(16, 32, s=2)
        self.pconv2_2 = convrelu(32, 32)
        self.pconv2_3 = convrelu(32, 32)
        self.pconv3_1 = convrelu(32, 64, s=2)
        self.pconv3_2 = convrelu(64, 64)
        self.pconv3_3 = convrelu(64, 64)
        self.register_buffer("index", torch.tensor(list(indices)))
        cin = len(indices) + 16
        self.rconv_1 = convrelu(16, 16)
        self.rconv_2 = convrelu(32, 16)
        self.rconv_3 = convrelu(64, 16)
        self.decoder_1 = OracleDecoder(cin, groups)
        self.decoder_2 = OracleDecoder(cin, groups)
        self.decoder_3 = OracleDecoder(cin, groups)
        self.out_conv = nn.Conv2d(6, 2, 1, 1)

    def pyramid(self, x):
        f1 = self.pconv1_2(self.pconv1_1(x))
        f2 = self.pconv2_3(self.pconv2_2(self.pconv2_1(f1)))
        f3 = self.pconv3_3(self.pconv3_2(self.pconv3_1(f2)))
        return f1, f2, f3

    def forward(self, ev1, ev2, pad_rate=64):
        H, W = ev1.shape[-2:]
        r = pad_rate
        pad_ht = (((H // r) + 1) * r - H) % r
        pad_wd = (((W // r) + 1) * r - W) % r
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
        ev1p = F.pad(ev1, pad, mode="replicate")
        ev2p = F.pad(ev2, pad, mode="replicate")

        f11, f12, f13 = self.pyramid(ev1p)
        f21, f22, f23 = self.pyramid(ev2p)

        f14_1 = F.avg_pool2d(f11, 32, 32)
        f24_1 = F.avg_pool2d(f21, 32, 32)
        f14_2 = F.avg_pool2d(f12, 16, 16)
        f24_2 = F.avg_pool2d(f22, 16, 16)
        f14_3 = F.avg_pool2d(f13, 8, 8)
        f24_3 = F.avg_pool2d(f23, 8, 8)

        idx = self.index.long()
        cv1 = torch.index_select(torch_local_correlation(f14_1, f24_1), 1, idx)
        cv2 = torch.index_select(torch_local_correlation(f14_2, f24_2), 1, idx)
        cv3 = torch.index_select(torch_local_correlation(f14_3, f24_3), 1, idx)

        flow1 = self.decoder_1(torch.cat([cv1, self.rconv_1(f14_1)], 1))
        flow2 = self.decoder_2(torch.cat([cv2, self.rconv_2(f14_2)], 1))
        flow3 = self.decoder_3(torch.cat([cv3, self.rconv_3(f14_3)], 1))

        out = self.out_conv(torch.cat([flow1, flow2, flow3], 1))
        return F.interpolate(out, size=(H, W), mode="bilinear", align_corners=False)


# ---------------------------------------------------------------- E-RAFT ----

class OracleResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride, 1)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1)

        def make_norm():
            if norm_fn == "group":
                return nn.GroupNorm(planes // 8, planes)
            if norm_fn == "batch":
                return nn.BatchNorm2d(planes)
            if norm_fn == "instance":
                return nn.InstanceNorm2d(planes)
            return nn.Sequential()

        self.norm1 = make_norm()
        self.norm2 = make_norm()
        if stride != 1:
            self.norm3 = make_norm()
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride), self.norm3
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class OracleBasicEncoder(nn.Module):
    def __init__(self, output_dim, norm_fn, n_first_channels):
        super().__init__()
        self.conv1 = nn.Conv2d(n_first_channels, 64, 7, 2, 3)
        if norm_fn == "group":
            self.norm1 = nn.GroupNorm(8, 64)
        elif norm_fn == "batch":
            self.norm1 = nn.BatchNorm2d(64)
        elif norm_fn == "instance":
            self.norm1 = nn.InstanceNorm2d(64)
        else:
            self.norm1 = nn.Sequential()
        self.layer1 = nn.Sequential(
            OracleResidualBlock(64, 64, norm_fn), OracleResidualBlock(64, 64, norm_fn)
        )
        self.layer2 = nn.Sequential(
            OracleResidualBlock(64, 96, norm_fn, 2), OracleResidualBlock(96, 96, norm_fn)
        )
        self.layer3 = nn.Sequential(
            OracleResidualBlock(96, 128, norm_fn, 2),
            OracleResidualBlock(128, 128, norm_fn),
        )
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        return self.conv2(self.layer3(self.layer2(self.layer1(x))))


def oracle_bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xg, yg = coords.split([1, 1], dim=-1)
    xg = 2 * xg / max(W - 1, 1) - 1
    yg = 2 * yg / max(H - 1, 1) - 1
    return F.grid_sample(img, torch.cat([xg, yg], -1), align_corners=True)


class OracleCorrBlock:
    def __init__(self, f1, f2, num_levels=4, radius=4):
        self.radius = radius
        b, c, h, w = f1.shape
        corr = torch.matmul(
            f1.view(b, c, h * w).transpose(1, 2), f2.view(b, c, h * w)
        ) / (c**0.5)
        corr = corr.view(b * h * w, 1, h, w)
        self.shape = (b, h, w)
        self.pyr = [corr]
        for _ in range(num_levels - 1):
            corr = F.avg_pool2d(corr, 2, 2)
            self.pyr.append(corr)

    def __call__(self, coords):
        r = self.radius
        b, h, w = self.shape
        coords = coords.permute(0, 2, 3, 1)
        out = []
        for i, corr in enumerate(self.pyr):
            d = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(d, d, indexing="ij"), -1)
            cl = coords.reshape(b * h * w, 1, 1, 2) / 2**i + delta.view(
                1, 2 * r + 1, 2 * r + 1, 2
            )
            out.append(oracle_bilinear_sampler(corr, cl).view(b, h, w, -1))
        return torch.cat(out, -1).permute(0, 3, 1, 2).contiguous()


class OracleUpdateBlock(nn.Module):
    def __init__(self, hidden=128, corr_levels=4, corr_radius=4):
        super().__init__()
        cor_planes = corr_levels * (2 * corr_radius + 1) ** 2

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.convc1 = nn.Conv2d(cor_planes, 256, 1)
                self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
                self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
                self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
                self.conv = nn.Conv2d(256, 126, 3, padding=1)

            def forward(self, flow, corr):
                c = F.relu(self.convc2(F.relu(self.convc1(corr))))
                f = F.relu(self.convf2(F.relu(self.convf1(flow))))
                out = F.relu(self.conv(torch.cat([c, f], 1)))
                return torch.cat([out, flow], 1)

        class Gru(nn.Module):
            def __init__(self, hd, ind):
                super().__init__()
                self.convz1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convr1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convq1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convz2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))
                self.convr2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))
                self.convq2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))

            def forward(self, h, x):
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(self.convz1(hx))
                r = torch.sigmoid(self.convr1(hx))
                q = torch.tanh(self.convq1(torch.cat([r * h, x], 1)))
                h = (1 - z) * h + z * q
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(self.convz2(hx))
                r = torch.sigmoid(self.convr2(hx))
                q = torch.tanh(self.convq2(torch.cat([r * h, x], 1)))
                return (1 - z) * h + z * q

        class Head(nn.Module):
            def __init__(self, hd):
                super().__init__()
                self.conv1 = nn.Conv2d(hd, 256, 3, padding=1)
                self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

            def forward(self, x):
                return self.conv2(F.relu(self.conv1(x)))

        self.encoder = Enc()
        self.gru = Gru(hidden, 128 + hidden)
        self.flow_head = Head(hidden)
        self.mask = nn.Sequential(
            nn.Conv2d(hidden, hidden * 2, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(hidden * 2, 64 * 9, 1),
        )

    def forward(self, net, inp, corr, flow):
        m = self.encoder(flow, corr)
        net = self.gru(net, torch.cat([inp, m], 1))
        return net, 0.25 * self.mask(net), self.flow_head(net)


class OracleERAFT(nn.Module):
    def __init__(self, n_first_channels=5):
        super().__init__()
        self.fnet = OracleBasicEncoder(256, "instance", n_first_channels)
        self.cnet = OracleBasicEncoder(256, "batch", n_first_channels)
        self.update_block = OracleUpdateBlock()

    @staticmethod
    def upsample_flow(flow, mask):
        N, _, H, W = flow.shape
        mask = torch.softmax(mask.view(N, 1, 9, 8, 8, H, W), dim=2)
        up = F.unfold(8 * flow, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
        up = torch.sum(mask * up, dim=2)
        return up.permute(0, 1, 4, 2, 5, 3).reshape(N, 2, 8 * H, 8 * W)

    def forward(self, ev1, ev2, iters=12, pad_rate=32):
        H, W = ev1.shape[-2:]
        r = pad_rate
        pad_ht = (((H // r) + 1) * r - H) % r
        pad_wd = (((W // r) + 1) * r - W) % r
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
        im1 = F.pad(ev1, pad, mode="replicate")
        im2 = F.pad(ev2, pad, mode="replicate")

        f1, f2 = self.fnet(im1), self.fnet(im2)
        corr_fn = OracleCorrBlock(f1, f2)
        cnet = self.cnet(im1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)

        N, _, Hp, Wp = im1.shape
        ys, xs = torch.meshgrid(
            torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij"
        )
        coords0 = (
            torch.stack([xs, ys], dim=0).float().unsqueeze(0).repeat(N, 1, 1, 1)
        )
        coords1 = coords0.clone()

        preds = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            flow_up = self.upsample_flow(coords1 - coords0, up_mask)
            l, rr, t, b = pad
            ht, wd = flow_up.shape[-2:]
            preds.append(flow_up[..., t : ht - b, l : wd - rr])
        return preds


# -------------------------------------------------------------- EEMFlow+ ----

class OracleCDC(nn.Module):
    """SGU module (reference cdc_utils.py semantics)."""

    def __init__(self):
        super().__init__()

        def c(cin, cout, relu=True):
            mods = [nn.Conv2d(cin, cout, 3, 1, 1)]
            if relu:
                mods.append(nn.LeakyReLU(0.1))
            return nn.Sequential(*mods)

        class Dense(nn.Module):
            def __init__(self):
                super().__init__()
                chans = (32, 32, 32, 16, 8)
                N = 64
                for i, f in enumerate(chans):
                    setattr(self, f"conv{i+1}", c(N, f))
                    N += f
                self.conv_last = c(N, 3, relu=False)

            def forward(self, x):
                for i in range(5):
                    x = torch.cat([getattr(self, f"conv{i+1}")(x), x], 1)
                return self.conv_last(x)

        self.dense_estimator_mask = Dense()

    @staticmethod
    def up_flow_as(flow, hw, if_rate=True):
        h, w = hw
        _, _, h_, w_ = flow.shape
        res = F.interpolate(flow, (h, w), mode="bilinear", align_corners=True)
        if if_rate:
            res = res * torch.tensor([w / w_, h / h_]).view(1, 2, 1, 1)
        return res

    @staticmethod
    def warp_no_div(x, flow):
        B, C, H, W = x.shape
        ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
        grid = torch.stack([xs, ys], 0).float().unsqueeze(0).repeat(B, 1, 1, 1)
        vgrid = grid + flow
        vgrid = torch.stack(
            [
                2 * vgrid[:, 0] / max(W - 1, 1) - 1,
                2 * vgrid[:, 1] / max(H - 1, 1) - 1,
            ],
            dim=-1,
        )
        out = F.grid_sample(x, vgrid, padding_mode="zeros", align_corners=False)
        mask = F.grid_sample(torch.ones_like(x), vgrid, align_corners=False)
        return out * (mask >= 1.0).float()

    @staticmethod
    def torch_warp(x, flow):
        B, C, H, W = x.shape
        ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
        grid = torch.stack([xs, ys], 0).float().unsqueeze(0).repeat(B, 1, 1, 1)
        vgrid = grid + flow
        vgrid = torch.stack(
            [
                2 * vgrid[:, 0] / max(W - 1, 1) - 1,
                2 * vgrid[:, 1] / max(H - 1, 1) - 1,
            ],
            dim=-1,
        )
        return F.grid_sample(x, vgrid, padding_mode="zeros", align_corners=False)

    def forward(self, flow_init, f1, f2):
        if flow_init.shape[-2:] != f1.shape[-2:]:
            flow_init = self.up_flow_as(flow_init, f1.shape[-2:])
        f2w = self.warp_no_div(f2, flow_init)
        x_out = self.dense_estimator_mask(torch.cat([f1, f2w], 1))
        inter_flow = x_out[:, :2]
        inter_mask = torch.sigmoid(x_out[:, 2:3])
        return self.torch_warp(flow_init, inter_flow) * (1 - inter_mask) + flow_init * inter_mask


class OracleEEMFlowPlus(nn.Module):
    def __init__(self, groups=3, n_first_channels=15):
        super().__init__()
        from eemflow_tpu.models.eemflow import INDEX_53

        self.pconv1_1 = convrelu(n_first_channels, 16, s=2)
        self.pconv1_2 = convrelu(16, 16)
        self.pconv2_1 = convrelu(16, 32, s=2)
        self.pconv2_2 = convrelu(32, 32)
        self.pconv2_3 = convrelu(32, 32)
        self.pconv3_1 = convrelu(32, 64, s=2)
        self.pconv3_2 = convrelu(64, 64)
        self.pconv3_3 = convrelu(64, 64)
        self.register_buffer("index", torch.tensor(list(INDEX_53)))
        self.conv_1x1 = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(cin, 32, 1), nn.LeakyReLU(0.1))
             for cin in (n_first_channels, 16, 32, 64, 64, 64)]
        )
        self.up3 = nn.ConvTranspose2d(2, 2, 4, 2, 1)  # dead params, converter-drop path
        self.up4 = nn.ConvTranspose2d(2, 2, 4, 2, 1)
        for l in (2, 3, 4, 5, 6):
            setattr(self, f"rconv{l}", convrelu(32 if l == 2 else 64, 32))
            setattr(self, f"decoder{l}", OracleDecoder(87, groups, mid=96))
        self.cdc_model = OracleCDC()

    @staticmethod
    def warp_ac(x, flow):
        B, C, H, W = x.shape
        ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
        grid = torch.stack([xs, ys], 0).float().unsqueeze(0).repeat(B, 1, 1, 1)
        vgrid = grid + flow
        vgrid = torch.stack(
            [
                2 * vgrid[:, 0] / max(W - 1, 1) - 1,
                2 * vgrid[:, 1] / max(H - 1, 1) - 1,
            ],
            dim=-1,
        )
        return F.grid_sample(x, vgrid, mode="bilinear", align_corners=True)

    def pyramid(self, x):
        f1 = self.pconv1_2(self.pconv1_1(x))
        f2 = self.pconv2_3(self.pconv2_2(self.pconv2_1(f1)))
        f3 = self.pconv3_3(self.pconv3_2(self.pconv3_1(f2)))
        return f1, f2, f3

    def forward(self, ev1, ev2, pad_rate=64):
        H, W = ev1.shape[-2:]
        r = pad_rate
        pad_ht = (((H // r) + 1) * r - H) % r
        pad_wd = (((W // r) + 1) * r - W) % r
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
        im1 = F.pad(ev1, pad, mode="replicate")
        im2 = F.pad(ev2, pad, mode="replicate")
        _, f12, f13 = self.pyramid(im1)
        _, f22, f23 = self.pyramid(im2)
        f14, f24 = F.avg_pool2d(f13, 2, 2), F.avg_pool2d(f23, 2, 2)
        f15, f25 = F.avg_pool2d(f14, 2, 2), F.avg_pool2d(f24, 2, 2)
        f16, f26 = F.avg_pool2d(f15, 2, 2), F.avg_pool2d(f25, 2, 2)

        idx = self.index.long()
        flow7 = torch.zeros(f16.shape[0], 2, f16.shape[2], f16.shape[3])
        cv6 = torch.index_select(torch_local_correlation(f16, f26), 1, idx)
        flow6 = self.decoder6(torch.cat([cv6, self.rconv6(f16), flow7], 1))

        flows = [flow6]
        cur = flow6
        for l, (fa, fb) in zip((5, 4, 3, 2), ((f15, f25), (f14, f24), (f13, f23), (f12, f22))):
            c1x1 = self.conv_1x1[l]
            flow_up = self.cdc_model(cur, c1x1(fa), c1x1(fb))
            fbw = self.warp_ac(fb, flow_up)
            cv = torch.index_select(torch_local_correlation(fa, fbw), 1, idx)
            r_ = getattr(self, f"rconv{l}")(fa)
            cur = getattr(self, f"decoder{l}")(torch.cat([cv, r_, flow_up], 1)) + flow_up
            flows.append(cur)

        out = []
        for f in flows:
            _, _, h_, w_ = f.shape
            res = F.interpolate(f, (H, W), mode="bilinear", align_corners=True)
            out.append(res * torch.tensor([W / w_, H / h_]).view(1, 2, 1, 1))
        return out


# ------------------------------------------------------------------ GMA ----

class OracleGMAAttention(nn.Module):
    def __init__(self, dim=128, dim_head=128):
        super().__init__()
        self.scale = dim_head ** -0.5
        self.to_qk = nn.Conv2d(dim, dim_head * 2, 1, bias=False)

    def forward(self, fmap):
        b, c, h, w = fmap.shape
        q, k = self.to_qk(fmap).chunk(2, dim=1)
        q = (q * self.scale).permute(0, 2, 3, 1).reshape(b, h * w, -1)
        k = k.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        sim = torch.bmm(q, k.transpose(1, 2))
        return torch.softmax(sim, dim=-1)


class OracleGMAAggregate(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.to_v = nn.Conv2d(dim, dim, 1, bias=False)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, attn, fmap):
        b, c, h, w = fmap.shape
        v = self.to_v(fmap).permute(0, 2, 3, 1).reshape(b, h * w, c)
        out = torch.bmm(attn, v).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return fmap + self.gamma * out


class OracleGMAUpdateBlock(nn.Module):
    def __init__(self, hidden=128):
        super().__init__()
        base = OracleUpdateBlock(hidden)
        self.encoder = base.encoder
        self.flow_head = base.flow_head
        self.mask = base.mask
        # GRU with wider input (inp + motion + motion_global)
        class Gru(nn.Module):
            def __init__(self, hd, ind):
                super().__init__()
                self.convz1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convr1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convq1 = nn.Conv2d(hd + ind, hd, (1, 5), padding=(0, 2))
                self.convz2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))
                self.convr2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))
                self.convq2 = nn.Conv2d(hd + ind, hd, (5, 1), padding=(2, 0))

            def forward(self, h, x):
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(self.convz1(hx))
                r = torch.sigmoid(self.convr1(hx))
                q = torch.tanh(self.convq1(torch.cat([r * h, x], 1)))
                h = (1 - z) * h + z * q
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(self.convz2(hx))
                r = torch.sigmoid(self.convr2(hx))
                q = torch.tanh(self.convq2(torch.cat([r * h, x], 1)))
                return (1 - z) * h + z * q

        self.gru = Gru(hidden, 128 + hidden + hidden)
        self.aggregator = OracleGMAAggregate(128)

    def forward(self, net, inp, corr, flow, attention):
        m = self.encoder(flow, corr)
        mg = self.aggregator(attention, m)
        net = self.gru(net, torch.cat([inp, m, mg], 1))
        return net, 0.25 * self.mask(net), self.flow_head(net)


class OracleGMA(nn.Module):
    def __init__(self, n_first_channels=5):
        super().__init__()
        self.fnet = OracleBasicEncoder(256, "instance", n_first_channels)
        self.cnet = OracleBasicEncoder(256, "batch", n_first_channels)
        self.update_block = OracleGMAUpdateBlock()
        self.att = OracleGMAAttention()

    def forward(self, ev1, ev2, iters=4, pad_rate=32):
        H, W = ev1.shape[-2:]
        r = pad_rate
        pad_ht = (((H // r) + 1) * r - H) % r
        pad_wd = (((W // r) + 1) * r - W) % r
        pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]
        im1 = F.pad(ev1, pad, mode="replicate")
        im2 = F.pad(ev2, pad, mode="replicate")

        f1, f2 = self.fnet(im1), self.fnet(im2)
        corr_fn = OracleCorrBlock(f1, f2)
        cnet = self.cnet(im1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        attention = self.att(inp)

        N, _, Hp, Wp = im1.shape
        ys, xs = torch.meshgrid(torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij")
        coords0 = torch.stack([xs, ys], 0).float().unsqueeze(0).repeat(N, 1, 1, 1)
        coords1 = coords0.clone()

        preds = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow, attention)
            coords1 = coords1 + delta
            flow_up = OracleERAFT.upsample_flow(coords1 - coords0, up_mask)
            l, rr, t, b = pad
            ht, wd = flow_up.shape[-2:]
            preds.append(flow_up[..., t : ht - b, l : wd - rr])
        return preds


# ----------------------------------------------------------------- UNet ----

class OracleUNet(nn.Module):
    """5-level UNet matching reference model/unet.py:50 naming."""

    def __init__(self, in_ch=5, out_ch=5, base=32, depth=4):
        super().__init__()
        f = [base * (2 ** i) for i in range(depth + 1)]
        self.depth = depth

        def block(ci, co):
            return nn.Sequential(
                nn.Conv2d(ci, co, 3, 1, 1), nn.BatchNorm2d(co), nn.ReLU(),
                nn.Conv2d(co, co, 3, 1, 1), nn.BatchNorm2d(co), nn.ReLU(),
            )

        def up(ci, co):
            return nn.Sequential(
                nn.Upsample(scale_factor=2), nn.Conv2d(ci, co, 3, 1, 1),
                nn.BatchNorm2d(co), nn.ReLU(),
            )

        prev = in_ch
        for i in range(depth + 1):
            setattr(self, f"Conv{i+1}", block(prev, f[i]))
            prev = f[i]
        for i in range(depth, 0, -1):
            setattr(self, f"Up{i+1}", up(f[i], f[i-1]))
            setattr(self, f"Up_conv{i+1}", block(f[i], f[i-1]))
        self.Conv = nn.Conv2d(f[0], out_ch, 1, 1, 0)

    def forward(self, x):
        skips = []
        e = x
        for i in range(self.depth + 1):
            if i > 0:
                e = F.max_pool2d(e, 2, 2)
            e = getattr(self, f"Conv{i+1}")(e)
            skips.append(e)
        d = skips[-1]
        for i in range(self.depth, 0, -1):
            d = getattr(self, f"Up{i+1}")(d)
            d = torch.cat([skips[i-1], d], 1)
            d = getattr(self, f"Up_conv{i+1}")(d)
        return self.Conv(d)
