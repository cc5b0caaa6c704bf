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


class OracleCDCCFP(nn.Module):
    """cdc_cfp_model (reference cdc_utils.py:211-288): SGU + CFP
    attention-propagated flow blend.  upsample_output_conv (dead in the
    reference forward) is included so the converter's drop path is
    exercised."""

    class _CFP(nn.Module):
        def __init__(self):
            super().__init__()
            self.self_corr = nn.Linear(32, 32)

        def forward(self, feat, flow_init):
            b, ch, h, w = feat.shape
            inp = feat.reshape(b, ch, h * w).permute(0, 2, 1)
            inp = self.self_corr(inp)
            attn = torch.softmax(
                (inp * (ch ** -0.5)) @ inp.transpose(1, 2), -1
            )
            fl = flow_init.reshape(b, 2, h * w).permute(0, 2, 1)
            return (attn @ fl).permute(0, 2, 1).reshape(b, 2, h, w)

    def __init__(self):
        super().__init__()
        base = OracleCDC()  # borrow its Dense estimator (not registered)
        self.dense_estimator_mask = base.dense_estimator_mask
        self.cfp = self._CFP()
        self.upsample_output_conv = nn.Sequential(nn.Conv2d(3, 16, 3, 1, 1))

    def forward(self, flow_init, f1, f2):
        if flow_init.shape[-2:] != f1.shape[-2:]:
            flow_init = OracleCDC.up_flow_as(flow_init, f1.shape[-2:])
        f2w = OracleCDC.warp_no_div(f2, flow_init)
        x_out = self.dense_estimator_mask(torch.cat([f1, f2w], 1))
        inter_flow = x_out[:, :2]
        inter_mask = torch.sigmoid(x_out[:, 2:3])
        flow_add = self.cfp(f2, flow_init)  # reference passes feature_2
        return (
            OracleCDC.torch_warp(flow_init, inter_flow) + flow_add
        ) * 0.5 * (1 - inter_mask) + flow_init * inter_mask


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


# --------------------------------------------------------------- GMFlow ----

class OracleGMResBlock(nn.Module):
    """Instance-norm residual block (reference GMflow/backbone.py:6-36)."""

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.norm1 = nn.InstanceNorm2d(planes)
        self.norm2 = nn.InstanceNorm2d(planes)
        if stride != 1 or cin != planes:
            self.norm3 = nn.InstanceNorm2d(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride), self.norm3
            )
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class OracleGMEncoder(nn.Module):
    """CNNEncoder (reference GMflow/backbone.py:39-117)."""

    def __init__(self, cin=5, output_dim=128, num_output_scales=1):
        super().__init__()
        self.num_branch = num_output_scales
        self.conv1 = nn.Conv2d(cin, 64, 7, 2, 3, bias=False)
        self.norm1 = nn.InstanceNorm2d(64)
        self.layer1 = nn.Sequential(
            OracleGMResBlock(64, 64), OracleGMResBlock(64, 64)
        )
        self.layer2 = nn.Sequential(
            OracleGMResBlock(64, 96, 2), OracleGMResBlock(96, 96)
        )
        s3 = 2 if num_output_scales == 1 else 1
        self.layer3 = nn.Sequential(
            OracleGMResBlock(96, 128, s3), OracleGMResBlock(128, 128)
        )
        self.conv2 = nn.Conv2d(128, output_dim, 1)
        if num_output_scales > 1:
            class Trident(nn.Module):
                def __init__(self, dim):
                    super().__init__()
                    self.weight = nn.Parameter(torch.empty(dim, dim, 3, 3))
                    nn.init.kaiming_uniform_(self.weight, nonlinearity="relu")

                def forward(self, x):
                    return [F.conv2d(x, self.weight, None, s, 1) for s in (1, 2)]

            self.trident_conv = Trident(output_dim)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = self.conv2(self.layer3(self.layer2(self.layer1(x))))
        if self.num_branch > 1:
            return self.trident_conv(x)
        return [x]


def _gm_split(x, k, channel_last=True):
    b, h, w, c = x.shape
    return (
        x.view(b, k, h // k, k, w // k, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(b * k * k, h // k, w // k, c)
    )


def _gm_merge(x, k):
    b, h, w, c = x.shape
    nb = b // (k * k)
    return (
        x.view(nb, k, k, h, w, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(nb, k * h, k * w, c)
    )


def _gm_shift_mask(h, w, wh, ww):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -wh), slice(-wh, -(wh // 2)), slice(-(wh // 2), None)):
        for ws in (slice(0, -ww), slice(-ww, -(ww // 2)), slice(-(ww // 2), None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = _gm_split(img, h // wh).reshape(-1, wh * ww)
    diff = win.unsqueeze(1) - win.unsqueeze(2)
    return torch.where(diff != 0, torch.full_like(diff, -100.0), torch.zeros_like(diff))


class OracleGMTransformerLayer(nn.Module):
    def __init__(self, d, no_ffn=False, ffn_exp=4, with_shift=False):
        super().__init__()
        self.d = d
        self.no_ffn = no_ffn
        self.with_shift = with_shift
        self.q_proj = nn.Linear(d, d, bias=False)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d, bias=False)
        self.merge = nn.Linear(d, d, bias=False)
        self.norm1 = nn.LayerNorm(d)
        if not no_ffn:
            self.mlp = nn.Sequential(
                nn.Linear(2 * d, 2 * d * ffn_exp, bias=False),
                nn.GELU(),
                nn.Linear(2 * d * ffn_exp, d, bias=False),
            )
            self.norm2 = nn.LayerNorm(d)

    def forward(self, source, target, h, w, splits, attn_mask=None):
        q, k, v = self.q_proj(source), self.k_proj(target), self.v_proj(target)
        b, _, c = q.shape
        if splits > 1:
            wh, ww = h // splits, w // splits

            def towin(t):
                t = t.view(b, h, w, c)
                if self.with_shift:
                    t = torch.roll(t, (-(wh // 2), -(ww // 2)), dims=(1, 2))
                return _gm_split(t, splits).reshape(-1, wh * ww, c)

            qs, ks, vs = towin(q), towin(k), towin(v)
            scores = torch.bmm(qs, ks.transpose(1, 2)) / (c ** 0.5)
            if self.with_shift:
                scores = scores + attn_mask.repeat(b, 1, 1)
            msg = torch.bmm(torch.softmax(scores, -1), vs)
            msg = _gm_merge(msg.view(-1, wh, ww, c), splits)
            if self.with_shift:
                msg = torch.roll(msg, (wh // 2, ww // 2), dims=(1, 2))
            msg = msg.reshape(b, h * w, c)
        else:
            scores = torch.bmm(q, k.transpose(1, 2)) / (c ** 0.5)
            msg = torch.bmm(torch.softmax(scores, -1), v)
        msg = self.norm1(self.merge(msg))
        if not self.no_ffn:
            msg = self.norm2(self.mlp(torch.cat([source, msg], -1)))
        return source + msg


class OracleGMTransformerBlock(nn.Module):
    def __init__(self, d, ffn_exp=4, with_shift=False):
        super().__init__()
        self.self_attn = OracleGMTransformerLayer(d, True, ffn_exp, with_shift)
        self.cross_attn_ffn = OracleGMTransformerLayer(d, False, ffn_exp, with_shift)

    def forward(self, source, target, h, w, splits, attn_mask=None):
        source = self.self_attn(source, source, h, w, splits, attn_mask)
        return self.cross_attn_ffn(source, target, h, w, splits, attn_mask)


class OracleGMFeatureTransformer(nn.Module):
    def __init__(self, num_layers=6, d=128, ffn_exp=4):
        super().__init__()
        self.d = d
        self.layers = nn.ModuleList(
            [OracleGMTransformerBlock(d, ffn_exp, with_shift=(i % 2 == 1))
             for i in range(num_layers)]
        )

    def forward(self, f0, f1, splits):
        b, c, h, w = f0.shape
        f0 = f0.flatten(-2).permute(0, 2, 1)
        f1 = f1.flatten(-2).permute(0, 2, 1)
        attn_mask = _gm_shift_mask(h, w, h // splits, w // splits) if splits > 1 else None
        c0 = torch.cat([f0, f1], 0)
        c1 = torch.cat([f1, f0], 0)
        for layer in self.layers:
            c0 = layer(c0, c1, h, w, splits, attn_mask)
            a, bb = c0.chunk(2, 0)
            c1 = torch.cat([bb, a], 0)
        f0, f1 = c0.chunk(2, 0)
        return (
            f0.view(b, h, w, c).permute(0, 3, 1, 2),
            f1.view(b, h, w, c).permute(0, 3, 1, 2),
        )


def _gm_pos_embed(x, num_pos_feats):
    import math as _math

    b, c, h, w = x.shape
    mask = torch.ones(b, h, w)
    ye = mask.cumsum(1)
    xe = mask.cumsum(2)
    scale = 2 * _math.pi
    ye = ye / (ye[:, -1:, :] + 1e-6) * scale
    xe = xe / (xe[:, :, -1:] + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    px = xe[..., None] / dim_t
    py = ye[..., None] / dim_t
    px = torch.stack([px[..., 0::2].sin(), px[..., 1::2].cos()], 4).flatten(3)
    py = torch.stack([py[..., 0::2].sin(), py[..., 1::2].cos()], 4).flatten(3)
    return torch.cat([py, px], 3).permute(0, 3, 1, 2)


class OracleGMFlowAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.q_proj = nn.Linear(c, c)
        self.k_proj = nn.Linear(c, c)

    def forward(self, feature0, flow, local_window_radius=-1):
        b, c, h, w = feature0.shape
        q = self.q_proj(feature0.view(b, c, -1).permute(0, 2, 1))
        k = self.k_proj(q)  # the reference's k-of-q quirk (transformer.py:380)
        if local_window_radius > 0:
            ks = 2 * local_window_radius + 1
            kmap = k.permute(0, 2, 1).reshape(b, c, h, w)
            kwin = F.unfold(kmap, ks, padding=local_window_radius)
            kwin = kwin.view(b, c, ks * ks, h, w).permute(0, 3, 4, 1, 2)
            kwin = kwin.reshape(b * h * w, c, ks * ks)
            vwin = F.unfold(flow, ks, padding=local_window_radius)
            vwin = vwin.view(b, 2, ks * ks, h, w).permute(0, 3, 4, 2, 1)
            vwin = vwin.reshape(b * h * w, ks * ks, 2)
            scores = torch.bmm(q.reshape(b * h * w, 1, c), kwin) / (c ** 0.5)
            out = torch.bmm(torch.softmax(scores, -1), vwin)
            return out.view(b, h, w, 2).permute(0, 3, 1, 2)
        v = flow.view(b, 2, -1).permute(0, 2, 1)
        scores = torch.bmm(q, k.transpose(1, 2)) / (c ** 0.5)
        out = torch.bmm(torch.softmax(scores, -1), v)
        return out.view(b, h, w, 2).permute(0, 3, 1, 2)


def _gm_coords(b, h, w):
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    return torch.stack([xs, ys], 0).float()[None].repeat(b, 1, 1, 1)


def _gm_global_match(f0, f1):
    b, c, h, w = f0.shape
    corr = torch.matmul(
        f0.view(b, c, -1).permute(0, 2, 1), f1.view(b, c, -1)
    ) / (c ** 0.5)
    grid = _gm_coords(b, h, w).view(b, 2, -1).permute(0, 2, 1)
    prob = torch.softmax(corr, -1)
    corresp = torch.matmul(prob, grid).view(b, h, w, 2).permute(0, 3, 1, 2)
    return corresp - _gm_coords(b, h, w)


def _gm_local_match(f0, f1, r):
    b, c, h, w = f0.shape
    coords = _gm_coords(b, h, w).view(b, 2, -1).permute(0, 2, 1)
    k = 2 * r + 1
    offs = torch.arange(-r, r + 1).float()
    win = torch.stack(
        [offs.repeat_interleave(k) * 0 + offs.repeat(k),
         offs.repeat_interleave(k)], -1
    )  # [(2r+1)^2, 2] (dx, dy), dy-major
    sample = coords.unsqueeze(-2) + win.view(1, 1, -1, 2)
    valid = (
        (sample[..., 0] >= 0) & (sample[..., 0] < w)
        & (sample[..., 1] >= 0) & (sample[..., 1] < h)
    )
    cnorm = torch.stack(
        [2 * sample[..., 0] / max(w - 1, 1) - 1, 2 * sample[..., 1] / max(h - 1, 1) - 1],
        -1,
    )
    winf = F.grid_sample(f1, cnorm.view(b, h * w, k * k, 2), align_corners=True)
    winf = winf.permute(0, 2, 1, 3)  # [B, H*W, C, k*k]
    f0v = f0.permute(0, 2, 3, 1).view(b, h * w, 1, c)
    corr = torch.matmul(f0v, winf).view(b, h * w, -1) / (c ** 0.5)
    corr = corr.masked_fill(~valid, -1e9)
    prob = torch.softmax(corr, -1)
    corresp = torch.matmul(prob.unsqueeze(-2), sample).squeeze(-2)
    corresp = corresp.view(b, h, w, 2).permute(0, 3, 1, 2)
    return corresp - _gm_coords(b, h, w)


def _gm_flow_warp(feat, flow):
    b, c, h, w = feat.shape
    grid = _gm_coords(b, h, w) + flow
    xg = 2 * grid[:, 0] / (w - 1) - 1
    yg = 2 * grid[:, 1] / (h - 1) - 1
    return F.grid_sample(
        feat, torch.stack([xg, yg], -1), padding_mode="zeros", align_corners=True
    )


class OracleGMFlow(nn.Module):
    """GMFlow (reference GMflow/gmflow.py:13-169).  Assumes H, W already
    multiples of the pad rate (the parity test uses aligned sizes)."""

    def __init__(self, cin=5, num_scales=1, feature_channels=128,
                 upsample_factor=8, num_layers=6, ffn_exp=1,
                 attn_splits_list=(2,), corr_radius_list=(-1,),
                 prop_radius_list=(-1,)):
        super().__init__()
        self.num_scales = num_scales
        self.feature_channels = feature_channels
        self.upsample_factor = upsample_factor
        self.attn_splits_list = attn_splits_list
        self.corr_radius_list = corr_radius_list
        self.prop_radius_list = prop_radius_list
        self.backbone = OracleGMEncoder(cin, feature_channels, num_scales)
        self.transformer = OracleGMFeatureTransformer(
            num_layers, feature_channels, ffn_exp
        )
        self.feature_flow_attn = OracleGMFlowAttn(feature_channels)
        self.upsampler = nn.Sequential(
            nn.Conv2d(2 + feature_channels, 256, 3, 1, 1),
            nn.ReLU(),
            nn.Conv2d(256, upsample_factor ** 2 * 9, 1),
        )

    def _convex_up(self, flow, feature):
        u = self.upsample_factor
        mask = self.upsampler(torch.cat([flow, feature], 1))
        b, _, h, w = flow.shape
        mask = torch.softmax(mask.view(b, 1, 9, u, u, h, w), 2)
        up = F.unfold(u * flow, [3, 3], padding=1).view(b, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, 2).permute(0, 1, 4, 2, 5, 3)
        return up.reshape(b, 2, u * h, u * w)

    def forward(self, ev1, ev2):
        f0_list = self.backbone(torch.cat([ev1, ev2], 0))[::-1]
        flow = None
        preds = []
        for idx in range(self.num_scales):
            f0, f1 = f0_list[idx].chunk(2, 0)
            up_factor = self.upsample_factor * 2 ** (self.num_scales - 1 - idx)
            if idx > 0:
                flow = F.interpolate(
                    flow, scale_factor=2, mode="bilinear", align_corners=True
                ) * 2
            if flow is not None:
                flow = flow.detach()
                f1 = _gm_flow_warp(f1, flow)
            splits = self.attn_splits_list[idx]
            corr_r = self.corr_radius_list[idx]
            prop_r = self.prop_radius_list[idx]
            if splits > 1:
                f0s = _split4(f0, splits)
                f1s = _split4(f1, splits)
                pos = _gm_pos_embed(f0s, self.feature_channels // 2)
                f0 = _merge4(f0s + pos, splits)
                f1 = _merge4(f1s + pos, splits)
            else:
                pos = _gm_pos_embed(f0, self.feature_channels // 2)
                f0, f1 = f0 + pos, f1 + pos
            f0, f1 = self.transformer(f0, f1, splits)
            if corr_r == -1:
                fp = _gm_global_match(f0, f1)
            else:
                fp = _gm_local_match(f0, f1, corr_r)
            flow = flow + fp if flow is not None else fp
            if self.training:
                preds.append(
                    F.interpolate(flow, scale_factor=up_factor, mode="bilinear",
                                  align_corners=True) * up_factor
                )
            flow = self.feature_flow_attn(
                f0, flow.detach(), local_window_radius=prop_r
            )
            last = idx == self.num_scales - 1
            if self.training and not last:
                preds.append(
                    F.interpolate(flow, scale_factor=up_factor, mode="bilinear",
                                  align_corners=True) * up_factor
                )
            if last:
                preds.append(self._convex_up(flow, f0))
        return preds


def _split4(x, k):
    b, c, h, w = x.shape
    return (
        x.view(b, c, k, h // k, k, w // k)
        .permute(0, 2, 4, 1, 3, 5)
        .reshape(b * k * k, c, h // k, w // k)
    )


def _merge4(x, k):
    b, c, h, w = x.shape
    nb = b // (k * k)
    return (
        x.view(nb, k, k, c, h, w)
        .permute(0, 3, 1, 4, 2, 5)
        .reshape(nb, c, k * h, k * w)
    )


# ------------------------------------------------------------ FlowFormer ----

def _ff_linpos(x, dim, factor=1.0 / 200):
    """LinearPositionEmbeddingSine (reference attention.py:141-145)."""
    freq = torch.linspace(0, dim // 4 - 1, dim // 4)
    return torch.cat(
        [torch.sin(3.14 * x[..., -2:-1] * freq * factor),
         torch.cos(3.14 * x[..., -2:-1] * freq * factor),
         torch.sin(3.14 * x[..., -1:] * freq * factor),
         torch.cos(3.14 * x[..., -1:] * freq * factor)], dim=-1)


def _ff_coords(b, h, w):
    ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    return torch.stack([xs, ys], 0).float()[None].repeat(b, 1, 1, 1)


def _ff_mha(q, k, v, heads=8):
    """MultiHeadAttention: scale = (dim/heads)^-0.5 (attention.py:36-61)."""
    b, lq, d = q.shape
    hd = d // heads
    scale = hd ** -0.5
    qh = q.view(b, lq, heads, hd).permute(0, 2, 1, 3)
    kh = k.view(b, -1, heads, hd).permute(0, 2, 1, 3)
    vh = v.view(b, -1, heads, hd).permute(0, 2, 1, 3)
    attn = torch.softmax(qh @ kh.transpose(-2, -1) * scale, -1)
    return (attn @ vh).permute(0, 2, 1, 3).reshape(b, lq, d)


class OracleFFPatchEmbed(nn.Module):
    def __init__(self, dim=64):
        super().__init__()
        self.dim = dim
        self.proj = nn.Sequential(
            nn.Conv2d(1, dim // 4, 6, 2, 2), nn.ReLU(),
            nn.Conv2d(dim // 4, dim // 2, 6, 2, 2), nn.ReLU(),
            nn.Conv2d(dim // 2, dim, 6, 2, 2),
        )
        self.ffn_with_coord = nn.Sequential(
            nn.Conv2d(dim * 2, dim * 2, 1), nn.ReLU(), nn.Conv2d(dim * 2, dim * 2, 1)
        )
        self.norm = nn.LayerNorm(dim * 2)

    def forward(self, x):
        B = x.shape[0]
        pad_r = (8 - x.shape[3] % 8) % 8
        pad_b = (8 - x.shape[2] % 8) % 8
        x = F.pad(x, (0, pad_r, 0, pad_b))
        x = self.proj(x)
        h3, w3 = x.shape[2:]
        coord = _ff_coords(B, h3, w3) * 8 + 4
        coord = coord.view(B, 2, -1).permute(0, 2, 1)
        enc = _ff_linpos(coord, self.dim).permute(0, 2, 1).view(B, -1, h3, w3)
        x = self.ffn_with_coord(torch.cat([x, enc], 1))
        return self.norm(x.flatten(2).transpose(1, 2)), (h3, w3)


class OracleFFEncCross(nn.Module):
    """Encoder input layer (encoder.py:199-247): proj on attn output only."""

    def __init__(self, dim=128, tgt_dim=128):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(tgt_dim, dim)
        self.v = nn.Linear(tgt_dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.ffn = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(dim, dim), nn.Dropout(0.0),
        )

    def forward(self, query, tgt):
        short = query
        q = self.q(self.norm1(query))
        x = short + self.proj(_ff_mha(q, self.k(tgt), self.v(tgt)))
        return x + self.ffn(self.norm2(x))


class OracleFFSelfAttn(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.ffn = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(dim, dim), nn.Dropout(0.0),
        )

    def forward(self, x):
        short = x
        y = self.norm1(x)
        x = short + self.proj(_ff_mha(self.q(y), self.k(y), self.v(y)))
        return x + self.ffn(self.norm2(x))


class OracleFFLocalAttn(nn.Module):
    """LocallyGroupedAttnRPEContext (twins.py:229-303)."""

    def __init__(self, dim=128, vert_c_dim=64, ws=7, heads=8):
        super().__init__()
        self.dim, self.vc, self.ws, self.heads = dim, vert_c_dim, ws, heads
        self.context_proj = nn.Linear(256, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim)
        self.k = nn.Linear(dim + vert_c_dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, size, context):
        B, N, C = x.shape
        H, W = size
        Cqk = C + self.vc
        ctx = context.repeat(B // context.shape[0], 1, 1, 1)
        ctx = self.context_proj(ctx.view(B, -1, H * W).permute(0, 2, 1)).view(B, H, W, -1)
        x = x.view(B, H, W, C)
        xqk = torch.cat([x, ctx], -1)
        ws = self.ws
        pr, pb = (ws - W % ws) % ws, (ws - H % ws) % ws
        x = F.pad(x, (0, 0, 0, pr, 0, pb))
        xqk = F.pad(xqk, (0, 0, 0, pr, 0, pb))
        _, Hp, Wp, _ = x.shape
        nh, nw = Hp // ws, Wp // ws
        coords = _ff_coords(1, ws, ws).view(1, 2, -1).permute(0, 2, 1)
        enc = _ff_linpos(coords, Cqk).view(1, 1, 1, ws, ws, Cqk)
        xw = x.reshape(B, nh, ws, nw, ws, C).transpose(2, 3)
        qkw = xqk.reshape(B, nh, ws, nw, ws, Cqk).transpose(2, 3) + enc
        q = self.q(qkw).reshape(B * nh * nw, ws * ws, C)
        k = self.k(qkw).reshape(B * nh * nw, ws * ws, C)
        v = self.v(xw).reshape(B * nh * nw, ws * ws, C)
        o = _ff_mha(q, k, v, self.heads)
        o = o.reshape(B, nh, nw, ws, ws, C).transpose(2, 3)
        o = o.reshape(B, Hp, Wp, C)[:, :H, :W, :]
        return self.proj(o.reshape(B, N, C))


class OracleFFGlobalAttn(nn.Module):
    """GlobalSubSampleAttnRPEContext (twins.py:306-392)."""

    def __init__(self, dim=128, vert_c_dim=64, sr=4, heads=8):
        super().__init__()
        self.dim, self.vc, self.sr, self.heads = dim, vert_c_dim, sr, heads
        self.context_proj = nn.Linear(256, vert_c_dim)
        self.q = nn.Linear(dim + vert_c_dim, dim)
        self.k = nn.Linear(dim, dim)
        self.v = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)
        self.sr_key = nn.Conv2d(dim + vert_c_dim, dim, sr, sr)
        self.sr_value = nn.Conv2d(dim, dim, sr, sr)
        self.norm = nn.LayerNorm(dim)

    def forward(self, x, size, context):
        B, N, C = x.shape
        H, W = size
        Cqk = C + self.vc
        ctx = context.repeat(B // context.shape[0], 1, 1, 1)
        ctx = self.context_proj(ctx.view(B, -1, H * W).permute(0, 2, 1)).view(B, H, W, -1)
        x = x.view(B, H, W, C)
        xqk = torch.cat([x, ctx], -1)
        sr = self.sr
        pr, pb = (sr - W % sr) % sr, (sr - H % sr) % sr
        x = F.pad(x, (0, 0, 0, pr, 0, pb))
        xqk = F.pad(xqk, (0, 0, 0, pr, 0, pb))
        _, Hp, Wp, _ = x.shape
        coords = _ff_coords(1, Hp, Wp).view(1, 2, -1).permute(0, 2, 1)
        q = self.q(xqk.view(B, Hp * Wp, Cqk) + _ff_linpos(coords, Cqk))
        ksub = self.sr_key(xqk.permute(0, 3, 1, 2)).flatten(2).transpose(1, 2)
        vsub = self.sr_value(x.permute(0, 3, 1, 2)).flatten(2).transpose(1, 2)
        ksub, vsub = self.norm(ksub), self.norm(vsub)
        hs, wsz = Hp // sr, Wp // sr
        coords_s = _ff_coords(1, hs, wsz).view(1, 2, -1).permute(0, 2, 1) * sr
        k = self.k(ksub + _ff_linpos(coords_s, C))
        v = self.v(vsub)
        o = _ff_mha(q, k, v, self.heads)
        o = o.reshape(B, Hp, Wp, C)[:, :H, :W, :]
        return self.proj(o.reshape(B, N, C))


class OracleFFMlp(nn.Module):
    def __init__(self, dim, ratio=4):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * ratio)
        self.fc2 = nn.Linear(dim * ratio, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class OracleFFBlock(nn.Module):
    def __init__(self, dim, attn):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = attn
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = OracleFFMlp(dim)

    def forward(self, x, size, context):
        x = x + self.attn(self.norm1(x), size, context)
        return x + self.mlp(self.norm2(x))


class OracleFFVertical(nn.Module):
    def __init__(self, dim=128):
        super().__init__()
        self.local_block = OracleFFBlock(dim, OracleFFLocalAttn(dim))
        self.global_block = OracleFFBlock(dim, OracleFFGlobalAttn(dim))

    def forward(self, x, size, context):
        x = self.local_block(x, size, context)
        return self.global_block(x, size, context)


class OracleFFCostPerceiver(nn.Module):
    def __init__(self, input_dim=64, token_num=8, dim=128, depth=3):
        super().__init__()
        self.token_num, self.dim = token_num, dim
        self.patch_embed = OracleFFPatchEmbed(input_dim)
        self.latent_tokens = nn.Parameter(torch.randn(1, token_num, dim))
        self.input_layer = OracleFFEncCross(dim, input_dim * 2)
        self.encoder_layers = nn.ModuleList([OracleFFSelfAttn(dim) for _ in range(depth)])
        self.vertical_encoder_layers = nn.ModuleList(
            [OracleFFVertical(dim) for _ in range(depth)]
        )

    def forward(self, cost_maps, B, H1, W1, context):
        K, D = self.token_num, self.dim
        tokens, _ = self.patch_embed(cost_maps)
        x = self.input_layer(self.latent_tokens.repeat(B * H1 * W1, 1, 1), tokens)
        short = x
        for i, layer in enumerate(self.encoder_layers):
            x = layer(x)
            x = x.view(B, H1 * W1, K, D).permute(0, 2, 1, 3).reshape(B * K, H1 * W1, D)
            x = self.vertical_encoder_layers[i](x, (H1, W1), context)
            x = x.view(B, K, H1 * W1, D).permute(0, 2, 1, 3).reshape(B * H1 * W1, K, D)
        return x + short


class OracleFFMemoryEncoder(nn.Module):
    def __init__(self, cin=3, depth=3):
        super().__init__()
        self.feat_encoder = OracleBasicEncoder(256, "instance", cin)
        self.channel_convertor = nn.Conv2d(256, 256, 1, bias=False)
        self.cost_perceiver_encoder = OracleFFCostPerceiver(depth=depth)

    def forward(self, im1, im2, context):
        B = im1.shape[0]
        feats = self.channel_convertor(self.feat_encoder(torch.cat([im1, im2], 0)))
        f1, f2 = feats[:B], feats[B:]
        _, C, H1, W1 = f1.shape
        corr = torch.matmul(
            f1.view(B, C, -1).permute(0, 2, 1), f2.view(B, C, -1)
        )  # no sqrt scaling (encoder.py:328-337)
        cost_maps = corr.view(B * H1 * W1, 1, H1, W1)
        mem = self.cost_perceiver_encoder(cost_maps, B, H1, W1, context)
        return mem, cost_maps, (H1, W1)


class OracleFFDecCross(nn.Module):
    """Decoder cross-attend (decoder.py:29-93): proj on [out, shortcut]."""

    def __init__(self, dim=64, tgt_dim=128):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.q = nn.Linear(dim, dim)
        self.k = nn.Linear(tgt_dim, dim)
        self.v = nn.Linear(tgt_dim, dim)
        self.proj = nn.Linear(dim * 2, dim)
        self.ffn = nn.Sequential(
            nn.Linear(dim, dim), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(dim, dim), nn.Dropout(0.0),
        )

    def forward(self, query, k, v, pos):
        short = query
        q = self.q(self.norm1(query) + pos)
        x = short + self.proj(torch.cat([_ff_mha(q, k, v), short], -1))
        return x + self.ffn(self.norm2(x))


class OracleFFUpdateBlock(nn.Module):
    """GMAUpdateBlock with 145-ch motion encoder (gru.py:63-143)."""

    def __init__(self, hidden=128, cor_planes=81 + 64):
        super().__init__()

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
                return torch.cat([F.relu(self.conv(torch.cat([c, f], 1))), flow], 1)

        base = OracleGMAUpdateBlock(hidden)
        self.encoder = Enc()
        self.gru = base.gru
        self.flow_head = base.flow_head
        self.mask = base.mask
        self.aggregator = OracleGMAAggregate(128)

    def forward(self, net, inp, corr, flow, attention):
        m = self.encoder(flow, corr)
        mg = self.aggregator(attention, m)
        net = self.gru(net, torch.cat([inp, m, mg], 1))
        return net, 0.25 * self.mask(net), self.flow_head(net)


class OracleFFMemoryDecoder(nn.Module):
    def __init__(self, dim=64, depth=12):
        super().__init__()
        self.dim, self.depth = dim, depth
        self.flow_token_encoder = nn.Sequential(
            nn.Conv2d(81, dim, 1), nn.GELU(), nn.Conv2d(dim, dim, 1)
        )
        self.proj = nn.Conv2d(256, 256, 1)

        class DecLayer(nn.Module):
            def __init__(self):
                super().__init__()
                self.cross_attend = OracleFFDecCross()

        self.decoder_layer = DecLayer()
        self.update_block = OracleFFUpdateBlock()
        self.att = OracleGMAAttention()
        # dead relative-position tables (gma.py:54; content-only forward)
        class PosEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.rel_height = nn.Embedding(2 * 160 - 1, 128)
                self.rel_width = nn.Embedding(2 * 160 - 1, 128)

        self.att.pos_emb = PosEmb()

    @staticmethod
    def _sample_cost(cost_maps, coords):
        """encode_flow_token (decoder.py:186-205): the dy-meshgrid output is
        added to the x channel — x offset varies along the OUTER window
        axis."""
        b2, _, h2, w2 = cost_maps.shape
        B, _, H1, W1 = coords.shape
        r = 4
        d = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(d, d, indexing="ij"), -1)
        centroid = coords.permute(0, 2, 3, 1).reshape(B * H1 * W1, 1, 1, 2)
        cl = centroid + delta.view(1, 9, 9, 2)
        return oracle_bilinear_sampler(cost_maps, cl).view(B, H1, W1, -1).permute(0, 3, 1, 2)

    def forward(self, cost_memory, cost_maps, context):
        B, _, H1, W1 = context.shape
        ctx = self.proj(context)
        net, inp = torch.split(ctx, [128, 128], 1)
        net, inp = torch.tanh(net), torch.relu(inp)
        attention = self.att(inp)
        coords0 = _ff_coords(B, H1, W1)
        coords1 = coords0.clone()
        key = self.decoder_layer.cross_attend.k(cost_memory)
        value = self.decoder_layer.cross_attend.v(cost_memory)
        preds = []
        for _ in range(self.depth):
            coords1 = coords1.detach()
            cost_fwd = self._sample_cost(cost_maps, coords1)
            q = self.flow_token_encoder(cost_fwd)
            q = q.permute(0, 2, 3, 1).reshape(B * H1 * W1, 1, self.dim)
            cc = coords1.view(B, 2, -1).permute(0, 2, 1).reshape(B * H1 * W1, 1, 2)
            pos = _ff_linpos(cc, self.dim)
            cost_global = self.decoder_layer.cross_attend(q, key, value, pos)
            cost_global = cost_global.view(B, H1, W1, self.dim).permute(0, 3, 1, 2)
            corr = torch.cat([cost_global, cost_fwd], 1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow, attention)
            coords1 = coords1 + delta
            preds.append(OracleERAFT.upsample_flow(coords1 - coords0, up_mask))
        return preds


class OracleFlowFormer(nn.Module):
    """reference transformer.py:20-62 (pad-free sizes in the parity test)."""

    def __init__(self, cin=3, encoder_depth=3, decoder_depth=12):
        super().__init__()
        self.memory_encoder = OracleFFMemoryEncoder(cin, encoder_depth)
        self.memory_decoder = OracleFFMemoryDecoder(depth=decoder_depth)
        self.context_encoder = OracleBasicEncoder(256, "instance", cin)

    def forward(self, ev1, ev2):
        context = self.context_encoder(ev1)
        mem, cost_maps, _ = self.memory_encoder(ev1, ev2, context)
        return self.memory_decoder(mem, cost_maps, context)


# -------------------------------------------------------------- GMFlowNet ----

class OracleBasicConvEncoder(nn.Module):
    """3 stride-2 convs + instance norms (GMflownet/extractor.py:249-305)."""

    def __init__(self, output_dim=256, cin=5):
        super().__init__()
        half = max(output_dim // 2, 64)
        self.conv1 = nn.Conv2d(cin, 64, 7, 2, 3)
        self.conv2 = nn.Conv2d(64, half, 3, 2, 1)
        self.conv3 = nn.Conv2d(half, output_dim, 3, 2, 1)
        self.norm1 = nn.InstanceNorm2d(64)
        self.norm2 = nn.InstanceNorm2d(half)
        self.norm3 = nn.InstanceNorm2d(output_dim)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = F.relu(self.norm2(self.conv2(x)))
        return F.relu(self.norm3(self.conv3(x)))


class OraclePOLAAttention(nn.Module):
    """NeighborWindowAttention (GMflownet/swin_transformer.py:636-740)."""

    def __init__(self, dim, ws=7, heads=4):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.scale = (dim // heads) ** -0.5
        n_win = 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(((n_win + 1) * ws - 1) ** 2, heads)
        )
        nn.init.normal_(self.relative_position_bias_table, std=0.02)
        cy = torch.arange(ws).repeat_interleave(ws)
        cx = torch.arange(ws).repeat(ws)
        ny = torch.arange(n_win * ws).repeat_interleave(n_win * ws)
        nx = torch.arange(n_win * ws).repeat(n_win * ws)
        rel_y = cy[:, None] - ny[None, :] + n_win * ws - 1
        rel_x = cx[:, None] - nx[None, :] + n_win * ws - 1
        self.register_buffer(
            "relative_position_index", rel_y * ((n_win + 1) * ws - 1) + rel_x
        )
        self.Wq = nn.Linear(dim, dim)
        self.Wk = nn.Linear(dim, dim)
        self.Wv = nn.Linear(dim, dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, q, k, v):
        B_, Nq, C = q.shape
        Nk = k.shape[1]
        hd = C // self.heads
        q = self.Wq(q).reshape(B_, Nq, self.heads, hd).permute(0, 2, 1, 3)
        k = self.Wk(k).reshape(B_, Nk, self.heads, hd).permute(0, 2, 1, 3)
        v = self.Wv(v).reshape(B_, Nk, self.heads, hd).permute(0, 2, 1, 3)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(Nq, Nk, -1).permute(2, 0, 1)
        attn = torch.softmax(attn + bias.unsqueeze(0), -1)
        x = (attn @ v).transpose(1, 2).reshape(B_, Nq, C)
        return self.proj(x)


class OracleAxialMHA(nn.Module):
    """MultiHeadAttention, use_proj=False (swin_transformer.py:743-812)."""

    def __init__(self, dim, heads=2):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.Wq = nn.Linear(dim, dim)
        self.Wk = nn.Linear(dim, dim)
        self.Wv = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        q = self.Wq(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        k = self.Wk(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        v = self.Wv(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        attn = torch.softmax((q * self.scale) @ k.transpose(-2, -1), -1)
        return (attn @ v).transpose(1, 2).reshape(B, N, C)


class OracleMixAxialPOLABlock(nn.Module):
    """swin_transformer.py:910-1031."""

    def __init__(self, dim=256, heads=8, ws=7):
        super().__init__()
        hd = dim // heads
        self.ws = ws
        self.local_chl = (heads - 4) * hd
        self.axis_chl = 2 * hd
        self.norm1 = nn.LayerNorm(dim)
        self.localAttn = OraclePOLAAttention(self.local_chl, ws, heads - 4)
        self.horizAttn = OracleAxialMHA(self.axis_chl)
        self.vertiAttn = OracleAxialMHA(self.axis_chl)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = OracleFFMlp(dim)

    def forward(self, x, H, W):
        B, L, C = x.shape
        ws = self.ws
        short = x
        x = self.norm1(x).view(B, H, W, C)
        xl = x[..., : self.local_chl]
        xh = x[..., self.local_chl : self.local_chl + self.axis_chl]
        xv = x[..., self.local_chl + self.axis_chl :]

        pr, pb = (ws - W % ws) % ws, (ws - H % ws) % ws
        xl = F.pad(xl, (0, 0, 0, pr, 0, pb))
        _, Hp, Wp, Cl = xl.shape
        qwin = (
            xl.view(B, Hp // ws, ws, Wp // ws, ws, Cl)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(-1, ws * ws, Cl)
        )
        kv = F.pad(xl, (0, 0, ws, ws, ws, ws))
        kv = F.unfold(kv.permute(0, 3, 1, 2), 3 * ws, stride=ws)
        kv = kv.permute(0, 2, 1).reshape(-1, Cl, (3 * ws) ** 2).permute(0, 2, 1)
        ol = self.localAttn(qwin, kv, kv)
        ol = (
            ol.view(B, Hp // ws, Wp // ws, ws, ws, Cl)
            .permute(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp, Wp, Cl)[:, :H, :W, :]
        )

        oh = self.horizAttn(xh.reshape(B * H, W, self.axis_chl)).view(B, H, W, -1)
        ov = self.vertiAttn(
            xv.transpose(1, 2).reshape(B * W, H, self.axis_chl)
        ).view(B, W, H, -1).transpose(1, 2)

        y = torch.cat([ol, oh, ov], -1).view(B, L, C)
        x = short + self.proj(y)
        return x + self.mlp(self.norm2(x))


class OracleGMFlowNet(nn.Module):
    """GMflownet_model.py:37-185 (use_mix_attn=True)."""

    def __init__(self, cin=5, depth=6):
        super().__init__()

        class Trans(nn.Module):
            def __init__(self):
                super().__init__()
                self.blocks = nn.ModuleList(
                    [OracleMixAxialPOLABlock() for _ in range(depth)]
                )
                self.norm = nn.LayerNorm(256)

            def forward(self, x):
                H, W = x.shape[2:]
                x = x.flatten(2).transpose(1, 2)
                for blk in self.blocks:
                    x = blk(x, H, W)
                x = self.norm(x)
                return x.view(-1, H, W, 256).permute(0, 3, 1, 2)

        self.fnet = nn.Sequential(OracleBasicConvEncoder(256, cin), Trans())
        self.cnet = OracleBasicEncoder(256, "batch", cin)
        self.update_block = OracleUpdateBlock()

    def forward(self, ev1, ev2, iters=4):
        f1 = self.fnet(ev1)
        f2 = self.fnet(ev2)
        N, C, fH, fW = f1.shape
        corr_fn = OracleCorrBlock(f1, f2)
        corr_map = torch.matmul(
            f1.view(N, C, -1).transpose(1, 2), f2.view(N, C, -1)
        ) / (C ** 0.5)
        soft = torch.softmax(corr_map, 2) * torch.softmax(corr_map, 1)

        cnet = self.cnet(ev1)
        net, inp = torch.split(cnet, [128, 128], 1)
        net, inp = torch.tanh(net), torch.relu(inp)

        ys, xs = torch.meshgrid(torch.arange(fH), torch.arange(fW), indexing="ij")
        coords0 = torch.stack([xs, ys], 0).float()[None].repeat(N, 1, 1, 1)

        match12, idx12 = soft.max(2)
        match21, _ = soft.max(1)
        match21_g = torch.gather(match21, 1, idx12)
        matched = (match12 - match21_g) == 0
        ident = torch.arange(fH * fW)[None].repeat(N, 1)
        cindex = torch.where(matched, idx12, ident).reshape(N, fH, fW)
        coords1 = torch.stack([cindex % fW, cindex // fW], 1).float()

        preds = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            preds.append(OracleERAFT.upsample_flow(coords1 - coords0, up_mask))
        return preds, soft


# ------------------------------------------------------------------ SKFlow ----

class OraclePCBlock(nn.Module):
    """PCBlock4_Deep_nopool_res (SKflow/update.py:8-32)."""

    def __init__(self, cin, cout, k_conv):
        super().__init__()
        self.conv_list = nn.ModuleList(
            [nn.Conv2d(cin, cin, k, 1, k // 2, groups=cin) for k in k_conv]
        )
        self.ffn1 = nn.Sequential(
            nn.Conv2d(cin, int(1.5 * cin), 1), nn.GELU(),
            nn.Conv2d(int(1.5 * cin), cin, 1),
        )
        self.pw = nn.Conv2d(cin, cin, 1)
        self.ffn2 = nn.Sequential(
            nn.Conv2d(cin, int(1.5 * cin), 1), nn.GELU(),
            nn.Conv2d(int(1.5 * cin), cout, 1),
        )

    def forward(self, x):
        x = F.gelu(x + self.ffn1(x))
        for conv in self.conv_list:
            x = F.gelu(x + conv(x))
        x = F.gelu(x + self.pw(x))
        return self.ffn2(x)


class OracleSKUpdateBlock(nn.Module):
    """SKUpdateBlock6_Deep_nopoolres_AllDecoder (SKflow/update.py:35-89)."""

    def __init__(self, k_conv=(1, 15), updater_conv=(1, 7)):
        super().__init__()

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.convc1 = OraclePCBlock(324, 256, k_conv)
                self.convc2 = OraclePCBlock(256, 192, k_conv)
                self.convf1 = nn.Conv2d(2, 128, 1)
                self.convf2 = OraclePCBlock(128, 64, k_conv)
                self.conv = OraclePCBlock(256, 126, k_conv)

            def forward(self, flow, corr):
                cor = self.convc2(F.gelu(self.convc1(corr)))
                flo = self.convf2(self.convf1(flow))
                out = self.conv(torch.cat([cor, flo], 1))
                return torch.cat([out, flow], 1)

        self.encoder = Enc()
        self.gru = OraclePCBlock(512, 128, updater_conv)
        self.flow_head = OraclePCBlock(128, 2, k_conv)
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(), nn.Conv2d(256, 576, 1)
        )
        self.aggregator = OracleGMAAggregate(128)

    def forward(self, net, inp, corr, flow, attention):
        m = self.encoder(flow, corr)
        mg = self.aggregator(attention, m)
        net = self.gru(torch.cat([net, inp, m, mg], 1))
        return net, 0.25 * self.mask(net), self.flow_head(net)


class OracleSKFlow(nn.Module):
    """SK_Decoder (SKflow/models/sk_decoder.py:44-152), incl. the dead
    att.pos_emb tables (SKflow/gma.py:52, content-only forward)."""

    def __init__(self, cin=5):
        super().__init__()
        self.fnet = OracleBasicEncoder(256, "instance", cin)
        self.cnet = OracleBasicEncoder(256, "batch", cin)
        self.update_block = OracleSKUpdateBlock()
        self.att = OracleGMAAttention()

        class PosEmb(nn.Module):
            def __init__(self):
                super().__init__()
                self.rel_height = nn.Embedding(2 * 160 - 1, 128)
                self.rel_width = nn.Embedding(2 * 160 - 1, 128)

        self.att.pos_emb = PosEmb()

    def forward(self, ev1, ev2, iters=4):
        f1, f2 = self.fnet(ev1), self.fnet(ev2)
        corr_fn = OracleCorrBlock(f1, f2)
        cnet = self.cnet(ev1)
        net, inp = torch.split(cnet, [128, 128], 1)
        net, inp = torch.tanh(net), torch.relu(inp)
        attention = self.att(inp)
        N, _, Hp, Wp = ev1.shape
        ys, xs = torch.meshgrid(
            torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij"
        )
        coords0 = torch.stack([xs, ys], 0).float()[None].repeat(N, 1, 1, 1)
        coords1 = coords0.clone()
        preds = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, up_mask, delta = self.update_block(net, inp, corr, flow, attention)
            coords1 = coords1 + delta
            preds.append(OracleERAFT.upsample_flow(coords1 - coords0, up_mask))
        return preds


# ----------------------------------------------------------------- KPAFlow ----

class OracleKPAAttn(nn.Module):
    """KPAEnc / KPA patch-window attention (KPAflow/module.py:64-224).
    use_focus=True adds the distance-focus kernel (the decoder KPA)."""

    def __init__(self, chnn, sc, use_focus=False):
        super().__init__()
        self.sc = sc
        self.scale = chnn ** -0.5
        self.use_focus = use_focus
        self.unfold = nn.Unfold(3 * sc, padding=sc, stride=sc)
        self.to_qk = nn.Conv2d(chnn, chnn * 2, 1, bias=False)
        self.to_v = nn.Conv2d(chnn, chnn, 1, bias=False)
        self.gamma = nn.Parameter(torch.zeros(1))
        if use_focus:
            self.w_prelu = nn.Parameter(torch.zeros(1) + 1 / ((3 * sc - 1) / 2))

    def _focus(self, attn, b, h, w, h_sc, w_sc):
        import math as _m

        sc = self.sc
        k = int(_m.sqrt(attn.shape[1]))
        crd = torch.linspace(0, k - 1, k)
        x = crd.view(1, 1, k, 1, 1).expand(b, 1, k, h, w)
        y = crd.view(1, k, 1, 1, 1).expand(b, k, 1, h, w)
        idx_x = sc + torch.linspace(0, w - 1, w).view(1, 1, 1, 1, w) % sc
        idx_y = sc + torch.linspace(0, h - 1, h).view(1, 1, 1, h, 1) % sc
        half = 2 * sc
        ox = -1 * F.prelu(abs(x - idx_x) - half, self.w_prelu * 0.02) + 1.0
        ox[ox < 0] = 0
        oy = -1 * F.prelu(abs(y - idx_y) - half, self.w_prelu * 0.02) + 1.0
        oy[oy < 0] = 0
        ker = (ox * oy).view(b, k * k, h_sc, sc, w_sc, sc)
        return ker.permute(0, 1, 2, 4, 3, 5).reshape(b, k * k, h_sc * w_sc, sc * sc)

    def forward(self, feat_qk_src, feat_v_src):
        b, c, h_in, w_in = feat_qk_src.shape
        sc = self.sc
        xp, yp = sc - w_in % sc, sc - h_in % sc
        fq = F.pad(feat_qk_src, (0, xp, 0, yp))
        fv = F.pad(feat_v_src, (0, xp, 0, yp))
        _, _, h, w = fq.shape
        h_sc, w_sc = h // sc, w // sc

        fm = F.pad(torch.ones(1, 1, h_in, w_in), (0, xp, 0, yp))
        fm_k = self.unfold(fm).view(1, 1, -1, h_sc * w_sc)
        fm_q = fm.view(1, 1, h_sc, sc, w_sc, sc).permute(0, 1, 2, 4, 3, 5)
        fm_q = fm_q.reshape(1, 1, h_sc * w_sc, sc * sc)
        am = (torch.einsum("bckn,bcns->bkns", fm_k, fm_q) - 1) * 99.0

        q, kf = self.to_qk(fq).chunk(2, 1)
        kf = self.unfold(kf).view(b, c, -1, h_sc * w_sc) * self.scale
        q = q.view(b, c, h_sc, sc, w_sc, sc).permute(0, 1, 2, 4, 3, 5)
        q = q.reshape(b, c, h_sc * w_sc, sc * sc)
        attn = torch.einsum("bckn,bcns->bkns", kf, q) + am
        if self.use_focus:
            attn = self._focus(attn, b, h, w, h_sc, w_sc).view(attn.shape) * attn
        attn = torch.softmax(attn, 1)

        v = self.unfold(self.to_v(fv)).view(b, c, -1, h_sc * w_sc)
        r = torch.einsum("bkns,bckn->bcns", attn, v)
        r = r.view(b, c, h_sc, w_sc, sc, sc).permute(0, 1, 2, 4, 3, 5)
        r = r.reshape(b, c, h, w)[:, :, :h_in, :w_in]
        return feat_v_src + r * self.gamma


class OracleKPAFlowDec(nn.Module):
    """KPAFlowDec (module.py:13-61)."""

    def __init__(self, chnn=128, sc=19):
        super().__init__()
        self.C_cor = nn.Sequential(
            nn.Conv2d(324, 256, 1), nn.ReLU(), nn.Conv2d(256, 192, 3, padding=1),
            nn.ReLU(),
        )
        self.C_flo = nn.Sequential(
            nn.Conv2d(2, 128, 7, padding=3), nn.ReLU(),
            nn.Conv2d(128, 64, 3, padding=1), nn.ReLU(),
        )
        self.C_mo = nn.Sequential(
            nn.Conv2d(256, 126, 3, padding=1), nn.ReLU(),
        )
        self.kpa = OracleKPAAttn(chnn, sc, use_focus=True)

        # SepConvGRU with input 3*chnn (module.py:180-224)
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
                qq = torch.tanh(self.convq1(torch.cat([r * h, x], 1)))
                h = (1 - z) * h + z * qq
                hx = torch.cat([h, x], 1)
                z = torch.sigmoid(self.convz2(hx))
                r = torch.sigmoid(self.convr2(hx))
                qq = torch.tanh(self.convq2(torch.cat([r * h, x], 1)))
                return (1 - z) * h + z * qq

        self.gru = Gru(chnn, 3 * chnn)
        self.C_flow = nn.Sequential(
            nn.Conv2d(chnn, chnn * 2, 3, padding=1), nn.ReLU(),
            nn.Conv2d(chnn * 2, 2, 3, padding=1),
        )

    def forward(self, net, inp, corr, flow):
        feat_mo = torch.cat(
            [self.C_mo(torch.cat([self.C_cor(corr), self.C_flo(flow)], 1)), flow], 1
        )
        feat_moa = self.kpa(inp, feat_mo)
        net = self.gru(net, torch.cat([inp, feat_mo, feat_moa], 1))
        return net, self.C_flow(net)


class OracleKPAFlow(nn.Module):
    """KPAFlow (KPAflow/KPAFlow.py:43-160) — incl. the frozen 'zero' param."""

    def __init__(self, cin=5, sc_enc=13, sc_dec=19):
        super().__init__()
        self.fnet = OracleBasicEncoder(256, "instance", cin)
        self.cnet = OracleBasicEncoder(256, "batch", cin)
        self.update_block = OracleKPAFlowDec(128, sc_dec)
        self.trans = OracleKPAAttn(256, sc_enc)
        self.zero = nn.Parameter(torch.zeros(12), requires_grad=False)

    def forward(self, ev1, ev2, iters=3):
        f1 = self.fnet(ev1)
        f2 = self.fnet(ev2)
        # trans(fmap) uses the same tensor for qk and v (KPAFlow.py:120-121)
        f1 = self.trans(f1, f1)
        f2 = self.trans(f2, f2)
        corr_fn = OracleCorrBlock(f1, f2)
        cnet = self.cnet(ev1)
        net, inp = torch.split(cnet, [128, 128], 1)
        net, inp = torch.tanh(net), torch.relu(inp)
        N, _, Hp, Wp = ev1.shape
        ys, xs = torch.meshgrid(
            torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij"
        )
        coords0 = torch.stack([xs, ys], 0).float()[None].repeat(N, 1, 1, 1)
        coords1 = coords0.clone()
        flows = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, delta = self.update_block(net, inp, corr, flow)
            coords1 = coords1 + delta
            f = coords1 - coords0
            up = F.interpolate(
                f, scale_factor=8, mode="bilinear", align_corners=True
            ) * 8
            flows.append(up)
        return flows


# ----------------------------------------------------------------- IRR-PWC ----

def _pwc_conv(cin, cout, k=3, s=1, d=1, relu=True):
    mods = [nn.Conv2d(cin, cout, k, s, ((k - 1) * d) // 2, dilation=d)]
    if relu:
        mods.append(nn.LeakyReLU(0.1))
    return nn.Sequential(*mods)


class OraclePWCFeatureExtractor(nn.Module):
    """pwc_modules.py:90-108."""

    def __init__(self, num_chs):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Sequential(_pwc_conv(ci, co, s=2), _pwc_conv(co, co))
             for ci, co in zip(num_chs[:-1], num_chs[1:])]
        )

    def forward(self, x):
        pyr = []
        for conv in self.convs:
            x = conv(x)
            pyr.append(x)
        return pyr[::-1]


class OraclePWCDenseEstimator(nn.Module):
    """FlowEstimatorDense / OccEstimatorDense (pwc_modules.py:157-208)."""

    def __init__(self, ch_in, out_ch=2):
        super().__init__()
        self.conv1 = _pwc_conv(ch_in, 128)
        self.conv2 = _pwc_conv(ch_in + 128, 128)
        self.conv3 = _pwc_conv(ch_in + 256, 96)
        self.conv4 = _pwc_conv(ch_in + 352, 64)
        self.conv5 = _pwc_conv(ch_in + 416, 32)
        self.conv_last = _pwc_conv(ch_in + 448, out_ch, relu=False)

    def forward(self, x):
        for c in (self.conv1, self.conv2, self.conv3, self.conv4, self.conv5):
            x = torch.cat([c(x), x], 1)
        return x, self.conv_last(x)


class OraclePWCContext(nn.Module):
    """ContextNetwork / OccContextNetwork (pwc_modules.py:212-240)."""

    def __init__(self, ch_in, out_ch=2):
        super().__init__()
        cfg = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        mods = []
        prev = ch_in
        for f, d in cfg:
            mods.append(_pwc_conv(prev, f, 3, 1, d))
            prev = f
        mods.append(_pwc_conv(prev, out_ch, relu=False))
        self.convs = nn.Sequential(*mods)

    def forward(self, x):
        return self.convs(x)


def _pwc_cost_volume(f1, f2, md=4):
    """compute_cost_volume (pwc_modules.py:43-64): mean over C."""
    _, C, H, W = f1.shape
    f2p = F.pad(f2, (md, md, md, md))
    outs = []
    for i in range(2 * md + 1):
        for j in range(2 * md + 1):
            outs.append((f1 * f2p[:, :, i : i + H, j : j + W]).mean(1, keepdim=True))
    return torch.cat(outs, 1)


def _pwc_warp(x, flow, height_im, width_im, div_flow):
    """WarpingLayer (pwc_modules.py:118-137), CPU."""
    B, C, H, W = x.shape
    gw = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
    gh = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat([gw, gh], 1)
    fw = flow[:, 0] * 2 / max(width_im - 1, 1) / div_flow
    fh = flow[:, 1] * 2 / max(height_im - 1, 1) / div_flow
    g = (grid + torch.stack([fw, fh], 1)).permute(0, 2, 3, 1)
    xw = F.grid_sample(x, g, align_corners=True)
    mask = F.grid_sample(torch.ones_like(x), g, align_corners=True)
    return xw * (mask >= 1.0).float()


def _pwc_upsample_as(x, target, height=None):
    h, w = target.shape[-2:]
    return F.interpolate(x, (h, w), mode="bilinear", align_corners=True)


def _pwc_rescale(flow, div_flow, width_im, height_im, to_local=True):
    if to_local:
        us = flow.shape[3] / width_im / div_flow
        vs = flow.shape[2] / height_im / div_flow
    else:
        us = width_im * div_flow / flow.shape[3]
        vs = height_im * div_flow / flow.shape[2]
    u, v = flow.chunk(2, 1)
    return torch.cat([u * us, v * vs], 1)


class OracleIRRPWC(nn.Module):
    """pwcnet_irr.py PWCNet (the reference's live 'irrpwc' registry path)."""

    def __init__(self, cin=5, div_flow=0.05):
        super().__init__()
        self.div_flow = div_flow
        num_chs = [cin, 16, 32, 64, 96, 128, 196]
        self.feature_pyramid_extractor = OraclePWCFeatureExtractor(num_chs)
        dim_corr = 81
        self.flow_estimators = OraclePWCDenseEstimator(dim_corr + 32 + 2)
        self.context_networks = OraclePWCContext(dim_corr + 32 + 2 + 448 + 2)
        self.conv_1x1 = nn.ModuleList(
            [_pwc_conv(c, 32, 1) for c in (196, 128, 96, 64, 32)]
        )

    def forward(self, ev1, ev2):
        H, W = ev1.shape[-2:]
        x1_pyr = self.feature_pyramid_extractor(ev1) + [ev1]
        x2_pyr = self.feature_pyramid_extractor(ev2) + [ev2]
        b, _, h0, w0 = x1_pyr[0].shape
        flow = torch.zeros(b, 2, h0, w0)
        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp = x2
            else:
                flow = _pwc_upsample_as(flow, x1)
                x2_warp = _pwc_warp(x2, flow, H, W, self.div_flow)
            corr = F.leaky_relu(_pwc_cost_volume(x1, x2_warp), 0.1)
            flow = _pwc_rescale(flow, self.div_flow, W, H, True)
            x11 = self.conv_1x1[l](x1)
            x_intm, res = self.flow_estimators(torch.cat([corr, x11, flow], 1))
            flow = flow + res
            flow = flow + self.context_networks(torch.cat([x_intm, flow], 1))
            flow = _pwc_rescale(flow, self.div_flow, W, H, False)
            preds.append(
                F.interpolate(flow, (H, W), mode="bilinear", align_corners=True)
                * (1.0 / self.div_flow)
            )
            if l == 4:
                break
        return preds


class OraclePWCFamily(nn.Module):
    """The pwcnet{,_bi,_occ,_occ_bi,_irr_*} family in one oracle; flags
    mirror the reference files (incl. the non-irr occ_bi x1-for-backward
    quirk, pwcnet_occ_bi.py:103)."""

    def __init__(self, cin=5, irr=False, bi=False, occ=False, div_flow=0.05):
        super().__init__()
        self.irr, self.bi, self.occ = irr, bi, occ
        self.div_flow = div_flow
        num_chs = [cin, 16, 32, 64, 96, 128, 196]
        self.feature_pyramid_extractor = OraclePWCFeatureExtractor(num_chs)
        dim_corr = 81
        n_lv = 5
        if irr:
            self.flow_estimators = OraclePWCDenseEstimator(dim_corr + 32 + 2)
            self.context_networks = OraclePWCContext(dim_corr + 32 + 2 + 448 + 2)
            self.conv_1x1 = nn.ModuleList(
                [_pwc_conv(c, 32, 1) for c in (196, 128, 96, 64, 32)]
            )
            if occ:
                self.occ_estimators = OraclePWCDenseEstimator(dim_corr + 32 + 1, 1)
                self.occ_context_networks = OraclePWCContext(
                    dim_corr + 32 + 1 + 448 + 1, 1
                )
        else:
            chs = (196, 128, 96, 64, 32)
            self.flow_estimators = nn.ModuleList(
                [OraclePWCDenseEstimator(dim_corr if l == 0 else dim_corr + chs[l] + 2)
                 for l in range(n_lv)]
            )
            self.context_networks = OraclePWCContext(dim_corr + 32 + 2 + 448 + 2)
            if occ:
                self.occ_estimators = nn.ModuleList(
                    [OraclePWCDenseEstimator(
                        dim_corr if l == 0 else dim_corr + chs[l] + 1, 1)
                     for l in range(n_lv)]
                )
                self.context_networks_occ = OraclePWCContext(
                    dim_corr + 32 + 1 + 448 + 1, 1
                )

    def forward(self, ev1, ev2):
        H, W = ev1.shape[-2:]
        x1_pyr = self.feature_pyramid_extractor(ev1)
        x2_pyr = self.feature_pyramid_extractor(ev2)
        b, _, h0, w0 = x1_pyr[0].shape
        flow_f = torch.zeros(b, 2, h0, w0)
        flow_b = torch.zeros(b, 2, h0, w0)
        occ_f = torch.zeros(b, 1, h0, w0)
        occ_b = torch.zeros(b, 1, h0, w0)
        preds = []
        for l, (x1, x2) in enumerate(zip(x1_pyr, x2_pyr)):
            if l == 0:
                x2_warp, x1_warp = x2, x1
            else:
                flow_f = _pwc_upsample_as(flow_f, x1)
                x2_warp = _pwc_warp(x2, flow_f, H, W, self.div_flow)
                if self.occ:
                    occ_f = _pwc_upsample_as(occ_f, x1)
                if self.bi:
                    flow_b = _pwc_upsample_as(flow_b, x2)
                    x1_warp = _pwc_warp(x1, flow_b, H, W, self.div_flow)
                    if self.occ:
                        occ_b = _pwc_upsample_as(occ_b, x2)
            corr_f = F.leaky_relu(_pwc_cost_volume(x1, x2_warp), 0.1)
            if self.bi:
                corr_b = F.leaky_relu(_pwc_cost_volume(x2, x1_warp), 0.1)

            if self.irr:
                flow_f = _pwc_rescale(flow_f, self.div_flow, W, H, True)
                x1_in = self.conv_1x1[l](x1)
                if self.bi:
                    flow_b = _pwc_rescale(flow_b, self.div_flow, W, H, True)
                    x2_in = self.conv_1x1[l](x2)
                est = self.flow_estimators
                ctx = self.context_networks
                xi_f, rf = est(torch.cat([corr_f, x1_in, flow_f], 1))
                flow_f = flow_f + rf
                flow_f = flow_f + ctx(torch.cat([xi_f, flow_f], 1))
                if self.bi:
                    xi_b, rb = est(torch.cat([corr_b, x2_in, flow_b], 1))
                    flow_b = flow_b + rb
                    flow_b = flow_b + ctx(torch.cat([xi_b, flow_b], 1))
                if self.occ:
                    oest, octx = self.occ_estimators, self.occ_context_networks
                    xo_f, orf = oest(torch.cat([corr_f, x1_in, occ_f], 1))
                    occ_f = occ_f + orf
                    occ_f = occ_f + octx(torch.cat([xo_f, occ_f], 1))
                    if self.bi:
                        xo_b, orb = oest(torch.cat([corr_b, x2_in, occ_b], 1))
                        occ_b = occ_b + orb
                        occ_b = occ_b + octx(torch.cat([xo_b, occ_b], 1))
                flow_f = _pwc_rescale(flow_f, self.div_flow, W, H, False)
                if self.bi:
                    flow_b = _pwc_rescale(flow_b, self.div_flow, W, H, False)
            else:
                if l == 0:
                    xi_f, flow_f = self.flow_estimators[l](corr_f)
                    if self.bi:
                        xi_b, flow_b = self.flow_estimators[l](corr_b)
                    if self.occ:
                        xo_f, occ_f = self.occ_estimators[l](corr_f)
                        if self.bi:
                            xo_b, occ_b = self.occ_estimators[l](corr_b)
                else:
                    xi_f, flow_f = self.flow_estimators[l](
                        torch.cat([corr_f, x1, flow_f], 1))
                    if self.bi:
                        xi_b, flow_b = self.flow_estimators[l](
                            torch.cat([corr_b, x2, flow_b], 1))
                    if self.occ:
                        xo_f, occ_f = self.occ_estimators[l](
                            torch.cat([corr_f, x1, occ_f], 1))
                        if self.bi:
                            # reference quirk: x1 for the backward occ arm
                            xo_b, occ_b = self.occ_estimators[l](
                                torch.cat([corr_b, x1, occ_b], 1))
                if l == 4:
                    flow_f = flow_f + self.context_networks(
                        torch.cat([xi_f, flow_f], 1))
                    if self.bi:
                        flow_b = flow_b + self.context_networks(
                            torch.cat([xi_b, flow_b], 1))
                    if self.occ:
                        occ_f = occ_f + self.context_networks_occ(
                            torch.cat([xo_f, occ_f], 1))
                        if self.bi:
                            occ_b = occ_b + self.context_networks_occ(
                                torch.cat([xo_b, occ_b], 1))

            preds.append(
                F.interpolate(flow_f, (H, W), mode="bilinear", align_corners=True)
                * (1.0 / self.div_flow)
            )
            if l == 4:
                break
        maps = None
        if self.occ:
            maps = (
                F.interpolate(occ_f, (H, W), mode="bilinear", align_corners=True),
                F.interpolate(occ_b, (H, W), mode="bilinear", align_corners=True)
                if self.bi else None,
            )
        return maps, preds


# ---------------------------------------------------------------- DCEIFlow ----

class OracleDCEIFlow(nn.Module):
    """DCEIFlow (SDCEImodel/DCEIFlow.py:51-187 + with_event_updater.py)."""

    def __init__(self, event_bins=10, image_channels=3):
        super().__init__()
        self.enet = OracleBasicEncoder(256, "instance", event_bins)
        self.fnet = OracleBasicEncoder(256, "instance", image_channels)
        self.cnet = OracleBasicEncoder(256, "batch", image_channels)

        class Fusion(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv1 = nn.Conv2d(256, 192, 1)
                self.conv2 = nn.Conv2d(256, 192, 1)
                self.convo = nn.Conv2d(384, 256, 3, padding=1)

            def forward(self, x1, x2):
                out = torch.cat([F.relu(self.conv1(x1)), F.relu(self.conv2(x2))], 1)
                return F.relu(self.convo(out)) + x1

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.convc1 = nn.Conv2d(324, 256, 1)
                self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
                self.conve1 = nn.Conv2d(256, 128, 1)
                self.conve2 = nn.Conv2d(128, 64, 3, padding=1)
                self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
                self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
                self.conv = nn.Conv2d(320, 126, 3, padding=1)

            def forward(self, flow, emap, corr):
                cor = F.relu(self.convc2(F.relu(self.convc1(corr))))
                ema = F.relu(self.conve2(F.relu(self.conve1(emap))))
                flo = F.relu(self.convf2(F.relu(self.convf1(flow))))
                out = F.relu(self.conv(torch.cat([cor, ema, flo], 1)))
                return torch.cat([out, flow], 1)

        class Upd(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoder = Enc()
                base = OracleUpdateBlock(128)
                self.gru = base.gru
                self.flow_head = base.flow_head

            def forward(self, net, inp, corr, emap, flow):
                m = self.encoder(flow, emap, corr)
                net = self.gru(net, torch.cat([inp, m], 1))
                return net, None, self.flow_head(net)

        self.fusion = Fusion()
        self.update_block = Upd()

    def forward(self, event_voxel, image1, iters=4):
        image1 = 2 * (image1 / 255.0) - 1.0
        event_voxel = 2 * event_voxel - 1.0
        emap = self.enet(event_voxel)
        fmap1 = self.fnet(image1)
        pseudo_fmap2 = self.fusion(fmap1, emap)
        corr_fn = OracleCorrBlock(fmap1, pseudo_fmap2)
        cnet = self.cnet(image1)
        net, inp = torch.split(cnet, [128, 128], 1)
        net, inp = torch.tanh(net), torch.relu(inp)
        N, _, Hp, Wp = image1.shape
        ys, xs = torch.meshgrid(
            torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij"
        )
        coords0 = torch.stack([xs, ys], 0).float()[None].repeat(N, 1, 1, 1)
        coords1 = coords0.clone()
        preds = []
        for _ in range(iters):
            coords1 = coords1.detach()
            corr = corr_fn(coords1)
            flow = coords1 - coords0
            net, _, delta = self.update_block(net, inp, corr, emap, flow)
            coords1 = coords1 + delta
            f = coords1 - coords0
            preds.append(
                F.interpolate(f, scale_factor=8, mode="bilinear",
                              align_corners=True) * 8
            )
        return preds


# ------------------------------------------------------- STE / spike nets ----

def _snn_conv(cin, cout, k=3, s=1, bias=True):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=bias), nn.LeakyReLU(0.1)
    )


def _snn_conv_s(cin, cout, k=3, s=2, bias=False):
    return nn.Sequential(nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=bias))


def _snn_deconv(cin, cout, bias):
    return nn.Sequential(
        nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=bias), nn.LeakyReLU(0.1)
    )


def _snn_predict(cin, bias):
    return nn.Sequential(nn.Conv2d(cin, 2, 1, bias=bias))


class OracleSpikeFlowNetS(nn.Module):
    """spikemodel/FlowNetS_spike.py (batchNorm=False, the spike_flownets
    constructor)."""

    def __init__(self):
        super().__init__()
        self.conv1 = _snn_conv_s(4, 64)
        self.conv2 = _snn_conv_s(64, 128)
        self.conv3 = _snn_conv_s(128, 256)
        self.conv4 = _snn_conv_s(256, 512)
        for name, cin in (("conv_r11", 512), ("conv_r12", 512),
                          ("conv_r21", 512), ("conv_r22", 512)):
            setattr(self, name, _snn_conv(cin, 512, bias=False))
        self.deconv3 = _snn_deconv(512, 128, False)
        self.deconv2 = _snn_deconv(386, 64, False)
        self.deconv1 = _snn_deconv(194, 4, False)
        for n in ("predict_flow4", "predict_flow3", "predict_flow2", "predict_flow1"):
            setattr(self, n, _snn_predict(32, False))
        self.upsampled_flow4_to_3 = nn.ConvTranspose2d(512, 32, 4, 2, 1, bias=False)
        self.upsampled_flow3_to_2 = nn.ConvTranspose2d(386, 32, 4, 2, 1, bias=False)
        self.upsampled_flow2_to_1 = nn.ConvTranspose2d(194, 32, 4, 2, 1, bias=False)
        self.upsampled_flow1_to_0 = nn.ConvTranspose2d(70, 32, 4, 2, 1, bias=False)

    @staticmethod
    def _if(mem, th):
        ex = F.threshold(mem, th, 0)
        mem = mem - ex
        return mem, (ex > 1e-5).float()

    def forward(self, x, sp_threshold=0.75):
        B, C, H, W, T = x.shape
        mems = [torch.zeros(B, c, H // s, W // s)
                for c, s in ((64, 2), (128, 4), (256, 8), (512, 16))]
        tots = [torch.zeros_like(m) for m in mems]
        convs = [self.conv1, self.conv2, self.conv3, self.conv4]
        for t in range(T):
            cur = x[..., t]
            for lv in range(4):
                cur = convs[lv](cur)
                mems[lv] = mems[lv] + cur
                tots[lv] = tots[lv] + cur
                mems[lv], cur = self._if(mems[lv], sp_threshold)
        oc1, oc2, oc3, oc4 = tots
        r11 = self.conv_r11(oc4)
        r12 = self.conv_r12(r11) + oc4
        r21 = self.conv_r21(r12)
        r22 = self.conv_r22(r21) + r12
        flow4 = self.predict_flow4(self.upsampled_flow4_to_3(r22))
        d3 = self.deconv3(r22)
        concat3 = torch.cat([oc3, d3, flow4], 1)
        flow3 = self.predict_flow3(self.upsampled_flow3_to_2(concat3))
        d2 = self.deconv2(concat3)
        concat2 = torch.cat([oc2, d2, flow3], 1)
        flow2 = self.predict_flow2(self.upsampled_flow2_to_1(concat2))
        d1 = self.deconv1(concat2)
        concat1 = torch.cat([oc1, d1, flow2], 1)
        flow1 = self.predict_flow1(self.upsampled_flow1_to_0(concat1))
        return [flow1]


class OracleSTEConvGRU(nn.Module):
    def __init__(self, hidden, inp):
        super().__init__()
        self.convz = nn.Conv2d(hidden + inp, hidden, 3, padding=1)
        self.convr = nn.Conv2d(hidden + inp, hidden, 3, padding=1)
        self.convq = nn.Conv2d(hidden + inp, hidden, 3, padding=1)

    def forward(self, h, x):
        hx = torch.cat([h, x], 1)
        z = torch.sigmoid(self.convz(hx))
        r = torch.sigmoid(self.convr(hx))
        q = torch.tanh(self.convq(torch.cat([r * h, x], 1)))
        return (1 - z) * h + z * q


class OracleSTEFlowNet(nn.Module):
    """STEmodel/STEFlow.py FlowNetS_spike (batchNorm=False, the steflow
    constructor), incl. the unused flow_deconvN heads and the double-leaky
    correlation (corr.py:26 + forward leakyRELU)."""

    def __init__(self, num_iterative=3):
        super().__init__()
        nd = 81
        self.num_iterative = num_iterative
        self.nd = nd
        self.conv1 = _snn_conv(2, 64, s=2)
        self.conv2 = _snn_conv(64 + nd, 128, s=2)
        self.conv3 = _snn_conv(128 + nd, 256, s=2)
        self.conv4 = _snn_conv(256 + nd, 512, s=2)
        self.conv1_2 = _snn_conv(2, 64, s=2)
        self.conv2_2 = _snn_conv(64, 128, s=2)
        self.conv3_2 = _snn_conv(128, 256, s=2)
        self.conv4_2 = _snn_conv(256, 512, s=2)
        self.conv_r00 = _snn_conv(512 + nd, 512)
        self.conv_r11 = _snn_conv(512, 512)
        self.conv_r12 = _snn_conv(512, 512)
        self.conv_r21 = _snn_conv(512, 512)
        self.conv_r22 = _snn_conv(512, 512)
        self.deconv3 = _snn_deconv(1024 + nd, 128, True)
        self.deconv2 = _snn_deconv(386 + nd, 64, True)
        self.deconv1 = _snn_deconv(194 + nd, 4, True)
        for n in ("predict_flow4", "predict_flow3", "predict_flow2", "predict_flow1"):
            setattr(self, n, _snn_predict(32, True))
        self.gru_update1 = nn.Module()
        self.gru_update1.gru = OracleSTEConvGRU(64 + nd, 64 + nd)
        self.gru_update2 = nn.Module()
        self.gru_update2.gru = OracleSTEConvGRU(128 + nd, 128 + nd)
        self.gru_update3 = nn.Module()
        self.gru_update3.gru = OracleSTEConvGRU(256 + nd, 256 + nd)
        self.gru_update4 = nn.Module()
        self.gru_update4.gru = OracleSTEConvGRU(512 + nd, 512 + nd)
        self.upsampled_flow4_to_3 = nn.ConvTranspose2d(1024 + nd, 32, 4, 2, 1)
        self.upsampled_flow3_to_2 = nn.ConvTranspose2d(386 + nd, 32, 4, 2, 1)
        self.upsampled_flow2_to_1 = nn.ConvTranspose2d(194 + nd, 32, 4, 2, 1)
        self.upsampled_flow1_to_0 = nn.ConvTranspose2d(70 + nd, 32, 4, 2, 1)
        for n in range(5):
            setattr(self, f"flow_deconv{n}", nn.ConvTranspose2d(2, 2, 4, 2, 1))

    @staticmethod
    def _warp_border(x, flow):
        B, C, H, W = x.shape
        xs = torch.arange(W).repeat(B, H, 1).float()
        ys = torch.arange(H).repeat(B, W, 1).transpose(1, 2).float()
        grid = torch.stack([xs, ys], 1) + flow
        gn = torch.stack(
            [2 * grid[:, 0] / (W - 1) - 1, 2 * grid[:, 1] / (H - 1) - 1], -1
        )
        return F.grid_sample(x, gn, padding_mode="border", align_corners=False)

    @staticmethod
    def _corr(f1, f2):
        c = torch_local_correlation(f1, f2)  # /C, dy-major
        return F.leaky_relu(c, 0.1)

    def forward(self, x, image_resize):
        B = x.shape[0]
        nd = self.nd
        R = image_resize
        net1 = torch.zeros(B, 64 + nd, R // 2, R // 2)
        net2 = torch.zeros(B, 128 + nd, R // 4, R // 4)
        net3 = torch.zeros(B, 256 + nd, R // 8, R // 8)
        net4 = torch.zeros(B, 512 + nd, R // 16, R // 16)
        T = x.shape[4]
        flow1_all = [torch.zeros(B, 2, R, R) for _ in range(T)]
        flow2_all = [torch.zeros(B, 2, R // 2, R // 2) for _ in range(T)]
        flow3_all = [torch.zeros(B, 2, R // 4, R // 4) for _ in range(T)]
        flow4_all = [torch.zeros(B, 2, R // 8, R // 8) for _ in range(T)]
        f1_0 = f2_0 = f3_0 = f4_0 = None
        preds = []
        for _ in range(self.num_iterative):
            for t in range(T):
                inp = x[:, 0:2, :, :, t]
                c1 = self.conv1(inp)
                if t == 0:
                    f1_0 = c1
                corr1 = F.leaky_relu(
                    self._corr(f1_0, self._warp_border(c1, flow2_all[t])), 0.1)
                net1 = self.gru_update1.gru(net1, torch.cat([c1, corr1], 1))

                c2 = self.conv2(net1)
                c2_1 = self.conv2_2(c1)
                if t == 0:
                    f2_0 = c2_1
                corr2 = F.leaky_relu(
                    self._corr(f2_0, self._warp_border(c2_1, flow3_all[t])), 0.1)
                net2 = self.gru_update2.gru(net2, torch.cat([c2, corr2], 1))

                c3 = self.conv3(net2)
                c3_1 = self.conv3_2(c2_1)
                if t == 0:
                    f3_0 = c3_1
                corr3 = F.leaky_relu(
                    self._corr(f3_0, self._warp_border(c3_1, flow4_all[t])), 0.1)
                net3 = self.gru_update3.gru(net3, torch.cat([c3, corr3], 1))

                c4 = self.conv4(net3)
                c4_1 = self.conv4_2(c3_1)
                if t == 0:
                    f4_0 = c4_1
                corr4 = F.leaky_relu(self._corr(f4_0, c4_1), 0.1)
                net4 = self.gru_update4.gru(net4, torch.cat([c4, corr4], 1))

                o00 = self.conv_r00(net4)
                o12 = self.conv_r12(self.conv_r11(o00)) + o00
                o22 = self.conv_r22(self.conv_r21(o12)) + o12

                concat4 = torch.cat([net4, o22], 1)
                flow4 = self.predict_flow4(
                    self.upsampled_flow4_to_3(concat4)) + flow4_all[t]
                flow4_all[t] = flow4
                d3 = self.deconv3(concat4)

                concat3 = torch.cat([net3, d3, flow4], 1)
                flow3 = self.predict_flow3(
                    self.upsampled_flow3_to_2(concat3)) + flow3_all[t]
                flow3_all[t] = flow3
                d2 = self.deconv2(concat3)

                concat2 = torch.cat([net2, d2, flow3], 1)
                flow2 = self.predict_flow2(
                    self.upsampled_flow2_to_1(concat2)) + flow2_all[t]
                flow2_all[t] = flow2
                d1 = self.deconv1(concat2)

                concat1 = torch.cat([net1, d1, flow2], 1)
                flow1 = self.predict_flow1(
                    self.upsampled_flow1_to_0(concat1)) + flow1_all[t]
                flow1_all[t] = flow1
            preds.append(flow1)
        return preds


# --------------------------------------------------------------- FlowNet1S ----

def _fn_conv(cin, cout, k, s):
    return nn.Sequential(
        nn.Conv2d(cin, cout, k, s, k // 2, bias=True), nn.LeakyReLU(0.1)
    )


def _fn_deconv(cin, cout, nonlinear=True):
    t = nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=False)
    return nn.Sequential(t, nn.LeakyReLU(0.1)) if nonlinear else t


def _fn_resize_as(x, ref):
    h, w = ref.shape[-2:]
    th, tw = x.shape[-2:]
    if (th, tw) == (h, w):
        return x
    if [h, w] < [th, tw]:  # the reference's lexicographic branch choice
        return F.adaptive_avg_pool2d(x, (h, w))
    return F.interpolate(x, (h, w), mode="bilinear", align_corners=True)


class OracleFlowNet1SPlain(nn.Module):
    """flownet1s.py FlowNet1S (plain FlowNetS on concat input)."""

    def __init__(self, cin=5, div_flow=0.05):
        super().__init__()
        self.div_flow = div_flow

        class Core(nn.Module):
            def __init__(self):
                super().__init__()
                self._conv1 = _fn_conv(2 * cin, 64, 7, 2)
                self._conv2 = _fn_conv(64, 128, 5, 2)
                self._conv3 = _fn_conv(128, 256, 5, 2)
                self._conv3_1 = _fn_conv(256, 256, 3, 1)
                self._conv4 = _fn_conv(256, 512, 3, 2)
                self._conv4_1 = _fn_conv(512, 512, 3, 1)
                self._conv5 = _fn_conv(512, 512, 3, 2)
                self._conv5_1 = _fn_conv(512, 512, 3, 1)
                self._conv6 = _fn_conv(512, 1024, 3, 2)
                self._conv6_1 = _fn_conv(1024, 1024, 3, 1)
                self._deconv5 = _fn_deconv(1024, 512)
                self._deconv4 = _fn_deconv(1026, 256)
                self._deconv3 = _fn_deconv(770, 128)
                self._deconv2 = _fn_deconv(386, 64)
                self._predict_flow6 = nn.Conv2d(1024, 2, 3, 1, 1)
                self._predict_flow5 = nn.Conv2d(1026, 2, 3, 1, 1)
                self._predict_flow4 = nn.Conv2d(770, 2, 3, 1, 1)
                self._predict_flow3 = nn.Conv2d(386, 2, 3, 1, 1)
                self._predict_flow2 = nn.Conv2d(194, 2, 3, 1, 1)
                self._upsample_flow6_to_5 = _fn_deconv(2, 2, False)
                self._upsample_flow5_to_4 = _fn_deconv(2, 2, False)
                self._upsample_flow4_to_3 = _fn_deconv(2, 2, False)
                self._upsample_flow3_to_2 = _fn_deconv(2, 2, False)

            def forward(self, x):
                c1 = self._conv1(x)
                c2 = self._conv2(c1)
                c31 = self._conv3_1(self._conv3(c2))
                c41 = self._conv4_1(self._conv4(c31))
                c51 = self._conv5_1(self._conv5(c41))
                c61 = self._conv6_1(self._conv6(c51))
                p6 = self._predict_flow6(c61)
                up5 = self._upsample_flow6_to_5(p6)
                d5 = self._deconv5(c61)
                cc5 = torch.cat([_fn_resize_as(t, c51) for t in (c51, d5, up5)], 1)
                p5 = self._predict_flow5(cc5)
                up4 = self._upsample_flow5_to_4(p5)
                d4 = self._deconv4(cc5)
                cc4 = torch.cat([_fn_resize_as(t, c41) for t in (c41, d4, up4)], 1)
                p4 = self._predict_flow4(cc4)
                up3 = self._upsample_flow4_to_3(p4)
                d3 = self._deconv3(cc4)
                cc3 = torch.cat([_fn_resize_as(t, c31) for t in (c31, d3, up3)], 1)
                p3 = self._predict_flow3(cc3)
                up2 = self._upsample_flow3_to_2(p3)
                d2 = self._deconv2(cc3)
                cc2 = torch.cat([_fn_resize_as(t, c2) for t in (c2, d2, up2)], 1)
                p2 = self._predict_flow2(cc2)
                return p2, p3, p4, p5, p6

        self._flownets = Core()

    def forward(self, ev1, ev2):
        H, W = ev1.shape[-2:]
        flows = self._flownets(torch.cat([ev1, ev2], 1))
        return [
            F.interpolate(f, (H, W), mode="bilinear", align_corners=True)
            * (1.0 / self.div_flow)
            for f in flows[::-1]
        ]


class OracleFlowNet1SIrrOccBi(nn.Module):
    """flownet1s_irr_occ_bi.py FlowNet1S: shared narrow stem per image,
    iterative-residual shared decoder, occlusion arm, bi-directional."""

    def __init__(self, cin=5, div_flow=0.05, num_iters=2):
        super().__init__()
        self.div_flow = div_flow
        self.num_iters = num_iters
        self._conv1 = _fn_conv(cin, 32, 7, 2)
        self._conv2 = _fn_conv(32, 64, 5, 2)
        self._conv3 = _fn_conv(64, 128, 5, 2)

        class Core(nn.Module):
            def __init__(self):
                super().__init__()
                self._conv3_1 = _fn_conv(256, 256, 3, 1)
                self._conv4 = _fn_conv(256, 512, 3, 2)
                self._conv4_1 = _fn_conv(512, 512, 3, 1)
                self._conv5 = _fn_conv(512, 512, 3, 2)
                self._conv5_1 = _fn_conv(512, 512, 3, 1)
                self._conv6 = _fn_conv(512, 1024, 3, 2)
                self._conv6_1 = _fn_conv(1024, 1024, 3, 1)
                self._deconv5 = _fn_deconv(1024, 512)
                self._deconv4 = _fn_deconv(1026, 256)
                self._deconv3 = _fn_deconv(770, 128)
                self._deconv2 = _fn_deconv(386, 64)
                self._deconv_occ5 = _fn_deconv(1024, 512)
                self._deconv_occ4 = _fn_deconv(1025, 256)
                self._deconv_occ3 = _fn_deconv(769, 128)
                self._deconv_occ2 = _fn_deconv(385, 64)
                self._predict_flow6 = nn.Conv2d(1024, 2, 3, 1, 1)
                self._predict_flow5 = nn.Conv2d(1026, 2, 3, 1, 1)
                self._predict_flow4 = nn.Conv2d(770, 2, 3, 1, 1)
                self._predict_flow3 = nn.Conv2d(386, 2, 3, 1, 1)
                self._predict_flow2 = nn.Conv2d(130, 2, 3, 1, 1)
                self._predict_occ6 = nn.Conv2d(1024, 1, 3, 1, 1)
                self._predict_occ5 = nn.Conv2d(1025, 1, 3, 1, 1)
                self._predict_occ4 = nn.Conv2d(769, 1, 3, 1, 1)
                self._predict_occ3 = nn.Conv2d(385, 1, 3, 1, 1)
                self._predict_occ2 = nn.Conv2d(129, 1, 3, 1, 1)
                self._upsample_flow6_to_5 = _fn_deconv(2, 2, False)
                self._upsample_flow5_to_4 = _fn_deconv(2, 2, False)
                self._upsample_flow4_to_3 = _fn_deconv(2, 2, False)
                self._upsample_flow3_to_2 = _fn_deconv(2, 2, False)
                self._upsample_occ6_to_5 = _fn_deconv(1, 1, False)
                self._upsample_occ5_to_4 = _fn_deconv(1, 1, False)
                self._upsample_occ4_to_3 = _fn_deconv(1, 1, False)
                self._upsample_occ3_to_2 = _fn_deconv(1, 1, False)

            def _arm(self, c2, c31, c41, c51, c61, tag):
                pre = getattr
                outs = []
                p6 = pre(self, f"_predict_{tag}6")(c61)
                up5 = pre(self, f"_upsample_{tag}6_to_5")(p6)
                d5 = pre(self, f"_deconv{'_occ' if tag == 'occ' else ''}5")(c61)
                cc5 = torch.cat([_fn_resize_as(t, c51) for t in (c51, d5, up5)], 1)
                p5 = pre(self, f"_predict_{tag}5")(cc5)
                up4 = pre(self, f"_upsample_{tag}5_to_4")(p5)
                d4 = pre(self, f"_deconv{'_occ' if tag == 'occ' else ''}4")(cc5)
                cc4 = torch.cat([_fn_resize_as(t, c41) for t in (c41, d4, up4)], 1)
                p4 = pre(self, f"_predict_{tag}4")(cc4)
                up3 = pre(self, f"_upsample_{tag}4_to_3")(p4)
                d3 = pre(self, f"_deconv{'_occ' if tag == 'occ' else ''}3")(cc4)
                cc3 = torch.cat([_fn_resize_as(t, c31) for t in (c31, d3, up3)], 1)
                p3 = pre(self, f"_predict_{tag}3")(cc3)
                up2 = pre(self, f"_upsample_{tag}3_to_2")(p3)
                d2 = pre(self, f"_deconv{'_occ' if tag == 'occ' else ''}2")(cc3)
                cc2 = torch.cat([_fn_resize_as(t, c2) for t in (c2, d2, up2)], 1)
                p2 = pre(self, f"_predict_{tag}2")(cc2)
                return p2, p3, p4, p5, p6

            def forward(self, c2, c3a, c3b):
                c31 = self._conv3_1(torch.cat([c3a, c3b], 1))
                c41 = self._conv4_1(self._conv4(c31))
                c51 = self._conv5_1(self._conv5(c41))
                c61 = self._conv6_1(self._conv6(c51))
                flows = self._arm(c2, c31, c41, c51, c61, "flow")
                occs = self._arm(c2, c31, c41, c51, c61, "occ")
                return flows, occs

        self._flownets = Core()

    @staticmethod
    def _warp(x, flow, height_im, width_im, div_flow):
        B, C, H, W = x.shape
        gw = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
        gh = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
        grid = torch.cat([gw, gh], 1)
        fw = flow[:, 0] * 2 / width_im / div_flow
        fh = flow[:, 1] * 2 / height_im / div_flow
        g = (grid + torch.stack([fw, fh], 1)).permute(0, 2, 3, 1)
        return F.grid_sample(x, g, align_corners=True)

    def forward(self, ev1, ev2):
        H, W = ev1.shape[-2:]
        c2_1 = self._conv2(self._conv1(ev1))
        c3_1 = self._conv3(c2_1)
        c2_2 = self._conv2(self._conv1(ev2))
        c3_2 = self._conv3(c2_2)
        c3_2_wp, c3_1_wp = c3_2, c3_1
        acc_f = acc_b = oacc_f = oacc_b = None
        preds = []
        for ii in range(self.num_iters):
            flows_f, occs_f = self._flownets(c2_1, c3_1, c3_2_wp)
            flows_b, occs_b = self._flownets(c2_2, c3_2, c3_1_wp)
            acc_f = flows_f if acc_f is None else tuple(
                a + f for a, f in zip(acc_f, flows_f))
            acc_b = flows_b if acc_b is None else tuple(
                a + f for a, f in zip(acc_b, flows_b))
            oacc_f = occs_f if oacc_f is None else tuple(
                a + o for a, o in zip(oacc_f, occs_f))
            oacc_b = occs_b if oacc_b is None else tuple(
                a + o for a, o in zip(oacc_b, occs_b))
            preds.append(
                F.interpolate(acc_f[0], (H, W), mode="bilinear",
                              align_corners=True) * (1.0 / self.div_flow))
            if ii < self.num_iters - 1:
                uf = F.interpolate(acc_f[0], c3_2.shape[-2:], mode="bilinear",
                                   align_corners=True)
                ub = F.interpolate(acc_b[0], c3_1.shape[-2:], mode="bilinear",
                                   align_corners=True)
                c3_2_wp = self._warp(c3_2, uf, H, W, self.div_flow)
                c3_1_wp = self._warp(c3_1, ub, H, W, self.div_flow)
        occ_f = F.interpolate(oacc_f[0], (H, W), mode="bilinear",
                              align_corners=True)
        occ_b = F.interpolate(oacc_b[0], (H, W), mode="bilinear",
                              align_corners=True)
        return (occ_f, occ_b), preds


# ---------------------------------------------------------------------------
# Event point transformer (reference model/GMA/ev_transformer_batch.py)
# ---------------------------------------------------------------------------


def oracle_select_nearest(vect, M):
    """B x N x C -> B x N x M x C sliding temporal window (zero-padded;
    reference ev_transformer_batch.py:10-19)."""
    vp = F.pad(vect, pad=[0, 0, M // 2, M // 2 - 1, 0, 0])
    win = vp.unfold(dimension=1, size=M, step=1)  # B x N x C x M
    return win.permute(0, 1, 3, 2)


def oracle_fps(event, npoint):
    """Reference FPS (ev_transformer_batch.py:21-66): first = farthest
    from the barycenter; extraction via 0/1-marker masked_select, i.e.
    samples come out in ASCENDING INDEX order."""
    B, N, C = event.shape
    marker = torch.zeros(B, N, C, dtype=torch.long)
    distance = torch.ones(B, N) * 1e10
    bidx = torch.arange(B, dtype=torch.long)
    bary = event.sum(1, keepdim=True) / event.shape[1]
    farthest = torch.max(((event - bary) ** 2).sum(-1), 1)[1]
    for _ in range(npoint):
        marker[bidx, farthest, :] = 1
        centroid = event[bidx, farthest, :].view(B, 1, C)
        dist = ((event - centroid) ** 2).sum(-1)
        mask = dist < distance
        distance[mask] = dist[mask]
        farthest = torch.max(distance, -1)[1]
    return event.masked_select(marker > 0).view(B, npoint, C)


class _OracleXformer(nn.Module):
    """Shared LX/GX attention math incl. the reference's value
    aggregation quirk (ev_transformer_batch.py:113-116): the
    (B,1,N,M)x(B,Cn,M,N) matmul + sum over the last axis collapses the
    values over the WHOLE sequence before the score contraction."""

    def __init__(self, C, Cn, M, with_pe):
        super().__init__()
        self.nearst_events_num = M
        self.w_qs = nn.Linear(C, Cn, bias=False)
        self.w_ks = nn.Linear(C, Cn, bias=False)
        self.w_vs = nn.Linear(C, Cn, bias=False)
        if with_pe:
            self.w_pe = nn.Linear(C, Cn, bias=False)
        self.w_sa1 = nn.Linear(Cn, 1, bias=False)
        self.w_sa2 = nn.Linear(Cn, C, bias=False)
        self.layer_norm = nn.LayerNorm(C, eps=1e-6)  # dead (never called)

    def attend(self, q, k_multi, v_multi, pe):
        B, N, _ = q.shape
        M = self.nearst_events_num
        q_multi = q.unsqueeze(2).repeat(1, 1, M, 1)
        sa = self.w_sa1(q_multi - k_multi + pe).view(B, 1, N, M)
        scores = sa.softmax(dim=-1)
        attn_vect = (v_multi + pe).permute(0, 3, 2, 1)  # B x Cn x M x N
        p_attn = torch.matmul(scores, attn_vect)        # B x Cn x N x N
        p_attn = p_attn.sum(-1).view(B, -1, N).permute(0, 2, 1)
        return self.w_sa2(p_attn)


class OracleLXformer(_OracleXformer):
    def __init__(self, C, Cn, M):
        super().__init__(C, Cn, M, with_pe=False)

    def forward(self, q, k, v, pe):
        M = self.nearst_events_num
        q, k, v = self.w_qs(q), self.w_ks(k), self.w_vs(v)
        return self.attend(
            q, oracle_select_nearest(k, M), oracle_select_nearest(v, M), pe
        )


class OracleGXformer(_OracleXformer):
    def __init__(self, C, Cn, M):
        super().__init__(C, Cn, M, with_pe=True)

    def forward(self, feat):
        B, N, _ = feat.shape
        M = self.nearst_events_num
        q, k, v = self.w_qs(feat), self.w_ks(feat), self.w_vs(feat)
        pe_raw = feat.unsqueeze(2).repeat(1, 1, M, 1) - oracle_fps(
            feat, M
        ).unsqueeze(1).repeat(1, N, 1, 1)
        pe = self.w_pe(pe_raw)
        k_multi = oracle_fps(k, M).unsqueeze(1).repeat(1, N, 1, 1)
        v_multi = oracle_fps(v, M).unsqueeze(1).repeat(1, N, 1, 1)
        return self.attend(q, k_multi, v_multi, pe)


class OracleEventTransformer(nn.Module):
    """Reference EventTransformer (ev_transformer_batch.py:195-291), eval
    semantics (dropout identity)."""

    def __init__(self, C=32, Cn=64, M=8, image_size=(32, 48)):
        super().__init__()
        self.H, self.W = image_size
        self.M = M
        self.mlp_1 = nn.Linear(4, C, bias=False)
        self.w_pe = nn.Linear(4, Cn, bias=False)
        self.LN = nn.LayerNorm([C])
        self.lx_former = OracleLXformer(C, Cn, M)
        self.gx_former = OracleGXformer(C, Cn, M)

    def forward(self, events):  # B x N x 4 (x, y, t, p)
        M = self.M
        lx_in = self.mlp_1(events)
        pe_raw = events.unsqueeze(2).repeat(1, 1, M, 1) - \
            oracle_select_nearest(events, M)
        pe = self.w_pe(pe_raw)
        lx_out = lx_in + self.lx_former(lx_in, lx_in, lx_in, pe)
        gx_out = lx_out + self.gx_former(lx_out)

        images = []
        for b in range(gx_out.shape[0]):
            feat = F.gelu(self.LN(gx_out[b]))
            ev = events[b]
            N, C = feat.shape
            img = torch.zeros(self.H, self.W, C)
            x = torch.floor(ev[:, 0]).long()
            y = torch.floor(ev[:, 1]).long()
            p = ev[:, 3]
            for c in range(C):
                img.index_put_(
                    [y, x, torch.full((N,), c, dtype=torch.long)],
                    p * feat[:, c], accumulate=True,
                )
            mask = torch.nonzero(img, as_tuple=True)
            if mask[0].numel() > 0:
                mean, std = img[mask].mean(), img[mask].std()
                img[mask] = (img[mask] - mean) / std if std > 0 else \
                    img[mask] - mean
            images.append(img)
        return torch.stack(images, 0).permute(0, 3, 1, 2)  # B C H W


class OracleRAFTGMA_rnn(nn.Module):
    """Reference RAFTGMA_rnn (gma_rnn.py:40-161): point-transformer
    segment images, context/attention from segment 0 once, per-segment
    corr volume, GRU state carried across segments, flow re-initialized
    at (i+1)/i of the previous segment's flow, predictions emitted only
    during the last segment's iterations."""

    def __init__(self, n_first_channels=5, image_size=(32, 48)):
        super().__init__()
        self.image_size = image_size
        self.ev_transformer = OracleEventTransformer(
            C=n_first_channels, Cn=n_first_channels * 2,
            image_size=image_size,
        )
        self.fnet = OracleBasicEncoder(256, "instance", n_first_channels)
        self.cnet = OracleBasicEncoder(256, "batch", n_first_channels)
        self.update_block = OracleGMAUpdateBlock()
        self.att = OracleGMAAttention()

    def forward(self, event_segments, iters=3):
        # event_segments: [B, S, N, 4]
        S = event_segments.shape[1]
        images = [self.ev_transformer(event_segments[:, s])
                  for s in range(S)]
        image1 = images[0]

        cnet = self.cnet(image1)
        net, inp = torch.split(cnet, [128, 128], dim=1)
        net, inp = torch.tanh(net), torch.relu(inp)
        attention = self.att(inp)

        N, _, Hp, Wp = image1.shape
        ys, xs = torch.meshgrid(
            torch.arange(Hp // 8), torch.arange(Wp // 8), indexing="ij"
        )
        coords0 = torch.stack([xs, ys], 0).float().unsqueeze(0).repeat(
            N, 1, 1, 1
        )

        preds = []
        flow_init = torch.zeros_like(coords0)
        f1 = self.fnet(image1)
        for s in range(1, S):
            f2 = self.fnet(images[s])
            corr_fn = OracleCorrBlock(f1, f2)
            coords1 = coords0 + flow_init
            for _ in range(iters):
                coords1 = coords1.detach()
                corr = corr_fn(coords1)
                flow = coords1 - coords0
                net, up_mask, delta = self.update_block(
                    net, inp, corr, flow, attention
                )
                coords1 = coords1 + delta
                if s == S - 1:
                    preds.append(
                        OracleERAFT.upsample_flow(coords1 - coords0, up_mask)
                    )
            flow_init = (coords1 - coords0) * (s + 1) / s
        return preds
