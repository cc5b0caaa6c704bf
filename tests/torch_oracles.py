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
