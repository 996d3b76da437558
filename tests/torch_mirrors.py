"""Torch oracles for checkpoint-parity tests.

Each builder constructs a PyTorch module whose *state-dict names and forward
semantics* equal the reference repo's models, assembled programmatically from
spec tables. Random-initialized instances stand in for real reference
checkpoints (which require VOCASET + GPU training): if conversion + the Flax
forward match these on random weights, they match the trained weights too.
"""

from __future__ import annotations

import torch
import torch.nn as nn

MLP_HEAD_DIMS = (72, 128, 50)


def _mlp_head(in_dim: int, n_verts: int) -> nn.Sequential:
    d0, d1, d2 = MLP_HEAD_DIMS
    return nn.Sequential(
        nn.Linear(in_dim, d0), nn.Linear(d0, d1), nn.Tanh(),
        nn.Linear(d1, d2), nn.Linear(d2, n_verts),
    )


def _conv_seq(specs) -> nn.Sequential:
    """specs: list of ('conv', in, out, k, s, p) / ('bn', ch) / ('relu',)."""
    layers = []
    for spec in specs:
        kind = spec[0]
        if kind == "conv":
            _, ci, co, k, s, p = spec
            layers.append(nn.Conv2d(ci, co, kernel_size=k, stride=s, padding=p))
        elif kind == "bn":
            layers.append(nn.BatchNorm2d(spec[1]))
        elif kind == "relu":
            layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class TorchAudio2Mesh(nn.Module):
    def __init__(self, n_verts: int, n_onehot: int):
        super().__init__()
        chans = [1, 72, 108, 162, 243, 256]
        analysis = []
        for ci, co in zip(chans[:-1], chans[1:]):
            analysis += [("conv", ci, co, (1, 3), (1, 2), (0, 1)), ("bn", co), ("relu",)]
        self.analysis_net = _conv_seq(analysis)
        c = ("conv", 256, 256, (3, 1), (2, 1), (1, 0))
        self.articulation_net = _conv_seq(
            [c, ("bn", 256), ("relu",)] * 3
            + [("bn", 256), c, ("relu",), ("bn", 256),
               ("conv", 256, 256, (4, 1), (4, 1), (0, 0)), ("relu",)]
        )
        self.output_net = _mlp_head(256 + n_onehot, n_verts)
        self.n_onehot = n_onehot

    def forward(self, x, one_hot, template):
        bs = x.size(0)
        onehot_img = one_hot.repeat(1, 32).view(bs, 1, -1, 32)
        h = torch.cat((x.unsqueeze(1), onehot_img), 2)
        h = self.articulation_net(self.analysis_net(h)).view(bs, -1)
        out = self.output_net(torch.cat((h, one_hot), 1))
        return out.view(bs, -1, 3) + template


class TorchVoca(nn.Module):
    def __init__(self, n_verts: int, n_onehot: int):
        super().__init__()
        chans = [37, 32, 32, 64, 64]
        specs = []
        for ci, co in zip(chans[:-1], chans[1:]):
            specs += [("conv", ci, co, (3, 1), (2, 1), (1, 0)), ("relu",)]
        self.time_conv = _conv_seq(specs)
        self.decoder = _mlp_head(64 + 8, n_verts)

    def forward(self, x, one_hot, template):
        bs = x.size(0)
        one_hot = one_hot[:, :8]
        onehot_img = one_hot.repeat(1, 16).view(bs, 1, -1, 16)
        h = torch.cat((x.unsqueeze(1), onehot_img), 2).permute(0, 2, 3, 1)
        h = self.time_conv(h)
        out = self.decoder(torch.cat([h.view(bs, -1), one_hot], 1))
        return out.view(bs, -1, 3) + template


class TorchSong2Face(nn.Module):
    def __init__(self, n_verts: int, n_onehot: int):
        super().__init__()
        enc = [(1, 72, 5, 2), (72, 108, 5, 2), (108, 162, 3, 1), (162, 243, 3, 1), (243, 256, 3, 1)]
        self.vocal_encoder_nn = nn.Sequential(*[
            _conv_seq([("conv", ci, co, (1, k), (1, 2), (0, p)), ("bn", co), ("relu",)])
            for ci, co, k, p in enc
        ])
        self.vocal_encoder_lstm1 = nn.LSTM(64, 256, 1, bidirectional=False, batch_first=True)
        self.vocal_encoder_lstm2 = nn.LSTM(256, 256, 1, bidirectional=False, batch_first=True)
        reg = [("conv", 256, 256, (3, 1), (2, 1), (1, 0)), ("bn", 256), ("relu",)]
        self.regression_net = nn.Sequential(
            _conv_seq(reg), _conv_seq(reg), _conv_seq(reg),
            _conv_seq([("conv", 256, 256, (3, 1), (2, 1), (0, 0)), ("relu",)]),
        )
        self.output_net = _mlp_head(256 + n_onehot, n_verts)

    def forward(self, x, one_hot, template):
        bs = x.size(0)
        onehot_img = one_hot.repeat(1, 32).view(bs, 1, -1, 32)
        h = torch.cat((x.unsqueeze(1), onehot_img), 2)
        h = self.vocal_encoder_nn(h).squeeze(3)
        h, _ = self.vocal_encoder_lstm1(h)
        h, _ = self.vocal_encoder_lstm2(h)
        h = torch.nn.functional.interpolate(h.unsqueeze(3), size=(32, 1), mode="bilinear")
        h = self.regression_net(h).squeeze(3).squeeze(2)
        out = self.output_net(torch.cat((h, one_hot), 1))
        return out.view(bs, -1, 3) + template
