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


class TorchFaceFormer(nn.Module):
    """Oracle for the reference FaceFormer forward (src/model/faceformer.py:
    91-188): HF wav2vec2 + 50fps->frame_num interp, then the naive
    autoregressive loop that re-decodes the full prefix each frame through a
    torch TransformerDecoder with the precomputed biased mask and diagonal
    cross mask. Deliberately the O(T^2)-recompute formulation — the Flax scan
    must match it exactly."""

    def __init__(
        self,
        n_verts: int,
        n_onehot: int,
        max_seq_len: int = 600,
        dataset: str = "vocaset",
        period: int = 60,
    ):
        super().__init__()
        from transformers import Wav2Vec2Config as HFConfig
        from transformers.models.wav2vec2.modeling_wav2vec2 import Wav2Vec2Model as HFModel

        self.feature_dim = 64
        self.period = period
        self.dataset = dataset  # "vocaset" | "BIWI" (reference spelling)
        self.vertice_dim = n_verts
        self.audio_encoder = HFModel(HFConfig(do_stable_layer_norm=False, feat_extract_norm="group"))
        self.audio_feature_map = nn.Linear(768, 64)
        self.vertice_map = nn.Linear(n_verts, 64)
        self.vertice_map_r = nn.Linear(64, n_verts)
        self.obj_vector = nn.Linear(n_onehot, 64, bias=False)
        dec_layer = nn.TransformerDecoderLayer(
            d_model=64, nhead=4, dim_feedforward=128, batch_first=True
        )
        self.transformer_decoder = nn.TransformerDecoder(dec_layer, num_layers=1)
        self.max_seq_len = max_seq_len

        # precomputed biased causal mask, reference semantics
        from audio2face_tpu.ops.attention import alibi_slopes
        import numpy as _np

        slopes = torch.as_tensor(_np.asarray(alibi_slopes(4)))
        i = torch.arange(max_seq_len)[:, None]
        j = torch.arange(max_seq_len)[None, :]
        alibi = torch.where(j <= i, -torch.div(i - j, self.period, rounding_mode="floor").float(), torch.zeros(()))
        causal = torch.where(j <= i, torch.zeros(()), torch.full((), float("-inf")))
        self.register_buffer("biased_mask", slopes[:, None, None] * alibi[None] + causal[None])

        pe = torch.zeros(self.period, 64)
        position = torch.arange(0, self.period, dtype=torch.float).unsqueeze(1)
        import math as _math

        div_term = torch.exp(torch.arange(0, 64, 2).float() * (-_math.log(10000.0) / 64))
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("ppe", pe)

    def _ppe(self, x):
        t = x.shape[1]
        reps = (t + self.period - 1) // self.period
        table = self.ppe.repeat(reps, 1)[:t]
        return x + table.unsqueeze(0)

    def forward(self, audio, one_hot, template):
        fps = 25 if self.dataset == "BIWI" else 60
        frame_num = audio.shape[1] * fps // 16000
        # processor zero-mean unit-var normalization
        audio = (audio - audio.mean(dim=1, keepdim=True)) / torch.sqrt(
            audio.var(dim=1, unbiased=False, keepdim=True) + 1e-7
        )
        template = template.reshape(1, 1, -1)

        h = self.audio_encoder.feature_extractor(audio).transpose(1, 2)
        if self.dataset == "BIWI":
            # reference trim branch (src/model/wav2vec.py:119-124)
            if h.shape[1] % 2 != 0:
                h = h[:, :-1]
            if h.shape[1] > frame_num * 2:
                h = h[:, : frame_num * 2]
        else:
            h = nn.functional.interpolate(
                h.transpose(1, 2), size=frame_num, align_corners=True, mode="linear"
            ).transpose(1, 2)
        h, _ = self.audio_encoder.feature_projection(h)
        hidden_states = self.audio_encoder.encoder(h).last_hidden_state
        hidden_states = self.audio_feature_map(hidden_states)

        obj_embedding = self.obj_vector(one_hot)
        for i in range(frame_num):
            if i == 0:
                vertice_emb = obj_embedding.unsqueeze(1)
                style_emb = vertice_emb
                vertice_input = self._ppe(style_emb)
            else:
                vertice_input = self._ppe(vertice_emb)
            t = vertice_input.shape[1]
            tgt_mask = self.biased_mask[:, :t, :t]
            memory_mask = torch.ones(t, hidden_states.shape[1], dtype=torch.bool)
            for r in range(t):
                if self.dataset == "BIWI":
                    # enc_dec_mask BIWI arm (faceformer.py:60-62)
                    memory_mask[r, 2 * r : 2 * r + 2] = False
                else:
                    memory_mask[r, r] = False
            out = self.transformer_decoder(
                vertice_input, hidden_states, tgt_mask=tgt_mask, memory_mask=memory_mask
            )
            vertice_out = self.vertice_map_r(out)
            new_output = self.vertice_map(vertice_out[:, -1, :]).unsqueeze(1) + style_emb
            vertice_emb = torch.cat((vertice_emb, new_output), 1)

        vertice_out = vertice_out + template
        return vertice_out.view(1, frame_num, -1, 3)


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
