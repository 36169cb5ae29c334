"""Independent torch transcription of the RDT architecture (DiT-style blocks
with alternating cross-attention, as documented in SURVEY.md §2.1) used as a
parity oracle at tiny scale.  Reuses the attention oracles from
test_nn_ops."""

import math
from collections import OrderedDict

import numpy as np
import torch
import torch.nn as nn

from vla_touch_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_multimodal_cond_pos_embed,
)


class TimestepEmbedder(nn.Module):
    def __init__(self, hidden, freq_dim=256):
        super().__init__()
        self.mlp = nn.Sequential(
            nn.Linear(freq_dim, hidden), nn.SiLU(), nn.Linear(hidden, hidden))
        self.freq_dim = freq_dim

    def forward(self, t):
        half = self.freq_dim // 2
        freqs = torch.exp(
            -math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
        args = t[:, None].float() * freqs[None]
        emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
        return self.mlp(emb)


class Attention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h, self.d = heads, dim // heads
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.q_norm = nn.RMSNorm(self.d, eps=1e-6)
        self.k_norm = nn.RMSNorm(self.d, eps=1e-6)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.h, self.d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        a = (q * self.d**-0.5) @ k.transpose(-2, -1)
        x = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class CrossAttention(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.h, self.d = heads, dim // heads
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.q_norm = nn.RMSNorm(self.d, eps=1e-6)
        self.k_norm = nn.RMSNorm(self.d, eps=1e-6)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, c, mask=None):
        B, N, C = x.shape
        L = c.shape[1]
        q = self.q(x).reshape(B, N, self.h, self.d).permute(0, 2, 1, 3)
        kv = self.kv(c).reshape(B, L, 2, self.h, self.d).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        a = (q * self.d**-0.5) @ k.transpose(-2, -1)
        if mask is not None:
            a = a.masked_fill(~mask.reshape(B, 1, 1, L), float("-inf"))
        x = (a.softmax(-1) @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Mlp(nn.Module):
    def __init__(self, dim, hidden, out=None):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, out or dim)
        self.act = nn.GELU(approximate="tanh")

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class RDTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.RMSNorm(dim, eps=1e-6)
        self.attn = Attention(dim, heads)
        self.cross_attn = CrossAttention(dim, heads)
        self.norm2 = nn.RMSNorm(dim, eps=1e-6)
        self.ffn = Mlp(dim, dim)
        self.norm3 = nn.RMSNorm(dim, eps=1e-6)

    def forward(self, x, c, mask=None):
        x = x + self.attn(self.norm1(x))
        x = x + self.cross_attn(self.norm2(x), c, mask)
        x = x + self.ffn(self.norm3(x))
        return x


class TorchRDT(nn.Module):
    def __init__(self, output_dim, horizon, hidden, depth, heads,
                 max_lang_len, img_cond_len):
        super().__init__()
        self.horizon = horizon
        self.t_embedder = TimestepEmbedder(hidden)
        self.freq_embedder = TimestepEmbedder(hidden)
        x_pos = get_multimodal_cond_pos_embed(
            hidden, OrderedDict([("timestep", 1), ("ctrl_freq", 1),
                                 ("state", 1), ("action", horizon)]))
        lang_pos = get_multimodal_cond_pos_embed(
            hidden, OrderedDict([("lang", -max_lang_len)]), embed_modality=False)
        img_pos = get_1d_sincos_pos_embed_from_grid(
            hidden, np.arange(img_cond_len))
        self.x_pos_embed = nn.Parameter(torch.from_numpy(x_pos).float()[None])
        self.lang_cond_pos_embed = nn.Parameter(
            torch.from_numpy(lang_pos).float()[None])
        self.img_cond_pos_embed = nn.Parameter(
            torch.from_numpy(img_pos).float()[None])
        self.blocks = nn.ModuleList([RDTBlock(hidden, heads)
                                     for _ in range(depth)])
        # Reference naming: FinalLayer submodule with norm_final/ffn_final
        # (model.py:186-202) -> state-dict keys final_layer.norm_final.* etc.
        self.final_layer = nn.Module()
        self.final_layer.norm_final = nn.RMSNorm(hidden, eps=1e-6)
        self.final_layer.ffn_final = Mlp(hidden, hidden, output_dim)

    def forward(self, x, freq, t, lang_c, img_c, lang_mask=None):
        t_tok = self.t_embedder(t).unsqueeze(1)
        f_tok = self.freq_embedder(freq).unsqueeze(1)
        x = torch.cat([t_tok, f_tok, x], dim=1) + self.x_pos_embed
        lang_c = lang_c + self.lang_cond_pos_embed[:, : lang_c.shape[1]]
        img_c = img_c + self.img_cond_pos_embed
        conds, masks = [lang_c, img_c], [lang_mask, None]
        for i, blk in enumerate(self.blocks):
            x = blk(x, conds[i % 2], masks[i % 2])
        x = self.final_layer.ffn_final(self.final_layer.norm_final(x))
        return x[:, -self.horizon:]


class TorchAdapter(nn.Module):
    def __init__(self, kind, din, dout):
        super().__init__()
        if kind == "linear":
            self.net = nn.Linear(din, dout)
        else:
            import re
            depth = int(re.match(r"^mlp(\d+)x_gelu$", kind).group(1))
            mods = [nn.Linear(din, dout)]
            for _ in range(1, depth):
                mods += [nn.GELU(approximate="tanh"), nn.Linear(dout, dout)]
            self.net = nn.Sequential(*mods)

    def forward(self, x):
        return self.net(x)
