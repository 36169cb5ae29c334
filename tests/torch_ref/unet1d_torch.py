"""Independent torch transcription of the diffusion-policy conditional UNet-1D
architecture (as documented in SURVEY.md §2.2 / conditional_unet_1D.py) used
purely as a parity oracle in tests.  Written from the architecture contract,
not copied: Conv1d+GroupNorm+Mish blocks, FiLM conditioning, stride-2
down/up-sampling, skip concatenation."""

import math

import torch
import torch.nn as nn


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, x):
        half = self.dim // 2
        freqs = torch.exp(
            torch.arange(half, device=x.device) * -(math.log(10000) / (half - 1))
        )
        args = x[:, None] * freqs[None, :]
        return torch.cat((args.sin(), args.cos()), dim=-1)


class Conv1dBlock(nn.Module):
    def __init__(self, cin, cout, k, n_groups=8):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv1d(cin, cout, k, padding=k // 2),
            nn.GroupNorm(n_groups, cout),
            nn.Mish(),
        )

    def forward(self, x):
        return self.block(x)


class CondResBlock(nn.Module):
    def __init__(self, cin, cout, cond_dim, k=3, n_groups=8):
        super().__init__()
        self.blocks = nn.ModuleList([
            Conv1dBlock(cin, cout, k, n_groups),
            Conv1dBlock(cout, cout, k, n_groups),
        ])
        self.out_channels = cout
        self.cond_encoder = nn.Sequential(
            nn.Mish(), nn.Linear(cond_dim, cout * 2), nn.Unflatten(-1, (-1, 1))
        )
        self.residual_conv = (
            nn.Conv1d(cin, cout, 1) if cin != cout else nn.Identity()
        )

    def forward(self, x, cond):
        out = self.blocks[0](x)
        embed = self.cond_encoder(cond).reshape(x.shape[0], 2, self.out_channels, 1)
        out = embed[:, 0] * out + embed[:, 1]
        out = self.blocks[1](out)
        return out + self.residual_conv(x)


class TorchConditionalUnet1D(nn.Module):
    def __init__(self, input_dim, global_cond_dim, dsed=256,
                 down_dims=(256, 512, 1024), kernel_size=5, n_groups=8):
        super().__init__()
        all_dims = [input_dim] + list(down_dims)
        self.diffusion_step_encoder = nn.Sequential(
            SinusoidalPosEmb(dsed),
            nn.Linear(dsed, dsed * 4), nn.Mish(), nn.Linear(dsed * 4, dsed),
        )
        cond_dim = dsed + global_cond_dim
        in_out = list(zip(all_dims[:-1], all_dims[1:]))
        mid = all_dims[-1]
        self.mid_modules = nn.ModuleList([
            CondResBlock(mid, mid, cond_dim, kernel_size, n_groups),
            CondResBlock(mid, mid, cond_dim, kernel_size, n_groups),
        ])
        self.down_modules = nn.ModuleList()
        for i, (ci, co) in enumerate(in_out):
            last = i >= len(in_out) - 1
            down = nn.Identity()
            if not last:
                down = nn.Module()
                down.conv = nn.Conv1d(co, co, 3, 2, 1)
                down.forward = lambda x, c=down: c.conv(x)
            self.down_modules.append(nn.ModuleList([
                CondResBlock(ci, co, cond_dim, kernel_size, n_groups),
                CondResBlock(co, co, cond_dim, kernel_size, n_groups),
                down,
            ]))
        self.up_modules = nn.ModuleList()
        for i, (ci, co) in enumerate(reversed(in_out[1:])):
            last = i >= len(in_out) - 1
            up = nn.Identity()
            if not last:
                up = nn.Module()
                up.conv = nn.ConvTranspose1d(ci, ci, 4, 2, 1)
                up.forward = lambda x, c=up: c.conv(x)
            self.up_modules.append(nn.ModuleList([
                CondResBlock(co * 2, ci, cond_dim, kernel_size, n_groups),
                CondResBlock(ci, ci, cond_dim, kernel_size, n_groups),
                up,
            ]))
        self.final_conv = nn.Sequential(
            Conv1dBlock(down_dims[0], down_dims[0], kernel_size),
            nn.Conv1d(down_dims[0], input_dim, 1),
        )

    def forward(self, sample, timestep, global_cond=None):
        x = sample.moveaxis(-1, -2)
        t = timestep.expand(x.shape[0])
        feat = self.diffusion_step_encoder(t)
        if global_cond is not None:
            feat = torch.cat([feat, global_cond], dim=-1)
        skips = []
        for res1, res2, down in self.down_modules:
            x = res2(res1(x, feat), feat)
            skips.append(x)
            x = down(x) if not isinstance(down, nn.Identity) else x
        for m in self.mid_modules:
            x = m(x, feat)
        for res1, res2, up in self.up_modules:
            x = torch.cat((x, skips.pop()), dim=1)
            x = res2(res1(x, feat), feat)
            x = up(x) if not isinstance(up, nn.Identity) else x
        return self.final_conv(x).moveaxis(-1, -2)
