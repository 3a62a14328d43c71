"""Shared helper: make the read-only reference repo importable for goldens.

Stubs the reference's uninstalled deps (thop, timm, pytorch_lightning, sru).
The sru stub is a faithful torch implementation of SRU v2.6 semantics
(matching ``rtfs_tpu.ops.sru``) so full-model goldens can run the reference
forward end-to-end.
"""

import sys
import types

REF = "/root/reference"


def stub_reference_deps():
    import torch

    if "thop" not in sys.modules:
        thop = types.ModuleType("thop")
        thop.profile = lambda m, inputs=None, verbose=False: (0.0, 0.0)
        sys.modules["thop"] = thop

    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        ml = types.ModuleType("timm.models")
        mll = types.ModuleType("timm.models.layers")

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()
                self.p = p

            def forward(self, x):
                return x  # eval-mode goldens only

        mll.DropPath = DropPath
        sys.modules.update(
            {"timm": timm, "timm.models": ml, "timm.models.layers": mll}
        )

    if "pytorch_lightning" not in sys.modules:
        ptl = types.ModuleType("pytorch_lightning")
        ptl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = ptl

    if "sru" not in sys.modules:
        sru_mod = types.ModuleType("sru")
        sru_mod.SRU = _make_torch_sru()
        sys.modules["sru"] = sru_mod

    if REF not in sys.path:
        sys.path.insert(0, REF)


def _make_torch_sru():
    """Torch SRU with v2.6 semantics and rtfs_tpu-compatible param shapes.

    Per layer: weight (d_in, dirs*k*H), weight_c (dirs, 2, H),
    bias (dirs, 2, H); recurrence per rtfs_tpu.ops.sru (gates read c_{t-1},
    highway from x or the 4th U chunk).
    """
    import torch

    class SRU(torch.nn.Module):
        def __init__(self, input_size, hidden_size, num_layers=2,
                     bidirectional=False, **kw):
            super().__init__()
            self.hidden_size = hidden_size
            self.num_layers = num_layers
            self.dirs = 2 if bidirectional else 1
            out = hidden_size * self.dirs
            d_in = input_size
            self.weights = torch.nn.ParameterList()
            self.weight_cs = torch.nn.ParameterList()
            self.biases = torch.nn.ParameterList()
            for _ in range(num_layers):
                k = 4 if d_in != out else 3
                bound = (3.0 / d_in) ** 0.5
                self.weights.append(torch.nn.Parameter(
                    torch.empty(d_in, self.dirs * k * hidden_size)
                    .uniform_(-bound, bound)))
                cb = (3.0 / hidden_size) ** 0.5
                self.weight_cs.append(torch.nn.Parameter(
                    torch.empty(self.dirs, 2, hidden_size).uniform_(-cb, cb)))
                b = torch.zeros(self.dirs, 2, hidden_size)
                b[:, 1] = -1.0  # highway_bias
                self.biases.append(torch.nn.Parameter(b))
                d_in = out

        def forward(self, x, state=None):
            # x: (L, B, D) — the reference feeds batch-second sequences.
            import torch

            h = x
            H = self.hidden_size
            out_dim = H * self.dirs
            for layer in range(self.num_layers):
                w = self.weights[layer]
                vc = self.weight_cs[layer]
                bias = self.biases[layer]
                d_in = h.shape[-1]
                k = 4 if d_in != out_dim else 3
                length, bsz = h.shape[0], h.shape[1]
                u = (h.reshape(-1, d_in) @ w).view(
                    length, bsz, self.dirs, k, H
                )
                outs = []
                for d in range(self.dirs):
                    order = (range(length) if d == 0
                             else range(length - 1, -1, -1))
                    c = torch.zeros(bsz, H, dtype=h.dtype)
                    hs = torch.zeros(length, bsz, H, dtype=h.dtype)
                    v_f, v_r = vc[d, 0], vc[d, 1]
                    b_f, b_r = bias[d, 0], bias[d, 1]
                    for t in order:
                        u_t = u[t, :, d]
                        f = torch.sigmoid(u_t[:, 1] + v_f * c + b_f)
                        c = f * c + (1 - f) * u_t[:, 0]
                        # sru-package semantics: reset gate reads the
                        # UPDATED cell c_t (code, not the paper's c_{t-1})
                        r = torch.sigmoid(u_t[:, 2] + v_r * c + b_r)
                        xhw = (u_t[:, 3] if k == 4
                               else h[t, :, d * H:(d + 1) * H])
                        hs[t] = r * c + (1 - r) * xhw
                    outs.append(hs)
                h = torch.cat(outs, dim=-1) if self.dirs > 1 else outs[0]
            return h, None

    return SRU
