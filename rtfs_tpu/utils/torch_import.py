"""PyTorch checkpoint import: reference weights → rtfs_tpu flax variables.

The reference ships a frozen pretrained lip backbone
(``frcnn_128_512.backbone.pth.tar``; loaded at
``src/models/videomodels/frcnn_videomodel.py:74-76`` with ``tcn.*`` keys
skipped). This module converts such torch state_dicts into our channels-last
flax variable trees.

Weight layout translations:
- Conv2d/3d ``(Cout, Cin/g, *k)`` → ``(*k, Cin/g, Cout)``
- Linear ``(Cout, Cin)`` → ``(Cin, Cout)``
- BatchNorm weight/bias/running_mean/running_var → scale/bias (params) +
  mean/var (batch_stats)
- PReLU weight (C,) → alpha (C,)
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_w(w) -> np.ndarray:
    w = np.asarray(w)
    nd = w.ndim - 2
    return np.transpose(w, tuple(range(2, 2 + nd)) + (1, 0))


def convert_frcnn_video(
    state_dict: Dict[str, Any], backbone_type: str = "resnet"
) -> Dict[str, Any]:
    """Reference FRCNNVideoModel state_dict → flax variables.

    Handles the published checkpoint layout: ``frontend3D.{0,1}.*`` +
    ``trunk.layer{1..4}.{0,1}.*`` (ResNet-18 BasicBlocks with optional
    ``downsample``). ``tcn.*`` keys are ignored (reference
    ``frcnn_videomodel.py:103-110``).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items() if "tcn" not in k}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    def map_bn(tname, fprefix_params, fprefix_stats):
        put(params, fprefix_params + ["scale"], sd[f"{tname}.weight"])
        put(params, fprefix_params + ["bias"], sd[f"{tname}.bias"])
        put(stats, fprefix_stats + ["mean"], sd[f"{tname}.running_mean"])
        put(stats, fprefix_stats + ["var"], sd[f"{tname}.running_var"])

    def map_convbn_seq(tconv, tbn, fprefix):
        """torch [Conv, BN] pair at explicit keys -> a flax _ConvBN."""
        put(params, fprefix + ["Conv_0", "kernel"], _conv_w(sd[tconv]))
        map_bn(tbn, fprefix + ["BatchNorm_0", "BatchNorm_0"],
               fprefix + ["BatchNorm_0", "BatchNorm_0"])

    if backbone_type == "shufflenet":
        # frontend (same layout as resnet: Conv3d + BN3d + PReLU)
        put(params, ["frontend_conv"], _conv_w(sd["frontend3D.0.weight"]))
        map_bn("frontend3D.1", ["BatchNorm_0", "BatchNorm_0"],
               ["BatchNorm_0", "BatchNorm_0"])
        if "frontend3D.2.weight" in sd:
            put(params, ["ChannelPReLU_0", "alpha"], sd["frontend3D.2.weight"])
        trunk = ["ShuffleNetV2Trunk_0"]
        # reference trunk = Sequential(features, conv_last, globalpool):
        # keys trunk.0.{i}.banch*, trunk.1.*
        i = 0
        while f"trunk.0.{i}.banch2.0.weight" in sd:
            f = trunk + [f"InvertedResidual_{i}"]
            t = f"trunk.0.{i}"
            cb = 0
            if f"{t}.banch1.0.weight" in sd:  # benchmodel 2 (strided)
                # banch1: [dw conv, bn, pw conv, bn, relu]
                for slot in (0, 2):
                    map_convbn_seq(f"{t}.banch1.{slot}.weight",
                                   f"{t}.banch1.{slot+1}",
                                   f + [f"_ConvBN_{cb}"])
                    cb += 1
            # banch2: [pw, bn, relu, dw, bn, pw, bn, relu]
            for slot in (0, 3, 5):
                map_convbn_seq(f"{t}.banch2.{slot}.weight",
                               f"{t}.banch2.{slot+1}",
                               f + [f"_ConvBN_{cb}"])
                cb += 1
            i += 1
        map_convbn_seq("trunk.1.0.weight", "trunk.1.1",
                       trunk + ["_ConvBN_0"])
        return {"params": params, "batch_stats": stats}

    if backbone_type != "resnet":
        raise NotImplementedError(f"unknown backbone {backbone_type}")

    # frontend: Conv3d + BN3d + PReLU
    put(params, ["frontend_conv"], _conv_w(sd["frontend3D.0.weight"]))
    map_bn("frontend3D.1",
           ["BatchNorm_0", "BatchNorm_0"], ["BatchNorm_0", "BatchNorm_0"])
    if "frontend3D.2.weight" in sd:
        put(params, ["ChannelPReLU_0", "alpha"], sd["frontend3D.2.weight"])

    # ResNet trunk: layer1..4 × blocks 0..1
    blk = 0
    for layer_i in range(1, 5):
        for block_i in range(2):
            t = f"trunk.layer{layer_i}.{block_i}"
            f = ["ResNetTrunk_0", f"BasicBlock_{blk}"]
            put(params, f + ["Conv_0", "kernel"], _conv_w(sd[f"{t}.conv1.weight"]))
            map_bn(f"{t}.bn1", f + ["BatchNorm_0", "BatchNorm_0"],
                   f + ["BatchNorm_0", "BatchNorm_0"])
            if f"{t}.relu1.weight" in sd:
                put(params, f + ["ChannelPReLU_0", "alpha"],
                    sd[f"{t}.relu1.weight"])
            put(params, f + ["Conv_1", "kernel"], _conv_w(sd[f"{t}.conv2.weight"]))
            map_bn(f"{t}.bn2", f + ["BatchNorm_1", "BatchNorm_0"],
                   f + ["BatchNorm_1", "BatchNorm_0"])
            if f"{t}.downsample.0.weight" in sd:
                put(params, f + ["_ConvBN_0", "Conv_0", "kernel"],
                    _conv_w(sd[f"{t}.downsample.0.weight"]))
                map_bn(f"{t}.downsample.1",
                       f + ["_ConvBN_0", "BatchNorm_0", "BatchNorm_0"],
                       f + ["_ConvBN_0", "BatchNorm_0", "BatchNorm_0"])
            if f"{t}.relu2.weight" in sd:
                put(params, f + ["ChannelPReLU_1", "alpha"],
                    sd[f"{t}.relu2.weight"])
            blk += 1

    return {"params": params, "batch_stats": stats}


def load_frcnn_checkpoint(path: str, backbone_type: str = "resnet"):
    """Load a reference ``.pth.tar`` backbone checkpoint into flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_frcnn_video(sd, backbone_type)


# ---------------------------------------------------------------------------
# Full AVNet state_dict conversion
# ---------------------------------------------------------------------------
#
# Maps a reference AVNet torch state_dict (``src/models/tdavnet.py``) onto
# rtfs_tpu's flax variable tree. Used for (a) serving reference-trained
# checkpoints and (b) the full-model golden parity tests.


class _TreeBuilder:
    def __init__(self, sd):
        self.sd = sd
        self.params = {}
        self.stats = {}
        self.used = set()

    def t(self, key):
        self.used.add(key)
        return self.sd[key]

    def has(self, key):
        return key in self.sd

    def put_p(self, path, value):
        _put(self.params, path, np.asarray(value))

    def put_s(self, path, value):
        _put(self.stats, path, np.asarray(value))


def _put(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_norm_act(tb: _TreeBuilder, f, t):
    """ConvNormAct: torch ``full_layer.{0..4}`` -> flax children.

    Norm/act child indices on the flax side follow creation order (pre
    before post); which slots exist is read off the torch keys.
    """
    norm_i = {"GlobalLayerNorm": 0, "BatchNorm": 0, "LayerNorm": 0}
    prelu_i = 0

    def map_norm(tslot, pre):
        nonlocal norm_i
        if tb.has(f"{t}.full_layer.{tslot}.norm.weight"):  # gLN
            name = f"GlobalLayerNorm_{norm_i['GlobalLayerNorm']}"
            norm_i["GlobalLayerNorm"] += 1
            tb.put_p(f + [name, "scale"], tb.t(f"{t}.full_layer.{tslot}.norm.weight"))
            tb.put_p(f + [name, "bias"], tb.t(f"{t}.full_layer.{tslot}.norm.bias"))
        elif tb.has(f"{t}.full_layer.{tslot}.running_mean"):  # BatchNorm
            name = f"BatchNorm_{norm_i['BatchNorm']}"
            norm_i["BatchNorm"] += 1
            tb.put_p(f + [name, "BatchNorm_0", "scale"],
                     tb.t(f"{t}.full_layer.{tslot}.weight"))
            tb.put_p(f + [name, "BatchNorm_0", "bias"],
                     tb.t(f"{t}.full_layer.{tslot}.bias"))
            tb.put_s(f + [name, "BatchNorm_0", "mean"],
                     tb.t(f"{t}.full_layer.{tslot}.running_mean"))
            tb.put_s(f + [name, "BatchNorm_0", "var"],
                     tb.t(f"{t}.full_layer.{tslot}.running_var"))

    def map_prelu(tslot):
        nonlocal prelu_i
        key = f"{t}.full_layer.{tslot}.weight"
        if tb.has(key) and tb.sd[key].ndim == 1 and tb.sd[key].shape[0] == 1:
            tb.put_p(f + [f"PReLU_{prelu_i}", "alpha"], tb.t(key))
            prelu_i += 1

    map_norm(0, pre=True)
    map_prelu(1)
    if tb.has(f"{t}.full_layer.2.weight"):
        tb.put_p(f + ["Conv_0", "kernel"], _conv_w(tb.t(f"{t}.full_layer.2.weight")))
        if tb.has(f"{t}.full_layer.2.bias"):
            tb.put_p(f + ["Conv_0", "bias"], tb.t(f"{t}.full_layer.2.bias"))
    map_norm(3, pre=False)
    map_prelu(4)


def _injection(tb, f, t):
    for i, name in enumerate(("local_embedding", "global_embedding", "global_gate")):
        _conv_norm_act(tb, f + [f"ConvNormAct_{i}"], f"{t}.{name}")


def _ln4d(tb, f, t, per_channel):
    """LayerNormalization4D: torch gamma (1,C,1,F) -> flax (1,1,F,C)."""
    g = np.asarray(tb.t(f"{t}.gamma"))
    b = np.asarray(tb.t(f"{t}.beta"))
    if per_channel:  # (1,C,1,1) -> (1,1,1,C)
        tb.put_p(f + ["scale"], g.transpose(0, 2, 3, 1))
        tb.put_p(f + ["bias"], b.transpose(0, 2, 3, 1))
    else:  # (1,C,1,F) -> (1,1,F,C)
        tb.put_p(f + ["scale"], g.transpose(0, 2, 3, 1))
        tb.put_p(f + ["bias"], b.transpose(0, 2, 3, 1))


def convert_sru_packed(w, wc, bias, dirs=2):
    """Translate one REAL ``sru``-package (v2.6) SRUCell layer to rtfs layout.

    Package layout (sru/modules.py SRUCell; column order established by the
    CUDA kernel's ``u + col*k`` pointer arithmetic — k innermost per hidden
    unit, units per direction, forward direction first):
      weight   (d_in, dirs*hidden*k)  -- [dir][unit][k] column order
      weight_c (2*dirs*hidden,)       -- [v_f (dirs*hidden); v_r (...)]
      bias     (2*dirs*hidden,)       -- [b_f; b_r(init=highway_bias)]
    rtfs_tpu layout:
      weight (d_in, dirs*k*hidden)    -- [dir][k][unit] column order
      weight_c / bias (dirs, 2, hidden)

    Validated against an independent numpy transcription of the package's
    recurrence + layouts in ``tests/test_sru_semantics.py``; re-verify
    against a live sru install with ``tools/validate_sru_import.py``.
    """
    d_in = w.shape[0]
    out2 = wc.shape[0] // 2  # dirs*hidden
    k = w.shape[1] // out2
    hidden = out2 // dirs
    w = w.reshape(d_in, dirs, hidden, k).transpose(0, 1, 3, 2)
    w = w.reshape(d_in, dirs * k * hidden)
    wc = wc.reshape(2, dirs, hidden).transpose(1, 0, 2)
    bias = bias.reshape(2, dirs, hidden).transpose(1, 0, 2)
    return w, wc, bias


def _dual_path_rnn(tb, f, t, num_layers):
    _ln4d(tb, f + ["LayerNormalization4D_0"], f"{t}.norm", per_channel=True)
    for l in range(num_layers):
        if tb.has(f"{t}.rnn.weights.{l}"):
            # rtfs_tpu-native export layout (also used by the test stub)
            tb.put_p(f + ["SRU_0", f"weight_{l}"], tb.t(f"{t}.rnn.weights.{l}"))
            tb.put_p(f + ["SRU_0", f"weight_c_{l}"],
                     tb.t(f"{t}.rnn.weight_cs.{l}"))
            tb.put_p(f + ["SRU_0", f"bias_{l}"], tb.t(f"{t}.rnn.biases.{l}"))
        elif tb.has(f"{t}.rnn.rnn_lst.{l}.weight"):
            w, wc, bias = convert_sru_packed(
                np.asarray(tb.t(f"{t}.rnn.rnn_lst.{l}.weight")),
                np.asarray(tb.t(f"{t}.rnn.rnn_lst.{l}.weight_c")),
                np.asarray(tb.t(f"{t}.rnn.rnn_lst.{l}.bias")),
                # reference DualPathRNN always builds bidirectional SRUs
                dirs=2,
            )
            tb.put_p(f + ["SRU_0", f"weight_{l}"], w)
            tb.put_p(f + ["SRU_0", f"weight_c_{l}"], wc)
            tb.put_p(f + ["SRU_0", f"bias_{l}"], bias)
        else:
            raise KeyError(f"no SRU params found under {t}.rnn (layer {l})")
    # ConvTranspose1d (Cin=rnn_out, Cout, k) -> (k, Cout, Cin)
    w = np.asarray(tb.t(f"{t}.linear.weight"))
    tb.put_p(f + ["ConvTranspose_0", "kernel"], w.transpose(2, 1, 0))
    tb.put_p(f + ["ConvTranspose_0", "bias"], tb.t(f"{t}.linear.bias"))


def _mhsa2d(tb, f, t, n_head):
    def pack(tname, fconv, fprelu, fln):
        ws, bs, alphas, gammas, betas = [], [], [], [], []
        for h in range(n_head):
            ws.append(_conv_w(tb.t(f"{t}.{tname}.{h}.conv.weight")))
            bs.append(np.asarray(tb.t(f"{t}.{tname}.{h}.conv.bias")))
            alphas.append(np.asarray(tb.t(f"{t}.{tname}.{h}.act.weight")))
            g = np.asarray(tb.t(f"{t}.{tname}.{h}.norm.gamma"))  # (1,E,1,F)
            b = np.asarray(tb.t(f"{t}.{tname}.{h}.norm.beta"))
            gammas.append(g[0].transpose(1, 2, 0))  # (1,F,E)
            betas.append(b[0].transpose(1, 2, 0))
        tb.put_p(f + [fconv, "kernel"], np.concatenate(ws, axis=-1))
        tb.put_p(f + [fconv, "bias"], np.concatenate(bs, axis=-1))
        tb.put_p(f + [fprelu], np.stack(alphas)[:, :, None, None])  # (nh,1,1,1)
        tb.put_p(f + [fln + "_scale"], np.stack(gammas))  # (nh,1,F,E)
        tb.put_p(f + [fln + "_bias"], np.stack(betas))

    pack("Queries", "Conv_0", "q_prelu", "q_ln")
    pack("Keys", "Conv_1", "k_prelu", "k_ln")
    pack("Values", "Conv_2", "v_prelu", "v_ln")
    tb.put_p(f + ["Conv_3", "kernel"], _conv_w(tb.t(f"{t}.attn_concat_proj.conv.weight")))
    tb.put_p(f + ["Conv_3", "bias"], tb.t(f"{t}.attn_concat_proj.conv.bias"))
    tb.put_p(f + ["PReLU_0", "alpha"], tb.t(f"{t}.attn_concat_proj.act.weight"))
    _ln4d(tb, f + ["LayerNormalization4D_0"], f"{t}.attn_concat_proj.norm",
          per_channel=False)


def _torch_mha(tb, f, t):
    tb.put_p(f + ["in_proj_weight"], np.asarray(tb.t(f"{t}.in_proj_weight")).T)
    tb.put_p(f + ["in_proj_bias"], tb.t(f"{t}.in_proj_bias"))
    tb.put_p(f + ["out_proj_weight"], np.asarray(tb.t(f"{t}.out_proj.weight")).T)
    tb.put_p(f + ["out_proj_bias"], tb.t(f"{t}.out_proj.bias"))


def _mhsa1d(tb, f, t):
    tb.put_p(f + ["LayerNorm_0", "scale"], tb.t(f"{t}.norm1.weight"))
    tb.put_p(f + ["LayerNorm_0", "bias"], tb.t(f"{t}.norm1.bias"))
    _torch_mha(tb, f + ["TorchMHA_0"], f"{t}.attention")
    tb.put_p(f + ["LayerNorm_1", "scale"], tb.t(f"{t}.norm2.weight"))
    tb.put_p(f + ["LayerNorm_1", "bias"], tb.t(f"{t}.norm2.bias"))


def _ffn(tb, f, t):
    _conv_norm_act(tb, f + ["ConvNormAct_0"], f"{t}.encoder")
    _conv_norm_act(tb, f + ["ConvNormAct_1"], f"{t}.refiner")
    _conv_norm_act(tb, f + ["ConvNormAct_2"], f"{t}.decoder")


def _global_attention(tb, f, t):
    _mhsa1d(tb, f + ["MultiHeadSelfAttention_0"], f"{t}.MHSA")
    _ffn(tb, f + ["FeedForwardNetwork_0"], f"{t}.FFN")


def _rnn_params(tb, f, t):
    """torch nn.LSTM/GRU -> flax ops.rnn.RNN param names (transposed)."""
    layer = 0
    while tb.has(f"{t}.weight_ih_l{layer}"):
        for d in ("", "_reverse"):
            sfx = f"l{layer}{d}"
            if not tb.has(f"{t}.weight_ih_{sfx}"):
                continue
            tb.put_p(f + [f"weight_ih_{sfx}"],
                     np.asarray(tb.t(f"{t}.weight_ih_{sfx}")).T)
            tb.put_p(f + [f"weight_hh_{sfx}"],
                     np.asarray(tb.t(f"{t}.weight_hh_{sfx}")).T)
            tb.put_p(f + [f"bias_ih_{sfx}"], tb.t(f"{t}.bias_ih_{sfx}"))
            tb.put_p(f + [f"bias_hh_{sfx}"], tb.t(f"{t}.bias_hh_{sfx}"))
        layer += 1


def _rnn_projection(tb, f, t):
    """RNNProjection: LN -> RNN -> PReLU+Linear -> LN (rnn_layers.py:12-59)."""
    tb.put_p(f + ["LayerNorm_0", "scale"], tb.t(f"{t}.norm1.weight"))
    tb.put_p(f + ["LayerNorm_0", "bias"], tb.t(f"{t}.norm1.bias"))
    _rnn_params(tb, f + ["RNN_0"], f"{t}.rnn")
    tb.put_p(f + ["PReLU_0", "alpha"], tb.t(f"{t}.proj.0.weight"))
    tb.put_p(f + ["Dense_0", "kernel"], np.asarray(tb.t(f"{t}.proj.2.weight")).T)
    tb.put_p(f + ["Dense_0", "bias"], tb.t(f"{t}.proj.2.bias"))
    tb.put_p(f + ["LayerNorm_1", "scale"], tb.t(f"{t}.norm2.weight"))
    tb.put_p(f + ["LayerNorm_1", "bias"], tb.t(f"{t}.norm2.bias"))


def _global_attention2d(tb, f, t, layer_conf):
    """GlobalAttention2D (reference attention.py:223-280).

    Flax auto-indices follow creation order inside the compact body:
    MHSA_0=time, then time FFN (single_ffn), then the SHARED group FFN
    (group_ffn), then MHSA_1=freq, then freq FFN.
    """
    single = layer_conf.get("single_ffn", True)
    group = layer_conf.get("group_ffn", False)
    ffn_i = 0
    _mhsa1d(tb, f + ["MultiHeadSelfAttention_0"], f"{t}.time_MHSA")
    if single:
        _ffn(tb, f + [f"FeedForwardNetwork_{ffn_i}"], f"{t}.time_FFN")
        ffn_i += 1
    if group:
        _ffn(tb, f + [f"FeedForwardNetwork_{ffn_i}"], f"{t}.group_FFN")
        ffn_i += 1
    _mhsa1d(tb, f + ["MultiHeadSelfAttention_1"], f"{t}.freq_MHSA")
    if single:
        _ffn(tb, f + [f"FeedForwardNetwork_{ffn_i}"], f"{t}.freq_FFN")


def _cbam(tb, f, t):
    """CBAMBlock: SE convs (shared over max/avg) + spatial conv."""
    tb.put_p(f + ["Conv_0", "kernel"], _conv_w(tb.t(f"{t}.ca.se.0.weight")))
    tb.put_p(f + ["Conv_1", "kernel"], _conv_w(tb.t(f"{t}.ca.se.2.weight")))
    tb.put_p(f + ["Conv_2", "kernel"], _conv_w(tb.t(f"{t}.sa.conv.weight")))
    tb.put_p(f + ["Conv_2", "bias"], tb.t(f"{t}.sa.conv.bias"))


def _shuffle_attention(tb, f, t):
    for name in ("cweight", "cbias", "sweight", "sbias"):
        tb.put_p(f + [name], np.asarray(tb.t(f"{t}.{name}")).reshape(-1))
    tb.put_p(f + ["gn_scale"], tb.t(f"{t}.gn.weight"))
    tb.put_p(f + ["gn_bias"], tb.t(f"{t}.gn.bias"))


def _cot_attention(tb, f, t):
    def bn(fname, tname):
        tb.put_p(f + [fname, "BatchNorm_0", "scale"], tb.t(f"{tname}.weight"))
        tb.put_p(f + [fname, "BatchNorm_0", "bias"], tb.t(f"{tname}.bias"))
        tb.put_s(f + [fname, "BatchNorm_0", "mean"],
                 tb.t(f"{tname}.running_mean"))
        tb.put_s(f + [fname, "BatchNorm_0", "var"],
                 tb.t(f"{tname}.running_var"))

    tb.put_p(f + ["Conv_0", "kernel"], _conv_w(tb.t(f"{t}.key_embed.0.weight")))
    bn("BatchNorm_0", f"{t}.key_embed.1")
    tb.put_p(f + ["Conv_1", "kernel"],
             _conv_w(tb.t(f"{t}.value_embed.0.weight")))
    bn("BatchNorm_1", f"{t}.value_embed.1")
    tb.put_p(f + ["Conv_2", "kernel"],
             _conv_w(tb.t(f"{t}.attention_embed.0.weight")))
    bn("BatchNorm_2", f"{t}.attention_embed.1")
    tb.put_p(f + ["Conv_3", "kernel"],
             _conv_w(tb.t(f"{t}.attention_embed.3.weight")))
    tb.put_p(f + ["Conv_3", "bias"], tb.t(f"{t}.attention_embed.3.bias"))


def _globalatt_layer(tb, f, t, layer_conf):
    lt = layer_conf["layer_type"]
    if lt == "DualPathRNN":
        _dual_path_rnn(tb, f, t, layer_conf.get("num_layers", 1))
    elif lt == "MultiHeadSelfAttention2D":
        _mhsa2d(tb, f, t, layer_conf.get("n_head", 4))
    elif lt == "GlobalAttention":
        _global_attention(tb, f, t)
    elif lt == "GlobalAttention2D":
        _global_attention2d(tb, f, t, layer_conf)
    elif lt == "GlobalAttentionRNN":
        _rnn_projection(tb, f + ["RNNProjection_0"], f"{t}.RNN")
    elif lt == "CBAMBlock":
        _cbam(tb, f, t)
    elif lt == "ShuffleAttention":
        _shuffle_attention(tb, f, t)
    elif lt == "CoTAttention":
        _cot_attention(tb, f, t)
    else:
        raise NotImplementedError(f"import of layer {lt}")


def _frcnn_block(tb, f, t, params):
    depth = params.get("upsampling_depth", 4)
    _conv_norm_act(tb, f + ["gateway"], f"{t}.gateway")
    _conv_norm_act(tb, f + ["projection"], f"{t}.projection")
    for i in range(depth):
        _conv_norm_act(tb, f + [f"downsample_layers_{i}"],
                       f"{t}.downsample_layers.{i}")
        if i > 0:
            _conv_norm_act(tb, f + [f"lateral_down_{i}"],
                           f"{t}.fusion_layers.{i}.0")
        _conv_norm_act(tb, f + [f"concat_layers_{i}"], f"{t}.concat_layers.{i}")
    _conv_norm_act(tb, f + ["residual_conv_1"], f"{t}.residual_conv.0")
    _conv_norm_act(tb, f + ["residual_conv_2"], f"{t}.residual_conv.1")


def _tdanet_block(tb, f, t, params):
    depth = params.get("upsampling_depth", 4)
    layers = params.get("layers", {})
    layer_list = list(layers.values()) if isinstance(layers, dict) else list(layers)
    _conv_norm_act(tb, f + ["gateway"], f"{t}.gateway")
    _conv_norm_act(tb, f + ["projection"], f"{t}.projection")
    for i in range(depth):
        _conv_norm_act(tb, f + [f"downsample_layers_{i}"], f"{t}.downsample_layers.{i}")
    for i, lc in enumerate(layer_list):
        _globalatt_layer(tb, f + [f"globalatt_{i}"], f"{t}.globalatt.{i}", lc)
    for i in range(depth):
        _injection(tb, f + [f"fusion_layers_{i}"], f"{t}.fusion_layers.{i}")
    for i in range(depth - 1):
        _injection(tb, f + [f"concat_layers_{i}"], f"{t}.concat_layers.{i}")
    _conv_norm_act(tb, f + ["residual_conv"], f"{t}.residual_conv")


def _separator(tb, f, t, params):
    shared = params.get("shared", False)
    repeats = params.get("repeats", 1)
    net = params.get("audio_net") or params.get("video_net") or "TDANet"
    block_fn = _frcnn_block if net == "FRCNN" else _tdanet_block
    if shared:
        block_fn(tb, f + ["blocks"], f"{t}.blocks", params)
    else:
        for i in range(repeats):
            block_fn(tb, f + [f"blocks_{i}"], f"{t}.blocks.{i}", params)


def _attn_fusion_cell(tb, f, t):
    _conv_norm_act(tb, f + ["ConvNormAct_0"], f"{t}.key_embed")
    _conv_norm_act(tb, f + ["ConvNormAct_1"], f"{t}.value_embed")
    _conv_norm_act(tb, f + ["ConvNormAct_2"], f"{t}.attention_embed")
    _conv_norm_act(tb, f + ["ConvNormAct_3"], f"{t}.resize")


def _fusion(tb, f, t, fusion_params, video_fusion_first):
    ftype = fusion_params.get("fusion_type", "ConcatFusion")
    shared = fusion_params.get("fusion_shared", False)
    if not shared:
        i = 0
        while tb.has(f"{t}.fusion_module.{i}.audio_conv.full_layer.2.weight") or \
              tb.has(f"{t}.fusion_module.{i}.audio_lstm.key_embed.full_layer.2.weight"):
            fm = f + [f"fusion_module_{i}"]
            tm = f"{t}.fusion_module.{i}"
            if ftype == "ConcatFusion":
                _conv_norm_act(tb, fm + ["ConvNormAct_0"], f"{tm}.audio_conv")
                if tb.has(f"{tm}.video_conv.full_layer.2.weight"):
                    _conv_norm_act(tb, fm + ["ConvNormAct_1"], f"{tm}.video_conv")
            elif ftype == "ATTNFusion":
                cell = 0
                if tb.has(f"{tm}.video_lstm.key_embed.full_layer.2.weight"):
                    _attn_fusion_cell(tb, fm + [f"ATTNFusionCell_{cell}"],
                                      f"{tm}.video_lstm")
                    cell += 1
                _attn_fusion_cell(tb, fm + [f"ATTNFusionCell_{cell}"],
                                  f"{tm}.audio_lstm")
            else:
                raise NotImplementedError(f"fusion import for {ftype}")
            i += 1
        return
    if ftype == "ATTNFusion":
        cell = 0
        if video_fusion_first and tb.has(f"{t}.fusion_module.video_lstm.key_embed.full_layer.2.weight"):
            _attn_fusion_cell(tb, f + ["fusion_module", f"ATTNFusionCell_{cell}"],
                              f"{t}.fusion_module.video_lstm")
            cell += 1
        _attn_fusion_cell(tb, f + ["fusion_module", f"ATTNFusionCell_{cell}"],
                          f"{t}.fusion_module.audio_lstm")
    elif ftype == "ConcatFusion":
        _conv_norm_act(tb, f + ["fusion_module", "ConvNormAct_0"],
                       f"{t}.fusion_module.audio_conv")
        if tb.has(f"{t}.fusion_module.video_conv.full_layer.2.weight"):
            _conv_norm_act(tb, f + ["fusion_module", "ConvNormAct_1"],
                           f"{t}.fusion_module.video_conv")
    else:
        raise NotImplementedError(f"fusion import for {ftype}")


def convert_avnet(state_dict, audionet_conf):
    """Reference AVNet state_dict + its ``audionet`` config -> flax variables.

    Covers the RTFS-Net family (STFT enc/dec, TDANet separators with
    DualPathRNN/MHSA2D/GlobalAttention stacks, shared ATTNFusion or
    ConcatFusion, MaskGenerator). TDFNet/CTCNet-specific modules extend here.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    tb = _TreeBuilder(sd)

    if tb.has("encoder.conv.full_layer.2.weight"):
        _conv_norm_act(tb, ["encoder", "ConvNormAct_0"], "encoder.conv")
    else:
        i = 0
        while tb.has(f"encoder.encoder.{i}.full_layer.2.weight"):
            _conv_norm_act(tb, ["encoder", f"ConvNormAct_{i}"],
                           f"encoder.encoder.{i}")
            i += 1
    _conv_norm_act(tb, ["audio_bottleneck"], "audio_bottleneck")
    if tb.has("video_bottleneck.full_layer.2.weight"):
        _conv_norm_act(tb, ["video_bottleneck"], "video_bottleneck")

    ap = dict(audionet_conf["audio_params"])
    vp = dict(audionet_conf.get("video_params", {}))
    _separator(tb, ["refinement_module", "audio_net"],
               "refinement_module.audio_net", ap)
    if vp:
        _separator(tb, ["refinement_module", "video_net"],
                   "refinement_module.video_net", vp)
    fusion_repeats = vp.get("repeats", 0)
    _fusion(tb, ["refinement_module", "crossmodal_fusion"],
            "refinement_module.crossmodal_fusion",
            dict(audionet_conf.get("fusion_params", {})),
            video_fusion_first=fusion_repeats > 1)

    # mask generator: PReLU + ConvNormAct (+ optional gates)
    tb.put_p(["mask_generator", "PReLU_0", "alpha"],
             tb.t("mask_generator.mask_generator.0.weight"))
    _conv_norm_act(tb, ["mask_generator", "ConvNormAct_0"],
                   "mask_generator.mask_generator.1")
    if tb.has("mask_generator.output.full_layer.2.weight"):
        _conv_norm_act(tb, ["mask_generator", "ConvNormAct_1"],
                       "mask_generator.output")
        _conv_norm_act(tb, ["mask_generator", "ConvNormAct_2"],
                       "mask_generator.gate")

    # decoder ConvTransposeNd (Cin, Cout, *k) -> (*k, Cout, Cin)
    if tb.has("decoder.decoder.weight"):
        w = np.asarray(tb.t("decoder.decoder.weight"))
        perm = tuple(range(2, w.ndim)) + (1, 0)
        tb.put_p(["decoder", "ConvTranspose_0", "kernel"], w.transpose(perm))
        if tb.has("decoder.decoder.bias"):
            tb.put_p(["decoder", "ConvTranspose_0", "bias"],
                     tb.t("decoder.decoder.bias"))

    unused = [
        k for k in sd
        if k not in tb.used and "num_batches_tracked" not in k
        and "window" not in k and ".pe" not in k
    ]
    if unused:
        raise ValueError(f"unconverted torch keys: {unused[:10]}...")
    return {"params": tb.params, "batch_stats": tb.stats}
