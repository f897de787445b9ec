"""Converter plumbing test: synthesize a reference-shaped torch state_dict,
convert, and check full coverage of the flax param tree."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from relation_detr_tpu.models.detector import RelationDETR

from importlib import import_module
import sys

sys.path.insert(0, "tools")
convert_torch_weights = import_module("convert_torch_weights")


def synth_reference_state_dict(enc_layers=1, dec_layers=2, num_classes=10,
                               num_queries=20, hybrid=30, C=256, ffn=2048):
    """Build a torch state_dict with the reference's names/shapes
    (RelationDETR resnet50 module tree)."""
    sd = {}

    def lin(name, out, inp):
        sd[f"{name}.weight"] = torch.randn(out, inp)
        sd[f"{name}.bias"] = torch.randn(out)

    def ln(name, dim):
        sd[f"{name}.weight"] = torch.randn(dim)
        sd[f"{name}.bias"] = torch.randn(dim)

    def conv(name, out, inp, k):
        sd[f"{name}.weight"] = torch.randn(out, inp, k, k)

    def bn(name, dim):
        for stat in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{name}.{stat}"] = torch.randn(dim).abs() + 0.1

    # resnet50 backbone
    conv("backbone.body.conv1", 64, 3, 7)
    bn("backbone.body.bn1", 64)
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    inp = 64
    for stage, n in blocks.items():
        width = 64 * 2 ** (stage - 1)
        for b in range(n):
            pre = f"backbone.body.layer{stage}.{b}"
            conv(f"{pre}.conv1", width, inp if b == 0 else width * 4, 1)
            bn(f"{pre}.bn1", width)
            conv(f"{pre}.conv2", width, width, 3)
            bn(f"{pre}.bn2", width)
            conv(f"{pre}.conv3", width * 4, width, 1)
            bn(f"{pre}.bn3", width * 4)
            if b == 0:
                conv(f"{pre}.downsample.0", width * 4, inp if b == 0 else width * 4, 1)
                bn(f"{pre}.downsample.1", width * 4)
        inp = width * 4

    # neck: 3 x (1x1 conv + GN) + 1 extra 3x3
    for i, cin in enumerate((512, 1024, 2048)):
        conv(f"neck.convs.{i}.0", C, cin, 1)
        sd[f"neck.convs.{i}.0.bias"] = torch.randn(C)
        ln(f"neck.convs.{i}.1", C)
    conv("neck.convs.3.0", C, 2048, 3)
    sd["neck.convs.3.0.bias"] = torch.randn(C)
    ln("neck.convs.3.1", C)

    # transformer encoder
    for i in range(enc_layers):
        pre = f"transformer.encoder.layers.{i}"
        for name, out, inp_ in (
            ("self_attn.sampling_offsets", 8 * 4 * 4 * 2, C),
            ("self_attn.attention_weights", 8 * 4 * 4, C),
            ("self_attn.value_proj", C, C),
            ("self_attn.output_proj", C, C),
            ("linear1", ffn, C),
            ("linear2", C, ffn),
        ):
            lin(f"{pre}.{name}", out, inp_)
        ln(f"{pre}.norm1", C)
        ln(f"{pre}.norm2", C)
    lin("transformer.encoder.memory_fusion.0", C, (enc_layers + 1) * C)
    lin("transformer.encoder.memory_fusion.2", C, C)
    ln("transformer.encoder.memory_fusion.3", C)

    # transformer decoder
    for i in range(dec_layers):
        pre = f"transformer.decoder.layers.{i}"
        sd[f"{pre}.self_attn.in_proj_weight"] = torch.randn(3 * C, C)
        sd[f"{pre}.self_attn.in_proj_bias"] = torch.randn(3 * C)
        lin(f"{pre}.self_attn.out_proj", C, C)
        for name, out, inp_ in (
            ("cross_attn.sampling_offsets", 8 * 4 * 4 * 2, C),
            ("cross_attn.attention_weights", 8 * 4 * 4, C),
            ("cross_attn.value_proj", C, C),
            ("cross_attn.output_proj", C, C),
            ("linear1", ffn, C),
            ("linear2", C, ffn),
        ):
            lin(f"{pre}.{name}", out, inp_)
        for n in ("norm1", "norm2", "norm3"):
            ln(f"{pre}.{n}", C)
        lin(f"transformer.decoder.class_head.{i}", num_classes, C)
        for j, (o, k) in enumerate(((C, C), (C, C), (4, C))):
            lin(f"transformer.decoder.bbox_head.{i}.layers.{j}", o, k)
    for j, (o, k) in enumerate(((C, 2 * C), (C, C))):
        lin(f"transformer.decoder.ref_point_head.layers.{j}", o, k)
        lin(f"transformer.decoder.query_scale.layers.{j}", C if j == 0 else C, C)
    ln("transformer.decoder.norm", C)
    sd["transformer.decoder.position_relation_embedding.pos_proj.0.weight"] = torch.randn(8, 64, 1, 1)
    sd["transformer.decoder.position_relation_embedding.pos_proj.0.bias"] = torch.randn(8)

    # two-stage pieces
    sd["transformer.level_embeds"] = torch.randn(4, C)
    sd["transformer.tgt_embed.weight"] = torch.randn(num_queries, C)
    sd["transformer.hybrid_tgt_embed.weight"] = torch.randn(hybrid, C)
    lin("transformer.enc_output", C, C)
    ln("transformer.enc_output_norm", C)
    lin("transformer.encoder_class_head", num_classes, C)
    lin("transformer.hybrid_class_head", num_classes, C)
    for head in ("encoder_bbox_head", "hybrid_bbox_head"):
        for j, (o, k) in enumerate(((C, C), (C, C), (4, C))):
            lin(f"transformer.{head}.layers.{j}", o, k)
    sd["denoising_generator.label_encoder.weight"] = torch.randn(num_classes, C)
    return sd


def test_converter_covers_full_param_tree():
    sd = synth_reference_state_dict()
    params, stats, leftover = convert_torch_weights.convert_state_dict(sd)
    assert not leftover, leftover[:5]

    model = RelationDETR(num_classes=10, num_queries=20, hybrid_num_proposals=30,
                         denoising_nums=5, transformer_enc_layers=1,
                         transformer_dec_layers=2, backbone_arch="resnet50")
    B, H, W, G = 1, 64, 96, 4
    template = jax.eval_shape(lambda: model.init(
        {"params": jax.random.key(0), "denoising": jax.random.key(1)},
        jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W), bool),
        jnp.zeros((B, G), jnp.int32), jnp.full((B, G, 4), 0.5),
        jnp.zeros((B, G), bool), train=True))

    flat = {f"params/{k}": v for k, v in params.items()}
    flat.update({f"batch_stats/{k}": v for k, v in stats.items()})
    tmpl = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        tmpl[key] = tuple(leaf.shape)

    missing = sorted(set(tmpl) - set(flat))
    assert not missing, missing[:10]
    mismatched = [
        (k, flat[k].shape, tmpl[k]) for k in tmpl if tuple(flat[k].shape) != tmpl[k]
    ]
    assert not mismatched, mismatched[:10]


def synth_swin_state_dict(arch="swin_t", prefix="backbone.0."):
    """torchvision-layout Swin state_dict (reference swin.py:780-789 names)."""
    from relation_detr_tpu.models.backbones.swin import ARCH_SETTINGS

    embed_dim, depths, num_heads, ws, v2 = ARCH_SETTINGS[arch]
    sd = {}

    def lin(name, out, inp, bias=True):
        sd[f"{name}.weight"] = torch.randn(out, inp)
        if bias:
            sd[f"{name}.bias"] = torch.randn(out)

    def ln(name, dim):
        sd[f"{name}.weight"] = torch.randn(dim)
        sd[f"{name}.bias"] = torch.randn(dim)

    f = prefix + "features."
    sd[f + "0.0.weight"] = torch.randn(embed_dim, 3, 4, 4)
    sd[f + "0.0.bias"] = torch.randn(embed_dim)
    ln(f + "0.2", embed_dim)
    for stage, depth in enumerate(depths):
        dim = embed_dim * 2**stage
        if stage > 0:
            lin(f"{f}{2 * stage}.reduction", dim, 2 * dim, bias=False)
            ln(f"{f}{2 * stage}.norm", dim if v2 else 2 * dim)
        for j in range(depth):
            src = f"{f}{2 * stage + 1}.{j}"
            ln(f"{src}.norm1", dim)
            ln(f"{src}.norm2", dim)
            lin(f"{src}.attn.qkv", 3 * dim, dim)
            lin(f"{src}.attn.proj", dim, dim)
            if v2:
                sd[f"{src}.attn.logit_scale"] = torch.randn(num_heads[stage], 1, 1)
                lin(f"{src}.attn.cpb_mlp.0", 512, 2)
                lin(f"{src}.attn.cpb_mlp.2", num_heads[stage], 512, bias=False)
                sd[f"{src}.attn.relative_coords_table"] = torch.zeros(
                    1, 2 * ws - 1, 2 * ws - 1, 2)
            else:
                sd[f"{src}.attn.relative_position_bias_table"] = torch.randn(
                    (2 * ws - 1) ** 2, num_heads[stage])
            sd[f"{src}.attn.relative_position_index"] = torch.zeros(
                ws * ws * ws * ws, dtype=torch.long)
            lin(f"{src}.mlp.0", 4 * dim, dim)
            lin(f"{src}.mlp.3", dim, 4 * dim)
    return sd


@pytest.mark.parametrize("arch", ["swin_t", "swin_v2_t"])
def test_converter_covers_swin_backbones(arch):
    from relation_detr_tpu.models.backbones import build_backbone

    sd = synth_swin_state_dict(arch)
    params, stats, leftover = convert_torch_weights.convert_state_dict(sd)
    bb_params = {k: v for k, v in params.items() if k.startswith("backbone/")}

    bb = build_backbone(arch)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    tmpl = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(template["params"])[0]:
        key = "backbone/" + "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        tmpl[key] = tuple(leaf.shape)

    missing = sorted(set(tmpl) - set(bb_params))
    assert not missing, missing[:10]
    mismatched = [(k, bb_params[k].shape, tmpl[k]) for k in tmpl
                  if tuple(bb_params[k].shape) != tmpl[k]]
    assert not mismatched, mismatched[:10]
    swin_leftover = [k for k in leftover if "features" in k]
    assert not swin_leftover, swin_leftover[:5]


def test_converter_accepts_bare_torchvision_resnet():
    """A raw torchvision ImageNet checkpoint (top-level conv1/bn1/layerN
    keys, the URLs the reference loads at resnet.py:344-414) converts into
    the backbone param/stat tree."""
    from relation_detr_tpu.models.backbones import build_backbone

    sd = {"conv1.weight": torch.randn(64, 3, 7, 7)}
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"bn1.{stat}"] = torch.randn(64)

    def block(pre, cin, width, cout, down):
        sd[f"{pre}.conv1.weight"] = torch.randn(width, cin, 1, 1)
        sd[f"{pre}.conv2.weight"] = torch.randn(width, width, 3, 3)
        sd[f"{pre}.conv3.weight"] = torch.randn(cout, width, 1, 1)
        for i, d in ((1, width), (2, width), (3, cout)):
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.bn{i}.{stat}"] = torch.randn(d)
        if down:
            sd[f"{pre}.downsample.0.weight"] = torch.randn(cout, cin, 1, 1)
            for stat in ("weight", "bias", "running_mean", "running_var"):
                sd[f"{pre}.downsample.1.{stat}"] = torch.randn(cout)

    cin = 64
    for stage, (width, n) in enumerate(((64, 3), (128, 4), (256, 6), (512, 3))):
        for j in range(n):
            block(f"layer{stage + 1}.{j}", cin, width, width * 4, j == 0)
            cin = width * 4
    sd["fc.weight"] = torch.randn(1000, 2048)
    sd["fc.bias"] = torch.randn(1000)

    params, stats, leftover = convert_torch_weights.convert_state_dict(sd)
    assert set(leftover) <= {"fc.weight", "fc.bias"}, leftover[:5]

    bb = build_backbone("resnet50")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = jax.eval_shape(lambda: bb.init(jax.random.key(0), x))
    got = {f"params/backbone/{k}" if not k.startswith("backbone/") else f"params/{k}": v
           for k, v in params.items()}
    got.update({f"batch_stats/backbone/{k.removeprefix('backbone/')}": v
                for k, v in stats.items()})
    tmpl = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        # insert the backbone scope: template paths are params/<module>/...
        parts = key.split("/")
        tmpl["/".join([parts[0], "backbone", *parts[1:]])] = tuple(leaf.shape)
    converted_keys = {k.replace("params/backbone/backbone/", "params/backbone/")
                      for k in got}
    missing = sorted(set(tmpl) - converted_keys)
    assert not missing, missing[:10]
