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
