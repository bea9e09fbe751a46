"""PyTorch/diffusers checkpoint interchange.

Imports the SD1.5 frozen stack (UNet / VAE / CLIP text) and ControlLoRA adapter weights
from diffusers-format state dicts (safetensors or pickled .bin) into this package's flax
param trees, and exports adapters back — required for loading HighCWu's published
checkpoints and for fixed-seed parity against the reference (SURVEY.md §7 hard part 5).

Layout conventions translated here:
  * torch Conv2d weight (O, I, kh, kw)  -> flax NHWC kernel (kh, kw, I, O)
  * torch Linear weight (O, I)          -> flax Dense kernel (I, O)
  * torch LoRALinearLayer down/up (r,in)/(out,r) -> our {down: (in,r), up: (r,out)}
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np

from controllora_tpu.config import ControlLoRAConfig


# ---------------------------------------------------------------------------- IO


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch state dict from .safetensors (preferred) or pickle .bin."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    if path.endswith(".safetensors"):
        from safetensors.numpy import save_file

        save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)
    else:
        import torch

        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in sd.items()},
            path,
        )


# ---------------------------------------------------------------------------- helpers


def _set(tree: Dict, path, value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _param_name(torch_leaf: str) -> str:
    return {"weight": "scale", "bias": "bias"}.get(torch_leaf, torch_leaf)


def _insert_norm(tree, path, leaf, value):
    # our GroupNorm/LayerNorm wrappers hold the flax norm under a "norm" child
    _set(tree, path + ("norm", _param_name(leaf)), value)


# ---------------------------------------------------------------------------- UNet


def translate_unet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> flax params for models.unet."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        parts = key.split(".")
        leaf = parts[-1]
        w = np.asarray(w)
        # ---- top-level
        if key.startswith("conv_in.") or key.startswith("conv_out."):
            _set(tree, (parts[0], "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(w) if leaf == "weight" else w)
        elif key.startswith("time_embedding."):
            name = f"time_embedding_{parts[1]}"
            _set(tree, (name, "kernel" if leaf == "weight" else "bias"),
                 w.T if leaf == "weight" else w)
        elif key.startswith("add_embedding."):
            # SDXL text_time micro-conditioning MLP (add_embedding.linear_{1,2})
            name = f"add_embedding_{parts[1]}"
            _set(tree, (name, "kernel" if leaf == "weight" else "bias"),
                 w.T if leaf == "weight" else w)
        elif key.startswith("conv_norm_out."):
            _insert_norm(tree, ("conv_norm_out",), leaf, w)
        elif parts[0] in ("down_blocks", "up_blocks", "mid_block"):
            if parts[0] == "mid_block":
                sub, rest = parts[1], parts[2:]
                base = f"mid_{sub}_{rest[0]}"
                rest = rest[1:]
            else:
                bi, sub = parts[1], parts[2]
                if sub == "downsamplers":
                    name = f"down_blocks_{bi}_downsample"
                    _set(tree, (name, "conv", "kernel" if leaf == "weight" else "bias"),
                         _conv_kernel(w) if leaf == "weight" else w)
                    continue
                if sub == "upsamplers":
                    name = f"up_blocks_{bi}_upsample"
                    _set(tree, (name, "conv", "kernel" if leaf == "weight" else "bias"),
                         _conv_kernel(w) if leaf == "weight" else w)
                    continue
                base = f"{parts[0]}_{bi}_{sub}_{parts[3]}"
                rest = parts[4:]
            _translate_unet_block(tree, base, rest, w)
        else:
            raise KeyError(f"unrecognized UNet key: {key}")
    return tree


def _translate_unet_block(tree, base: str, rest, w: np.ndarray):
    """Handle resnet / Transformer2D sub-paths shared by down/mid/up blocks."""
    leaf = rest[-1]
    body = rest[:-1]
    path = (base,)
    if body and body[0] in ("norm1", "norm2"):  # resnet norms
        _insert_norm(tree, path + (body[0],), leaf, w)
    elif body and body[0] == "norm":  # transformer2d groupnorm
        _insert_norm(tree, path + ("norm",), leaf, w)
    elif body and body[0] in ("conv1", "conv2", "conv_shortcut", "proj_in", "proj_out"):
        # SD2.x stores proj_in/proj_out as Linear (2-D weights,
        # use_linear_projection); SD1.x as 1x1 convs (4-D)
        if leaf == "weight":
            w = _conv_kernel(w) if w.ndim == 4 else w.T
        _set(tree, path + (body[0], "kernel" if leaf == "weight" else "bias"), w)
    elif body and body[0] == "time_emb_proj":
        _set(tree, path + ("time_emb_proj", "kernel" if leaf == "weight" else "bias"),
             w.T if leaf == "weight" else w)
    elif body and body[0] == "transformer_blocks":
        ti = body[1]
        tb = path + (f"transformer_blocks_{ti}",)
        sub = body[2]
        if sub in ("norm1", "norm2", "norm3"):
            _insert_norm(tree, tb + (sub,), leaf, w)
        elif sub in ("attn1", "attn2"):
            proj = body[3]
            if proj == "to_out":
                proj = "to_out_0"
                _set(tree, tb + (sub, proj, "kernel" if leaf == "weight" else "bias"),
                     w.T if leaf == "weight" else w)
            else:
                _set(tree, tb + (sub, proj, "kernel" if leaf == "weight" else "bias"),
                     w.T if leaf == "weight" else w)
        elif sub == "ff":
            # ff.net.0.proj -> net_0_proj ; ff.net.2 -> net_2
            if body[3] == "net" and body[4] == "0":
                name = "net_0_proj"
            else:
                name = "net_2"
            _set(tree, tb + ("ff", name, "kernel" if leaf == "weight" else "bias"),
                 w.T if leaf == "weight" else w)
        else:
            raise KeyError(f"unrecognized transformer sub-key: {base}.{'.'.join(rest)}")
    else:
        raise KeyError(f"unrecognized block key: {base}.{'.'.join(rest)}")


# ---------------------------------------------------------------------------- VAE


def translate_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> flax params for models.vae."""
    tree: Dict[str, Any] = {}
    attn_linear = {"query", "key", "value", "proj_attn", "to_q", "to_k", "to_v", "to_out"}
    rename_attn = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out": "proj_attn"}
    for key, w in sd.items():
        w = np.asarray(w)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] in ("quant_conv", "post_quant_conv"):
            _set(tree, (parts[0], "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(w) if leaf == "weight" else w)
            continue
        coder = parts[0]  # encoder / decoder
        rest = parts[1:]
        if rest[0] in ("conv_in", "conv_out"):
            _set(tree, (coder, rest[0], "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(w) if leaf == "weight" else w)
        elif rest[0] == "conv_norm_out":
            _insert_norm(tree, (coder, "conv_norm_out"), leaf, w)
        elif rest[0] == "mid_block":
            if rest[1] == "resnets":
                base = (coder, f"mid_resnets_{rest[2]}")
                _translate_vae_resnet(tree, base, rest[3:], w)
            else:  # attentions.0
                sub = rest[3]
                if sub == "group_norm":
                    _insert_norm(tree, (coder, "mid_attn", "group_norm"), leaf, w)
                else:
                    name = rename_attn.get(sub, sub)
                    if sub == "to_out":
                        leaf_src = w if leaf == "bias" else w.T
                    else:
                        leaf_src = w if leaf == "bias" else w.T
                    # diffusers 0.13 uses Linear for these; some versions store (C,C,1,1)
                    if leaf == "weight" and w.ndim == 4:
                        leaf_src = w[:, :, 0, 0].T
                    _set(tree, (coder, "mid_attn", name,
                                "kernel" if leaf == "weight" else "bias"), leaf_src)
        elif rest[0] in ("down_blocks", "up_blocks"):
            bi = rest[1]
            if rest[2] == "resnets":
                base = (coder, f"{rest[0]}_{bi}_resnets_{rest[3]}")
                _translate_vae_resnet(tree, base, rest[4:], w)
            elif rest[2] == "downsamplers":
                _set(tree, (coder, f"down_blocks_{bi}_downsample",
                            "kernel" if leaf == "weight" else "bias"),
                     _conv_kernel(w) if leaf == "weight" else w)
            elif rest[2] == "upsamplers":
                _set(tree, (coder, f"up_blocks_{bi}_upsample",
                            "kernel" if leaf == "weight" else "bias"),
                     _conv_kernel(w) if leaf == "weight" else w)
            else:
                raise KeyError(key)
        else:
            raise KeyError(f"unrecognized VAE key: {key}")
    return tree


def _translate_vae_resnet(tree, base, rest, w):
    leaf = rest[-1]
    name = rest[0]
    if name in ("norm1", "norm2"):
        _insert_norm(tree, base + (name,), leaf, w)
    elif name in ("conv1", "conv2", "conv_shortcut"):
        _set(tree, base + (name, "kernel" if leaf == "weight" else "bias"),
             _conv_kernel(w) if leaf == "weight" else w)
    else:
        raise KeyError(f"{base} {rest}")


# ---------------------------------------------------------------------------- CLIP


def translate_clip_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> flax params for models.clip."""
    tree: Dict[str, Any] = {}
    for key, w in sd.items():
        w = np.asarray(w)
        key = key.replace("text_model.", "")
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "embeddings":
            _set(tree, (parts[1], "embedding"), w)
        elif parts[0] == "final_layer_norm":
            _set(tree, ("final_layer_norm", _param_name(leaf)), w)
        elif parts[0] == "encoder":
            li = parts[2]
            rest = parts[3:]
            base = (f"layers_{li}",)
            if rest[0] in ("layer_norm1", "layer_norm2"):
                _set(tree, base + (rest[0], _param_name(leaf)), w)
            elif rest[0] == "self_attn":
                _set(tree, base + ("self_attn", rest[1],
                                   "kernel" if leaf == "weight" else "bias"),
                     w.T if leaf == "weight" else w)
            elif rest[0] == "mlp":
                _set(tree, base + (rest[1], "kernel" if leaf == "weight" else "bias"),
                     w.T if leaf == "weight" else w)
            else:
                raise KeyError(key)
        elif parts[0] == "position_ids" or key == "embeddings.position_ids":
            continue
        elif parts[0] == "text_projection":
            # CLIPTextModelWithProjection pooled head (SDXL text_encoder_2);
            # bias-free Linear
            _set(tree, ("text_projection", "kernel"), w.T)
        else:
            raise KeyError(f"unrecognized CLIP key: {key}")
    return tree


# ---------------------------------------------------------------------------- ControlLoRA


_LORA_PROJ = {
    "to_q_lora": "to_q",
    "to_k_lora": "to_k",
    "to_v_lora": "to_v",
    "to_out_lora": "to_out",
    "to_control": "to_control",
    "to_control_out": "to_control_out",
}


def control_lora_from_torch(
    sd: Dict[str, np.ndarray], config: ControlLoRAConfig
) -> Dict[str, Any]:
    """Reference ControlLoRA state dict (reference save path
    train_text_to_image_control_lora.py:927-929) -> our param tree
    {"encoder": ..., "lora_layers": [[...]]}."""
    enc: Dict[str, Any] = {}
    n_buckets = config.num_buckets
    lora_layers = [
        [dict() for _ in config.lora_cross_attention_dims[i]] for i in range(n_buckets)
    ]
    for key, w in sd.items():
        w = np.asarray(w)
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "conv_in":
            _set(enc, ("conv_in", "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(w) if leaf == "weight" else w)
        elif parts[0] == "lora_layers":
            i, j = int(parts[1]), int(parts[2])
            proj = _LORA_PROJ[parts[3]]
            which = parts[4]  # down / up
            # torch Linear (out,in): down (r, in) -> (in, r); up (out, r) -> (r, out)
            lora_layers[i][j].setdefault(proj, {})[which] = w.T
        elif parts[0] == "down_blocks":
            i = int(parts[1])
            if i == 0:
                # nn.Sequential of the 4 pyramid stages: down_blocks.0.<k>...
                k = int(parts[2])
                base = (f"down_blocks_0_{k}",)
                rest = parts[3:]
            else:
                base = (f"down_blocks_{i}",)
                rest = parts[2:]
            _translate_encoder_block(enc, base, rest, w)
        elif parts[0] == "pre_lora_layers":
            i = int(parts[1])
            _translate_encoder_block(enc, (f"pre_lora_layers_{i}",), parts[2:], w)
        else:
            raise KeyError(f"unrecognized ControlLoRA key: {key}")
    return {"encoder": enc, "lora_layers": lora_layers}


def _translate_encoder_block(tree, base, rest, w):
    leaf = rest[-1]
    if rest[0] == "convnets":
        j = rest[1]
        name = rest[2]
        if name in ("norm1", "norm2"):
            _insert_norm(tree, base + (f"convnets_{j}", name), leaf, w)
        elif name == "conv1":
            _set(tree, base + (f"convnets_{j}", "conv1",
                               "kernel" if leaf == "weight" else "bias"),
                 _conv_kernel(w) if leaf == "weight" else w)
        else:
            raise KeyError(f"{base} {rest}")
    elif rest[0] == "downsamplers":
        _set(tree, base + ("downsampler", "kernel" if leaf == "weight" else "bias"),
             _conv_kernel(w) if leaf == "weight" else w)
    else:
        raise KeyError(f"{base} {rest}")


def _export_conv(sd, key, node):
    sd[f"{key}.weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
    if "bias" in node:
        sd[f"{key}.bias"] = np.asarray(node["bias"])


def _export_linear(sd, key, node):
    sd[f"{key}.weight"] = np.asarray(node["kernel"]).T
    if "bias" in node:
        sd[f"{key}.bias"] = np.asarray(node["bias"])


def _export_norm(sd, key, node):
    inner = node["norm"] if "norm" in node else node
    sd[f"{key}.weight"] = np.asarray(inner["scale"])
    sd[f"{key}.bias"] = np.asarray(inner["bias"])


def _torch_block_name(flax_name: str) -> Optional[str]:
    """down_blocks_0_resnets_1 -> down_blocks.0.resnets.1 ; mid_resnets_0 ->
    mid_block.resnets.0 ; down_blocks_0_downsample -> down_blocks.0.downsamplers.0.conv."""
    m = re.fullmatch(r"(down|up)_blocks_(\d+)_(resnets|attentions)_(\d+)", flax_name)
    if m:
        return f"{m.group(1)}_blocks.{m.group(2)}.{m.group(3)}.{m.group(4)}"
    m = re.fullmatch(r"mid_(resnets|attentions)_(\d+)", flax_name)
    if m:
        return f"mid_block.{m.group(1)}.{m.group(2)}"
    m = re.fullmatch(r"down_blocks_(\d+)_downsample", flax_name)
    if m:
        return f"down_blocks.{m.group(1)}.downsamplers.0.conv"
    m = re.fullmatch(r"up_blocks_(\d+)_upsample", flax_name)
    if m:
        return f"up_blocks.{m.group(1)}.upsamplers.0.conv"
    return None


def flax_to_torch_unet(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of translate_unet — export flax UNet params in diffusers naming."""
    sd: Dict[str, np.ndarray] = {}

    def export_attention(prefix, node):
        for proj in ("to_q", "to_k", "to_v"):
            _export_linear(sd, f"{prefix}.{proj}", node[proj])
        _export_linear(sd, f"{prefix}.to_out.0", node["to_out_0"])

    def export_transformer(prefix, node):
        _export_norm(sd, f"{prefix}.norm", node["norm"])
        for proj in ("proj_in", "proj_out"):
            # 2-D kernel = SD2.x Linear projection, 4-D = SD1.x 1x1 conv
            (_export_linear if np.asarray(node[proj]["kernel"]).ndim == 2
             else _export_conv)(sd, f"{prefix}.{proj}", node[proj])
        for name, child in node.items():
            if name.startswith("transformer_blocks_"):
                ti = name.split("_")[-1]
                tp = f"{prefix}.transformer_blocks.{ti}"
                for nm in ("norm1", "norm2", "norm3"):
                    _export_norm(sd, f"{tp}.{nm}", child[nm])
                export_attention(f"{tp}.attn1", child["attn1"])
                export_attention(f"{tp}.attn2", child["attn2"])
                _export_linear(sd, f"{tp}.ff.net.0.proj", child["ff"]["net_0_proj"])
                _export_linear(sd, f"{tp}.ff.net.2", child["ff"]["net_2"])

    def export_resnet(prefix, node):
        _export_norm(sd, f"{prefix}.norm1", node["norm1"])
        _export_conv(sd, f"{prefix}.conv1", node["conv1"])
        _export_norm(sd, f"{prefix}.norm2", node["norm2"])
        _export_conv(sd, f"{prefix}.conv2", node["conv2"])
        if "time_emb_proj" in node:
            _export_linear(sd, f"{prefix}.time_emb_proj", node["time_emb_proj"])
        if "conv_shortcut" in node:
            _export_conv(sd, f"{prefix}.conv_shortcut", node["conv_shortcut"])

    for name, node in params.items():
        if name in ("conv_in", "conv_out"):
            _export_conv(sd, name, node)
        elif name == "conv_norm_out":
            _export_norm(sd, name, node)
        elif name.startswith("time_embedding_"):
            _export_linear(sd, f"time_embedding.{name[len('time_embedding_'):]}", node)
        elif name.startswith("add_embedding_"):
            _export_linear(sd, f"add_embedding.{name[len('add_embedding_'):]}", node)
        else:
            tname = _torch_block_name(name)
            if tname is None:
                raise KeyError(f"unrecognized flax UNet module: {name}")
            if "downsamplers" in tname or "upsamplers" in tname:
                _export_conv(sd, tname, node["conv"])
            elif ".resnets." in tname:
                export_resnet(tname, node)
            else:
                export_transformer(tname, node)
    return sd


def flax_to_torch_vae(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of translate_vae (diffusers 0.13 AttentionBlock naming)."""
    sd: Dict[str, np.ndarray] = {}

    def export_resnet(prefix, node):
        _export_norm(sd, f"{prefix}.norm1", node["norm1"])
        _export_conv(sd, f"{prefix}.conv1", node["conv1"])
        _export_norm(sd, f"{prefix}.norm2", node["norm2"])
        _export_conv(sd, f"{prefix}.conv2", node["conv2"])
        if "conv_shortcut" in node:
            _export_conv(sd, f"{prefix}.conv_shortcut", node["conv_shortcut"])

    for coder in ("encoder", "decoder"):
        for name, node in params[coder].items():
            if name in ("conv_in", "conv_out"):
                _export_conv(sd, f"{coder}.{name}", node)
            elif name == "conv_norm_out":
                _export_norm(sd, f"{coder}.{name}", node)
            elif name == "mid_attn":
                p = f"{coder}.mid_block.attentions.0"
                _export_norm(sd, f"{p}.group_norm", node["group_norm"])
                for t, f in (("query", "query"), ("key", "key"), ("value", "value"),
                             ("proj_attn", "proj_attn")):
                    _export_linear(sd, f"{p}.{t}", node[f])
            elif name.startswith("mid_resnets_"):
                export_resnet(f"{coder}.mid_block.resnets.{name.split('_')[-1]}", node)
            elif name.endswith("_downsample"):
                bi = name.split("_")[2]
                _export_conv(sd, f"{coder}.down_blocks.{bi}.downsamplers.0.conv", node)
            elif name.endswith("_upsample"):
                bi = name.split("_")[2]
                _export_conv(sd, f"{coder}.up_blocks.{bi}.upsamplers.0.conv", node)
            else:
                m = re.fullmatch(r"(down|up)_blocks_(\d+)_resnets_(\d+)", name)
                if not m:
                    raise KeyError(f"unrecognized flax VAE module: {coder}.{name}")
                export_resnet(
                    f"{coder}.{m.group(1)}_blocks.{m.group(2)}.resnets.{m.group(3)}", node
                )
    for name in ("quant_conv", "post_quant_conv"):
        _export_conv(sd, name, params[name])
    return sd


def flax_to_torch_clip(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of translate_clip_text (transformers CLIPTextModel naming)."""
    sd: Dict[str, np.ndarray] = {}
    sd["text_model.embeddings.token_embedding.weight"] = np.asarray(
        params["token_embedding"]["embedding"]
    )
    sd["text_model.embeddings.position_embedding.weight"] = np.asarray(
        params["position_embedding"]["embedding"]
    )
    _export_linear_plain = _export_linear
    for name, node in params.items():
        if not name.startswith("layers_"):
            continue
        li = name.split("_")[-1]
        p = f"text_model.encoder.layers.{li}"
        for nm in ("layer_norm1", "layer_norm2"):
            sd[f"{p}.{nm}.weight"] = np.asarray(node[nm]["scale"])
            sd[f"{p}.{nm}.bias"] = np.asarray(node[nm]["bias"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _export_linear_plain(sd, f"{p}.self_attn.{proj}", node["self_attn"][proj])
        _export_linear_plain(sd, f"{p}.mlp.fc1", node["fc1"])
        _export_linear_plain(sd, f"{p}.mlp.fc2", node["fc2"])
    sd["text_model.final_layer_norm.weight"] = np.asarray(params["final_layer_norm"]["scale"])
    sd["text_model.final_layer_norm.bias"] = np.asarray(params["final_layer_norm"]["bias"])
    if "text_projection" in params:
        # pooled head lives OUTSIDE text_model in the transformers layout
        sd["text_projection.weight"] = np.asarray(params["text_projection"]["kernel"]).T
    return sd


def attn_procs_to_torch(adapters: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Export {processor_name: AttnAdapter} to diffusers `unet.save_attn_procs` naming
    ('<proc_name>.to_q_lora.down.weight', reference train_dreambooth_lora.py:987-994)."""
    sd: Dict[str, np.ndarray] = {}
    inv = {v: k for k, v in _LORA_PROJ.items()}
    for name, adapter in adapters.items():
        params = adapter.params if hasattr(adapter, "params") else adapter
        for proj, pair in params.items():
            sd[f"{name}.{inv[proj]}.down.weight"] = np.asarray(pair["down"]).T
            sd[f"{name}.{inv[proj]}.up.weight"] = np.asarray(pair["up"]).T
    return sd


def attn_procs_from_torch(sd: Dict[str, np.ndarray]) -> Dict[str, Dict[str, Any]]:
    """Import a diffusers attn-procs LoRA state dict -> {processor_name: params tree}
    (the `unet.load_attn_procs` path, reference train_dreambooth_lora.py:1005)."""
    out: Dict[str, Dict[str, Any]] = {}
    for key, w in sd.items():
        m = re.fullmatch(r"(.+\.processor)\.(\w+)\.(down|up)\.weight", key)
        if not m:
            raise KeyError(f"unrecognized attn-procs key: {key}")
        name, proj_t, which = m.groups()
        proj = _LORA_PROJ[proj_t]
        out.setdefault(name, {}).setdefault(proj, {})[which] = np.asarray(w).T
    return out


def control_lora_to_torch(
    params: Dict[str, Any], config: ControlLoRAConfig
) -> Dict[str, np.ndarray]:
    """Export our param tree back to the reference's state-dict naming (bin/safetensors
    interchange with the PyTorch ecosystem)."""
    sd: Dict[str, np.ndarray] = {}
    inv_proj = {v: k for k, v in _LORA_PROJ.items()}

    def put_conv(key, node):
        sd[f"{key}.weight"] = np.transpose(np.asarray(node["kernel"]), (3, 2, 0, 1))
        if "bias" in node:
            sd[f"{key}.bias"] = np.asarray(node["bias"])

    def put_norm(key, node):
        sd[f"{key}.weight"] = np.asarray(node["norm"]["scale"])
        sd[f"{key}.bias"] = np.asarray(node["norm"]["bias"])

    enc = params["encoder"]
    put_conv("conv_in", enc["conv_in"])

    def put_block(prefix, node):
        for name, child in node.items():
            if name.startswith("convnets_"):
                j = name.split("_")[-1]
                put_norm(f"{prefix}.convnets.{j}.norm1", child["norm1"])
                put_conv(f"{prefix}.convnets.{j}.conv1", child["conv1"])
                put_norm(f"{prefix}.convnets.{j}.norm2", child["norm2"])
            elif name == "downsampler":
                put_conv(f"{prefix}.downsamplers.0.conv", child)

    for name, node in enc.items():
        if name.startswith("down_blocks_0_"):
            k = name.split("_")[-1]
            put_block(f"down_blocks.0.{k}", node)
        elif re.fullmatch(r"down_blocks_[1-9]\d*", name):
            i = name.split("_")[-1]
            put_block(f"down_blocks.{i}", node)
        elif name.startswith("pre_lora_layers_"):
            i = name.split("_")[-1]
            put_block(f"pre_lora_layers.{i}", node)

    for i, bucket in enumerate(params["lora_layers"]):
        for j, adapter in enumerate(bucket):
            for proj, pair in adapter.items():
                tname = inv_proj[proj]
                sd[f"lora_layers.{i}.{j}.{tname}.down.weight"] = np.asarray(pair["down"]).T
                sd[f"lora_layers.{i}.{j}.{tname}.up.weight"] = np.asarray(pair["up"]).T
    return sd
