"""ControlLoRA: convolutional hint encoder + per-bucket attention adapters.

Functional rebuild of the reference's `ControlLoRA` container (reference models.py:618-835).
The reference's forward *injects* control states into stateful processors
(models.py:820-830); here `apply` returns the per-bucket control feature maps (already
flattened to NLC — the reference's flatten-on-first-use cache, models.py:203-206, done once),
and `build_adapters` assembles the pure `AdapterStack` dict the UNet threads through its
attention layers.

Trainable parameters = hint-encoder convs + all adapter LoRA factors, one flat pytree:
{"encoder": <flax params>, "lora_layers": [[adapter dict, ...] per bucket]}.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from controllora_tpu.config import ControlLoRAConfig
from controllora_tpu.models import unet as unet_lib
from controllora_tpu.models.lora import (
    AdapterSpec,
    AdapterStack,
    AttnAdapter,
    init_adapter_params,
)
from controllora_tpu.models.unet import GroupNorm, UNetConfig, conv3


class ConvBlock2D(nn.Module):
    """GroupNorm -> SiLU -> Conv(k) -> GroupNorm -> SiLU (reference models.py:434-547;
    dropout is 0 and temb unused in every reference config, models.py:709)."""

    out_channels: int
    kernel_size: int = 3
    groups: int = 32
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        h = GroupNorm(min(self.groups, x.shape[-1]), self.eps, self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels,
            (k, k),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(h)
        h = GroupNorm(
            min(self.groups, self.out_channels), self.eps, self.dtype, name="norm2"
        )(h)
        return nn.silu(h)


class SimpleDownEncoderBlock2D(nn.Module):
    """N ConvBlock2D + optional stride-2 conv downsample with asymmetric (0,1) padding —
    diffusers Downsample2D(use_conv=True, padding=0) semantics
    (reference models.py:550-610, downsample_padding=0 at :705)."""

    out_channels: int
    num_layers: int = 1
    kernel_size: int = 3
    groups: int = 32
    add_downsample: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ConvBlock2D(
                self.out_channels,
                self.kernel_size,
                self.groups,
                dtype=self.dtype,
                name=f"convnets_{i}",
            )(x)
        if self.add_downsample:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="downsampler",
            )(x)
        return x


class HintEncoder(nn.Module):
    """conv_in -> 4-block pyramid (÷8) -> per-bucket [extra down + pre-lora 1x1 conv]
    (reference models.py:684-808 construction, :810-835 forward)."""

    config: ControlLoRAConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = self.config
        h = conv3(cfg.block_out_channels[0], self.dtype, "conv_in")(x)

        # stage 0: the full encoder pyramid (downsample on all but the last block)
        for i, ch in enumerate(cfg.block_out_channels):
            h = SimpleDownEncoderBlock2D(
                ch,
                num_layers=cfg.layers_per_block,
                groups=cfg.norm_num_groups,
                add_downsample=i != len(cfg.block_out_channels) - 1,
                dtype=self.dtype,
                name=f"down_blocks_0_{i}",
            )(h)

        controls = []
        n = cfg.num_buckets
        for i in range(n):
            if i > 0:
                # stages 1..3: one extra ÷2 encoder block each (reference models.py:751-771)
                h = SimpleDownEncoderBlock2D(
                    cfg.lora_block_in_channels[i],
                    num_layers=cfg.lora_pre_down_layers_per_block,
                    groups=cfg.norm_num_groups,
                    add_downsample=True,
                    dtype=self.dtype,
                    name=f"down_blocks_{i}",
                )(h)
            if cfg.lora_pre_conv_skipped:
                c = h
            else:
                c = SimpleDownEncoderBlock2D(
                    cfg.bucket_control_channels(i),
                    num_layers=cfg.lora_pre_conv_layers_per_block,
                    kernel_size=cfg.lora_pre_conv_layers_kernel_size,
                    groups=cfg.norm_num_groups,
                    add_downsample=False,
                    dtype=self.dtype,
                    name=f"pre_lora_layers_{i}",
                )(h)
            # flatten NHWC -> NLC once per bucket (the reference caches this flatten
            # lazily inside every processor, models.py:203-206)
            b, hh, ww, cc = c.shape
            controls.append(c.reshape(b, hh * ww, cc).astype(jnp.float32))
        return tuple(controls)


# ---------------------------------------------------------------------------- container


def adapter_spec_for(cfg: ControlLoRAConfig, bucket: int) -> AdapterSpec:
    """Spec of a main control adapter in a given bucket (reference models.py:155-188 v1,
    :292-323 v2 constructor semantics)."""
    if cfg.control_version == 2:
        return AdapterSpec(
            kind="control_v2",
            post_add=False,
            concat_hidden=True,
            control_self_add=False,
            key_skipped=True,
            value_skipped=True,
            output_skipped=False,
        )
    return AdapterSpec(
        kind="control_v1",
        post_add=cfg.lora_post_add,
        concat_hidden=cfg.lora_concat_hidden,
        # Reference QUIRK, pinned by the executed parity suite
        # (tests/test_reference_parity.py): the v1 constructor reassigns its
        # `control_channels` local to a non-None value BEFORE the
        # `control_self_add if control_channels is None else False` test
        # (reference models.py:256-259 in-class lines — models.py:166-170 of the
        # constructor body), so every processor the reference ever builds has
        # self-add OFF, whatever the config says. Matching the executed behavior
        # (not the apparent intent) is what makes reference-trained checkpoints
        # reproduce. The AdapterSpec flag itself still works for opt-in use.
        control_self_add=False,
        key_skipped=cfg.lora_key_states_skipped,
        value_skipped=cfg.lora_value_states_skipped,
        output_skipped=cfg.lora_output_states_skipped,
    )


class ControlLoRA:
    """Functional container: init/apply/build_adapters + (de)serialization hooks.

    API parallels the reference class (from_config/from_pretrained/forward,
    reference models.py:618, train_text_to_image_control_lora.py:427) but is stateless:
    parameters travel explicitly.
    """

    def __init__(self, config: ControlLoRAConfig, dtype: Any = jnp.float32):
        self.config = config
        self.dtype = dtype
        self.encoder = HintEncoder(config, dtype)

    @classmethod
    def from_config(cls, path_or_name: str, dtype: Any = jnp.float32) -> "ControlLoRA":
        from controllora_tpu.config import load_config

        return cls(load_config(path_or_name), dtype)

    @classmethod
    def from_pretrained(
        cls, path: str, dtype: Any = jnp.float32
    ) -> Tuple["ControlLoRA", Dict[str, Any]]:
        """Load a saved (or reference-published) artifact directory; returns
        (model, params) — the reference's `ControlLoRA.from_pretrained` entry point
        (reference apps/gradio_canny2image.py:38)."""
        from controllora_tpu.training.checkpoint import load_control_lora

        params, cfg = load_control_lora(path)
        return cls(cfg, dtype), params

    # ------------------------------------------------------------------ params

    def init(self, rng: jax.Array, image_size: int = 512) -> Dict[str, Any]:
        """Jitted init — one compiled program instead of hundreds of small dispatches
        (critical under remote-dispatch TPU runtimes where each op is a round-trip)."""
        return jax.jit(self._init_impl, static_argnums=(1,))(rng, image_size)

    def _init_impl(self, rng: jax.Array, image_size: int) -> Dict[str, Any]:
        cfg = self.config
        enc_rng, *bucket_rngs = jax.random.split(rng, 1 + cfg.num_buckets)
        enc_params = self.encoder.init(
            enc_rng, jnp.zeros((1, image_size, image_size, cfg.in_channels), self.dtype)
        )["params"]

        lora_layers: List[List[Dict[str, Any]]] = []
        for i in range(cfg.num_buckets):
            spec = adapter_spec_for(cfg, i)
            hidden = cfg.lora_block_out_channels[i]
            slots = []
            # a bucket can be adapter-free (SDXL level 0 has no attention layers)
            dims = cfg.lora_cross_attention_dims[i]
            rngs = jax.random.split(bucket_rngs[i], len(dims)) if dims else ()
            for j, cross_dim in enumerate(cfg.lora_cross_attention_dims[i]):
                slots.append(
                    init_adapter_params(
                        rngs[j],
                        hidden,
                        cross_dim,
                        cfg.lora_rank,
                        spec,
                        control_rank=cfg.effective_control_rank,
                        control_channels=cfg.bucket_control_channels(i),
                    )
                )
            lora_layers.append(slots)
        return {"encoder": enc_params, "lora_layers": lora_layers}

    # ------------------------------------------------------------------ forward

    def apply(self, params: Dict[str, Any], guide: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """guide: (B, H, W, 3) in [-1, 1] -> per-bucket control states (B, L_i, C_i).

        The reference's `ControlLoRA.forward` minus the stateful injection
        (reference models.py:810-835)."""
        return self.encoder.apply({"params": params["encoder"]}, guide.astype(self.dtype))

    def build_adapters(
        self,
        params: Dict[str, Any],
        control_states: Sequence[jnp.ndarray],
        unet_config: UNetConfig = UNetConfig(),
    ) -> Dict[str, AdapterStack]:
        """Assign bucket adapters to UNet attention layers in processor-name order —
        the pure equivalent of the reference's pop-and-set_attn_processor install loop
        (reference train_text_to_image_control_lora.py:468-487).

        A bucket running out of adapter slots is a hard error: the reference's loop
        skips the name (train…py:483 `if len(lora_layers) != 0`), but the resulting
        short dict then fails diffusers' `set_attn_processor` count check — silently
        dropping control on trailing layers is never valid, so fail here with the
        offending layer named."""
        cfg = self.config
        names = unet_lib.attention_processor_names(unet_config)
        n_blocks = len(unet_config.block_out_channels)
        cursors = [0] * cfg.num_buckets
        adapters: Dict[str, AdapterStack] = {}
        for name in names:
            bucket = unet_lib.processor_bucket(name, n_blocks)
            j = cursors[bucket]
            if j >= len(params["lora_layers"][bucket]):
                raise ValueError(
                    f"ControlLoRA config provides only {j} adapter slot(s) for bucket "
                    f"{bucket} but UNet layer {name!r} needs slot {j + 1} — config/UNet "
                    "mismatch (the reference fails this in set_attn_processor's "
                    "processor-count check)."
                )
            cursors[bucket] += 1
            adapters[name] = AdapterStack(
                main=AttnAdapter(
                    params=params["lora_layers"][bucket][j],
                    control=control_states[bucket],
                    spec=adapter_spec_for(cfg, bucket),
                )
            )
        return adapters

    def __call__(
        self,
        params: Dict[str, Any],
        guide: jnp.ndarray,
        unet_config: UNetConfig = UNetConfig(),
    ) -> Dict[str, AdapterStack]:
        """One-shot: encode the guide and build the adapter dict for the UNet."""
        controls = self.apply(params, guide)
        return self.build_adapters(params, controls, unet_config)

    def num_params(self, params: Dict[str, Any]) -> int:
        return sum(x.size for x in jax.tree.leaves(params))
