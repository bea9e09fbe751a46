"""Shared text / micro-conditioning resolution for the trainers.

Both the ControlLoRA trainer and the DreamBooth-LoRA trainer accept either
pre-computed text context (`encoder_hidden_states` [+ `pooled_text_embeds`])
or raw `input_ids` routed through the frozen text encoder, and — for
"text_time" UNets (SDXL family) — derive the size-id micro-conditioning from
the batch or from the training resolution. One implementation here so the two
training paths cannot drift.
"""

from __future__ import annotations

import jax.numpy as jnp


def resolve_text_conditioning(batch, text_encoder, frozen_text, unet_config,
                              latents):
    """-> (encoder context, UNet added-conditioning kwargs).

    text_time defaults: datasets may provide per-image `time_ids`
    (orig_h, orig_w, crop_top, crop_left, target_h, target_w); otherwise the
    layout matches this repo's square center pipeline (no crop drift) —
    original == target == training resolution."""
    pooled = None
    if "encoder_hidden_states" in batch:
        ctx = batch["encoder_hidden_states"]
        pooled = batch.get("pooled_text_embeds")
    else:
        # dual towers take per-tokenizer ids when the dataset provides them
        # (SDXL tokenizer_2 pads with id 0; see models/clip.py)
        args = ((batch["input_ids"], batch["input_ids2"])
                if "input_ids2" in batch else (batch["input_ids"],))
        ctx = text_encoder.apply({"params": frozen_text}, *args)
        if isinstance(ctx, tuple):  # SDXL dual/projection tower -> (ctx, pooled)
            ctx, pooled = ctx
    if unet_config.addition_embed_type != "text_time":
        return ctx, {}
    if pooled is None:
        raise ValueError(
            "text_time UNet: provide a pooled-projection text encoder "
            "(input_ids path) or pooled_text_embeds alongside "
            "encoder_hidden_states"
        )
    if "time_ids" in batch:
        tids = batch["time_ids"].astype(jnp.float32)
    else:
        b = latents.shape[0]
        res_h, res_w = latents.shape[1] * 8, latents.shape[2] * 8
        tids = jnp.tile(
            jnp.array([[res_h, res_w, 0, 0, res_h, res_w]], jnp.float32),
            (b, 1),
        )
    return ctx, dict(added_text_embeds=pooled, added_time_ids=tids)
