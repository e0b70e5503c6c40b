"""Projection fusion: fold q/k/v into one matmul and gate/up into one.

Decode streams every projection weight once per token, and each matmul
is a separate kernel invocation with its own pipeline ramp-up; fusing
along the OUTPUT axis turns 7 weight streams per layer into 4
(qkv_proj, o_proj, gate_up_proj, down_proj) with strictly wider N —
better HBM streaming and fewer fixed costs, with bit-identical math up
to float re-association (each output column still sees exactly the same
dot product).

Apply BEFORE `models.quantize.quantize_params`: per-output-channel int8
scales and per-(K-group, channel) int4 scales are invariant under
output-axis concatenation, so quantize(fuse(p)) produces exactly the
same per-column integer values and scales as quantizing unfused
weights (`tests/test_fuse.py` asserts this columnwise).

Layer code dispatches on key presence (`layers.qkv_project` /
`layers.mlp` check for "qkv_proj" / "gate_up_proj"), so a fused pytree
drops into forward / generate / every serving engine unchanged, on all
scan paths (uniform, windowed-segment, Gemma2 pattern).

Single-chip: under tensor parallelism the q/k/v (and gate/up) split
boundaries do not align with an N-sharded fused matmul's shard
boundaries, so GSPMD would insert collectives at every split —
`parallel.sharding.param_pspecs` rejects fused pytrees; keep TP meshes
on the unfused layout.

The reference keeps the three projections separate
(reference: models/modeling_llama.py:291-305); vLLM-style engines fuse
them for the same bandwidth reason this does.
"""

from __future__ import annotations

import jax.numpy as jnp


FUSED_KEYS = ("qkv_proj", "gate_up_proj", "qkv_bias")


def is_fused(params: dict) -> bool:
    return "qkv_proj" in params["layers"]


def fuse_projections(params: dict) -> dict:
    """New params pytree with q/k/v and gate/up concatenated along the
    output axis. Dense (unquantized) pytrees only — fuse first, then
    quantize."""
    layers = dict(params["layers"])
    assert "qkv_proj" not in layers, "already fused"
    for k in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        assert hasattr(layers[k], "dtype") and not hasattr(
            layers[k], "values"
        ), f"{k} is quantized — fuse before quantize_params"
    layers["qkv_proj"] = jnp.concatenate(
        [layers.pop("q_proj"), layers.pop("k_proj"), layers.pop("v_proj")],
        axis=-1,
    )
    if "q_bias" in layers:
        layers["qkv_bias"] = jnp.concatenate(
            [layers.pop("q_bias"), layers.pop("k_bias"),
             layers.pop("v_bias")],
            axis=-1,
        )
    layers["gate_up_proj"] = jnp.concatenate(
        [layers.pop("gate_proj"), layers.pop("up_proj")], axis=-1
    )
    out = dict(params)
    out["layers"] = layers
    return out
