"""Dense KV cache as an explicit pytree.

Replaces the reference's reliance on HF `DynamicCache` (reference:
models/rope_attn_fwd.py:90-93 `past_key_value.update`, modeling_llama.py:666-669)
with a TPU-friendly design: fixed-capacity, statically shaped buffers plus
per-sequence length scalars, so every decode step reuses one compiled
program (no shape-driven recompiles — the "dynamic shapes under jit" hard
part from SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-model KV cache.

    k, v: [num_layers, batch, num_kv_heads, capacity, head_dim]
    lengths: [batch] int32 — valid prefix length per sequence.
    """

    k: jax.Array
    v: jax.Array
    lengths: jax.Array

    @classmethod
    def create(cls, cfg, batch: int, capacity: int, dtype=None) -> "KVCache":
        dtype = dtype or cfg.dtype
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, capacity, cfg.head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    def update_layer(
        self, layer: int, k_new: jax.Array, v_new: jax.Array
    ) -> "KVCache":
        """Append k_new/v_new [B, Hkv, S, D] at each sequence's offset.

        Lengths are advanced once by the model after the last layer (all
        layers share one length vector, like the reference's per-layer
        `Cache.update` sharing one `cache_position`).
        """
        def upd(buf_l, new_b, start):  # buf_l [Hkv, C, D], new_b [Hkv, S, D]
            return jax.lax.dynamic_update_slice(
                buf_l, new_b.astype(buf_l.dtype), (0, start, 0)
            )

        k_l = jax.vmap(upd)(self.k[layer], k_new, self.lengths)
        v_l = jax.vmap(upd)(self.v[layer], v_new, self.lengths)
        return dataclasses.replace(
            self,
            k=self.k.at[layer].set(k_l),
            v=self.v.at[layer].set(v_l),
        )

    def advance(self, num_tokens: int | jax.Array) -> "KVCache":
        return dataclasses.replace(self, lengths=self.lengths + num_tokens)
