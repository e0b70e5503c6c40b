"""Checkpoint save / resume (orbax-backed, sharding-aware).

The reference has NO checkpointing — weights come exclusively from HF
`from_pretrained` (reference: scripts/benchmark_llm.py:142-147) and no
state survives a process. Here, converted/sharded parameter pytrees (and
optionally the serving KV state) persist via orbax, so a multi-host
deployment restores without re-running the HF torch conversion, and each
process restores its own shards directly (SURVEY.md §5 checkpoint/resume).

Layout on disk:  <dir>/params/...  (orbax PyTree checkpoint)
                 <dir>/config.json (ModelConfig, for self-describing loads)
"""

from __future__ import annotations

import dataclasses
import json
import pathlib

import jax
import jax.numpy as jnp

from flash_attention_cute_tpu.models.config import ModelConfig, RopeScaling


def _cfg_to_json(cfg: ModelConfig) -> str:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    return json.dumps(d, indent=1)


def _cfg_from_json(s: str) -> ModelConfig:
    d = json.loads(s)
    d["dtype"] = jnp.dtype(d["dtype"])
    if d.get("rope_scaling"):
        d["rope_scaling"] = RopeScaling(**d["rope_scaling"])
    if d.get("layer_window_pattern") is not None:
        # JSON round-trips tuples as lists; the config must stay hashable
        # (it rides jit static args).
        d["layer_window_pattern"] = tuple(d["layer_window_pattern"])
    return ModelConfig(**d)


def save_checkpoint(path, params: dict, cfg: ModelConfig) -> None:
    """Write params + config; safe to call from every host (orbax
    coordinates multi-host writes of sharded arrays)."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path / "params", params, force=True)
    (path / "config.json").write_text(_cfg_to_json(cfg))


def load_checkpoint(
    path,
    shardings=None,
) -> tuple[ModelConfig, dict]:
    """Restore (cfg, params). `shardings` (optional pytree of
    jax.sharding.Sharding matching the params) restores each array
    directly onto its mesh placement — no host-memory staging of the full
    model on every process."""
    import orbax.checkpoint as ocp

    path = pathlib.Path(path).absolute()
    cfg = _cfg_from_json((path / "config.json").read_text())
    with ocp.PyTreeCheckpointer() as ckptr:
        if shardings is not None:
            restore_args = jax.tree.map(
                lambda s: ocp.ArrayRestoreArgs(sharding=s), shardings
            )
            params = ckptr.restore(
                path / "params",
                args=ocp.args.PyTreeRestore(
                    restore_args=restore_args
                ),
            )
        else:
            params = ckptr.restore(path / "params")
    return cfg, params


def save_hf_as_checkpoint(hf_path, out_path, dtype=jnp.bfloat16):
    """One-time conversion: HF torch checkpoint -> native orbax checkpoint
    (the resume path then never needs torch again)."""
    from flash_attention_cute_tpu.models.convert import load_hf_model

    cfg, params = load_hf_model(hf_path, dtype=dtype)
    save_checkpoint(out_path, params, cfg)
    return cfg
