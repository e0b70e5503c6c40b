"""Checkpoint round-trip (orbax) and roofline/profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flash_attention_cute_tpu.models import forward, init_params
from flash_attention_cute_tpu.models.config import tiny_test_config


def test_checkpoint_roundtrip(tmp_path):
    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.key(0))
    save_checkpoint(tmp_path / "ck", params, cfg)

    cfg2, params2 = load_checkpoint(tmp_path / "ck")
    assert cfg2 == cfg
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params2,
    )
    ids = jnp.ones((1, 8), jnp.int32)
    l1, _ = forward(params, cfg, ids, mode="prefill")
    l2, _ = forward(params2, cfg2, ids, mode="prefill")
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_checkpoint_restore_with_shardings(tmp_path, mesh8):
    from jax.sharding import NamedSharding

    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from flash_attention_cute_tpu.parallel.sharding import param_pspecs

    cfg = tiny_test_config(num_q_heads=8, num_kv_heads=4)
    params = init_params(cfg, jax.random.key(1))
    save_checkpoint(tmp_path / "ck", params, cfg)

    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh8, s), param_pspecs(cfg)
    )
    cfg2, params2 = load_checkpoint(tmp_path / "ck", shardings=shardings)
    q = params2["layers"]["q_proj"]
    assert q.sharding == shardings["layers"]["q_proj"]
    np.testing.assert_array_equal(
        np.asarray(q), np.asarray(params["layers"]["q_proj"])
    )


def test_roofline_reports_bound():
    from flash_attention_cute_tpu.utils.profiling import roofline

    def big_matmul(a, b):
        return a @ b

    a = jnp.zeros((1024, 1024), jnp.bfloat16)
    b = jnp.zeros((1024, 1024), jnp.bfloat16)
    r = roofline(big_matmul, a, b)
    assert r["flops"] > 0 and r["bytes"] > 0
    assert r["bound"] in ("compute", "memory")
    assert r["min_time_us"] > 0

    r2 = roofline(big_matmul, a, b, seconds=1e-3)
    assert 0 < r2["achieved_tflops"] < r2["peak_tflops"]


def test_trace_context(tmp_path):
    from flash_attention_cute_tpu.utils.profiling import annotate, trace

    with trace(str(tmp_path / "tr")):
        with annotate("phase"):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert any((tmp_path / "tr").rglob("*"))


def test_checkpoint_gemma2_config_round_trip(tmp_path):
    """Configs with tuple fields (Gemma2's layer_window_pattern) must
    restore HASHABLE (they ride jit static args) and equal."""
    import jax

    from flash_attention_cute_tpu.models import init_params
    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from flash_attention_cute_tpu.models.config import tiny_test_config

    cfg = tiny_test_config(
        num_layers=2, layer_window_pattern=(8, None),
        sandwich_norms=True, hidden_activation="gelu_tanh",
        final_logit_softcap=30.0, scale_embeddings=True,
    )
    params = init_params(cfg, jax.random.key(0))
    save_checkpoint(tmp_path / "ck", params, cfg)
    cfg2, params2 = load_checkpoint(tmp_path / "ck")
    assert cfg2 == cfg
    hash(cfg2)  # must not raise (static-arg requirement)
    import numpy as np
    np.testing.assert_array_equal(
        np.asarray(params["layers"]["q_proj"]),
        np.asarray(params2["layers"]["q_proj"]),
    )


def test_checkpoint_lora_bank_round_trip(tmp_path):
    """A multi-LoRA adapter bank checkpoints like any pytree."""
    import jax
    import numpy as np

    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from flash_attention_cute_tpu.models.config import tiny_test_config
    from flash_attention_cute_tpu.models.lora import init_lora_params

    cfg = tiny_test_config(num_layers=2)
    lora = init_lora_params(cfg, num_adapters=3, rank=4,
                            key=jax.random.key(1))
    save_checkpoint(tmp_path / "lora", lora, cfg)
    _, lora2 = load_checkpoint(tmp_path / "lora")
    a, b = jax.tree_util.tree_leaves(lora), jax.tree_util.tree_leaves(lora2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("bits", [8, 4])
def test_checkpoint_quantized_round_trip(tmp_path, bits):
    """Quantized pytrees must round-trip bit-exactly: the dataclass
    statics (in_dim/out/impl) live in quant.json because orbax restores
    raw pytrees. This is the 'quantize once, restore in seconds' path —
    the full-depth host init+quantize costs ~18 min."""
    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from flash_attention_cute_tpu.models.quantize import quantize_params
    from flash_attention_cute_tpu.ops.quantized_matmul import (
        QuantizedWeight,
        QuantizedWeight4,
    )

    cfg = tiny_test_config(num_layers=2)
    qp = quantize_params(init_params(cfg, jax.random.key(0)), bits=bits)
    save_checkpoint(tmp_path / "qck", qp, cfg)
    assert (tmp_path / "qck" / "quant.json").exists()
    cfg2, qp2 = load_checkpoint(tmp_path / "qck")
    cls = QuantizedWeight if bits == 8 else QuantizedWeight4
    for key in ("q_proj", "down_proj"):
        leaf, leaf2 = qp["layers"][key], qp2["layers"][key]
        assert isinstance(leaf2, cls)
        assert (leaf2.in_dim, leaf2.out, leaf2.impl) == (
            leaf.in_dim, leaf.out, leaf.impl)
        np.testing.assert_array_equal(np.asarray(leaf2.values),
                                      np.asarray(leaf.values))
        np.testing.assert_array_equal(np.asarray(leaf2.scales),
                                      np.asarray(leaf.scales))
    ids = jnp.zeros((1, 8), jnp.int32)
    want, _ = forward(qp, cfg, ids, mode="prefill", interpret=True)
    got, _ = forward(qp2, cfg2, ids, mode="prefill", interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_checkpoint_dense_writes_no_quant_meta(tmp_path):
    from flash_attention_cute_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    cfg = tiny_test_config(num_layers=1)
    params = init_params(cfg, jax.random.key(0))
    save_checkpoint(tmp_path / "ck", params, cfg)
    assert not (tmp_path / "ck" / "quant.json").exists()
    _, params2 = load_checkpoint(tmp_path / "ck")
    np.testing.assert_array_equal(np.asarray(params2["layers"]["q_proj"]),
                                  np.asarray(params["layers"]["q_proj"]))
