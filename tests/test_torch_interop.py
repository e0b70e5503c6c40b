"""HF torch models patched onto the JAX attention (interop layer).

Validates the reference's integration contract (reference:
models/patch_llama.py, models/rope_attn_fwd.py) end to end: a patched HF
model must reproduce the unpatched model's logits and greedy generation.
"""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from flash_attention_cute_tpu.interop import torch_patch


@pytest.fixture
def patched_llama():
    from transformers.models.llama import modeling_llama

    orig = modeling_llama.LlamaAttention.forward
    torch_patch.patch_llama()
    yield
    modeling_llama.LlamaAttention.forward = orig


@pytest.fixture
def patched_qwen2():
    from transformers.models.qwen2 import modeling_qwen2

    orig = modeling_qwen2.Qwen2Attention.forward
    torch_patch.patch_qwen2()
    yield
    modeling_qwen2.Qwen2Attention.forward = orig


def tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(0)
    with torch.device("cpu"):
        return transformers.LlamaForCausalLM(cfg).eval()


def tiny_qwen2():
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=112,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(1)
    with torch.device("cpu"):
        return transformers.Qwen2ForCausalLM(cfg).eval()


def test_patched_llama_logits_match(patched_llama):
    model = tiny_llama()
    ids = torch.tensor([[1, 5, 9, 2, 7, 3, 11, 4]])
    with torch.no_grad():
        got = model(ids).logits.float().numpy()

    from transformers.models.llama import modeling_llama
    orig_fwd = modeling_llama.LlamaAttention.forward
    modeling_llama.LlamaAttention.forward = (
        test_patched_llama_logits_match._orig
    )
    try:
        with torch.no_grad():
            want = model(ids).logits.float().numpy()
    finally:
        modeling_llama.LlamaAttention.forward = orig_fwd
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_patched_qwen2_generate_matches(patched_qwen2):
    model = tiny_qwen2()
    ids = torch.tensor([[3, 1, 4, 1, 5, 9]])
    with torch.no_grad():
        got = model.generate(
            ids, max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()

    from transformers.models.qwen2 import modeling_qwen2
    orig_fwd = modeling_qwen2.Qwen2Attention.forward
    modeling_qwen2.Qwen2Attention.forward = (
        test_patched_qwen2_generate_matches._orig
    )
    try:
        with torch.no_grad():
            want = model.generate(
                ids, max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            ).numpy()
    finally:
        modeling_qwen2.Qwen2Attention.forward = orig_fwd
    np.testing.assert_array_equal(got, want)


def _stash_originals():
    from transformers.models.llama import modeling_llama
    from transformers.models.qwen2 import modeling_qwen2

    test_patched_llama_logits_match._orig = modeling_llama.LlamaAttention.forward
    test_patched_qwen2_generate_matches._orig = (
        modeling_qwen2.Qwen2Attention.forward
    )


_stash_originals()
