"""Real-TPU smoke test: compile + run both kernels on the attached chip."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from flash_attention_cute_tpu import flash_attn_func
from flash_attention_cute_tpu.ops.reference import attention_reference

print("backend:", jax.default_backend(), jax.devices())

ks = jax.random.split(jax.random.key(0), 3)
B, HQ, HKV, S, D = 1, 8, 2, 1024, 128
q = jax.random.normal(ks[0], (B, HQ, S, D), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32).astype(jnp.bfloat16)

t0 = time.time()
out = flash_attn_func(q, k, v, causal=True)
out.block_until_ready()
print(f"prefill compile+run {time.time()-t0:.1f}s")
ref = attention_reference(q, k, v, causal=True)
err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
print("prefill max err vs fp32 ref:", err)
assert err < 3e-2, err

qd = q[:, :, :1]
t0 = time.time()
outd = flash_attn_func(qd, k, v, causal=True,
                       kv_length=jnp.array([700], jnp.int32))
outd.block_until_ready()
print(f"decode compile+run {time.time()-t0:.1f}s")
refd = attention_reference(qd, k, v, causal=False,
                           kv_length=jnp.array([700], jnp.int32))
errd = float(jnp.abs(outd.astype(jnp.float32) - refd.astype(jnp.float32)).max())
print("decode max err vs fp32 ref:", errd)
assert errd < 3e-2, errd
print("TPU SMOKE OK")
