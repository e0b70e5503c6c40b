"""Data-parallel serving: one TP replica per 'data' slice of the mesh.

The round-1 engine was TP-only (`ServingEngine` asserts the mesh has no
data axis): weights, page pool and slot metadata are replicated or
model-sharded, so a data axis had nothing to shard. The DP design for
serving is therefore *replica parallelism* — the standard production
layout (the reference has no serving stack at all; its model-parallel
story is HF `device_map="auto"`, reference: scripts/benchmark_llm.py:136):

  * the ('data', 'model') mesh is split into `data` independent TP
    submeshes (one row of devices each);
  * each replica runs a full `ServingEngine` (own page pool, own
    scheduler, own compiled programs) over its submesh;
  * a SHARED admission queue routes each incoming request to the replica
    with the least outstanding work (prompt + budget tokens), so load
    balances across replicas while each request's tokens stay on one
    replica (no cross-replica KV traffic — KV never rides DCN).

Throughput scales with `data`; per-request latency matches the TP engine.
"""

from __future__ import annotations

import numpy as np

from flash_attention_cute_tpu.runtime.engine import ServingEngine


class DataParallelServingEngine:
    """Shared-queue, least-loaded routing over per-data-shard TP engines.

    Accepts the same keyword arguments as `ServingEngine` (slots,
    num_pages, ... are PER REPLICA) plus the full ('data', 'model') mesh.
    A mesh without a data axis (or data == 1) degenerates to a single
    TP engine.
    """

    def __init__(self, params, cfg, *, mesh, **engine_kwargs):
        from jax.sharding import Mesh

        shape = dict(mesh.shape)
        data = shape.get("data", 1)
        assert "model" in shape, mesh.shape
        self.replicas: list[ServingEngine] = []
        # mesh.devices is [data, model]; each row is one replica's TP mesh.
        devices = np.asarray(mesh.devices).reshape(data, shape["model"])
        for i in range(data):
            sub = Mesh(devices[i], ("model",))
            self.replicas.append(
                ServingEngine(params, cfg, mesh=sub, **engine_kwargs)
            )
        self._route: dict[int, int] = {}  # req_id -> replica index
        self._load = [0] * data  # outstanding tokens (prompt + budget)

    @property
    def num_replicas(self) -> int:
        return len(self.replicas)

    def submit(self, req_id: int, prompt: list[int], max_new_tokens: int):
        assert req_id not in self._route
        i = int(np.argmin(self._load))
        self._route[req_id] = i
        self._load[i] += len(prompt) + max_new_tokens
        self.replicas[i].submit(req_id, prompt, max_new_tokens)

    def step(self) -> bool:
        busy = False
        for eng in self.replicas:
            busy |= eng.step()
        return busy

    def run(self, max_steps: int = 100000) -> dict[int, list[int]]:
        results: dict[int, list[int]] = {}
        for eng in self.replicas:
            results.update(eng.run(max_steps))
        for rid in results:
            i = self._route.get(rid)
            if i is not None:
                req_len = len(results[rid])
                self._load[i] = max(0, self._load[i] - req_len)
        return results

    @property
    def failed(self) -> list[int]:
        out: list[int] = []
        for eng in self.replicas:
            out.extend(eng.failed)
        return out

    @property
    def stats(self) -> dict:
        keys = self.replicas[0].stats.keys()
        return {
            k: sum(eng.stats[k] for eng in self.replicas) for k in keys
        }
