"""Automatic prefix caching: shared-prompt KV reuse across requests.

Beyond the reference (whose cache story is HF DynamicCache per request,
reference: models/rope_attn_fwd.py:90-93): requests whose prompts share a
page-aligned token prefix reuse the SAME physical KV pages — admission
prefills only the unseen suffix (one paged-extend forward over the cached
prefix), so repeated system prompts / few-shot preambles cost their KV
once per pool lifetime instead of once per request.

TPU-shaped split of responsibilities:
  * the ALLOCATOR (csrc/page_allocator.cpp + the Python lockstep twin)
    owns page lifetime via reference counts — a page is owned by every
    sequence table referencing it plus one count per cache pin; the free
    list holds exactly the refcount-0 pages;
  * this module owns the content map: an exact-key (structural prefix
    equality — no hash-collision wrong-KV risk) LRU from page-aligned
    token-block chains to page ids, holding one pin per entry;
  * the ENGINE grants lookups to the scheduler immediately before every
    admission (grants are advisory and re-derived each round, so eviction
    can never dangle), admits suffix-only, and inserts the new prompt's
    blocks once its admission completes.

Safety of sharing: KV at position p depends only on tokens 0..p (causal
attention, absolute RoPE positions), so identical aligned prefixes have
bit-identical KV; writers never touch shared blocks because a request's
first written position is >= its shared-prefix length (the engine caps
sharing at prompt_len - 1 so every admission re-extends at least one
token — an idempotent rewrite when it lands inside a shared page).
"""

from __future__ import annotations

from collections import OrderedDict


class PrefixCache:
    """Exact-key LRU over page-aligned prompt blocks.

    Entries map a block-chain key (structurally, the whole token prefix)
    to the page id holding that block's KV; each entry holds one
    scheduler pin. `sched` must expose pin_page/unpin_page (both the
    native and Python schedulers do).
    """

    def __init__(self, sched, page_size: int, max_entries: int = 0):
        self.sched = sched
        self.page_size = page_size
        self.max_entries = max_entries  # 0 = bounded by the pool itself
        self.entries: OrderedDict[tuple, int] = OrderedDict()
        self.hit_tokens = 0
        self.lookup_tokens = 0

    def __len__(self) -> int:
        return len(self.entries)

    def _chain(self, prompt: list[int], namespace: int = 0):
        """Yield (key, block_index) for each shareable full block: block k
        is shareable iff (k+1)*ps <= len(prompt) - 1 (always leave at
        least one suffix token for the admission forward to produce the
        first-token logits from). `namespace` partitions the cache — KV
        depends on the adapter under multi-LoRA serving, so each adapter
        id keys its own chains (no cross-adapter sharing, ever)."""
        key = (namespace,)
        ps = self.page_size
        for k in range((len(prompt) - 1) // ps):
            key = (key, tuple(prompt[k * ps : (k + 1) * ps]))
            yield key, k

    def lookup(self, prompt: list[int], namespace: int = 0) -> list[int]:
        """Longest cached page chain for this prompt (LRU-refreshed)."""
        pages: list[int] = []
        for key, _ in self._chain(prompt, namespace):
            page = self.entries.get(key)
            if page is None:
                break
            self.entries.move_to_end(key)
            pages.append(page)
        self.lookup_tokens += (len(prompt) - 1) // self.page_size * \
            self.page_size
        self.hit_tokens += len(pages) * self.page_size
        return pages

    def insert(self, prompt: list[int], table_row, namespace: int = 0
               ) -> int:
        """Register a freshly admitted prompt's blocks. `table_row` is the
        request's page table (block k's KV lives in table_row[k]).
        Returns the number of new entries pinned."""
        added = 0
        for key, k in self._chain(prompt, namespace):
            if key in self.entries:
                self.entries.move_to_end(key)
                continue
            page = int(table_row[k])
            if page <= 0:  # null page — nothing real to share
                continue
            if self.max_entries and len(self.entries) >= self.max_entries:
                self.evict(1)
            if self.sched.pin_page(page):
                self.entries[key] = page
                added += 1
        return added

    def evict(self, n: int) -> int:
        """Unpin the n least-recently-used entries. A page still
        referenced by live requests stays allocated (only its cache pin
        drops); a page nobody uses returns to the free list."""
        done = 0
        while self.entries and done < n:
            _, page = self.entries.popitem(last=False)
            self.sched.unpin_page(page)
            done += 1
        return done
