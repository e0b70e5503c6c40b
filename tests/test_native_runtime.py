"""Native (C++) runtime components vs the pure-Python reference.

The native tier (csrc/page_allocator.cpp + ctypes loader runtime/native.py)
must stay in lockstep with runtime/paged_cache.py::PageAllocator — same
free-list order, same OOM behavior, same page-table rows — so either can
serve the engine. The scheduler's FCFS + preemption policy is exercised
directly.
"""

import numpy as np
import pytest

from flash_attention_cute_tpu.runtime.paged_cache import PageAllocator

native = pytest.importorskip("flash_attention_cute_tpu.runtime.native")

if native.load() is None:
    pytest.skip("native library unavailable", allow_module_level=True)


def test_allocator_lockstep_with_python():
    py = PageAllocator(num_pages=16, page_size=8, pages_per_seq=6)
    cc = native.NativePageAllocator(16, 8, 6)

    rng = np.random.default_rng(0)
    live = []
    for step in range(200):
        if live and rng.random() < 0.3:
            sid = live.pop(rng.integers(len(live)))
            py.release(sid)
            cc.release(sid)
        else:
            sid = step
            cur = int(rng.integers(0, 40))
            new = int(rng.integers(1, 30))
            ok_py = py.allocate(sid, cur, new)
            ok_cc = cc.allocate(sid, cur, new)
            assert ok_py == ok_cc, (step, cur, new)
            if ok_py:
                live.append(sid)
        assert py.num_free == cc.num_free, step
        for sid in live:
            np.testing.assert_array_equal(py.table_row(sid), cc.table_row(sid))


def test_allocator_pages_needed():
    cc = native.NativePageAllocator(64, 16, 32)
    py = PageAllocator(64, 16, 32)
    for cur in (0, 1, 15, 16, 17, 100):
        for new in (1, 15, 16, 33):
            assert cc.pages_needed(cur, new) == py.pages_needed(cur, new)


def test_scheduler_fcfs_admission_and_completion():
    # 15 usable pages (page 0 reserved), page_size 4, 2 slots.
    s = native.NativeScheduler(16, 4, 8, slots=2)
    s.submit(100, prompt_len=8, max_new_tokens=3)   # 2 pages
    s.submit(101, prompt_len=4, max_new_tokens=2)   # 1 page
    s.submit(102, prompt_len=4, max_new_tokens=1)   # waits for a slot
    assert s.admit() == 2
    assert s.slot_id(0) == 100 and s.slot_id(1) == 101
    assert s.num_waiting == 1

    done = {}
    for _ in range(10):
        for slot in range(2):
            if s.slot_id(slot) == -1:
                continue
            r = s.step_slot(slot)
            assert r == 1
            if s.finished(slot):
                done[s.slot_id(slot)] = s.slot_generated(slot)
                s.release_slot(slot, requeue=False)
        s.admit()
        if len(done) == 3:
            break
    assert done == {100: 3, 101: 2, 102: 1}
    assert s.num_waiting == 0


def test_scheduler_preemption_on_page_exhaustion():
    # 3 usable pages, page_size 4: two requests of 1 page each admit; their
    # decode growth exhausts pages; youngest must be preempted and later
    # finish after the older one releases.
    s = native.NativeScheduler(4, 4, 4, slots=2)
    s.submit(1, prompt_len=4, max_new_tokens=6)  # 1 page, grows to 3
    s.submit(2, prompt_len=4, max_new_tokens=6)
    assert s.admit() == 2

    finished = []
    for _ in range(50):
        for slot in range(2):
            if s.slot_id(slot) == -1:
                continue
            r = s.step_slot(slot)
            if r == 0:  # decode OOM -> preempt the youngest
                victim = s.preempt_youngest()
                assert victim != -1
                continue
            if s.finished(slot):
                finished.append(s.slot_id(slot))
                s.release_slot(slot, requeue=False)
        s.admit()
        if len(finished) == 2:
            break
    assert sorted(finished) == [1, 2]
    # all pages back in the pool
    assert s.num_free_pages == 3


def test_make_page_allocator_prefers_native():
    a = native.make_page_allocator(8, 4, 4)
    assert isinstance(a, native.NativePageAllocator)


def test_scheduler_lockstep_with_python():
    """Random-driven parity: the C++ scheduler and the Python fallback
    must make IDENTICAL decisions (admission, step results, preemption
    victims, slot assignments) for the same request stream."""
    from flash_attention_cute_tpu.runtime.engine import _PyScheduler

    def mk():
        return (
            native.NativeScheduler(12, 4, 8, slots=3),
            _PyScheduler(12, 4, 8, slots=3),
        )

    cc, py = mk()
    rng = np.random.default_rng(7)
    next_id = 0
    for step in range(300):
        op = rng.random()
        if op < 0.25:
            plen = int(rng.integers(1, 20))
            mnew = int(rng.integers(1, 10))
            cc.submit(next_id, plen, mnew)
            py.submit(next_id, plen, mnew)
            next_id += 1
        elif op < 0.45:
            assert cc.admit() == py.admit()
        elif op < 0.85:
            s = int(rng.integers(0, 3))
            assert cc.step_slot(s) == py.step_slot(s), step
        elif op < 0.95:
            assert cc.preempt_youngest() == py.preempt_youngest(), step
        else:
            s = int(rng.integers(0, 3))
            assert cc.finished(s) == py.finished(s)
            if cc.finished(s):
                cc.release_slot(s, requeue=False)
                py.release_slot(s, requeue=False)
        assert cc.num_waiting == py.num_waiting, step
        assert cc.num_free_pages == py.num_free_pages, step
        for s in range(3):
            assert cc.slot_id(s) == py.slot_id(s), (step, s)
            assert cc.slot_generated(s) == py.slot_generated(s), (step, s)
