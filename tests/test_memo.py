"""memo_program — the driver-program memoizer (core/memo.py).

Pure-Python cache-policy tests: the LRU bound keeps live compiled
executables per builder under MEMO_CAPACITY (XLA:CPU dies past ~250 live
executables in one process — tests/README.md), recency refresh keeps the
active sweep's program resident, and unhashable statics degrade to
uncached calls instead of erroring.
"""

from altair_tpu.core import memo
from altair_tpu.core.memo import clear_memo, memo_program


def _counting_builder():
    calls = []

    @memo_program
    def build(*args):
        calls.append(args)
        return object()

    return build, calls


def test_hit_returns_same_program():
    build, calls = _counting_builder()
    a = build(1, "x")
    assert build(1, "x") is a
    assert len(calls) == 1


def test_capacity_bound_evicts_lru(monkeypatch):
    monkeypatch.setattr(memo, "MEMO_CAPACITY", 3)
    build, calls = _counting_builder()
    progs = [build(i) for i in range(3)]
    assert len(build.cache) == 3
    # touch key 0 so it becomes most-recent, then insert a 4th:
    assert build(0) is progs[0]
    build(99)
    assert len(build.cache) == 3
    assert build(0) is progs[0]          # refreshed key survived
    assert build(1) is not progs[1]      # least-recent key 1 was evicted
    assert len(calls) == 5               # 0,1,2,99, rebuilt 1


def test_unhashable_static_is_uncached():
    build, calls = _counting_builder()
    build([1, 2])
    build([1, 2])
    assert len(calls) == 2 and len(build.cache) == 0


def test_clear_memo_empties_registered_caches():
    build, _ = _counting_builder()
    build(7)
    assert build.cache
    clear_memo()
    assert not build.cache
