"""Bit-exact ports of the deterministic PRNGs used by the reference.

The reference (and its test suite) derives all randomized fixtures from
seeded generators; reproducing them bit-for-bit is required for
rank/score-identical parity (reference: scorer.ts:47-68, fusion.ts:679-694,
tests/wand.test.ts:13-20, tests/fusion.test.ts:438-443).

All generators return Python floats in [0, 1) identical to the JS values
(verified against node v20 golden draws in tests/test_prng.py).
"""

from __future__ import annotations

import math
from typing import Callable, List

_U32 = 0xFFFFFFFF


def mulberry32(seed: int) -> Callable[[], float]:
    """mulberry32 PRNG (reference scorer.ts:47-55).

    JS semantics: int32 state, Math.imul = 32-bit wrapping multiply,
    `>>>` = unsigned shift. All ops coincide with uint32 arithmetic.
    """
    s = seed & _U32

    def rng() -> float:
        nonlocal s
        s = (s + 0x6D2B79F5) & _U32
        t = ((s ^ (s >> 15)) * (s | 1)) & _U32
        t = (t + (((t ^ (t >> 7)) * (t | 61)) & _U32)) ^ t
        t &= _U32
        return ((t ^ (t >> 14)) & _U32) / 4294967296.0

    return rng


def sample_without_replacement(
    n: int, size: int, rng: Callable[[], float]
) -> List[int]:
    """Fisher–Yates shuffle sample (reference scorer.ts:57-68).

    Shuffles [0..n) from the end with `j = floor(rng() * (i + 1))`,
    then takes the first `size` entries.
    """
    arr = list(range(n))
    for i in range(n - 1, 0, -1):
        j = math.floor(rng() * (i + 1))
        arr[i], arr[j] = arr[j], arr[i]
    return arr[:size]


def rand_normal(rng: Callable[[], float]) -> float:
    """Box–Muller N(0,1) draw (reference fusion.ts:690-694).

    Consumes exactly two uniforms; `u1 || 1e-15` guards log(0).
    """
    u1 = rng()
    u2 = rng()
    if u1 == 0.0:
        u1 = 1e-15
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


def _to_int32(x: float) -> int:
    """ECMAScript ToInt32 of a float64 (used by the `& mask` in JS LCGs)."""
    if x != x or x in (float("inf"), float("-inf")):
        return 0
    n = int(x) & _U32  # int() truncates toward zero like JS
    return n - (1 << 32) if n >= (1 << 31) else n


def lcg_a(seed: int) -> Callable[[], float]:
    """LCG used by reference tests/wand.test.ts:13-20.

    JS: ``s = (s * 1103515245 + 12345) & 0x7fffffff; return s / 0x7fffffff``.
    The product is computed in float64 (JS number) before ToInt32 — the
    float rounding must be reproduced for bit parity.
    """
    s = seed

    def rng() -> float:
        nonlocal s
        s = _to_int32(float(s) * 1103515245.0 + 12345.0) & 0x7FFFFFFF
        return s / 0x7FFFFFFF

    return rng


def lcg_b(seed: int) -> Callable[[], float]:
    """LCG used by reference tests/fusion.test.ts:438-443.

    JS: ``s = (s * 1664525 + 1013904223) & 0xffffffff`` yields a SIGNED
    int32 (ToInt32); ``(s >>> 0) / 2**32`` reinterprets it as uint32.
    The signed value feeds the next multiply.
    """
    s = seed

    def rng() -> float:
        nonlocal s
        s = _to_int32(float(s) * 1664525.0 + 1013904223.0)
        return (s & _U32) / 4294967296.0

    return rng
