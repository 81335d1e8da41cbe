"""Bit-exactness tests for the PRNG ports.

Golden values generated with node v20 running the exact JS definitions
from the reference (scorer.ts:47-68, fusion.ts:679-694,
tests/wand.test.ts:13-20, tests/fusion.test.ts:438-443).
"""

import math

from bayesian_bm25_js_spark.functions.prng import (
    lcg_a,
    lcg_b,
    mulberry32,
    rand_normal,
    sample_without_replacement,
)

GOLDEN_MULBERRY_42 = [
    0.6011037519201636,
    0.44829055899754167,
    0.8524657934904099,
    0.6697340414393693,
    0.17481389874592423,
    0.5265925421845168,
    0.2732279943302274,
    0.6247446539346129,
]
GOLDEN_MULBERRY_0 = [
    0.26642920868471265,
    0.0003297457005828619,
    0.2232720274478197,
    0.1462021479383111,
]
GOLDEN_NORMAL_0 = [
    1.6264323081902676,
    1.050995844218513,
    -1.1843874017541418,
    -0.5844050192405411,
]
GOLDEN_LCG_A_42 = [
    0.5823075899771916,
    0.5198186638391664,
    0.9149397615878563,
    0.698715567914171,
    0.7530812028576999,
    0.6894334557882666,
]
GOLDEN_LCG_B_42 = [
    0.2523451747838408,
    0.08812504541128874,
    0.5772811982315034,
    0.22255426598712802,
    0.37566019711084664,
    0.02566390484571457,
]


def test_mulberry32_seed42_bit_exact():
    rng = mulberry32(42)
    assert [rng() for _ in range(8)] == GOLDEN_MULBERRY_42


def test_mulberry32_seed0_bit_exact():
    rng = mulberry32(0)
    assert [rng() for _ in range(4)] == GOLDEN_MULBERRY_0


def test_fisher_yates_small_and_large():
    assert sample_without_replacement(6, 6, mulberry32(42)) == [1, 0, 4, 5, 2, 3]
    assert sample_without_replacement(100, 10, mulberry32(42)) == [
        99, 53, 7, 93, 70, 30, 68, 67, 52, 15,
    ]


def test_box_muller_bit_exact():
    rng = mulberry32(0)
    draws = [rand_normal(rng) for _ in range(4)]
    # sqrt/log/cos may differ from V8 by <=1 ulp; allow 1e-15 relative.
    for got, want in zip(draws, GOLDEN_NORMAL_0):
        assert math.isclose(got, want, rel_tol=1e-14, abs_tol=1e-15)


def test_lcg_a_bit_exact():
    rng = lcg_a(42)
    assert [rng() for _ in range(6)] == GOLDEN_LCG_A_42


def test_lcg_b_bit_exact():
    rng = lcg_b(42)
    assert [rng() for _ in range(6)] == GOLDEN_LCG_B_42


def test_mulberry32_range():
    rng = mulberry32(123456789)
    for _ in range(1000):
        v = rng()
        assert 0.0 <= v < 1.0
