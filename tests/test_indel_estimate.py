"""Apparent indel-load estimator (calibration honesty, VERDICT r4 #8).

Two synthetic corpora at the same divergence but different indel
loads must separate. The estimator's documented resolution is coarse
(the identity-dispersion signal of length-3 indels is small compared
with the variance estimator's own noise), so the corpora test the
regime the statistic exists for: substitutions-only vs a heavy
long-indel load, asserting separation and direction, not precision.
"""

import numpy as np
import pytest

from galah_tpu.ops.indel_estimate import estimate_indel_load
from galah_tpu.sketch.fracminhash import (
    NativeSketchParams,
    sketch_sequences_native,
)
from galah_tpu.utils.synth import mutate, mutate_indels, random_genome


def _estimate(members):
    sks = [
        sketch_sequences_native(f"g{i}", [seq.tobytes()], NativeSketchParams())
        for i, seq in enumerate(members)
    ]
    pairs = [(0, i) for i in range(1, len(members))]
    return estimate_indel_load(
        pairs, lambda i: sks[i], NativeSketchParams()
    )


@pytest.fixture(scope="module")
def loads():
    rng = np.random.default_rng(77)
    base = random_genome(rng, 300_000)
    subs_only = [base] + [mutate(rng, base, 0.995) for _ in range(8)]
    base2 = random_genome(rng, 300_000)
    indel_heavy = [base2] + [
        mutate_indels(
            rng, base2, 0.995, indel_events_per_sub=2.0, mean_indel_len=10
        )[0]
        for _ in range(8)
    ]
    a = _estimate(subs_only)
    b = _estimate(indel_heavy)
    assert a is not None and b is not None
    return a, b


def test_subs_only_corpus_reads_near_baseline(loads):
    a, _ = loads
    # Dispersion consistent with the substitution-only MC model.
    assert a["dispersion_excess"] < 1.15
    assert a["apparent_indel_events_per_sub"] < 0.6
    assert a["pairs_used"] >= 6


def test_heavy_indel_corpus_reads_clearly_higher(loads):
    a, b = loads
    assert b["dispersion_excess"] > a["dispersion_excess"] + 0.12
    assert (
        b["apparent_indel_events_per_sub"]
        > a["apparent_indel_events_per_sub"] + 0.5
    )
    # The pooled dispersion moves in the physical direction: indels
    # destroy more k-mer windows per event than substitutions.
    assert b["mark_ratio"] > a["mark_ratio"]


def test_no_signal_returns_none():
    """Identical genomes (no mutation events) carry no signal."""
    rng = np.random.default_rng(5)
    base = random_genome(rng, 150_000)
    res = _estimate([base, base.copy()])
    assert res is None
