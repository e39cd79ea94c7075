"""Quantitative accuracy characterization of the native ANI estimator.

Synthetic genomes with exactly known substitution rates: the fragment-
containment ANI must track the true ANI closely across the operating
range, and the aligned fraction must track the truly-shared fraction.
This pins the estimator's error envelope (the reference's skani has a
documented >=85% ANI envelope, src/skani.rs:116-121; the decision
boundary cases that matter for clustering are 94-99%)."""

import numpy as np
import pytest

from galah_tpu.api import pairwise_ani
from galah_tpu.utils.synth import mutate, random_genome, write_fasta


@pytest.mark.parametrize("true_ani", [0.90, 0.95, 0.97, 0.99, 0.999])
def test_ani_accuracy(tmp_path, true_ani):
    rng = np.random.default_rng(int(true_ani * 1000))
    base = random_genome(rng, 300_000)
    mut = mutate(rng, base, true_ani)
    p1 = str(tmp_path / "a.fna")
    p2 = str(tmp_path / "b.fna")
    write_fasta(p1, base, "a")
    write_fasta(p2, mut, "b")
    est = pairwise_ani(p1, p2)
    assert est is not None
    # within 0.4 ANI percentage points of truth across the range
    assert abs(est - true_ani * 100.0) < 0.4, (true_ani, est)


@pytest.mark.parametrize("shared_frac", [0.3, 0.5, 0.8])
def test_aligned_fraction_accuracy(tmp_path, shared_frac):
    """Genomes sharing only a fraction of their sequence at high
    identity: ANI must stay high, AF must track the shared fraction
    (verified indirectly through the min-aligned-fraction decision)."""
    rng = np.random.default_rng(7)
    L = 300_000
    shared = random_genome(rng, int(L * shared_frac))
    a = np.concatenate([shared, random_genome(rng, L - len(shared))])
    b = np.concatenate([mutate(rng, shared, 0.99), random_genome(rng, L - len(shared))])
    p1 = str(tmp_path / "a.fna")
    p2 = str(tmp_path / "b.fna")
    write_fasta(p1, a, "a")
    write_fasta(p2, b, "b")

    from galah_tpu.api import ClusterParameters

    # passes when min AF below the shared fraction...
    est = pairwise_ani(
        p1, p2, ClusterParameters(min_aligned_fraction=shared_frac * 100 - 15)
    )
    assert est is not None and est > 98.0, (shared_frac, est)
    # ...fails when min AF above it
    est2 = pairwise_ani(
        p1, p2, ClusterParameters(min_aligned_fraction=shared_frac * 100 + 15)
    )
    assert est2 is None, (shared_frac, est2)


def test_unrelated_genomes_rejected(tmp_path):
    rng = np.random.default_rng(3)
    p1 = str(tmp_path / "a.fna")
    p2 = str(tmp_path / "b.fna")
    write_fasta(p1, random_genome(rng, 200_000), "a")
    write_fasta(p2, random_genome(rng, 200_000), "b")
    assert pairwise_ani(p1, p2) is None
