"""Correctness at scale with ground-truth families: synthetic genomes
with known mutation rates must cluster exactly by family."""

import numpy as np
import pytest

from galah_tpu.cli.main import main
from galah_tpu.utils.synth import make_families, mutate, random_genome, write_fasta


def test_family_recovery(tmp_path):
    paths, family_ids = make_families(
        str(tmp_path / "genomes"),
        n_families=6,
        members_per_family=4,
        genome_length=120_000,
        within_ani=0.98,
        seed=7,
    )
    out = tmp_path / "clusters.tsv"
    rc = main([
        "cluster", "--genome-fasta-files", *paths,
        "--ani", "95",
        "--output-cluster-definition", str(out),
        "-q",
    ])
    assert rc == 0
    # map member -> rep from output
    rep_of = {}
    with open(out) as f:
        for line in f:
            rep, member = line.rstrip("\n").split("\t")
            rep_of[member] = rep
    assert len(rep_of) == len(paths)
    # same family <=> same rep
    by_family = {}
    for p, fam in zip(paths, family_ids):
        by_family.setdefault(fam, set()).add(rep_of[p])
    assert all(len(reps) == 1 for reps in by_family.values()), by_family
    all_reps = {next(iter(r)) for r in by_family.values()}
    assert len(all_reps) == 6  # no cross-family merging


def test_threshold_separates_strains(tmp_path):
    """At 99% threshold, 97%-ANI members split from the base; at 95%
    they merge."""
    rng = np.random.default_rng(3)
    base = random_genome(rng, 150_000)
    d = tmp_path / "g"
    d.mkdir()
    p_base = str(d / "base.fna")
    write_fasta(p_base, base, "base")
    p_close = str(d / "close.fna")  # ~99.6% ANI
    write_fasta(p_close, mutate(rng, base, 0.996), "close")
    p_far = str(d / "far.fna")      # ~97% ANI
    write_fasta(p_far, mutate(rng, base, 0.97), "far")

    out95 = tmp_path / "c95.tsv"
    main(["cluster", "-f", p_base, p_close, p_far, "--ani", "95",
          "--output-cluster-definition", str(out95), "-q"])
    assert len(open(out95).read().splitlines()) == 3  # one cluster of 3

    out99 = tmp_path / "c99.tsv"
    main(["cluster", "-f", p_base, p_close, p_far, "--ani", "99",
          "--output-cluster-definition", str(out99), "-q"])
    lines = open(out99).read().splitlines()
    # base+close together; far alone
    assert len(lines) == 3
    rep_of = dict(line.split("\t")[::-1] for line in lines)
    assert rep_of[p_close] == p_base
    assert rep_of[p_far] == p_far


def test_contig_family_recovery(tmp_path):
    """--cluster-contigs --small-contigs on a synthetic viral/plasmid-
    style corpus: contigs must cluster exactly by family."""
    from galah_tpu.utils.synth import make_contig_corpus

    path = str(tmp_path / "contigs.fna")
    names, fams = make_contig_corpus(
        path, n_families=40, members_per_family=5,
        contig_length=5_000, within_ani=0.98, seed=5,
    )
    out = tmp_path / "clusters.tsv"
    rc = main([
        "cluster", "--cluster-contigs", "--small-contigs",
        "--genome-fasta-files", path,
        "--ani", "95",
        "--output-cluster-definition", str(out), "-q",
    ])
    assert rc == 0
    rep_of = {}
    with open(out) as f:
        for line in f:
            rep, member = line.rstrip("\n").split("\t")
            rep_of[member] = rep
    assert len(rep_of) == len(names)
    by_family = {}
    for n, fam in zip(names, fams):
        by_family.setdefault(fam, set()).add(rep_of[n])
    assert all(len(r) == 1 for r in by_family.values())
    assert len({next(iter(r)) for r in by_family.values()}) == 40


@pytest.mark.skipif(
    not __import__("os").environ.get("GALAH_TPU_SCALE_TESTS"),
    reason="set GALAH_TPU_SCALE_TESTS=1 for the 1k strain-level shape",
)
def test_strain_level_1k_at_99(tmp_path):
    """BASELINE config #2: 1k MAGs, strain-level dereplication at
    --ani 99 with the precluster prefilter. 128 species x 2 strains
    (~96% pairwise, must stay separate) x 4 members (~99.4% pairwise,
    must merge) -> exactly 256 clusters of 4."""
    from galah_tpu.utils.synth import make_strains

    paths, strain_ids = make_strains(
        str(tmp_path / "genomes"),
        n_species=128,
        strains_per_species=2,
        members_per_strain=4,
        genome_length=200_000,
        seed=13,
    )
    assert len(paths) == 1024
    out = tmp_path / "clusters.tsv"
    rc = main([
        "cluster", "--genome-fasta-files", *paths,
        "--ani", "99", "--precluster-ani", "95",
        "--output-cluster-definition", str(out), "-q",
    ])
    assert rc == 0
    rep_of = {}
    with open(out) as f:
        for line in f:
            rep, member = line.rstrip("\n").split("\t")
            rep_of[member] = rep
    by_strain = {}
    for p, sid in zip(paths, strain_ids):
        by_strain.setdefault(sid, set()).add(rep_of[p])
    assert all(len(r) == 1 for r in by_strain.values()), {
        k: v for k, v in by_strain.items() if len(v) > 1
    }
    assert len({next(iter(r)) for r in by_strain.values()}) == 256
