"""Library API tests (the CoverM-embedding analog surface)."""

import pytest
from conftest import data

from galah_tpu.api import (
    ClusterParameters,
    cluster_contigs,
    cluster_genomes,
    pairwise_ani,
)


def test_cluster_genomes():
    genomes = [
        data("abisko4/73.20120800_S1X.13.fna"),
        data("abisko4/73.20120600_S2D.19.fna"),
        data("abisko4/73.20120700_S3X.12.fna"),
        data("abisko4/73.20110800_S2D.13.fna"),
    ]
    res = cluster_genomes(genomes, ClusterParameters(ani=99))
    assert sorted(sorted(c) for c in res.clusters) == [[0, 1, 3], [2]]
    assert res.representatives[0] == genomes[0]
    assert res.memberships()[0][0] == genomes[0]


def test_cluster_contigs_api():
    res = cluster_contigs(
        [data("contigs/contigs.fna")],
        ClusterParameters(small_genomes=False),
    )
    assert res.memberships() == [
        ["73.20110600_S2D.10_contig_13024", "73.20110600_S2D.10_contig_13024_2"],
        ["73.20110600_S2D.10_contig_50844"],
        ["73.20110600_S2D.10_contig_37820"],
    ]


def test_pairwise_ani():
    ani = pairwise_ani(data("set1/500kb.fna"), data("set1/1mbp.fna"))
    assert ani == pytest.approx(100.0, abs=0.2)
    far = pairwise_ani(
        data("set1/1mbp.fna"), data("antonio_mags/BE_RX_R2_MAG52.fna")
    )
    assert far is None  # aligned fraction fails


def test_reference_mode_api():
    res = cluster_genomes(
        [data("set1/1mbp.fna"), data("set1/500kb.fna")],
        reference_genomes=[data("set1/1mbp.fna")],
    )
    # cross-group pair only: 500kb joins the 1mbp reference
    assert res.memberships() == [
        [data("set1/1mbp.fna"), data("set1/500kb.fna")],
    ]
