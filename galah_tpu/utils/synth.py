"""Synthetic genome generation with known ground-truth ANI.

Used by correctness-at-scale tests and benchmarks: random base genomes
plus per-family mutated copies at controlled substitution rates, so the
expected clustering is known exactly."""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng: np.random.Generator, length: int) -> np.ndarray:
    return _BASES[rng.integers(0, 4, size=length)]


def mutate(
    rng: np.random.Generator, genome: np.ndarray, ani: float
) -> np.ndarray:
    """Point-substitute bases at rate (1 - ani)."""
    out = genome.copy()
    n_mut = rng.binomial(len(genome), 1.0 - ani)
    pos = rng.choice(len(genome), size=n_mut, replace=False)
    # substitute with a *different* base
    shift = rng.integers(1, 4, size=n_mut).astype(np.uint8)
    code = np.searchsorted(_BASES, out[pos])
    out[pos] = _BASES[(code + shift) % 4]
    return out


def write_fasta(path: str, seq: np.ndarray, name: str, width: int = 80) -> None:
    with open(path, "w") as f:
        f.write(f">{name}\n")
        b = seq.tobytes()
        for i in range(0, len(b), width):
            f.write(b[i : i + width].decode("ascii"))
            f.write("\n")


def make_contig_corpus(
    path: str,
    n_families: int,
    members_per_family: int,
    contig_length: int = 5_000,
    within_ani: float = 0.98,
    seed: int = 0,
) -> Tuple[List[str], List[int]]:
    """One multi-contig FASTA of related contig families (the viral/
    plasmid --cluster-contigs workload). Returns (contig_names,
    family_id_per_contig)."""
    rng = np.random.default_rng(seed)
    names: List[str] = []
    family_ids: List[int] = []
    with open(path, "w") as f:
        for fam in range(n_families):
            base = random_genome(rng, contig_length)
            for m in range(members_per_family):
                seq = base if m == 0 else mutate(rng, base, within_ani)
                name = f"fam{fam}_c{m}"
                f.write(f">{name}\n")
                b = seq.tobytes()
                for i in range(0, len(b), 80):
                    f.write(b[i : i + 80].decode("ascii"))
                    f.write("\n")
                names.append(name)
                family_ids.append(fam)
    return names, family_ids


def make_families(
    directory: str,
    n_families: int,
    members_per_family: int,
    genome_length: int = 200_000,
    within_ani: float = 0.98,
    seed: int = 0,
) -> Tuple[List[str], List[int]]:
    """Generate families of related genomes. Returns (paths,
    family_id_per_path). Unrelated families are random sequences (ANI
    effectively ~25% k-mer-wise: no sharing)."""
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths: List[str] = []
    family_ids: List[int] = []
    for fam in range(n_families):
        base = random_genome(rng, genome_length)
        for m in range(members_per_family):
            seq = base if m == 0 else mutate(rng, base, within_ani)
            p = os.path.join(directory, f"fam{fam}_m{m}.fna")
            write_fasta(p, seq, f"fam{fam}_m{m}")
            paths.append(p)
            family_ids.append(fam)
    return paths, family_ids


def make_strains(
    directory: str,
    n_species: int,
    strains_per_species: int,
    members_per_strain: int,
    genome_length: int = 200_000,
    strain_ani: float = 0.98,
    within_ani: float = 0.997,
    seed: int = 0,
) -> Tuple[List[str], List[int]]:
    """Two-level corpus for strain-resolution workloads (BASELINE
    config #2: 1k MAGs dereplicated at 99% ANI): each species has
    `strains_per_species` strains at ~strain_ani to the species base
    (pairwise strain-strain ANI ~ 1-2*(1-strain_ani), well below a 99%
    threshold), and each strain has members at ~within_ani to the
    strain base (pairwise ~99.4% at the default — above it). Returns
    (paths, strain_id_per_path); exact dereplication recovers one
    cluster per strain."""
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(seed)
    paths: List[str] = []
    strain_ids: List[int] = []
    sid = 0
    for sp in range(n_species):
        species_base = random_genome(rng, genome_length)
        for st in range(strains_per_species):
            strain_base = mutate(rng, species_base, strain_ani)
            for m in range(members_per_strain):
                seq = strain_base if m == 0 else mutate(rng, strain_base, within_ani)
                p = os.path.join(directory, f"sp{sp}_st{st}_m{m}.fna")
                write_fasta(p, seq, f"sp{sp}_st{st}_m{m}")
                paths.append(p)
                strain_ids.append(sid)
            sid += 1
    return paths, strain_ids
