"""--ani-semantics skani-calibrated: threshold calibration for the
documented indel bias (VERDICT round 3 item 4).

The native estimator's window ANI reads lower than gap-excluded
(skani-style) ANI by p_indel*(k+len-1)/k per unit divergence
(theory-pinned in tests/test_estimator_stress.py). With
skani-calibrated semantics, `--ani X` must reproduce the cuts a
gap-excluded oracle makes on indel-bearing genomes — including pairs
that window semantics misclassifies. Reference threshold semantics:
src/skani.rs:718-788 (gap-excluded chaining ANI).
"""

import os
import tempfile

import numpy as np
import pytest

from galah_tpu import defaults
from galah_tpu.engines.native import calibrated_ani_threshold


def test_calibrated_threshold_math():
    k = 15
    c = 0.1 * (k + 3.0 - 1.0) / k
    assert calibrated_ani_threshold(95.0, "window", k) == 95.0
    got = calibrated_ani_threshold(95.0, "skani-calibrated", k)
    assert got == pytest.approx(95.0 - c * 5.0)
    # monotone: ordering of thresholds is preserved
    lo = calibrated_ani_threshold(90.0, "skani-calibrated", k)
    hi = calibrated_ani_threshold(99.0, "skani-calibrated", k)
    assert lo < got < hi
    # identity at 100 (no divergence, no bias)
    assert calibrated_ani_threshold(100.0, "skani-calibrated", k) == 100.0
    with pytest.raises(ValueError):
        calibrated_ani_threshold(95.0, "nonsense", k)


def _write(path, seq: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(b">c0\n")
        f.write(seq.tobytes())
        f.write(b"\n")


@pytest.mark.parametrize("threshold", [95.0])
def test_calibrated_clusters_match_gap_excluded_oracle(threshold, monkeypatch):
    """Synthetic corpus with realistic indel loads (0.1 events/sub,
    mean len 3): members straddle the 95% gap-excluded cut. Clustering
    with --ani-semantics skani-calibrated must group exactly the
    members whose TRUE gap-excluded ANI >= 95 with their family rep;
    default window semantics drops the just-above-threshold members
    (the bias pushes their estimate below 95), which this test also
    pins so the flag's effect stays visible."""
    from galah_tpu.cli.main import main
    from galah_tpu.utils.synth import mutate_indels, random_genome

    rng = np.random.default_rng(42)
    td = tempfile.mkdtemp(prefix="galah-semantics-")
    base = random_genome(rng, 400_000)
    names = {}
    paths = []

    def add(name, seq):
        p = os.path.join(td, name + ".fna")
        _write(p, seq)
        names[name] = p
        paths.append(p)

    add("rep", base)
    oracle_in = {"rep"}
    # gap-excluded true ANI just above / just below the threshold
    for nm, true_ani in (
        ("in_9560", 0.9560), ("in_9525", 0.9525),
        ("out_9440", 0.9440), ("out_9470", 0.9470),
    ):
        mut, oracle_ani = mutate_indels(
            rng, base, true_ani,
            indel_events_per_sub=defaults.CALIBRATION_INDEL_EVENTS_PER_SUB,
            mean_indel_len=defaults.CALIBRATION_MEAN_INDEL_LEN,
        )
        add(nm, mut)
        if oracle_ani >= threshold:
            oracle_in.add(nm)
    assert oracle_in == {"rep", "in_9560", "in_9525"}
    # an unrelated genome must stay out under both semantics
    add("unrelated", random_genome(rng, 400_000))

    def cluster(semantics):
        out = os.path.join(td, f"clusters_{semantics}.tsv")
        rc = main([
            "cluster", "-f", *paths,
            "--ani", str(threshold),
            "--precluster-ani", "90",
            "--ani-semantics", semantics,
            "--output-cluster-definition", out, "-q",
        ])
        assert rc == 0
        rep_of = {}
        with open(out) as f:
            for line in f:
                rep, member = line.rstrip("\n").split("\t")
                rep_of[os.path.basename(member).rsplit(".", 1)[0]] = rep
        rep_cluster = {
            m for m, r in rep_of.items() if r == rep_of["rep"]
        }
        return rep_cluster

    calibrated = cluster("skani-calibrated")
    assert calibrated == oracle_in, calibrated

    window = cluster("window")
    # window semantics reads ~0.5 points low at this divergence: the
    # borderline true-95.25 member falls out of the rep's cluster.
    assert "in_9525" not in window, window
    assert "unrelated" not in window
