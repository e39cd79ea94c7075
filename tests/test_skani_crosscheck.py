"""Cross-check native ANI/AF against a real skani binary, per pair, on
the abisko4 MAGs. Skipped when skani is absent (as on this rig — see
BASELINE.md); on machines with skani it bounds estimator disagreement
directly rather than inferring it from cluster goldens."""

import shutil

import pytest
from conftest import data


@pytest.mark.skipif(
    shutil.which("skani") is None, reason="skani binary not installed"
)
def test_native_matches_skani_per_pair():
    import glob

    from benchmarks.skani_crosscheck import run_native, run_skani

    genomes = sorted(glob.glob(data("abisko4/*.fna")))
    skani = run_skani(genomes)
    native = run_native(genomes)
    assert skani, "skani returned no pairs"
    for key, (s_ani, s_af) in skani.items():
        n_ani, n_af = native.get(key, (0.0, 0.0))
        # decision-band agreement: the derep threshold lives at 95-99%
        assert abs(n_ani - s_ani) < 0.5, (key, s_ani, n_ani)
        assert abs(n_af - s_af) < 0.15, (key, s_af, n_af)
